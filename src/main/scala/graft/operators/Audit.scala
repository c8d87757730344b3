package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Data-quality constraint audit (§2-beyond — the "expectations" pass
  * every ingestion pipeline runs before publishing a table).
  *
  * The reference guards single records inline (format/null checks on
  * decoded Kafka payloads, spark_streaming_kafka.py:18–20); at warehouse
  * scale the same concern is a TABLE-level contract: null counts,
  * key uniqueness, domain membership, referential integrity. Each check
  * here reduces to one partially-aggregated pass — the six scalar checks
  * share a single scan (one multi-aggregate), and the FK check is one
  * anti join that Catalyst broadcasts when the dimension is small.
  * Output is the fixed (check_name, violations) contract so downstream
  * gates can alert on any non-zero row without knowing the check list.
  */
object Audit {

  /** Constraint audit over `orders` (+ FK to `customer`). Violation
    * counts are exact longs; a healthy table is all-zeros. The NOT-IN
    * domain check deliberately uses null-safe `isin` semantics: a NULL
    * status is counted by its own null check, not double-counted as a
    * domain violation.
    */
  def dqAudit(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val o = Tables.orders(spark, dir)
    val base = o.agg(
      count(lit(1)).as("n_rows"),
      count(when($"o_orderkey".isNull, 1)).as("null_orderkey"),
      countDistinct($"o_orderkey").as("distinct_orderkey"),
      count(when($"o_totalprice" <= 0, 1)).as("nonpositive_totalprice"),
      count(when(!$"o_orderstatus".isin("F", "O", "P"), 1)).as("bad_status"),
      count(when($"o_orderdate".isNull, 1)).as("null_orderdate"))
    val fk = o.select($"o_custkey")
      .join(Tables.customer(spark, dir).select($"c_custkey"),
        $"o_custkey" === $"c_custkey", "left_anti")
      .agg(count(lit(1)).as("fk_violations"))
    // stack() unpivots the one-row multi-aggregate into the fixed
    // (check_name, violations) contract — no extra scan
    base.selectExpr(
      """stack(5,
        |  'bad_status', bad_status,
        |  'dup_orderkey', n_rows - distinct_orderkey,
        |  'nonpositive_totalprice', nonpositive_totalprice,
        |  'null_orderdate', null_orderdate,
        |  'null_orderkey', null_orderkey
        |) as (check_name, violations)""".stripMargin)
      .unionByName(fk.select(lit("fk_custkey").as("check_name"),
        $"fk_violations".as("violations")))
      .orderBy($"check_name")
  }

  /** Per-group Pearson correlation from EXACT integer co-moments —
    * the profiling stat a feature-audit pass computes per segment
    * (here: does event value correlate with hour-of-day, per type?).
    *
    * Determinism strategy: the six co-moments (n, Σx, Σy, Σxy, Σx²,
    * Σy²) are exact BIGINTs (cents × hour), accumulated in ONE
    * partial+final aggregate pass, so accumulation order cannot move a
    * bit. The correlation is then derived from those scalars with the
    * SAME IEEE expression tree in both engines — ×, −, /, sqrt are all
    * correctly-rounded operations, so identical integer inputs give
    * bit-identical doubles. The moments are emitted too: they're the
    * mergeable state (two shards' moments ADD), which is what makes
    * this incremental-maintenance-friendly at 100 TB — the same
    * algebraic contract as [[graft.sources.Maintenance.incrementalAggOf]].
    * Moments stay linear in n (no n·Σx² product in the integer
    * domain), so they don't overflow where a pre-multiplied integer
    * formulation would.
    */
  def corrMoments(spark: SparkSession, dir: String): DataFrame =
    corrMomentsOf(Tables.events(spark, dir))

  /** [[corrMoments]] over any (event_type, ts NANOS-LONG, value). */
  def corrMomentsOf(events: DataFrame): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val d = (c: org.apache.spark.sql.Column) => c.cast("double")
    val m = events
      .select($"event_type",
        ($"value".cast("decimal(18,2)") * 100).cast("long").as("x"),
        expr("(ts div 1000) div 3600000000 % 24").as("y"))
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n"), sum($"x").as("sx"), sum($"y").as("sy"),
        sum($"x" * $"y").as("sxy"), sum($"x" * $"x").as("sxx"),
        sum($"y" * $"y").as("syy"))
    m.select($"event_type", $"n", $"sx", $"sy", $"sxy", $"sxx", $"syy",
        when(d($"n") * d($"sxx") - d($"sx") * d($"sx") === 0.0 ||
             d($"n") * d($"syy") - d($"sy") * d($"sy") === 0.0, lit(null))
          .otherwise(
            (d($"n") * d($"sxy") - d($"sx") * d($"sy")) /
              (sqrt(d($"n") * d($"sxx") - d($"sx") * d($"sx")) *
               sqrt(d($"n") * d($"syy") - d($"sy") * d($"sy"))))
          .as("corr_value_hour"))
      .orderBy($"event_type")
  }

  /** DuckDB mirror of [[corrMomentsOf]]: same integer moments, same
    * IEEE expression tree for the derived correlation.
    */
  def corrMomentsSql: String =
    """WITH c AS (SELECT event_type,
      |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS x,
      |    (epoch_us(ts) // 3600000000) % 24 AS y
      |  FROM events),
      |m AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
      |    CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
      |    CAST(SUM(x * y) AS BIGINT) AS sxy,
      |    CAST(SUM(x * x) AS BIGINT) AS sxx,
      |    CAST(SUM(y * y) AS BIGINT) AS syy
      |  FROM c GROUP BY event_type)
      |SELECT event_type, n, sx, sy, sxy, sxx, syy,
      |  CASE WHEN CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
      |         - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) = 0.0
      |    OR CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
      |         - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) = 0.0
      |    THEN NULL
      |    ELSE (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
      |           - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
      |      / (SQRT(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
      |           - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
      |         * SQRT(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
      |           - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
      |  END AS corr_value_hour
      |FROM m ORDER BY event_type""".stripMargin

  /** k-anonymity threshold for [[kAnonymityAudit]]. */
  val KAnon = 5L

  /** k-anonymity audit over the (mktsegment, nation) quasi-identifier
    * pair — the privacy gate a dataset release runs before publishing:
    * any quasi-identifier cell with fewer than k members re-identifies
    * its rows (Sweeney 2002), so the audit reports every cell's size,
    * its k-flag, and the size of its GENERALIZED cell (segment only —
    * the first rung of the generalization ladder a release would climb
    * for failing cells). One partial-aggregatable two-column shuffle
    * plus a broadcast join of the segment-level census; output is
    * cell-count-sized at any scale.
    */
  def kAnonymityAudit(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val cells = Tables.customer(spark, dir)
      .groupBy($"c_mktsegment", $"c_nationkey")
      .agg(count(lit(1)).as("n"))
    val seg = cells.groupBy($"c_mktsegment")
      .agg(sum($"n").as("n_generalized"))
    cells.join(broadcast(seg), Seq("c_mktsegment"))
      .select($"c_mktsegment", $"c_nationkey", $"n",
        ($"n" >= KAnon).as("k_ok"),
        $"n_generalized", ($"n_generalized" >= KAnon).as("generalized_ok"))
      .orderBy($"c_mktsegment", $"c_nationkey")
  }

  /** Cross-multiplied outlier threshold for [[madOutliers]]:
    * 3 · 1.4826 (the normal-consistency constant) = 4.4478, applied as
    * the exact integer inequality dev2·10000 > 22239·mad4 — dev2 is in
    * half-cents and mad4 in the doubled unit, so the 2× cancellation
    * folds into 22239 = 44478/2. No float ever decides a flag.
    */
  val MadNum = 22239L
  val MadDen = 10000L

  /** Robust per-group outlier detection by median/MAD — the
    * data-cleaning pass that survives the very outliers a mean/stddev
    * z-score is skewed by. All state is exact: values lift to integer
    * cents; the per-type median doubles to the integer med2
    * (interpolated medians of integers are x.0 or x.5, exactly
    * representable, and `percentile` / `quantile_cont` agree bitwise on
    * them — the [[Relational.quantileRatingLevels]] contract); absolute
    * deviations live in half-cents; the MAD doubles again to mad4.
    * The flag is the cross-multiplied integer inequality above.
    *
    * Scale shape: two grouped-percentile shuffles (values, then
    * deviations) + two broadcast joins back; the fact table never
    * shuffles. Groups are event types — the percentile state is
    * per-group, not per-row.
    */
  def madOutliers(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.widened(spark, Tables.events(spark, dir))
      .select($"event_id", $"event_type",
        ($"value".cast("decimal(18,2)") * 100).cast("long").as("cents"))
    val med = ev.groupBy($"event_type")
      .agg((percentile($"cents", lit(0.5)) * 2).cast("long").as("med2"))
    val dev = ev.join(broadcast(med), Seq("event_type"))
      .select($"event_id", $"event_type", $"cents", $"med2",
        abs($"cents" * 2 - $"med2").as("dev2"))
    val mad = dev.groupBy($"event_type")
      .agg((percentile($"dev2", lit(0.5)) * 2).cast("long").as("mad4"))
    dev.join(broadcast(mad), Seq("event_type"))
      .select($"event_id", $"event_type", $"cents", $"med2", $"dev2",
        $"mad4", ($"dev2" * MadDen > $"mad4" * MadNum).as("is_outlier"))
      .orderBy($"event_id")
  }

  /** Decision threshold (exact cents) for [[binaryClassifierEval]]'s
    * confusion counts.
    */
  val EvalThresholdCents = 10000L

  /** Prefix-sum bucket width (cents) for the AUC rank computation —
    * buckets are value-domain/1000-sized, so the one remaining
    * single-task window runs over ~dozens of bucket totals at any
    * corpus size.
    */
  val EvalBucketCents = 1000L

  /** Binary-classifier evaluation with an EXACT AUC — the model-eval
    * operator a training pipeline runs on every candidate: label =
    * purchase, score = the event's cents value. Confusion counts and
    * the ppm-scaled precision/recall/F1 are pure integers (F1 as the
    * single division 2·TP·10⁶ div (2·TP+FP+FN) — no nested rounding);
    * AUC is the Mann-Whitney rank statistic with midrank tie handling,
    * computed WITHOUT a global sort: scores collapse to per-value
    * groups (one shuffle), the exclusive rank prefix comes from the
    * two-level bucket trick ([[TextOps.tokenPackOf]]'s idiom), and
    *   AUC = (Σ cnt_pos·(2·cum + cnt + 1) − n₁(n₁+1)) / (2·n₁·n₀)
    * is one double division of exact BIGINTs — bit-identical across
    * engines, no float ranks anywhere.
    */
  def binaryClassifierEval(spark: SparkSession, dir: String,
      threshold: Long = EvalThresholdCents): DataFrame = {
    import spark.implicits._
    val ev = Tables.widened(spark, Tables.events(spark, dir))
      .select(($"value".cast("decimal(18,2)") * 100).cast("long").as("cents"),
        when($"event_type" === "purchase", 1L).otherwise(0L).as("pos"))
    val g = ev.groupBy($"cents")
      .agg(count(lit(1)).as("cnt"), sum($"pos").as("cnt_pos"))
      .withColumn("bucket", expr(s"cents div $EvalBucketCents"))
    val wLocal = Window.partitionBy($"bucket").orderBy($"cents")
      .rowsBetween(Window.unboundedPreceding, -1)
    val wBuck = Window.orderBy($"bucket")
      .rowsBetween(Window.unboundedPreceding, -1)
    val bucketOff = g.groupBy($"bucket").agg(sum($"cnt").as("bt"))
      .withColumn("off", coalesce(sum($"bt").over(wBuck), lit(0L)))
      .select($"bucket", $"off")
    val cum = g
      .withColumn("lo", coalesce(sum($"cnt").over(wLocal), lit(0L)))
      .join(broadcast(bucketOff), Seq("bucket"))
      .select($"cents", $"cnt", $"cnt_pos", ($"lo" + $"off").as("cum"))
    cum.agg(
        sum($"cnt").as("n"), sum($"cnt_pos").as("n_pos"),
        sum($"cnt_pos" * ($"cum" * 2 + $"cnt" + 1)).as("auc2num"),
        sum(when($"cents" >= threshold, $"cnt_pos").otherwise(0L)).as("tp"),
        sum(when($"cents" >= threshold, $"cnt" - $"cnt_pos")
          .otherwise(0L)).as("fp"),
        sum(when($"cents" < threshold, $"cnt_pos").otherwise(0L)).as("fn"),
        sum(when($"cents" < threshold, $"cnt" - $"cnt_pos")
          .otherwise(0L)).as("tn"))
      .select($"n", $"n_pos", $"tp", $"fp", $"tn", $"fn",
        expr("tp * 1000000 div (tp + fp)").as("precision_ppm"),
        expr("tp * 1000000 div (tp + fn)").as("recall_ppm"),
        expr("(2 * tp * 1000000) div (2 * tp + fp + fn)").as("f1_ppm"),
        (($"auc2num" - $"n_pos" * ($"n_pos" + 1)).cast("double") /
          ($"n_pos" * ($"n" - $"n_pos") * 2).cast("double")).as("auc"))
  }

  /** Resample count for [[poissonBootstrap]]. */
  val BootResamples = 32

  /** Deterministic Poisson bootstrap — the single-pass bootstrap that
    * works at any scale (classic resampling needs n draws from a
    * global index; the Poisson approximation gives every row an
    * independent Binomial(4, 1/4) ≈ Poisson(1) weight per resample, so
    * the whole thing is a projection + one partial-aggregatable
    * shuffle). Weights come from four 2-bit fields of ONE salted md5
    * hash per (row, resample) — RNG-free, rerun-identical,
    * engine-identical. Each resample's mean is one exact-integer
    * division (Σ w·cents / Σ w as a single double op), so the resample
    * distribution is bit-identical across engines; the CI endpoints
    * are order statistics of those 32 means (2nd-smallest /
    * 2nd-largest ≈ a 94% interval), selected by a deterministic
    * (mean, resample-id) rank.
    */
  def poissonBootstrap(spark: SparkSession, dir: String,
      resamples: Int = BootResamples): DataFrame = {
    import spark.implicits._
    val ev = Tables.widened(spark, Tables.events(spark, dir))
      .select($"event_id", $"event_type",
        ($"value".cast("decimal(18,2)") * 100).cast("long").as("cents"))
    val h = graft.operators.Dedup.hash60(concat(lit("boot:"), $"r",
      lit(":"), $"event_id".cast("string")))
    val w = (0 until 4).map(j =>
        when(shiftrightunsigned(h, 2 * j).bitwiseAND(3L) === 0L, 1L)
          .otherwise(0L))
      .reduce(_ + _)
    val means = ev
      .select($"event_id", $"event_type", $"cents",
        explode(sequence(lit(0), lit(resamples - 1))).as("r"))
      .select($"event_type", $"r", w.as("w"), $"cents")
      .groupBy($"event_type", $"r")
      .agg(sum($"w" * $"cents").as("wc"), sum($"w").as("ws"))
      .select($"event_type", $"r",
        ($"wc".cast("double") / $"ws".cast("double")).as("mean_cents"))
    val byMean = Window.partitionBy($"event_type")
      .orderBy($"mean_cents", $"r")
    val ranked = means
      .withColumn("rk", row_number().over(byMean))
      .withColumn("nr", count(lit(1)).over(
        Window.partitionBy($"event_type")))
    val full = ev.groupBy($"event_type")
      .agg(count(lit(1)).as("n"), sum($"cents").as("cents_sum"))
      .select($"event_type", $"n",
        expr("cents_sum div n").as("mean_floor_cents"))
    ranked.filter($"rk" === 2 || $"rk" === $"nr" - 1)
      .groupBy($"event_type")
      .agg(min($"mean_cents").as("boot_lo"), max($"mean_cents").as("boot_hi"))
      .join(broadcast(full), Seq("event_type"))
      .select($"event_type", $"n", $"mean_floor_cents",
        $"boot_lo", $"boot_hi")
      .orderBy($"event_type")
  }

  /** Two-sample Kolmogorov–Smirnov drift statistic — the
    * distribution-level companion to [[distributionDrift]]'s binned
    * PSI (Relational): D = sup_x |F_A(x) − F_B(x)| between two event
    * types' value distributions, computed EXACTLY. The sup runs over
    * the observed support only (the ECDF gap can only change at a
    * sample point); cross-multiplying the two ECDFs by n_A·n_B keeps
    * every compared quantity an integer: D_num = max |cumA·n_B −
    * cumB·n_A|, and D itself is ONE double division of exact BIGINTs
    * (the AUC contract). Inclusive cumulative counts come from the
    * same two-level bucket prefix sum as [[binaryClassifierEval]] — no
    * global sort; the only single-task window runs over bucket totals.
    */
  def ksDrift(spark: SparkSession, dir: String, typeA: String = "click",
      typeB: String = "purchase"): DataFrame = {
    import spark.implicits._
    val ev = Tables.widened(spark, Tables.events(spark, dir))
      .filter($"event_type".isin(typeA, typeB))
      .select(($"value".cast("decimal(18,2)") * 100).cast("long").as("cents"),
        when($"event_type" === typeA, 1L).otherwise(0L).as("a"))
    val g = ev.groupBy($"cents")
      .agg(sum($"a").as("ca"), sum(lit(1L) - $"a").as("cb"))
      .withColumn("bucket", expr(s"cents div $EvalBucketCents"))
    val wLocal = Window.partitionBy($"bucket").orderBy($"cents")
      .rowsBetween(Window.unboundedPreceding, 0)
    val wBuck = Window.orderBy($"bucket")
      .rowsBetween(Window.unboundedPreceding, -1)
    val bucketOff = g.groupBy($"bucket")
      .agg(sum($"ca").as("bta"), sum($"cb").as("btb"))
      .withColumn("offa", coalesce(sum($"bta").over(wBuck), lit(0L)))
      .withColumn("offb", coalesce(sum($"btb").over(wBuck), lit(0L)))
      .select($"bucket", $"offa", $"offb")
    val cum = g
      .withColumn("la", sum($"ca").over(wLocal))
      .withColumn("lb", sum($"cb").over(wLocal))
      .join(broadcast(bucketOff), Seq("bucket"))
      .select(($"la" + $"offa").as("cuma"), ($"lb" + $"offb").as("cumb"))
    val tot = ev.agg(sum($"a").as("n_a"),
      (count(lit(1)) - sum($"a")).as("n_b"))
    cum.crossJoin(broadcast(tot))
      .select(abs($"cuma" * $"n_b" - $"cumb" * $"n_a").as("gap"),
        $"n_a", $"n_b")
      .groupBy($"n_a", $"n_b").agg(max($"gap").as("d_num"))
      .select($"n_a", $"n_b", $"d_num",
        expr("(d_num * 1000000) div (n_a * n_b)").as("ks_ppm"),
        ($"d_num".cast("double") /
          ($"n_a" * $"n_b").cast("double")).as("ks"))
  }

  /** [[ksDrift]] oracle: plain inclusive window over the per-value
    * groups (the oracle need not avoid the global sort).
    */
  def ksDriftSql(typeA: String = "click",
      typeB: String = "purchase"): String =
    s"""WITH ev AS (SELECT
       |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
       |    CASE WHEN event_type = '$typeA' THEN 1 ELSE 0 END AS a
       |  FROM events WHERE event_type IN ('$typeA', '$typeB')),
       |g AS (SELECT cents, CAST(SUM(a) AS BIGINT) AS ca,
       |    CAST(SUM(1 - a) AS BIGINT) AS cb FROM ev GROUP BY cents),
       |c AS (SELECT
       |    CAST(SUM(ca) OVER (ORDER BY cents) AS BIGINT) AS cuma,
       |    CAST(SUM(cb) OVER (ORDER BY cents) AS BIGINT) AS cumb
       |  FROM g),
       |t AS (SELECT CAST(SUM(a) AS BIGINT) AS n_a,
       |    CAST(COUNT(*) - SUM(a) AS BIGINT) AS n_b FROM ev),
       |d AS (SELECT n_a, n_b,
       |    MAX(ABS(cuma * n_b - cumb * n_a)) AS d_num
       |  FROM c, t GROUP BY n_a, n_b)
       |SELECT n_a, n_b, d_num,
       |  (d_num * 1000000) // (n_a * n_b) AS ks_ppm,
       |  CAST(d_num AS DOUBLE) / CAST(n_a * n_b AS DOUBLE) AS ks
       |FROM d""".stripMargin

  /** Score-bin width (cents) for [[scoreLiftTable]] — ~10 bins over
    * the corpus value domain.
    */
  val LiftBinCents = 5000L

  /** Gains/lift table — the campaign-targeting report next to
    * [[binaryClassifierEval]]: score (value cents) binned to
    * [[LiftBinCents]]-wide bins, each bin's observed positive
    * (purchase) rate versus the base rate as an exact basis-point
    * lift, plus the cumulative capture ("top-k bins catch X% of all
    * positives") folded DESCENDING over bins. Every emitted number is
    * an integer: rates in ppm via single `div`s, lift in bp as
    * rate·10⁴ div base-rate, capture from an inclusive prefix over
    * the bounded bin totals (the only window runs over ~10 rows).
    */
  def scoreLiftTable(spark: SparkSession, dir: String,
      binCents: Long = LiftBinCents): DataFrame = {
    import spark.implicits._
    val ev = Tables.widened(spark, Tables.events(spark, dir))
      .select(($"value".cast("decimal(18,2)") * 100).cast("long").as("cents"),
        when($"event_type" === "purchase", 1L).otherwise(0L).as("pos"))
    val bins = ev.groupBy(expr(s"cents div $binCents").as("bin"))
      .agg(count(lit(1)).as("n"), sum($"pos").as("n_pos"),
        sum($"cents").as("cents_sum"))
    val tot = ev.agg(count(lit(1)).as("nt"), sum($"pos").as("npt"))
    val wDesc = Window.orderBy($"bin".desc)
      .rowsBetween(Window.unboundedPreceding, 0)
    bins.crossJoin(broadcast(tot))
      .withColumn("cum_pos", sum($"n_pos").over(wDesc))
      .select($"bin", $"n", $"n_pos",
        expr("cents_sum div n").as("mean_cents_floor"),
        expr("(n_pos * 1000000) div n").as("pos_rate_ppm"),
        expr("((n_pos * 1000000 div n) * 10000) div (npt * 1000000 div nt)")
          .as("lift_bp"),
        expr("(cum_pos * 1000000) div npt").as("capture_ppm"))
      .orderBy($"bin")
  }

  /** [[scoreLiftTable]] oracle. */
  def scoreLiftTableSql(binCents: Long = LiftBinCents): String =
    s"""WITH ev AS (SELECT
       |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
       |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS pos
       |  FROM events),
       |b AS (SELECT cents // $binCents AS bin,
       |    CAST(COUNT(*) AS BIGINT) AS n,
       |    CAST(SUM(pos) AS BIGINT) AS n_pos,
       |    CAST(SUM(cents) AS BIGINT) AS cents_sum
       |  FROM ev GROUP BY 1),
       |t AS (SELECT CAST(COUNT(*) AS BIGINT) AS nt,
       |    CAST(SUM(pos) AS BIGINT) AS npt FROM ev),
       |c AS (SELECT b.*, t.nt, t.npt,
       |    CAST(SUM(n_pos) OVER (ORDER BY bin DESC
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       |      AS BIGINT) AS cum_pos
       |  FROM b, t)
       |SELECT bin, n, n_pos,
       |  cents_sum // n AS mean_cents_floor,
       |  (n_pos * 1000000) // n AS pos_rate_ppm,
       |  ((n_pos * 1000000 // n) * 10000) // (npt * 1000000 // nt) AS lift_bp,
       |  (cum_pos * 1000000) // npt AS capture_ppm
       |FROM c ORDER BY bin""".stripMargin

  /** Sample budget for [[neymanAllocation]]. */
  val NeymanBudget = 1000L

  /** Neyman sampling-budget allocation — the survey-design operator
    * behind every "sample 1000 rows per day for human eval" job done
    * right: the optimal per-stratum budget is ∝ N_h·σ_h, and since
    * v_h := n·Σx² − (Σx)² equals n²σ², the weight N_h·σ_h is exactly
    * √v_h. Exactness: v_h is computed in the DECIMAL(38,0) domain
    * (n·Σx² overflows BIGINT at sf0.1 cents scale — measured, hence
    * the widening, which DuckDB mirrors in HUGEINT); the weight is
    * floor(√v_h) — one correctly-rounded IEEE sqrt of the SAME input
    * in both engines, floored to an integer so every downstream
    * division is exact integer arithmetic (allocations sum to ≤
    * budget; the proportional column is the naive comparison).
    * One partial-aggregatable pass; strata-count-sized output.
    */
  def neymanAllocation(spark: SparkSession, dir: String,
      budget: Long = NeymanBudget): DataFrame = {
    import spark.implicits._
    val ev = Tables.widened(spark, Tables.events(spark, dir))
      .select($"event_type",
        ($"value".cast("decimal(18,2)") * 100).cast("long").as("cents"))
    val strata = ev.groupBy($"event_type")
      .agg(count(lit(1)).as("n_h"), sum($"cents").as("sx"),
        sum($"cents" * $"cents").as("sx2"))
      .withColumn("v_h",
        $"n_h".cast("decimal(38,0)") * $"sx2".cast("decimal(38,0)") -
          $"sx".cast("decimal(38,0)") * $"sx".cast("decimal(38,0)"))
      .withColumn("w_h", floor(sqrt($"v_h".cast("double"))).cast("long"))
    val tot = strata.agg(sum($"w_h").as("sw"), sum($"n_h").as("n"))
    strata.crossJoin(broadcast(tot))
      .select($"event_type", $"n_h", $"v_h".cast("string").as("v_h"),
        $"w_h",
        expr(s"($budget * w_h) div sw").as("neyman_alloc"),
        expr(s"($budget * n_h) div n").as("proportional_alloc"))
      .orderBy($"event_type")
  }

  /** [[neymanAllocation]] oracle (v_h emitted as a string: DuckDB's
    * HUGEINT and Spark's DECIMAL(38,0) differ as parquet types but
    * print identically).
    */
  def neymanAllocationSql(budget: Long = NeymanBudget): String =
    s"""WITH ev AS (SELECT event_type,
       |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
       |  FROM events),
       |s AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_h,
       |    CAST(SUM(cents) AS BIGINT) AS sx,
       |    CAST(SUM(cents * cents) AS HUGEINT) AS sx2
       |  FROM ev GROUP BY event_type),
       |v AS (SELECT event_type, n_h,
       |    CAST(n_h AS HUGEINT) * sx2
       |      - CAST(sx AS HUGEINT) * CAST(sx AS HUGEINT) AS v_h
       |  FROM s),
       |w AS (SELECT *, CAST(FLOOR(SQRT(CAST(v_h AS DOUBLE))) AS BIGINT)
       |    AS w_h FROM v),
       |t AS (SELECT CAST(SUM(w_h) AS BIGINT) AS sw,
       |    CAST(SUM(n_h) AS BIGINT) AS n FROM w)
       |SELECT event_type, n_h, CAST(v_h AS VARCHAR) AS v_h, w_h,
       |  ($budget * w_h) // sw AS neyman_alloc,
       |  ($budget * n_h) // n AS proportional_alloc
       |FROM w, t ORDER BY event_type""".stripMargin

  /** Fold count for [[crossvalFolds]]. */
  val CvFolds = 5

  /** K-fold cross-validation harness — the eval-infrastructure piece
    * under every model selection loop, shown on the simplest honest
    * model (predict the train-fold mean): rows land in
    * [[CvFolds]] folds by the salted hash gate (deterministic,
    * rerun-identical, leakage-free by construction); each fold's
    * held-out RMSE is evaluated against the complement's mean.
    * Exactness: the train mean is an exact floor division in cents
    * (the [[poissonBootstrap]] `mean_floor_cents` contract), squared
    * errors are exact BIGINTs, and rmse = sqrt(Σsq/n) is two
    * correctly-rounded IEEE ops over exact integers — bit-identical
    * across engines.
    *
    * Scale shape: two passes — one partial-aggregatable fold
    * aggregate (k rows, broadcast back), one squared-error fold
    * aggregate. Leave-one-fold-out statistics come from the totals
    * minus the fold's own, so no per-fold rescan of the corpus.
    */
  def crossvalFolds(spark: SparkSession, dir: String,
      folds: Int = CvFolds): DataFrame = {
    import spark.implicits._
    val ev = Tables.widened(spark, Tables.events(spark, dir))
      .select($"event_id",
        ($"value".cast("decimal(18,2)") * 100).cast("long").as("cents"))
      .withColumn("fold",
        (graft.operators.Dedup.hash60(concat(lit("cv:"),
          $"event_id".cast("string"))) % folds).cast("int"))
    val perFold = ev.groupBy($"fold")
      .agg(count(lit(1)).as("n_k"), sum($"cents").as("sum_k"))
    val tot = perFold.agg(sum($"n_k").as("n"), sum($"sum_k").as("s"))
    val means = perFold.crossJoin(broadcast(tot))
      .select($"fold", ($"n" - $"n_k").as("n_train"), $"n_k".as("n_test"),
        expr("(s - sum_k) div (n - n_k)").as("train_mean_cents_floor"))
    ev.join(broadcast(means), Seq("fold"))
      .withColumn("d", $"cents" - $"train_mean_cents_floor")
      .groupBy($"fold", $"n_train", $"n_test", $"train_mean_cents_floor")
      .agg(sum($"d" * $"d").as("ssq"))
      .select($"fold", $"n_train", $"n_test", $"train_mean_cents_floor",
        sqrt($"ssq".cast("double") / $"n_test".cast("double"))
          .as("rmse_cents"))
      .orderBy($"fold")
  }

  /** [[crossvalFolds]] oracle: identical gate, identical arithmetic. */
  def crossvalFoldsSql(folds: Int = CvFolds): String = {
    val h60 = "CAST(('0x' || substr(md5('cv:' || CAST(event_id AS VARCHAR)), 1, 15)) AS BIGINT)"
    s"""WITH ev AS (SELECT event_id,
       |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
       |    CAST($h60 % $folds AS INTEGER) AS fold
       |  FROM events),
       |pf AS (SELECT fold, CAST(COUNT(*) AS BIGINT) AS n_k,
       |    CAST(SUM(cents) AS BIGINT) AS sum_k FROM ev GROUP BY fold),
       |t AS (SELECT CAST(SUM(n_k) AS BIGINT) AS n,
       |    CAST(SUM(sum_k) AS BIGINT) AS s FROM pf),
       |m AS (SELECT fold, n - n_k AS n_train, n_k AS n_test,
       |    (s - sum_k) // (n - n_k) AS train_mean_cents_floor FROM pf, t)
       |SELECT m.fold, m.n_train, m.n_test, m.train_mean_cents_floor,
       |  sqrt(CAST(SUM((cents - train_mean_cents_floor)
       |      * (cents - train_mean_cents_floor)) AS DOUBLE)
       |    / CAST(m.n_test AS DOUBLE)) AS rmse_cents
       |FROM ev JOIN m USING (fold)
       |GROUP BY m.fold, m.n_train, m.n_test, m.train_mean_cents_floor
       |ORDER BY m.fold""".stripMargin
  }

  /** l for the [[lDiversityAudit]] gate. */
  val LDiversity = 3L

  /** l-diversity audit — the disclosure-risk check k-anonymity misses
    * (Machanavajjhala et al., ICDE 2006, public): a quasi-identifier
    * cell can hold ≥ k people yet still leak if they all share one
    * SENSITIVE value. Per (mktsegment, nationkey) cell over customers:
    * group size, count of DISTINCT sensitive values (the account-
    * balance band plays the sensitive attribute), the plurality
    * share in ppm, and the l-gate. Same one-aggregation shape as
    * [[kAnonymityAudit]]; the plurality count is a per-cell max over
    * the (cell, band) sub-aggregate — both partial-aggregatable.
    */
  def lDiversityAudit(spark: SparkSession, dir: String,
      l: Long = LDiversity): DataFrame = {
    import spark.implicits._
    val banded = Tables.customer(spark, dir)
      .select($"c_mktsegment", $"c_nationkey",
        // +100000 shifts the TPC-H-style [-999.99, 9999.99] domain
        // non-negative: Spark's div truncates toward zero, DuckDB's //
        // floors — they agree only on non-negative operands
        expr("(CAST(CAST(c_acctbal AS DECIMAL(12,2)) * 100 AS BIGINT)" +
          " + 100000) div 100000").as("bal_band"))
    val sub = banded.groupBy($"c_mktsegment", $"c_nationkey", $"bal_band")
      .agg(count(lit(1)).as("nb"))
    sub.groupBy($"c_mktsegment", $"c_nationkey")
      .agg(sum($"nb").as("n"),
        count(lit(1)).as("n_distinct_sensitive"),
        max($"nb").as("plurality"))
      .select($"c_mktsegment", $"c_nationkey", $"n",
        $"n_distinct_sensitive",
        expr("plurality * 1000000 div n").as("plurality_ppm"),
        ($"n_distinct_sensitive" >= l).as("l_ok"))
      .orderBy($"c_mktsegment", $"c_nationkey")
  }

  /** [[lDiversityAudit]] oracle. */
  def lDiversityAuditSql(l: Long = LDiversity): String =
    s"""WITH b AS (SELECT c_mktsegment, c_nationkey,
       |    (CAST(CAST(c_acctbal AS DECIMAL(12,2)) * 100 AS BIGINT) + 100000) // 100000 AS bal_band
       |  FROM customer),
       |sub AS (SELECT c_mktsegment, c_nationkey, bal_band, COUNT(*) AS nb
       |  FROM b GROUP BY c_mktsegment, c_nationkey, bal_band)
       |SELECT c_mktsegment, c_nationkey,
       |  CAST(SUM(nb) AS BIGINT) AS n,
       |  CAST(COUNT(*) AS BIGINT) AS n_distinct_sensitive,
       |  CAST(MAX(nb) AS BIGINT) * 1000000 // CAST(SUM(nb) AS BIGINT) AS plurality_ppm,
       |  (COUNT(*) >= $l) AS l_ok
       |FROM sub GROUP BY c_mktsegment, c_nationkey
       |ORDER BY c_mktsegment, c_nationkey""".stripMargin

  /** A/B experiment readout: two-proportion z statistic + Wilson 95%
    * interval per arm, from exact integer counts.
    *
    * Assignment is the deterministic hash gate (`user_id % 2` — the
    * same RNG-free rerun-identical idiom as the hash split): exposure
    * = a 'view' event, conversion = an exposed user with at least
    * [[AbConvThreshold]] 'purchase' events (every user in the
    * synthetic corpus purchases at least once, so a ≥1 definition
    * degenerates to 100% conversion in both arms and a 0/0 z — the
    * count threshold sits at the per-user purchase median, which the
    * corpus generator holds constant across scale factors).
    * The distributed work is two distinct-user sets and ONE global
    * conditional aggregate → four exact BIGINTs (n_a, x_a, n_b, x_b);
    * every statistic is then derived from those four scalars with a
    * matched IEEE expression tree ([[corrMomentsOf]]'s determinism
    * contract: correctly-rounded ×,−,/,√ over identical inputs are
    * bit-identical in both engines). At 100 TB the plan is two
    * semi-joined distincts on user_id and a 4-long reduce — no state
    * grows with events, and the four counts are mergeable across
    * shards/days by addition.
    */
  def abTestReport(spark: SparkSession, dir: String): DataFrame =
    abTestReportOf(Tables.events(spark, dir))

  /** Purchase-count cutoff defining conversion (≈ the per-user
    * purchase median, scale-invariant by corpus construction).
    */
  val AbConvThreshold = 14L

  /** [[abTestReport]] over any (user_id, event_type) relation. */
  def abTestReportOf(events: DataFrame): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val d = (c: org.apache.spark.sql.Column) => c.cast("double")
    val exposed = events.filter($"event_type" === "view")
      .select($"user_id").distinct()
      .withColumn("arm", pmod($"user_id", lit(2L)))
    val converted = events.filter($"event_type" === "purchase")
      .groupBy($"user_id").agg(count(lit(1)).as("n_purch"))
      .filter($"n_purch" >= AbConvThreshold)
      .select($"user_id").withColumn("cv", lit(1L))
    val counts = exposed.join(converted, Seq("user_id"), "left")
      .select($"arm", coalesce($"cv", lit(0L)).as("cv"))
      .agg(
        sum(when($"arm" === 0, 1L).otherwise(0L)).as("n_a"),
        sum(when($"arm" === 0, $"cv").otherwise(0L)).as("x_a"),
        sum(when($"arm" === 1, 1L).otherwise(0L)).as("n_b"),
        sum(when($"arm" === 1, $"cv").otherwise(0L)).as("x_b"))
    // Wilson 95% bounds as a matched IEEE tree; z=1.96 parses to the
    // same binary double in both engines
    val z = lit(1.96)
    def wilson(x: org.apache.spark.sql.Column, n: org.apache.spark.sql.Column,
        sign: Double) = {
      val p = d(x) / d(n)
      val z2 = z * z
      (p + z2 / (lit(2.0) * d(n)) + lit(sign) * z *
        sqrt(p * (lit(1.0) - p) / d(n) + z2 / (lit(4.0) * d(n) * d(n)))) /
        (lit(1.0) + z2 / d(n))
    }
    val pp = (d($"x_a") + d($"x_b")) / (d($"n_a") + d($"n_b"))
    counts.select(
      $"n_a", $"x_a", $"n_b", $"x_b",
      expr("x_a * 1000000 div n_a").as("conv_a_ppm"),
      expr("x_b * 1000000 div n_b").as("conv_b_ppm"),
      ((d($"x_b") / d($"n_b") - d($"x_a") / d($"n_a")) /
        sqrt(pp * (lit(1.0) - pp) *
          (lit(1.0) / d($"n_a") + lit(1.0) / d($"n_b")))).as("z_stat"),
      wilson($"x_a", $"n_a", -1.0).as("wilson_a_lo"),
      wilson($"x_a", $"n_a", 1.0).as("wilson_a_hi"),
      wilson($"x_b", $"n_b", -1.0).as("wilson_b_lo"),
      wilson($"x_b", $"n_b", 1.0).as("wilson_b_hi"))
  }

  /** DuckDB mirror of [[abTestReportOf]] — same four integers, same
    * IEEE trees (subexpression order preserved verbatim).
    */
  def abTestReportSql: String = {
    def w(x: String, n: String, sign: String) =
      s"(CAST($x AS DOUBLE) / CAST($n AS DOUBLE) + (1.96 * 1.96) / (2.0 * CAST($n AS DOUBLE)) + $sign 1.96 * " +
        s"sqrt(CAST($x AS DOUBLE) / CAST($n AS DOUBLE) * (1.0 - CAST($x AS DOUBLE) / CAST($n AS DOUBLE)) / CAST($n AS DOUBLE) + " +
        s"(1.96 * 1.96) / (4.0 * CAST($n AS DOUBLE) * CAST($n AS DOUBLE)))) / (1.0 + (1.96 * 1.96) / CAST($n AS DOUBLE))"
    s"""WITH exposed AS (
       |  SELECT DISTINCT user_id, user_id % 2 AS arm FROM events WHERE event_type = 'view'),
       |conv AS (SELECT user_id FROM events WHERE event_type = 'purchase'
       |  GROUP BY user_id HAVING COUNT(*) >= $AbConvThreshold),
       |f AS (SELECT e.arm, CASE WHEN c.user_id IS NULL THEN 0 ELSE 1 END AS cv
       |  FROM exposed e LEFT JOIN conv c ON e.user_id = c.user_id),
       |k AS (SELECT
       |  CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
       |  CAST(SUM(CASE WHEN arm = 0 THEN cv ELSE 0 END) AS BIGINT) AS x_a,
       |  CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
       |  CAST(SUM(CASE WHEN arm = 1 THEN cv ELSE 0 END) AS BIGINT) AS x_b
       |  FROM f)
       |SELECT n_a, x_a, n_b, x_b,
       |  x_a * 1000000 // n_a AS conv_a_ppm,
       |  x_b * 1000000 // n_b AS conv_b_ppm,
       |  (CAST(x_b AS DOUBLE) / CAST(n_b AS DOUBLE) - CAST(x_a AS DOUBLE) / CAST(n_a AS DOUBLE)) /
       |    sqrt((CAST(x_a AS DOUBLE) + CAST(x_b AS DOUBLE)) / (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE))
       |      * (1.0 - (CAST(x_a AS DOUBLE) + CAST(x_b AS DOUBLE)) / (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE)))
       |      * (1.0 / CAST(n_a AS DOUBLE) + 1.0 / CAST(n_b AS DOUBLE))) AS z_stat,
       |  ${w("x_a", "n_a", "-")} AS wilson_a_lo,
       |  ${w("x_a", "n_a", "+")} AS wilson_a_hi,
       |  ${w("x_b", "n_b", "-")} AS wilson_b_lo,
       |  ${w("x_b", "n_b", "+")} AS wilson_b_hi
       |FROM k""".stripMargin
  }

  /** GDPR right-to-be-forgotten cascade audit (beyond the reference —
    * the erasure certification every user-data pipeline must run):
    * the forget set is every customer with a negative account balance
    * (a deterministic, scale-proportional ~8% of the table); the
    * cascade walks the FK chain customer → orders → lineitem. Per
    * table it reports rows deleted, rows surviving, and a bit_xor
    * fingerprint of the surviving primary keys, so a verifier can
    * certify the erasure against an independently computed fingerprint
    * without re-reading history. Each table is ONE pass — a LEFT join
    * marks doomed rows and a single multi-aggregate folds both counts
    * and the fingerprint. At 100 TB the join's small side is always
    * the key set (forgotten customers, then their order keys), never a
    * fact table; AQE picks broadcast vs shuffle per stage, and the
    * xor fingerprint is commutative so it partial-aggregates map-side.
    */
  def forgetUserCascade(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val h60 = graft.operators.Dedup.hash60 _

    def report(name: String, flagged: DataFrame): DataFrame =
      flagged.agg(
        count(when($"del", 1)).as("deleted"),
        count(when(!$"del", 1)).as("surviving"),
        coalesce(expr("bit_xor(CASE WHEN NOT del THEN h END)"), lit(0L))
          .as("survivor_fp"))
        .select(lit(name).as("table_name"), $"deleted", $"surviving",
          $"survivor_fp")

    val cust = Tables.customer(spark, dir)
    val custFlagged = cust
      .withColumn("del", $"c_acctbal" < 0)
      .withColumn("h", h60($"c_custkey".cast("string")))
    val forgetKeys = cust.where($"c_acctbal" < 0)
      .select($"c_custkey".as("fk_cust"))

    val orders = Tables.orders(spark, dir)
    val ordersFlagged = orders
      .join(forgetKeys, orders("o_custkey") === forgetKeys("fk_cust"), "left")
      .withColumn("del", $"fk_cust".isNotNull)
      .withColumn("h", h60($"o_orderkey".cast("string")))
    val doomedOrders = orders
      .join(forgetKeys, orders("o_custkey") === forgetKeys("fk_cust"),
        "left_semi")
      .select($"o_orderkey".as("fk_order"))

    val li = Tables.lineitem(spark, dir)
    val liFlagged = li
      .join(doomedOrders, li("l_orderkey") === doomedOrders("fk_order"), "left")
      .withColumn("del", $"fk_order".isNotNull)
      .withColumn("h", h60(concat($"l_orderkey".cast("string"), lit(":"),
        $"l_linenumber".cast("string"))))

    report("customer", custFlagged)
      .unionAll(report("orders", ordersFlagged))
      .unionAll(report("lineitem", liFlagged))
      .orderBy($"table_name")
  }

  /** [[forgetUserCascade]] oracle — the same cascade as three CTE
    * passes; `h60x` must be the caller's md5-prefix BIGINT fragment.
    */
  def forgetUserCascadeSql(h60x: String => String): String = {
    def one(name: String, from: String, del: String, pk: String) =
      s"""SELECT '$name' AS table_name,
         |  COUNT(*) FILTER ($del) AS deleted,
         |  COUNT(*) FILTER (NOT ($del)) AS surviving,
         |  COALESCE(bit_xor(CASE WHEN NOT ($del)
         |    THEN ${h60x(pk)} END), 0) AS survivor_fp
         |FROM $from""".stripMargin
    s"""WITH fset AS (SELECT c_custkey FROM customer WHERE c_acctbal < 0),
       |doomed_o AS (SELECT o_orderkey FROM orders
       |             WHERE o_custkey IN (SELECT c_custkey FROM fset))
       |${one("customer", "customer", "c_acctbal < 0",
      "CAST(c_custkey AS VARCHAR)")}
       |UNION ALL
       |${one("orders", "orders",
      "o_custkey IN (SELECT c_custkey FROM fset)",
      "CAST(o_orderkey AS VARCHAR)")}
       |UNION ALL
       |${one("lineitem", "lineitem",
      "l_orderkey IN (SELECT o_orderkey FROM doomed_o)",
      "CAST(l_orderkey AS VARCHAR) || ':' || CAST(l_linenumber AS VARCHAR)")}
       |ORDER BY table_name""".stripMargin
  }

  /** EMD threshold for the [[tClosenessAudit]] gate: t = 0.2 in ppm. */
  val TClosenessPpm = 200000L

  /** t-closeness audit — the third rung of the disclosure-risk ladder
    * (Li, Li & Venkatasubramanian, ICDE 2007, public): a cell can be
    * l-diverse yet still leak if its sensitive-value DISTRIBUTION
    * differs from the table's. For the ordered sensitive attribute
    * (the same balance band as [[lDiversityAudit]]) the paper's
    * distance is the Earth Mover's Distance with unit adjacent-band
    * cost, which closed-forms to
    * `EMD = (1/(m-1)) * Σ_i |CDF_cell(i) - CDF_global(i)|`.
    *
    * Everything stays exact: the cumulative difference at band i is
    * `(N·cnb_i − n·cgb_i) / (n·N)`, so the per-cell score is the
    * integer `Σ|N·cnb − n·cgb|` scaled by `10^6 div ((m−1)·n·N)` — no
    * float ever decides the gate. Products run in DECIMAL(38,0)
    * (Spark) / HUGEINT (DuckDB): at 10^9 customers `N·cnb ≈ 10^18`
    * already brushes BIGINT, the [[Relational.excessShareSuppliers]]
    * overflow lesson.
    *
    * Scale shape: one (cell, band) sub-aggregate shuffle — the same
    * pass l-diversity makes — then a cells × m grid (m = global band
    * count, domain-bounded ≈ 12) with a per-cell window cumsum. The
    * global band census and the (N, m) totals are m-row/1-row
    * broadcasts; nothing driver-side grows with data.
    */
  def tClosenessAudit(spark: SparkSession, dir: String,
      tPpm: Long = TClosenessPpm): DataFrame = {
    import spark.implicits._
    tClosenessAuditOf(Tables.customer(spark, dir)
      .select($"c_mktsegment", $"c_nationkey",
        expr("(CAST(CAST(c_acctbal AS DECIMAL(12,2)) * 100 AS BIGINT)" +
          " + 100000) div 100000").as("bal_band")), tPpm)
  }

  /** [[tClosenessAudit]] over any (c_mktsegment, c_nationkey,
    * bal_band) relation with an ordered integer sensitive band.
    */
  def tClosenessAuditOf(banded: DataFrame, tPpm: Long): DataFrame = {
    val spark = banded.sparkSession
    import spark.implicits._
    val sub = banded.groupBy($"c_mktsegment", $"c_nationkey", $"bal_band")
      .agg(count(lit(1)).as("nb"))
    val gl = banded.groupBy($"bal_band").agg(count(lit(1)).as("gb"))
    val tot = gl.agg(sum($"gb").as("big_n"), count(lit(1)).as("m"))
    val cells = sub.groupBy($"c_mktsegment", $"c_nationkey")
      .agg(sum($"nb").as("n"))
    val grid = cells.crossJoin(broadcast(gl))
      .join(sub, Seq("c_mktsegment", "c_nationkey", "bal_band"), "left")
      .na.fill(0L, Seq("nb"))
    val w = Window.partitionBy($"c_mktsegment", $"c_nationkey")
      .orderBy($"bal_band")
    grid
      .withColumn("cnb", sum($"nb").over(w))
      .withColumn("cgb", sum($"gb").over(w))
      .crossJoin(broadcast(tot))
      .withColumn("diff", abs(
        $"big_n".cast("decimal(38,0)") * $"cnb" -
          $"n".cast("decimal(38,0)") * $"cgb"))
      .groupBy($"c_mktsegment", $"c_nationkey", $"n", $"big_n", $"m")
      .agg(sum($"diff").as("s"))
      .select($"c_mktsegment", $"c_nationkey", $"n",
        expr("CAST(s * 1000000 AS DECIMAL(38,0)) div " +
          "(CAST(greatest(m - 1, 1) AS DECIMAL(38,0)) * n * big_n)")
          .as("emd_ppm"))
      .withColumn("t_ok", $"emd_ppm" <= tPpm)
      .orderBy($"c_mktsegment", $"c_nationkey")
  }

  /** [[tClosenessAudit]] oracle — same banding, same grid, same
    * integer EMD; wide products in HUGEINT.
    */
  def tClosenessAuditSql(tPpm: Long = TClosenessPpm): String =
    s"""WITH b AS (SELECT c_mktsegment, c_nationkey,
       |    (CAST(CAST(c_acctbal AS DECIMAL(12,2)) * 100 AS BIGINT) + 100000) // 100000 AS bal_band
       |  FROM customer),
       |sub AS (SELECT c_mktsegment, c_nationkey, bal_band, COUNT(*) AS nb
       |  FROM b GROUP BY c_mktsegment, c_nationkey, bal_band),
       |gl AS (SELECT bal_band, COUNT(*) AS gb FROM b GROUP BY bal_band),
       |tot AS (SELECT CAST(SUM(gb) AS HUGEINT) AS big_n, COUNT(*) AS m FROM gl),
       |cells AS (SELECT c_mktsegment, c_nationkey, CAST(SUM(nb) AS HUGEINT) AS n
       |  FROM sub GROUP BY c_mktsegment, c_nationkey),
       |grid AS (SELECT c.c_mktsegment, c.c_nationkey, c.n, g.bal_band, g.gb,
       |    COALESCE(s.nb, 0) AS nb
       |  FROM cells c CROSS JOIN gl g
       |  LEFT JOIN sub s ON s.c_mktsegment = c.c_mktsegment
       |    AND s.c_nationkey = c.c_nationkey AND s.bal_band = g.bal_band),
       |cum AS (SELECT c_mktsegment, c_nationkey, n, bal_band,
       |    SUM(nb) OVER (PARTITION BY c_mktsegment, c_nationkey
       |      ORDER BY bal_band) AS cnb,
       |    SUM(gb) OVER (PARTITION BY c_mktsegment, c_nationkey
       |      ORDER BY bal_band) AS cgb
       |  FROM grid),
       |sc AS (SELECT c_mktsegment, c_nationkey, n,
       |    SUM(ABS((SELECT big_n FROM tot) * CAST(cnb AS HUGEINT)
       |      - n * CAST(cgb AS HUGEINT))) AS s
       |  FROM cum GROUP BY c_mktsegment, c_nationkey, n)
       |SELECT c_mktsegment, c_nationkey, CAST(n AS BIGINT) AS n,
       |  CAST(CAST(s AS HUGEINT) * 1000000 // (GREATEST((SELECT m FROM tot) - 1, 1)
       |    * n * (SELECT big_n FROM tot)) AS BIGINT) AS emd_ppm,
       |  CAST(CAST(s AS HUGEINT) * 1000000 // (GREATEST((SELECT m FROM tot) - 1, 1)
       |    * n * (SELECT big_n FROM tot)) AS BIGINT) <= $tPpm AS t_ok
       |FROM sc ORDER BY c_mktsegment, c_nationkey""".stripMargin

  /** Benford first-digit expectation, ppm: `round(log10(1 + 1/d)·10^6)`
    * for d = 1..9 — nine fixed literals (they sum to exactly 10^6), so
    * neither engine ever evaluates a log.
    */
  val BenfordPpm: Seq[(Int, Long)] = Seq(1 -> 301030L, 2 -> 176091L,
    3 -> 124939L, 4 -> 96910L, 5 -> 79181L, 6 -> 66947L, 7 -> 57992L,
    8 -> 51153L, 9 -> 45757L)

  /** Benford's-law audit over `l_extendedprice` (§2-beyond — the
    * forensic screen for fabricated or truncated monetary data;
    * Benford 1938 / Nigrini 2012, public): the leading significant
    * digit of naturally-scaled amounts follows log10(1+1/d). Emits per
    * digit the observed count, observed and expected shares in ppm,
    * and the exact chi-square contribution in micro-units:
    * `(n·10^6 − total·e_ppm)² div (total·e_ppm)` — algebraically
    * `10^6·(O−E)²/E` with O, E in counts — with EVERY product
    * (including the inner `n·10^6` and `total·e_ppm` terms and the
    * observed-ppm ratio) computed in DECIMAL(38,0) / HUGEINT: at
    * ~3·10^13 rows (the 100 TB regime) `total·e_ppm` alone exceeds
    * 2^63, where non-ANSI Spark would wrap silently while DuckDB
    * errors — so no term ever runs in 64-bit. The 9-digit
    * expectation table is a broadcast literal; the scan reduces in one
    * partial-aggregatable groupBy on a 9-value key. Digits are taken
    * from the integer cents' decimal string — pure integer→text, no
    * float log10 anywhere.
    */
  def benfordAudit(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    benfordAuditOf(Tables.lineitem(spark, dir).select(
      expr("CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)")
        .as("cents")))
  }

  /** [[benfordAudit]] over any single-column (cents: BIGINT, positive)
    * relation.
    */
  def benfordAuditOf(amounts: DataFrame): DataFrame = {
    val spark = amounts.sparkSession
    import spark.implicits._
    val counts = amounts
      .select(substring($"cents".cast("string"), 1, 1).cast("int")
        .as("digit"))
      .groupBy($"digit").agg(count(lit(1)).as("n"))
    val tot = counts.agg(sum($"n").as("total"))
    val expected = BenfordPpm.toDF("digit", "expected_ppm")
    expected
      .join(broadcast(counts), Seq("digit"), "left")
      .na.fill(0L, Seq("n"))
      .crossJoin(broadcast(tot))
      .withColumn("nw", expr("CAST(n AS DECIMAL(38,0))"))
      .withColumn("totw", expr("CAST(total AS DECIMAL(38,0))"))
      .withColumn("dev", expr("nw * 1000000 - totw * expected_ppm"))
      .select($"digit", $"n",
        expr("nw * 1000000 div totw").as("observed_ppm"),
        $"expected_ppm",
        expr("dev * dev div (totw * expected_ppm)").as("chi2_micro"))
      .orderBy($"digit")
  }

  /** [[benfordAudit]] oracle. */
  def benfordAuditSql(): String = {
    val values = BenfordPpm.map { case (d, p) => s"($d, ${p})" }
      .mkString(", ")
    s"""WITH amt AS (SELECT CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
       |  FROM lineitem),
       |c AS (SELECT CAST(substring(CAST(cents AS VARCHAR), 1, 1) AS INTEGER) AS digit,
       |    COUNT(*) AS n
       |  FROM amt GROUP BY 1),
       |tot AS (SELECT CAST(SUM(n) AS HUGEINT) AS total FROM c),
       |e(digit, expected_ppm) AS (VALUES $values),
       |w AS (SELECT e.digit, CAST(COALESCE(c.n, 0) AS HUGEINT) AS nw,
       |    CAST(e.expected_ppm AS HUGEINT) AS ew,
       |    (SELECT total FROM tot) AS totw
       |  FROM e LEFT JOIN c ON e.digit = c.digit)
       |SELECT digit, CAST(nw AS BIGINT) AS n,
       |  CAST(nw * 1000000 // totw AS BIGINT) AS observed_ppm,
       |  CAST(ew AS BIGINT) AS expected_ppm,
       |  CAST((nw * 1000000 - totw * ew) * (nw * 1000000 - totw * ew)
       |    // (totw * ew) AS BIGINT) AS chi2_micro
       |FROM w ORDER BY digit""".stripMargin
  }
}
