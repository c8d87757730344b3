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
}
