package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal joins Spark has no native operator for: as-of
  * (point-in-time) and tolerance range joins.
  *
  * Both avoid the naive theta-join (an O(n·m) BroadcastNestedLoopJoin
  * at plan time, a non-starter at scale) by reducing to shapes Catalyst
  * executes well:
  *
  *  - As-of: union both sides and take a running `last(...ignoreNulls)`
  *    over a per-key time-ordered window — ONE shuffle on the key, one
  *    sort, linear scan; the same plan kdb's `aj` and Flink's temporal
  *    join lower to. No range explosion, no per-row probe.
  *  - Range (|Δt| ≤ tol): quantize time into tol-width buckets, probe
  *    the three adjacent buckets, equi-join on (key, bucket), then
  *    filter the exact predicate — candidates are bounded by bucket
  *    occupancy, so the join stays an equi shuffle join at any scale.
  *
  * Extends the reference's event-attribution semantics
  * (spark_streaming_kafka.py:11–60 joins live events against history)
  * from equality matching to time-travel matching.
  */
object Temporal {

  /** Point-in-time join: for each `left` row, the single `right` row
    * with the greatest `rightTs` ≤ `leftTs` within the same `keys`
    * (ties on the timestamp resolved toward the greatest `rightOrd`).
    * Left rows with no such match keep NULL payload columns (left
    * outer as-of).
    *
    * `leftOrd`/`rightOrd` must make (ts, ord) unique per key on their
    * side — they pin a total sort order so the result is deterministic
    * run-to-run and engine-to-engine.
    *
    * Output: every `left` column, then `rightPayload` columns renamed
    * with `prefix`. Plan shape: one Exchange on `keys`, one sort, one
    * running-window pass — nothing quadratic, nothing broadcast.
    */
  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, leftOrd: String, rightOrd: String,
      rightPayload: Seq[String], prefix: String = "asof_"): DataFrame = {
    val l2 = left.select(
      keys.map(col) ++ Seq(col(leftTs).as("__ts"), col(leftOrd).as("__ord"),
        lit(1).as("__tag"),
        struct(left.columns.map(col): _*).as("__l")): _*)
    val r2 = right.select(
      keys.map(col) ++ Seq(col(rightTs).as("__ts"), col(rightOrd).as("__ord"),
        lit(0).as("__tag"),
        struct(rightPayload.map(col): _*).as("__r")): _*)
    // unionByName fills each side's missing struct with a typed NULL;
    // __tag orders right rows before left at an equal timestamp, so a
    // payload AT the left row's time is visible (as-of ≤ semantics)
    val u = l2.unionByName(r2, allowMissingColumns = true)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts"), col("__tag"), col("__ord"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    u.withColumn("__m", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__tag") === 1)
      .select(col("__l.*") +:
        rightPayload.map(p => col(s"__m.$p").as(s"$prefix$p")): _*)
  }

  /** All (a, b) pairs sharing `keys` with |aTs − bTs| ≤ `tol` (both
    * timestamps in the same integer unit, `tol` > 0). Each qualifying
    * pair matches in exactly one probe bucket, so no dedup pass is
    * needed. Output: every `a` column plus `bPayload` (renamed with
    * `prefix`); `a` rows with no partner are absent (inner semantics —
    * wrap with a left join on `a` for outer counts).
    */
  def rangeJoin(a: DataFrame, b: DataFrame, keys: Seq[String],
      aTs: String, bTs: String, tol: Long, bPayload: Seq[String],
      prefix: String = "near_"): DataFrame = {
    require(tol > 0, "tol must be positive")
    // integer bucket arithmetic: the microsecond epoch exceeds a double
    // mantissa, so `div`, not `/`
    val pa = a.withColumn("__probe",
      explode(array(lit(-1L), lit(0L), lit(1L))))
      .withColumn("__bucket", expr(s"$aTs div $tol") + col("__probe"))
      .drop("__probe")
    val pb = b.select(
      keys.map(col) ++ Seq(expr(s"$bTs div $tol").as("__bucket"),
        col(bTs).as("__bts"),
        struct(bPayload.map(col): _*).as("__b")): _*)
    pa.join(pb, keys :+ "__bucket")
      .filter(abs(col(aTs) - col("__bts")) <= tol)
      .select(a.columns.map(col) ++
        bPayload.map(p => col(s"__b.$p").as(s"$prefix$p")): _*)
  }

  // ---- driver-contract queries ----

  /** Oracle-checked as-of query: each purchase event attributed to the
    * user's most recent click at-or-before it. Clicks are first
    * deduplicated to one per (user, µs) — max event_id — so the as-of
    * pick is unambiguous in both engines (DuckDB's ASOF JOIN leaves
    * the equal-timestamp winner unspecified otherwise).
    */
  def asofAttributionQuery(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = graft.Tables.events(spark, dir)
      .select($"event_id", $"user_id", expr("ts div 1000").as("tsu"),
        $"value", $"event_type")
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"event_id", $"user_id", $"tsu", $"value")
    val clicks = ev.filter($"event_type" === "click")
      .groupBy($"user_id", $"tsu").agg(max($"event_id").as("click_id"))
      .select($"user_id", $"tsu".as("click_tsu"), $"click_id")
    asofJoin(purchases, clicks, Seq("user_id"), "tsu", "click_tsu",
        "event_id", "click_id", Seq("click_id", "click_tsu"), prefix = "")
      .orderBy($"event_id")
  }

  /** Oracle-checked range-join query: per error event, how many clicks
    * the same user produced within ±5 minutes (error-burst context, the
    * classic ops correlation). Inner pairs come from [[rangeJoin]];
    * a left join puts zero-click errors back (count 0).
    */
  def nearbyClicksQuery(spark: SparkSession, dir: String,
      tolUs: Long = 300L * 1000000L): DataFrame = {
    import spark.implicits._
    val ev = graft.Tables.events(spark, dir)
      .select($"event_id", $"user_id", expr("ts div 1000").as("tsu"),
        $"event_type")
    val errors = ev.filter($"event_type" === "error")
      .select($"event_id", $"user_id", $"tsu")
    val clicks = ev.filter($"event_type" === "click")
      .select($"user_id", $"tsu".as("c_tsu"), $"event_id".as("c_id"))
    val pairs = rangeJoin(errors, clicks, Seq("user_id"), "tsu", "c_tsu",
      tolUs, Seq("c_id"))
    val counts = pairs.groupBy($"event_id").agg(count(lit(1)).as("n_clicks"))
    errors.join(counts, Seq("event_id"), "left")
      .select($"event_id", $"user_id", $"tsu",
        coalesce($"n_clicks", lit(0L)).as("n_clicks"))
      .orderBy($"event_id")
  }

  /** Attribution window for [[positionAttribution]] (µs). */
  val AttributionWindowUs = 1800L * 1000000L

  /** Conversion horizon for [[labelHorizon]] (µs): 7 days. */
  val LabelHorizonUs = 7L * 86400L * 1000000L

  /** Per-group OLS trend — value-vs-time regression from EXACT BIGINT
    * co-moments, the time-series sibling of [[Audit.corrMoments]]:
    * x = hour index since the corpus epoch (bounded ints), y = exact
    * cents; (n, Σx, Σy, Σxy, Σx²) is one partial+final aggregate pass
    * and the mergeable state a backfill ships; slope and intercept are
    * derived AFTER aggregation through one fixed IEEE expression tree
    * (slope first, intercept reusing it), so the doubles are
    * bit-identical across engines. Overflow-free: Σxy ≤ rows·720·56k
    * stays < 2^63 past 10⁹ rows.
    */
  def trendSlope(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = graft.Tables.events(spark, dir)
      .select($"event_type",
        expr("ts div 3600000000000").as("h"),
        ($"value".cast("decimal(18,2)") * 100).cast("long").as("cents"))
    val h0 = ev.agg(min($"h")).first().getLong(0)
    val x = $"h" - h0
    val m = ev.groupBy($"event_type")
      .agg(count(lit(1)).as("n"), sum(x).as("sx"), sum($"cents").as("sy"),
        sum(x * $"cents").as("sxy"), sum(x * x).as("sxx"))
    m.select($"event_type", $"n", $"sx", $"sy", $"sxy", $"sxx",
        (($"n" * $"sxy" - $"sx" * $"sy").cast("double") /
          ($"n" * $"sxx" - $"sx" * $"sx").cast("double"))
          .as("slope_cents_per_hour"))
      .select($"event_type", $"n", $"sx", $"sy", $"sxy", $"sxx",
        $"slope_cents_per_hour",
        (($"sy".cast("double") - $"slope_cents_per_hour" * $"sx".cast("double"))
          / $"n".cast("double")).as("intercept_cents"))
      .orderBy($"event_type")
  }

  /** OHLC downsampling — the financial-bar shape every time-series
    * store offers: per (event_type, hour) the open/high/low/close of
    * the cents value plus volume. Open/close are struct-min/max over
    * (tsu, event_id, cents) — the total (time, id) order makes the
    * first/last picks engine-identical even with equal timestamps —
    * and the whole bar is ONE partial-aggregatable shuffle.
    */
  def ohlcBars(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = graft.Tables.events(spark, dir)
      .select($"event_type", expr("ts div 3600000000000").as("h"),
        expr("ts div 1000").as("tsu"), $"event_id",
        ($"value".cast("decimal(18,2)") * 100).cast("long").as("cents"))
    ev.groupBy($"event_type", $"h")
      .agg(
        min(struct($"tsu", $"event_id", $"cents")).as("o"),
        max($"cents").as("high_cents"),
        min($"cents").as("low_cents"),
        max(struct($"tsu", $"event_id", $"cents")).as("c"),
        count(lit(1)).as("volume"),
        sum($"cents").as("sum_cents"))
      .select($"event_type", $"h", $"o.cents".as("open_cents"),
        $"high_cents", $"low_cents", $"c.cents".as("close_cents"),
        $"volume", $"sum_cents")
      .orderBy($"event_type", $"h")
  }

  /** Horizon label generation — the supervised-label stage of a
    * training pipeline, done leakage-safely: for each user, the label
    * is whether a purchase occurs STRICTLY AFTER their first click and
    * within the 7-day horizon. Both boundaries are exact integer µs
    * comparisons; users who never clicked are absent (no anchor).
    * Shape: two partial-aggregatable per-user reductions (first click;
    * earliest qualifying purchase via min-over-filter) and a broadcast
    * of nothing — the events table shuffles once per reduction on
    * user_id.
    */
  def labelHorizon(spark: SparkSession, dir: String,
      horizonUs: Long = LabelHorizonUs): DataFrame = {
    import spark.implicits._
    val ev = graft.Tables.events(spark, dir)
      .select($"event_id", $"user_id", expr("ts div 1000").as("tsu"),
        $"event_type")
    val anchors = ev.filter($"event_type" === "click")
      .groupBy($"user_id").agg(min($"tsu").as("first_click_tsu"))
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"user_id", $"tsu".as("p_tsu"))
    anchors.join(purchases, Seq("user_id"), "left")
      .groupBy($"user_id", $"first_click_tsu")
      .agg(max(when($"p_tsu" > $"first_click_tsu" &&
          $"p_tsu" <= $"first_click_tsu" + horizonUs, 1L).otherwise(0L))
        .as("label"))
      .orderBy($"user_id")
  }

  /** Point-in-time (feature-store) join — the correctness pattern that
    * keeps training features leakage-free: each label row (purchase)
    * is enriched with every feature table AS OF the label timestamp,
    * never after it. Two [[asofJoin]] passes (clicks and errors, each
    * deduplicated to one per (user, µs) so the as-of pick is
    * unambiguous), LEFT semantics so a label with no prior feature
    * keeps NULLs plus a staleness column per feature — exactly what a
    * feature store's `get_historical_features` emits.
    */
  def pointInTimeJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = graft.Tables.events(spark, dir)
      .select($"event_id", $"user_id", expr("ts div 1000").as("tsu"),
        $"event_type")
    val labels = ev.filter($"event_type" === "purchase")
      .select($"event_id", $"user_id", $"tsu")
    def feature(eventType: String, idName: String, tsName: String) =
      ev.filter($"event_type" === eventType)
        .groupBy($"user_id", $"tsu").agg(max($"event_id").as(idName))
        .select($"user_id", $"tsu".as(tsName), col(idName))
    val withClick = asofJoin(labels,
      feature("click", "click_id", "click_tsu"),
      Seq("user_id"), "tsu", "click_tsu", "event_id", "click_id",
      Seq("click_id", "click_tsu"), prefix = "")
    val withBoth = asofJoin(withClick,
      feature("error", "error_id", "error_tsu"),
      Seq("user_id"), "tsu", "error_tsu", "event_id", "error_id",
      Seq("error_id", "error_tsu"), prefix = "")
    withBoth.select($"event_id", $"user_id", $"tsu",
        $"click_id", $"click_tsu", ($"tsu" - $"click_tsu").as("click_age_us"),
        $"error_id", $"error_tsu", ($"tsu" - $"error_tsu").as("error_age_us"))
      .orderBy($"event_id")
  }

  /** Position-based (U-shaped) multi-touch attribution — the marketing
    * credit model between last-touch ([[asofAttributionQuery]]) and
    * uniform linear: for each purchase, every click in the preceding
    * 30-minute window shares the conversion credit 40/20/40 — first
    * touch 400k ppm, last touch 400k ppm, middles split 200k ppm.
    * Credits are EXACT integer ppm and sum to exactly 1,000,000 per
    * purchase by construction: the middle split is floor division and
    * the remainder rides the first touch (n=1 → 1M, n=2 → 500k each) —
    * deterministic in both engines, spec-asserted.
    *
    * Scale shape: candidate pairs come from the bucketed [[rangeJoin]]
    * (each pair found in exactly one probe bucket — no quadratic
    * window self-join), positions from a per-purchase window over the
    * few clicks inside 30 minutes.
    */
  def positionAttribution(spark: SparkSession, dir: String,
      windowUs: Long = AttributionWindowUs): DataFrame = {
    import spark.implicits._
    val ev = graft.Tables.events(spark, dir)
      .select($"event_id", $"user_id", expr("ts div 1000").as("tsu"),
        $"event_type")
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"event_id".as("purchase_id"), $"user_id", $"tsu")
    val clicks = ev.filter($"event_type" === "click")
      .select($"user_id", $"tsu".as("c_tsu"), $"event_id".as("c_id"))
    val pairs = rangeJoin(purchases, clicks, Seq("user_id"), "tsu", "c_tsu",
        windowUs, Seq("c_tsu", "c_id"), prefix = "")
      .filter($"c_tsu" < $"tsu") // strictly-before touches only
    val w = Window.partitionBy($"purchase_id")
    val positioned = pairs.select($"purchase_id", $"c_id".as("click_id"),
      row_number().over(w.orderBy($"c_tsu", $"c_id")).as("pos"),
      count(lit(1)).over(w).as("n_touches"))
    positioned.select($"purchase_id", $"click_id", $"pos", $"n_touches",
        when($"n_touches" === 1, lit(1000000L))
          .when($"n_touches" === 2, lit(500000L))
          .when($"pos" === 1,
            lit(400000L) + expr("200000L % (n_touches - 2)"))
          .when($"pos" === $"n_touches", lit(400000L))
          .otherwise(expr("200000L div (n_touches - 2)"))
          .as("credit_ppm"))
      .orderBy($"purchase_id", $"pos")
  }

  /** SAX geometry: 8 symbol levels of width 64 over the value domain
    * [0, 512) — power-of-two widths, so symbolization is one exact
    * IEEE divide+floor in both engines (same argument as the
    * histogram-quantile bins) — and 4-symbol motif words.
    */
  val SaxLevels = 8
  val SaxLevelWidth = 64.0
  val SaxWord = 4

  /** SAX time-series motif discovery (Lin et al.'s symbolic aggregate
    * approximation, the standard first move of distributed time-series
    * similarity search): each user's event-value series becomes a
    * symbol string, every [[SaxWord]]-symbol sliding window becomes a
    * word, and a MOTIF is a word that appears in ≥ 2 distinct users'
    * series — the cross-series repeated pattern a monitoring pipeline
    * hunts for.
    *
    * The same inverted-index shape as n-gram dedup, applied to time
    * series: per-user symbolization is one shuffle into time-sorted
    * lists (the sessionize bound), word explosion is a projection,
    * and the motif aggregate is partial-aggregatable on the word —
    * never an all-pairs series comparison.
    */
  def saxMotifs(spark: SparkSession, dir: String,
      minUsers: Int = 2): DataFrame =
    saxMotifsOf(graft.Tables.events(spark, dir), minUsers)

  /** [[saxMotifs]] over any (user_id, event_id, ts NANOS-LONG, value). */
  def saxMotifsOf(events: DataFrame, minUsers: Int = 2): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val syms = events
      .select($"user_id", $"event_id", expr("ts div 1000").as("tsu"),
        // clamp BOTH ends like histogramQuantilesOf: a negative value
        // bins to level 0 instead of indexing letters at <= 0 (which
        // throws in Spark but NULLs in DuckDB — divergent failures)
        greatest(lit(0), least(lit(SaxLevels - 1),
          floor($"value" / lit(SaxLevelWidth)))).cast("int").as("lvl"))
      // (tsu, event_id) pins a total per-user order, like sessionize
      .groupBy($"user_id")
      .agg(sort_array(collect_list(struct($"tsu", $"event_id", $"lvl")))
        .as("seq"))
      .select($"user_id",
        transform($"seq", e => e.getField("lvl")).as("lvls"))
    val letters = typedLit(('a' until ('a' + SaxLevels).toChar).map(_.toString))
    val words = syms
      .select($"user_id", transform($"lvls",
        l => element_at(letters, l + 1)).as("syms"))
      .filter(size($"syms") >= SaxWord)
      .select($"user_id", explode(transform(
        sequence(lit(1), size($"syms") - lit(SaxWord - 1)),
        i => concat_ws("", slice($"syms", i, lit(SaxWord))))).as("word"))
    words.groupBy($"word")
      .agg(countDistinct($"user_id").as("n_users"),
        count(lit(1)).as("n_occurrences"))
      .filter($"n_users" >= minUsers)
      .orderBy($"word")
  }

  /** Per-user EWMA (α = 1/2) of event values in event order — the
    * exponential-decay recency score every feature store keeps per
    * entity. Values are scaled to integer cents and each step is exact
    * integer floor arithmetic, state = (state + v) div 2, so the fold
    * is bit-identical in both engines (DuckDB `list_reduce` seeds with
    * the first element; the Spark fold mirrors that: init = vs[0],
    * fold over the tail).
    *
    * Scale shape: ONE shuffle into per-user time-sorted lists (the
    * sessionize bound) and a linear projection fold; per-user state is
    * one long. The event_id order is total, so no tie can reorder the
    * fold.
    */
  def ewmaValue(spark: SparkSession, dir: String): DataFrame =
    ewmaValueOf(graft.Tables.events(spark, dir))

  /** [[ewmaValue]] over any (user_id, event_id, value) relation. */
  def ewmaValueOf(events: DataFrame): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select($"user_id", $"event_id",
        ($"value".cast("decimal(18,2)") * 100).cast("long").as("cents"))
      .groupBy($"user_id")
      .agg(sort_array(collect_list(struct($"event_id", $"cents"))).as("seq"))
      .select($"user_id",
        expr("transform(seq, e -> e.cents)").as("vs"))
      .select($"user_id",
        size($"vs").cast("long").as("n_events"),
        expr("aggregate(slice(vs, 2, greatest(size(vs) - 1, 0)), vs[0]," +
          " (acc, x) -> (acc + x) div 2)").as("ewma_cents"))
      .orderBy($"user_id")
  }

  /** Interval-concurrency sweep: how many orders are OPEN (placed but
    * not yet fully shipped) at each breakpoint day — the classic
    * +1/−1 delta-sweep statement of interval overlap counting, the
    * shape that replaces a quadratic interval self-join at any scale.
    * Each order contributes two deltas (+1 at its order day, −1 the
    * day after its last ship day); deltas pre-aggregate per day
    * (partial+final — data-sized work all partial-aggregatable), and
    * the running sum then walks a frame bounded by the CALENDAR (a few
    * thousand day rows regardless of corpus size), so the global
    * window is constant-sized, not data-sized — unlike a naive
    * per-order running sum. Emitted rows are the step function's
    * breakpoints; days between breakpoints hold the last emitted
    * count.
    */
  def openOrdersDaily(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // day index = pure calendar datediff from the epoch date (the
    // corpus timestamps are NTZ; no timezone may enter the arithmetic)
    val shipped = graft.Tables.lineitem(spark, dir)
      .groupBy($"l_orderkey")
      .agg(max(expr("datediff(CAST(l_shipdate AS DATE), DATE '1970-01-01')"))
        .as("d1"))
    // the synthetic corpus contains orders whose last ship day PRECEDES
    // the order day; clamp to [d0, max(d0, d1)] (an order is open at
    // least on its placement day) so no interval is inverted — an
    // inverted interval would make the sweep and the per-day coverage
    // count disagree (spec-pinned)
    val iv = graft.Tables.orders(spark, dir)
      .join(shipped, $"o_orderkey" === $"l_orderkey")
      .select(expr("datediff(CAST(o_orderdate AS DATE), DATE '1970-01-01')")
        .cast("long").as("d0"), $"d1".cast("long").as("d1"))
      .select($"d0", greatest($"d0", $"d1").as("d1"))
    val deltas = iv.select($"d0".as("day"), lit(1L).as("d"))
      .unionAll(iv.select(($"d1" + 1).as("day"), lit(-1L).as("d")))
      .groupBy($"day").agg(sum($"d").as("delta"))
    deltas
      .withColumn("open_cnt", sum($"delta").over(
        org.apache.spark.sql.expressions.Window.orderBy($"day")
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
      .select($"day", $"delta", $"open_cnt")
      .orderBy($"day")
  }

  /** DuckDB mirror of [[openOrdersDaily]]: same deltas, same sweep. */
  def openOrdersSql: String =
    """WITH sh AS (SELECT l_orderkey,
      |    MAX(datediff('day', DATE '1970-01-01', CAST(l_shipdate AS DATE)))
      |      AS d1
      |  FROM lineitem GROUP BY l_orderkey),
      |iv AS (SELECT d0, GREATEST(d0, d1) AS d1 FROM (SELECT
      |    datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS d0,
      |    d1
      |  FROM orders JOIN sh ON o_orderkey = l_orderkey)),
      |dl AS (SELECT day, CAST(SUM(d) AS BIGINT) AS delta FROM (
      |    SELECT d0 AS day, 1 AS d FROM iv
      |    UNION ALL SELECT d1 + 1, -1 FROM iv)
      |  GROUP BY day)
      |SELECT day, delta,
      |  CAST(SUM(delta) OVER (ORDER BY day
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |    AS open_cnt
      |FROM dl ORDER BY day""".stripMargin

  /** Trailing-window size and the squared z-threshold (k = 3 → k² = 9)
    * for [[anomalyZscore]], shared with the oracle SQL.
    */
  val AnomalyWindow = 20
  val AnomalyK2 = 9L
  val AnomalyMinN = 8

  /** Trailing-window z-score anomaly flags — the monitoring primitive
    * every event pipeline runs: an event is anomalous when it sits
    * more than k standard deviations from the mean of the SAME user's
    * previous [[AnomalyWindow]] events (at least [[AnomalyMinN]] of
    * them, so a 2-event history can't fire). The test is stated
    * entirely in exact integers: with cents x, trailing count n,
    * trailing sums s = Σx and s2 = Σx², the z² > k² inequality
    * multiplies out to (n·x − s)² > k²·(n·s2 − s²) — no division, no
    * sqrt, no float, so both engines agree to the bit. Magnitudes are
    * bounded (x ≤ 5·10⁴ cents, n ≤ 20 → every term ≤ ~10¹³ ≪ 2⁶³).
    *
    * Scale shape: ONE shuffle by user into the standard bounded-frame
    * window ([[Relational.movingWindowFeatures]]' bound — frame size is
    * a constant 20, never a whole partition), then a pure projection.
    */
  def anomalyZscore(spark: SparkSession, dir: String): DataFrame =
    anomalyZscoreOf(graft.Tables.events(spark, dir))

  /** [[anomalyZscore]] over any (user_id, event_id, ts, value). */
  def anomalyZscoreOf(events: DataFrame): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val w = Window.partitionBy($"user_id")
      .orderBy($"tsu", $"event_id")
      .rowsBetween(-AnomalyWindow, -1)
    events
      .select($"user_id", $"event_id", expr("ts div 1000").as("tsu"),
        ($"value".cast("decimal(18,2)") * 100).cast("long").as("cents"))
      .withColumn("n", count($"cents").over(w))
      .withColumn("s", sum($"cents").over(w))
      .withColumn("s2", sum($"cents" * $"cents").over(w))
      .filter($"n" >= AnomalyMinN &&
        ($"n" * $"cents" - $"s") * ($"n" * $"cents" - $"s") >
          lit(AnomalyK2) * ($"n" * $"s2" - $"s" * $"s"))
      .select($"event_id", $"user_id", $"cents", $"n",
        ($"n" * $"cents" - $"s").as("dev_num"))
      .orderBy($"event_id")
  }

  /** DuckDB mirror of [[anomalyZscoreOf]]: the same integer inequality
    * over the same trailing frame.
    */
  def anomalyZscoreSql: String =
    s"""WITH c AS (SELECT user_id, event_id, epoch_us(ts) AS tsu,
       |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
       |  FROM events),
       |t AS (SELECT user_id, event_id, cents,
       |    COUNT(cents) OVER w AS n,
       |    CAST(SUM(cents) OVER w AS BIGINT) AS s,
       |    CAST(SUM(cents * cents) OVER w AS BIGINT) AS s2
       |  FROM c
       |  WINDOW w AS (PARTITION BY user_id ORDER BY tsu, event_id
       |    ROWS BETWEEN $AnomalyWindow PRECEDING AND 1 PRECEDING))
       |SELECT event_id, user_id, cents, n, n * cents - s AS dev_num
       |FROM t
       |WHERE n >= $AnomalyMinN
       |  AND (n * cents - s) * (n * cents - s) > $AnomalyK2 * (n * s2 - s * s)
       |ORDER BY event_id""".stripMargin

  /** DuckDB mirror of [[ewmaValueOf]]: the same seeded integer fold. */
  def ewmaSql: String = ewmaSqlOver("events")

  /** [[ewmaSql]] over any relation expression (the streaming form runs
    * it over the capped harness subset).
    */
  def ewmaSqlOver(table: String): String =
    s"""WITH s AS (SELECT user_id, event_id,
      |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
      |  FROM $table),
      |l AS (SELECT user_id, list(cents ORDER BY event_id) AS vs,
      |    COUNT(*) AS n_events
      |  FROM s GROUP BY user_id)
      |SELECT user_id, n_events,
      |  CASE WHEN len(vs) = 1 THEN vs[1]
      |       ELSE list_reduce(vs, (a, b) -> (a + b) // 2) END AS ewma_cents
      |FROM l ORDER BY user_id""".stripMargin

  /** DuckDB mirror of [[saxMotifs]] (same levels, same word length). */
  def saxMotifsSql(minUsers: Int = 2): String = {
    val letters = ('a' until ('a' + SaxLevels).toChar)
      .map(c => s"'$c'").mkString("[", ", ", "]")
    s"""WITH sy AS (SELECT user_id, event_id,
       |    CAST(epoch_us(ts) AS BIGINT) AS tsu,
       |    CAST(GREATEST(0, LEAST(${SaxLevels - 1}, FLOOR(value / $SaxLevelWidth))) AS INTEGER) AS lvl
       |  FROM events),
       |s AS (SELECT user_id,
       |    list_transform(list(lvl ORDER BY tsu, event_id),
       |      l -> ($letters)[l + 1]) AS syms
       |  FROM sy GROUP BY user_id),
       |w AS (SELECT user_id, unnest(list_transform(
       |    generate_series(1, len(syms) - ${SaxWord - 1}),
       |    i -> array_to_string(syms[i:i+${SaxWord - 1}], ''))) AS word
       |  FROM s WHERE len(syms) >= $SaxWord)
       |SELECT word, COUNT(DISTINCT user_id) AS n_users,
       |  COUNT(*) AS n_occurrences
       |FROM w GROUP BY word HAVING COUNT(DISTINCT user_id) >= $minUsers
       |ORDER BY word""".stripMargin
  }

  /** Exact sliding-window distinct count (§2-beyond — "7-day active
    * users", the DAU/WAU primitive). COUNT(DISTINCT) over a RANGE frame
    * is not a window Spark (or any engine) can evaluate incrementally,
    * and the naive grid×events range join re-reads every event once per
    * window day. Instead each (user, day) pair — already deduplicated
    * by a partial-aggregatable distinct — is EXPLODED into the ≤
    * `windowDays` window-end days it contributes to, and the result is
    * one count-distinct per day. The shuffle volume is bounded by
    * |distinct (user,day)| · windowDays regardless of raw event count,
    * and both phases are two-level aggregations with map-side combine.
    * The 1-row max-day frame broadcasts (the stats-frame crossJoin
    * idiom) to trim phantom trailing days.
    */
  def rollingDistinctUsers(spark: SparkSession, dir: String,
                           windowDays: Int = 7): DataFrame =
    rollingDistinctUsersOf(graft.Tables.events(spark, dir), windowDays)

  /** The testable core over any (user_id, ts) event frame. */
  def rollingDistinctUsersOf(events: DataFrame,
                             windowDays: Int = 7): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val days = events
      .select($"user_id", expr("ts div 86400000000000").as("day"))
      .distinct()
    val maxDay = days.agg(max($"day").as("max_day"))
    days
      .withColumn("window_day",
        explode(expr(s"sequence(day, day + ${windowDays - 1})")))
      .crossJoin(broadcast(maxDay))
      .filter($"window_day" <= $"max_day")
      .groupBy($"window_day")
      .agg(countDistinct($"user_id").as("active_users"))
      .orderBy($"window_day")
  }

  /** Daily gap-fill with forward fill (§2-beyond — resampling an
    * irregular event stream onto a regular grid, the first step of
    * every time-series feature pipeline). Three declarative stages:
    * (1) last value per (user, day) by the (ts, event_id) total order —
    * a windowed row_number, partial per input split; (2) the per-user
    * day grid from min to max day via `sequence` + `explode` — span-
    * bounded, no driver enumeration; (3) a co-partitioned left join
    * back and `last(value, ignoreNulls)` over an unbounded-preceding
    * frame for the fill. The grid's first day always carries a real
    * value, so no leading nulls. Carried values are untouched input
    * doubles — cross-engine exact. All three shuffles share the
    * user_id key; at scale the join is co-located with the window.
    */
  def gapFillDaily(spark: SparkSession, dir: String): DataFrame =
    gapFillDailyOf(graft.Tables.events(spark, dir))

  /** The testable core over any (user_id, ts, event_id, value) frame. */
  def gapFillDailyOf(events: DataFrame): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val wDay = Window.partitionBy($"user_id", $"day")
      .orderBy($"ts".desc, $"event_id".desc)
    val daily = events
      .select($"user_id", expr("ts div 86400000000000").as("day"),
        $"ts", $"event_id", $"value")
      .withColumn("rn", row_number().over(wDay))
      .filter($"rn" === 1)
      .select($"user_id", $"day", $"value")
    val grid = daily.groupBy($"user_id")
      .agg(min($"day").as("d0"), max($"day").as("d1"))
      .withColumn("day", explode(expr("sequence(d0, d1)")))
      .select($"user_id", $"day")
    val wFill = Window.partitionBy($"user_id").orderBy($"day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(daily, Seq("user_id", "day"), "left")
      .withColumn("filled_value", last($"value", ignoreNulls = true).over(wFill))
      .select($"user_id", $"day", $"filled_value")
      .orderBy($"user_id", $"day")
  }

  /** Rolling-median frame size (rows: 9 preceding + current). */
  val MedianFrame = 10

  /** Exact rolling median — the robust sibling of a trailing mean: per
    * user, the LOWER median of the last ≤[[MedianFrame]] cent values in
    * (tsu, event_id) order. Exact and integer (lower median = element
    * (n+1) div 2 of the sorted frame — no interpolation, no floats),
    * computed as a bounded `collect_list` frame + `array_sort` +
    * `element_at`, all codegen HOFs. The frame bound is what keeps it
    * scale-safe: per-row state is ≤ 10 longs regardless of history
    * (an unbounded exact running median needs an order-statistics
    * structure no window API provides). The mean sits alongside — on
    * bursty values the median's robustness is visible in the data, and
    * the oracle checks both.
    */
  def rollingMedian(spark: SparkSession, dir: String): DataFrame =
    rollingMedianOf(graft.Tables.events(spark, dir))

  /** [[rollingMedian]] over any (user_id, event_id, ts NANOS, value). */
  def rollingMedianOf(events: DataFrame): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"tsu", $"event_id")
      .rowsBetween(-(MedianFrame - 1), 0)
    events
      .select($"user_id", $"event_id", expr("ts div 1000").as("tsu"),
        expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)").as("cents"))
      .withColumn("frame", array_sort(collect_list($"cents").over(w)))
      .select($"user_id", $"event_id", $"tsu", $"cents",
        element_at($"frame", expr("CAST((size(frame) + 1) div 2 AS INT)"))
          .as("med_cents"),
        expr("aggregate(frame, 0L, (a, x) -> a + x) div size(frame)")
          .as("mean_cents"))
      .orderBy($"user_id", $"event_id")
  }

  /** [[rollingMedian]] oracle. */
  def rollingMedianSql(): String =
    s"""WITH x AS (
       |  SELECT user_id, event_id, CAST(epoch_us(ts) AS BIGINT) AS tsu,
       |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
       |  FROM events),
       |f AS (SELECT user_id, event_id, tsu, cents,
       |    list_sort(list(cents) OVER (PARTITION BY user_id
       |      ORDER BY tsu, event_id
       |      ROWS BETWEEN ${MedianFrame - 1} PRECEDING AND CURRENT ROW)) AS frame
       |  FROM x)
       |SELECT user_id, event_id, tsu, cents,
       |  frame[CAST((len(frame) + 1) // 2 AS INT)] AS med_cents,
       |  CAST(list_sum(frame) AS BIGINT) // len(frame) AS mean_cents
       |FROM f ORDER BY user_id, event_id""".stripMargin

  /** Linear interpolation of daily gaps — [[gapFillDailyOf]]'s
    * forward-fill replaced by the straight line between the bracketing
    * observed days: v(d) = v_p + (v_n − v_p)·(d − p) div (n − p) in
    * integer cents (floor). Days before the first / after the last
    * observation stay NULL (no extrapolation — mirrored). Two
    * IGNORE-NULLS running windows (last-preceding and first-following
    * observation) over the calendar-sized grid; state per row is one
    * (day, value) pair per direction.
    */
  def interpolateDaily(spark: SparkSession, dir: String): DataFrame =
    interpolateDailyOf(graft.Tables.events(spark, dir))

  /** [[interpolateDaily]] over any (user_id, event_id, ts NANOS, value). */
  def interpolateDailyOf(events: DataFrame): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val wDay = Window.partitionBy($"user_id", $"day")
      .orderBy($"ts".desc, $"event_id".desc)
    val daily = events
      .select($"user_id", expr("ts div 86400000000000").as("day"),
        $"ts", $"event_id",
        expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)").as("cents"))
      .withColumn("rn", row_number().over(wDay))
      .filter($"rn" === 1)
      .select($"user_id", $"day", $"cents")
    val grid = daily.groupBy($"user_id")
      .agg(min($"day").as("d0"), max($"day").as("d1"))
      .withColumn("day", explode(expr("sequence(d0, d1)")))
      .select($"user_id", $"day")
    val wB = Window.partitionBy($"user_id").orderBy($"day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wF = Window.partitionBy($"user_id").orderBy($"day")
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val obs = grid.join(daily, Seq("user_id", "day"), "left")
      .withColumn("pv", last($"cents", ignoreNulls = true).over(wB))
      .withColumn("pd", last(when($"cents".isNotNull, $"day"),
        ignoreNulls = true).over(wB))
      .withColumn("nv", first($"cents", ignoreNulls = true).over(wF))
      .withColumn("nd", first(when($"cents".isNotNull, $"day"),
        ignoreNulls = true).over(wF))
    obs.select($"user_id", $"day",
        when($"cents".isNotNull, $"cents")
          .when($"pv".isNull || $"nv".isNull, lit(null))
          // `div` — both engines TRUNCATE integral division toward
          // zero (DuckDB's // is truncation too: (-7)//2 = -3,
          // measured), so the negative-slope days agree exactly
          .otherwise(expr("pv + (nv - pv) * (day - pd) div (nd - pd)"))
          .as("interp_cents"),
        $"cents".isNotNull.as("observed"))
      .orderBy($"user_id", $"day")
  }

  /** [[interpolateDaily]] oracle. */
  def interpolateDailySql(): String =
    """WITH d0 AS (
      |  SELECT user_id, epoch_us(ts) * 1000 // 86400000000000 AS day,
      |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
      |    ROW_NUMBER() OVER (PARTITION BY user_id, epoch_us(ts) * 1000 // 86400000000000
      |      ORDER BY ts DESC, event_id DESC) AS rn
      |  FROM events),
      |daily AS (SELECT user_id, day, cents FROM d0 WHERE rn = 1),
      |grid AS (SELECT user_id, unnest(generate_series(MIN(day), MAX(day))) AS day
      |  FROM daily GROUP BY user_id),
      |g AS (SELECT grid.user_id, grid.day, daily.cents
      |  FROM grid LEFT JOIN daily USING (user_id, day)),
      |ob AS (SELECT user_id, day, cents,
      |    LAST_VALUE(cents IGNORE NULLS) OVER wb AS pv,
      |    LAST_VALUE(CASE WHEN cents IS NOT NULL THEN day END IGNORE NULLS) OVER wb AS pd,
      |    FIRST_VALUE(cents IGNORE NULLS) OVER wf AS nv,
      |    FIRST_VALUE(CASE WHEN cents IS NOT NULL THEN day END IGNORE NULLS) OVER wf AS nd
      |  FROM g
      |  WINDOW wb AS (PARTITION BY user_id ORDER BY day
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
      |    wf AS (PARTITION BY user_id ORDER BY day
      |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
      |SELECT user_id, day,
      |  CASE WHEN cents IS NOT NULL THEN cents
      |       WHEN pv IS NULL OR nv IS NULL THEN NULL
      |       ELSE pv + (nv - pv) * (day - pd) // (nd - pd) END AS interp_cents,
      |  (cents IS NOT NULL) AS observed
      |FROM ob ORDER BY user_id, day""".stripMargin

  /** FORWARD as-of join — the mirror of [[asofJoin]]: each left row
    * matched to the EARLIEST right row with `rightTs ≥ leftTs` in the
    * same keys (ties toward the smallest rightOrd). Same single-
    * exchange union+running-window plan, with the window order
    * REVERSED (and __tag still placing right rows first at an equal
    * timestamp, so an exactly-simultaneous payload is visible to both
    * directions). The direction every "next event after X" question
    * needs — next deploy after an error, next restock after a
    * stock-out — without the self-join explosion of a naive ≥ theta
    * join.
    */
  def asofJoinForward(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, leftOrd: String, rightOrd: String,
      rightPayload: Seq[String], prefix: String = "next_"): DataFrame = {
    val l2 = left.select(
      keys.map(col) ++ Seq(col(leftTs).as("__ts"), col(leftOrd).as("__ord"),
        lit(1).as("__tag"),
        struct(left.columns.map(col): _*).as("__l")): _*)
    val r2 = right.select(
      keys.map(col) ++ Seq(col(rightTs).as("__ts"), col(rightOrd).as("__ord"),
        lit(0).as("__tag"),
        struct(rightPayload.map(col): _*).as("__r")): _*)
    val u = l2.unionByName(r2, allowMissingColumns = true)
    // descending time; right-before-left at equal ts; DESCENDING ord so
    // the running last() lands on the SMALLEST qualifying rightOrd
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts").desc, col("__tag"), col("__ord").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    u.withColumn("__m", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__tag") === 1)
      .select(col("__l.*") +:
        rightPayload.map(p => col(s"__m.$p").as(s"$prefix$p")): _*)
  }

  /** Driver form of [[asofJoinForward]]: each purchase matched to the
    * user's NEXT 'error' event (post-purchase incident attribution) —
    * the forward complement of `asof_join_attribution`.
    */
  def asofForwardQuery(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = graft.Tables.events(spark, dir)
      .select($"event_id", $"user_id", expr("ts div 1000").as("tsu"),
        $"value", $"event_type")
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"event_id", $"user_id", $"tsu", $"value")
    val errors = ev.filter($"event_type" === "error")
      .groupBy($"user_id", $"tsu").agg(min($"event_id").as("err_id"))
      .select($"user_id", $"tsu".as("err_tsu"), $"err_id")
    asofJoinForward(purchases, errors, Seq("user_id"), "tsu", "err_tsu",
        "event_id", "err_id", Seq("err_id", "err_tsu"), prefix = "")
      .orderBy($"event_id")
  }

  /** [[asofForwardQuery]] oracle: min-over-qualifying formulation
    * (DuckDB's ASOF is backward-only, so forward is stated as the
    * grouped MIN + equi-join back — an independent plan).
    */
  def asofForwardSql(): String =
    """WITH p AS (
      |  SELECT event_id, user_id, epoch_us(ts) AS tsu, value
      |  FROM events WHERE event_type = 'purchase'
      |), c AS (
      |  SELECT user_id, epoch_us(ts) AS tsu, MIN(event_id) AS err_id
      |  FROM events WHERE event_type = 'error' GROUP BY 1, 2
      |), m AS (
      |  SELECT p.event_id, MIN(c.tsu) AS nts
      |  FROM p LEFT JOIN c ON p.user_id = c.user_id AND c.tsu >= p.tsu
      |  GROUP BY p.event_id
      |)
      |SELECT p.event_id, p.user_id, p.tsu, p.value,
      |  c.err_id, c.tsu AS err_tsu
      |FROM p JOIN m USING (event_id)
      |LEFT JOIN c ON c.user_id = p.user_id AND c.tsu = m.nts
      |ORDER BY p.event_id""".stripMargin

  /** NEAREST as-of: both directions computed by the two running
    * windows over ONE union, the closer match kept (ties toward the
    * backward match — the deterministic convention). The trade-
    * matching / sensor-alignment join: each left row pairs with its
    * temporally closest right row regardless of side.
    */
  def asofNearestQuery(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = graft.Tables.events(spark, dir)
      .select($"event_id", $"user_id", expr("ts div 1000").as("tsu"),
        $"event_type")
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"event_id", $"user_id", $"tsu")
    val clicks = ev.filter($"event_type" === "click")
      .groupBy($"user_id", $"tsu").agg(min($"event_id").as("click_id"))
      .select($"user_id", $"tsu".as("click_tsu"), $"click_id")
    val back = asofJoin(purchases, clicks, Seq("user_id"), "tsu",
      "click_tsu", "event_id", "click_id", Seq("click_id", "click_tsu"),
      prefix = "b_")
    val fwd = asofJoinForward(purchases, clicks, Seq("user_id"), "tsu",
      "click_tsu", "event_id", "click_id", Seq("click_id", "click_tsu"),
      prefix = "f_")
    back.join(fwd.select($"event_id", $"f_click_id", $"f_click_tsu"),
        Seq("event_id"))
      .select($"event_id", $"user_id", $"tsu",
        when($"f_click_tsu".isNull ||
            ($"b_click_tsu".isNotNull &&
              $"tsu" - $"b_click_tsu" <= $"f_click_tsu" - $"tsu"),
          $"b_click_id").otherwise($"f_click_id").as("near_id"),
        when($"f_click_tsu".isNull ||
            ($"b_click_tsu".isNotNull &&
              $"tsu" - $"b_click_tsu" <= $"f_click_tsu" - $"tsu"),
          $"b_click_tsu").otherwise($"f_click_tsu").as("near_tsu"))
      .orderBy($"event_id")
  }

  /** [[asofNearestQuery]] oracle: min-|Δt| with the backward tie rule,
    * stated as grouped MINs over the two half-spaces.
    */
  def asofNearestSql(): String =
    """WITH p AS (
      |  SELECT event_id, user_id, epoch_us(ts) AS tsu
      |  FROM events WHERE event_type = 'purchase'
      |), c AS (
      |  SELECT user_id, epoch_us(ts) AS tsu, MIN(event_id) AS click_id
      |  FROM events WHERE event_type = 'click' GROUP BY 1, 2
      |), b AS (
      |  SELECT p.event_id, MAX(c.tsu) AS bts
      |  FROM p LEFT JOIN c ON p.user_id = c.user_id AND c.tsu <= p.tsu
      |  GROUP BY p.event_id
      |), f AS (
      |  SELECT p.event_id, MIN(c.tsu) AS fts
      |  FROM p LEFT JOIN c ON p.user_id = c.user_id AND c.tsu >= p.tsu
      |  GROUP BY p.event_id
      |), pick AS (
      |  SELECT p.event_id, p.user_id, p.tsu,
      |    CASE WHEN f.fts IS NULL
      |           OR (b.bts IS NOT NULL AND p.tsu - b.bts <= f.fts - p.tsu)
      |      THEN b.bts ELSE f.fts END AS nts
      |  FROM p JOIN b USING (event_id) JOIN f USING (event_id)
      |)
      |SELECT pick.event_id, pick.user_id, pick.tsu,
      |  c.click_id AS near_id, c.tsu AS near_tsu
      |FROM pick LEFT JOIN c
      |  ON c.user_id = pick.user_id AND c.tsu = pick.nts
      |ORDER BY pick.event_id""".stripMargin

  // ---------------------------------------------------------------------
  // Interval × interval overlap join (bucket decomposition)
  // ---------------------------------------------------------------------

  /** Interval fixture durations (micros): an 'error' burst lasts 2 h, a
    * deploy ('signup' plays the role) holds a 6 h window. Bucket width
    * = the longer duration, so every interval spans at most 2 buckets.
    */
  val ErrorLenUs: Long = 2L * 3600 * 1000000
  val DeployLenUs: Long = 6L * 3600 * 1000000
  val OverlapBucketUs: Long = DeployLenUs

  /** Incident attribution by INTERVAL OVERLAP — the interval×interval
    * sibling of [[asofJoin]] (point→latest) and
    * `range_join_nearby` (point-in-window): for each deploy window,
    * how many error bursts did it overlap? Neither side is a point, and
    * there is no equi-key, so the naive plan is a nested-loop theta
    * join — quadratic, the thing that cannot run at 100 TB.
    *
    * The scalable plan is BUCKET DECOMPOSITION: time is cut into
    * fixed-width buckets no narrower than the longest interval, each
    * interval is exploded into the (≤2) buckets it touches — a pure
    * bounded projection — and candidates come from ONE equi-join on the
    * bucket id. A pair overlapping across a bucket boundary would be
    * seen twice, so instead of a distinct, the RESPONSIBILITY RULE
    * keeps exactly the bucket containing `max(start_a, start_b)` (the
    * instant the overlap begins, provably inside both intervals and
    * both bucket lists): every overlapping pair is emitted exactly
    * once, with no dedup shuffle. Half-open [s, e) semantics; the
    * DuckDB oracle is the direct theta join — independent plan, same
    * pairs.
    */
  def intervalOverlapJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    def intervals(eventType: String, lenUs: Long) =
      graft.Tables.events(spark, dir)
        .filter($"event_type" === eventType)
        .select($"event_id", expr("ts div 1000").as("s"),
          (expr("ts div 1000") + lenUs).as("e"))
    intervalOverlapJoinOf(intervals("signup", DeployLenUs),
      intervals("error", ErrorLenUs), OverlapBucketUs)
  }

  /** [[intervalOverlapJoin]] over arbitrary (event_id, s, e) interval
    * relations. `bucketUs` ≥ the longest interval is the COST-MODEL
    * guideline, not a checked precondition: a longer interval simply
    * explodes into ceil(len/bucketUs)+1 candidate buckets — the
    * post-join overlap predicate keeps the result exact regardless
    * (spec'd with a 3-bucket interval), the join input just grows by
    * that replication factor.
    */
  def intervalOverlapJoinOf(deploys: DataFrame, errors: DataFrame,
      bucketUs: Long): DataFrame = {
    val spark = deploys.sparkSession
    import spark.implicits._
    val W = bucketUs
    def bucketed(df: DataFrame, tag: String) =
      df.select($"event_id".as(s"${tag}_id"), $"s".as(s"${tag}_s"),
          $"e".as(s"${tag}_e"),
          // integer division: timestamps are positive micros
          explode(sequence(expr(s"s div $W"), expr(s"(e - 1) div $W")))
            .as("bucket"))
    val cand = bucketed(deploys, "d").join(bucketed(errors, "x"), "bucket")
      .filter($"d_s" < $"x_e" && $"x_s" < $"d_e" &&
        $"bucket" === expr(s"greatest(d_s, x_s) div $W"))
    val counts = cand.groupBy($"d_id").agg(count(lit(1)).as("n_overlaps"))
    deploys.join(counts, $"event_id" === $"d_id", "left")
      .select($"event_id", coalesce($"n_overlaps", lit(0L)).as("n_overlaps"))
      .orderBy($"event_id")
  }

  /** [[intervalOverlapJoin]] oracle: the direct theta join. */
  def intervalOverlapJoinSql(): String =
    s"""WITH d AS (SELECT event_id, CAST(epoch_us(ts) AS BIGINT) AS s,
       |    CAST(epoch_us(ts) AS BIGINT) + $DeployLenUs AS e
       |  FROM events WHERE event_type = 'signup'),
       |x AS (SELECT CAST(epoch_us(ts) AS BIGINT) AS s,
       |    CAST(epoch_us(ts) AS BIGINT) + $ErrorLenUs AS e
       |  FROM events WHERE event_type = 'error')
       |SELECT d.event_id, CAST(COUNT(x.s) AS BIGINT) AS n_overlaps
       |FROM d LEFT JOIN x ON d.s < x.e AND x.s < d.e
       |GROUP BY d.event_id ORDER BY d.event_id""".stripMargin
}
