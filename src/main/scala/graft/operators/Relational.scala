package graft.operators

import graft.{Fx, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Core relational operator layer (SURVEY.md §2.1–2.9).
  *
  * The reference (jimmy29304825/spark_streaming_kafka) models ratings as
  * RDDs of (userId, songId, rating) tuples decoded from CSV/Kafka
  * (engine.py:96, spark_kafka.py:76–80). On the driver corpus the
  * `events` table plays that role: `user_id` is the rater, the JSON
  * `props.k` field is the song id, `value` is the rating
  * (FIXTURES.md §B role mapping).
  *
  * Everything here is declarative DataFrame code: Catalyst does predicate
  * pushdown, column pruning, broadcast-join selection and partial
  * aggregation. No collect(), no driver-side loops — every operator
  * scales by partitioning alone.
  */
object Relational {

  /** Decoded ratings stream-table: the F3 pseudo-JSON/JSON decode step
    * (spark_streaming_kafka.py:18–20) as a columnar projection.
    * `get_json_object` is codegen'd; the parquet scan reads only the
    * referenced columns.
    */
  def ratings(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.widened(spark, Tables.events(spark, dir)).select(
      $"event_id",
      $"user_id",
      get_json_object($"props", "$.k").cast("int").as("song_id"),
      $"value".as("rating"))
  }

  /** F3: decode of event payloads, ordered for the oracle diff. */
  def jsonDecodeRatings(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    ratings(spark, dir).orderBy($"event_id")
  }

  /** A1 `get_counts_and_averages` (engine.py:9–14): per-song count and
    * mean rating. The reference uses groupByKey (ships every rating);
    * here it is a partial+final HashAggregate — map-side combine shrinks
    * the shuffle to one row per (partition, song).
    */
  def aggCountAvg(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    ratings(spark, dir)
      .groupBy($"song_id")
      .agg(count(lit(1)).as("cnt"), Fx.davg($"rating").as("avg_rating"))
      .orderBy($"song_id")
  }

  /** J1 + P6 + T1 (engine.py:45,79): attach title + rating-count to each
    * per-song average, keep songs with >= minCnt ratings, top-25 by
    * average. `part` plays the 213-row song-metadata table; it is
    * broadcast (explicitly, as Catalyst would choose under the
    * threshold anyway) so the join is shuffle-free.
    */
  def recommendTop25(spark: SparkSession, dir: String, minCnt: Long = 25): DataFrame = {
    import spark.implicits._
    val perSong = ratings(spark, dir)
      .groupBy($"song_id")
      .agg(count(lit(1)).as("cnt"), Fx.davg($"rating").as("avg_rating"))
      .filter($"cnt" >= minCnt)
    val titles = Tables.part(spark, dir)
      .select($"p_partkey".as("song_id"), $"p_name".as("title"))
    perSong.join(broadcast(titles), Seq("song_id"))
      .select($"song_id", $"title", $"cnt", $"avg_rating")
      .orderBy($"avg_rating".desc, $"song_id")
      .limit(25)
  }

  /** J2 (spark_music.py:35–36): composite-key equi-join of truth vs
    * "prediction" — here the per-(user, song) mean joined back to each
    * rating row on both keys.
    */
  def joinTruthPrediction(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val r = ratings(spark, dir)
    val pred = r.groupBy($"user_id", $"song_id")
      .agg(Fx.davg($"rating").as("prediction"))
    r.join(pred, Seq("user_id", "song_id"))
      .select($"event_id", $"user_id", $"song_id", $"rating", $"prediction")
      .orderBy($"event_id")
  }

  /** A3/M3 RMSE (spark_music.py:35–40): sqrt(mean((truth-pred)^2)) where
    * pred is the per-song mean. Squares are accumulated in DECIMAL(18,8)
    * so the result is summation-order-independent across engines.
    * Known latent edge: diff^2 is a derived double, so a value landing
    * within half an ulp of an exact .5 at the 8th decimal could round
    * differently in the two engines' double->decimal casts (Fx scaladoc);
    * verified clean at sf0.01 and sf0.1, and the final round(...,6)
    * absorbs single-row divergence.
    */
  def rmseEval(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val r = ratings(spark, dir)
    val pred = r.groupBy($"song_id").agg(Fx.davg($"rating").as("prediction"))
    r.join(pred, Seq("song_id"))
      .select(($"rating" - $"prediction").as("diff"))
      .agg(round(sqrt(Fx.dsum(pow($"diff", 2), 8) / count(lit(1))), 6).as("rmse"))
  }

  /** P7/J5 anti-join (spark_music.py:96–98 — the *intended* semantics of
    * the reference's NOT-IN, minus its Py3 exhausted-iterator bug):
    * catalog songs never rated by anyone. At 100 TB this is a broadcast
    * or shuffle left-anti join, never a driver-side `isin` list.
    */
  def antiJoinUnrated(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val rated = ratings(spark, dir).select($"song_id")
    Tables.part(spark, dir)
      .join(rated, $"p_partkey" === rated("song_id"), "left_anti")
      .select($"p_partkey", $"p_name")
      .orderBy($"p_partkey")
  }

  /** U1 bag-semantics union (engine.py:56): history ∪ new ratings before
    * retrain. Split the stream on event_type to model "new arrivals";
    * the union must NOT dedup (Spark `union` is bag — exact match).
    */
  def unionRetrainInput(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val r = Tables.events(spark, dir).select(
      $"event_id",
      get_json_object($"props", "$.k").cast("int").as("song_id"),
      $"event_type")
    val history = r.filter($"event_type" =!= "purchase")
    val fresh = r.filter($"event_type" === "purchase")
    history.unionByName(fresh)
      .groupBy($"song_id").agg(count(lit(1)).as("cnt"))
      .orderBy($"song_id")
  }

  /** Set difference/intersection (§2.7 family beyond the reference's
    * bag union): songs that appear in non-purchase events but never in
    * a purchase, tagged against songs appearing in both. EXCEPT /
    * INTERSECT are set-semantic (distinct) in both engines; each plans
    * as one aggregate-style shuffle on the compared columns, not an
    * all-pairs comparison.
    */
  def exceptIntersectSongs(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val r = Tables.events(spark, dir).select(
      get_json_object($"props", "$.k").cast("int").as("song_id"),
      $"event_type")
    val browsed = r.filter($"event_type" =!= "purchase").select($"song_id")
    val bought = r.filter($"event_type" === "purchase").select($"song_id")
    browsed.except(bought).withColumn("relation", lit("browsed_only"))
      .unionByName(
        browsed.intersect(bought).withColumn("relation", lit("both")))
      .orderBy($"song_id", $"relation")
  }

  /** P9 distinct (engine.py:77): candidate (user, song) pairs. */
  def distinctPairs(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    ratings(spark, dir)
      .select($"user_id", $"song_id")
      .distinct()
      .orderBy($"user_id", $"song_id")
  }

  /** P10 drop-duplicates-by-key (music_ETL.ipynb cells 7,13). Spark's
    * dropDuplicates keeps an *arbitrary* row per key — not
    * oracle-checkable — so this is the deterministic form: first event
    * per user in (ts, event_id) order via row_number. Same shuffle shape
    * (hash partition by key), deterministic winner.
    */
  def dropDuplicatesByUser(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    Tables.events(spark, dir)
      .withColumn("rn", row_number().over(w))
      .filter($"rn" === 1)
      .select($"user_id", $"event_id", $"event_type")
      .orderBy($"user_id")
  }

  /** P2/P3/P5/P6 filter+project: pushed to the parquet scan (verify:
    * `PushedFilters: [GreaterThanOrEqual(l_quantity,25), Not(EqualTo(l_suppkey,3))]`,
    * pruned ReadSchema).
    */
  def filterProject(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, dir)
      .filter($"l_quantity" >= 25 && $"l_suppkey" =!= 3)
      .select($"l_orderkey", $"l_partkey", $"l_linenumber", $"l_quantity")
      // order over ALL emitted columns: (l_orderkey, l_linenumber) alone
      // is not unique in this corpus, and a non-total presentation order
      // is nondeterministic across engines
      .orderBy($"l_orderkey", $"l_linenumber", $"l_partkey", $"l_quantity")
  }

  /** T1 top-K with threshold (engine.py:79 shape on lineitem): top-25
    * parts by exact total quantity. orderBy+limit plans as
    * TakeOrderedAndProject — per-partition heap + driver merge of 25
    * rows, no global sort.
    */
  def topk25Parts(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, dir)
      .groupBy($"l_partkey")
      .agg(Fx.dsum($"l_quantity").as("total_qty"), count(lit(1)).as("cnt"))
      .filter($"cnt" >= 3)
      .orderBy($"total_qty".desc, $"l_partkey")
      .limit(25)
  }

  /** T4 top-200 slice (music_ETL.ipynb cell 12): top-200 songs by total
    * listen volume.
    */
  def top200Songs(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    ratings(spark, dir)
      .groupBy($"song_id")
      .agg(Fx.dsum($"rating").as("total"))
      .orderBy($"total".desc, $"song_id")
      .limit(200)
  }

  /** TPC-H Q1-shaped pricing summary — the flagship batch aggregate
    * (A1 generalized): partial aggregation, fixed-point money math,
    * single shuffle of 4 groups.
    */
  def pricingSummary(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, dir)
      .filter($"l_shipdate" <= lit("1998-09-02").cast("timestamp"))
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        Fx.dsum($"l_quantity").as("sum_qty"),
        Fx.dsum($"l_extendedprice").as("sum_base_price"),
        sum(Fx.dec2($"l_extendedprice") * (Fx.one - Fx.rate2($"l_discount")))
          .cast("double").as("sum_disc_price"),
        sum(Fx.dec2($"l_extendedprice") * (Fx.one - Fx.rate2($"l_discount"))
          * (Fx.one + Fx.rate2($"l_tax"))).cast("double").as("sum_charge"),
        Fx.davg($"l_quantity").as("avg_qty"),
        Fx.davg($"l_extendedprice").as("avg_price"),
        Fx.davg($"l_discount", 4).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy($"l_returnflag", $"l_linestatus")
  }

  /** ROLLUP subtotals over the pricing summary dimensions (beyond the
    * reference — the standard OLAP subtotal/grand-total shape). NULL
    * grouping markers are coalesced to 'ALL' so the ordering is
    * engine-neutral (Spark and DuckDB disagree on default NULL sort
    * order); sums stay in the exact decimal domain ([[graft.Fx]]).
    * Rollup is one pass: Spark expands grouping sets inside the same
    * partial-aggregatable hash aggregate, not one job per level.
    */
  def pricingRollup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, dir)
      .filter($"l_shipdate" <= lit("1998-09-02").cast("timestamp"))
      .rollup($"l_returnflag", $"l_linestatus")
      .agg(
        Fx.dsum($"l_quantity").as("sum_qty"),
        Fx.dsum($"l_extendedprice").as("sum_base_price"),
        count(lit(1)).as("count_order"))
      .select(coalesce($"l_returnflag", lit("ALL")).as("rf"),
        coalesce($"l_linestatus", lit("ALL")).as("ls"),
        $"sum_qty", $"sum_base_price", $"count_order")
      .orderBy($"rf", $"ls")
  }

  /** Equal-frequency bucketing via ntile (§2.5 family): per-user event
    * quartiles by value. Unlike [[quantileRatingLevels]]' exact
    * percentile thresholds, ntile assigns equal-count buckets in one
    * window pass — no per-group percentile aggregation. The (value,
    * event_id) ordering is total, so assignment is deterministic.
    */
  def ntileQuartiles(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    Tables.events(spark, dir)
      .select($"event_id", $"user_id", $"value")
      .withColumn("quartile", ntile(4).over(
        Window.partitionBy($"user_id").orderBy($"value", $"event_id")))
      .orderBy($"event_id")
  }

  /** Window running sum (§2.5 — absent in the reference, standard in any
    * engine): per-supplier cumulative shipped quantity in (shipdate,
    * orderkey, linenumber) order. Window sums run sequentially over a
    * totally-ordered frame, so plain double accumulation is already
    * deterministic — still DECIMAL'd for cross-engine equality.
    */
  def windowRunningSum(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // (l_orderkey, l_linenumber) is NOT unique in this corpus; the full
    // (shipdate, orderkey, linenumber, partkey, quantity) tuple is, so
    // the running-sum accumulation order is total => deterministic.
    val w = Window.partitionBy($"l_suppkey")
      .orderBy($"l_shipdate", $"l_orderkey", $"l_linenumber", $"l_partkey", $"l_quantity")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.lineitem(spark, dir)
      .select($"l_suppkey", $"l_orderkey", $"l_linenumber", $"l_partkey",
        $"l_shipdate", $"l_quantity")
      .withColumn("running_qty",
        sum($"l_quantity".cast("decimal(18,2)")).over(w).cast("double"))
      .select($"l_suppkey", $"l_orderkey", $"l_linenumber", $"l_partkey",
        $"l_quantity", $"running_qty")
      .orderBy($"l_suppkey", $"l_orderkey", $"l_linenumber", $"l_partkey",
        $"l_quantity", $"running_qty")
  }

  /** Calendar-grain rollup (§2-beyond — the daily activity report
    * every event pipeline lands in a dashboard): per (day, event_type)
    * event counts and exact decimal value sums. The day index is pure
    * integer floor arithmetic on the epoch (ts nanos div 86 400e9) so
    * both engines bucket identically — no timezone/date-type semantics
    * to diverge on. One partial-aggregatable shuffle; grain cardinality
    * (days × types) is tiny at any scale.
    */
  def dailyActivity(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, dir)
      .select(expr("ts div 86400000000000").as("day_idx"),
        $"event_type", $"value")
      .groupBy($"day_idx", $"event_type")
      .agg(count(lit(1)).as("n_events"), Fx.dsum($"value").as("sum_value"))
      .orderBy($"day_idx", $"event_type")
  }

  /** Bounded-frame moving aggregate + lag (§2-beyond — the sliding
    * feature every time-series feature pipeline computes): per-user
    * 3-event moving sum of value and the delta vs the previous event,
    * ordered by event_id (globally unique ⇒ total order ⇒
    * deterministic frame contents). Sums run in the DECIMAL domain for
    * cross-engine equality; the first event's delta is zero by
    * definition. One shuffle on user_id; the frame is O(1) state per
    * row — the same cost class as the running sum.
    */
  def movingWindowFeatures(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy($"user_id").orderBy($"event_id")
    val dec = $"value".cast("decimal(18,2)")
    Tables.events(spark, dir)
      .select($"event_id", $"user_id", $"value")
      .withColumn("moving_sum_3",
        sum(dec).over(w.rowsBetween(-2, Window.currentRow)).cast("double"))
      .withColumn("delta",
        (dec - coalesce(lag(dec, 1).over(w), dec)).cast("double"))
      .orderBy($"event_id")
  }

  /** Pivot reshape (§2-beyond — long-to-wide, the reporting staple):
    * per-user event counts with one column per event type. The pivot
    * values are DECLARED (the fixed event-type domain), so Spark skips
    * the extra distinct-values job and the plan is a single
    * partial-aggregatable groupBy — exactly the CASE-sum form the
    * oracle states. Unseen types yield zero columns; counts are longs.
    */
  def pivotEventCounts(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val types = Seq("click", "error", "purchase", "signup", "view")
    Tables.events(spark, dir)
      .select($"user_id", $"event_type")
      .groupBy($"user_id")
      .pivot($"event_type", types)
      .agg(count(lit(1)))
      .na.fill(0L, types)
      .orderBy($"user_id")
  }

  /** A6 per-user quantile rating levels (music_ETL.ipynb cell 9): exact
    * interpolated 0.2/0.4/0.6/0.8 quantiles of `value` per user, then
    * the reference's >=-chain bucketing into levels 1–5. Exact
    * `percentile` (not approx) to stay oracle-matchable; computed as one
    * aggregate per user then a broadcastable join back.
    */
  def quantileRatingLevels(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, dir).select($"event_id", $"user_id", $"value")
    val qs = ev.groupBy($"user_id").agg(
      percentile($"value", lit(0.2)).as("q20"),
      percentile($"value", lit(0.4)).as("q40"),
      percentile($"value", lit(0.6)).as("q60"),
      percentile($"value", lit(0.8)).as("q80"))
    ev.join(qs, Seq("user_id"))
      .select($"event_id", $"user_id",
        when($"value" >= $"q80", 5)
          .when($"value" >= $"q60", 4)
          .when($"value" >= $"q40", 3)
          .when($"value" >= $"q20", 2)
          .otherwise(1).as("level"))
      .orderBy($"event_id")
  }

  /** Per-group median imputation (the feature-engineering staple: fill
    * missing numerics with their group's central value). This corpus
    * has no NULLs, so missingness is INJECTED deterministically — the
    * salted hash gate the sampling family uses (exact integer
    * `h % 100 < pct`, RNG-free, rerun-identical) marks ~`pct`% of rows
    * missing; the imputed value is the per-event_type EXACT
    * interpolated median of the present rows (same `percentile` ↔
    * `quantile_cont` bit-agreement as [[quantileRatingLevels]]). Scale
    * shape: one partial-aggregatable grouped percentile over the
    * present slice, then a broadcast join back — the fact table
    * shuffles once for the percentile and never again.
    */
  def medianImpute(spark: SparkSession, dir: String, pct: Int = 10): DataFrame = {
    import spark.implicits._
    val ev = Tables.widened(spark, Tables.events(spark, dir))
      .select($"event_id", $"event_type", $"value",
        (Dedup.hash60(concat(lit("imp:"), $"event_id".cast("string"))) % 100 < pct)
          .as("was_missing"))
    val med = ev.filter(!$"was_missing")
      .groupBy($"event_type")
      .agg(percentile($"value", lit(0.5)).as("median_value"))
    ev.join(broadcast(med), Seq("event_type"))
      .select($"event_id", $"event_type",
        when($"was_missing", $"median_value").otherwise($"value")
          .as("value_imputed"),
        $"was_missing")
      .orderBy($"event_id")
  }

  /** ST7 batch analog (spark_kafka.py:71–96): marker-triggered
    * accumulation. Each event is assigned to the next `purchase` marker
    * of the same user (the 'm3' analog); events after a user's last
    * marker stay unflushed (dropped, like the reference's still-buffered
    * tail). Expressed as a forward-looking min window — no state loop,
    * one shuffle by user.
    */
  def markerSessions(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"user_id")
      .orderBy($"ts", $"event_id")
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    Tables.events(spark, dir)
      .withColumn("marker_id",
        min(when($"event_type" === "purchase", $"event_id")).over(w))
      .filter($"marker_id".isNotNull)
      .select($"event_id", $"user_id", $"marker_id")
      .orderBy($"event_id")
  }

  /** Inactivity-gap sessionization (beyond the reference — the
    * standard training-pipeline grouping of user events into visits):
    * a new session starts when the gap to the previous event exceeds
    * `gapNanos`. The classic lag + running-sum formulation — one
    * shuffle by user, two window passes, then a session-level
    * aggregate. (Streaming analog: `session_window`; batch uses the
    * lag form so the oracle semantics are engine-exact.)
    */
  def sessionize(spark: SparkSession, dir: String,
      gapMicros: Long = 12L * 3600 * 1000000L): DataFrame = {
    import spark.implicits._
    // microsecond domain: DuckDB reads TIMESTAMP(NANOS) parquet at us
    // precision, so the engine-exact mirror works on ts div 1000
    // (integer div — the ns epoch exceeds a double's 53-bit mantissa)
    val w = Window.partitionBy($"user_id").orderBy($"tsu", $"event_id")
    val newSession =
      when($"tsu" - lag($"tsu", 1).over(w) > gapMicros, 1).otherwise(0)
    val sid = sum($"new_s")
      .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    Tables.events(spark, dir)
      .select($"user_id", $"event_id", expr("ts div 1000").as("tsu"))
      .withColumn("new_s", newSession)
      .withColumn("session_id", sid)
      .groupBy($"user_id", $"session_id")
      .agg(count(lit(1)).as("n_events"),
        min($"tsu").as("t_start"), max($"tsu").as("t_end"))
      .orderBy($"user_id", $"session_id")
  }

  /** The funnel stage sequence (product-analytics order of the events
    * corpus's types). Shared with the oracle generator.
    */
  val FunnelStages: Seq[String] = Seq("signup", "view", "click", "purchase")

  /** Ordered event funnel per user: how far through
    * signup → view → click → purchase each user progressed, each stage
    * strictly after the previous one in event time.
    *
    * ONE shuffle: events fold into a per-user time-sorted list
    * (bounded by a user's own activity — the same state bound
    * [[sessionize]] and every sessionizer accepts), and the greedy
    * stage walk is a pure `aggregate` HOF over that list inside
    * codegen. The greedy earliest-match walk computes the same stage
    * times as the "min ts after previous stage" fixpoint (induction:
    * taking the earliest qualifying event never forecloses a later
    * stage), which is exactly how the DuckDB oracle states it — two
    * independent formulations meeting at the same rows.
    */
  def funnelSteps(spark: SparkSession, dir: String): DataFrame =
    funnelStepsOf(Tables.events(spark, dir), FunnelStages)

  /** [[funnelSteps]] over any (user_id, ts NANOS-LONG, event_type). */
  def funnelStepsOf(events: DataFrame, stages: Seq[String]): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val stagesArr = array(stages.map(lit): _*)
    val perUser = events
      .filter($"event_type".isin(stages: _*))
      .select($"user_id", expr("ts div 1000").as("tsu"), $"event_type")
      .groupBy($"user_id")
      .agg(sort_array(collect_list(struct($"tsu", $"event_type"))).as("seq"))
    // greedy walk: state = the reached stages' timestamps; an event
    // advances the walk iff it is the next expected stage and strictly
    // later than the last reached one
    val walked = aggregate($"seq",
      array().cast("array<bigint>"),
      (st, e) => when(
        size(st) < stages.size &&
          e.getField("event_type") === element_at(stagesArr, size(st) + 1) &&
          (size(st) === 0 || e.getField("tsu") > element_at(st, -1)),
        concat(st, array(e.getField("tsu")))).otherwise(st))
    perUser.select($"user_id", walked.as("ts_arr"))
      .select(($"user_id" +: size($"ts_arr").as("n_stages") +:
        stages.indices.map(i => get($"ts_arr", lit(i)).as(s"t_${stages(i)}"))): _*)
      .orderBy($"user_id")
  }

  /** Conversion window for [[funnelWindowed]]: each stage must land
    * within 24 h of the previous one (micros).
    */
  val FunnelWindowUs: Long = 24L * 3600 * 1000000

  /** Time-bounded funnel — [[funnelSteps]] with the conversion-window
    * constraint every product funnel actually ships: stage i counts
    * only if it lands in `(t_{i-1}, t_{i-1} + W]`. Semantics are
    * EARLIEST-QUALIFYING (the industry-standard greedy walk — each
    * stage takes the first qualifying event given the previous stage's
    * fixed time), stated identically in the oracle as a chain of
    * bounded MINs; this is deliberately NOT maximal-reachability,
    * which would require backtracking over candidate times and is not
    * what funnel products report. Same single-shuffle shape as the
    * unbounded funnel: per-user sorted fold, greedy walk as a codegen
    * `aggregate` HOF, per-user state bounded by the user's own events.
    */
  def funnelWindowed(spark: SparkSession, dir: String): DataFrame =
    funnelWindowedOf(Tables.events(spark, dir), FunnelStages, FunnelWindowUs)

  /** [[funnelWindowed]] over any (user_id, ts NANOS-LONG, event_type). */
  def funnelWindowedOf(events: DataFrame, stages: Seq[String],
      windowUs: Long): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val stagesArr = array(stages.map(lit): _*)
    val perUser = events
      .filter($"event_type".isin(stages: _*))
      .select($"user_id", expr("ts div 1000").as("tsu"), $"event_type")
      .groupBy($"user_id")
      .agg(sort_array(collect_list(struct($"tsu", $"event_type"))).as("seq"))
    val walked = aggregate($"seq",
      array().cast("array<bigint>"),
      (st, e) => when(
        size(st) < stages.size &&
          e.getField("event_type") === element_at(stagesArr, size(st) + 1) &&
          (size(st) === 0 ||
            (e.getField("tsu") > element_at(st, -1) &&
              e.getField("tsu") <= element_at(st, -1) + windowUs)),
        concat(st, array(e.getField("tsu")))).otherwise(st))
    perUser.select($"user_id", walked.as("ts_arr"))
      .select(($"user_id" +: size($"ts_arr").as("n_stages") +:
        stages.indices.map(i => get($"ts_arr", lit(i)).as(s"t_${stages(i)}"))): _*)
      .orderBy($"user_id")
  }

  /** [[funnelWindowed]] oracle: chained bounded-MIN CTEs — the
    * fixpoint formulation of the same earliest-qualifying walk.
    */
  def funnelWindowedSql(stages: Seq[String] = FunnelStages,
      windowUs: Long = FunnelWindowUs): String = {
    val ctes = stages.zipWithIndex.map { case (st, i) =>
      val bound = if (i == 0) "" else
        s" JOIN s${i - 1} USING (user_id)" +
          s" WHERE e.tsu > s${i - 1}.t_${stages(i - 1)}" +
          s" AND e.tsu <= s${i - 1}.t_${stages(i - 1)} + $windowUs"
      s"""s$i AS (SELECT user_id, MIN(tsu) AS t_$st
         |  FROM (SELECT user_id, CAST(epoch_us(ts) AS BIGINT) AS tsu
         |        FROM events WHERE event_type = '$st') e$bound
         |  GROUP BY user_id)""".stripMargin
    }.mkString(",\n")
    val tCols = stages.map(st => s"t_$st").mkString(", ")
    val nStages = stages.map(st =>
      s"CASE WHEN t_$st IS NOT NULL THEN 1 ELSE 0 END").mkString(" + ")
    s"""WITH u AS (SELECT DISTINCT user_id FROM events
       |  WHERE event_type IN (${stages.map(s => s"'$s'").mkString(", ")})),
       |$ctes
       |SELECT user_id, CAST($nStages AS INTEGER) AS n_stages, $tCols
       |FROM u ${stages.indices.map(i => s"LEFT JOIN s$i USING (user_id)").mkString(" ")}
       |ORDER BY user_id""".stripMargin
  }

  /** Order-to-ship latency percentiles per priority — the fulfillment
    * SLA report, with EXACT discrete percentiles by rank selection:
    * p50 = the value at rank ⌈n/2⌉, p90 at ⌈9n/10⌉ in the total order
    * (days, orderkey, linenumber) — deterministic in both engines, no
    * interpolation, no floats. One ranked window per group + two
    * rank-equality self-filters (each a broadcast-sized result); at
    * scale swap the global per-group sort for the percentile-threshold
    * join if a group outgrows a window partition.
    */
  def shipLatencyPercentiles(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val lat = Tables.lineitem(spark, dir)
      .join(Tables.orders(spark, dir), $"l_orderkey" === $"o_orderkey")
      .select($"o_orderpriority",
        expr("CAST((unix_micros(CAST(l_shipdate AS TIMESTAMP)) - " +
          "unix_micros(CAST(o_orderdate AS TIMESTAMP))) div 86400000000 AS BIGINT)")
          .as("days"),
        $"l_orderkey", $"l_linenumber")
    val w = Window.partitionBy($"o_orderpriority")
      .orderBy($"days", $"l_orderkey", $"l_linenumber")
    val ranked = lat.withColumn("rn", row_number().over(w))
    val stats = lat.groupBy($"o_orderpriority")
      .agg(count(lit(1)).as("n"), max($"days").as("max_days"))
    // ONE pass over the ranked window for both percentiles (the p50 /
    // p90 split re-ran the whole 600k-row sort window per percentile):
    // keep the two rank rows, then pick each percentile by a
    // conditional max — rank positions are unique per group, so this
    // selects exactly the rows the two filters did
    val pr = ranked.join(stats, Seq("o_orderpriority"))
      .filter($"rn" === expr("(n + 1) div 2") ||
        $"rn" === expr("(9 * n + 9) div 10"))
      .groupBy($"o_orderpriority")
      .agg(max(when($"rn" === expr("(n + 1) div 2"), $"days")).as("p50_days"),
        max(when($"rn" === expr("(9 * n + 9) div 10"), $"days")).as("p90_days"))
    stats.join(pr, Seq("o_orderpriority"))
      .select($"o_orderpriority", $"n", $"p50_days", $"p90_days", $"max_days")
      .orderBy($"o_orderpriority")
  }

  /** [[shipLatencyPercentiles]] oracle. */
  def shipLatencyPercentilesSql(): String =
    """WITH lat AS (
      |  SELECT o_orderpriority,
      |    (epoch_us(l_shipdate) - epoch_us(o_orderdate)) // 86400000000 AS days,
      |    l_orderkey, l_linenumber
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
      |r AS (SELECT o_orderpriority, days, ROW_NUMBER() OVER (
      |    PARTITION BY o_orderpriority
      |    ORDER BY days, l_orderkey, l_linenumber) AS rn FROM lat),
      |s AS (SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n,
      |    CAST(MAX(days) AS BIGINT) AS max_days
      |  FROM lat GROUP BY o_orderpriority)
      |SELECT s.o_orderpriority, s.n,
      |  CAST(p50.days AS BIGINT) AS p50_days,
      |  CAST(p90.days AS BIGINT) AS p90_days, s.max_days
      |FROM s
      |JOIN r p50 ON p50.o_orderpriority = s.o_orderpriority
      |  AND p50.rn = (s.n + 1) // 2
      |JOIN r p90 ON p90.o_orderpriority = s.o_orderpriority
      |  AND p90.rn = (9 * s.n + 9) // 10
      |ORDER BY s.o_orderpriority""".stripMargin

  /** TPC-H Q20-shaped excess-share suppliers — the last of the 22
    * TPC-H query SHAPES (nested aggregate inside a semi-join chain):
    * suppliers who shipped more than `tenths/10 ×` their FAIR SHARE of
    * some `ptype` part's total quantity (fair share = total/n_suppliers
    * for that part — an absolute share cutoff dilutes to zero as the
    * supplier pool grows with scale; the fair-share multiple is the
    * scale-free formulation, same reasoning as [[ImportantPartTenths]]).
    * Decorrelated: per-(part, supplier) quantity and per-part totals
    * are two aggregations over one scan lineage; the test
    * `qty·n·10 > tenths·total` is exact integers; the supplier
    * dimension joins AFTER the filter (semi-join-sized), nation
    * broadcasts. A supplier qualifies once (EXISTS semantics →
    * distinct before the dim join).
    */
  def excessShareSuppliers(spark: SparkSession, dir: String,
      ptype: String = "PROMO", tenths: Long = 25): DataFrame = {
    import spark.implicits._
    val parts = Tables.part(spark, dir).filter($"p_type" === ptype)
      .select($"p_partkey")
    val shipped = Tables.lineitem(spark, dir)
      .join(broadcast(parts), $"l_partkey" === $"p_partkey")
      .select($"l_partkey", $"l_suppkey",
        $"l_quantity".cast("long").as("qty"))
    val perPair = shipped.groupBy($"l_partkey", $"l_suppkey")
      .agg(sum($"qty").as("pair_qty"))
    val perPart = perPair.groupBy($"l_partkey")
      .agg(sum($"pair_qty").as("part_qty"), count(lit(1)).as("n_supp"))
    // DECIMAL(38,0) like importantParts: plain BIGINT would wrap on
    // overflow in non-ANSI Spark at extreme scale where DuckDB's
    // HUGEINT promotion keeps going — a latent cross-engine divergence
    val big = org.apache.spark.sql.types.DecimalType(38, 0)
    val qualifying = perPair.join(perPart, Seq("l_partkey"))
      .filter($"pair_qty".cast(big) * $"n_supp" * 10 >
        $"part_qty".cast(big) * tenths)
      .select($"l_suppkey").distinct()
    val nat = Tables.nation(spark, dir).select($"n_nationkey", $"n_name")
    Tables.supplier(spark, dir)
      .join(qualifying, $"s_suppkey" === $"l_suppkey")
      .join(broadcast(nat), $"s_nationkey" === $"n_nationkey")
      .select($"s_suppkey", $"s_name", $"n_name")
      .orderBy($"s_suppkey")
  }

  /** [[excessShareSuppliers]] oracle (EXISTS formulation). */
  def excessShareSuppliersSql(ptype: String = "PROMO",
      tenths: Long = 25): String =
    s"""WITH sh AS (
       |  SELECT l_partkey, l_suppkey, CAST(l_quantity AS BIGINT) AS qty
       |  FROM lineitem JOIN part ON l_partkey = p_partkey
       |  WHERE p_type = '$ptype'),
       |pp AS (SELECT l_partkey, l_suppkey, SUM(qty) AS pair_qty
       |  FROM sh GROUP BY l_partkey, l_suppkey),
       |pt AS (SELECT l_partkey, SUM(pair_qty) AS part_qty,
       |    COUNT(*) AS n_supp
       |  FROM pp GROUP BY l_partkey)
       |SELECT s_suppkey, s_name, n_name
       |FROM supplier JOIN nation ON s_nationkey = n_nationkey
       |WHERE EXISTS (SELECT 1 FROM pp JOIN pt USING (l_partkey)
       |  WHERE pp.l_suppkey = s_suppkey
       |    AND pp.pair_qty * pt.n_supp * 10 > pt.part_qty * $tenths)
       |ORDER BY s_suppkey""".stripMargin

  /** Trailing 7-day revenue by RANGE window frame — the VALUE-based
    * frame (`RANGE BETWEEN 6 PRECEDING AND CURRENT ROW` over the day
    * number), which a ROWS frame cannot emulate when the calendar has
    * gaps or multiple rows share a day. One global date-ordered window
    * over the per-day pre-aggregate (365-row state per year — the
    * window input is calendar-sized, never fact-sized, which is what
    * keeps a trailing-revenue report viable at any fact volume).
    */
  def rangeFrameRevenue(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val daily = Tables.orders(spark, dir)
      .select(expr("CAST(unix_micros(CAST(o_orderdate AS TIMESTAMP)) AS BIGINT)" +
          " div 86400000000").as("day"),
        expr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)")
          .as("cents"))
      .groupBy($"day").agg(sum($"cents").as("day_cents"),
        count(lit(1)).as("n_orders"))
    val w = Window.orderBy($"day").rangeBetween(-6, 0)
    daily.select($"day", $"n_orders", $"day_cents",
        sum($"day_cents").over(w).as("trailing7_cents"),
        sum($"n_orders").over(w).as("trailing7_orders"))
      .orderBy($"day")
  }

  /** [[rangeFrameRevenue]] oracle. */
  def rangeFrameRevenueSql(): String =
    """WITH daily AS (
      |  SELECT epoch_us(o_orderdate) // 86400000000 AS day,
      |    CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS day_cents,
      |    CAST(COUNT(*) AS BIGINT) AS n_orders
      |  FROM orders GROUP BY day)
      |SELECT day, n_orders, day_cents,
      |  CAST(SUM(day_cents) OVER (ORDER BY day
      |    RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT) AS trailing7_cents,
      |  CAST(SUM(n_orders) OVER (ORDER BY day
      |    RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT) AS trailing7_orders
      |FROM daily ORDER BY day""".stripMargin

  /** RFM (recency / frequency / monetary) segmentation — the classic
    * customer-base report, over purchase events: per user, days since
    * last purchase (relative to the corpus's last day), purchase
    * count, and cents total, each quintiled by NTILE(5) with quintile
    * 1 the best (most recent / most frequent / highest spend) and
    * user_id as the deterministic tie-break. The corpus-max day is ONE
    * broadcast scalar; the three NTILEs share one global sort each —
    * at scale swap NTILE for the percentile-threshold join (the
    * [[quantileRatingLevels]] idiom) if a single ordered pass per
    * metric is too hot; semantics stay identical. Segment code is
    * r·100 + f·10 + m (111 = best-everything).
    */
  def rfmSegments(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val purch = Tables.events(spark, dir)
      .filter($"event_type" === "purchase")
      .select($"user_id", expr("(ts div 1000) div 86400000000").as("day"),
        expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)").as("cents"))
    val base = purch.groupBy($"user_id")
      .agg(max($"day").as("last_day"), count(lit(1)).as("n_purch"),
        sum($"cents").as("cents_total"))
    val maxDay = base.agg(max($"last_day").as("corpus_last"))
    val scored = base.crossJoin(broadcast(maxDay))
      .withColumn("recency_days", $"corpus_last" - $"last_day")
      .withColumn("r_score", ntile(5).over(
        Window.orderBy($"recency_days", $"user_id")))
      .withColumn("f_score", ntile(5).over(
        Window.orderBy($"n_purch".desc, $"user_id")))
      .withColumn("m_score", ntile(5).over(
        Window.orderBy($"cents_total".desc, $"user_id")))
    scored.select($"user_id", $"recency_days", $"n_purch", $"cents_total",
        ($"r_score" * 100 + $"f_score" * 10 + $"m_score").as("segment"))
      .orderBy($"user_id")
  }

  /** [[rfmSegments]] oracle. */
  def rfmSegmentsSql(): String =
    """WITH p AS (
      |  SELECT user_id, epoch_us(ts) // 86400000000 AS day,
      |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
      |  FROM events WHERE event_type = 'purchase'),
      |b AS (SELECT user_id, MAX(day) AS last_day,
      |    CAST(COUNT(*) AS BIGINT) AS n_purch,
      |    CAST(SUM(cents) AS BIGINT) AS cents_total
      |  FROM p GROUP BY user_id),
      |s AS (SELECT user_id,
      |    (SELECT MAX(last_day) FROM b) - last_day AS recency_days,
      |    n_purch, cents_total,
      |    NTILE(5) OVER (ORDER BY (SELECT MAX(last_day) FROM b) - last_day, user_id) AS r_score,
      |    NTILE(5) OVER (ORDER BY n_purch DESC, user_id) AS f_score,
      |    NTILE(5) OVER (ORDER BY cents_total DESC, user_id) AS m_score
      |  FROM b)
      |SELECT user_id, recency_days, n_purch, cents_total,
      |  CAST(r_score * 100 + f_score * 10 + m_score AS INT) AS segment
      |FROM s ORDER BY user_id""".stripMargin

  /** Multi-DISTINCT aggregate — COUNT(DISTINCT user), COUNT(DISTINCT
    * day), and a plain SUM in ONE statement. Catalyst compiles n
    * distinct aggregates over different columns into a single Expand
    * pass (each input row fans out once per distinct group, tagged by
    * gid) + two aggregates — NOT n separate scans of the fact table,
    * which is what makes a multi-metric daily report affordable at
    * 100 TB. PlanSpec asserts the Expand. Exact integers throughout.
    */
  def multiDistinctReport(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, dir)
      .select($"event_type", $"user_id",
        expr("(ts div 1000) div 86400000000").as("day"),
        expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)").as("cents"))
      .groupBy($"event_type")
      .agg(countDistinct($"user_id").as("n_users"),
        countDistinct($"day").as("n_days"),
        count(lit(1)).as("n_events"),
        sum($"cents").as("cents_sum"))
      .orderBy($"event_type")
  }

  /** [[multiDistinctReport]] oracle. */
  def multiDistinctReportSql(): String =
    """SELECT event_type,
      |  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
      |  CAST(COUNT(DISTINCT epoch_us(ts) // 86400000000) AS BIGINT) AS n_days,
      |  CAST(COUNT(*) AS BIGINT) AS n_events,
      |  CAST(SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS cents_sum
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** Time-weighted average price (TWAP) — the irregular-sampling
    * average where each observation holds until the next one: per
    * user, Σ valueᵢ·(tᵢ₊₁−tᵢ) / (t_last−t_first), via one LEAD window
    * (no interval explode). The weighted sum runs in DECIMAL(38,0)
    * (cents × micro-duration products reach ~2⁶³ on month-long
    * windows); the final division is one integer div back to cents.
    * Users with a single event have no holding interval and are
    * excluded (mirrored). The plain AVG sits alongside to show why
    * TWAP exists: burst-sampled values skew it.
    */
  def twapValue(spark: SparkSession, dir: String): DataFrame =
    twapValueOf(Tables.events(spark, dir))

  /** [[twapValue]] over any (user_id, event_id, ts NANOS-LONG, value). */
  def twapValueOf(events: DataFrame): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"tsu", $"event_id")
    val big = org.apache.spark.sql.types.DecimalType(38, 0)
    events
      .select($"user_id", $"event_id", expr("ts div 1000").as("tsu"),
        expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)").as("cents"))
      .withColumn("t_next", lead($"tsu", 1).over(w))
      .filter($"t_next".isNotNull)
      .groupBy($"user_id")
      .agg(
        sum(($"t_next" - $"tsu").cast(big) * $"cents").as("wsum"),
        sum(($"t_next" - $"tsu").cast(big)).as("span"),
        sum($"cents").as("csum"), count(lit(1)).as("n"))
      .select($"user_id",
        // integral div, not /: decimal true-division rounds HALF_UP at
        // its result scale before any cast, diverging from DuckDB's
        // floor `//` on near-integer quotients
        expr("CAST(wsum div span AS BIGINT)").as("twap_cents"),
        expr("csum div n").as("mean_cents"),
        $"span".cast("long").as("span_us"))
      .orderBy($"user_id")
  }

  /** [[twapValue]] oracle. */
  def twapValueSql(): String =
    """WITH x AS (
      |  SELECT user_id, event_id, CAST(epoch_us(ts) AS BIGINT) AS tsu,
      |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
      |  FROM events),
      |l AS (SELECT user_id, tsu, cents,
      |    LEAD(tsu) OVER (PARTITION BY user_id ORDER BY tsu, event_id) AS t_next
      |  FROM x)
      |SELECT user_id,
      |  CAST(SUM(CAST(t_next - tsu AS HUGEINT) * cents)
      |    // SUM(CAST(t_next - tsu AS HUGEINT)) AS BIGINT) AS twap_cents,
      |  CAST(SUM(cents) AS BIGINT) // COUNT(*) AS mean_cents,
      |  CAST(SUM(t_next - tsu) AS BIGINT) AS span_us
      |FROM l WHERE t_next IS NOT NULL
      |GROUP BY user_id ORDER BY user_id""".stripMargin

  /** Semi-structured decode through Spark 4's VARIANT type — the
    * binary-encoded JSON representation that replaces
    * string-JSON + get_json_object for schema-flexible columns (parse
    * once, extract many, no per-access reparse; the same design as
    * Snowflake/Delta variant). The pipeline: `parse_json` lifts the
    * props payload to VariantType, `variant_get` does typed path
    * extraction, `schema_of_variant` reports the observed shape, and a
    * per-type aggregate proves the extracted values survive exactly.
    * At scale the parse is a codegen'd projection; only the extracted
    * longs reach the shuffle. Oracle: DuckDB's native JSON extraction
    * over the same strings.
    */
  def variantDecode(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.widened(spark, Tables.events(spark, dir))
      .select($"event_type",
        parse_json($"props").as("v"))
      .select($"event_type",
        variant_get($"v", "$.k", "long").as("k"),
        schema_of_variant($"v").as("vschema"))
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n"), sum($"k").as("sum_k"),
        min($"k").as("min_k"), max($"k").as("max_k"),
        max($"vschema").as("variant_schema"))
      .orderBy($"event_type")
  }

  /** [[variantDecode]] oracle — the schema string matches Spark's
    * `schema_of_variant` rendering for `{"k": <int>}`.
    */
  def variantDecodeSql(): String =
    """SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
      |  CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
      |  CAST(MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS min_k,
      |  CAST(MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k,
      |  'OBJECT<k: BIGINT>' AS variant_schema
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** Snapshot reconciliation (table diff) — the incremental-sync audit
    * a pipeline runs between corpus versions: full outer join on the
    * key, rows classified added / removed / changed by md5 content
    * comparison, unchanged rows dropped (the overwhelming majority at
    * scale, so the output is change-sized). One key-partitioned
    * shuffle join; content hashes travel instead of bodies.
    */
  def tableDiffOf(v1: DataFrame, v2: DataFrame): DataFrame = {
    val spark = v1.sparkSession
    import spark.implicits._
    val a = v1.select($"doc_id", md5($"text").as("h1"))
    val b = v2.select($"doc_id", md5($"text").as("h2"))
    a.join(b, Seq("doc_id"), "full_outer")
      .withColumn("status",
        when($"h1".isNull, lit("added"))
          .when($"h2".isNull, lit("removed"))
          .when($"h1" =!= $"h2", lit("changed")))
      .filter($"status".isNotNull)
      .select($"doc_id", $"status")
      .orderBy($"doc_id")
  }

  /** Offset for the fixture's appended doc_ids; [[tableDiff]] asserts
    * the corpus stays below it so appended ids can never collide with
    * genuine ones (a collision would duplicate v2 keys and silently
    * corrupt the 'added' classification on both engines).
    */
  val DiffAppendOffset = 100000L

  /** Driver form: v2 is a deterministic mutation of the documents
    * corpus (every 17th doc deleted, every 13th remaining doc edited,
    * one appended doc per 29th) — both engines construct the same v2,
    * so the diff is oracle-checkable without a second table.
    */
  def tableDiff(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val v1 = Tables.widened(spark, Tables.documents(spark, dir))
      .select($"doc_id", $"text")
    val maxId = v1.agg(max($"doc_id")).head().getLong(0)
    require(maxId < DiffAppendOffset,
      s"tableDiff fixture offset $DiffAppendOffset collides: max doc_id $maxId")
    val v2 = v1
      .filter($"doc_id" % 17 =!= 3)
      .select($"doc_id",
        when($"doc_id" % 13 === 5, concat($"text", lit(" rev2")))
          .otherwise($"text").as("text"))
      .unionByName(v1.filter($"doc_id" % 29 === 0)
        .select(($"doc_id" + DiffAppendOffset).as("doc_id"), $"text"))
    tableDiffOf(v1, v2)
  }

  /** TPC-H Q10-shaped returned-item customer ranking: which customers
    * returned the most revenue in a quarter — the four-table headline
    * join (lineitem ⨝ orders ⨝ customer ⨝ nation). Both date/flag
    * filters push to the scans; nation (25 rows) broadcasts; customer
    * joins on the shuffled key only after orders are date-pruned;
    * revenue accumulates in the exact decimal domain; top 20 is a
    * TakeOrderedAndProject.
    */
  def returnedItemRanking(spark: SparkSession, dir: String,
      from: String = "1996-01-01", until: String = "1996-04-01",
      k: Int = 20): DataFrame = {
    import spark.implicits._
    val lo = lit(from).cast("timestamp")
    val hi = lit(until).cast("timestamp")
    val li = Tables.lineitem(spark, dir)
      .filter($"l_returnflag" === "R")
      .select($"l_orderkey", $"l_extendedprice", $"l_discount")
    val ord = Tables.orders(spark, dir)
      .filter($"o_orderdate" >= lo && $"o_orderdate" < hi)
      .select($"o_orderkey", $"o_custkey")
    val cust = Tables.customer(spark, dir)
      .select($"c_custkey", $"c_name", $"c_acctbal", $"c_nationkey")
    val nat = Tables.nation(spark, dir).select($"n_nationkey", $"n_name")
    li.join(ord, $"l_orderkey" === $"o_orderkey")
      .join(cust, $"o_custkey" === $"c_custkey")
      .join(broadcast(nat), $"c_nationkey" === $"n_nationkey")
      .groupBy($"c_custkey", $"c_name", $"c_acctbal", $"n_name")
      .agg(sum(Fx.dec2($"l_extendedprice") * (Fx.one - Fx.rate2($"l_discount")))
        .cast("double").as("revenue"))
      .select($"c_custkey", $"c_name", $"revenue", $"c_acctbal", $"n_name")
      .orderBy($"revenue".desc, $"c_custkey")
      .limit(k)
  }

  /** TPC-H Q3-shaped shipping-priority headline join: segment-filtered
    * customers ⨝ date-filtered orders ⨝ ship-date-filtered lineitems,
    * revenue per order, top 10. The canonical big-join benchmark shape:
    * both filters are pushed to the parquet scans, the
    * customer side broadcasts (a 0.2% segment of the smallest fact
    * table), the aggregation is partial+final on l_orderkey, and the
    * top-10 is a TakeOrderedAndProject — no global sort at any scale.
    * Revenue accumulates in the exact decimal domain ([[graft.Fx]]).
    */
  def shippingPriority(spark: SparkSession, dir: String,
      segment: String = "BUILDING", cutoff: String = "1996-06-30",
      k: Int = 10): DataFrame = {
    import spark.implicits._
    val cut = lit(cutoff).cast("timestamp")
    val cust = Tables.customer(spark, dir)
      .filter($"c_mktsegment" === segment).select($"c_custkey")
    val ord = Tables.orders(spark, dir)
      .filter($"o_orderdate" < cut)
      .select($"o_orderkey", $"o_custkey", $"o_orderdate", $"o_orderpriority")
    val li = Tables.lineitem(spark, dir)
      .filter($"l_shipdate" > cut)
      .select($"l_orderkey", $"l_extendedprice", $"l_discount")
    li.join(ord, $"l_orderkey" === $"o_orderkey")
      .join(broadcast(cust), $"o_custkey" === $"c_custkey")
      .groupBy($"l_orderkey", $"o_orderdate", $"o_orderpriority")
      .agg(sum(Fx.dec2($"l_extendedprice") * (Fx.one - Fx.rate2($"l_discount")))
        .cast("double").as("revenue"))
      .select($"l_orderkey", $"revenue",
        $"o_orderdate".cast("date").as("o_orderdate"), $"o_orderpriority")
      .orderBy($"revenue".desc, $"o_orderdate", $"l_orderkey")
      .limit(k)
  }

  /** TPC-H Q6-shaped forecast-revenue-change: the canonical
    * single-scan benchmark — three pushed predicates, zero joins, one
    * global aggregate in the exact decimal domain. At any scale the
    * plan is a parquet scan with all three filters in `PushedFilters`
    * (row groups whose min/max exclude the date or discount range are
    * never decompressed) feeding a partial+final agg of one decimal —
    * the query IO bandwidth is the only cost. The clean 2-decimal
    * discount column compares exactly as DOUBLE in both engines, so
    * the BETWEEN needs no epsilon dance.
    */
  def forecastRevenueChange(spark: SparkSession, dir: String,
      from: String = "1996-01-01", until: String = "1997-01-01"): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, dir)
      .filter($"l_shipdate" >= lit(from).cast("timestamp") &&
        $"l_shipdate" < lit(until).cast("timestamp") &&
        $"l_discount" >= 0.05 && $"l_discount" <= 0.07 &&
        $"l_quantity" < 24)
      .agg(sum(Fx.dec2($"l_extendedprice") * Fx.rate2($"l_discount"))
        .cast("double").as("revenue"))
  }

  /** TPC-H Q4-shaped late-order priority counts (adapted: no
    * commit/receipt dates in this corpus, so "problem order" = any
    * lineitem shipped more than 60 days after the order date). The Q4
    * pattern: a date-windowed order scan SEMI-joined against its
    * lineitems on a compound (key + time-skew) condition — each order
    * counted once no matter how many late lines — then a tiny
    * priority rollup. Both date filters push to their scans; the semi
    * join is one hash shuffle; nothing here is quadratic.
    */
  def lateOrderPriority(spark: SparkSession, dir: String,
      from: String = "1996-07-01", until: String = "1996-10-01",
      lateDays: Int = 60): DataFrame = {
    import spark.implicits._
    val ord = Tables.orders(spark, dir)
      .filter($"o_orderdate" >= lit(from).cast("timestamp") &&
        $"o_orderdate" < lit(until).cast("timestamp"))
      .select($"o_orderkey", $"o_orderdate", $"o_orderpriority")
    val li = Tables.lineitem(spark, dir).select($"l_orderkey", $"l_shipdate")
    ord.join(li, $"l_orderkey" === $"o_orderkey" &&
        $"l_shipdate" > $"o_orderdate" + expr(s"INTERVAL $lateDays DAYS"),
        "left_semi")
      .groupBy($"o_orderpriority")
      .agg(count(lit(1)).as("order_count"))
      .orderBy($"o_orderpriority")
  }

  /** TPC-H Q7-shaped nation-pair volume shipping: revenue flowing
    * between two trading nations in each direction, by ship year. The
    * two-dimension filter (supplier nation × customer nation, either
    * orientation) broadcasts — both nation slivers are 1-row frames —
    * so the fact-side work is the usual two key shuffles; the pair
    * orientation is decided by equi-joined dimension columns, never a
    * theta condition. Year is a pure calendar extract, identical in
    * both engines on NTZ timestamps.
    */
  def nationVolumeShipping(spark: SparkSession, dir: String,
      nationA: String = "NATION_1", nationB: String = "NATION_2",
      from: String = "1996-01-01", until: String = "1998-01-01"): DataFrame = {
    import spark.implicits._
    val nat = Tables.nation(spark, dir)
      .filter($"n_name" === nationA || $"n_name" === nationB)
      .select($"n_nationkey", $"n_name")
    val sup = Tables.supplier(spark, dir)
      .join(broadcast(nat), $"s_nationkey" === $"n_nationkey")
      .select($"s_suppkey", $"n_name".as("supp_nation"))
    val cust = Tables.customer(spark, dir)
      .join(broadcast(nat), $"c_nationkey" === $"n_nationkey")
      .select($"c_custkey", $"n_name".as("cust_nation"))
    Tables.lineitem(spark, dir)
      .filter($"l_shipdate" >= lit(from).cast("timestamp") &&
        $"l_shipdate" < lit(until).cast("timestamp"))
      .select($"l_orderkey", $"l_suppkey", $"l_shipdate",
        $"l_extendedprice", $"l_discount")
      .join(Tables.orders(spark, dir).select($"o_orderkey", $"o_custkey"),
        $"l_orderkey" === $"o_orderkey")
      .join(cust, $"o_custkey" === $"c_custkey")
      .join(sup, $"l_suppkey" === $"s_suppkey")
      .filter($"supp_nation" =!= $"cust_nation")
      .groupBy($"supp_nation", $"cust_nation",
        year($"l_shipdate").as("l_year"))
      .agg(sum(Fx.dec2($"l_extendedprice") * (Fx.one - Fx.rate2($"l_discount")))
        .cast("double").as("revenue"))
      .orderBy($"supp_nation", $"cust_nation", $"l_year")
  }

  /** TPC-H Q14-shaped promo revenue share: what fraction of one
    * month's discounted revenue came from promo parts. Both sums
    * accumulate exactly in the decimal domain in ONE conditional
    * aggregate pass; the ratio is derived from the two exact decimals
    * with the same IEEE expression tree in both engines (the
    * [[graft.operators.Audit.corrMoments]] determinism pattern).
    */
  def promoRevenueRatio(spark: SparkSession, dir: String,
      from: String = "1996-09-01", until: String = "1996-10-01"): DataFrame = {
    import spark.implicits._
    val rev = Fx.dec2($"l_extendedprice") * (Fx.one - Fx.rate2($"l_discount"))
    Tables.lineitem(spark, dir)
      .filter($"l_shipdate" >= lit(from).cast("timestamp") &&
        $"l_shipdate" < lit(until).cast("timestamp"))
      .select($"l_partkey", $"l_extendedprice", $"l_discount")
      .join(Tables.part(spark, dir).select($"p_partkey", $"p_type"),
        $"l_partkey" === $"p_partkey")
      .agg(
        sum(when($"p_type" === "PROMO", rev).otherwise(lit(0).cast("decimal(3,2)")))
          .cast("double").as("promo_revenue"),
        sum(rev).cast("double").as("total_revenue"))
      .select($"promo_revenue", $"total_revenue",
        (lit(100.0) * $"promo_revenue" / $"total_revenue").as("promo_pct"))
  }

  /** TPC-H Q18-shaped large-volume customers ("whales"): orders whose
    * total quantity crosses a threshold, joined back to their
    * customer. The HAVING-filtered aggregate runs FIRST (partial+final
    * on the order key), so only the whale slice — a tiny fraction of
    * orders — ever joins the dimension tables; top-k is a
    * TakeOrderedAndProject over that slice.
    */
  def largeVolumeOrders(spark: SparkSession, dir: String,
      minQty: Double = 250.0, k: Int = 20): DataFrame = {
    import spark.implicits._
    val big = Tables.lineitem(spark, dir)
      .groupBy($"l_orderkey")
      .agg(Fx.dsum($"l_quantity").as("total_qty"))
      .filter($"total_qty" > minQty)
    big.join(Tables.orders(spark, dir)
        .select($"o_orderkey", $"o_custkey", $"o_orderdate"),
        $"l_orderkey" === $"o_orderkey")
      .join(Tables.customer(spark, dir).select($"c_custkey", $"c_name"),
        $"o_custkey" === $"c_custkey")
      .select($"c_custkey", $"c_name", $"o_orderkey",
        $"o_orderdate".cast("date").as("o_orderdate"), $"total_qty")
      .orderBy($"total_qty".desc, $"o_orderkey")
      .limit(k)
  }

  /** TPC-H Q12-shaped priority-class counts (adapted: this corpus has
    * no l_shipmode, so the two-way split groups by l_linestatus): one
    * date-pruned fact-fact join, then conditional counts — urgent
    * (priority 1/2) vs other — per group. The Q12 pattern at scale:
    * the date filter pushes to the lineitem scan, the join is one
    * shuffle on the order key, and the CASE counts fold partial+final
    * so the conditional split costs nothing beyond the join.
    */
  def priorityLineCounts(spark: SparkSession, dir: String,
      from: String = "1996-01-01", until: String = "1997-01-01"): DataFrame = {
    import spark.implicits._
    val li = Tables.lineitem(spark, dir)
      .filter($"l_shipdate" >= lit(from).cast("timestamp") &&
        $"l_shipdate" < lit(until).cast("timestamp"))
      .select($"l_orderkey", $"l_linestatus")
    val ord = Tables.orders(spark, dir)
      .select($"o_orderkey", $"o_orderpriority")
    li.join(ord, $"l_orderkey" === $"o_orderkey")
      .groupBy($"l_linestatus")
      .agg(
        count(when($"o_orderpriority" === "1-URGENT" ||
          $"o_orderpriority" === "2-HIGH", 1)).as("high_line_count"),
        count(when($"o_orderpriority" =!= "1-URGENT" &&
          $"o_orderpriority" =!= "2-HIGH", 1)).as("low_line_count"))
      .orderBy($"l_linestatus")
  }

  /** CUBE report over (status, priority) — the full 2-D grouping-sets
    * lattice ([both], [status], [priority], [grand total]) in ONE
    * partial-aggregatable pass (Spark's Expand feeds a single hash
    * aggregate; no per-grouping rescans). Rolled-up keys are emitted
    * as the literal 'ALL' plus explicit grouping flags, so the output
    * carries no NULLs — that sidesteps the one cross-engine hazard of
    * cube results (NULL ordering differs between engines) and makes
    * the ORDER BY total. Measures: exact count + decimal-domain sum.
    */
  def cubeReport(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.orders(spark, dir)
      .cube($"o_orderstatus", $"o_orderpriority")
      .agg(count(lit(1)).as("n_orders"),
        Fx.dsum($"o_totalprice").as("sum_price"),
        grouping($"o_orderstatus").cast("int").as("g_status"),
        grouping($"o_orderpriority").cast("int").as("g_priority"))
      .select(
        coalesce($"o_orderstatus", lit("ALL")).as("status"),
        coalesce($"o_orderpriority", lit("ALL")).as("priority"),
        $"g_status", $"g_priority", $"n_orders", $"sum_price")
      .orderBy($"g_status", $"g_priority", $"status", $"priority")
  }

  /** TPC-H Q16-shaped supplier variety: how many distinct suppliers
    * stock each surviving (brand, type, size) bucket, with a
    * supplier blocklist (the complaints analog: negative account
    * balance) excluded up front. The scaled shape: the part-supplier
    * relation is DERIVED from lineitem as distinct pairs (this corpus
    * has no partsupp table) — one partial-aggregatable distinct; the
    * blocklist anti-join broadcasts (it's a filtered sliver of the
    * smallest dimension); part filters push to the scan; the count
    * distinct is the standard two-phase expand aggregate.
    */
  def supplierPartVariety(spark: SparkSession, dir: String,
      excludeBrand: String = "Brand#45",
      excludeType: String = "STANDARD",
      sizes: Seq[Int] = Seq(1, 5, 10, 15, 20, 25, 30, 35)): DataFrame = {
    import spark.implicits._
    val blocked = Tables.supplier(spark, dir)
      .filter($"s_acctbal" < 0).select($"s_suppkey")
    val ps = Tables.lineitem(spark, dir)
      .select($"l_partkey", $"l_suppkey").distinct()
      .join(broadcast(blocked), $"l_suppkey" === $"s_suppkey", "left_anti")
    val parts = Tables.part(spark, dir)
      .filter($"p_brand" =!= excludeBrand && $"p_type" =!= excludeType &&
        $"p_size".isin(sizes.map(Integer.valueOf): _*))
      .select($"p_partkey", $"p_brand", $"p_type", $"p_size")
    ps.join(parts, $"l_partkey" === $"p_partkey")
      .groupBy($"p_brand", $"p_type", $"p_size")
      .agg(countDistinct($"l_suppkey").as("supplier_cnt"))
      .orderBy($"supplier_cnt".desc, $"p_brand", $"p_type", $"p_size")
  }

  /** Pareto frontier (skyline) over (price, size) — multi-objective
    * selection ("no other part is both cheaper and smaller"), the
    * pruning primitive behind config/offer dedup. The naive statement
    * is a quadratic dominance self-join; this is the scaled form built
    * on the [[winsorize]] distinct-value idiom: per-VALUE minima
    * (partial-aggregatable), a prefix-min window over DISTINCT price
    * points only (bounded by the price domain, never by row count),
    * then one broadcast join back to the scan. A row is dominated iff
    * a strictly-cheaper price point carries size ≤ its own, or its own
    * price point carries a strictly smaller size. Ties on both
    * dimensions are mutually non-dominating, so duplicates co-survive
    * — the definition the oracle's NOT EXISTS states directly, met by
    * an independent formulation.
    */
  def paretoFrontier(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val rows = Tables.part(spark, dir)
      .select($"p_partkey", $"p_retailprice", $"p_size",
        ($"p_retailprice".cast("decimal(18,2)") * 100).cast("long").as("cents"))
    val perPrice = rows.groupBy($"cents")
      .agg(min($"p_size").as("min_size_here"))
      .withColumn("min_size_cheaper",
        min($"min_size_here").over(Window.orderBy($"cents")
          .rowsBetween(Window.unboundedPreceding, -1)))
    rows.join(broadcast(perPrice), Seq("cents"))
      .filter(($"min_size_cheaper".isNull ||
          $"min_size_cheaper" > $"p_size") &&
        $"min_size_here" === $"p_size")
      .select($"p_partkey", $"p_retailprice", $"p_size")
      .orderBy($"p_partkey")
  }

  /** Rank-based quantile normalization of event values per type — the
    * ML feature transform that maps every value onto its within-group
    * percentile (integer ppm). A direct `rank() OVER (PARTITION BY
    * type)` puts each group in ONE task (5 types ⇒ 5 tasks at any
    * scale); this uses the [[winsorize]] histogram idiom instead:
    * per-(type, value) counts (partial-aggregatable over all cores),
    * a cumulative window over DISTINCT value points only, and a
    * broadcast join back — min-rank = cum − cnt + 1, identical to SQL
    * RANK() by definition, which is exactly how the oracle states it.
    */
  def quantileNormalize(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, dir)
      .select($"event_id", $"event_type",
        ($"value".cast("decimal(18,2)") * 100).cast("long").as("cents"))
    val byType = Window.partitionBy($"event_type")
    val hist = ev.groupBy($"event_type", $"cents")
      .agg(count(lit(1)).as("cnt"))
      .withColumn("cum", sum($"cnt").over(
        byType.orderBy($"cents")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("n", sum($"cnt").over(byType))
      .select($"event_type", $"cents",
        ($"cum" - $"cnt" + 1).as("rank_min"), $"n")
    ev.join(broadcast(hist), Seq("event_type", "cents"))
      .select($"event_id", $"event_type", $"cents",
        when($"n" === 1, 0L)
          .otherwise(expr("(rank_min - 1) * 1000000 div (n - 1)"))
          .as("pct_ppm"))
      .orderBy($"event_id")
  }

  /** TPC-H Q5-shaped local-supplier volume: revenue per nation for
    * orders whose customer AND supplier sit in the same nation of one
    * region, one order-date year. The six-table star join in its
    * scaled shape: region (5 rows) and nation (25 rows) broadcast and
    * prune the customer/supplier scans; the date filter pushes to the
    * orders scan; the only shuffles are the two fact-fact equi-joins
    * (lineitem ⨝ orders, ⨝ supplier) plus the 25-group final
    * aggregate, all partial-aggregatable. The same-nation predicate is
    * applied as an equi-join condition (c_nationkey = s_nationkey), so
    * Catalyst keeps it a hash join — never a theta join. Revenue
    * accumulates in the exact decimal domain ([[graft.Fx]]).
    */
  def localSupplierVolume(spark: SparkSession, dir: String,
      region: String = "ASIA", from: String = "1996-01-01",
      until: String = "1997-01-01"): DataFrame = {
    import spark.implicits._
    val reg = Tables.region(spark, dir)
      .filter($"r_name" === region).select($"r_regionkey")
    val nat = Tables.nation(spark, dir)
      .join(reg, $"n_regionkey" === $"r_regionkey")
      .select($"n_nationkey", $"n_name")
    val cust = Tables.customer(spark, dir)
      .join(broadcast(nat), $"c_nationkey" === $"n_nationkey")
      .select($"c_custkey", $"c_nationkey", $"n_name")
    val ord = Tables.orders(spark, dir)
      .filter($"o_orderdate" >= lit(from).cast("timestamp") &&
        $"o_orderdate" < lit(until).cast("timestamp"))
      .select($"o_orderkey", $"o_custkey")
    val sup = Tables.supplier(spark, dir)
      .select($"s_suppkey", $"s_nationkey")
    Tables.lineitem(spark, dir)
      .select($"l_orderkey", $"l_suppkey", $"l_extendedprice", $"l_discount")
      .join(ord, $"l_orderkey" === $"o_orderkey")
      .join(cust, $"o_custkey" === $"c_custkey")
      .join(sup, $"l_suppkey" === $"s_suppkey" &&
        $"c_nationkey" === $"s_nationkey")
      .groupBy($"n_name")
      .agg(sum(Fx.dec2($"l_extendedprice") * (Fx.one - Fx.rate2($"l_discount")))
        .cast("double").as("revenue"))
      .orderBy($"revenue".desc, $"n_name")
  }

  /** Embargo micro-gap between the train cutoff and the test start
    * (2 days in µs) — shared with the oracle SQL.
    */
  val EmbargoUs: Long = 2L * 24 * 3600 * 1000000L

  /** Time-ordered train/test split with an embargo gap — the temporal
    * analog of [[graft.operators.TextOps]]'s leakage-safe split: train
    * is everything up to the 70th time percentile, test starts only
    * after a 2-day embargo, and the in-between rows are labeled
    * `embargo` and dropped by the consumer (they'd leak trailing-window
    * features across the fence). The cutoff is ONE broadcast scalar
    * (exact interpolated percentile floored to integer µs, identical
    * in both engines on integer input); the labeling itself is a pure
    * projection — no per-row shuffle at any scale.
    */
  def temporalSplitEmbargo(spark: SparkSession, dir: String,
      trainPct: Double = 0.7, embargoUs: Long = EmbargoUs): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, dir)
      .select($"event_id", expr("ts div 1000").as("tsu"))
    val cut = ev.agg(
      floor(percentile($"tsu", lit(trainPct))).cast("long").as("cutoff"))
    ev.crossJoin(broadcast(cut))
      .select($"event_id",
        when($"tsu" <= $"cutoff", "train")
          .when($"tsu" <= $"cutoff" + embargoUs, "embargo")
          .otherwise("test").as("split"))
      .orderBy($"event_id")
  }

  /** Cohort retention (§2-beyond — the product-analytics staple over an
    * event log): users are cohorted by the week of their first event
    * (integer floor on the epoch, `ts div 604_800e9 ns` — no calendar
    * semantics to diverge on), and each (cohort, week-offset) cell
    * counts the users active that week. TWO partial-aggregatable
    * shuffles at any scale: per-user week sets fold in one pass
    * (`collect_set` state bounded by the corpus duration in weeks, not
    * by user activity), then the exploded (cohort, offset) grid — at
    * most weeks² cells — aggregates. Cohort sizes come from the
    * offset-0 diagonal of the same grid via a broadcast self-join
    * (cohort count = corpus weeks, tiny at any scale).
    */
  def cohortRetention(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val weeks = Tables.events(spark, dir)
      .select($"user_id", expr("ts div 604800000000000").as("wk"))
      .groupBy($"user_id")
      .agg(collect_set($"wk").as("wks"))
      .select($"user_id", array_min($"wks").as("cohort_week"),
        explode($"wks").as("wk"))
    val act = weeks
      .groupBy($"cohort_week", ($"wk" - $"cohort_week").as("week_offset"))
      .agg(count(lit(1)).as("active_users"))
    val sizes = act.filter($"week_offset" === 0)
      .select($"cohort_week", $"active_users".as("cohort_size"))
    act.join(broadcast(sizes), Seq("cohort_week"))
      .select($"cohort_week", $"week_offset", $"active_users", $"cohort_size")
      .orderBy($"cohort_week", $"week_offset")
  }

  /** SCD type-2 dimension build (§2-beyond — the warehouse-maintenance
    * sibling of [[tableDiffOf]]/merge-apply): compress a change-event
    * log into validity intervals. Each user's `event_type` stream is
    * collapsed to its change points (`lag` ≠ current), then `lead`
    * supplies each version's `valid_to`; the open interval is the
    * current row. ONE shuffle on the entity key serves both window
    * passes (same partitioning + ordering, so the sort is reused);
    * state per row is O(1). `(tsu, event_id)` ordering makes the
    * version sequence total and engine-identical.
    */
  def scd2Dimension(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"tsu", $"event_id")
    Tables.events(spark, dir)
      .select($"user_id", expr("ts div 1000").as("tsu"), $"event_id",
        $"event_type".as("attr"))
      .withColumn("prev", lag($"attr", 1).over(w))
      .filter($"prev".isNull || $"prev" =!= $"attr")
      .withColumn("version", row_number().over(w))
      .withColumn("valid_to", lead($"tsu", 1).over(w))
      .select($"user_id", $"attr", $"tsu".as("valid_from"), $"valid_to",
        $"version",
        when($"valid_to".isNull, 1).otherwise(0).as("is_current"))
      .orderBy($"user_id", $"version")
  }

  /** Per-group top-k without a global sort (§2-beyond — "top 3
    * customers by spend in every nation"): the rank-filter formulation
    * `row_number() <= k` that Spark ≥3.5 rewrites into a
    * `WindowGroupLimit` with a PARTIAL pass before the exchange — each
    * map task keeps only its local top-k per group, so the shuffle
    * carries O(groups × k) rows per task instead of every customer.
    * That rewrite is exactly why the declarative window form beats a
    * hand-rolled per-group heap here (plan-asserted in PlanSpec).
    * Spend accumulates in the exact decimal domain; `(spend DESC,
    * c_custkey)` is a total order so ranks are engine-identical.
    */
  def topkPerGroup(spark: SparkSession, dir: String, k: Int = 3): DataFrame = {
    import spark.implicits._
    val spend = Tables.orders(spark, dir)
      .groupBy($"o_custkey")
      .agg(Fx.dsum($"o_totalprice").as("spend"))
    val cust = Tables.customer(spark, dir).select($"c_custkey", $"c_nationkey")
    val nat = Tables.nation(spark, dir).select($"n_nationkey", $"n_name")
    val w = Window.partitionBy($"n_name")
      .orderBy($"spend".desc, $"c_custkey")
    spend.join(cust, $"o_custkey" === $"c_custkey")
      .join(broadcast(nat), $"c_nationkey" === $"n_nationkey")
      .withColumn("rk", row_number().over(w))
      .filter($"rk" <= k)
      .select($"n_name", $"c_custkey", $"spend", $"rk")
      .orderBy($"n_name", $"rk")
  }

  /** Markov transition counts (§2-beyond — the "what happens next"
    * matrix behind path analysis and next-event prediction): per-user
    * event bigrams via LEAD over the (ts, event_id) total order, then a
    * plain partial-aggregatable count per (from, to) pair. The
    * transition probability is the exact integer floor(cnt·10⁶ /
    * row-total) — ppm, no IEEE division anywhere — computed with one
    * tiny window over the (from_type) marginals (|event types|² rows,
    * driver-free). One shuffle on user_id for the LEAD, one on the pair
    * key for the count; both survive any scale-up because state per key
    * is a single long.
    */
  def eventTransitions(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    Tables.events(spark, dir)
      .select($"user_id", $"ts", $"event_id", $"event_type")
      .withColumn("to_type", lead($"event_type", 1).over(w))
      .filter($"to_type".isNotNull)
      .groupBy($"event_type".as("from_type"), $"to_type")
      .agg(count(lit(1)).as("cnt"))
      .withColumn("from_total",
        sum($"cnt").over(Window.partitionBy($"from_type")))
      .select($"from_type", $"to_type", $"cnt",
        expr("(cnt * 1000000) div from_total").as("prob_ppm"))
      .orderBy($"from_type", $"to_type")
  }

  /** Percentile winsorization (§2-beyond — outlier clipping, the
    * feature-engineering staple): clip `o_totalprice` to its per-group
    * [p05, p95] DISC percentiles. The bounds come from a VALUE-level
    * cumulative histogram, not a per-row sort: count per (group, price)
    * is partial-aggregated first, the running total runs over distinct
    * values only, and percentile_disc(q) is then "smallest value whose
    * cumulative count ≥ ceil(q·n)" — selection arithmetic on exact
    * integers, engine-identical (ceil via `(n·q + 99) div 100`). The
    * tiny bounds table broadcasts back onto the fact scan, and the clip
    * itself is least/greatest — every output double is one of the
    * input doubles, so cross-engine hashing is exact. At 100 TB the
    * sketch path (Sketches.histogramQuantiles) replaces the exact
    * histogram when distinct values explode; the SHAPE here (agg →
    * distinct-value window → broadcast join) is already the scaled one.
    */
  def winsorize(spark: SparkSession, dir: String,
                loPct: Int = 5, hiPct: Int = 95): DataFrame = {
    import spark.implicits._
    val orders = Tables.orders(spark, dir)
      .select($"o_orderkey", $"o_orderpriority", $"o_totalprice")
    val byGrp = Window.partitionBy($"o_orderpriority")
    val hist = orders
      .groupBy($"o_orderpriority", $"o_totalprice")
      .agg(count(lit(1)).as("cnt"))
      .withColumn("cum", sum($"cnt").over(
        byGrp.orderBy($"o_totalprice")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("n", sum($"cnt").over(byGrp))
    val bounds = hist.groupBy($"o_orderpriority").agg(
      min(when($"cum" >= expr(s"(n * $loPct + 99) div 100"),
        $"o_totalprice")).as("lo"),
      min(when($"cum" >= expr(s"(n * $hiPct + 99) div 100"),
        $"o_totalprice")).as("hi"))
    orders.join(broadcast(bounds), Seq("o_orderpriority"))
      .select($"o_orderkey", $"o_orderpriority", $"o_totalprice",
        least(greatest($"o_totalprice", $"lo"), $"hi").as("clipped"),
        $"lo", $"hi")
      .orderBy($"o_orderkey")
  }

  /** TPC-H Q15-shaped top supplier(s) by interval revenue. The classic
    * "create view revenue0" pattern becomes a reused DataFrame: one
    * key-shuffle aggregate per supplier in the exact decimal domain,
    * then the global max — a 1-row frame — broadcasts back and the
    * winners equi-join it ON THE EXACT DECIMAL (never the double
    * projection), so ties and the winner set are bit-identical in both
    * engines. At 100 TB: the fact scan is date-pruned, the per-supplier
    * agg folds partial+final, and the max+filter adds one broadcast —
    * no window over all suppliers, no second fact scan.
    */
  def topSupplierRevenue(spark: SparkSession, dir: String,
      from: String = "1996-01-01", until: String = "1996-04-01"): DataFrame = {
    import spark.implicits._
    val rev = Tables.lineitem(spark, dir)
      .filter($"l_shipdate" >= lit(from).cast("timestamp") &&
        $"l_shipdate" < lit(until).cast("timestamp"))
      .groupBy($"l_suppkey")
      .agg(sum(Fx.dec2($"l_extendedprice") * (Fx.one - Fx.rate2($"l_discount")))
        .as("rev"))
    val best = rev.agg(max($"rev").as("max_rev"))
    rev.join(broadcast(best), $"rev" === $"max_rev")
      .join(Tables.supplier(spark, dir).select($"s_suppkey", $"s_name"),
        $"l_suppkey" === $"s_suppkey")
      .select($"s_suppkey", $"s_name", $"rev".cast("double").as("total_revenue"))
      .orderBy($"s_suppkey")
  }

  /** TPC-H Q17-shaped small-quantity revenue: average yearly revenue
    * lost if orders below 20% of a part's mean quantity were not
    * filled, over one brand's parts. The correlated `0.2 * avg(...)`
    * subquery becomes a self-agg + join-back on the part key; the
    * threshold compare is cross-multiplied into pure integer-cents
    * arithmetic (`qty_cents * 5 * cnt < sum_cents` ⟺
    * `qty < 0.2 * avg(qty)`) so no division or float ever decides a
    * row. At 100 TB: the brand sliver broadcasts, so the fact table is
    * touched once for stats and once for the probe — both restricted
    * to the sliver's partitions — and both aggs fold partial+final.
    */
  def smallQuantityRevenue(spark: SparkSession, dir: String,
      brand: String = "Brand#1"): DataFrame = {
    import spark.implicits._
    val pts = Tables.part(spark, dir)
      .filter($"p_brand" === brand).select($"p_partkey")
    val li = Tables.lineitem(spark, dir)
      .join(broadcast(pts), $"l_partkey" === $"p_partkey")
      .select($"l_partkey",
        (Fx.dec2($"l_quantity") * 100).cast("long").as("qty_cents"),
        (Fx.dec2($"l_extendedprice") * 100).cast("long").as("price_cents"))
    val stats = li.groupBy($"l_partkey".as("sp"))
      .agg(sum($"qty_cents").as("qty_sum"), count(lit(1)).as("cnt"))
    li.join(stats, $"l_partkey" === $"sp")
      .filter($"qty_cents" * 5 * $"cnt" < $"qty_sum")
      .agg(
        (sum($"price_cents").cast("double") / 700.0).as("avg_yearly"),
        count(lit(1)).as("n_lines"))
  }

  /** TPC-H Q21-shaped waiting-supplier ranking (adapted: no
    * commit/receipt dates in this corpus, so "late" = shipped more
    * than `lateDays` after the order date, and each supplier counts
    * once per order via the distinct pair). A supplier "kept an order
    * waiting" when, on a finished multi-supplier order, it was the
    * SOLE late supplier: EXISTS another supplier on the order, NOT
    * EXISTS another late one. All three joins — the order-date
    * attach, the semi, and the anti — hash on the SAME order key, so
    * one exchange's partitioning is reused across the chain; the late
    * pair set is computed once and probed twice. Top-k is a
    * TakeOrderedAndProject over the per-supplier counts.
    */
  def waitingSupplierRanking(spark: SparkSession, dir: String,
      lateDays: Int = 60, k: Int = 100): DataFrame = {
    import spark.implicits._
    val ord = Tables.orders(spark, dir)
      .filter($"o_orderstatus" === "F")
      .select($"o_orderkey", $"o_orderdate")
    val li = Tables.lineitem(spark, dir)
      .select($"l_orderkey", $"l_suppkey", $"l_shipdate")
    val late = li
      .join(ord, $"l_orderkey" === $"o_orderkey")
      .filter($"l_shipdate" > $"o_orderdate" + expr(s"INTERVAL $lateDays DAYS"))
      .select($"l_orderkey", $"l_suppkey").distinct()
    val others = li.select($"l_orderkey".as("o2"), $"l_suppkey".as("s2"))
    val lateOthers = late.select($"l_orderkey".as("o3"), $"l_suppkey".as("s3"))
    late
      .join(others, $"l_orderkey" === $"o2" && $"l_suppkey" =!= $"s2", "left_semi")
      .join(lateOthers, $"l_orderkey" === $"o3" && $"l_suppkey" =!= $"s3", "left_anti")
      .groupBy($"l_suppkey")
      .agg(count(lit(1)).as("numwait"))
      .join(Tables.supplier(spark, dir).select($"s_suppkey", $"s_name"),
        $"l_suppkey" === $"s_suppkey")
      .select($"s_suppkey", $"s_name", $"numwait")
      .orderBy($"numwait".desc, $"s_suppkey")
      .limit(k)
  }

  /** TPC-H Q22-shaped idle-customer balance (adapted: no phone country
    * codes in this corpus, so the segment filter plays the
    * substring-IN role and nations play the country-code grouping).
    * Customers in the chosen market segments whose balance exceeds the
    * mean POSITIVE balance and who have never ordered, rolled up per
    * nation. The correlated average becomes a 1-row broadcast and the
    * `> avg` compare is cross-multiplied into integer cents
    * (`bal_cents * pos_cnt > pos_sum`), so no float decides
    * membership; "idle" = no order on/after `lapsedSince` (this
    * corpus's every customer has SOME order, so the literal
    * never-ordered predicate is vacuous — the date-windowed form is
    * the one a retention pipeline runs anyway), one anti join on the
    * customer key with the date filter PUSHED to the orders scan so
    * old partitions are never read. At 100 TB the orders side is the
    * big probe — the anti join shuffles both sides once on custkey,
    * everything else broadcasts.
    */
  /** TPC-H Q8-shaped national market share: of a region's revenue in
    * one part type, what fraction came from a chosen nation's
    * suppliers, per order year. The two conditional decimal sums ride
    * ONE aggregate pass (the Q14 idiom) and the share divides the two
    * exact decimals with the same IEEE tree in both engines. Join
    * order is fact-outward: the p_type sliver of `part` prunes
    * lineitem first (at 100 TB `part` is ~0.1% of lineitem; the
    * 1-in-6 type slice broadcasts or AQE picks a shuffle join — either
    * way the probe side shrinks before orders attaches), the region's
    * customer set is built dim-first (region→nation→customer, all
    * broadcast), and the supplier nation name arrives by equi-join so
    * the CASE tests a plain column, never a correlated subquery.
    */
  def nationMarketShare(spark: SparkSession, dir: String,
      region: String = "AMERICA", nation: String = "NATION_1",
      ptype: String = "ECONOMY",
      from: String = "1995-01-01", until: String = "1998-01-01"): DataFrame = {
    import spark.implicits._
    val regKey = Tables.region(spark, dir)
      .filter($"r_name" === region).select($"r_regionkey")
    val regNations = Tables.nation(spark, dir)
      .join(broadcast(regKey), $"n_regionkey" === $"r_regionkey")
      .select($"n_nationkey")
    val cust = Tables.customer(spark, dir)
      .join(broadcast(regNations), $"c_nationkey" === $"n_nationkey")
      .select($"c_custkey")
    val supp = Tables.supplier(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)
        .select($"n_nationkey", $"n_name".as("supp_nation"))),
        $"s_nationkey" === $"n_nationkey")
      .select($"s_suppkey", $"supp_nation")
    val typedParts = Tables.part(spark, dir)
      .filter($"p_type" === ptype).select($"p_partkey")
    val rev = Fx.dec2($"l_extendedprice") * (Fx.one - Fx.rate2($"l_discount"))
    Tables.lineitem(spark, dir)
      .select($"l_orderkey", $"l_partkey", $"l_suppkey",
        $"l_extendedprice", $"l_discount")
      .join(typedParts, $"l_partkey" === $"p_partkey")
      .join(Tables.orders(spark, dir)
        .filter($"o_orderdate" >= lit(from).cast("timestamp") &&
          $"o_orderdate" < lit(until).cast("timestamp"))
        .select($"o_orderkey", $"o_custkey", $"o_orderdate"),
        $"l_orderkey" === $"o_orderkey")
      .join(cust, $"o_custkey" === $"c_custkey", "left_semi")
      .join(supp, $"l_suppkey" === $"s_suppkey")
      .groupBy(year($"o_orderdate").as("o_year"))
      .agg(
        sum(when($"supp_nation" === nation, rev)
          .otherwise(lit(0).cast("decimal(3,2)"))).cast("double")
          .as("nation_revenue"),
        sum(rev).cast("double").as("total_revenue"))
      .select($"o_year", $"nation_revenue", $"total_revenue",
        ($"nation_revenue" / $"total_revenue").as("mkt_share"))
      .orderBy($"o_year")
  }

  /** TPC-H Q13-shaped customer order-count distribution (adapted: the
    * comment NOT-LIKE filter becomes a priority-class exclusion —
    * same algebra, a filtered LEFT join preserving zero-order
    * customers). Two cascaded aggregations: orders collapse to
    * per-customer counts FIRST (partial+final on o_custkey, the big
    * shuffle), the customer left-join then touches one row per
    * customer, and the histogram regroup moves at most
    * |distinct counts| rows — trivially small at any scale. The
    * zero bucket exists only because the join is LEFT; an inner join
    * here is the classic silent-wrong-answer, spec-guarded.
    */
  def customerOrderDistribution(spark: SparkSession, dir: String,
      excluded: Seq[String] = Seq("5-LOW", "4-NOT SPECIFIED")): DataFrame = {
    import spark.implicits._
    val perCust = Tables.orders(spark, dir)
      .filter(!$"o_orderpriority".isin(excluded: _*))
      .groupBy($"o_custkey").agg(count(lit(1)).as("cnt"))
    Tables.customer(spark, dir).select($"c_custkey")
      .join(perCust, $"c_custkey" === $"o_custkey", "left")
      .select(coalesce($"cnt", lit(0L)).as("c_count"))
      .groupBy($"c_count").agg(count(lit(1)).as("custdist"))
      .orderBy($"custdist".desc, $"c_count".desc)
  }

  /** TPC-H Q19-shaped disjunctive discount revenue: three
    * brand/size/quantity branches OR-ed across the part join. The
    * scale point is predicate decomposition: the disjunction's COARSE
    * envelope is applied per-side BEFORE the join — `p_brand IN
    * (b1,b2,b3)` prunes the part scan and `l_quantity <= qmax` the
    * lineitem scan (both reach `PushedFilters`, so row groups outside
    * the envelope are never decompressed) — while the exact per-branch
    * conjunction runs as a residual filter after the join, where both
    * sides' columns exist. Equivalent because each branch implies its
    * envelope; the join itself stays a pure equi-join on l_partkey
    * (hashable, broadcastable), never an OR-of-conjunctions theta join.
    */
  def disjunctiveDiscountRevenue(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val branches = Seq( // (brand, maxSize, minQty, maxQty)
      ("Brand#1", 10, 1.0, 11.0),
      ("Brand#2", 20, 10.0, 20.0),
      ("Brand#3", 30, 20.0, 30.0))
    val brands = branches.map(_._1)
    val qmax = branches.map(_._4).max
    val part = Tables.part(spark, dir)
      .filter($"p_brand".isin(brands: _*) && $"p_size" >= 1)
      .select($"p_partkey", $"p_brand", $"p_size")
    val residual = branches.map { case (b, sz, qlo, qhi) =>
      $"p_brand" === b && $"p_size" <= sz &&
        $"l_quantity" >= qlo && $"l_quantity" <= qhi
    }.reduce(_ || _)
    Tables.lineitem(spark, dir)
      .filter($"l_quantity" <= qmax)
      .select($"l_partkey", $"l_quantity", $"l_extendedprice", $"l_discount")
      .join(part, $"l_partkey" === $"p_partkey")
      .filter(residual)
      .agg(sum(Fx.dec2($"l_extendedprice") * (Fx.one - Fx.rate2($"l_discount")))
        .cast("double").as("revenue"))
  }

  def idleCustomerBalance(spark: SparkSession, dir: String,
      lapsedSince: String = "2000-07-01",
      segments: Seq[String] = Seq("MACHINERY", "BUILDING", "FURNITURE")): DataFrame = {
    import spark.implicits._
    val cust = Tables.customer(spark, dir)
      .filter($"c_mktsegment".isin(segments: _*))
      .select($"c_custkey", $"c_nationkey",
        (Fx.dec2($"c_acctbal") * 100).cast("long").as("bal_cents"))
    val stats = cust.filter($"bal_cents" > 0)
      .agg(sum($"bal_cents").as("pos_sum"), count(lit(1)).as("pos_cnt"))
    cust.crossJoin(broadcast(stats))
      .filter($"bal_cents" * $"pos_cnt" > $"pos_sum")
      .join(Tables.orders(spark, dir)
        .filter($"o_orderdate" >= lit(lapsedSince).cast("timestamp"))
        .select($"o_custkey"),
        $"c_custkey" === $"o_custkey", "left_anti")
      .join(broadcast(Tables.nation(spark, dir)
        .select($"n_nationkey", $"n_name")),
        $"c_nationkey" === $"n_nationkey")
      .groupBy($"n_name")
      .agg(count(lit(1)).as("numcust"),
        (sum($"bal_cents").cast("double") / 100.0).as("totacctbal"))
      .orderBy($"n_name")
  }

  /** Cardinality-capped reporting rollup — the dashboard shape that
    * keeps result sets bounded at any fan-out: per event type, the
    * top-3 users by event count as named rows plus ONE 'OTHER' row
    * aggregating everyone else, so the report is (groups × 4) rows no
    * matter how many users exist. Selection is deterministic (count
    * DESC, user ASC) via a rank-filter window (WindowGroupLimit
    * partial pass); the OTHER mass is total − top mass, computed from
    * the same per-(type, user) aggregate, not a second scan.
    */
  def topnOtherRollup(spark: SparkSession, dir: String,
      n: Int = 3): DataFrame = {
    import spark.implicits._
    val perUser = Tables.widened(spark, Tables.events(spark, dir))
      .groupBy($"event_type", $"user_id")
      .agg(count(lit(1)).as("cnt"))
      .localCheckpoint(true)
    val w = Window.partitionBy($"event_type")
      .orderBy($"cnt".desc, $"user_id")
    val top = perUser.withColumn("rk", row_number().over(w))
      .filter($"rk" <= n)
    val totals = perUser.groupBy($"event_type")
      .agg(sum($"cnt").as("total"), count(lit(1)).as("n_users"))
    val other = totals
      .join(top.groupBy($"event_type").agg(sum($"cnt").as("topc"),
        count(lit(1)).as("topn")), Seq("event_type"))
      .select($"event_type", lit(n + 1).as("rk"),
        lit("OTHER").as("who"), ($"total" - $"topc").as("cnt"),
        ($"n_users" - $"topn").as("n_members"))
      // a group with <= n users has no OTHER mass — emit no row (the
      // oracle's empty GROUP BY does the same)
      .filter($"n_members" > 0)
    top.select($"event_type", $"rk",
        concat(lit("user_"), $"user_id").as("who"), $"cnt",
        lit(1L).as("n_members"))
      .unionByName(other)
      .orderBy($"event_type", $"rk")
  }

  /** Leave-one-out target encoding — the leakage-safe categorical
    * feature every tabular training pipeline derives: each row's
    * category is replaced by the mean target of all OTHER rows in its
    * category, (Σ−y)/(n−1), so a row never sees its own label (the
    * naive per-category mean leaks the target and inflates validation
    * scores). Exact arithmetic end-to-end: the target is lifted to
    * integer cents (the [[graft.sources.Maintenance.aggPartial]]
    * contract), the per-category (n, Σ) state is one
    * partial-aggregatable shuffle, and the LOO mean is emitted as a
    * FLOOR-cents integer — no float decides anything. The category
    * census is category-count-sized, broadcast back to the rows; a
    * singleton category encodes NULL (no other rows to learn from).
    */
  def targetEncodeLoo(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.widened(spark, Tables.events(spark, dir))
      .select($"event_id", $"event_type",
        ($"value".cast("decimal(18,2)") * 100).cast("long").as("cents"))
    val stats = ev.groupBy($"event_type")
      .agg(count(lit(1)).as("n"), sum($"cents").as("cents_sum"))
    ev.join(broadcast(stats), Seq("event_type"))
      .select($"event_id", $"event_type", $"cents",
        when($"n" > 1, expr("(cents_sum - cents) div (n - 1)"))
          .as("loo_cents_floor"))
      .orderBy($"event_id")
  }

  /** Wide → long UNPIVOT (melt) — the inverse of [[pivotEventCounts]],
    * and the missing half of every reshape pair: a per-flag aggregate
    * (sum_qty, sum_price, n_items in the exact decimal domain) is
    * melted into (l_returnflag, metric, value) rows via Spark's native
    * `Dataset.unpivot` (Expand under the hood — one pass, no join, row
    * growth = #value columns). The count rides as a double exactly
    * (n ≪ 2⁵³).
    */
  def unpivotMetrics(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val wide = Tables.lineitem(spark, dir)
      .groupBy($"l_returnflag")
      .agg(graft.Fx.dsum($"l_quantity").as("sum_qty"),
        graft.Fx.dsum($"l_extendedprice").as("sum_price"),
        count(lit(1)).cast("double").as("n_items"))
    wide.unpivot(
        Array($"l_returnflag"),
        Array($"sum_qty", $"sum_price", $"n_items"),
        "metric", "value")
      .orderBy($"l_returnflag", $"metric")
  }

  /** [[unpivotMetrics]] oracle: the same aggregate, melted by UNION
    * ALL (metric names must match Spark's unpivot, which uses the
    * source column names).
    */
  def unpivotMetricsSql(): String =
    s"""WITH w AS (SELECT l_returnflag,
       |    ${graft.Fx.dsumSql("l_quantity")} AS sum_qty,
       |    ${graft.Fx.dsumSql("l_extendedprice")} AS sum_price,
       |    CAST(COUNT(*) AS DOUBLE) AS n_items
       |  FROM lineitem GROUP BY l_returnflag)
       |SELECT l_returnflag, metric, value FROM (
       |  SELECT l_returnflag, 'sum_qty' AS metric, sum_qty AS value FROM w
       |  UNION ALL
       |  SELECT l_returnflag, 'sum_price', sum_price FROM w
       |  UNION ALL
       |  SELECT l_returnflag, 'n_items', n_items FROM w)
       |ORDER BY l_returnflag, metric""".stripMargin

  // ---------------------------------------------------------------------
  // TPC-H gap-fill analogs: the three classic shapes not yet covered —
  // correlated-scalar-subquery decorrelation (Q2), the multi-way profit
  // join (Q9), and the global-scalar HAVING threshold (Q11). The corpus
  // has no partsupp table, so lineitem plays the supply-catalog role:
  // each (part, supplier) pair's offered unit price is the MIN unit
  // price across that pair's line items.
  // ---------------------------------------------------------------------

  /** TPC-H Q2-shaped min-cost supplier. For every part of a given
    * `ptype` whose suppliers sit in `region`, find the supplier(s)
    * offering the global minimum unit price. TPC-H writes this as a
    * correlated scalar subquery (`ps_supplycost = (SELECT min(...)
    * WHERE ps_partkey = p_partkey)`); the scalable decorrelated plan is
    * written out explicitly: ONE aggregation producing min-per-part,
    * joined back on (partkey, unit price) — two shuffles on p_partkey
    * total, and Catalyst reuses the exchange between them. The
    * region→nation→supplier chain broadcasts end to end (5 regions ×
    * 25 nations × suppliers ≪ lineitem), so the only shuffled relation
    * is the date-pruned offer table. Unit price is exact integer
    * micro-units, so the min-equality join has no float-tie hazard at
    * any scale.
    */
  def minCostSupplier(spark: SparkSession, dir: String,
      ptype: String = "ECONOMY", region: String = "EUROPE",
      k: Int = 100): DataFrame = {
    import spark.implicits._
    val parts = Tables.part(spark, dir).filter($"p_type" === ptype)
      .select($"p_partkey", $"p_name")
    val reg = Tables.region(spark, dir).filter($"r_name" === region)
      .select($"r_regionkey")
    val nat = Tables.nation(spark, dir)
      .join(broadcast(reg), $"n_regionkey" === $"r_regionkey")
      .select($"n_nationkey", $"n_name")
    val sup = Tables.supplier(spark, dir)
      .join(broadcast(nat), $"s_nationkey" === $"n_nationkey")
      .select($"s_suppkey", $"s_name", $"s_acctbal", $"n_name")
    // the supply catalog: best unit price each in-region supplier has
    // ever offered on each filtered part
    val offers = Tables.lineitem(spark, dir)
      .select($"l_partkey", $"l_suppkey",
        expr("CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 10000 AS BIGINT)" +
          " div CAST(l_quantity AS BIGINT)").as("unit_micros"))
      .join(broadcast(parts.select($"p_partkey")), $"l_partkey" === $"p_partkey")
      .join(broadcast(sup.select($"s_suppkey")), $"l_suppkey" === $"s_suppkey")
      .groupBy($"l_partkey", $"l_suppkey")
      .agg(min($"unit_micros").as("unit_micros"))
    val minPerPart = offers.groupBy($"l_partkey".as("mp_partkey"))
      .agg(min($"unit_micros").as("min_micros"))
    offers
      .join(minPerPart, $"l_partkey" === $"mp_partkey" &&
        $"unit_micros" === $"min_micros")
      .join(broadcast(sup), $"l_suppkey" === $"s_suppkey")
      .join(broadcast(parts), $"l_partkey" === $"p_partkey")
      .select($"s_acctbal", $"s_name", $"n_name", $"p_partkey", $"p_name",
        $"unit_micros")
      .orderBy($"s_acctbal".desc, $"n_name", $"s_name", $"p_partkey")
      .limit(k)
  }

  /** [[minCostSupplier]] oracle: the same decorrelated min-join in
    * DuckDB SQL (integer `//` division mirrors Spark's `div`).
    */
  def minCostSupplierSql(ptype: String = "ECONOMY",
      region: String = "EUROPE", k: Int = 100): String =
    s"""WITH sup AS (
       |  SELECT s_suppkey, s_name, s_acctbal, n_name
       |  FROM supplier JOIN nation ON s_nationkey = n_nationkey
       |  JOIN region ON n_regionkey = r_regionkey
       |  WHERE r_name = '$region'),
       |offers AS (
       |  SELECT l_partkey, l_suppkey,
       |    MIN(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 10000 AS BIGINT)
       |        // CAST(l_quantity AS BIGINT)) AS unit_micros
       |  FROM lineitem
       |  JOIN part ON l_partkey = p_partkey AND p_type = '$ptype'
       |  JOIN sup ON l_suppkey = s_suppkey
       |  GROUP BY l_partkey, l_suppkey),
       |mp AS (SELECT l_partkey AS mp_partkey, MIN(unit_micros) AS min_micros
       |  FROM offers GROUP BY l_partkey)
       |SELECT s_acctbal, s_name, n_name, p_partkey, p_name, unit_micros
       |FROM offers
       |JOIN mp ON l_partkey = mp_partkey AND unit_micros = min_micros
       |JOIN sup ON l_suppkey = s_suppkey
       |JOIN part ON l_partkey = p_partkey
       |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
       |LIMIT $k""".stripMargin

  /** TPC-H Q9-shaped product-type profit. Profit per (supplier nation,
    * order year) over parts whose name contains `needle`: revenue −
    * cost, where cost is proxied as 80% of the part's retail price per
    * unit (the corpus has no partsupp.supplycost). All arithmetic
    * stays in the decimal domain end to end — `0.80 × retail × qty` is
    * exact at scale 4 — so the grouped sums are bit-identical to the
    * oracle. Plan shape at scale: the name filter prunes `part` before
    * its broadcast; supplier+nation broadcast; the only shuffles are
    * the lineitem⨝orders key exchange and the final (nation, year)
    * aggregation — partial aggregation applies to both.
    */
  def productProfit(spark: SparkSession, dir: String,
      needle: String = "widget"): DataFrame = {
    import spark.implicits._
    val parts = Tables.part(spark, dir)
      .filter($"p_name".contains(needle))
      .select($"p_partkey", $"p_retailprice")
    val nat = Tables.nation(spark, dir).select($"n_nationkey", $"n_name")
    val sup = Tables.supplier(spark, dir)
      .join(broadcast(nat), $"s_nationkey" === $"n_nationkey")
      .select($"s_suppkey", $"n_name")
    val ord = Tables.orders(spark, dir)
      .select($"o_orderkey", year($"o_orderdate").as("o_year"))
    val cost = Fx.dec2($"p_retailprice") *
      lit(BigDecimal("0.80")).cast(org.apache.spark.sql.types.DecimalType(3, 2)) *
      $"l_quantity".cast(org.apache.spark.sql.types.DecimalType(4, 0))
    Tables.lineitem(spark, dir)
      .join(broadcast(parts), $"l_partkey" === $"p_partkey")
      .join(broadcast(sup), $"l_suppkey" === $"s_suppkey")
      .join(ord, $"l_orderkey" === $"o_orderkey")
      .groupBy($"n_name".as("nation"), $"o_year")
      .agg(sum(Fx.dec2($"l_extendedprice") * (Fx.one - Fx.rate2($"l_discount")) - cost)
        .cast("double").as("profit"))
      .orderBy($"nation", $"o_year".desc)
  }

  /** [[productProfit]] oracle. */
  def productProfitSql(needle: String = "widget"): String =
    s"""SELECT n_name AS nation, CAST(YEAR(o_orderdate) AS INT) AS o_year,
       |  CAST(SUM(${Fx.dec2Sql("l_extendedprice")} * (${Fx.oneSql} - ${Fx.rate2Sql("l_discount")})
       |    - ${Fx.dec2Sql("p_retailprice")} * CAST(0.80 AS DECIMAL(3,2))
       |      * CAST(l_quantity AS DECIMAL(4,0))) AS DOUBLE) AS profit
       |FROM lineitem
       |JOIN part ON l_partkey = p_partkey AND p_name LIKE '%$needle%'
       |JOIN supplier ON l_suppkey = s_suppkey
       |JOIN nation ON s_nationkey = n_nationkey
       |JOIN orders ON l_orderkey = o_orderkey
       |GROUP BY n_name, YEAR(o_orderdate)
       |ORDER BY nation, o_year DESC""".stripMargin

  /** Q11's threshold in tenths-of-mean: a part is "important" when its
    * traded value exceeds `ImportantPartTenths/10 ×` the MEAN per-part
    * value. TPC-H's original fraction-of-total cutoff divides by SF
    * precisely because per-part share shrinks as the catalog grows; a
    * mean-relative threshold is the scale-FREE formulation — the same
    * constant selects a stable quantile of parts at every corpus size.
    */
  val ImportantPartTenths = 13L

  /** TPC-H Q11-shaped important-parts report: parts whose total traded
    * value exceeds 1.3× the mean per-part value. The global scalars
    * (total value, part count) are a one-row aggregate cross-joined in
    * (Spark broadcasts a single-row side automatically; the oracle's
    * scalar subqueries are the same plan) — the
    * HAVING-against-global-aggregate shape every "share of total"
    * report uses. Value accumulates in exact integer cents; the
    * threshold compare `value × n × 10 > tenths × total` runs in the
    * DECIMAL(38) domain (DuckDB: HUGEINT) so it neither overflows nor
    * rounds at any corpus size, and the boundary part classifies
    * identically in both engines.
    */
  def importantParts(spark: SparkSession, dir: String,
      tenths: Long = ImportantPartTenths): DataFrame = {
    import spark.implicits._
    val big = org.apache.spark.sql.types.DecimalType(38, 0)
    val perPart = Tables.lineitem(spark, dir)
      .groupBy($"l_partkey")
      .agg(sum(expr("CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT)"))
        .as("value_cents"))
    val total = perPart.agg(sum($"value_cents").as("total_cents"),
      count(lit(1)).as("n_parts"))
    perPart.crossJoin(broadcast(total))
      // value/(total/n) > tenths/10  ⇔  value × n × 10 > tenths × total
      .filter($"value_cents".cast(big) * $"n_parts" * lit(10) >
        lit(tenths) * $"total_cents".cast(big))
      .select($"l_partkey", $"value_cents")
      .orderBy($"value_cents".desc, $"l_partkey")
  }

  /** [[importantParts]] oracle. */
  def importantPartsSql(tenths: Long = ImportantPartTenths): String =
    s"""WITH pp AS (
       |  SELECT l_partkey,
       |    CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT)) AS BIGINT) AS value_cents
       |  FROM lineitem GROUP BY l_partkey)
       |SELECT l_partkey, value_cents FROM pp
       |WHERE CAST(value_cents AS HUGEINT) * (SELECT COUNT(*) FROM pp) * 10
       |    > $tenths * (SELECT CAST(SUM(value_cents) AS HUGEINT) FROM pp)
       |ORDER BY value_cents DESC, l_partkey""".stripMargin

  /** Per-user sequence-length cap for [[listaggSessions]]: only the
    * first `SeqCap` events (by event time) enter the concatenated
    * export, so row width stays bounded no matter how long a user's
    * history grows.
    */
  val SeqCap = 50

  /** Per-user ordered event-type sequence export via Spark 4's ListAgg
    * aggregate — `listagg(x, ',') WITHIN GROUP (ORDER BY ...)`, the
    * string_agg surface every warehouse exposes (behavioral-sequence
    * features, session-path mining). Exercised through the SQL form
    * because intra-group ORDER is part of this aggregate's contract
    * (the DataFrame `listagg` leaves it unspecified); the (ts,
    * event_id) key is total, so the concatenation is deterministic and
    * engine-exact. The [[SeqCap]] prefix filter is a rank window that
    * runs BEFORE the concat — at 100 TB an unbounded user history
    * never reaches the string builder, and the post-cap aggregate
    * state is at most `SeqCap` short tokens per key.
    */
  def listaggSessions(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    Tables.events(spark, dir)
      .select($"user_id", $"ts", $"event_id", $"event_type")
      .withColumn("rn", row_number().over(w))
      .where($"rn" <= SeqCap)
      .createOrReplaceTempView("graft_ev_seq")
    spark.sql(
      """SELECT user_id, COUNT(*) AS n_events,
        |  listagg(event_type, ',') WITHIN GROUP (ORDER BY ts, event_id) AS seq
        |FROM graft_ev_seq GROUP BY user_id""".stripMargin)
  }

  /** [[listaggSessions]] oracle — DuckDB's ordered string_agg over the
    * identically capped prefix.
    */
  def listaggSessionsSql(cap: Int = SeqCap): String =
    s"""WITH capped AS (
       |  SELECT user_id, event_type, ts, event_id,
       |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
       |  FROM events)
       |SELECT user_id, COUNT(*) AS n_events,
       |  string_agg(event_type, ',' ORDER BY ts, event_id) AS seq
       |FROM capped WHERE rn <= $cap GROUP BY user_id""".stripMargin

  /** The Spark-4 SQL programmability surface in one pipeline: a
    * SESSION VARIABLE declared and SET VAR'd from a scalar subquery
    * (the half-max order key), a SQL UDF (`CREATE TEMPORARY FUNCTION …
    * RETURN expr` — a catalog function defined in SQL, inlined by the
    * analyzer into the plan, codegen-friendly unlike an external UDF),
    * and EXECUTE IMMEDIATE running a parameter-marker query with the
    * variable bound via USING. The oracle states the same algebra with
    * the variable inlined as a subquery — so the hash pins that the
    * variable capture, the UDF body, and the parameter binding all
    * computed exactly what the closed form says.
    */
  def sqlVariablesQuery(spark: SparkSession, dir: String): DataFrame = {
    Tables.orders(spark, dir)
      .createOrReplaceTempView("graft_var_orders_src")
    spark.sql(
      "DECLARE OR REPLACE VARIABLE graft_half_max BIGINT")
    spark.sql("""SET VAR graft_half_max =
      |  (SELECT MAX(o_orderkey) div 2 FROM graft_var_orders_src)"""
      .stripMargin)
    spark.sql("""CREATE OR REPLACE TEMPORARY FUNCTION graft_bucket(x BIGINT)
      |RETURNS BIGINT RETURN x % 97""".stripMargin)
    spark.sql("""EXECUTE IMMEDIATE
      |'SELECT graft_bucket(o_orderkey) AS m, COUNT(*) AS n,
      |   CAST(SUM(o_orderkey) AS BIGINT) AS key_sum
      | FROM graft_var_orders_src WHERE o_orderkey <= ?
      | GROUP BY 1 ORDER BY m'
      |USING graft_half_max""".stripMargin)
  }

  /** [[sqlVariablesQuery]] oracle: the variable inlined as a scalar
    * subquery, the UDF inlined as its body.
    */
  def sqlVariablesSql(): String =
    """SELECT o_orderkey % 97 AS m, COUNT(*) AS n,
      |  CAST(SUM(o_orderkey) AS BIGINT) AS key_sum
      |FROM orders
      |WHERE o_orderkey <= (SELECT MAX(o_orderkey) // 2 FROM orders)
      |GROUP BY 1 ORDER BY m""".stripMargin

  /** Spark-4 SQL SCRIPTING (`BEGIN … END` with control flow): a WHILE
    * loop doubles an accumulator to the smallest power of two at or
    * above the max order key, counting iterations — procedural SQL
    * whose final SELECT is the script's result. The oracle states the
    * closed form with the loop replaced by bit arithmetic
    * (`1 << bitlen(mx − 1)`), so the hash pins that the loop ran the
    * exact integer recurrence. Driver-side control flow over
    * metadata-sized state only — the single corpus touch is the MAX
    * aggregate.
    */
  def sqlScriptingQuery(spark: SparkSession, dir: String): DataFrame = {
    Tables.orders(spark, dir)
      .createOrReplaceTempView("graft_scr_orders_src")
    // session-scoped deliberately: the flag only changes how BEGIN…END
    // blocks parse (inert for every other query), and the script must
    // still be enabled when the returned frame executes
    spark.conf.set("spark.sql.scripting.enabled", "true")
    spark.sql("""BEGIN
      |  DECLARE mx BIGINT;
      |  DECLARE p BIGINT DEFAULT 1;
      |  DECLARE n_iter BIGINT DEFAULT 0;
      |  SET mx = (SELECT MAX(o_orderkey) FROM graft_scr_orders_src);
      |  WHILE p < mx DO
      |    SET p = p * 2;
      |    SET n_iter = n_iter + 1;
      |  END WHILE;
      |  SELECT p AS pow2, n_iter, mx AS max_key;
      |END""".stripMargin)
  }

  /** [[sqlScriptingQuery]] oracle: the doubling loop in closed form. */
  def sqlScriptingSql(): String =
    """WITH m AS (SELECT MAX(o_orderkey) AS mx FROM orders)
      |SELECT CASE WHEN mx <= 1 THEN 1
      |    ELSE CAST(1 AS BIGINT) << length(bin(mx - 1)) END AS pow2,
      |  CAST(CASE WHEN mx <= 1 THEN 0
      |    ELSE length(bin(mx - 1)) END AS BIGINT) AS n_iter,
      |  mx AS max_key
      |FROM m""".stripMargin

  /** Longest-streak report (§2-beyond — the gaps-and-islands idiom
    * every engagement dashboard runs): per user, the number of
    * distinct active days, the number of maximal consecutive-day
    * streaks, and the best streak's length and day span. Islands are
    * found arithmetically: within a user, `day − row_number()` is
    * constant exactly on a run of consecutive days, so a streak is one
    * group of that difference — no self-join, no recursion. Day index
    * is the same pure `ts div 86.4e12` floor as [[dailyActivity]].
    *
    * Scale shape: one (user, day) distinct shuffle, then two window
    * passes over the SAME user partitioning (Catalyst reuses the
    * exchange); per-row state is O(1) and the streak relation is
    * bounded by active user-days. Ties for best streak break on
    * earliest start — (len DESC, start) is total within a user.
    */
  def activityStreaks(spark: SparkSession, dir: String): DataFrame =
    activityStreaksOf(Tables.events(spark, dir))

  /** [[activityStreaks]] over any (user_id, ts-nanos) relation. */
  def activityStreaksOf(events: DataFrame): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val days = events
      .select($"user_id", expr("ts div 86400000000000").as("day"))
      .distinct()
    val w = Window.partitionBy($"user_id").orderBy($"day")
    val streaks = days
      .withColumn("grp", $"day" - row_number().over(w))
      .groupBy($"user_id", $"grp")
      .agg(count(lit(1)).as("best_len"), min($"day").as("best_start_day"),
        max($"day").as("best_end_day"))
    val wu = Window.partitionBy($"user_id")
    streaks
      .withColumn("rk", row_number().over(
        wu.orderBy($"best_len".desc, $"best_start_day")))
      .withColumn("n_streaks", count(lit(1)).over(wu))
      .withColumn("n_active_days", sum($"best_len").over(wu))
      .filter($"rk" === 1)
      .select($"user_id", $"n_active_days", $"n_streaks", $"best_len",
        $"best_start_day", $"best_end_day")
      .orderBy($"user_id")
  }

  /** [[activityStreaks]] oracle — same island arithmetic. */
  def activityStreaksSql(): String =
    """WITH d AS (SELECT DISTINCT user_id,
      |    epoch_us(ts) // 86400000000 AS day FROM events),
      |g AS (SELECT user_id, day,
      |    day - ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY day) AS grp
      |  FROM d),
      |s AS (SELECT user_id, grp, COUNT(*) AS best_len,
      |    MIN(day) AS best_start_day, MAX(day) AS best_end_day
      |  FROM g GROUP BY user_id, grp),
      |r AS (SELECT user_id, best_len, best_start_day, best_end_day,
      |    ROW_NUMBER() OVER (PARTITION BY user_id
      |      ORDER BY best_len DESC, best_start_day) AS rk,
      |    COUNT(*) OVER (PARTITION BY user_id) AS n_streaks,
      |    SUM(best_len) OVER (PARTITION BY user_id) AS n_active_days
      |  FROM s)
      |SELECT user_id, CAST(n_active_days AS BIGINT) AS n_active_days,
      |  CAST(n_streaks AS BIGINT) AS n_streaks,
      |  CAST(best_len AS BIGINT) AS best_len, best_start_day, best_end_day
      |FROM r WHERE rk = 1 ORDER BY user_id""".stripMargin

  /** Growth-accounting report (§2-beyond — the new/retained/
    * resurrected/churned daily split of the standard growth-
    * accounting identity, e.g. the Social Capital framework, public):
    * classify each active (user, day) by its predecessor — first-ever
    * day ⇒ new, active yesterday ⇒ retained, a gap ⇒ resurrected —
    * and attribute a churn event to the day AFTER an activity gap
    * begins (a user's final day also churns them into day+1, so
    * `new + retained + resurrected − churned` telescopes to the DAU
    * delta). Day grain and ordering are pure integer arithmetic.
    *
    * Scale shape: one (user, day) distinct shuffle, one lag/lead
    * window over it (single exchange serves both), then a
    * partial-aggregatable groupBy on day — grain-bounded output. The
    * churn and activity legs aggregate separately and full-outer-merge
    * on the tiny day grain.
    */
  def growthAccounting(spark: SparkSession, dir: String): DataFrame =
    growthAccountingOf(Tables.events(spark, dir))

  /** [[growthAccounting]] over any (user_id, ts-nanos) relation. */
  def growthAccountingOf(events: DataFrame): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val days = events
      .select($"user_id", expr("ts div 86400000000000").as("day"))
      .distinct()
    val w = Window.partitionBy($"user_id").orderBy($"day")
    val marked = days
      .withColumn("prev", lag($"day", 1).over(w))
      .withColumn("next", lead($"day", 1).over(w))
    val act = marked
      .groupBy($"day")
      .agg(
        count(when($"prev".isNull, 1)).as("n_new"),
        count(when($"prev" === $"day" - 1, 1)).as("n_retained"),
        count(when($"prev".isNotNull && $"prev" < $"day" - 1, 1))
          .as("n_resurrected"))
    val churn = marked
      .filter($"next".isNull || $"next" > $"day" + 1)
      .groupBy(($"day" + 1).as("day"))
      .agg(count(lit(1)).as("n_churned"))
    act.join(churn, Seq("day"), "full_outer")
      .na.fill(0L, Seq("n_new", "n_retained", "n_resurrected", "n_churned"))
      .orderBy($"day")
  }

  /** [[growthAccounting]] oracle — same lag/lead classification. */
  def growthAccountingSql(): String =
    """WITH d AS (SELECT DISTINCT user_id,
      |    epoch_us(ts) // 86400000000 AS day FROM events),
      |m AS (SELECT user_id, day,
      |    LAG(day) OVER (PARTITION BY user_id ORDER BY day) AS prev,
      |    LEAD(day) OVER (PARTITION BY user_id ORDER BY day) AS next
      |  FROM d),
      |act AS (SELECT day,
      |    COUNT(*) FILTER (WHERE prev IS NULL) AS n_new,
      |    COUNT(*) FILTER (WHERE prev = day - 1) AS n_retained,
      |    COUNT(*) FILTER (WHERE prev IS NOT NULL AND prev < day - 1)
      |      AS n_resurrected
      |  FROM m GROUP BY day),
      |churn AS (SELECT day + 1 AS day, COUNT(*) AS n_churned FROM m
      |  WHERE next IS NULL OR next > day + 1 GROUP BY day + 1)
      |SELECT COALESCE(act.day, churn.day) AS day,
      |  CAST(COALESCE(n_new, 0) AS BIGINT) AS n_new,
      |  CAST(COALESCE(n_retained, 0) AS BIGINT) AS n_retained,
      |  CAST(COALESCE(n_resurrected, 0) AS BIGINT) AS n_resurrected,
      |  CAST(COALESCE(n_churned, 0) AS BIGINT) AS n_churned
      |FROM act FULL OUTER JOIN churn ON act.day = churn.day
      |ORDER BY day""".stripMargin
}
