package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Sketch aggregates for corpus-scale profiling — the cardinality
  * report a pipeline runs per partition/day/source where an exact
  * COUNT(DISTINCT) would shuffle every key.
  *
  * The HyperLogLog here is DETERMINISTIC end-to-end: the key hash is
  * the engine's md5-based 60-bit hash ([[Dedup.hash60]] — stable
  * across engines by construction), registers are max-aggregates
  * (order-independent), and the harmonic sum is computed in EXACT
  * integer arithmetic (Σ 2^(55−r) as a BIGINT — at most 64·2^55 = 2^61,
  * overflow-free) with ONE final IEEE divide. The DuckDB oracle runs
  * the identical algorithm, so the driver check is exact — approximate
  * answer, exactly reproduced (the same contract as the SRP/IVF ANN
  * queries).
  *
  * Scale shape: register formation is a partial-aggregatable
  * groupBy((key, register)).max then groupBy(key) — two integer
  * shuffles of at most 64 rows per key group; nothing holds distinct
  * values anywhere. Registers max-merge across any partitioning of the
  * input (the spec proves split-merge equals whole-corpus), which is
  * what makes the sketch usable as a streaming/partitioned accumulator.
  */
object Sketches {

  /** m = 64 registers (6 index bits); rho counts into the remaining
    * 54 hash bits. alpha(64) = 0.709 — the standard HLL bias constant.
    */
  val HllRegisters = 64
  val HllAlpha = 0.709

  /** K in `estimate = K / Σ 2^(55−r_j)`: alpha·m²·2^55, with the
    * inexact factor (alpha·m²) computed FIRST and the power-of-two
    * scaling applied last (exact in IEEE), shared textually with the
    * oracle via shortest-round-trip printing.
    */
  val HllK: Double = HllAlpha * HllRegisters * HllRegisters *
    math.pow(2.0, 55)

  /** rho(w) over the 54-bit suffix: leading zeros + 1 = 55 − bitlen(w),
    * with bin() giving the minimal binary string in BOTH engines
    * (bin(0)='0' needs the explicit case).
    */
  private def rho(w: Column): Column =
    when(w === 0L, lit(55)).otherwise(lit(55) - length(bin(w)))

  /** JVM mirror of [[Dedup.hash60]]
    * (`conv(substr(md5(s),1,15),16,10)`): md5 of the UTF-8 bytes, first
    * 15 hex chars as a non-negative long. Used by the STATEFUL
    * streaming sketch, whose per-event work runs inside
    * mapGroupsWithState rather than as a Column; the spec pins the
    * streamed result equal to the Column-path batch sketch, which is
    * what proves the two hashes identical.
    */
  private[graft] def hash60Jvm(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    // first 15 hex chars = first 7 bytes + high nibble of the 8th
    val full = d.take(8).foldLeft(0L)((acc, b) => (acc << 8) | (b & 0xffL))
    full >>> 4
  }

  /** JVM mirror of the register/rho decomposition: (register index,
    * rho of the 54-bit suffix).
    */
  private[graft] def regRhoJvm(v: String): (Int, Int) = {
    val h = hash60Jvm(v)
    val w = h >>> 6
    val rho = if (w == 0L) 55
      else 55 - (64 - java.lang.Long.numberOfLeadingZeros(w))
    ((h % HllRegisters).toInt, rho)
  }

  /** Small-range correction (linear counting): below 2.5m the raw
    * harmonic estimate is badly biased (V empty registers each inject
    * 2^0 into the sum), so HLL switches to m·ln(m/V). V only takes
    * values 1..m, so the correction is PRECOMPUTED as an m-entry
    * literal both engines index — no runtime libm log whose last bit
    * could differ between JVM and C. (No large-range correction: the
    * 54-bit rho space makes hash saturation unreachable.)
    */
  val LinearCountThreshold: Double = 2.5 * HllRegisters
  val LinearCountTable: Seq[Double] = (1 to HllRegisters).map(v =>
    HllRegisters * math.log(HllRegisters.toDouble / v))

  /** Per-`event_type` exact distinct user count next to its HLL-64
    * estimate — the self-auditing form (at 100 TB one drops the exact
    * column; it is here so the driver row proves the estimate from the
    * same scan).
    */
  def hllDistinct(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    hllDistinctOf(Tables.widened(spark, Tables.events(spark, dir)),
      $"event_type", $"user_id")
  }

  /** [[hllDistinct]] over any relation: HLL-64 estimate + exact
    * distinct of `value` per `key`. NULL values are excluded up front
    * on BOTH paths: the register path would drop them silently anyway
    * (md5(NULL) is NULL), and COUNT(DISTINCT) in the oracle ignores
    * them — filtering first makes every path agree by construction.
    */
  def hllDistinctOf(df: DataFrame, key: Column, value: Column): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val nn = df.filter(value.isNotNull)
    val est = estimateFromRegisters(hllRegistersOf(nn, key, value))
    val exact = nn.select(key.as("k"), value.as("v")).distinct()
      .groupBy($"k").agg(count(lit(1)).as("n_exact"))
    exact.join(est, Seq("k"))
      .select($"k".as("key"), $"n_exact", $"hll_estimate")
      .orderBy($"key")
  }

  /** Sketch RE-AGGREGATION — the reason a pipeline stores sketches at
    * all: per-(event_type, day) HLL register relations (the shape a
    * daily job would persist next to its partition) are max-MERGED
    * across the month into one estimate per event_type, without ever
    * touching the raw events again past the daily pass. The merged
    * estimate is provably identical to the one-shot whole-corpus
    * sketch (max is associative over any partitioning — spec'd against
    * [[hllDistinct]]), which is the property that lets 100 TB of
    * history answer "distinct users this quarter?" from kilobytes of
    * stored registers. Self-auditing columns: exact distinct and the
    * day count the merge folded.
    */
  def hllDailyMerge(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.widened(spark, Tables.events(spark, dir))
      .filter($"user_id".isNotNull)
      .withColumn("d", expr("ts div 86400000000000"))
    // the persisted daily artifact: one (type, day, reg, r) row per
    // non-empty register — partial-aggregatable, at most 64 rows per
    // (type, day)
    val daily = ev
      .select($"event_type", $"d",
        Dedup.hash60($"user_id".cast("string")).as("h"))
      .select($"event_type", $"d", ($"h" % HllRegisters).as("reg"),
        rho(shiftrightunsigned($"h", 6)).as("rho"))
      .groupBy($"event_type", $"d", $"reg").agg(max($"rho").as("r"))
    val merged = daily.groupBy($"event_type", $"reg")
      .agg(max($"r").as("r")).withColumnRenamed("event_type", "k")
    val est = estimateFromRegisters(merged)
    val days = daily.select($"event_type", $"d").distinct()
      .groupBy($"event_type").agg(count(lit(1)).as("n_days"))
    val exact = ev.select($"event_type", $"user_id").distinct()
      .groupBy($"event_type").agg(count(lit(1)).as("n_exact"))
    exact.join(days, Seq("event_type"))
      .join(est, $"event_type" === $"k")
      .select($"event_type".as("key"), $"n_days", $"n_exact",
        $"hll_estimate")
      .orderBy($"key")
  }

  /** DuckDB oracle for [[hllDailyMerge]]: the identical daily-sketch →
    * max-merge pipeline.
    */
  def hllDailyMergeSql(): String = {
    val h60 = "CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15)) AS BIGINT)"
    val lcList = LinearCountTable.mkString("[", ", ", "]")
    s"""WITH nn AS (SELECT event_type,
       |    (epoch_us(ts) * 1000) // 86400000000000 AS d, user_id
       |  FROM events WHERE user_id IS NOT NULL),
       |hx AS (SELECT event_type, d, $h60 AS h FROM nn),
       |rr AS (SELECT event_type, d, h % $HllRegisters AS reg,
       |  CASE WHEN (h // 64) = 0 THEN 55
       |       ELSE 55 - length(bin(h // 64)) END AS rho FROM hx),
       |daily AS (SELECT event_type, d, reg, MAX(rho) AS r
       |  FROM rr GROUP BY event_type, d, reg),
       |merged AS (SELECT event_type AS k, reg, MAX(r) AS r
       |  FROM daily GROUP BY event_type, reg),
       |s AS (SELECT k,
       |  CAST(SUM(CAST(1 AS BIGINT) << CAST(55 - r AS INTEGER)) AS BIGINT)
       |    + ($HllRegisters - COUNT(*)) * (CAST(1 AS BIGINT) << 55) AS s,
       |  $HllRegisters - COUNT(*) AS v
       |  FROM merged GROUP BY k),
       |e AS (SELECT k, $HllK / CAST(s AS DOUBLE) AS raw, v FROM s),
       |days AS (SELECT event_type, COUNT(DISTINCT d) AS n_days
       |  FROM nn GROUP BY event_type),
       |ex AS (SELECT event_type, COUNT(DISTINCT user_id) AS n_exact
       |  FROM nn GROUP BY event_type)
       |SELECT ex.event_type AS key, days.n_days, ex.n_exact,
       |  CASE WHEN e.v > 0 AND e.raw <= $LinearCountThreshold
       |       THEN ($lcList)[e.v] ELSE e.raw END AS hll_estimate
       |FROM ex JOIN days USING (event_type)
       |JOIN e ON e.k = ex.event_type ORDER BY key""".stripMargin
  }

  /** Finish a register relation (k, reg, r) into (k, hll_estimate) —
    * shared by the batch query and the streaming accumulator (whose
    * state IS a register relation, max-merged per micro-batch).
    */
  private[graft] def estimateFromRegisters(regs: DataFrame): DataFrame = {
    val spark = regs.sparkSession
    import spark.implicits._
    regs.groupBy($"k")
      .agg(
        // exact integer harmonic sum; absent registers contribute
        // 2^55 each (rho would be 0)
        (sum(expr("shiftleft(CAST(1 AS BIGINT), CAST(55 - r AS INT))")) +
          (lit(HllRegisters.toLong) - count(lit(1))) * lit(1L << 55))
          .as("s"),
        (lit(HllRegisters.toLong) - count(lit(1))).as("v"))
      .select($"k", (lit(HllK) / $"s".cast("double")).as("raw"), $"v")
      .select($"k",
        when($"v" > 0L && $"raw" <= lit(LinearCountThreshold),
          element_at(typedLit(LinearCountTable), $"v".cast("int")))
          .otherwise($"raw").as("hll_estimate"))
  }

  /** The mergeable register relation (k, reg, r): max-aggregate over
    * any partition of the input and max-merge across partitions — the
    * accumulator shape a streaming or per-shard rollup keeps.
    */
  private[graft] def hllRegistersOf(df: DataFrame, key: Column,
      value: Column): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(key.as("k"),
        Dedup.hash60(value.cast("string")).as("h"))
      .select($"k", ($"h" % HllRegisters).as("reg"),
        rho(shiftrightunsigned($"h", 6)).as("rho"))
      .groupBy($"k", $"reg").agg(max($"rho").as("r"))
  }

  /** K for the KMV (k-minimum-values) sketch. The jaccard estimate
    * divides by min(K, |union|) — the correct estimator when a set is
    * smaller than the sketch — as ONE IEEE division of two small
    * integers (correctly rounded, so identical in both engines; the
    * same contract as HLL's single final divide).
    */
  val KmvK = 64

  /** KMV set-operation sketch: per event_type, keep the [[KmvK]]
    * smallest 60-bit value hashes — the sketch family that, unlike
    * HLL, supports SET OPERATIONS: the Jaccard of two keys' value sets
    * is estimated as |union's K-mins present in BOTH sketches| / K,
    * without ever holding either set. Everything up to the final
    * power-of-two division is integer selection (row_number over
    * hashes), so both engines agree bit-for-bit; the exact
    * intersection/union counts ride along as the audit columns (at
    * 100 TB one drops them — they are the proof, not the product).
    *
    * Scale shape: sketches are K rows per key (top-K via partial
    * min-heap style TakeOrdered per key group — a window over
    * key-partitioned hashes whose input is already the distinct
    * (key, value) census); pair estimation touches only sketch rows
    * (≤ K · #keys), never the corpus.
    */
  def kmvSetOps(spark: SparkSession, dir: String): DataFrame =
    kmvSetOpsOf(Tables.widened(spark, Tables.events(spark, dir))
      .select(col("event_type"), col("user_id")))

  /** [[kmvSetOps]] over any (event_type, user_id) relation. */
  def kmvSetOpsOf(rel: DataFrame): DataFrame = {
    val spark = rel.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val pairs = rel.select($"event_type", $"user_id").distinct()
      .localCheckpoint(true)
    val hashed = pairs.select($"event_type",
      Dedup.hash60(concat(lit("kmv:"), $"user_id".cast("string"))).as("h"))
    val wk = Window.partitionBy($"event_type").orderBy($"h")
    val sketch = hashed
      .withColumn("rk", row_number().over(wk))
      .filter($"rk" <= KmvK)
      .select($"event_type", $"h")
      .localCheckpoint(true)
    val types = sketch.select($"event_type").distinct()
    val tt = types.select($"event_type".as("type_a"))
      .crossJoin(types.select($"event_type".as("type_b")))
      .filter($"type_a" < $"type_b")
    // union K-mins per type pair, from sketch rows only (two equi
    // joins + union, not an OR join — an OR condition would plan as a
    // nested loop)
    val wu = Window.partitionBy($"type_a", $"type_b").orderBy($"h")
    val unionK = tt
      .join(sketch.select($"event_type".as("type_a"), $"h"), Seq("type_a"))
      .select($"type_a", $"type_b", $"h")
      .unionByName(tt
        .join(sketch.select($"event_type".as("type_b"), $"h"), Seq("type_b"))
        .select($"type_a", $"type_b", $"h"))
      .distinct()
      .withColumn("rk", row_number().over(wu))
      .filter($"rk" <= KmvK)
    val inA = sketch.select($"event_type".as("type_a"), $"h")
    val inB = sketch.select($"event_type".as("type_b"), $"h")
    val ku = unionK.groupBy($"type_a", $"type_b")
      .agg(count(lit(1)).as("ku"))
    val est = unionK
      .join(inA, Seq("type_a", "h"), "left_semi")
      .join(inB, Seq("type_b", "h"), "left_semi")
      .groupBy($"type_a", $"type_b")
      .agg(count(lit(1)).as("kmv_matches"))
      .join(ku, Seq("type_a", "type_b"))
    // exact audit: true intersection/union of the user sets
    val exact = pairs.select($"event_type".as("type_a"), $"user_id")
      .join(pairs.select($"event_type".as("type_b"), $"user_id"),
        Seq("user_id"))
      .filter($"type_a" < $"type_b")
      .groupBy($"type_a", $"type_b")
      .agg(count(lit(1)).as("inter_exact"))
    val sizes = pairs.groupBy($"event_type").agg(count(lit(1)).as("n"))
    tt.join(est, Seq("type_a", "type_b"), "left")
      .na.fill(0L, Seq("kmv_matches"))
      .na.fill(KmvK.toLong, Seq("ku"))
      .join(exact, Seq("type_a", "type_b"), "left")
      .na.fill(0L, Seq("inter_exact"))
      .join(sizes.select($"event_type".as("type_a"), $"n".as("na")), "type_a")
      .join(sizes.select($"event_type".as("type_b"), $"n".as("nb")), "type_b")
      .select($"type_a", $"type_b", $"kmv_matches",
        ($"kmv_matches".cast("double") / $"ku").as("jaccard_kmv"),
        $"inter_exact",
        ($"na" + $"nb" - $"inter_exact").as("union_exact"))
      .orderBy($"type_a", $"type_b")
  }

  /** Profiled columns of the events table: name → numeric? The ts
    * column is profiled in the µs domain both engines share.
    */
  val ProfileCols: Seq[(String, Boolean)] = Seq(
    "event_id" -> true, "event_type" -> false, "props" -> false,
    "ts_us" -> true, "user_id" -> true, "value" -> true)

  /** One-pass column profiling — the stats report a pipeline emits
    * after every ingest/filter stage (null rates, cardinalities,
    * ranges). ONE aggregate over ONE scan produces every column's
    * stats (Spark plans the multi-distinct via a single expanded
    * aggregate, not one job per column); the single stats row is then
    * unpivoted to a row per column.
    *
    * Exactness: counts are integers; min/max are SELECTION (not
    * arithmetic) so doubles come out bit-identical and strings compare
    * in binary order in both engines — nothing here can diverge.
    */
  def profileColumns(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val df = Tables.widened(spark, Tables.events(spark, dir))
      .select($"event_id", $"event_type", $"props",
        expr("ts div 1000").as("ts_us"), $"user_id", $"value")
    val aggs = count(lit(1)).as("n_rows") +: ProfileCols.flatMap {
      case (c, _) => Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}_nn"),
        countDistinct(col(c)).as(s"${c}_nd"),
        min(col(c)).as(s"${c}_mn"), max(col(c)).as(s"${c}_mx"))
    }
    val row = df.agg(aggs.head, aggs.tail: _*)
    val entries = ProfileCols.map { case (c, isNum) =>
      struct(lit(c).as("col_name"), $"n_rows",
        col(s"${c}_nn").as("n_null"), col(s"${c}_nd").as("n_distinct"),
        (if (isNum) col(s"${c}_mn").cast("double")
         else lit(null).cast("double")).as("min_num"),
        (if (isNum) col(s"${c}_mx").cast("double")
         else lit(null).cast("double")).as("max_num"),
        (if (isNum) lit(null).cast("string")
         else col(s"${c}_mn").cast("string")).as("min_str"),
        (if (isNum) lit(null).cast("string")
         else col(s"${c}_mx").cast("string")).as("max_str"))
    }
    row.select(explode(array(entries: _*)).as("e"))
      .select($"e.*").orderBy($"col_name")
  }

  /** Count-min sketch geometry: d=4 independent affine hash rows over
    * the [[Dedup.P]] universe, w=1024 buckets each — 4·1024 counters
    * per keyspace regardless of item count. Affine products stay
    * < 2^62: overflow-free, bit-identical in both engines.
    */
  val CmsRows = 4
  val CmsWidth = 1024
  val CmsParams: Seq[(Long, Long)] =
    Seq((86028157L, 104729L), (472882049L, 224737L),
      (898133173L, 350377L), (1299709L, 479909L))

  private def cmsBucket(x: Column, a: Long, b: Long): Column =
    ((x % Dedup.P) * a + b) % Dedup.P % CmsWidth

  /** Count-min heavy hitters — the frequency-sketch audit next to the
    * HLL cardinality sketch: every item's sketched count (min over the
    * d rows of exact bucket counters) beside its true count. Counters
    * are plain COUNTs, so the sketch is MERGEABLE by addition (shards/
    * streams sum theirs) and the whole build is one partial-
    * aggregatable (row, bucket) integer shuffle of d·w cells — at
    * 100 TB the sketch answers "is this item hot?" without a per-item
    * aggregation. cms >= exact always (collisions only inflate); the
    * exact column is the audit side, as in approx_distinct_hll.
    */
  def cmsHeavyHitters(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    cmsHeavyHittersOf(
      Relational.ratings(spark, dir).select($"song_id".cast("long").as("v")))
  }

  /** [[cmsHeavyHitters]] over any single-column (v: BIGINT) relation. */
  def cmsHeavyHittersOf(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    // one scan, not d: the former union of d per-row selects re-ran
    // the upstream decode once per hash row — the d (j, bucket) cells
    // of one item are a projection of the same input row, so they
    // explode out of a single pass
    val counters = df.select(explode(array(
        CmsParams.zipWithIndex.map { case ((a, b), j) =>
          struct(lit(j).as("j"), cmsBucket($"v", a, b).as("bucket"))
        }: _*)).as("e"))
      .groupBy($"e.j".as("j"), $"e.bucket".as("bucket"))
      .agg(count(lit(1)).as("c"))
    val items = df.groupBy($"v").agg(count(lit(1)).as("n_exact"))
    cmsEstimate(counters, items)
  }

  /** Finish a counters relation (j, bucket, c) against an items
    * relation (v, n_exact) — shared by the batch build and the
    * streaming accumulator (whose state IS the counters).
    */
  private[graft] def cmsEstimate(counters: DataFrame,
      items: DataFrame): DataFrame = {
    val spark = counters.sparkSession
    import spark.implicits._
    // same one-pass explode as the build side: the former union of d
    // selects re-computed the items aggregate once per hash row
    val probes = items.select($"v", $"n_exact", explode(array(
        CmsParams.zipWithIndex.map { case ((a, b), j) =>
          struct(lit(j).as("j"), cmsBucket($"v", a, b).as("bucket"))
        }: _*)).as("e"))
      .select($"v", $"n_exact", $"e.j".as("j"), $"e.bucket".as("bucket"))
    probes.join(counters, Seq("j", "bucket"))
      .groupBy($"v", $"n_exact").agg(min($"c").as("n_cms"))
      .select($"v".as("item"), $"n_exact", $"n_cms")
      .orderBy($"item")
  }

  /** JVM mirror of [[cmsBucket]] (pure long arithmetic — overflow-free
    * by the same < 2^62 bound). Used by the stateful streaming sketch.
    */
  private[graft] def cmsBucketJvm(v: Long, a: Long, b: Long): Int =
    ((((v % Dedup.P) * a + b) % Dedup.P) % CmsWidth).toInt

  /** DuckDB mirror of [[cmsHeavyHitters]] (same hash rows); `table`
    * lets the streaming form cap the fed slice.
    */
  def cmsSql(table: String = "events"): String = {
    val rowSelects = CmsParams.zipWithIndex.map { case ((a, b), j) =>
      s"SELECT $j AS j, ((v % ${Dedup.P}) * $a + $b) % ${Dedup.P} % $CmsWidth AS bucket FROM vals"
    }.mkString("\nUNION ALL\n")
    val probeSelects = CmsParams.zipWithIndex.map { case ((a, b), j) =>
      s"SELECT v, n_exact, $j AS j, ((v % ${Dedup.P}) * $a + $b) % ${Dedup.P} % $CmsWidth AS bucket FROM items"
    }.mkString("\nUNION ALL\n")
    s"""WITH vals AS (SELECT CAST(CAST(json_extract_string(props, '$$.k') AS INTEGER) AS BIGINT) AS v FROM $table),
       |rows_ AS ($rowSelects),
       |counters AS (SELECT j, bucket, COUNT(*) AS c FROM rows_ GROUP BY j, bucket),
       |items AS (SELECT v, COUNT(*) AS n_exact FROM vals GROUP BY v),
       |probes AS ($probeSelects)
       |SELECT p.v AS item, CAST(p.n_exact AS BIGINT) AS n_exact,
       |  CAST(MIN(c.c) AS BIGINT) AS n_cms
       |FROM probes p JOIN counters c USING (j, bucket)
       |GROUP BY p.v, p.n_exact ORDER BY item""".stripMargin
  }

  /** Histogram-quantile geometry: bins of width 1/2 over [0, 512) —
    * a POWER-OF-TWO width, so `floor(v * 2)` is one exact IEEE
    * multiply + floor in both engines (no decimal width like 0.1 whose
    * representation error could flip a boundary value's bin).
    */
  val QuantileBins = 1024
  val QuantileBinWidth = 0.5

  /** The quantiles reported, as exact rationals (num/100). */
  val QuantilePcts: Seq[Int] = Seq(50, 95, 99)

  /** Mergeable histogram quantiles — per-key p50/p95/p99 WITHOUT a
    * sort: bin counts are one partial-aggregatable integer shuffle
    * (the histogram is the mergeable sketch — shards/streams add
    * theirs), and the quantile pick is integer threshold arithmetic
    * (t = ceil(p·total) computed as (total·p + 99) div 100) over a
    * per-key cumulative sum whose partition is bounded by the BIN
    * COUNT, not the data. The reported value is the bin's lower edge —
    * rank error ≤ one bin width, the standard histogram contract; the
    * oracle runs the identical algorithm, so the check is exact.
    */
  def histogramQuantiles(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    histogramQuantilesOf(Tables.widened(spark, Tables.events(spark, dir)),
      $"event_type", $"value")
  }

  /** [[histogramQuantiles]] over any (key, value in [0, 512)). */
  def histogramQuantilesOf(df: DataFrame, key: Column, value: Column)
      : DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val bin = least(lit(QuantileBins - 1),
      greatest(lit(0L), floor(value * lit(2.0)))).cast("long")
    val counts = df.select(key.as("k"), bin.as("bin"))
      .groupBy($"k", $"bin").agg(count(lit(1)).as("n"))
    quantilesFromCounts(counts)
  }

  /** Histogram-sketch re-aggregation — [[hllDailyMerge]]'s counterpart
    * for the OTHER merge algebra: HLL registers merge by MAX, histogram
    * bins merge by SUM. The per-(event_type, day, bin) count relation
    * is the artifact a daily profiling job persists; summing bins
    * across the month and finishing with the SAME quantile fold is
    * algebraically identical to the one-shot histogram — which is
    * exactly what the oracle checks (it IS the one-shot SQL: a hash
    * match proves the merge lossless). Day layer is one extra integer
    * in the shuffle key; state stays bins-sized per (key, day).
    */
  def histogramDailyMerge(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.widened(spark, Tables.events(spark, dir))
      .withColumn("d", expr("ts div 86400000000000"))
    val bin = least(lit(QuantileBins - 1),
      greatest(lit(0L), floor($"value" * lit(2.0)))).cast("long")
    val daily = ev.select($"event_type".as("k"), $"d", bin.as("bin"))
      .groupBy($"k", $"d", $"bin").agg(count(lit(1)).as("n"))
    val merged = daily.groupBy($"k", $"bin").agg(sum($"n").as("n"))
    quantilesFromCounts(merged)
  }

  /** Finish a bin-count relation (k, bin, n) into per-key quantiles —
    * shared by the batch build and the streaming accumulator (whose
    * state IS the histogram).
    */
  private[graft] def quantilesFromCounts(counts: DataFrame): DataFrame = {
    val spark = counts.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val wCum = Window.partitionBy($"k").orderBy($"bin")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wTot = Window.partitionBy($"k")
    val cum = counts
      .withColumn("cum", sum($"n").over(wCum))
      .withColumn("total", sum($"n").over(wTot))
    val qCols = QuantilePcts.map { p =>
      val t = expr(s"(total * $p + 99) div 100")
      (min(when($"cum" >= t, $"bin")) * lit(QuantileBinWidth))
        .as(s"p$p")
    }
    cum.groupBy($"k")
      .agg(max($"total").as("total"), qCols: _*)
      .select(($"k".as("key") +: $"total" +:
        QuantilePcts.map(p => col(s"p$p"))): _*)
      .orderBy($"key")
  }

  /** JVM mirror of the bin assignment (the identical IEEE multiply +
    * floor). Used by the stateful streaming histogram.
    */
  private[graft] def quantileBinJvm(v: Double): Int =
    math.min(QuantileBins - 1, math.max(0L, math.floor(v * 2.0).toLong)).toInt

  /** DuckDB mirror of [[histogramQuantiles]] — same bins, same integer
    * thresholds.
    */
  def histogramQuantilesSql(table: String = "events",
      keyCol: String = "event_type", valCol: String = "value"): String = {
    val qSelects = QuantilePcts.map(p =>
      s"MIN(CASE WHEN cum >= (total * $p + 99) // 100 THEN bin END) * $QuantileBinWidth AS p$p")
      .mkString(",\n  ")
    s"""WITH b AS (SELECT $keyCol AS k,
       |  LEAST(${QuantileBins - 1}, GREATEST(0, CAST(FLOOR($valCol * 2.0) AS BIGINT))) AS bin
       |  FROM $table),
       |c AS (SELECT k, bin, COUNT(*) AS n FROM b GROUP BY k, bin),
       |m AS (SELECT k, bin, n,
       |  SUM(n) OVER (PARTITION BY k ORDER BY bin
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
       |  SUM(n) OVER (PARTITION BY k) AS total FROM c)
       |SELECT k AS key, CAST(MAX(total) AS BIGINT) AS total,
       |  $qSelects
       |FROM m GROUP BY k ORDER BY key""".stripMargin
  }

  /** DuckDB mirror of [[profileColumns]]: one aggregate per column,
    * UNION ALL'd — an independent plan shape for the same stats.
    */
  def profileSql(): String = {
    val selects = ProfileCols.map { case (c, isNum) =>
      val (mnN, mxN, mnS, mxS) =
        if (isNum) (s"CAST(MIN($c) AS DOUBLE)", s"CAST(MAX($c) AS DOUBLE)",
          "CAST(NULL AS VARCHAR)", "CAST(NULL AS VARCHAR)")
        else ("CAST(NULL AS DOUBLE)", "CAST(NULL AS DOUBLE)",
          s"CAST(MIN($c) AS VARCHAR)", s"CAST(MAX($c) AS VARCHAR)")
      s"""SELECT '$c' AS col_name, COUNT(*) AS n_rows,
         |  COUNT(*) - COUNT($c) AS n_null,
         |  COUNT(DISTINCT $c) AS n_distinct,
         |  $mnN AS min_num, $mxN AS max_num,
         |  $mnS AS min_str, $mxS AS max_str FROM ev""".stripMargin
    }
    s"""WITH ev AS (SELECT event_id, event_type, props,
       |  CAST(epoch_us(ts) AS BIGINT) AS ts_us, user_id, value FROM events)
       |${selects.mkString("\nUNION ALL\n")}
       |ORDER BY col_name""".stripMargin
  }

  /** DuckDB mirror of [[hllDistinct]] for the driver oracle — the same
    * hash, register math, and constant, textually shared.
    */
  def hllSql(table: String = "events", keyCol: String = "event_type",
      valCol: String = "user_id"): String = {
    val h60 = s"CAST(('0x' || substr(md5(CAST($valCol AS VARCHAR)), 1, 15)) AS BIGINT)"
    val lcList = LinearCountTable.mkString("[", ", ", "]")
    s"""WITH nn AS (SELECT * FROM $table WHERE $valCol IS NOT NULL),
       |hx AS (SELECT $keyCol AS k, $h60 AS h FROM nn),
       |rr AS (SELECT k, h % ${HllRegisters} AS reg,
       |  CASE WHEN (h // 64) = 0 THEN 55
       |       ELSE 55 - length(bin(h // 64)) END AS rho FROM hx),
       |regs AS (SELECT k, reg, MAX(rho) AS r FROM rr GROUP BY k, reg),
       |s AS (SELECT k,
       |  CAST(SUM(CAST(1 AS BIGINT) << CAST(55 - r AS INTEGER)) AS BIGINT)
       |    + ($HllRegisters - COUNT(*)) * (CAST(1 AS BIGINT) << 55) AS s,
       |  $HllRegisters - COUNT(*) AS v
       |  FROM regs GROUP BY k),
       |e AS (SELECT k, $HllK / CAST(s AS DOUBLE) AS raw, v FROM s),
       |ex AS (SELECT $keyCol AS k, COUNT(DISTINCT $valCol) AS n_exact
       |  FROM nn GROUP BY $keyCol)
       |SELECT ex.k AS key, ex.n_exact,
       |  CASE WHEN e.v > 0 AND e.raw <= $LinearCountThreshold
       |       THEN ($lcList)[e.v] ELSE e.raw END AS hll_estimate
       |FROM ex JOIN e USING (k) ORDER BY key""".stripMargin
  }
  /** Bitmap-index set operations — the exact companion to the KMV
    * ESTIMATES ([[kmvSetOps]]): each event type's user set is held as
    * a word-indexed bitmap (user_id div 64 → one long of presence
    * bits, built by a per-(type, word) `bit_or` — mergeable,
    * user-space/64-sized state, the roaring-bitmap idea in its dense
    * form), and every pairwise intersection is one word-aligned join +
    * `bit_count(a AND b)` sum. Zero-intersection pairs survive via the
    * type-pair frame (type-count² rows, broadcast). At 100 TB the
    * bitmap build is ONE shuffle of (type, word) longs and set algebra
    * never touches the fact table again — the classic bitmap-index
    * trade every warehouse offers next to sketches.
    */
  def bitmapSetOps(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val u = Tables.widened(spark, Tables.events(spark, dir))
      .select($"event_type", $"user_id").distinct()
    val bitLit = typedLit((0 until 64).map(1L << _))
    val words = u.select($"event_type", expr("user_id div 64").as("w"),
        element_at(bitLit, ($"user_id" % 64).cast("int") + 1).as("bit"))
      .groupBy($"event_type", $"w")
      .agg(expr("bit_or(bit)").as("bits"))
      .localCheckpoint(true)
    val counts = words.groupBy($"event_type")
      .agg(sum(expr("bit_count(bits)")).as("n"))
    val pairs = counts.select($"event_type".as("type_a"), $"n".as("n_a"))
      .join(counts.select($"event_type".as("type_b"), $"n".as("n_b")),
        $"type_a" < $"type_b")
    val inter = words.select($"event_type".as("type_a"), $"w",
        $"bits".as("ba"))
      .join(words.select($"event_type".as("type_b"), $"w", $"bits".as("bb")),
        Seq("w"))
      .filter($"type_a" < $"type_b")
      .groupBy($"type_a", $"type_b")
      .agg(sum(expr("bit_count(ba & bb)")).as("n_intersect"))
    pairs.join(inter, Seq("type_a", "type_b"), "left")
      .select($"type_a", $"type_b", $"n_a", $"n_b",
        coalesce($"n_intersect", lit(0L)).as("n_intersect"))
      .select($"type_a", $"type_b", $"n_a", $"n_b", $"n_intersect",
        ($"n_a" + $"n_b" - $"n_intersect").as("n_union"))
      .orderBy($"type_a", $"type_b")
  }

  /** Sliding-window distinct users from STORED DAILY SKETCHES — the
    * serving-side payoff of [[hllDailyMerge]]'s mergeability: a 7-day
    * rolling reach metric computed entirely from the per-day register
    * relations, never re-touching raw events. Each daily register row
    * contributes to the `windowDays` output days it falls inside — a
    * bounded explode (7 rows per register row, ≤ 64·7 per day
    * regardless of traffic) — then one max-merge per output day and
    * the shared estimator. Contrast with `rolling_distinct_users`,
    * which is the EXACT form and must carry user-id sets through the
    * window: the sketch path's state is 64 bytes/day forever, which is
    * the only thing that works when a day holds billions of distinct
    * keys. Windows are labeled by their END day and emitted only for
    * days that exist in the data; `n_days` audits how many source days
    * each window folded (≤ windowDays at the calendar edges).
    */
  def hllSlidingWindow(spark: SparkSession, dir: String,
      windowDays: Int = 7): DataFrame = {
    import spark.implicits._
    val ev = Tables.widened(spark, Tables.events(spark, dir))
      .filter($"user_id".isNotNull)
      .withColumn("d", expr("ts div 86400000000000"))
    val daily = ev
      .select($"d", Dedup.hash60($"user_id".cast("string")).as("h"))
      .select($"d", ($"h" % HllRegisters).as("reg"),
        rho(shiftrightunsigned($"h", 6)).as("rho"))
      .groupBy($"d", $"reg").agg(max($"rho").as("r"))
    val days = ev.select($"d").distinct()
    val contrib = daily
      .select($"d", explode(sequence($"d", $"d" + (windowDays - 1))).as("k"),
        $"reg", $"r")
      .join(days.select($"d".as("k")), Seq("k"))
    val merged = contrib.groupBy($"k", $"reg").agg(max($"r").as("r"))
    val nDays = contrib.select($"k", $"d").distinct()
      .groupBy($"k").agg(count(lit(1)).as("n_days"))
    estimateFromRegisters(merged)
      .join(nDays, Seq("k"))
      .select($"k".as("day"), $"n_days", $"hll_estimate")
      .orderBy($"day")
  }

  /** [[hllSlidingWindow]] oracle — the identical daily-register →
    * window-explode → max-merge pipeline.
    */
  def hllSlidingWindowSql(windowDays: Int = 7): String = {
    val h60 = "CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15)) AS BIGINT)"
    val lcList = LinearCountTable.mkString("[", ", ", "]")
    s"""WITH nn AS (SELECT (epoch_us(ts) * 1000) // 86400000000000 AS d, user_id
       |  FROM events WHERE user_id IS NOT NULL),
       |hx AS (SELECT d, $h60 AS h FROM nn),
       |rr AS (SELECT d, h % $HllRegisters AS reg,
       |  CASE WHEN (h // 64) = 0 THEN 55
       |       ELSE 55 - length(bin(h // 64)) END AS rho FROM hx),
       |daily AS (SELECT d, reg, MAX(rho) AS r FROM rr GROUP BY d, reg),
       |days AS (SELECT DISTINCT d FROM nn),
       |contrib AS (SELECT daily.d, t.k, reg, r
       |  FROM daily, unnest(generate_series(daily.d, daily.d + ${windowDays - 1})) AS t(k)
       |  WHERE t.k IN (SELECT d FROM days)),
       |merged AS (SELECT k, reg, MAX(r) AS r FROM contrib GROUP BY k, reg),
       |nd AS (SELECT k, COUNT(DISTINCT d) AS n_days FROM contrib GROUP BY k),
       |s AS (SELECT k,
       |  CAST(SUM(CAST(1 AS BIGINT) << CAST(55 - r AS INTEGER)) AS BIGINT)
       |    + ($HllRegisters - COUNT(*)) * (CAST(1 AS BIGINT) << 55) AS s,
       |  $HllRegisters - COUNT(*) AS v
       |  FROM merged GROUP BY k),
       |e AS (SELECT k, $HllK / CAST(s AS DOUBLE) AS raw, v FROM s)
       |SELECT e.k AS day, CAST(nd.n_days AS BIGINT) AS n_days,
       |  CASE WHEN e.v > 0 AND e.raw <= $LinearCountThreshold
       |       THEN ($lcList)[e.v] ELSE e.raw END AS hll_estimate
       |FROM e JOIN nd USING (k) ORDER BY day""".stripMargin
  }
}
