package graft.sources

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** File-level min/max zone maps — the data-skipping index every
  * object-store table format (Iceberg/Delta/parquet footers) keeps, in
  * its minimal explicit form: a per-file (min, max, count) stats table
  * built in ONE aggregate pass over the clustered layout, consulted at
  * query time to read ONLY the files whose [min, max] span intersects
  * the predicate range.
  *
  * This is the layer BELOW `partitionPruneRoundtrip`'s directory
  * pruning: partition pruning cuts whole directories on the partition
  * key; zone maps cut individual FILES on any clustered column, which
  * is what `compactSmallFiles`' range-clustered layout exists to
  * enable (a 100 TB time-series table clustered by ts answers a
  * one-week scan by touching ~a week's worth of files).
  *
  * Scale shape: the stats build is one partial-aggregatable shuffle of
  * <= #files rows; the stats table itself is metadata-sized (#files ×
  * 4 columns), so collecting it to plan the read is the same
  * metadata-sized collect `mergeApply` does for its affected-partition
  * set — the data rows never leave the executors. Skipping is LOSSLESS
  * by construction: a file eliminated by its min/max cannot contain a
  * qualifying row, and the residual filter re-applies the exact
  * predicate inside surviving files, so the oracle is the plain
  * full-scan filter.
  */
object DataSkipping {

  /** Range-clustered file count for the layout. Production would size
    * files to ~1 GB; the skipping logic is count-agnostic.
    */
  val ZoneFiles = 16

  /** Query window shared with the oracle SQL: 2024-01-08T00:00Z
    * (inclusive) to 2024-01-15T00:00Z (exclusive) in epoch NANOS — one
    * week of the corpus's fixed 30-day January window, so roughly 3/4
    * of the files are skipped at every scale factor.
    */
  val QueryLoNs = 1704672000000000000L
  val QueryHiNs = 1705276800000000000L

  /** Write the events corpus as a ts-range-clustered layout (the
    * compacted form a maintenance job keeps a time-series table in):
    * each file holds a disjoint ts span, which is what makes its
    * min/max stats selective.
    */
  def zoneLayout(spark: SparkSession, dir: String): String = {
    import spark.implicits._
    val out = Sources.scratchDir(spark, "zonemap_layout")
    Tables.events(spark, dir)
      .select($"event_id", $"ts", $"user_id", $"value")
      .repartitionByRange(ZoneFiles, $"ts")
      .sortWithinPartitions($"ts")
      .write.mode("overwrite").parquet(out)
    out
  }

  /** The zone map: per-file (min_ts, max_ts, n_rows) in one aggregate
    * pass. `input_file_name()` is plan metadata per row, so this is a
    * single partial-aggregatable shuffle with <= #files output rows.
    */
  def zoneMapOf(spark: SparkSession, path: String,
      column: String = "ts"): DataFrame = {
    import spark.implicits._
    spark.read.parquet(path)
      .groupBy(input_file_name().as("file"))
      .agg(min(col(column)).as("min_ts"), max(col(column)).as("max_ts"),
        count(lit(1)).as("n_rows"))
  }

  /** Plan + execute a range read through the zone map: collect the
    * metadata-sized stats, keep files whose span intersects [lo, hi),
    * read only those, and re-apply the exact predicate as the residual
    * filter. Returns (rows, filesRead, filesTotal) so callers (and the
    * spec) can assert the skipping actually happened.
    */
  def zoneMapRead(spark: SparkSession, path: String,
      lo: Long, hi: Long): (DataFrame, Int, Int) =
    zoneMapReadWith(spark, zoneMapOf(spark, path), lo, hi)

  /** [[zoneMapRead]] against an explicitly maintained stats table (the
    * incremental path hands in merged stats instead of rebuilding).
    */
  def zoneMapReadWith(spark: SparkSession, stats: DataFrame,
      lo: Long, hi: Long): (DataFrame, Int, Int) = {
    import spark.implicits._
    val zones = stats
      .select($"file", $"min_ts", $"max_ts")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))) // bounded: file count (zone-map metadata)
    val keep = zones.collect {
      case (f, mn, mx) if mx >= lo && mn < hi => f
    }.sorted
    val rows =
      if (keep.isEmpty)
        spark.emptyDataFrame
          .select(lit(0L).as("event_id"), lit(0L).as("ts"),
            lit(0L).as("user_id"), lit(0d).as("value"))
          .filter(lit(false))
      else spark.read.parquet(keep: _*)
        .filter($"ts" >= lo && $"ts" < hi)
    (rows, keep.length, zones.length)
  }

  /** The zone map restricted to an explicit file list — the day-2
    * maintenance primitive: after an append lands new files, ONLY they
    * are scanned for stats.
    */
  def zoneMapOfFiles(spark: SparkSession, files: Seq[String]): DataFrame = {
    import spark.implicits._
    spark.read.parquet(files: _*)
      .groupBy(input_file_name().as("file"))
      .agg(min($"ts").as("min_ts"), max($"ts").as("max_ts"),
        count(lit(1)).as("n_rows"))
  }

  /** List the layout's current parquet files as the URI form
    * `input_file_name()` reports, so before/after set difference
    * identifies appended files.
    */
  def listFiles(path: String): Set[String] = {
    import scala.jdk.CollectionConverters._
    val stream = java.nio.file.Files.list(java.nio.file.Paths.get(path))
    try stream.iterator().asScala.map(_.toUri.toString)
      .filter(_.endsWith(".parquet")).toSet
    finally stream.close()
  }

  /** Day-2 zone-map maintenance: the base layout (events with
    * event_id % 5 != 0) is written and stats-built once; the delta
    * (event_id % 5 == 0) is APPENDED as new range-clustered files, and
    * the stats table is updated by scanning ONLY the new files —
    * base ∪ delta stats, never a full rebuild (per-file min/max/count
    * is immutable once a file is written, the same argument that makes
    * parquet footers trustworthy). The week-window query then runs
    * against the MERGED stats over the whole layout. Spec asserts the
    * merged stats equal a from-scratch rebuild; the oracle is the same
    * plain range filter as [[zonemapSkip]] (base + delta = all events).
    */
  def zonemapIncremental(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val out = Sources.scratchDir(spark, "zonemap_incr")
    val ev = Tables.events(spark, dir)
      .select($"event_id", $"ts", $"user_id", $"value")
    ev.filter($"event_id" % 5 =!= 0)
      .repartitionByRange(ZoneFiles - 4, $"ts").sortWithinPartitions($"ts")
      .write.mode("overwrite").parquet(out)
    val baseFiles = listFiles(out)
    val baseStats = zoneMapOfFiles(spark, baseFiles.toSeq.sorted)
      .localCheckpoint() // freeze base stats BEFORE the append lands
    ev.filter($"event_id" % 5 === 0)
      .repartitionByRange(4, $"ts").sortWithinPartitions($"ts")
      .write.mode("append").parquet(out)
    val newFiles = (listFiles(out) -- baseFiles).toSeq.sorted
    val merged = baseStats.unionByName(zoneMapOfFiles(spark, newFiles))
    val (rows, _, _) = zoneMapReadWith(spark, merged, QueryLoNs, QueryHiNs)
    rows.select($"event_id", $"ts", $"user_id", $"value")
      .orderBy($"event_id")
  }

  /** Per-file Bloom width for [[bloomFileSkip]]: 2^16 bits per file
    * (1024 longs) keeps the 2-probe false-positive rate ≈3% at the
    * largest test SF's ~6k rows/file — sized to rows-per-file, not to
    * the table, exactly like parquet's own column bloom filters.
    */
  val FileBloomBits = 1 << 16

  /** Point-lookup targets shared with the oracle (< 1000, so they
    * exist at every scale factor).
    */
  val TargetEventIds = Seq(17L, 257L, 801L)

  private def idHash(c: org.apache.spark.sql.Column) =
    graft.operators.Dedup.hash60(
      concat(lit("bfs:"), c.cast("string")))

  /** Per-file Bloom index over `event_id` — the data-skipping layer for
    * POINT lookups on a column the file layout is NOT clustered by
    * (zone maps only help range-correlated columns): one pass builds a
    * (file, word, bits) index by per-file `bit_or` of probe bits (the
    * grouped form of [[graft.operators.Dedup.bloomWordsOf]]); a point
    * query probes each file's words DRIVER-SIDE with the target keys'
    * hashes (metadata-sized: #files × mBits/64 longs) and reads only
    * files some target may inhabit. No false negatives, so skipping is
    * lossless and the oracle is the plain IN-list filter; false
    * positives only cost an extra file read. This is parquet's own
    * column-bloom mechanism made explicit as an operator.
    */
  /** Build the per-file Bloom index: (file → word → bits), one grouped
    * `bit_or` pass, collected metadata-sized.
    */
  def bloomFileIndexOf(spark: SparkSession, path: String,
      mBits: Int = FileBloomBits): Map[String, Map[Long, Long]] = {
    import spark.implicits._
    import graft.operators.Dedup
    val rows = spark.read.parquet(path)
      .select(input_file_name().as("file"), idHash($"event_id").as("h"))
    // one parquet scan, not k (explode the k probe positions per row)
    val positions = rows.select($"file", explode(array(
      Dedup.BloomProbeParams.map { case (a, b) =>
        Dedup.bloomPos($"h", a, b, mBits)
      }: _*)).as("pos"))
    val bitLit = typedLit((0 until 64).map(1L << _))
    positions
      .select($"file", shiftrightunsigned($"pos", 6).as("w"),
        element_at(bitLit, $"pos".bitwiseAND(63L).cast("int") + 1).as("bit"))
      .groupBy($"file", $"w")
      .agg(expr("bit_or(bit)").as("bits"))
      .collect() // bounded: file count x mBits/64 words (filter metadata)
      .groupBy(_.getString(0))
      .view.mapValues(_.map(r => r.getLong(1) -> r.getLong(2)).toMap).toMap
  }

  /** Driver-side plan: the files some target id may inhabit. */
  def bloomPlanFiles(index: Map[String, Map[Long, Long]],
      targets: Seq[Long], mBits: Int = FileBloomBits): Seq[String] = {
    import graft.operators.Dedup
    val targetHs = targets.map(id => Dedup.hash60Local(s"bfs:$id"))
    def fileMayHold(words: Map[Long, Long], h: Long): Boolean =
      Dedup.BloomProbeParams.forall { case (a, b) =>
        val pos = Dedup.bloomPosLocal(h, a, b, mBits)
        (words.getOrElse(pos >> 6, 0L) & (1L << (pos & 63L))) != 0L
      }
    index.collect {
      case (f, words) if targetHs.exists(fileMayHold(words, _)) => f
    }.toSeq.sorted
  }

  def bloomFileSkip(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val path = zoneLayout(spark, dir) // ts-clustered: event_ids scatter
    val index = bloomFileIndexOf(spark, path)
    val keep = bloomPlanFiles(index, TargetEventIds)
    val out =
      if (keep.isEmpty) spark.read.parquet(path).filter(lit(false))
      else spark.read.parquet(keep: _*)
        .filter($"event_id".isin(TargetEventIds.map(java.lang.Long.valueOf): _*))
    out.select($"event_id", $"ts", $"user_id", $"value")
      .orderBy($"event_id")
  }

  /** Z-order layout + zone-map skipping end-to-end — the lakehouse
    * OPTIMIZE ZORDER pattern measured, not just the key function
    * ([[ZOrder.zorderKey]]): events are laid out by the Morton
    * interleave of BIT-BALANCED (user, hour) keys (each dimension
    * rank-scaled to 16 bits — unbalanced bit ranges would degenerate
    * the curve to a single-key sort and kill pruning on the minor
    * dimension), so per-file min/max stats are tight on BOTH columns
    * and a query on user_id ALONE — not the leading sort key of any
    * single-column layout — skips ~7/8 of the files for a 1/8 user
    * prefix. The normalization scalars (max user, hour span) are two
    * broadcast-sized aggregates; they shape only the LAYOUT, so the
    * oracle is the plain user-range filter (skipping is lossless, same
    * argument as [[zonemapSkip]]).
    */
  def zorderSkip(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val out = Sources.scratchDir(spark, "zorder_skip")
    val ev = Tables.events(spark, dir)
      .select($"event_id", $"ts", $"user_id", $"value",
        expr("ts div 3600000000000").as("hour"))
    val s = ev.agg(max($"user_id").as("mu"), min($"hour").as("h0"),
      max($"hour").as("h1")).first()
    val (maxU, h0, h1) = (s.getLong(0), s.getLong(1), s.getLong(2))
    val span = math.max(h1 - h0, 1L)
    ZOrder.zorderWrite(
      ev.select($"event_id", $"ts", $"user_id", $"value",
        expr(s"user_id * 65535 div $maxU").as("unorm"),
        expr(s"(hour - $h0) * 65535 div $span").as("hnorm")),
      "unorm", "hnorm", out, ZoneFiles)
    val hiUser = maxU / 8
    val zones = zoneMapOf(spark, out, "user_id")
      .select($"file", $"min_ts")
      .collect().map(r => (r.getString(0), r.getLong(1))) // bounded: ZoneFiles
    val keep = zones.collect { case (f, mn) if mn <= hiUser => f }.sorted
    val rows =
      if (keep.isEmpty) spark.read.parquet(out).filter(lit(false))
      else spark.read.parquet(keep: _*).filter($"user_id" <= hiUser)
    rows.select($"event_id", $"ts", $"user_id", $"value")
      .orderBy($"event_id")
  }

  /** Driver query: build the layout, answer the one-week window scan
    * through the zone map. Oracle: the same filter over the raw events
    * table — any row a skipped file actually contained would mismatch.
    */
  def zonemapSkip(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val path = zoneLayout(spark, dir)
    val (rows, _, _) = zoneMapRead(spark, path, QueryLoNs, QueryHiNs)
    rows.select($"event_id", $"ts", $"user_id", $"value")
      .orderBy($"event_id")
  }

  /** Promo months (calendar month numbers) for the [[dppJoin]] dim
    * filter — keeps 4 of 12 partitions per year.
    */
  val PromoMonths: Seq[Int] = Seq(1, 4, 7, 10)

  /** Dynamic Partition Pruning — the RUNTIME member of the skipping
    * family (zone maps and Bloom files above are planner/driver-side):
    * the orders fact is laid out hive-partitioned by month
    * (`partitionBy` write — the 100 TB warehouse layout), the month
    * dimension carries the promo flag, and the join's fact scan is
    * pruned by a `dynamicpruning` subquery Catalyst injects from the
    * FILTERED dim — only promo-month directories are ever read, a
    * decision that cannot be made statically because the kept months
    * come from the dim relation at execution time. The plan is
    * asserted in PlanSpec; the oracle recomputes from the raw table,
    * so a row lost (or kept) by wrong pruning mismatches.
    */
  def dppJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val factPath = Sources.scratchDir(spark, "dpp_fact")
    val dimPath = Sources.scratchDir(spark, "dpp_dim")
    if (!new java.io.File(factPath, "_SUCCESS").exists()) {
      val fact = Tables.orders(spark, dir)
        .withColumn("month",
          (year($"o_orderdate") * 100 + month($"o_orderdate")).cast("int"))
      fact.write.mode("overwrite").partitionBy("month").parquet(factPath)
      // the season tag is a STRING matched by equality: Catalyst's DPP
      // insertion requires a "likely selective" predicate on the dim
      // (EqualTo/In/Like...); a bare boolean attribute filter is not on
      // that list and silently disables pruning (measured)
      fact.select($"month").distinct()
        .withColumn("season",
          when(($"month" % 100).isin(PromoMonths.map(Int.box): _*),
            lit("promo")).otherwise(lit("regular")))
        .write.mode("overwrite").parquet(dimPath)
    }
    val factR = spark.read.parquet(factPath)
    val dim = spark.read.parquet(dimPath).filter($"season" === "promo")
    factR.join(dim.select($"month"), Seq("month"))
      .groupBy($"month")
      .agg(count(lit(1)).as("n_orders"),
        graft.Fx.dsum($"o_totalprice").as("revenue"))
      .orderBy($"month")
  }

  /** [[dppJoin]] oracle: the promo-month filter applied directly. */
  def dppJoinSql(): String =
    s"""SELECT CAST(year(o_orderdate) * 100 + month(o_orderdate) AS INT)
       |    AS month,
       |  CAST(COUNT(*) AS BIGINT) AS n_orders,
       |  ${graft.Fx.dsumSql("o_totalprice")} AS revenue
       |FROM orders
       |WHERE month(o_orderdate) IN (${PromoMonths.mkString(", ")})
       |GROUP BY 1 ORDER BY month""".stripMargin
}
