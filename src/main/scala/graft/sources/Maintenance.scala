package graft.sources

import graft.Tables
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Partition-scoped MERGE / upsert — the poor-man's `MERGE INTO` every
  * 100 TB parquet table maintenance job needs, and the natural
  * completion of `Relational.tableDiff`: given a classified change
  * feed (upserts + deletes), rewrite ONLY the partitions that contain
  * changed keys. Untouched partitions' files are left byte-identical
  * on disk (spec-asserted), so the IO cost is proportional to the
  * change locality, not the table size.
  *
  * Scale shape: the affected-partition set is metadata-sized (bounded
  * by the partition count, collected once on the driver to drive both
  * the pruned read and dynamic overwrite); the read of current rows is
  * partition-pruned at the scan (PartitionFilters, spec-asserted); the
  * rewrite uses dynamic partition overwrite so only written partitions
  * are replaced. Replaced-or-deleted keys leave via one hash anti-join.
  */
object Maintenance {

  /** Hash-partition count for the maintained table. 16 keeps the
    * fixture readable; a production table would use date or a higher
    * bucket count — the merge logic is count-agnostic.
    */
  val NumParts = 16

  /** Scratch table location for the driver query (overwritten per
    * run; the oracle never reads it — it reconstructs the expected
    * post-merge table from the same deterministic mutation).
    */
  val MergePath = "/tmp/graft_merge_apply"

  private def partOf(c: org.apache.spark.sql.Column) =
    (c % NumParts).cast("int")

  /** Apply `upserts` (doc_id, text) and `deletes` (doc_id) to the
    * partitioned parquet table at `path`. Returns the affected
    * partition ids (metadata-sized; also what the pruned read and the
    * overwrite are scoped to).
    */
  def mergeApply(spark: SparkSession, path: String,
      upserts: DataFrame, deletes: DataFrame): Seq[Int] = {
    import spark.implicits._
    val touchedKeys = upserts.select($"doc_id")
      .unionByName(deletes.select($"doc_id"))
    val affected = touchedKeys.select(partOf($"doc_id").as("part"))
      .distinct().as[Int].collect().toSeq.sorted // bounded: NumParts
    // partition-pruned read: only affected partitions' files are
    // scanned (PartitionFilters on the partition column)
    val current = spark.read.parquet(path)
      .filter($"part".isin(affected.map(Integer.valueOf): _*))
    val merged = current
      .join(touchedKeys.distinct(), Seq("doc_id"), "left_anti")
      .select($"doc_id", $"text", $"part")
      .unionByName(upserts.select($"doc_id", $"text", partOf($"doc_id").as("part")))
    // dynamic overwrite: only partitions PRESENT in `merged` are
    // replaced; every other partition's files stay untouched on disk.
    // Cluster rows by the partition column first so each rewritten
    // partition lands as one file per holding task instead of every
    // task spraying a sliver into every partition (the small-files
    // debt compact_roundtrip exists to pay down — don't mint it here).
    merged.repartition(affected.size.max(1), $"part")
      .write.mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("part").parquet(path)
    affected
  }

  /** Per-partition table fingerprint — the anti-entropy primitive that
    * makes [[mergeApply]] auditable at scale: row count + XOR of
    * per-row content hashes for every partition. XOR is commutative,
    * associative, and self-inverse, so the aggregate is
    * order-independent (partial-aggregatable), never overflows, and
    * two replicas can be compared partition-by-partition shipping only
    * #partitions × 16 bytes — reconciliation cost is metadata-sized
    * while touching every byte of content exactly once.
    */
  def fingerprintOf(rows: DataFrame): DataFrame = {
    val spark = rows.sparkSession
    import spark.implicits._
    rows.select($"part", $"doc_id",
        graft.operators.Dedup.hash60(
          concat($"doc_id".cast("string"), lit(":"), $"text")).as("h"))
      .groupBy($"part")
      .agg(count(lit(1)).as("n_rows"),
        expr("bit_xor(h)").as("xor_fingerprint"))
      .orderBy($"part")
  }

  /** Driver form over the documents corpus hashed into [[NumParts]]
    * partitions (the same layout [[mergeApplyQuery]] maintains).
    */
  def tableFingerprint(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    fingerprintOf(Tables.widened(spark, Tables.documents(spark, dir))
      .select($"doc_id", $"text", partOf($"doc_id").as("part")))
  }

  /** Scratch location for the maintained aggregate table. */
  val AggBasePath = "/tmp/graft_agg_base"

  /** Scratch location for the snapshot-published table. */
  val SnapshotTablePath = "/tmp/graft_snapshot_table"

  /** Version the CURRENT pointer names, if the table exists. */
  def currentVersion(path: String): Option[Int] = {
    val p = java.nio.file.Paths.get(path, "CURRENT")
    if (java.nio.file.Files.exists(p))
      Some(java.nio.file.Files.readString(p).trim.toInt)
    else None
  }

  /** Manifest-based ATOMIC snapshot publish — the isolation primitive
    * `mergeApply` lacks: every publish writes a NEW immutable data
    * directory plus a manifest listing exactly its files, then swaps
    * the one-line `CURRENT` pointer with an atomic same-directory
    * rename. Readers resolve CURRENT → manifest → file list, so a
    * reader can NEVER observe a half-published table (the pointer
    * flips between two complete manifests), and every older snapshot
    * stays readable forever (time travel) because no publish ever
    * touches an existing file — the two properties object-store table
    * formats (Iceberg/Delta) are built around, here in their minimal
    * POSIX form. Cost per publish is the new snapshot's data + one
    * metadata file; old snapshots are reclaimed by an explicit expiry,
    * never by a writer.
    */
  def publishSnapshot(spark: SparkSession, path: String,
      rows: DataFrame): Int = {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val root = Paths.get(path)
    Files.createDirectories(root)
    val next = currentVersion(path).getOrElse(0) + 1
    val dataDir = root.resolve(s"data/snap-$next")
    // ErrorIfExists: an immutable snapshot dir must never be rewritten
    rows.write.mode(SaveMode.ErrorIfExists).parquet(dataDir.toString)
    import scala.jdk.CollectionConverters._
    val listing = Files.list(dataDir)
    val files =
      try listing.iterator().asScala.map(_.getFileName.toString)
        .filter(_.endsWith(".parquet")).toSeq.sorted
      finally listing.close()
    Files.writeString(root.resolve(s"manifest-v$next.txt"),
      files.map(f => s"data/snap-$next/$f").mkString("\n"))
    val tmp = root.resolve(s"CURRENT.tmp-$next")
    Files.writeString(tmp, next.toString)
    Files.move(tmp, root.resolve("CURRENT"),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
    next
  }

  /** Read a published snapshot through its manifest — CURRENT by
    * default, or any historical version (time travel).
    */
  def readSnapshot(spark: SparkSession, path: String,
      version: Option[Int] = None): DataFrame = {
    val v = version.orElse(currentVersion(path)).getOrElse(
      throw new IllegalStateException(s"no published snapshot at $path"))
    val root = java.nio.file.Paths.get(path)
    val files = java.nio.file.Files
      .readString(root.resolve(s"manifest-v$v.txt"))
      .split("\n").toSeq.filter(_.nonEmpty)
      .map(rel => root.resolve(rel).toString)
    spark.read.parquet(files: _*)
  }

  /** Retention expiry for a snapshot table: drop every snapshot older
    * than the newest `keepLast`, deleting each expired manifest FIRST
    * and its data directory second — a reader that can still resolve
    * a manifest can always read every file it lists, so expiry is
    * safe against concurrent readers of retained versions (readers of
    * expired versions fail fast at manifest resolution, never with a
    * half-deleted file list). CURRENT is never eligible. Returns the
    * expired version numbers.
    */
  def expireSnapshots(path: String, keepLast: Int = 2): Seq[Int] = {
    require(keepLast >= 1)
    import java.nio.file.{Files, Paths}
    import scala.jdk.CollectionConverters._
    val root = Paths.get(path)
    val cur = currentVersion(path).getOrElse(return Seq.empty)
    val listing = Files.list(root)
    val versions =
      try listing.iterator().asScala.map(_.getFileName.toString)
        .collect { case s if s.startsWith("manifest-v") =>
          s.stripPrefix("manifest-v").stripSuffix(".txt").toInt }
        .toSeq.sorted
      finally listing.close()
    val expired = versions.filter(_ != cur).dropRight(keepLast - 1)
    expired.foreach { v =>
      Files.deleteIfExists(root.resolve(s"manifest-v$v.txt"))
      val dataDir = root.resolve(s"data/snap-$v")
      if (Files.exists(dataDir)) {
        val walk = Files.walk(dataDir)
        try walk.iterator().asScala.toSeq.reverse
          .foreach(p => Files.deleteIfExists(p))
        finally walk.close()
      }
    }
    expired
  }

  /** Driver query: publish documents v1, then the deterministic v2
    * mutation (the `tableDiff` edit/delete/append), and read back
    * through the CURRENT pointer. The oracle reconstructs v2 directly;
    * the SPEC additionally proves v1 stays byte-identical and readable
    * via its own manifest after v2 lands — the snapshot-isolation
    * property itself.
    */
  def snapshotPublishQuery(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // scratch reset so bench reruns republish from version 1
    val root = java.nio.file.Paths.get(SnapshotTablePath)
    if (java.nio.file.Files.exists(root)) {
      import scala.jdk.CollectionConverters._
      val walk = java.nio.file.Files.walk(root)
      try walk.iterator().asScala.toSeq.reverse
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
      finally walk.close()
    }
    val v1 = Tables.widened(spark, Tables.documents(spark, dir))
      .select($"doc_id", $"text")
    publishSnapshot(spark, SnapshotTablePath, v1)
    val offset = graft.operators.Relational.DiffAppendOffset
    val v2 = v1.filter($"doc_id" % 17 =!= 3)
      .select($"doc_id",
        when($"doc_id" % 13 === 5, concat($"text", lit(" rev2")))
          .otherwise($"text").as("text"))
      .unionByName(v1.filter($"doc_id" % 29 === 0)
        .select(($"doc_id" + offset).as("doc_id"), $"text"))
    publishSnapshot(spark, SnapshotTablePath, v2)
    readSnapshot(spark, SnapshotTablePath)
      .orderBy($"doc_id")
  }

  /** Day-21 cutoff (epoch µs, 2024-01-21T00:00Z) splitting the events
    * corpus into "history already aggregated" and "today's delta" —
    * shared with the oracle SQL, which recomputes from scratch.
    */
  val AggCutoffUs = 1705795200000000L

  /** Incremental aggregate maintenance — the pattern that makes a
    * 100 TB metrics table affordable: the per-(user, event_type)
    * aggregate is stored as ALGEBRAIC PARTIAL STATE (count, exact
    * cents sum, min/max µs), so folding in a day's delta is
    * `base ∪ partial(delta)` re-aggregated with (Σ, Σ, min, max) —
    * cost ∝ |delta| + |aggregate table|, never a history rescan. The
    * merge is associative and commutative (the same contract Spark's
    * own partial aggregation relies on), so the maintained table
    * equals the from-scratch aggregate bit-for-bit — which is exactly
    * what the DuckDB oracle checks. Derived metrics (avg) are computed
    * AFTER the merge from the exact state, in integer floor cents.
    */
  def incrementalAggOf(base: DataFrame, delta: DataFrame): DataFrame = {
    val spark = base.sparkSession
    import spark.implicits._
    base.unionByName(delta)
      .groupBy($"user_id", $"event_type")
      .agg(sum($"n").as("n"), sum($"cents_sum").as("cents_sum"),
        min($"min_tsu").as("min_tsu"), max($"max_tsu").as("max_tsu"))
      .select($"user_id", $"event_type", $"n", $"cents_sum",
        expr("cents_sum div n").as("avg_cents_floor"),
        $"min_tsu", $"max_tsu")
  }

  /** The partial-state projection shared by the base build and every
    * subsequent delta fold.
    */
  def aggPartial(events: DataFrame): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select($"user_id", $"event_type", expr("ts div 1000").as("tsu"),
        ($"value".cast("decimal(18,2)") * 100).cast("long").as("cents"))
      .groupBy($"user_id", $"event_type")
      .agg(count(lit(1)).as("n"), sum($"cents").as("cents_sum"),
        min($"tsu").as("min_tsu"), max($"tsu").as("max_tsu"))
  }

  /** Driver query: build the base aggregate from pre-cutoff history,
    * persist it (the stored metrics table), then fold in the
    * post-cutoff delta WITHOUT touching history again — the pruned
    * delta scan plus a read of the compact aggregate table are the
    * only inputs to the merge. Oracle: the from-scratch aggregate over
    * all events.
    */
  def incrementalAggMerge(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, dir)
    aggPartial(ev.filter(expr("ts div 1000") <= AggCutoffUs))
      .write.mode(SaveMode.Overwrite).parquet(AggBasePath)
    val base = spark.read.parquet(AggBasePath)
    val delta = aggPartial(ev.filter(expr("ts div 1000") > AggCutoffUs))
    incrementalAggOf(base, delta)
      .orderBy($"user_id", $"event_type")
  }

  /** Scratch location for the materialized join view's base. */
  val JoinViewBasePath = "/tmp/graft_join_view_base"

  /** Every 31st customer receives a dimension update on day 2 (name
    * suffix), shared with the oracle SQL.
    */
  val DimUpdateMod = 31L

  /** Incremental JOIN-view maintenance — the other half of
    * materialized-view IVM next to [[incrementalAggMerge]]'s
    * aggregates: a stored orders⋈customer view is maintained under a
    * day-2 delta on BOTH sides (new fact rows AND dimension updates)
    * without re-joining history:
    *
    *   view' = stored view − rows of updated customers   (anti-join)
    *         ∪ historical orders of updated customers ⋈ dim'
    *         ∪ delta orders ⋈ dim'
    *
    * — the classic Δ-join decomposition (ΔA⋈B ∪ A⋈ΔB with the
    * overlap folded into the dim' term). Cost ∝ |delta| + |rows
    * touching updated dims| + |stored view|, never a full history
    * re-join; the from-scratch join is exactly what the DuckDB oracle
    * computes, so a stale dim value surviving in the maintained view
    * hash-mismatches.
    */
  def incrementalJoinView(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val cutoff = lit(graft.operators.RuntimeFilter.CutoffTs).cast("timestamp")
    val orders = Tables.orders(spark, dir)
      .select($"o_orderkey", $"o_custkey", $"o_totalprice", $"o_orderdate")
    val custV1 = Tables.customer(spark, dir)
      .select($"c_custkey", $"c_name", $"c_mktsegment")
    def joined(o: DataFrame, c: DataFrame) =
      o.join(c, $"o_custkey" === $"c_custkey")
        .select($"o_orderkey", $"o_custkey", $"c_name", $"c_mktsegment",
          $"o_totalprice", $"o_orderdate".cast("date").as("o_orderdate"))
    // day 1: materialize the historical view
    joined(orders.filter($"o_orderdate" < cutoff), custV1)
      .write.mode(SaveMode.Overwrite).parquet(JoinViewBasePath)
    val stored = spark.read.parquet(JoinViewBasePath)
    // day 2: dim updates + fact delta
    val updated = custV1.filter($"c_custkey" % DimUpdateMod === 0)
      .select($"c_custkey", concat($"c_name", lit(" v2")).as("c_name"),
        $"c_mktsegment")
    val dimV2 = custV1.filter($"c_custkey" % DimUpdateMod =!= 0)
      .unionByName(updated)
    val affectedHist = orders.filter($"o_orderdate" < cutoff)
      .join(updated.select($"c_custkey".as("o_custkey")), Seq("o_custkey"),
        "left_semi")
    stored.join(updated.select($"c_custkey".as("o_custkey")),
        Seq("o_custkey"), "left_anti")
      .unionByName(joined(affectedHist, broadcast(updated)))
      .unionByName(joined(orders.filter($"o_orderdate" >= cutoff), dimV2))
      // the USING anti-join promotes its key to first position; pin the
      // canonical column order for schema-positional consumers
      .select($"o_orderkey", $"o_custkey", $"c_name", $"c_mktsegment",
        $"o_totalprice", $"o_orderdate")
      .orderBy($"o_orderkey")
  }

  /** Driver query: seed the table with documents v1, apply the same
    * deterministic mutation `Relational.tableDiff` classifies (every
    * 17th doc deleted, every 13th surviving doc edited, one appended
    * doc per 29th) as a change FEED through [[mergeApply]], then read
    * the post-merge table back. The oracle reconstructs v2 directly
    * from the documents table, so a row lost, duplicated, or left
    * stale by the merge hash-mismatches.
    */
  def mergeApplyQuery(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val v1 = Tables.widened(spark, Tables.documents(spark, dir))
      .select($"doc_id", $"text")
    v1.select($"doc_id", $"text", partOf($"doc_id").as("part"))
      .repartition(NumParts, $"part") // one file per partition, not 32
      .write.mode(SaveMode.Overwrite).partitionBy("part").parquet(MergePath)
    val offset = graft.operators.Relational.DiffAppendOffset
    val upserts = v1.filter($"doc_id" % 13 === 5 && $"doc_id" % 17 =!= 3)
      .select($"doc_id", concat($"text", lit(" rev2")).as("text"))
      .unionByName(v1.filter($"doc_id" % 29 === 0)
        .select(($"doc_id" + offset).as("doc_id"), $"text"))
    val deletes = v1.filter($"doc_id" % 17 === 3).select($"doc_id")
    mergeApply(spark, MergePath, upserts, deletes)
    spark.read.parquet(MergePath)
      .select($"doc_id", $"part", $"text")
      .orderBy($"doc_id")
  }
}
