package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.ManifestV2

/** Round-12 CHANGE FEED semantics (the retraction half an append-only
  * incremental read cannot express):
  *
  *  - appends read back as `insert` rows, whole-file removals as
  *    `delete` rows carrying the pre-removal values;
  *  - a new position-delete sidecar retracts exactly the newly dead
  *    rows, FULL values resolved against the file;
  *  - a new equality-delete sidecar emits per-key markers ONCE, even
  *    when shared by many files;
  *  - a streaming UPSERT epoch reads back as the CDC it was: markers
  *    for the epoch's keys plus the epoch's rows as inserts — and a
  *    TOMBSTONE's key emits a marker with no matching insert;
  *  - sidecar COALESCING is feed-invariant (merged ordinals minus
  *    prior ordinals is empty);
  *  - version windows compose: feeding (0, k] then (k, live] equals
  *    feeding (0, live].
  */
class ChangeFeedSpec extends AnyFunSuite {
  import TestSpark._

  private def tmp(): String =
    Files.createTempDirectory("graft_cdc").toString

  private def feed(dir: String, from: Long = 0L,
      to: Option[Long] = None): DataFrame = {
    val r = spark.read.format("graft.sources.ManifestV2")
      .option("path", dir).option("changefeed", "true")
      .option("startVersion", from.toString)
    to.fold(r)(v => r.option("endVersion", v.toString)).load()
  }

  private def rows(df: DataFrame): Set[(Long, Long, String, Long)] =
    df.collect().map(r => (
      if (r.isNullAt(0)) Long.MinValue else r.getLong(0),
      if (r.isNullAt(1)) Long.MinValue else r.getLong(1),
      r.getString(2), r.getLong(3))).toSet

  test("appends, positional retractions, once-emitted equality markers") {
    import spark.implicits._
    graft.sources.GraftCatalog.install(spark)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.spec")
    spark.sql("DROP TABLE IF EXISTS graft.spec.cdc1")
    spark.sql("CREATE TABLE graft.spec.cdc1 (k BIGINT, v BIGINT)")
    spark.range(0, 100, 1, 1).select($"id".as("k"), ($"id" * 10).as("v"))
      .createOrReplaceTempView("graft_cdc1_src")
    // two appends with overlapping k boxes (both undecidable for the
    // key-list delete below -> ONE shared sidecar on both files)
    spark.sql("INSERT INTO graft.spec.cdc1 SELECT /*+ REPARTITION(1) */ " +
      "k, v FROM graft_cdc1_src WHERE k % 2 = 0")
    spark.sql("INSERT INTO graft.spec.cdc1 SELECT /*+ REPARTITION(1) */ " +
      "k, v FROM graft_cdc1_src WHERE k % 2 = 1")
    spark.sql("DELETE FROM graft.spec.cdc1 WHERE k % 10 = 7") // positional
    spark.sql("DELETE FROM graft.spec.cdc1 WHERE k IN (4, 5)") // equality
    val warehouse = spark.conf.get("spark.sql.catalog.graft.warehouse")
    val dir = Paths.get(warehouse, "spec", "cdc1").toString
    val got = feed(dir).collect()
    val inserts = got.filter(_.getString(2) == "insert")
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(inserts == (0L until 100L).map(k => (k, k * 10)).toSet)
    // full-row retractions carry values; markers carry NULL v
    val retractions = got.filter(r =>
      r.getString(2) == "delete" && !r.isNullAt(1))
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(retractions == (0L until 100L).filter(_ % 10 == 7)
      .map(k => (k, k * 10)).toSet)
    val markers = got.filter(r =>
      r.getString(2) == "delete" && r.isNullAt(1)).map(_.getLong(0)).toSeq
    assert(markers.sorted == Seq(4L, 5L),
      s"markers emit ONCE despite the shared sidecar: $markers")
    // replaying the feed reconstructs the table (inserts minus
    // retracted rows minus marker keys)
    val liveKeys = inserts.map(_._1) -- retractions.map(_._1) -- markers
    val table = spark.table("graft.spec.cdc1").collect()
      .map(_.getLong(0)).toSet
    assert(table == liveKeys)
    // version windows compose: (0,k] ++ (k,live] == (0,live]
    val live = ManifestV2.readManifest(Paths.get(dir)).get.version
    val mid = live - 2 // between the appends and the deletes
    assert(rows(feed(dir, 0, Some(mid))) ++ rows(feed(dir, mid, Some(live)))
      == rows(feed(dir)))
    spark.sql("DROP TABLE graft.spec.cdc1")
  }

  test("a whole-file (aligned) delete retracts the file's live rows " +
      "as of the pre-removal snapshot") {
    import spark.implicits._
    graft.sources.GraftCatalog.install(spark)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.spec")
    spark.sql("DROP TABLE IF EXISTS graft.spec.cdc3")
    spark.sql("CREATE TABLE graft.spec.cdc3 (k BIGINT, v BIGINT)")
    // two files with disjoint k boxes
    Seq((1L, 10L), (2L, 20L)).toDF("k", "v")
      .createOrReplaceTempView("graft_cdc3_a")
    Seq((100L, 1000L), (101L, 1010L)).toDF("k", "v")
      .createOrReplaceTempView("graft_cdc3_b")
    spark.sql("INSERT INTO graft.spec.cdc3 SELECT /*+ REPARTITION(1) */ " +
      "k, v FROM graft_cdc3_a")
    spark.sql("INSERT INTO graft.spec.cdc3 SELECT /*+ REPARTITION(1) */ " +
      "k, v FROM graft_cdc3_b")
    // aligned delete -> the second file drops WHOLE (metadata-only)
    spark.sql("DELETE FROM graft.spec.cdc3 WHERE k >= 100")
    val warehouse = spark.conf.get("spark.sql.catalog.graft.warehouse")
    val dir = Paths.get(warehouse, "spec", "cdc3").toString
    val got = rows(feed(dir))
    val dels = got.filter(_._3 == "delete")
    assert(dels.map(r => (r._1, r._2)) ==
      Set((100L, 1000L), (101L, 1010L)),
      s"the dropped file's rows retract with values: $dels")
    assert(got.count(_._3 == "insert") == 4)
    spark.sql("DROP TABLE graft.spec.cdc3")
  }

  test("a streaming upsert epoch reads back as CDC: markers + inserts; " +
      "a tombstone's marker has no matching insert") {
    import spark.implicits._
    val src = tmp(); val sink = tmp(); val ck = tmp()
    def push(rows: Seq[(Long, Long, Boolean)]): Unit =
      rows.toDF("k", "v", "del").repartition(1)
        .write.format("graft.sources.ManifestV2")
        .option("path", src).mode("append").save()
    def run(): Unit = {
      val q = spark.readStream.format("graft.sources.ManifestV2")
        .option("path", src).load()
        .writeStream.format("graft.sources.ManifestV2")
        .option("path", sink).option("upsertKey", "k")
        .option("upsertDeleteCol", "del")
        .option("checkpointLocation", ck).start()
      try q.processAllAvailable() finally q.stop()
    }
    push(Seq((1L, 10L, false), (2L, 20L, false)))
    run() // epoch 0: backfill
    val v0 = ManifestV2.readManifest(Paths.get(sink)).get.version
    push(Seq((1L, 11L, false), (2L, 0L, true), (3L, 30L, false)))
    run() // epoch 1: update k=1, tombstone k=2, insert k=3
    val step = rows(feed(sink, v0))
    val markers = step.filter(r => r._3 == "delete" && r._2 == Long.MinValue)
      .map(_._1)
    val inserts = step.filter(_._3 == "insert").map(r => (r._1, r._2))
    assert(markers == Set(1L, 2L, 3L),
      s"the epoch sidecar names every epoch key: $markers")
    assert(inserts == Set((1L, 11L), (3L, 30L)),
      s"the tombstoned key must have NO insert: $inserts")
  }

  test("the change feed STREAMS: each commit arrives as one micro-batch " +
      "of change rows, retractions included; offsets are versions") {
    import spark.implicits._
    graft.sources.GraftCatalog.install(spark)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.spec")
    spark.sql("DROP TABLE IF EXISTS graft.spec.cdc4")
    spark.sql("CREATE TABLE graft.spec.cdc4 (k BIGINT, v BIGINT)")
    spark.range(0, 40, 1, 1).select($"id".as("k"), ($"id" * 3).as("v"))
      .createOrReplaceTempView("graft_cdc4_src")
    spark.sql("INSERT INTO graft.spec.cdc4 SELECT /*+ REPARTITION(1) */ " +
      "k, v FROM graft_cdc4_src")
    val warehouse = spark.conf.get("spark.sql.catalog.graft.warehouse")
    val dir = Paths.get(warehouse, "spec", "cdc4").toString
    val name = s"cdcstream_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    val ck = tmp()
    val q = spark.readStream.format("graft.sources.ManifestV2")
      .option("path", dir).option("changefeed", "true").load()
      .writeStream.format("memory").queryName(name)
      .option("checkpointLocation", ck)
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Append).start()
    try {
      q.processAllAvailable()
      val afterBackfill = spark.table(name).count()
      assert(afterBackfill == 40, s"backfill inserts: $afterBackfill")
      // a positional delete lands as a retraction micro-batch
      spark.sql("DELETE FROM graft.spec.cdc4 WHERE k % 8 = 5")
      q.processAllAvailable()
      val retractions = spark.table(name)
        .filter($"_change_type" === "delete").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(retractions == (0L until 40L).filter(_ % 8 == 5)
        .map(k => (k, k * 3)).toSet, s"streamed retractions: $retractions")
      // an equality delete lands as marker rows
      spark.sql("DELETE FROM graft.spec.cdc4 WHERE k IN (2, 12)")
      q.processAllAvailable()
      val markers = spark.table(name)
        .filter($"_change_type" === "delete" && $"v".isNull)
        .collect().map(_.getLong(0)).toSeq.sorted
      assert(markers == Seq(2L, 12L), s"streamed markers: $markers")
    } finally q.stop()
    // the streamed feed equals the batch feed over the same range
    assert(spark.table(name).collect().map(r => (
      if (r.isNullAt(0)) Long.MinValue else r.getLong(0),
      if (r.isNullAt(1)) Long.MinValue else r.getLong(1),
      r.getString(2), r.getLong(3))).toSet == rows(feed(dir)))
    spark.sql("DROP TABLE graft.spec.cdc4")
  }

  test("position-sidecar coalescing is feed-invariant") {
    import spark.implicits._
    graft.sources.GraftCatalog.install(spark)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.spec")
    spark.sql("DROP TABLE IF EXISTS graft.spec.cdc2")
    spark.sql("CREATE TABLE graft.spec.cdc2 (k BIGINT, v BIGINT)")
    spark.range(0, 50, 1, 1).select($"id".as("k"), ($"id" * 2).as("v"))
      .createOrReplaceTempView("graft_cdc2_src")
    spark.sql("INSERT INTO graft.spec.cdc2 SELECT /*+ REPARTITION(1) */ " +
      "k, v FROM graft_cdc2_src")
    spark.sql("DELETE FROM graft.spec.cdc2 WHERE k % 7 = 1")
    spark.sql("DELETE FROM graft.spec.cdc2 WHERE k % 7 = 3")
    val warehouse = spark.conf.get("spark.sql.catalog.graft.warehouse")
    val dir = Paths.get(warehouse, "spec", "cdc2").toString
    val before = rows(feed(dir))
    val vBefore = ManifestV2.readManifest(Paths.get(dir)).get.version
    ManifestV2.coalesceDeletes(dir)
    // the coalesce commit emits NOTHING — doubly guaranteed: it is
    // @maint-marked (skipped outright) AND merged ordinals − prior
    // ordinals is empty — and the full feed is unchanged
    assert(rows(feed(dir, vBefore)).isEmpty,
      "coalescing must be invisible to the feed")
    assert(rows(feed(dir)) == before)
    // COMPACTION is also @maint-marked: a layout rewrite that replaces
    // every file emits NO change rows (the Delta dataChange=false
    // shape), and a REAL commit after it diffs against the
    // post-compaction layout correctly
    val vBeforeCompact = ManifestV2.readManifest(Paths.get(dir)).get.version
    ManifestV2.compactSnapshot(spark, dir, 1000000L)
    assert(ManifestV2.readManifest(Paths.get(dir)).get.maint)
    assert(rows(feed(dir, vBeforeCompact)).isEmpty,
      "compaction must be invisible to the feed")
    assert(rows(feed(dir)) == before)
    spark.sql("DELETE FROM graft.spec.cdc2 WHERE k = 10")
    val afterDel = rows(feed(dir, vBeforeCompact))
    assert(afterDel.map(r => (r._1, r._3)) == Set((10L, "delete")),
      s"a real post-compaction commit still feeds: $afterDel")
    spark.sql("DROP TABLE graft.spec.cdc2")
  }

  test("an expired feed base fails with the RESUMABLE position, and " +
      "the feed resumes cleanly from the earliest retained version") {
    import spark.implicits._
    val dir = tmp()
    def push(lo: Long, hi: Long): Unit =
      (lo until hi).map(k => (k, k * 10)).toDF("k", "v").repartition(1)
        .write.format("graft.sources.ManifestV2")
        .option("path", dir).mode("append").save()
    push(0, 3); push(10, 13); push(20, 23); push(30, 33)
    ManifestV2.expireSnapshots(dir, keepLast = 2)
    val earliest = ManifestV2.listVersions(
      java.nio.file.Paths.get(dir)).head
    // a from-creation replay cannot be served: versions 1..earliest-1
    // are gone — the error names the resumable start, not a generic
    // missing-manifest throw
    val e = intercept[Exception] { feed(dir, from = 0L).collect() }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(m => m.contains("expired") &&
      m.contains(s"startVersion = $earliest")), s"got: ${msgs(e)}")
    // resuming from the named position serves exactly the retained tail
    val tail = feed(dir, from = earliest).collect()
    assert(tail.length == 3 &&
      tail.forall(_.getString(2) == "insert"),
      s"retained tail must read back: ${tail.mkString(",")}")
    assert(tail.map(_.getLong(0)).sorted.toSeq == Seq(30L, 31L, 32L))
  }
}
