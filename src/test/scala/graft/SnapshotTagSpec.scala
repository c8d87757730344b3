package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{GraftCatalog, ManifestV2}

/** SNAPSHOT TAGS (round 12): named refs pinning manifest versions —
  * time travel by name, and survival through `expire_snapshots` until
  * the tag is dropped. The reproducibility anchor of a training-data
  * pipeline: "the exact corpus the model saw" stays readable without
  * freezing retention for the whole table.
  */
class SnapshotTagSpec extends AnyFunSuite {
  import TestSpark._

  GraftCatalog.install(spark)
  spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.tag")

  private def wh = spark.conf.get("spark.sql.catalog.graft.warehouse")

  test("tag -> time travel by name -> expiry survival -> drop -> gone") {
    spark.sql("DROP TABLE IF EXISTS graft.tag.t")
    spark.sql("CREATE TABLE graft.tag.t (k BIGINT)")
    spark.sql("INSERT INTO graft.tag.t SELECT id FROM range(0, 10, 1, 1)")
    // tag the 10-row snapshot (current)
    val r = spark.sql("CALL graft.system.tag(ns => 'tag', tbl => 't', " +
      "name => 'corpus-v1', version => -1)").head()
    val tagged = r.getLong(1)
    // keep committing past it
    for (_ <- 0 until 3)
      spark.sql("INSERT INTO graft.tag.t SELECT id FROM range(0, 5, 1, 1)")
    assert(spark.sql("SELECT COUNT(*) FROM graft.tag.t").head().getLong(0)
      == 25L)
    // time travel by NAME
    assert(spark.sql(
      "SELECT COUNT(*) FROM graft.tag.t VERSION AS OF 'corpus-v1'")
      .head().getLong(0) == 10L)
    // numeric still works
    assert(spark.sql(
      s"SELECT COUNT(*) FROM graft.tag.t VERSION AS OF $tagged")
      .head().getLong(0) == 10L)

    // retention sweep keeps only the last snapshot — EXCEPT the tagged
    // one, which must stay readable with its files intact
    spark.sql("CALL graft.system.expire_snapshots(" +
      "ns => 'tag', tbl => 't', keep => 1)").collect()
    assert(spark.sql(
      "SELECT CAST(SUM(k) AS BIGINT) FROM graft.tag.t " +
        "VERSION AS OF 'corpus-v1'").head().getLong(0) == 45L,
      "a tagged snapshot must survive expiry, files and all")
    assert(spark.sql("SELECT COUNT(*) FROM graft.tag.t").head().getLong(0)
      == 25L)

    // drop the tag -> the next sweep reclaims it
    assert(spark.sql("CALL graft.system.drop_tag(ns => 'tag', " +
      "tbl => 't', name => 'corpus-v1')").head().getBoolean(0))
    spark.sql("CALL graft.system.expire_snapshots(" +
      "ns => 'tag', tbl => 't', keep => 1)").collect()
    val e = intercept[Exception] {
      spark.sql(
        s"SELECT COUNT(*) FROM graft.tag.t VERSION AS OF $tagged").head()
    }
    assert(e.getMessage.contains("no snapshot") ||
      e.getMessage.contains("neither"), e.getMessage)
  }

  test("tag names are validated; duplicates and dead versions refuse") {
    spark.sql("DROP TABLE IF EXISTS graft.tag.v")
    spark.sql("CREATE TABLE graft.tag.v (k BIGINT)")
    spark.sql("INSERT INTO graft.tag.v SELECT id FROM range(0, 3, 1, 1)")
    val dir = java.nio.file.Paths.get(wh, "tag", "v").toString
    ManifestV2.tagSnapshot(dir, "ok-tag_1.0")
    intercept[IllegalArgumentException] {
      ManifestV2.tagSnapshot(dir, "ok-tag_1.0") // duplicate
    }
    intercept[IllegalArgumentException] {
      ManifestV2.tagSnapshot(dir, "123") // purely numeric shadows versions
    }
    intercept[IllegalArgumentException] {
      ManifestV2.tagSnapshot(dir, "bad/name")
    }
    intercept[IllegalArgumentException] {
      // '.'-led names collide with staging temps: listTags would skip
      // the tag, so it would neither resolve nor pin against expiry
      ManifestV2.tagSnapshot(dir, ".hidden")
    }
    intercept[IllegalArgumentException] {
      ManifestV2.tagSnapshot(dir, "ghost", Some(999L)) // no such version
    }
    assert(ManifestV2.listTags(dir) == Seq(("ok-tag_1.0",
      ManifestV2.readManifest(java.nio.file.Paths.get(dir)).get.version)))
    assert(ManifestV2.dropTag(dir, "ok-tag_1.0"))
    assert(!ManifestV2.dropTag(dir, "ok-tag_1.0"))
  }

  test("TIMESTAMP AS OF: resolves to the latest snapshot at or before " +
      "t; between-commits picks the earlier; before-first-commit " +
      "fails loudly") {
    spark.sql("DROP TABLE IF EXISTS graft.tag.tt")
    spark.sql("CREATE TABLE graft.tag.tt (k BIGINT)")
    val dir = java.nio.file.Paths.get(wh, "tag", "tt")
    val t0 = ManifestV2.readManifest(dir).get.commitTs
    assert(t0 > 0L, "every commit must carry a wall-clock stamp")
    Thread.sleep(15)
    spark.sql("INSERT INTO graft.tag.tt SELECT id FROM range(0, 5, 1, 1)")
    val t1 = ManifestV2.readManifest(dir).get.commitTs
    Thread.sleep(15)
    spark.sql(
      "INSERT INTO graft.tag.tt SELECT id + 100 FROM range(0, 5, 1, 1)")
    val t2 = ManifestV2.readManifest(dir).get.commitTs
    assert(t0 < t1 && t1 < t2, s"monotone stamps: $t0 $t1 $t2")
    val f = java.time.format.DateTimeFormatter
      .ofPattern("yyyy-MM-dd HH:mm:ss.SSS")
      .withZone(java.time.ZoneOffset.UTC)
    def countAsOf(ms: Long): Long = spark.sql(
      "SELECT COUNT(*) FROM graft.tag.tt TIMESTAMP AS OF " +
        s"'${f.format(java.time.Instant.ofEpochMilli(ms))}'")
      .head().getLong(0)
    assert(countAsOf(t2) == 10L, "at the stamp itself: inclusive")
    assert(countAsOf(t2 - 1L) == 5L, "between commits: the earlier one")
    assert(countAsOf(t1) == 5L)
    assert(countAsOf(t1 - 1L) == 0L, "the empty CREATE snapshot")
    val e = intercept[Exception] { countAsOf(t0 - 60000L) }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("earliest retained")),
      s"before-first-commit must fail loudly: ${msgs(e)}")
  }
}
