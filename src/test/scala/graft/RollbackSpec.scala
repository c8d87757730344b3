package graft

import java.nio.file.Paths

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{GraftCatalog, ManifestV2}

/** SNAPSHOT ROLLBACK (round 15 — the incident-response half of time
  * travel): `CALL graft.system.rollback(version => v)` makes an old
  * snapshot current again as ONE new metadata commit whose state is
  * the old version's wholesale — files, schema, spec, aliases,
  * defaults, constraints, streaming epochs. History is preserved (the
  * bad version stays readable until expiry) and the change feed shows
  * the reversal as ordinary retractions. Driver query `dsv2_rollback`
  * pins the closed form; this spec covers the refusals, the
  * timestamp form, and rollback ACROSS a schema evolution.
  */
class RollbackSpec extends AnyFunSuite {
  import TestSpark._

  GraftCatalog.install(spark)
  spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.rb")
  private val wh = spark.conf.get("spark.sql.catalog.graft.warehouse")
  private def dir(t: String) = Paths.get(wh, "rb", t)

  private def msgs(t: Throwable): Seq[String] =
    if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)

  test("rollback restores the old snapshot as a NEW commit; the bad " +
      "version stays readable; work continues on the restored line") {
    spark.sql("DROP TABLE IF EXISTS graft.rb.t")
    spark.sql("CREATE TABLE graft.rb.t (k BIGINT)") // v1
    spark.sql("INSERT INTO graft.rb.t SELECT id FROM range(0, 10, 1, 1)") // v2
    spark.sql("INSERT INTO graft.rb.t SELECT id FROM range(100, 106, 1, 1)") // v3 (bad)
    val r = spark.sql("CALL graft.system.rollback(" +
      "ns => 'rb', tbl => 't', version => 2)").head()
    assert(r.getLong(0) == 2L && r.getLong(1) == 4L,
      s"restored v2 as v4, got $r")
    assert(spark.sql("SELECT COUNT(*) FROM graft.rb.t")
      .head().getLong(0) == 10L)
    // history preserved, not erased
    assert(spark.sql("SELECT COUNT(*) FROM graft.rb.t VERSION AS OF 3")
      .head().getLong(0) == 16L)
    // the restored line is live: appends continue from v4
    spark.sql("INSERT INTO graft.rb.t SELECT id FROM range(200, 203, 1, 1)") // v5
    assert(spark.sql("SELECT CAST(SUM(k) AS BIGINT) FROM graft.rb.t")
      .head().getLong(0) == (0L until 10L).sum + (200L until 203L).sum)
    assert(ManifestV2.readManifest(dir("t")).get.version == 5L)
  }

  test("timestamp form: rollback(timestamp_ms) resolves like " +
      "TIMESTAMP AS OF (latest version stamped <= t)") {
    spark.sql("DROP TABLE IF EXISTS graft.rb.ts")
    spark.sql("CREATE TABLE graft.rb.ts (k BIGINT)") // v1
    spark.sql("INSERT INTO graft.rb.ts VALUES (1), (2)") // v2
    val t2 = ManifestV2.readManifest(dir("ts")).get.commitTs
    // stamps are millis — hold the next commit out of t2's millisecond
    while (System.currentTimeMillis() <= t2) Thread.onSpinWait()
    spark.sql("INSERT INTO graft.rb.ts VALUES (3)") // v3
    val r = spark.sql("CALL graft.system.rollback(" +
      s"ns => 'rb', tbl => 'ts', timestamp_ms => $t2)").head()
    assert(r.getLong(0) == 2L && r.getLong(1) == 4L, s"got $r")
    assert(spark.sql("SELECT COUNT(*) FROM graft.rb.ts")
      .head().getLong(0) == 2L)
  }

  test("rollback across a schema evolution restores the old schema " +
      "wholesale — each snapshot is self-consistent") {
    spark.sql("DROP TABLE IF EXISTS graft.rb.se")
    spark.sql("CREATE TABLE graft.rb.se (k BIGINT)") // v1
    spark.sql("INSERT INTO graft.rb.se VALUES (1), (2)") // v2
    spark.sql("ALTER TABLE graft.rb.se ADD COLUMN v BIGINT DEFAULT 7") // v3
    spark.sql("INSERT INTO graft.rb.se VALUES (3, 30)") // v4
    spark.sql("CALL graft.system.rollback(" +
      "ns => 'rb', tbl => 'se', version => 2)").collect() // v5
    // the pre-ADD schema is current again: one column, two rows
    val df = spark.table("graft.rb.se")
    assert(df.schema.fieldNames.toSeq == Seq("k"))
    assert(df.count() == 2L)
    // and the evolution can be replayed on the restored line
    spark.sql("ALTER TABLE graft.rb.se ADD COLUMN v BIGINT DEFAULT 9")
    assert(spark.sql("SELECT CAST(SUM(v) AS BIGINT) FROM graft.rb.se")
      .head().getLong(0) == 18L, "restored rows serve the NEW default")
  }

  test("rollback by TAG name; tags and branches union in the refs view") {
    spark.sql("DROP TABLE IF EXISTS graft.rb.tg")
    spark.sql("CREATE TABLE graft.rb.tg (k BIGINT)") // v1
    spark.sql("INSERT INTO graft.rb.tg VALUES (1), (2)") // v2
    spark.sql("CALL graft.system.tag(" +
      "ns => 'rb', tbl => 'tg', name => 'good', version => 2)").collect()
    spark.sql("INSERT INTO graft.rb.tg VALUES (3)") // v3
    spark.sql("CALL graft.system.branch(" +
      "ns => 'rb', tbl => 'tg', name => 'wip')").collect()
    // the unified refs view: one row per named pointer
    val refs = spark.sql("""SELECT name, type, version, tip
      |FROM graft.rb.tg.refs ORDER BY name""".stripMargin).collect()
    assert(refs.length == 2)
    assert(refs(0).getString(0) == "good" &&
      refs(0).getString(1) == "tag" && refs(0).getLong(2) == 2L &&
      refs(0).isNullAt(3))
    assert(refs(1).getString(0) == "wip" &&
      refs(1).getString(1) == "branch" && refs(1).getLong(2) == 3L &&
      refs(1).getLong(3) == 0L)
    // rollback resolves the tag to its pinned version
    val r = spark.sql("CALL graft.system.rollback(" +
      "ns => 'rb', tbl => 'tg', tag => 'good')").head()
    assert(r.getLong(0) == 2L && r.getLong(1) == 4L, s"got $r")
    assert(spark.sql("SELECT COUNT(*) FROM graft.rb.tg")
      .head().getLong(0) == 2L)
    val bad = intercept[Exception] {
      spark.sql("CALL graft.system.rollback(" +
        "ns => 'rb', tbl => 'tg', tag => 'nope')").collect()
    }
    assert(msgs(bad).exists(_.contains("no tag")), s"got: ${msgs(bad)}")
  }

  test("refusals: current/future/expired targets, and the CALL " +
      "demands exactly one of version / timestamp_ms") {
    spark.sql("DROP TABLE IF EXISTS graft.rb.rf")
    spark.sql("CREATE TABLE graft.rb.rf (k BIGINT)") // v1
    spark.sql("INSERT INTO graft.rb.rf VALUES (1)") // v2
    def call(args: String) =
      spark.sql(s"CALL graft.system.rollback(ns => 'rb', tbl => 'rf', $args)")
        .collect()
    val cur = intercept[Exception] { call("version => 2") }
    assert(msgs(cur).exists(_.contains("earlier version")),
      s"got: ${msgs(cur)}")
    val fut = intercept[Exception] { call("version => 9") }
    assert(msgs(fut).exists(_.contains("earlier version")),
      s"got: ${msgs(fut)}")
    val both = intercept[Exception] {
      call("version => 1, timestamp_ms => 1")
    }
    assert(msgs(both).exists(_.contains("exactly one")),
      s"got: ${msgs(both)}")
    val neither = intercept[Exception] { call("version => -1") }
    assert(msgs(neither).exists(_.contains("exactly one")),
      s"got: ${msgs(neither)}")

    // expired target: the version file is gone, the refusal names the
    // earliest retained version
    spark.sql("INSERT INTO graft.rb.rf VALUES (2)") // v3
    spark.sql("INSERT INTO graft.rb.rf VALUES (3)") // v4
    spark.sql("CALL graft.system.expire_snapshots(" +
      "ns => 'rb', tbl => 'rf', keep => 1)").collect()
    val exp = intercept[Exception] { call("version => 2") }
    assert(msgs(exp).exists(_.contains("expired")), s"got: ${msgs(exp)}")
    assert(spark.sql("SELECT COUNT(*) FROM graft.rb.rf")
      .head().getLong(0) == 3L, "refusals changed nothing")
  }
}
