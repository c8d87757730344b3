package graft

import java.nio.file.Paths

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{GraftCatalog, ManifestV2}

/** CHERRY-PICK (round 15 — branch publish past divergence): the safe
  * subset `fast_forward` refuses. An APPEND-ONLY branch replays onto
  * a main that advanced since the fork as one atomic commit (file-set
  * union, streaming epoch ledgers merged by max). Real conflicts
  * refuse loudly: branch deletes/rewrites of fork-base files, branch
  * DDL, and CHECK constraints main added since the fork. Driver query
  * `dsv2_branch_rebase` pins the closed form; this spec covers the
  * refusals and the fast_forward/cherry_pick hand-off.
  */
class CherryPickSpec extends AnyFunSuite {
  import TestSpark._

  GraftCatalog.install(spark)
  spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.cp")
  private val wh = spark.conf.get("spark.sql.catalog.graft.warehouse")
  private def dir(t: String) = Paths.get(wh, "cp", t).toString

  private def msgs(t: Throwable): Seq[String] =
    if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)

  private def seed(t: String): String = {
    spark.sql(s"DROP TABLE IF EXISTS graft.cp.$t")
    spark.sql(s"CREATE TABLE graft.cp.$t (k BIGINT)") // v1
    spark.sql(s"INSERT INTO graft.cp.$t SELECT id FROM range(0, 10, 1, 1)") // v2
    spark.sql("CALL graft.system.branch(" +
      s"ns => 'cp', tbl => '$t', name => 'b')").collect()
    dir(t)
  }

  private def stage(d: String, lo: Long, hi: Long): Unit = {
    import spark.implicits._
    spark.range(lo, hi).select($"id".as("k"))
      .write.format("graft.sources.ManifestV2")
      .option("path", d).option("branch", "b").mode("append").save()
  }

  test("an append-only branch publishes onto an advanced main: " +
      "fast_forward refuses the divergence, cherry_pick unions it") {
    val d = seed("ok")
    stage(d, 100L, 105L)
    spark.sql("INSERT INTO graft.cp.ok SELECT id FROM range(200, 203, 1, 1)") // v3: diverge
    val ff = intercept[Exception] {
      spark.sql("CALL graft.system.fast_forward(" +
        "ns => 'cp', tbl => 'ok', name => 'b')").collect()
    }
    assert(msgs(ff).exists(_.contains("diverged")), s"got: ${msgs(ff)}")
    val v = spark.sql("CALL graft.system.cherry_pick(" +
      "ns => 'cp', tbl => 'ok', name => 'b')").head().getLong(0)
    assert(v == 4L, s"one atomic publish commit, got v$v")
    assert(spark.sql("SELECT CAST(SUM(k) AS BIGINT) FROM graft.cp.ok")
      .head().getLong(0) ==
      (0L until 10L).sum + (100L until 105L).sum + (200L until 203L).sum)
    // the published history is linear: v3 (diverged main) is intact
    assert(spark.sql("SELECT COUNT(*) FROM graft.cp.ok VERSION AS OF 3")
      .head().getLong(0) == 13L)
  }

  test("no divergence degenerates to a plain publish") {
    val d = seed("nd")
    stage(d, 50L, 53L)
    val v = spark.sql("CALL graft.system.cherry_pick(" +
      "ns => 'cp', tbl => 'nd', name => 'b')").head().getLong(0)
    assert(v == 3L)
    assert(spark.sql("SELECT COUNT(*) FROM graft.cp.nd")
      .head().getLong(0) == 13L)
  }

  test("fork at a RETAINED OLDER version (branch(version => v)): the " +
      "incident-response branch stages against the pre-bad snapshot") {
    spark.sql("DROP TABLE IF EXISTS graft.cp.hv")
    spark.sql("CREATE TABLE graft.cp.hv (k BIGINT)") // v1
    spark.sql("INSERT INTO graft.cp.hv SELECT id FROM range(0, 10, 1, 1)") // v2
    spark.sql("INSERT INTO graft.cp.hv SELECT id FROM range(500, 503, 1, 1)") // v3 (bad)
    val r = spark.sql("CALL graft.system.branch(" +
      "ns => 'cp', tbl => 'hv', name => 'fix', version => 2)").head()
    assert(r.getLong(1) == 2L, s"fork base v2, got $r")
    val d = dir("hv")
    import spark.implicits._
    spark.range(100L, 103L).select($"id".as("k"))
      .write.format("graft.sources.ManifestV2")
      .option("path", d).option("branch", "fix").mode("append").save()
    // the branch tip = pre-bad snapshot + the staged fix; main still
    // carries the bad batch
    val tip = spark.read.format("graft.sources.ManifestV2")
      .option("path", d).option("branch", "fix").load()
    assert(tip.count() == 13L &&
      tip.agg(org.apache.spark.sql.functions.sum("k")).head().getLong(0) ==
        (0L until 10L).sum + (100L until 103L).sum)
    assert(spark.sql("SELECT COUNT(*) FROM graft.cp.hv")
      .head().getLong(0) == 13L, "main untouched: 10 good + 3 bad")
    // refusals: future version, non-retained version
    def msgs2(t: Throwable): Seq[String] = msgs(t)
    val fut = intercept[Exception] {
      spark.sql("CALL graft.system.branch(" +
        "ns => 'cp', tbl => 'hv', name => 'f2', version => 9)").collect()
    }
    assert(msgs2(fut).exists(_.contains("current is")), s"got: ${msgs(fut)}")
  }

  test("refuses a branch that removed a fork-base file (a staged " +
      "delete/rewrite is a real conflict)") {
    val d = seed("rm")
    stage(d, 100L, 103L)
    // stage a REMOVAL of a fork-base file directly on the branch
    ManifestV2.branchCommit(Paths.get(d), "b") { cur =>
      val st = cur.get
      st.copy(files = st.files.filterNot(_.file == st.files.head.file))
    }
    spark.sql("INSERT INTO graft.cp.rm VALUES (999)") // diverge
    val e = intercept[Exception] {
      spark.sql("CALL graft.system.cherry_pick(" +
        "ns => 'cp', tbl => 'rm', name => 'b')").collect()
    }
    assert(msgs(e).exists(_.contains("removed or rewrote")),
      s"got: ${msgs(e)}")
  }

  test("refuses a branch that mutated a carried file in place (new " +
      "delete sidecars are row-level deletes)") {
    val d = seed("mu")
    ManifestV2.branchCommit(Paths.get(d), "b") { cur =>
      val st = cur.get
      st.copy(files = st.files.zipWithIndex.map { case (e, i) =>
        if (i == 0) e.copy(deletes = e.deletes :+ "fake.del") else e
      })
    }
    spark.sql("INSERT INTO graft.cp.mu VALUES (999)") // diverge
    val e = intercept[Exception] {
      spark.sql("CALL graft.system.cherry_pick(" +
        "ns => 'cp', tbl => 'mu', name => 'b')").collect()
    }
    assert(msgs(e).exists(_.contains("mutated")), s"got: ${msgs(e)}")
  }

  test("refuses a branch that carries DDL") {
    val d = seed("dl")
    ManifestV2.branchCommit(Paths.get(d), "b") { cur =>
      val st = cur.get
      st.copy(schema = org.apache.spark.sql.types.StructType
        .fromDDL("k BIGINT, extra BIGINT"))
    }
    spark.sql("INSERT INTO graft.cp.dl VALUES (999)") // diverge
    val e = intercept[Exception] {
      spark.sql("CALL graft.system.cherry_pick(" +
        "ns => 'cp', tbl => 'dl', name => 'b')").collect()
    }
    assert(msgs(e).exists(_.contains("DDL")), s"got: ${msgs(e)}")
  }

  test("refuses when main added a CHECK constraint since the fork " +
      "(staged rows were never validated against it)") {
    val d = seed("ck")
    stage(d, 100L, 103L)
    spark.sql("ALTER TABLE graft.cp.ck ADD CONSTRAINT small " +
      "CHECK (k < 1000000)") // main DDL since the fork
    val e = intercept[Exception] {
      spark.sql("CALL graft.system.cherry_pick(" +
        "ns => 'cp', tbl => 'ck', name => 'b')").collect()
    }
    assert(msgs(e).exists(_.contains("CHECK")), s"got: ${msgs(e)}")
    // dropping it clears the conflict — the publish then lands
    spark.sql("ALTER TABLE graft.cp.ck DROP CONSTRAINT small")
    spark.sql("CALL graft.system.cherry_pick(" +
      "ns => 'cp', tbl => 'ck', name => 'b')").collect()
    assert(spark.sql("SELECT COUNT(*) FROM graft.cp.ck")
      .head().getLong(0) == 13L)
  }
}
