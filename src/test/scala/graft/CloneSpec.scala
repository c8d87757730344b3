package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{GraftCatalog, ManifestV2}

/** ZERO-COPY CLONE (round 15): `CALL graft.system.clone` forks a
  * table's current snapshot into a new table with every data file
  * HARD-LINKED — zero data bytes moved, lifecycles independent by
  * construction (either side's reclamation only unlinks its own
  * name). Driver query `dsv2_clone` pins the divergence closed form;
  * this spec pins the zero-copy claim at the inode level and the
  * unlink-safety claim against source expiry.
  */
class CloneSpec extends AnyFunSuite {
  import TestSpark._

  GraftCatalog.install(spark)
  spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.cl")
  private val wh = spark.conf.get("spark.sql.catalog.graft.warehouse")

  private def ino(p: java.nio.file.Path): Any =
    Files.getAttribute(p, "unix:ino")

  test("clone hard-links (same inode), carries schema/constraints, " +
      "and the clone survives source overwrite + expiry + orphan " +
      "removal untouched") {
    spark.sql("DROP TABLE IF EXISTS graft.cl.src")
    spark.sql("DROP TABLE IF EXISTS graft.cl.dup")
    spark.sql("CREATE TABLE graft.cl.src (k BIGINT, v BIGINT)")
    spark.sql("INSERT INTO graft.cl.src SELECT id, id * 2 " +
      "FROM range(0, 100, 1, 2)")
    spark.sql("ALTER TABLE graft.cl.src ADD CONSTRAINT pos CHECK (k >= 0)")
    val linked = spark.sql("CALL graft.system.clone(ns => 'cl', " +
      "tbl => 'src', dst_ns => 'cl', dst_tbl => 'dup')")
      .head().getLong(0)
    assert(linked == 2L, s"two data files linked, got $linked")

    val srcDir = Paths.get(wh, "cl", "src")
    val dupDir = Paths.get(wh, "cl", "dup")
    val srcSt = ManifestV2.readManifest(srcDir).get
    val dupSt = ManifestV2.readManifest(dupDir).get
    assert(dupSt.version == 1L, "the clone starts its OWN chain")
    assert(dupSt.schema == srcSt.schema && dupSt.checks == srcSt.checks)
    // zero-copy: same inode behind both names
    srcSt.files.foreach(e =>
      assert(ino(srcDir.resolve(e.file)) == ino(dupDir.resolve(e.file)),
        s"${e.file} must be a hard link, not a copy"))
    // the carried CHECK constraint enforces on the clone too
    intercept[Exception] {
      spark.sql("INSERT INTO graft.cl.dup VALUES (-1, 0)")
    }

    // source life continues violently: full overwrite, retention
    // sweep, orphan removal — all of it only UNLINKS source names
    spark.sql("INSERT OVERWRITE graft.cl.src SELECT id, id " +
      "FROM range(0, 5, 1, 1)")
    spark.sql("CALL graft.system.expire_snapshots(" +
      "ns => 'cl', tbl => 'src', keep => 1)").collect()
    spark.sql("CALL graft.system.remove_orphans(" +
      "ns => 'cl', tbl => 'src', older_than_ms => 0)").collect()
    assert(spark.sql("SELECT COUNT(*) FROM graft.cl.src")
      .head().getLong(0) == 5L)
    // the clone still serves the full pre-fork snapshot
    assert(spark.sql("SELECT COUNT(*), CAST(SUM(v) AS BIGINT) " +
      "FROM graft.cl.dup").head() match {
      case r => r.getLong(0) == 100L && r.getLong(1) == (0L until 100L).map(_ * 2).sum
    })
  }

  test("a merge-on-read DELETE on the original never leaks into the " +
      "clone: the sidecar is manifest state, the inode is untouched") {
    spark.sql("DROP TABLE IF EXISTS graft.cl.mo")
    spark.sql("DROP TABLE IF EXISTS graft.cl.mo2")
    spark.sql("CREATE TABLE graft.cl.mo (k BIGINT)")
    spark.sql("INSERT INTO graft.cl.mo SELECT id FROM range(0, 50, 1, 1)")
    spark.sql("CALL graft.system.clone(ns => 'cl', tbl => 'mo', " +
      "dst_ns => 'cl', dst_tbl => 'mo2')").collect()
    spark.sql("DELETE FROM graft.cl.mo WHERE k % 10 = 3") // sidecar on mo
    assert(spark.sql("SELECT COUNT(*) FROM graft.cl.mo")
      .head().getLong(0) == 45L)
    assert(spark.sql("SELECT COUNT(*) FROM graft.cl.mo2")
      .head().getLong(0) == 50L, "the clone must not see the delete")
  }

  test("refusals: cloning onto an existing table or into a missing " +
      "namespace") {
    spark.sql("DROP TABLE IF EXISTS graft.cl.rf")
    spark.sql("CREATE TABLE graft.cl.rf (k BIGINT)")
    spark.sql("INSERT INTO graft.cl.rf VALUES (1)")
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    val onto = intercept[Exception] {
      spark.sql("CALL graft.system.clone(ns => 'cl', tbl => 'rf', " +
        "dst_ns => 'cl', dst_tbl => 'rf')").collect()
    }
    assert(msgs(onto).exists(_.contains("already exists")),
      s"got: ${msgs(onto)}")
    val noNs = intercept[Exception] {
      spark.sql("CALL graft.system.clone(ns => 'cl', tbl => 'rf', " +
        "dst_ns => 'nope', dst_tbl => 'x')").collect()
    }
    assert(msgs(noNs).exists(_.contains("does not exist")),
      s"got: ${msgs(noNs)}")
  }
}
