package graft

import java.nio.file.Files

import org.apache.spark.sql.types.StructType
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{GraftCatalog, ManifestV2}

/** CONCURRENT-WRITER CONVERGENCE (round 14 — the success half of the
  * optimistic-commit story; the conflict REFUSAL was already spec'd):
  * N real threads CAS-committing against one table must ALL land —
  * each loser of a version-file claim re-derives against the winner's
  * snapshot and retries — with no lost files, no duplicated files,
  * and a linear version chain.
  */
class ConcurrencySpec extends AnyFunSuite {
  import TestSpark._

  test("eight concurrent manifest commits converge through the CAS " +
      "retry: every file lands exactly once, the version chain is " +
      "linear, every intermediate snapshot stays readable") {
    val root = Files.createTempDirectory("graft_ccas_")
    val schema = StructType.fromDDL("k BIGINT")
    def entries(from: Int, until: Int) = (from until until).map(i =>
      ManifestV2.FileEntry(s"staging/f$i.parquet", 1L,
        Map("k" -> ((i.toLong, i.toLong)))))
    ManifestV2.commit(root)(_ =>
      ManifestV2.ManifestState(schema, Map.empty, Seq.empty))
    val n = 8
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]
    val start = new java.util.concurrent.CountDownLatch(1)
    val ts = (0 until n).map { t =>
      new Thread(() =>
        try {
          start.await()
          ManifestV2.commit(root) { cur =>
            val st = cur.get
            st.copy(files = st.files ++ entries(t * 10, t * 10 + 10))
          }
          ()
        } catch { case e: Throwable => errs.add(e); () })
    }
    ts.foreach(_.start())
    start.countDown() // maximize contention: all derive from v1 at once
    ts.foreach(_.join())
    assert(errs.isEmpty, s"no commit may be lost: $errs")
    val st = ManifestV2.readManifest(root).get
    assert(st.version == 1L + n, s"linear chain: got v${st.version}")
    assert(st.files.map(_.file).sorted ==
      (0 until n).flatMap(t => t * 10 until t * 10 + 10)
        .map(i => s"staging/f$i.parquet").sorted,
      "every thread's files land exactly once")
    // every intermediate version is a published, readable snapshot
    // with a strictly growing population
    val sizes = (1L to (n + 1L)).map(v =>
      ManifestV2.readManifest(root, v)
        .getOrElse(fail(s"v$v missing")).files.size)
    assert(sizes == (0 to n * 10 by 10),
      s"each retry must build on its predecessor: $sizes")
  }

  test("two concurrent SPARK appends to one catalog table both land " +
      "(the whole write path under contention, not just the CAS)") {
    GraftCatalog.install(spark)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.cc")
    spark.sql("DROP TABLE IF EXISTS graft.cc.t")
    spark.sql("CREATE TABLE graft.cc.t (k BIGINT)")
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]
    val ts = (0 until 2).map { t =>
      new Thread(() =>
        try spark.range(t * 100L, t * 100L + 50L).selectExpr("id AS k")
          .writeTo("graft.cc.t").append()
        catch { case e: Throwable => errs.add(e); () })
    }
    ts.foreach(_.start()); ts.foreach(_.join())
    assert(errs.isEmpty, s"both appends must land: $errs")
    assert(spark.sql("SELECT COUNT(*) FROM graft.cc.t")
      .head().getLong(0) == 100L)
    assert(spark.sql("SELECT CAST(SUM(k) AS BIGINT) FROM graft.cc.t")
      .head().getLong(0) == (0L until 50L).sum + (100L until 150L).sum)
  }
}
