package graft

import java.nio.file.{Files, Path}

import org.apache.spark.sql.types.StructType
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{GraftCatalog, ManifestV2}

/** Metadata scalability of the manifest plane (the Iceberg
  * manifest-list shape): past [[ManifestV2.InlineCap]] files the
  * manifest references immutable SEGMENT files, so a commit writes
  * O(changed entries + segment count) bytes instead of restating the
  * whole file list — at a million files the difference between a
  * manifest commit and a manifest rewrite. Plus the parquet-leaf
  * count-only read path (footer row count, zero data pages).
  */
class ManifestScaleSpec extends AnyFunSuite {
  import TestSpark._

  private val schema = StructType.fromDDL("k BIGINT")

  private def freshRoot(): Path =
    Files.createTempDirectory("graft_mfs_")

  private def entries(from: Int, until: Int): Seq[ManifestV2.FileEntry] =
    (from until until).map(i =>
      ManifestV2.FileEntry(s"staging/f$i.parquet", 1L,
        Map("k" -> ((i.toLong, i.toLong)))))

  private def state(files: Seq[ManifestV2.FileEntry]) =
    ManifestV2.ManifestState(schema, Map.empty, files)

  private def segsOf(root: Path, v: Long = -1L): Seq[ManifestV2.SegRef] =
    ManifestV2.readManifestSegs(root, v).get._2

  test("append to a segmented table writes O(changed) manifest bytes") {
    val root = freshRoot()
    val base = entries(0, 5000)
    ManifestV2.commit(root)(_ => state(base)) // v1: 5 chunked segments
    val v1Segs = segsOf(root).map(_.name)
    assert(v1Segs.size == 5, s"expected 5 chunks, got ${v1Segs.size}")

    ManifestV2.commit(root) { cur =>
      state(cur.get.files ++ entries(5000, 5003))
    } // v2: append 3
    val v2 = ManifestV2.readManifestSegs(root, 2L).get
    assert(v2._1.files.size == 5003)
    val v2Segs = segsOf(root, 2L)
    assert(v2Segs.map(_.name).take(5) == v1Segs,
      "untouched segments must be reused BY REFERENCE")
    assert(v2Segs.size == 6 && v2Segs.last.files.size == 3,
      "the appended entries land in one fresh segment")
    // the O(changed) claim, in actual bytes: manifest + new segment
    // together are tiny next to what a flattened restatement costs
    val manifestBytes = Files.size(root.resolve("manifest.v2.txt"))
    val newSegBytes = Files.size(root.resolve(v2Segs.last.name))
    val flattenedBytes = v1Segs.map(n => Files.size(root.resolve(n))).sum
    assert(manifestBytes + newSegBytes < flattenedBytes / 20,
      s"commit wrote ${manifestBytes + newSegBytes} bytes; a flatten " +
        s"would restate $flattenedBytes")
    // time travel still reads the whole historical population
    assert(ManifestV2.readManifest(root, 1L).get.files.size == 5000)
  }

  test("a removal flattens only the affected segment") {
    val root = freshRoot()
    ManifestV2.commit(root)(_ => state(entries(0, 5000)))
    val v1Segs = segsOf(root).map(_.name)
    ManifestV2.commit(root) { cur =>
      state(cur.get.files.filterNot(_.file == "staging/f17.parquet"))
    }
    val v2Segs = segsOf(root)
    assert(ManifestV2.readManifest(root).get.files.size == 4999)
    assert(v2Segs.map(_.name).count(v1Segs.contains) == 4,
      "the four untouched chunks survive by reference")
    assert(v2Segs.exists(s => !v1Segs.contains(s.name) &&
      s.files.size == 999), "the pierced chunk is rewritten minus one")
  }

  test("the segment reference list is checkpoint-bounded") {
    val root = freshRoot()
    ManifestV2.commit(root)(_ => state(entries(0, 100)))
    for (i <- 0 until (ManifestV2.MaxSegs + 5))
      ManifestV2.commit(root) { cur =>
        state(cur.get.files ++ entries(1000 + i, 1001 + i))
      }
    val segs = segsOf(root)
    assert(segs.size <= ManifestV2.MaxSegs,
      s"reference list must stay bounded, got ${segs.size}")
    assert(ManifestV2.readManifest(root).get.files.size ==
      100 + ManifestV2.MaxSegs + 5)
  }

  test("small tables stay fully inline (hand-readable manifests)") {
    val root = freshRoot()
    ManifestV2.commit(root)(_ => state(entries(0, ManifestV2.InlineCap)))
    assert(segsOf(root).isEmpty)
    val lines = Files.readAllLines(root.resolve("manifest.txt"))
    assert((5 until lines.size).forall(i => !lines.get(i).startsWith("@")),
      "file lines inline after the header (schema, @v, @epochs, " +
        "@part, @ts), no references")
  }

  test("expiry reclaims segments no surviving manifest references") {
    val root = freshRoot()
    ManifestV2.commit(root)(_ => state(entries(0, 3000)))      // v1
    ManifestV2.commit(root)(_ => state(entries(5000, 8000)))   // v2 replaces
    val v1Segs = segsOf(root, 1L).map(_.name)
    val v2Segs = segsOf(root, 2L).map(_.name)
    ManifestV2.expireSnapshots(root.toString, keepLast = 1)
    v1Segs.foreach(n => assert(!Files.exists(root.resolve(n)),
      s"expired segment $n must be reclaimed"))
    v2Segs.foreach(n => assert(Files.exists(root.resolve(n)),
      s"live segment $n must survive"))
    assert(ManifestV2.readManifest(root).get.files.size == 3000)
  }

  test("metadata-served aggregates: COUNT/MIN/MAX answer from the manifest") {
    GraftCatalog.install(spark)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.spec")
    spark.sql("DROP TABLE IF EXISTS graft.spec.ma")
    spark.sql("CREATE TABLE graft.spec.ma (k BIGINT, s STRING)")
    spark.sql(
      "INSERT INTO graft.spec.ma SELECT id + 3, CONCAT('v', id) FROM range(0, 50, 1, 4)")
    val agg = spark.sql(
      "SELECT COUNT(*) AS n, MIN(k) AS lo, MAX(k) AS hi FROM graft.spec.ma")
    assert(agg.queryExecution.executedPlan.toString.contains("METADATA-AGG"),
      "COUNT/MIN/MAX over stat columns must plan the metadata scan")
    val r = agg.collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((50L, 3L, 52L)))

    // fallbacks, each loudly a ROW scan, never a wrong answer:
    // (a) a filter needs row inspection
    val filtered = spark.sql(
      "SELECT COUNT(*) FROM graft.spec.ma WHERE k % 2 = 0")
    assert(!filtered.queryExecution.executedPlan.toString.contains("METADATA-AGG"))
    assert(filtered.collect().head.getLong(0) == 25L)
    // (b) MIN of a string column has no stats box
    val strMin = spark.sql("SELECT MIN(s) FROM graft.spec.ma")
    assert(!strMin.queryExecution.executedPlan.toString.contains("METADATA-AGG"))
    assert(strMin.collect().head.getString(0) == "v0")
    spark.sql("DROP TABLE graft.spec.ma")
  }

  test("pushed filters prune files by stats box and filter inside parquet") {
    GraftCatalog.install(spark)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.spec")
    spark.sql("DROP TABLE IF EXISTS graft.spec.pf")
    spark.sql("CREATE TABLE graft.spec.pf (k BIGINT)")
    for (q <- 0 until 4)
      spark.sql(s"""INSERT INTO graft.spec.pf
        |SELECT id FROM range(${q * 100}, ${q * 100 + 100}, 1, 1)""".stripMargin)
    val df = spark.sql(
      "SELECT k FROM graft.spec.pf WHERE k >= 310 AND k < 320")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("files=1/4"),
      s"the three non-matching quartile files must be pruned at plan time:\n$plan")
    assert(df.collect().map(_.getLong(0)).sorted.toSeq == (310L until 320L))
    // a predicate no box can decide keeps every file (conservative)
    val undec = spark.sql("SELECT k FROM graft.spec.pf WHERE k % 7 = 0")
    assert(undec.queryExecution.executedPlan.toString.contains("files=4/4"))
    assert(undec.count() == (0 until 400).count(_ % 7 == 0))
    spark.sql("DROP TABLE graft.spec.pf")
  }

  test("manifest statistics let Catalyst broadcast a small table unhinted") {
    GraftCatalog.install(spark)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.spec")
    spark.sql("DROP TABLE IF EXISTS graft.spec.dim")
    spark.sql("CREATE TABLE graft.spec.dim (k BIGINT, tag BIGINT)")
    spark.sql(
      "INSERT INTO graft.spec.dim SELECT id, id * 10 FROM range(0, 64, 1, 1)")
    import spark.implicits._
    val fact = spark.range(0, 100000).select(($"id" % 64).as("k"),
      $"id".as("v"))
    val joined = fact.join(spark.table("graft.spec.dim"), "k")
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      "a 64-row manifest table reporting exact stats must broadcast " +
        s"without a hint:\n$plan")
    assert(joined.count() == 100000L)
    spark.sql("DROP TABLE graft.spec.dim")
  }

  test("a delete-reference mutation pierces its segment (no silent reuse)") {
    // a merge-on-read DELETE changes an entry WITHOUT changing its
    // name — segment reuse must compare entries, not names, or the
    // sidecar reference is dropped on the floor at serialization
    val root = freshRoot()
    ManifestV2.commit(root)(_ => state(entries(0, 5000)))
    val v1Segs = segsOf(root).map(_.name)
    ManifestV2.commit(root) { cur =>
      state(cur.get.files.map(e =>
        if (e.file == "staging/f17.parquet")
          e.copy(deletes = Seq("staging/posdel-x.txt"))
        else e))
    }
    val after = ManifestV2.readManifest(root).get
    assert(after.files.find(_.file == "staging/f17.parquet").get.deletes ==
      Seq("staging/posdel-x.txt"),
      "the sidecar reference must survive segmented serialization")
    val v2Segs = segsOf(root)
    assert(v2Segs.map(_.name).count(v1Segs.contains) == 4,
      "only the pierced segment flattens; the other four stay referenced")
  }

  test("merge-on-read DELETE: sidecars instead of rewrites, applied everywhere") {
    GraftCatalog.install(spark)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.spec")
    spark.sql("DROP TABLE IF EXISTS graft.spec.mor")
    spark.sql("CREATE TABLE graft.spec.mor (k BIGINT)")
    for (q <- 0 until 4)
      spark.sql(s"""INSERT INTO graft.spec.mor
        |SELECT id FROM range(${q * 100}, ${q * 100 + 100}, 1, 1)""".stripMargin)
    val dir = java.nio.file.Paths.get(
      spark.conf.get("spark.sql.catalog.graft.warehouse"), "spec", "mor")
    val before = ManifestV2.readManifest(dir).get.files
      .map(e => (e.file, Files.size(dir.resolve(e.file)))).toMap
    val preVersion = ManifestV2.readManifest(dir).get.version

    // a predicate no stats box can decide: merge-on-read, not a rewrite
    spark.sql("DELETE FROM graft.spec.mor WHERE k % 10 = 3")
    val st = ManifestV2.readManifest(dir).get
    assert(st.files.map(_.file).toSet == before.keySet,
      "a merge-on-read delete must not add or drop data files")
    before.foreach { case (f, sz) =>
      assert(Files.size(dir.resolve(f)) == sz,
        s"data file $f must be byte-identical after the delete") }
    assert(st.files.forall(_.deletes.nonEmpty),
      "every touched file must reference a position-delete sidecar")

    // readers subtract positions — plain, filtered, and count-only paths
    assert(spark.table("graft.spec.mor").count() == 360L)
    assert(spark.sql(
      "SELECT COUNT(*) FROM graft.spec.mor WHERE k % 10 = 3")
      .head().getLong(0) == 0L)
    assert(spark.sql("SELECT SUM(k) FROM graft.spec.mor").head().getLong(0)
      == (0L until 400L).filter(_ % 10 != 3).sum)
    // COUNT(*) stays METADATA-SERVED under deletes (footer rows minus
    // distinct sidecar positions — zero data files opened)...
    val morCount = spark.sql("SELECT COUNT(*) FROM graft.spec.mor")
    assert(morCount.queryExecution.executedPlan.toString
      .contains("METADATA-AGG"),
      "live count is derivable from manifest + sidecars alone")
    assert(morCount.head().getLong(0) == 360L)
    // ...but MIN/MAX must refuse: a deleted row may be the extremum
    assert(!spark.sql("SELECT MIN(k), MAX(k) FROM graft.spec.mor")
      .queryExecution.executedPlan.toString.contains("METADATA-AGG"))

    // time travel reads the PRE-delete snapshot (entries without refs)
    assert(spark.sql(
      s"SELECT COUNT(*) FROM graft.spec.mor VERSION AS OF $preVersion")
      .head().getLong(0) == 400L)

    // an UPDATE (copy-on-write) must not resurrect deleted rows
    spark.sql("UPDATE graft.spec.mor SET k = k + 10000 WHERE k = 5")
    assert(spark.table("graft.spec.mor").count() == 360L)
    assert(spark.sql("SELECT COUNT(*) FROM graft.spec.mor WHERE k % 10 = 3 AND k < 10000")
      .head().getLong(0) == 0L)

    // compaction APPLIES deletes and clears the references
    ManifestV2.compactSnapshot(spark, dir.toString, 1000000L)
    val after = ManifestV2.readManifest(dir).get
    assert(after.files.forall(_.deletes.isEmpty),
      "compaction must clear applied delete references")
    assert(spark.table("graft.spec.mor").count() == 360L)
    spark.sql("DROP TABLE graft.spec.mor")
  }

  test("incremental reads refuse ranges that cross a merge-on-read delete") {
    GraftCatalog.install(spark)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.spec")
    spark.sql("DROP TABLE IF EXISTS graft.spec.morr")
    spark.sql("CREATE TABLE graft.spec.morr (k BIGINT)")
    spark.sql("INSERT INTO graft.spec.morr SELECT id FROM range(0, 100, 1, 1)")
    spark.sql("INSERT INTO graft.spec.morr SELECT id FROM range(100, 200, 1, 1)")
    spark.sql("DELETE FROM graft.spec.morr WHERE k % 7 = 1")
    val dir = java.nio.file.Paths.get(
      spark.conf.get("spark.sql.catalog.graft.warehouse"), "spec", "morr")
    val v = ManifestV2.readManifest(dir).get.version
    val e = intercept[UnsupportedOperationException] {
      ManifestV2.appendedFiles(dir, 2L, v)
    }
    assert(e.getMessage.contains("merge-on-read delete"),
      s"a mutated carried file must fail the append-only contract: ${e.getMessage}")
    spark.sql("DROP TABLE graft.spec.morr")
  }

  test("the files metadata view DISTRIBUTES: one task per metadata " +
      "segment, the driver plans from pointers with no row " +
      "materialization, and each task parses its own segment") {
    val root = freshRoot()
    ManifestV2.commit(root)(_ => state(entries(0, 2500))) // 3 segments
    val t = new graft.sources.ManifestMetaTable(root.toString, "files")
    val batch = t.newScanBuilder(
      org.apache.spark.sql.util.CaseInsensitiveStringMap.empty())
      .build().toBatch
    val parts = batch.planInputPartitions()
    assert(parts.length == 3, s"expected one partition per segment, " +
      s"got ${parts.length}")
    assert(parts.forall(_.getClass.getSimpleName == "MetaSegPartition"),
      "a segmented table's files view must plan segment POINTERS, " +
        "not driver-materialized row chunks")
    // the executor-side parse serves every entry exactly once
    val rf = batch.createReaderFactory()
    var n = 0L
    var rowSum = 0L
    parts.foreach { p =>
      val r = rf.createReader(p)
      while (r.next()) { n += 1; rowSum += r.get().getLong(1) }
      r.close()
    }
    assert(n == 2500L && rowSum == 2500L)
    // history plans one task per retained version
    ManifestV2.commit(root)(cur => state(cur.get.files ++ entries(2500, 2501)))
    val h = new graft.sources.ManifestMetaTable(root.toString, "history")
      .newScanBuilder(
        org.apache.spark.sql.util.CaseInsensitiveStringMap.empty())
      .build().toBatch.planInputPartitions()
    assert(h.length == 2 &&
      h.forall(_.getClass.getSimpleName == "MetaVersionPartition"))
  }

  test("parquet leaves: count-only and provenance-only reads are footer-served") {
    GraftCatalog.install(spark)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.spec")
    spark.sql("DROP TABLE IF EXISTS graft.spec.pq")
    spark.sql("CREATE TABLE graft.spec.pq (k BIGINT, s STRING)")
    spark.sql(
      "INSERT INTO graft.spec.pq SELECT id, CONCAT('v', id) FROM range(0, 101, 1, 2)")
    // empty projection: rows come from the parquet footer
    assert(spark.sql("SELECT COUNT(*) FROM graft.spec.pq").collect()
      .head.getLong(0) == 101L)
    // provenance-only projection: _file from the split, no data pages
    val perFile = spark.sql(
      "SELECT _file, COUNT(*) AS n FROM graft.spec.pq GROUP BY _file")
      .collect().map(_.getLong(1)).sum
    assert(perFile == 101L)
    spark.sql("DROP TABLE graft.spec.pq")
  }

  test("rewrite_manifests coalesces accumulated small segments into " +
      "target-sized ones: entries identical, data files untouched, " +
      "old versions still readable") {
    val root = freshRoot()
    ManifestV2.commit(root)(_ => state(entries(0, 50))) // v1: 1 segment
    // 20 incremental appends, each leaving its own tiny fresh segment
    for (i <- 0 until 20)
      ManifestV2.commit(root) { cur =>
        state(cur.get.files ++ entries(50 + 2 * i, 52 + 2 * i))
      }
    val before = segsOf(root)
    assert(before.size == 21, s"20 appends -> 20 tiny segments on " +
      s"top of the base chunk, got ${before.size}")
    val vBefore = ManifestV2.readManifest(root).get.version

    val (b, a) = ManifestV2.rewriteManifests(root.toString, 1000)
    assert(b == 21L && a == 1L, s"got ($b, $a)")
    val after = ManifestV2.readManifestSegs(root).get
    assert(after._1.version == vBefore + 1L, "one ordinary commit")
    assert(after._1.maint, "pure layout: the change feed must skip it")
    assert(after._2.map(_.name).toSet.intersect(
      before.map(_.name).toSet).isEmpty, "every segment is fresh")
    // the entry SET is untouched — same files, rows, stats
    assert(after._1.files.map(ManifestV2.fileLine).sorted ==
      ManifestV2.readManifest(root, vBefore).get.files
        .map(ManifestV2.fileLine).sorted)
    // pre-rewrite versions keep their own segment references
    assert(ManifestV2.readManifest(root, vBefore).get.files.size == 90)
    // a target smaller than the table re-chunks evenly
    val (_, a2) = ManifestV2.rewriteManifests(root.toString, 30)
    assert(a2 == 3L, s"90 entries at 30/segment -> 3, got $a2")
  }

  test("rewrite_manifests on a live catalog table: reads identical " +
      "before and after, the change feed skips the maintenance " +
      "commit, expiry reclaims the dead small segments") {
    GraftCatalog.install(spark)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.spec")
    spark.sql("DROP TABLE IF EXISTS graft.spec.rw")
    spark.sql("CREATE TABLE graft.spec.rw (k BIGINT)")
    // 5 four-file inserts cross InlineCap (16) into segment land,
    // then single-file appends each add a tiny segment
    for (i <- 0 until 5)
      spark.sql(s"INSERT INTO graft.spec.rw SELECT id FROM " +
        s"range(${i * 100}, ${i * 100 + 40}, 1, 4)")
    for (i <- 0 until 6)
      spark.sql(s"INSERT INTO graft.spec.rw SELECT id FROM " +
        s"range(${1000 + i}, ${1001 + i}, 1, 1)")
    val wh = spark.conf.get("spark.sql.catalog.graft.warehouse")
    val d = java.nio.file.Paths.get(wh, "spec", "rw").toString
    val sumBefore = spark.sql(
      "SELECT CAST(SUM(k) AS BIGINT) FROM graft.spec.rw").head().getLong(0)
    val filesBefore = spark.sql(
      "SELECT file, rows FROM graft.spec.rw.files ORDER BY file")
      .collect().toSeq
    val vBefore = ManifestV2.readManifest(
      java.nio.file.Paths.get(d)).get.version

    val r = spark.sql("CALL graft.system.rewrite_manifests(" +
      "ns => 'spec', tbl => 'rw', target_entries => 1000)").head()
    assert(r.getLong(0) > 1L && r.getLong(1) == 1L,
      s"many small segments -> one, got $r")
    assert(spark.sql(
      "SELECT CAST(SUM(k) AS BIGINT) FROM graft.spec.rw")
      .head().getLong(0) == sumBefore)
    assert(spark.sql(
      "SELECT file, rows FROM graft.spec.rw.files ORDER BY file")
      .collect().toSeq == filesBefore, "the files view is identical")
    // the feed serves NOTHING for the maintenance step
    assert(spark.read.format("graft.sources.ManifestV2")
      .option("path", d).option("changefeed", "true")
      .option("startVersion", vBefore.toString)
      .option("endVersion", (vBefore + 1L).toString).load()
      .count() == 0L)
    // expiry reclaims the pre-rewrite segment files once no retained
    // version references them
    spark.sql("CALL graft.system.expire_snapshots(" +
      "ns => 'spec', tbl => 'rw', keep => 1)").collect()
    val segCount = java.nio.file.Files.list(java.nio.file.Paths.get(d))
      .filter(p => p.getFileName.toString.startsWith("seg."))
      .count()
    assert(segCount == 1L, s"one live segment after expiry, got $segCount")
    assert(spark.sql(
      "SELECT CAST(SUM(k) AS BIGINT) FROM graft.spec.rw")
      .head().getLong(0) == sumBefore)
    spark.sql("DROP TABLE graft.spec.rw")
  }
}
