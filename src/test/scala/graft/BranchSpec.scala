package graft

import java.nio.file.Paths

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{GraftCatalog, ManifestV2}

/** BRANCHES + WRITE-AUDIT-PUBLISH (round 13): a branch is a mutable
  * ref (`refs/<name>` = `branch:<K>:<base>`) whose commits claim
  * immutable `manifest.<name>.v<K>.txt` files through the same
  * CREATE_NEW CAS as main but advance the BRANCH ref, never
  * `manifest.txt` — staged work is invisible to main until
  * `fast_forward` installs the tip as ONE ordinary main commit,
  * refused loudly when main advanced since the fork (divergence).
  */
class BranchSpec extends AnyFunSuite {
  import TestSpark._

  GraftCatalog.install(spark)
  spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.br")
  private val wh = spark.conf.get("spark.sql.catalog.graft.warehouse")
  private def dir(t: String) = Paths.get(wh, "br", t).toString

  private def msgs(t: Throwable): Seq[String] =
    if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)

  test("write-audit-publish lifecycle: staged commits are invisible " +
      "to main, the branch read audits them, fast_forward publishes " +
      "atomically, drop_branch cleans up") {
    import spark.implicits._
    spark.sql("DROP TABLE IF EXISTS graft.br.wap")
    spark.sql("CREATE TABLE graft.br.wap (k BIGINT)")
    spark.sql("INSERT INTO graft.br.wap SELECT id FROM range(0, 10, 1, 1)")
    val d = dir("wap")
    val mainV = ManifestV2.readManifest(Paths.get(d)).get.version

    val r = spark.sql("CALL graft.system.branch(" +
      "ns => 'br', tbl => 'wap', name => 'audit')").head()
    assert(r.getString(0) == "audit" && r.getLong(1) == mainV)

    // two staged commits onto the branch
    def stage(lo: Long, hi: Long): Unit =
      spark.range(lo, hi).select($"id".as("k"))
        .write.format("graft.sources.ManifestV2")
        .option("path", d).option("branch", "audit")
        .mode("append").save()
    stage(100L, 105L)
    stage(200L, 203L)

    // invisible to main: pointer version AND row set untouched
    assert(ManifestV2.readManifest(Paths.get(d)).get.version == mainV)
    assert(spark.sql("SELECT COUNT(*) FROM graft.br.wap")
      .head().getLong(0) == 10L)
    // the branch read sees base + both staged commits
    val br = spark.read.format("graft.sources.ManifestV2")
      .option("path", d).option("branch", "audit").load()
    assert(br.count() == 18L)
    assert(ManifestV2.branchHead(d, "audit").contains((2L, mainV)))

    // publish: one atomic main commit installing the tip
    val pv = spark.sql("CALL graft.system.fast_forward(" +
      "ns => 'br', tbl => 'wap', name => 'audit')").head().getLong(0)
    assert(pv == mainV + 1L)
    assert(spark.sql("SELECT COUNT(*) FROM graft.br.wap")
      .head().getLong(0) == 18L)
    assert(spark.sql("SELECT CAST(SUM(k) AS BIGINT) FROM graft.br.wap")
      .head().getLong(0) ==
      (0L until 10L).sum + (100L until 105L).sum + (200L until 203L).sum)

    // drop: ref and branch version files go; main is untouched
    assert(spark.sql("CALL graft.system.drop_branch(" +
      "ns => 'br', tbl => 'wap', name => 'audit')").head().getBoolean(0))
    assert(ManifestV2.branchHead(d, "audit").isEmpty)
    val leftover = java.nio.file.Files.list(Paths.get(d)).iterator()
    var hasBranchManifests = false
    while (leftover.hasNext) {
      val n = leftover.next().getFileName.toString
      if (n.startsWith("manifest.audit.")) hasBranchManifests = true
    }
    assert(!hasBranchManifests, "drop_branch must remove branch manifests")
    assert(spark.sql("SELECT COUNT(*) FROM graft.br.wap")
      .head().getLong(0) == 18L)
  }

  test("divergence: fast_forward refuses when main advanced since the " +
      "fork, and the refusal changes nothing") {
    spark.sql("DROP TABLE IF EXISTS graft.br.dv")
    spark.sql("CREATE TABLE graft.br.dv (k BIGINT)")
    spark.sql("INSERT INTO graft.br.dv SELECT id FROM range(0, 5, 1, 1)")
    val d = dir("dv")
    spark.sql("CALL graft.system.branch(" +
      "ns => 'br', tbl => 'dv', name => 'b')").collect()
    spark.range(100, 103).selectExpr("id AS k")
      .write.format("graft.sources.ManifestV2")
      .option("path", d).option("branch", "b").mode("append").save()
    // main moves after the fork
    spark.sql("INSERT INTO graft.br.dv SELECT id + 50 FROM range(0, 2, 1, 1)")
    val before = ManifestV2.readManifest(Paths.get(d)).get
    val e = intercept[Exception] {
      spark.sql("CALL graft.system.fast_forward(" +
        "ns => 'br', tbl => 'dv', name => 'b')").collect()
    }
    assert(msgs(e).exists(_.contains("diverged")), s"got: ${msgs(e)}")
    val after = ManifestV2.readManifest(Paths.get(d)).get
    assert(after.version == before.version &&
      after.files.map(_.file) == before.files.map(_.file),
      "a refused publish must leave main untouched")
    // the branch itself is still readable/writable
    assert(spark.read.format("graft.sources.ManifestV2")
      .option("path", d).option("branch", "b").load().count() == 8L)
  }

  test("expiry respects branch heads: data files only a branch " +
      "references survive a keepLast=1 sweep and the branch stays " +
      "readable") {
    spark.sql("DROP TABLE IF EXISTS graft.br.ex")
    spark.sql("CREATE TABLE graft.br.ex (k BIGINT)")
    spark.sql("INSERT INTO graft.br.ex SELECT id FROM range(0, 6, 1, 1)")
    val d = dir("ex")
    spark.sql("CALL graft.system.branch(" +
      "ns => 'br', tbl => 'ex', name => 'keep')").collect()
    spark.range(100, 104).selectExpr("id AS k")
      .write.format("graft.sources.ManifestV2")
      .option("path", d).option("branch", "keep").mode("append").save()
    // main REPLACES its content: the original files are now referenced
    // only by expired main versions and by the branch
    spark.range(500, 502).selectExpr("id AS k")
      .write.format("graft.sources.ManifestV2")
      .option("path", d).mode("overwrite").save()
    ManifestV2.expireSnapshots(d, keepLast = 1)
    assert(spark.sql("SELECT COUNT(*) FROM graft.br.ex")
      .head().getLong(0) == 2L)
    val br = spark.read.format("graft.sources.ManifestV2")
      .option("path", d).option("branch", "keep").load()
    assert(br.count() == 10L,
      "branch-referenced files must survive the retention sweep")
  }

  test("ref namespace is shared: a branch cannot shadow a tag, tags " +
      "list without branches, branch writes need the branch") {
    spark.sql("DROP TABLE IF EXISTS graft.br.ns")
    spark.sql("CREATE TABLE graft.br.ns (k BIGINT)")
    spark.sql("INSERT INTO graft.br.ns SELECT id FROM range(0, 3, 1, 1)")
    val d = dir("ns")
    ManifestV2.tagSnapshot(d, "pin")
    intercept[IllegalArgumentException] {
      ManifestV2.createBranch(d, "pin")
    }
    ManifestV2.createBranch(d, "work")
    intercept[IllegalArgumentException] {
      ManifestV2.tagSnapshot(d, "work")
    }
    assert(ManifestV2.listTags(d).map(_._1) == Seq("pin"),
      "tags must list without branch refs")
    assert(ManifestV2.listBranches(d).map(_._1) == Seq("work"))
    val e = intercept[Exception] {
      spark.range(1).selectExpr("id AS k")
        .write.format("graft.sources.ManifestV2")
        .option("path", d).option("branch", "ghost")
        .mode("append").save()
    }
    assert(msgs(e).exists(_.contains("no branch")), s"got: ${msgs(e)}")
  }

  test("metadata tables: history/files/tags/branches SELECT the log " +
      "off manifest headers and refs") {
    spark.sql("DROP TABLE IF EXISTS graft.br.mt")
    spark.sql("CREATE TABLE graft.br.mt (k BIGINT)")
    spark.sql("INSERT INTO graft.br.mt " +
      "SELECT /*+ REPARTITION(1) */ id FROM range(0, 5, 1, 4)")
    val d = dir("mt")
    ManifestV2.tagSnapshot(d, "pinned")
    ManifestV2.createBranch(d, "wip")
    val hist = spark.sql("SELECT version, maintenance, files, rows " +
      "FROM graft.br.mt.history ORDER BY version").collect()
      .map(r => (r.getLong(0), r.getBoolean(1), r.getLong(2), r.getLong(3)))
    assert(hist.toSeq == Seq((1L, false, 0L, 0L), (2L, false, 1L, 5L)),
      s"got ${hist.toSeq}")
    // committed_at is stamped and monotone
    val ts = spark.sql("SELECT committed_at FROM graft.br.mt.history " +
      "ORDER BY version").collect().map(_.getTimestamp(0).getTime)
    assert(ts.forall(_ > 0L) && ts.sorted.sameElements(ts))
    val files = spark.sql("SELECT file, rows, sidecars, row_groups, " +
      "partition FROM graft.br.mt.files").collect()
    assert(files.length == 1 && files(0).getLong(1) == 5L &&
      files(0).getLong(2) == 0L && files(0).getLong(3) >= 1L &&
      files(0).isNullAt(4))
    assert(spark.sql("SELECT name, version FROM graft.br.mt.tags")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq ==
      Seq(("pinned", 2L)))
    assert(spark.sql(
      "SELECT name, tip, base_version FROM graft.br.mt.branches")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSeq == Seq(("wip", 0L, 2L)))
    // a partitioned table's files view renders the reserved boxes
    spark.sql("DROP TABLE IF EXISTS graft.br.mtp")
    spark.sql("CREATE TABLE graft.br.mtp (k BIGINT, ts TIMESTAMP) " +
      "PARTITIONED BY (days(ts))")
    spark.sql("INSERT INTO graft.br.mtp SELECT id, " +
      "TIMESTAMP '2024-07-01 12:00:00' FROM range(0, 3, 1, 1)")
    val p = spark.sql("SELECT partition FROM graft.br.mtp.files")
      .collect().map(_.getString(0))
    assert(p.toSeq == Seq("@p=" +
      java.time.LocalDate.of(2024, 7, 1).toEpochDay), s"got ${p.toSeq}")
    // an unknown view name is still NoSuchTable
    val e = intercept[Exception] {
      spark.sql("SELECT * FROM graft.br.mt.nosuchview").collect()
    }
    assert(msgs(e).exists(m => m.contains("TABLE_OR_VIEW_NOT_FOUND") ||
      m.contains("cannot be found")), s"got: ${msgs(e)}")
  }

  test("a branch read resolves against the BRANCH TIP schema even " +
      "after main evolved past the fork") {
    spark.sql("DROP TABLE IF EXISTS graft.br.sch")
    spark.sql("CREATE TABLE graft.br.sch (k BIGINT, v BIGINT)")
    spark.sql("INSERT INTO graft.br.sch SELECT id, id FROM range(0, 5, 1, 1)")
    val d = dir("sch")
    ManifestV2.createBranch(d, "b")
    spark.range(10, 13).selectExpr("id AS k", "id AS v")
      .write.format("graft.sources.ManifestV2")
      .option("path", d).option("branch", "b").mode("append").save()
    // main evolves AFTER the fork (which also makes it divergent)
    spark.sql("ALTER TABLE graft.br.sch RENAME COLUMN v TO val")
    val br = spark.read.format("graft.sources.ManifestV2")
      .option("path", d).option("branch", "b").load()
    assert(br.schema.fieldNames.toSeq == Seq("k", "v"),
      "the branch serves its fork-time names, not main's")
    assert(br.selectExpr("CAST(SUM(v) AS BIGINT)").head().getLong(0) ==
      (0L until 5L).sum + (10L until 13L).sum)
    assert(spark.table("graft.br.sch").schema.fieldNames.toSeq ==
      Seq("k", "val"))
  }

  test("metadata tables survive schema evolution: history counts and " +
      "files boxes reflect renamed/dropped columns") {
    spark.sql("DROP TABLE IF EXISTS graft.br.me")
    spark.sql("CREATE TABLE graft.br.me (k BIGINT, v BIGINT)")
    spark.sql("INSERT INTO graft.br.me " +
      "SELECT /*+ REPARTITION(1) */ id, id FROM range(0, 8, 1, 1)")
    spark.sql("ALTER TABLE graft.br.me RENAME COLUMN v TO val")
    spark.sql("ALTER TABLE graft.br.me ADD COLUMN extra BIGINT")
    spark.sql("ALTER TABLE graft.br.me DROP COLUMN extra")
    // history: CREATE, INSERT, then three metadata-only commits that
    // carry the SAME file population
    val hist = spark.sql("SELECT version, files, rows FROM " +
      "graft.br.me.history ORDER BY version").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(hist.toSeq == Seq((1L, 0L, 0L), (2L, 1L, 8L), (3L, 1L, 8L),
      (4L, 1L, 8L), (5L, 1L, 8L)), s"got ${hist.toSeq}")
    // the files view reflects the rewritten stats world (no stale keys
    // — the view renders only reserved @p boxes, none here) and the
    // table still answers under the current names
    assert(spark.sql("SELECT COUNT(*) FROM graft.br.me.files")
      .head().getLong(0) == 1L)
    assert(spark.sql("SELECT CAST(SUM(val) AS BIGINT) FROM graft.br.me")
      .head().getLong(0) == (0L until 8L).sum)
  }
}
