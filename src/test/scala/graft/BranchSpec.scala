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

  test("a FRESH branch (tip ordinal 0) pins its fork-base manifest " +
      "against expiry — its whole state IS that main snapshot") {
    spark.sql("DROP TABLE IF EXISTS graft.br.fx")
    spark.sql("CREATE TABLE graft.br.fx (k BIGINT)")
    spark.sql("INSERT INTO graft.br.fx SELECT id FROM range(0, 6, 1, 1)")
    val d = dir("fx")
    val base = ManifestV2.createBranch(d, "fresh") // NO branch commit
    // main replaces its content: the fork-base files are now referenced
    // by nothing main keeps — only the k=0 branch needs them
    spark.range(900, 902).selectExpr("id AS k")
      .write.format("graft.sources.ManifestV2")
      .option("path", d).mode("overwrite").save()
    ManifestV2.expireSnapshots(d, keepLast = 1)
    assert(java.nio.file.Files.exists(
      Paths.get(d, s"manifest.v$base.txt")),
      "the fork-base manifest must be pinned like a tagged version")
    assert(spark.read.format("graft.sources.ManifestV2")
      .option("path", d).option("branch", "fresh").load().count() == 6L,
      "a fresh branch must survive a retention sweep intact")
    assert(spark.sql("SELECT COUNT(*) FROM graft.br.fx")
      .head().getLong(0) == 2L)
  }

  test("dropTag refuses a branch ref (dropBranch owns that " +
      "lifecycle); two creates of one ref name race safely") {
    spark.sql("DROP TABLE IF EXISTS graft.br.rf")
    spark.sql("CREATE TABLE graft.br.rf (k BIGINT)")
    spark.sql("INSERT INTO graft.br.rf SELECT id FROM range(0, 3, 1, 1)")
    val d = dir("rf")
    ManifestV2.tagSnapshot(d, "pin")
    ManifestV2.createBranch(d, "work")
    val e = intercept[IllegalArgumentException] {
      ManifestV2.dropTag(d, "work")
    }
    assert(msgs(e).exists(_.contains("is a branch")), s"got: ${msgs(e)}")
    assert(ManifestV2.branchHead(d, "work").isDefined,
      "the refused drop must leave the branch ref intact")
    assert(ManifestV2.dropTag(d, "pin"))
    assert(!ManifestV2.dropTag(d, "pin"), "second drop is a no-op")
    // the CREATE_NEW CAS: of two concurrent creates of one name,
    // exactly one wins — the loser throws, the winner's content stands
    val hits = new java.util.concurrent.atomic.AtomicInteger(0)
    val ts = (1 to 2).map(_ => new Thread(() =>
      try { ManifestV2.createBranch(d, "race"); () }
      catch { case _: IllegalArgumentException => hits.incrementAndGet(); () }))
    ts.foreach(_.start()); ts.foreach(_.join())
    assert(hits.get() == 1, s"exactly one creator must lose, got ${hits.get()}")
    assert(ManifestV2.branchHead(d, "race").isDefined)
  }

  test("branch and changefeed cannot combine — the feed reads main's " +
      "chain, so the combination refuses instead of silently " +
      "ignoring the branch") {
    spark.sql("DROP TABLE IF EXISTS graft.br.cf")
    spark.sql("CREATE TABLE graft.br.cf (k BIGINT)")
    spark.sql("INSERT INTO graft.br.cf SELECT id FROM range(0, 4, 1, 1)")
    val d = dir("cf")
    ManifestV2.createBranch(d, "b")
    val e = intercept[Exception] {
      spark.read.format("graft.sources.ManifestV2")
        .option("path", d).option("branch", "b")
        .option("changefeed", "true").load().collect()
    }
    assert(msgs(e).exists(_.contains("cannot be combined")),
      s"got: ${msgs(e)}")
  }

  test("branch scan metadata comes from the BRANCH TIP: a post-fork " +
      "rename on main must not break alias resolution of pre-rename " +
      "footers inside the branch") {
    spark.sql("DROP TABLE IF EXISTS graft.br.al")
    spark.sql("CREATE TABLE graft.br.al (k BIGINT, v BIGINT)")
    spark.sql("INSERT INTO graft.br.al SELECT id, id FROM range(0, 5, 1, 1)")
    // fork AFTER a rename, so the branch carries an alias chain
    // (val -> v) that old footers need
    spark.sql("ALTER TABLE graft.br.al RENAME COLUMN v TO val")
    val d = dir("al")
    ManifestV2.createBranch(d, "b")
    spark.range(10, 13).selectExpr("id AS k", "id AS val")
      .write.format("graft.sources.ManifestV2")
      .option("path", d).option("branch", "b").mode("append").save()
    // main renames AGAIN past the fork: main's alias map now keys on
    // 'v2', so resolving the branch's 'val' through MAIN's head would
    // miss and null-fill the pre-rename footers
    spark.sql("ALTER TABLE graft.br.al RENAME COLUMN val TO v2")
    val br = spark.read.format("graft.sources.ManifestV2")
      .option("path", d).option("branch", "b").load()
    assert(br.schema.fieldNames.toSeq == Seq("k", "val"))
    assert(br.selectExpr("CAST(SUM(val) AS BIGINT)").head().getLong(0) ==
      (0L until 5L).sum + (10L until 13L).sum,
      "pre-rename footers must decode through the BRANCH's alias chain")
  }

  test("branch time travel: VERSION AS OF '<b>@<k>' resolves the " +
      "branch's OWN chain (0 = fork base), '<b>' the tip; " +
      "branchTimestamp travels by stamp; out-of-range refuses") {
    import spark.implicits._
    spark.sql("DROP TABLE IF EXISTS graft.br.tv")
    spark.sql("CREATE TABLE graft.br.tv (k BIGINT)")
    spark.sql("INSERT INTO graft.br.tv SELECT id FROM range(0, 5, 1, 1)")
    val d = dir("tv")
    ManifestV2.createBranch(d, "b")
    def stage(lo: Long, hi: Long): Unit =
      spark.range(lo, hi).select($"id".as("k"))
        .write.format("graft.sources.ManifestV2")
        .option("path", d).option("branch", "b").mode("append").save()
    stage(100L, 104L) // ordinal 1
    val t1 = ManifestV2.branchStateAt(d, "b", 1L).get.commitTs
    Thread.sleep(20) // separate the two ordinals' stamps
    stage(200L, 203L) // ordinal 2 (tip)
    // SQL ref travel through the catalog
    def n(asOf: String): Long = spark.sql(
      s"SELECT COUNT(*) FROM graft.br.tv VERSION AS OF '$asOf'")
      .head().getLong(0)
    assert(n("b@0") == 5L, "ordinal 0 is the fork base")
    assert(n("b@1") == 9L)
    assert(n("b@2") == 12L)
    assert(n("b") == 12L, "the bare ref reads the tip")
    assert(spark.sql("SELECT COUNT(*) FROM graft.br.tv")
      .head().getLong(0) == 5L, "main stays on its own chain")
    // path-routed pinning options
    def opt(kv: (String, String)*): Long = {
      var r = spark.read.format("graft.sources.ManifestV2")
        .option("path", d).option("branch", "b")
      kv.foreach { case (k, v) => r = r.option(k, v) }
      r.load().count()
    }
    assert(opt("branchVersion" -> "1") == 9L)
    assert(opt("branchTimestamp" -> t1.toString) == 9L,
      "a stamp inside ordinal 1's window resolves to ordinal 1")
    assert(opt("branchTimestamp" -> System.currentTimeMillis().toString)
      == 12L)
    // refusals: out-of-range ordinal, combined pins, unknown ref
    val e1 = intercept[Exception] { n("b@5") }
    assert(msgs(e1).exists(_.contains("no ordinal")), s"got: ${msgs(e1)}")
    val e2 = intercept[Exception] {
      opt("branchVersion" -> "1", "branchTimestamp" -> t1.toString)
    }
    assert(msgs(e2).exists(_.contains("cannot be combined")),
      s"got: ${msgs(e2)}")
    val e3 = intercept[Exception] { n("nosuchref") }
    assert(msgs(e3).exists(_.contains("neither")), s"got: ${msgs(e3)}")
  }

  test("streaming epochs stage on a BRANCH: the replay ledger lives " +
      "in the branch state, main never moves, a checkpoint restart " +
      "duplicates nothing, and fast_forward publishes the slice") {
    import spark.implicits._
    spark.sql("DROP TABLE IF EXISTS graft.br.swb")
    spark.sql("CREATE TABLE graft.br.swb (k BIGINT)")
    spark.sql("INSERT INTO graft.br.swb SELECT id FROM range(0, 5, 1, 1)")
    val d = dir("swb")
    val mainV = ManifestV2.readManifest(Paths.get(d)).get.version
    ManifestV2.createBranch(d, "in")
    val work = java.nio.file.Files.createTempDirectory("graft_swb")
    val src = work.resolve("src").toString
    val ck = work.resolve("ck").toString
    def push(lo: Long, hi: Long): Unit =
      spark.range(lo, hi).select($"id".as("k"))
        .write.format("graft.sources.ManifestV2")
        .option("path", src).mode("append").save()
    def pump(): Unit = {
      val q = spark.readStream.format("graft.sources.ManifestV2")
        .option("path", src).load()
        .writeStream.option("checkpointLocation", ck)
        .option("branch", "in")
        .format("graft.sources.ManifestV2").option("path", d)
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    push(100L, 104L); pump() // epoch 0
    push(200L, 203L); pump() // epoch 1, same checkpoint (restart path)
    // invisible to main: pointer AND row set untouched
    assert(ManifestV2.readManifest(Paths.get(d)).get.version == mainV)
    assert(spark.sql("SELECT COUNT(*) FROM graft.br.swb")
      .head().getLong(0) == 5L)
    // the branch holds seed + both epochs exactly once; the replay
    // ledger travels in the BRANCH state
    def branchCount(): Long = spark.read
      .format("graft.sources.ManifestV2")
      .option("path", d).option("branch", "in").load().count()
    assert(branchCount() == 12L)
    assert(ManifestV2.branchState(d, "in").get.epochs.values.max == 1L)
    // publish: main gets the staged slice as one commit
    assert(ManifestV2.fastForward(d, "in") == mainV + 1L)
    assert(spark.sql("SELECT CAST(SUM(k) AS BIGINT) FROM graft.br.swb")
      .head().getLong(0) ==
      (0L until 5L).sum + (100L until 104L).sum + (200L until 203L).sum)
    // streaming UPSERT cannot stage on a branch (sidecars on carried
    // files would publish as mutations of main files)
    val e = intercept[Exception] {
      val q = spark.readStream.format("graft.sources.ManifestV2")
        .option("path", src).load()
        .writeStream
        .option("checkpointLocation", work.resolve("ck2").toString)
        .option("branch", "in").option("upsertKey", "k")
        .format("graft.sources.ManifestV2").option("path", d)
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    assert(msgs(e).exists(_.contains("upsert targets main")),
      s"got: ${msgs(e)}")
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
