package graft

import java.nio.file.{Files, Path, Paths}
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.sources.{EqualTo, GreaterThanOrEqual, LessThanOrEqual}
import org.apache.spark.sql.types.StructType
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.ManifestV2

/** Round-11 warehouse-leaf scale mechanics, each PROVEN by observable
  * effect (skip counters, split counts, failure injection), not just
  * exercised:
  *
  *  - row-group-granular input splits off manifest metadata, for
  *    unpartitioned AND bucketed files (SPJ groups splits by key);
  *  - row-group skipping through column-chunk statistics AND footer
  *    bloom filters (the d03999d feature, now verified to skip);
  *  - `_pos`/position-delete exactness across splits and skips;
  *  - segment-envelope pruning of manifest metadata at plan time;
  *  - sidecar coalescing, positional (ordinal union) and equality
  *    (per-column value union);
  *  - equality deletes: the zero-read key-list DELETE, composing with
  *    positional deletes and compaction;
  *  - the streaming UPSERT sink (per-epoch equality sidecars keep
  *    latest-per-key);
  *  - the append-only opt-in for incremental and STREAMING reads
  *    crossing a merge-on-read delete;
  *  - NULL-soundness of "every row matches" box decisions;
  *  - entry-identity (not name) validation of replaced files, the
  *    Iceberg validateNoNewDeleteFiles shape;
  *  - expiry's grace window for unreferenced (in-flight) segments and
  *    the remove_orphans age-thresholded sweep.
  */
class RowGroupSkipSpec extends AnyFunSuite {
  import TestSpark._

  private def tmp(): String =
    Files.createTempDirectory("graft_rg").toString

  private def writeMultiRg(dir: String, n: Long): Unit = {
    import spark.implicits._
    // ONE ordered write task -> one file, many small row groups:
    // k = (id*37) % 1000 scatters values so every group's [min,max]
    // box spans nearly the full domain (stats cannot skip a point
    // probe); m = id is monotonic so group boxes on m are DISJOINT
    // (stats skip range probes). 37*27 = 999 ≡ -1 (mod 1000), so any
    // window of ≥ 28 consecutive ids wraps the modulus.
    spark.range(0, n, 1, 1)
      .select(($"id" * 37L % 1000L).as("k"), $"id".as("m"))
      .write.format("graft.sources.ManifestV2")
      .option("path", dir)
      .option("rowGroupSize", "4096")
      .mode("append").save()
  }

  private def read(dir: String): DataFrame =
    spark.read.format("graft.sources.ManifestV2").option("path", dir).load()

  private def entryOf(dir: String): ManifestV2.FileEntry = {
    val fs = ManifestV2.readManifest(Paths.get(dir)).get.files
    assert(fs.size == 1, s"expected one data file, got ${fs.map(_.file)}")
    fs.head
  }

  test("a multi-row-group file yields one input split per row group") {
    val dir = tmp()
    writeMultiRg(dir, 20000L)
    val e = entryOf(dir)
    assert(e.rgs.size > 3,
      s"expected several row groups at rowGroupSize=4096, got ${e.rgs}")
    assert(e.rgs.sum == 20000L, "row-group row counts must sum to the file")
    val df = read(dir)
    assert(df.rdd.getNumPartitions == e.rgs.size,
      "one split per row group, planned off manifest metadata alone")
    assert(df.count() == 20000L)
    // and the split plan loses/invents nothing
    val s = df.agg(org.apache.spark.sql.functions.sum("m")).head.getLong(0)
    assert(s == 19999L * 20000L / 2L)
  }

  test("column-chunk statistics skip row groups a range probe cannot hit") {
    val dir = tmp()
    writeMultiRg(dir, 20000L)
    val before = ManifestV2.rgStatsSkipCount.sum()
    // m is monotonic: every group except the one holding [100, 150]
    // has a disjoint box and is skipped WITHOUT reading a data page
    val got = read(dir).where("m >= 100 AND m <= 150")
      .select("m").collect().map(_.getLong(0)).sorted
    assert(got.toSeq == (100L to 150L),
      "skipping must not change the answer")
    assert(ManifestV2.rgStatsSkipCount.sum() > before,
      "the range probe must PROVABLY skip row groups via chunk stats")
  }

  test("footer bloom filters skip row groups on scattered-key equality") {
    val dir = tmp()
    writeMultiRg(dir, 20000L)
    val e = entryOf(dir)
    assert(e.rgs.size > 3)
    // k = (id*37) % 1000: every group's box spans ~[0, 999] (windows of
    // ≥28 ids wrap the modulus), so [min,max] stats CANNOT decide a
    // point probe — only the bloom filter can prove absence. k == 500
    // holds exactly for id ≡ 500 (mod 1000): 20 rows, clustered in a
    // few groups; the rest are bloom-skipped.
    val statsBefore = ManifestV2.rgStatsSkipCount.sum()
    val bloomBefore = ManifestV2.rgBloomSkipCount.sum()
    val got = read(dir).where("k = 500").select("m")
      .collect().map(_.getLong(0)).sorted
    assert(got.toSeq == (500L until 20000L by 1000L).toSeq,
      "bloom skipping must not change the answer")
    assert(ManifestV2.rgBloomSkipCount.sum() > bloomBefore,
      "the equality probe must PROVABLY skip row groups via the " +
        s"footer bloom filter (stats skips: ${ManifestV2.rgStatsSkipCount.sum() - statsBefore})")
  }

  test("_pos and merge-on-read deletes stay exact across splits and skips") {
    val dir = tmp()
    writeMultiRg(dir, 20000L)
    val root = Paths.get(dir)
    val e = entryOf(dir)
    // positions spanning several row groups, including group boundaries
    val dead = Seq(0L, 1L, 4095L, 4096L, 9999L, 19999L)
      .filter(_ < 20000L)
    val rel = "staging/posdel-spec.txt"
    Files.write(root.resolve(rel),
      dead.mkString("", "\n", "\n").getBytes(StandardCharsets.UTF_8))
    ManifestV2.commit(root) { cur =>
      val st = cur.get
      st.copy(files = st.files.map(f =>
        if (f.file == e.file) f.copy(deletes = Seq(rel)) else f))
    }
    val df = read(dir)
    assert(df.count() == 20000L - dead.size)
    // _pos is the ABSOLUTE ordinal: with one ordered write task,
    // m == id == ordinal, so _pos must equal m on every surviving row
    // regardless of which split served it
    val rows = df.select("m", "_pos").collect()
    assert(rows.forall(r => r.getLong(0) == r.getLong(1)),
      "_pos must stay absolute across row-group splits")
    assert(!rows.exists(r => dead.contains(r.getLong(1))),
      "deleted ordinals must not be served")
    // ... and with skipping layered on top: the probe row survives,
    // a deleted probe row does not
    assert(read(dir).where("m = 4095").count() == 0L)
    assert(read(dir).where("m = 4097").count() == 1L)
  }

  test("segment envelopes prune whole metadata segments at plan time") {
    val root = Files.createTempDirectory("graft_env")
    val schema = StructType.fromDDL("k BIGINT")
    // 5000 synthetic single-row files with point boxes -> 5 segments
    // of 1000, each with a disjoint [min,max] envelope
    val entries = (0 until 5000).map(i =>
      ManifestV2.FileEntry(s"staging/f$i.parquet", 1L,
        Map("k" -> ((i.toLong, i.toLong))), nulls = Map("k" -> 0L)))
    ManifestV2.commit(root)(_ =>
      ManifestV2.ManifestState(schema, Map.empty, entries))
    val readB = ManifestV2.segsReadCount.sum()
    val skipB = ManifestV2.segsSkippedCount.sum()
    val pruned = ManifestV2.readManifestPruned(root, -1L,
      Array(EqualTo("k", java.lang.Long.valueOf(1717L)))).get._4
    assert(ManifestV2.segsSkippedCount.sum() - skipB == 4,
      "a point probe must skip the four non-matching segment files")
    assert(ManifestV2.segsReadCount.sum() - readB == 1)
    assert(pruned.size == 1000 && pruned.exists(_.file == "staging/f1717.parquet"),
      "the surviving segment's entries are served in full (file-level " +
        "pruning happens next, in the scan)")
    // the scan builder composes both layers: 1 segment read, 1 file planned
    val sb = new graft.sources.ManifestScanBuilder(root, schema)
    sb.pushFilters(Array(EqualTo("k", java.lang.Long.valueOf(1717L))))
    val scan = sb.build()
    val parts = scan.toBatch.planInputPartitions()
    assert(parts.length == 1, s"expected 1 planned file, got ${parts.length}")
    // an UNFILTERED read still sees everything (envelopes only skip
    // when a filter proves emptiness)
    assert(ManifestV2.readManifestPruned(root, -1L, Array.empty)
      .get._4.size == 5000)
  }

  test("coalesceDeletes merges sidecars; reads are unchanged") {
    val dir = tmp()
    writeMultiRg(dir, 2000L)
    val root = Paths.get(dir)
    val e = entryOf(dir)
    // three sidecars, overlapping positions (1 appears twice)
    val cars = Seq(Seq(0L, 1L), Seq(1L, 2L), Seq(1500L)).zipWithIndex.map {
      case (poss, i) =>
        val rel = s"staging/posdel-c$i.txt"
        Files.write(root.resolve(rel),
          poss.mkString("", "\n", "\n").getBytes(StandardCharsets.UTF_8))
        rel
    }
    // plus two equality sidecars on the same column (the shape a
    // streaming upsert leaves behind, one per epoch): k=10 and k=11
    val eqCars = Seq(Seq(10L), Seq(11L)).zipWithIndex.map {
      case (vals, i) =>
        val rel = s"staging/eqdel-c$i.txt"
        Files.write(root.resolve(rel),
          ("k" +: vals.map(_.toString)).mkString("", "\n", "\n")
            .getBytes(StandardCharsets.UTF_8))
        rel
    }
    ManifestV2.commit(root) { cur =>
      val st = cur.get
      st.copy(files = st.files.map(f =>
        if (f.file == e.file) f.copy(deletes = cars ++ eqCars) else f))
    }
    assert(read(dir).count() == 1992L) // 4 positions + keys 10, 11 (2 rows each)
    val (files, before, after) = ManifestV2.coalesceDeletes(dir)
    assert((files, before, after) == ((1L, 5L, 2L)),
      s"expected 3 posdels -> 1 and 2 eqdels -> 1, got ($files, $before, $after)")
    val e2 = entryOf(dir)
    assert(e2.deletes.size == 2 &&
      e2.deletes.exists(_.contains("posdel-merged")) &&
      e2.deletes.exists(_.contains("eqdel-merged")))
    assert(read(dir).count() == 1992L, "coalescing must not change reads")
    assert(read(dir).where("k = 10 OR k = 11").count() == 0L)
    val mergedPos = Files.readAllLines(root.resolve(
      e2.deletes.find(_.contains("posdel-merged")).get))
    assert(mergedPos.size() == 4, "positions union, deduplicated, sorted")
    val mergedEq = ManifestV2.readEqDelete(root,
      e2.deletes.find(_.contains("eqdel-merged")).get)
    assert(mergedEq == (("k", Set(10L, 11L))))
    // the OLD sidecars survive on disk — the pre-coalesce snapshot
    // still references them (time travel); expiry is the reclaimer
    (cars ++ eqCars).foreach(c => assert(Files.exists(root.resolve(c)),
      s"sidecar $c is still referenced by the previous version"))
    val vPrev = ManifestV2.readManifest(root).get.version - 1
    assert(ManifestV2.readManifest(root, vPrev).get
      .files.head.deletes == cars ++ eqCars)
  }

  test("incremental reads crossing a MoR delete: fail by default, " +
      "appendonly serves exactly the files published in the range") {
    val dir = tmp()
    import spark.implicits._
    def append(lo: Long, hi: Long): Unit =
      spark.range(lo, hi, 1, 1).select($"id".as("k"), $"id".as("m"))
        .write.format("graft.sources.ManifestV2")
        .option("path", dir).mode("append").save()
    append(0L, 100L) // v1
    val root = Paths.get(dir)
    val f1 = ManifestV2.readManifest(root).get.files.head
    val rel = "staging/posdel-mor.txt"
    Files.write(root.resolve(rel),
      "7\n".getBytes(StandardCharsets.UTF_8))
    ManifestV2.commit(root) { cur => // v2: MoR delete on the v1 file
      val st = cur.get
      st.copy(files = st.files.map(f =>
        if (f.file == f1.file) f.copy(deletes = Seq(rel)) else f))
    }
    append(100L, 150L) // v3
    def inc(opts: Map[String, String]): DataFrame = {
      val r = spark.read.format("graft.sources.ManifestV2")
        .option("path", dir).option("startVersion", "1")
        .option("endVersion", "3")
      opts.foreach { case (k, v) => r.option(k, v) }
      r.load()
    }
    val ex = intercept[Exception] { inc(Map.empty).collect() }
    assert(ex.getMessage.contains("merge-on-read"),
      s"default must refuse the range, got: ${ex.getMessage}")
    val got = inc(Map("mordeletes" -> "appendonly"))
      .select("k").collect().map(_.getLong(0)).sorted
    assert(got.toSeq == (100L until 150L),
      "appendonly serves the appended files only — the carried file's " +
        "mutation is explicitly out of contract")
  }

  test("a STREAM crossing a MoR delete: fails at the offending batch " +
      "by default, appendonly keeps following the appends") {
    import spark.implicits._
    val dir = tmp()
    def append(lo: Long, hi: Long): Unit =
      spark.range(lo, hi, 1, 1).select($"id".as("k"))
        .write.format("graft.sources.ManifestV2")
        .option("path", dir).mode("append").save()
    append(0L, 5L) // v1
    val sink = tmp(); val ck = tmp()
    def run(extra: Map[String, String]): Seq[Long] = {
      val r = spark.readStream.format("graft.sources.ManifestV2")
        .option("path", dir)
      extra.foreach { case (k, v) => r.option(k, v) }
      val q = r.load()
        .writeStream.format("graft.sources.ManifestV2")
        .option("path", sink).option("checkpointLocation", ck).start()
      try q.processAllAvailable() finally q.stop()
      spark.read.format("graft.sources.ManifestV2").option("path", sink)
        .load().collect().map(_.getLong(0)).sorted.toSeq
    }
    assert(run(Map.empty) == (0L to 4L), "backfill consumes v1")
    // a MoR delete mutates the v1 file the stream already served...
    val root = Paths.get(dir)
    val f1 = ManifestV2.readManifest(root).get.files.head
    val rel = "staging/posdel-stream.txt"
    Files.write(root.resolve(rel), "3\n".getBytes(StandardCharsets.UTF_8))
    ManifestV2.commit(root) { cur =>
      val st = cur.get
      st.copy(files = st.files.map(f =>
        if (f.file == f1.file) f.copy(deletes = Seq(rel)) else f))
    }
    append(100L, 105L) // v3
    // ...so the checkpointed stream's next range (v1, v3] crosses it:
    // the default contract refuses rather than silently skip the
    // deletion the consumer already missed
    val ex = intercept[Exception] { run(Map.empty) }
    def chain(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ chain(t.getCause)
    assert(chain(ex).exists(_.contains("merge-on-read")),
      s"default stream must fail loudly: ${chain(ex).take(3)}")
    // the explicit opt-in keeps following appends (same checkpoint):
    // the already-served rows stay as served, only v3's files arrive
    assert(run(Map("mordeletes" -> "appendonly")) ==
      ((0L to 4L) ++ (100L to 104L)),
      "appendonly serves the appended files and moves on")
  }

  test("a [min,max] box never drops NULL rows: all-match decisions " +
      "require known null-free columns") {
    val e = ManifestV2.FileEntry("f", 10L, Map("k" -> ((5L, 9L))),
      nulls = Map("k" -> 2L)) // 2 null rows, non-null all in [5,9]
    val all = Array[org.apache.spark.sql.sources.Filter](
      GreaterThanOrEqual("k", java.lang.Long.valueOf(5L)))
    // every NON-NULL row matches, but the nulls do not: must NOT
    // decide "drop the whole file"
    assert(ManifestV2.decideBox(all, e).isEmpty,
      "all-match with nulls present must be undecidable")
    assert(ManifestV2.decideBox(Array(
      LessThanOrEqual("k", java.lang.Long.valueOf(4L))), e).contains(false),
      "no-match stays decidable regardless of nulls")
    val clean = e.copy(nulls = Map("k" -> 0L))
    assert(ManifestV2.decideBox(all, clean).contains(true),
      "known null-free: all-match decides")
    val legacy = e.copy(nulls = Map.empty) // pre-upgrade entry
    assert(ManifestV2.decideBox(all, legacy).isEmpty,
      "unknown null count must stay conservative")
    // null tests decide straight off the counts
    import org.apache.spark.sql.sources.{IsNotNull, IsNull}
    assert(ManifestV2.decideBox(Array(IsNull("k")), clean).contains(false))
    assert(ManifestV2.decideBox(Array(IsNotNull("k")), clean).contains(true))
    val allNull = ManifestV2.FileEntry("f", 3L, Map.empty,
      nulls = Map("k" -> 3L))
    assert(ManifestV2.decideBox(Array(IsNull("k")), allNull).contains(true))
  }

  test("replaced-file validation is by ENTRY, not name: a concurrent " +
      "MoR delete fails the rewrite instead of resurrecting rows") {
    val dir = tmp()
    import spark.implicits._
    spark.range(0, 100, 1, 1).select($"id".as("k"), $"id".as("m"))
      .write.format("graft.sources.ManifestV2")
      .option("path", dir).mode("append").save()
    val root = Paths.get(dir)
    val st = ManifestV2.readManifest(root).get
    // capture the entries a rewrite would have scanned...
    val staleEntries = st.files.map(ManifestV2.fileLine).mkString("\n")
    // ...then a merge-on-read DELETE lands a sidecar (same file NAME,
    // mutated entry) before the rewrite commits
    val rel = "staging/posdel-race.txt"
    Files.write(root.resolve(rel), "3\n".getBytes(StandardCharsets.UTF_8))
    ManifestV2.commit(root) { cur =>
      val s = cur.get
      s.copy(files = s.files.map(f => f.copy(deletes = Seq(rel))))
    }
    val ex = intercept[Exception] {
      spark.range(100, 200, 1, 1).select($"id".as("k"), $"id".as("m"))
        .write.format("graft.sources.ManifestV2")
        .option("path", dir)
        .option("replaceEntries", staleEntries)
        .mode("append").save()
    }
    def chain(t: Throwable): Seq[String] =
      if (t == null) Nil
      else Option(t.getMessage).toSeq ++ chain(t.getCause)
    assert(chain(ex).exists(_.contains("replaced or mutated")),
      s"stale entries must fail the swap, got: ${chain(ex)}")
    // the deleted row stayed deleted — nothing resurrected
    assert(read(dir).where("m = 3").count() == 0L)
    // the same rewrite with CURRENT entries succeeds
    val fresh = ManifestV2.readManifest(root).get.files
      .map(ManifestV2.fileLine).mkString("\n")
    spark.range(100, 200, 1, 1).select($"id".as("k"), $"id".as("m"))
      .write.format("graft.sources.ManifestV2")
      .option("path", dir)
      .option("replaceEntries", fresh)
      .mode("append").save()
    assert(read(dir).count() == 100L)
    assert(read(dir).agg(org.apache.spark.sql.functions.min("m"))
      .head.getLong(0) == 100L)
  }

  test("bucketed multi-row-group files: finer splits, SPJ still plans " +
      "no shuffle, reads exact") {
    import spark.implicits._
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    spark.conf.set("spark.sql.requireAllClusterKeysForCoPartition", "false")
    val schema = org.apache.spark.sql.types.StructType
      .fromDDL("k BIGINT, bk BIGINT")
    def mk(): String = {
      val dir = tmp()
      // a PARTITIONED table shell, then a clustered write with a tiny
      // rowGroupSize so each bucket file carries several row groups
      ManifestV2.commit(Paths.get(dir))(_ =>
        ManifestV2.ManifestState(schema, Map.empty, Seq.empty,
          part = Some("bk")))
      spark.range(0, 8000, 1, 4)
        .select($"id".as("k"), ($"id" % 4L).as("bk"))
        .write.format("graft.sources.ManifestV2")
        .option("path", dir).option("rowGroupSize", "4096")
        .mode("append").save()
      dir
    }
    val da = mk(); val db = mk()
    val files = ManifestV2.readManifest(Paths.get(da)).get.files
    assert(files.exists(_.rgs.size > 1),
      s"bucket files must be multi-row-group: ${files.map(_.rgs)}")
    // with bucketing off, RDD partitions == raw splits: finer than
    // files; with bucketing on, Spark GROUPS those splits by key (the
    // 4 buckets) — which is precisely the SPJ contract
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "false")
    assert(read(da).rdd.getNumPartitions > files.size,
      "row-group splits must apply to bucketed files too")
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    val a = read(da); val b = read(db)
    assert(a.rdd.getNumPartitions == 4,
      "bucketing groups the row-group splits back into the 4 buckets")
    val joined = a.as("a").join(b.as("b"),
        $"a.bk" === $"b.bk" && $"a.k" === $"b.k")
      .groupBy($"a.bk".as("bk"))
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("n"))
      .orderBy("bk")
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("hashpartitioning"),
      s"SPJ must survive row-group splits (splits group by key):\n$plan")
    val got = joined.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == (0L until 4L).map((_, 2000L)).toSeq, s"got $got")
  }

  test("equality deletes: DELETE BY KEY touches ZERO data; readers " +
      "subtract by value; position deletes and compaction compose") {
    import graft.sources.GraftCatalog
    GraftCatalog.install(spark)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.spec")
    spark.sql("DROP TABLE IF EXISTS graft.spec.eqd")
    spark.sql("CREATE TABLE graft.spec.eqd (k BIGINT, v BIGINT)")
    spark.sql("""INSERT INTO graft.spec.eqd
      |SELECT /*+ REPARTITION(1) */ id, id * 7 FROM range(0, 100, 1, 1)""".stripMargin)
    spark.sql("""INSERT INTO graft.spec.eqd
      |SELECT /*+ REPARTITION(1) */ id, id * 7 FROM range(100, 200, 1, 1)""".stripMargin)
    val dir = java.nio.file.Paths.get(
      spark.conf.get("spark.sql.catalog.graft.warehouse"), "spec", "eqd")
    val before = ManifestV2.readManifest(dir).get.files
      .map(e => (e.file, Files.size(dir.resolve(e.file)))).toMap

    // an IN-delete no box can decide: the files' k-boxes are [0,99]
    // and [100,199], and IN is not box-evaluable — yet the statement
    // must NOT scan or rewrite anything: one equality sidecar, shared
    spark.sql("DELETE FROM graft.spec.eqd WHERE k IN (5, 150, 700)")
    val st = ManifestV2.readManifest(dir).get
    assert(st.files.map(_.file).toSet == before.keySet,
      "an equality delete must not add or drop data files")
    before.foreach { case (f, sz) =>
      assert(Files.size(dir.resolve(f)) == sz,
        s"data file $f must be byte-identical after the delete") }
    val refs = st.files.flatMap(_.deletes)
    assert(refs.size == 2 && refs.distinct.size == 1 &&
      ManifestV2.isEqDelete(refs.head),
      s"one SHARED equality sidecar on both files: $refs")

    // readers subtract by value, positions stay absolute
    assert(spark.table("graft.spec.eqd").count() == 198L)
    assert(spark.sql("SELECT COUNT(*) FROM graft.spec.eqd WHERE k IN (5, 150)")
      .head().getLong(0) == 0L)
    assert(spark.sql(
      "SELECT _pos FROM graft.spec.eqd WHERE k = 6").head().getLong(0) == 6L)
    // metadata COUNT must refuse (a live count needs the values)...
    assert(!spark.sql("SELECT COUNT(*) FROM graft.spec.eqd")
      .queryExecution.executedPlan.toString.contains("METADATA-AGG"))

    // ...a position delete composes on the same files...
    spark.sql("DELETE FROM graft.spec.eqd WHERE k % 97 = 3") // k=3,100,197
    assert(spark.table("graft.spec.eqd").count() == 195L)

    // ...and compaction applies BOTH kinds and clears the references
    ManifestV2.compactSnapshot(spark, dir.toString, 1000000L)
    val after = ManifestV2.readManifest(dir).get
    assert(after.files.forall(_.deletes.isEmpty))
    assert(spark.table("graft.spec.eqd").count() == 195L)
    assert(spark.sql(
      "SELECT COUNT(*) FROM graft.spec.eqd WHERE k IN (3, 5, 100, 150)")
      .head().getLong(0) == 0L)
    spark.sql("DROP TABLE graft.spec.eqd")
  }

  test("streaming UPSERT sink: each epoch's keys kill prior versions " +
      "by equality; files provably outside stay untouched") {
    import spark.implicits._
    val src = tmp(); val sink = tmp(); val ck = tmp()
    def push(rows: Seq[(Long, Long)]): Unit =
      rows.toDF("k", "v").repartition(1)
        .write.format("graft.sources.ManifestV2")
        .option("path", src).mode("append").save()
    def run(): Unit = {
      val q = spark.readStream.format("graft.sources.ManifestV2")
        .option("path", src).load()
        .writeStream.format("graft.sources.ManifestV2")
        .option("path", sink).option("upsertKey", "k")
        .option("checkpointLocation", ck).start()
      try q.processAllAvailable() finally q.stop()
    }
    push(Seq((1L, 10L), (2L, 20L), (3L, 30L)))
    run() // epoch 0: plain backfill, nothing to kill
    push(Seq((1L, 11L), (4L, 40L)))
    run() // epoch 1: key 1 dies in the backfill file, 4 is new
    val got = spark.read.format("graft.sources.ManifestV2")
      .option("path", sink).load()
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(got == Seq((1L, 11L), (2L, 20L), (3L, 30L), (4L, 40L)),
      s"latest version per key: $got")
    // storage shape: the backfill file carries ONE equality sidecar
    // (its box [1,3] could hold incoming key 1); the epoch-1 file has
    // none (its own rows must survive their own epoch)
    val st = ManifestV2.readManifest(Paths.get(sink)).get
    val files = st.files.sortBy(_.file)
    assert(files.size == 2)
    val withDel = files.filter(_.deletes.nonEmpty)
    assert(withDel.size == 1 &&
      withDel.head.deletes.forall(ManifestV2.isEqDelete),
      s"exactly the pre-existing file carries the epoch's sidecar: $files")
    // epoch 2 touches a key held only by the FIRST file's box; both
    // files' boxes contain 2, so both get the sidecar (conservative),
    // and the read still serves exactly the latest versions
    push(Seq((2L, 22L)))
    run()
    val got2 = spark.read.format("graft.sources.ManifestV2")
      .option("path", sink).load()
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(got2 == Seq((1L, 11L), (2L, 22L), (3L, 30L), (4L, 40L)))
    // no stray task key files survive a commit
    val staged = Option(new java.io.File(sink, "staging").listFiles())
      .map(_.map(_.getName).toSeq).getOrElse(Seq.empty)
    assert(!staged.exists(_.startsWith("upkeys-")),
      s"task key files must be retired at commit: $staged")
  }

  test("upsert DELETE TOMBSTONES: a flagged key vanishes, its bytes " +
      "never land in a data file, the flag column is never stored") {
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
    push(Seq((1L, 10L, false), (2L, 20L, false), (3L, 30L, false)))
    run() // epoch 0: backfill
    // epoch 1: update k=1, TOMBSTONE k=2, insert k=4
    push(Seq((1L, 11L, false), (2L, 0L, true), (4L, 40L, false)))
    run()
    val got = spark.read.format("graft.sources.ManifestV2")
      .option("path", sink).load()
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(got == Seq((1L, 11L), (3L, 30L), (4L, 40L)),
      s"tombstoned key must vanish: $got")
    val st = ManifestV2.readManifest(Paths.get(sink)).get
    // the TABLE schema is the stream schema minus the flag
    assert(st.schema.fieldNames.toSeq == Seq("k", "v"),
      s"flag column must never be stored: ${st.schema.toDDL}")
    // epoch 1's data file holds exactly the two NON-tombstone rows —
    // the tombstone's bytes never landed (footer row count proves it)
    val files = st.files.sortBy(_.file)
    assert(files.map(_.rows).sorted == Seq(2L, 3L), s"rows: $files")
    // the epoch sidecar carries ALL THREE epoch keys (1 update,
    // 2 tombstone, 4 insert) against the backfill file
    val backfill = files.find(_.rows == 3L).get
    assert(backfill.deletes.size == 1 &&
      ManifestV2.isEqDelete(backfill.deletes.head))
    val (col, dead) = ManifestV2.readEqDelete(
      Paths.get(sink), backfill.deletes.head)
    assert(col == "k" && dead == Set(1L, 2L, 4L))
    // a tombstone-only epoch also works (kills in BOTH existing files)
    push(Seq((4L, 0L, true)))
    run()
    val got2 = spark.read.format("graft.sources.ManifestV2")
      .option("path", sink).load()
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(got2 == Seq((1L, 11L), (3L, 30L)), s"epoch-2 tombstone: $got2")
  }

  test("TYPED upsert keys: a STRING-keyed CDC stream upserts and " +
      "tombstones; the epoch sidecar is the typed v2 format") {
    import spark.implicits._
    val src = tmp(); val sink = tmp(); val ck = tmp()
    def push(rows: Seq[(String, Long, Boolean)]): Unit =
      rows.toDF("id", "v", "del").repartition(1)
        .write.format("graft.sources.ManifestV2")
        .option("path", src).mode("append").save()
    def run(): Unit = {
      val q = spark.readStream.format("graft.sources.ManifestV2")
        .option("path", src).load()
        .writeStream.format("graft.sources.ManifestV2")
        .option("path", sink).option("upsertKey", "id")
        .option("upsertDeleteCol", "del")
        .option("checkpointLocation", ck).start()
      try q.processAllAvailable() finally q.stop()
    }
    push(Seq(("a", 10L, false), ("b", 20L, false), ("c", 30L, false)))
    run() // epoch 0: backfill
    push(Seq(("a", 11L, false), ("b", 0L, true), ("d", 40L, false)))
    run() // epoch 1: update a, tombstone b, insert d
    val got = spark.read.format("graft.sources.ManifestV2")
      .option("path", sink).load()
      .collect().map(r => (r.getString(0), r.getLong(1))).sorted.toSeq
    assert(got == Seq(("a", 11L), ("c", 30L), ("d", 40L)),
      s"string-keyed latest state: $got")
    // the epoch sidecar is typed v2 (no stats box for strings, so it
    // attaches to the backfill file conservatively)
    val st = ManifestV2.readManifest(Paths.get(sink)).get
    val backfill = st.files.find(_.deletes.nonEmpty).get
    val header = Files.readAllLines(
      Paths.get(sink).resolve(backfill.deletes.head),
      StandardCharsets.UTF_8).get(0)
    assert(header == "id:string", header)
  }

  test("TYPED upsert keys: a COMPOSITE (string, bigint) key kills " +
      "exactly its tuple; BIGINT components still box-probe") {
    import spark.implicits._
    val src = tmp(); val sink = tmp(); val ck = tmp()
    def push(rows: Seq[(String, Long, Long)]): Unit =
      rows.toDF("g", "id", "v").repartition(1)
        .write.format("graft.sources.ManifestV2")
        .option("path", src).mode("append").save()
    def run(): Unit = {
      val q = spark.readStream.format("graft.sources.ManifestV2")
        .option("path", src).load()
        .writeStream.format("graft.sources.ManifestV2")
        .option("path", sink).option("upsertKey", "g,id")
        .option("checkpointLocation", ck).start()
      try q.processAllAvailable() finally q.stop()
    }
    // (g1,1) and (g2,1) share the id; only the full tuple may die
    push(Seq(("g1", 1L, 10L), ("g1", 2L, 20L), ("g2", 1L, 30L)))
    run()
    push(Seq(("g1", 1L, 11L)))
    run()
    val got = spark.read.format("graft.sources.ManifestV2")
      .option("path", sink).load()
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .sorted.toSeq
    assert(got == Seq(("g1", 1L, 11L), ("g1", 2L, 20L), ("g2", 1L, 30L)),
      s"composite-keyed latest state: $got")
    // BIGINT component box probe: an epoch whose id lies outside the
    // backfill file's id box must leave it sidecar-free
    push(Seq(("g9", 100L, 990L)))
    run()
    val st = ManifestV2.readManifest(Paths.get(sink)).get
    // the 3-row backfill file: it took epoch 1's sidecar (id 1 in its
    // box) but must NOT take epoch 2's (id 100 outside [1,2])
    val bf = st.files.find(_.rows == 3L).get
    assert(bf.deletes.size == 1,
      s"the out-of-box epoch must not attach to the backfill: ${st.files
        .map(e => (e.file, e.rows, e.deletes.size))}")
  }

  test("remove_orphans reclaims unreferenced files past the age " +
      "threshold; referenced and young files are untouchable") {
    val dir = tmp()
    import spark.implicits._
    spark.range(0, 100, 1, 2).select($"id".as("k"))
      .write.format("graft.sources.ManifestV2")
      .option("path", dir).mode("append").save()
    val root = Paths.get(dir)
    val live = ManifestV2.readManifest(root).get.files.map(_.file)
    // orphans a crashed job / lost CAS would leave behind
    val orphData = root.resolve("staging/part-crashed-orphan.parquet")
    Files.write(orphData, Array[Byte](1, 2, 3))
    val orphSeg = root.resolve("seg.deadbeef-0000-0000-0000-000000000000.txt")
    Files.write(orphSeg, "staging/x.parquet\t1\n".getBytes(StandardCharsets.UTF_8))
    // young orphans survive (may belong to an in-flight job)...
    assert(ManifestV2.removeOrphans(dir).isEmpty)
    assert(Files.exists(orphData) && Files.exists(orphSeg))
    // ...aged orphans are reclaimed; live files never are
    val got = ManifestV2.removeOrphans(dir, olderThanMs = -1L)
    assert(got.toSet == Set("staging/part-crashed-orphan.parquet",
      orphSeg.getFileName.toString), s"got $got")
    assert(!Files.exists(orphData) && !Files.exists(orphSeg))
    live.foreach(f => assert(Files.exists(root.resolve(f)),
      s"live file $f must never be swept"))
    assert(read(dir).count() == 100L)
  }

  test("expiry spares young unreferenced segments (in-flight commits) " +
      "and reclaims them only past the grace window") {
    val root = Files.createTempDirectory("graft_exp")
    val schema = StructType.fromDDL("k BIGINT")
    def entries(from: Int, until: Int) = (from until until).map(i =>
      ManifestV2.FileEntry(s"staging/f$i.parquet", 1L))
    ManifestV2.commit(root)(_ =>
      ManifestV2.ManifestState(schema, Map.empty, entries(0, 100)))
    // an orphan segment, as a commit IN FLIGHT would have just written
    // (segments land before the version-file CAS)
    val orphan = root.resolve("seg.00000000-feed-face-dead-beefdeadbeef.txt")
    Files.write(orphan, "staging/inflight.parquet\t1\n"
      .getBytes(StandardCharsets.UTF_8))
    ManifestV2.expireSnapshots(root.toString, keepLast = 1)
    assert(Files.exists(orphan),
      "a young unreferenced segment may belong to an in-flight commit " +
        "— the default grace window must spare it")
    ManifestV2.expireSnapshots(root.toString, keepLast = 1,
      orphanGraceMs = -1L)
    assert(!Files.exists(orphan),
      "past the grace window an unreferenced segment is a lost-CAS " +
        "orphan and is reclaimed")
  }
}
