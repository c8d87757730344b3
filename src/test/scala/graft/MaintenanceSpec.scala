package graft

import graft.sources.Maintenance
import org.apache.spark.sql.functions.{lit, when}
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** Partition-scoped MERGE: correctness of the merged table AND the
  * physical guarantee that untouched partitions' files are not
  * rewritten (byte-identical on disk).
  */
class MaintenanceSpec extends AnyFunSuite {
  import TestSpark._

  test("incremental join view: maintained Δ-join equals the from-scratch " +
    "join and stale dim values are gone") {
    import spark.implicits._
    val got = Maintenance.incrementalJoinView(spark, sf)
    val dim = Tables.customer(spark, sf).select($"c_custkey",
      org.apache.spark.sql.functions.when(
          $"c_custkey" % Maintenance.DimUpdateMod === 0,
          org.apache.spark.sql.functions.concat($"c_name",
            org.apache.spark.sql.functions.lit(" v2")))
        .otherwise($"c_name").as("c_name"),
      $"c_mktsegment")
    val want = Tables.orders(spark, sf)
      .select($"o_orderkey", $"o_custkey", $"o_totalprice",
        $"o_orderdate".cast("date").as("o_orderdate"))
      .join(dim, $"o_custkey" === $"c_custkey")
      .select($"o_orderkey", $"o_custkey", $"c_name", $"c_mktsegment",
        $"o_totalprice", $"o_orderdate")
    assert(got.count() === want.count())
    assert(got.exceptAll(want).count() === 0L)
    assert(want.exceptAll(got).count() === 0L)
    // dim updates were actually exercised and applied
    assert(got.filter($"c_name".endsWith(" v2")).count() > 0L)
    assert(got.filter($"o_custkey" % Maintenance.DimUpdateMod === 0 &&
      !$"c_name".endsWith(" v2")).count() === 0L,
      "no stale pre-update name may survive for an updated customer")
  }

  /** (relative-path -> file bytes) snapshot of every parquet file under
    * a partition dir tree, ignoring _SUCCESS and CRCs.
    */
  private def snapshot(root: String): Map[String, Seq[Byte]] =
    Files.walk(Paths.get(root)).iterator().asScala
      .filter(p => Files.isRegularFile(p) && p.toString.endsWith(".parquet"))
      .map(p => Paths.get(root).relativize(p).toString ->
        Files.readAllBytes(p).toSeq)
      .toMap

  test("merge applies upserts+deletes; untouched partitions byte-identical") {
    import spark.implicits._
    val path = Files.createTempDirectory("graft_merge_spec").toString + "/t"
    // 64 docs over 16 partitions (part = doc_id % 16): 4 rows each
    val v1 = (0L until 64L).map(i => (i, s"text-$i")).toDF("doc_id", "text")
    v1.select($"doc_id", $"text", ($"doc_id" % 16).cast("int").as("part"))
      .write.partitionBy("part").parquet(path)
    val before = snapshot(path)

    // touch partitions 1 (update doc 17), 2 (delete doc 2), 5 (insert doc 101)
    val upserts = Seq((17L, "text-17-v2"), (101L, "text-101"))
      .toDF("doc_id", "text")
    val deletes = Seq(Tuple1(2L)).toDF("doc_id")
    val affected = Maintenance.mergeApply(spark, path, upserts, deletes)
    assert(affected == Seq(1, 2, 5))

    val after = snapshot(path)
    val untouchedBefore = before.view.filterKeys(k =>
      !affected.exists(p => k.contains(s"part=$p/"))).toMap
    val untouchedAfter = after.view.filterKeys(k =>
      !affected.exists(p => k.contains(s"part=$p/"))).toMap
    assert(untouchedBefore.nonEmpty)
    assert(untouchedAfter == untouchedBefore,
      "files outside affected partitions must not be rewritten")

    // logical result: 64 - 1 deleted + 1 inserted, doc 17 updated
    val got = spark.read.parquet(path)
      .select($"doc_id", $"text").as[(Long, String)].collect().toMap
    assert(got.size == 64)
    assert(!got.contains(2L))
    assert(got(17L) == "text-17-v2")
    assert(got(101L) == "text-101")
    assert(got(3L) == "text-3", "unrelated rows unchanged")
  }

  test("fingerprint: partition-layout independent, content sensitive") {
    import spark.implicits._
    val rows = (0L until 40L).map(i => (i, s"body-$i", (i % 4).toInt))
      .toDF("doc_id", "text", "part")
    val fp = Maintenance.fingerprintOf(rows).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    assert(fp.length == 4 && fp.forall(_._2 == 10L))
    // XOR is order/partitioning independent: a reshuffled layout agrees
    val fp2 = Maintenance.fingerprintOf(rows.repartition(7)).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    assert(fp.sortBy(_._1).toSeq == fp2.sortBy(_._1).toSeq)
    // one changed row flips exactly its partition's fingerprint
    val mutated = rows.withColumn("text",
      when($"doc_id" === 6L, lit("EDITED")).otherwise($"text"))
    val fp3 = Maintenance.fingerprintOf(mutated).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    val diff = fp.sortBy(_._1).zip(fp3.sortBy(_._1))
      .filter { case (a, b) => a != b }.map(_._1._1)
    assert(diff.toSeq == Seq(2), s"only part 2 (doc 6) may differ: ${diff.toSeq}")
  }

  test("merge read is partition-pruned to the affected set") {
    import spark.implicits._
    val path = Files.createTempDirectory("graft_merge_prune").toString + "/t"
    (0L until 32L).map(i => (i, s"t$i")).toDF("doc_id", "text")
      .select($"doc_id", $"text", ($"doc_id" % 16).cast("int").as("part"))
      .write.partitionBy("part").parquet(path)
    // the pruned-read shape mergeApply builds internally
    val pruned = spark.read.parquet(path)
      .filter($"part".isin(1, 5))
    val scan = pruned.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters") && scan.contains("part"),
      s"partition filter must reach the scan:\n$scan")
    assert(pruned.count() == 4, "2 partitions x 2 rows")
  }

  test("snapshot publish: v1 stays byte-identical and readable via its " +
    "own manifest after v2 lands; CURRENT flips atomically to v2") {
    import spark.implicits._
    val path = Files.createTempDirectory("graft_snap_spec").toString + "/t"
    val v1 = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("doc_id", "text")
    assert(Maintenance.publishSnapshot(spark, path, v1) == 1)
    val bytesBefore = snapshot(path + "/data/snap-1")
    val v2 = Seq((1L, "a"), (3L, "c2"), (4L, "d")).toDF("doc_id", "text")
    assert(Maintenance.publishSnapshot(spark, path, v2) == 2)
    // time travel: v1 via its own manifest, exactly as published
    val r1 = Maintenance.readSnapshot(spark, path, Some(1))
      .as[(Long, String)].collect().toSet
    assert(r1 == Set((1L, "a"), (2L, "b"), (3L, "c")))
    // immutability: no file of snapshot 1 was touched by publish 2
    assert(snapshot(path + "/data/snap-1") == bytesBefore)
    // the pointer reads v2
    assert(Maintenance.currentVersion(path).contains(2))
    val cur = Maintenance.readSnapshot(spark, path)
      .as[(Long, String)].collect().toSet
    assert(cur == Set((1L, "a"), (3L, "c2"), (4L, "d")))
    // no torn pointer scratch left behind
    assert(!Files.list(Paths.get(path)).iterator().asScala
      .exists(_.getFileName.toString.startsWith("CURRENT.tmp")))
  }

  test("snapshot expiry: oldest versions beyond the retention drop, " +
    "retained versions stay fully readable, CURRENT survives") {
    import spark.implicits._
    val path = Files.createTempDirectory("graft_expire_spec").toString + "/t"
    for (v <- 1 to 3)
      Maintenance.publishSnapshot(spark, path,
        Seq((v.toLong, s"v$v")).toDF("doc_id", "text"))
    assert(Maintenance.expireSnapshots(path, keepLast = 2) == Seq(1))
    // v1 is gone at manifest resolution (fail fast, not half-read)
    intercept[Exception] { Maintenance.readSnapshot(spark, path, Some(1)).collect() }
    assert(!Files.exists(Paths.get(path, "data/snap-1")))
    // v2 and v3 read exactly as published
    assert(Maintenance.readSnapshot(spark, path, Some(2))
      .as[(Long, String)].collect().toSeq == Seq((2L, "v2")))
    assert(Maintenance.currentVersion(path).contains(3))
    assert(Maintenance.readSnapshot(spark, path)
      .as[(Long, String)].collect().toSeq == Seq((3L, "v3")))
    // idempotent: nothing further to expire
    assert(Maintenance.expireSnapshots(path, keepLast = 2).isEmpty)
  }

  test("incremental agg: base+delta merge equals the from-scratch " +
    "aggregate for ANY cutoff (algebraic-state contract)") {
    import spark.implicits._
    import org.apache.spark.sql.functions.expr
    val ev = Tables.events(spark, sf)
    val full = Maintenance.incrementalAggOf(
        Maintenance.aggPartial(ev), Maintenance.aggPartial(ev).limit(0))
      .collect().map(_.toSeq).toSet
    // three different cutovers, including degenerate all-base/all-delta
    for (frac <- Seq(0L, 1705795200000000L, Long.MaxValue)) {
      val base = Maintenance.aggPartial(ev.filter(expr("ts div 1000") <= frac))
      val delta = Maintenance.aggPartial(ev.filter(expr("ts div 1000") > frac))
      val merged = Maintenance.incrementalAggOf(base, delta)
        .collect().map(_.toSeq).toSet
      assert(merged == full, s"cutoff $frac diverges from scratch")
    }
  }

  test("compaction's cluster columns group EXACTLY like the writer's " +
      "derivation — UTC and floored, incl. pre-epoch rows") {
    import graft.sources.{ManifestV2, PartTransform}
    import org.apache.spark.sql.functions._
    // timestamps straddling the epoch and month/day boundaries
    val micros = Seq(-1L, 0L, 1L, -86400000000L - 1L, -86400000000L,
      1717286399999999L, 1717286400000000L, // 2024-06-01 23:59/06-02 00:00Z
      -2678400000000L, -2678400000001L) // 1969-12-01 00:00Z and 1 µs before
    val df = spark.range(micros.size.toLong).select(
      timestamp_micros(element_at(lit(micros.toArray),
        (col("id") + 1).cast("int"))).as("ts"),
      element_at(lit(micros.toArray), (col("id") + 1).cast("int")).as("v"))
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("ts",
        org.apache.spark.sql.types.TimestampType),
      org.apache.spark.sql.types.StructField("v",
        org.apache.spark.sql.types.LongType)))
    val specs = Seq(PartTransform.Days("ts"), PartTransform.Hours("ts"),
      PartTransform.Months("ts"), PartTransform.Trunc(7000000L, "v"))
    val cols = specs.map(s =>
      ManifestV2.compactClusterCol(spark, s, schema).cast("long"))
    val got = df.select(col("v") +: cols: _*).collect()
      .map(r => (r.getLong(0), r.toSeq.drop(1).map(_.asInstanceOf[Long])))
      .toMap
    for (us <- micros) {
      val want = Seq(
        PartTransform.daysOfMicros(us), PartTransform.hoursOfMicros(us),
        PartTransform.monthsOfDays(PartTransform.daysOfMicros(us)),
        PartTransform.truncLong(7000000L, us))
      assert(got(us) == want, s"micros $us: got ${got(us)}, want $want")
    }
  }

  test("SCOPED compaction rewrites only fragments whose stats box " +
      "intersects the bound — out-of-range files stay byte-identical") {
    import graft.sources.{GraftCatalog, ManifestV2}
    GraftCatalog.install(spark)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.mn")
    spark.sql("DROP TABLE IF EXISTS graft.mn.sc")
    spark.sql("CREATE TABLE graft.mn.sc (k BIGINT)")
    // three disjoint-range fragment pairs: [0,99], [1000,1099],
    // [2000,2099] — each range lands as 2 small files
    Seq(0L, 1000L, 2000L).foreach { base =>
      spark.sql("INSERT INTO graft.mn.sc SELECT /*+ REPARTITION(2) */ " +
        s"id + $base FROM range(0, 100, 1, 2)")
    }
    val wh = spark.conf.get("spark.sql.catalog.graft.warehouse")
    val d = Paths.get(wh, "mn", "sc")
    val before = ManifestV2.readManifest(d).get.files
    assert(before.size == 6, s"expected 6 fragments, got ${before.size}")
    val outside = before.filter(e =>
      e.stats("k")._1 >= 1000L).map(_.file).toSet
    // scope to the first range only
    val r = spark.sql("CALL graft.system.compact(ns => 'mn', " +
      "tbl => 'sc', max_rows => 1000000, " +
      "where_col => 'k', lo => 0, hi => 99)").head()
    assert(r.getLong(0) == 2L && r.getLong(1) == 1L &&
      r.getLong(2) == 100L, s"got $r")
    val after = ManifestV2.readManifest(d).get.files
    assert(after.map(_.file).toSet.intersect(outside) == outside,
      "out-of-scope files must survive untouched")
    assert(spark.sql("SELECT CAST(SUM(k) AS BIGINT) FROM graft.mn.sc")
      .head().getLong(0) ==
      Seq(0L, 1000L, 2000L).map(b => (0L until 100L).map(_ + b).sum).sum)
    // the unscoped pass then picks up the rest
    val r2 = spark.sql("CALL graft.system.compact(ns => 'mn', " +
      "tbl => 'sc', max_rows => 1000000)").head()
    assert(r2.getLong(0) == 5L && r2.getLong(1) == 1L, s"got $r2")
    // an unknown scope column refuses
    val e = intercept[Exception] {
      spark.sql("CALL graft.system.compact(ns => 'mn', tbl => 'sc', " +
        "max_rows => 10, where_col => 'nope', lo => 0, hi => 1)")
        .collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("not a column")), s"got: ${msgs(e)}")
  }
}
