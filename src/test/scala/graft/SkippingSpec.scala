package graft

import graft.operators.{Dedup, RuntimeFilter}
import graft.sources.DataSkipping
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Data-skipping layer: zone-map file pruning must actually skip files
  * (not just filter rows) and stay lossless; the Bloom runtime-filter
  * join must cut the fact side before its shuffle and return exactly
  * the plain join's rows.
  */
class SkippingSpec extends AnyFunSuite {
  import TestSpark._

  test("zone map skips non-overlapping files and read is lossless") {
    import spark.implicits._
    val path = DataSkipping.zoneLayout(spark, sf)
    val (rows, filesRead, filesTotal) = DataSkipping.zoneMapRead(
      spark, path, DataSkipping.QueryLoNs, DataSkipping.QueryHiNs)
    // one week of a 30-day range-clustered layout: most files skipped
    assert(filesTotal >= DataSkipping.ZoneFiles / 2,
      s"layout produced only $filesTotal files")
    assert(filesRead < filesTotal,
      s"no files skipped ($filesRead of $filesTotal read)")
    assert(filesRead * 2 <= filesTotal,
      s"expected <= half the files for a 7/30-day window, read $filesRead/$filesTotal")
    // lossless: identical rows to the full-scan filter
    val full = spark.read.parquet(path)
      .filter($"ts" >= DataSkipping.QueryLoNs && $"ts" < DataSkipping.QueryHiNs)
    assert(rows.count() === full.count())
    assert(rows.join(full, Seq("event_id"), "left_anti").count() === 0L)
    assert(full.join(rows, Seq("event_id"), "left_anti").count() === 0L)
  }

  test("zone map stats: per-file spans are disjoint under range clustering " +
    "and cover every row") {
    import spark.implicits._
    val path = DataSkipping.zoneLayout(spark, sf)
    val zones = DataSkipping.zoneMapOf(spark, path)
      .orderBy($"min_ts").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(zones.forall { case (mn, mx, n) => mn <= mx && n > 0 })
    zones.sliding(2).foreach {
      case Array((_, mx1, _), (mn2, _, _)) =>
        assert(mx1 <= mn2, "range-clustered file spans must not interleave")
      case _ =>
    }
    assert(zones.map(_._3).sum === Tables.events(spark, sf).count())
  }

  test("bloom runtime filter: fact side shrinks before the shuffle and " +
    "the reduced join equals the plain join") {
    import spark.implicits._
    val dim = RuntimeFilter.dimOrders(spark, sf)
    val fact = Tables.lineitem(spark, sf)
    // survivor fraction: true matches (~5%) + ~1% false positives
    val bitset = Dedup.bloomWordsOf(
      dim.select(Dedup.hash60(concat(lit("rf:"), $"o_orderkey".cast("string"))).as("h")),
      RuntimeFilter.RfBits)
    val total = fact.count()
    val survivors = fact.filter(Dedup.bloomHit(bitset,
      Dedup.hash60(concat(lit("rf:"), $"l_orderkey".cast("string"))),
      RuntimeFilter.RfBits)).count()
    assert(survivors < total / 4,
      s"bloom prefilter kept $survivors of $total fact rows — no reduction")
    // lossless: bit-identical rows to the unreduced join
    val reduced = RuntimeFilter.bloomReducedRevenueOf(dim, fact)
    val plain = fact
      .join(dim, $"l_orderkey" === $"o_orderkey")
      .groupBy($"o_orderkey", $"o_orderdate")
      .agg(sum(Fx.dec2($"l_extendedprice") * (Fx.one - Fx.rate2($"l_discount")))
          .cast("double").as("revenue"),
        count(lit(1)).as("n_lines"))
      .select($"o_orderkey", $"o_orderdate".cast("date").as("o_orderdate"),
        $"revenue", $"n_lines")
    assert(reduced.exceptAll(plain).count() === 0L)
    assert(plain.exceptAll(reduced).count() === 0L)
    assert(reduced.count() > 0L)
  }

  test("incremental zone map: delta stats come from new files only and " +
    "merged stats equal a from-scratch rebuild") {
    import spark.implicits._
    val out = graft.sources.Sources.scratchDir(spark, "zonemap_incr_spec")
    val ev = Tables.events(spark, sf)
      .select($"event_id", $"ts", $"user_id", $"value")
    ev.filter($"event_id" % 5 =!= 0)
      .repartitionByRange(8, $"ts").sortWithinPartitions($"ts")
      .write.mode("overwrite").parquet(out)
    val baseFiles = DataSkipping.listFiles(out)
    val baseStats = DataSkipping
      .zoneMapOfFiles(spark, baseFiles.toSeq.sorted).localCheckpoint()
    ev.filter($"event_id" % 5 === 0)
      .repartitionByRange(4, $"ts").sortWithinPartitions($"ts")
      .write.mode("append").parquet(out)
    val newFiles = (DataSkipping.listFiles(out) -- baseFiles).toSeq.sorted
    assert(newFiles.nonEmpty && newFiles.size <= 4)
    assert(baseFiles.intersect(newFiles.toSet).isEmpty)
    val merged = baseStats
      .unionByName(DataSkipping.zoneMapOfFiles(spark, newFiles))
    val rebuild = DataSkipping.zoneMapOf(spark, out)
    def asSet(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    assert(asSet(merged) === asSet(rebuild),
      "incrementally maintained stats must equal a full rebuild")
  }

  test("per-file bloom index: point lookups skip files losslessly") {
    import spark.implicits._
    val path = DataSkipping.zoneLayout(spark, sf)
    val index = DataSkipping.bloomFileIndexOf(spark, path)
    val keep = DataSkipping.bloomPlanFiles(index, DataSkipping.TargetEventIds)
    // 3 target rows over >= 8 files at sf0.001 (~62 rows/file, fp ~ 0):
    // most files must be skipped
    assert(index.size >= DataSkipping.ZoneFiles / 2)
    assert(keep.size < index.size,
      s"no files skipped (${keep.size} of ${index.size})")
    // lossless: planned files contain every target row
    val got = DataSkipping.bloomFileSkip(spark, sf)
      .select($"event_id").as[Long].collect().sorted.toSeq
    val want = Tables.events(spark, sf)
      .filter($"event_id".isin(
        DataSkipping.TargetEventIds.map(java.lang.Long.valueOf): _*))
      .select($"event_id").as[Long].collect().sorted.toSeq
    assert(got === want && got.nonEmpty)
  }

  test("json corrupt recovery: quarantine count is exact and good rows " +
    "pass through typed") {
    import spark.implicits._
    val got = graft.sources.Sources.jsonCorruptRecovery(spark, sf).collect()
    val sentinel = got.filter(_.getLong(0) == -1L)
    assert(sentinel.length === 1)
    val nCorrupt = Tables.events(spark, sf)
      .filter($"event_id" % 37 === 0).count()
    assert(sentinel.head.getLong(1) === nCorrupt && nCorrupt > 0)
    assert(got.length - 1 ===
      (Tables.events(spark, sf).count() - nCorrupt).toInt)
  }

  test("z-order layout: a user-prefix query prunes files on the NON-" +
    "leading dimension, and the read is lossless") {
    import spark.implicits._
    val out = graft.sources.Sources.scratchDir(spark, "zorder_skip_spec")
    val ev = Tables.events(spark, sf)
      .select($"event_id", $"ts", $"user_id", $"value",
        org.apache.spark.sql.functions.expr("ts div 3600000000000").as("hour"))
    val s = ev.agg(
      org.apache.spark.sql.functions.max($"user_id"),
      org.apache.spark.sql.functions.min($"hour"),
      org.apache.spark.sql.functions.max($"hour")).first()
    val (maxU, h0, h1) = (s.getLong(0), s.getLong(1), s.getLong(2))
    val span = math.max(h1 - h0, 1L)
    graft.sources.ZOrder.zorderWrite(
      ev.select($"event_id", $"user_id",
        org.apache.spark.sql.functions.expr(s"user_id * 65535 div $maxU").as("unorm"),
        org.apache.spark.sql.functions.expr(s"(hour - $h0) * 65535 div $span").as("hnorm")),
      "unorm", "hnorm", out, 16)
    val hiUser = maxU / 8
    val zones = DataSkipping.zoneMapOf(spark, out, "user_id").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val keep = zones.filter(_._2 <= hiUser)
    assert(zones.length >= 8, s"layout produced only ${zones.length} files")
    assert(keep.length * 2 <= zones.length,
      s"user-prefix box should prune >= half the z-ordered files " +
        s"(kept ${keep.length}/${zones.length})")
    // lossless through the driver query
    val got = graft.sources.DataSkipping.zorderSkip(spark, sf)
    val want = Tables.events(spark, sf).filter($"user_id" <= hiUser)
    assert(got.count() === want.count() && got.count() > 0)
  }

  test("bloom has no false negatives: every dim key probes true") {
    import spark.implicits._
    val dim = RuntimeFilter.dimOrders(spark, sf)
    val keys = dim.select(
      Dedup.hash60(concat(lit("rf:"), $"o_orderkey".cast("string"))).as("h"))
    val bitset = Dedup.bloomWordsOf(keys, RuntimeFilter.RfBits)
    val missed = keys.filter(
      !Dedup.bloomHit(bitset, $"h", RuntimeFilter.RfBits)).count()
    assert(missed === 0L)
  }
}
