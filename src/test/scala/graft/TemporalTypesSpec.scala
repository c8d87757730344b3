package graft

import java.nio.file.{Files, Paths}
import java.sql.{Date, Timestamp}

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{GraftCatalog, ManifestV2}

/** TEMPORAL columns in the warehouse plane (round 12): TIMESTAMP /
  * TIMESTAMP_NTZ / DATE columns store in their internal integer form
  * (micros / days since epoch), ride the INT64/INT32 machinery end to
  * end — vectorized decode, manifest stats boxes, row-group chunk
  * statistics — and temporal FILTER LITERALS convert to the same
  * units ([[ManifestV2.boxLit]]), so the time-range predicate (THE
  * pruning predicate of a 100 TB event table) prunes whole files and
  * row groups, and boundary-aligned time-range DELETEs stay on the
  * metadata-only path. INT columns gain stats boxes by the same
  * widening.
  */
class TemporalTypesSpec extends AnyFunSuite {
  import TestSpark._

  GraftCatalog.install(spark)
  spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.tts")

  private def tmp(): String =
    Files.createTempDirectory("graft_tts").toString

  private def read(dir: String): DataFrame =
    spark.read.format("graft.sources.ManifestV2").option("path", dir).load()

  test("timestamp/date/int columns round-trip exactly, with NULLs, " +
      "through the vectorized leaf") {
    import spark.implicits._
    val dir = tmp()
    val src = Seq(
      (1L, Timestamp.valueOf("2024-01-01 00:00:00.000001"),
        Date.valueOf("2024-01-01"), 7),
      (2L, Timestamp.valueOf("2024-06-15 12:34:56.789012"),
        Date.valueOf("2024-06-15"), -3),
      (3L, null.asInstanceOf[Timestamp], null.asInstanceOf[Date],
        2147483647),
      (4L, Timestamp.valueOf("1969-12-31 23:59:59.999999"),
        Date.valueOf("1969-12-31"), 0)
    ).toDF("k", "ts", "d", "i")
    src.write.format("graft.sources.ManifestV2")
      .option("path", dir).mode("append").save()
    val back = read(dir)
    assert(back.schema("ts").dataType.typeName == "timestamp")
    assert(back.schema("d").dataType.typeName == "date")
    val plan = back.queryExecution.executedPlan.toString
    assert(plan.contains("ColumnarToRow"),
      s"temporal columns must stay on the columnar path, got:\n$plan")
    val exp = src.collect().map(_.toSeq).toSet
    val got = back.collect().map(_.toSeq).toSet
    assert(got == exp, s"round-trip drift: $got vs $exp")
  }

  test("manifest stats box temporal and int columns in internal units " +
      "(micros / days), with null counts") {
    import spark.implicits._
    val dir = tmp()
    Seq(
      (1L, Timestamp.valueOf("2024-01-02 00:00:00.0"),
        Date.valueOf("2024-01-02"), 5),
      (2L, null.asInstanceOf[Timestamp], Date.valueOf("2024-01-09"), -5)
    ).toDF("k", "ts", "d", "i")
      .coalesce(1)
      .write.format("graft.sources.ManifestV2")
      .option("path", dir).mode("append").save()
    val e = ManifestV2.readManifest(Paths.get(dir)).get.files.head
    // 2024-01-02T00:00:00Z = 19724 days; micros = days * 86_400e6
    val micros = 19724L * 86400L * 1000000L
    assert(e.stats("ts") == (micros, micros), s"ts box: ${e.stats}")
    assert(e.nulls("ts") == 1L)
    assert(e.stats("d") == (19724L, 19731L), s"d box: ${e.stats}")
    assert(e.nulls("d") == 0L)
    assert(e.stats("i") == (-5L, 5L), s"int box: ${e.stats}")
  }

  test("a pushed time-range predicate prunes whole files off manifest " +
      "boxes and row groups off chunk statistics") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val dir = tmp()
    // three time-sliced appends, each ONE sorted task with small row
    // groups: per-file boxes are disjoint ten-day windows, per-group
    // chunk boxes are disjoint sub-windows
    for (day0 <- Seq(1, 11, 21))
      spark.range(0, 20000, 1, 1)
        .select($"id", expr(
          s"timestampadd(SECOND, CAST(id * 43 AS BIGINT), " +
            s"TIMESTAMP '2024-01-$day0 00:00:00')").as("ts"))
        .sortWithinPartitions($"ts")
        .write.format("graft.sources.ManifestV2")
        .option("path", dir).option("rowGroupSize", "4096")
        .mode("append").save()
    val entries = ManifestV2.readManifest(Paths.get(dir)).get.files
    assert(entries.size == 3 && entries.forall(_.rgs.size > 2))
    val allSplits = read(dir).rdd.getNumPartitions

    // range inside the SECOND file's window: files 1 and 3 prune at
    // plan time — the filtered scan plans only file 2's row groups
    val q = read(dir).where(
      $"ts" >= lit("2024-01-12 00:00:00").cast("timestamp") &&
        $"ts" < lit("2024-01-13 00:00:00").cast("timestamp"))
    val planned = q.rdd.getNumPartitions
    val file2Groups = entries(1).rgs.size
    assert(planned == file2Groups,
      s"expected only the matching file's $file2Groups group-splits " +
        s"planned, got $planned (of $allSplits total)")

    // within file 2, groups outside the one-day sub-window skip off
    // chunk statistics — observable on the skip counter
    ManifestV2.rgStatsSkipCount.reset()
    val n = q.count()
    assert(n > 0L)
    assert(ManifestV2.rgStatsSkipCount.sum() > 0L,
      "row groups outside the time range must skip via chunk stats")
    // the skipped groups lost no rows: count matches the source rule
    val exp = spark.range(0, 20000)
      .select(expr("timestampadd(SECOND, CAST(id * 43 AS BIGINT), " +
        "TIMESTAMP '2024-01-11 00:00:00')").as("ts"))
      .where($"ts" >= lit("2024-01-12 00:00:00").cast("timestamp") &&
        $"ts" < lit("2024-01-13 00:00:00").cast("timestamp"))
      .count()
    assert(n == exp)
  }

  test("a boundary-aligned time-range DELETE is metadata-only; a " +
      "misaligned one falls back to merge-on-read") {
    spark.sql("DROP TABLE IF EXISTS graft.tts.ev")
    spark.sql("CREATE TABLE graft.tts.ev (k BIGINT, ts TIMESTAMP)")
    spark.sql("""INSERT INTO graft.tts.ev
      SELECT id, timestampadd(HOUR, CAST(id AS INT), TIMESTAMP '2024-01-01 00:00:00')
      FROM range(0, 24, 1, 1)""")
    spark.sql("""INSERT INTO graft.tts.ev
      SELECT id + 24, timestampadd(HOUR, CAST(id AS INT), TIMESTAMP '2024-01-02 00:00:00')
      FROM range(0, 24, 1, 1)""")
    val wh = spark.conf.get("spark.sql.catalog.graft.warehouse")
    def entries() = ManifestV2.readManifest(
      Paths.get(wh, "tts", "ev")).get.files
    val before = entries()
    assert(before.size == 2)
    val day1 = before.find(_.stats("k")._1 == 0L).get.file

    // aligned: the whole first day = exactly file 1's box -> the file
    // leaves the manifest in one swap; no sidecar, no rewrite
    spark.sql(
      "DELETE FROM graft.tts.ev WHERE ts < TIMESTAMP '2024-01-02 00:00:00'")
    val after = entries()
    assert(after.map(_.file) == before.map(_.file).filterNot(_ == day1),
      s"metadata delete must drop the covered file by name: $after")
    assert(after.forall(_.deletes.isEmpty))
    assert(spark.sql("SELECT COUNT(*) AS n FROM graft.tts.ev")
      .head().getLong(0) == 24L)

    // misaligned: half of day 2 -> merge-on-read sidecar, same file
    spark.sql(
      "DELETE FROM graft.tts.ev WHERE ts < TIMESTAMP '2024-01-02 12:00:00'")
    val after2 = entries()
    assert(after2.map(_.file) == after.map(_.file),
      "a misaligned temporal delete must keep the file (merge-on-read)")
    assert(after2.head.deletes.nonEmpty)
    assert(spark.sql("SELECT COUNT(*) AS n FROM graft.tts.ev")
      .head().getLong(0) == 12L)
  }

  test("MIN/MAX over timestamp and date columns are METADATA-SERVED " +
      "off manifest boxes — no data file opened") {
    import spark.implicits._
    val dir = tmp()
    Seq(
      (1L, Timestamp.valueOf("2024-01-02 03:04:05.0"),
        Date.valueOf("2024-01-02")),
      (2L, Timestamp.valueOf("2024-05-06 07:08:09.0"),
        Date.valueOf("2024-05-06")),
      (3L, null.asInstanceOf[Timestamp], Date.valueOf("2023-12-31"))
    ).toDF("k", "ts", "d")
      // ONE file: an all-null-ts file would carry no ts box and the
      // pushdown must (correctly, conservatively) refuse then
      .coalesce(1)
      .write.format("graft.sources.ManifestV2")
      .option("path", dir).mode("append").save()
    val q = read(dir).agg(
      org.apache.spark.sql.functions.min("ts").as("lo_ts"),
      org.apache.spark.sql.functions.max("ts").as("hi_ts"),
      org.apache.spark.sql.functions.max("d").as("hi_d"),
      org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("n"))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("METADATA-AGG"),
      s"temporal min/max must serve off the manifest, got:\n$plan")
    val r = q.head()
    assert(r.getTimestamp(0) == Timestamp.valueOf("2024-01-02 03:04:05.0"))
    assert(r.getTimestamp(1) == Timestamp.valueOf("2024-05-06 07:08:09.0"))
    assert(r.getDate(2) == Date.valueOf("2024-05-06"))
    assert(r.getLong(3) == 3L)
  }

  test("boxLit pins the unit contract: java.time and java.sql literal " +
      "forms convert to identical internal values") {
    val inst = java.time.Instant.parse("2024-01-02T03:04:05.123456Z")
    val viaInstant = ManifestV2.boxLit(inst).get
    val viaTimestamp = ManifestV2.boxLit(Timestamp.from(inst)).get
    assert(viaInstant == viaTimestamp)
    assert(viaInstant == 1704164645123456L)
    val ld = java.time.LocalDate.of(2024, 1, 2)
    assert(ManifestV2.boxLit(ld).contains(19724L))
    // java.sql.Date converts through the session default zone the same
    // way Spark's own filter translation produced it (UTC in tests)
    assert(ManifestV2.boxLit(Date.valueOf("2024-01-02")).contains(19724L))
    assert(ManifestV2.boxLit("not temporal").isEmpty)
  }
}
