package graft

import java.nio.file.Paths

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{GraftCatalog, ManifestV2, PartTransform}

/** OVERWRITE semantics (round 12): the two ingest primitives layered
  * on the manifest swap —
  *
  *  - `writeTo(t).overwrite(cond)`: delete-matching + append, ONE
  *    atomic commit, with a strictly METADATA-ONLY delete half (every
  *    file box-decidable; straddlers fail loudly with the alignment
  *    rule) — the Delta replaceWhere shape, kept rewrite-free on
  *    purpose;
  *  - `writeTo(t).overwritePartitions()`: dynamic partition overwrite —
  *    exactly the partition values present in the incoming data swap
  *    out, everything else is untouched BY NAME (the daily re-ingest
  *    shape at 100 TB: yesterday's correction replaces yesterday,
  *    nothing else moves).
  */
class OverwriteSpec extends AnyFunSuite {
  import TestSpark._

  GraftCatalog.install(spark)
  spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.ow")

  private def entries(t: String) = {
    val wh = spark.conf.get("spark.sql.catalog.graft.warehouse")
    ManifestV2.readManifest(Paths.get(wh, "ow", t)).get.files
  }

  test("overwrite-by-filter, day-aligned on a days(ts) table: matching " +
      "days swap, other files keep their names") {
    import spark.implicits._
    spark.sql("DROP TABLE IF EXISTS graft.ow.ev")
    spark.sql("CREATE TABLE graft.ow.ev (k BIGINT, ts TIMESTAMP) " +
      "PARTITIONED BY (days(ts))")
    spark.sql("INSERT INTO graft.ow.ev SELECT id, " +
      "timestampadd(HOUR, CAST(id * 6 AS INT), " +
      "TIMESTAMP '2024-04-01 00:00:00') FROM range(0, 40, 1, 2)")
    val before = entries("ev")
    val untouched = before.filter(e =>
      e.stats(PartTransform.PKey)._1 !=
        java.time.LocalDate.of(2024, 4, 3).toEpochDay).map(_.file).toSet

    // replace day 3 (4 rows) with a corrected version (2 rows)
    Seq((1000L, java.sql.Timestamp.valueOf("2024-04-03 01:00:00")),
      (1001L, java.sql.Timestamp.valueOf("2024-04-03 02:00:00")))
      .toDF("k", "ts")
      .writeTo("graft.ow.ev")
      .overwrite($"ts" >= org.apache.spark.sql.functions.lit(
        "2024-04-03 00:00:00").cast("timestamp") &&
        $"ts" < org.apache.spark.sql.functions.lit(
          "2024-04-04 00:00:00").cast("timestamp"))
    val after = entries("ev")
    assert(untouched.subsetOf(after.map(_.file).toSet),
      "files outside the condition must survive BY NAME")
    assert(spark.sql("SELECT COUNT(*) FROM graft.ow.ev").head().getLong(0)
      == 40L - 4L + 2L)
    assert(spark.sql("SELECT CAST(SUM(k) AS BIGINT) FROM graft.ow.ev " +
      "WHERE ts >= TIMESTAMP '2024-04-03 00:00:00' " +
      "AND ts < TIMESTAMP '2024-04-04 00:00:00'").head().getLong(0)
      == 2001L)
  }

  test("a straddling overwrite condition fails loudly and changes " +
      "nothing") {
    import spark.implicits._
    val before = entries("ev")
    val e = intercept[Exception] {
      Seq((1L, java.sql.Timestamp.valueOf("2024-04-05 01:00:00")))
        .toDF("k", "ts")
        .writeTo("graft.ow.ev")
        .overwrite($"ts" >= org.apache.spark.sql.functions.lit(
          "2024-04-05 11:30:00").cast("timestamp"))
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("straddles")), s"got: ${msgs(e)}")
    assert(entries("ev").map(_.file) == before.map(_.file),
      "a failed overwrite must leave the manifest untouched")
  }

  test("dynamic partition overwrite on days(ts): incoming days swap, " +
      "the rest untouched by name") {
    import spark.implicits._
    spark.sql("DROP TABLE IF EXISTS graft.ow.dy")
    spark.sql("CREATE TABLE graft.ow.dy (k BIGINT, ts TIMESTAMP) " +
      "PARTITIONED BY (days(ts))")
    spark.sql("INSERT INTO graft.ow.dy SELECT id, " +
      "timestampadd(HOUR, CAST(id * 6 AS INT), " +
      "TIMESTAMP '2024-05-01 00:00:00') FROM range(0, 40, 1, 2)")
    val before = entries("dy")
    val d2 = java.time.LocalDate.of(2024, 5, 2).toEpochDay
    val others = before.filterNot(
      _.stats(PartTransform.PKey)._1 == d2).map(_.file).toSet

    // re-ingest ONLY day 2, with corrected values
    Seq((500L, java.sql.Timestamp.valueOf("2024-05-02 03:00:00")),
      (501L, java.sql.Timestamp.valueOf("2024-05-02 04:00:00")),
      (502L, java.sql.Timestamp.valueOf("2024-05-02 05:00:00")))
      .toDF("k", "ts")
      .writeTo("graft.ow.dy").overwritePartitions()
    val after = entries("dy")
    assert(others.subsetOf(after.map(_.file).toSet),
      "partitions not present in the incoming data must survive by name")
    assert(!after.map(_.file).exists(before.filter(
      _.stats(PartTransform.PKey)._1 == d2).map(_.file).toSet),
      "the incoming day's old files must be gone")
    assert(spark.sql("SELECT COUNT(*) FROM graft.ow.dy").head().getLong(0)
      == 40L - 4L + 3L)
    assert(spark.sql(
      "SELECT CAST(SUM(k) AS BIGINT) FROM graft.ow.dy " +
        "WHERE ts >= TIMESTAMP '2024-05-02 00:00:00' " +
        "AND ts < TIMESTAMP '2024-05-03 00:00:00'").head().getLong(0)
      == 1503L)
  }

  test("dynamic partition overwrite on an identity-partitioned table") {
    import spark.implicits._
    spark.sql("DROP TABLE IF EXISTS graft.ow.ib")
    spark.sql("CREATE TABLE graft.ow.ib (k BIGINT, bk BIGINT) " +
      "PARTITIONED BY (bk)")
    spark.sql("INSERT INTO graft.ow.ib SELECT id, id % 4 " +
      "FROM range(0, 400, 1, 2)")
    Seq((9000L, 2L), (9001L, 2L)).toDF("k", "bk")
      .writeTo("graft.ow.ib").overwritePartitions()
    assert(spark.sql("SELECT COUNT(*) FROM graft.ow.ib WHERE bk = 2")
      .head().getLong(0) == 2L)
    assert(spark.sql("SELECT COUNT(*) FROM graft.ow.ib").head().getLong(0)
      == 300L + 2L)
  }

  test("dynamic partition overwrite refuses an unpartitioned table") {
    import spark.implicits._
    spark.sql("DROP TABLE IF EXISTS graft.ow.up")
    spark.sql("CREATE TABLE graft.ow.up (k BIGINT)")
    spark.sql("INSERT INTO graft.ow.up SELECT id FROM range(0, 10, 1, 1)")
    val e = intercept[Exception] {
      Seq(99L).toDF("k").writeTo("graft.ow.up").overwritePartitions()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("partitioned")), s"got: ${msgs(e)}")
  }
}
