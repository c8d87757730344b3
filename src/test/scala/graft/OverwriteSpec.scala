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

  test("overwrite-by-filter on an EVOLVED table: each era's files are " +
      "decided under the spec that wrote them") {
    import spark.implicits._
    spark.sql("DROP TABLE IF EXISTS graft.ow.evo")
    spark.sql("CREATE TABLE graft.ow.evo (k BIGINT, ts TIMESTAMP) " +
      "PARTITIONED BY (days(ts))")
    // era 0 (days): Apr 1 + Apr 2, four rows each at 6h spacing
    spark.sql("INSERT INTO graft.ow.evo SELECT id, " +
      "timestampadd(HOUR, CAST(id * 6 AS INT), " +
      "TIMESTAMP '2024-04-01 00:00:00') FROM range(0, 8, 1, 2)")
    spark.sql("CALL graft.system.set_partitioning(" +
      "ns => 'ow', tbl => 'evo', spec => 'hours(ts)')").collect()
    // era 1 (hours): Apr 3
    spark.sql("INSERT INTO graft.ow.evo SELECT id + 100, " +
      "timestampadd(HOUR, CAST(id * 6 AS INT), " +
      "TIMESTAMP '2024-04-03 00:00:00') FROM range(0, 4, 1, 2)")
    val before = entries("evo")
    assert(before.exists(_.stats.contains(PartTransform.PKey)) &&
      before.exists(_.stats.contains("@p1")), "need two live eras")

    // replace era-0's day 2: its files must be decided (and dropped)
    // under the DAYS conjunct they were boxed with — an hours-spec
    // conjunct against the day-valued '@p' box would silently keep
    // them (duplicate rows); era-1 files must stay decidable (no
    // spurious straddle from a conjunct on a key they don't carry)
    val keepers = before.filterNot(e =>
      e.stats.get(PartTransform.PKey).exists(
        _._1 == java.time.LocalDate.of(2024, 4, 2).toEpochDay))
      .map(_.file).toSet
    Seq((500L, java.sql.Timestamp.valueOf("2024-04-02 01:00:00")))
      .toDF("k", "ts")
      .writeTo("graft.ow.evo")
      .overwrite($"ts" >= org.apache.spark.sql.functions.lit(
        "2024-04-02 00:00:00").cast("timestamp") &&
        $"ts" < org.apache.spark.sql.functions.lit(
          "2024-04-03 00:00:00").cast("timestamp"))
    val afterA = entries("evo")
    assert(keepers.subsetOf(afterA.map(_.file).toSet),
      "files outside the condition must survive BY NAME")
    assert(spark.sql("SELECT COUNT(*) FROM graft.ow.evo").head()
      .getLong(0) == 8L + 4L - 4L + 1L) // era0 + era1 - day2 + fix
    assert(spark.sql("SELECT CAST(SUM(k) AS BIGINT) FROM graft.ow.evo " +
      "WHERE ts >= TIMESTAMP '2024-04-02 00:00:00' " +
      "AND ts < TIMESTAMP '2024-04-03 00:00:00'").head().getLong(0)
      == 500L)

    // and a day-aligned overwrite of the era-1 (hours) day still
    // decides off the '@p1' hour boxes + raw ts boxes
    Seq((600L, java.sql.Timestamp.valueOf("2024-04-03 05:00:00")))
      .toDF("k", "ts")
      .writeTo("graft.ow.evo")
      .overwrite($"ts" >= org.apache.spark.sql.functions.lit(
        "2024-04-03 00:00:00").cast("timestamp") &&
        $"ts" < org.apache.spark.sql.functions.lit(
          "2024-04-04 00:00:00").cast("timestamp"))
    assert(spark.sql("SELECT COUNT(*) FROM graft.ow.evo").head()
      .getLong(0) == 9L - 4L + 1L) // minus day3, plus its fix
    assert(spark.sql("SELECT CAST(SUM(k) AS BIGINT) FROM graft.ow.evo")
      .head().getLong(0) == (0L + 1L + 2L + 3L) + 500L + 600L)
  }

  test("overwrite-by-filter on a multi-transform (days, bucket) table: " +
      "day-aligned backfill swaps the day across every bucket") {
    import spark.implicits._
    spark.sql("DROP TABLE IF EXISTS graft.ow.mt")
    spark.sql("CREATE TABLE graft.ow.mt (uid BIGINT, ts TIMESTAMP) " +
      "PARTITIONED BY (days(ts), bucket(4, uid))")
    // two days x scattered uids
    spark.sql("INSERT INTO graft.ow.mt SELECT id, " +
      "timestampadd(HOUR, CAST((id % 8) * 6 AS INT), " +
      "TIMESTAMP '2024-06-01 00:00:00') FROM range(0, 32, 1, 2)")
    val before = entries("mt")
    val d2 = java.time.LocalDate.of(2024, 6, 2).toEpochDay
    val others = before.filterNot(
      _.stats.get(PartTransform.PKey + ".0").exists(_._1 == d2))
      .map(_.file).toSet

    Seq((7000L, java.sql.Timestamp.valueOf("2024-06-02 01:00:00")),
      (7001L, java.sql.Timestamp.valueOf("2024-06-02 02:00:00")))
      .toDF("uid", "ts")
      .writeTo("graft.ow.mt")
      .overwrite($"ts" >= org.apache.spark.sql.functions.lit(
        "2024-06-02 00:00:00").cast("timestamp") &&
        $"ts" < org.apache.spark.sql.functions.lit(
          "2024-06-03 00:00:00").cast("timestamp"))
    val after = entries("mt")
    assert(others.subsetOf(after.map(_.file).toSet),
      "day-1 files (every bucket) must survive BY NAME")
    assert(spark.sql("SELECT COUNT(*) FROM graft.ow.mt").head()
      .getLong(0) == 32L - 16L + 2L)
    assert(spark.sql("SELECT CAST(SUM(uid) AS BIGINT) FROM graft.ow.mt " +
      "WHERE ts >= TIMESTAMP '2024-06-02 00:00:00'").head().getLong(0)
      == 14001L)
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
