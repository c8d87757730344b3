package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{GraftCatalog, ManifestV2, MetaTables}

/** `t.partitions` METADATA VIEW (round 15): the per-(era, tuple)
  * file/row/byte/sidecar rollup with sound min/max stats bounds —
  * what maintenance decisions (which partition to compact / expire /
  * coalesce) read. Distributed like the `files` view: segment tasks
  * parse their own metadata and a per-tuple reduce merges, so the
  * driver holds O(distinct tuples), never O(files). Driver query
  * `dsv2_partitions_meta` pins the cross-era closed form against
  * DuckDB; this spec pins `total_bytes` against the filesystem (not
  * DuckDB-reproducible), sidecar counting, and the segmented path.
  */
class PartitionsMetaSpec extends AnyFunSuite {
  import TestSpark._

  GraftCatalog.install(spark)
  spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.pm")
  private val wh = spark.conf.get("spark.sql.catalog.graft.warehouse")

  test("total_bytes is the filesystem truth and delete sidecars " +
      "count per partition") {
    spark.sql("DROP TABLE IF EXISTS graft.pm.b")
    spark.sql("""CREATE TABLE graft.pm.b (uid BIGINT, amt BIGINT)
      |PARTITIONED BY (truncate(2, uid))""".stripMargin)
    spark.sql("""INSERT INTO graft.pm.b
      |SELECT id % 4, id FROM range(0, 100, 1, 1)""".stripMargin)
    val d = Paths.get(wh, "pm", "b")
    val st = ManifestV2.readManifest(d).get
    val fsBytes = st.files.map(e => Files.size(d.resolve(e.file))).sum
    val got = spark.sql("""SELECT CAST(SUM(total_bytes) AS BIGINT),
      |CAST(SUM(file_count) AS BIGINT), CAST(SUM(row_count) AS BIGINT)
      |FROM graft.pm.b.partitions""".stripMargin).head()
    assert(got.getLong(0) == fsBytes,
      s"view bytes ${got.getLong(0)} != filesystem $fsBytes")
    assert(got.getLong(1) == st.files.size.toLong)
    assert(got.getLong(2) == 100L)

    // a positional DELETE inside one partition: its sidecar shows up
    // on THAT partition's row only
    spark.sql("DELETE FROM graft.pm.b WHERE uid = 1 AND amt = 13")
    val rows = spark.sql("""SELECT partition, delete_file_count,
      |row_count FROM graft.pm.b.partitions ORDER BY partition"""
      .stripMargin).collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("@p=0", "@p=2"))
    assert(rows.map(r => r.getString(0) -> r.getLong(1)).toMap ==
      Map("@p=0" -> 1L, "@p=2" -> 0L),
      "the sidecar lands on the deleted row's partition")
    spark.sql("DROP TABLE graft.pm.b")
  }

  test("identity-partitioned tables group by VALUE: pure files roll " +
      "up under their column tuple, mixed pre-partitioning files " +
      "stay in the null group") {
    spark.sql("DROP TABLE IF EXISTS graft.pm.id")
    spark.sql("CREATE TABLE graft.pm.id (uid BIGINT, amt BIGINT)")
    // pre-partitioning era: one MIXED file (several uid values)
    spark.sql("""INSERT INTO graft.pm.id
      |SELECT id % 3, id FROM range(0, 30, 1, 1)""".stripMargin)
    // bounded: procedure result, one row
    spark.sql("CALL graft.system.set_partitioning(" +
      "ns => 'pm', tbl => 'id', spec => 'uid')").collect()
    // identity era: the clustered write lands one PURE file per value
    spark.sql("""INSERT INTO graft.pm.id
      |SELECT id % 3, id FROM range(100, 130, 1, 1)""".stripMargin)
    val rows = spark.sql("""SELECT partition, spec_id, file_count,
      |row_count FROM graft.pm.id.partitions
      |ORDER BY partition NULLS FIRST""".stripMargin).collect()
    assert(rows.length == 4, s"null group + 3 value tuples: " +
      rows.map(_.toString).mkString(", "))
    assert(rows.head.isNullAt(0) && rows.head.getLong(1) == -1L &&
      rows.head.getLong(3) == 30L, s"mixed file: ${rows.head}")
    assert(rows.tail.map(_.getString(0)).toSeq ==
      Seq("uid=0", "uid=1", "uid=2"))
    assert(rows.tail.forall(r => r.getLong(1) == 1L &&
      r.getLong(2) == 1L && r.getLong(3) == 10L),
      s"one pure 10-row file per value under era 1: " +
        rows.tail.map(_.toString).mkString(", "))
    spark.sql("DROP TABLE graft.pm.id")
  }

  test("segmented tables roll up distributedly: segment tasks parse, " +
      "a per-tuple reduce merges, the driver holds O(tuples)") {
    val root = Files.createTempDirectory("graft_pms_")
    val schema = org.apache.spark.sql.types.StructType.fromDDL("k BIGINT")
    // 2500 entries across 3 tuples and 3 metadata segments, with a
    // k box per entry and a sidecar on tuple-0 entries
    val entries = (0 until 2500).map(i =>
      ManifestV2.FileEntry(s"staging/f$i.parquet", 2L,
        Map("@p" -> ((i % 3).toLong, (i % 3).toLong),
          "k" -> ((i.toLong, i.toLong + 1L))),
        deletes = if (i % 3 == 0) Seq(s"staging/d$i.del") else Nil))
    ManifestV2.commit(root)(_ =>
      ManifestV2.ManifestState(schema, Map.empty, entries)): Unit
    val rows = MetaTables.partitionRows(root.toString)
    assert(rows.size == 3, s"3 tuples, got ${rows.size}")
    val byPart = rows.map(r => r.head.asInstanceOf[String] -> r).toMap
    assert(byPart.keySet == Set("@p=0", "@p=1", "@p=2"))
    val p0 = byPart("@p=0")
    assert(p0(1) == 0L, "spec era 0")
    assert(p0(2) == 834L, s"files of tuple 0: ${p0(2)}") // 0,3,...,2499
    assert(p0(3) == 1668L, "2 rows per file")
    assert(p0(5) == 834L, "one sidecar per tuple-0 file")
    // sound stats rollup: k spans the tuple's full (lo, hi) range
    assert(p0(6) == "k:0:2500", s"got ${p0(6)}")
    assert(byPart("@p=1")(5) == 0L)
    assert(byPart("@p=1")(6) == "k:1:2498")
  }
}
