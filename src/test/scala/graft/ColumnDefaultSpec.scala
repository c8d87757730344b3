package graft

import java.nio.file.Paths

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.ManifestV2

/** ADD COLUMN ... DEFAULT (round 14 — the Iceberg v3 initial-default
  * shape): the default lands in the manifest header, pre-add files
  * serve it from the LEAF (existence default, zero rewrite), and
  * INSERTs omitting the column are filled by the analyzer from the
  * CURRENT_DEFAULT metadata the table advertises. The default follows
  * renames, re-types under widening, and leaves with DROP.
  */
class ColumnDefaultSpec extends AnyFunSuite {
  import TestSpark._

  graft.sources.GraftCatalog.install(spark)
  spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.cd")
  private val wh = spark.conf.get("spark.sql.catalog.graft.warehouse")

  private def msgs(t: Throwable): Seq[String] =
    if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)

  test("existence defaults end to end: pre-add files serve the " +
      "default, an omitting INSERT is analyzer-filled, filters and " +
      "projections see the value, time travel sees the old schema") {
    spark.sql("DROP TABLE IF EXISTS graft.cd.t")
    spark.sql("CREATE TABLE graft.cd.t (k BIGINT)")
    spark.sql("INSERT INTO graft.cd.t SELECT id FROM range(0, 10, 1, 1)")
    val d = Paths.get(wh, "cd", "t").toString
    val preV = ManifestV2.readManifest(Paths.get(d)).get.version

    spark.sql("ALTER TABLE graft.cd.t ADD COLUMN region STRING " +
      "DEFAULT 'emea'")
    spark.sql("ALTER TABLE graft.cd.t ADD COLUMN score BIGINT DEFAULT 7")
    // metadata-only: zero files rewritten
    val st = ManifestV2.readManifest(Paths.get(d)).get
    assert(st.defaults == Map("region" -> "emea", "score" -> "7"))

    // pre-add rows serve the defaults (leaf-level, both columns)
    assert(spark.sql("SELECT COUNT(*) FROM graft.cd.t " +
      "WHERE region = 'emea' AND score = 7").head().getLong(0) == 10L)
    // single-column projection of a defaulted column over a pre-add
    // file exercises the count-only decode path
    assert(spark.sql("SELECT CAST(SUM(score) AS BIGINT) FROM graft.cd.t")
      .head().getLong(0) == 70L)

    // an INSERT omitting score gets the analyzer fill; region is real
    spark.sql("INSERT INTO graft.cd.t (k, region) VALUES (100, 'amer')")
    assert(spark.sql("SELECT score FROM graft.cd.t WHERE k = 100")
      .head().getLong(0) == 7L)
    assert(spark.sql("SELECT COUNT(*) FROM graft.cd.t " +
      "WHERE region = 'emea'").head().getLong(0) == 10L)

    // time travel to the pre-add version: the column does not exist
    assert(!spark.sql(s"SELECT * FROM graft.cd.t VERSION AS OF $preV")
      .schema.fieldNames.contains("region"))
  }

  test("defaults follow RENAME, re-type under WIDENING, and leave " +
      "with DROP; a NULL default is the plain null-fill") {
    spark.sql("DROP TABLE IF EXISTS graft.cd.ev")
    spark.sql("CREATE TABLE graft.cd.ev (k BIGINT)")
    spark.sql("INSERT INTO graft.cd.ev SELECT id FROM range(0, 6, 1, 1)")
    spark.sql("ALTER TABLE graft.cd.ev ADD COLUMN q INT DEFAULT 5")
    spark.sql("ALTER TABLE graft.cd.ev RENAME COLUMN q TO qty")
    assert(spark.sql("SELECT CAST(SUM(qty) AS BIGINT) FROM graft.cd.ev")
      .head().getLong(0) == 30L, "the default follows the rename")
    spark.sql("ALTER TABLE graft.cd.ev ALTER COLUMN qty TYPE BIGINT")
    assert(spark.sql("SELECT CAST(SUM(qty) AS BIGINT) FROM graft.cd.ev")
      .head().getLong(0) == 30L, "the default re-types with the widen")
    spark.sql("ALTER TABLE graft.cd.ev DROP COLUMN qty")
    assert(ManifestV2.readManifest(Paths.get(wh, "cd", "ev")).get
      .defaults.isEmpty, "DROP must clear the default")
    // NULL default = null-fill (nothing recorded)
    spark.sql("ALTER TABLE graft.cd.ev ADD COLUMN note STRING " +
      "DEFAULT NULL")
    assert(ManifestV2.readManifest(Paths.get(wh, "cd", "ev")).get
      .defaults.isEmpty)
    assert(spark.sql("SELECT COUNT(*) FROM graft.cd.ev " +
      "WHERE note IS NULL").head().getLong(0) == 6L)
  }

  test("a DELETE keyed on a defaulted column kills pre-add rows that " +
      "SERVE the default — never a vacuous equality sidecar") {
    spark.sql("DROP TABLE IF EXISTS graft.cd.dk")
    spark.sql("CREATE TABLE graft.cd.dk (k BIGINT)")
    spark.sql("INSERT INTO graft.cd.dk SELECT id FROM range(0, 10, 1, 1)")
    spark.sql("ALTER TABLE graft.cd.dk ADD COLUMN tag STRING " +
      "DEFAULT 'old'")
    spark.sql("INSERT INTO graft.cd.dk (k, tag) VALUES (100, 'new')")
    // pre-fix shape: the statement would land an equality sidecar
    // naming tag='old', which the leaf treats as VACUOUS for the
    // pre-add file (missing column) — the ten defaulted rows would
    // all survive. The defaulted column must refuse the sidecar path
    // and route to the row-level rewrite instead.
    spark.sql("DELETE FROM graft.cd.dk WHERE tag = 'old'")
    assert(spark.sql("SELECT COUNT(*) FROM graft.cd.dk")
      .head().getLong(0) == 1L,
      "every row serving the default must die")
    assert(spark.sql("SELECT k FROM graft.cd.dk").head().getLong(0)
      == 100L)
    // streaming upsert keyed on a defaulted column refuses for the
    // same reason
    val work = java.nio.file.Files.createTempDirectory("graft_cdup")
    spark.range(1).selectExpr("CAST(id AS STRING) AS tag", "id AS k")
      .write.format("graft.sources.ManifestV2")
      .option("path", work.resolve("src").toString).mode("append").save()
    spark.sql("ALTER TABLE graft.cd.dk ADD COLUMN v BIGINT DEFAULT 9")
    val e = intercept[Exception] {
      val q = spark.readStream.format("graft.sources.ManifestV2")
        .option("path", work.resolve("src").toString).load()
        .selectExpr("k AS v", "tag")
        .writeStream
        .option("checkpointLocation", work.resolve("ck").toString)
        .option("upsertKey", "v")
        .format("graft.sources.ManifestV2")
        .option("path", Paths.get(wh, "cd", "dk").toString)
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    assert(msgs(e).exists(_.contains("existence default")),
      s"got: ${msgs(e)}")
  }

  test("CREATE TABLE with DEFAULT records it: omitted INSERT columns " +
      "fill, and the change feed serves defaults like table reads") {
    spark.sql("DROP TABLE IF EXISTS graft.cd.ct")
    spark.sql("CREATE TABLE graft.cd.ct " +
      "(k BIGINT, region STRING DEFAULT 'emea', score BIGINT DEFAULT 3)")
    assert(ManifestV2.readManifest(Paths.get(wh, "cd", "ct")).get
      .defaults == Map("region" -> "emea", "score" -> "3"))
    spark.sql("INSERT INTO graft.cd.ct (k) VALUES (1)")
    spark.sql("INSERT INTO graft.cd.ct (k, region) VALUES (2, 'apac')")
    val r = spark.sql("SELECT region, CAST(SUM(score) AS BIGINT) " +
      "FROM graft.cd.ct GROUP BY region ORDER BY region").collect()
    assert(r.map(x => (x.getString(0), x.getLong(1))).toSeq ==
      Seq(("apac", 3L), ("emea", 3L)))
    // the CHANGE FEED over a table with an ADD-era default serves the
    // default for pre-add files exactly as table reads do
    spark.sql("DROP TABLE IF EXISTS graft.cd.cf")
    spark.sql("CREATE TABLE graft.cd.cf (k BIGINT)")
    spark.sql("INSERT INTO graft.cd.cf SELECT id FROM range(0, 4, 1, 1)")
    spark.sql("ALTER TABLE graft.cd.cf ADD COLUMN tag STRING " +
      "DEFAULT 'seed'")
    spark.sql("INSERT INTO graft.cd.cf (k, tag) VALUES (10, 'late')")
    val feed = spark.read.format("graft.sources.ManifestV2")
      .option("path", Paths.get(wh, "cd", "cf").toString)
      .option("changefeed", "true").load()
    assert(feed.where("tag = 'seed'").count() == 4L,
      "pre-add files' change rows must serve the existence default")
    assert(feed.where("tag = 'late'").count() == 1L)
  }

  test("SET/DROP DEFAULT mutates only the WRITE half: future omitted " +
      "inserts change, history never rewrites — pre-add rows keep " +
      "the existence default fixed at ADD COLUMN time") {
    spark.sql("DROP TABLE IF EXISTS graft.cd.sd")
    spark.sql("CREATE TABLE graft.cd.sd (k BIGINT)")
    spark.sql("INSERT INTO graft.cd.sd SELECT id FROM range(0, 5, 1, 1)")
    spark.sql("ALTER TABLE graft.cd.sd ADD COLUMN tier STRING " +
      "DEFAULT 'bronze'")
    spark.sql("INSERT INTO graft.cd.sd (k) VALUES (10)") // fills bronze
    spark.sql("ALTER TABLE graft.cd.sd ALTER COLUMN tier " +
      "SET DEFAULT 'silver'")
    spark.sql("INSERT INTO graft.cd.sd (k) VALUES (11)") // fills silver
    // pre-add rows STILL serve the existence default, not silver
    val byTier = spark.sql("SELECT tier, COUNT(*) FROM graft.cd.sd " +
      "GROUP BY tier ORDER BY tier").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(byTier == Seq(("bronze", 6L), ("silver", 1L)), s"got $byTier")
    val st = ManifestV2.readManifest(Paths.get(wh, "cd", "sd")).get
    assert(st.defaults == Map("tier" -> "bronze"),
      "the existence default is immutable")
    assert(st.writeDefaults == Map("tier" -> "silver"))
    // DROP DEFAULT: omitted inserts go back to NULL; existence stays
    spark.sql("ALTER TABLE graft.cd.sd ALTER COLUMN tier DROP DEFAULT")
    spark.sql("INSERT INTO graft.cd.sd (k) VALUES (12)")
    assert(spark.sql("SELECT COUNT(*) FROM graft.cd.sd " +
      "WHERE k = 12 AND tier IS NULL").head().getLong(0) == 1L)
    assert(spark.sql("SELECT COUNT(*) FROM graft.cd.sd " +
      "WHERE tier = 'bronze'").head().getLong(0) == 6L,
      "DROP DEFAULT must not rewrite history")
    // SET DEFAULT follows a rename like the existence default
    spark.sql("ALTER TABLE graft.cd.sd ALTER COLUMN tier " +
      "SET DEFAULT 'gold'")
    spark.sql("ALTER TABLE graft.cd.sd RENAME COLUMN tier TO level")
    spark.sql("INSERT INTO graft.cd.sd (k) VALUES (13)")
    assert(spark.sql("SELECT level FROM graft.cd.sd WHERE k = 13")
      .head().getString(0) == "gold")
  }

  test("the default survives unrelated commits (appends, deletes) — " +
      "the header is carried through every state rebuild") {
    spark.sql("DROP TABLE IF EXISTS graft.cd.cr")
    spark.sql("CREATE TABLE graft.cd.cr (k BIGINT)")
    spark.sql("INSERT INTO graft.cd.cr SELECT id FROM range(0, 8, 1, 1)")
    spark.sql("ALTER TABLE graft.cd.cr ADD COLUMN tag STRING " +
      "DEFAULT 'base'")
    spark.sql("INSERT INTO graft.cd.cr (k, tag) VALUES (50, 'new')")
    spark.sql("DELETE FROM graft.cd.cr WHERE k = 3")
    spark.sql("CALL graft.system.compact(ns => 'cd', tbl => 'cr', " +
      "max_rows => 1000000)").collect()
    val st = ManifestV2.readManifest(Paths.get(wh, "cd", "cr")).get
    assert(st.defaults == Map("tag" -> "base"),
      "append/delete/compact must all carry the defaults header")
    // compaction REWROTE the pre-add rows: they now physically carry
    // 'base' — and the answer is unchanged either way
    assert(spark.sql("SELECT COUNT(*) FROM graft.cd.cr " +
      "WHERE tag = 'base'").head().getLong(0) == 7L)
  }
}
