package graft

import java.nio.file.Paths

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{GraftCatalog, ManifestV2}

/** TBLPROPERTIES (round 15): free-form user metadata, versioned with
  * the snapshot in the manifest's `@props` header — CREATE carries
  * them, ALTER SET/UNSET commits new snapshots, every commit class
  * (append, delete, maintenance, spec evolution) carries them by
  * construction (derive sites build with `.copy`), time travel and
  * rollback serve the era's own values, clones inherit them, and a
  * REPLACE installs the new definition's set. Keys that would break
  * the header line format (`=`, tabs, newlines) refuse at set time.
  */
class PropertiesSpec extends AnyFunSuite {
  import TestSpark._

  GraftCatalog.install(spark)
  spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.pr")
  private val wh = spark.conf.get("spark.sql.catalog.graft.warehouse")

  private def propsOf(t: String): Map[String, String] =
    ManifestV2.readManifest(Paths.get(wh, "pr", t)).get.props

  test("CREATE carries TBLPROPERTIES; SHOW TBLPROPERTIES serves " +
      "them; SET/UNSET commit new snapshots; time travel and " +
      "rollback serve each era's own values") {
    spark.sql("DROP TABLE IF EXISTS graft.pr.t")
    spark.sql("""CREATE TABLE graft.pr.t (k BIGINT)
      |TBLPROPERTIES ('team' = 'data-eng', 'tier' = 'gold')"""
      .stripMargin) // v1
    assert(propsOf("t") == Map("team" -> "data-eng", "tier" -> "gold"))
    val shown = spark.sql("SHOW TBLPROPERTIES graft.pr.t").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(shown.get("team").contains("data-eng") &&
      shown.get("tier").contains("gold"))

    spark.sql("INSERT INTO graft.pr.t VALUES (1)") // v2: append carries
    assert(propsOf("t")("tier") == "gold")
    spark.sql("ALTER TABLE graft.pr.t SET TBLPROPERTIES " +
      "('tier' = 'silver', 'ttl' = '30d')") // v3
    spark.sql("ALTER TABLE graft.pr.t UNSET TBLPROPERTIES ('team')") // v4
    assert(propsOf("t") == Map("tier" -> "silver", "ttl" -> "30d"))
    // time travel serves the OLD properties of the pinned version
    val cat = spark.sessionState.catalogManager.catalog("graft")
      .asInstanceOf[GraftCatalog]
    val d = Paths.get(wh, "pr", "t")
    assert(ManifestV2.readManifest(d, 2L).get.props("tier") == "gold")
    // rollback restores the old property set with everything else
    spark.sql("CALL graft.system.rollback(" +
      "ns => 'pr', tbl => 't', version => 2)").collect() // v5
    assert(propsOf("t") == Map("team" -> "data-eng", "tier" -> "gold"))
    assert(cat != null)
  }

  test("every commit class carries properties: delete, maintenance, " +
      "spec evolution, streaming append, truncate, clone; REPLACE " +
      "installs the new definition's set") {
    spark.sql("DROP TABLE IF EXISTS graft.pr.c")
    spark.sql("DROP TABLE IF EXISTS graft.pr.c2")
    spark.sql("""CREATE TABLE graft.pr.c (k BIGINT)
      |TBLPROPERTIES ('owner_team' = 'ml')""".stripMargin)
    spark.sql("INSERT INTO graft.pr.c SELECT id FROM range(0, 40, 1, 4)")
    spark.sql("DELETE FROM graft.pr.c WHERE k % 7 = 3") // sidecar commit
    assert(propsOf("c")("owner_team") == "ml")
    spark.sql("CALL graft.system.compact(ns => 'pr', tbl => 'c', " +
      "max_rows => 1000000)").collect() // maintenance
    assert(propsOf("c")("owner_team") == "ml")
    spark.sql("CALL graft.system.set_partitioning(" +
      "ns => 'pr', tbl => 'c', spec => 'truncate(10, k)')").collect()
    assert(propsOf("c")("owner_team") == "ml")
    spark.sql("INSERT INTO graft.pr.c SELECT id FROM range(100, 110, 1, 1)")
    assert(propsOf("c")("owner_team") == "ml")
    spark.sql("CALL graft.system.clone(ns => 'pr', tbl => 'c', " +
      "dst_ns => 'pr', dst_tbl => 'c2')").collect()
    assert(ManifestV2.readManifest(Paths.get(wh, "pr", "c2")).get
      .props("owner_team") == "ml")
    spark.sql("TRUNCATE TABLE graft.pr.c")
    assert(propsOf("c")("owner_team") == "ml")
    // REPLACE = new definition: the old property set does not leak in
    spark.sql("""REPLACE TABLE graft.pr.c
      |TBLPROPERTIES ('fresh' = 'yes')
      |AS SELECT CAST(1 AS BIGINT) AS v""".stripMargin)
    assert(propsOf("c") == Map("fresh" -> "yes"))
  }

  test("streaming epochs carry properties; malformed keys refuse") {
    spark.sql("DROP TABLE IF EXISTS graft.pr.s")
    spark.sql("""CREATE TABLE graft.pr.s (k BIGINT)
      |TBLPROPERTIES ('p' = 'v')""".stripMargin)
    val work = java.nio.file.Files.createTempDirectory("graft_prs")
    val src = work.resolve("src").toString
    spark.range(0, 5).selectExpr("id AS k")
      .write.format("graft.sources.ManifestV2")
      .option("path", src).mode("append").save()
    val q = spark.readStream.format("graft.sources.ManifestV2")
      .option("path", src).load()
      .writeStream
      .option("checkpointLocation", work.resolve("ck").toString)
      .toTable("graft.pr.s")
    try q.processAllAvailable() finally q.stop()
    assert(propsOf("s") == Map("p" -> "v"),
      "a streaming epoch commit must carry the property set")

    val bad = intercept[Exception] {
      spark.sql("ALTER TABLE graft.pr.s SET TBLPROPERTIES ('a=b' = 'x')")
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(bad).exists(_.contains("property key")),
      s"got: ${msgs(bad)}")
    // values with tabs/newlines round-trip through esc
    spark.sql("ALTER TABLE graft.pr.s SET TBLPROPERTIES " +
      "('note' = 'line1\\tline2')")
    assert(propsOf("s")("note").contains("line1"))
    // COMMENT ON TABLE rides the same property plane
    spark.sql("COMMENT ON TABLE graft.pr.s IS 'the stream sink'")
    assert(propsOf("s").get("comment").contains("the stream sink"))
  }
}
