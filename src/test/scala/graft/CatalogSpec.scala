package graft

import graft.sources.GraftCatalog
import org.scalatest.funsuite.AnyFunSuite

/** V2 catalog plugin: SQL DDL/DML over ManifestV2 tables, the virtual
  * generated namespace, and the V2 function catalog (SURVEY §2.2).
  */
class CatalogSpec extends AnyFunSuite {
  import TestSpark._

  GraftCatalog.install(spark)

  test("SQL DDL round-trip: create, insert, read back, rename, drop") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.spec")
    spark.sql("DROP TABLE IF EXISTS graft.spec.t")
    spark.sql("DROP TABLE IF EXISTS graft.spec.u")
    spark.sql("CREATE TABLE graft.spec.t (k BIGINT, s STRING)")
    assert(spark.sql("SELECT * FROM graft.spec.t").count() == 0,
      "a created table is immediately readable (empty manifest)")
    spark.sql("INSERT INTO graft.spec.t VALUES (1, 'a'), (2, 'tab\\there')")
    spark.sql("INSERT INTO graft.spec.t VALUES (3, NULL)")
    val got = spark.sql("SELECT k, s FROM graft.spec.t ORDER BY k").collect()
    assert(got.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
    assert(got(1).getString(1) == "tab\there", "escaping survives SQL round-trip")
    assert(got(2).isNullAt(1), "NULL survives SQL round-trip")

    // INSERT OVERWRITE = truncate + append through the same protocol
    spark.sql("INSERT OVERWRITE graft.spec.t VALUES (9, 'only')")
    assert(spark.sql("SELECT k FROM graft.spec.t").collect()
      .map(_.getLong(0)).toSeq == Seq(9L))

    // rename moves the manifest root; data follows the name (the
    // target is CATALOG-RELATIVE per SQL semantics — a catalog-
    // qualified target would read as namespace ["graft","spec"] and
    // the catalog rejects its missing namespace loudly)
    intercept[Exception] {
      spark.sql("ALTER TABLE graft.spec.t RENAME TO graft.spec.u")
    }
    spark.sql("ALTER TABLE graft.spec.t RENAME TO spec.u")
    assert(spark.sql("SELECT s FROM graft.spec.u").head().getString(0) == "only")
    assert(!spark.catalog.tableExists("graft.spec.t"))

    val listed = spark.sql("SHOW TABLES IN graft.spec").collect()
      .map(_.getString(1)).toSet
    assert(listed.contains("u") && !listed.contains("t"))

    spark.sql("DROP TABLE graft.spec.u")
    assert(!spark.catalog.tableExists("graft.spec.u"))
  }

  test("CTAS lands the query result through the commit protocol") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.spec")
    spark.sql("DROP TABLE IF EXISTS graft.spec.ctas")
    spark.sql("""CREATE TABLE graft.spec.ctas AS
      SELECT id AS k, CAST(id * id AS BIGINT) AS sq
      FROM range(10)""")
    val got = spark.sql("SELECT SUM(sq) FROM graft.spec.ctas").head().getLong(0)
    assert(got == (0 until 10).map(i => i * i).sum)
    spark.sql("DROP TABLE graft.spec.ctas")
  }

  test("virtual gen namespace serves RangeV2 tables by name, pushdown intact") {
    val df = spark.sql(
      "SELECT MAX(id) AS hi, COUNT(*) AS n FROM graft.gen.range_100000_16")
    // the aggregate must reach the source: one row per split, no
    // full-width scan (same evidence string the batch API asserts)
    assert(df.queryExecution.executedPlan.toString.contains("pushedAgg"),
      df.queryExecution.executedPlan.toString)
    val r = df.head()
    assert(r.getLong(0) == 99999L && r.getLong(1) == 100000L)
  }

  test("vmod resolves through the function catalog on the codegen magic path") {
    val df = spark.sql(
      "SELECT SUM(graft.fn.vmod(id)) AS s FROM graft.gen.range_1000_4")
    // magic-method binding compiles to Invoke; the row-boxing
    // ApplyFunctionExpression fallback must not appear anywhere
    val applied = df.queryExecution.optimizedPlan.collect {
      case p => p.expressions.flatMap(_.collect {
        case e if e.getClass.getSimpleName == "ApplyFunctionExpression" => e
      })
    }.flatten
    assert(applied.isEmpty, s"vmod fell back to produceResult: $applied")
    assert(df.head().getLong(0) == (0L until 1000L).map(_ % 97).sum)
  }

  test("sumsq aggregates exactly with partial-state merges across partitions") {
    val df = spark.sql(
      "SELECT graft.fn.sumsq(id) AS s FROM graft.gen.range_100000_16")
    val want = (0L until 100000L)
      .map(i => BigInt(i) * BigInt(i)).sum
    assert(BigInt(df.head().getDecimal(0).toBigInteger) == want)
  }

  test("create-on-existing and drop-on-missing behave like a real catalog") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.spec")
    spark.sql("DROP TABLE IF EXISTS graft.spec.dup")
    spark.sql("CREATE TABLE graft.spec.dup (k BIGINT)")
    intercept[Exception] {
      spark.sql("CREATE TABLE graft.spec.dup (k BIGINT)")
    }
    spark.sql("CREATE TABLE IF NOT EXISTS graft.spec.dup (k BIGINT)") // no-op
    spark.sql("DROP TABLE graft.spec.dup")
    intercept[Exception] { spark.sql("DROP TABLE graft.spec.missing") }
  }

  /** The manifest's current file list for a spec table. */
  private def manifestFiles(ns: String, tbl: String): Seq[(String, Map[String, (Long, Long)])] = {
    val wh = spark.conf.get("spark.sql.catalog.graft.warehouse")
    graft.sources.ManifestV2
      .readManifest(java.nio.file.Paths.get(wh, ns, tbl))
      .map(_.files.map(e => (e.file, e.stats))).getOrElse(Seq.empty)
  }

  test("DELETE: aligned stays metadata-only, misaligned rewrites only the affected file") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.spec")
    spark.sql("DROP TABLE IF EXISTS graft.spec.del")
    spark.sql("CREATE TABLE graft.spec.del (k BIGINT)")
    // two stat-disjoint files: [0,9] and [100,109]
    spark.sql("INSERT INTO graft.spec.del SELECT id FROM range(0, 10, 1, 1)")
    spark.sql("INSERT INTO graft.spec.del SELECT id + 100 FROM range(0, 10, 1, 1)")
    val before = manifestFiles("spec", "del")
    assert(before.size == 2)
    val fileA = before.collectFirst { case (f, s) if s("k") == (0L, 9L) => f }.get
    val fileB = before.collectFirst { case (f, s) if s("k") == (100L, 109L) => f }.get
    def entries() = {
      val wh = spark.conf.get("spark.sql.catalog.graft.warehouse")
      graft.sources.ManifestV2.readManifest(
        java.nio.file.Paths.get(wh, "spec", "del")).get.files
    }

    // misaligned: k < 5 splits file A's [0,9] box — the row-level
    // fallback engages as MERGE-ON-READ: file A gains a position-
    // delete sidecar and is NOT rewritten, and scan-time box pruning
    // keeps file B (disjoint from the predicate) out of the statement
    // entirely
    spark.sql("DELETE FROM graft.spec.del WHERE k < 5")
    val after1 = entries()
    assert(after1.map(_.file).toSet == Set(fileA, fileB),
      s"merge-on-read keeps both data files by name: $after1")
    assert(after1.find(_.file == fileA).get.deletes.nonEmpty,
      "the pierced file must carry a position-delete sidecar")
    assert(after1.find(_.file == fileB).get.deletes.isEmpty,
      "the box-disjoint file must not be touched by the delete")
    assert(spark.sql("SELECT COUNT(*) AS n, MIN(k) AS lo FROM graft.spec.del")
      .head().toSeq == Seq(15L, 5L))

    // aligned: k < 50 fully covers file A's [0,9] box (live rows are a
    // subset of the box, so dropping the whole file is exact) and
    // fully misses [100,109] — OptimizeMetadataOnlyDeleteFromTable
    // must take it back to the manifest-swap path even with the delta
    // operation available: file A and its sidecar leave the manifest
    // in one swap, file B survives BY NAME, nothing is rewritten
    spark.sql("DELETE FROM graft.spec.del WHERE k < 50")
    val after2 = manifestFiles("spec", "del")
    assert(after2.map(_._1) == Seq(fileB),
      s"a metadata delete keeps surviving files unrewritten: $after2")
    assert(spark.sql("SELECT MIN(k) AS lo, COUNT(*) AS n FROM graft.spec.del")
      .head().toSeq == Seq(100L, 10L))
    spark.sql("DROP TABLE graft.spec.del")
  }

  test("UPDATE runs merge-on-read: old version dies by position, new " +
      "version lands in a fresh file, NO source file is rewritten") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.spec")
    spark.sql("DROP TABLE IF EXISTS graft.spec.upd")
    spark.sql("CREATE TABLE graft.spec.upd (k BIGINT, v BIGINT)")
    spark.sql("INSERT INTO graft.spec.upd SELECT id, id FROM range(0, 10, 1, 1)")
    spark.sql(
      "INSERT INTO graft.spec.upd SELECT id + 100, id FROM range(0, 10, 1, 1)")
    val before = manifestFiles("spec", "upd")
    val fileA = before.collectFirst { case (f, s) if s("k")._1 == 0L => f }.get
    val fileB = before.collectFirst { case (f, s) if s("k")._1 == 100L => f }.get

    spark.sql("UPDATE graft.spec.upd SET v = v + 1000 WHERE k = 3")
    // merge-on-read: BOTH original files survive BY NAME; the touched
    // one carries a position-delete sidecar for the old row version,
    // the untouched one carries nothing, and one new file holds the
    // updated version — kilobytes of delta, no group rewrite
    val st = graft.sources.ManifestV2.readManifest(
      java.nio.file.Paths.get(
        spark.conf.get("spark.sql.catalog.graft.warehouse"),
        "spec", "upd")).get
    val byName = st.files.map(e => (e.file, e)).toMap
    assert(byName.contains(fileA) && byName.contains(fileB),
      s"no source file may be replaced by a MoR update: ${byName.keySet}")
    assert(byName(fileA).deletes.size == 1,
      "the touched file carries exactly one position-delete sidecar")
    assert(byName(fileB).deletes.isEmpty,
      "the untouched file must not be touched")
    assert(st.files.size == 3, s"old A + old B + one new-version file: $st")
    val newFile = (st.files.map(_.file).toSet - fileA - fileB).head
    assert(byName(newFile).rows == 1L)
    // and the read is exact: exactly once, post-update
    assert(spark.sql(
      "SELECT v FROM graft.spec.upd WHERE k = 3").head().getLong(0) == 1003L)
    assert(spark.sql(
      "SELECT COUNT(*) AS n FROM graft.spec.upd").head().getLong(0) == 20L)
    assert(spark.sql(
      "SELECT CAST(SUM(v) AS BIGINT) AS s FROM graft.spec.upd")
      .head().getLong(0) == (0 until 10).sum * 2 + 1000L)
    spark.sql("DROP TABLE graft.spec.upd")
  }

  test("PARTITIONED BY: clustered writes land bucket-pure files; the join plans no shuffle") {
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    spark.conf.set("spark.sql.requireAllClusterKeysForCoPartition", "false")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.spec")
    spark.sql("DROP TABLE IF EXISTS graft.spec.pa")
    spark.sql("DROP TABLE IF EXISTS graft.spec.pb")
    spark.sql(
      "CREATE TABLE graft.spec.pa (k BIGINT, bk BIGINT) PARTITIONED BY (bk)")
    spark.sql(
      "CREATE TABLE graft.spec.pb (k BIGINT, v BIGINT, bk BIGINT) PARTITIONED BY (bk)")
    // 5-partition inputs: the write's REQUIRED clustered distribution
    // must shuffle them so every staged file is single-valued on bk
    spark.sql("""INSERT INTO graft.spec.pa
      |SELECT id, id % 4 FROM range(0, 100, 1, 5)""".stripMargin)
    spark.sql("""INSERT INTO graft.spec.pb
      |SELECT id, id * 3, id % 4 FROM range(0, 100, 1, 5)""".stripMargin)
    val pa = manifestFiles("spec", "pa")
    assert(pa.nonEmpty && pa.forall { case (_, s) =>
      s.get("bk").exists(b => b._1 == b._2) },
      s"every file must be bucket-pure: $pa")
    assert(pa.map(_._2("bk")._1).toSet == Set(0L, 1L, 2L, 3L))

    // co-partitioned join: storage keys (bk) under join keys (bk, k) —
    // the SPJ zips bucket groups, no hash exchange on the data path
    val joined = spark.sql("""SELECT a.bk AS bk, COUNT(*) AS n,
      |  CAST(SUM(b.v) AS BIGINT) AS vsum
      |FROM graft.spec.pa a JOIN graft.spec.pb b
      |  ON a.bk = b.bk AND a.k = b.k
      |GROUP BY a.bk ORDER BY bk""".stripMargin)
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("hashpartitioning"),
      s"co-partitioned tables must join with no shuffle:\n$plan")
    val got = joined.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val want = (0L until 4L).map(b =>
      (b, 25L, (0L until 100L).filter(_ % 4 == b).map(_ * 3).sum)).toSeq
    assert(got == want, s"got $got")

    // partition-aligned DELETE stays metadata-only: survivors by name
    val before = manifestFiles("spec", "pa").map(_._1).toSet
    spark.sql("DELETE FROM graft.spec.pa WHERE bk = 2")
    val after = manifestFiles("spec", "pa").map(_._1).toSet
    assert(after.subsetOf(before) && after.size == before.size - 1,
      "bucket-aligned delete must drop exactly the bucket's file, " +
        s"rewriting nothing: before=$before after=$after")
    spark.sql("DROP TABLE graft.spec.pa")
    spark.sql("DROP TABLE graft.spec.pb")
  }

  test("CALL graft.system.compact merges fragments in one atomic swap") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.spec")
    spark.sql("DROP TABLE IF EXISTS graft.spec.cpt")
    spark.sql("CREATE TABLE graft.spec.cpt (k BIGINT)")
    for (i <- 0 until 6)
      spark.sql(s"""INSERT INTO graft.spec.cpt
        |SELECT id FROM range(${i * 10}, ${(i + 1) * 10}, 1, 1)""".stripMargin)
    val before = manifestFiles("spec", "cpt")
    assert(before.size == 6)
    val preVersion = {
      val wh = spark.conf.get("spark.sql.catalog.graft.warehouse")
      graft.sources.ManifestV2.readManifest(
        java.nio.file.Paths.get(wh, "spec", "cpt")).get.version
    }
    val acct = spark.sql("""CALL graft.system.compact(
      |ns => 'spec', tbl => 'cpt', max_rows => CAST(1000 AS BIGINT))"""
      .stripMargin).head()
    assert((acct.getLong(0), acct.getLong(1), acct.getLong(2)) == (6L, 1L, 60L),
      s"accounting: $acct")
    val after = manifestFiles("spec", "cpt")
    assert(after.size == 1 && after.head._2("k") == (0L, 59L),
      s"one merged file expected: $after")
    assert(spark.sql(
      "SELECT COUNT(*) AS n, CAST(SUM(k) AS BIGINT) AS s FROM graft.spec.cpt")
      .head().toSeq == Seq(60L, (0L until 60L).sum))
    // the pre-compaction snapshot is still readable: the swap replaced,
    // never mutated
    assert(spark.sql(
      s"SELECT COUNT(*) AS n FROM graft.spec.cpt VERSION AS OF $preVersion")
      .head().getLong(0) == 60L)
    // optimistic concurrency: replacing an already-replaced file fails
    // instead of resurrecting it
    val stale = before.head._1
    val e = intercept[Exception] {
      spark.range(1).selectExpr("id AS k")
        .write.format("graft.sources.ManifestV2")
        .option("path", java.nio.file.Paths.get(
          spark.conf.get("spark.sql.catalog.graft.warehouse"),
          "spec", "cpt").toString)
        .option("replaceFiles", stale)
        .mode("append").save()
    }
    assert(e.getMessage.contains("concurrent commit") ||
      Option(e.getCause).exists(_.getMessage.contains("concurrent commit")),
      s"stale replace must fail loudly: ${e.getMessage}")
    spark.sql("DROP TABLE graft.spec.cpt")
  }

  test("compacting a partitioned table keeps every file bucket-pure") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.spec")
    spark.sql("DROP TABLE IF EXISTS graft.spec.cpp")
    spark.sql(
      "CREATE TABLE graft.spec.cpp (k BIGINT, bk BIGINT) PARTITIONED BY (bk)")
    for (i <- 0 until 3)
      spark.sql(s"""INSERT INTO graft.spec.cpp
        |SELECT id, id % 4 FROM range(${i * 20}, ${(i + 1) * 20}, 1, 1)"""
        .stripMargin)
    assert(manifestFiles("spec", "cpp").size == 12, "3 inserts x 4 buckets")
    spark.sql("""CALL graft.system.compact(
      |ns => 'spec', tbl => 'cpp', max_rows => CAST(1000 AS BIGINT))"""
      .stripMargin).collect()
    val after = manifestFiles("spec", "cpp")
    assert(after.size == 4, s"one file per bucket expected: $after")
    assert(after.forall { case (_, s) => s("bk")._1 == s("bk")._2 },
      s"bucket purity must survive compaction: $after")
    assert(spark.sql(
      "SELECT COUNT(*) AS n, CAST(SUM(k) AS BIGINT) AS s FROM graft.spec.cpp")
      .head().toSeq == Seq(60L, (0L until 60L).sum))
    spark.sql("DROP TABLE graft.spec.cpp")
  }

  test("ADD COLUMN evolves the schema; old files null-fill, rewrites are refused") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.spec")
    spark.sql("DROP TABLE IF EXISTS graft.spec.evo")
    spark.sql("CREATE TABLE graft.spec.evo (k BIGINT)")
    spark.sql("INSERT INTO graft.spec.evo VALUES (1), (2)") // v2, one-column
    spark.sql("ALTER TABLE graft.spec.evo ADD COLUMN tag STRING") // v3
    spark.sql("INSERT INTO graft.spec.evo VALUES (3, 'new')")
    val got = spark.sql(
      "SELECT k, tag FROM graft.spec.evo ORDER BY k").collect()
      .map(r => (r.getLong(0), Option(r.getString(1)))).toSeq
    assert(got == Seq((1L, None), (2L, None), (3L, Some("new"))),
      s"old rows must null-fill the added column: $got")
    // the pre-evolution snapshot still reads with its own schema
    assert(spark.sql("SELECT * FROM graft.spec.evo VERSION AS OF 2")
      .schema.fieldNames.sameElements(Array("k")))
    // rewrite-shaped evolutions are refused loudly
    intercept[Exception] {
      spark.sql("ALTER TABLE graft.spec.evo ADD COLUMN bad BIGINT NOT NULL")
    }
    // DROP COLUMN is metadata-only (round 13): the name joins the
    // reserved ledger and can never be re-taken while old footers
    // still carry it
    spark.sql("ALTER TABLE graft.spec.evo DROP COLUMN tag")
    assert(spark.table("graft.spec.evo").schema.fieldNames
      .sameElements(Array("k")))
    intercept[Exception] {
      spark.sql("ALTER TABLE graft.spec.evo ADD COLUMN tag STRING")
    }
    spark.sql("ALTER TABLE graft.spec.evo ADD COLUMN tag2 STRING")
    // a by-name insert omitting the new column: Spark pads it with
    // NULL before the write, so the connector still receives (and
    // stores) full-width rows — no positional shift is possible
    spark.sql("INSERT INTO graft.spec.evo (k) VALUES (4)")
    assert(spark.sql("SELECT tag2 FROM graft.spec.evo WHERE k = 4")
      .head().isNullAt(0))
    spark.sql("DROP TABLE graft.spec.evo")
  }

  test("staged CTAS/RTAS are atomic: failures leave no table / the old table") {
    import org.apache.spark.sql.functions.{col, udf}
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.spec")
    spark.sql("DROP TABLE IF EXISTS graft.spec.rt")
    val boom = udf((k: Long) =>
      if (k > 2) throw new RuntimeException("boom") else k)
    spark.range(0, 5).select(boom(col("id")).as("k"))
      .createOrReplaceTempView("graft_spec_boom")
    // a failing CTAS must leave NO table behind — not a half-written one
    intercept[Exception] {
      spark.sql("CREATE TABLE graft.spec.rt AS SELECT * FROM graft_spec_boom")
    }
    assert(!spark.catalog.tableExists("graft.spec.rt"),
      "aborted CTAS must not mint a table")

    spark.sql("CREATE TABLE graft.spec.rt AS SELECT id AS k FROM range(0, 4)")
    assert(spark.sql("SELECT CAST(SUM(k) AS BIGINT) FROM graft.spec.rt")
      .head().getLong(0) == 6L)
    // a failing RTAS must keep serving the OLD table
    intercept[Exception] {
      spark.sql("REPLACE TABLE graft.spec.rt AS SELECT * FROM graft_spec_boom")
    }
    assert(spark.sql("SELECT CAST(SUM(k) AS BIGINT) FROM graft.spec.rt")
      .head().getLong(0) == 6L,
      "aborted RTAS must leave the previous snapshot untouched")
    // a successful RTAS is the next version in the lineage
    spark.sql("REPLACE TABLE graft.spec.rt AS SELECT id + 100 AS k FROM range(0, 2)")
    assert(spark.sql("SELECT CAST(SUM(k) AS BIGINT) FROM graft.spec.rt")
      .head().getLong(0) == 201L)
    assert(spark.sql(
      "SELECT CAST(SUM(k) AS BIGINT) FROM graft.spec.rt VERSION AS OF 1")
      .head().getLong(0) == 6L,
      "the replaced snapshot must stay time-travelable")
    // REPLACE on a missing table is an error; CREATE OR REPLACE is not
    spark.sql("DROP TABLE graft.spec.rt")
    intercept[Exception] {
      spark.sql("REPLACE TABLE graft.spec.rt AS SELECT 1L AS k")
    }
    spark.sql("CREATE OR REPLACE TABLE graft.spec.rt AS SELECT 7L AS k")
    assert(spark.sql("SELECT k FROM graft.spec.rt").head().getLong(0) == 7L)
    spark.sql("DROP TABLE graft.spec.rt")
  }

  test("ViewCatalog API: views persist as warehouse files across instances") {
    import org.apache.spark.sql.connector.catalog.{Identifier, ViewInfo}
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.spec")
    val cat = spark.sessionState.catalogManager.catalog("graft")
      .asInstanceOf[GraftCatalog]
    val id = Identifier.of(Array("spec"), "apiview")
    val id2 = Identifier.of(Array("spec"), "apiview2")
    cat.dropView(id); cat.dropView(id2)
    val schema = StructType(Seq(StructField("s", LongType)))
    val info = new ViewInfo(id,
      "SELECT CAST(SUM(k) AS BIGINT) AS s\nFROM graft.spec.vtab",
      "graft", Array("spec"), schema, Array("s"), Array.empty,
      Array.empty, java.util.Collections.emptyMap())
    val v = cat.createView(info)
    assert(v.query().contains("SUM(k)") && v.query().contains("\n"),
      "SQL text (incl. newlines) must round-trip")
    assert(v.currentCatalog() == "graft" &&
      v.currentNamespace().sameElements(Array("spec")))
    assert(v.schema() == schema && v.queryColumnNames().sameElements(Array("s")))
    // duplicate create is an error; listViews sees it; tables don't
    intercept[Exception] { cat.createView(info) }
    assert(cat.listViews("spec").contains(id))
    assert(!cat.listTables(Array("spec")).contains(id),
      "views and tables must never mix")
    // a SECOND instance over the same warehouse serves it: the view is
    // a warehouse file, not catalog memory
    val other = new GraftCatalog
    other.initialize("g2", new org.apache.spark.sql.util.CaseInsensitiveStringMap(
      java.util.Map.of("warehouse",
        spark.conf.get("spark.sql.catalog.graft.warehouse"))))
    assert(other.loadView(id).query().contains("SUM(k)"))
    // rename, then drop; loads after drop must fail
    cat.renameView(id, id2)
    assert(cat.viewExists(id2) && !cat.viewExists(id))
    assert(cat.dropView(id2) && !cat.dropView(id2))
    intercept[Exception] { cat.loadView(id2) }
  }

  test("CHECK constraints are enforced at the write boundary") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.spec")
    spark.sql("DROP TABLE IF EXISTS graft.spec.ck")
    spark.sql("CREATE TABLE graft.spec.ck (k BIGINT)")
    spark.sql("INSERT INTO graft.spec.ck VALUES (5), (10)")
    // adding a constraint VALIDATES existing rows: a violated one is
    // rejected and never lands in the manifest
    intercept[Exception] {
      spark.sql(
        "ALTER TABLE graft.spec.ck ADD CONSTRAINT pos CHECK (k > 7)")
    }
    spark.sql("ALTER TABLE graft.spec.ck ADD CONSTRAINT pos CHECK (k > 0)")
    // a violating INSERT fails BEFORE any row lands; a valid one passes
    intercept[Exception] {
      spark.sql("INSERT INTO graft.spec.ck VALUES (3), (-1)")
    }
    assert(spark.sql("SELECT COUNT(*) FROM graft.spec.ck")
      .head().getLong(0) == 2L,
      "a rejected insert must land nothing (task commit never reached)")
    spark.sql("INSERT INTO graft.spec.ck VALUES (7)")
    // the constraint also guards row-level UPDATEs
    intercept[Exception] {
      spark.sql("UPDATE graft.spec.ck SET k = -5 WHERE k = 7")
    }
    assert(spark.sql("SELECT CAST(SUM(k) AS BIGINT) FROM graft.spec.ck")
      .head().getLong(0) == 22L)
    // dropped constraint: the write is free again
    spark.sql("ALTER TABLE graft.spec.ck DROP CONSTRAINT pos")
    spark.sql("INSERT INTO graft.spec.ck VALUES (-1)")
    assert(spark.sql("SELECT CAST(SUM(k) AS BIGINT) FROM graft.spec.ck")
      .head().getLong(0) == 21L)
    spark.sql("DROP TABLE graft.spec.ck")
  }

  test("CALL graft.system.cluster_by yields disjoint boxes; range deletes go metadata-only") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.spec")
    spark.sql("DROP TABLE IF EXISTS graft.spec.cb")
    spark.sql("CREATE TABLE graft.spec.cb (k BIGINT)")
    // four interleaved inserts: every file's k-box spans ~the whole
    // domain, so nothing is range-decidable before clustering
    for (i <- 0 until 4)
      spark.sql(s"""INSERT INTO graft.spec.cb
        |SELECT id * 4 + $i FROM range(0, 25, 1, 1)""".stripMargin)
    val before = manifestFiles("spec", "cb")
    assert(before.size == 4 &&
      before.forall { case (_, s) => s("k")._2 - s("k")._1 > 90 },
      s"pre-clustering boxes must interleave: $before")

    val acct = spark.sql("""CALL graft.system.cluster_by(
      |ns => 'spec', tbl => 'cb', col => 'k', n_files => 4)"""
      .stripMargin).head()
    assert(acct.getLong(2) == 100L, s"accounting: $acct")
    val boxes = manifestFiles("spec", "cb")
      .filter(_._2.contains("k")).map(_._2("k")).sortBy(_._1)
    assert(boxes.nonEmpty &&
      boxes.sliding(2).forall {
        case Seq((_, hi), (lo2, _)) => lo2 > hi
        case _ => true
      }, s"clustered boxes must be disjoint: $boxes")
    assert(boxes.head._1 == 0L && boxes.last._2 == 99L)
    assert(spark.sql(
      "SELECT COUNT(*) AS n, CAST(SUM(k) AS BIGINT) AS s FROM graft.spec.cb")
      .head().toSeq == Seq(100L, (0L until 100L).sum))

    // a range delete cut AT a box boundary is now decidable file-by-
    // file: the statement is a manifest swap, survivors keep their
    // file names (nothing rewritten)
    val cut = boxes.head._2 + 1
    val names = manifestFiles("spec", "cb")
    val surviving = names.collect {
      case (f, s) if s.get("k").forall(_._1 >= cut) => f }.toSet
    spark.sql(s"DELETE FROM graft.spec.cb WHERE k < $cut")
    assert(manifestFiles("spec", "cb").map(_._1).toSet == surviving,
      "a boundary-aligned range delete after clustering must be metadata-only")
    spark.sql("DROP TABLE graft.spec.cb")
  }

  test("constraint SQL is pinned to the scanner's identifier " +
      "assumption: backticked and dotted identifiers refuse at ADD " +
      "CONSTRAINT time, literals and decimals stay legal") {
    val cat = spark.sessionState.catalogManager.catalog("graft")
      .asInstanceOf[graft.sources.GraftCatalog]
    intercept[IllegalArgumentException] {
      cat.requireScannableCheckSql("c", "`k` > 0")
    }
    intercept[IllegalArgumentException] {
      cat.requireScannableCheckSql("c", "t.k > 0")
    }
    intercept[IllegalArgumentException] {
      cat.requireScannableCheckSql("c", "x1 . y > 0") // spaced dots too
    }
    // decimals, dotted text inside literals, and backticks inside
    // literals are all fine — the stripper sees through them
    cat.requireScannableCheckSql("c", "k > 1.5")
    cat.requireScannableCheckSql("c", "s <> 'a.b' AND s <> '`q`'")
    cat.requireScannableCheckSql("c", "k > 0 -- a.dotted comment")
  }

  test("a COW rewrite racing a compaction fails instead of duplicating rows") {
    import org.apache.spark.sql.connector.write.RowLevelOperation
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.spec")
    spark.sql("DROP TABLE IF EXISTS graft.spec.race")
    spark.sql("CREATE TABLE graft.spec.race (k BIGINT)")
    spark.sql("INSERT INTO graft.spec.race SELECT id FROM range(0, 5, 1, 1)")
    spark.sql("INSERT INTO graft.spec.race SELECT id + 10 FROM range(0, 5, 1, 1)")
    val dir = java.nio.file.Paths.get(
      spark.conf.get("spark.sql.catalog.graft.warehouse"), "spec", "race")
    // the op captures its replaced set (all files), THEN a concurrent
    // maintenance pass replaces them — the late COW commit must refuse
    val op = new graft.sources.ManifestRowLevelOperation(
      dir.toString, RowLevelOperation.Command.DELETE)
    graft.sources.ManifestV2.compactSnapshot(spark, dir.toString, 1000L)
    val write = new graft.sources.ManifestReplaceDataWrite(
      dir.toString, graft.sources.ManifestV2.readManifest(dir).get.schema, op)
    val e = intercept[Exception] { write.commit(Array.empty) }
    assert(e.getMessage.contains("concurrent commit"),
      s"stale COW rewrite must fail loudly: ${e.getMessage}")
    assert(spark.sql("SELECT COUNT(*) FROM graft.spec.race")
      .head().getLong(0) == 10L, "the racing statement must change nothing")
    spark.sql("DROP TABLE graft.spec.race")
  }

  test("an aborted CTAS leaves no phantom directory; names don't cross table/view") {
    import org.apache.spark.sql.functions.{col, udf}
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.spec")
    spark.sql("DROP TABLE IF EXISTS graft.spec.ghost")
    val boom2 = udf((k: Long) =>
      if (k > 2) throw new RuntimeException("boom") else k)
    spark.range(0, 5).select(boom2(col("id")).as("k"))
      .createOrReplaceTempView("graft_spec_boom2")
    intercept[Exception] {
      spark.sql("CREATE TABLE graft.spec.ghost AS SELECT * FROM graft_spec_boom2")
    }
    val d = java.nio.file.Paths.get(
      spark.conf.get("spark.sql.catalog.graft.warehouse"), "spec", "ghost")
    assert(!java.nio.file.Files.exists(d),
      "aborted CTAS must not leave a directory that reads as a namespace")

    // one name, one object: a view may not shadow a table, nor a table
    // a view
    import org.apache.spark.sql.connector.catalog.{Identifier, ViewInfo}
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    val cat = spark.sessionState.catalogManager.catalog("graft")
      .asInstanceOf[GraftCatalog]
    spark.sql("DROP TABLE IF EXISTS graft.spec.solo")
    spark.sql("CREATE TABLE graft.spec.solo (k BIGINT)")
    val vinfo = new ViewInfo(Identifier.of(Array("spec"), "solo"),
      "SELECT 1 AS s", "graft", Array("spec"),
      StructType(Seq(StructField("s", LongType))), Array("s"),
      Array.empty, Array.empty, java.util.Collections.emptyMap())
    intercept[Exception] { cat.createView(vinfo) }
    val vinfo2 = new ViewInfo(Identifier.of(Array("spec"), "soloview"),
      "SELECT 1 AS s", "graft", Array("spec"),
      StructType(Seq(StructField("s", LongType))), Array("s"),
      Array.empty, Array.empty, java.util.Collections.emptyMap())
    cat.createView(vinfo2)
    intercept[Exception] {
      spark.sql("CREATE TABLE graft.spec.soloview (k BIGINT)")
    }
    intercept[Exception] {
      spark.sql("CREATE TABLE graft.spec.soloview AS SELECT 1L AS k")
    }
    cat.dropView(Identifier.of(Array("spec"), "soloview"))
    spark.sql("DROP TABLE graft.spec.solo")
  }

  test("MERGE INTO upserts merge-on-read; time travel sees the pre-merge snapshot") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.spec")
    spark.sql("DROP TABLE IF EXISTS graft.spec.mrg")
    spark.sql("CREATE TABLE graft.spec.mrg (k BIGINT, v BIGINT)") // v1
    spark.sql("INSERT INTO graft.spec.mrg SELECT id, id FROM range(0, 10, 1, 1)") // v2
    spark.sql(
      "INSERT INTO graft.spec.mrg SELECT id + 100, id FROM range(0, 10, 1, 1)") // v3
    val before = manifestFiles("spec", "mrg")
    val fileB = before.collectFirst { case (f, s) if s("k")._1 == 100L => f }.get

    spark.sql("""MERGE INTO graft.spec.mrg t
      |USING (SELECT * FROM VALUES (3L, 333L), (200L, 222L) AS s(k, v)) s
      |ON t.k = s.k
      |WHEN MATCHED THEN UPDATE SET v = s.v
      |WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k, s.v)""".stripMargin)

    val got = spark.sql(
      "SELECT k, v FROM graft.spec.mrg WHERE k IN (3, 4, 200) ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == Seq((3L, 333L), (4L, 4L), (200L, 222L)),
      s"matched-update + not-matched-insert: $got")
    assert(spark.sql("SELECT COUNT(*) AS n FROM graft.spec.mrg")
      .head().getLong(0) == 21L)
    // merge-on-read: NO source file is rewritten — both originals
    // survive by name; the matched one carries a position-delete
    // sidecar for the pre-update version, and the update's new
    // version plus the not-matched insert land in fresh file(s)
    val mrgFiles = manifestFiles("spec", "mrg").map(_._1)
    assert(mrgFiles.contains(fileB) &&
      mrgFiles.toSet.intersect(before.map(_._1).toSet) ==
        before.map(_._1).toSet,
      s"MERGE must not rewrite any source file: $mrgFiles")
    // pre-merge snapshot intact (the swap never mutates in place)
    assert(spark.sql(
      "SELECT v FROM graft.spec.mrg VERSION AS OF 3 WHERE k = 3")
      .head().getLong(0) == 3L)

    // a target row matching two source rows is a cardinality violation
    val e = intercept[Exception] {
      spark.sql("""MERGE INTO graft.spec.mrg t
        |USING (SELECT * FROM VALUES (4L, 1L), (4L, 2L) AS s(k, v)) s
        |ON t.k = s.k
        |WHEN MATCHED THEN UPDATE SET v = s.v""".stripMargin)
    }
    assert(e.getMessage.toUpperCase.contains("MERGE"),
      s"expected a merge cardinality error, got: ${e.getMessage}")
    spark.sql("DROP TABLE graft.spec.mrg")
  }

  test("_file metadata column serves provenance without parsing") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.spec")
    spark.sql("DROP TABLE IF EXISTS graft.spec.prov")
    spark.sql("CREATE TABLE graft.spec.prov (k BIGINT)")
    spark.sql("INSERT INTO graft.spec.prov SELECT id FROM range(0, 7, 1, 1)")
    spark.sql("INSERT INTO graft.spec.prov SELECT id FROM range(0, 3, 1, 1)")
    // hidden from SELECT *
    assert(spark.sql("SELECT * FROM graft.spec.prov").schema.fieldNames
      .sameElements(Array("k")))
    // explicit selection groups rows by their physical file, matching
    // the manifest's per-file row counts
    val perFile = spark.sql(
      "SELECT _file, COUNT(*) AS n FROM graft.spec.prov GROUP BY _file")
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val manifest = java.nio.file.Files.readAllLines(java.nio.file.Paths.get(
      spark.conf.get("spark.sql.catalog.graft.warehouse"), "spec", "prov",
      "manifest.txt"))
    val want = (0 until manifest.size) // skip schema + @-header lines
      .filterNot(i => i == 0 || manifest.get(i).startsWith("@"))
      .map { i =>
        val p = manifest.get(i).split("\t"); (p(0), p(1).toLong)
      }.toMap.filter(_._2 > 0) // zero-row task files never emit a group
    assert(perFile == want, s"got $perFile want $want")
    spark.sql("DROP TABLE graft.spec.prov")
  }

  test("file stats land in the manifest for safe-named BIGINT columns only") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.spec")
    spark.sql("DROP TABLE IF EXISTS graft.spec.st")
    spark.sql("CREATE TABLE graft.spec.st (k BIGINT, s STRING)")
    spark.sql("INSERT INTO graft.spec.st SELECT id + 5, 'x' FROM range(0, 10, 1, 1)")
    val manifest = java.nio.file.Files.readAllLines(java.nio.file.Paths.get(
      spark.conf.get("spark.sql.catalog.graft.warehouse"), "spec", "st",
      "manifest.txt"))
    val fileLines = (1 until manifest.size).map(manifest.get)
      .filterNot(_.startsWith("@"))
    assert(fileLines.exists(_.contains("k:5:14")), fileLines.mkString("\n"))
    assert(!fileLines.exists(_.contains("s:")), "no stats for string columns")
    spark.sql("DROP TABLE graft.spec.st")
  }

  test("VERSION AS OF reads historical snapshots through SQL") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.spec")
    spark.sql("DROP TABLE IF EXISTS graft.spec.tt")
    spark.sql("CREATE TABLE graft.spec.tt (k BIGINT)") // v1
    spark.sql("INSERT INTO graft.spec.tt VALUES (1), (2)") // v2
    spark.sql("INSERT OVERWRITE graft.spec.tt VALUES (9)") // v3
    assert(spark.sql("SELECT * FROM graft.spec.tt VERSION AS OF 1").count() == 0)
    assert(spark.sql("SELECT SUM(k) FROM graft.spec.tt VERSION AS OF 2")
      .head().getLong(0) == 3L)
    assert(spark.sql("SELECT SUM(k) FROM graft.spec.tt")
      .head().getLong(0) == 9L)
    val e = intercept[Exception] {
      spark.sql("SELECT * FROM graft.spec.tt VERSION AS OF 42").collect()
    }
    assert(e.getMessage.contains("no snapshot"), e.getMessage)
    spark.sql("DROP TABLE graft.spec.tt")
  }

  test("CALL graft.system.expire_snapshots reclaims through the procedure surface") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.spec")
    spark.sql("DROP TABLE IF EXISTS graft.spec.exp")
    spark.sql("CREATE TABLE graft.spec.exp (k BIGINT)") // v1
    spark.sql("INSERT INTO graft.spec.exp VALUES (1)") // v2
    spark.sql("INSERT OVERWRITE graft.spec.exp VALUES (2)") // v3
    val r = spark.sql(
      "CALL graft.system.expire_snapshots(ns => 'spec', tbl => 'exp', keep => 1)")
      .head()
    assert(r.getLong(0) == 2L, s"v1+v2 expired, got $r") // versions expired
    assert(r.getLong(1) >= 1L, s"v2's file reclaimed, got $r")
    // live table intact, history gone
    assert(spark.sql("SELECT k FROM graft.spec.exp").head().getLong(0) == 2L)
    intercept[Exception] {
      spark.sql("SELECT * FROM graft.spec.exp VERSION AS OF 2").collect()
    }
    spark.sql("DROP TABLE graft.spec.exp")
  }

  test("catalog is stateless: a second plugin instance sees committed tables") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.spec")
    spark.sql("DROP TABLE IF EXISTS graft.spec.shared")
    spark.sql("CREATE TABLE graft.spec.shared AS SELECT 42 AS v")
    // a fresh catalog instance over the same warehouse — the restart /
    // concurrent-session shape; only the manifest carries state
    val other = new GraftCatalog
    val opts = new org.apache.spark.sql.util.CaseInsensitiveStringMap(
      java.util.Map.of("warehouse",
        spark.conf.get("spark.sql.catalog.graft.warehouse")))
    other.initialize("graft2", opts)
    val ident = org.apache.spark.sql.connector.catalog.Identifier.of(
      Array("spec"), "shared")
    assert(other.tableExists(ident))
    assert(other.loadTable(ident).schema().fieldNames.sameElements(Array("v")))
    spark.sql("DROP TABLE graft.spec.shared")
  }
}
