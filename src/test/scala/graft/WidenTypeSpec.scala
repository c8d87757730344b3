package graft

import java.nio.file.Paths

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.ManifestV2

/** ALTER COLUMN TYPE widening (round 14): INT -> BIGINT is
  * metadata-only — the schema field re-types in one commit, zero data
  * files rewrite, and the leaf decodes a pre-widening file's INT32
  * pages through an up-cast into the long vector (the type analog of
  * alias-chain name resolution). Everything else (narrowing,
  * re-typing, widening a partition source) is refused: old footers
  * would not survive it.
  */
class WidenTypeSpec extends AnyFunSuite {
  import TestSpark._

  graft.sources.GraftCatalog.install(spark)
  spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.wt")
  private val wh = spark.conf.get("spark.sql.catalog.graft.warehouse")

  private def msgs(t: Throwable): Seq[String] =
    if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)

  test("widen end to end: INT32 footers decode through the up-cast, " +
      "post-widen rows exceed the int range, pruning and aggregate " +
      "pushdown keep working, time travel serves the old type") {
    spark.sql("DROP TABLE IF EXISTS graft.wt.t")
    spark.sql("CREATE TABLE graft.wt.t (k BIGINT, qty INT)")
    spark.sql("INSERT INTO graft.wt.t SELECT /*+ REPARTITION(1) */ id, " +
      "CAST(id AS INT) FROM range(0, 100, 1, 4)")
    val d = Paths.get(wh, "wt", "t").toString
    val preV = ManifestV2.readManifest(Paths.get(d)).get.version
    val preFiles = ManifestV2.readManifest(Paths.get(d)).get
      .files.map(_.file).toSet

    spark.sql("ALTER TABLE graft.wt.t ALTER COLUMN qty TYPE BIGINT")
    assert(spark.table("graft.wt.t").schema("qty").dataType ==
      org.apache.spark.sql.types.LongType)
    // metadata-only: no data file touched
    assert(ManifestV2.readManifest(Paths.get(d)).get
      .files.map(_.file).toSet == preFiles)

    // post-widen rows land as INT64 with values no INT could hold
    spark.sql("INSERT INTO graft.wt.t SELECT /*+ REPARTITION(1) */ " +
      "id + 1000, id + 4000000000 FROM range(0, 50, 1, 4)")
    assert(spark.sql("SELECT CAST(SUM(qty) AS BIGINT) FROM graft.wt.t")
      .head().getLong(0) ==
      (0L until 100L).sum + (0L until 50L).map(_ + 4000000000L).sum)
    assert(spark.sql(
      "SELECT COUNT(*) FROM graft.wt.t WHERE qty > 3000000000")
      .head().getLong(0) == 50L)

    // stats-box pruning on the widened column: the beyond-int-range
    // predicate must plan only the post-widen file
    val q = spark.sql("SELECT k FROM graft.wt.t WHERE qty >= 4000000000")
    assert(q.rdd.getNumPartitions == 1,
      "int-era boxes must keep pruning after the widen")
    assert(q.count() == 50L)

    // aggregate pushdown serves long cells off the (long-stored) boxes
    val mm = spark.sql("SELECT MIN(qty) AS lo, MAX(qty) AS hi " +
      "FROM graft.wt.t").head()
    assert(mm.getLong(0) == 0L && mm.getLong(1) == 4000000049L)

    // time travel to the pre-widen version serves the OLD schema type
    val old = spark.sql(
      s"SELECT qty FROM graft.wt.t VERSION AS OF $preV")
    assert(old.schema("qty").dataType ==
      org.apache.spark.sql.types.IntegerType)
    assert(old.selectExpr("CAST(SUM(qty) AS BIGINT)").head().getLong(0) ==
      (0L until 100L).sum)
  }

  test("an equality delete AFTER the widen subtracts from pre-widen " +
      "INT32 files: the sidecar's bigint key matches the up-cast value") {
    spark.sql("DROP TABLE IF EXISTS graft.wt.eq")
    spark.sql("CREATE TABLE graft.wt.eq (k BIGINT, qty INT)")
    spark.sql("INSERT INTO graft.wt.eq SELECT id, CAST(id AS INT) " +
      "FROM range(0, 20, 1, 1)")
    spark.sql("ALTER TABLE graft.wt.eq ALTER COLUMN qty TYPE BIGINT")
    // eq-delete sidecars exist only for BIGINT/STRING keys, so this is
    // the FIRST moment qty can carry one — and it must subtract from
    // rows whose physical bytes are INT32
    spark.sql("DELETE FROM graft.wt.eq WHERE qty = 7")
    val st = ManifestV2.readManifest(Paths.get(wh, "wt", "eq")).get
    assert(st.files.exists(_.deletes.nonEmpty),
      "the delete must have landed as a sidecar, not a rewrite")
    assert(spark.sql("SELECT CAST(SUM(qty) AS BIGINT) FROM graft.wt.eq")
      .head().getLong(0) == (0L until 20L).sum - 7L)
    assert(spark.sql("SELECT COUNT(*) FROM graft.wt.eq WHERE qty = 7")
      .head().getLong(0) == 0L)
  }

  test("widen composes with rename: an old footer resolves through " +
      "the alias chain AND the type up-cast at once") {
    spark.sql("DROP TABLE IF EXISTS graft.wt.rn")
    spark.sql("CREATE TABLE graft.wt.rn (k BIGINT, v INT)")
    spark.sql("INSERT INTO graft.wt.rn SELECT id, CAST(id AS INT) " +
      "FROM range(0, 10, 1, 1)")
    spark.sql("ALTER TABLE graft.wt.rn RENAME COLUMN v TO val")
    spark.sql("ALTER TABLE graft.wt.rn ALTER COLUMN val TYPE BIGINT")
    spark.sql("INSERT INTO graft.wt.rn SELECT id + 100, id + 5000000000 " +
      "FROM range(0, 5, 1, 1)")
    assert(spark.sql("SELECT CAST(SUM(val) AS BIGINT) FROM graft.wt.rn")
      .head().getLong(0) ==
      (0L until 10L).sum + (0L until 5L).map(_ + 5000000000L).sum)
  }

  test("COMMENT and DROP NOT NULL round out ALTER COLUMN; age-based " +
      "expiry composes with keepLast") {
    spark.sql("DROP TABLE IF EXISTS graft.wt.cm")
    spark.sql("CREATE TABLE graft.wt.cm (k BIGINT NOT NULL, v BIGINT)")
    spark.sql("INSERT INTO graft.wt.cm VALUES (1, 1)")
    spark.sql("ALTER TABLE graft.wt.cm ALTER COLUMN v " +
      "COMMENT 'the value'")
    assert(spark.table("graft.wt.cm").schema("v").getComment()
      .contains("the value"))
    // the comment survives later commits (it round-trips the DDL line)
    spark.sql("INSERT INTO graft.wt.cm VALUES (2, 2)")
    assert(spark.table("graft.wt.cm").schema("v").getComment()
      .contains("the value"))
    // relaxing NOT NULL is metadata-only; tightening (round 15) now
    // PROVES zero nulls first — v is null-free, so it succeeds (via
    // the procedure: Spark's analyzer refuses ALTER … SET NOT NULL
    // for every v2 catalog upstream)
    spark.sql("ALTER TABLE graft.wt.cm ALTER COLUMN k DROP NOT NULL")
    assert(spark.table("graft.wt.cm").schema("k").nullable)
    spark.sql("CALL graft.system.set_not_null(" +
      "ns => 'wt', tbl => 'cm', col => 'v')").collect()
    assert(!spark.table("graft.wt.cm").schema("v").nullable)
    assert(spark.sql("SELECT COUNT(*) FROM graft.wt.cm")
      .head().getLong(0) == 2L)

    // age-based expiry: versions stamped AFTER older_than_ms survive
    // even outside the keepLast window
    spark.sql("DROP TABLE IF EXISTS graft.wt.ex")
    spark.sql("CREATE TABLE graft.wt.ex (k BIGINT)") // v1
    spark.sql("INSERT INTO graft.wt.ex VALUES (1)") // v2
    val d = Paths.get(wh, "wt", "ex")
    val t2 = ManifestV2.readManifest(d, 2L).get.commitTs
    Thread.sleep(20)
    spark.sql("INSERT INTO graft.wt.ex VALUES (2)") // v3
    spark.sql("INSERT INTO graft.wt.ex VALUES (3)") // v4
    // keep=1 would expire v1..v3 by count; the age bound t2 protects
    // v3 (stamped later)
    val r = spark.sql("CALL graft.system.expire_snapshots(" +
      s"ns => 'wt', tbl => 'ex', keep => 1, older_than_ms => $t2)")
      .head()
    assert(r.getLong(0) == 2L, s"v1+v2 expire, v3 is too young: $r")
    assert(ManifestV2.readManifest(d, 3L).isDefined)
    assert(ManifestV2.readManifest(d, 2L).isEmpty)
    // and without the age bound (default), count alone decides
    val r2 = spark.sql("CALL graft.system.expire_snapshots(" +
      "ns => 'wt', tbl => 'ex', keep => 1)").head()
    assert(r2.getLong(0) == 1L, s"v3 now expires by count: $r2")
  }

  test("refusals: narrowing and re-typing refuse (Spark's up-cast " +
      "check or the catalog's promotion guard); same-type is a no-op") {
    spark.sql("DROP TABLE IF EXISTS graft.wt.rf")
    spark.sql("CREATE TABLE graft.wt.rf (k BIGINT, s STRING, q INT)")
    spark.sql("INSERT INTO graft.wt.rf VALUES (1, 'x', 1)")
    intercept[Exception] { // narrowing
      spark.sql("ALTER TABLE graft.wt.rf ALTER COLUMN k TYPE INT")
    }
    assert(spark.table("graft.wt.rf").schema("k").dataType ==
      org.apache.spark.sql.types.LongType)
    intercept[Exception] { // re-typing
      spark.sql("ALTER TABLE graft.wt.rf ALTER COLUMN s TYPE BIGINT")
    }
    // INT -> DOUBLE is a Spark up-cast but NOT metadata-only here
    // (old INT32 pages would misdecode) — the catalog's guard refuses
    val e3 = intercept[Exception] {
      spark.sql("ALTER TABLE graft.wt.rf ALTER COLUMN q TYPE DOUBLE")
    }
    assert(msgs(e3).exists(_.contains("widening")), s"got: ${msgs(e3)}")
    // same-type: accepted, nothing changes
    spark.sql("ALTER TABLE graft.wt.rf ALTER COLUMN q TYPE INT")
    assert(spark.table("graft.wt.rf").schema("q").dataType ==
      org.apache.spark.sql.types.IntegerType)
    // the refusals changed nothing
    assert(spark.sql("SELECT COUNT(*) FROM graft.wt.rf")
      .head().getLong(0) == 1L)
  }

  test("SET NOT NULL proves zero nulls before committing: metadata " +
      "fast path on clean stats, scan-backed refusal with a count on " +
      "a dirty column, and the tightened schema rejects NULL inserts") {
    spark.sql("DROP TABLE IF EXISTS graft.wt.nn")
    spark.sql("CREATE TABLE graft.wt.nn (k BIGINT, v BIGINT, s STRING)")
    spark.sql("INSERT INTO graft.wt.nn VALUES (1, 10, 'a'), (2, 20, 'b')")
    spark.sql("INSERT INTO graft.wt.nn VALUES (3, NULL, 'c'), (4, 40, NULL)")
    def tighten(col: String) = spark.sql("CALL graft.system." +
      s"set_not_null(ns => 'wt', tbl => 'nn', col => '$col')").collect()
    // v holds a NULL: refused, with the offending count in the message
    val e = intercept[Exception] { tighten("v") }
    assert(msgs(e).exists(m => m.contains("SET NOT NULL") &&
      m.contains("1 row")), s"got: ${msgs(e)}")
    assert(spark.table("graft.wt.nn").schema("v").nullable)
    // k is clean and every file tracks nulls(k) = 0: the tighten is
    // pure metadata — no scan
    tighten("k")
    assert(!spark.table("graft.wt.nn").schema("k").nullable)
    // s is a STRING (no null-count stats): the proof falls back to a
    // column-pruned scan — dirty here, so refused with the count
    val e2 = intercept[Exception] { tighten("s") }
    assert(msgs(e2).exists(_.contains("1 row")), s"got: ${msgs(e2)}")
    // clean the NULL (merge-on-read delete); the scan sees sidecars
    // applied, so the tighten now commits
    spark.sql("DELETE FROM graft.wt.nn WHERE s IS NULL")
    tighten("s")
    assert(!spark.table("graft.wt.nn").schema("s").nullable)
    // and the tightened schema refuses a NULL insert outright
    intercept[Exception] {
      spark.sql("INSERT INTO graft.wt.nn VALUES (CAST(NULL AS BIGINT), 5, 'x')")
    }
    assert(spark.sql("SELECT COUNT(*) FROM graft.wt.nn")
      .head().getLong(0) == 3L)
  }
}
