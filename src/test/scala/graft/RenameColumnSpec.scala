package graft

import java.nio.file.Paths

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{GraftCatalog, ManifestV2, PartTransform}

/** RENAME COLUMN (round 13): metadata-only schema evolution without
  * field IDs. The rename commit rewrites the schema field, every file
  * entry's stats/nulls keys, and the partition-spec renders (all
  * eras) to the new name — so manifest pruning, SPJ, and transposition
  * stay on current names — and records the old name as an ALIAS; the
  * leaf readers resolve a current column against an old footer
  * through the alias chain (the physical name only changes when the
  * file is rewritten). Names that still live in old footers can never
  * be reused by ADD or a second RENAME: by-name reads would resurrect
  * the old column's bytes.
  */
class RenameColumnSpec extends AnyFunSuite {
  import TestSpark._

  GraftCatalog.install(spark)
  spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.rn")
  private val wh = spark.conf.get("spark.sql.catalog.graft.warehouse")

  private def msgs(t: Throwable): Seq[String] =
    if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)

  test("rename end to end: old footers resolve through the alias, new " +
      "files write the new name, rewritten boxes keep pruning, a " +
      "pre-rename equality sidecar still subtracts") {
    spark.sql("DROP TABLE IF EXISTS graft.rn.t")
    spark.sql("CREATE TABLE graft.rn.t (k BIGINT, v BIGINT)")
    // two disjoint-range files, then an equality DELETE (sidecar
    // written under the OLD column name)
    spark.sql("INSERT INTO graft.rn.t " +
      "SELECT /*+ REPARTITION(1) */ id, id FROM range(0, 100, 1, 4)")
    spark.sql("INSERT INTO graft.rn.t SELECT /*+ REPARTITION(1) */ " +
      "id + 1000, id + 1000 FROM range(0, 100, 1, 4)")
    spark.sql("DELETE FROM graft.rn.t WHERE v = 7")

    spark.sql("ALTER TABLE graft.rn.t RENAME COLUMN v TO val")
    assert(spark.table("graft.rn.t").schema.fieldNames.toSeq ==
      Seq("k", "val"))
    // old rows serve under the new name; the old-name sidecar applies
    assert(spark.sql("SELECT CAST(SUM(val) AS BIGINT) FROM graft.rn.t")
      .head().getLong(0) ==
      (0L until 100L).sum + (1000L until 1100L).sum - 7L)
    assert(spark.sql("SELECT COUNT(*) FROM graft.rn.t WHERE val = 7")
      .head().getLong(0) == 0L)

    // new files land with the new physical name and mix transparently
    spark.sql("INSERT INTO graft.rn.t SELECT /*+ REPARTITION(1) */ " +
      "id + 5000, id + 5000 FROM range(0, 10, 1, 4)")
    assert(spark.sql("SELECT COUNT(*) FROM graft.rn.t WHERE val >= 5000")
      .head().getLong(0) == 10L)

    // file-entry boxes were rewritten: a range predicate on the NEW
    // name prunes pre-rename files off metadata
    val q = spark.sql("SELECT k FROM graft.rn.t WHERE val >= 1000 " +
      "AND val < 1100")
    assert(q.rdd.getNumPartitions == 1,
      "rewritten stats boxes must keep file pruning on the new name")
    assert(q.count() == 100L)

    // the manifest carries the alias; file stats carry only new keys
    val st = ManifestV2.readManifest(Paths.get(wh, "rn", "t")).get
    assert(st.aliases == Map("val" -> Seq("v")))
    assert(st.files.forall(e => !e.stats.contains("v")))

    // chained rename: footer name 'v' resolves through val2 -> val -> v
    spark.sql("ALTER TABLE graft.rn.t RENAME COLUMN val TO val2")
    assert(ManifestV2.readManifest(Paths.get(wh, "rn", "t")).get
      .aliases == Map("val2" -> Seq("val", "v")))
    assert(spark.sql("SELECT CAST(SUM(val2) AS BIGINT) FROM graft.rn.t")
      .head().getLong(0) ==
      (0L until 100L).sum + (1000L until 1100L).sum - 7L +
        (5000L until 5010L).sum)
  }

  test("names that still live in old footers can never be reused; " +
      "constraint-referenced columns refuse to rename") {
    spark.sql("DROP TABLE IF EXISTS graft.rn.g")
    spark.sql("CREATE TABLE graft.rn.g (a BIGINT, b BIGINT)")
    spark.sql("INSERT INTO graft.rn.g SELECT id, id FROM range(0, 5, 1, 1)")
    spark.sql("ALTER TABLE graft.rn.g RENAME COLUMN a TO a2")
    val e1 = intercept[Exception] {
      spark.sql("ALTER TABLE graft.rn.g ADD COLUMN a BIGINT")
    }
    assert(msgs(e1).exists(_.toLowerCase.contains("prior name")),
      s"got: ${msgs(e1)}")
    val e2 = intercept[Exception] {
      spark.sql("ALTER TABLE graft.rn.g RENAME COLUMN b TO a")
    }
    assert(msgs(e2).exists(_.toLowerCase.contains("prior name")),
      s"got: ${msgs(e2)}")
    val e3 = intercept[Exception] {
      spark.sql("ALTER TABLE graft.rn.g RENAME COLUMN a2 TO b")
    }
    assert(msgs(e3).exists(_.contains("already exists")), s"got: ${msgs(e3)}")
    spark.sql("ALTER TABLE graft.rn.g " +
      "ADD CONSTRAINT bpos CHECK (b >= 0)")
    val e4 = intercept[Exception] {
      spark.sql("ALTER TABLE graft.rn.g RENAME COLUMN b TO b2")
    }
    assert(msgs(e4).exists(_.contains("constraint")), s"got: ${msgs(e4)}")
    // after dropping the constraint the rename goes through
    spark.sql("ALTER TABLE graft.rn.g DROP CONSTRAINT bpos")
    spark.sql("ALTER TABLE graft.rn.g RENAME COLUMN b TO b2")
    assert(spark.sql("SELECT CAST(SUM(b2) AS BIGINT) FROM graft.rn.g")
      .head().getLong(0) == 10L)
  }

  test("renaming a hidden-partition source column rewrites the spec " +
      "renders: pruning and partitioned writes keep working across " +
      "the rename") {
    spark.sql("DROP TABLE IF EXISTS graft.rn.p")
    spark.sql("CREATE TABLE graft.rn.p (uid BIGINT, ts TIMESTAMP) " +
      "PARTITIONED BY (days(ts))")
    spark.sql("INSERT INTO graft.rn.p SELECT id, " +
      "timestampadd(DAY, CAST(id % 3 AS INT), " +
      "TIMESTAMP '2024-08-01 00:00:00') FROM range(0, 30, 1, 2)")
    spark.sql("ALTER TABLE graft.rn.p RENAME COLUMN ts TO event_ts")
    val st = ManifestV2.readManifest(Paths.get(wh, "rn", "p")).get
    assert(st.part.contains("days(event_ts)"), st.part.toString)

    // writes after the rename cluster and box under the new render
    spark.sql("INSERT INTO graft.rn.p SELECT id + 100, " +
      "timestampadd(DAY, CAST(id % 3 AS INT), " +
      "TIMESTAMP '2024-08-10 00:00:00') FROM range(0, 30, 1, 2)")
    assert(spark.sql("SELECT COUNT(*) FROM graft.rn.p").head()
      .getLong(0) == 60L)

    // a day filter on the NEW name transposes and prunes both eras of
    // files (the render rewrite + rewritten '@p' boxes)
    val d = java.time.LocalDate.of(2024, 8, 2).toEpochDay
    val q = spark.sql("SELECT uid FROM graft.rn.p WHERE " +
      "event_ts >= TIMESTAMP '2024-08-02 00:00:00' AND " +
      "event_ts < TIMESTAMP '2024-08-03 00:00:00'")
    val want = ManifestV2.readManifest(Paths.get(wh, "rn", "p")).get
      .files.count(e =>
        e.stats.get(PartTransform.PKey).exists(_._1 == d))
    assert(want > 0 && q.rdd.getNumPartitions == want,
      s"day lookup must plan only that day's files ($want)")
    assert(q.count() == 10L)
  }

  test("DROP COLUMN: metadata-only, old bytes never decoded again, " +
      "the name ledger blocks re-use, dependents refuse") {
    spark.sql("DROP TABLE IF EXISTS graft.rn.d")
    spark.sql("CREATE TABLE graft.rn.d (k BIGINT, junk BIGINT, " +
      "amt BIGINT)")
    spark.sql("INSERT INTO graft.rn.d SELECT id, id * 7, id * 2 " +
      "FROM range(0, 50, 1, 2)")
    spark.sql("ALTER TABLE graft.rn.d DROP COLUMN junk")
    assert(spark.table("graft.rn.d").schema.fieldNames.toSeq ==
      Seq("k", "amt"))
    // old files serve the surviving columns; new writes mix in
    spark.sql("INSERT INTO graft.rn.d SELECT id + 100, (id + 100) * 2 " +
      "FROM range(0, 10, 1, 2)")
    assert(spark.sql("SELECT CAST(SUM(amt) AS BIGINT) FROM graft.rn.d")
      .head().getLong(0) ==
      (0L until 50L).map(_ * 2).sum + (100L until 110L).map(_ * 2).sum)
    val st = ManifestV2.readManifest(Paths.get(wh, "rn", "d")).get
    assert(st.aliases.get("@dropped").exists(_.contains("junk")))
    assert(st.files.forall(e => !e.stats.contains("junk")))
    // the dead name is blocked for ADD and RENAME targets
    val e1 = intercept[Exception] {
      spark.sql("ALTER TABLE graft.rn.d ADD COLUMN junk BIGINT")
    }
    assert(msgs(e1).exists(_.toLowerCase.contains("prior name")),
      s"got: ${msgs(e1)}")
    val e2 = intercept[Exception] {
      spark.sql("ALTER TABLE graft.rn.d RENAME COLUMN amt TO junk")
    }
    assert(msgs(e2).exists(_.toLowerCase.contains("prior name")),
      s"got: ${msgs(e2)}")
    // a dropped-then-renamed chain stays blocked end to end
    spark.sql("ALTER TABLE graft.rn.d RENAME COLUMN amt TO amount")
    spark.sql("ALTER TABLE graft.rn.d ADD COLUMN extra BIGINT")
    spark.sql("ALTER TABLE graft.rn.d DROP COLUMN amount")
    val st2 = ManifestV2.readManifest(Paths.get(wh, "rn", "d")).get
    assert(st2.aliases("@dropped").toSet == Set("junk", "amount", "amt"),
      st2.aliases.toString)
    val e3 = intercept[Exception] {
      spark.sql("ALTER TABLE graft.rn.d ADD COLUMN amt BIGINT")
    }
    assert(msgs(e3).exists(_.toLowerCase.contains("prior name")))
    assert(spark.sql("SELECT COUNT(*) FROM graft.rn.d").head()
      .getLong(0) == 60L)

    // dependents refuse: partition source, CHECK constraint, live
    // equality sidecar
    spark.sql("DROP TABLE IF EXISTS graft.rn.dp")
    spark.sql("CREATE TABLE graft.rn.dp (uid BIGINT, ts TIMESTAMP) " +
      "PARTITIONED BY (days(ts))")
    val e4 = intercept[Exception] {
      spark.sql("ALTER TABLE graft.rn.dp DROP COLUMN ts")
    }
    assert(msgs(e4).exists(_.contains("partition source")),
      s"got: ${msgs(e4)}")
    spark.sql("DROP TABLE IF EXISTS graft.rn.dc")
    spark.sql("CREATE TABLE graft.rn.dc (a BIGINT, b BIGINT)")
    spark.sql("INSERT INTO graft.rn.dc SELECT id, id FROM range(0, 9, 1, 1)")
    spark.sql("ALTER TABLE graft.rn.dc ADD CONSTRAINT bp CHECK (b >= 0)")
    val e5 = intercept[Exception] {
      spark.sql("ALTER TABLE graft.rn.dc DROP COLUMN b")
    }
    assert(msgs(e5).exists(_.contains("constraint")), s"got: ${msgs(e5)}")
    spark.sql("ALTER TABLE graft.rn.dc DROP CONSTRAINT bp")
    spark.sql("DELETE FROM graft.rn.dc WHERE b = 3") // equality sidecar
    val e6 = intercept[Exception] {
      spark.sql("ALTER TABLE graft.rn.dc DROP COLUMN b")
    }
    assert(msgs(e6).exists(_.contains("equality-delete")),
      s"got: ${msgs(e6)}")
    // after compaction folds the sidecar away, the drop goes through
    spark.sql("CALL graft.system.compact(ns => 'rn', tbl => 'dc', " +
      "max_rows => 1000000)").collect()
    spark.sql("ALTER TABLE graft.rn.dc DROP COLUMN b")
    assert(spark.sql("SELECT CAST(SUM(a) AS BIGINT) FROM graft.rn.dc")
      .head().getLong(0) == (0L until 9L).sum - 3L)
  }

  test("the CHECK dependency test is exact w.r.t. string literals: a " +
      "column name appearing only inside a quoted literal blocks " +
      "nothing, a true reference still refuses") {
    spark.sql("DROP TABLE IF EXISTS graft.rn.ck")
    spark.sql("CREATE TABLE graft.rn.ck (a BIGINT, note STRING)")
    spark.sql("INSERT INTO graft.rn.ck VALUES (1, 'x')")
    spark.sql("ALTER TABLE graft.rn.ck ADD CONSTRAINT lit " +
      "CHECK (note <> 'a pending')")
    // 'a' lives only inside the literal — rename and drop proceed
    spark.sql("ALTER TABLE graft.rn.ck RENAME COLUMN a TO a2")
    assert(spark.table("graft.rn.ck").schema.fieldNames.toSeq ==
      Seq("a2", "note"))
    // a REAL reference still refuses (on the renamed name)
    spark.sql("ALTER TABLE graft.rn.ck ADD CONSTRAINT pos " +
      "CHECK (a2 >= 0)")
    val e = intercept[Exception] {
      spark.sql("ALTER TABLE graft.rn.ck RENAME COLUMN a2 TO a3")
    }
    assert(msgs(e).exists(_.contains("constraint")), s"got: ${msgs(e)}")
    val e2 = intercept[Exception] {
      spark.sql("ALTER TABLE graft.rn.ck DROP COLUMN a2")
    }
    assert(msgs(e2).exists(_.contains("constraint")), s"got: ${msgs(e2)}")
    // the string-literal constraint alone never blocks the DROP of a
    spark.sql("ALTER TABLE graft.rn.ck DROP CONSTRAINT pos")
    spark.sql("ALTER TABLE graft.rn.ck DROP COLUMN a2")
    assert(spark.table("graft.rn.ck").schema.fieldNames.toSeq ==
      Seq("note"))
  }

  test("the DROP COLUMN eq-delete guard translates sidecar names " +
      "through the alias chain: a sidecar written under a PRE-RENAME " +
      "name still blocks dropping the renamed column") {
    spark.sql("DROP TABLE IF EXISTS graft.rn.ad")
    spark.sql("CREATE TABLE graft.rn.ad (k BIGINT, amt BIGINT)")
    spark.sql("INSERT INTO graft.rn.ad SELECT id, id FROM range(0, 9, 1, 1)")
    spark.sql("DELETE FROM graft.rn.ad WHERE amt = 3") // sidecar: 'amt'
    spark.sql("ALTER TABLE graft.rn.ad RENAME COLUMN amt TO amount")
    // pre-fix the guard compared the sidecar's stored 'amt' against
    // the CURRENT name only, let the drop through, and the sidecar's
    // key then mapped to @dropped at read time — unreadable files
    val e = intercept[Exception] {
      spark.sql("ALTER TABLE graft.rn.ad DROP COLUMN amount")
    }
    assert(msgs(e).exists(_.contains("equality-delete")),
      s"got: ${msgs(e)}")
    assert(spark.sql(
      "SELECT CAST(SUM(amount) AS BIGINT) FROM graft.rn.ad")
      .head().getLong(0) == (0L until 9L).sum - 3L,
      "the refusal must leave the table fully readable")
    // compaction folds the sidecar away; the drop then goes through
    spark.sql("CALL graft.system.compact(ns => 'rn', tbl => 'ad', " +
      "max_rows => 1000000)").collect()
    spark.sql("ALTER TABLE graft.rn.ad DROP COLUMN amount")
    assert(spark.sql("SELECT COUNT(*) FROM graft.rn.ad")
      .head().getLong(0) == 8L)
  }
}
