package graft

import java.nio.file.Paths

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{GraftCatalog, ManifestV2, PartTransform}

/** HIDDEN PARTITIONING (round 12): Iceberg-shape partition transforms
  * — `bucket(N, col)`, `days(ts)`, `hours(ts)`, `months(ts)`,
  * `truncate(W, col)` — declared in DDL, derived at write time,
  * recorded as reserved `@p` point boxes, transposed from data
  * predicates at plan time, and reported as transform-expression
  * KeyGroupedPartitioning for storage-partitioned joins on the
  * NATURAL key (no stored bucket column anywhere).
  */
class HiddenPartitionSpec extends AnyFunSuite {
  import TestSpark._

  GraftCatalog.install(spark)
  spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.hp")

  private def entries(ns: String, t: String) = {
    val wh = spark.conf.get("spark.sql.catalog.graft.warehouse")
    ManifestV2.readManifest(Paths.get(wh, ns, t)).get.files
  }

  test("PartTransform value derivations are pinned") {
    // murmur3_x86_32 reference vectors (public test vectors, seed 0)
    assert(PartTransform.murmur3(Array.empty[Byte]) == 0)
    assert(PartTransform.murmur3("hello".getBytes("UTF-8")) == 0x248bfa47)
    // day/hour/month indices, incl. pre-epoch flooring
    assert(PartTransform.daysOfMicros(0L) == 0L)
    assert(PartTransform.daysOfMicros(-1L) == -1L)
    assert(PartTransform.daysOfMicros(86400000000L) == 1L)
    assert(PartTransform.hoursOfMicros(3600000000L - 1L) == 0L)
    assert(PartTransform.monthsOfDays(0L) == 0L)
    assert(PartTransform.monthsOfDays(31L) == 1L)  // 1970-02-01
    assert(PartTransform.monthsOfDays(-1L) == -1L) // 1969-12-31
    assert(PartTransform.truncLong(10L, -1L) == -10L)
    // bucket is non-negative and stable
    for (v <- Seq(Long.MinValue, -1L, 0L, 1L, Long.MaxValue)) {
      val b = PartTransform.bucketLong(8, v)
      assert(b >= 0L && b < 8L, s"bucket($v) = $b out of range")
      assert(b == PartTransform.bucketLong(8, v))
    }
    // render/parse round-trip
    for (s <- Seq("bucket(8,k)", "days(ts)", "hours(ts)", "months(ts)",
        "truncate(100,k)", "barecol"))
      assert(PartTransform.parse(s).render == s)
  }

  test("bucket(8, k): files land bucket-pure with @p point boxes and a " +
      "point lookup plans 1/N of the files") {
    spark.sql("DROP TABLE IF EXISTS graft.hp.bk")
    spark.sql(
      "CREATE TABLE graft.hp.bk (k BIGINT, v BIGINT) " +
        "PARTITIONED BY (bucket(8, k))")
    spark.sql(
      "INSERT INTO graft.hp.bk SELECT id, id * 3 FROM range(0, 4000, 1, 4)")
    val es = entries("hp", "bk")
    assert(es.nonEmpty)
    // every file proves exactly one bucket, and the buckets match the
    // shared derivation
    es.foreach { e =>
      val (lo, hi) = e.stats(PartTransform.PKey)
      assert(lo == hi, s"non-point @p box in ${e.file}")
      assert(e.nulls(PartTransform.PKey) == 0L)
    }
    val buckets = es.map(_.stats(PartTransform.PKey)._1).toSet
    assert(buckets.subsetOf((0L until 8L).toSet))
    assert(buckets.size > 1, "4000 keys must hit several buckets")

    // point lookup: only the key's bucket's files are planned
    val key = 1234L
    val b = PartTransform.bucketLong(8, key)
    val expectFiles = es.count(_.stats(PartTransform.PKey)._1 == b)
    val q = spark.sql(s"SELECT k, v FROM graft.hp.bk WHERE k = $key")
    assert(q.rdd.getNumPartitions == expectFiles,
      s"expected only bucket $b's $expectFiles file(s) planned")
    assert(q.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((key, key * 3)))
    // IN over two keys: union of the two buckets' files
    val key2 = 77L
    val b2 = PartTransform.bucketLong(8, key2)
    val expect2 = es.count(e =>
      Set(b, b2).contains(e.stats(PartTransform.PKey)._1))
    val q2 = spark.sql(
      s"SELECT k FROM graft.hp.bk WHERE k IN ($key, $key2)")
    assert(q2.rdd.getNumPartitions == expect2)
    assert(q2.collect().map(_.getLong(0)).toSet == Set(key, key2))
  }

  test("bucket(8, s) on STRING keys: prune + exact lookup, unicode safe") {
    spark.sql("DROP TABLE IF EXISTS graft.hp.bs")
    spark.sql(
      "CREATE TABLE graft.hp.bs (s STRING, v BIGINT) " +
        "PARTITIONED BY (bucket(8, s))")
    spark.sql(
      "INSERT INTO graft.hp.bs " +
        "SELECT concat('usér-', CAST(id AS STRING)), id " +
        "FROM range(0, 2000, 1, 4)")
    val es = entries("hp", "bs")
    val target = "usér-999"
    val b = PartTransform.bucketUtf8(8,
      org.apache.spark.unsafe.types.UTF8String.fromString(target))
    val expectFiles = es.count(_.stats(PartTransform.PKey)._1 == b)
    assert(expectFiles < es.size, "pruning must be non-trivial")
    val q = spark.sql(s"SELECT v FROM graft.hp.bs WHERE s = '$target'")
    assert(q.rdd.getNumPartitions == expectFiles)
    assert(q.collect().map(_.getLong(0)).toSeq == Seq(999L))
  }

  test("days(ts): a time-range predicate transposes to day pruning and " +
      "boundary semantics are exact") {
    spark.sql("DROP TABLE IF EXISTS graft.hp.dy")
    spark.sql(
      "CREATE TABLE graft.hp.dy (eid BIGINT, ts TIMESTAMP) " +
        "PARTITIONED BY (days(ts))")
    // 6 hours apart -> 4 rows/day over 25 days
    spark.sql(
      "INSERT INTO graft.hp.dy SELECT id, " +
        "timestampadd(HOUR, CAST(id * 6 AS INT), " +
        "TIMESTAMP '2024-03-01 00:00:00') FROM range(0, 100, 1, 4)")
    val es = entries("hp", "dy")
    val dayOf = es.map(_.stats(PartTransform.PKey)._1).toSet
    assert(dayOf.size == 25, s"expected 25 day partitions, got $dayOf")
    // range [03-05, 03-07): exactly two day partitions planned
    val twoDays = es.count(e => {
      val d = e.stats(PartTransform.PKey)._1
      val lo = java.time.LocalDate.of(2024, 3, 5).toEpochDay
      d == lo || d == lo + 1
    })
    val q = spark.sql(
      "SELECT COUNT(*) AS n FROM graft.hp.dy " +
        "WHERE ts >= TIMESTAMP '2024-03-05 00:00:00' " +
        "AND ts < TIMESTAMP '2024-03-07 00:00:00'")
    val scan = spark.sql(
      "SELECT eid FROM graft.hp.dy " +
        "WHERE ts >= TIMESTAMP '2024-03-05 00:00:00' " +
        "AND ts < TIMESTAMP '2024-03-07 00:00:00'")
    assert(scan.rdd.getNumPartitions == twoDays,
      s"expected the two matching day partitions ($twoDays files)")
    assert(q.head().getLong(0) == 8L) // 4 rows/day * 2 days
    // a misaligned bound keeps the boundary day planned (inclusive
    // weakening) but the residual filter still cuts rows exactly
    val q2 = spark.sql(
      "SELECT COUNT(*) AS n FROM graft.hp.dy " +
        "WHERE ts >= TIMESTAMP '2024-03-05 11:00:00' " +
        "AND ts < TIMESTAMP '2024-03-06 13:00:00'")
    assert(q2.head().getLong(0) == 5L) // 12,18 on day 5; 0,6,12 on day 6
  }

  test("two bucket(8, ck) tables storage-partition-join on the natural " +
      "key with zero shuffle") {
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    spark.conf.set("spark.sql.requireAllClusterKeysForCoPartition", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      spark.sql("DROP TABLE IF EXISTS graft.hp.jo")
      spark.sql("DROP TABLE IF EXISTS graft.hp.jc")
      spark.sql("CREATE TABLE graft.hp.jo (ck BIGINT, okey BIGINT) " +
        "PARTITIONED BY (bucket(8, ck))")
      spark.sql("INSERT INTO graft.hp.jo " +
        "SELECT id % 500, id FROM range(0, 5000, 1, 4)")
      spark.sql("CREATE TABLE graft.hp.jc (ck BIGINT, name STRING) " +
        "PARTITIONED BY (bucket(8, ck))")
      spark.sql("INSERT INTO graft.hp.jc " +
        "SELECT id, concat('c', CAST(id AS STRING)) " +
        "FROM range(0, 500, 1, 4)")
      // the raw join: no Exchange anywhere — both sides are key-grouped
      // on the SAME bucket(8, ck) transform, so Spark zips bucket
      // groups directly
      val j0 = spark.sql(
        "SELECT o.ck, o.okey, c.name FROM graft.hp.jo o " +
          "JOIN graft.hp.jc c ON o.ck = c.ck")
      val plan = j0.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"hidden-bucket SPJ must plan no shuffle, got:\n$plan")
      val j = spark.sql(
        "SELECT c.name AS name, COUNT(*) AS n, " +
          "CAST(SUM(o.okey) AS BIGINT) AS s " +
          "FROM graft.hp.jo o JOIN graft.hp.jc c ON o.ck = c.ck " +
          "GROUP BY c.name")
      val rows = j.collect()
      assert(rows.length == 500)
      assert(rows.map(_.getLong(1)).sum == 5000L)
      // spot value: ck=7 matches okeys {7,507,...,4507}
      val r7 = rows.find(_.getString(0) == "c7").get
      assert(r7.getLong(1) == 10L && r7.getLong(2) == (0 until 10)
        .map(i => 7L + 500L * i).sum)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    }
  }

  test("truncate(1000, k): range predicates prune via the floored box") {
    spark.sql("DROP TABLE IF EXISTS graft.hp.tr")
    spark.sql("CREATE TABLE graft.hp.tr (k BIGINT) " +
      "PARTITIONED BY (truncate(1000, k))")
    spark.sql("INSERT INTO graft.hp.tr SELECT id FROM range(0, 8000, 1, 2)")
    val es = entries("hp", "tr")
    assert(es.map(_.stats(PartTransform.PKey)._1).toSet ==
      (0L until 8L).map(_ * 1000L).toSet)
    val q = spark.sql(
      "SELECT COUNT(*) AS n FROM graft.hp.tr WHERE k >= 2500 AND k < 3500")
    val scan = spark.sql(
      "SELECT k FROM graft.hp.tr WHERE k >= 2500 AND k < 3500")
    val expectFiles = es.count(e => {
      val p = e.stats(PartTransform.PKey)._1
      p == 2000L || p == 3000L
    })
    assert(scan.rdd.getNumPartitions == expectFiles)
    assert(q.head().getLong(0) == 1000L)
  }

  test("compacting a transform-partitioned table keeps every file " +
      "partition-pure with its @p box") {
    spark.sql("DROP TABLE IF EXISTS graft.hp.cp")
    spark.sql("CREATE TABLE graft.hp.cp (k BIGINT, v BIGINT) " +
      "PARTITIONED BY (bucket(4, k))")
    // four small inserts -> fragmented buckets
    for (q <- 0 until 4)
      spark.sql(s"INSERT INTO graft.hp.cp " +
        s"SELECT id * 4 + $q, id FROM range(0, 250, 1, 2)")
    val before = entries("hp", "cp")
    assert(before.size > 4, s"expected fragmentation, got ${before.size}")
    val sumBefore = spark.sql(
      "SELECT CAST(SUM(k) AS BIGINT) FROM graft.hp.cp").head().getLong(0)
    spark.sql(
      "CALL graft.system.compact(ns => 'hp', tbl => 'cp', " +
        "max_rows => 100000)").collect()
    val after = entries("hp", "cp")
    assert(after.size < before.size, s"compaction must merge fragments")
    after.filter(_.rows > 0).foreach { e =>
      val (lo, hi) = e.stats(PartTransform.PKey)
      assert(lo == hi, s"compacted file ${e.file} must stay bucket-pure")
    }
    // one file per live bucket: the pre-clustering grouped exactly
    assert(after.count(_.rows > 0) == 4, s"expected 4 files, got $after")
    assert(spark.sql("SELECT CAST(SUM(k) AS BIGINT) FROM graft.hp.cp")
      .head().getLong(0) == sumBefore)
    // and the compacted layout still prunes + SPJ-reports: point probe
    val es = after.filter(_.rows > 0)
    val key = 123L
    val b = PartTransform.bucketLong(4, key)
    val q = spark.sql(s"SELECT v FROM graft.hp.cp WHERE k = $key")
    assert(q.rdd.getNumPartitions ==
      es.filter(_.stats(PartTransform.PKey)._1 == b)
        .map(e => math.max(1, e.rgs.size)).sum)
    assert(q.collect().map(_.getLong(0)).toSeq == Seq((key - 3) / 4))
  }

  test("UPDATE on a transform-partitioned table rewrites partition-pure " +
      "(the COW path clusters on the transform)") {
    spark.sql("DROP TABLE IF EXISTS graft.hp.up")
    spark.sql("CREATE TABLE graft.hp.up (k BIGINT, v BIGINT) " +
      "PARTITIONED BY (bucket(4, k))")
    spark.sql("INSERT INTO graft.hp.up SELECT id, id FROM range(0, 400, 1, 2)")
    spark.sql("UPDATE graft.hp.up SET v = v + 1000000 WHERE k % 10 = 3")
    val es = entries("hp", "up").filter(_.rows > 0)
    es.foreach { e =>
      val (lo, hi) = e.stats(PartTransform.PKey)
      assert(lo == hi, s"rewritten file ${e.file} must stay bucket-pure")
    }
    assert(spark.sql(
      "SELECT COUNT(*) FROM graft.hp.up WHERE v >= 1000000").head()
      .getLong(0) == 40L)
    assert(spark.sql("SELECT CAST(SUM(v) AS BIGINT) FROM graft.hp.up")
      .head().getLong(0) == (0L until 400L).sum + 40L * 1000000L)
    // the rewritten layout still point-prunes
    val b = PartTransform.bucketLong(4, 13L)
    val expect = es.filter(_.stats(PartTransform.PKey)._1 == b)
      .map(e => math.max(1, e.rgs.size)).sum
    val q = spark.sql("SELECT v FROM graft.hp.up WHERE k = 13")
    assert(q.rdd.getNumPartitions == expect)
    assert(q.collect().map(_.getLong(0)).toSeq == Seq(1000013L))
  }

  test("CTAS with a hidden transform partitions the staged output") {
    spark.sql("DROP TABLE IF EXISTS graft.hp.ct")
    spark.sql("CREATE TABLE graft.hp.ct PARTITIONED BY (bucket(4, k)) AS " +
      "SELECT id AS k, id * 2 AS v FROM range(0, 400, 1, 2)")
    val es = entries("hp", "ct").filter(_.rows > 0)
    assert(es.nonEmpty)
    es.foreach { e =>
      val (lo, hi) = e.stats(PartTransform.PKey)
      assert(lo == hi, s"CTAS file ${e.file} must land bucket-pure")
    }
    val b = PartTransform.bucketLong(4, 55L)
    val q = spark.sql("SELECT v FROM graft.hp.ct WHERE k = 55")
    assert(q.rdd.getNumPartitions ==
      es.filter(_.stats(PartTransform.PKey)._1 == b)
        .map(e => math.max(1, e.rgs.size)).sum)
    assert(q.collect().map(_.getLong(0)).toSeq == Seq(110L))
  }

  test("NULL partition source values are rejected loudly") {
    spark.sql("DROP TABLE IF EXISTS graft.hp.nn")
    spark.sql("CREATE TABLE graft.hp.nn (k BIGINT, v BIGINT) " +
      "PARTITIONED BY (bucket(4, k))")
    val e = intercept[Exception] {
      spark.sql("INSERT INTO graft.hp.nn " +
        "SELECT CASE WHEN id = 5 THEN NULL ELSE id END, id " +
        "FROM range(0, 10, 1, 1)")
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("must not be NULL")),
      s"expected the NULL rejection, got: ${msgs(e)}")
  }

  test("a realized join-key IN (DPP runtime filter) prunes fact FILES " +
      "at execution time through the hidden bucket") {
    import spark.implicits._
    spark.sql("DROP TABLE IF EXISTS graft.hp.rf")
    spark.sql("CREATE TABLE graft.hp.rf (k BIGINT, v BIGINT) " +
      "PARTITIONED BY (bucket(8, k))")
    spark.sql("INSERT INTO graft.hp.rf SELECT id, id * 7 " +
      "FROM range(0, 200000, 1, 4)")
    // the dim predicate is an EXPRESSION equality: selective (so DPP
    // inserts), but NOT propagatable as a static IN onto the fact
    // side — the matching keys exist only after the build side runs.
    // (A literal IN would be constraint-propagated and statically
    // pruned — good, but then there is nothing left for DPP to prove.)
    val dim = spark.range(0, 200000).toDF("dk")
      .filter($"dk" % 97777L === 123L) // keys 123, 97900, 195677
    // two gates, both restored: Spark plans V2 runtime filtering only
    // when the scan is NOT key-grouped (the user picks SPJ or DPP per
    // workload; the SPJ flag's Spark default is off = DPP), and the
    // FACT side must not itself broadcast
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "false")
    // 2 MB: the dim (range estimate ~1.6 MB) broadcasts, the fact
    // (~3.2 MB) streams — the broadcast-reuse DPP shape
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "2097152")
    try {
      ManifestV2.rtFileSkipCount.reset()
      val q = spark.table("graft.hp.rf").join(dim, $"k" === $"dk")
        .select($"k", $"v")
      val rows = q.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(rows == Set((123L, 861L), (97900L, 685300L),
        (195677L, 1369739L)))
      assert(ManifestV2.rtFileSkipCount.sum() > 0L,
        "the realized key list must prune fact files at run time " +
          "(static pushdown cannot: the keys exist only after the " +
          "build side executes)")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    }
  }

  test("DDL rejects a transform whose column type cannot derive") {
    spark.sql("DROP TABLE IF EXISTS graft.hp.bad")
    val e = intercept[Exception] {
      spark.sql("CREATE TABLE graft.hp.bad (k BIGINT, s STRING) " +
        "PARTITIONED BY (days(s))")
    }
    assert(e.getMessage.contains("must be"), e.getMessage)
  }

  test("PARTITION EVOLUTION: re-bucketing is a metadata statement; " +
      "each era's files prune under the spec that wrote them; " +
      "compaction migrates to the current era") {
    spark.sql("DROP TABLE IF EXISTS graft.hp.ev")
    spark.sql("CREATE TABLE graft.hp.ev (k BIGINT, v BIGINT) " +
      "PARTITIONED BY (bucket(4, k))")
    spark.sql(
      "INSERT INTO graft.hp.ev SELECT id, id FROM range(0, 2000, 1, 2)")
    val eraA = entries("hp", "ev").map(_.file).toSet

    // evolve 4 -> 16 buckets: one commit, zero bytes rewritten
    val r = spark.sql("CALL graft.system.set_partitioning(" +
      "ns => 'hp', tbl => 'ev', spec => 'bucket(16, k)')").head()
    assert(r.getString(0) == "bucket(4,k)" && r.getLong(2) == 1L)
    assert(entries("hp", "ev").map(_.file).toSet == eraA,
      "evolution must not touch a single data file")

    spark.sql("INSERT INTO graft.hp.ev " +
      "SELECT id + 2000, id + 2000 FROM range(0, 2000, 1, 2)")
    val es = entries("hp", "ev")
    val (oldEra, newEra) = es.partition(e => eraA.contains(e.file))
    assert(oldEra.forall(e => e.stats.contains(PartTransform.PKey) &&
      !e.stats.contains("@p1")), "era-0 files carry only @p")
    assert(newEra.forall(e => e.stats.contains("@p1") &&
      !e.stats.contains(PartTransform.PKey)),
      "era-1 files carry only @p1")

    // a point lookup prunes BOTH eras, each under its own spec: era-0
    // files via bucket4(key) on @p, era-1 files via bucket16(key) on
    // @p1 — composed with the ordinary k-box pruning (each era holds
    // a disjoint key range here, so the box alone excludes the other
    // era; the bucket conjunct is what cuts WITHIN the owning era)
    def expectFiles(key: Long): Int = {
      val b4 = PartTransform.bucketLong(4, key)
      val b16 = PartTransform.bucketLong(16, key)
      es.count { e =>
        val boxOk = e.stats.get("k")
          .forall { case (lo, hi) => key >= lo && key <= hi }
        val eraOk =
          if (e.stats.contains(PartTransform.PKey))
            e.stats(PartTransform.PKey)._1 == b4
          else e.stats("@p1")._1 == b16
        boxOk && eraOk
      }
    }
    for (key <- Seq(123L, 2123L)) {
      val q = spark.sql(s"SELECT v FROM graft.hp.ev WHERE k = $key")
      assert(q.rdd.getNumPartitions == expectFiles(key),
        s"key $key must plan only its bucket's files in each era")
      assert(q.collect().map(_.getLong(0)).toSeq == Seq(key))
    }
    assert(spark.sql("SELECT CAST(SUM(v) AS BIGINT) FROM graft.hp.ev")
      .head().getLong(0) == (0L until 4000L).sum)

    // compaction migrates everything to the current era (and SPJ
    // eligibility with it): all live files now box under @p1
    spark.sql("CALL graft.system.compact(ns => 'hp', tbl => 'ev', " +
      "max_rows => 1000000)").collect()
    val after = entries("hp", "ev").filter(_.rows > 0)
    assert(after.forall(e => e.stats.get("@p1").exists(b => b._1 == b._2)),
      s"compacted files must be partition-pure under the CURRENT era: " +
        s"${after.map(_.stats.keySet)}")
    assert(spark.sql("SELECT CAST(SUM(v) AS BIGINT) FROM graft.hp.ev")
      .head().getLong(0) == (0L until 4000L).sum)
    // and with a single era live, the point lookup prunes to 1/16
    val q2 = spark.sql("SELECT v FROM graft.hp.ev WHERE k = 123")
    val b16 = PartTransform.bucketLong(16, 123L)
    assert(q2.rdd.getNumPartitions == after
      .filter(_.stats("@p1")._1 == b16)
      .map(e => math.max(1, e.rgs.size)).sum)
    assert(q2.collect().map(_.getLong(0)).toSeq == Seq(123L))
  }

  test("MULTI-TRANSFORM spec (days(ts), bucket(4, uid)) — the canonical " +
      "event-table layout: per-component point boxes, intersected " +
      "pruning, tuple SPJ with zero shuffle") {
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    spark.conf.set("spark.sql.requireAllClusterKeysForCoPartition", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      spark.sql("DROP TABLE IF EXISTS graft.hp.mt")
      spark.sql("CREATE TABLE graft.hp.mt (uid BIGINT, ts TIMESTAMP, " +
        "v BIGINT) PARTITIONED BY (days(ts), bucket(4, uid))")
      // 5 days x 40 uids; v = uid so values are checkable
      spark.sql("INSERT INTO graft.hp.mt SELECT id % 40, " +
        "timestampadd(HOUR, CAST((id DIV 40) * 24 AS INT), " +
        "TIMESTAMP '2024-06-01 00:00:00'), id % 40 " +
        "FROM range(0, 200, 1, 4)")
      val es = entries("hp", "mt").filter(_.rows > 0)
      es.foreach { e =>
        for (k <- Seq("@p.0", "@p.1")) {
          val (lo, hi) = e.stats(k)
          assert(lo == hi, s"file ${e.file} must be partition-pure on $k")
        }
      }
      val day0 = java.time.LocalDate.of(2024, 6, 1).toEpochDay
      assert(es.map(_.stats("@p.0")._1).toSet ==
        (day0 until day0 + 5).toSet)

      // a (time range AND uid) predicate intersects BOTH components'
      // pruning: only the one day's files in uid 7's bucket plan
      val b = PartTransform.bucketLong(4, 7L)
      val expect = es.count(e => e.stats("@p.0")._1 == day0 + 2 &&
        e.stats("@p.1")._1 == b)
      val q = spark.sql("SELECT v FROM graft.hp.mt WHERE uid = 7 " +
        "AND ts >= TIMESTAMP '2024-06-03 00:00:00' " +
        "AND ts < TIMESTAMP '2024-06-04 00:00:00'")
      assert(q.rdd.getNumPartitions == expect,
        s"expected the (day,bucket) intersection ($expect files)")
      assert(q.collect().map(_.getLong(0)).toSeq == Seq(7L))

      // tuple SPJ: a second table with the SAME layout joins on
      // (uid, ts) with no exchange anywhere
      spark.sql("DROP TABLE IF EXISTS graft.hp.mt2")
      spark.sql("CREATE TABLE graft.hp.mt2 (uid BIGINT, ts TIMESTAMP, " +
        "w BIGINT) PARTITIONED BY (days(ts), bucket(4, uid))")
      spark.sql("INSERT INTO graft.hp.mt2 SELECT id % 40, " +
        "timestampadd(HOUR, CAST((id DIV 40) * 24 AS INT), " +
        "TIMESTAMP '2024-06-01 00:00:00'), id % 40 + 100 " +
        "FROM range(0, 200, 1, 4)")
      val j = spark.sql("SELECT a.v, b.w FROM graft.hp.mt a " +
        "JOIN graft.hp.mt2 b ON a.uid = b.uid AND a.ts = b.ts")
      val plan = j.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"co-laid (days,bucket) tables must SPJ with no shuffle:\n$plan")
      val rows = j.collect()
      assert(rows.length == 200)
      assert(rows.forall(r => r.getLong(1) == r.getLong(0) + 100L))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    }
  }

  test("the V2 functions and the writer derivation agree (SQL-visible " +
      "bucket/days match PartTransform)") {
    val r = spark.sql(
      "SELECT graft.fn.bucket(8, CAST(1234 AS BIGINT)) AS b, " +
        "graft.fn.days(TIMESTAMP '2024-03-05 23:59:59') AS d, " +
        "graft.fn.truncate(1000, CAST(2500 AS BIGINT)) AS t, " +
        "graft.fn.months(TIMESTAMP '2024-03-05 00:00:00') AS m").head()
    assert(r.getLong(0) == PartTransform.bucketLong(8, 1234L))
    assert(r.getLong(1) == java.time.LocalDate.of(2024, 3, 5).toEpochDay)
    assert(r.getLong(2) == 2000L)
    assert(r.getLong(3) == (2024 - 1970) * 12L + 2L)
  }

  test("clustered writes SORT on the transforms and the task writer " +
      "ROTATES one open file: bounded write memory however many " +
      "partition tuples a backfill task receives") {
    import org.apache.spark.sql.types._
    import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
    // unit half: sorted (day, bucket) tuples through the rotating
    // writer — at most ONE parquet writer live, one file per tuple,
    // point boxes on both components
    val dir = java.nio.file.Files.createTempDirectory("graft-rotate")
    val schema = StructType(Seq(StructField("ts", TimestampType),
      StructField("uid", LongType)))
    val specs = Seq(PartTransform.Days("ts"),
      PartTransform.Bucket(4, "uid"))
    val w = new graft.sources.ManifestRotatePartWriter(dir.toString,
      schema, specs, plain = false, 0, 0L, None, PartTransform.PKey)
    val dayUs = 86400000000L
    val rows = (for { d <- 0 to 2; u <- 0L until 40L } yield
      (d * dayUs + u, u)).sortBy { case (ts, u) =>
        (PartTransform.daysOfMicros(ts), PartTransform.bucketLong(4, u))
      }
    var peak = 0
    rows.foreach { case (ts, u) =>
      w.write(new GenericInternalRow(Array[Any](ts, u)))
      peak = math.max(peak, w.liveWriters)
    }
    val msg = w.commit().asInstanceOf[graft.sources.ManifestMultiCommit]
    assert(peak == 1,
      s"rotating writer must hold at most one open file, saw $peak")
    val tuples = rows.map { case (ts, u) =>
      (PartTransform.daysOfMicros(ts), PartTransform.bucketLong(4, u))
    }.distinct
    assert(w.filesOpened == tuples.size &&
      msg.parts.size == tuples.size,
      s"${w.filesOpened} opens / ${msg.parts.size} files for " +
        s"${tuples.size} tuples")
    assert(msg.parts.forall(m =>
      m.stats.get("@p.0").exists(b => b._1 == b._2) &&
        m.stats.get("@p.1").exists(b => b._1 == b._2)),
      "every rotated file must carry point boxes on both components")

    // e2e half: ONE shuffle partition forces a single task to receive
    // all three days interleaved — the write's demanded local sort is
    // what makes rotation emit exactly one file per day (without it,
    // one per key-change run: ~30)
    spark.sql("DROP TABLE IF EXISTS graft.hp.rot")
    spark.sql("CREATE TABLE graft.hp.rot (k BIGINT, ts TIMESTAMP) " +
      "PARTITIONED BY (days(ts))")
    val old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "1")
    try spark.sql("INSERT INTO graft.hp.rot SELECT id, " +
      "timestampadd(DAY, CAST(id % 3 AS INT), " +
      "TIMESTAMP '2024-07-01 00:00:00') FROM range(0, 30, 1, 1)")
    finally spark.conf.set("spark.sql.shuffle.partitions", old)
    val es = entries("hp", "rot")
    assert(es.size == 3, s"one file per day, got ${es.size}")
    assert(es.forall(e =>
      e.stats.get(PartTransform.PKey).exists(b => b._1 == b._2)),
      "every file must stay partition-pure")
    assert(spark.sql("SELECT COUNT(*) FROM graft.hp.rot").head()
      .getLong(0) == 30L)
  }

  test("string-key equality DELETE on a bucket(4, s) table attaches " +
      "its sidecar ONLY to the key's bucket — other buckets stay " +
      "sidecar-free") {
    spark.sql("DROP TABLE IF EXISTS graft.hp.sdel")
    spark.sql("CREATE TABLE graft.hp.sdel (s STRING, v BIGINT) " +
      "PARTITIONED BY (bucket(4, s))")
    spark.sql("INSERT INTO graft.hp.sdel SELECT concat('user', id), id " +
      "FROM range(0, 400, 1, 2)")
    spark.sql("DELETE FROM graft.hp.sdel WHERE s = 'user17'")
    val es = entries("hp", "sdel")
    val b = PartTransform.bucketUtf8(4,
      org.apache.spark.unsafe.types.UTF8String.fromString("user17"))
    val (inBucket, others) = es.partition(
      _.stats(PartTransform.PKey)._1 == b)
    assert(inBucket.nonEmpty && inBucket.forall(_.deletes.nonEmpty),
      "the key's bucket files carry the equality sidecar")
    assert(others.nonEmpty && others.forall(_.deletes.isEmpty),
      s"other-bucket files must stay sidecar-free: " +
        s"${others.filter(_.deletes.nonEmpty).map(_.file)}")
    assert(spark.sql("SELECT COUNT(*) FROM graft.hp.sdel").head()
      .getLong(0) == 399L)
    assert(spark.sql(
      "SELECT COUNT(*) FROM graft.hp.sdel WHERE s = 'user17'").head()
      .getLong(0) == 0L)
    assert(spark.sql("SELECT CAST(SUM(v) AS BIGINT) FROM graft.hp.sdel")
      .head().getLong(0) == (0L until 400L).sum - 17L)
  }

  test("STREAMING INGEST into a (days(ts), bucket(4, uid)) table: " +
      "every epoch's files land partition-pure through one checkpoint, " +
      "time-range pruning works on the streamed table, and a replayed " +
      "epoch publishes nothing") {
    import spark.implicits._
    spark.sql("DROP TABLE IF EXISTS graft.hp.sev")
    spark.sql("CREATE TABLE graft.hp.sev (uid BIGINT, ts TIMESTAMP) " +
      "PARTITIONED BY (days(ts), bucket(4, uid))")
    val work = java.nio.file.Files.createTempDirectory("graft-sev")
    val src = work.resolve("src").toString
    val ck = work.resolve("ck").toString
    def push(day: String, uids: Seq[Long]): Unit =
      uids.map(u => (u, java.sql.Timestamp.valueOf(s"$day 0${u % 4}:00:00")))
        .toDF("uid", "ts").repartition(1)
        .write.format("graft.sources.ManifestV2")
        .option("path", src).mode("append").save()
    def pump(): Unit = {
      val q = spark.readStream.format("graft.sources.ManifestV2")
        .option("path", src).load()
        .writeStream.option("checkpointLocation", ck)
        .toTable("graft.hp.sev")
      try q.processAllAvailable() finally q.stop()
    }
    push("2024-07-01", 0L until 8L)
    pump() // epoch 0
    push("2024-07-02", 0L until 8L)
    pump() // epoch 1, same checkpoint
    val es = entries("hp", "sev")
    assert(es.nonEmpty && es.forall(e =>
      e.stats.get("@p.0").exists(b => b._1 == b._2) &&
        e.stats.get("@p.1").exists(b => b._1 == b._2)),
      s"every streamed file must carry point boxes on BOTH components: " +
        s"${es.map(e => (e.file, e.stats))}")
    // epoch attribution is in the staged names
    assert(es.exists(_.file.contains("-e0p")) &&
      es.exists(_.file.contains("-e1p")),
      s"files must attribute to their epochs: ${es.map(_.file)}")
    assert(spark.sql("SELECT COUNT(*) FROM graft.hp.sev").head()
      .getLong(0) == 16L)

    // time x user pruning off pure metadata, mid-stream layout
    val d2 = java.time.LocalDate.of(2024, 7, 2).toEpochDay
    val q = spark.sql("SELECT uid FROM graft.hp.sev WHERE " +
      "ts >= TIMESTAMP '2024-07-02 00:00:00' AND " +
      "ts < TIMESTAMP '2024-07-03 00:00:00' AND uid = 5")
    val expect = es.count { e =>
      e.stats("@p.0")._1 == d2 &&
        e.stats("@p.1")._1 == PartTransform.bucketLong(4, 5L) &&
        e.stats.get("uid").forall { case (lo, hi) => 5L >= lo && 5L <= hi }
    }
    assert(q.rdd.getNumPartitions == expect,
      s"day+bucket lookup must plan only the intersection ($expect)")
    assert(q.collect().map(_.getLong(0)).toSeq == Seq(5L))

    // replay guard: re-commit an already-led epoch directly — the
    // staged file is reclaimed, the manifest doesn't move
    val wh = spark.conf.get("spark.sql.catalog.graft.warehouse")
    val dir = java.nio.file.Paths.get(wh, "hp", "sev").toString
    val st = ManifestV2.readManifest(java.nio.file.Paths.get(dir)).get
    val (qid, lastEpoch) = st.epochs.head
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("uid",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("ts",
        org.apache.spark.sql.types.TimestampType)))
    val w = new graft.sources.ManifestPartitionedStreamingWrite(dir,
      schema, "days(ts)|bucket(4,uid)", qid, truncate = false,
      PartTransform.PKey, rotate = true)
    val dw = new graft.sources.ManifestPartitionedWriterFactory(dir,
      schema, "days(ts)|bucket(4,uid)")
      .createWriter(0, 99L, lastEpoch)
    dw.write(new org.apache.spark.sql.catalyst.expressions
      .GenericInternalRow(Array[Any](7L, 1719878400000000L)))
    val msg = dw.commit()
    w.commit(lastEpoch, Array(msg)) // replay of the led epoch
    val st2 = ManifestV2.readManifest(java.nio.file.Paths.get(dir)).get
    assert(st2.version == st.version && st2.files.size == st.files.size,
      "a replayed epoch must publish nothing")
    assert(spark.sql("SELECT COUNT(*) FROM graft.hp.sev").head()
      .getLong(0) == 16L)
  }
}
