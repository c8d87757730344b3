package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Sketches

class SketchesSpec extends AnyFunSuite {
  import TestSpark._

  test("hll-64 estimate tracks exact distinct across 2 orders of magnitude") {
    import spark.implicits._
    // 3 keys with 10 / 300 / 3000 distinct values (each value repeated
    // 3x to prove multiplicity doesn't bias the registers)
    val df = Seq("a" -> 10, "b" -> 300, "c" -> 3000).flatMap { case (k, n) =>
      (0 until n).flatMap(i => Seq.fill(3)((k, s"$k-$i")))
    }.toDF("k", "v")
    val out = Sketches.hllDistinctOf(df, col("k"), col("v"))
      .collect().map(r => (r.getString(0), r.getLong(1),
        r.getDouble(2))).toList
    assert(out.map(t => (t._1, t._2)) ==
      List(("a", 10L), ("b", 300L), ("c", 3000L)))
    // m=64 -> std err ~13%; 35% is a ~2.7 sigma band — deterministic
    // anyway (fixed hash), the band just documents the accuracy class
    out.foreach { case (k, exact, est) =>
      assert(math.abs(est - exact) / exact < 0.35,
        s"$k: est $est vs exact $exact")
    }
  }

  test("hll: NULL values are excluded identically on exact and sketch paths") {
    import spark.implicits._
    val df = Seq(("a", Some("x")), ("a", Some("y")), ("a", None),
      ("b", None), ("b", None)).toDF("k", "v")
    val out = Sketches.hllDistinctOf(df, col("k"), col("v"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toList
    // key 'a': NULL not counted (COUNT(DISTINCT) semantics); key 'b'
    // has only NULLs -> no row at all, same as the oracle
    assert(out == List(("a", 2L)), s"NULLs must not count: $out")
  }

  test("kmv set ops: jaccard estimate tracks known overlaps") {
    import spark.implicits._
    // a: 1..300, b: 101..400 (J = 200/400 = 0.5), c: 1000..1299 (disjoint)
    val rel = ((1 to 300).map(i => ("a", i.toLong)) ++
      (101 to 400).map(i => ("b", i.toLong)) ++
      (1000 to 1299).map(i => ("c", i.toLong)))
      .toDF("event_type", "user_id")
    val out = Sketches.kmvSetOpsOf(rel).collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (r.getDouble(3), r.getLong(4), r.getLong(5)))).toMap
    val (jab, iab, uab) = out(("a", "b"))
    assert(iab == 200 && uab == 400, "exact audit columns")
    // K = 64 -> sigma ~ sqrt(J(1-J)/K) ~ 0.0625; 0.2 is a 3-sigma band
    assert(math.abs(jab - 0.5) < 0.2, s"J(a,b) est $jab for true 0.5")
    val (jac, iac, _) = out(("a", "c"))
    assert(iac == 0 && jac == 0.0, "disjoint sets estimate exactly zero")
    // small sets: |union| < K makes the estimate EXACT (divisor = |union|)
    val tiny = Seq(("x", 1L), ("x", 2L), ("x", 3L), ("x", 4L),
      ("y", 3L), ("y", 4L), ("y", 5L), ("y", 6L))
      .toDF("event_type", "user_id")
    val t = Sketches.kmvSetOpsOf(tiny).collect()(0)
    assert(t.getDouble(3) == 2.0 / 6.0 && t.getLong(4) == 2 && t.getLong(5) == 6,
      "under-K sets: estimator degenerates to the exact jaccard")
  }

  test("column profile: one scan, stats match direct aggregates") {
    import spark.implicits._
    val p = Sketches.profileColumns(spark, sf)
    // single-pass: the expanded multi-distinct aggregate reads the
    // parquet exactly once
    assert(p.queryExecution.executedPlan.toString
      .sliding("Scan parquet".length).count(_ == "Scan parquet") == 1)
    val rows = p.collect().map(r => r.getString(0) -> r).toMap
    assert(rows.size == Sketches.ProfileCols.size)
    val ev = Tables.events(spark, sf)
    val n = ev.count()
    assert(rows.values.forall(_.getAs[Long]("n_rows") == n))
    val directDistinct = ev.select(countDistinct($"event_type")).head().getLong(0)
    assert(rows("event_type").getAs[Long]("n_distinct") == directDistinct)
    val (mn, mx) = ev.agg(min($"value"), max($"value")).as[(Double, Double)].head()
    assert(rows("value").getAs[Double]("min_num") == mn)
    assert(rows("value").getAs[Double]("max_num") == mx)
    assert(rows("value").getAs[Any]("min_str") == null)
    assert(rows("event_type").getAs[Any]("min_num") == null)
  }

  test("histogram quantiles: reported edge is within one bin of the exact rank value") {
    import spark.implicits._
    val got = Sketches.histogramQuantiles(spark, sf).collect()
      .map(r => r.getString(0) -> r).toMap
    val byKey = Tables.events(spark, sf)
      .select($"event_type", $"value").as[(String, Double)]
      .collect().groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    for ((k, vals) <- byKey; p <- Sketches.QuantilePcts) {
      val exact = vals((vals.length * p + 99) / 100 - 1) // ceil rank, 1-based
      val edge = got(k).getAs[Double](s"p$p")
      assert(edge <= exact && exact < edge + Sketches.QuantileBinWidth,
        s"$k p$p: edge $edge vs exact $exact")
    }
  }

  test("histogram quantiles: hand case picks the ceil-rank bin") {
    import spark.implicits._
    // 4 values -> p50 threshold = ceil(0.5*4) = 2nd value's bin
    val df = Seq(("k", 0.1), ("k", 0.9), ("k", 5.0), ("k", 7.3)).toDF("k", "v")
    val r = Sketches.histogramQuantilesOf(df, $"k", $"v").head()
    assert(r.getAs[Long]("total") == 4L)
    assert(r.getAs[Double]("p50") == 0.5)  // 0.9 lives in bin [0.5, 1.0)
    assert(r.getAs[Double]("p95") == 7.0)  // 4th value 7.3 -> bin [7.0, 7.5)
  }

  test("cms never underestimates; collision-free hand case is exact") {
    import spark.implicits._
    val got = Sketches.cmsHeavyHitters(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.nonEmpty && got.forall { case (_, exact, cms) => cms >= exact },
      "count-min collisions can only inflate")
    // 2 items in 4x1024 buckets: no collisions, estimates are exact
    val hand = Sketches.cmsHeavyHittersOf(
      Seq(1L, 1L, 1L, 2L).toDF("v")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(hand == Seq((1L, 3L, 3L), (2L, 1L, 1L)))
  }

  test("hll registers max-merge: split halves merged == whole corpus") {
    import spark.implicits._
    val df = (0 until 2000).map(i => ("k", s"v$i")).toDF("k", "v")
    val whole = Sketches.hllRegistersOf(df, col("k"), col("v"))
      .collect().map(r => (r.getLong(1), r.getInt(2))).toMap
    val lo = Sketches.hllRegistersOf(
      df.filter(substring($"v", 2, 10).cast("int") < 1000), col("k"), col("v"))
    val hi = Sketches.hllRegistersOf(
      df.filter(substring($"v", 2, 10).cast("int") >= 1000), col("k"), col("v"))
    val merged = lo.union(hi).groupBy($"k", $"reg")
      .agg(max($"r").as("r"))
      .collect().map(r => (r.getLong(1), r.getInt(2))).toMap
    assert(merged == whole)
  }
  test("bitmap set ops: literal sets give exact intersections and " +
    "bitmap cardinalities equal COUNT DISTINCT") {
    import spark.implicits._
    val got = graft.operators.Sketches.bitmapSetOps(spark, TestSpark.sf)
      .collect().map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))))
    assert(got.nonEmpty)
    val ev = Tables.events(spark, TestSpark.sf)
    got.foreach { case ((a, b), (na, nb, ni, nu)) =>
      val sa = ev.filter($"event_type" === a)
        .select($"user_id").distinct().collect().map(_.getLong(0)).toSet
      val sb = ev.filter($"event_type" === b)
        .select($"user_id").distinct().collect().map(_.getLong(0)).toSet
      assert(na === sa.size.toLong && nb === sb.size.toLong)
      assert(ni === sa.intersect(sb).size.toLong)
      assert(nu === sa.union(sb).size.toLong)
    }
  }

  test("hll daily merge: cross-day register merge equals the one-shot sketch") {
    import spark.implicits._
    val merged = Sketches.hllDailyMerge(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    val oneShot = Sketches.hllDistinct(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(merged.keySet === oneShot.keySet)
    merged.foreach { case (k, (nDays, nExact, est)) =>
      assert(nDays > 1L, s"$k: the merge must fold more than one daily sketch")
      assert(nExact === oneShot(k)._1)
      // max is associative over the day partitioning: identical registers,
      // identical estimate — bit-for-bit
      assert(est === oneShot(k)._2,
        s"$k: merged estimate $est != one-shot ${oneShot(k)._2}")
    }
  }

  test("histogram daily merge: sum-merged daily bins equal the one-shot quantiles") {
    import spark.implicits._
    val merged = Sketches.histogramDailyMerge(spark, sf).collect().toSeq
    val oneShot = Sketches.histogramQuantiles(spark, sf).collect().toSeq
    assert(merged.nonEmpty && merged.map(_.toSeq) === oneShot.map(_.toSeq),
      "SUM algebra over the day partitioning must be lossless")
  }

  test("sliding-window HLL: window merge of daily sketches == direct " +
    "sketch of the window's raw events; estimate tracks exact") {
    import spark.implicits._
    val rows = Sketches.hllSlidingWindow(spark, sf).collect()
    assert(rows.nonEmpty)
    val ev = Tables.events(spark, sf).filter($"user_id".isNotNull)
      .withColumn("d", expr("ts div 86400000000000"))
    // pick a mid-corpus day with a full window behind it
    val midDay = rows.map(_.getLong(0)).sorted.apply(rows.length / 2)
    val windowEv = ev.filter($"d".between(midDay - 6, midDay))
    // mergeability: the stored-sketch path must equal the one-shot
    // sketch built directly from that window's raw events
    val direct = Sketches.estimateFromRegisters(
        Sketches.hllRegistersOf(windowEv.withColumn("k", lit(1L)),
          $"k", $"user_id"))
      .head().getDouble(1)
    val viaDaily = rows.find(_.getLong(0) == midDay).get.getDouble(2)
    assert(math.abs(direct - viaDaily) < 1e-9,
      s"daily-merge $viaDaily vs direct $direct")
    // accuracy: within HLL-64's expected error of the exact count
    val exact = windowEv.select($"user_id").distinct().count()
    assert(math.abs(viaDaily - exact) <= 0.30 * exact,
      s"estimate $viaDaily vs exact $exact")
    // edge windows fold fewer days
    assert(rows.head.getLong(1) <= 7 && rows.forall(_.getLong(1) >= 1))
  }

  test("rfm segments: balanced quintiles, digit domains, best spender is m=1") {
    val rows = graft.operators.Relational.rfmSegments(spark, sf).collect()
    assert(rows.nonEmpty)
    def digit(seg: Int, pos: Int) = (seg / math.pow(10, pos).toInt) % 10
    rows.foreach { r =>
      val seg = r.getInt(4)
      Seq(0, 1, 2).foreach(p => assert(digit(seg, p) >= 1 && digit(seg, p) <= 5))
    }
    // NTILE balance: each quintile's size differs by at most 1
    Seq(0, 1, 2).foreach { p =>
      val sizes = rows.groupBy(r => digit(r.getInt(4), p)).values.map(_.length)
      assert(sizes.max - sizes.min <= 1, s"digit $p sizes: $sizes")
    }
    // the single highest spender carries m_score 1 (ties broken by id)
    val top = rows.minBy(r => (-r.getLong(3), r.getLong(0)))
    assert(digit(top.getInt(4), 0) == 1)
  }
}
