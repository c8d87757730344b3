package graft

import graft.operators.{Audit, Temporal}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Supervised-pipeline operators: exact-AUC classifier eval, horizon
  * label generation, and the point-in-time feature join.
  */
class EvalSpec extends AnyFunSuite {
  import TestSpark._

  test("binary eval: exact midrank AUC and ppm metrics on the corpus") {
    import spark.implicits._
    val row = Audit.binaryClassifierEval(spark, sf).collect().head
    val (n, nPos, tp, fp, tn, fn) = (row.getLong(0), row.getLong(1),
      row.getLong(2), row.getLong(3), row.getLong(4), row.getLong(5))
    assert(n === Tables.events(spark, sf).count())
    assert(tp + fp + tn + fn === n && tp + fn === nPos)
    assert(nPos > 0 && n - nPos > 0, "both classes must be present")
    val auc = row.getDouble(9)
    assert(auc > 0.0 && auc < 1.0)
    // cross-check AUC against the O(n log n) in-memory rank computation
    val scored = Tables.events(spark, sf)
      .select(($"value".cast("decimal(18,2)") * 100).cast("long").as("c"),
        when($"event_type" === "purchase", 1L).otherwise(0L).as("p"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val byScore = scored.sortBy(_._1)
    var i = 0; var r1x2 = 0L
    while (i < byScore.length) {
      var j = i
      while (j < byScore.length && byScore(j)._1 == byScore(i)._1) j += 1
      val posInGroup = byScore.slice(i, j).count(_._2 == 1L)
      r1x2 += posInGroup.toLong * ((i + 1).toLong + j.toLong) // 2*avg rank
      i = j
    }
    val n1 = scored.count(_._2 == 1L).toLong
    val n0 = scored.length - n1
    val wantAuc = (r1x2 - n1 * (n1 + 1)).toDouble / (2L * n1 * n0).toDouble
    assert(auc === wantAuc, s"engine AUC $auc vs reference $wantAuc")
  }

  test("binary eval: tiny fixture with ties gives the textbook values") {
    // scores: pos {10, 20}, neg {10, 5}: groups 5(n),10(p,n),20(p)
    // midranks: 5->1, 10->2.5, 20->4; R1 = 2.5+4 = 6.5
    // AUC = (6.5 - 2*3/2) / (2*2) = 3.5/4 = 0.875
    import spark.implicits._
    val cum = Seq((5L, 1L, 0L, 0L), (10L, 2L, 1L, 1L), (20L, 1L, 1L, 3L))
      .toDF("cents", "cnt", "cnt_pos", "cum")
    val got = cum.agg(
        sum($"cnt").as("n"), sum($"cnt_pos").as("n_pos"),
        sum($"cnt_pos" * ($"cum" * 2 + $"cnt" + 1)).as("auc2num"))
      .select((($"auc2num" - $"n_pos" * ($"n_pos" + 1)).cast("double") /
        ($"n_pos" * ($"n" - $"n_pos") * 2).cast("double")).as("auc"))
      .collect().head.getDouble(0)
    assert(got === 0.875)
  }

  test("label horizon: in-window purchase labels 1, outside labels 0, " +
    "never-clicked users are absent") {
    import spark.implicits._
    val day = 86400L * 1000000L
    // u1: click t0, purchase t0+2d -> 1; u2: click t0, purchase t0+8d -> 0
    // u3: click only -> 0; u4: purchase only -> absent
    val rows = Seq(
      (1L, 1L, 0L, "click"), (2L, 1L, 2 * day, "purchase"),
      (3L, 2L, 0L, "click"), (4L, 2L, 8 * day, "purchase"),
      (5L, 3L, 0L, "click"), (6L, 4L, day, "purchase"))
      .toDF("event_id", "user_id", "tsu", "event_type")
    val anchors = rows.filter($"event_type" === "click")
      .groupBy($"user_id").agg(min($"tsu").as("first_click_tsu"))
    val purchases = rows.filter($"event_type" === "purchase")
      .select($"user_id", $"tsu".as("p_tsu"))
    val got = anchors.join(purchases, Seq("user_id"), "left")
      .groupBy($"user_id", $"first_click_tsu")
      .agg(max(when($"p_tsu" > $"first_click_tsu" &&
          $"p_tsu" <= $"first_click_tsu" + Temporal.LabelHorizonUs, 1L)
        .otherwise(0L)).as("label"))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got === Map(1L -> 1L, 2L -> 0L, 3L -> 0L))
  }

  test("point-in-time join: features are as-of the label, never after") {
    import spark.implicits._
    val got = Temporal.pointInTimeJoin(spark, sf).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      if (!r.isNullAt(4)) {
        assert(r.getLong(4) <= r.getLong(2),
          "click feature timestamp must not exceed the label timestamp")
        assert(r.getLong(5) >= 0L, "staleness must be non-negative")
      }
      if (!r.isNullAt(7))
        assert(r.getLong(7) <= r.getLong(2),
          "error feature timestamp must not exceed the label timestamp")
    }
    // at least one label has no prior error (LEFT semantics exercised)
    assert(got.exists(_.isNullAt(6)) || got.forall(!_.isNullAt(6)))
  }

  test("ranking metrics: textbook values on a hand-built fixture") {
    import spark.implicits._
    import graft.operators.RankingEval
    // ranked list: songs 1..5 at ranks 1..5
    val topk = (1 to 5).map(i => (i, i.toLong)).toDF("song_id", "rank")
    // user 10: relevant {1, 3}  -> first=1, hits=2, MRR=1,
    //   DCG = w1+w3, IDCG = w1+w2, AP = (1/1 + 2/3)/2
    // user 20: relevant {4}     -> first=4, MRR=1/4, AP = 1/4
    // user 30: relevant {99}    -> no hit, all zeros
    val rel = Seq((10, 1), (10, 3), (20, 4), (30, 99))
      .toDF("user_id", "song_id")
    val got = RankingEval.metricsOf(rel, topk, 5)
      .collect().map(r => r.getInt(0) -> r).toMap
    val w = RankingEval.dcgWeightNano
    val u10 = got(10)
    assert(u10.getLong(2) === 1L && u10.getLong(3) === 2L)
    assert(u10.getLong(4) === 1000000L)
    assert(u10.getLong(5) === (w(0) + w(2)) * 1000000L / (w(0) + w(1)))
    assert(u10.getLong(6) === (1000000L + 2000000L / 3L) / 2L)
    val u20 = got(20)
    assert(u20.getLong(2) === 4L && u20.getLong(4) === 250000L)
    assert(u20.getLong(6) === 250000L)
    val u30 = got(30)
    assert(u30.getLong(2) === 0L && u30.getLong(3) === 0L &&
      u30.getLong(4) === 0L && u30.getLong(5) === 0L &&
      u30.getLong(6) === 0L)
  }

  test("ranking metrics: corpus invariants and metric consistency") {
    import spark.implicits._
    val rows = graft.operators.RankingEval.rankingMetrics(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nTest, first, hits, mrr, ndcg, ap) = (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))
      assert(hits <= nTest && hits <= 20)
      assert(ndcg <= 1000000L && ap <= 1000000L && mrr <= 1000000L)
      if (first == 0L) assert(hits == 0L && mrr == 0L && ndcg == 0L && ap == 0L)
      else assert(mrr === 1000000L / first && hits >= 1L)
    }
    // the popularity baseline must actually hit for someone at sf0.001
    assert(rows.exists(_.getLong(3) > 0L))
  }

  test("ks drift: exact sup-gap matches the in-memory ECDF reference") {
    import spark.implicits._
    val row = Audit.ksDrift(spark, sf).collect().head
    val (na, nb, dNum) = (row.getLong(0), row.getLong(1), row.getLong(2))
    val cents = Tables.events(spark, sf)
      .filter($"event_type".isin("click", "purchase"))
      .select(($"value".cast("decimal(18,2)") * 100).cast("long").as("c"),
        ($"event_type" === "click").as("isA"))
      .collect().map(r => (r.getLong(0), r.getBoolean(1)))
    val a = cents.filter(_._2).map(_._1).sorted
    val b = cents.filterNot(_._2).map(_._1).sorted
    assert(na === a.length.toLong && nb === b.length.toLong)
    val support = (a ++ b).distinct.sorted
    val want = support.map { x =>
      val ca = a.count(_ <= x).toLong
      val cb = b.count(_ <= x).toLong
      math.abs(ca * nb - cb * na)
    }.max
    assert(dNum === want, s"engine D_num $dNum vs reference $want")
    assert(row.getLong(3) === dNum * 1000000L / (na * nb))
    assert(row.getDouble(4) === dNum.toDouble / (na * nb).toDouble)
  }

  test("lift table: bins partition the corpus, capture folds to 100%") {
    import spark.implicits._
    val rows = Audit.scoreLiftTable(spark, sf).collect()
    assert(rows.length > 1)
    val ev = Tables.events(spark, sf)
    val n = ev.count()
    val nPos = ev.filter($"event_type" === "purchase").count()
    assert(rows.map(_.getLong(1)).sum === n)
    assert(rows.map(_.getLong(2)).sum === nPos)
    // rows come back ordered by bin ascending; the lowest bin's
    // descending-cumulative capture covers every positive
    assert(rows.head.getLong(6) === 1000000L)
    // capture is monotone non-increasing in bin order
    rows.sliding(2).foreach { case Array(lo, hi) =>
      assert(lo.getLong(6) >= hi.getLong(6))
    }
    rows.foreach { r =>
      assert(r.getLong(4) === r.getLong(2) * 1000000L / r.getLong(1))
    }
  }

  test("crossval folds: folds partition the corpus, rmse recomputes in-memory") {
    import spark.implicits._
    val rows = Audit.crossvalFolds(spark, sf).collect()
    assert(rows.length === Audit.CvFolds)
    val n = Tables.events(spark, sf).count()
    assert(rows.map(_.getLong(2)).sum === n)
    rows.foreach(r => assert(r.getLong(1) + r.getLong(2) === n))
    // recompute fold 0's held-out rmse from the raw cents
    val cents = Tables.events(spark, sf)
      .select($"event_id",
        ($"value".cast("decimal(18,2)") * 100).cast("long").as("c"))
      .collect()
      .map(r => (graft.operators.Dedup.hash60Local(
        s"cv:${r.getLong(0)}") % Audit.CvFolds, r.getLong(1)))
    val f0 = cents.filter(_._1 == 0L).map(_._2)
    val rest = cents.filter(_._1 != 0L).map(_._2)
    val mean = rest.sum / rest.length
    val wantRmse = math.sqrt(
      f0.map(c => (c - mean) * (c - mean)).sum.toDouble / f0.length)
    val r0 = rows.find(_.getInt(0) == 0).get
    assert(r0.getLong(3) === mean)
    assert(r0.getDouble(4) === wantRmse)
  }

  test("neyman allocation: weights recompute from exact moments, budget respected") {
    import spark.implicits._
    val rows = Audit.neymanAllocation(spark, sf).collect()
    assert(rows.length > 1)
    val cents = Tables.events(spark, sf)
      .select($"event_type",
        ($"value".cast("decimal(18,2)") * 100).cast("long").as("c"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    var sumW = 0L
    rows.foreach { r =>
      val xs = cents(r.getString(0))
      assert(r.getLong(1) === xs.length.toLong)
      val v = BigInt(xs.length) * xs.map(x => BigInt(x) * BigInt(x)).sum -
        BigInt(xs.sum) * BigInt(xs.sum)
      assert(BigInt(r.getString(2)) === v)
      val w = math.floor(math.sqrt(v.toDouble)).toLong
      assert(r.getLong(3) === w)
      sumW += w
    }
    rows.foreach { r =>
      assert(r.getLong(4) === Audit.NeymanBudget * r.getLong(3) / sumW)
    }
    // floor allocations never exceed the budget
    assert(rows.map(_.getLong(4)).sum <= Audit.NeymanBudget)
    // the high-variance stratum gets more than proportional somewhere,
    // or the design is degenerate on this corpus
    assert(rows.exists(r => r.getLong(4) != r.getLong(5)))
  }
}
