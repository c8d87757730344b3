package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Graph, Relational, Retrieval}

/** BM25 retrieval, event funnel, and the Q3-shaped headline join. */
class RetrievalSpec extends AnyFunSuite {
  import TestSpark._

  test("bm25: k rows, total score-desc order, tf/dl consistent with text") {
    val rows = Retrieval.bm25TopK(spark, sf, k = 10).collect()
    assert(rows.length == 10)
    val scores = rows.map(_.getAs[Double]("score"))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    // tie-break makes the order total: equal scores ascend by doc_id
    rows.zip(rows.tail).foreach { case (a, b) =>
      if (a.getAs[Double]("score") == b.getAs[Double]("score"))
        assert(a.getAs[Long]("doc_id") < b.getAs[Long]("doc_id"))
    }
  }

  test("bm25: hand-checkable corpus scores the saturating tf formula") {
    import spark.implicits._
    val docs = Seq(
      (0L, "cat dog"), (1L, "cat cat cat cat"), (2L, "fish fish")
    ).toDF("doc_id", "text")
    val out = Retrieval.bm25TopKOf(docs, Seq("cat"), k = 3).collect()
    // N=3, df=2 -> idf = (3-2+0.5)/(2+0.5) = 0.6; avgdl = 8/3
    def score(tf: Double, dl: Double): Double = {
      val avgdl = 8.0 / 3
      val norm = 1.2 * ((1.0 - 0.75) + (0.75 * (dl / avgdl)))
      0.6 * ((tf * 2.2) / (tf + norm))
    }
    // tf saturation puts the tf=4 doc first, but by < 4x the tf=1 score
    assert(out.map(_.getAs[Long]("doc_id")).take(2).toSeq == Seq(1L, 0L))
    assert(math.abs(out(0).getAs[Double]("score") - score(4, 4)) < 1e-12)
    assert(math.abs(out(1).getAs[Double]("score") - score(1, 2)) < 1e-12)
    assert(out(2).getAs[Double]("score") == 0.0) // fish doc: tf=0
    assert(out(0).getAs[Double]("score") <
      4 * out(1).getAs[Double]("score") * (4.0 / 2)) // saturated
  }

  test("funnel: greedy walk equals the chained-min definition on an edge corpus") {
    import spark.implicits._
    // ts in NANOS (funnelStepsOf divides by 1000 like Tables.events
    // consumers); user 1 completes all 4; user 2's view precedes
    // signup (stalls at 1); user 3 has view AT the signup instant
    // (strictly-after excludes it); user 4 repeats stages (first
    // qualifying wins)
    def ns(us: Long) = us * 1000
    val ev = Seq(
      (1L, ns(10), "signup"), (1L, ns(20), "view"), (1L, ns(30), "click"),
      (1L, ns(40), "purchase"),
      (2L, ns(5), "view"), (2L, ns(10), "signup"),
      (3L, ns(10), "signup"), (3L, ns(10), "view"),
      (4L, ns(10), "signup"), (4L, ns(20), "view"), (4L, ns(15), "view"),
      (4L, ns(25), "click")
    ).toDF("user_id", "ts", "event_type")
    val out = Relational.funnelStepsOf(ev, Relational.FunnelStages)
      .collect().map(r => r.getAs[Long]("user_id") ->
        (r.getAs[Int]("n_stages"), Option(r.getAs[Any]("t_view")))).toMap
    assert(out(1L) == ((4, Some(20L))))
    assert(out(2L) == ((1, None)))   // view before signup doesn't count
    assert(out(3L) == ((1, None)))   // same-instant view excluded (strict >)
    assert(out(4L)._1 == 3)
    val t4 = Relational.funnelStepsOf(ev, Relational.FunnelStages)
      .filter(col("user_id") === 4).head()
    assert(t4.getAs[Long]("t_view") == 15L) // earliest qualifying view
  }

  test("funnel: stage counts are monotone (a user reaching k reached k-1)") {
    val df = Relational.funnelSteps(spark, sf)
    val byStage = Relational.FunnelStages.indices.map { i =>
      df.filter(col("n_stages") > i).count()
    }
    assert(byStage.zip(byStage.tail).forall { case (a, b) => a >= b })
    assert(byStage.head > 0)
  }

  test("negative samples: never a positive, bounded per user, rerun-identical") {
    import spark.implicits._
    val neg = Retrieval.negativeSamples(spark, sf)
    val pos = Relational.ratings(spark, sf)
      .select($"user_id", $"song_id").distinct()
    assert(neg.join(pos,
      neg("user_id") === pos("user_id") &&
        neg("neg_song_id") === pos("song_id")).count() == 0,
      "a drawn item the user interacted with must be filtered out")
    val perUser = neg.groupBy($"user_id").count()
      .agg(max("count")).head().getLong(0)
    assert(perUser <= Retrieval.NegativeDraws)
    assert(neg.filter($"draw" < 0 || $"draw" >= Retrieval.NegativeDraws)
      .count() == 0)
    // RNG-free: a retrain sees the same negatives
    val again = Retrieval.negativeSamples(spark, sf)
    assert(neg.exceptAll(again).count() == 0 && again.exceptAll(neg).count() == 0)
  }

  test("table diff classifies added/removed/changed and drops unchanged rows") {
    import spark.implicits._
    val v1 = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("doc_id", "text")
    val v2 = Seq((1L, "a"), (2L, "B"), (4L, "d")).toDF("doc_id", "text")
    val got = Relational.tableDiffOf(v1, v2).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got == Seq((2L, "changed"), (3L, "removed"), (4L, "added")),
      s"unchanged doc 1 must not appear: $got")
  }

  test("pagerank: hub of a star ranks first, leaves tie, mass ~conserved") {
    import spark.implicits._
    // star: 0 <-> {1,2,3,4}: hub collects every leaf's full rank
    val edges = (1 to 4).flatMap(i => Seq((0L, i.toLong), (i.toLong, 0L)))
      .toDF("src", "dst")
    val r = graft.operators.Graph.pagerankOf(edges).collect()
      .map(row => (row.getLong(0), row.getLong(1)))
    assert(r.head._1 == 0L, s"hub must rank first: ${r.toSeq}")
    val leaves = r.tail.map(_._2)
    assert(leaves.distinct.length == 1, "leaves are symmetric -> equal ranks")
    assert(r.head._2 > 2 * leaves.head, "hub collects all leaf mass")
    // integer floors only LOSE mass, never create it
    val total = r.map(_._2).sum
    assert(total <= graft.operators.Graph.RankScale &&
      total > graft.operators.Graph.RankScale * 9 / 10)
    // deterministic: a rerun is bit-identical
    val again = graft.operators.Graph.pagerankOf(edges).collect()
      .map(row => (row.getLong(0), row.getLong(1)))
    assert(r.sameElements(again))
  }

  test("triangle counts: closed triple found once per member, wedges excluded") {
    import spark.implicits._
    // triangle 1-2-3, plus a dangling edge 3-4 (wedge 2-3-4 is open)
    val und = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L))
    val edges = und.flatMap { case (a, b) => Seq((a, b), (b, a)) }
      .toDF("src", "dst")
    val got = graft.operators.Graph.triangleCountsOf(edges).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == Seq((1L, 1L), (2L, 1L), (3L, 1L)),
      s"each triangle member participates once, node 4 in none: $got")
  }

  test("label propagation: cliques converge to distinct communities, " +
    "rerun is bit-identical") {
    import spark.implicits._
    // two triangles bridged by one edge: within-clique plurality beats
    // the single bridge vote, so each clique keeps its own label
    val und = Seq((1L, 2L), (2L, 3L), (1L, 3L),
      (10L, 11L), (11L, 12L), (10L, 12L), (3L, 10L))
    val edges = und.flatMap { case (a, b) => Seq((a, b), (b, a)) }
      .toDF("src", "dst")
    val got = graft.operators.Graph.labelPropagationOf(edges).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val cliqueA = Set(1L, 2L, 3L).map(got)
    val cliqueB = Set(10L, 11L, 12L).map(got)
    assert(cliqueA.size == 1, s"clique A must agree on one label: $got")
    assert(cliqueB.size == 1, s"clique B must agree on one label: $got")
    assert(cliqueA != cliqueB, s"the bridge must not merge the cliques: $got")
    val again = graft.operators.Graph.labelPropagationOf(edges).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == again)
  }

  test("item similarity: exact cos2-ppm on a literal fixture, cap " +
    "bounds the pair space, rerun bit-identical") {
    import spark.implicits._
    // u1,u2 rate {1,2}; u3 rates {1,3}: n1=3, n2=2, n3=1;
    // c(1,2)=2 -> cos2 = 4e6//6 = 666666; c(1,3)=1 -> 1e6//3 = 333333
    val pos = Seq((101L, 1L), (101L, 2L), (102L, 1L), (102L, 2L),
      (103L, 1L), (103L, 3L)).toDF("user_id", "song_id")
    val got = graft.operators.Graph.itemSimilarityTopKOf(pos, k = 5)
      .collect().map(r =>
        (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.toSeq == Seq(
      (1L, 1, 2L, 2L, 666666L), (1L, 2, 3L, 1L, 333333L),
      (2L, 1, 1L, 2L, 666666L),
      (3L, 1, 1L, 1L, 333333L)), s"got: ${got.toSeq}")
    // a power user rating 30 items with cap=3 contributes 3 choose 2
    // oriented pairs, not 435
    val power = (1 to 30).map(i => (7L, i.toLong)).toDF("user_id", "song_id")
    val capped = graft.operators.Graph.itemSimilarityTopKOf(
      power, k = 100, maxItemsPerUser = 3).collect()
    assert(capped.length == 6, // 3 pairs mirrored both directions
      s"cap must bound the pair space: ${capped.length}")
    val again = graft.operators.Graph.itemSimilarityTopKOf(pos, k = 5)
      .collect().map(r =>
        (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.sameElements(again))
  }

  test("co-rating edge build: power user bounded to O(cap^2), not O(N^2)") {
    import spark.implicits._
    // one pathological user rated 1000 items; uncapped this is 10^6
    // directed pairs — capped it must be exactly cap*(cap-1)
    val cap = 20
    val pos = (1 to 1000).map(i => (7L, i.toLong))
      .toDF("user_id", "song_id")
    val edges = graft.operators.Graph.coRatingEdgesOf(pos, cap)
    assert(edges.count() == cap.toLong * (cap - 1),
      "per-user candidates must be bounded by the item cap")
    // deterministic selection: popularity ties broken by song_id, so
    // the kept items are exactly songs 1..cap and a rerun is identical
    val kept = edges.select($"src").distinct().as[Long].collect().sorted.toSeq
    assert(kept == (1L to cap.toLong))
    // a normal user under the cap is untouched
    val small = (1 to 5).map(i => (1L, i.toLong)).toDF("user_id", "song_id")
    assert(graft.operators.Graph.coRatingEdgesOf(small, cap).count() == 20)
  }

  test("graph components: two components labeled by their minimum, " +
    "sizes exact, isolated nodes absent") {
    import spark.implicits._
    // path 1-2-3 and pair 10-11 (symmetric directed edges, as the
    // co-rating build emits); node 99 never appears in an edge
    val edges = Seq((1, 2), (2, 1), (2, 3), (3, 2), (10, 11), (11, 10))
      .toDF("src", "dst")
    val got = graft.operators.Graph.graphComponentsOf(edges).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2))).toSeq
    assert(got == Seq((1, 1, 3L), (2, 1, 3L), (3, 1, 3L),
      (10, 10, 2L), (11, 10, 2L)), got.toString)
  }

  test("shipping priority: broadcast join + TakeOrderedAndProject, no global sort") {
    val df = Relational.shippingPriority(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"))
    assert(plan.contains("BroadcastHashJoin"))
    assert(!plan.contains("CartesianProduct"))
    val rows = df.collect()
    assert(rows.nonEmpty && rows.length <= 10)
    val revs = rows.map(_.getAs[Double]("revenue"))
    assert(revs.zip(revs.tail).forall { case (a, b) => a >= b })
  }

  test("rrf fusion: scores recompute from ranks, fused order is total") {
    val rows = Retrieval.rrfFusion(spark, sf).collect()
    assert(rows.nonEmpty)
    val byQuery = rows.groupBy(_.getLong(0))
    assert(byQuery.keySet === (0 until Retrieval.FusionQueries)
      .map(_.toLong).toSet)
    byQuery.foreach { case (_, qRows) =>
      assert(qRows.length === Retrieval.FusionOut)
      qRows.foreach { r =>
        val (semR, lexR, rrf) = (r.getLong(3), r.getLong(4), r.getLong(5))
        assert(semR > 0L || lexR > 0L, "fused item must come from a source")
        val want =
          (if (semR > 0L) Retrieval.RrfNano / (Retrieval.RrfK + semR) else 0L) +
          (if (lexR > 0L) Retrieval.RrfNano / (Retrieval.RrfK + lexR) else 0L)
        assert(rrf === want)
      }
      // rank_fused must order by (rrf desc, id)
      val sorted = qRows.sortBy(r => (-r.getLong(5), r.getLong(2)))
      assert(sorted.map(_.getLong(1)).sameElements(
        (1 to Retrieval.FusionOut).map(_.toLong)))
    }
    // somewhere, the two modalities must actually fuse (an item present
    // in BOTH source lists) — otherwise the operator degenerates to
    // interleaving and the test corpus isn't exercising the overlap
    assert(rows.exists(r => r.getLong(3) > 0L && r.getLong(4) > 0L),
      "no fused item carried both a semantic and a lexical rank")
  }

  test("link prediction: path fixture closes the open wedge; corpus " +
    "predictions are non-edges") {
    import spark.implicits._
    // path 1-2-3: the only non-adjacent pair is (1,3), closed via
    // center 2 with Jaccard 1/1 (capped in-degrees: 1 each, cn 1)
    val edges = Seq((1, 2), (2, 1), (2, 3), (3, 2)).toDF("src", "dst")
    val got = Graph.linkPredictionOf(edges).collect()
    assert(got.length === 1)
    assert(got.head.getInt(0) === 1 && got.head.getInt(1) === 3)
    assert(got.head.getLong(2) === 1L)
    assert(got.head.getLong(3) === 1000000L)
    // corpus: exercised (non-empty), and no prediction is an edge
    val corpus = Graph.linkPrediction(spark, sf).collect()
    assert(corpus.nonEmpty, "link prediction must be exercised at sf0.001")
    val edgeSet = Graph.significantCoEdges(spark, sf).collect()
      .map(r => (r.getInt(0), r.getInt(1))).toSet
    corpus.foreach { r =>
      assert(!edgeSet.contains((r.getInt(0), r.getInt(1))),
        "predicted pair is already an edge")
      assert(r.getLong(3) <= 1000000L)
    }
  }

  test("rec coverage: counts reconcile against the underlying rec lists") {
    import spark.implicits._
    val row = Graph.recCoverage(spark, sf).collect().head
    val (cat, nRec, covPpm, slots, sharePpm) = (row.getLong(0),
      row.getLong(1), row.getLong(2), row.getLong(3), row.getLong(4))
    val recs = Graph.itemSimilarityTopK(spark, sf).collect()
    assert(slots === recs.length.toLong)
    val byOther = recs.groupBy(_.get(2)).view.mapValues(_.length).toMap
    assert(nRec === byOther.size.toLong)
    assert(covPpm === nRec * 1000000L / cat && covPpm <= 1000000L)
    val topSlots = byOther.values.toSeq.sorted.reverse
      .take(Graph.CoverageTopN).map(_.toLong).sum
    assert(sharePpm === topSlots * 1000000L / slots)
  }

  test("posting lists: delta coding compresses every top term below raw 64-bit") {
    val rows = graft.operators.Retrieval.postingListStats(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (df, gapBits, rawBits, ppm) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(rawBits == df * 64)
      assert(gapBits >= df, "every delta costs at least 1 bit")
      assert(ppm == gapBits * 1000000 / rawBits)
      assert(ppm < 1000000, s"top-df term must compress: $ppm ppm")
    }
    // the highest-df term has the densest gaps → best ratio of the set
    val best = rows.map(_.getLong(4)).min
    assert(rows.head.getLong(4) == best ||
      rows.head.getLong(4) < 250000,
      "head term should be among the most compressible")
  }

  test("pointer doubling: a depth-100 chain closes in 7 rounds, not 100") {
    import spark.implicits._
    // pure chain 0←1←2…←100; naive iteration needs 100 joins, doubling
    // needs ⌈log2 100⌉ = 7
    val ptr0 = (0L to 100L).map(i =>
        if (i == 0) (i, 0L, 0L) else (i, i - 1, 1L))
      .toDF("node", "anc", "d")
    val closed = Graph.pointerDoublingClosure(ptr0, rounds = 7)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(closed.size == 101)
    (0L to 100L).foreach { i =>
      assert(closed(i) == ((0L, i)), s"node $i root/depth wrong") }
    // 6 rounds (2^6 = 64 < 100) must NOT fully close — proves the
    // round count is doing real work, not masking a fixed point
    val under = Graph.pointerDoublingClosure(ptr0, rounds = 6)
      .filter(org.apache.spark.sql.functions.col("anc") =!= 0L).count()
    assert(under > 0)
  }

  test("pointer doubling keeps orphans (ancestor id absent from relation)") {
    import spark.implicits._
    // node 5's parent 999 was never loaded — the closure must keep the
    // row at its dangling pointer, not silently drop it through the
    // self-join; the well-formed chain beside it still closes fully
    val ptr0 = Seq((0L, 0L, 0L), (1L, 0L, 1L), (2L, 1L, 1L), (5L, 999L, 1L))
      .toDF("node", "anc", "d")
    val closed = Graph.pointerDoublingClosure(ptr0, rounds = 4)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(closed.size == 4, "orphan row must survive every round")
    assert(closed(5L) == ((999L, 1L)), "orphan pointer must stay put")
    assert(closed(2L) == ((0L, 2L)) && closed(1L) == ((0L, 1L)))
  }

  test("hierarchy rollup: doubling matches a driver-side recursive walk") {
    val got = Graph.hierarchyRollup(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))).toMap
    // brute force on the collected fixture (500 docs at sf0.001)
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "n_chars").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    def walk(id: Long): (Long, Long) = {  // (root, depth)
      var cur = id; var d = 0L
      while (cur >= Graph.HierarchyRoots) { cur = cur / 2; d += 1 }
      (cur, d)
    }
    val brute = docs.map { case (id, nc) =>
      val (root, depth) = walk(id); (root, depth, nc)
    }.groupBy(_._1).map { case (root, xs) =>
      root -> ((xs.length.toLong, xs.map(_._2).max, xs.map(_._2).sum,
        xs.map(_._3).sum))
    }
    assert(got === brute)
    assert(got.keySet == (0L until Graph.HierarchyRoots).toSet)
  }
}
