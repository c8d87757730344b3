package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Relational, Retrieval}

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
}
