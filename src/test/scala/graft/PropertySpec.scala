package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Algebraic invariants over generated datasets (SURVEY §5): the
  * operator laws that must hold for ANY input, not just the corpus.
  */
class PropertySpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  // raw ScalaCheck (the scalatest bridge isn't in the offline cache):
  // 8 deterministic samples per property
  private def forAll[A](g: Gen[A])(f: A => Unit): Unit =
    (0 until 8).foreach(i => f(g.pureApply(Gen.Parameters.default, Seed(i.toLong))))
  private def forAll[A, B](g1: Gen[A], g2: Gen[B])(f: (A, B) => Unit): Unit =
    (0 until 8).foreach { i =>
      f(g1.pureApply(Gen.Parameters.default, Seed(i.toLong)),
        g2.pureApply(Gen.Parameters.default, Seed(i.toLong + 100)))
    }

  private val rows = Gen.listOfN(60,
    Gen.zip(Gen.chooseNum(0, 9), Gen.chooseNum(0, 19), Gen.chooseNum(0.0, 100.0)))

  test("top-k is a prefix of the full descending sort") {
    forAll(rows, Gen.chooseNum(1, 10)) { (xs, k) =>
      val df = xs.toDF("u", "s", "v")
      val full = df.orderBy($"v".desc, $"u", $"s").collect().toSeq
      val topk = df.orderBy($"v".desc, $"u", $"s").limit(k).collect().toSeq
      assert(topk == full.take(k))
    }
  }

  test("union is bag-additive: counts add up per key") {
    forAll(rows, rows) { (xs, ys) =>
      val a = xs.toDF("u", "s", "v"); val b = ys.toDF("u", "s", "v")
      val unioned = a.unionByName(b).groupBy("u").count()
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      val ca = a.groupBy("u").count().collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      val cb = b.groupBy("u").count().collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      val expect = (ca.keySet ++ cb.keySet)
        .map(k => k -> (ca.getOrElse(k, 0L) + cb.getOrElse(k, 0L))).toMap
      assert(unioned == expect)
    }
  }

  test("anti-join result is disjoint from the right side and covers the rest") {
    forAll(rows, rows) { (xs, ys) =>
      val a = xs.toDF("u", "s", "v").select("s").distinct()
      val b = ys.toDF("u", "s", "v").select("s").distinct()
      val anti = a.join(b, Seq("s"), "left_anti")
      assert(anti.intersect(b).count() == 0)
      assert(anti.count() + a.intersect(b).count() == a.count())
    }
  }

  test("quantile bucket levels are monotone in the value") {
    forAll(rows) { xs =>
      val df = xs.toDF("u", "s", "v")
      val qs = df.groupBy($"u").agg(
        percentile_approx($"v", array(lit(0.2), lit(0.4), lit(0.6), lit(0.8)),
          lit(10000)).as("q"))
      val lv = df.join(qs, "u").select($"u", $"v",
        when($"v" >= $"q" (3), 5).when($"v" >= $"q" (2), 4)
          .when($"v" >= $"q" (1), 3).when($"v" >= $"q" (0), 2)
          .otherwise(1).as("level"))
        .collect().map(r => (r.getInt(0), r.getDouble(1), r.getInt(2)))
      lv.groupBy(_._1).values.foreach { g =>
        val sorted = g.sortBy(_._2)
        assert(sorted.sliding(2).forall {
          case Array(x, y) => x._3 <= y._3; case _ => true
        }, "higher value never gets a lower level within a user")
        assert(g.forall(t => t._3 >= 1 && t._3 <= 5))
      }
    }
  }

  test("codegen'd dot products are bit-identical to the HOF fold") {
    // the whole oracle strategy for vector queries rests on this
    // equality: custom-expression dot == aggregate(zip_with) fold ==
    // DuckDB list_inner_product, all left-to-right double adds
    import graft.plans.FloatDotProduct.{doubleDot, floatDot}
    val vec = Gen.listOfN(64, Gen.chooseNum(-1.0, 1.0))
    forAll(vec, vec) { (a, b) =>
      val af = a.map(_.toFloat); val bf = b.map(_.toFloat)
      val df = Seq((af, bf)).toDF("a", "b")
      val gotF = df.select(floatDot($"a", $"b")).head().getDouble(0)
      val refF = df.select(
        aggregate(zip_with($"a".cast("array<double>"), $"b".cast("array<double>"),
          (x, y) => x * y), lit(0.0), (s, x) => s + x)).head().getDouble(0)
      assert(java.lang.Double.doubleToLongBits(gotF) ==
        java.lang.Double.doubleToLongBits(refF), "float_dot == HOF fold")
      val dd = Seq((a, b)).toDF("a", "b")
      val gotD = dd.select(doubleDot($"a", $"b")).head().getDouble(0)
      val refD = dd.select(aggregate(zip_with($"a", $"b", (x, y) => x * y),
        lit(0.0), (s, x) => s + x)).head().getDouble(0)
      assert(java.lang.Double.doubleToLongBits(gotD) ==
        java.lang.Double.doubleToLongBits(refD), "double_dot == HOF fold")
    }
  }

  test("df cap is the identity when no shingle exceeds the cap") {
    forAll(Gen.listOfN(30, Gen.zip(Gen.chooseNum(0L, 9L), Gen.chooseNum(0L, 200L)))) { xs =>
      val sh = xs.distinct.toDF("doc_id", "h")
      val capped = graft.operators.Dedup.capDf(sh, maxDf = 1000L)
      assert(capped.exceptAll(sh).count() == 0 && sh.exceptAll(capped).count() == 0)
    }
  }

  test("dropDuplicates keeps exactly one row per key") {
    forAll(rows) { xs =>
      val df = xs.toDF("u", "s", "v")
      val dd = df.dropDuplicates("u")
      assert(dd.count() == df.select("u").distinct().count())
      assert(dd.groupBy("u").count().filter($"count" > 1).count() == 0)
    }
  }

  // unique (key, ts, ord) triples with negative and colliding timestamps
  private val asofSide = Gen.listOfN(40,
    Gen.zip(Gen.chooseNum(0L, 4L), Gen.chooseNum(-20L, 20L)))

  test("asofJoin equals an independent max_by formulation on random data") {
    forAll(asofSide, asofSide) { (ls, rs) =>
      val left = ls.zipWithIndex
        .map { case ((k, t), i) => (k, t, i.toLong) }.toDF("k", "ts", "lid")
      val right = rs.zipWithIndex
        .map { case ((k, t), i) => (k, t, 1000L + i) }.toDF("k", "rts", "rid")
      val got = graft.operators.Temporal
        .asofJoin(left, right, Seq("k"), "ts", "rts", "lid", "rid", Seq("rid"))
        .select($"lid", $"asof_rid")
        .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
      // independent formulation: theta-join candidates, keep the
      // (rts, rid)-max per left row, left-outer for unmatched
      val naive = left.join(right, left("k") === right("k") &&
            $"rts" <= $"ts", "left")
        .groupBy($"lid")
        .agg(max_by($"rid", struct($"rts", $"rid")).as("pick"))
        .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
      assert(got == naive)
    }
  }

  test("rangeJoin equals the theta join on random data incl. negative ts") {
    forAll(asofSide, asofSide) { (as, bs) =>
      val a = as.zipWithIndex
        .map { case ((k, t), i) => (k, t, i.toLong) }.toDF("k", "ts", "aid")
      val b = bs.zipWithIndex
        .map { case ((k, t), i) => (k, t, 1000L + i) }.toDF("k", "bts", "bid")
      val tol = 3L
      val got = graft.operators.Temporal
        .rangeJoin(a, b, Seq("k"), "ts", "bts", tol, Seq("bid"))
        .select($"aid", $"near_bid").as[(Long, Long)].collect()
      val want = a.join(b, a("k") === b("k") && abs($"ts" - $"bts") <= tol)
        .select($"aid", $"bid").as[(Long, Long)].collect()
      assert(got.sorted.toSeq == want.sorted.toSeq,
        "every in-tolerance pair exactly once, trunc-div buckets included")
    }
  }
}
