package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Audit, Basket}

class AuditSpec extends AnyFunSuite {
  import TestSpark._

  test("dq audit: driver corpus is healthy (all checks zero) and the " +
    "check contract is fixed") {
    val rows = Audit.dqAudit(spark, sf).collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("bad_status", "dup_orderkey",
      "fk_custkey", "nonpositive_totalprice", "null_orderdate",
      "null_orderkey"))
    assert(rows.forall(_.getLong(1) == 0L),
      s"expected all-zero violations, got ${rows.mkString(", ")}")
  }

  test("assoc rules: confidence is a valid ppm, pair support is bounded " +
    "by both item supports, rules are never self-referential") {
    val r = Basket.assocRules(spark, sf).collect()
    assert(r.nonEmpty)
    r.foreach { row =>
      val (ant, con) = (row.getLong(0), row.getLong(1))
      val (sAb, sAnt, sCon, conf) =
        (row.getLong(2), row.getLong(3), row.getLong(4), row.getLong(5))
      assert(ant != con)
      assert(sAb >= 2 && sAb <= math.min(sAnt, sCon))
      assert(conf > 0 && conf <= 1000000L)
    }
  }

  test("assoc rules degeneracy: a mega-basket is capped before pairing " +
    "(O(cap^2), not O(n^2) candidates)") {
    import spark.implicits._
    val n = 500 // >> cap
    val mega = (1 to n).map(i => (1L, i.toLong)) ++
      // a few normal baskets so supports/rules exist at all
      Seq((2L, 1L), (2L, 2L), (3L, 1L), (3L, 2L))
    val out = Basket.assocRulesOf(mega.toDF("basket", "item"),
      minSupport = 2, k = 10000).collect()
    val cap = Basket.DefaultMaxItemsPerBasket
    // every surviving item id is within the capped prefix of the
    // mega-basket (lowest `cap` item ids kept)
    assert(out.forall(r => r.getLong(0) <= cap && r.getLong(1) <= cap))
    // the rule space is bounded by the CAPPED pair count, not n^2
    assert(out.length <= cap * (cap - 1))
  }

  test("corr moments: perfect linear -> +-1 within ulps, constant -> " +
    "null, moments are the exact integers") {
    import spark.implicits._
    // hour i carries value i dollars (pos), (23-i) dollars (neg), or a
    // constant (flat); ts = i hours in nanos so y = i
    val ev = (0 until 10).flatMap { i =>
      Seq(("pos", i.toLong * 3600000000000L, i.toDouble),
        ("neg", i.toLong * 3600000000000L, (23 - i).toDouble),
        ("flat", i.toLong * 3600000000000L, 7.0))
    }.toDF("event_type", "ts", "value")
    val rows = Audit.corrMomentsOf(ev).collect()
      .map(r => r.getString(0) -> r).toMap
    val pos = rows("pos")
    // x = 100*y for y=0..9: n=10, sx=4500, sy=45, sxy=100*285,
    // sxx=10000*285, syy=285
    assert((pos.getLong(1), pos.getLong(2), pos.getLong(3), pos.getLong(4),
      pos.getLong(5), pos.getLong(6)) ==
      ((10L, 4500L, 45L, 28500L, 2850000L, 285L)))
    assert(math.abs(pos.getDouble(7) - 1.0) < 1e-12)
    assert(math.abs(rows("neg").getDouble(7) + 1.0) < 1e-12)
    assert(rows("flat").isNullAt(7), "zero variance must yield NULL, not NaN")
  }

  test("ab test report: counts partition the exposed set, Wilson " +
    "brackets the point estimate, z matches a hand computation") {
    import org.apache.spark.sql.functions._
    val r = graft.operators.Audit.abTestReport(spark, sf).head()
    val (na, xa, nb, xb) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    val viewers = Tables.events(spark, sf)
      .filter(col("event_type") === "view").select("user_id").distinct().count()
    assert(na + nb == viewers)
    assert(xa <= na && xb <= nb && na > 0 && nb > 0)
    assert(xa > 0 && xa < na, "degenerate arm A: z/wilson would be 0/0")
    val (pa, pb) = (xa.toDouble / na, xb.toDouble / nb)
    val pp = (xa + xb).toDouble / (na + nb)
    val z = (pb - pa) / math.sqrt(pp * (1 - pp) * (1.0 / na + 1.0 / nb))
    assert(math.abs(r.getDouble(6) - z) < 1e-12)
    // Wilson 95% bounds bracket p-hat and sit inside [0, 1]
    val (lo, hi) = (r.getDouble(7), r.getDouble(8))
    assert(lo >= 0 && hi <= 1 && lo <= pa && pa <= hi && lo < hi)
    assert(r.getLong(4) == xa * 1000000L / na)
  }

  test("forget cascade: counts partition each table, the cascade is " +
    "referentially consistent, and fingerprints certify the survivors") {
    import org.apache.spark.sql.functions._
    val rows = Audit.forgetUserCascade(spark, sf).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(rows.keySet == Set("customer", "orders", "lineitem"))

    val cust = Tables.customer(spark, sf)
    val orders = Tables.orders(spark, sf)
    val li = Tables.lineitem(spark, sf)
    // deleted + surviving == table cardinality, per table
    assert(rows("customer")._1 + rows("customer")._2 == cust.count())
    assert(rows("orders")._1 + rows("orders")._2 == orders.count())
    assert(rows("lineitem")._1 + rows("lineitem")._2 == li.count())
    // the forget set is exactly the negative-balance customers
    assert(rows("customer")._1 ==
      cust.where(col("c_acctbal") < 0).count())
    // independent recompute of the orders leg via a semi join
    val doomedO = orders.join(
      cust.where(col("c_acctbal") < 0).select(col("c_custkey")),
      orders("o_custkey") === col("c_custkey"), "left_semi")
    assert(rows("orders")._1 == doomedO.count())
    // lineitem leg: every doomed lineitem's order is doomed
    assert(rows("lineitem")._1 == li.join(
      doomedO.select(col("o_orderkey")),
      li("l_orderkey") === col("o_orderkey"), "left_semi").count())
    // a survivor fingerprint changes if one survivor is dropped:
    // xor of a non-empty key set is nonzero here (collision-free at
    // this cardinality) and differs across tables
    assert(rows.values.map(_._3).toSet.size == 3)
  }
}
