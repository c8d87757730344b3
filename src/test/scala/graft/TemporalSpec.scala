package graft

import graft.operators.Temporal
import org.scalatest.funsuite.AnyFunSuite

/** As-of and range join semantics + the plan shapes that make them
  * scale (one hash exchange for as-of; an equi shuffle join — never a
  * nested loop — for the bucketed range join).
  */
class TemporalSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def leftDF = Seq(
    (1L, 100L, 10L), (1L, 200L, 11L), (2L, 50L, 12L), (3L, 10L, 13L)
  ).toDF("k", "ts", "lid")

  test("asofJoin: latest right row at-or-before, per key, nulls when none") {
    val right = Seq(
      (1L, 100L, 77L), (1L, 150L, 88L), (1L, 201L, 66L), (2L, 60L, 99L)
    ).toDF("k", "rts", "rid")
    val out = Temporal.asofJoin(leftDF, right, Seq("k"), "ts", "rts",
        "lid", "rid", Seq("rid", "rts"))
      .orderBy("k", "ts")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1),
        Option(r.get(3)).map(_.asInstanceOf[Long]),
        Option(r.get(4)).map(_.asInstanceOf[Long])))
      .toSeq
    assert(out == Seq(
      (1L, 100L, Some(77L), Some(100L)), // equal timestamp IS visible
      (1L, 200L, Some(88L), Some(150L)), // 201 is in the future
      (2L, 50L, None, None),             // nearest right row is later
      (3L, 10L, None, None)))            // key absent on the right
  }

  test("asofJoin: equal-timestamp tie resolves to the greatest rightOrd") {
    val right = Seq((1L, 100L, 5L), (1L, 100L, 9L), (1L, 100L, 7L))
      .toDF("k", "rts", "rid")
    val out = Temporal.asofJoin(leftDF.filter($"k" === 1), right, Seq("k"),
        "ts", "rts", "lid", "rid", Seq("rid"))
      .orderBy("ts").collect().map(_.getLong(3)).toSeq
    assert(out == Seq(9L, 9L))
  }

  test("rangeJoin equals the naive theta join, pair for pair") {
    val ev = Tables.events(spark, sf)
      .selectExpr("event_id", "user_id", "ts div 1000 AS tsu", "event_type")
    val a = ev.filter($"event_type" === "error")
      .select($"event_id", $"user_id", $"tsu")
    val b = ev.filter($"event_type" === "click")
      .select($"user_id", $"tsu".as("bts"), $"event_id".as("bid"))
    val tol = 300L * 1000000L
    val got = Temporal.rangeJoin(a, b, Seq("user_id"), "tsu", "bts", tol,
        Seq("bid"))
      .select($"event_id", $"near_bid").as[(Long, Long)].collect().toSet
    val want = a.join(b, "user_id")
      .filter(org.apache.spark.sql.functions.abs($"tsu" - $"bts") <= tol)
      .select($"event_id", $"bid").as[(Long, Long)].collect().toSet
    assert(want.nonEmpty, "fixture must produce at least one pair")
    assert(got == want)
  }

  test("asofJoin plans exactly one hash exchange, nothing quadratic") {
    val right = Seq((1L, 100L, 77L)).toDF("k", "rts", "rid")
    val p = Temporal.asofJoin(leftDF, right, Seq("k"), "ts", "rts",
      "lid", "rid", Seq("rid")).queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1,
      s"as-of is one shuffle on the key:\n$p")
    assert(!p.contains("NestedLoop") && !p.contains("Cartesian"),
      s"as-of must never plan a quadratic join:\n$p")
  }

  test("rangeJoin plans an equi join on (key, bucket), never a nested loop") {
    val ev = Tables.events(spark, sf)
      .selectExpr("event_id", "user_id", "ts div 1000 AS tsu", "event_type")
    val a = ev.filter($"event_type" === "error")
      .select($"event_id", $"user_id", $"tsu")
    val b = ev.filter($"event_type" === "click")
      .select($"user_id", $"tsu".as("bts"), $"event_id".as("bid"))
    val p = Temporal.rangeJoin(a, b, Seq("user_id"), "tsu", "bts",
        300L * 1000000L, Seq("bid"))
      .queryExecution.executedPlan.toString
    assert(p.contains("__bucket"), "join key must include the time bucket")
    assert(!p.contains("NestedLoop") && !p.contains("Cartesian"),
      s"range join must stay an equi join:\n$p")
  }

  test("sax motifs: shared symbol patterns across users, loners excluded") {
    import spark.implicits._
    def ns(us: Long) = us * 1000
    // users 1 and 2 trace the same level pattern (a,b,c,d = values
    // 10, 70, 140, 200) at different times; user 3's series visits
    // distinct levels (e,f,g,h = 300, 330, 390, 450) shared by no one
    val mk = (uid: Long, base: Long, vals: Seq[Double]) =>
      vals.zipWithIndex.map { case (v, i) =>
        (uid, uid * 1000 + i, ns(base + i * 10), v)
      }
    val ev = (mk(1L, 0L, Seq(10, 70, 140, 200)) ++
      mk(2L, 100L, Seq(10, 70, 140, 200)) ++
      mk(3L, 200L, Seq(300, 330, 390, 450)))
      .toDF("user_id", "event_id", "ts", "value")
    val got = Temporal.saxMotifsOf(ev).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq(("abcd", 2L, 2L)),
      s"only the cross-user word qualifies: $got")
  }

  test("sax motifs: symbolization order follows event time, not arrival") {
    import spark.implicits._
    def ns(us: Long) = us * 1000
    // same events, one user's rows deliberately out of time order in
    // the input: the sorted walk must still produce the time-ordered
    // word
    val ev = Seq(
      (1L, 11L, ns(30), 140.0), (1L, 12L, ns(10), 10.0),
      (1L, 13L, ns(40), 200.0), (1L, 14L, ns(20), 70.0),
      (2L, 21L, ns(100), 10.0), (2L, 22L, ns(110), 70.0),
      (2L, 23L, ns(120), 140.0), (2L, 24L, ns(130), 200.0)
    ).toDF("user_id", "event_id", "ts", "value")
    val got = Temporal.saxMotifsOf(ev).collect()
      .map(r => r.getString(0)).toSeq
    assert(got == Seq("abcd"))
  }

  test("ewma: seeded integer halving fold in event order; singleton = itself") {
    import spark.implicits._
    // user 1: cents 1000, 2000, 600 -> ((1000+2000)/2 + 600)/2 = 1050
    // user 2: single event -> its own cents
    // rows arrive out of event order; the sorted fold must not care
    val ev = Seq((1L, 13L, 6.0), (1L, 11L, 10.0), (1L, 12L, 20.0),
      (2L, 21L, 3.5)).toDF("user_id", "event_id", "value")
    val got = Temporal.ewmaValueOf(ev).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq((1L, 3L, 1050L), (2L, 1L, 350L)), s"got $got")
  }

  test("sax motifs: out-of-domain values clamp to the edge levels") {
    import spark.implicits._
    def ns(us: Long) = us * 1000
    // negative values must bin to level 0 (not throw on element_at <= 0)
    // and oversized values to the top level, matching the oracle's
    // GREATEST/LEAST clamps
    val mk = (uid: Long, base: Long, vals: Seq[Double]) =>
      vals.zipWithIndex.map { case (v, i) =>
        (uid, uid * 1000 + i, ns(base + i * 10), v)
      }
    val ev = (mk(1L, 0L, Seq(-50, -0.1, 9999, 200)) ++
      mk(2L, 100L, Seq(-5, 0, 5000, 200)))
      .toDF("user_id", "event_id", "ts", "value")
    val got = Temporal.saxMotifsOf(ev).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == Seq(("aahd", 2L)), s"clamped word expected: $got")
  }

  test("rolling distinct users: hand-computed 7-day windows, gap days " +
    "absent, trailing phantom days trimmed") {
    import spark.implicits._
    val dayNs = 86400000000000L
    val d0 = 20000L
    // u1 and u2 active on d0; u1 again on d0+8; nothing else
    val ev = Seq((1L, d0 * dayNs + 1L), (2L, d0 * dayNs + 2L),
      (1L, (d0 + 8) * dayNs + 3L)).toDF("user_id", "ts")
    val got = Temporal.rollingDistinctUsersOf(ev).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val want = (0L to 6L).map(i => (d0 + i, 2L)) :+ (d0 + 8, 1L)
    // d0+7's window [d0+1, d0+7] holds no events -> absent;
    // d0+9..d0+14 would be pure explode phantoms -> trimmed at max day
    assert(got == want, s"got $got")
  }

  test("gap fill: last value per day wins (event_id tiebreak), gaps " +
    "carry the previous day's value, spans are dense") {
    import spark.implicits._
    val dayNs = 86400000000000L
    val d0 = 20000L
    val ev = Seq(
      (7L, d0 * dayNs + 100L, 1L, 5.0), // d0, earlier
      (7L, d0 * dayNs + 200L, 2L, 7.0), // d0, later -> day value 7.0
      (7L, (d0 + 2) * dayNs + 1L, 3L, 9.0), // d0+2
      (8L, d0 * dayNs + 50L, 4L, 1.5), // tie on ts with id 5:
      (8L, d0 * dayNs + 50L, 5L, 2.5)) // higher event_id wins -> 2.5
      .toDF("user_id", "ts", "event_id", "value")
    val got = Temporal.gapFillDailyOf(ev).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val want = Seq((7L, d0, 7.0), (7L, d0 + 1, 7.0), (7L, d0 + 2, 9.0),
      (8L, d0, 2.5))
    assert(got == want, s"got $got")
  }

  test("anomaly z-score: a 3-sigma spike fires, an in-band value and a " +
    "zero-variance history never do") {
    import spark.implicits._
    // user 1: 20-event alternating 10.00/12.00 history (mean 11.00,
    // sigma 1.00), then a 100.00 spike (z = 89) and an in-band 11.50
    // (z = 0.5). user 2: constant history -> variance 0, and the
    // strict > means even a repeat of the constant never fires.
    val hist1 = (0 until 20).map(i =>
      (1L, i.toLong * 1000000000L, i.toLong, if (i % 2 == 0) 10.0 else 12.0))
    val probe1 = Seq(
      (1L, 20L * 1000000000L, 20L, 100.0),
      (1L, 21L * 1000000000L, 21L, 11.5))
    val user2 = (0 until 12).map(i => (2L, i.toLong * 1000000000L, i.toLong, 50.0))
    val ev = (hist1 ++ probe1 ++ user2)
      .toDF("user_id", "ts", "event_id", "value")
    val got = Temporal.anomalyZscoreOf(ev).collect()
      .map(r => (r.getLong(1), r.getLong(0))).toSeq
    // only the spike fires: (user 1, event 20). The 11.5 probe's
    // trailing window CONTAINS the spike, which inflates sigma far
    // above the probe's deviation - it stays quiet.
    assert(got == Seq((1L, 20L)), s"got $got")
    // first AnomalyMinN-1 events of any user can never fire (n guard)
    val early = Temporal.anomalyZscoreOf(ev)
      .filter($"event_id" < (Temporal.AnomalyMinN - 1)).count()
    assert(early == 0L)
  }

  test("open orders sweep equals brute-force per-day interval counting") {
    import spark.implicits._
    val got = Temporal.openOrdersDaily(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toMap
    // brute force: count intervals covering each emitted breakpoint day
    val iv = Tables.orders(spark, sf)
      .join(Tables.lineitem(spark, sf)
          .groupBy($"l_orderkey")
          .agg(org.apache.spark.sql.functions.expr(
            "max(datediff(CAST(l_shipdate AS DATE), DATE '1970-01-01'))")
            .as("su")),
        $"o_orderkey" === $"l_orderkey")
      .selectExpr(
        "CAST(datediff(CAST(o_orderdate AS DATE), DATE '1970-01-01') AS BIGINT) AS d0",
        "GREATEST(CAST(datediff(CAST(o_orderdate AS DATE), DATE '1970-01-01') AS BIGINT), CAST(su AS BIGINT)) AS d1")
      .as[(Long, Long)].collect()
    assert(iv.forall { case (d0, d1) => d0 <= d1 },
      "clamp invariant: no inverted interval survives")
    got.foreach { case (day, cnt) =>
      val brute = iv.count { case (d0, d1) => d0 <= day && day <= d1 }
      assert(cnt == brute, s"day $day: sweep $cnt vs brute $brute")
    }
    // the step function ends at zero: all intervals eventually close
    assert(got.maxBy(_._1)._2 == 0L)
  }
  test("position attribution: credits sum to exactly 1,000,000 ppm per " +
    "purchase and U-shape favors first/last touches") {
    import TestSpark._
    import spark.implicits._
    val got = graft.operators.Temporal.positionAttribution(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2),
        r.getLong(3), r.getLong(4)))
    assert(got.nonEmpty, "corpus must contain attributed purchases")
    got.groupBy(_._1).foreach { case (pid, touches) =>
      assert(touches.map(_._5).sum === 1000000L,
        s"purchase $pid credits sum to ${touches.map(_._5).sum}")
      val n = touches.head._4
      assert(touches.length === n.toInt)
      if (n >= 3) {
        val byPos = touches.sortBy(_._3)
        assert(byPos.head._5 >= 400000L && byPos.last._5 === 400000L)
        assert(byPos.tail.init.forall(_._5 <= 200000L))
      }
    }
  }
  test("trend slope: exact-moment OLS matches the closed form on a " +
    "literal series, and OHLC bars pin deterministic open/close") {
    import TestSpark._
    import spark.implicits._
    // y = 100 + 50x at x in {0,1,2}: slope 50, intercept 100
    val m = Seq((0L, 100L), (1L, 150L), (2L, 200L))
      .toDF("x", "y")
      .agg(org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("n"),
        org.apache.spark.sql.functions.sum($"x").as("sx"),
        org.apache.spark.sql.functions.sum($"y").as("sy"),
        org.apache.spark.sql.functions.sum($"x" * $"y").as("sxy"),
        org.apache.spark.sql.functions.sum($"x" * $"x").as("sxx"))
      .select(
        (($"n" * $"sxy" - $"sx" * $"sy").cast("double") /
          ($"n" * $"sxx" - $"sx" * $"sx").cast("double")).as("slope"))
      .collect().head.getDouble(0)
    assert(m === 50.0)
    val driver = graft.operators.Temporal.trendSlope(spark, sf).collect()
    assert(driver.nonEmpty && driver.forall(!_.isNullAt(6)))
    // OHLC: open/close come from the bar's earliest/latest event
    val bars = graft.operators.Temporal.ohlcBars(spark, sf).collect()
    assert(bars.nonEmpty)
    bars.foreach { b =>
      val (open, high, low, close) =
        (b.getLong(2), b.getLong(3), b.getLong(4), b.getLong(5))
      assert(high >= low, "high >= low")
      assert(close <= high && close >= low, "close within [low, high]")
      assert(open <= high && open >= low, "open within [low, high]")
    }
  }

  test("as-of directions: backward <=, forward >=, equal-ts visible to both") {
    import spark.implicits._
    val left = Seq((1L, 100L), (2L, 200L), (3L, 50L))
      .toDF("event_id", "tsu").withColumn("user_id", org.apache.spark.sql.functions.lit(7L))
    val right = Seq((10L, 90L), (11L, 200L), (12L, 310L))
      .toDF("rid", "rtsu").withColumn("user_id", org.apache.spark.sql.functions.lit(7L))
    val T = graft.operators.Temporal
    def m(df: org.apache.spark.sql.DataFrame, c: String) =
      df.collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(r.fieldIndex(c))) -1L else r.getLong(r.fieldIndex(c)))).toMap
    val b = m(T.asofJoin(left, right, Seq("user_id"), "tsu", "rtsu",
      "event_id", "rid", Seq("rid", "rtsu")), "asof_rid")
    assert(b == Map(1L -> 10L, 2L -> 11L, 3L -> -1L))  // 3: nothing <= 50
    val f = m(T.asofJoinForward(left, right, Seq("user_id"), "tsu", "rtsu",
      "event_id", "rid", Seq("rid", "rtsu")), "next_rid")
    assert(f == Map(1L -> 11L, 2L -> 11L, 3L -> 10L))  // 2: equal ts visible
  }

  test("rolling median: lower-median hand case; interpolation bridges " +
    "gaps linearly, truncated division, no extrapolation") {
    import spark.implicits._
    val us = 1000L
    val day = 86400L * 1000000000L
    // one user, values 1.00, 9.00, 2.00 → frames [100],[100,900],
    // [100,900,200]: lower medians 100, 100, 200
    val ev = Seq((1L, 0L, 1.00), (2L, 1L, 9.00), (3L, 2L, 2.00))
      .map { case (id, t, v) => (7L, id, t * us, v) }
      .toDF("user_id", "event_id", "ts", "value")
    val med = graft.operators.Temporal.rollingMedianOf(ev)
      .collect().map(r => r.getLong(1) -> r.getLong(4)).toMap
    assert(med == Map(1L -> 100L, 2L -> 100L, 3L -> 200L))
    // interpolation: days 0 and 3 observed (100, 1000) → days 1,2 are
    // 100 + 900*k/3 = 400, 700; negative slope day 4..6: 1000 → 100
    // at day 6: day5 = 1000 + (-900)*2 div 3... check truncation
    val ev2 = Seq((1L, 0L, 1.00), (2L, 3L, 10.00), (3L, 6L, 1.00))
      .map { case (id, d, v) => (9L, id, d * day + 1000L, v) }
      .toDF("user_id", "event_id", "ts", "value")
    val itp = graft.operators.Temporal.interpolateDailyOf(ev2)
      .collect().map(r => r.getLong(1) -> (if (r.isNullAt(2)) -1L else r.getLong(2))).toMap
    assert(itp == Map(0L -> 100L, 1L -> 400L, 2L -> 700L, 3L -> 1000L,
      4L -> 700L, 5L -> 400L, 6L -> 100L))
  }

  test("interval overlap join: responsibility rule emits each pair once, " +
    "half-open boundaries, zero-overlap rows kept") {
    import spark.implicits._
    val W = 100L
    // deploys: d1=[50,250) spans 3 buckets; d2=[300,340); d3=[500,520)
    val deploys = Seq((1L, 50L, 250L), (2L, 300L, 340L), (3L, 500L, 520L))
      .toDF("event_id", "s", "e")
    // errors: a=[240,260) overlaps d1 in its LAST bucket (cross-boundary
    // pair seen in 2 shared buckets — must count once); b=[0,51)
    // overlaps d1's first; c=[340,360) TOUCHES d2 (e==s: half-open, no
    // overlap); d=[100,200) nested inside d1
    val errors = Seq((10L, 240L, 260L), (11L, 0L, 51L), (12L, 340L, 360L),
        (13L, 100L, 200L))
      .toDF("event_id", "s", "e")
    val got = graft.operators.Temporal
      .intervalOverlapJoinOf(deploys, errors, W)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 3L, 2L -> 0L, 3L -> 0L))
    // agreement with the corpus-level query's direct-oracle semantics:
    // brute-force theta count over the same frames
    val brute = deploys.as("d").crossJoin(errors.as("x"))
      .filter($"d.s" < $"x.e" && $"x.s" < $"d.e")
      .groupBy($"d.event_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.filter(_._2 > 0) == brute)
  }
}
