package graft

import graft.operators.{Audit, Relational, Similarity, TextOps}
import graft.plans.NfcNormalize
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Feature-engineering operators: NFC normalization (native codegen
  * expression), the hashing-trick featurizer, leave-one-out target
  * encoding, the k-anonymity audit, and exact-co-moment covariance.
  */
class FeatureSpec extends AnyFunSuite {
  import TestSpark._

  test("nfc_normalize composes decomposed sequences and is identity on ASCII") {
    import spark.implicits._
    val rows = Seq(
      (1L, "café"),       // e + COMBINING ACUTE -> é
      (2L, "café"),        // already precomposed
      (3L, "plain ascii")).toDF("id", "raw")
      .select($"id", NfcNormalize.nfc($"raw").as("norm"),
        length($"raw").as("lr"))
    val got = rows.select($"id", $"norm", length($"norm").as("ln"), $"lr")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getInt(3)))
      .toSeq.sortBy(_._1)
    assert(got(0)._2 == "café" && got(0)._3 == 4 && got(0)._4 == 5)
    assert(got(1)._2 == "café" && got(1)._3 == 4)
    assert(got(2)._2 == "plain ascii")
    // both decomposed and precomposed inputs md5-agree after NFC
    val hashes = Seq((1L, "café"), (2L, "café")).toDF("id", "raw")
      .select(md5(NfcNormalize.nfc($"raw"))).distinct().count()
    assert(hashes === 1L)
  }

  test("text_normalize driver query: injected docs change, others don't") {
    val got = TextOps.textNormalize(spark, sf).collect()
    val changed = got.count(_.getBoolean(3))
    assert(changed > 0, "the injection gate never fired")
    assert(changed < got.length, "every doc changed — gate is not selective")
    // changed docs lose exactly one code point (the composed accent)
    got.filter(_.getBoolean(3)).foreach { r =>
      assert(r.getInt(1) - r.getInt(2) === 1,
        s"doc ${r.getLong(0)}: raw ${r.getInt(1)} vs nfc ${r.getInt(2)}")
    }
  }

  test("feature_hash: bucket counts cover every token and hashing is stable") {
    import spark.implicits._
    val rows = Seq((1L, "a b a c"), (2L, "a")).toDF("doc_id", "text")
    val got = TextOps.featureHashOf(rows).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.filter(_._1 == 1L).map(_._3).sum === 4L)
    assert(got.filter(_._2 >= TextOps.FeatureHashBuckets).isEmpty)
    // the same word lands in the same bucket in both docs
    val aBucket1 = TextOps.featureHashOf(Seq((1L, "a")).toDF("doc_id", "text"))
      .collect().head.getLong(1)
    val aBucket2 = got.find(_._1 == 2L).get._2
    assert(aBucket1 === aBucket2)
  }

  test("target encoding is leave-one-out exact and singleton encodes null") {
    import spark.implicits._
    val ev = Seq(
      (1L, "click", 1.00), (2L, "click", 2.00), (3L, "click", 6.00),
      (4L, "view", 5.00))
      .toDF("event_id", "event_type", "value")
    val stats = ev.groupBy($"event_type")
      .agg(count(lit(1)).as("n"),
        sum(($"value".cast("decimal(18,2)") * 100).cast("long")).as("cents_sum"))
    val got = ev
      .select($"event_id", $"event_type",
        ($"value".cast("decimal(18,2)") * 100).cast("long").as("cents"))
      .join(broadcast(stats), Seq("event_type"))
      .select($"event_id",
        when($"n" > 1, expr("(cents_sum - cents) div (n - 1)")).as("loo"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    // click sums 900 cents: LOO(1)= (900-100)/2=400, LOO(2)=350, LOO(3)=150
    assert(got == Map(1L -> Some(400L), 2L -> Some(350L),
      3L -> Some(150L), 4L -> None))
    // and the driver query emits one row per event with the same contract
    val driver = Relational.targetEncodeLoo(spark, sf)
    assert(driver.count() === Tables.events(spark, sf).count())
    assert(driver.filter($"loo_cents_floor".isNull).count() === 0L,
      "all corpus event types have n > 1")
  }

  test("k-anonymity audit: cell sizes sum to the table and flags are exact") {
    import spark.implicits._
    val got = Audit.kAnonymityAudit(spark, sf)
    val rows = got.collect()
    assert(rows.map(_.getLong(2)).sum === Tables.customer(spark, sf).count())
    rows.foreach { r =>
      assert(r.getBoolean(3) === (r.getLong(2) >= Audit.KAnon))
      assert(r.getBoolean(5) === (r.getLong(4) >= Audit.KAnon))
    }
    // generalized size is the sum of its cells
    val bySeg = rows.groupBy(_.getString(0))
    bySeg.foreach { case (_, cells) =>
      assert(cells.map(_.getLong(2)).sum === cells.head.getLong(4))
    }
    // at sf0.001 (150 customers over 125 cells) violations must exist
    assert(rows.exists(!_.getBoolean(3)), "no k-violation at tiny scale?")
  }

  test("embedding covariance from exact co-moments matches hand computation") {
    import spark.implicits._
    // two vectors: dim0 = {1, 0}, dim1 = {1, 0} -> var = 0.25, cov01 = 0.25;
    // dim2 = {1, -1} vs dim0 -> cov = 0.5... hand: mean0=.5, mean2=0,
    // E[x0*x2] = (1*1 + 0*(-1))/2 = .5 -> cov = .5 - .5*0 = .5
    val v1 = Array(1f, 1f, 1f, 0f, 0f, 0f, 0f, 0f)
    val v2 = Array(0f, 0f, -1f, 0f, 0f, 0f, 0f, 0f)
    val rows = Seq((1L, v1.toSeq), (2L, v2.toSeq)).toDF("vec_id", "embedding")
    val got = Similarity.embeddingCovarianceOf(rows).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(6))).toMap
    assert(got((0L, 0L)) === 0.25)
    assert(got((0L, 1L)) === 0.25)
    assert(got((0L, 2L)) === 0.5)
    assert(got((3L, 3L)) === 0.0)
    assert(got.size === 36)
  }
  test("personalized pagerank: walk favors the seed neighborhood and " +
    "never recommends a rated song") {
    import spark.implicits._
    // chain graph via co-raters: u1:{1,2} u2:{2,3} u3:{3,4} — from u1's
    // seeds {1,2}, song 3 (one hop) must outrank song 4 (two hops)
    val pos = Seq((1L, 1), (1L, 2), (2L, 2), (2L, 3), (3L, 3), (3L, 4))
      .toDF("user_id", "song_id")
    val got = graft.operators.Graph
      .pagerankPersonalizedOf(pos, focusUser = 1L, k = 10)
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2)))
    assert(got.map(_._2).toSet === Set(3, 4), s"unrated songs only: ${got.toSeq}")
    val byRank = got.sortBy(_._1).map(_._2).toSeq
    assert(byRank === Seq(3, 4), "one-hop song must outrank two-hop song")
    assert(got.forall(_._3 > 0L))
    // driver corpus: top-k excludes every song the focus user rated
    val driver = graft.operators.Graph.pagerankPersonalized(spark, sf)
      .collect().map(_.getInt(1)).toSet
    val rated = graft.operators.Relational.ratings(spark, sf)
      .filter($"user_id" === graft.operators.Graph.PprFocusUser)
      .select($"song_id").distinct().collect().map(_.getInt(0)).toSet
    assert(driver.nonEmpty && driver.intersect(rated).isEmpty)
  }
  test("user-user CF: literal fixture ranks the full-overlap neighbor " +
    "first and c_ab is symmetric") {
    import spark.implicits._
    // u1:{1,2,3} u2:{1,2,3} u3:{1}: u1's best neighbor is u2 (3 shared),
    // then u3 (1 shared)
    val pos = Seq((1L, 1), (1L, 2), (1L, 3), (2L, 1), (2L, 2), (2L, 3),
      (3L, 1)).toDF("user_id", "song_id")
    val got = graft.operators.Graph.itemSimilarityTopKOf(
        pos.select($"song_id".as("user_id"), $"user_id".as("song_id")),
        k = 5, maxItemsPerUser = 50)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getLong(3))).toSeq
    val u1 = got.filter(_._1 == 1L).sortBy(_._2)
    assert(u1.map(_._3) === Seq(2L, 3L), s"u1 neighbors: $u1")
    assert(u1.head._4 === 3L, "u1-u2 share 3 songs")
    // symmetry: c_ab(u1,u2) == c_ab(u2,u1)
    val u2row = got.find(t => t._1 == 2L && t._3 == 1L).get
    assert(u2row._4 === 3L)
    // driver corpus: no self-pairs, ranks contiguous from 1
    val driver = graft.operators.Graph.userSimilarityTopK(spark, sf)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(driver.nonEmpty)
    assert(driver.forall(t => t._1 != t._3), "no self-similarity rows")
    driver.groupBy(_._1).foreach { case (_, rows) =>
      assert(rows.map(_._2).sorted.toSeq === (1 to rows.length).toSeq)
    }
  }
}
