package graft

import graft.operators.TextOps
import org.scalatest.funsuite.AnyFunSuite

/** The pre-dedup quality gates: every Gopher rule must fire on a doc
  * built to fail exactly it, and surprisal bits must equal the
  * hand-computed floor(log2) values (including the OOV-as-singleton
  * path under a capped vocabulary).
  */
class QualityGateSpec extends AnyFunSuite {
  import TestSpark._

  private def doc(words: Seq[String]) = words.mkString(" ")

  test("gopher rules: each rule fails exactly its designed offender") {
    import spark.implicits._
    // base doc passes all rules: 30 distinct-ish medium words + stopwords
    val good = doc(Seq("the", "a", "of") ++
      (1 to 27).map(i => f"wrd$i%02d")) // 30 words, mean length 4.7
    val tooShort = doc(Seq("the", "a") ++ (1 to 8).map(i => s"word$i"))
    val longWords = doc(Seq("the", "a") ++
      (1 to 28).map(i => f"verylongword$i%010d")) // mean len >> 5
    val topHeavy = doc(Seq("the", "a") ++ Seq.fill(28)("spam"))
    val noStops = doc((1 to 30).map(i => f"word$i%02d"))
    val rows = Seq(
      (1L, good), (2L, tooShort), (3L, longWords), (4L, topHeavy),
      (5L, noStops)).toDF("doc_id", "text")
    val got = TextOps.gopherQualityFilterOf(rows)
      .collect().map(r => r.getLong(0) ->
        (r.getBoolean(2), r.getBoolean(3), r.getBoolean(4),
          r.getBoolean(5), r.getBoolean(6), r.getBoolean(7))).toMap
    // (words_ok, mean_len_ok, top_word_ok, distinct_ok, stopword_ok, keep)
    assert(got(1L) == ((true, true, true, true, true, true)), s"good: ${got(1L)}")
    assert(!got(2L)._1 && !got(2L)._6, "tooShort must fail words_ok")
    assert(!got(3L)._2 && !got(3L)._6, "longWords must fail mean_len_ok")
    assert(!got(4L)._3 && !got(4L)._6, "topHeavy must fail top_word_ok")
    assert(!got(4L)._4, "topHeavy also fails distinct_ok (29 dup words)")
    assert(!got(5L)._5 && !got(5L)._6, "noStops must fail stopword_ok")
    assert(got(2L)._5, "tooShort still passes stopword_ok")
  }

  test("surprisal bits are exact floor(log2(total/cnt)) and OOV scores " +
    "as a singleton under a capped vocab") {
    import spark.implicits._
    // corpus: a×4 b×1 → total 5; bits(a)=floor(log2(5/4))=0, bits(b)=2
    val rows = Seq((1L, "a a a a"), (2L, "b")).toDF("doc_id", "text")
    val got = TextOps.unigramSurprisalOf(rows)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq((1L, 4L, 0L), (2L, 1L, 2L)))
    // cap vocab to 1: only 'a' is in-vocab; 'b' is OOV → cnt 1 → same 2
    // bits here, but a doc of an OOV word with true cnt 4 jumps to
    // floor(log2(total/1)) — the conservative maximum
    val rows2 = Seq((1L, "a a a a"), (2L, "b b b b")).toDF("doc_id", "text")
    val capped = TextOps.unigramSurprisalOf(rows2, vocab = 1)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    // total 8: in-vocab a → floor(log2(8/4))=1 per token ×4 = 4;
    // OOV b → floor(log2(8/1))=3 per token ×4 = 12
    assert(capped == Map(1L -> 4L, 2L -> 12L))
  }

  test("driver-corpus gopher keep rate is the calibrated ~43% and every " +
    "rule has failing docs (no dead rules)") {
    val got = TextOps.gopherQualityFilter(spark, sf).collect()
    val n = got.length
    val keep = got.count(_.getBoolean(7))
    assert(keep > n / 5 && keep < n * 4 / 5, s"keep $keep of $n")
    for ((col, i) <- Seq("words_ok" -> 2, "mean_len_ok" -> 3,
        "top_word_ok" -> 4, "distinct_ok" -> 5, "stopword_ok" -> 6))
      assert(got.exists(r => !r.getBoolean(i)), s"rule $col never fires")
  }

  test("corpus funnel: monotone, anchored to the corpus, every stage bites") {
    import org.apache.spark.sql.functions.col
    val rows = graft.operators.TextOps.corpusFunnel(spark, TestSpark.sf)
      .collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(rows.map(_._1).toSeq == (0 to 5))
    // stage 0 is the whole corpus, in docs and tokens
    val nDocs = Tables.documents(spark, TestSpark.sf).count()
    assert(rows(0)._3 == nDocs)
    // survivors never increase, in either measure
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(b._3 <= a._3 && b._4 <= a._4, s"${b._2} grew vs ${a._2}")
    }
    // the sf0.001 fixture makes these stages drop something (a no-op
    // stage would mean the gate is not wired to the relation it
    // claims); lang_en and exact_dedup are legitimately near-no-op
    // here — gopher's stopword rule already implies English, and the
    // corpus's exact duplicates don't survive the upstream gates
    val byName = rows.map(r => r._2 -> r._3).toMap
    assert(byName("1_gopher") < byName("0_raw"))
    assert(byName("4_near_dedup") < byName("3_exact_dedup"))
    assert(byName("5_decontam") < byName("4_near_dedup"))
    // stage 1 equals the standalone gopher gate's keep count
    val gopherKeep = graft.operators.TextOps
      .gopherQualityFilter(spark, TestSpark.sf)
      .filter(col("keep")).count()
    assert(rows(1)._3 == gopherKeep)
  }

  test("collation group: UTF8_LCASE merges the injected case variants " +
    "— counts conserve tokens, every class has 1 or 2 spellings, and " +
    "a class with 2 variants saw both parities") {
    import org.apache.spark.sql.functions._
    val out = TextOps.collationGroup(spark, sf).collect()
    assert(out.nonEmpty)
    val totalTokens = Tables.widened(spark,
        Tables.documents(spark, sf))
      .select(explode(split(col("text"), " ")).as("t"))
      .where(col("t") =!= "").count()
    // conservation: every token lands in exactly one collation class
    assert(out.map(_.getLong(1)).sum == totalTokens)
    // lowercased representatives are pairwise distinct (classes are
    // disjoint) and every class has 1 or 2 byte-distinct spellings
    val reps = out.map(_.getString(0).toLowerCase)
    assert(reps.distinct.length == reps.length)
    assert(out.forall(r => r.getLong(2) == 1L || r.getLong(2) == 2L))
    // with both parities present in the corpus, at least one class
    // must have been MERGED across case (variants == 2) — the
    // collation did real work, this is not a lower() no-op
    assert(out.exists(_.getLong(2) == 2L))
    // a 2-variant class's representative is the capitalized spelling
    // (binary min: 'A' < 'a')
    out.filter(_.getLong(2) == 2L).foreach { r =>
      assert(r.getString(0).head.isUpper)
    }
  }
}
