package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{Afinn, PseudoJson, TextFns}
import graft.operators.TextOps

class TextFnsSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("AFINN sentiment sum over literal lyrics") {
    val df = Seq(
      ("good good bad", 3 + 3 - 3),
      ("love is awesome", 3 + 4),
      ("neutral words only", 0)).toDF("lyric", "expected")
    val got = df.select(
      TextFns.sentimentSum($"lyric", Afinn.afinn).as("s"), $"expected")
      .collect()
    got.foreach(r => assert(r.getInt(0) == r.getInt(1)))
  }

  test("polarity is mean matched valence / 5, neutral default 0") {
    val df = Seq("good bad", "nothing here").toDF("lyric")
    val got = df.select(TextFns.sentimentPolarity($"lyric", Afinn.afinn))
      .collect().map(_.getDouble(0))
    assert(got(0) == (3 - 3) / 2.0 / 5.0)
    assert(got(1) == 0.0)
  }

  test("BPE-ish pre-tokenizer counts letter runs, digit runs, symbols") {
    val df = Seq(
      ("Hello world, 42 tests! 你好", 8), // Hello|world|,|42|tests|!|你|好
      ("a-b", 3),
      ("", 0)).toDF("text", "expected")
    df.select(TextFns.bpeTokenCount($"text").as("n"), $"expected").collect()
      .foreach(r => assert(r.getInt(0) == r.getInt(1)))
  }

  test("pseudo-JSON parse handles the reference wire format") {
    // exact format from line_music.ipynb cell 0
    val df = Seq("{'userid': 88888,'music': ('m1', 1038), 'rating': 1}").toDF("value")
    val (userid, tag, songid, rating) = PseudoJson.parse($"value")
    val r = df.select(userid, tag, songid, rating).head()
    assert(r.getInt(0) == 88888 && r.getString(1) == "m1"
      && r.getInt(2) == 1038 && r.getInt(3) == 1)
  }

  test("pseudo-JSON parse yields nulls (not crashes) on malformed input") {
    val df = Seq("not json at all", "{'userid': }").toDF("value")
    val (userid, tag, songid, rating) = PseudoJson.parse($"value")
    val rows = df.select(userid, tag, songid, rating).collect()
    assert(rows.forall(r => r.isNullAt(0) || r.getString(1).isEmpty || r.isNullAt(3)))
  }

  test("fingerprint: short docs fall back to md5(text)") {
    val df = Seq("one two three", "a b c d e f").toDF("text")
    val got = df.select(TextFns.fingerprint($"text").as("f"), md5($"text").as("m"))
      .collect()
    assert(got(0).getString(0) == got(0).getString(1)) // 3 tokens -> fallback
    assert(got(1).getString(0) != null)
  }

  test("langGuess picks profile language; und when no function words") {
    val df = Seq(
      ("the cat sat of the mat", "en"),
      ("der hund und die katze ist", "de"),
      ("xyzzy qwerty", "und")).toDF("text", "expected")
    df.select(TextFns.langGuess($"text").as("g"), $"expected").collect()
      .foreach(r => assert(r.getString(0) == r.getString(1), r.toString))
  }

  test("cleanCorpus composes lang gate + quality threshold + dedup keepers") {
    import graft.operators.{Dedup, TextOps}
    val clean = TextOps.cleanCorpus(spark, sf).collect()
    assert(clean.nonEmpty)
    assert(clean.forall(_.getDouble(1) >= 0.41), "quality gate holds")
    val en = TextOps.langId(spark, sf).collect()
      .filter(_.getString(1) == "en").map(_.getLong(0)).toSet
    assert(clean.forall(r => en.contains(r.getLong(0))), "language gate holds")
    val keepers = Dedup.exactDedup(spark, sf).collect().map(_.getLong(1)).toSet
    assert(clean.forall(r => keepers.contains(r.getLong(0))), "dedup gate holds")
  }

  test("PII scrub replaces emails and number runs, leaves clean text alone") {
    val df = Seq(
      ("contact bob.smith+x@example.co.uk today", "contact <EMAIL> today", 1),
      ("call (555) 123-4567 or 555 987 6543 now", "call <NUMBER> or <NUMBER> now", 2),
      ("plain text with short 123 number", "plain text with short 123 number", 0))
      .toDF("text", "expected", "hits")
    df.select(TextFns.redactPii($"text").as("got"), $"expected",
        TextFns.piiHits($"text").as("h"), $"hits")
      .collect().foreach { r =>
        assert(r.getString(0) == r.getString(1), r.toString)
        assert(r.getInt(2) == r.getInt(3), r.toString)
      }
  }

  test("corpusStats aggregates are consistent with the per-doc operators") {
    import graft.operators.TextOps
    val stats = TextOps.corpusStats(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val docs = TextOps.langId(spark, sf).collect().map(_.getString(1))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    assert(stats.view.mapValues(_._1).toMap == docs,
      "per-language doc counts must match langId")
    val totalTokens = TextOps.tokenCount(spark, sf).collect()
      .map(_.getInt(1).toLong).sum
    assert(stats.values.map(_._2).sum == totalTokens,
      "token volume must partition exactly across languages")
  }

  test("token counts: whitespace + ceil(len/4) subwords") {
    val r = Seq("spark is fast").toDF("text")
      .select(TextFns.whitespaceTokenCount($"text"),
        TextFns.subwordEstimate($"text")).head()
    assert(r.getInt(0) == 3)
    assert(r.getLong(1) == 2 + 1 + 1) // ceil(5/4)+ceil(2/4)+ceil(4/4)
  }

  test("repetition score: known gram/word stats on literal docs") {
    val docs = Seq(
      (1L, "a b a b a b"), // 3-grams: "a b a","b a b","a b a","b a b" → 2 distinct of 4
      (2L, "x y"),         // too short for 3-grams
      (3L, "w w w w")      // all grams identical
    ).toDF("doc_id", "text")
    val got = TextOps.repetitionScoreOf(docs).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getLong(2), r.getInt(3),
        r.getInt(4), r.getDouble(5)))).toMap
    assert(got(1L) == ((6, 3L, 4, 2, 1.0 - 2.0 / 4)))
    assert(got(2L) == ((2, 1L, 0, 0, 0.0)))
    assert(got(3L) == ((4, 4L, 2, 1, 1.0 - 1.0 / 2)))
  }

  test("approx percentile sketch stays within its rank-error bound vs exact") {
    // the scale path for quantiles (exact percentile_approx(accuracy)
    // is a GK sketch, mergeable/partial-aggregatable); its contract is
    // a rank error of at most 1/accuracy — checked against the exact
    // per-column quantiles the quantile_rating_levels oracle uses
    val acc = 100
    val vals = Tables.events(spark, sf).select($"value")
    val n = vals.count()
    val approx = vals.agg(expr(
        s"percentile_approx(value, array(0.25, 0.5, 0.75), $acc)"))
      .head().getSeq[Double](0)
    val sorted = vals.collect().map(_.getDouble(0)).sorted
    for ((q, a) <- Seq(0.25, 0.5, 0.75).zip(approx)) {
      val rank = sorted.indexWhere(_ >= a) match { case -1 => n - 1; case i => i }
      assert(math.abs(rank - q * n) <= n.toDouble / acc + 1,
        s"q=$q approx=$a rank=$rank n=$n exceeds 1/$acc rank error")
    }
  }

  test("chunking: overlap windows reconstruct every document exactly") {
    val docs = Tables.widened(spark, Tables.documents(spark, sf))
    val (chunkTokens, overlap) = (16, 4)
    val chunks = TextOps.chunkDocsOf(docs, chunkTokens, overlap).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getInt(3)))
      .groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
    val texts = docs.select($"doc_id", $"text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(chunks.keySet == texts.keySet)
    var multi = 0
    for ((id, cs) <- chunks) {
      // drop each later chunk's leading overlap, rejoin → original text
      val rebuilt = (cs.head._3.split(" ", -1) ++ cs.tail.flatMap(
        _._3.split(" ", -1).drop(overlap))).mkString(" ")
      assert(rebuilt == texts(id), s"doc $id must reconstruct")
      assert(cs.map(_._2).toSeq == cs.indices.map(identity))
      assert(cs.forall(c => c._4 == c._3.split(" ", -1).length))
      if (cs.length > 1) multi += 1
    }
    assert(multi > 0, "fixture must exercise multi-chunk docs")
  }

  test("token packing: bucketed prefix sum == global window, any bucket size") {
    val docs = Tables.widened(spark, Tables.documents(spark, sf))
    val w = org.apache.spark.sql.expressions.Window.orderBy($"doc_id")
      .rowsBetween(Long.MinValue, 0)
    val naive = docs.select($"doc_id",
        TextFns.whitespaceTokenCount($"text").cast("long").as("n_tokens"))
      .withColumn("cum", sum($"n_tokens").over(w))
      .select($"doc_id", $"n_tokens",
        expr("(cum - n_tokens) div 2000").as("shard_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      .sortBy(_._1)
    for (bs <- Seq(1L, 7L, 1000L)) {
      val got = TextOps.tokenPackOf(docs, budget = 2000L, bucketSize = bs)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      assert(got == naive, s"bucketSize=$bs must not change the packing")
    }
    // shards are contiguous in doc_id order and start at 0
    assert(naive.map(_._3).distinct == naive.map(_._3).distinct.sorted)
    assert(naive.head._3 == 0L)
  }

  test("mixture rebalance: rarest stratum survives whole, skewed ones shrink") {
    val docs = Tables.documents(spark, sf)
      .select($"doc_id", $"lang".as("stratum"))
    val counts = docs.groupBy($"stratum").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val quota = counts.values.min
    val kept = TextOps.mixtureRebalanceOf(docs).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val keptByStratum = kept.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    // h % n < quota is ALWAYS true when n == quota: the rarest stratum
    // is kept in full, every other stratum shrinks toward quota
    val rarest = counts.minBy(_._2)._1
    assert(keptByStratum(rarest) == quota)
    counts.foreach { case (s, n) =>
      assert(keptByStratum.getOrElse(s, 0L) <= n)
    }
    // the corpus IS skewed (en ~3x), so the hash gate must actually
    // drop documents — the property is not vacuous on this data
    val dominant = counts.maxBy(_._2)
    assert(dominant._2 > quota, "corpus must be skewed for this test to bite")
    assert(keptByStratum(dominant._1) < dominant._2,
      "the dominant stratum must actually downsample")
    // membership is a pure function of doc_id: a second run is identical
    val again = TextOps.mixtureRebalanceOf(docs).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(kept.toSeq == again.toSeq)
  }

  test("stratified sample: exact-fraction gate, rerun-identical, monotone subset") {
    val docs = Tables.documents(spark, sf)
      .select($"doc_id", $"lang".as("stratum"))
    val total = docs.groupBy($"stratum").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val kept = TextOps.stratifiedSampleOf(docs,
      Map("en" -> (1, 4), "de" -> (1, 2)), (3, 4)).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getInt(3)))
    // each row carries its stratum's rate
    kept.foreach { case (_, s, n, d) =>
      val expect = s match {
        case "en" => (1, 4); case "de" => (1, 2); case _ => (3, 4)
      }
      assert((n, d) == expect)
    }
    // a 1/4 gate keeps roughly a quarter: 3-sigma binomial band around
    // n*p (deterministic anyway — the band only documents the class)
    val byStratum = kept.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    def band(s: String, p: Double): Unit = {
      val n = total(s); val mean = n * p
      val sd = math.sqrt(n * p * (1 - p))
      assert(math.abs(byStratum.getOrElse(s, 0L) - mean) <= 3 * sd + 1,
        s"$s: kept ${byStratum.getOrElse(s, 0L)} of $n at rate $p")
    }
    band("en", 0.25); band("de", 0.5); band("fr", 0.75)
    // pure function of doc_id: rerun identical
    val again = TextOps.stratifiedSampleOf(docs,
      Map("en" -> (1, 4), "de" -> (1, 2)), (3, 4)).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getInt(3)))
    assert(kept.toSeq == again.toSeq)
    // monotone at fixed denom: shrinking en 2/4 -> 1/4 yields a subset
    val wider = TextOps.stratifiedSampleOf(docs,
      Map("en" -> (2, 4), "de" -> (1, 2)), (3, 4)).collect()
      .filter(_.getString(1) == "en").map(_.getLong(0)).toSet
    val enKept = kept.filter(_._2 == "en").map(_._1).toSet
    assert(enKept.subsetOf(wider))
  }

  test("2-D mixture rebalance: sources equalize within each lang, langs keep size") {
    val docs = Tables.documents(spark, sf).select($"doc_id", $"lang", $"source")
    val cells = docs.groupBy($"lang", $"source").count().collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val quotaByLang = cells.groupBy(_._1._1).view.mapValues(_.values.min).toMap
    val kept = TextOps.mixtureRebalance2dOf(docs).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getLong(4)))
    // emitted n_cell/quota columns state the census they were gated by
    kept.foreach { case (_, lang, src, nCell, quota) =>
      assert(nCell == cells((lang, src)))
      assert(quota == quotaByLang(lang))
    }
    val keptByCell = kept.groupBy(k => (k._2, k._3))
      .view.mapValues(_.length.toLong).toMap
    cells.foreach { case ((lang, src), n) =>
      // h % n < quota is always true when n == quota: each lang's
      // rarest cell survives whole; no cell ever grows
      if (n == quotaByLang(lang)) assert(keptByCell((lang, src)) == n)
      assert(keptByCell.getOrElse((lang, src), 0L) <= n)
    }
    // the census IS skewed within langs, so the gate must actually bite
    assert(cells.exists { case ((lang, src), n) =>
      n > quotaByLang(lang) && keptByCell.getOrElse((lang, src), 0L) < n },
      "some over-quota cell must actually downsample")
    // membership is a pure function of doc_id: a second run is identical
    val again = TextOps.mixtureRebalance2dOf(docs).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getLong(4)))
    assert(kept.toSeq == again.toSeq)
  }

  test("quality top-p: kept set is exactly each lang's best half") {
    val docs = Tables.widened(spark, Tables.documents(spark, sf))
      .select($"doc_id", $"lang", $"text")
    val scored = docs.select($"doc_id", $"lang",
        graft.functions.TextFns.qualityScore($"text").as("q")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    val kept = TextOps.qualityTopPOf(docs, p = 0.5).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    val keptIds = kept.map(_._1).toSet
    scored.groupBy(_._2).foreach { case (lang, rows) =>
      // percent_rank <= 0.5 over a unique ordering keeps exactly the
      // first floor((n-1)/2)+1 docs by (quality desc, doc_id)
      val ordered = rows.sortBy(r => (-r._3, r._1)).map(_._1)
      val expect = ordered.take((rows.length - 1) / 2 + 1).toSet
      assert(rows.filter(r => keptIds(r._1)).map(_._1).toSet == expect,
        s"lang $lang kept set must be its top half")
    }
    // deterministic: second run identical
    val again = TextOps.qualityTopPOf(docs, p = 0.5).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    assert(kept.toSeq == again.toSeq)
  }

  test("tfidf top terms: integer ranking (tf desc, df asc, word asc)") {
    val docs = Seq(
      (1L, "rare common common"), // tf: common=2, rare=1; df: rare=1, common=2
      (2L, "common only")
    ).toDF("doc_id", "text")
    val got = TextOps.tfidfTopTermsOf(docs, k = 2).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(got == Seq(
      (1L, 1, "common", 2L, 2L), // highest tf wins despite higher df
      (1L, 2, "rare", 1L, 1L),
      (2L, 1, "only", 1L, 1L),   // tf tie → lower df first
      (2L, 2, "common", 1L, 2L)))
  }

  test("word associations: exclusive co-occurrence outranks a diluted pair") {
    import spark.implicits._
    // (s,t) always co-occur and appear nowhere else; (p,q) co-occur
    // but p is diluted across q and r: ratio(s,t) = 15·5/(5·5) = 3.0
    // beats ratio(p,q) = 15·5/(10·5) = 1.5
    val docs = (
      (0 until 5).map(i => (i.toLong, "p q")) ++
      (5 until 10).map(i => (i.toLong, "p r")) ++
      (10 until 15).map(i => (i.toLong, "s t"))
    ).toDF("doc_id", "text")
    val got = graft.operators.TextOps
      .wordAssociationsOf(docs, v = 50, minPairDf = 2L, k = 10)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(5))).toSeq
    assert(got == Seq(
      ("s", "t", 3.0), ("p", "q", 1.5), ("p", "r", 1.5)))
  }

  test("boilerplate removal: the shared banner line vanishes from every " +
    "doc, unique bodies survive verbatim, vanished docs report empty") {
    // 6 docs share the 3-token banner "cookie notice accept"; each has
    // a unique 3-token body; doc 6 is banner-only
    val docs = ((0 until 6).map(i =>
        (i.toLong, s"cookie notice accept body$i text here")) :+
      (6L, "cookie notice accept")).toDF("doc_id", "text")
    val got = TextOps.boilerplateRemoveOf(docs, span = 3, minDf = 5L)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(got.length == 7)
    got.foreach { case (id, clean, nLines, nRemoved) =>
      if (id < 6) {
        assert(clean == s"body$id text here" && nLines == 2 && nRemoved == 1)
      } else {
        assert(clean == "" && nLines == 1 && nRemoved == 1)
      }
    }
    // below the df threshold nothing is boilerplate: everything
    // survives AND reassembly is the identity — slicing into 3-token
    // lines and rejoining with single spaces reconstructs the source
    val kept = TextOps.boilerplateRemoveOf(docs, span = 3, minDf = 8L)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(3))).toMap
    val source = docs.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    kept.foreach { case (id, (clean, nRemoved)) =>
      assert(nRemoved == 0L)
      assert(clean == source(id), s"reassembly must be identity for doc $id")
    }
  }

  test("bigram coverage: in-vocab docs score 1, novel-bigram docs score " +
    "their overlap fraction exactly") {
    // "a b" dominates the vocabulary; doc 10's "x y" bigrams are novel
    val docs = ((0 until 10).map(i => (i.toLong, "a b a b a")) :+
      (10L, "a b x y")).toDF("doc_id", "text")
    // v=2 vocab: "a b" (cnt 21), "b a" (cnt 20) — doc 10 has bigrams
    // [a b, b x, x y]: only 1 of 3 covered
    val by = TextOps.bigramCoverageOf(docs, v = 2).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    assert(by(0L) == ((4L, 4L, 1.0)))
    assert(by(10L) == ((3L, 1L, 1.0 / 3.0)))
  }

  test("weighted sample: at-cap docs always survive, empty docs never, " +
    "and the draw is rerun-identical") {
    val sf = TestSpark.sf
    val kept = graft.operators.TextOps.weightedSample(spark, sf).collect()
    val keptIds = kept.map(_.getLong(0)).toSet
    assert(kept.nonEmpty)
    val all = Tables.documents(spark, sf)
      .select($"doc_id", $"n_chars").collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    // every doc at or above the cap survives with certainty
    all.filter(_._2 >= 512).foreach { case (id, _) =>
      assert(keptIds.contains(id), s"doc $id at cap must survive") }
    // weight column is the capped length
    kept.foreach(r => assert(r.getLong(2) == math.min(r.getLong(1), 512L)))
    val again = graft.operators.TextOps.weightedSample(spark, sf).collect()
      .map(_.getLong(0)).toSet
    assert(again == keptIds)
  }

  test("length buckets: powers of two, every doc in exactly one bucket, " +
    "each bucket's token mass inside its half-open range") {
    val sf = TestSpark.sf
    val rows = graft.operators.TextOps.lengthBucketAudit(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    assert(rows.map(_._2).sum == Tables.documents(spark, sf).count())
    rows.foreach { case (bucket, nDocs, sumTok, padTok) =>
      assert((bucket & (bucket - 1)) == 0L, s"bucket $bucket not a power of 2")
      assert(padTok == nDocs * bucket)
      assert(sumTok <= padTok)
      if (bucket > 1) assert(sumTok > nDocs * bucket / 2,
        s"a doc below bucket/2 leaked into bucket $bucket")
    }
  }

  test("median impute: present rows pass through, missing rows get their " +
    "type's exact median, flags partition the table") {
    val sf = TestSpark.sf
    val got = graft.operators.Relational.medianImpute(spark, sf).collect()
    assert(got.nonEmpty)
    // recompute medians per type over present rows (exact interpolated)
    val present = got.filter(!_.getBoolean(3))
    val medians = present.groupBy(_.getString(1)).map { case (t, rs) =>
      val v = rs.map(_.getDouble(2)).sorted
      val n = v.length
      val m = if (n % 2 == 1) v(n / 2) else {
        val (a, b) = (v(n / 2 - 1), v(n / 2)); a + (b - a) * 0.5
      }
      t -> m
    }
    val missing = got.filter(_.getBoolean(3))
    assert(missing.nonEmpty && present.nonEmpty)
    missing.foreach(r =>
      assert(r.getDouble(2) == medians(r.getString(1))))
  }

  test("bpe merges: textbook evolution on a hand-traced fixture, rerun identical") {
    import spark.implicits._
    // freq: aaab x3, aab x2, ab x1 — hand trace:
    //   r1: (a,a)=8  -> 'a a a b'->'aa a b', 'a a b'->'aa b'
    //   r2: (a,b)=4  -> 'aa a b'->'aa ab',  'a b'->'ab'
    //   r3: (aa,ab)=3 -> 'aa ab'->'aaab'
    //   r4: (aa,b)=2
    val docs = Seq("aaab aaab aab ab", "aaab aab").toDF("text")
    val got = TextOps.bpeMergesOf(docs).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(got.toSeq === Seq(
      (1, "a", "a", 8L), (2, "a", "b", 4L),
      (3, "aa", "ab", 3L), (4, "aa", "b", 2L)))
    // corpus: 4 rounds, weights non-increasing is NOT guaranteed by BPE
    // in general, but rerun determinism is the contract
    val c1 = TextOps.bpeMerges(spark, sf).collect().toSeq
    val c2 = TextOps.bpeMerges(spark, sf).collect().toSeq
    assert(c1 === c2)
    assert(c1.length === TextOps.BpeRounds)
  }

  test("bpe tokenize: fixture fertility by hand; corpus tokens bounded by chars and words") {
    import spark.implicits._
    // after the 4 traced merges the vocab is aaab->1, aab->1, ab->1 sym
    val docs = Seq((0L, "aaab aaab aab ab"), (1L, "aaab aab"))
      .toDF("doc_id", "text")
    val got = TextOps.bpeTokenizeOf(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toMap
    assert(got(0L) === ((4L, 13L, 4L, 4L * 1000000L / 13L)))
    assert(got(1L) === ((2L, 7L, 2L, 2L * 1000000L / 7L)))
    val corpus = TextOps.bpeTokenize(spark, sf).collect()
    assert(corpus.nonEmpty)
    corpus.foreach { r =>
      val (nw, nc, nt) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(nt <= nc, "a token never has less than one char")
      assert(nt >= nw, "a word is at least one token")
    }
    // the learned merges must actually compress somewhere
    assert(corpus.exists(r => r.getLong(3) < r.getLong(2)))
  }

  test("gate agreement: confusion cells reconcile, kappa recomputes, both gates fire") {
    val row = TextOps.gateAgreement(spark, sf).collect().head
    val (a, b, c, d, n) = (row.getLong(0), row.getLong(1), row.getLong(2),
      row.getLong(3), row.getLong(4))
    assert(a + b + c + d === n)
    assert(n === Tables.documents(spark, sf).count())
    // both gates must disagree somewhere AND agree somewhere, or the
    // audit is degenerate
    assert(a + d > 0L && b + c > 0L)
    assert(row.getLong(5) === (a + d) * 1000000L / n)
    val e = (a + b) * (a + c) + (c + d) * (b + d)
    val wantKappa = (n * (a + d) - e).toDouble / (n * n - e).toDouble
    assert(row.getDouble(6) === wantKappa)
    assert(row.getDouble(6) > -1.0 && row.getDouble(6) < 1.0)
  }

  test("bigram surprisal: hand-computed bits, fluent < disfluent") {
    // census: c(x)=c(y)=7, total 14; pairs: xy=5, yx=4, yy=1, xx=1
    val docs = Seq(
      (1L, "x y x y x y"),   // all pairs common → 0 bits each
      (2L, "x y x y"),
      (3L, "y y x x")        // yy/xx are rare: 7 div 1 = 7 → 2 bits
    ).toDF("doc_id", "text")
    val got = TextOps.bigramSurprisalOf(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got(1L) == ((5L, 0L, 0L)))
    assert(got(2L) == ((3L, 0L, 0L)))
    assert(got(3L) == ((3L, 4L, 133L)))   // 0+2+2 bits over 3 pairs
    // capped table (top-2 pairs): yy/xx back off to unigram+penalty =
    // floor(log2(14 div 7)) + 3 = 4 bits each
    val capped = TextOps.bigramSurprisalOf(docs, vocab = 2).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(capped(3L) == 8L)
    assert(capped(1L) == 0L)
    // the discriminative claim on the real corpus: reversing a doc's
    // tokens (same unigrams, broken pairs) must not score lower
    val real = Tables.documents(spark, sf).select("doc_id", "text")
    val fluent = TextOps.bigramSurprisalOf(real)
      .agg(sum($"sum_bits")).head().getLong(0)
    val scrambled = TextOps.bigramSurprisalOf(
        real.select($"doc_id",
          concat_ws(" ", reverse(split($"text", " "))).as("text")))
      .agg(sum($"sum_bits")).head().getLong(0)
    assert(scrambled > fluent,
      s"reversed corpus must cost more bits: $scrambled vs $fluent")
  }
}
