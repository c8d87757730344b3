package graft.operators

import graft.Tables
import graft.functions.TextFns
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Retrieval scoring over the `documents` table — the index-side query
  * path a RAG / data-curation pipeline runs next to chunking
  * ([[TextOps.chunkDocs]]) and TF-IDF term extraction
  * ([[TextOps.tfidfTopTerms]]).
  *
  * Scale shape: one projection pass computes every per-document
  * statistic (doc length + one term frequency per query term, all
  * inside whole-stage codegen — the term list is a compile-time
  * constant, so there is no explode and no per-token shuffle); the
  * corpus-level statistics (N, Σdl, per-term document frequencies)
  * are ONE single-row aggregate broadcast back over the projection;
  * the top-k is a TakeOrderedAndProject. Nothing shuffles the corpus
  * itself at any scale.
  */
object Retrieval {

  /** BM25 parameters (the standard Robertson defaults). `K1Plus1` is a
    * frozen literal — NOT computed as k1+1 — so the Spark plan and the
    * DuckDB oracle parse the identical decimal string to the identical
    * double.
    */
  val K1 = 1.2
  val K1Plus1 = 2.2
  val B = 0.75

  /** Fixed query terms (mid-frequency words of the synthetic corpus).
    * Shared with the oracle generator.
    */
  val QueryTerms: Seq[String] = Seq("hash", "merge", "vector")

  /** BM25 top-k with a RATIONAL idf: idf(t) = (N − df + 0.5)/(df + 0.5)
    * — the classic Robertson idf with the outer log dropped. The log is
    * a monotone transform applied per term, and libm log is the one
    * piece of BM25 that is not bit-reproducible across engines, so the
    * rational form keeps every arithmetic step an IEEE +,−,×,/ of
    * exactly-agreed operands (exact integer counts, print-exact
    * constants) — deterministic to the last bit on both sides. Rankings
    * differ from log-BM25 only through the per-term idf weighting, and
    * the score is still the textbook tf-saturation × idf structure.
    */
  def bm25TopK(spark: SparkSession, dir: String, k: Int = 10): DataFrame =
    bm25TopKOf(Tables.widened(spark, Tables.documents(spark, dir)),
      QueryTerms, k)

  /** [[bm25TopK]] over an arbitrary (doc_id, text) relation. */
  def bm25TopKOf(docs: DataFrame, terms: Seq[String], k: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    require(terms.nonEmpty, "need at least one query term")
    val t = TextFns.tokens($"text")
    // one pass: dl + a tf column per query term (array_size of a
    // filtered constant-term scan — codegen, no explode)
    val proj = docs.select(
      ($"doc_id" +: size(t).as("dl") +:
        terms.zipWithIndex.map { case (term, i) =>
          size(filter(t, x => x === lit(term))).as(s"tf$i")
        }): _*)
      .localCheckpoint(true)
    // single-row corpus stats: N, Σdl, df per term
    val statCols = count(lit(1)).as("n") +: sum($"dl").as("sdl") +:
      terms.indices.map(i =>
        sum(when(col(s"tf$i") > 0, 1L).otherwise(0L)).as(s"df$i"))
    val stats = proj.agg(statCols.head, statCols.tail: _*)
    val withStats = proj.crossJoin(broadcast(stats))
    // avgdl = Σdl / N: one divide of two exact integers
    val avgdl = $"sdl".cast("double") / $"n"
    // per-term score, every operand/association mirrored in the oracle:
    //   idf  = ((N − df) + 0.5) / (df + 0.5)
    //   norm = K1 * ((1 − B) + (B * (dl / avgdl)))
    //   s    = idf * ((tf * (K1+1)) / (tf + norm))
    def termScore(i: Int) = {
      val tf = col(s"tf$i").cast("double")
      val df = col(s"df$i").cast("double")
      val idf = (($"n" - col(s"df$i")).cast("double") + lit(0.5)) /
        (df + lit(0.5))
      val norm = lit(K1) * ((lit(1.0) - lit(B)) +
        (lit(B) * ($"dl".cast("double") / avgdl)))
      idf * ((tf * lit(K1Plus1)) / (tf + norm))
    }
    val score = terms.indices.map(termScore).reduceLeft(_ + _)
    withStats
      .select(($"doc_id" +: $"dl".as("n_tokens") +:
        terms.indices.map(i => col(s"tf$i"))) :+ score.as("score"): _*)
      .orderBy($"score".desc, $"doc_id")
      .limit(k)
  }

  /** Negative-sampling draws per user (contrastive training prep). */
  val NegativeDraws = 8
  /** Item-id space of the ratings corpus (song_id ∈ [0, 100)). */
  val NegativeItemSpace = 100

  /** Deterministic negative sampling — the contrastive-pair generator
    * a recommender/embedding trainer runs next to the positives: for
    * each user, `NegativeDraws` candidate items from the engine's
    * md5-based hash (RNG-free, so retrains see the same negatives),
    * minus any candidate the user actually interacted with (anti-join
    * against the positives). Draws are independent, so the same item
    * can be drawn twice for a user under different draw indices —
    * standard with-replacement sampling; the draw index is part of the
    * output key.
    *
    * Scale shape: candidate generation is a pure projection (explode
    * multiplies rows, not bytes); the only shuffle is the positives
    * anti-join on (user, item) — integer keys. Works at any item-space
    * size because nothing enumerates the catalog.
    */
  def negativeSamples(spark: SparkSession, dir: String,
      k: Int = NegativeDraws, itemSpace: Int = NegativeItemSpace)
      : DataFrame = {
    import spark.implicits._
    val positives = Relational.ratings(spark, dir)
      .select($"user_id", $"song_id").distinct()
    val users = positives.select($"user_id").distinct()
    val cands = users
      .select($"user_id", explode(sequence(lit(0), lit(k - 1))).as("draw"))
      .select($"user_id", $"draw",
        (Dedup.hash60(concat(lit("neg:"), $"user_id", lit(":"), $"draw"))
          % itemSpace).cast("int").as("neg_song_id"))
    cands.join(positives,
        cands("user_id") === positives("user_id") &&
          cands("neg_song_id") === positives("song_id"), "left_anti")
      .orderBy($"user_id", $"draw")
  }

  /** DuckDB mirror of [[negativeSamples]] (same hash, same salt). */
  def negativeSamplesSql(k: Int = NegativeDraws,
      itemSpace: Int = NegativeItemSpace): String = {
    val h = "CAST(('0x' || substr(md5('neg:' || CAST(user_id AS VARCHAR) || ':' " +
      "|| CAST(draw AS VARCHAR)), 1, 15)) AS BIGINT)"
    s"""WITH pos AS (SELECT DISTINCT user_id,
       |    CAST(json_extract_string(props, '$$.k') AS INTEGER) AS song_id
       |  FROM events),
       |u AS (SELECT DISTINCT user_id FROM pos),
       |cand AS (SELECT user_id, draw,
       |    CAST($h % $itemSpace AS INTEGER) AS neg_song_id
       |  FROM u, LATERAL (SELECT unnest(generate_series(0, ${k - 1})) AS draw))
       |SELECT c.user_id, CAST(c.draw AS INTEGER) AS draw, c.neg_song_id FROM cand c
       |LEFT JOIN pos p ON c.user_id = p.user_id AND c.neg_song_id = p.song_id
       |WHERE p.user_id IS NULL
       |ORDER BY c.user_id, c.draw""".stripMargin
  }

  /** DuckDB mirror of [[bm25TopKOf]] for the driver oracle — generated
    * from the same term list and constants so the expression trees
    * match operation-for-operation.
    */
  def bm25Sql(terms: Seq[String] = QueryTerms, k: Int = 10): String = {
    val tfCols = terms.zipWithIndex.map { case (term, i) =>
      s"CAST(len(list_filter(l, x -> x = '$term')) AS INTEGER) AS tf$i"
    }.mkString(",\n  ")
    val dfCols = terms.indices.map(i =>
      s"SUM(CASE WHEN tf$i > 0 THEN 1 ELSE 0 END) AS df$i").mkString(", ")
    val scoreTerms = terms.indices.map { i =>
      val idf = s"((CAST(n - df$i AS DOUBLE) + 0.5) / (CAST(df$i AS DOUBLE) + 0.5))"
      val norm = s"($K1 * ((1.0 - $B) + ($B * (CAST(dl AS DOUBLE) / (CAST(sdl AS DOUBLE) / n)))))"
      s"($idf * ((CAST(tf$i AS DOUBLE) * $K1Plus1) / (CAST(tf$i AS DOUBLE) + $norm)))"
    }
    val score = scoreTerms.reduceLeft((a, b) => s"($a + $b)")
    val tfOut = terms.indices.map(i => s"tf$i").mkString(", ")
    s"""WITH p AS (
       |  SELECT doc_id, CAST(len(l) AS INTEGER) AS dl,
       |  $tfCols
       |  FROM (SELECT doc_id, string_split(text, ' ') AS l FROM documents)
       |), s AS (
       |  SELECT COUNT(*) AS n, SUM(dl) AS sdl, $dfCols FROM p
       |)
       |SELECT doc_id, dl AS n_tokens, $tfOut, $score AS score
       |FROM p, s
       |ORDER BY score DESC, doc_id LIMIT $k""".stripMargin
  }

  /** RRF constant k (the standard Cormack/Clarke value). */
  val RrfK = 60L
  /** Fixed-point numerator for the RRF terms: score contributions are
    * `1e9 div (k + rank)` — exact integers, so the fused ORDER is never
    * decided by a float (the discretization loses nothing at these
    * list depths: 1e9/(60+r) is injective in r for r ≤ 10⁴).
    */
  val RrfNano = 1000000000L
  /** Queries / per-source depth / fused depth for [[rrfFusion]]. */
  val FusionQueries = 4
  val FusionPerSource = 20
  val FusionOut = 10

  /** Hybrid retrieval via reciprocal-rank fusion — the production RAG
    * pattern: a SEMANTIC ranking (embedding cosine over the
    * `embeddings` table) and a LEXICAL ranking (word-3-gram Jaccard
    * over the same id space of `documents`, the [[Dedup.shingleSetOf]]
    * shingles) are fused per query as Σ 1e9 div (60 + rank), and the
    * fused top-[[FusionOut]] is emitted with both source ranks (0 =
    * absent from that source's top-[[FusionPerSource]]).
    *
    * Scale shape: the semantic side is [[Similarity.cosineTopKOf]]'s
    * two-phase top-k (broadcast queries, partition-local prune); the
    * lexical side joins the corpus shingle relation against the
    * BROADCAST query shingle sets (each corpus shingle row meets at
    * most nQueries query rows — no pairwise posting-list blowup, no df
    * cap needed), then the same two-phase top-k; the fusion itself is
    * a full-outer join of two (queries × k)-sized relations. Nothing
    * shuffles the corpus beyond the one (query, doc) intersect count.
    */
  def rrfFusion(spark: SparkSession, dir: String,
      nQueries: Int = FusionQueries, kPer: Int = FusionPerSource,
      kOut: Int = FusionOut): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val emb = Tables.widened(spark, Tables.embeddings(spark, dir))
    val sem = Similarity.cosineTopKOf(emb, kPer, nQueries)
      .select($"query_id", $"neighbor_id".as("id"),
        $"rank".cast("long").as("rank_sem"))
    // lexical candidates restricted to the embedded id space so both
    // rankings range over the same documents (the dedupMethodAgreement
    // restriction)
    val ids = emb.select($"vec_id")
    val docs = Tables.widened(spark, Tables.documents(spark, dir))
      .join(ids, $"doc_id" === $"vec_id", "left_semi")
    val sh = Dedup.shingleSetOf(docs, 3)
    val sizes = sh.groupBy($"doc_id").agg(count(lit(1)).as("sz"))
    val qsh = sh.filter($"doc_id" < nQueries)
      .select($"doc_id".as("query_id"), $"h")
    val qsz = sizes.filter($"doc_id" < nQueries)
      .select($"doc_id".as("query_id"), $"sz".as("qsz"))
    val inter = sh.join(broadcast(qsh), Seq("h"))
      .filter($"doc_id" =!= $"query_id")
      .groupBy($"query_id", $"doc_id").agg(count(lit(1)).as("inter"))
    val jac = inter.join(sizes, Seq("doc_id"))
      .join(broadcast(qsz), Seq("query_id"))
      .select($"query_id", $"doc_id",
        expr("(inter * 1000000) div (sz + qsz - inter)").as("jac_ppm"))
    val localW = Window.partitionBy($"query_id", spark_partition_id())
      .orderBy($"jac_ppm".desc, $"doc_id")
    val globalW = Window.partitionBy($"query_id")
      .orderBy($"jac_ppm".desc, $"doc_id")
    val lex = jac
      .withColumn("lrn", row_number().over(localW)).filter($"lrn" <= kPer)
      .withColumn("rank_lex", row_number().over(globalW).cast("long"))
      .filter($"rank_lex" <= kPer)
      .select($"query_id", $"doc_id".as("id"), $"rank_lex")
    val fused = sem.join(lex, Seq("query_id", "id"), "full_outer")
      .select($"query_id", $"id",
        coalesce($"rank_sem", lit(0L)).as("rank_sem"),
        coalesce($"rank_lex", lit(0L)).as("rank_lex"),
        (coalesce(expr(s"$RrfNano div ($RrfK + rank_sem)"), lit(0L)) +
          coalesce(expr(s"$RrfNano div ($RrfK + rank_lex)"), lit(0L)))
          .as("rrf_nano"))
    val fusedW = Window.partitionBy($"query_id")
      .orderBy($"rrf_nano".desc, $"id")
    fused.withColumn("rank_fused", row_number().over(fusedW).cast("long"))
      .filter($"rank_fused" <= kOut)
      .select($"query_id", $"rank_fused", $"id", $"rank_sem", $"rank_lex",
        $"rrf_nano")
      .orderBy($"query_id", $"rank_fused")
  }

  /** DuckDB oracle for [[rrfFusion]] — the identical two rankings and
    * fusion arithmetic. `vecCtes`/shingle fragments are inlined here
    * (not shared with SparkEntry's private CTE vals) so the fragment
    * stays next to the algorithm it mirrors.
    */
  def rrfFusionSql(nQueries: Int = FusionQueries,
      kPer: Int = FusionPerSource, kOut: Int = FusionOut): String = {
    val h60t = "CAST(('0x' || substr(md5(text), 1, 15)) AS BIGINT)"
    val h60g = "CAST(('0x' || substr(md5(array_to_string(l[i:i+2], ' ')), 1, 15)) AS BIGINT)"
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |n AS (SELECT vec_id, v, sqrt(list_inner_product(v, v)) AS nrm FROM e),
       |q AS (SELECT vec_id AS query_id, v AS qv, nrm AS qn FROM n
       |  WHERE vec_id < $nQueries),
       |semscored AS (SELECT query_id, a.vec_id AS id,
       |    list_inner_product(qv, a.v) / qn / a.nrm AS cos
       |  FROM n a JOIN q ON a.vec_id <> query_id),
       |sem AS (SELECT query_id, id, CAST(ROW_NUMBER() OVER (
       |    PARTITION BY query_id ORDER BY cos DESC, id) AS BIGINT)
       |    AS rank_sem FROM semscored
       |  QUALIFY rank_sem <= $kPer),
       |d AS (SELECT doc_id, text, string_split(text, ' ') AS l
       |  FROM documents WHERE doc_id IN (SELECT vec_id FROM embeddings)),
       |sh AS (SELECT DISTINCT doc_id, unnest(ss) AS h FROM (
       |  SELECT doc_id, CASE WHEN len(l) < 3 THEN [$h60t]
       |    ELSE list_transform(generate_series(1, len(l) - 2),
       |           i -> $h60g) END AS ss FROM d)),
       |sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
       |qsh AS (SELECT doc_id AS query_id, h FROM sh WHERE doc_id < $nQueries),
       |qsz AS (SELECT doc_id AS query_id, sz AS qsz FROM sizes
       |  WHERE doc_id < $nQueries),
       |i AS (SELECT qsh.query_id, sh.doc_id, COUNT(*) AS inter
       |  FROM sh JOIN qsh USING (h) WHERE sh.doc_id <> qsh.query_id
       |  GROUP BY 1, 2),
       |jac AS (SELECT i.query_id, i.doc_id,
       |    (inter * 1000000) // (sz + qsz - inter) AS jac_ppm
       |  FROM i JOIN sizes ON i.doc_id = sizes.doc_id
       |  JOIN qsz ON i.query_id = qsz.query_id),
       |lex AS (SELECT query_id, doc_id AS id, CAST(ROW_NUMBER() OVER (
       |    PARTITION BY query_id ORDER BY jac_ppm DESC, doc_id) AS BIGINT)
       |    AS rank_lex FROM jac
       |  QUALIFY rank_lex <= $kPer),
       |fused AS (SELECT
       |    COALESCE(sem.query_id, lex.query_id) AS query_id,
       |    COALESCE(sem.id, lex.id) AS id,
       |    COALESCE(sem.rank_sem, 0) AS rank_sem,
       |    COALESCE(lex.rank_lex, 0) AS rank_lex,
       |    COALESCE($RrfNano // ($RrfK + sem.rank_sem), 0)
       |      + COALESCE($RrfNano // ($RrfK + lex.rank_lex), 0) AS rrf_nano
       |  FROM sem FULL OUTER JOIN lex
       |    ON sem.query_id = lex.query_id AND sem.id = lex.id),
       |out AS (SELECT query_id, CAST(ROW_NUMBER() OVER (
       |    PARTITION BY query_id ORDER BY rrf_nano DESC, id) AS BIGINT)
       |    AS rank_fused, id, rank_sem, rank_lex, rrf_nano FROM fused)
       |SELECT query_id, rank_fused, id, rank_sem, rank_lex, rrf_nano
       |FROM out WHERE rank_fused <= $kOut
       |ORDER BY query_id, rank_fused""".stripMargin
  }

  /** Terms reported by [[postingListStats]] (top df, deterministic
    * (df DESC, word) tie-break).
    */
  val PostingTopTerms = 50

  /** Gap-encoded posting-list size estimate — the inverted-index
    * LAYOUT question behind every IR/retrieval store (public scheme:
    * Elias-γ-style delta encoding; e.g. Witten/Moffat/Bell, "Managing
    * Gigabytes"): store each term's sorted doc-id list as first-id +
    * deltas, each delta costing floor(log2(gap))+1 whole bits. For
    * high-df terms the gaps are small and the list compresses far
    * below 64-bit ids — the emitted ppm ratio quantifies exactly how
    * far, per term, in exact integers. Dataflow: distinct postings
    * (8-byte shuffled keys), df census to pick the top terms
    * (broadcast), ONE lag window per term partition for the deltas —
    * no collect, no per-term driver loop; at 100 TB each term's
    * posting list is one window partition, the same bound every
    * sharded index build accepts.
    */
  def postingListStats(spark: SparkSession, dir: String,
      topTerms: Int = PostingTopTerms): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val postings = Tables.widened(spark, Tables.documents(spark, dir))
      .select(explode(TextFns.tokens($"text")).as("word"), $"doc_id")
      .distinct()
    val top = postings.groupBy($"word").agg(count(lit(1)).as("df"))
      .orderBy($"df".desc, $"word").limit(topTerms)
    val w = Window.partitionBy($"word").orderBy($"doc_id")
    val gapped = postings.join(broadcast(top), Seq("word"))
      .withColumn("prev", lag($"doc_id", 1).over(w))
      // first posting stores doc_id+1 (ids start at 0); deltas ≥ 1
      .withColumn("gap", when($"prev".isNull, $"doc_id" + 1)
        .otherwise($"doc_id" - $"prev"))
      .withColumn("bits", (length(bin($"gap"))).cast("long"))
    gapped.groupBy($"word").agg(
        max($"df").as("df"),
        sum($"bits").as("gap_bits"))
      .select($"word", $"df", $"gap_bits",
        ($"df" * 64L).as("raw_bits"),
        expr("gap_bits * 1000000 div (df * 64)").as("size_ppm"))
      .orderBy($"df".desc, $"word")
  }

  /** [[postingListStats]] oracle. */
  def postingListStatsSql(topTerms: Int = PostingTopTerms): String =
    s"""WITH p AS (SELECT DISTINCT unnest(string_split(text, ' ')) AS word, doc_id
       |  FROM documents),
       |top AS (SELECT word, COUNT(*) AS df FROM p GROUP BY word
       |  ORDER BY df DESC, word LIMIT $topTerms),
       |g AS (SELECT p.word, top.df,
       |    COALESCE(p.doc_id - LAG(p.doc_id) OVER (
       |      PARTITION BY p.word ORDER BY p.doc_id), p.doc_id + 1) AS gap
       |  FROM p JOIN top ON p.word = top.word)
       |SELECT word, CAST(MAX(df) AS BIGINT) AS df,
       |  CAST(SUM(length(bin(gap))) AS BIGINT) AS gap_bits,
       |  CAST(MAX(df) AS BIGINT) * 64 AS raw_bits,
       |  CAST(SUM(length(bin(gap))) AS BIGINT) * 1000000
       |    // (CAST(MAX(df) AS BIGINT) * 64) AS size_ppm
       |FROM g GROUP BY word ORDER BY df DESC, word""".stripMargin
}
