package graft.operators

import graft.Tables
import graft.functions.TextFns
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication operators for the training-data pipeline (north-star
  * extension set): exact, n-gram Jaccard, MinHash+LSH, embedding
  * cosine. Everything is shuffle-on-key dataflow — no driver-side
  * loops, no collect — so each op scales with partitions:
  *
  *  - exact: one hash aggregation on md5(text) (shuffle one 32-char key
  *    + counts per distinct doc, never the text bodies);
  *  - jaccard: inverted index join (shuffle keyed by shingle), the
  *    standard "similar pairs via shared token" plan;
  *  - minhash: 16 min() aggregates over the same inverted index, then a
  *    band-key equi-join — candidate generation cost is O(docs·bands),
  *    independent of the pair count, which is what makes near-dup
  *    feasible at 100 TB where all-pairs Jaccard is not.
  */
object Dedup {

  /** Word n-gram shingle set, exploded as distinct (doc_id, shingle).
    * Shingles are md5-hashed so downstream shuffles move 32-char keys
    * instead of raw n-grams (and the hash is cross-engine stable).
    */
  private[operators] def shingleSet(spark: SparkSession, dir: String, n: Int): DataFrame = {
    import spark.implicits._
    val t = TextFns.tokens($"text")
    val sh = when(size(t) < n, array(md5($"text")))
      .otherwise(transform(
        sequence(lit(1), size(t) - lit(n - 1)),
        i => md5(concat_ws(" ", slice(t, i, lit(n))))))
    Tables.documents(spark, dir)
      .select($"doc_id", explode(sh).as("shingle"))
      .distinct()
  }

  /** Exact dedup: group identical texts (by md5), keep the smallest
    * doc_id as the canonical representative.
    */
  def exactDedup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .groupBy(md5($"text").as("text_hash"))
      .agg(min($"doc_id").as("keeper"), count(lit(1)).as("n_copies"))
      .orderBy($"keeper")
  }

  /** N-gram Jaccard near-dup pairs >= minJ via inverted-index join. */
  def ngramJaccard(spark: SparkSession, dir: String, n: Int = 3,
      minJ: Double = 0.3): DataFrame = {
    import spark.implicits._
    val sh = shingleSet(spark, dir, n).cache()
    val sizes = sh.groupBy($"doc_id").agg(count(lit(1)).as("sz"))
    val common = sh.as("a").join(sh.as("b"),
        $"a.shingle" === $"b.shingle" && $"a.doc_id" < $"b.doc_id")
      .groupBy($"a.doc_id".as("doc_a"), $"b.doc_id".as("doc_b"))
      .agg(count(lit(1)).as("common"))
    val j = common
      .join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("sz", "na"), "doc_a")
      .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("sz", "nb"), "doc_b")
      .select($"doc_a", $"doc_b",
        ($"common".cast("double") / ($"na" + $"nb" - $"common")).as("jaccard"))
    j.filter($"jaccard" >= minJ).orderBy($"doc_a", $"doc_b")
  }

  /** MinHash signature columns: sig_j = min over shingles of
    * md5(j || '|' || shingle). One aggregation pass computes all 16
    * mins — no per-doc arrays, fully partial-aggregatable.
    */
  private def minhashSigs(sh: DataFrame, numHashes: Int): DataFrame = {
    val aggs = (0 until numHashes).map(jh =>
      min(md5(concat(lit(jh.toString), lit("|"), col("shingle")))).as(s"sig$jh"))
    sh.groupBy(col("doc_id")).agg(aggs.head, aggs.tail: _*)
  }

  /** MinHash+LSH candidate pairs with verified Jaccard. bands=4 bands of
    * r=4 rows over 16 hashes; a pair is a candidate iff all 4 sigs of
    * some band agree (md5 is injective in practice, so candidates
    * always share >= 1 shingle and the verify join is never empty).
    * Output is fully deterministic: candidates are a pure function of
    * the md5 minhashes, and the verified jaccard of integer set sizes.
    */
  def minhashLsh(spark: SparkSession, dir: String, n: Int = 3,
      numHashes: Int = 16, bands: Int = 4): DataFrame = {
    import spark.implicits._
    val r = numHashes / bands
    val sh = shingleSet(spark, dir, n).cache()
    val sigs = minhashSigs(sh, numHashes)
    val bandCols = (0 until bands).map { b =>
      val parts = (0 until r).map(i => col(s"sig${b * r + i}"))
      struct(lit(b).as("band"), md5(concat_ws("|", parts: _*)).as("key"))
    }
    val banded = sigs.select($"doc_id", explode(array(bandCols: _*)).as("bk"))
      .select($"doc_id", $"bk.band".as("band"), $"bk.key".as("key"))
    val cand = banded.as("x").join(banded.as("y"),
        $"x.band" === $"y.band" && $"x.key" === $"y.key" && $"x.doc_id" < $"y.doc_id")
      .select($"x.doc_id".as("doc_a"), $"y.doc_id".as("doc_b"))
      .distinct()
    val sizes = sh.groupBy($"doc_id").agg(count(lit(1)).as("sz"))
    // verify ONLY candidate pairs (this is the point of LSH: the
    // all-pairs shared-shingle join never happens). Candidates are few,
    // so the shingle joins below touch O(|cand| * shingles/doc) rows.
    val common = cand
      .join(sh.select($"doc_id".as("doc_a"), $"shingle"), Seq("doc_a"))
      .join(sh.select($"doc_id".as("doc_b"), $"shingle"), Seq("doc_b", "shingle"))
      .groupBy($"doc_a", $"doc_b")
      .agg(count(lit(1)).as("common"))
    common
      .join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("sz", "na"), "doc_a")
      .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("sz", "nb"), "doc_b")
      .select($"doc_a", $"doc_b",
        ($"common".cast("double") / ($"na" + $"nb" - $"common")).as("jaccard"))
      .orderBy($"doc_a", $"doc_b")
  }

  /** Embedding cosine near-dup pairs >= minCos. Norms are precomputed
    * per vector (one pass) so the pair loop does a single dot product.
    * Brute-force all-pairs is the verification baseline; the scale path
    * is Similarity.ivfTopK's bucketing.
    */
  def embeddingNearDup(spark: SparkSession, dir: String,
      minCos: Double = 0.4): DataFrame = {
    import spark.implicits._
    import graft.plans.FloatDotProduct.floatDot
    val e = Tables.embeddings(spark, dir).select($"vec_id", $"embedding".as("v"))
    val withNorm = e.withColumn("nrm", sqrt(floatDot($"v", $"v")))
    val a = withNorm.select($"vec_id".as("vec_a"), $"v".as("va"), $"nrm".as("na"))
    val b = withNorm.select($"vec_id".as("vec_b"), $"v".as("vb"), $"nrm".as("nb"))
    val dot = floatDot($"va", $"vb")
    a.join(b, $"vec_a" < $"vec_b")
      .select($"vec_a", $"vec_b", (dot / $"na" / $"nb").as("cos"))
      .filter($"cos" >= minCos)
      .orderBy($"vec_a", $"vec_b")
  }
}
