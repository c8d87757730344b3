package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ranked-retrieval evaluation for the recommender family (M3/M6
  * companions — the reference evaluates its recommender with RMSE only,
  * engine.py:60; production recommenders are graded on the RANKED list:
  * MRR, hits@K, NDCG@10, MAP).
  *
  * Exactness contract (house style): every metric that must
  * hash-compare against DuckDB is an INTEGER. The DCG weights
  * 1/log2(i+1) are irrational, so they are discretized once on the
  * driver into a fixed-point literal table (nano-units,
  * [[dcgWeightNano]]) that is embedded verbatim in BOTH the Spark plan
  * and the oracle SQL — the same precomputed-literal trick as HLL's
  * linear-counting table (Sketches.scala): no runtime libm call whose
  * last bit could differ between engines ever runs. MRR and AP terms
  * are exact integer divisions of ppm-scaled ranks.
  *
  * Protocol: ratings split by a deterministic salted hash gate on
  * `event_id` (the TextOps.hashSplit idiom) — 80% train / 20% held-out
  * test. The ranked list under evaluation is the popularity baseline:
  * top-[[DefaultK]] songs by train rating count (tie-break song_id
  * asc). Per held-out user: first-hit rank, hits@K, MRR, NDCG@10 with
  * binary relevance, MAP@K.
  *
  * Scale shape: the ranked list is K rows (broadcast); the relevant-set
  * relation is one distinct over the test split; the per-user fold is a
  * single partial-aggregatable integer shuffle keyed by user. Nothing
  * is proportional to catalog × users.
  */
object RankingEval {

  /** Ranked-list length under evaluation. */
  val DefaultK = 20

  /** NDCG truncation depth. */
  val NdcgDepth = 10

  /** Fixed-point DCG weight: round(1e9 / log2(i+1)) for 1-based rank i.
    * Computed once on the driver, embedded as a literal in both
    * engines' plans.
    */
  val dcgWeightNano: Seq[Long] = (1 to DefaultK).map(i =>
    math.round(1e9 / (math.log(i + 1.0) / math.log(2.0))))

  /** Prefix sums of [[dcgWeightNano]] — idealDcgNano(r) for r relevant
    * items is prefix(min(r, NdcgDepth)).
    */
  val idealDcgNano: Seq[Long] = dcgWeightNano.take(NdcgDepth)
    .scanLeft(0L)(_ + _).tail

  /** Per-user ranking metrics of the popularity baseline against the
    * held-out 20% of ratings. Output (all BIGINT, ppm-scaled where
    * fractional): user_id, n_test_items, first_hit_rank (0 = no hit),
    * hits_at_k, mrr_ppm, ndcg10_ppm, map_ppm.
    */
  def rankingMetrics(spark: SparkSession, dir: String,
      k: Int = DefaultK): DataFrame = {
    import spark.implicits._
    val r = Relational.ratings(spark, dir)
      .filter($"song_id".isNotNull)
      .withColumn("bucket",
        (Dedup.hash60($"event_id".cast("string")) % 100).cast("int"))
    val train = r.filter($"bucket" < 80)
    val test = r.filter($"bucket" >= 80)

    // K-row ranked list: top-k by train count. The limit is a
    // TakeOrderedAndProject (distributed top-k); the row_number window
    // then runs over exactly k rows.
    val topk = train.groupBy($"song_id").agg(count(lit(1)).as("c"))
      .orderBy($"c".desc, $"song_id".asc).limit(k)
      .withColumn("rank",
        row_number().over(Window.orderBy($"c".desc, $"song_id".asc))
          .cast("long"))
      .select($"song_id", $"rank")

    val rel = test.select($"user_id", $"song_id").distinct()
    metricsOf(rel, topk, k)
  }

  /** Metric fold over an explicit (user_id, song_id) relevant-set
    * relation and a bounded (song_id, rank) ranked list — the unit the
    * fixture spec drives directly.
    */
  private[graft] def metricsOf(rel: DataFrame, topk: DataFrame,
      k: Int): DataFrame = {
    val spark = rel.sparkSession
    import spark.implicits._
    val nrel = rel.groupBy($"user_id")
      .agg(count(lit(1)).as("n_test_items"))

    val w = typedLit(dcgWeightNano)
    val hits = rel.join(broadcast(topk), Seq("song_id"))
      // per-user hit index j (1-based, by ascending rank) for the AP
      // terms; the frame is bounded by k rows per user
      .withColumn("j", row_number().over(
        Window.partitionBy($"user_id").orderBy($"rank")).cast("long"))
      // `div` (not `/`): Spark's Column./ is double division; integer
      // `div` truncates — identical to DuckDB's // on these positives
      .withColumn("ap_term", expr("(j * 1000000) div rank"))
      .withColumn("dcg_term",
        when($"rank" <= NdcgDepth,
          element_at(w, $"rank".cast("int"))).otherwise(0L))
    val agg = hits.groupBy($"user_id").agg(
      min($"rank").as("fr"),
      count(lit(1)).as("h"),
      sum($"dcg_term").as("dcg"),
      sum($"ap_term").as("ap_sum"))

    val ideal = typedLit(idealDcgNano)
    nrel.join(agg, Seq("user_id"), "left")
      .withColumn("idcg",
        element_at(ideal,
          least($"n_test_items", lit(NdcgDepth.toLong)).cast("int")))
      .select(
        $"user_id",
        $"n_test_items",
        coalesce($"fr", lit(0L)).as("first_hit_rank"),
        coalesce($"h", lit(0L)).as("hits_at_k"),
        coalesce(expr("1000000 div fr"), lit(0L)).as("mrr_ppm"),
        coalesce(expr("(dcg * 1000000) div idcg"), lit(0L))
          .as("ndcg10_ppm"),
        coalesce(expr(s"ap_sum div least(n_test_items, ${k}L)"), lit(0L))
          .as("map_ppm"))
      .orderBy($"user_id")
  }

  /** DuckDB oracle: the identical protocol with the identical literal
    * weight tables.
    */
  def rankingMetricsSql(k: Int = DefaultK): String = {
    val h60 = "CAST(('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 15)) AS BIGINT)"
    val wList = dcgWeightNano.mkString("[", ", ", "]")
    val iList = idealDcgNano.mkString("[", ", ", "]")
    s"""WITH r AS (
       |  SELECT event_id, user_id,
       |    CAST(json_extract_string(props, '$$.k') AS INTEGER) AS song_id,
       |    $h60 % 100 AS bucket
       |  FROM events
       |  WHERE json_extract_string(props, '$$.k') IS NOT NULL),
       |train AS (SELECT * FROM r WHERE bucket < 80),
       |test AS (SELECT * FROM r WHERE bucket >= 80),
       |pop AS (SELECT song_id, COUNT(*) AS c FROM train GROUP BY 1),
       |topk AS (SELECT song_id,
       |    ROW_NUMBER() OVER (ORDER BY c DESC, song_id) AS rank
       |  FROM pop ORDER BY c DESC, song_id LIMIT $k),
       |rel AS (SELECT DISTINCT user_id, song_id FROM test),
       |nrel AS (SELECT user_id, COUNT(*) AS n_test_items FROM rel GROUP BY 1),
       |hits AS (
       |  SELECT rel.user_id, t.rank,
       |    ROW_NUMBER() OVER (PARTITION BY rel.user_id ORDER BY t.rank) AS j
       |  FROM rel JOIN topk t USING (song_id)),
       |agg AS (
  -- CAST: DuckDB SUM(BIGINT) widens to HUGEINT; Spark stays BIGINT
       |  SELECT user_id, MIN(rank) AS fr, COUNT(*) AS h,
       |    CAST(SUM(CASE WHEN rank <= $NdcgDepth
       |        THEN ($wList)[rank] ELSE 0 END) AS BIGINT) AS dcg,
       |    CAST(SUM((j * 1000000) // rank) AS BIGINT) AS ap_sum
       |  FROM hits GROUP BY 1)
       |SELECT n.user_id, n.n_test_items,
       |  COALESCE(fr, 0) AS first_hit_rank,
       |  COALESCE(h, 0) AS hits_at_k,
       |  COALESCE(1000000 // fr, 0) AS mrr_ppm,
       |  COALESCE((dcg * 1000000) //
       |    ($iList)[LEAST(n.n_test_items, $NdcgDepth)], 0) AS ndcg10_ppm,
       |  COALESCE(ap_sum // LEAST(n.n_test_items, $k), 0) AS map_ppm
       |FROM nrel n LEFT JOIN agg USING (user_id)
       |ORDER BY user_id""".stripMargin
  }
}
