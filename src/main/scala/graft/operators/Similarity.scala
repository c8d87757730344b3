package graft.operators

import graft.Tables
import graft.plans.FloatDotProduct.floatDot
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over the embedding column
  * (north-star extension): brute-force cosine top-k as the exact
  * baseline, and an IVF (inverted-file) variant as the scale path.
  *
  * All vector math is a sequential double fold over the float array —
  * codegen'd higher-order functions, bit-identical to the DuckDB
  * oracle's list_inner_product on DOUBLE[].
  */
object Similarity {

  // native codegen'd dot product (graft.plans.FloatDotProduct): same
  // left-to-right double accumulation as the HOF fold, no allocation
  private def dot(a: Column, b: Column): Column = floatDot(a, b)
  private def norm(c: Column): Column = sqrt(floatDot(c, c))

  /** Brute-force cosine top-k neighbors for the first nQueries vectors.
    *
    * Scale shape: the query side is tiny and broadcast; the candidate
    * scan is embarrassingly parallel; top-k is two-phase — a
    * partition-local row_number prune keeps k rows per (query,
    * partition) before the global per-query sort, so the final shuffle
    * carries O(queries * partitions * k) rows, not the full candidate
    * set. (With billions of candidates the global window would
    * otherwise funnel everything into #queries reducers.)
    */
  def cosineTopK(spark: SparkSession, dir: String, k: Int = 5,
      nQueries: Int = 8): DataFrame =
    cosineTopKOf(Tables.embeddings(spark, dir), k, nQueries)

  /** [[cosineTopK]] over any (vec_id, embedding ARRAY<FLOAT>). */
  def cosineTopKOf(embeddings: DataFrame, k: Int = 5,
      nQueries: Int = 8): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val e = embeddings
      .select($"vec_id", $"embedding".as("v"))
      .withColumn("nrm", norm($"v"))
    val q = e.filter($"vec_id" < nQueries)
      .select($"vec_id".as("query_id"), $"v".as("qv"), $"nrm".as("qn"))
    val scored = e.join(broadcast(q), $"vec_id" =!= $"query_id")
      .select($"query_id", $"vec_id".as("neighbor_id"),
        (dot($"qv", $"v") / $"qn" / $"nrm").as("cos"))
    val local = Window.partitionBy($"query_id", spark_partition_id())
      .orderBy($"cos".desc, $"neighbor_id")
    val global = Window.partitionBy($"query_id")
      .orderBy($"cos".desc, $"neighbor_id")
    scored
      .withColumn("lrn", row_number().over(local)).filter($"lrn" <= k)
      .withColumn("rank", row_number().over(global)).filter($"rank" <= k)
      .select($"query_id", $"rank", $"neighbor_id", $"cos")
      .orderBy($"query_id", $"rank")
  }

  /** Sign-random-projection (hyperplane) LSH geometry: `Planes(j)(i)`
    * is a 3-decimal rational in [-1, 1] from a fixed multiplicative
    * hash — exact to print, parse, and dot in both engines. Shared
    * with the SQL oracle generator.
    */
  val SrpPlanes: Seq[Seq[Double]] = (0 until 16).map { j =>
    (0 until 64).map { i =>
      (((j * 64 + i) * 2654435761L % 2001) - 1000) / 1000.0
    }
  }

  /** splitmix64 finalizer: a deterministic mixer whose successive
    * outputs are decorrelated. [[SrpPlanes]]' multiplicative
    * progression mod 2001 makes consecutive planes near-translates of
    * each other — harmless for the oracle-mirrored top-k, fatal for
    * BANDED LSH, where correlated planes make band keys collide
    * together and miss together (measured: ~half the recall the
    * independence math predicts). Kept separate so SrpPlanes stays
    * frozen for the round-1 oracle.
    */
  private def mix64(k: Long): Long = {
    var z = k + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** Banded-SRP geometry for whole-corpus near-dup (Dedup
    * .embeddingNearDupLsh): NearDupBands bands × NearDupRows sign bits,
    * each bit from one 64-dim hyperplane of 3-decimal rationals
    * (print-exact in both engines). A pair is a candidate iff some
    * band's full sign pattern agrees — the cosine analog of the
    * minhash band join. Recall at cos c: 1-(1-p^r)^L with
    * p = 1-acos(c)/π; r (selectivity) is the knob that grows with
    * corpus size, L (recall) with the miss budget.
    */
  val NearDupBands = 16
  val NearDupRows = 5
  val NearDupPlanes: Seq[Seq[Double]] = (0 until NearDupBands * NearDupRows).map { j =>
    (0 until 64).map { i =>
      (java.lang.Long.remainderUnsigned(mix64(j * 64L + i), 2001L) - 1000L) / 1000.0
    }
  }

  /** LSH-bucketed ANN (the other classic scale path besides IVF):
    * each vector's bucket is the 16-bit sign pattern of its dot
    * products with the fixed hyperplanes; a query scans only its own
    * bucket. Index build is a single projection (no training pass, vs
    * IVF's assignment join); recall comes from bucket granularity.
    * Approximate by construction — the oracle mirrors the same
    * algorithm, so the check is exact.
    */
  def srpTopK(spark: SparkSession, dir: String, k: Int = 5,
      nQueries: Int = 8): DataFrame =
    srpTopKOf(Tables.embeddings(spark, dir), k, nQueries)

  /** [[srpTopK]] over any (vec_id, embedding ARRAY<FLOAT>). */
  def srpTopKOf(embeddings: DataFrame, k: Int = 5,
      nQueries: Int = 8): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    // plane dots run in the double domain (3-decimal plane values are
    // parse-exact as doubles in both engines; they are NOT exact as
    // floats): the codegen'd double_dot fold == DuckDB
    // list_inner_product on DOUBLE[], same left-to-right accumulation
    val vd = $"v".cast("array<double>")
    val planeDots = SrpPlanes.map(p =>
      graft.plans.FloatDotProduct.doubleDot(vd, typedLit(p)))
    val bucket = planeDots.zipWithIndex
      .map { case (d, j) => when(d >= 0, lit(1 << j)).otherwise(lit(0)) }
      .reduce(_ + _)
    val e = embeddings
      .select($"vec_id", $"embedding".as("v"))
      .withColumn("nrm", norm($"v"))
      .withColumn("bucket", bucket)
    val q = e.filter($"vec_id" < nQueries)
      .select($"vec_id".as("query_id"), $"v".as("qv"), $"nrm".as("qn"), $"bucket")
    val scored = e.join(broadcast(q), Seq("bucket"))
      .filter($"vec_id" =!= $"query_id")
      .select($"query_id", $"vec_id".as("neighbor_id"),
        (dot($"qv", $"v") / $"qn" / $"nrm").as("cos"))
    val global = Window.partitionBy($"query_id").orderBy($"cos".desc, $"neighbor_id")
    scored.withColumn("rank", row_number().over(global)).filter($"rank" <= k)
      .select($"query_id", $"rank", $"neighbor_id", $"cos")
      .orderBy($"query_id", $"rank")
  }

  // ---- deterministic k-means (Lloyd) in a fixed-point domain ----
  //
  // Components quantize to integer-valued doubles (round(x*1e6)), so
  // every inner product and per-dimension sum is an exact integer in
  // double arithmetic — no fold-order sensitivity — and the centroid
  // update floor(sum/count) keeps the domain closed under iteration.
  // That makes a TRAINED coarse quantizer cross-engine deterministic:
  // the DuckDB oracle unrolls the same iterations and lands on
  // bit-identical centroids.

  // codegen'd fold — bit-identical to aggregate(zip_with(...)) by
  // PropertySpec's doubleToLongBits law; both sides arrive as
  // ARRAY<DOUBLE> (centroid means are floor()ed to integer-valued
  // doubles below so the fixed-point domain stays closed AND typed)
  private def qdot(a: Column, b: Column): Column =
    graft.plans.FloatDotProduct.doubleDot(a, b)

  private def quantize(v: Column): Column =
    transform(v.cast("array<double>"), x => round(x * lit(1000000.0)))

  /** Centroids collected to the driver, ascending cent_id (the argmax
    * tie order). Coarse-quantizer centroid sets are tiny by
    * construction (k = n/centroidEvery here, k ≈ √n in production
    * IVF), and every engine ships them to the data rather than joining
    * — MLlib's KMeans collects centers between Lloyd steps the same
    * way. The collected values are exact: quantized components and
    * floor()ed means are integer-valued doubles, floats are binary.
    */
  private def collectCents[T](df: DataFrame): Seq[(Long, Seq[T])] =
    df.collect().toSeq.map(r => (r.getLong(0), r.getSeq[T](1))).sortBy(_._1)

  /** Per-centroid cosine columns in the quantized domain, mirroring
    * the oracle's operand order exactly: (qdot / |qv|) / |cv|. The
    * centroid norm is a driver-side Math.sqrt of an exact integer sum,
    * bit-identical to the engine's sqrt(qdot(cv, cv)).
    */
  private def qcsims(qv: Column, cents: Seq[(Long, Seq[Double])]): Seq[Column] = {
    val na = sqrt(qdot(qv, qv))
    cents.map { case (_, cv) =>
      val cn = math.sqrt(cv.foldLeft(0.0)((acc, x) => acc + x * x))
      qdot(qv, typedLit(cv)) / na / lit(cn)
    }
  }

  /** Nearest-centroid id as a PURE PROJECTION: one array of codegen'd
    * dots (the SRP-planes shape) + array_max/array_position argmax.
    * Ties land on the smallest cent_id because the array is built in
    * ascending cent_id order and array_position returns the FIRST
    * match — the (csim DESC, cent_id) order the oracle mirrors with
    * row_number. No join, no shuffle, no sort, no window (round 2's
    * one remaining scale-killer was a row_number window forcing a
    * sort-shuffle of the vecs×cents product): assignment is O(rows·k·d)
    * map-side work, exactly MLlib KMeans' broadcast-assign. For a k
    * too large for a plan literal (≈10⁴+), the same argmax would read
    * a broadcast variable inside mapPartitions; IVF keeps k ≈ √n, far
    * below that point here.
    */
  private def nearestCent(csims: Seq[Column], ids: Seq[Long]): Column = {
    val cs = array(csims: _*)
    element_at(typedLit(ids), array_position(cs, array_max(cs)).cast("int"))
  }

  /** Top-`nprobe` centroid ids by (csim desc, cent_id asc), again as a
    * projection: sort (-csim, cent_id) pairs ascending, slice. The
    * negation is exact, so the order equals the oracle's csim DESC.
    */
  private def topProbes(csims: Seq[Column], ids: Seq[Long], nprobe: Int): Column = {
    val pairs = array(csims.zip(ids).map { case (c, id) =>
      struct((-c).as("nc"), lit(id).as("cent_id"))
    }: _*)
    slice(array_sort(pairs), 1, nprobe)
  }

  /** One Lloyd step: element-wise floor-of-mean per cluster. The
    * explode/groupBy is partial-aggregatable (shuffle key (cent_id,
    * pos), integer sums); empty clusters drop out by GROUP BY
    * semantics, identically in the oracle.
    */
  private def lloydStep(assigned: DataFrame): DataFrame = {
    val spark = assigned.sparkSession
    import spark.implicits._
    assigned.select($"cent_id", posexplode($"qv"))
      .toDF("cent_id", "pos", "x")
      .groupBy($"cent_id", $"pos")
      .agg(floor(sum($"x") / count(lit(1))).cast("double").as("m"))
      .groupBy($"cent_id")
      .agg(transform(array_sort(collect_list(struct($"pos", $"m"))),
        s => s("m")).as("cv"))
  }

  /** IVF with a TRAINED coarse quantizer: seeds = the vec_id %
    * centroidEvery subsample, refined by `iters` Lloyd steps, then the
    * standard IVF assign/probe/scan. Scoring uses the original float
    * vectors (same codegen'd double fold as [[cosineTopK]]); only the
    * quantizer runs in the fixed-point domain. Fully deterministic, so
    * the oracle check is exact even though the index is approximate.
    */
  def ivfKmeansTopK(spark: SparkSession, dir: String, k: Int = 5,
      nQueries: Int = 8, centroidEvery: Int = 250, nprobe: Int = 2,
      iters: Int = 2): DataFrame =
    ivfKmeansTopKOf(Tables.embeddings(spark, dir), k, nQueries,
      centroidEvery, nprobe, iters)

  /** [[ivfKmeansTopK]] over any (vec_id, embedding ARRAY<FLOAT>). */
  def ivfKmeansTopKOf(embeddings: DataFrame, k: Int = 5,
      nQueries: Int = 8, centroidEvery: Int = 250, nprobe: Int = 2,
      iters: Int = 2): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    // cached: quantizer training runs iters+1 short jobs over this
    // projection. Like Dedup's *Of entry points, the block lives until
    // the caller clears the session cache (Bench/Verify do per query).
    val e = embeddings
      .select($"vec_id", $"embedding".as("v"))
      .withColumn("nrm", norm($"v"))
      .withColumn("qv", quantize($"v"))
      .cache()
    var cents = collectCents[Double](
      e.filter(pmod($"vec_id", lit(centroidEvery)) === 0)
        .select($"vec_id".as("cent_id"), $"qv".as("cv")))
    for (_ <- 0 until iters)
      cents = collectCents[Double](lloydStep(
        e.select($"vec_id", $"qv",
          nearestCent(qcsims($"qv", cents), cents.map(_._1)).as("cent_id"))))
    val ids = cents.map(_._1)
    val assigned = e.select(
      nearestCent(qcsims($"qv", cents), ids).as("cent_id"),
      $"vec_id", $"v", $"nrm")
    val probes = e.filter($"vec_id" < nQueries)
      .select($"vec_id".as("query_id"), $"v".as("qvec"), $"nrm".as("qn"),
        explode(topProbes(qcsims($"qv", cents), ids, nprobe)).as("p"))
      .select($"query_id", $"qvec", $"qn", $"p.cent_id".as("cent_id"))
    val scored = assigned.join(broadcast(probes), Seq("cent_id"))
      .filter($"vec_id" =!= $"query_id")
      .select($"query_id", $"vec_id".as("neighbor_id"),
        (dot($"qvec", $"v") / $"qn" / $"nrm").as("cos"))
    val global = Window.partitionBy($"query_id").orderBy($"cos".desc, $"neighbor_id")
    scored.withColumn("rank", row_number().over(global)).filter($"rank" <= k)
      .select($"query_id", $"rank", $"neighbor_id", $"cos")
      .orderBy($"query_id", $"rank")
  }

  /** IVF-style ANN: coarse "centroids" are a deterministic subsample
    * (vec_id % centroidEvery == 0); every vector is assigned to its
    * nearest centroid (one broadcast join — this is the index build);
    * each query probes its nprobe nearest centroids and scans only
    * those clusters. Approximate by construction; the oracle mirrors
    * the same algorithm, so the check is still exact.
    */
  def ivfTopK(spark: SparkSession, dir: String, k: Int = 5,
      nQueries: Int = 8, centroidEvery: Int = 250, nprobe: Int = 2): DataFrame =
    ivfTopKOf(Tables.embeddings(spark, dir), k, nQueries, centroidEvery, nprobe)

  /** Per-centroid cosine columns in the float domain, mirroring the
    * oracle's operand order exactly: (dot(cv, v) / |cv|) / |v|. The
    * centroid norm replays the engine's left-to-right double fold over
    * float products on the driver, so it is bit-identical to
    * sqrt(float_dot(cv, cv)).
    */
  private def fcsims(v: Column, nrm: Column, cents: Seq[(Long, Seq[Float])]): Seq[Column] =
    cents.map { case (_, cv) =>
      val cn = math.sqrt(
        cv.foldLeft(0.0)((acc, x) => acc + x.toDouble * x.toDouble))
      dot(typedLit(cv), v) / lit(cn) / nrm
    }

  /** [[ivfTopK]] over any (vec_id, embedding ARRAY<FLOAT>). */
  def ivfTopKOf(embeddings: DataFrame, k: Int = 5,
      nQueries: Int = 8, centroidEvery: Int = 250, nprobe: Int = 2): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val e = embeddings
      .select($"vec_id", $"embedding".as("v"))
      .withColumn("nrm", norm($"v"))
    // index build: nearest centroid per vector, as a pure projection
    // over the collected subsample quantizer (see nearestCent)
    val cents = collectCents[Float](
      e.filter(pmod($"vec_id", lit(centroidEvery)) === 0).select($"vec_id", $"v"))
    val ids = cents.map(_._1)
    val assigned = e.select(
      nearestCent(fcsims($"v", $"nrm", cents), ids).as("cent_id"),
      $"vec_id", $"v", $"nrm")
    // query probe lists: nprobe nearest centroids per query
    val probes = e.filter($"vec_id" < nQueries)
      .select($"vec_id".as("query_id"), $"v".as("qv"), $"nrm".as("qn"),
        explode(topProbes(fcsims($"v", $"nrm", cents), ids, nprobe)).as("p"))
      .select($"query_id", $"qv", $"qn", $"p.cent_id".as("cent_id"))
    // scan only the probed clusters
    val scored = assigned.join(broadcast(probes), Seq("cent_id"))
      .filter($"vec_id" =!= $"query_id")
      .select($"query_id", $"vec_id".as("neighbor_id"),
        (dot($"qv", $"v") / $"qn" / $"nrm").as("cos"))
    val global = Window.partitionBy($"query_id").orderBy($"cos".desc, $"neighbor_id")
    scored.withColumn("rank", row_number().over(global)).filter($"rank" <= k)
      .select($"query_id", $"rank", $"neighbor_id", $"cos")
      .orderBy($"query_id", $"rank")
  }
}
