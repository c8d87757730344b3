package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed storage: the co-located-join scale path.
  *
  * A fact table bucketed (and sort-ordered) by its join key joins
  * against any other table bucketed the same way with NO exchange on
  * either side — at 100 TB that turns the recurring ratings ⋈ counts /
  * ratings ⋈ metadata joins from full shuffles into local merges.
  * Bucket pruning also serves point lookups on the bucket key.
  * (The reference re-shuffles every join every run — spark_music.py:105.)
  */
object Bucketing {

  /** Write `df` as a bucketed, per-bucket-sorted managed table. */
  def writeBucketed(df: DataFrame, table: String, buckets: Int,
      keys: Seq[String]): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .format("parquet")
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .saveAsTable(table)

  /** Read a bucketed table back (bucket metadata comes from the
    * catalog, which is what licenses the shuffle-free plan).
    */
  def readBucketed(spark: org.apache.spark.sql.SparkSession,
      table: String): DataFrame = spark.table(table)

  /** [[writeBucketed]] as an EXTERNAL table at an explicit path, so
    * scratch-scoped queries never write into the session warehouse.
    */
  def writeBucketedAt(df: DataFrame, table: String, path: String,
      buckets: Int, keys: Seq[String]): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .format("parquet")
      .option("path", path)
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .saveAsTable(table)

  /** Oracle-checked driver query: lineitem and its per-supplier
    * aggregate written as same-key bucketed tables, read back through
    * the catalog, and joined — asserted at plan time to contain ZERO
    * exchanges (the merge hint rules out a broadcast making the claim
    * vacuous), so the co-located-join path is proven under the driver,
    * not only in spec. The oracle is the PLAIN SQL join: bucketing
    * must be result-invisible.
    */
  def bucketJoinQuery(spark: SparkSession, dir: String,
      buckets: Int = 8): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.functions.{count, lit}
    // app-scoped names/paths: stable within a session (overwritten per
    // run), distinct across concurrent Verify/Bench processes,
    // reclaimed at JVM exit by the shared scratch registry
    val app = spark.sparkContext.applicationId.replaceAll("[^A-Za-z0-9]", "_")
    val scratch = Sources.scratchDir(spark, "bucket_join")
    val li = graft.Tables.lineitem(spark, dir)
      .select($"l_orderkey", $"l_linenumber", $"l_suppkey", $"l_quantity")
    val supp = li.groupBy($"l_suppkey")
      .agg(graft.Fx.dsum($"l_quantity").as("supp_qty"),
        count(lit(1)).as("supp_cnt"))
    val (tl, ts) = (s"graft_li_$app", s"graft_supp_$app")
    writeBucketedAt(li, tl, s"$scratch/li", buckets, Seq("l_suppkey"))
    writeBucketedAt(supp, ts, s"$scratch/supp", buckets, Seq("l_suppkey"))
    val joined = readBucketed(spark, tl)
      .join(readBucketed(spark, ts).hint("merge"), "l_suppkey")
    val plan = joined.queryExecution.executedPlan.toString
    require(!plan.contains("Exchange"),
      s"bucketed join must plan with zero exchanges:\n$plan")
    // (l_orderkey, l_linenumber) is NOT unique in the synthetic corpus
    // — order by every output column so any remaining ties are
    // identical rows and the ordered compare is well-defined
    joined.select($"l_orderkey", $"l_linenumber", $"l_suppkey",
        $"l_quantity", $"supp_qty", $"supp_cnt")
      .orderBy($"l_orderkey", $"l_linenumber", $"l_suppkey", $"l_quantity")
  }
}
