package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}

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
}
