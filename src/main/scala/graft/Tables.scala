package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet corpus (TESTDATA.md).
  *
  * Every loader is a plain parquet scan with no driver-side work, so
  * Catalyst column pruning + filter pushdown reach the parquet reader
  * (verify with `.explain`: `PushedFilters`, `ReadSchema`). At 100 TB the
  * same code path applies — `spark.read.parquet` over a partitioned
  * directory tree; partition pruning comes for free once the layout is
  * hive-partitioned.
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** `events.parquet`'s `ts` column arrives in whatever precision the
    * corpus generator chose — TIMESTAMP(NANOS) in earlier drops (which
    * Spark's vectorized reader only accepts as a nanos-since-epoch
    * LONG under the legacy conf) or TIMESTAMP(MICROS)/NTZ in current
    * ones. Every downstream operator works on ONE contract: `ts` is
    * nanos-since-epoch LongType of the UTC wall time (matching the
    * DuckDB oracle's `epoch_us(ts) * 1000`). Normalize here: a LONG
    * read passes through; a timestamp read is converted via
    * `unix_micros` under a UTC session zone (micros→nanos ×1000 is
    * exact — epoch-µs < 2^53 ≪ 2^63). Both confs are runtime-settable,
    * so this works under any caller-provided session (driver smoke
    * included).
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = table(spark, dir, "events")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => df
      case _ =>
        // NTZ→LTZ cast reads the wall time in the session zone; pin
        // UTC so the epoch matches the oracle regardless of host zone
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        df.withColumn("ts",
          org.apache.spark.sql.functions.unix_micros(
            org.apache.spark.sql.functions.col("ts")
              .cast(org.apache.spark.sql.types.TimestampType)) * 1000L)
    }
  }

  def region(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "lineitem")
  def documents(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")

  /** Widen a scan to the session's parallelism when the file layout
    * yields fewer input splits than cores (small single-file tables:
    * every row lands in one task, serializing any CPU-heavy projection
    * above it — hashing, shingling, tokenizing). A no-op whenever the
    * source is already at least core-parallel, so at real scale (file
    * splits >> cores) no extra shuffle is introduced.
    */
  def widened(spark: SparkSession, df: DataFrame): DataFrame = {
    val target = spark.sparkContext.defaultParallelism
    // inputFiles is plan metadata (no RDD materialization, unlike
    // df.rdd.getNumPartitions); it undercounts splits for multi-split
    // files, but an already-parallel scan only gets a redundant — not
    // wrong — repartition, and at real scale files >> cores anyway
    if (df.inputFiles.length < target) df.repartition(target) else df
  }
}
