package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** Batch sources/sinks (SURVEY.md §2.1).
  *
  * The reference reads every file as `sc.textFile` + a hand-rolled
  * header filter + `split(",")` casts (S1/S2/P1/P2 — engine.py:94–96
  * and 7 more sites), which breaks on quoted commas and gives implicit
  * positional schemas. Here each table is a schema'd `spark.read`:
  * header handling, quoting, type coercion and malformed-row policy
  * belong to the source, and Catalyst prunes columns/pushes filters
  * into the scan.
  */
object Sources {

  /** S1/S2 CSV with explicit schema + header. FAILFAST surfaces schema
    * drift instead of silently nulling (the reference would crash on a
    * bad split index instead).
    */
  def csv(spark: SparkSession, path: String, schema: StructType,
      mode: String = "FAILFAST"): DataFrame =
    spark.read.option("header", "true").option("mode", mode)
      .schema(schema).csv(path)

  /** The reference's ratings file schema (rating_data_to_longdb.txt:6,19–23). */
  val ratingsSchema: StructType = StructType(Seq(
    StructField("userId", IntegerType),
    StructField("songId", IntegerType),
    StructField("rating", DoubleType)))

  /** The reference's song-metadata schema (songs_metadata_file_new.csv:1). */
  val songsSchema: StructType = StructType(Seq(
    StructField("songId", IntegerType),
    StructField("title", StringType),
    StructField("release", StringType),
    StructField("artist", StringType),
    StructField("year", IntegerType),
    StructField("songCode", StringType)))

  def csvRatings(spark: SparkSession, path: String): DataFrame =
    csv(spark, path, ratingsSchema)

  def csvSongs(spark: SparkSession, path: String): DataFrame =
    csv(spark, path, songsSchema)

  /** S13 JSON-lines (lyric.ipynb cell 3's per-line json.loads loop). */
  def jsonLines(spark: SparkSession, path: String,
      schema: Option[StructType] = None): DataFrame = {
    val r = spark.read
    schema.fold(r)(s => r.schema(s)).json(path)
  }

  /** S3 in-memory source (`sc.parallelize` sites — engine.py:54,67…). */
  def inMemory[T <: Product : org.apache.spark.sql.Encoder](
      spark: SparkSession, rows: Seq[T]): DataFrame = {
    import spark.implicits._
    rows.toDS().toDF()
  }

  /** R1 train/validation/test split (spark_music.py:16: 60/20/20,
    * seed 0). Weights are normalized by Spark; the split is sampled
    * per-partition, so it scales without any driver materialization.
    */
  def trainValTest(df: DataFrame, seed: Long = 0L): (DataFrame, DataFrame, DataFrame) = {
    val Array(tr, va, te) = df.randomSplit(Array(0.6, 0.2, 0.2), seed)
    (tr, va, te)
  }

  /** Scratch directory for a roundtrip/layout query: keyed by app id
    * (stable within a session — overwritten per run, no temp-copy
    * accumulation — yet distinct across concurrent Verify/Bench
    * processes, which would otherwise race on one directory and read
    * each other's partial output), and registered ONCE for recursive
    * deletion at JVM exit so repeated runs don't accumulate corpus
    * copies in tmp.
    */
  private val scratchRegistered =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  /** Scratch TEMP directory for single-use streaming checkpoints and
    * staging feeds: prefers tmpfs (/dev/shm) when writable — the
    * micro-batch commit protocol churns many tiny files per trigger,
    * which dominates short harness streams on disk-backed tmpdirs.
    * Callers delete (or leak-to-shutdown) these dirs; nothing durable
    * lives here. Real recoverable checkpoints go to real storage.
    */
  def scratchTempDir(prefix: String): java.nio.file.Path = {
    val shm = java.nio.file.Paths.get("/dev/shm")
    if (java.nio.file.Files.isWritable(shm))
      java.nio.file.Files.createTempDirectory(shm, prefix)
    else java.nio.file.Files.createTempDirectory(prefix)
  }

  def scratchDir(spark: SparkSession, name: String): String = {
    val p = new java.io.File(sys.props("java.io.tmpdir"),
      s"graft_scratch/${name}_${spark.sparkContext.applicationId}").toString
    if (scratchRegistered.add(p))
      Runtime.getRuntime.addShutdownHook(new Thread(() => {
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles()).foreach(_.foreach(rm))
          f.delete(): Unit
        }
        rm(new java.io.File(p))
      }))
    p
  }

  /** CSV sink (S12's to_csv sites): one header per part file, quoted
    * as needed — partition-parallel write.
    */
  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("header", "true").csv(path)

  /** JSON-lines sink. */
  def writeJsonLines(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  /** Oracle-checked driver query: the part catalog written to CSV and
    * read back through the explicit-schema reader — proves header,
    * quoting (p_name has commas at some SFs), and type coercion
    * roundtrip losslessly. The oracle reads the original parquet.
    */
  def csvRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val schema = StructType(Seq(
      StructField("p_partkey", LongType),
      StructField("p_name", StringType),
      StructField("p_brand", StringType),
      StructField("p_type", StringType),
      StructField("p_size", IntegerType),
      StructField("p_retailprice", DoubleType)))
    val out = scratchDir(spark, "csv_roundtrip")
    writeCsv(graft.Tables.part(spark, dir), out)
    csv(spark, out, schema).orderBy("p_partkey")
  }

  /** Oracle-checked driver query: the part catalog through the
    * JSON-lines sink and schema'd reader (S13's lyric.ipynb per-line
    * json.loads, as a real newline-delimited-JSON source with type
    * coercion). Same scratch-keying discipline as [[csvRoundtrip]].
    */
  def jsonRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val schema = StructType(Seq(
      StructField("p_partkey", LongType),
      StructField("p_name", StringType),
      StructField("p_brand", StringType),
      StructField("p_type", StringType),
      StructField("p_size", IntegerType),
      StructField("p_retailprice", DoubleType)))
    val out = scratchDir(spark, "json_roundtrip")
    writeJsonLines(graft.Tables.part(spark, dir), out)
    jsonLines(spark, out, Some(schema)).orderBy("p_partkey")
  }

  /** Oracle-checked driver query: the part catalog through Spark 4's
    * BUILT-IN XML source (native since 4.0 — no spark-xml package
    * needed; the Avro CONNECTOR, by contrast, is an external module
    * absent from this container, so XML is the remaining exercisable
    * built-in format after csv/json/parquet/orc). Round-trips the
    * table through an XML write (one `<part>` row element per record)
    * and a schema'd read with the same type coercion discipline as
    * [[jsonRoundtrip]]. XML scan is splittable per file; the write
    * shards by partition like every other text sink, so the shape
    * holds at scale.
    */
  def xmlRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val schema = StructType(Seq(
      StructField("p_partkey", LongType),
      StructField("p_name", StringType),
      StructField("p_brand", StringType),
      StructField("p_type", StringType),
      StructField("p_size", IntegerType),
      StructField("p_retailprice", DoubleType)))
    val out = scratchDir(spark, "xml_roundtrip")
    graft.Tables.part(spark, dir).write.mode("overwrite")
      .format("xml").option("rowTag", "part").save(out)
    spark.read.format("xml").option("rowTag", "part").schema(schema)
      .load(out).orderBy("p_partkey")
  }

  /** Oracle-checked driver query: PERMISSIVE JSON ingestion with
    * corrupt-record isolation — the robustness surface every real feed
    * hits (a producer bug emits truncated lines; the reader must
    * quarantine them WITHOUT failing the job or silently dropping
    * them). Every 37th event is written as a deliberately truncated
    * JSON line; the schema'd PERMISSIVE read routes those rows to
    * `_corrupt_record`, good rows come back typed, and the corrupt
    * COUNT is emitted as a sentinel row (event_id −1, count in
    * user_id) so the quarantine size itself is oracle-checked — a
    * reader that dropped or double-counted a corrupt line mismatches.
    * (The quarantine count is raw-line-count minus good-row-count —
    * both plain distributed counts — because Spark disallows queries
    * referencing ONLY the corrupt column, and caching the whole parse
    * to satisfy that is wrong at any real corpus size.)
    */
  def jsonCorruptRecovery(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val out = scratchDir(spark, "json_corrupt")
    graft.Tables.events(spark, dir)
      .select(when($"event_id" % 37 === 0,
          concat(lit("{\"event_id\":"), $"event_id", lit(",\"user_id\":")))
        .otherwise(to_json(struct($"event_id", $"user_id", $"value")))
        .as("value"))
      .write.mode("overwrite").text(out)
    val schema = StructType(Seq(
      StructField("event_id", LongType),
      StructField("user_id", LongType),
      StructField("value", DoubleType),
      StructField("_corrupt_record", StringType)))
    def parsed = spark.read.schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(out)
    // gate good rows on the typed key, NOT on _corrupt_record: corrupt
    // rows parse all-null, and a caller-side count() prunes the plan
    // down to the filter's columns — a corrupt-column filter would
    // leave _corrupt_record as the ONLY referenced column, which the
    // JSON reader rejects (QUERY_ONLY_CORRUPT_RECORD_COLUMN)
    val good = parsed.filter($"event_id".isNotNull)
      .select($"event_id", $"user_id", $"value")
    val nGood = parsed.select($"event_id")
      .filter($"event_id".isNotNull).count()
    val nCorrupt = spark.read.text(out).count() - nGood
    val quarantined = Seq((-1L, nCorrupt))
      .toDF("event_id", "user_id")
      .select($"event_id", $"user_id", lit(null).cast("double").as("value"))
    good.unionByName(quarantined).orderBy($"event_id")
  }

  /** Oracle-checked driver query: the part catalog through Spark's
    * built-in columnar ORC source/sink — the other first-class
    * warehouse format besides parquet (schema'd, predicate-pushdown
    * capable, splittable). Same scratch-keying discipline as
    * [[csvRoundtrip]]; ORC carries its schema, so the read-back needs
    * no external one.
    */
  def orcRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val out = scratchDir(spark, "orc_roundtrip")
    graft.Tables.part(spark, dir).write.mode("overwrite").orc(out)
    spark.read.orc(out).orderBy("p_partkey")
  }

  /** Small-files compaction — the table-maintenance pass every 100 TB
    * deployment schedules: a fragmented landing zone (here: the events
    * table deliberately written as `fragments` tiny files, the shape
    * per-trigger streaming sinks produce) is rewritten into
    * `compacted` range-partitioned, internally sorted files. Range
    * partitioning on the sort key means each output file owns a
    * contiguous key span (tight min/max footers → file pruning on the
    * key), and the sorted layout keeps row-group stats tight. The
    * read-back IS the query result, so the oracle (a plain SELECT of
    * the source table) proves compaction preserved every row and
    * value; the spec additionally asserts the file counts.
    */
  def compactSmallFiles(spark: SparkSession, dir: String,
      fragments: Int = 64, compacted: Int = 4): (String, String) = {
    import org.apache.spark.sql.functions.col
    val fragDir = scratchDir(spark, "compact_fragments")
    val outDir = scratchDir(spark, "compact_out")
    graft.Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
      .repartition(fragments)
      .write.mode("overwrite").parquet(fragDir)
    spark.read.parquet(fragDir)
      .repartitionByRange(compacted, col("event_id"))
      .sortWithinPartitions(col("event_id"))
      .write.mode("overwrite").parquet(outDir)
    (fragDir, outDir)
  }

  /** Driver query form of [[compactSmallFiles]]: the compacted
    * read-back, totally ordered.
    */
  def compactRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val (_, out) = compactSmallFiles(spark, dir)
    spark.read.parquet(out).orderBy("event_id")
  }

  /** Oracle-checked driver query: SCHEMA EVOLUTION read — two parquet
    * file generations with different column sets (an old writer
    * emitting (p_partkey, p_name), a newer one (p_partkey, p_size))
    * land in one directory; `mergeSchema` reconciles them into the
    * union schema with NULLs where a generation lacks the column.
    * This is the mechanism that lets a 100 TB table add columns
    * without rewriting history. A `gen` discriminator column makes
    * the compare order total.
    */
  def mergeSchemaRead(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.lit
    val out = scratchDir(spark, "merge_schema")
    val part = graft.Tables.part(spark, dir)
    part.select(part("p_partkey"), lit(1).as("gen"), part("p_name"))
      .write.mode("overwrite").parquet(s"$out/g=1")
    part.select(part("p_partkey"), lit(2).as("gen"), part("p_size"))
      .write.mode("overwrite").parquet(s"$out/g=2")
    spark.read.option("mergeSchema", "true")
      .parquet(s"$out/g=1", s"$out/g=2")
      .select("p_partkey", "gen", "p_name", "p_size")
      .orderBy("p_partkey", "gen")
  }

  /** Oracle-checked driver query: events written to a hive-partitioned
    * layout (directory per event_type), read back through a
    * partition-key filter — the filter prunes whole directories at
    * plan time (PartitionFilters, asserted in PlanSpec), which is THE
    * coarse-pruning mechanism for a 100 TB corpus.
    */
  def partitionPruneRoundtrip(spark: SparkSession, dir: String,
      keep: String = "click"): DataFrame = {
    import org.apache.spark.sql.functions.col
    val out = scratchDir(spark, "part_prune")
    writePartitioned(
      graft.Tables.events(spark, dir)
        .select(col("event_id"), col("user_id"), col("value"),
          col("event_type")),
      out, Seq("event_type"))
    spark.read.parquet(out)
      .filter(col("event_type") === keep)
      .select(col("event_id"), col("user_id"), col("value"), col("event_type"))
      .orderBy(col("event_id"))
  }

  /** Hive-style partitioned parquet layout: directory per key value,
    * so filters on the partition key prune whole directories at plan
    * time (PartitionFilters in the scan — never opens the files). The
    * layout a 100 TB corpus would use for its coarse keys (date,
    * source, language).
    */
  def writePartitioned(df: DataFrame, path: String, keys: Seq[String]): Unit =
    df.write.mode("overwrite").partitionBy(keys: _*).parquet(path)

  /** S8 JDBC batch sink (rating_data_to_longdb.txt's row-at-a-time
    * pyodbc INSERT loop, as one parameterized batched write; see also
    * streaming.Streams.jdbcBatchSink for the foreachBatch form).
    */
  def writeJdbc(df: DataFrame, url: String, table: String,
      props: java.util.Properties): Unit =
    df.write.mode("append").jdbc(url, table, props)
}
