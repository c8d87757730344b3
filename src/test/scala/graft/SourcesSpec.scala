package graft

import graft.sources.Sources
import org.scalatest.funsuite.AnyFunSuite

/** Batch source/sink layer (SURVEY §2.1). */
class SourcesSpec extends AnyFunSuite {
  import TestSpark._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_src").toString

  test("CSV roundtrip with explicit schema, header, and quoted commas") {
    import spark.implicits._
    val songs = Seq(
      (1, "All I Do Is Win (feat. T-Pain, Ludacris)", "Victory", "DJ Khaled", 2010, "SOxyz"),
      (2, "Plain", "Rel", "Artist", 1999, "SOabc"))
      .toDF("songId", "title", "release", "artist", "year", "songCode")
    val dir = tmp()
    Sources.writeCsv(songs, dir)
    val back = Sources.csvSongs(spark, dir)
    assert(back.schema == Sources.songsSchema)
    val got = back.orderBy("songId").collect()
    assert(got.length == 2)
    assert(got(0).getString(1).contains("T-Pain, Ludacris"),
      "quoted comma survives the roundtrip (the reference's split(',') would not)")
  }

  test("JSON-lines roundtrip preserves nested fields") {
    import spark.implicits._
    val df = Seq((1, "pop, rock", 0.5), (2, "jazz", -0.25))
      .toDF("id", "general", "score")
    val dir = tmp()
    Sources.writeJsonLines(df, dir)
    val back = Sources.jsonLines(spark, dir).orderBy("id").collect()
    assert(back.length == 2 && back(1).getAs[Double]("score") == -0.25)
  }

  test("in-memory source builds a DataFrame with product field names") {
    import spark.implicits._
    val df = Sources.inMemory(spark, Seq((1, "a"), (2, "b")))
    assert(df.count() == 2)
  }

  test("train/val/test split is a disjoint cover with stable seed") {
    val events = Tables.events(spark, sf).select("event_id")
    val (tr, va, te) = Sources.trainValTest(events.toDF())
    val n = events.count()
    assert(tr.count() + va.count() + te.count() == n)
    assert(tr.intersect(va).count() == 0 && tr.intersect(te).count() == 0
      && va.intersect(te).count() == 0)
    // deterministic under the fixed seed
    val (tr2, _, _) = Sources.trainValTest(events.toDF())
    assert(tr.exceptAll(tr2).count() == 0 && tr2.exceptAll(tr).count() == 0)
  }

  test("compaction: 64 fragments become 4 disjoint-keyed sorted files, rows intact") {
    import org.apache.spark.sql.functions.{col, max, min}
    val (fragDir, outDir) = Sources.compactSmallFiles(spark, sf)
    def parquetFiles(d: String) = new java.io.File(d).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getPath)
    assert(parquetFiles(fragDir).length == 64)
    val outFiles = parquetFiles(outDir)
    assert(outFiles.length == 4, "compaction target file count")
    // range partitioning: each file owns a disjoint event_id span
    val spans = outFiles.map { f =>
      val r = spark.read.parquet(f)
        .agg(min(col("event_id")), max(col("event_id"))).head()
      (r.getLong(0), r.getLong(1))
    }.sortBy(_._1)
    assert(spans.zip(spans.tail).forall { case ((_, hi), (lo2, _)) => hi < lo2 },
      s"file key spans must not overlap: ${spans.toSeq}")
    // row preservation
    val src = Tables.events(spark, sf)
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
    val back = spark.read.parquet(outDir)
    assert(back.exceptAll(src).count() == 0 && src.exceptAll(back).count() == 0)
  }

  test("malformed CSV rows: PERMISSIVE nulls them, DROPMALFORMED drops them, " +
      "FAILFAST raises — the ingest robustness contract") {
    import org.apache.spark.sql.types._
    val dir = Sources.scratchDir(spark, "bad_csv")
    new java.io.File(dir).mkdirs()
    // structural malformation (wrong column count) — what the CSV
    // parser itself flags; a bad-typed CELL is a different contract
    // (nulled in permissive, NOT considered malformed since Spark 2.x)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/part.csv"),
      "id,qty\n1,10\n2\n3,thirty\n4,40\n")
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("qty", LongType)))
    def read(mode: String) = spark.read.schema(schema)
      .option("header", "true").option("mode", mode).csv(dir)
    val permissive = read("PERMISSIVE").collect()
    assert(permissive.length == 4, "permissive keeps every row")
    assert(permissive.count(_.isNullAt(1)) == 2,
      "short row and bad-typed cell both surface as NULL qty")
    // with every column materialized, both the short row and the
    // bad-typed row count as malformed and drop
    val dropped = read("DROPMALFORMED").collect()
    assert(dropped.map(_.getLong(0)).sorted.toSeq == Seq(1L, 4L),
      "dropmalformed drops short and bad-typed rows when columns are read")
    // ...but malformed-ness is judged against the PARSED columns: a
    // count() prunes every column, nothing fails conversion, and all
    // 4 rows survive — the pruning/mode interaction a pipeline must
    // know before trusting row counts from a raw-CSV audit
    assert(read("DROPMALFORMED").count() == 4)
    intercept[org.apache.spark.SparkException] {
      read("FAILFAST").collect()
    }
  }

  test("DSv2 connector: filters, columns, and limit push into the source") {
    import org.apache.spark.sql.functions.col
    def load() = spark.read.format("graft.sources.RangeV2")
      .option("rows", "100000").option("parts", "16").load()

    // id-range pushdown prunes the PLANNED SPLITS: [25000, 30000)
    // overlaps exactly one of the sixteen 6250-row splits
    val pruned = load()
      .filter(col("id") >= 25000L && col("id") < 30000L)
      .select("id", "v_mul")
    assert(pruned.rdd.getNumPartitions == 1,
      "id bounds must prune planning to the single overlapping split")
    assert(pruned.count() == 5000)

    // the physical plan carries the connector's evidence string:
    // consumed filters and the pruned column set (tag absent)
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("pushed=[") && plan.contains("id"),
      s"scan description must list pushed filters, got:\n$plan")
    assert(plan.contains("cols=[id,v_mul]"),
      "column pruning must reach the reader (tag never computed)")

    // residual (non-pushable) predicates still evaluate above the scan
    val residual = load()
      .filter(col("id") < 970L && col("v_mod") === 0L)
    assert(residual.count() == 10) // v_mod = id % 97 == 0 for 10 ids < 970

    // pushed limit caps split budgets; the global limit stays exact
    val lim = load().limit(7)
    assert(lim.queryExecution.executedPlan.toString.contains("limit=7"))
    assert(lim.count() == 7)

    // unfiltered read plans every split
    assert(load().rdd.getNumPartitions == 16)
  }

  test("DSv2 aggregate pushdown: one partial row per split, no full-width scan") {
    import org.apache.spark.sql.functions.{count, lit, max, min}
    import spark.implicits._
    val df = spark.read.format("graft.sources.RangeV2")
      .option("rows", "100000").option("parts", "16").load()
      .filter($"id" >= 20000L && $"id" < 90000L)
      .agg(min($"id").as("min_id"), max($"id").as("max_id"), count(lit(1)).as("n"))
    val plan = df.queryExecution.executedPlan.toString
    // the pushed-aggregate evidence string is in the scan description,
    // and the full-width scan (its cols=[...] marker) is GONE — the
    // source never materializes a data row
    assert(plan.contains("pushedAgg=[min_id,max_id,count_star]"),
      s"aggregates must push into the source, got:\n$plan")
    assert(!plan.contains("cols=["), "no full-width row scan may remain")
    // pushed filter still prunes the planned splits: [20000, 90000)
    // overlaps 12 of the sixteen 6250-id splits, ONE partial row each —
    // asserted at the connector API level (the executed plan above is
    // wrapped by AQE, whose wrapper node masks the scan's row count)
    import org.apache.spark.sql.connector.expressions.Expressions
    import org.apache.spark.sql.connector.expressions.aggregate.{Aggregation, CountStar, Max, Min}
    import org.apache.spark.sql.sources.{GreaterThanOrEqual, LessThan}
    val sb = new graft.sources.RangeV2ScanBuilder(100000L, 16)
    assert(sb.pushFilters(Array(GreaterThanOrEqual("id", 20000L),
      LessThan("id", 90000L))).isEmpty)
    assert(sb.pushAggregation(new Aggregation(
      Array(new Min(Expressions.column("id")), new Max(Expressions.column("id")),
        new CountStar), Array.empty)))
    val batch = sb.build().toBatch
    val splits = batch.planInputPartitions()
    assert(splits.length == 12, s"expected 12 pruned splits, got ${splits.length}")
    val factory = batch.createReaderFactory()
    val partials = splits.map { s =>
      val r = factory.createReader(s)
      assert(r.next(), "each split emits its partial row")
      val row = (r.get().getLong(0), r.get().getLong(1), r.get().getLong(2))
      assert(!r.next(), "…and exactly one row")
      row
    }
    assert(partials.map(_._1).min == 20000L && partials.map(_._2).max == 89999L
      && partials.map(_._3).sum == 70000L, s"partials: ${partials.toSeq}")
    // and the merged result is exact
    assert(df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSeq == Seq((20000L, 89999L, 70000L)))
    // an aggregate the source can't answer stays above an un-pushed scan
    val rich = spark.read.format("graft.sources.RangeV2")
      .option("rows", "1000").option("parts", "4").load()
      .agg(org.apache.spark.sql.functions.sum($"v_mod").as("s"))
    assert(!rich.queryExecution.executedPlan.toString.contains("pushedAgg="))
    assert(rich.collect().head.getLong(0) == (0L until 1000L).map(_ % 97).sum)
  }

  test("DSv2 storage-partitioned join: co-bucketed scans join with no exchange") {
    val df = graft.sources.RangeV2.spjJoinQuery(spark)
    // the whole point: NO shuffle and NO broadcast anywhere — the
    // co-bucketed splits zip directly, and the bucket-grouped agg
    // above the join reuses the reported partitioning
    val plan = df.queryExecution.executedPlan.toString
    // the data path must be shuffle-free: no hash exchange anywhere —
    // the only permitted exchange is the 16-row presentation sort's
    // rangepartitioning above the aggregate
    assert(!plan.contains("hashpartitioning"),
      s"storage-partitioned join must shuffle neither join input nor the agg:\n$plan")
    assert(plan.linesIterator.count(_.contains("Exchange")) <= 1,
      s"only the final 16-row presentation sort may exchange:\n$plan")
    // reported per-split ordering (bucket, id) must also eliminate the
    // merge join's sorts: pre-clustered storage merges directly — the
    // only Sort left is the final 16-row presentation sort
    assert(plan.linesIterator.count(_.contains("Sort [")) <= 1,
      s"join-side sorts must be satisfied by the reported ordering:\n$plan")
    val rows = df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.length == 16 && rows.forall(_._2 == 6250L))
    // spot-check bucket 0's product sum against the closed form
    val want0 = (0L until 6250L).map(i => ((i * 31) % 1000) * (i % 97)).sum
    assert(rows.head == (0L, 6250L, want0), s"got ${rows.head}, want $want0")
  }

  test("DSv2 SPJ with pruned partitions: pushPartValues keeps the join shuffle-free") {
    import org.apache.spark.sql.functions.{count, lit}
    import spark.implicits._
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    spark.conf.set("spark.sql.requireAllClusterKeysForCoPartition", "false")
    // one side's pushed filter prunes splits away — the sides no longer
    // have matching partition sets; pushPartValues aligns them by key
    // value (missing groups read as empty) instead of re-shuffling both
    spark.conf.set("spark.sql.sources.v2.bucketing.pushPartValues.enabled", "true")
    def load() = spark.read.format("graft.sources.RangeV2")
      .option("rows", "100000").option("parts", "16").load()
    val a = load().select($"bucket", $"id")
    val b = load().filter($"id" < 25000L) // 4 of 16 splits survive planning
      .select($"bucket".as("bb"), $"id".as("bid"))
    val joined = a.join(b, $"bucket" === $"bb" && $"id" === $"bid")
      .agg(count(lit(1)).as("n"))
    val plan = joined.queryExecution.executedPlan.toString
    // Catalyst infers the id bound across the equi-join, so BOTH scans
    // plan only the 4 overlapping splits — and the SPJ zips those
    // surviving key groups directly: no hash exchange, no join-side
    // sort. The only exchange is the unavoidable single-row gather of
    // the scalar count.
    assert(!plan.contains("hashpartitioning"),
      s"pruned-split SPJ must not reintroduce a shuffle:\n$plan")
    assert(plan.contains("bounds=[0,25000)"),
      s"the pushed bound must prune both sides' splits:\n$plan")
    assert(!plan.contains("Sort ["),
      s"the reported ordering must carry through the pruned join:\n$plan")
    assert(joined.head().getLong(0) == 25000L)
  }

  test("DSv2 runtime filtering: the join's realized keys prune the splits") {
    import spark.implicits._
    graft.sources.RangeV2.runtimeFilterLog.clear()
    val joined = graft.sources.RangeV2.runtimeFilterQuery(spark, sf)
    val got = joined.collect().map(r => (r.getLong(0), r.getLong(1)))
    // correctness: exactly the distinct purchase users, formula intact
    val want = Tables.events(spark, sf)
      .filter($"event_type" === "purchase")
      .select($"user_id").distinct().collect().map(_.getLong(0)).sorted
    assert(got.map(_._1).toSeq == want.toSeq)
    got.foreach { case (id, v) => assert(v == (id * 31) % 1000) }
    // evidence: an IN predicate REACHED the source at runtime and split
    // planning shrank to the single split holding every purchase user
    import scala.jdk.CollectionConverters._
    val log = graft.sources.RangeV2.runtimeFilterLog.asScala.toSeq
    assert(log.exists(e => e.contains("IN") && e.contains("splits=1")),
      s"expected a delivered IN filter pruning to 1 split, log=$log")
  }

  test("DSv2 micro-batch stream: admission-control batches partition the ids") {
    import org.apache.spark.sql.functions.{count, lit, max, min}
    val ck = tmp()
    val batches = java.util.Collections.synchronizedList(
      new java.util.ArrayList[(Long, Long, Long)]())
    val q = spark.readStream.format("graft.sources.RangeV2")
      .option("rows", "10000").option("parts", "4").option("batchRows", "3000")
      .load()
      .writeStream
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        val r = df.agg(min("id"), max("id"), count(lit(1))).head()
        batches.add((r.getLong(0), r.getLong(1), r.getLong(2))); ()
      }
      .option("checkpointLocation", ck).start()
    try q.processAllAvailable() finally q.stop()
    // each trigger admits exactly batchRows more ids (last one partial):
    // [0,3000) [3000,6000) [6000,9000) [9000,10000)
    import scala.jdk.CollectionConverters._
    assert(batches.asScala.toSeq ==
      Seq((0L, 2999L, 3000L), (3000L, 5999L, 3000L),
        (6000L, 8999L, 3000L), (9000L, 9999L, 1000L)))
    // and the checkpointed offsets advance through the same bounds
    val ends = q.recentProgress.filter(_.numInputRows > 0)
      .map(_.sources.apply(0).endOffset.trim.toLong).toSeq
    assert(ends == Seq(3000L, 6000L, 9000L, 10000L),
      s"per-batch end offsets, got $ends")
  }

  test("DSv2 micro-batch stream: restart resumes from the checkpointed offset") {
    val ck = tmp()
    val got = java.util.Collections.synchronizedList(
      new java.util.ArrayList[Long]())
    def run(rows: Long): org.apache.spark.sql.streaming.StreamingQuery = {
      val q = spark.readStream.format("graft.sources.RangeV2")
        .option("rows", rows.toString).option("parts", "4")
        .option("batchRows", "4096").load()
        .writeStream
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          df.select("id").collect().foreach(r => got.add(r.getLong(0))); ()
        }
        .option("checkpointLocation", ck).start()
      try q.processAllAvailable() finally q.stop()
      q
    }
    run(8192L) // run 1 reveals [0, 8192) in two committed batches
    val q2 = run(20480L) // same checkpoint, more data available
    // run 2's first batch starts EXACTLY where run 1's commit log ends —
    // not at 0 (no replay of revealed ids), not at latest (no data loss)
    val starts = q2.recentProgress.filter(_.numInputRows > 0)
      .map(_.sources.apply(0).startOffset.trim.toLong).toSeq
    assert(starts.headOption.contains(8192L),
      s"restart must resume at the checkpointed offset, got starts=$starts")
    import scala.jdk.CollectionConverters._
    val ids = got.asScala.toSeq
    assert(ids.size == 20480 && ids.toSet == (0L until 20480L).toSet,
      s"every id exactly once across the restart (got ${ids.size} rows)")
  }

  test("DSv2 micro-batch stream: Trigger.AvailableNow runs to completion and stops") {
    val ck = tmp()
    val got = java.util.Collections.synchronizedList(
      new java.util.ArrayList[Long]())
    val batches = new java.util.concurrent.atomic.AtomicInteger(0)
    val q = spark.readStream.format("graft.sources.RangeV2")
      .option("rows", "10000").option("parts", "4").option("batchRows", "3000")
      .load()
      .writeStream
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        batches.incrementAndGet()
        df.select("id").collect().foreach(r => got.add(r.getLong(0))); ()
      }
      .option("checkpointLocation", ck)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    // AvailableNow must TERMINATE BY ITSELF once the prepared target is
    // reached — no processAllAvailable, no manual stop
    assert(q.awaitTermination(120000), "AvailableNow query must self-terminate")
    import scala.jdk.CollectionConverters._
    assert(got.asScala.toSet == (0L until 10000L).toSet)
    assert(batches.get() >= 4,
      s"admission control must still batch under AvailableNow, got ${batches.get()}")
  }

  private def manifestWrite(df: org.apache.spark.sql.DataFrame, dir: String): Unit =
    df.write.format("graft.sources.ManifestV2")
      .option("path", dir).mode("append").save()
  private def manifestRead(dir: String): org.apache.spark.sql.DataFrame =
    spark.read.format("graft.sources.ManifestV2").option("path", dir).load()
  private def stagedFiles(dir: String): Set[String] =
    Option(new java.io.File(dir, "staging").listFiles())
      .map(_.map("staging/" + _.getName).toSet).getOrElse(Set.empty)
  private def manifestFiles(dir: String): Set[String] =
    graft.sources.ManifestV2.readManifest(java.nio.file.Paths.get(dir))
      .map(_.files.map(_.file).toSet).getOrElse(Set.empty)

  test("ManifestV2 write: escaped round-trip, append accumulation, pruning") {
    import spark.implicits._
    val dir = tmp()
    val df1 = Seq(
      (1L, Option("plain"), Option(1.5), Option(true), Option(7)),
      (2L, Option("tab\there nl\nback\\slash\rcr"), Option(-2.25), Option(false), None),
      (3L, None: Option[String], None: Option[Double], None: Option[Boolean], Option(-2)))
      .toDF("k", "s", "d", "b", "i")
    manifestWrite(df1, dir)
    val back1 = manifestRead(dir)
    assert(back1.schema.map(f => (f.name, f.dataType)) ==
      df1.schema.map(f => (f.name, f.dataType)))
    assert(back1.exceptAll(df1).count() == 0 && df1.exceptAll(back1).count() == 0,
      "escaped TSV must round-trip tabs, newlines, backslashes, and nulls")
    // append publishes a second snapshot: union visible, nothing lost
    val df2 = Seq((4L, Option("later"), Option(0.5), Option(true), Option(0)))
      .toDF("k", "s", "d", "b", "i")
    manifestWrite(df2, dir)
    val both = df1.unionAll(df2)
    val back2 = manifestRead(dir)
    assert(back2.exceptAll(both).count() == 0 && both.exceptAll(back2).count() == 0)
    // column pruning reaches the reader (evidence string in the plan)
    val pruned = manifestRead(dir).select("k")
    assert(pruned.queryExecution.executedPlan.toString.contains("cols=[k]"))
    assert(pruned.collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L, 3L, 4L))
  }

  test("ManifestV2 write: a failed job leaves the previous snapshot untouched") {
    import spark.implicits._
    val dir = tmp()
    val initial = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    manifestWrite(initial, dir)
    // partition 0 commits its task; partition 1 throws mid-write — the
    // JOB aborts, and BatchWrite.abort must delete even the
    // already-committed task's staged file. The throw is DELAYED so
    // partition 0's task-commit message deterministically reaches the
    // driver before the job fails: Spark's abort can only name files
    // from messages it received (a message lost to this race is what
    // remove_orphans exists to reclaim), and this test pins the
    // received-message contract, not the race.
    val boom = org.apache.spark.sql.functions.udf((x: Long) => {
      if (x == 7L) { Thread.sleep(2000); throw new RuntimeException("boom") }
      "x"
    })
    val failing = spark.range(0, 10, 1, 2)
      .select($"id".as("k"), boom($"id").as("v"))
    intercept[Exception] { manifestWrite(failing, dir) }
    // readers saw — and still see — the old snapshot
    val back = manifestRead(dir).collect().map(r => (r.getLong(0), r.getString(1)))
    assert(back.sortBy(_._1).toSeq == Seq((1L, "a"), (2L, "b")))
    // no orphaned staging files: what exists on disk is exactly what
    // the manifest publishes
    assert(stagedFiles(dir) == manifestFiles(dir),
      s"staging must equal the manifest after a job abort: " +
        s"staged=${stagedFiles(dir)} manifest=${manifestFiles(dir)}")
  }

  test("ManifestV2 write: retried attempts are idempotent (one wins, one aborts)") {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.connector.write.{LogicalWriteInfo, PhysicalWriteInfo}
    import org.apache.spark.sql.types._
    import org.apache.spark.sql.util.CaseInsensitiveStringMap
    import org.apache.spark.unsafe.types.UTF8String
    val dir = tmp()
    val sch = StructType(Seq(
      StructField("k", LongType), StructField("v", StringType)))
    val table = new graft.sources.ManifestTable(dir, sch)
    val info = new LogicalWriteInfo {
      override def options(): CaseInsensitiveStringMap =
        new CaseInsensitiveStringMap(java.util.Collections.emptyMap())
      override def queryId(): String = "retry-test"
      override def schema(): StructType = sch
    }
    val bw = table.newWriteBuilder(info).build().toBatch
    val factory = bw.createBatchWriterFactory(new PhysicalWriteInfo {
      override def numPartitions(): Int = 1
    })
    // two attempts of the SAME partition (a speculative retry): each
    // writes its own uniquely-named staged file
    val attempt0 = factory.createWriter(0, 0L)
    val attempt1 = factory.createWriter(0, 1L)
    val row = InternalRow.fromSeq(Seq(1L, UTF8String.fromString("x")))
    attempt0.write(row); attempt1.write(row)
    // the commit coordinator admits attempt 1; attempt 0 must abort
    val msg = attempt1.commit()
    attempt0.abort()
    bw.commit(Array(msg))
    // exactly ONE copy of the row is visible, from exactly one file
    val back = manifestRead(dir).collect().map(r => (r.getLong(0), r.getString(1)))
    assert(back.toSeq == Seq((1L, "x")), s"got ${back.toSeq}")
    assert(stagedFiles(dir).size == 1 && stagedFiles(dir) == manifestFiles(dir),
      "the aborted attempt's file must be gone; the winner's published")
  }

  test("ManifestV2 write: overwrite replaces the snapshot atomically") {
    import spark.implicits._
    val dir = tmp()
    manifestWrite(Seq((1L, "old"), (2L, "old")).toDF("k", "v"), dir)
    val df2 = Seq((10L, "new")).toDF("k", "v")
    df2.write.format("graft.sources.ManifestV2")
      .option("path", dir).mode("overwrite").save()
    val back = manifestRead(dir).collect().map(r => (r.getLong(0), r.getString(1)))
    assert(back.toSeq == Seq((10L, "new")))
    // the replaced snapshot's files STAY on disk — the previous
    // manifest version still references them (time travel) — until an
    // explicit snapshot expiry reclaims; after keepLast=1 expiry,
    // disk == live manifest again
    assert(manifestFiles(dir).subsetOf(stagedFiles(dir)) &&
      stagedFiles(dir).size > manifestFiles(dir).size,
      s"staged=${stagedFiles(dir)} manifest=${manifestFiles(dir)}")
    val (expired, reclaimed) = graft.sources.ManifestV2.expireSnapshots(dir, 1)
    assert(expired.nonEmpty && reclaimed.nonEmpty)
    assert(stagedFiles(dir) == manifestFiles(dir),
      s"after expiry: staged=${stagedFiles(dir)} manifest=${manifestFiles(dir)}")
  }

  test("ManifestV2 versions: every commit is a readable snapshot until expired") {
    import spark.implicits._
    val dir = tmp()
    manifestWrite(Seq((1L, "a")).toDF("k", "v"), dir) // v1
    Seq((2L, "b")).toDF("k", "v").write.format("graft.sources.ManifestV2")
      .option("path", dir).mode("append").save() // v2
    Seq((9L, "z")).toDF("k", "v").write.format("graft.sources.ManifestV2")
      .option("path", dir).mode("overwrite").save() // v3
    def pinned(v: Long) =
      new graft.sources.ManifestTable(dir, null, v)
    def rowsOf(v: Long): Seq[Long] = {
      val files = graft.sources.ManifestV2
        .readManifest(java.nio.file.Paths.get(dir), v).get.files
      files.map(_.rows).filter(_ > 0)
    }
    assert(rowsOf(1).sum == 1 && rowsOf(2).sum == 2 && rowsOf(3).sum == 1)
    assert(pinned(2).schema().fieldNames.sameElements(Array("k", "v")))
    // a pinned snapshot rejects writes
    intercept[UnsupportedOperationException] {
      pinned(2).newWriteBuilder(null)
    }
    // expiry keeps the newest 1: v1/v2 manifests gone, their files
    // reclaimed, live table intact
    graft.sources.ManifestV2.expireSnapshots(dir, 1)
    assert(graft.sources.ManifestV2
      .listVersions(java.nio.file.Paths.get(dir)) == Seq(3L))
    assert(manifestRead(dir).collect().map(_.getLong(0)).toSeq == Seq(9L))
  }

  test("ManifestV2 streaming sink: a replayed epoch publishes nothing twice") {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.connector.write.{LogicalWriteInfo, PhysicalWriteInfo, WriterCommitMessage}
    import org.apache.spark.sql.types._
    import org.apache.spark.sql.util.CaseInsensitiveStringMap
    import org.apache.spark.unsafe.types.UTF8String
    val dir = tmp()
    val sch = StructType(Seq(
      StructField("k", LongType), StructField("v", StringType)))
    val table = new graft.sources.ManifestTable(dir, sch)
    val info = new LogicalWriteInfo {
      override def options(): CaseInsensitiveStringMap =
        new CaseInsensitiveStringMap(java.util.Collections.emptyMap())
      override def queryId(): String = "epoch-test"
      override def schema(): StructType = sch
    }
    val sw = table.newWriteBuilder(info).build().toStreaming
    val factory = sw.createStreamingWriterFactory(new PhysicalWriteInfo {
      override def numPartitions(): Int = 1
    })
    def commitEpoch(epoch: Long, k: Long): Unit = {
      val w = factory.createWriter(0, epoch * 100, epoch)
      w.write(InternalRow.fromSeq(Seq(k, UTF8String.fromString(s"e$epoch"))))
      sw.commit(epoch, Array[WriterCommitMessage](w.commit()))
    }
    commitEpoch(0, 1L)
    commitEpoch(1, 2L)
    // restart replay: Structured Streaming re-runs the last micro-batch
    // and re-commits the SAME epoch — the @epochs ledger must swallow it
    commitEpoch(1, 2L)
    commitEpoch(2, 3L)
    val back = manifestRead(dir).collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    assert(back.toSeq == Seq((1L, "e0"), (2L, "e1"), (3L, "e2")),
      s"each epoch exactly once, got ${back.toSeq}")
    // the replayed epoch's staged file was reclaimed, not orphaned
    assert(stagedFiles(dir) == manifestFiles(dir) && stagedFiles(dir).size == 3)
  }

  test("ManifestV2 incremental read serves exactly the appended commits") {
    import spark.implicits._
    val dir = tmp()
    manifestWrite(spark.range(0, 5, 1, 1).select($"id".as("k")), dir) // v1
    manifestWrite(
      spark.range(100, 105, 1, 1).select($"id".as("k")), dir) // v2
    manifestWrite(
      spark.range(200, 205, 1, 1).select($"id".as("k")), dir) // v3
    def incr(from: Long, to: Option[Long]): Seq[Long] = {
      val r = spark.read.format("graft.sources.ManifestV2")
        .option("path", dir).option("startVersion", from.toString)
      to.fold(r)(v => r.option("endVersion", v.toString))
        .load().collect().map(_.getLong(0)).sorted.toSeq
    }
    assert(incr(1L, None) == ((100L to 104L) ++ (200L to 204L)),
      "(v1, live] = the two later commits")
    assert(incr(1L, Some(2L)) == (100L to 104L),
      "(v1, v2] = exactly the second commit")
    assert(incr(0L, Some(1L)) == (0L to 4L),
      "(v0, v1] = the backfill commit alone")
    // a replace inside the range makes the diff a lie — must throw
    spark.range(0, 3, 1, 1).select($"id".as("k"))
      .write.format("graft.sources.ManifestV2")
      .option("path", dir).mode("overwrite").save() // v4 replaces all
    val e = intercept[Exception] { incr(1L, None) }
    assert(e.getMessage.contains("append-only"),
      s"replace in range must fail loudly, got: ${e.getMessage}")
  }

  test("ManifestV2 table-as-a-stream: commits are batches, restart reads only new ones") {
    import spark.implicits._
    val dir = tmp()
    val sink = tmp()
    val ck = tmp()
    manifestWrite(spark.range(0, 5, 1, 1).select($"id".as("k")), dir) // v1
    manifestWrite(
      spark.range(100, 105, 1, 1).select($"id".as("k")), dir) // v2
    // table → stream → table: the connector is BOTH transports, and
    // the memory sink's no-recovery limitation never enters the test
    def run(): Seq[Long] = {
      val q = spark.readStream.format("graft.sources.ManifestV2")
        .option("path", dir).load()
        .writeStream.format("graft.sources.ManifestV2")
        .option("path", sink)
        .option("checkpointLocation", ck).start()
      try q.processAllAvailable() finally q.stop()
      manifestRead(sink).collect().map(_.getLong(0)).sorted.toSeq
    }
    assert(run() == ((0L to 4L) ++ (100L to 104L)),
      "first run backfills every committed snapshot")
    manifestWrite(
      spark.range(200, 205, 1, 1).select($"id".as("k")), dir) // v3
    // SAME checkpoint: only the new commit replays — a re-served old
    // version would land duplicate rows in the append-only sink
    assert(run() == ((0L to 4L) ++ (100L to 104L) ++ (200L to 204L)),
      "restart must resume at the checkpointed version offset")
  }
}
