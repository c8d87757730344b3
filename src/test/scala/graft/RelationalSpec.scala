package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Relational

object TestSpark {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  val sf = "/root/testdata/sf0.001"
}

class RelationalSpec extends AnyFunSuite {
  import TestSpark._

  test("entry returns rows (driver t1 smoke shape)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every declared query runs and every query has matching oracle keys") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, sf).count()
      assert(n >= 0, s"$name failed")
    }
  }

  test("moving window: 3-row sum frame and first-row-zero delta") {
    import spark.implicits._
    val got = Relational.movingWindowFeatures(spark, sf).limit(0)
    // shape only from the driver form; exact values on a literal frame:
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"user_id").orderBy($"event_id")
    val df = Seq((1L, 7L, 10.0), (2L, 7L, 20.0), (3L, 7L, 5.0), (4L, 7L, 1.0))
      .toDF("event_id", "user_id", "value")
    val dec = $"value".cast("decimal(18,2)")
    val out = df
      .withColumn("ms", org.apache.spark.sql.functions.sum(dec)
        .over(w.rowsBetween(-2, org.apache.spark.sql.expressions.Window.currentRow))
        .cast("double"))
      .withColumn("d", (dec - org.apache.spark.sql.functions.coalesce(
        org.apache.spark.sql.functions.lag(dec, 1).over(w), dec))
        .cast("double"))
      .orderBy($"event_id").collect()
      .map(r => (r.getDouble(3), r.getDouble(4)))
    assert(out.toSeq == Seq((10.0, 0.0), (30.0, 10.0), (35.0, -15.0), (26.0, -4.0)))
    assert(got.columns.toSeq ==
      Seq("event_id", "user_id", "value", "moving_sum_3", "delta"))
  }

  test("ratings decode: song_id in 0..99, no null decode") {
    val r = Relational.ratings(spark, sf)
    assert(r.filter("song_id IS NULL").count() == 0)
    val mm = r.selectExpr("min(song_id)", "max(song_id)").head()
    assert(mm.getInt(0) >= 0 && mm.getInt(1) <= 99)
  }

  test("anti-join is disjoint from rated set") {
    val rated = Relational.ratings(spark, sf).select("song_id").distinct()
    val unrated = Relational.antiJoinUnrated(spark, sf)
    assert(unrated.join(rated,
      unrated("p_partkey") === rated("song_id")).count() == 0)
  }

  test("top-k is a prefix of the full sort") {
    val topk = Relational.topk25Parts(spark, sf).collect().map(_.getLong(0))
    val full = Relational.ratings(spark, sf) // just reuse session
    val all = Tables.lineitem(spark, sf).groupBy("l_partkey")
      .agg(Fx.dsum(org.apache.spark.sql.functions.col("l_quantity")).as("t"),
        org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("cnt"))
      .filter("cnt >= 3")
      .orderBy(org.apache.spark.sql.functions.desc("t"),
        org.apache.spark.sql.functions.col("l_partkey"))
      .collect().map(_.getLong(0))
    assert(topk.sameElements(all.take(topk.length)))
  }

  test("union keeps bag semantics: counts add up") {
    val total = Relational.unionRetrainInput(spark, sf)
      .agg(org.apache.spark.sql.functions.sum("cnt")).head().getLong(0)
    assert(total == Tables.events(spark, sf).count())
  }

  test("quantile levels are all in 1..5 and each user hits level 5") {
    val lv = Relational.quantileRatingLevels(spark, sf)
    assert(lv.filter("level < 1 OR level > 5").count() == 0)
    val users = Tables.events(spark, sf).select("user_id").distinct().count()
    assert(lv.filter("level = 5").select("user_id").distinct().count() == users)
  }

  test("marker sessions: marker is a purchase event of the same user") {
    val ev = Tables.events(spark, sf).select("event_id", "event_type", "user_id")
    val ms = Relational.markerSessions(spark, sf)
    val joined = ms.join(ev.withColumnRenamed("event_id", "marker_id")
      .withColumnRenamed("user_id", "m_user"), Seq("marker_id"))
    assert(joined.filter("event_type <> 'purchase' OR m_user <> user_id").count() == 0)
  }
}
