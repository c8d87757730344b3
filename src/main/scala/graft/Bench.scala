package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // untimed warmup: session/scheduler/codegen-infra JIT, one tiny
    // parquet footer read — so the first measured query isn't charged
    // ~4s of one-time JVM cost. Table data itself stays uncached.
    spark.range(1000).selectExpr("sum(id)").collect()
    Tables.region(spark, sfDir).count()
    val results = (SparkEntry.queries -- SparkEntry.benchExcluded).map { case (name, fn) =>
      // noop write forces full evaluation of every column and sort —
      // a bare count() would let Catalyst prune the projections (JSON
      // decode, regex, HOFs) that ARE the workload in many queries.
      // Two measured runs, min reported: the first run carries one-time
      // codegen/JIT compilation that amortizes away at real scale.
      val times = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        val ok = try {
          fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true
        } catch { case _: Throwable => false }
        val dt = if (ok) (System.nanoTime() - t0) / 1e9 else -1.0
        // untimed: drop any intra-query .cache() blocks so one query's
        // leftovers don't GC-pressure the next measurement
        spark.catalog.clearCache()
        dt
      }
      name -> (if (times.exists(_ < 0)) -1.0 else times.min)
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    // -1 marks a failed query; don't let it shrink the total
    val total = results.values.filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
