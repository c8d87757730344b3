package graft

import org.apache.spark.sql.SparkSession

/** Dev scratchpad — not part of the library (deleted before ship). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[scratch] $name%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    Tables.documents(spark, dir).count() // warmup

    SparkEntry.queries.foreach { case (name, fn) =>
      time(name) { fn(spark, dir).count() }
    }
    spark.stop()
  }
}
