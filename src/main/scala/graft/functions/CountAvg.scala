package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator` mirroring the reference's
  * `get_counts_and_averages` (engine.py:9–14, duplicated at
  * spark_music.py:66, spark_kafka.py:49, spark_streaming_kafka.py:122):
  * per-key (count, mean) in one pass.
  *
  * The reference computes this with `groupByKey` — every rating is
  * shuffled to its key's reducer. This Aggregator declares the
  * (count, sum) monoid instead, so Spark runs it as a partial+final
  * aggregation: each map task pre-reduces its partition and the
  * shuffle carries one 16-byte buffer per (partition, key). The
  * built-in `count`/`avg` pair compiles to the same plan — the class
  * exists as the idiomatic custom-UDAF extension slot (SURVEY §2.12)
  * and for callers who want the fused typed result.
  */
object CountAvg extends Aggregator[Double, (Long, Double), (Long, Double)] {
  override def zero: (Long, Double) = (0L, 0.0)
  override def reduce(b: (Long, Double), a: Double): (Long, Double) =
    (b._1 + 1, b._2 + a)
  override def merge(x: (Long, Double), y: (Long, Double)): (Long, Double) =
    (x._1 + y._1, x._2 + y._2)
  override def finish(r: (Long, Double)): (Long, Double) =
    (r._1, if (r._1 == 0) 0.0 else r._2 / r._1)
  override def bufferEncoder: Encoder[(Long, Double)] =
    Encoders.tuple(Encoders.scalaLong, Encoders.scalaDouble)
  override def outputEncoder: Encoder[(Long, Double)] =
    Encoders.tuple(Encoders.scalaLong, Encoders.scalaDouble)
}
