package graft.operators

import graft.{Fx, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Runtime-filter join reduction — the semi-join reduction Spark's own
  * `InjectRuntimeFilter` rule performs for selective joins, here as an
  * explicit operator: when a fact⋈dim join keeps only the fact rows
  * matching a SELECTIVE dim predicate, build a Bloom filter over the
  * filtered dim keys and cut the fact side BEFORE its shuffle, so the
  * exchange carries only probable matches plus the filter's small
  * false-positive mass (removed by the exact join afterwards — the
  * reduction is lossless, Bloom filters have no false negatives, and
  * the oracle is the plain join's SQL).
  *
  * Scale shape: the filter build is one partial-aggregatable shuffle
  * of <= mBits/64 rows over the already-filtered dim
  * ([[Dedup.bloomWordsOf]] — the broadcast-quantizer pattern: m/64
  * longs cross the driver, never the keys); the fact scan reads only
  * the join key + aggregation columns and drops ~95% of rows inside
  * the scan stage. The exact join is hinted shuffle-hash, NOT
  * broadcast: the premise is a dim beyond broadcast size (at
  * broadcast sizes Catalyst's own BroadcastHashJoin already avoids the
  * fact shuffle and no runtime filter is needed).
  */
object RuntimeFilter {

  /** Bloom width: 2^17 bits = 2048 longs. At sf0.1 the urgent+recent
    * dim is ~7.5k keys → ~18 bits/key, 2 probes → ~1% false positives;
    * a bigger dim raises mBits, never the algorithm.
    */
  val RfBits = 1 << 17

  /** Dim predicate shared with the oracle: urgent orders placed in the
    * corpus's last ~1.6 years — ~5% of orders at every scale factor.
    */
  val CutoffTs = "2000-01-01 00:00:00"

  /** Both sides hash the join key identically into the 60-bit domain
    * [[Dedup.bloomWordsOf]] probes over; the "rf:" salt decorrelates
    * from the sampling-gate hashes. xxhash64 (whole-stage-codegen
    * native), not the md5/conv path: the filter's hash is NOT
    * result-affecting — false positives are removed by the exact join
    * and the oracle is the plain join — so the reduction can use the
    * cheapest stable hash (md5 cost one string build + digest + hex
    * parse per FACT row, the hot path of the whole operator).
    */
  private def keyHash(c: Column): Column =
    xxhash64(lit("rf:"), c).bitwiseAND(lit((1L << 60) - 1))

  /** The filtered dim side (urgent + recent orders). */
  def dimOrders(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.orders(spark, dir)
      .filter($"o_orderpriority" === "1-URGENT" &&
        $"o_orderdate" >= lit(CutoffTs).cast("timestamp"))
      .select($"o_orderkey", $"o_orderdate")
  }

  /** Per-order revenue for the filtered dim, fact side Bloom-reduced
    * before its shuffle. Returns the same rows as the plain join.
    */
  def bloomReducedRevenueOf(dim: DataFrame, lineitem: DataFrame,
      mBits: Int = RfBits): DataFrame = {
    val spark = dim.sparkSession
    import spark.implicits._
    val bitset = Dedup.bloomWordsOf(
      dim.select(keyHash($"o_orderkey").as("h")), mBits)
    val fact = lineitem
      .select($"l_orderkey", $"l_extendedprice", $"l_discount")
      .filter(Dedup.bloomHit(bitset, keyHash($"l_orderkey"), mBits))
    fact.join(dim.hint("shuffle_hash"), $"l_orderkey" === $"o_orderkey")
      .groupBy($"o_orderkey", $"o_orderdate")
      .agg(
        sum(Fx.dec2($"l_extendedprice") * (Fx.one - Fx.rate2($"l_discount")))
          .cast("double").as("revenue"),
        count(lit(1)).as("n_lines"))
      .select($"o_orderkey", $"o_orderdate".cast("date").as("o_orderdate"),
        $"revenue", $"n_lines")
  }

  /** Driver query: revenue per urgent recent order through the
    * runtime-filtered join, totally ordered. Oracle: the plain
    * lineitem⋈orders join — a fact row the Bloom filter wrongly
    * dropped (impossible by construction) or a false positive the
    * exact join failed to remove would mismatch.
    */
  def runtimeFilterJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    bloomReducedRevenueOf(dimOrders(spark, dir), Tables.lineitem(spark, dir))
      .orderBy($"o_orderkey")
  }
}
