package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Cross-engine-deterministic arithmetic helpers.
  *
  * The driver hash-compares our parquet output against a DuckDB oracle.
  * A plain `SUM(double)` is summation-order-dependent: Spark's partial
  * aggregation over 32 shuffle partitions and DuckDB's single-threaded
  * scan accumulate in different orders, so low-order bits differ and the
  * hash check fails even though both answers are "right". The fix is the
  * one a production engine uses for money columns anyway: accumulate in
  * exact DECIMAL, convert once at the end.
  *
  * Each helper has an exact SQL mirror (see SparkEntry.oracleSql):
  *   dsum(c, s)  ==  CAST(SUM(CAST(c AS DECIMAL(18,s))) AS DOUBLE)
  *   davg(c, s)  ==  CAST(SUM(CAST(c AS DECIMAL(18,s))) AS DOUBLE) / COUNT(c)
  *
  * The double->decimal cast rounds to `s` places; both engines see
  * bit-identical input doubles, and an exact decimal .5 tie is not
  * representable in binary, so the per-row rounding is identical too.
  */
object Fx {
  /** Exact fixed-point sum of a double column, returned as DOUBLE.
    *
    * ONLY safe on "clean" columns whose true values have <= `scale`
    * decimals (all the corpus money/qty/rate columns): there the
    * double->decimal cast is exact in both engines. For derived products
    * (e.g. price*(1-disc)) do the arithmetic in the decimal domain
    * instead ([[dec2]]/[[one]]): Spark casts arbitrary doubles to
    * decimal via the shortest-round-trip string + HALF_UP, DuckDB
    * rounds the binary value — they disagree on near-tie rows.
    */
  def dsum(c: Column, scale: Int = 2): Column =
    sum(c.cast(DecimalType(18, scale))).cast("double")

  /** Clean 2-decimal column lifted into the decimal domain. Precision 12
    * keeps products of three factors within DECIMAL(38,_) so Spark never
    * reduces scale (which would re-introduce rounding).
    */
  def dec2(c: Column): Column = c.cast(DecimalType(12, 2))

  /** Clean small 2-decimal column (discounts, tax rates). */
  def rate2(c: Column): Column = c.cast(DecimalType(4, 2))

  /** Literal 1 as a narrow decimal so +/- stays narrow. */
  def one: Column = lit(1).cast(DecimalType(3, 2))

  /** SQL mirrors of the decimal-domain building blocks. */
  def dec2Sql(e: String): String = s"CAST($e AS DECIMAL(12,2))"
  def rate2Sql(e: String): String = s"CAST($e AS DECIMAL(4,2))"
  val oneSql: String = "CAST(1 AS DECIMAL(3,2))"

  /** Exact fixed-point average (sum/count in double, deterministic). */
  def davg(c: Column, scale: Int = 2): Column =
    dsum(c, scale) / count(c)

  /** SQL mirror fragments for oracle queries. */
  def dsumSql(expr: String, scale: Int = 2): String =
    s"CAST(SUM(CAST($expr AS DECIMAL(18,$scale))) AS DOUBLE)"
  def davgSql(expr: String, scale: Int = 2): String =
    s"(${dsumSql(expr, scale)} / COUNT($expr))"
}
