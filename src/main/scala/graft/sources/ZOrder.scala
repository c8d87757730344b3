package graft.sources

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) data layout — the multi-dimensional
  * clustering trick behind Delta/Iceberg OPTIMIZE ZORDER: interleaving
  * the bits of two keys makes points close in EITHER dimension land in
  * the same neighborhood of the sort order, so range-partitioned files
  * carry tight min/max footers on BOTH columns and a 2-D box filter
  * prunes files/row-groups that a single-column sort could only prune
  * on its leading key.
  *
  * The z-value is pure integer arithmetic (byte-spread lookup tables +
  * power-of-two scaling — identical literal tables indexed in both
  * engines), so the mapping is cross-engine exact and RNG-free; as a
  * projection it parallelizes per split at any scale, and the layout
  * write is the ordinary repartitionByRange + sortWithinPartitions +
  * parquet pipeline.
  */
object ZOrder {

  /** spread(b): byte b's bits moved to even positions (bit i → 2i),
    * the standard Morton building block. 256 longs, shared with the
    * SQL generator.
    */
  val SpreadTable: Seq[Long] = (0 until 256).map { b =>
    (0 until 8).map(i => ((b >> i) & 1).toLong << (2 * i)).sum
  }

  /** Morton interleave of two 16-bit keys (callers mask wider keys —
    * widening the table is the standard scale path): a occupies even
    * bits, b odd. Pure integer ops (mask, shift, lookup, add, scale by
    * powers of two): z < 2^32, overflow-free BIGINT in both engines.
    */
  def zval(a: Column, b: Column): Column = {
    val t = typedLit(SpreadTable)
    def s(x: Column) = element_at(t, x.cast("int") + 1)
    val a16 = a.bitwiseAND(lit(65535L))
    val b16 = b.bitwiseAND(lit(65535L))
    (s(a16.bitwiseAND(lit(255L))) + s(b16.bitwiseAND(lit(255L))) * 2) +
      (s(shiftrightunsigned(a16, 8)) + s(shiftrightunsigned(b16, 8)) * 2) * 65536
  }

  /** SQL mirror of [[zval]] (same table, same op order). */
  def zvalSql(a: String, b: String): String = {
    val t = SpreadTable.mkString("[", ", ", "]")
    def s(x: String) = s"CAST(($t)[CAST(($x) AS INTEGER) + 1] AS BIGINT)"
    val (a16, b16) = (s"($a & 65535)", s"($b & 65535)")
    s"(${s(s"$a16 & 255")} + ${s(s"$b16 & 255")} * 2) + " +
      s"(${s(s"$a16 >> 8")} + ${s(s"$b16 >> 8")} * 2) * 65536"
  }

  /** The z-key relation for lineitem's (l_partkey, l_suppkey) — the
    * two-dimensional access pattern (by part, by supplier) a single
    * sort key cannot serve. Emits each distinct key pair with its
    * z-value, totally ordered.
    */
  def zorderKey(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // zval computed BELOW the distinct (pure function of the pair):
    // same rows, and the projection folds into the aggregation's map
    // side instead of re-running under the sort's sampling pass
    Tables.lineitem(spark, dir)
      .select($"l_partkey", $"l_suppkey",
        zval($"l_partkey", $"l_suppkey").as("zval"))
      .distinct()
      .orderBy($"zval", $"l_partkey", $"l_suppkey")
  }

  /** Write `df` z-ordered on (a, b) into `nFiles` range-partitioned
    * parquet files — the layout artifact. repartitionByRange on the
    * z-value gives files that are contiguous z-ranges; the within-file
    * sort tightens row-group stats the same way.
    */
  def zorderWrite(df: DataFrame, a: String, b: String, out: String,
      nFiles: Int): Unit =
    df.withColumn("__z", zval(col(a), col(b)))
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(out)
}
