package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Data-quality constraint audit (§2-beyond — the "expectations" pass
  * every ingestion pipeline runs before publishing a table).
  *
  * The reference guards single records inline (format/null checks on
  * decoded Kafka payloads, spark_streaming_kafka.py:18–20); at warehouse
  * scale the same concern is a TABLE-level contract: null counts,
  * key uniqueness, domain membership, referential integrity. Each check
  * here reduces to one partially-aggregated pass — the six scalar checks
  * share a single scan (one multi-aggregate), and the FK check is one
  * anti join that Catalyst broadcasts when the dimension is small.
  * Output is the fixed (check_name, violations) contract so downstream
  * gates can alert on any non-zero row without knowing the check list.
  */
object Audit {

  /** Constraint audit over `orders` (+ FK to `customer`). Violation
    * counts are exact longs; a healthy table is all-zeros. The NOT-IN
    * domain check deliberately uses null-safe `isin` semantics: a NULL
    * status is counted by its own null check, not double-counted as a
    * domain violation.
    */
  def dqAudit(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val o = Tables.orders(spark, dir)
    val base = o.agg(
      count(lit(1)).as("n_rows"),
      count(when($"o_orderkey".isNull, 1)).as("null_orderkey"),
      countDistinct($"o_orderkey").as("distinct_orderkey"),
      count(when($"o_totalprice" <= 0, 1)).as("nonpositive_totalprice"),
      count(when(!$"o_orderstatus".isin("F", "O", "P"), 1)).as("bad_status"),
      count(when($"o_orderdate".isNull, 1)).as("null_orderdate"))
    val fk = o.select($"o_custkey")
      .join(Tables.customer(spark, dir).select($"c_custkey"),
        $"o_custkey" === $"c_custkey", "left_anti")
      .agg(count(lit(1)).as("fk_violations"))
    // stack() unpivots the one-row multi-aggregate into the fixed
    // (check_name, violations) contract — no extra scan
    base.selectExpr(
      """stack(5,
        |  'bad_status', bad_status,
        |  'dup_orderkey', n_rows - distinct_orderkey,
        |  'nonpositive_totalprice', nonpositive_totalprice,
        |  'null_orderdate', null_orderdate,
        |  'null_orderkey', null_orderkey
        |) as (check_name, violations)""".stripMargin)
      .unionByName(fk.select(lit("fk_custkey").as("check_name"),
        $"fk_violations".as("violations")))
      .orderBy($"check_name")
  }
}
