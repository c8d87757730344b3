package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Record linkage / entity resolution: match a dirty feed against a
  * canonical dimension with BLOCKED edit-distance comparison — the
  * classic ER shape (canonicalize, block, compare-within-block, pick
  * best) that absorbs typo'd merchant names, product titles, and
  * address lines in every ingestion pipeline.
  *
  * Scale shape: the canonical dimension is census-sized and
  * BROADCASTS; candidate pairs are bounded by block occupancy (first
  * letter here; production blocks compose more keys or an LSH gate —
  * the same hot-key capping idiom as `Dedup.DefaultMaxDf` applies to
  * skewed blocks), so `levenshtein` — integer DP, bit-identical across
  * engines — never runs all-pairs. The dirty side is never shuffled
  * except the per-record best-match window over the (block-bounded)
  * candidate set.
  *
  * Blocking is honest about recall: a corruption that hits the block
  * key (deleting the FIRST character) makes the record unmatchable by
  * this pass — exactly the miss a production blocker accepts and
  * measures; those rows simply don't appear in the output (both
  * engines agree on which they are).
  */
object EntityResolution {

  /** Maximum edit distance accepted as a match. */
  val MaxEditDistance = 2

  /** Deterministically corrupted copy of the part names: each record's
    * name drops the character at position p_partkey mod len — a typo
    * feed both engines can reconstruct (no RNG).
    */
  def dirtyFeed(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.part(spark, dir).select($"p_partkey", $"p_name")
      .withColumn("pos", ($"p_partkey" % length($"p_name")).cast("int"))
      .select($"p_partkey",
        concat(expr("substring(p_name, 1, pos)"),
          expr("substring(p_name, pos + 2, length(p_name))"))
          .as("dirty_name"))
  }

  /** Match the dirty feed to canonical names: block on the first
    * letter, compare within block with levenshtein ≤ [[MaxEditDistance]],
    * keep each record's best match (distance, then name — a total
    * order, so the winner is deterministic).
    */
  def entityMatch(spark: SparkSession, dir: String,
      maxDist: Int = MaxEditDistance): DataFrame = {
    import spark.implicits._
    matchOf(dirtyFeed(spark, dir),
      Tables.part(spark, dir).select($"p_name").distinct()
        .select($"p_name".as("canon")),
      maxDist)
  }

  /** [[entityMatch]] over any (p_partkey, dirty_name) feed and (canon)
    * dimension.
    */
  def matchOf(dirty: DataFrame, canonDim: DataFrame,
      maxDist: Int = MaxEditDistance): DataFrame = {
    val spark = dirty.sparkSession
    import spark.implicits._
    val canon = canonDim.withColumn("blk", substring($"canon", 1, 1))
    val blocked = dirty.withColumn("blk", substring($"dirty_name", 1, 1))
    val w = Window.partitionBy($"p_partkey").orderBy($"dist", $"canon")
    blocked.join(broadcast(canon), Seq("blk"))
      .withColumn("dist", levenshtein($"dirty_name", $"canon"))
      .filter($"dist" <= maxDist)
      .withColumn("rk", row_number().over(w))
      .filter($"rk" === 1)
      .select($"p_partkey", $"dirty_name", $"canon", $"dist")
      .orderBy($"p_partkey")
  }

  /** DuckDB mirror: same corruption, same blocking, same total-order
    * best-match selection.
    */
  def entityMatchSql(maxDist: Int = MaxEditDistance): String =
    s"""WITH dirty AS (SELECT p_partkey,
       |    substring(p_name, 1, CAST(p_partkey % length(p_name) AS INT))
       |      || substring(p_name, CAST(p_partkey % length(p_name) AS INT) + 2,
       |           length(p_name)) AS dirty_name
       |  FROM part),
       |canon AS (SELECT DISTINCT p_name AS canon FROM part),
       |cand AS (SELECT d.p_partkey, d.dirty_name, c.canon,
       |    levenshtein(d.dirty_name, c.canon) AS dist
       |  FROM dirty d JOIN canon c
       |    ON substring(d.dirty_name, 1, 1) = substring(c.canon, 1, 1)
       |  WHERE levenshtein(d.dirty_name, c.canon) <= $maxDist),
       |best AS (SELECT p_partkey, dirty_name, canon, dist, ROW_NUMBER() OVER (
       |    PARTITION BY p_partkey ORDER BY dist, canon) AS rk FROM cand)
       |SELECT p_partkey, dirty_name, canon, CAST(dist AS INT) AS dist
       |FROM best WHERE rk = 1 ORDER BY p_partkey""".stripMargin
}
