package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Market-basket association-rule mining (§2-beyond — the co-occurrence
  * analysis behind "users who bought X also bought Y").
  *
  * The reference computes per-song rating supports (engine.py:9–14) and
  * joins them back onto candidates; rules generalize that to PAIR
  * supports with confidence and lift. The candidate space is bounded the
  * same way the MinHash posting lists are (Dedup.DefaultMaxDf idiom):
  * baskets are capped at [[DefaultMaxItemsPerBasket]] items BEFORE the
  * within-basket self-join, so one degenerate mega-basket contributes
  * O(cap²) pairs, not O(n²) — the same guard the co-rating PageRank edge
  * build uses. Everything downstream is partial-aggregatable counts.
  */
object Basket {

  /** Per-basket item cap applied before pairing (lowest item ids kept —
    * a deterministic choice, unlike sampling). TPC-H baskets hold ≤7
    * items so the cap never binds on the driver corpus; at 100 TB it is
    * the difference between O(cap²) and a quadratic straggler.
    */
  val DefaultMaxItemsPerBasket = 64

  /** Association rules over `lineitem` baskets (order = basket,
    * part = item): all directed rules a→b with pair support ≥
    * `minSupport`, scored by exact integer confidence (ppm, floor) and
    * the lift ratio N·s_ab/(s_a·s_b) — the ORDER is decided by the
    * integer-exact conf_ppm with (antecedent, consequent) tiebreak, so
    * the one IEEE divide in lift never decides a rank (the
    * word_associations precedent).
    */
  def assocRules(spark: SparkSession, dir: String,
                 minSupport: Int = 2, k: Int = 100): DataFrame = {
    import spark.implicits._
    assocRulesOf(
      Tables.lineitem(spark, dir)
        .select($"l_orderkey".as("basket"), $"l_partkey".as("item")),
      minSupport, k)
  }

  /** Rule mining over any (basket, item) relation — the testable core
    * (degeneracy spec feeds a mega-basket and asserts the cap bounds
    * the pair count).
    */
  def assocRulesOf(rawItems: DataFrame,
                   minSupport: Int = 2, k: Int = 100): DataFrame = {
    val spark = rawItems.sparkSession
    import spark.implicits._
    val items = rawItems.select($"basket", $"item").distinct()
    val wB = Window.partitionBy($"basket").orderBy($"item")
    val capped = items
      .withColumn("rn", row_number().over(wB))
      .filter($"rn" <= DefaultMaxItemsPerBasket)
      .drop("rn")
    val nBaskets = capped.select($"basket").distinct()
      .agg(count(lit(1)).as("n_baskets"))
    val supports = capped.groupBy($"item").agg(count(lit(1)).as("s_item"))
    val pairs = capped.select($"basket", $"item".as("a"))
      .join(capped.select($"basket", $"item".as("b")), Seq("basket"))
      .filter($"a" < $"b")
      .groupBy($"a", $"b")
      .agg(count(lit(1)).as("s_ab"))
      .filter($"s_ab" >= minSupport)
    // each undirected pair yields two directed rules (confidence is
    // direction-dependent; lift is symmetric)
    val directed = pairs
      .select($"a".as("antecedent"), $"b".as("consequent"), $"s_ab")
      .unionByName(
        pairs.select($"b".as("antecedent"), $"a".as("consequent"), $"s_ab"))
    directed
      .join(supports.select($"item".as("antecedent"), $"s_item".as("s_ant")),
        Seq("antecedent"))
      .join(supports.select($"item".as("consequent"), $"s_item".as("s_con")),
        Seq("consequent"))
      .crossJoin(broadcast(nBaskets))
      .select($"antecedent", $"consequent", $"s_ab", $"s_ant", $"s_con",
        expr("(s_ab * 1000000) div s_ant").as("conf_ppm"),
        (($"n_baskets" * $"s_ab").cast("double") / ($"s_ant" * $"s_con"))
          .as("lift_ratio"))
      .orderBy($"conf_ppm".desc, $"antecedent", $"consequent")
      .limit(k)
  }
}
