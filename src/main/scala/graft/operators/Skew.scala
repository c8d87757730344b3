package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for shuffle joins.
  *
  * When one join key carries a disproportionate share of the big side
  * (a viral song's ratings, a hot user's events), a plain shuffle join
  * funnels that key into one reducer. Salting splits each hot key into
  * `salts` sub-keys: the big side gets a deterministic per-row salt,
  * the small side is replicated across all salts, and the join key
  * becomes (key, salt) — the hot key's rows now spread over `salts`
  * reducers. AQE's skew-join handles moderate skew automatically;
  * explicit salting is the tool when one key alone exceeds what a
  * single task can hold.
  */
object Skew {

  /** Deterministic row salt in [0, salts): hashed from the given
    * columns (any per-row-varying columns work; using the row's
    * non-key attributes keeps it reproducible run-to-run).
    */
  def salt(salts: Int, cols: Column*): Column =
    pmod(hash(cols: _*), lit(salts))

  /** Equi-join `big` with `small` on `key`, spreading each of big's
    * keys over `salts` reducers. Result equals `big.join(small, key)`
    * row-for-row; the small side is replicated `salts` times (keep it
    * the dimension side).
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      salts: Int, bigSaltCols: Seq[String]): DataFrame = {
    val b = big.withColumn("__salt", salt(salts, bigSaltCols.map(col): _*))
    val s = small
      .withColumn("__salt", explode(sequence(lit(0), lit(salts - 1))))
      .withColumn("__salt", col("__salt").cast("int"))
    b.join(s, Seq(key, "__salt")).drop("__salt")
  }

  /** Oracle-checked driver query: lineitem ⋈ part through the salted
    * join (part replicated over 8 salts, lineitem salted per-row from
    * its primary key). The oracle is the PLAIN join — salting must be
    * result-invisible row-for-row. The shuffle hint keeps the join a
    * real (key, __salt) shuffle join, the path salting exists for,
    * instead of a broadcast that would bypass the salt entirely.
    */
  def saltedJoinQuery(spark: org.apache.spark.sql.SparkSession, dir: String,
      salts: Int = 8): DataFrame = {
    import spark.implicits._
    val big = graft.Tables.lineitem(spark, dir)
      .select($"l_orderkey", $"l_linenumber", $"l_partkey", $"l_quantity")
    val small = graft.Tables.part(spark, dir)
      .select($"p_partkey".as("l_partkey"), $"p_name").hint("shuffle_hash")
    saltedJoin(big, small, "l_partkey", salts, Seq("l_orderkey", "l_linenumber"))
      .select($"l_orderkey", $"l_linenumber", $"l_partkey", $"l_quantity", $"p_name")
      // (l_orderkey, l_linenumber) is not unique in the synthetic corpus;
      // ordering by every column makes remaining ties identical rows
      .orderBy($"l_orderkey", $"l_linenumber", $"l_partkey", $"l_quantity")
  }
}
