package graft.sources

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Hilbert-curve data layout — the locality-optimal alternative to
  * [[ZOrder]] (public algorithm; the curve construction follows the
  * standard iterative formulation, e.g. Wikipedia's `xy2d`, and the
  * layout role matches what Delta/Iceberg expose as OPTIMIZE ... BY
  * HILBERT). Morton interleaving is cheap but takes long diagonal
  * jumps between quadrant boundaries; the Hilbert curve visits cells
  * so that CONSECUTIVE indexes are always Manhattan-distance-1
  * neighbors, which tightens per-file min/max boxes further for the
  * same file count — fewer boundary files straddle a 2-D range
  * predicate, so range scans prune strictly better on adversarial
  * boxes.
  *
  * Implementation strategy, 100 TB-first: the curve is a 4-state
  * automaton over the interleaved bit stream (state = the dihedral
  * orientation of the current sub-square). Running it bit-by-bit as a
  * column expression would thread the state through 16 dependent
  * levels (deep, duplication-prone expression tree), so the automaton
  * is PRE-COMPILED into nibble tables: 4 levels at a time, indexed by
  * (state, x-nibble, y-nibble) → (8 digit bits, next state). The
  * runtime expression is then FOUR chained table lookups — pure
  * integer ops on literal arrays, codegen-friendly, bit-identical in
  * DuckDB via the same generated tables ([[ZOrder.SpreadTable]]
  * idiom). The tables are derived at class-load from the bit-level
  * automaton, not hand-copied, and the spec cross-checks the result
  * against an independent plain-Scala reference implementation plus
  * the adjacency law itself.
  */
object Hilbert {

  /** One bit-level automaton step on orientation flags
    * (swap, cx, cy): effective bits are (raw, possibly swapped) XOR
    * complements; digit = (3·rx) XOR ry; the sub-square orientation
    * updates exactly as the classic algorithm's rotate-and-flip.
    * Returns (digit, nextState). States encode as
    * swap + 2·cx + 4·cy — only {0,1,3·?}: reachable set is
    * {(F,0,0),(T,0,0),(F,1,1),(T,1,1)} → ids {0,1,6,7} remapped to
    * 0..3 via [[stateId]].
    */
  private def step(state: (Boolean, Int, Int), xi: Int, yi: Int)
      : (Int, (Boolean, Int, Int)) = {
    val (swap, cx, cy) = state
    val (bx, by) = if (swap) (yi, xi) else (xi, yi)
    val (rx, ry) = (bx ^ cx, by ^ cy)
    val digit = (3 * rx) ^ ry
    val next =
      if (ry == 0) {
        val (cx2, cy2) = if (rx == 1) (cx ^ 1, cy ^ 1) else (cx, cy)
        // swap effective axes: complements travel with their axis
        (!swap, cy2, cx2)
      } else state
    (digit, next)
  }

  private val states = Seq((false, 0, 0), (true, 0, 0), (false, 1, 1), (true, 1, 1))
  private def stateId(s: (Boolean, Int, Int)): Int = states.indexOf(s)

  /** Nibble tables: flat[(state*16 + xNibble)*16 + yNibble] →
    * digits (8 bits) and next state, from four automaton steps
    * MSB-first.
    */
  val (digitTable, nextTable): (Seq[Long], Seq[Long]) = {
    val dig = Array.ofDim[Long](4 * 16 * 16)
    val nxt = Array.ofDim[Long](4 * 16 * 16)
    for (s <- states.indices; xn <- 0 until 16; yn <- 0 until 16) {
      var st = states(s); var d = 0L
      for (i <- 3 to 0 by -1) {
        val (dg, st2) = step(st, (xn >> i) & 1, (yn >> i) & 1)
        d = d * 4 + dg; st = st2
      }
      val idx = (s * 16 + xn) * 16 + yn
      dig(idx) = d; nxt(idx) = stateId(st).toLong
    }
    (dig.toSeq, nxt.toSeq)
  }

  /** Reference bit-level implementation (plain Scala) — the classic
    * iterative xy2d, used ONLY by specs to cross-validate the tables.
    */
  def xy2dRef(order: Int, x0: Long, y0: Long): Long = {
    var (x, y) = (x0, y0); var d = 0L
    var s = 1L << (order - 1)
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3 * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) { x = s - 1 - x; y = s - 1 - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  /** Hilbert index of two 16-bit keys (callers mask wider keys) as a
    * pure column expression: four chained nibble-table lookups.
    * h < 2^32 — overflow-free BIGINT everywhere.
    */
  def hval(a: Column, b: Column): Column = {
    val dt = typedLit(digitTable)
    val nt = typedLit(nextTable)
    def nib(c: Column, lvl: Int) =
      shiftrightunsigned(c.bitwiseAND(lit(65535L)), 12 - 4 * lvl)
        .bitwiseAND(lit(15L))
    // state chain: state_c referenced by digit_c and state_{c+1} —
    // 4 chunk levels keep the duplicated-subtree factor at 2^4
    var state: Column = lit(0L)
    var acc: Column = lit(0L)
    for (lvl <- 0 until 4) {
      val idx = ((state * 16 + nib(a, lvl)) * 16 + nib(b, lvl)).cast("int") + 1
      acc = acc * 256 + element_at(dt, idx)
      if (lvl < 3) state = element_at(nt, idx)
    }
    acc
  }

  /** SQL mirror of [[hval]] — same tables, same lookup chain. The
    * state subexpression is inlined per level (SQL has no lets), which
    * is exactly the duplication the nibble compilation bounds.
    */
  def hvalSql(a: String, b: String): String = {
    val dt = digitTable.mkString("[", ", ", "]")
    val nt = nextTable.mkString("[", ", ", "]")
    // fully parenthesized: SQL's & binds LOOSER than +, so a bare
    // `... + x >> s & 15` would mask the whole sum, not the nibble
    def nib(c: String, lvl: Int) = s"(((($c) & 65535) >> ${12 - 4 * lvl}) & 15)"
    var state = "0"
    val digits = (0 until 4).map { lvl =>
      val idx = s"CAST((($state) * 16 + ${nib(a, lvl)}) * 16 + ${nib(b, lvl)} AS INTEGER) + 1"
      val d = s"CAST(($dt)[$idx] AS BIGINT)"
      if (lvl < 3) state = s"($nt)[$idx]"
      d
    }
    digits.reduce((x, y) => s"(($x) * 256 + $y)")
  }

  /** The Hilbert-key relation for lineitem's (l_partkey, l_suppkey) —
    * [[ZOrder.zorderKey]]'s sibling, same access pattern, same write
    * pipeline (`repartitionByRange` on h + sortWithinPartitions), one
    * curve swapped for the other.
    */
  def hilbertKey(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // hval computed BELOW the distinct (it is a pure function of the
    // pair, so distinct over 3 columns == distinct over 2): the key
    // projection folds into the aggregation's map side and is not
    // re-evaluated by the final sort's range-sampling pass
    Tables.lineitem(spark, dir)
      .select($"l_partkey", $"l_suppkey",
        hval($"l_partkey", $"l_suppkey").as("hval"))
      .distinct()
      .orderBy($"hval", $"l_partkey", $"l_suppkey")
  }

  /** Write `df` Hilbert-ordered on (a, b) into `nFiles`
    * range-partitioned parquet files — [[ZOrder.zorderWrite]] with the
    * curve swapped. Same write pipeline, same scale shape.
    */
  def hilbertWrite(df: DataFrame, a: String, b: String, out: String,
      nFiles: Int): Unit =
    df.withColumn("__h", hval(col(a), col(b)))
      .repartitionByRange(nFiles, col("__h"))
      .sortWithinPartitions(col("__h"))
      .drop("__h")
      .write.mode("overwrite").parquet(out)

  /** [[hilbertKey]] oracle. */
  def hilbertKeySql(): String =
    s"""SELECT l_partkey, l_suppkey, ${hvalSql("l_partkey", "l_suppkey")} AS hval
       |FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
       |ORDER BY hval, l_partkey, l_suppkey""".stripMargin

  /** Query-box geometry for [[curveClustering]]: 16×16 boxes at
    * stride 8 over a 64×64 key window — 36 overlapping boxes, the
    * box-query workload of Moon et al.'s clustering analysis.
    */
  val BoxStride = 8L
  val BoxSize = 16L
  val MaxBoxIdx = 5L
  val KeyWindow = 64L

  /** Curve-clustering comparison, Hilbert vs Morton — the metric that
    * actually predicts file pruning (Moon et al., "Analysis of the
    * clustering properties of the Hilbert space-filling curve", IEEE
    * TKDE 2001): for each query box, the number of CONTIGUOUS curve
    * runs needed to cover its cells. Each run ≈ one contiguous
    * file/row-group range touched after range-partitioning on the
    * curve key, so fewer runs = fewer boundary files per box query.
    * (Mean index-jump between neighbors is the WRONG metric — Morton
    * wins it, because Hilbert buys its run-contiguity with rare long
    * returns; measured during development and deliberately not used.)
    *
    * Dataflow, 100 TB-first: box membership is an EXPLODE of ≤4
    * candidate box ids per cell (stride 8, size 16 ⇒ a cell is in at
    * most 2×2 boxes) — a pure projection, no theta-join against the
    * box list. A run START is a cell whose predecessor index (h−1 /
    * z−1) is absent from the same box: one left-anti self-equi-join
    * per curve on (box, index), then a per-box count. Everything is
    * exact integers.
    */
  def curveClustering(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val keys = Tables.lineitem(spark, dir)
      .select($"l_partkey" % KeyWindow, $"l_suppkey" % KeyWindow).toDF("x", "y")
      .distinct()
      .select($"x", $"y", hval($"x", $"y").as("h"), ZOrder.zval($"x", $"y").as("z"))
    val cells = keys
      .withColumn("bx", explode(array(expr(s"x div $BoxStride - 1"), expr(s"x div $BoxStride"))))
      .filter($"bx".between(0, MaxBoxIdx))
      .withColumn("by", explode(array(expr(s"y div $BoxStride - 1"), expr(s"y div $BoxStride"))))
      .filter($"by".between(0, MaxBoxIdx))
      .select($"bx", $"by", $"h", $"z")
    def runStarts(idx: String) = {
      val pred = cells.select($"bx".as("pbx"), $"by".as("pby"),
        (col(idx) + 1).as("pnext"))
      cells.join(pred,
          $"bx" === $"pbx" && $"by" === $"pby" && col(idx) === $"pnext",
          "left_anti")
        .groupBy($"bx", $"by").agg(count(lit(1)).as(s"${idx}_runs"))
    }
    val n = cells.groupBy($"bx", $"by").agg(count(lit(1)).as("n_cells"))
    n.join(runStarts("h"), Seq("bx", "by"))
      .join(runStarts("z"), Seq("bx", "by"))
      .select($"bx", $"by", $"n_cells",
        $"h_runs".as("hilbert_runs"), $"z_runs".as("morton_runs"))
      .orderBy($"bx", $"by")
  }

  /** [[curveClustering]] oracle (NOT EXISTS predecessor formulation —
    * independent of the anti-join plan).
    */
  def curveClusteringSql(): String =
    s"""WITH ks AS (SELECT DISTINCT l_partkey % $KeyWindow AS x, l_suppkey % $KeyWindow AS y
       |  FROM lineitem),
       |k AS (SELECT x, y, ${hvalSql("x", "y")} AS h, ${ZOrder.zvalSql("x", "y")} AS z FROM ks),
       |cells AS (
       |  SELECT t1.bx, t2.by, h, z FROM k,
       |    unnest([x // $BoxStride - 1, x // $BoxStride]) AS t1(bx),
       |    unnest([y // $BoxStride - 1, y // $BoxStride]) AS t2(by)
       |  WHERE t1.bx BETWEEN 0 AND $MaxBoxIdx AND t2.by BETWEEN 0 AND $MaxBoxIdx),
       |hs AS (SELECT bx, by, COUNT(*) AS hilbert_runs FROM cells c
       |  WHERE NOT EXISTS (SELECT 1 FROM cells p
       |    WHERE p.bx = c.bx AND p.by = c.by AND p.h = c.h - 1)
       |  GROUP BY bx, by),
       |zs AS (SELECT bx, by, COUNT(*) AS morton_runs FROM cells c
       |  WHERE NOT EXISTS (SELECT 1 FROM cells p
       |    WHERE p.bx = c.bx AND p.by = c.by AND p.z = c.z - 1)
       |  GROUP BY bx, by),
       |n AS (SELECT bx, by, COUNT(*) AS n_cells FROM cells GROUP BY bx, by)
       |SELECT bx, by, n_cells, hilbert_runs, morton_runs
       |FROM n JOIN hs USING (bx, by) JOIN zs USING (bx, by)
       |ORDER BY bx, by""".stripMargin
}
