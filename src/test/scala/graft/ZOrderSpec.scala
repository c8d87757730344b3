package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.ZOrder

class ZOrderSpec extends AnyFunSuite {
  import TestSpark._

  test("zval interleaves bits (hand cases)") {
    import spark.implicits._
    // interleave(a=0b11, b=0b01) = a bits at even, b at odd:
    // z = 1*1 + 1*4 (a) + 1*2 (b) = 7; plus byte-boundary cases
    val got = Seq((3L, 1L), (0L, 0L), (255L, 0L), (0L, 255L), (256L, 0L))
      .toDF("a", "b")
      .select(ZOrder.zval($"a", $"b")).collect().map(_.getLong(0)).toSeq
    val spread = (x: Long) => (0 until 16)
      .map(i => ((x >> i) & 1L) << (2 * i)).sum
    assert(got == Seq(7L, 0L, spread(255), 2 * spread(255), spread(256)))
  }

  /** files whose [min,max] box intersects the query box, by reading
    * each file's own stats — what parquet footer pruning sees.
    */
  private def overlapping(dir: String, aRange: (Long, Long),
      bRange: (Long, Long)): Int = {
    val files = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getPath)
    files.count { f =>
      val r = spark.read.parquet(f)
        .agg(min("a"), max("a"), min("b"), max("b")).head()
      val (amn, amx, bmn, bmx) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      !(amx < aRange._1 || amn > aRange._2) &&
        !(bmx < bRange._1 || bmn > bRange._2)
    }
  }

  test("z-ordered layout prunes files on BOTH dimensions; linear only on its sort key") {
    import spark.implicits._
    // full 256x256 grid: both dimensions equal width, so the layout —
    // not data skew — decides what prunes
    val grid = spark.range(65536L)
      .select(($"id" % 256).as("a"), ($"id" / 256).cast("long").as("b"))
    val zDir = graft.sources.Sources.scratchDir(spark, "zorder_grid")
    val linDir = graft.sources.Sources.scratchDir(spark, "linear_grid")
    ZOrder.zorderWrite(grid, "a", "b", zDir, 16)
    grid.repartitionByRange(16, $"a").sortWithinPartitions($"a")
      .write.mode("overwrite").parquet(linDir)
    val full = (0L, 255L)
    val box = (0L, 63L) // a quarter of either dimension
    // a-box: linear-by-a is optimal there, z still prunes to a subset
    val (zA, linA) = (overlapping(zDir, box, full), overlapping(linDir, box, full))
    assert(linA <= zA && zA < 16, s"a-box: z=$zA lin=$linA")
    // b-box: linear-by-a cannot prune AT ALL; z-order prunes hard
    val (zB, linB) = (overlapping(zDir, full, box), overlapping(linDir, full, box))
    assert(linB == 16 && zB <= 8, s"b-box: z=$zB lin=$linB")
    // combined 2-D box: the overlap set is the intersection of the
    // per-dimension overlap sets, so z localizes both at once (the
    // exact counts float with repartitionByRange's sampled boundaries
    // — only set-theoretic and aggregate claims are stable)
    val zAB = overlapping(zDir, box, box)
    assert(zAB <= math.min(zA, zB), s"ab-box: z=$zAB a=$zA b=$zB")
    // the balanced-workload claim the layout exists for: a mixed
    // a-box/b-box workload reads strictly fewer files under z-order
    assert(zA + zB < linA + linB, s"sum: z=${zA + zB} lin=${linA + linB}")
  }

  test("hilbert layout prunes files like z-order; box workload never worse") {
    import spark.implicits._
    val grid = spark.range(65536L)
      .select(($"id" % 256).as("a"), ($"id" / 256).cast("long").as("b"))
    val hDir = graft.sources.Sources.scratchDir(spark, "hilbert_grid")
    val zDir = graft.sources.Sources.scratchDir(spark, "zorder_grid_cmp")
    graft.sources.Hilbert.hilbertWrite(grid, "a", "b", hDir, 16)
    ZOrder.zorderWrite(grid, "a", "b", zDir, 16)
    val full = (0L, 255L)
    val box = (0L, 63L)
    // per-dimension boxes: hilbert, like z-order, prunes on BOTH axes
    val (hA, hB) = (overlapping(hDir, box, full), overlapping(hDir, full, box))
    assert(hA < 16 && hB < 16, s"hilbert must prune both axes: a=$hA b=$hB")
    // the 16-box tiling workload (each an aligned 64×64 quadrant):
    // total files touched under hilbert ≤ z-order — the file-level
    // manifestation of the curve_clustering run advantage
    val tiles = for (i <- 0 until 4; j <- 0 until 4)
      yield ((64L * i, 64L * i + 63), (64L * j, 64L * j + 63))
    val hSum = tiles.map { case (ar, br) => overlapping(hDir, ar, br) }.sum
    val zSum = tiles.map { case (ar, br) => overlapping(zDir, ar, br) }.sum
    assert(hSum <= zSum, s"tiled workload: hilbert $hSum vs zorder $zSum")
    // and every tile is servable without a full scan under hilbert
    tiles.foreach { case (ar, br) =>
      assert(overlapping(hDir, ar, br) < 16) }
  }

  test("hilbert reference obeys the adjacency law (exhaustive, order 8)") {
    import graft.sources.Hilbert
    // THE Hilbert property Morton lacks: consecutive curve indexes are
    // Manhattan-1 neighbors. Exhaustive over the full 256×256 grid.
    val cells = for (x <- 0 until 256; y <- 0 until 256)
      yield (Hilbert.xy2dRef(8, x, y), (x, y))
    val sorted = cells.sortBy(_._1)
    assert(sorted.map(_._1) == (0L until 65536L))   // a bijection
    sorted.sliding(2).foreach { case Seq((_, (x1, y1)), (_, (x2, y2))) =>
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1)
    }
  }

  test("nibble-compiled hval equals the bit-level reference (order 16)") {
    import graft.sources.Hilbert
    import spark.implicits._
    // mixed coverage: dense low grid + scattered large 16-bit values
    val pts = (for (x <- 0 until 48; y <- 0 until 48) yield (x.toLong, y.toLong)) ++
      (0 until 4096).map(i => ((i * 2654435761L) % 65536, (i * 40503L) % 65536))
    val got = pts.toDF("x", "y")
      .select($"x", $"y", Hilbert.hval($"x", $"y").as("h"))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    pts.foreach { case (x, y) =>
      assert(got((x, y)) == Hilbert.xy2dRef(16, x, y), s"($x,$y)")
    }
  }

  test("curve clustering: hilbert covers the box workload in fewer runs") {
    val rows = graft.sources.Hilbert.curveClustering(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      // runs are between 1 and n_cells for both curves
      val (n, h, z) = (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(h >= 1 && h <= n && z >= 1 && z <= n)
    }
    val (th, tz) = (rows.map(_.getLong(3)).sum, rows.map(_.getLong(4)).sum)
    assert(th < tz, s"hilbert total runs $th must beat morton $tz")
  }
}
