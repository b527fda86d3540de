package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Layout

/** Morton z-value math on hand-checkable values, and the census's core
  * claim: z-range buckets bound BOTH dimensions, not just the sort key.
  */
class LayoutSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session

  test("morton interleave matches hand-computed bit patterns") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // domain [0,3] with bits=2: scaled values == raw values
    val df = Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 3L), (2L, 1L))
      .toDF("a", "b")
    val z = Layout.withZValue(df, "a", "b", bits = 2)
      .select(col("a"), col("b"), col("z")).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    assert(z((0L, 0L)) == 0L)   // 00 interleave 00
    assert(z((1L, 0L)) == 1L)   // a bit 0 -> position 0
    assert(z((0L, 1L)) == 2L)   // b bit 0 -> position 1
    assert(z((3L, 3L)) == 15L)  // 11 interleave 11 = 1111
    assert(z((2L, 1L)) == 6L)   // a=10 -> 100 at even, b=01 -> 010 at odd
  }

  test("z-range buckets bound both dimensions (the data-skipping property)") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // a 64x64 grid of points: every (a, b) combination once
    val grid = (for (a <- 0L until 64L; b <- 0L until 64L) yield (a, b)).toDF("a", "b")
    val census = Layout.zorderCensus(grid, "a", "b", bits = 6, buckets = 4)
      .orderBy(col("bucket")).collect()
    assert(census.map(_.getLong(1)).sum == 64L * 64L, "census must partition all rows")
    // each quarter of z-space is one quadrant-row of the grid: b (the high
    // interleaved bit side) is tightly bounded inside each bucket
    census.foreach { r =>
      val bSpan = r.getLong(5) - r.getLong(4)
      assert(bSpan <= 31L,
        s"bucket ${r.getInt(0)}: b spans $bSpan — z-ranges must bound the second dimension")
    }
    // a plain sort by `a` would give every bucket the full b span (63)
  }

  test("hilbert index is a bijection on the full 16x16 grid and every step is adjacent") {
    import spark.implicits._
    import org.apache.spark.sql.functions.expr
    val grid = (for (x <- 0 until 16; y <- 0 until 16) yield (x.toLong, y.toLong))
      .toDF("x", "y")
    val d = grid.withColumn("h", expr(graft.ops.Layout.hilbertExpr("x", "y", 4)))
      .collect().map(r => (r.getLong(2), (r.getLong(0), r.getLong(1))))
    // bijection: 256 distinct indices covering [0, 256)
    assert(d.map(_._1).distinct.length == 256, "hilbert index must be a bijection")
    assert(d.map(_._1).min == 0L && d.map(_._1).max == 255L, "range must be [0,256)")
    // the Hilbert property Morton lacks: consecutive d are GRID-ADJACENT
    val byD = d.sortBy(_._1).map(_._2)
    byD.sliding(2).foreach { case Array((x1, y1), (x2, y2)) =>
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1,
        s"steps d must be unit moves: ($x1,$y1) -> ($x2,$y2)")
    }
  }

  test("hilbert buckets bound both dimensions at least as tightly as morton on the grid") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val grid = (for (x <- 0 until 64; y <- 0 until 64) yield (x.toLong, y.toLong))
      .toDF("a", "b")
    def totalSemiPerimeter(census: Array[org.apache.spark.sql.Row]): Long =
      census.map(r => (r.getLong(3) - r.getLong(2)) + (r.getLong(5) - r.getLong(4))).sum
    val hz = graft.ops.Layout.hilbertCensus(grid, "a", "b", bits = 6, buckets = 16)
      .orderBy(col("bucket")).collect()
    val mz = graft.ops.Layout.zorderCensus(grid, "a", "b", bits = 6, buckets = 16)
      .orderBy(col("bucket")).collect()
    assert(hz.map(_.getLong(1)).sum == 64L * 64L, "hilbert census must partition all rows")
    assert(totalSemiPerimeter(hz) <= totalSemiPerimeter(mz),
      s"hilbert boxes (${totalSemiPerimeter(hz)}) must not be looser than morton's (${totalSemiPerimeter(mz)})")
  }
}
