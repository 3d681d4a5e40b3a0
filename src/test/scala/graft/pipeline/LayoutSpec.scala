package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  private def refZ(x: Long, y: Long, bits: Int): Long =
    (0 until bits).map { i =>
      (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))
    }.sum

  test("zValue matches the reference interleave on the full 4-bit grid") {
    val grid = for (x <- 0L until 16L; y <- 0L until 16L) yield (x, y)
    val got = grid.toDF("x", "y")
      .select(col("x"), col("y"), Layout.zValue(col("x"), col("y"), 4).as("z"))
      .as[(Long, Long, Long)].collect()
    got.foreach { case (x, y, z) =>
      assert(z == refZ(x, y, 4), s"($x,$y): got $z want ${refZ(x, y, 4)}")
    }
    // a bijection on the grid: 256 distinct z-values covering [0, 256)
    assert(got.map(_._3).sorted.toSeq == (0L until 256L))
  }

  test("zorderBy: partitions tile BOTH dimensions (tight x AND y extents)") {
    val grid = for (x <- 0L until 64L; y <- 0L until 64L) yield (x, y)
    val parts = Layout.zorderBy(grid.toDF("x", "y"), "x", "y", 6, 16)
      .select(spark_partition_id().as("p"), col("x"), col("y"))
      .as[(Int, Long, Long)].collect()
      .groupBy(_._1).values.toSeq
    assert(parts.length == 16, s"got ${parts.length} partitions")
    // each partition holds ~256 consecutive z values = about one
    // 16x16 Morton tile (plus sampling slop from repartitionByRange's
    // boundary estimation); a 1-D sort on x would leave y at the full
    // 64-cell width in EVERY partition
    val extents = parts.map { rows =>
      val xs = rows.map(_._2); val ys = rows.map(_._3)
      (xs.max - xs.min, ys.max - ys.min)
    }
    extents.foreach { case (ex, ey) =>
      assert(ex < 64 && ey < 64, s"full-width partition: $ex x $ey")
    }
    val meanX = extents.map(_._1).sum.toDouble / extents.length
    val meanY = extents.map(_._2).sum.toDouble / extents.length
    assert(meanX <= 36 && meanY <= 36,
      s"tiles not tight: mean extents $meanX x $meanY")
  }

  test("skipStats: planner semantics — a file is read iff BOTH ranges hit") {
    // 4 files on a 0..15 grid: file 0 covers the predicate square,
    // file 1 misses on x only, file 2 misses on y only, file 3 both.
    // Predicate x∈[0,3] y∈[0,3] → only file 0 read, 1 row matched.
    val rows = Seq(
      (0L, 1L, 1L), (0L, 5L, 2L),   // file 0: x 1-5, y 1-2 → hit, 1 match
      (1L, 9L, 1L),                 // file 1: x misses
      (2L, 1L, 9L),                 // file 2: y misses
      (3L, 9L, 9L))                 // file 3: both miss
      .toDF("f", "x", "y")
    val got = Layout.skipStats(rows, "f", "x", "y", 0, 3, 0, 3)
      .as[(Long, Long, Long, Long)].collect().head
    assert(got == ((4L, 1L, 2L, 1L)), s"got $got")
  }
}
