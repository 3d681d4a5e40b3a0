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
}
