package graft.pipeline

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector column math over `ArrayType(FloatType/DoubleType)`
  * embedding columns, built entirely from codegen-friendly higher-order
  * functions (`zip_with`/`aggregate`) — no UDFs, no driver round-trips.
  * Products/sums are computed in double (floats are cast exactly), so
  * results are bit-stable regardless of the stored element type.
  */
object Vec {

  private def d(a: Column): Column = transform(a, _.cast("double"))

  /** Left-to-right dot product — deterministic summation order. Backed
    * by the native codegen'd [[graft.functions.DotProductExpr]] (the
    * interpreted `aggregate(zip_with(...))` fold it replaces was the
    * bench bottleneck on every pairwise-similarity path). */
  def dot(a: Column, b: Column): Column =
    graft.functions.dotProduct(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = {
    val den = norm(a) * norm(b)
    when(den > 0, dot(a, b) / den).otherwise(lit(0.0))
  }

  def l2Distance(a: Column, b: Column): Column =
    sqrt(aggregate(
      zip_with(d(a), d(b), (x, y) => (x - y) * (x - y)), lit(0.0), _ + _))

  /** Signed-projection bit against a fixed (driver-side) hyperplane:
    * 1 if v · h > 0 else 0. Used by the random-hyperplane LSH. */
  def signBit(v: Column, h: Array[Double]): Column =
    when(dot(v, lit(h)) > 0, 1L).otherwise(0L)
}
