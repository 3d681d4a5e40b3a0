package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
import graft.functions.{DotProductExpr, MinHashSigExpr, SimHash64Expr, SortedIntersectCountExpr, TokenSetExpr, WinnowExpr}

/** SparkSessionExtensions entry point: registers the engine's native
  * expressions for SQL use. Activate with
  * `.config("spark.sql.extensions", "graft.GraftExtensions")` or
  * `SparkSession.builder.withExtensions(new GraftExtensions)`;
  * `SELECT simhash64(tokens) ...` then resolves like a builtin. The
  * DataFrame API (graft.functions.simhash64) works without
  * registration. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.builders.foreach { case (name, cls, b) =>
      ext.injectFunction((
        FunctionIdentifier(name), new ExpressionInfo(cls, name), b))
    }
}

object GraftExtensions {

  private type Expr = org.apache.spark.sql.catalyst.expressions.Expression

  private val builders: Seq[(String, String, Seq[Expr] => Expr)] = Seq(
    ("simhash64", classOf[SimHash64Expr].getName,
      exprs => SimHash64Expr(exprs.head)),
    ("minhash_sig", classOf[MinHashSigExpr].getName,
      // optional literal args: numHashes, seed
      exprs => MinHashSigExpr(exprs.head,
        if (exprs.length > 1) exprs(1).eval().asInstanceOf[Number].intValue() else 128,
        if (exprs.length > 2) exprs(2).eval().asInstanceOf[Number].longValue() else 42L)),
    ("dot_product", classOf[DotProductExpr].getName,
      exprs => DotProductExpr(exprs.head, exprs(1))),
    ("token_set", classOf[TokenSetExpr].getName,
      exprs => TokenSetExpr(exprs.head)),
    ("sorted_intersect_count", classOf[SortedIntersectCountExpr].getName,
      exprs => SortedIntersectCountExpr(exprs.head, exprs(1))),
    ("winnow", classOf[WinnowExpr].getName,
      // optional literal args: k, w
      exprs => WinnowExpr(exprs.head,
        if (exprs.length > 1) exprs(1).eval().asInstanceOf[Number].intValue() else 5,
        if (exprs.length > 2) exprs(2).eval().asInstanceOf[Number].intValue() else 4)))

  /** Register the same functions on an already-running session (the
    * extensions mechanism only fires at session construction). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    builders.foreach { case (name, _, b) =>
      org.apache.spark.sql.GraftColumnBridge.registerTempFunction(spark, name, b)
    }
}
