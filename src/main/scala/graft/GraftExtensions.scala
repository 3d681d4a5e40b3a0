package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
import graft.functions.{CharNgramsExpr, DotProductExpr, HashFeaturesExpr, L2SqExpr, MinHashSigExpr, SimHash64Expr, SortedIntersectCountExpr, TokenSetExpr, ValueCountsExpr, WinnowExpr, WordNgramsExpr}

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

  /** Arity guard: a clean AnalysisException-style message instead of an
    * IndexOutOfBounds planner crash on `SELECT dot_product(a)`. */
  private def arity(name: String, exprs: Seq[Expr], min: Int, max: Int): Unit =
    if (exprs.length < min || exprs.length > max)
      throw new IllegalArgumentException(
        s"$name expects $min${if (max != min) s"..$max" else ""} arguments, " +
          s"got ${exprs.length}")

  /** Optional trailing literal-number argument: must be a foldable
    * non-null numeric literal (`minhash_sig(toks, 64)`), not a column. */
  private def litNum(name: String, exprs: Seq[Expr], i: Int, default: Long): Long =
    if (exprs.length <= i) default
    else {
      val e = exprs(i)
      if (!e.foldable) throw new IllegalArgumentException(
        s"$name: argument ${i + 1} must be a literal number, got ${e.sql}")
      e.eval() match {
        case n: Number => n.longValue()
        case other => throw new IllegalArgumentException(
          s"$name: argument ${i + 1} must be a non-null number, got $other")
      }
    }

  private val builders: Seq[(String, String, Seq[Expr] => Expr)] = Seq(
    ("simhash64", classOf[SimHash64Expr].getName,
      exprs => { arity("simhash64", exprs, 1, 1); SimHash64Expr(exprs.head) }),
    ("minhash_sig", classOf[MinHashSigExpr].getName,
      // optional literal args: numHashes, seed
      exprs => {
        arity("minhash_sig", exprs, 1, 3)
        MinHashSigExpr(exprs.head,
          litNum("minhash_sig", exprs, 1, 128L).toInt,
          litNum("minhash_sig", exprs, 2, 42L))
      }),
    ("dot_product", classOf[DotProductExpr].getName,
      exprs => { arity("dot_product", exprs, 2, 2)
        DotProductExpr(exprs.head, exprs(1)) }),
    ("l2_sq", classOf[L2SqExpr].getName,
      exprs => { arity("l2_sq", exprs, 2, 2)
        L2SqExpr(exprs.head, exprs(1)) }),
    ("token_set", classOf[TokenSetExpr].getName,
      exprs => { arity("token_set", exprs, 1, 1); TokenSetExpr(exprs.head) }),
    ("sorted_intersect_count", classOf[SortedIntersectCountExpr].getName,
      exprs => { arity("sorted_intersect_count", exprs, 2, 2)
        SortedIntersectCountExpr(exprs.head, exprs(1)) }),
    ("char_ngrams", classOf[CharNgramsExpr].getName,
      exprs => {
        arity("char_ngrams", exprs, 2, 2)
        CharNgramsExpr(exprs.head, litNum("char_ngrams", exprs, 1, 3L).toInt)
      }),
    ("word_ngrams", classOf[WordNgramsExpr].getName,
      // optional literal args: n, distinct (0/1)
      exprs => {
        arity("word_ngrams", exprs, 2, 3)
        WordNgramsExpr(exprs.head,
          litNum("word_ngrams", exprs, 1, 3L).toInt,
          litNum("word_ngrams", exprs, 2, 0L) != 0L)
      }),
    ("hash_features", classOf[HashFeaturesExpr].getName,
      exprs => {
        arity("hash_features", exprs, 2, 2)
        HashFeaturesExpr(exprs.head,
          litNum("hash_features", exprs, 1, 16L).toInt)
      }),
    ("value_counts", classOf[ValueCountsExpr].getName,
      exprs => { arity("value_counts", exprs, 1, 1)
        ValueCountsExpr(exprs.head) }),
    ("winnow", classOf[WinnowExpr].getName,
      // optional literal args: k, w
      exprs => {
        arity("winnow", exprs, 1, 3)
        WinnowExpr(exprs.head,
          litNum("winnow", exprs, 1, 5L).toInt,
          litNum("winnow", exprs, 2, 4L).toInt)
      }))

  /** Register the same functions on an already-running session (the
    * extensions mechanism only fires at session construction). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    builders.foreach { case (name, _, b) =>
      org.apache.spark.sql.GraftColumnBridge.registerTempFunction(spark, name, b)
    }
}
