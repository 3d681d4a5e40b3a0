package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native Catalyst expression: MinHash signature of a string array.
  *
  * For each of `numHashes` affine permutations over the 2^31−1
  * Mersenne field, the minimum of (aᵢ·h(s) + bᵢ) mod p across the
  * input strings, h = FNV-1a 64 over raw UTF-8 bytes reduced into the
  * field. Empty/all-null arrays yield the sentinel signature (p at
  * every position).
  *
  * This replaces a Scala UDF on the near-dup hot path: `doGenCode`
  * keeps the row inside whole-stage codegen and hashes the unsafe
  * UTF8String bytes directly — no per-row Seq[String] materialization.
  * Parameters (a, b) are derived deterministically from `seed` once per
  * executor (lazy, thread-safe) rather than shipped per row.
  */
case class MinHashSigExpr(child: Expression, numHashes: Int, seed: Long)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig requires array<string>, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  @transient private lazy val params = MinHashSigExpr.params(numHashes, seed)

  override def nullSafeEval(input: Any): Any =
    MinHashSigExpr.compute(input.asInstanceOf[ArrayData], params._1, params._2)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val pRef = ctx.addReferenceObj("mhparams", params,
      "scala.Tuple2<long[], long[]>")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.MinHashSigExpr.compute($c, (long[])$pRef._1(), (long[])$pRef._2())")
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSigExpr =
    copy(child = newChild)
}

object MinHashSigExpr {

  val Prime = 2147483647L // 2^31 − 1: a·h + b < 2^62, ANSI-safe

  def params(numHashes: Int, seed: Long): (Array[Long], Array[Long]) = {
    val rnd = new scala.util.Random(seed)
    def gen() = rnd.nextInt(Int.MaxValue - 1).toLong + 1
    (Array.fill(numHashes)(gen()), Array.fill(numHashes)(gen()))
  }

  /** Interpreted + codegen shared kernel. */
  def compute(arr: ArrayData, as: Array[Long], bs: Array[Long]): ArrayData = {
    val n = as.length
    val sig = new Array[Long](n)
    java.util.Arrays.fill(sig, Prime)
    val m = arr.numElements()
    var i = 0
    while (i < m) {
      if (!arr.isNullAt(i)) {
        val bytes = arr.getUTF8String(i).getBytes
        var h = 0xcbf29ce484222325L
        var j = 0
        while (j < bytes.length) {
          h ^= (bytes(j) & 0xffL)
          h *= 0x100000001b3L
          j += 1
        }
        var hp = h % Prime
        if (hp < 0) hp += Prime
        var k = 0
        while (k < n) {
          val v = (as(k) * hp + bs(k)) % Prime
          if (v < sig(k)) sig(k) = v
          k += 1
        }
      }
      i += 1
    }
    new GenericArrayData(sig)
  }
}
