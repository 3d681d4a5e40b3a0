package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, BinaryType}

/** Native Catalyst expression: deterministic L2-normalized hash
  * pseudo-embedding of a binary payload (the model-free stand-in for a
  * learned encoder — see Multimodal.hashFeatures).
  *
  * Replaces a composed-builtins formulation whose `xxhash64(bin, i)`
  * per component re-scanned the FULL payload `dim` times, and whose
  * norm subtree inlined the component array again (O(payload·dim²)
  * work per row once Catalyst substituted the shared Columns). Here
  * the payload is scanned ONCE (FNV-1a 64); each component is a cheap
  * splitmix64 finalization of (seed ⊕ i·φ) — O(payload + dim), inside
  * whole-stage codegen.
  */
case class HashFeaturesExpr(child: Expression, dim: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType if dim > 0 => TypeCheckResult.TypeCheckSuccess
    case BinaryType => TypeCheckResult.TypeCheckFailure(
      s"hash_features requires dim > 0, got $dim")
    case other => TypeCheckResult.TypeCheckFailure(
      s"hash_features requires binary, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "hash_features"

  override def nullSafeEval(input: Any): Any =
    HashFeaturesExpr.compute(input.asInstanceOf[Array[Byte]], dim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.HashFeaturesExpr.compute($c, $dim)")

  override protected def withNewChildInternal(newChild: Expression): HashFeaturesExpr =
    copy(child = newChild)
}

object HashFeaturesExpr {

  /** One FNV-1a pass over the payload, then `dim` splitmix64-mixed
    * components in (-1, 1], L2-normalized (all-zero stays all-zero).
    * Called from both interpreted eval and generated code. */
  def compute(bytes: Array[Byte], dim: Int): ArrayData = {
    var h = 0xcbf29ce484222325L
    var j = 0
    while (j < bytes.length) {
      h ^= (bytes(j) & 0xffL)
      h *= 0x100000001b3L
      j += 1
    }
    val out = new Array[Double](dim)
    var norm2 = 0.0
    var i = 0
    while (i < dim) {
      // splitmix64 finalizer over seed ⊕ i·golden-gamma
      var z = h ^ (i * 0x9e3779b97f4a7c15L)
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z = z ^ (z >>> 31)
      val c = (java.lang.Math.floorMod(z, 2000001L) - 1000000L) / 1000000.0
      out(i) = c
      norm2 += c * c
      i += 1
    }
    if (norm2 > 0) {
      val inv = 1.0 / math.sqrt(norm2)
      var k = 0
      while (k < dim) { out(k) *= inv; k += 1 }
    }
    new GenericArrayData(out)
  }
}
