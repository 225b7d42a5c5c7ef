package graft.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Codegen'd quantized-vector kernels.
  *
  * The embedding operators' hot loops — hyperplane banding, IVF N×K
  * scoring, candidate rescoring — were `aggregate(zip_with(...))`
  * higher-order expressions. Spark evaluates lambda bodies INTERPRETED
  * (an expression-tree walk per element), which made each 64-dim dot cost
  * microseconds; these expressions run the same integer arithmetic as one
  * static tight loop inside whole-stage codegen. All kernels are exact
  * BIGINT sums over already-quantized vectors, so swapping them in cannot
  * perturb a single output bit (unlike float math, integer addition is
  * order-independent) — the DuckDB oracle spellings are untouched.
  *
  * [[VecOps.hyperplaneVec]] is the ONE definition of the deterministic
  * hyperplane family (graft.llm.Embed delegates here): murmur-mixed
  * entries in [-3, 3], materialized once per JVM as a static matrix the
  * generated code indexes directly.
  */
object VecOps {

  /** Deterministic integer hyperplane j (see the round-3 note in
    * graft.llm.Embed: a modular formula collapsed to 7 planes; the
    * murmur-style mix gives genuinely independent ones).
    */
  def hyperplaneVec(j: Int, dim: Int): IndexedSeq[Long] =
    (0 until dim).map { i =>
      var x = i.toLong * 2654435761L + (j + 1).toLong * 0x9E3779B97F4A7C15L
      x ^= (x >>> 33); x *= 0xFF51AFD7ED558CCDL; x ^= (x >>> 33)
      java.lang.Math.floorMod(x, 7L) - 3
    }

  /** Static plane matrix for the codegen path (64-dim, up to 64 planes —
    * covers every current caller; generated lazily once per JVM).
    */
  val Dim = 64
  private val MaxPlanes = 64
  private lazy val planes: Array[Array[Long]] =
    Array.tabulate(MaxPlanes)(j => hyperplaneVec(j, Dim).toArray)

  def normSq(v: ArrayData): Long = {
    val n = v.numElements()
    var acc = 0L
    var i = 0
    while (i < n) { val x = v.getLong(i); acc += x * x; i += 1 }
    acc
  }

  def dot(a: ArrayData, b: ArrayData): Long = {
    val n = a.numElements()
    // ragged inputs mean a malformed quantized vector; a prefix dot would
    // score it plausibly instead of surfacing the corruption
    if (n != b.numElements())
      throw new IllegalArgumentException(
        s"vec_dot: vector lengths differ (${n} vs ${b.numElements()})")
    var acc = 0L
    var i = 0
    while (i < n) { acc += a.getLong(i) * b.getLong(i); i += 1 }
    acc
  }

  /** All `numPlanes` hyperplane dots of one vector in a single traversal
    * of the static matrix — the banding path calls this once per vector
    * instead of `numPlanes` lambda folds.
    */
  def hyperplaneDots(v: ArrayData, numPlanes: Int): ArrayData = {
    val n = v.numElements()
    if (n != Dim)
      throw new IllegalArgumentException(
        s"hyperplane_dots: expected a $Dim-dim quantized vector, got $n elements")
    val out = new Array[Any](numPlanes)
    var j = 0
    while (j < numPlanes) {
      val p = planes(j)
      var acc = 0L
      var i = 0
      while (i < n) { acc += p(i) * v.getLong(i); i += 1 }
      out(j) = acc
      j += 1
    }
    new GenericArrayData(out)
  }

  private[expr] def checkLongArray(dt: DataType, fn: String): TypeCheckResult =
    dt match {
      case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$fn expects array<bigint> (a quantized vector), got ${other.sql}")
    }
}

/** `vec_normsq(qv)` ≡ `aggregate(transform(qv, x -> x*x), 0L, +)`. */
case class VecNormSq(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    VecOps.checkLongArray(child.dataType, prettyName)
  override def dataType: DataType = LongType
  override protected def nullSafeEval(input: Any): Any =
    VecOps.normSq(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.VecOps.normSq($c)")
  override def prettyName: String = "vec_normsq"
  override protected def withNewChildInternal(newChild: Expression): VecNormSq =
    copy(child = newChild)
}

/** `vec_dot(a, b)` ≡ `aggregate(zip_with(a, b, *), 0L, +)`. */
case class VecDot(left: Expression, right: Expression) extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = {
    val l = VecOps.checkLongArray(left.dataType, prettyName)
    if (l != TypeCheckResult.TypeCheckSuccess) l
    else VecOps.checkLongArray(right.dataType, prettyName)
  }
  override def dataType: DataType = LongType
  override protected def nullSafeEval(a: Any, b: Any): Any =
    VecOps.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.expr.VecOps.dot($a, $b)")
  override def prettyName: String = "vec_dot"
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecDot =
    copy(left = newLeft, right = newRight)
}

/** `hyperplane_dots(qv, n)` → array<bigint> of the first n hyperplane
  * dots (static deterministic matrix, one traversal).
  */
case class HyperplaneDots(child: Expression, numPlanes: Int)
    extends UnaryExpression {
  require(numPlanes > 0 && numPlanes <= 64, "1..64 planes are materialized")
  override def checkInputDataTypes(): TypeCheckResult =
    VecOps.checkLongArray(child.dataType, prettyName)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def nullSafeEval(input: Any): Any =
    VecOps.hyperplaneDots(input.asInstanceOf[ArrayData], numPlanes)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.VecOps.hyperplaneDots($c, $numPlanes)")
  override def prettyName: String = "hyperplane_dots"
  override protected def withNewChildInternal(newChild: Expression): HyperplaneDots =
    copy(child = newChild)
}
