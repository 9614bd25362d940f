package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types._

/** Codegen'd vector kernels for the embedding-similarity operators
  * (guide §1.2 "per-task work" / §4 "prefer built-ins over per-row
  * interpretation"): the previous forms — chains of
  * `aggregate(zip_with(transform(...)))` higher-order functions — are
  * CodegenFallback expressions in Spark, i.e. every array element walks an
  * interpreted expression tree per row. On the ANN candidate joins that
  * interpretation was the dominant query cost (measured: q_ann_ivf_top1
  * 14.9 s → the integer-dot scoring of ~5·10^5 candidate rows × 64 dims;
  * see OPTIMIZATION_r06.md). Each expression here is a tight primitive
  * loop invoked from whole-stage codegen, bit-for-bit identical to the
  * higher-order form it replaces (parity-tested in
  * VectorExpressionsSpec):
  *
  *  - null/shape semantics mirror the HOF chain exactly: a length
  *    mismatch or a null element yields a null product inside `zip_with`,
  *    which nulls the whole `aggregate` — so these return null then too;
  *  - float inputs widen to double exactly like the explicit
  *    `transform(_.cast("double"))` the old code applied;
  *  - fold order is the same left-to-right sequential accumulation, so
  *    float rounding paths (and hence the SQL-oracle replays) are
  *    unchanged.
  */
private[functions] object VectorExpressions {
  /** Accepts array<float> or array<double>; widening float→double is
    * exact, so both run the same double arithmetic. */
  def isFloatingArray(t: DataType): Boolean = t match {
    case ArrayType(FloatType | DoubleType, _) => true
    case _ => false
  }

  def isLongArray(t: DataType): Boolean = t match {
    case ArrayType(LongType, _) => true
    case _ => false
  }

  def getDouble(arr: ArrayData, isFloat: Boolean, i: Int): Double =
    if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)

  def anyNull(arr: ArrayData): Boolean = {
    val n = arr.numElements()
    var i = 0
    while (i < n) { if (arr.isNullAt(i)) return true; i += 1 }
    false
  }
}

/** Σ a_i·b_i over two float/double arrays (double result) — the codegen
  * twin of `aggregate(zip_with(a, b, _*_), 0.0, _+_)`. */
case class DoubleDot(left: Expression, right: Expression) extends BinaryExpression {
  import VectorExpressions._

  override def checkInputDataTypes(): TypeCheckResult =
    if (isFloatingArray(left.dataType) && isFloatingArray(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects ARRAY<FLOAT|DOUBLE> x2, got ${left.dataType.sql}, ${right.dataType.sql}")
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "double_dot"

  @transient private lazy val leftFloat = left.dataType match {
    case ArrayType(FloatType, _) => true; case _ => false
  }
  @transient private lazy val rightFloat = right.dataType match {
    case ArrayType(FloatType, _) => true; case _ => false
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    evalOrNull(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  def evalOrNull(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    // zip_with pads a length mismatch with nulls -> null product -> null sum
    if (n != b.numElements() || anyNull(a) || anyNull(b)) return null
    var d = 0.0
    var i = 0
    while (i < n) { d += getDouble(a, leftFloat, i) * getDouble(b, rightFloat, i); i += 1 }
    java.lang.Double.valueOf(d)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("doubleDot", this, classOf[DoubleDot].getName)
    val r = ctx.freshName("dotRes")
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      |java.lang.Double $r = $ref.evalOrNull($a, $b);
      |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r.doubleValue(); }
      |""".stripMargin)
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): DoubleDot =
    copy(left = newLeft, right = newRight)
}

/** Σ a_i·b_i over two long arrays (long result) — the codegen twin of
  * `aggregate(zip_with(a, b, _*_), 0L, _+_)`. Products stay within long
  * range by the micro-unit quantization envelope (≤1e12 per component). */
case class LongDot(left: Expression, right: Expression) extends BinaryExpression {
  import VectorExpressions._

  override def checkInputDataTypes(): TypeCheckResult =
    if (isLongArray(left.dataType) && isLongArray(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects ARRAY<BIGINT> x2, got ${left.dataType.sql}, ${right.dataType.sql}")
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "long_dot"

  override def nullSafeEval(a: Any, b: Any): Any =
    evalOrNull(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  def evalOrNull(a: ArrayData, b: ArrayData): java.lang.Long = {
    val n = a.numElements()
    if (n != b.numElements() || anyNull(a) || anyNull(b)) return null
    var d = 0L
    var i = 0
    while (i < n) { d += a.getLong(i) * b.getLong(i); i += 1 }
    java.lang.Long.valueOf(d)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("longDot", this, classOf[LongDot].getName)
    val r = ctx.freshName("ldotRes")
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      |java.lang.Long $r = $ref.evalOrNull($a, $b);
      |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r.longValue(); }
      |""".stripMargin)
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): LongDot =
    copy(left = newLeft, right = newRight)
}

/** Micro-unit quantization floor(x·10^6 + 0.5) per component (long array)
  * — codegen twin of `transform(emb, x => floor(x*1000000.0 + 0.5))`.
  * The identical IEEE expression replays bit-for-bit in SQL engines,
  * which is what keeps the ANN oracles exact. */
case class QuantizedVec(child: Expression) extends UnaryExpression {
  import VectorExpressions._

  override def checkInputDataTypes(): TypeCheckResult =
    if (isFloatingArray(child.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects ARRAY<FLOAT|DOUBLE>, got ${child.dataType.sql}")
  override def dataType: DataType = ArrayType(LongType,
    child.dataType.asInstanceOf[ArrayType].containsNull)
  override def prettyName: String = "quantized_vec"

  @transient private lazy val isFloat = child.dataType match {
    case ArrayType(FloatType, _) => true; case _ => false
  }

  override def nullSafeEval(input: Any): Any =
    evalNonNull(input.asInstanceOf[ArrayData])

  def evalNonNull(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    if (anyNull(arr)) {
      // preserve per-element nulls exactly like transform()
      val out = new Array[Any](n)
      var i = 0
      while (i < n) {
        if (!arr.isNullAt(i))
          out(i) = math.floor(getDouble(arr, isFloat, i) * 1000000.0 + 0.5).toLong
        i += 1
      }
      return new GenericArrayData(out)
    }
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      out(i) = math.floor(getDouble(arr, isFloat, i) * 1000000.0 + 0.5).toLong
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("quantVec", this, classOf[QuantizedVec].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.evalNonNull($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): QuantizedVec =
    copy(child = newChild)
}

/** Quantized unit vector floor(x/nrm·10^6 + 0.5) per component — codegen
  * twin of `transform(emb, x => floor(x / nrm * 1000000.0 + 0.5))` with a
  * per-row norm column. */
case class QuantizedUnitVec(left: Expression, right: Expression) extends BinaryExpression {
  import VectorExpressions._

  override def checkInputDataTypes(): TypeCheckResult =
    if (isFloatingArray(left.dataType) && right.dataType == DoubleType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (ARRAY<FLOAT|DOUBLE>, DOUBLE), got ${left.dataType.sql}, ${right.dataType.sql}")
  override def dataType: DataType = ArrayType(LongType,
    left.dataType.asInstanceOf[ArrayType].containsNull)
  override def prettyName: String = "quantized_unit_vec"

  @transient private lazy val isFloat = left.dataType match {
    case ArrayType(FloatType, _) => true; case _ => false
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    evalNonNull(a.asInstanceOf[ArrayData], b.asInstanceOf[Double])

  def evalNonNull(arr: ArrayData, nrm: Double): ArrayData = {
    val n = arr.numElements()
    if (anyNull(arr)) {
      val out = new Array[Any](n)
      var i = 0
      while (i < n) {
        if (!arr.isNullAt(i))
          out(i) = math.floor(getDouble(arr, isFloat, i) / nrm * 1000000.0 + 0.5).toLong
        i += 1
      }
      return new GenericArrayData(out)
    }
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      out(i) = math.floor(getDouble(arr, isFloat, i) / nrm * 1000000.0 + 0.5).toLong
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("quantUnit", this, classOf[QuantizedUnitVec].getName)
    nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = $ref.evalNonNull($a, $b);")
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): QuantizedUnitVec =
    copy(left = newLeft, right = newRight)
}

/** MinHash-estimated Jaccard: (# equal components) / size(a), double —
  * the codegen twin of
  * `aggregate(zip_with(a, b, (x,y) => when(x===y,1).otherwise(0)), 0, _+_)
  *    .cast("double") / size(a)`.
  * Mirrored edge semantics: zip_with pads a length mismatch with nulls
  * and `when(null === y, 1).otherwise(0)` counts those positions (and
  * null elements) as 0 — NOT as a null result; the divisor is always
  * size(a) (0/0 → NaN, exactly like the double division it replaces).
  * This runs once per candidate pair in LSH verification — the scoring
  * hot path of the flagship pipeline. */
case class MinhashEstJaccard(left: Expression, right: Expression) extends BinaryExpression {
  import VectorExpressions._

  override def checkInputDataTypes(): TypeCheckResult =
    if (isLongArray(left.dataType) && isLongArray(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects ARRAY<BIGINT> x2, got ${left.dataType.sql}, ${right.dataType.sql}")
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "minhash_est_jaccard"

  override def nullSafeEval(a: Any, b: Any): Any =
    evalNonNull(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  def evalNonNull(a: ArrayData, b: ArrayData): Double = {
    val na = a.numElements()
    val n = math.min(na, b.numElements())
    var eq = 0
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i) && !b.isNullAt(i) && a.getLong(i) == b.getLong(i)) eq += 1
      i += 1
    }
    eq.toDouble / na
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("estJaccard", this, classOf[MinhashEstJaccard].getName)
    nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = $ref.evalNonNull($a, $b);")
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): MinhashEstJaccard =
    copy(left = newLeft, right = newRight)
}

/** Random-hyperplane LSH bucket id (`numPlanes` sign bits packed) — the
  * codegen twin of Similarity's per-plane
  * `aggregate(zip_with(quantized, transform(sequence, hashSign), _*_))`
  * column stack. Arithmetic is the identical 31-bit-lane integer chain
  * (two multiply/xorshift rounds per component, parity sign, micro-unit
  * quantized components), so bucket ids stay bit-identically replayable
  * in SQL (the q_ann_lsh_top1 oracle).
  *
  * Null/shape semantics mirror the HOF stack: any null component nulls
  * every plane projection, and `when(proj >= 0, bit).otherwise(0)` turns
  * a null projection into an unset bit — so an any-null vector maps to
  * bucket 0. So does an empty vector: `sequence(0, size-1)` at size 0
  * yields [0, -1] (sequence counts DOWN when start > stop), zip_with pads
  * the empty side with nulls, and the null products null every
  * projection. (Unreachable from the operators — `prepared` filters
  * nrm > 0 — but parity is parity.) */
case class RhpBucket(child: Expression, numPlanes: Int, rep: Int)
    extends UnaryExpression {
  import VectorExpressions._
  require(numPlanes >= 1 && numPlanes <= 62, s"numPlanes in [1,62], got $numPlanes")

  override def checkInputDataTypes(): TypeCheckResult =
    if (isFloatingArray(child.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects ARRAY<FLOAT|DOUBLE>, got ${child.dataType.sql}")
  override def dataType: DataType = LongType
  override def prettyName: String = "rhp_bucket"

  @transient private lazy val isFloat = child.dataType match {
    case ArrayType(FloatType, _) => true; case _ => false
  }

  override def nullSafeEval(input: Any): Any =
    evalNonNull(input.asInstanceOf[ArrayData])

  def evalNonNull(arr: ArrayData): Long = {
    val n = arr.numElements()
    // null projections -> every bit's otherwise(0); see scaladoc for why
    // the empty vector lands here too
    if (n == 0 || anyNull(arr)) return 0L
    // quantize once; planes share the components
    val qv = new Array[Long](n)
    var i = 0
    while (i < n) {
      qv(i) = math.floor(getDouble(arr, isFloat, i) * 1000000.0 + 0.5).toLong
      i += 1
    }
    val mask = 0x7FFFFFFFL
    var bucket = 0L
    var p = 0
    while (p < numPlanes) {
      val base = rep.toLong * 1000003L + p.toLong * 8191L + 1L
      var proj = 0L
      i = 0
      while (i < n) {
        val h0 = (base + i.toLong * 127L) & mask
        val m1 = (h0 * 0x45d9f3bL) & mask
        val h1 = m1 ^ (m1 >> 16)
        val m2 = (h1 * 0x45d9f3bL) & mask
        val h2 = m2 ^ (m2 >> 16)
        proj += (if ((h2 & 1L) == 0L) qv(i) else -qv(i))
        i += 1
      }
      if (proj >= 0L) bucket |= (1L << p)
      p += 1
    }
    bucket
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("rhpBucket", this, classOf[RhpBucket].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.evalNonNull($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): RhpBucket =
    copy(child = newChild)
}
