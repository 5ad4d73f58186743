package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/**
 * Native Catalyst expressions for vector similarity.
 *
 * Semantics follow the reference vector engine
 * (/root/reference/vector_db/similarity.py:27-144): cosine in [-1,1]
 * with zero-norm -> 0.0, dot product, euclidean similarity
 * = 1/(1+L2), manhattan similarity = 1/(1+L1).
 *
 * Execution is Spark-first: each metric is a single codegen'd fold
 * over the two arrays, computed in double precision in sequential
 * element order so results are reproducible across engines
 * (SURVEY.md paragraph 5). These stay inside whole-stage codegen — no UDF
 * serialization, no boxing per element.
 */
trait VectorBinaryFold extends BinaryExpression {

  override def dataType: DataType = DoubleType

  @transient protected lazy val leftIsFloat: Boolean =
    left.dataType.asInstanceOf[ArrayType].elementType == FloatType
  @transient protected lazy val rightIsFloat: Boolean =
    right.dataType.asInstanceOf[ArrayType].elementType == FloatType
}

/** Sum(a_i * b_i). */
case class VectorDot(left: Expression, right: Expression) extends VectorBinaryFold {
  override def prettyName: String = "graft_dot"

  override protected def nullSafeEval(l: Any, r: Any): Any =
    VectorOps.dot(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData],
      leftIsFloat, rightIsFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.VectorOps.dot($a, $b, $leftIsFloat, $rightIsFloat);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Cosine similarity; 0.0 when either vector has zero norm. */
case class VectorCosine(left: Expression, right: Expression) extends VectorBinaryFold {
  override def prettyName: String = "graft_cosine"

  override protected def nullSafeEval(l: Any, r: Any): Any =
    VectorOps.cosine(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData],
      leftIsFloat, rightIsFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.VectorOps.cosine($a, $b, $leftIsFloat, $rightIsFloat);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Euclidean (L2) distance. */
case class VectorL2Distance(left: Expression, right: Expression) extends VectorBinaryFold {
  override def prettyName: String = "graft_l2_distance"

  override protected def nullSafeEval(l: Any, r: Any): Any =
    VectorOps.l2(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData],
      leftIsFloat, rightIsFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.VectorOps.l2($a, $b, $leftIsFloat, $rightIsFloat);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Manhattan (L1) distance. */
case class VectorL1Distance(left: Expression, right: Expression) extends VectorBinaryFold {
  override def prettyName: String = "graft_l1_distance"

  override protected def nullSafeEval(l: Any, r: Any): Any =
    VectorOps.l1(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData],
      leftIsFloat, rightIsFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.VectorOps.l1($a, $b, $leftIsFloat, $rightIsFloat);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** L2 norm of a single vector. */
case class VectorNorm(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_norm"

  @transient private lazy val isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override protected def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val n = a.numElements()
    var acc = 0.0; var i = 0
    while (i < n) {
      val x = if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)
      acc += x * x; i += 1
    }
    math.sqrt(acc)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val acc = ctx.freshName("acc"); val x = ctx.freshName("x")
      val get = if (isFloat) s"(double)$a.getFloat($i)" else s"$a.getDouble($i)"
      s"""
         |int $n = $a.numElements();
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) { double $x = $get; $acc += $x * $x; }
         |${ev.value} = java.lang.Math.sqrt($acc);
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** L2-normalize a vector to unit length (zero vector passes through). */
case class VectorL2Normalize(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "graft_l2_normalize"

  @transient private lazy val isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override protected def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val n = a.numElements()
    val out = new Array[Double](n)
    var acc = 0.0; var i = 0
    while (i < n) {
      val x = if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)
      out(i) = x; acc += x * x; i += 1
    }
    val norm = math.sqrt(acc)
    if (norm > 0.0) { i = 0; while (i < n) { out(i) /= norm; i += 1 } }
    new GenericArrayData(out)
  }

  // Array construction dominates; an interpreted eval via static call keeps
  // the surrounding stage in codegen without duplicating the loop logic.
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      s"${ev.value} = graft.functions.VectorOps.l2Normalize($a, $isFloat);"
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Static helpers callable from generated code. */
object VectorOps {

  /** Bulk-copy an ArrayData vector to double[] (accessor calls in the
    * fold loops are virtual and dominate at millions of rows/s). */
  @inline def toDoubles(a: ArrayData, isFloat: Boolean): Array[Double] = {
    if (isFloat) {
      val f = a.toFloatArray()
      val out = new Array[Double](f.length)
      var i = 0
      while (i < f.length) { out(i) = f(i); i += 1 }
      out
    } else a.toDoubleArray()
  }

  def dot(l: ArrayData, r: ArrayData, lf: Boolean, rf: Boolean): Double =
    dotArr(toDoubles(l, lf), toDoubles(r, rf))

  // ---- raw-array kernels (shared by expressions and fused operators) ----

  /** Shape check shared by every metric — the reference raises on
    * mismatched dimensions (vector_db/similarity.py) rather than
    * silently truncating, and so do we. */
  @inline private def checkDims(a: Array[Double], b: Array[Double]): Int = {
    if (a.length != b.length)
      throw new IllegalArgumentException(
        s"vector dimension mismatch: ${a.length} vs ${b.length}")
    a.length
  }

  def dotArr(a: Array[Double], b: Array[Double]): Double = {
    val n = checkDims(a, b)
    var acc = 0.0; var i = 0
    while (i < n) { acc += a(i) * b(i); i += 1 }
    acc
  }

  def cosineArr(a: Array[Double], b: Array[Double]): Double = {
    val n = checkDims(a, b)
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < n) {
      val x = a(i); val y = b(i)
      dot += x * y; na += x * x; nb += y * y; i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0
    else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  def l2Arr(a: Array[Double], b: Array[Double]): Double = {
    val n = checkDims(a, b)
    var acc = 0.0; var i = 0
    while (i < n) { val d = a(i) - b(i); acc += d * d; i += 1 }
    math.sqrt(acc)
  }

  def l1Arr(a: Array[Double], b: Array[Double]): Double = {
    val n = checkDims(a, b)
    var acc = 0.0; var i = 0
    while (i < n) { acc += math.abs(a(i) - b(i)); i += 1 }
    acc
  }

  /** Spark-compatible round-half-up to `scale` decimals (matches the
    * codegen of catalyst Round on DoubleType: BigDecimal.valueOf). */
  def roundTo(x: Double, scale: Int): Double =
    java.math.BigDecimal.valueOf(x)
      .setScale(scale, java.math.RoundingMode.HALF_UP).doubleValue()

  def cosine(l: ArrayData, r: ArrayData, lf: Boolean, rf: Boolean): Double =
    cosineArr(toDoubles(l, lf), toDoubles(r, rf))

  def l2(l: ArrayData, r: ArrayData, lf: Boolean, rf: Boolean): Double =
    l2Arr(toDoubles(l, lf), toDoubles(r, rf))

  def l1(l: ArrayData, r: ArrayData, lf: Boolean, rf: Boolean): Double =
    l1Arr(toDoubles(l, lf), toDoubles(r, rf))
  def l2Normalize(a: ArrayData, isFloat: Boolean): ArrayData = {
    val n = a.numElements()
    val out = new Array[Double](n)
    var acc = 0.0; var i = 0
    while (i < n) {
      val x = if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)
      out(i) = x; acc += x * x; i += 1
    }
    val norm = math.sqrt(acc)
    if (norm > 0.0) { i = 0; while (i < n) { out(i) /= norm; i += 1 } }
    new GenericArrayData(out)
  }
}
