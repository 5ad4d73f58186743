package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/**
 * Int8 scalar quantization for the high-throughput approximate scan
 * (SURVEY.md paragraph 8): float32 vectors compress 4x into
 * (scale, bytes); the approximate dot runs on byte arrays with one
 * float multiply at the end, and survivors re-rank exactly on the
 * float originals.
 */
object QuantOps {

  /** vec -> InternalRow(scale, int8 bytes); scale = max|x| / 127. */
  def quantize(vec: ArrayData, isFloat: Boolean): InternalRow = {
    val v = VectorOps.toDoubles(vec, isFloat)
    var maxAbs = 0.0
    var i = 0
    while (i < v.length) { val a = math.abs(v(i)); if (a > maxAbs) maxAbs = a; i += 1 }
    val scale = if (maxAbs > 0.0) maxAbs / 127.0 else 1.0
    val q = new Array[Byte](v.length)
    i = 0
    while (i < v.length) { q(i) = math.round(v(i) / scale).toByte; i += 1 }
    new GenericInternalRow(Array[Any](scale, q))
  }

  /** Approximate dot: sa * sb * sum(qa_i * qb_i) — integer inner loop.
    * Mismatched dimensions throw (reference semantics; no silent
    * truncation). */
  def dotQ(sa: Double, qa: Array[Byte], sb: Double, qb: Array[Byte]): Double = {
    if (qa.length != qb.length)
      throw new IllegalArgumentException(
        s"vector dimension mismatch: ${qa.length} vs ${qb.length}")
    val n = qa.length
    var acc = 0
    var i = 0
    while (i < n) { acc += qa(i) * qb(i); i += 1 }
    sa * sb * acc
  }
}

/**
 * 1-bit binary quantization — the extreme rung of the quantization
 * ladder (float32 -> int8 -> 1 bit): each dimension keeps only its
 * sign, packed 64 dims per long. A 64-dim embedding collapses to ONE
 * long (32x narrower than the float column, 8x narrower than int8),
 * and the phase-1 ranking metric is the Hamming distance — XOR +
 * popcount per word, the cheapest similarity kernel that exists. For
 * L2-normalized vectors sign agreement tracks angular closeness
 * (1-bit random-projection LSH with axis-aligned planes), so a
 * Hamming shortlist + exact re-rank preserves top-k quality while the
 * scan reads bits, not floats. At 100 TB the codes column for a
 * billion 64-dim vectors is 8 GB — small enough to cache in memory on
 * a modest cluster.
 */
object BitOps {

  /** vec -> packed sign bits, 64 per long; bit i set iff v(i) > 0. */
  def pack(vec: ArrayData, isFloat: Boolean): ArrayData = {
    val v = VectorOps.toDoubles(vec, isFloat)
    val words = new Array[Long]((v.length + 63) >>> 6)
    var i = 0
    while (i < v.length) {
      if (v(i) > 0.0) words(i >>> 6) |= 1L << (i & 63)
      i += 1
    }
    new GenericArrayData(words)
  }

  /** Hamming distance between two packed codes: popcount(xor) summed
    * per word. Trailing pad bits are zero in both codes, so only real
    * dimensions contribute. Mismatched word counts throw (reference
    * semantics; no silent truncation). */
  def hamming(a: ArrayData, b: ArrayData): Int = {
    val n = a.numElements()
    if (n != b.numElements())
      throw new IllegalArgumentException(
        s"packed code length mismatch: $n vs ${b.numElements()} words")
    var acc = 0
    var i = 0
    while (i < n) { acc += java.lang.Long.bitCount(a.getLong(i) ^ b.getLong(i)); i += 1 }
    acc
  }
}

/** vector -> packed sign-bit code (array<long>, 64 dims per word). */
case class BitPackVec(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_bitpack"

  @transient private lazy val isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override protected def nullSafeEval(v: Any): Any =
    BitOps.pack(v.asInstanceOf[ArrayData], isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.BitOps.pack($a, $isFloat);")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** (packed code, packed code) -> Hamming distance (int). */
case class BitHamming(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_hamming"

  override protected def nullSafeEval(l: Any, r: Any): Any =
    BitOps.hamming(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.BitOps.hamming($a, $b);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** vector -> struct(scale double, q binary). */
case class QuantizeVec(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("scale", DoubleType, nullable = false),
    StructField("q", BinaryType, nullable = false)))
  override def prettyName: String = "graft_quantize"

  @transient private lazy val isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override protected def nullSafeEval(v: Any): Any =
    QuantOps.quantize(v.asInstanceOf[ArrayData], isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.QuantOps.quantize($a, $isFloat);")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** (struct(scale,q), struct(scale,q)) -> approximate dot product. */
case class QuantizedDot(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_quantized_dot"

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[InternalRow]; val b = r.asInstanceOf[InternalRow]
    QuantOps.dotQ(a.getDouble(0), a.getBinary(1), b.getDouble(0), b.getBinary(1))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""${ev.value} = graft.functions.QuantOps.dotQ(
         |  $a.getDouble(0), $a.getBinary(1), $b.getDouble(0), $b.getBinary(1));""".stripMargin)

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}
