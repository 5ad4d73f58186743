package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType}

/**
 * Real image decode + feature extraction for the [[graft.MediaDecoder]]
 * seam: pure-JVM (javax.imageio ships PNG/BMP/GIF readers with the
 * JDK — no native libs, headless-safe), deterministic per payload
 * byte-string.
 *
 * Features: block-mean luminance on a g x g grid (g = ceil(sqrt dim)),
 * CENTERED on the image's own mean — the sign of each component is
 * then "block brighter than the image average", i.e. the classic
 * aHash bit, so `bitPack(features)` over this decoder IS a perceptual
 * fingerprint (raw non-negative luminance would bitPack to all-ones
 * on any normally-exposed photo). Undecodable payloads (truncated
 * file, not an image) yield the zero vector — the same "carries no
 * signal" convention the text kernels use for empty input, and
 * deterministic, so fingerprint/group-by stay replayable.
 */
object MediaOps {
  def imageFeatures(bytes: Array[Byte], dim: Int): ArrayData = {
    val out = new Array[Float](dim)
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      catch { case _: Exception => null }
    if (img != null && img.getWidth > 0 && img.getHeight > 0) {
      val g = math.ceil(math.sqrt(dim.toDouble)).toInt
      val sums = new Array[Double](g * g)
      val counts = new Array[Long](g * g)
      val w = img.getWidth; val h = img.getHeight
      var y = 0
      while (y < h) {
        val by = y * g / h
        var x = 0
        while (x < w) {
          val bx = x * g / w
          val rgb = img.getRGB(x, y)
          val lum = (((rgb >> 16) & 255) * 0.299 +
            ((rgb >> 8) & 255) * 0.587 + (rgb & 255) * 0.114) / 255.0
          val b = by * g + bx
          sums(b) += lum; counts(b) += 1
          x += 1
        }
        y += 1
      }
      var total = 0.0; var totalN = 0L
      var b = 0
      while (b < g * g) { total += sums(b); totalN += counts(b); b += 1 }
      val mean = if (totalN > 0) total / totalN else 0.0
      var i = 0
      while (i < dim) {
        if (i < g * g && counts(i) > 0)
          out(i) = (sums(i) / counts(i) - mean).toFloat
        i += 1
      }
    }
    new GenericArrayData(out)
  }
}

/** binary payload -> image feature vector (array<float> of `dim`). */
case class ImageFeatures(child: Expression, dim: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def prettyName: String = "graft_image_features"

  override protected def nullSafeEval(v: Any): Any =
    MediaOps.imageFeatures(v.asInstanceOf[Array[Byte]], dim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b =>
      s"${ev.value} = graft.functions.MediaOps.imageFeatures($b, $dim);")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
