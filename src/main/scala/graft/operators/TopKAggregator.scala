package graft.operators

import org.apache.spark.sql.{Column, Encoder, Encoders, Row}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/**
 * Bounded top-k aggregation for batched k-NN at scale
 * (SURVEY.md paragraph 4): a per-group binary-heap of (score, id) capped at k.
 *
 * Versus the window-function formulation (row_number over a shuffle of
 * every scored row), partial aggregation keeps at most k entries per
 * (group x partition) — the shuffle carries k x |queries| x partitions
 * rows instead of |corpus| x |queries|. At 100 TB that is the
 * difference between a broadcast-sized shuffle and an impossible one.
 *
 * Ordering matches the engine contract: score descending, id ascending
 * on ties (SURVEY.md paragraph 5).
 */
class TopKAggregator(k: Int)
  extends Aggregator[Row, TopKBuffer, Seq[(Long, Double)]] {

  override def zero: TopKBuffer = new TopKBuffer(k)

  override def reduce(b: TopKBuffer, row: Row): TopKBuffer = {
    b.insert(row.getLong(0), row.getDouble(1)); b
  }

  override def merge(a: TopKBuffer, b: TopKBuffer): TopKBuffer = { a.absorb(b); a }

  override def finish(b: TopKBuffer): Seq[(Long, Double)] = b.sortedDesc

  override def bufferEncoder: Encoder[TopKBuffer] = Encoders.kryo[TopKBuffer]
  override def outputEncoder: Encoder[Seq[(Long, Double)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Long, Double)]]()
}

/** Min-heap of (score, id) keeping the k best; worst element at root. */
class TopKBuffer(val k: Int) extends Serializable {
  var size: Int = 0
  var ids: Array[Long] = new Array[Long](k)
  var scores: Array[Double] = new Array[Double](k)

  /** true if (s1,id1) ranks WORSE than (s2,id2) in the final order. */
  @inline private def worse(s1: Double, id1: Long, s2: Double, id2: Long): Boolean =
    s1 < s2 || (s1 == s2 && id1 > id2)

  def insert(id: Long, score: Double): Unit = {
    if (size < k) {
      ids(size) = id; scores(size) = score; size += 1
      siftUp(size - 1)
    } else if (k > 0 && worse(scores(0), ids(0), score, id)) {
      ids(0) = id; scores(0) = score
      siftDown(0)
    }
  }

  def absorb(other: TopKBuffer): Unit = {
    var i = 0
    while (i < other.size) { insert(other.ids(i), other.scores(i)); i += 1 }
  }

  private def siftUp(i0: Int): Unit = {
    var i = i0
    while (i > 0) {
      val p = (i - 1) / 2
      if (worse(scores(i), ids(i), scores(p), ids(p))) { swap(i, p); i = p }
      else return
    }
  }

  private def siftDown(i0: Int): Unit = {
    var i = i0
    while (true) {
      val l = 2 * i + 1; val r = l + 1
      var worst = i
      if (l < size && worse(scores(l), ids(l), scores(worst), ids(worst))) worst = l
      if (r < size && worse(scores(r), ids(r), scores(worst), ids(worst))) worst = r
      if (worst == i) return
      swap(i, worst); i = worst
    }
  }

  @inline private def swap(i: Int, j: Int): Unit = {
    val ti = ids(i); ids(i) = ids(j); ids(j) = ti
    val ts = scores(i); scores(i) = scores(j); scores(j) = ts
  }

  def sortedDesc: Seq[(Long, Double)] =
    (0 until size).map(i => (ids(i), scores(i)))
      .sortBy { case (id, s) => (-s, id) }
}

object TopKAggregator {
  private val inputSchema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("score", org.apache.spark.sql.types.DoubleType)))

  /** Column form: aggregates (id, score) rows into top-k pairs. */
  def topK(k: Int)(id: Column, score: Column): Column =
    udaf(new TopKAggregator(k), Encoders.row(inputSchema)).apply(id, score)
}
