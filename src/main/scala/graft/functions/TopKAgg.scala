package graft.functions

import java.nio.ByteBuffer
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import graft.operators.TopKBuffer

/**
 * Native top-k aggregate: `graft_topk(id, score, k)` keeps the k best
 * (score desc, id asc) pairs in a bounded binary heap.
 *
 * This is the Catalyst-level twin of operators.TopKAggregator (the
 * public-API `Aggregator` version): `update` reads the input
 * InternalRow directly — no encoder round-trip per row — and the
 * buffer serializes as 16 bytes/entry only at shuffle boundaries.
 * Partial aggregation runs map-side, so a batched k-NN shuffles
 * k rows per (group x partition) regardless of corpus size.
 */
case class TopKAgg(idExpr: Expression, scoreExpr: Expression, k: Int,
                   mutableAggBufferOffset: Int = 0,
                   inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuffer] {

  override def children: Seq[Expression] = Seq(idExpr, scoreExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("score", DoubleType, nullable = false))), containsNull = false)

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(buffer: TopKBuffer, input: InternalRow): TopKBuffer = {
    val id = idExpr.eval(input)
    val score = scoreExpr.eval(input)
    if (id != null && score != null) {
      buffer.insert(id.asInstanceOf[Long], score.asInstanceOf[Double])
    }
    buffer
  }

  override def merge(buffer: TopKBuffer, other: TopKBuffer): TopKBuffer = {
    buffer.absorb(other); buffer
  }

  override def eval(buffer: TopKBuffer): Any = {
    val sorted = buffer.sortedDesc
    new GenericArrayData(sorted.map { case (id, score) =>
      InternalRow(id, score)
    }.toArray[Any])
  }

  override def serialize(buffer: TopKBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + 16 * buffer.size)
    bb.putInt(buffer.k).putInt(buffer.size)
    var i = 0
    while (i < buffer.size) {
      bb.putLong(buffer.ids(i)); bb.putDouble(buffer.scores(i))
      i += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val kk = bb.getInt; val n = bb.getInt
    val buf = new TopKBuffer(kk)
    var i = 0
    while (i < n) { buf.insert(bb.getLong, bb.getDouble); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(idExpr = newChildren(0), scoreExpr = newChildren(1))
  override def prettyName: String = "graft_topk"
}
