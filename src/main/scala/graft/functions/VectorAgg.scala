package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Element-wise sum of ARRAY<FLOAT> vectors as a typed aggregate — the
  * primitive behind mean-pooling chunk embeddings into a document embedding
  * (and any centroid computation over an embedding column).
  *
  * Why custom: Spark has no element-wise array-sum aggregate, and the
  * compositional alternative (posexplode → groupBy(id, pos) → array_agg
  * ordered by pos) shuffles dim× the rows TWICE. This aggregate carries ONE
  * dim-length double buffer per group through a single map-side-combined
  * shuffle — the same cost shape as a builtin sum. Runs under
  * ObjectHashAggregate like the builtin collect/percentile family.
  *
  * NULL vectors are ignored (like builtin sum); an all-NULL/empty group
  * yields NULL. Mixed dimensions within a group fail fast — silently
  * zip-truncating would corrupt the pooled embedding with no symptom.
  */
case class VectorSumAgg(child: Expression,
                        mutableAggBufferOffset: Int = 0,
                        inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Double]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "vector_sum"

  override def createAggregationBuffer(): Array[Double] = null

  override def update(buffer: Array[Double], input: InternalRow): Array[Double] = {
    val v = child.eval(input)
    if (v == null) return buffer
    val xs = v.asInstanceOf[ArrayData]
    val n = xs.numElements()
    if (buffer == null) {
      val b = new Array[Double](n)
      var i = 0
      while (i < n) { b(i) = xs.getFloat(i).toDouble; i += 1 }
      b
    } else {
      require(buffer.length == n,
        s"vector_sum: mixed dimensions in one group (${buffer.length} vs $n)")
      var i = 0
      while (i < n) { buffer(i) += xs.getFloat(i).toDouble; i += 1 }
      buffer
    }
  }

  override def merge(b1: Array[Double], b2: Array[Double]): Array[Double] = {
    if (b2 == null) return b1
    if (b1 == null) return b2
    require(b1.length == b2.length,
      s"vector_sum: mixed dimensions across partitions (${b1.length} vs ${b2.length})")
    var i = 0
    while (i < b1.length) { b1(i) += b2(i); i += 1 }
    b1
  }

  override def eval(buffer: Array[Double]): Any =
    if (buffer == null) null else new GenericArrayData(buffer)

  override def serialize(buffer: Array[Double]): Array[Byte] = {
    if (buffer == null) return Array.emptyByteArray
    val bb = ByteBuffer.allocate(buffer.length * 8)
    var i = 0
    while (i < buffer.length) { bb.putDouble(buffer(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Double] = {
    if (bytes.isEmpty) return null
    val bb = ByteBuffer.wrap(bytes)
    val out = new Array[Double](bytes.length / 8)
    var i = 0
    while (i < out.length) { out(i) = bb.getDouble(); i += 1 }
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): VectorSumAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VectorSumAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object VectorAgg {

  /** Aggregate Column: element-wise double sum of an ARRAY<FLOAT> column. */
  def vectorSum(emb: Column): Column =
    Bridge.column(VectorSumAgg(
      Bridge.expression(emb.cast(ArrayType(FloatType)))).toAggregateExpression())

  /** Aggregate Column: fixed-size index histogram (counts per index in
    * [0, size), ARRAY<LONG>). See [[IndexHistogramAgg]]. */
  def indexHistogram(idx: Column, size: Int): Column =
    Bridge.column(IndexHistogramAgg(
      Bridge.expression(idx.cast(IntegerType)), size).toAggregateExpression())
}

/** Fixed-size index histogram: per-group counts of an INT index column over
  * [0, size), as ARRAY<LONG> of length `size` — the count-by-KNOWN-vocab
  * primitive. Why custom: a `groupBy(key, index)` count is a SECOND
  * aggregation when the caller already aggregates by key, which a streaming
  * query cannot chain (multi-agg is unsupported in append mode); this
  * carries one long-array buffer per group through a single
  * map-side-combined shuffle instead (the [[VectorSumAgg]] shape). NULL and
  * out-of-range indexes are ignored; an empty group yields all-zeros.
  */
case class IndexHistogramAgg(child: Expression, size: Int,
                             mutableAggBufferOffset: Int = 0,
                             inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {
  require(size >= 1, "size >= 1")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "index_histogram"

  override def createAggregationBuffer(): Array[Long] = new Array[Long](size)

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val i = v.asInstanceOf[Int]
      if (i >= 0 && i < size) buffer(i) += 1L
    }
    buffer
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < size) { b1(i) += b2(i); i += 1 }
    b1
  }

  override def eval(buffer: Array[Long]): Any = new GenericArrayData(buffer)

  override def serialize(buffer: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(size * 8)
    var i = 0
    while (i < size) { bb.putLong(buffer(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val out = new Array[Long](size)
    var i = 0
    while (i < size) { out(i) = bb.getLong(); i += 1 }
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): IndexHistogramAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): IndexHistogramAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}
