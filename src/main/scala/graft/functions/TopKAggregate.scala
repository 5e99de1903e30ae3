package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** `graft_top_k(col, k)` — bounded TOP-K AGGREGATE over a BIGINT column,
  * the custom-Catalyst-AGGREGATE face of the engine (the expressions in
  * [[NativeHash]] are scalar kernels; this is a TypedImperativeAggregate
  * with a mergeable imperative buffer): each partition keeps a k-element
  * min-heap, partial heaps MERGE associatively, and eval emits the k
  * largest values in descending order.
  *
  * Why not a window: `row_number() <= k` per group sorts and shuffles
  * ROWS (WindowGroupLimit bounds it to k·tasks, but the rows still move
  * and the window still sorts); this aggregate ships k LONGS per
  * partition per group — the same map-side-combine economics as
  * sum/count, which is the correct shape when only the top values (not
  * their rows) are wanted. The buffer is O(k); ordering ties are exact
  * because values, not rows, are ranked — the result is a multiset, so
  * no tie-break is needed and any partitioning yields the same bits
  * (spec'd against the window form).
  */
case class TopKLongs(
    child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.PriorityQueue[java.lang.Long]] {

  require(k >= 1 && k <= (1 << 20), s"graft_top_k: k must be in [1, 2^20], got $k")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_top_k"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_top_k expects a bigint column, got ${child.dataType.sql}")

  override def createAggregationBuffer(): java.util.PriorityQueue[java.lang.Long] =
    new java.util.PriorityQueue[java.lang.Long](k + 1)

  private def offer(heap: java.util.PriorityQueue[java.lang.Long], v: Long): Unit = {
    if (heap.size < k) heap.offer(v)
    else if (heap.peek() < v) { heap.poll(); heap.offer(v) }
  }

  override def update(heap: java.util.PriorityQueue[java.lang.Long],
                      input: InternalRow): java.util.PriorityQueue[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) offer(heap, v.asInstanceOf[Long])
    heap
  }

  override def merge(heap: java.util.PriorityQueue[java.lang.Long],
                     other: java.util.PriorityQueue[java.lang.Long]): java.util.PriorityQueue[java.lang.Long] = {
    val it = other.iterator()
    while (it.hasNext) offer(heap, it.next())
    heap
  }

  override def eval(heap: java.util.PriorityQueue[java.lang.Long]): Any = {
    val arr = new Array[Long](heap.size)
    var i = heap.size - 1
    while (i >= 0) { arr(i) = heap.poll(); i -= 1 } // min-heap drains ascending
    new GenericArrayData(arr)
  }

  override def serialize(heap: java.util.PriorityQueue[java.lang.Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(heap.size)
    val it = heap.iterator()
    while (it.hasNext) out.writeLong(it.next())
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.PriorityQueue[java.lang.Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val heap = createAggregationBuffer()
    var i = 0
    while (i < n) { heap.offer(in.readLong()); i += 1 }
    heap
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKLongs =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKLongs =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKLongs =
    copy(child = newChildren.head)
}
