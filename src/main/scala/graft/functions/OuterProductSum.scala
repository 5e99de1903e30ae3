package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** `graft_outer_sum(xh)` — the exact covariance-accumulation aggregate
  * over fixed-point unit vectors ([[FpUnit]] output: integer-valued
  * doubles, |x̂ᵢ| ≤ 10⁶): sums the UPPER TRIANGLE of x̂·x̂ᵀ as BIGINTs,
  * Dim·(Dim+1)/2 = 2,080 entries, plus a TRAILING ROW-COUNT slot (r13
  * ADVICE: the headroom must be enforceable, not just documented — the
  * caller checks the count against the wrap bound and fails loudly).
  * This is the one distributed pass of
  * the PCA fit ([[graft.operators.Pca]]) in the shape a 100-TB corpus
  * needs: a 64-aggregate-wide `sum(...)` column list would exceed the
  * codegen field budget and fall back to interpreted row-at-a-time
  * aggregation, while this buffer ships ONE 16 KB long[] per partition
  * with ordinary map-side combine — the same economics as sum/count
  * (the [[TopKLongs]] precedent).
  *
  * Exactness: per-row products |x̂ᵢ·x̂ⱼ| ≤ 10¹², so BIGINT sums hold
  * exactly to ~9.2·10⁶ rows; past that, fit on a sample —
  * [[graft.operators.Pca.sizedFitModulus]] does exactly that, and
  * enforces the bound via this aggregate's count slot.
  * Integer sums are order-free under any partitioning, so the matrix
  * (and everything the PCA fit derives from it) is engine-exact.
  * Null rows are skipped; a non-[[graft.functions.Codebooks.Dim]]-length
  * row is a loud error (round-3 ADVICE: reject dimension mismatches).
  */
case class OuterProductSum(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  private val dim = Codebooks.Dim
  // triangle entries + the trailing row-count slot
  private val len = dim * (dim + 1) / 2 + 1

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_outer_sum"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_outer_sum expects array<double>, got ${other.sql}")
  }

  override def createAggregationBuffer(): Array[Long] = new Array[Long](len)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      require(arr.numElements() == dim,
        s"graft_outer_sum: expected $dim components, got ${arr.numElements()}")
      val x = new Array[Long](dim)
      var i = 0
      while (i < dim) {
        // a null slot would silently read as 0.0 and poison the matrix —
        // reject loudly like the dimension mismatch (round-3 ADVICE style)
        require(!arr.isNullAt(i), s"graft_outer_sum: null component at $i")
        x(i) = arr.getDouble(i).toLong
        i += 1
      }
      var idx = 0
      i = 0
      while (i < dim) {
        val xi = x(i)
        var j = i
        while (j < dim) { buf(idx) += xi * x(j); idx += 1; j += 1 }
        i += 1
      }
      buf(len - 1) += 1L // row count — the enforceable headroom slot
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < len) { buf(i) += other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream(len * 8)
    val out = new DataOutputStream(bos)
    var i = 0
    while (i < len) { out.writeLong(buf(i)); i += 1 }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new Array[Long](len)
    var i = 0
    while (i < len) { buf(i) = in.readLong(); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): OuterProductSum =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): OuterProductSum =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): OuterProductSum =
    copy(child = newChildren.head)
}
