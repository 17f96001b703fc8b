package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{GenericArrayData, TypeUtils}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType}

/** Bounded top-k aggregate: the k SMALLEST values of `child` per group,
  * as an ascending array. Pass `struct(-score, tiebreak, payload…)` to get
  * "top k by score desc" — struct ordering compares fields left to right.
  *
  * Why an aggregate and not `row_number().over(partitionBy(key)) <= k`
  * (the O5/top-k shape used elsewhere): the window form SORTS every row of
  * every group inside the shuffle partition and only then discards all but
  * k — at 100 TB that is a full sort of the fact table to keep a sliver.
  * This aggregate holds a bounded k-element heap per group, participates
  * in map-side partial aggregation (each map task pre-truncates to k
  * before the exchange, so the shuffle carries ≤ k rows per group per
  * task, not the group's full contents), and never sorts anything larger
  * than k. Same output, shuffle volume down by |group|/k.
  *
  * Implementation notes: this is the UDAF extension surface (SURVEY
  * §2.10) — a `TypedImperativeAggregate` whose buffer is a max-heap of
  * the current k smallest (evict the largest when full; Spark's own
  * internal `CollectTopK` validates the same design). Values are copied
  * on insert (`InternalRow.copyValue` — eval results alias reused
  * buffers) and the spill/shuffle serialization is length-prefixed
  * `UnsafeRow` bytes, the engine's native row format.
  */
case class SmallestK(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.PriorityQueue[Any]]
  with UnaryLike[Expression] {

  require(k > 0, s"smallest_k needs k > 0, got $k")

  @transient private lazy val ordering: Ordering[Any] =
    TypeUtils.getInterpretedOrdering(child.dataType)

  override def checkInputDataTypes(): TypeCheckResult =
    TypeUtils.checkForOrderingExpr(child.dataType, prettyName)

  override def prettyName: String = "smallest_k"
  override def dataType: DataType = ArrayType(child.dataType, containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): java.util.PriorityQueue[Any] =
    new java.util.PriorityQueue[Any](k, ordering.reverse) // max-heap of the k smallest

  private def insert(q: java.util.PriorityQueue[Any], value: Any): Unit =
    if (q.size < k) q.add(value)
    else if (ordering.lt(value, q.peek)) { q.poll(); q.add(value) }

  override def update(
      q: java.util.PriorityQueue[Any], input: InternalRow): java.util.PriorityQueue[Any] = {
    val v = child.eval(input)
    // skip nulls (SQL aggregate convention); copy — eval may alias a reused row
    if (v != null &&
        (q.size < k || ordering.lt(v, q.peek))) insert(q, InternalRow.copyValue(v))
    q
  }

  override def merge(
      q: java.util.PriorityQueue[Any], other: java.util.PriorityQueue[Any])
      : java.util.PriorityQueue[Any] = {
    val it = other.iterator()
    while (it.hasNext) insert(q, it.next()) // already copied/deserialized values
    q
  }

  override def eval(q: java.util.PriorityQueue[Any]): Any = {
    val arr = q.toArray
    java.util.Arrays.sort(arr.asInstanceOf[Array[AnyRef]],
      ordering.asInstanceOf[java.util.Comparator[AnyRef]])
    new GenericArrayData(arr)
  }

  @transient private lazy val projection =
    UnsafeProjection.create(Array[DataType](child.dataType))

  override def serialize(q: java.util.PriorityQueue[Any]): Array[Byte] = {
    val bytes = new ByteArrayOutputStream()
    val out = new DataOutputStream(bytes)
    out.writeInt(q.size)
    val it = q.iterator()
    while (it.hasNext) {
      val row = projection.apply(InternalRow(it.next()))
      out.writeInt(row.getSizeInBytes)
      row.writeToStream(out, null)
    }
    out.flush()
    bytes.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.PriorityQueue[Any] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val q = createAggregationBuffer()
    val n = in.readInt()
    var i = 0
    while (i < n) {
      val size = in.readInt()
      val buf = new Array[Byte](size)
      in.readFully(buf)
      val row = new UnsafeRow(1)
      row.pointTo(buf, size)
      insert(q, row.get(0, child.dataType)) // owns its buf — no copy needed
      i += 1
    }
    q
  }

  override def withNewMutableAggBufferOffset(offset: Int): SmallestK =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): SmallestK =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(newChild: Expression): SmallestK =
    copy(child = newChild)
}

object TopK {
  def smallestK(c: Column, k: Int): Column =
    ColumnBridge.column(SmallestK(ColumnBridge.expr(c), k).toAggregateExpression())
}
