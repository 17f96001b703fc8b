package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{GenericArrayData, TypeUtils}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StructField, StructType}

/** Misra-Gries frequent-items summary: a bounded `k`-counter sketch whose
  * output is `array<struct<item, est_count>>` (est desc, item asc), with the
  * classic completeness guarantee — ANY item whose true frequency exceeds
  * N/(k+1) is present in the summary (its estimate undercounts by at most
  * N/(k+1), so it stays positive). The summaries are MERGEABLE (Agarwal et
  * al. 2012, "Mergeable Summaries": pointwise-sum counters, then subtract
  * the (k+1)-largest count and drop non-positives) and the error bound
  * survives arbitrary merge trees, which is exactly what a partial-aggregate
  * shuffle is.
  *
  * Why this and not `groupBy(item).count()`: at 100 TB the item domain
  * (tokens, URLs, user agents) can be billions of distinct values, and the
  * exact count shuffles ALL of them to answer a question about the top
  * handful. This aggregate's state is k counters per task regardless of
  * input size — the map side pre-merges everything into k entries before
  * the exchange, so finding "which items exceed 0.5% of the corpus" ships
  * kilobytes. Completeness makes it the candidate pass of the two-pass
  * EXACT heavy-hitters pattern ([[graft.operators.Curation.heavyHitters]]):
  * candidates from the sketch, exact counts for candidates only.
  *
  * Update is amortized O(1): the decrement-all step charges one shared
  * `debt` offset instead of touching every counter (an entry's effective
  * count is `stored − debt`; entries at or below the debt line are swept
  * lazily when the map is full).
  */
case class MisraGries(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MisraGries.Summary]
  with UnaryLike[Expression] {

  require(k > 0, s"freq_items_mg needs k > 0, got $k")

  @transient private lazy val ordering: Ordering[Any] =
    TypeUtils.getInterpretedOrdering(child.dataType)

  override def checkInputDataTypes(): TypeCheckResult =
    TypeUtils.checkForOrderingExpr(child.dataType, prettyName)

  override def prettyName: String = "freq_items_mg"
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("item", child.dataType, nullable = false),
      StructField("est_count", LongType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): MisraGries.Summary = new MisraGries.Summary(k)

  override def update(s: MisraGries.Summary, input: InternalRow): MisraGries.Summary = {
    val v = child.eval(input)
    if (v != null) s.add(v, 1L, () => InternalRow.copyValue(v))
    s
  }

  override def merge(s: MisraGries.Summary, other: MisraGries.Summary): MisraGries.Summary = {
    other.foreachEffective { (item, n) => s.add(item, n, () => item) } // already copied
    s
  }

  override def eval(s: MisraGries.Summary): Any = {
    val entries = mutable.ArrayBuffer.empty[(Any, Long)]
    s.foreachEffective { (item, n) => entries += ((item, n)) }
    val sorted = entries.sortWith { case ((ia, na), (ib, nb)) =>
      if (na != nb) na > nb else ordering.lt(ia, ib)
    }
    new GenericArrayData(sorted.map { case (item, n) =>
      new GenericInternalRow(Array[Any](item, n))
    }.toArray[Any])
  }

  @transient private lazy val projection =
    UnsafeProjection.create(Array[DataType](child.dataType, LongType))

  override def serialize(s: MisraGries.Summary): Array[Byte] = {
    val bytes = new ByteArrayOutputStream()
    val out = new DataOutputStream(bytes)
    var count = 0
    s.foreachEffective { (_, _) => count += 1 }
    out.writeInt(count)
    s.foreachEffective { (item, n) =>
      val row = projection.apply(InternalRow(item, n))
      out.writeInt(row.getSizeInBytes)
      row.writeToStream(out, null)
    }
    out.flush()
    bytes.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): MisraGries.Summary = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val s = createAggregationBuffer()
    val n = in.readInt()
    var i = 0
    while (i < n) {
      val size = in.readInt()
      val buf = new Array[Byte](size)
      in.readFully(buf)
      val row = new UnsafeRow(2)
      row.pointTo(buf, size)
      val item = row.get(0, child.dataType) // owns its buf — no copy needed
      s.add(item, row.getLong(1), () => item)
      i += 1
    }
    s
  }

  override def withNewMutableAggBufferOffset(offset: Int): MisraGries =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): MisraGries =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(newChild: Expression): MisraGries =
    copy(child = newChild)
}

object MisraGries {

  /** k-counter Misra-Gries state. Counts are stored RAW; the effective
    * count of an entry is `stored − debt`, where `debt` accumulates the
    * "decrement everything" steps in O(1) each. Entries whose stored count
    * has fallen to the debt line are swept only when room is needed.
    */
  final class Summary(k: Int) {
    private val counts = mutable.HashMap.empty[Any, Long]
    private var debt = 0L

    /** Add `n` observations of `item`; `copy` materializes an owned copy of
      * the value on first insert (eval results alias reused buffers).
      */
    def add(item: Any, n: Long, copy: () => Any): Unit = {
      counts.get(item) match {
        case Some(c) => counts.update(item, c + n)
        case None =>
          if (counts.size >= k) sweep()
          if (counts.size < k) counts.update(copy(), debt + n)
          else if (n == 1L) debt += 1 // live entries have effective ≥ 1: O(1)
          else {
            // bulk weight (merge path): pay toward the shared debt up to the
            // smallest live count (the classic decrement-all, charged once);
            // any remainder still lands — add recurses at most once because
            // the sweep then frees a slot.
            val room = counts.valuesIterator.min - debt
            if (n > room) { debt += room; sweep(); add(item, n - room, copy) }
            else debt += n
          }
      }
    }

    private def sweep(): Unit = counts.filterInPlace { case (_, c) => c > debt }

    /** Iterate live entries with their effective (debt-adjusted) counts. */
    def foreachEffective(f: (Any, Long) => Unit): Unit =
      counts.foreach { case (item, c) => if (c > debt) f(item, c - debt) }
  }

  def freqItemsMg(c: Column, k: Int): Column =
    ColumnBridge.column(MisraGries(ColumnBridge.expr(c), k).toAggregateExpression())
}
