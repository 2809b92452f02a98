package graft.functions

import java.io.{ByteArrayOutputStream, DataOutputStream}
import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, InterpretedOrdering, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types._

/** Mergeable bounded-heap top-k aggregate — the PARTIAL-AGGREGATABLE
  * alternative to the window formulation of per-group top-k.
  *
  * `row_number().over(partitionBy(key).orderBy(...)) <= k` must shuffle
  * EVERY row to its key's reducer and sort the whole partition before
  * discarding all but k. This aggregate keeps a k-bounded heap per
  * group instead: map-side partials reduce each (partition, group) to
  * ≤ k rows BEFORE the shuffle — at 100 TB with small k, the shuffle
  * carries k·groups rows instead of the whole fact table, and nothing
  * ever sorts more than k elements at once.
  *
  * Semantics: keeps the k SMALLEST input structs under the struct's
  * natural (field-by-field ascending) ordering; callers encode their
  * direction by negating numeric sort fields (see `win_topk_agg`).
  * Output: the kept structs as an ascending array.
  *
  * State serializes as length-prefixed UnsafeRow bytes — the standard
  * TypedImperativeAggregate contract, so this rides
  * ObjectHashAggregateExec with ordinary partial/merge modes.
  */
case class BottomK(child: Expression, k: Int,
                   mutableAggBufferOffset: Int = 0,
                   inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.PriorityQueue[UnsafeRow]] {

  require(k > 0, "k must be positive")

  private lazy val structType = child.dataType.asInstanceOf[StructType]
  private lazy val rowOrd: Ordering[InternalRow] =
    InterpretedOrdering.forSchema(structType.map(_.dataType))
  // PriorityQueue dequeues the MAX first → head is the largest kept,
  // i.e. the eviction candidate while holding the k smallest
  private lazy val heapOrd: Ordering[UnsafeRow] =
    (a: UnsafeRow, b: UnsafeRow) => rowOrd.compare(a, b)
  private lazy val toUnsafe = UnsafeProjection.create(structType)

  override def createAggregationBuffer(): mutable.PriorityQueue[UnsafeRow] =
    mutable.PriorityQueue.empty[UnsafeRow](heapOrd)

  override def update(buf: mutable.PriorityQueue[UnsafeRow],
                      input: InternalRow): mutable.PriorityQueue[UnsafeRow] = {
    val v = child.eval(input)
    if (v != null) {
      // compare on the projection's REUSED buffer; copy only rows that
      // actually enter the heap (in steady state almost none do)
      val projected = toUnsafe(v.asInstanceOf[InternalRow])
      if (buf.size < k) buf.enqueue(projected.copy())
      else if (rowOrd.compare(projected, buf.head) < 0) {
        buf.dequeue(); buf.enqueue(projected.copy())
      }
    }
    buf
  }

  override def merge(buf: mutable.PriorityQueue[UnsafeRow],
                     other: mutable.PriorityQueue[UnsafeRow]): mutable.PriorityQueue[UnsafeRow] = {
    other.foreach(offer(buf, _))
    buf
  }

  private def offer(buf: mutable.PriorityQueue[UnsafeRow], row: UnsafeRow): Unit =
    if (buf.size < k) buf.enqueue(row)
    else if (rowOrd.compare(row, buf.head) < 0) { buf.dequeue(); buf.enqueue(row) }

  override def eval(buf: mutable.PriorityQueue[UnsafeRow]): Any =
    new GenericArrayData(buf.toArray.sorted(heapOrd).toIndexedSeq)

  override def serialize(buf: mutable.PriorityQueue[UnsafeRow]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { r =>
      val b = r.getBytes
      out.writeInt(b.length)
      out.write(b)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[UnsafeRow] = {
    val in = ByteBuffer.wrap(bytes)
    val buf = createAggregationBuffer()
    val n = in.getInt
    (0 until n).foreach { _ =>
      val len = in.getInt
      val b = new Array[Byte](len)
      in.get(b)
      val row = new UnsafeRow(structType.length)
      row.pointTo(b, len)
      buf.enqueue(row)
    }
    buf
  }

  override def dataType: DataType = ArrayType(structType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(child = c.head)
  override def withNewMutableAggBufferOffset(o: Int): BottomK =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BottomK =
    copy(inputAggBufferOffset = o)
  override def prettyName: String = "bottom_k"
}

object TopKFunctions {
  /** Column API: k smallest `sortStruct` values per group, ascending. */
  def bottom_k(sortStruct: Column, k: Int): Column =
    ColumnShim.column(
      BottomK(ColumnShim.expression(sortStruct), k).toAggregateExpression())
}
