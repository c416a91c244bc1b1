package graft.functions

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.{FunctionIdentifier, InternalRow}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** `graft_collect_capped(v, cap)` — `collect_list(v)` with a HARD
  * per-key memory bound: the moment a group's total element count
  * exceeds `cap`, the buffer is emptied, the group is marked
  * overflowed, and the aggregate returns NULL for it.
  *
  * Why this exists: an unbounded `collect_list` inside a
  * `groupBy(key)` is the one aggregate shape whose reducer state
  * scales with the hottest key, not with the partition count — a
  * corpus-wide viral key (a legal disclaimer's 8-gram, a unicode BOM
  * artifact) concentrates every occurrence on one reducer at 100 TB.
  * Built-in mitigation options all lose: `slice(collect_list(...))`
  * still materializes the full list in the buffer before slicing, and
  * a separate df-filter join reintroduces the second full-volume
  * shuffle that fused single-pass plans exist to avoid. This aggregate
  * keeps the ONE-shuffle plan and bounds state where it accrues: in
  * `update` (map-side partial aggregation stops appending at the cap)
  * and in `merge` (two under-cap partials whose union exceeds the cap
  * overflow immediately).
  *
  * Overflow is DETERMINISTIC: a group's total element count does not
  * depend on how rows were split across partials, so "count > cap →
  * NULL" is the same answer under any physical plan — unlike a
  * truncating collect, which would keep a partition-order-dependent
  * subset. NULL (not a truncated list) is the only honest output: the
  * caller decides what an over-hot key means (for substring dedup it
  * means boilerplate, handled by LineDedup's chunk pass — see
  * `SubstrDedup.SubstrOccCap`). Element order within a kept list is
  * unspecified, exactly like `collect_list`.
  *
  * Nulls in `v` are skipped, like `collect_list`. `cap` must be a
  * positive integer literal: it sizes executor memory, which cannot be
  * row-dependent.
  */
case class CollectCappedAgg(
    child: Expression,
    capExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[CollectCappedAgg.Buffer] {

  @transient private lazy val cap: Int =
    capExpr.eval(null).asInstanceOf[Number].intValue()

  private def capIsIntegral: Boolean = capExpr.dataType match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (!capExpr.foldable || !capIsIntegral)
      TypeCheckResult.TypeCheckFailure(
        s"graft_collect_capped requires an integer literal cap, got ${capExpr.sql}")
    else if (capExpr.eval(null) == null || cap <= 0)
      TypeCheckResult.TypeCheckFailure(
        "graft_collect_capped requires cap > 0 (the cap bounds executor memory)")
    else TypeCheckResult.TypeCheckSuccess

  override def children: Seq[Expression] = Seq(child, capExpr)
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(child.dataType, containsNull = false)
  override def prettyName: String = "graft_collect_capped"

  override def createAggregationBuffer(): CollectCappedAgg.Buffer =
    new CollectCappedAgg.Buffer(ArrayBuffer.empty, overflowed = false)

  override def update(
      b: CollectCappedAgg.Buffer, input: InternalRow): CollectCappedAgg.Buffer = {
    if (!b.overflowed) {
      val v = child.eval(input)
      if (v != null) {
        if (b.items.length >= cap) { b.overflowed = true; b.items.clear() }
        else b.items += InternalRow.copyValue(v)
      }
    }
    b
  }

  override def merge(
      b: CollectCappedAgg.Buffer, o: CollectCappedAgg.Buffer): CollectCappedAgg.Buffer = {
    if (b.overflowed || o.overflowed || b.items.length + o.items.length > cap) {
      b.overflowed = true
      b.items.clear()
    } else b.items ++= o.items
    b
  }

  override def eval(b: CollectCappedAgg.Buffer): Any =
    if (b.overflowed) null else new GenericArrayData(b.items.toArray)

  // Shuffle format: one UnsafeRow (overflowed: boolean, items: array) —
  // the standard object-aggregate spill/exchange encoding.
  @transient private lazy val projection =
    UnsafeProjection.create(Array[DataType](BooleanType, ArrayType(child.dataType)))

  override def serialize(b: CollectCappedAgg.Buffer): Array[Byte] =
    projection.apply(
      InternalRow(b.overflowed, new GenericArrayData(b.items.toArray))).getBytes

  override def deserialize(bytes: Array[Byte]): CollectCappedAgg.Buffer = {
    val row = new UnsafeRow(2)
    row.pointTo(bytes, bytes.length)
    val items = ArrayBuffer.empty[Any]
    val overflowed = row.getBoolean(0)
    if (!overflowed) {
      row.getArray(1).foreach(child.dataType, (_, v) => items += InternalRow.copyValue(v))
    }
    new CollectCappedAgg.Buffer(items, overflowed)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CollectCappedAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CollectCappedAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CollectCappedAgg =
    copy(child = newChildren(0), capExpr = newChildren(1))
}

object CollectCappedAgg {
  /** Mutable aggregation state: the collected elements plus the sticky
    * overflow flag. Once overflowed the item buffer stays empty — the
    * whole point is that a hot key holds O(1) state from that moment on.
    */
  final class Buffer(val items: ArrayBuffer[Any], var overflowed: Boolean)

  def register(ext: org.apache.spark.sql.SparkSessionExtensions): Unit =
    ext.injectFunction(
      (
        FunctionIdentifier("graft_collect_capped"),
        new ExpressionInfo(classOf[CollectCappedAgg].getName, "graft_collect_capped"),
        (children: Seq[Expression]) => {
          if (children.size != 2)
            throw new IllegalArgumentException(
              s"graft_collect_capped takes exactly 2 arguments (value, cap), got ${children.size}")
          CollectCappedAgg(children(0), children(1))
        }
      )
    )
}
