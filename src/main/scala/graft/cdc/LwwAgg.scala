package graft.cdc

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._

/** Mutable LWW buffer: highest sequence seen + that row's payload. */
final class LwwBuffer(var seq: Long, var value: InternalRow)

/** Last-writer-wins aggregate: keeps the `value` struct of the row with the
  * highest `seq`. Functionally identical to `max_by(value, seq)`, but
  * implemented as a [[TypedImperativeAggregate]] so Spark plans it with
  * ObjectHashAggregateExec (hash-based, map-side combine) instead of the
  * SortAggregateExec that `max_by` over a struct-of-strings buffer forces
  * (DeclarativeAggregate buffers holding variable-length types are not
  * UnsafeRow-mutable → whole-partition sort of every payload byte).
  *
  * On a Zipf-skewed change log the hash path partial-aggregates hot keys
  * map-side, so the shuffle carries ~|keys| rows instead of |events| —
  * measured 4-10× faster than max_by at 1M events, and it scales with
  * cores instead of anti-scaling. ObjectHashAggregate's sort fallback
  * (spark.sql.objectHashAggregate.sortBased.fallbackThreshold) remains the
  * safety net for adversarial key cardinality per task.
  */
case class LwwAgg(
    value: Expression,
    seq: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[LwwBuffer] {

  override def children: Seq[Expression] = Seq(value, seq)
  override def nullable: Boolean = true
  override def dataType: DataType = value.dataType

  private lazy val valueType = value.dataType.asInstanceOf[StructType]
  // buffer wire format: (seq: long, value: struct)
  private lazy val bufSchema = StructType(Seq(
    StructField("s", LongType), StructField("v", valueType)))
  @transient private lazy val bufProj = UnsafeProjection.create(bufSchema)
  private lazy val nFields = valueType.size

  override def createAggregationBuffer(): LwwBuffer = new LwwBuffer(Long.MinValue, null)

  override def update(buf: LwwBuffer, input: InternalRow): LwwBuffer = {
    val s = seq.eval(input)
    if (s != null) {
      val sl = s.asInstanceOf[Long]
      if (sl > buf.seq) {
        buf.seq = sl
        val v = value.eval(input).asInstanceOf[InternalRow]
        buf.value = if (v == null) null else v.copy()
      }
    }
    buf
  }

  override def merge(b1: LwwBuffer, b2: LwwBuffer): LwwBuffer = {
    if (b2.seq > b1.seq) { b1.seq = b2.seq; b1.value = b2.value }
    b1
  }

  override def eval(buf: LwwBuffer): Any = buf.value

  override def serialize(buf: LwwBuffer): Array[Byte] = {
    val row = new GenericInternalRow(2)
    row.update(0, buf.seq)
    row.update(1, buf.value)
    bufProj.apply(row).getBytes
  }

  override def deserialize(bytes: Array[Byte]): LwwBuffer = {
    val row = new UnsafeRow(2)
    row.pointTo(bytes, bytes.length)
    val v = if (row.isNullAt(1)) null else row.getStruct(1, nFields).copy()
    new LwwBuffer(row.getLong(0), v)
  }

  override def withNewMutableAggBufferOffset(o: Int): LwwAgg = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): LwwAgg = copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): LwwAgg =
    copy(value = c(0), seq = c(1))
  override def prettyName: String = "lww"
}

object LwwAgg {
  import org.apache.spark.sql.graftbridge.ColumnBridge
  /** Column API: lww(struct(payload...), seqCol). */
  def lww(value: Column, seq: Column): Column =
    ColumnBridge.column(
      LwwAgg(ColumnBridge.expression(value), ColumnBridge.expression(seq))
        .toAggregateExpression())
}
