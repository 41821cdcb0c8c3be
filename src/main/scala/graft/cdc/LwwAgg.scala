package graft.cdc

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, Literal, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Mutable LWW buffer: highest (seq, tie) seen + that row's payload.
  * `set` distinguishes the empty buffer from a buffered null payload.
  */
final class LwwBuffer(var set: Boolean, var seq: Long, var tie: UTF8String,
                      var value: InternalRow)

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
  *
  * EQUAL-seq ties resolve DETERMINISTICALLY via the optional `tie` string
  * expression (byte-wise UTF8 compare, null smallest; strictly-greater
  * wins, equal keeps the incumbent): [[graft.lake.LakeTable]]'s MOR
  * resolution passes the data-file path, so the Dataset read, the SQL
  * surface, and the graft-cdf partition reader all agree on the SAME
  * winner when a bucket ever holds two records with one (key, seq) —
  * re-delivered idempotent writes carry identical payloads (any winner is
  * equal), and a reused seq with a different payload resolves to the
  * lexicographically-latest file on every path instead of diverging by
  * read order. Without `tie`, ties keep the first-seen row (the pre-tie
  * behavior, for inputs where seq is unique by construction).
  */
case class LwwAgg(
    value: Expression,
    seq: Expression,
    tie: Expression = Literal(null, StringType),
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[LwwBuffer] {

  override def children: Seq[Expression] = Seq(value, seq, tie)
  override def nullable: Boolean = true
  override def dataType: DataType = value.dataType

  // analysis-time type errors beat executor-side ClassCastExceptions
  // mid-job (same pattern as KmvAgg): lwwTyped is a public API and the
  // seq column of an arbitrary DataFrame is plausibly int, not long
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    if (!value.dataType.isInstanceOf[StructType])
      TypeCheckFailure(s"lww needs a STRUCT value (wrap payload columns in " +
        s"struct(...)); got ${value.dataType.catalogString}")
    else if (seq.dataType != LongType)
      TypeCheckFailure(s"lww needs a BIGINT seq column (cast it explicitly); " +
        s"got ${seq.dataType.catalogString}")
    else if (tie.dataType != StringType)
      TypeCheckFailure(s"lww tie-break must be a STRING column; " +
        s"got ${tie.dataType.catalogString}")
    else TypeCheckSuccess
  }

  private lazy val valueType = value.dataType.asInstanceOf[StructType]
  // buffer wire format: (set: bool, seq: long, tie: string, value: struct)
  private lazy val bufSchema = StructType(Seq(
    StructField("f", BooleanType), StructField("s", LongType),
    StructField("t", StringType), StructField("v", valueType)))
  @transient private lazy val bufProj = UnsafeProjection.create(bufSchema)
  private lazy val nFields = valueType.size

  private def cmpTie(a: UTF8String, b: UTF8String): Int =
    if (a == null && b == null) 0
    else if (a == null) -1
    else if (b == null) 1
    else a.compareTo(b)

  override def createAggregationBuffer(): LwwBuffer =
    new LwwBuffer(false, Long.MinValue, null, null)

  override def update(buf: LwwBuffer, input: InternalRow): LwwBuffer = {
    val s = seq.eval(input)
    if (s != null) {
      val sl = s.asInstanceOf[Long]
      lazy val t = tie.eval(input).asInstanceOf[UTF8String]
      if (!buf.set || sl > buf.seq || (sl == buf.seq && cmpTie(t, buf.tie) > 0)) {
        buf.set = true
        buf.seq = sl
        buf.tie = if (t == null) null else t.clone()
        val v = value.eval(input).asInstanceOf[InternalRow]
        buf.value = if (v == null) null else v.copy()
      }
    }
    buf
  }

  override def merge(b1: LwwBuffer, b2: LwwBuffer): LwwBuffer = {
    if (b2.set && (!b1.set || b2.seq > b1.seq ||
        (b2.seq == b1.seq && cmpTie(b2.tie, b1.tie) > 0))) {
      b1.set = true; b1.seq = b2.seq; b1.tie = b2.tie; b1.value = b2.value
    }
    b1
  }

  override def eval(buf: LwwBuffer): Any = buf.value

  override def serialize(buf: LwwBuffer): Array[Byte] = {
    val row = new GenericInternalRow(4)
    row.update(0, buf.set)
    row.update(1, buf.seq)
    row.update(2, buf.tie)
    row.update(3, buf.value)
    bufProj.apply(row).getBytes
  }

  override def deserialize(bytes: Array[Byte]): LwwBuffer = {
    val row = new UnsafeRow(4)
    row.pointTo(bytes, bytes.length)
    val t = if (row.isNullAt(2)) null else row.getUTF8String(2).clone()
    val v = if (row.isNullAt(3)) null else row.getStruct(3, nFields).copy()
    new LwwBuffer(row.getBoolean(0), row.getLong(1), t, v)
  }

  override def withNewMutableAggBufferOffset(o: Int): LwwAgg = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): LwwAgg = copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): LwwAgg =
    copy(value = c(0), seq = c(1), tie = c(2))
  override def prettyName: String = "lww"
}

object LwwAgg {
  import org.apache.spark.sql.graftbridge.ColumnBridge
  /** Column API: lww(struct(payload...), seqCol) — first-seen tie-break. */
  def lww(value: Column, seq: Column): Column =
    ColumnBridge.column(
      LwwAgg(ColumnBridge.expression(value), ColumnBridge.expression(seq))
        .toAggregateExpression())

  /** Column API with a deterministic equal-seq tie-break (greatest `tie`
    * string wins — e.g. `input_file_name()` for file-path order).
    */
  def lww(value: Column, seq: Column, tie: Column): Column =
    ColumnBridge.column(
      LwwAgg(ColumnBridge.expression(value), ColumnBridge.expression(seq),
        ColumnBridge.expression(tie))
        .toAggregateExpression())
}
