package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries buffer: at most `cap` (item → lower-bound count) counters. */
final class MgBuffer(val cap: Int) {
  val counts = new java.util.HashMap[String, Long]()

  /** Standard MG step: increment if tracked; insert at 1 if a counter is
    * free; else decrement every counter (the new item's implicit 1 cancels
    * against the shared decrement, so it is never inserted).
    */
  def add(item: String): Unit = {
    val cur = counts.get(item)
    if (cur != 0L || counts.containsKey(item)) counts.put(item, cur + 1L)
    else if (counts.size < cap) counts.put(item, 1L)
    else {
      val it = counts.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        if (e.getValue == 1L) it.remove() else e.setValue(e.getValue - 1L)
      }
    }
  }

  /** Mergeable-summaries merge (Agarwal et al., PODS'12): sum counts, and
    * if more than `cap` survive, subtract the (cap+1)-th largest count from
    * all and drop the non-positive — the error bound adds, the
    * freq > n/(cap+1) superset guarantee is preserved.
    */
  def mergeIn(other: MgBuffer): Unit = {
    val it = other.counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      counts.merge(e.getKey, e.getValue, (a, b) => a + b)
    }
    if (counts.size > cap) {
      val vals = new Array[Long](counts.size)
      var i = 0
      val vi = counts.values().iterator()
      while (vi.hasNext) { vals(i) = vi.next(); i += 1 }
      java.util.Arrays.sort(vals)
      val pivot = vals(vals.length - cap - 1) // (cap+1)-th largest
      val ei = counts.entrySet().iterator()
      while (ei.hasNext) {
        val e = ei.next()
        if (e.getValue <= pivot) ei.remove() else e.setValue(e.getValue - pivot)
      }
    }
  }
}

/** Misra–Gries frequent-items sketch as a [[TypedImperativeAggregate]]
  * (ObjectHashAggregate — hash-based, map-side combinable, the same
  * execution shape as [[KmvAgg]]). With `k` counters the surviving items
  * are a GUARANTEED superset of every item with frequency > n/(k+1) —
  * the one-pass half of the classic two-pass exact heavy-hitters plan
  * ([[FreqOps.heavyHitters]] is the full operator). Buffer is O(k) per
  * group regardless of input size; merge is the PODS'12 mergeable-summary
  * combine, so the shuffle carries ≤k (item, count) pairs per map task
  * and the result is partitioning-independent as a SET (exactly what the
  * recount pass consumes).
  *
  * Returns the candidate items sorted lexicographically (deterministic
  * output array; the counts are lower bounds and intentionally not
  * exposed — the second pass recounts exactly).
  */
case class MgAgg(
    item: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MgBuffer] {

  require(k >= 1, "mg_candidates needs k >= 1")

  override def checkInputDataTypes(): TypeCheckResult =
    if (item.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"mg_candidates needs a STRING item column (cast first); " +
        s"got ${item.dataType.catalogString}")

  override def children: Seq[Expression] = Seq(item)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def createAggregationBuffer(): MgBuffer = new MgBuffer(k)

  override def update(buf: MgBuffer, input: InternalRow): MgBuffer = {
    val v = item.eval(input)
    // nulls are not items (they can never be a heavy hitter; the recount
    // pass inner-joins on the candidate set, so the semantics agree)
    if (v != null) buf.add(v.toString) // copy out of the reused row buffer
    buf
  }

  override def merge(b1: MgBuffer, b2: MgBuffer): MgBuffer = {
    b1.mergeIn(b2); b1
  }

  override def eval(buf: MgBuffer): Any = {
    val items = new Array[String](buf.counts.size)
    buf.counts.keySet().toArray(items)
    java.util.Arrays.sort(items, java.util.Comparator.naturalOrder[String]())
    new GenericArrayData(items.map(UTF8String.fromString))
  }

  override def serialize(buf: MgBuffer): Array[Byte] = {
    var bytes = 4
    val entries = new java.util.ArrayList(buf.counts.entrySet())
    val enc = new Array[Array[Byte]](entries.size())
    var i = 0
    while (i < entries.size()) {
      enc(i) = entries.get(i).getKey.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      bytes += 4 + enc(i).length + 8
      i += 1
    }
    val bb = java.nio.ByteBuffer.allocate(bytes)
    bb.putInt(entries.size())
    i = 0
    while (i < entries.size()) {
      bb.putInt(enc(i).length); bb.put(enc(i)); bb.putLong(entries.get(i).getValue)
      i += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): MgBuffer = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new MgBuffer(k)
    var i = 0
    while (i < n) {
      val len = bb.getInt
      val sb = new Array[Byte](len)
      bb.get(sb)
      buf.counts.put(new String(sb, java.nio.charset.StandardCharsets.UTF_8), bb.getLong)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): MgAgg = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MgAgg = copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): MgAgg =
    copy(item = c(0))
  override def prettyName: String = "mg_candidates"
}

object MgAgg {
  /** Column API: mgCandidates(itemCol, k) → array&lt;string&gt; candidate set. */
  def mgCandidates(item: Column, k: Int): Column =
    ColumnBridge.column(
      MgAgg(ColumnBridge.expression(item), k).toAggregateExpression())
}

/** Frequency operators for large-scale pipelines. */
object FreqOps {

  /** EXACT heavy hitters: every value of `itemCol` (cast to string) with
    * frequency strictly greater than `phi · n`, with its exact count —
    * the classic two-pass plan:
    *
    *  1. ONE pass computes n and a Misra–Gries candidate sketch with
    *     ⌈1/phi⌉ counters — a guaranteed superset of the answer in O(1/phi)
    *     bounded memory per task, regardless of item cardinality (a plain
    *     groupBy-count would shuffle EVERY distinct item; at 100 TB the
    *     long tail is the whole job).
    *  2. The ≤⌈1/phi⌉ candidates broadcast back and ONE more pass recounts
    *     exactly — only candidate rows survive the broadcast semi-join, so
    *     the final shuffle carries ≤⌈1/phi⌉ groups.
    *
    * The only driver transfer is the O(1/phi)-bounded (n, candidates)
    * row — same class as the bounded BPE-vocab collect. Null items count
    * toward n but never qualify (a null is not a value). Result is exact,
    * so the DuckDB `HAVING count(*) > phi*n` oracle is cell-checkable.
    */
  def heavyHitters(df: DataFrame, itemCol: String, phi: Double): DataFrame = {
    require(phi > 0.0 && phi < 1.0, s"phi must be in (0,1), got $phi")
    val k = math.ceil(1.0 / phi).toInt
    val item = col(itemCol).cast("string").as("item")
    val stats = df.select(item)
      .agg(count(lit(1)).as("n"), MgAgg.mgCandidates(col("item"), k).as("cand"))
      .head()
    val n = stats.getLong(0)
    val spark = df.sparkSession
    import spark.implicits._
    val candDf = stats.getSeq[String](1).toDF("item")
    df.select(item)
      .join(broadcast(candDf), "item")
      .groupBy("item").agg(count(lit(1)).as("freq"))
      // phi*n evaluated the same way the SQL oracle does (double product
      // of the literal and the exact integer count)
      .filter(col("freq") > lit(phi * n))
  }
}
