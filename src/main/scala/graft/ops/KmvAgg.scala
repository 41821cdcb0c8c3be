package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types.{DataType, LongType}

/** KMV buffer: the ≤k smallest DISTINCT hash values seen so far. */
final class KmvBuffer(val k: Int) {
  val set = new java.util.TreeSet[java.lang.Long]()
  def add(h: Long): Unit = {
    if (set.size < k) set.add(h)
    else if (h < set.last()) { if (set.add(h)) set.pollLast() }
  }
}

/** K-minimum-values distinct-count sketch as a [[TypedImperativeAggregate]]
  * (ObjectHashAggregate: hash-based, map-side combinable — the same
  * execution shape as [[graft.cdc.LwwAgg]]): keep the k smallest distinct
  * hash values; estimate
  *
  *   |D| ≈ (k−1) · H / h_k    (H = hash space size, h_k = kth minimum)
  *
  * with the exact count returned when fewer than k distinct hashes were
  * seen. Unlike HLL, the estimate is a pure deterministic function of the
  * input hash set — so with the engine's md5-derived 60-bit hash the DuckDB
  * oracle reproduces it CELL-EXACTLY (an oracled approximate sketch), and
  * the result is invariant to partitioning/merge order by construction.
  * Buffer is O(k) per group; merge is a bounded set union — distributive,
  * shuffle carries ≤k longs per group per map task.
  *
  * Input must be a 60-bit hash column (e.g. `DedupOps`-style
  * `conv(substring(md5(x),1,15),16,10)`); hashing stays outside the
  * aggregate so the oracle can mirror it.
  */
case class KmvAgg(
    hash: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KmvBuffer] {

  require(k >= 2, "kmv needs k >= 2")

  // reject non-bigint hash columns at ANALYSIS time, not as an
  // executor-side ClassCastException mid-job
  override def checkInputDataTypes(): TypeCheckResult =
    if (hash.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"kmv_distinct needs a BIGINT hash column (e.g. conv(substring(md5(x),1,15),16,10) " +
        s"cast to bigint); got ${hash.dataType.catalogString}")

  /** 60-bit hash space (md5-derived h60 inputs). */
  private val HashSpaceL = 1152921504606846976L // 2^60, exact (range guard)
  private val HashSpace = 1152921504606846976.0d // 2^60, double (estimator)

  override def children: Seq[Expression] = Seq(hash)
  override def nullable: Boolean = false
  override def dataType: DataType = LongType

  override def createAggregationBuffer(): KmvBuffer = new KmvBuffer(k)

  override def update(buf: KmvBuffer, input: InternalRow): KmvBuffer = {
    val h = hash.eval(input)
    if (h != null) {
      val hl = h.asInstanceOf[Long]
      // the estimator is only meaningful over the [0, 2^60) hash space the
      // md5-derived h60 produces — a full-range 64-bit hash (xxhash64)
      // passes the bigint type check but yields silently absurd estimates
      // (negative kth-min clamps to 1 → ~2.9e20); fail loudly instead.
      // Compared as LONGS: (2^60−1).toDouble rounds UP to exactly 2^60
      // (ulp is 128 at that magnitude), so a double compare would reject
      // the top 64 legitimate hash values
      if (hl < 0L || hl >= HashSpaceL)
        throw new IllegalArgumentException(
          s"kmv_distinct hash value $hl outside [0, 2^60) — use a 60-bit " +
            "hash, e.g. cast(conv(substring(md5(x),1,15),16,10) as bigint) " +
            "(xxhash64 is full-range 64-bit and will not work)")
      buf.add(hl)
    }
    buf
  }

  override def merge(b1: KmvBuffer, b2: KmvBuffer): KmvBuffer = {
    val it = b2.set.iterator()
    while (it.hasNext) b1.add(it.next())
    b1
  }

  override def eval(buf: KmvBuffer): Any =
    if (buf.set.size < k) buf.set.size.toLong
    else {
      val hk = math.max(buf.set.last(), 1L)
      math.floor((k - 1).toDouble * HashSpace / hk.toDouble).toLong
    }

  override def serialize(buf: KmvBuffer): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + 8 * buf.set.size)
    bb.putInt(buf.set.size)
    val it = buf.set.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): KmvBuffer = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new KmvBuffer(k)
    var i = 0
    while (i < n) { buf.set.add(bb.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): KmvAgg = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KmvAgg = copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): KmvAgg =
    copy(hash = c(0))
  override def prettyName: String = "kmv_distinct"
}

object KmvAgg {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** Column API: kmvDistinct(h60HashCol, k). */
  def kmvDistinct(hash: Column, k: Int = 256): Column =
    ColumnBridge.column(
      KmvAgg(ColumnBridge.expression(hash), k).toAggregateExpression())
}
