package graft.expr

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded top-k buffer ordered by (score DESC, id ASC): at most `k`
  * (score, id, payload) triples, kept sorted best-first. The ordering is
  * total and deterministic (ties broken by id), so any partitioning /
  * merge order yields the identical final top-k — the property that
  * makes per-partition partial aggregation safe.
  *
  * This is THE serving-shape primitive for batched ANN: a
  * `groupBy(query).agg(topk_agg(...))` plans as a partial aggregate that
  * keeps ONLY k rows per (query, partition) — each partition ships k
  * rows per query instead of its whole scored candidate set, and no
  * stage ever sorts all of a query's candidates (the `row_number()`
  * window alternative funnels every scored row of a query into one task
  * and sorts them — the 100 TB scale-killer this replaces).
  *
  * Insertion is binary-search + arraycopy over arrays of primitives —
  * O(log k + k) worst case per accepted row, O(1) compare-with-worst
  * rejection for the common (not-in-top-k) row.
  */
final class TopKBuffer(val k: Int) {
  var size: Int = 0
  val scores: Array[Double] = new Array[Double](k)
  val ids: Array[Long] = new Array[Long](k)
  val payloads: Array[Long] = new Array[Long](k)

  /** true if (s1, i1) ranks strictly better than (s2, i2). */
  @inline private def better(s1: Double, i1: Long, s2: Double, i2: Long): Boolean =
    s1 > s2 || (s1 == s2 && i1 < i2)

  def insert(score: Double, id: Long, payload: Long): Unit = {
    // NaN scores are REJECTED outright. Merely "ranking them last" is not
    // enough: a NaN that slipped into a not-yet-full buffer would compare
    // better(x, NaN) = false against every later row, parking itself in
    // the worst slot and blocking all further inserts — making the result
    // insertion-order dependent, which breaks the merge-order invariance
    // this buffer exists to guarantee.
    if (score != score) return
    if (size == k && !better(score, id, scores(size - 1), ids(size - 1))) return
    // binary search for the insertion point (first slot this entry beats)
    var lo = 0
    var hi = size
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (better(score, id, scores(mid), ids(mid))) hi = mid else lo = mid + 1
    }
    val pos = lo
    if (pos >= k) return
    val moveTo = math.min(size + 1, k) - 1
    if (moveTo > pos) {
      System.arraycopy(scores, pos, scores, pos + 1, moveTo - pos)
      System.arraycopy(ids, pos, ids, pos + 1, moveTo - pos)
      System.arraycopy(payloads, pos, payloads, pos + 1, moveTo - pos)
    }
    scores(pos) = score
    ids(pos) = id
    payloads(pos) = payload
    if (size < k) size += 1
  }

  def mergeFrom(other: TopKBuffer): Unit = {
    var i = 0
    while (i < other.size) {
      insert(other.scores(i), other.ids(i), other.payloads(i))
      i += 1
    }
  }

  def toBytes: Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(1 + 4 + 4 + size * 24)
    bb.put(1.toByte).putInt(k).putInt(size)
    var i = 0
    while (i < size) {
      bb.putDouble(scores(i)).putLong(ids(i)).putLong(payloads(i))
      i += 1
    }
    bb.array()
  }
}

object TopKBuffer {
  def fromBytes(bytes: Array[Byte]): TopKBuffer = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val version = bb.get()
    require(version == 1, s"unknown topk buffer version $version")
    val buf = new TopKBuffer(bb.getInt())
    val n = bb.getInt()
    // entries were serialized in sorted order — replay through insert to
    // keep the invariant without trusting the wire
    var i = 0
    while (i < n) {
      buf.insert(bb.getDouble(), bb.getLong(), bb.getLong())
      i += 1
    }
    buf
  }
}

/** `topk_agg(score, id, payload, k) -> array<struct<score, id, payload>>`:
  * the k best (score DESC, id ASC) rows of the group, best first.
  * Rows with a NULL or NaN score or a NULL id are skipped (a NULL
  * payload reads as 0).
  */
case class TopKAgg(
    score: Expression,
    id: Expression,
    payload: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuffer] {
  require(k >= 1 && k <= 100000, s"k must be in [1, 100000], got $k")

  override def children: Seq[Expression] = Seq(score, id, payload)
  override def nullable: Boolean = false
  override def dataType: DataType = TopKAgg.schema

  override def checkInputDataTypes(): TypeCheckResult =
    (score.dataType, id.dataType, payload.dataType) match {
      case (DoubleType, LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (s, i, p) => TypeCheckResult.TypeCheckFailure(
        s"topk_agg expects (DOUBLE, BIGINT, BIGINT), got " +
          s"(${s.sql}, ${i.sql}, ${p.sql})")
    }

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(buffer: TopKBuffer, input: InternalRow): TopKBuffer = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null) {
      val p = payload.eval(input)
      buffer.insert(s.asInstanceOf[Double], i.asInstanceOf[Long],
        if (p == null) 0L else p.asInstanceOf[Long])
    }
    buffer
  }

  override def merge(buffer: TopKBuffer, other: TopKBuffer): TopKBuffer = {
    buffer.mergeFrom(other)
    buffer
  }

  override def eval(buffer: TopKBuffer): Any = {
    val rows = new Array[Any](buffer.size)
    var i = 0
    while (i < buffer.size) {
      rows(i) = new GenericInternalRow(
        Array[Any](buffer.scores(i), buffer.ids(i), buffer.payloads(i)))
      i += 1
    }
    new GenericArrayData(rows)
  }

  override def serialize(buffer: TopKBuffer): Array[Byte] = buffer.toBytes
  override def deserialize(bytes: Array[Byte]): TopKBuffer =
    TopKBuffer.fromBytes(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKAgg =
    copy(score = newChildren(0), id = newChildren(1), payload = newChildren(2))
  override def prettyName: String = "topk_agg"
}

object TopKAgg {
  val schema: DataType = ArrayType(StructType(Seq(
    StructField("score", DoubleType, nullable = false),
    StructField("id", LongType, nullable = false),
    StructField("payload", LongType, nullable = false))), containsNull = false)
}
