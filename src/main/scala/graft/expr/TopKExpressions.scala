package graft.expr

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.{GenericInternalRow, UnsafeProjection, UnsafeRow}
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
  * Insertion is binary-search + arraycopy — O(log k + k) worst case per
  * accepted row, O(1) compare-with-worst rejection for the common
  * (not-in-top-k) row. Payloads are OPAQUE to the ordering: any Catalyst
  * value rides along (the aggregate owns the codec).
  */
final class TopKBuffer(val k: Int) {
  var size: Int = 0
  val scores: Array[Double] = new Array[Double](k)
  val ids: Array[Long] = new Array[Long](k)
  val payloads: Array[Any] = new Array[Any](k)

  /** true if (s1, i1) ranks strictly better than (s2, i2). */
  @inline private def better(s1: Double, i1: Long, s2: Double, i2: Long): Boolean =
    s1 > s2 || (s1 == s2 && i1 < i2)

  def insert(score: Double, id: Long, payload: Any): Unit = {
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
}

/** `topk_agg(score, id, payload, k) -> array<struct<score, id, payload>>`:
  * the k best (score DESC, id ASC) rows of the group, best first. The
  * payload is ANY Catalyst type (a struct for multi-field serving
  * payloads — e.g. shard id + offset — a string, a long, ...) and rides
  * opaquely: it never participates in the ordering. Rows with a NULL or
  * NaN score or a NULL id are skipped; a NULL payload is carried as
  * NULL. Payload values cross the partial/final shuffle through an
  * UnsafeProjection codec for the declared payload type.
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
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("score", DoubleType, nullable = false),
    StructField("id", LongType, nullable = false),
    StructField("payload", payload.dataType, nullable = true))),
    containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    (score.dataType, id.dataType) match {
      case (DoubleType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (s, i) => TypeCheckResult.TypeCheckFailure(
        s"topk_agg expects (DOUBLE, BIGINT, <any payload>), got " +
          s"(${s.sql}, ${i.sql}, ${payload.dataType.sql})")
    }

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(buffer: TopKBuffer, input: InternalRow): TopKBuffer = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null) {
      val p = payload.eval(input)
      // copy: eval results can be views into reused row buffers
      buffer.insert(s.asInstanceOf[Double], i.asInstanceOf[Long],
        if (p == null) null else InternalRow.copyValue(p))
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

  // payload codec: one-field UnsafeRow per payload (handles every
  // Catalyst type uniformly; 0-length marks NULL payloads apart via a
  // flag byte)
  @transient private lazy val payloadProj =
    UnsafeProjection.create(Array(payload.dataType))
  @transient private lazy val payloadRowBuf = new GenericInternalRow(1)

  override def serialize(buffer: TopKBuffer): Array[Byte] = {
    val entries = new Array[Array[Byte]](buffer.size)
    var total = 1 + 4 + 4
    var i = 0
    while (i < buffer.size) {
      val p = buffer.payloads(i)
      val pb =
        if (p == null) Array.emptyByteArray
        else {
          payloadRowBuf.update(0, p)
          // the projection reuses its result buffer: copy the row bytes
          payloadProj(payloadRowBuf).copy().getBytes
        }
      entries(i) = pb
      total += 8 + 8 + 1 + 4 + pb.length
      i += 1
    }
    val bb = java.nio.ByteBuffer.allocate(total)
    bb.put(2.toByte).putInt(buffer.k).putInt(buffer.size)
    i = 0
    while (i < buffer.size) {
      bb.putDouble(buffer.scores(i)).putLong(buffer.ids(i))
      bb.put(if (buffer.payloads(i) == null) 0.toByte else 1.toByte)
      bb.putInt(entries(i).length).put(entries(i))
      i += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val version = bb.get()
    require(version == 2, s"unknown topk buffer version $version")
    val buf = new TopKBuffer(bb.getInt())
    val n = bb.getInt()
    // entries were serialized in sorted order — replay through insert to
    // keep the invariant without trusting the wire
    var i = 0
    while (i < n) {
      val s = bb.getDouble()
      val id = bb.getLong()
      val hasPayload = bb.get() == 1.toByte
      val len = bb.getInt()
      val p: Any =
        if (!hasPayload) { bb.position(bb.position() + len); null }
        else {
          val pb = new Array[Byte](len)
          bb.get(pb)
          val row = new UnsafeRow(1)
          row.pointTo(pb, len)
          InternalRow.copyValue(row.get(0, payload.dataType))
        }
      buf.insert(s, id, p)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKAgg =
    copy(score = newChildren(0), id = newChildren(1), payload = newChildren(2))
  override def prettyName: String = "topk_agg"
}
