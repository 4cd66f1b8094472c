package graft.expressions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import java.util.{Comparator, PriorityQueue}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, RowOrdering, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{GenericArrayData, TypeUtils}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Native grouped top-k: `top_k(score, payload, k)` keeps the k
  * strongest `(score, payload)` entries per group in a bounded binary
  * heap and returns them as `array<struct<score, payload>>`, strongest
  * first. Order is total and deterministic: score DESC, payload ASC as
  * the tie-break (SURVEY §7.3 escape hatch (b): custom Catalyst
  * function before UDFs).
  *
  * Why not `row_number() over (partition by g order by s desc) <= k`?
  * The window formulation shuffles EVERY row of every group to one
  * task, then sorts the whole group — O(n log n) per group, with one
  * group's whole row set resident on one executor. This aggregate is a
  * [[TypedImperativeAggregate]], so it runs as ObjectHashAggregate
  * with a PARTIAL pass before the exchange: each map task keeps at
  * most k entries per group (O(n log k) heap updates), the shuffle
  * carries ≤ k·groups·tasks entries instead of n rows, and the final
  * merge is a k-way heap union. At 100 TB that is the difference
  * between a window sort over the corpus and a small fixed-size
  * sketch per group — the same partial/merge shape every production
  * top-k (Druid, Pinot, ClickHouse) uses.
  *
  * The payload is any orderable type — atomic or struct (ordering via
  * Catalyst's interpreted ordering, so ties break identically to the
  * SQL oracle's `order by score desc, payload` row_number); buffers
  * serialize for exchange as length-prefixed (double, UnsafeRow)
  * pairs.
  *
  * NULL contract: rows whose score OR payload is NULL are ignored —
  * top_k over a group of n non-null rows returns min(k, n) entries.
  * This diverges from `row_number() ... order by s desc` (NULLS LAST)
  * only when a group has fewer than k non-null-score rows AND some
  * null-score rows: the window would pad with them, top_k will not
  * (TopKSpec pins this; a null can never displace a real candidate in
  * either formulation).
  */
case class TopKAggregate(
    score: Expression,
    payload: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKAggregate.Buffer] {

  import TopKAggregate.{Buffer, Entry}

  override def children: Seq[Expression] = Seq(score, payload)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("score", DoubleType, nullable = false),
      StructField("payload", payload.dataType, nullable = false))),
    containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = {
    if (k <= 0) {
      TypeCheckResult.TypeCheckFailure(s"top_k needs k > 0, got $k")
    } else if (score.dataType != DoubleType) {
      TypeCheckResult.TypeCheckFailure(
        s"top_k score must be double, got ${score.dataType}")
    } else if (!RowOrdering.isOrderable(payload.dataType)) {
      TypeCheckResult.TypeCheckFailure(
        s"top_k payload type ${payload.dataType} is not orderable")
    } else TypeCheckResult.TypeCheckSuccess
  }

  @transient private lazy val payloadOrd: Ordering[Any] =
    TypeUtils.getInterpretedOrdering(payload.dataType)

  /** Heap comparator, WEAKEST entry first (so `peek` is the eviction
    * candidate): lower score is weaker; on equal scores the LARGER
    * payload is weaker (final order tie-breaks payload ascending). */
  @transient private lazy val weakestFirst: Comparator[Entry] =
    new Comparator[Entry] {
      override def compare(a: Entry, b: Entry): Int = {
        val c = java.lang.Double.compare(a.score, b.score)
        if (c != 0) c else payloadOrd.compare(b.payload, a.payload)
      }
    }

  override def createAggregationBuffer(): Buffer =
    new Buffer(new PriorityQueue[Entry](math.max(k, 1), weakestFirst))

  override def update(buffer: Buffer, input: InternalRow): Buffer = {
    val s = score.eval(input)
    val p = payload.eval(input)
    if (s != null && p != null) {
      val e = Entry(s.asInstanceOf[Double], InternalRow.copyValue(p))
      offer(buffer, e)
    }
    buffer
  }

  override def merge(buffer: Buffer, other: Buffer): Buffer = {
    val it = other.heap.iterator()
    while (it.hasNext) offer(buffer, it.next())
    buffer
  }

  private def offer(buffer: Buffer, e: Entry): Unit = {
    val h = buffer.heap
    if (h.size < k) { h.add(e): Unit }
    else if (weakestFirst.compare(e, h.peek()) > 0) { h.poll(); h.add(e): Unit }
  }

  override def eval(buffer: Buffer): Any = {
    val entries = new Array[Entry](buffer.heap.size)
    buffer.heap.toArray(entries)
    java.util.Arrays.sort(entries, weakestFirst.reversed())
    new GenericArrayData(entries.map(e => InternalRow(e.score, e.payload)))
  }

  @transient private lazy val payloadProj =
    UnsafeProjection.create(Array[DataType](payload.dataType))
  @transient private lazy val payloadRow = new UnsafeRow(1)

  override def serialize(buffer: Buffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buffer.heap.size)
    val it = buffer.heap.iterator()
    while (it.hasNext) {
      val e = it.next()
      out.writeDouble(e.score)
      val bytes = payloadProj(InternalRow(e.payload)).getBytes
      out.writeInt(bytes.length)
      out.write(bytes)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(storage: Array[Byte]): Buffer = {
    val in = new DataInputStream(new ByteArrayInputStream(storage))
    val buffer = createAggregationBuffer()
    val n = in.readInt()
    var i = 0
    while (i < n) {
      val s = in.readDouble()
      val len = in.readInt()
      val bytes = new Array[Byte](len)
      in.readFully(bytes)
      payloadRow.pointTo(bytes, len)
      // copyValue: the UnsafeRow's value points into `bytes`; entries
      // must own their storage once the row is re-pointed.
      buffer.heap.add(
        Entry(s, InternalRow.copyValue(payloadRow.get(0, payload.dataType)))): Unit
      i += 1
    }
    buffer
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKAggregate =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKAggregate =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKAggregate =
    copy(score = newChildren(0), payload = newChildren(1))

  override def prettyName: String = "top_k"
}

object TopKAggregate {
  final case class Entry(score: Double, payload: Any)
  final class Buffer(val heap: PriorityQueue[Entry])

  /** `top_k(score, payload, k)` as a Column aggregate: strongest-first
    * `array<struct<score, payload>>`, ties broken payload-ascending. */
  def top_k(score: Column, payload: Column, k: Int): Column =
    Bridge.column(
      TopKAggregate(Bridge.expression(score), Bridge.expression(payload), k)
        .toAggregateExpression())
}
