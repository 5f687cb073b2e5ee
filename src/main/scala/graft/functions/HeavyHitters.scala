package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** SpaceSaving heavy-hitters summary (Metwally et al., "Efficient
  * computation of frequent and top-k elements in data streams"): at
  * most `capacity` counters; a new key evicts the minimum counter and
  * inherits its count as its error bound. Invariants per key:
  * `est >= true >= est - err`, and every key with true frequency
  * > N/capacity is guaranteed present.
  */
final class SpaceSavingSummary(val capacity: Int) {
  // key -> (estimated count, max overcount)
  val counters: mutable.HashMap[UTF8String, (Long, Long)] = mutable.HashMap.empty
  var total: Long = 0L

  // lazy min-queue: victims pop in O(1) amortized; one O(capacity)
  // rescan refills it roughly every `capacity` evictions (counts only
  // grow, so all keys at the vanished minimum surface together).
  // Entries gone stale (key promoted or already evicted) are discarded
  // at pop by checking the live counter. A per-eviction min SCAN made
  // the sketch 5x slower than the exact groupBy it exists to replace,
  // and a TreeMap-of-HashSet bucket queue was worse (head() walks the
  // never-shrinking hash table) — both soak-measured.
  private var minCount = 0L
  private val minQueue = new java.util.ArrayDeque[UTF8String]()

  /** Invalidate the min-queue (after merge/deserialize rebuilt the map). */
  private[functions] def invalidateMin(): Unit = minQueue.clear()

  private def nextVictim(): Long = {
    // returns the victim's count, removing it from `counters`
    while (true) {
      val k = minQueue.poll()
      if (k == null) {
        var m = Long.MaxValue
        for ((_, (c, _)) <- counters) if (c < m) m = c
        minCount = m
        for ((k2, (c, _)) <- counters) if (c == m) minQueue.add(k2)
      } else {
        counters.get(k) match {
          case Some((c, _)) if c == minCount =>
            counters.remove(k)
            return c
          case _ => // stale: promoted or evicted since enqueued
        }
      }
    }
    throw new IllegalStateException("unreachable")
  }

  def update(key: UTF8String): Unit = {
    total += 1
    counters.get(key) match {
      case Some((c, e)) => counters.update(key, (c + 1, e))
      case None if counters.size < capacity =>
        counters.update(key.clone(), (1L, 0L))
        if (counters.size == 1) minCount = 1L
      case None =>
        // evict a minimum counter; the newcomer inherits its count as
        // the overcount bound (it may have occurred that often)
        val minC = nextVictim()
        counters.update(key.clone(), (minC + 1, minC))
    }
  }

  /** Mergeable-summaries merge (Agarwal et al., PODS'12): absent keys
    * contribute the other side's minimum counter (their maximum
    * possible count there), then trim back to `capacity` keeping the
    * largest estimates. Error bounds add — `est - err <= true` is
    * preserved across arbitrary merge trees, so partial aggregation
    * order can't change the guarantee.
    */
  def merge(other: SpaceSavingSummary): Unit = {
    val minSelf = if (counters.size < capacity) 0L
      else counters.valuesIterator.map(_._1).min
    val minOther = if (other.counters.size < other.capacity) 0L
      else other.counters.valuesIterator.map(_._1).min
    val merged = mutable.HashMap.empty[UTF8String, (Long, Long)]
    for ((k, (c, e)) <- counters) {
      val (oc, oe) = other.counters.getOrElse(k, (minOther, minOther))
      merged.update(k, (c + oc, e + oe))
    }
    for ((k, (c, e)) <- other.counters if !counters.contains(k)) {
      merged.update(k, (c + minSelf, e + minSelf))
    }
    counters.clear()
    if (merged.size <= capacity) counters ++= merged
    else {
      // keep the top-capacity estimates; ties broken on key bytes so
      // the survivor set is deterministic under any partitioning
      val kept = merged.toSeq.sortBy { case (k, (c, _)) => (-c, k.toString) }.take(capacity)
      counters ++= kept
    }
    total += other.total
    invalidateMin()
  }
}

/** `space_saving_topk(key, capacity)`: TypedImperativeAggregate over a
  * string key producing `array<struct<key, est, err, total>>` sorted by
  * estimate — distributed approximate top-k with explicit error bounds,
  * O(capacity) state per partial instead of a full groupBy of the key
  * space. With `capacity >= distinct(key)` no counter ever evicts and
  * the estimates are EXACT (how the oracle-matched query runs); under
  * eviction the (est, err, total) triple quantifies the answer.
  *
  * The UDAF tier of the brief's extension ladder: partial summaries
  * build per partition, `merge` combines them on the reduce side —
  * the aggregation never shuffles raw keys, only fixed-size summaries.
  */
case class SpaceSavingAgg(
    child: Expression,
    capacity: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[SpaceSavingSummary] with UnaryLike[Expression] {

  require(capacity > 0 && capacity <= (1 << 20),
    "space_saving_topk: capacity must be in [1, 1048576]")

  override def createAggregationBuffer(): SpaceSavingSummary =
    new SpaceSavingSummary(capacity)

  override def update(buffer: SpaceSavingSummary, input: InternalRow): SpaceSavingSummary = {
    val v = child.eval(input)
    if (v != null) buffer.update(v.asInstanceOf[UTF8String])
    buffer
  }

  override def merge(buffer: SpaceSavingSummary, input: SpaceSavingSummary): SpaceSavingSummary = {
    buffer.merge(input)
    buffer
  }

  override def eval(buffer: SpaceSavingSummary): Any = {
    val rows = buffer.counters.toSeq
      .sortBy { case (k, (c, _)) => (-c, k.toString) }
      .map { case (k, (c, e)) => InternalRow(k, c, e, buffer.total) }
    new GenericArrayData(rows.toArray[Any])
  }

  override def serialize(buffer: SpaceSavingSummary): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buffer.capacity)
    out.writeLong(buffer.total)
    out.writeInt(buffer.counters.size)
    for ((k, (c, e)) <- buffer.counters) {
      val kb = k.getBytes
      out.writeInt(kb.length)
      out.write(kb)
      out.writeLong(c)
      out.writeLong(e)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): SpaceSavingSummary = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val s = new SpaceSavingSummary(in.readInt())
    s.total = in.readLong()
    val n = in.readInt()
    var i = 0
    while (i < n) {
      val kb = new Array[Byte](in.readInt())
      in.readFully(kb)
      val c = in.readLong()
      val e = in.readLong()
      s.counters.update(UTF8String.fromBytes(kb), (c, e))
      i += 1
    }
    s.invalidateMin()
    s
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): SpaceSavingAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SpaceSavingAgg =
    copy(inputAggBufferOffset = newOffset)

  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("key", StringType),
    StructField("est", LongType),
    StructField("err", LongType),
    StructField("total", LongType))), containsNull = false)

  override protected def withNewChildInternal(newChild: Expression): SpaceSavingAgg =
    copy(child = newChild)
  override def prettyName: String = "space_saving_topk"
}
