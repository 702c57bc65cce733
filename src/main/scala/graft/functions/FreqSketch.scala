package graft.functions

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** SpaceSaving summary state: item → (count, err) plus a count-ordered
  * index so the eviction victim (the current minimum) is found in
  * O(log capacity) instead of a full O(capacity) scan — on a tail-heavy
  * stream EVERY unseen item past capacity evicts, so the scan variant
  * degrades to O(n·capacity) exactly when the sketch matters most.
  * Index invariant: `byCount(c)` holds every item whose count is `c`;
  * insertion-ordered sets make victim choice deterministic for a given
  * arrival order. */
final class FreqSketchState(val capacity: Int) {
  val items = new java.util.HashMap[String, Array[Long]](capacity * 2)
  val byCount = new java.util.TreeMap[Long, java.util.LinkedHashSet[String]]()

  private def indexAdd(item: String, c: Long): Unit = {
    var s = byCount.get(c)
    if (s == null) { s = new java.util.LinkedHashSet[String](); byCount.put(c, s) }
    s.add(item)
  }

  private def indexRemove(item: String, c: Long): Unit = {
    val s = byCount.get(c)
    s.remove(item)
    if (s.isEmpty) byCount.remove(c)
  }

  def offer(item: String, count: Long, err: Long): Unit = {
    val cur = items.get(item)
    if (cur != null) {
      indexRemove(item, cur(0))
      cur(0) += count; cur(1) += err
      indexAdd(item, cur(0))
    } else if (items.size < capacity) {
      items.put(item, Array(count, err))
      indexAdd(item, count)
    } else {
      // SpaceSaving eviction: the newcomer inherits the minimum's count
      // as overestimation error
      val minSet = byCount.firstEntry()
      val victim = minSet.getValue.iterator().next()
      val m = minSet.getKey
      indexRemove(victim, m)
      items.remove(victim)
      items.put(item, Array(m + count, m + err))
      indexAdd(item, m + count)
    }
  }
}

/** SpaceSaving heavy hitters (Metwally et al. 2005, public algorithm) as
  * a native mergeable aggregate — the sketch-tier answer to "what are
  * the most frequent values" when the domain is too large for the exact
  * `groupBy(value).count` + top-k (whose first shuffle is O(distinct)).
  *
  * State: at most `capacity` counters; an unseen item evicts the current
  * minimum and inherits its count (+1), so every kept count OVERESTIMATES
  * by at most the evicted minimum (tracked per entry as `err`). Merged
  * partials keep the summary property (counts add; the result of merging
  * two SpaceSaving summaries then trimming to capacity is again a valid
  * summary of the union — the standard parallel-merge construction). Any
  * item with true frequency > n/capacity is guaranteed present.
  *
  * Scale shape: map-side partial summaries of O(capacity) entries per
  * task collapse before the exchange — the shuffle carries one
  * capacity-bounded sketch per partition, never the value domain; the
  * count-ordered index keeps per-update cost O(log capacity) even on
  * all-tail streams. Like the HLL tier in
  * [[graft.operators.CorpusStats]], results are approximate and
  * merge-order-dependent in their low counts, so this is unit-tested on
  * its guarantees (exactness under capacity, containment of true heavy
  * hitters, error bounds) rather than oracle-hashed.
  *
  * Output: `array<struct<item string, count long, err long>>` sorted by
  * (count desc, item asc), truncated to `k`. True count of `item` lies
  * in `[count − err, count]`.
  */
case class HeavyHittersAgg(
    child: Expression,
    k: Int,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[FreqSketchState]
  with UnaryLike[Expression] {

  require(k >= 1, s"heavy hitters need k >= 1, got $k")
  require(capacity >= k,
    s"capacity ($capacity) must be >= k ($k) — capacity bounds the error n/capacity")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${child.dataType}")
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType, nullable = false),
    StructField("count", LongType, nullable = false),
    StructField("err", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "heavy_hitters"

  override def createAggregationBuffer(): FreqSketchState =
    new FreqSketchState(capacity)

  override def update(buf: FreqSketchState, input: InternalRow): FreqSketchState = {
    val v = child.eval(input)
    if (v != null) buf.offer(v.asInstanceOf[UTF8String].toString, 1L, 0L)
    buf
  }

  override def merge(b1: FreqSketchState, b2: FreqSketchState): FreqSketchState = {
    b2.items.forEach((item, ce) => b1.offer(item, ce(0), ce(1)))
    b1
  }

  override def eval(buf: FreqSketchState): Any = {
    val entries = new Array[(String, Long, Long)](buf.items.size)
    var i = 0
    buf.items.forEach((item, ce) => { entries(i) = (item, ce(0), ce(1)); i += 1 })
    val sorted = entries.sortBy { case (item, c, _) => (-c, item) }.take(k)
    new GenericArrayData(sorted.map { case (item, c, e) =>
      InternalRow(UTF8String.fromString(item), c, e)
    })
  }

  override def serialize(buf: FreqSketchState): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(buf.items.size)
    buf.items.forEach { (item, ce) =>
      val b = item.getBytes(StandardCharsets.UTF_8)
      out.writeInt(b.length); out.write(b)
      out.writeLong(ce(0)); out.writeLong(ce(1))
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): FreqSketchState = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len); in.readFully(b)
      // offer() rebuilds the count index; n ≤ capacity so no evictions
      val item = new String(b, StandardCharsets.UTF_8)
      buf.offer(item, in.readLong(), in.readLong())
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): HeavyHittersAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HeavyHittersAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): HeavyHittersAgg =
    copy(child = newChild)
}

object FreqSketch {
  /** Top-k frequent strings with SpaceSaving error bounds:
    * `array<struct<item, count, err>>`, count desc. `capacity` trades
    * memory (O(capacity) per group per task) for error (≤ n/capacity). */
  def heavyHitters(c: Column, k: Int, capacity: Int = 0): Column = {
    val cap = if (capacity > 0) capacity else math.max(4 * k, 64)
    ColumnBridge.column(
      HeavyHittersAgg(ColumnBridge.expression(c.cast("string")), k, cap)
        .toAggregateExpression())
  }
}
