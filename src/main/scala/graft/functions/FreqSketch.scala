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
  * capacity-bounded sketch per partition, never the value domain. Like
  * the HLL tier in [[graft.operators.CorpusStats]], results are
  * approximate and merge-order-dependent in their low counts, so this is
  * unit-tested on its guarantees (exactness under capacity, containment
  * of true heavy hitters, error bounds) rather than oracle-hashed.
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
  extends TypedImperativeAggregate[java.util.HashMap[String, Array[Long]]]
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

  // value = Array(count, err)
  override def createAggregationBuffer(): java.util.HashMap[String, Array[Long]] =
    new java.util.HashMap[String, Array[Long]](capacity * 2)

  private def minEntry(
      buf: java.util.HashMap[String, Array[Long]]): java.util.Map.Entry[String, Array[Long]] = {
    var min: java.util.Map.Entry[String, Array[Long]] = null
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      if (min == null || e.getValue()(0) < min.getValue()(0)) min = e
    }
    min
  }

  private def offer(buf: java.util.HashMap[String, Array[Long]],
      item: String, count: Long, err: Long): Unit = {
    val cur = buf.get(item)
    if (cur != null) { cur(0) += count; cur(1) += err }
    else if (buf.size < capacity) buf.put(item, Array(count, err))
    else {
      // SpaceSaving eviction: the newcomer inherits the minimum's count
      // as overestimation error
      val min = minEntry(buf)
      val m = min.getValue()(0)
      buf.remove(min.getKey)
      buf.put(item, Array(m + count, m + err))
    }
  }

  override def update(buf: java.util.HashMap[String, Array[Long]],
      input: InternalRow): java.util.HashMap[String, Array[Long]] = {
    val v = child.eval(input)
    if (v != null) offer(buf, v.asInstanceOf[UTF8String].toString, 1L, 0L)
    buf
  }

  override def merge(b1: java.util.HashMap[String, Array[Long]],
      b2: java.util.HashMap[String, Array[Long]]): java.util.HashMap[String, Array[Long]] = {
    b2.forEach((item, ce) => offer(b1, item, ce(0), ce(1)))
    b1
  }

  override def eval(buf: java.util.HashMap[String, Array[Long]]): Any = {
    val entries = new Array[(String, Long, Long)](buf.size)
    var i = 0
    buf.forEach((item, ce) => { entries(i) = (item, ce(0), ce(1)); i += 1 })
    val sorted = entries.sortBy { case (item, c, _) => (-c, item) }.take(k)
    new GenericArrayData(sorted.map { case (item, c, e) =>
      InternalRow(UTF8String.fromString(item), c, e)
    })
  }

  override def serialize(buf: java.util.HashMap[String, Array[Long]]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.forEach { (item, ce) =>
      val b = item.getBytes(StandardCharsets.UTF_8)
      out.writeInt(b.length); out.write(b)
      out.writeLong(ce(0)); out.writeLong(ce(1))
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.HashMap[String, Array[Long]] = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len); in.readFully(b)
      buf.put(new String(b, StandardCharsets.UTF_8),
        Array(in.readLong(), in.readLong()))
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
