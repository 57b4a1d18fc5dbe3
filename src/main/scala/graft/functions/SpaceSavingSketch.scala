package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Space-Saving frequent-items summary (Metwally, Agrawal, El Abbadi,
  * "Efficient computation of frequent and top-k elements in data
  * streams", ICDT 2005): at most `capacity` counters; an unseen item
  * evicts the minimum counter and inherits its count as error bound.
  *
  * Mutable-buffer form: item -> (count, error). When
  * `capacity >= distinct(input)` no eviction ever happens and the sketch
  * is EXACT (error 0) — the regime the oracle-checked query runs in;
  * the approximate regime is covered by SketchSpec.
  */
class SpaceSavingBuffer(val capacity: Int) extends Serializable {
  val counters: mutable.HashMap[String, (Long, Long)] = mutable.HashMap.empty
  // (count, item) ordered index: eviction = `order.head`, every counter
  // update is O(log capacity). The naive minBy scan here was this
  // engine's first measured super-linear failure: in the approximate
  // regime each eviction paid O(capacity), so a 10x corpus turned q96b
  // into minutes of single-thread minimum-finding (found by the sf1
  // scaling run, SCALING.md). Ordering matches the old scan's
  // deterministic tie-break: smallest count, then smallest item.
  private val order = mutable.TreeSet.empty[(Long, String)]

  /** True once any eviction happened: the sketch has LEFT the exact
    * regime, silently saturating would otherwise be undiagnosable
    * (ADVICE r5: capacity headroom can vanish with corpus growth).
    * Surfaced per-entry as `sat` by [[SpaceSavingTopK]] so queries can
    * GATE on it.
    */
  var evicted: Boolean = false

  private def put(item: String, c: Long, e: Long, prevCount: Long): Unit = {
    if (prevCount >= 0) order.remove((prevCount, item))
    counters.update(item, (c, e))
    order.add((c, item))
  }

  /** Rebuilds the ordered index from `counters` — deserialization hook. */
  private[functions] def reindex(): Unit = {
    order.clear()
    counters.foreach { case (item, (c, _)) => order.add((c, item)) }
  }

  def add(item: String, weight: Long = 1L): Unit = {
    counters.get(item) match {
      case Some((c, e)) => put(item, c + weight, e, c)
      case None if counters.size < capacity =>
        put(item, weight, 0L, -1L)
      case None =>
        val (minC, minItem) = order.head
        order.remove((minC, minItem))
        counters.remove(minItem)
        put(item, minC + weight, minC, -1L)
        evicted = true
    }
  }

  /** Mergeable-summaries form (Agarwal et al., "Mergeable summaries";
    * Cafaro et al.'s parallel Space-Saving): items present in both sum
    * counts AND errors; an item absent from one side gets that side's
    * eviction OFFSET added to both count and error — once a sketch has
    * evicted, an absent item's true count is bounded by its minimum
    * counter (the classic Space-Saving property), before any eviction
    * by 0 — then the union is pruned back to `capacity` keeping the
    * largest counts (deterministic (cnt desc, item asc) tie-break).
    *
    * This preserves BOTH per-entry bounds (cnt - err <= true <= cnt)
    * across merges: the previous form routed absent items through
    * [[add]], which dropped the incoming buffer's per-entry error, so a
    * post-merge entry could surface err=0 ("cnt is exact") while
    * carrying eviction error (ADVICE r6, VERDICT r7 #3). In the exact
    * regime (neither side ever evicted, union fits capacity) this is a
    * plain map union with summed counts — bit-identical to before.
    */
  def merge(other: SpaceSavingBuffer): Unit = {
    // Exact-regime fast path (VERDICT r8 #2): neither side has evicted
    // (all offsets 0, all errors 0-preserving) and the union fits
    // capacity — fold `other` in with incremental O(log capacity) puts
    // instead of the full union-copy + sort + reindex(). Bit-identical
    // to the rebuild in this regime (plain map union, summed counts),
    // but O(n2 log cap) per merge instead of O((n1+n2) log(n1+n2)):
    // across P partial buffers the final reduce stops re-paying the
    // whole accumulated map per merge (the measured 3x on q96b).
    if (!evicted && !other.evicted) {
      var fresh = 0
      other.counters.foreach { kv => if (!counters.contains(kv._1)) fresh += 1 }
      if (counters.size + fresh <= capacity) {
        other.counters.foreach { case (item, (c2, e2)) =>
          counters.get(item) match {
            case Some((c, e)) => put(item, c + c2, e + e2, c)
            case None         => put(item, c2, e2, -1L)
          }
        }
        return
      }
    }
    val off1 = if (evicted) order.head._1 else 0L
    val off2 = if (other.evicted) other.order.head._1 else 0L
    val merged = mutable.HashMap.empty[String, (Long, Long)]
    counters.foreach { case (item, (c, e)) =>
      other.counters.get(item) match {
        case Some((c2, e2)) => merged.update(item, (c + c2, e + e2))
        case None           => merged.update(item, (c + off2, e + off2))
      }
    }
    other.counters.foreach { case (item, ce) =>
      if (!counters.contains(item))
        merged.update(item, (ce._1 + off1, ce._2 + off1))
    }
    evicted ||= other.evicted
    counters.clear()
    if (merged.size <= capacity) counters ++= merged
    else {
      evicted = true // the prune drops items: the sketch left the exact regime
      counters ++= merged.toSeq
        .sortBy { case (item, (c, _)) => (-c, item) }
        .take(capacity)
    }
    reindex()
  }
}

/** `space_saving_topk(col, capacity, k)` — Catalyst TypedImperativeAggregate
  * (the API tier for sketch aggregates: HLL, quantile digests, ...);
  * partial buffers serialize between partial and final aggregation.
  * Output: array<struct<item, cnt>> — top-k by (cnt desc, item asc).
  */
case class SpaceSavingTopK(
    child: Expression,
    capacity: Int,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[SpaceSavingBuffer] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType), StructField("cnt", LongType),
    StructField("err", LongType), StructField("sat", BooleanType))))

  override def createAggregationBuffer(): SpaceSavingBuffer =
    new SpaceSavingBuffer(capacity)

  override def update(buf: SpaceSavingBuffer, input: InternalRow): SpaceSavingBuffer = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[UTF8String].toString)
    buf
  }

  override def merge(buf: SpaceSavingBuffer, other: SpaceSavingBuffer): SpaceSavingBuffer = {
    buf.merge(other); buf
  }

  override def eval(buf: SpaceSavingBuffer): Any = {
    // err = the entry's inherited eviction error (cnt is exact iff 0);
    // sat = sketch-wide saturation flag (false <=> the WHOLE sketch ran
    // in the exact regime, so top-k selection itself is exact)
    val top = buf.counters.toSeq
      .sortBy { case (item, (c, _)) => (-c, item) }
      .take(k)
      .map { case (item, (c, e)) =>
        InternalRow(UTF8String.fromString(item), c, e, buf.evicted)
      }
    new GenericArrayData(top.toArray[Any])
  }

  override def serialize(buf: SpaceSavingBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.capacity)
    out.writeBoolean(buf.evicted)
    out.writeInt(buf.counters.size)
    buf.counters.foreach { case (item, (c, e)) =>
      out.writeUTF(item); out.writeLong(c); out.writeLong(e)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): SpaceSavingBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new SpaceSavingBuffer(in.readInt())
    buf.evicted = in.readBoolean()
    val n = in.readInt()
    var i = 0
    while (i < n) {
      val item = in.readUTF(); val c = in.readLong(); val e = in.readLong()
      buf.counters.update(item, (c, e))
      i += 1
    }
    buf.reindex()
    buf
  }

  override def withNewMutableAggBufferOffset(off: Int): SpaceSavingTopK =
    copy(mutableAggBufferOffset = off)
  override def withNewInputAggBufferOffset(off: Int): SpaceSavingTopK =
    copy(inputAggBufferOffset = off)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object SketchFunctions {
  /** Column API for the Space-Saving sketch. */
  def spaceSavingTopK(c: Column, capacity: Int, k: Int): Column = {
    import org.apache.spark.sql.graftshim.Shim.{column, expression}
    column(SpaceSavingTopK(expression(c), capacity, k).toAggregateExpression())
  }
}
