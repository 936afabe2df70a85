package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries heavy hitters as a native `TypedImperativeAggregate` —
  * the bounded-memory frequency summary (Misra & Gries 1982; the
  * "MG summary" of Agarwal et al.'s mergeable-summaries line) for the
  * 100 TB regime where a full `groupBy(token).count()` table cannot be
  * held or broadcast: at most k-1 counters per partial state, merged
  * associatively through Spark's normal partial/final aggregation path.
  *
  * Guarantee (what SketchesSpec pins, since the surviving counter SET
  * depends on encounter order and is not oracle-hashable): after
  * processing N items, every item with true frequency > N/k is present,
  * and each reported count underestimates the true count by at most
  * N/k (reported <= true always). The merge subtracts the k-th largest
  * combined count (the standard mergeable-summaries step), preserving
  * the same bound.
  *
  * This is the one Catalyst extension class the engine's native tier
  * didn't yet demonstrate: an arbitrary-state imperative aggregate
  * (object buffer + explicit serde), beside the codegen'd scalar
  * expressions (TextStats, MinHashSig, DotProduct), the typed
  * `Aggregator` (ReviewStatsAgg), the custom physical operator
  * (TopKPerKey), and the rewrite rule (CountInClassRule).
  */
case class MisraGries(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, Long]] {

  require(k >= 2, "MisraGries needs k >= 2")

  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MisraGries =
    copy(child = newChildren.head)

  override def withNewMutableAggBufferOffset(o: Int): MisraGries =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MisraGries =
    copy(inputAggBufferOffset = o)

  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType, nullable = false),
    StructField("count", LongType, nullable = false))))

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty

  override def update(buf: mutable.HashMap[String, Long],
      input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v == null) return buf
    val s = v.toString
    buf.get(s) match {
      case Some(c) => buf.update(s, c + 1)
      case None if buf.size < k - 1 => buf.update(s, 1L)
      case None =>
        // classic MG step: a new item against a full summary decrements
        // every counter (k-way cancellation); zeros drop out
        val dead = mutable.ArrayBuffer.empty[String]
        buf.keysIterator.foreach { key =>
          val c = buf(key) - 1
          if (c == 0) dead += key else buf.update(key, c)
        }
        dead.foreach(buf.remove)
    }
    buf
  }

  override def merge(buf: mutable.HashMap[String, Long],
      other: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    other.foreach { case (s, c) =>
      buf.update(s, buf.getOrElse(s, 0L) + c)
    }
    if (buf.size > k - 1) {
      // mergeable-summaries step: subtract the k-th largest count,
      // keep strictly positive — error stays <= N/k after any merge tree
      val kth = buf.valuesIterator.toArray.sorted(Ordering[Long].reverse)
        .apply(k - 1)
      val dead = mutable.ArrayBuffer.empty[String]
      buf.keysIterator.foreach { key =>
        val c = buf(key) - kth
        if (c <= 0) dead += key else buf.update(key, c)
      }
      dead.foreach(buf.remove)
    }
    buf
  }

  override def eval(buf: mutable.HashMap[String, Long]): Any = {
    val rows = buf.toSeq.sortBy { case (s, c) => (-c, s) }.map { case (s, c) =>
      InternalRow(UTF8String.fromString(s), c)
    }
    new GenericArrayData(rows.toArray[Any])
  }

  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    // length-prefixed UTF-8 (writeUTF caps items at 64 KiB encoded and
    // throws on longer — a pathological crawl token would fail shuffle
    // serde)
    buf.foreach { case (s, c) =>
      val b = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out.writeInt(b.length); out.write(b); out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[String, Long]
    (1 to n).foreach { _ =>
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      val s = new String(b, java.nio.charset.StandardCharsets.UTF_8)
      buf.update(s, in.readLong())
    }
    buf
  }
}

object MisraGries {
  /** `array<struct<item,count>>` of (at most k-1) heavy-hitter
    * candidates, counts lower-bounded within N/k.
    */
  def heavyHitters(c: Column, k: Int): Column =
    GraftBridge.column(
      MisraGries(GraftBridge.expression(c), k).toAggregateExpression())
}
