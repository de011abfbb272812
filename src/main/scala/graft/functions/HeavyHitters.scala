package graft.functions

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries / Space-Saving heavy-hitters summary (Misra & Gries 1982;
  * merge rule from Agarwal et al. 2013, "Mergeable Summaries"). Bounded
  * state: at most `capacity` counters regardless of input size.
  *
  * Invariant after any interleaving of add() and merge(): for every key
  * k, `est(k) <= true(k)` and `true(k) - est(k) <= dropped`, where
  * `dropped` is the summary's accumulated decrement mass — so any key
  * with `true(k) > dropped` is GUARANTEED present, and
  * `dropped <= n / (capacity + 1)` (each decrement step removes
  * capacity+1 units of count mass from an n-row stream; the merge rule
  * preserves this bound on the combined stream).
  *
  * The operator built on top ([[graft.operators.HeavyHitters]]) uses the
  * summary only to nominate candidates, then exact-counts them in a
  * second bounded-key pass and CHECKS the guarantee — the sketch can
  * therefore never silently corrupt a result, only widen the candidate
  * pass.
  */
private[graft] final class MgSummary(val capacity: Int) {
  val counts = new mutable.HashMap[Any, Long]()
  /** Total count mass removed by decrement/offset steps — the upper
    * bound on any key's undercount (and on a missed key's true count).
    */
  var dropped: Long = 0L

  def add(key: Any): Unit = counts.get(key) match {
    case Some(c) => counts.update(key, c + 1)
    case None =>
      if (counts.size < capacity) counts.update(key, 1L)
      else {
        // classic MG step: the new key and every counter give up one
        // unit — amortized O(1), each decrement pays for an increment
        counts.mapValuesInPlace((_, v) => v - 1)
        counts.filterInPlace((_, v) => v > 0)
        dropped += 1
      }
  }

  /** Mergeable-summaries rule: sum counters pointwise, then if over
    * capacity subtract the (capacity+1)-th largest value from every
    * counter and drop the non-positive ones. At most `capacity` values
    * can exceed that pivot, so the result fits; the subtracted pivot
    * adds to the undercount bound exactly like a decrement step.
    */
  def mergeIn(other: MgSummary): Unit = {
    other.counts.foreach { case (k, v) =>
      counts.update(k, counts.getOrElse(k, 0L) + v)
    }
    dropped += other.dropped
    if (counts.size > capacity) {
      val pivot = counts.values.toArray.sorted(Ordering[Long].reverse)
        .apply(capacity)
      counts.mapValuesInPlace((_, v) => v - pivot)
      counts.filterInPlace((_, v) => v > 0)
      dropped += pivot
    }
  }
}

/** `heavy_hitters(key, capacity)` — aggregate returning the MG summary
  * as `array<struct<key, est, dropped>>` sorted by estimate descending
  * (key ascending on ties), bounded to `capacity` entries. `est` is a
  * LOWER bound on the key's true count; `dropped` (same value on every
  * row) bounds both the undercount and the true count of any absent key.
  *
  * Scale rationale: a plain groupBy-count top-k at 100 TB builds
  * hash tables over the FULL key domain in every task (spill, then a
  * domain-sized shuffle). This summary holds ≤ capacity counters per
  * task and ships one ≤ capacity-entry buffer per partition — the
  * shuffle is O(partitions × capacity), independent of key cardinality.
  * Keys: BIGINT/INT or STRING.
  */
case class SpaceSavingTopK(
    child: Expression,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[MgSummary] with UnaryLike[Expression] {

  require(capacity > 0 && capacity <= (1 << 20),
    s"heavy_hitters: capacity must be in [1, 2^20], got $capacity")

  private lazy val keyIsString = child.dataType match {
    case StringType => true
    case LongType | IntegerType => false
    case dt => throw new IllegalArgumentException(
      s"heavy_hitters: key must be BIGINT, INT or STRING, got ${dt.sql}")
  }

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType | LongType | IntegerType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case dt =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"heavy_hitters: key must be BIGINT, INT or STRING, got ${dt.sql}")
    }

  override def createAggregationBuffer(): MgSummary = new MgSummary(capacity)

  override def update(buf: MgSummary, input: InternalRow): MgSummary = {
    val v = child.eval(input)
    if (v != null) {
      // UTF8String from an unsafe row aliases a reused buffer — copy
      // before it outlives this row
      val key = v match {
        case s: UTF8String => s.clone()
        case i: java.lang.Integer => java.lang.Long.valueOf(i.longValue)
        case other => other
      }
      buf.add(key)
    }
    buf
  }

  override def merge(buf: MgSummary, other: MgSummary): MgSummary = {
    buf.mergeIn(other); buf
  }

  override def eval(buf: MgSummary): Any = {
    val ord: Ordering[(Any, Long)] = new Ordering[(Any, Long)] {
      def compare(a: (Any, Long), b: (Any, Long)): Int = {
        val byCount = java.lang.Long.compare(b._2, a._2) // est DESC
        if (byCount != 0) byCount
        else if (keyIsString)
          a._1.asInstanceOf[UTF8String].compareTo(b._1.asInstanceOf[UTF8String])
        else java.lang.Long.compare(
          a._1.asInstanceOf[Long], b._1.asInstanceOf[Long])
      }
    }
    val sorted = buf.counts.toArray.sorted(ord)
    new GenericArrayData(sorted.map { case (k, est) =>
      val key: Any = if (keyIsString) k
      else child.dataType match {
        case IntegerType => k.asInstanceOf[Long].toInt
        case _ => k
      }
      new GenericInternalRow(Array[Any](key, est, buf.dropped))
    })
  }

  override def serialize(buf: MgSummary): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeLong(buf.dropped)
    out.writeInt(buf.counts.size)
    buf.counts.foreach { case (k, v) =>
      if (keyIsString) {
        val b = k.asInstanceOf[UTF8String].getBytes
        out.writeInt(b.length); out.write(b)
      } else out.writeLong(k.asInstanceOf[Long])
      out.writeLong(v)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): MgSummary = {
    val in = new DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val buf = new MgSummary(capacity)
    buf.dropped = in.readLong()
    val n = in.readInt()
    var i = 0
    while (i < n) {
      val k: Any = if (keyIsString) {
        val len = in.readInt(); val b = new Array[Byte](len)
        in.readFully(b); UTF8String.fromBytes(b)
      } else java.lang.Long.valueOf(in.readLong())
      buf.counts.update(k, in.readLong())
      i += 1
    }
    buf
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("key", child.dataType, nullable = false),
    StructField("est", LongType, nullable = false),
    StructField("dropped", LongType, nullable = false))),
    containsNull = false)

  override def nullable: Boolean = false
  override def prettyName: String = "heavy_hitters"

  override def withNewMutableAggBufferOffset(off: Int): SpaceSavingTopK =
    copy(mutableAggBufferOffset = off)
  override def withNewInputAggBufferOffset(off: Int): SpaceSavingTopK =
    copy(inputAggBufferOffset = off)
  override protected def withNewChildInternal(c: Expression): SpaceSavingTopK =
    copy(child = c)
}
