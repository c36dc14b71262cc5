package graft.plans

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `misra_gries(key, m)` — the Misra–Gries heavy-hitters summary as a
  * Catalyst aggregate with map-side partial aggregation and mergeable
  * partials (Misra & Gries 1982; merge rule per Agarwal et al.,
  * "Mergeable Summaries", PODS 2012).
  *
  * The summary holds at most `m-1` counters. The STRUCTURAL guarantee —
  * the one the engine builds on — is that every key whose true
  * frequency exceeds n/m (n = stream length) is present in the summary,
  * under ANY partitioning and ANY merge tree. Counter VALUES are
  * lower bounds and merge-order-dependent (like HLL register states),
  * so registered queries never expose them directly: the summary is a
  * CANDIDATE tier, and the exact tier re-counts only the ≤ m-1
  * surfaced keys (a broadcast semi-join), exactly the sketch→verify
  * architecture of the dedup family. The verified output — candidates
  * whose EXACT count clears the n/m threshold — equals the true
  * heavy-hitter set deterministically, which is what puts a sketch
  * query under a hash-exact oracle.
  *
  * At 100 TB: the sketch pass is map-side O(m) state per partition and
  * ships m-1 counters per partition instead of the key universe — the
  * full GROUP BY it replaces shuffles every distinct key. The exact
  * re-count scans once more but aggregates only rows matching a
  * broadcast m-key set: two scan-bound passes, no large shuffle.
  *
  * Reference analog: the trending-content / hot-key detection tier
  * (real_time_streaming.py's content popularity aggregations) — at
  * reference scale a plain GROUP BY suffices; this is the shape that
  * survives when the key domain stops fitting a shuffle.
  */
case class MisraGries(
    child: Expression,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.HashMap[String, Long]] {

  require(capacity >= 2 && capacity <= 100000,
    "misra_gries capacity must be in [2, 100000]")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = MisraGries.resultType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"misra_gries expects a string key, got ${t.catalogString}")
  }
  override def prettyName: String = "misra_gries"

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty

  override def update(buffer: mutable.HashMap[String, Long],
                      input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val k = v.asInstanceOf[UTF8String].toString
      buffer.get(k) match {
        case Some(c) => buffer.update(k, c + 1L)
        case None =>
          if (buffer.size < capacity - 1) buffer.update(k, 1L)
          else {
            // classic MG step: a full counter set + an unseen key
            // decrements every counter (the new key's +1 and one unit of
            // each counter annihilate); zeroed counters free their slot.
            buffer.mapValuesInPlace((_, c) => c - 1L)
            buffer.filterInPlace((_, c) => c > 0L)
          }
      }
    }
    buffer
  }

  override def merge(buffer: mutable.HashMap[String, Long],
                     other: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    other.foreach { case (k, c) =>
      buffer.update(k, buffer.getOrElse(k, 0L) + c)
    }
    if (buffer.size > capacity - 1) {
      // Mergeable-summaries rule: subtract the capacity-th largest
      // counter from all and drop the non-positive — at most m-1 survive
      // and the (freq > n/m ⇒ present) guarantee is preserved.
      val d = buffer.valuesIterator.toArray.sortInPlace()(
        Ordering.Long.reverse).apply(capacity - 1)
      buffer.mapValuesInPlace((_, c) => c - d)
      buffer.filterInPlace((_, c) => c > 0L)
    }
    buffer
  }

  override def eval(buffer: mutable.HashMap[String, Long]): Any = {
    // deterministic ORDER for a given counter state (the state itself is
    // merge-order-dependent; consumers use only the key set)
    val rows = buffer.toArray.sortBy { case (k, c) => (-c, k) }.map {
      case (k, c) => InternalRow(UTF8String.fromString(k), c)
    }
    new GenericArrayData(rows.asInstanceOf[Array[Any]])
  }

  override def serialize(buffer: mutable.HashMap[String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buffer.size)
    buffer.foreach { case (k, c) =>
      val kb = k.getBytes("UTF-8")
      out.writeInt(kb.length)
      out.write(kb)
      out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val m = mutable.HashMap.empty[String, Long]
    var i = 0
    while (i < n) {
      val kb = new Array[Byte](in.readInt())
      in.readFully(kb)
      m.update(new String(kb, "UTF-8"), in.readLong())
      i += 1
    }
    m
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGries =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGries =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MisraGries =
    copy(child = newChildren.head)
}

object MisraGries {
  import org.apache.spark.sql.catalyst.FunctionIdentifier
  import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

  val resultType: DataType = ArrayType(StructType(Seq(
    StructField("key", StringType, nullable = false),
    StructField("lower", LongType, nullable = false))), containsNull = false)

  val identifier: FunctionIdentifier = FunctionIdentifier("misra_gries")
  val info: ExpressionInfo = new ExpressionInfo(
    classOf[MisraGries].getName, "misra_gries")
  val builder: Seq[Expression] => Expression = { args =>
    require(args.length == 2 && args(1).foldable,
      "usage: misra_gries(key, <int literal capacity>)")
    MisraGries(args.head, args(1).eval().asInstanceOf[Number].intValue())
  }
}
