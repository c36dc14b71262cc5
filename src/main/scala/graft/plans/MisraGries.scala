package graft.plans

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Flat Misra–Gries counter state: parallel key/value arrays plus a
  * key→slot index. The hot path — "unseen key, buffer full ⇒ decrement
  * every counter, drop zeros" — fires on nearly every update once the
  * buffer fills (any stream with more than m distinct keys), so it must
  * be a primitive array sweep, not a boxed hash-map mutation: with
  * m=128 over a few million updates the difference is ~100× wall time.
  * Compaction (dropping zeroed slots) only runs when the sweep actually
  * zeroed something.
  */
final class MGState(val capacity: Int) {
  val keys = new Array[String](capacity - 1)
  val vals = new Array[Long](capacity - 1)
  var size = 0
  val index = new java.util.HashMap[String, Integer](capacity * 2)

  def add(k: String, c: Long): Unit = {
    val slot = index.get(k)
    if (slot != null) vals(slot) += c
    else if (size < capacity - 1) {
      keys(size) = k; vals(size) = c
      index.put(k, size); size += 1
    } else {
      // MG step, generalized to weight c (Agarwal et al. merge rule for
      // a singleton): subtract min(c, m-th largest of the c-extended
      // set) — for c=1 this is the classic decrement-all-by-one.
      var d = c
      var i = 0
      while (i < size) { if (vals(i) < d) d = vals(i); i += 1 }
      // d = min(existing counters, c): subtracting d annihilates the new
      // key's weight against one unit-level of every counter; if c > d
      // the remainder recurses, but then some slot zeroed and frees up.
      i = 0
      var zeroed = false
      while (i < size) {
        vals(i) -= d
        if (vals(i) == 0L) zeroed = true
        i += 1
      }
      if (zeroed) compact()
      val rest = c - d
      if (rest > 0L) add(k, rest)
    }
  }

  private def compact(): Unit = {
    var w = 0
    var i = 0
    while (i < size) {
      if (vals(i) > 0L) {
        if (w != i) { keys(w) = keys(i); vals(w) = vals(i); index.put(keys(w), w) }
        w += 1
      } else index.remove(keys(i))
      i += 1
    }
    size = w
  }
}

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
    extends TypedImperativeAggregate[MGState] {

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

  override def createAggregationBuffer(): MGState = new MGState(capacity)

  override def update(buffer: MGState, input: InternalRow): MGState = {
    val v = child.eval(input)
    if (v != null) buffer.add(v.asInstanceOf[UTF8String].toString, 1L)
    buffer
  }

  override def merge(buffer: MGState, other: MGState): MGState = {
    // Mergeable-summaries rule falls out of weighted add: summing two
    // ≤(m-1)-counter summaries and re-reducing to m-1 counters keeps the
    // (freq > n/m ⇒ present) guarantee over the concatenated stream.
    var i = 0
    while (i < other.size) {
      buffer.add(other.keys(i), other.vals(i))
      i += 1
    }
    buffer
  }

  override def eval(buffer: MGState): Any = {
    // deterministic ORDER for a given counter state (the state itself is
    // merge-order-dependent; consumers use only the key set)
    val live = (0 until buffer.size).map(i => (buffer.keys(i), buffer.vals(i)))
    val rows = live.sortBy { case (k, c) => (-c, k) }.map {
      case (k, c) => InternalRow(UTF8String.fromString(k), c)
    }.toArray
    new GenericArrayData(rows.asInstanceOf[Array[Any]])
  }

  override def serialize(buffer: MGState): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buffer.size)
    var i = 0
    while (i < buffer.size) {
      val kb = buffer.keys(i).getBytes("UTF-8")
      out.writeInt(kb.length)
      out.write(kb)
      out.writeLong(buffer.vals(i))
      i += 1
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): MGState = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val s = new MGState(capacity)
    var i = 0
    while (i < n) {
      val kb = new Array[Byte](in.readInt())
      in.readFully(kb)
      s.add(new String(kb, "UTF-8"), in.readLong())
      i += 1
    }
    s
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
