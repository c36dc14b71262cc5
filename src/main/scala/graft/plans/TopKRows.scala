package graft.plans

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** `top_k_rows(ord, id, k)` — exact per-group top-k as a Catalyst
  * aggregate with a bounded heap for state, under the total order
  * (ord DESC, id ASC).
  *
  * This is the aggregate-shaped replacement for the
  * `row_number() OVER (PARTITION BY g ORDER BY …) <= k` idiom. The
  * window form shuffles EVERY raw row to its group's partition and
  * sorts there — with few groups (language, category, tenant) that is
  * a handful of reducers each receiving a fact-sized partition, the
  * exact shape that dies at 100 TB. As an aggregate, partial
  * aggregation bounds state at k rows per group per task and the
  * shuffle carries at most k·groups·tasks rows — aggregate-grain, not
  * fact-grain — then the final merge keeps k per group. Wrapped in
  * ObjectHashAggregate, so the partial/final split is the stock
  * HashAggregate machinery.
  *
  * Unlike [[MisraGries]], the result is EXACT and merge-order-blind:
  * the top-k set under a total order is unique whatever the partition
  * layout or merge tree, so the output is deterministic and sits
  * directly under a hash-exact oracle (the window-rank SQL).
  *
  * Ties: (ord, id) is a total order because id is unique in every use;
  * equal (ord, id) pairs — only possible if the same row is fed twice —
  * keep one occurrence arbitrarily, which the uniqueness precondition
  * makes unobservable.
  */
case class TopKRows(
    ord: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TopKRows.Heap] {

  require(k >= 1 && k <= 100000, "top_k_rows k must be in [1, 100000]")

  override def children: Seq[Expression] = Seq(ord, id)
  override def nullable: Boolean = false
  override def dataType: DataType = TopKRows.resultType

  override def checkInputDataTypes(): TypeCheckResult =
    (ord.dataType, id.dataType) match {
      case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (o, i) => TypeCheckResult.TypeCheckFailure(
        s"top_k_rows expects (bigint ord, bigint id), got " +
          s"(${o.catalogString}, ${i.catalogString})")
    }
  override def prettyName: String = "top_k_rows"

  override def createAggregationBuffer(): TopKRows.Heap = new TopKRows.Heap(k)

  override def update(buffer: TopKRows.Heap, input: InternalRow): TopKRows.Heap = {
    val o = ord.eval(input)
    val i = id.eval(input)
    if (o != null && i != null) {
      buffer.offer(o.asInstanceOf[Long], i.asInstanceOf[Long])
    }
    buffer
  }

  override def merge(buffer: TopKRows.Heap, other: TopKRows.Heap): TopKRows.Heap = {
    other.foreachEntry((o, i) => buffer.offer(o, i))
    buffer
  }

  override def eval(buffer: TopKRows.Heap): Any = {
    val arr = buffer.sortedDesc()
    val rows = new Array[Any](arr.length)
    var i = 0
    while (i < arr.length) {
      rows(i) = InternalRow(arr(i)._1, arr(i)._2)
      i += 1
    }
    new GenericArrayData(rows)
  }

  override def serialize(buffer: TopKRows.Heap): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buffer.size)
    buffer.foreachEntry { (o, i) => out.writeLong(o); out.writeLong(i) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): TopKRows.Heap = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val h = new TopKRows.Heap(k)
    var i = 0
    while (i < n) { h.offer(in.readLong(), in.readLong()); i += 1 }
    h
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKRows =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKRows =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKRows =
    copy(ord = newChildren(0), id = newChildren(1))
}

object TopKRows {
  import org.apache.spark.sql.catalyst.FunctionIdentifier
  import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

  val resultType: DataType = ArrayType(StructType(Seq(
    StructField("ord", LongType, nullable = false),
    StructField("id", LongType, nullable = false))), containsNull = false)

  val identifier: FunctionIdentifier = FunctionIdentifier("top_k_rows")
  val info: ExpressionInfo = new ExpressionInfo(
    classOf[TopKRows].getName, "top_k_rows")
  val builder: Seq[Expression] => Expression = { args =>
    require(args.length == 3 && args(2).foldable,
      "usage: top_k_rows(ord, id, <int literal k>)")
    TopKRows(args(0), args(1), args(2).eval().asInstanceOf[Number].intValue())
  }

  /** Bounded binary min-heap on the KEEP order (ord DESC, id ASC): the
    * root is the weakest kept entry — smallest ord, then largest id —
    * so a stronger arrival replaces the root in O(log k). Flat
    * primitive arrays, no boxing. */
  final class Heap(k: Int) {
    private val ords = new Array[Long](k)
    private val ids = new Array[Long](k)
    private var n = 0

    def size: Int = n

    // a BEATS b when a ranks strictly higher: larger ord, or equal ord
    // and smaller id
    @inline private def beats(ao: Long, ai: Long, bo: Long, bi: Long): Boolean =
      ao > bo || (ao == bo && ai < bi)

    def offer(o: Long, i: Long): Unit = {
      if (n < k) {
        ords(n) = o; ids(n) = i; n += 1
        siftUp(n - 1)
      } else if (beats(o, i, ords(0), ids(0))) {
        ords(0) = o; ids(0) = i
        siftDown(0)
      }
    }

    private def siftUp(start: Int): Unit = {
      var c = start
      while (c > 0) {
        val p = (c - 1) >> 1
        // child sifts up while it is WEAKER than its parent
        if (beats(ords(p), ids(p), ords(c), ids(c))) {
          swap(c, p); c = p
        } else return
      }
    }

    private def siftDown(start: Int): Unit = {
      var p = start
      while (true) {
        val l = 2 * p + 1
        val r = l + 1
        var w = p // weakest of parent and children
        if (l < n && beats(ords(w), ids(w), ords(l), ids(l))) w = l
        if (r < n && beats(ords(w), ids(w), ords(r), ids(r))) w = r
        if (w == p) return
        swap(p, w)
        p = w
      }
    }

    @inline private def swap(a: Int, b: Int): Unit = {
      val to = ords(a); ords(a) = ords(b); ords(b) = to
      val ti = ids(a); ids(a) = ids(b); ids(b) = ti
    }

    def foreachEntry(f: (Long, Long) => Unit): Unit = {
      var i = 0
      while (i < n) { f(ords(i), ids(i)); i += 1 }
    }

    /** Entries in output order: ord DESC, id ASC. */
    def sortedDesc(): Array[(Long, Long)] = {
      val out = new Array[(Long, Long)](n)
      var i = 0
      while (i < n) { out(i) = (ords(i), ids(i)); i += 1 }
      out.sortBy { case (o, i) => (-o, i) }
    }
  }
}
