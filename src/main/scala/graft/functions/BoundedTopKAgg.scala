package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, StructType}

/** Bounded per-group top-k as a native Catalyst aggregate (SURVEY §2.10's
  * pre-approved kNN plan shape; replaces the reference's jnp.argsort-
  * based tiled kNN, /root/reference/graphem/embedder.py:146-170).
  *
  * Input: a struct column whose FIRST field is a DOUBLE sort key and
  * SECOND field is a LONG tie-break key; the aggregate keeps the k
  * structs with the smallest (key, tie) and returns them as a sorted
  * array<struct>.
  *
  * Scale rationale: `row_number().over(Window.partitionBy(g))` must
  * shuffle EVERY candidate row into the per-group window partitions —
  * for kNN that is |corpus| x |queries| rows through at most |queries|
  * reducer keys. A TypedImperativeAggregate gets map-side PARTIAL
  * aggregation for free: each input partition emits at most one k-row
  * buffer per group, so the shuffle carries <= partitions x groups x k
  * rows and the per-group merge is tiny, regardless of corpus size.
  */
case class BoundedTopKAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BoundedTopKAgg.Buf] with UnaryLike[Expression] {

  private def structType: StructType = child.dataType.asInstanceOf[StructType]

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      // the buffer reads getDouble(0)/getLong(1): enforce the contract
      // at analysis time — a long first field would silently sort by
      // reinterpreted bits
      case s: StructType if s.size >= 2 &&
        s.fields(0).dataType == org.apache.spark.sql.types.DoubleType &&
        s.fields(1).dataType == org.apache.spark.sql.types.LongType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"bounded_top_k needs struct<double, bigint, ...>, got $other")
    }

  @transient private lazy val toUnsafe = UnsafeProjection.create(structType)

  override def createAggregationBuffer(): BoundedTopKAgg.Buf =
    new BoundedTopKAgg.Buf(k)

  override def update(buf: BoundedTopKAgg.Buf, input: InternalRow): BoundedTopKAgg.Buf = {
    val v = child.eval(input)
    if (v != null) {
      val row = v.asInstanceOf[InternalRow]
      buf.insert(row.getDouble(0), row.getLong(1), row)
    }
    buf
  }

  override def merge(a: BoundedTopKAgg.Buf, b: BoundedTopKAgg.Buf): BoundedTopKAgg.Buf = {
    b.foreach((d, t, r) => a.insert(d, t, r))
    a
  }

  override def eval(buf: BoundedTopKAgg.Buf): Any =
    new GenericArrayData(buf.sortedRows.asInstanceOf[Array[Any]])

  override def serialize(buf: BoundedTopKAgg.Buf): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { (d, t, r) =>
      out.writeDouble(d)
      out.writeLong(t)
      val u = toUnsafe(r)
      out.writeInt(u.getSizeInBytes)
      out.write(u.getBytes)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): BoundedTopKAgg.Buf = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new BoundedTopKAgg.Buf(k)
    val fields = structType.size
    var i = 0
    while (i < n) {
      val d = in.readDouble()
      val t = in.readLong()
      val len = in.readInt()
      val rowBytes = new Array[Byte](len)
      in.readFully(rowBytes)
      val row = new UnsafeRow(fields)
      row.pointTo(rowBytes, len)
      buf.insertOwned(d, t, row)
      i += 1
    }
    buf
  }

  override def dataType: DataType = ArrayType(structType, containsNull = false)
  override def nullable: Boolean = false

  override def withNewMutableAggBufferOffset(newOffset: Int): BoundedTopKAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BoundedTopKAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BoundedTopKAgg =
    copy(child = newChild)

  override def prettyName: String = "bounded_top_k"
}

object BoundedTopKAgg {

  /** Column API: smallest-k structs of `c` (sorted by its first two
    * fields, double then long) per group, as a sorted array<struct>.
    */
  def topK(c: Column, k: Int): Column =
    Bridge.column(BoundedTopKAgg(Bridge.expression(c), k).toAggregateExpression())

  /** Bounded binary max-heap on (key, tie): O(log k) insert, keeps the
    * k smallest. Rows are defensively copied on insert (Spark reuses
    * InternalRow instances across update() calls).
    */
  final class Buf(k: Int) {
    private var n = 0
    private val keys = new Array[Double](k)
    private val ties = new Array[Long](k)
    private val rows = new Array[InternalRow](k)

    def size: Int = n

    private def worseThanRoot(d: Double, t: Long): Boolean =
      d > keys(0) || (d == keys(0) && t > ties(0))

    private def less(i: Int, j: Int): Boolean = // max-heap: "less" = worse
      keys(i) > keys(j) || (keys(i) == keys(j) && ties(i) > ties(j))

    private def swap(i: Int, j: Int): Unit = {
      val kd = keys(i); keys(i) = keys(j); keys(j) = kd
      val td = ties(i); ties(i) = ties(j); ties(j) = td
      val rd = rows(i); rows(i) = rows(j); rows(j) = rd
    }

    private def siftUp(start: Int): Unit = {
      var i = start
      while (i > 0 && less(i, (i - 1) / 2)) { swap(i, (i - 1) / 2); i = (i - 1) / 2 }
    }

    private def siftDown(): Unit = {
      var i = 0
      var done = false
      while (!done) {
        val l = 2 * i + 1; val r = 2 * i + 2
        var m = i
        if (l < n && less(l, m)) m = l
        if (r < n && less(r, m)) m = r
        if (m == i) done = true else { swap(i, m); i = m }
      }
    }

    def insert(d: Double, t: Long, row: InternalRow): Unit =
      insertOwned(d, t, row.copy())

    /** Insert a row the buffer may keep without copying. */
    def insertOwned(d: Double, t: Long, row: InternalRow): Unit = {
      if (n < k) {
        keys(n) = d; ties(n) = t; rows(n) = row
        n += 1
        siftUp(n - 1)
      } else if (k > 0 && !worseThanRoot(d, t)) {
        keys(0) = d; ties(0) = t; rows(0) = row
        siftDown()
      }
    }

    def foreach(f: (Double, Long, InternalRow) => Unit): Unit = {
      var i = 0
      while (i < n) { f(keys(i), ties(i), rows(i)); i += 1 }
    }

    /** The kept rows sorted ascending by (key, tie). */
    def sortedRows: Array[InternalRow] = {
      val idx = (0 until n).sortBy(i => (keys(i), ties(i)))
      idx.map(rows).toArray
    }
  }
}
