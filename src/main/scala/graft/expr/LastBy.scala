package graft.expr

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._

/** Mutable last-write-wins state: the highest `ord` seen and the winning
  * value, held as a copied single-field UnsafeRow so nothing references
  * the scan's reused row buffers.
  */
final class LastByBuffer {
  var ord: Long = Long.MinValue
  var hasValue: Boolean = false
  // null ⇔ !hasValue; a stored NULL value is a NON-null row whose single
  // field isNullAt(0) — serialize/eval rely on that invariant
  var row: UnsafeRow = null
}

/** `graft_last_by(value, ord)` — the value (ANY type, typically a struct
  * of payload columns) of the row with the maximum BIGINT `ord`; equal
  * ords (a violation of the ord-unique-per-group contract, e.g. a
  * duplicated ingest_seq) resolve deterministically by serialized value
  * bytes instead of by arrival order (see [[bytesGt]]).
  *
  * WHY it exists: `max_by(struct(...), ord)` is the natural spelling of
  * the ReplacingMergeTree read path ([[graft.ingest.Dedup.lastWriteWins]]),
  * but its struct-typed buffer fails HashAggregateExec's fixed-width
  * mutable-buffer rule, so the whole dedup compiles to SortAggregate
  * with an external sort on BOTH sides of the exchange. A
  * [[TypedImperativeAggregate]] instead plans as ObjectHashAggregateExec —
  * hash-based with graceful sort fallback under memory pressure — while
  * keeping partial/final (map-side combine) aggregation. Same trick as
  * [[TopK]]; buffers are (long, one UnsafeRow) per group.
  */
case class LastBy(
    valueExpr: Expression,
    ordExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[LastByBuffer] {

  override def children: Seq[Expression] = Seq(valueExpr, ordExpr)
  override def nullable: Boolean = true
  override def dataType: DataType = valueExpr.dataType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    if (ordExpr.dataType == LongType) TypeCheckSuccess
    else TypeCheckFailure(s"graft_last_by ord must be BIGINT, got ${ordExpr.dataType.simpleString}")
  }

  // single-field projection: copies ANY value shape into owned bytes
  @transient private lazy val valueProj =
    UnsafeProjection.create(Array(valueExpr.dataType))
  @transient private lazy val holder = new GenericInternalRow(1)

  override def createAggregationBuffer(): LastByBuffer = new LastByBuffer

  /** Equal-ord tiebreak (round-5 advice): the 'ord unique per group'
    * contract used to fail SILENTLY — equal ords kept whichever row a
    * partitioning happened to deliver first, i.e. run-to-run
    * nondeterministic dedup output. Throwing instead is unsound here (a
    * duplicate ord BELOW the running max is undetectable in an O(1)
    * buffer), so the aggregate is now the max over (ord, serialized value
    * bytes) — associative, commutative, and deterministic for ANY arrival
    * order; with unique ords (the contracted case) the bytes are never
    * consulted.
    */
  private def bytesGt(a: UnsafeRow, b: UnsafeRow): Boolean = {
    val x = a.getBytes; val y = b.getBytes
    val n = math.min(x.length, y.length)
    var i = 0
    while (i < n) {
      val d = (x(i) & 0xff) - (y(i) & 0xff)
      if (d != 0) return d > 0
      i += 1
    }
    x.length > y.length
  }

  override def update(b: LastByBuffer, input: InternalRow): LastByBuffer = {
    val o = ordExpr.eval(input)
    if (o != null) {
      val ov = o.asInstanceOf[Long]
      if (!b.hasValue || ov > b.ord) {
        holder.update(0, valueExpr.eval(input))
        b.row = valueProj(holder).copy()
        b.ord = ov
        b.hasValue = true
      } else if (ov == b.ord) {
        holder.update(0, valueExpr.eval(input))
        val candidate = valueProj(holder).copy()
        if (bytesGt(candidate, b.row)) b.row = candidate
      }
    }
    b
  }

  override def merge(b: LastByBuffer, o: LastByBuffer): LastByBuffer =
    if (!o.hasValue) b
    else if (!b.hasValue || o.ord > b.ord) {
      b.ord = o.ord; b.row = o.row; b.hasValue = true; b
    } else if (o.ord == b.ord && bytesGt(o.row, b.row)) {
      b.row = o.row; b
    } else b

  override def eval(b: LastByBuffer): Any =
    if (!b.hasValue || b.row.isNullAt(0)) null
    else InternalRow.copyValue(b.row.get(0, valueExpr.dataType))

  override def serialize(b: LastByBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeBoolean(b.hasValue)
    if (b.hasValue) {
      out.writeLong(b.ord)
      val bytes = b.row.getBytes
      out.writeInt(bytes.length)
      out.write(bytes)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): LastByBuffer = {
    val in = new DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val b = new LastByBuffer
    b.hasValue = in.readBoolean()
    if (b.hasValue) {
      b.ord = in.readLong()
      val n = in.readInt()
      val arr = new Array[Byte](n)
      in.readFully(arr)
      val row = new UnsafeRow(1)
      row.pointTo(arr, n)
      b.row = row
    }
    b
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): LastBy =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): LastBy =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): LastBy =
    copy(valueExpr = newChildren(0), ordExpr = newChildren(1))

  override def prettyName: String = "graft_last_by"
}
