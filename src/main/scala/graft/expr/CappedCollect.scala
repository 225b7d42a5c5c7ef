package graft.expr

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded collect state: at most `cap` BIGINT values, in arrival order.
  * Once full it stops absorbing and REMEMBERS that it dropped values —
  * a truncated buffer evaluates to NULL (see [[CappedLongs]]), so a
  * partial list can never be mistaken for a complete one.
  */
final class CappedLongsBuffer(val cap: Int) {
  var values: Array[Long] = new Array[Long](math.min(cap, 16))
  var size: Int = 0
  var truncated: Boolean = false

  def add(v: Long): Unit =
    if (size < cap) {
      if (size == values.length)
        values = java.util.Arrays.copyOf(values, math.min(cap, values.length * 2))
      values(size) = v
      size += 1
    } else truncated = true
}

/** `graft_capped_longs(col, cap)` — `collect_list` for BIGINT with a HARD
  * per-group buffer bound.
  *
  * WHY it exists (round-6, the `llm_ngram_jaccard` reclaim): a posting-list
  * index wants `GROUP BY shingle → collect(doc_id)`, but plain
  * `collect_list` materializes an UNBOUNDED aggregation buffer — at corpus
  * scale a stopword shingle's buffer is the size of the corpus, which is
  * why round 3 had to run a separate count-only pass + anti-join to cut
  * hot shingles BEFORE any list was collected (two full derivations of the
  * occurrence stream). With a capped buffer the cut and the collection
  * fuse into ONE aggregation pass: `agg(graft_capped_longs(doc_id, D+1),
  * count(*))`, then `HAVING count <= D` keeps exactly the groups whose
  * lists are complete. Hot groups cost O(cap) memory instead of O(df) and
  * are dropped by the same filter that used to need the anti-join.
  *
  * A [[TypedImperativeAggregate]] (ObjectHashAggregate path) with
  * partial/final combine; merge concatenates up to the cap.
  *
  * TRUNCATION CONTRACT (round-7, hardening a round-6 advice note): a
  * group that overflowed its cap evaluates to NULL, not to a partial
  * list — arrival-order truncation is partition-dependent, and an
  * unpaired caller must not be able to read a nondeterministic prefix
  * as data. A group with EXACTLY cap values is complete and returns its
  * full list. The intended idiom is unchanged: pair with `count(*)` and
  * keep `count <= cap − 1`-style groups (every kept list is then
  * complete AND non-null); the NULL is the backstop for callers that
  * skip the pairing.
  */
case class CappedLongs(
    child: Expression,
    capExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[CappedLongsBuffer] {

  private lazy val cap: Int = {
    val c = capExpr.eval().asInstanceOf[Number].intValue()
    // loud guard (GuardsSpec convention): a non-positive cap is a caller
    // bug, not an empty-collect request
    require(c > 0, s"graft_capped_longs cap must be positive, got $c")
    c
  }

  override def children: Seq[Expression] = Seq(child, capExpr)
  override def nullable: Boolean = true // truncated groups evaluate to NULL
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    if (child.dataType != LongType)
      TypeCheckFailure(
        s"graft_capped_longs value must be BIGINT, got ${child.dataType.simpleString}")
    else if (!capExpr.foldable)
      TypeCheckFailure("graft_capped_longs cap must be a literal")
    else capExpr.dataType match {
      case ByteType | ShortType | IntegerType | LongType =>
        // the cap is evaluated HERE, at analysis, so a NULL or
        // non-positive literal fails with its name instead of an opaque
        // NPE at execution (round-6 advice)
        capExpr.eval() match {
          case null => TypeCheckFailure("graft_capped_longs cap must not be NULL")
          case n: Number if n.intValue() <= 0 => TypeCheckFailure(
            s"graft_capped_longs cap must be positive, got ${n.intValue()}")
          case _ => TypeCheckSuccess
        }
      case t => TypeCheckFailure(
        s"graft_capped_longs cap must be integral, got ${t.simpleString}")
    }
  }

  override def createAggregationBuffer(): CappedLongsBuffer =
    new CappedLongsBuffer(cap)

  override def update(b: CappedLongsBuffer, input: InternalRow): CappedLongsBuffer = {
    val v = child.eval(input)
    if (v != null) b.add(v.asInstanceOf[Long])
    b
  }

  override def merge(b: CappedLongsBuffer, o: CappedLongsBuffer): CappedLongsBuffer = {
    var i = 0
    while (i < o.size) { b.add(o.values(i)); i += 1 } // add() flags overflow
    b.truncated ||= o.truncated
    b
  }

  override def eval(b: CappedLongsBuffer): Any =
    if (b.truncated) null
    else new GenericArrayData(java.util.Arrays.copyOf(b.values, b.size))

  override def serialize(b: CappedLongsBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(b.cap)
    out.writeInt(b.size)
    out.writeBoolean(b.truncated)
    var i = 0
    while (i < b.size) { out.writeLong(b.values(i)); i += 1 }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): CappedLongsBuffer = {
    val in = new DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val b = new CappedLongsBuffer(in.readInt())
    val n = in.readInt()
    b.truncated = in.readBoolean()
    var i = 0
    while (i < n) { b.add(in.readLong()); i += 1 }
    b
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CappedLongs =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CappedLongs =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CappedLongs =
    copy(child = newChildren(0), capExpr = newChildren(1))

  override def prettyName: String = "graft_capped_longs"
}
