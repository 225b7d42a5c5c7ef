package graft.expr

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Merging t-digest (Dunning & Ertl, "Computing Extremely Accurate
  * Quantiles Using t-Digests") — the sketch behind ClickHouse
  * `quantileTDigest`/`quantilesTDigest`, the remaining member of its
  * approximate-aggregate family after topK ([[TopK]]), uniq
  * (KMV composition) and count-min ([[CappedLongs]]-backed CMS).
  *
  * Centroids are capped at a size budget proportional to
  * `4 · N · q(1-q) / δ`, so resolution concentrates at the tails —
  * rank error is O(q(1-q)/δ), tightest exactly where p99-style
  * dashboard quantiles live. Buffers merge losslessly up to
  * re-compression, making the aggregate partial/final-safe
  * (map-side combine; sketch size is O(δ), independent of rows).
  *
  * Determinism note: centroid CONTENTS depend on partial-merge order,
  * which Spark does not fix run-to-run — so the finished quantile is a
  * bounded approximation, not a reproducible scalar. The registered
  * entry (`qx_quantile_tdigest`) therefore hashes a tie-aware
  * rank-accuracy LEDGER (the digest's actual guarantee) next to exact
  * quantiles, never the raw centroid values.
  */
final class TDigestBuffer(val compression: Double) {

  /** Sorted by mean (invariant restored by every [[compress]]). */
  var means: Array[Double] = Array.empty
  var weights: Array[Double] = Array.empty
  private val pending = mutable.ArrayBuffer.empty[Double]

  def add(x: Double): Unit = {
    pending += x
    if (pending.length >= 512) compress()
  }

  def merge(o: TDigestBuffer): Unit = {
    compress(); o.compress()
    if (o.means.nonEmpty) {
      means ++= o.means
      weights ++= o.weights
      recompress()
    }
  }

  def compress(): Unit = if (pending.nonEmpty) {
    means ++= pending
    weights ++= Array.fill(pending.length)(1.0)
    pending.clear()
    recompress()
  }

  private def recompress(): Unit = {
    val order = means.indices.sortBy(means(_)).toArray
    val total = weights.sum
    val nm = mutable.ArrayBuffer.empty[Double]
    val nw = mutable.ArrayBuffer.empty[Double]
    var curM = means(order(0))
    var curW = weights(order(0))
    var cum = 0.0
    var i = 1
    while (i < order.length) {
      val m = means(order(i)); val w = weights(order(i))
      val q = (cum + (curW + w) / 2) / total
      val limit = 4 * total * q * (1 - q) / compression
      // equal means always merge — zero information loss, and it keeps
      // heavily-tied data (integer-valued prices) at one centroid per
      // distinct value instead of an edge fringe of singletons
      if (m == curM || curW + w <= limit) {
        // weighted-mean absorb keeps the centroid at its mass center
        curM = (curM * curW + m * w) / (curW + w)
        curW += w
      } else {
        nm += curM; nw += curW; cum += curW
        curM = m; curW = w
      }
      i += 1
    }
    nm += curM; nw += curW
    means = nm.toArray
    weights = nw.toArray
  }

  /** Interpolated quantile at `p` ∈ [0,1]; NaN on an empty digest. */
  def quantile(p: Double): Double = {
    compress()
    if (means.isEmpty) return Double.NaN
    if (means.length == 1) return means(0)
    val total = weights.sum
    val target = p * total
    // centroid i sits at cumulative-mass midpoint cum_i + w_i/2
    var cum = 0.0
    var prevMid = weights(0) / 2
    if (target <= prevMid) return means(0)
    var i = 1
    while (i < means.length) {
      cum += weights(i - 1)
      val mid = cum + weights(i) / 2
      if (target <= mid) {
        val f = (target - prevMid) / (mid - prevMid)
        return means(i - 1) + f * (means(i) - means(i - 1))
      }
      prevMid = mid
      i += 1
    }
    means(means.length - 1)
  }
}

/** Explicit wire format (double compression, int n, n × (mean, weight)),
  * centroid-sorted — identical digests serialize identically.
  */
object TDigestBuffer {
  def write(b: TDigestBuffer): Array[Byte] = {
    b.compress()
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeDouble(b.compression)
    out.writeInt(b.means.length)
    var i = 0
    while (i < b.means.length) {
      out.writeDouble(b.means(i)); out.writeDouble(b.weights(i)); i += 1
    }
    out.flush()
    bos.toByteArray
  }

  def read(bytes: Array[Byte]): TDigestBuffer = {
    val in = new DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val b = new TDigestBuffer(in.readDouble())
    val n = in.readInt()
    val ms = new Array[Double](n)
    val ws = new Array[Double](n)
    var i = 0
    while (i < n) { ms(i) = in.readDouble(); ws(i) = in.readDouble(); i += 1 }
    b.means = ms; b.weights = ws
    b
  }
}

/** Shared analysis-time validation of the literal quantile array: type,
  * foldability, and — because the evaluators call
  * `ArrayData.toDoubleArray()`, which NPEs on null slots — that the
  * evaluated literal is non-NULL and element-null-free. `array(0.5D,
  * NULL)` must fail ANALYSIS with a clear message, not crash a task.
  */
private[expr] object TDigestPs {
  def check(prettyName: String, psExpr: Expression): TypeCheckResult =
    if (!psExpr.foldable ||
      psExpr.dataType != ArrayType(DoubleType, containsNull = false) &&
      psExpr.dataType != ArrayType(DoubleType, containsNull = true))
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a literal array<double> of quantiles")
    else {
      val v = psExpr.eval()
      val hasNull = v == null || {
        val a = v.asInstanceOf[ArrayData]
        (0 until a.numElements()).exists(a.isNullAt)
      }
      if (hasNull) TypeCheckResult.TypeCheckFailure(
        s"$prettyName quantile array must not be NULL or contain NULL elements")
      else TypeCheckResult.TypeCheckSuccess
    }
}

/** `graft_tdigest_quantiles(x, array(p…))` → array&lt;double&gt; — the
  * Spark-native port of ClickHouse `quantilesTDigest(p…)(x)` (δ = 200,
  * ClickHouse's default compression). A [[TypedImperativeAggregate]]:
  * partial digests build map-side and merge across partitions, so the
  * shuffle carries one O(δ) sketch per group, never the values.
  */
case class TDigestQuantiles(
    child: Expression,
    psExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TDigestBuffer] {

  private val Compression = 200.0

  private lazy val ps: Array[Double] =
    psExpr.eval().asInstanceOf[ArrayData].toDoubleArray()

  override def children: Seq[Expression] = Seq(child, psExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  /** A non-numeric column or a non-literal/non-double quantile list must
    * fail analysis, not throw ClassCastException at execution.
    */
  override def checkInputDataTypes(): TypeCheckResult =
    if (!child.dataType.isInstanceOf[NumericType])
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a numeric column, got ${child.dataType.catalogString}")
    else TDigestPs.check(prettyName, psExpr)

  override def createAggregationBuffer(): TDigestBuffer =
    new TDigestBuffer(Compression)

  override def update(b: TDigestBuffer, input: InternalRow): TDigestBuffer = {
    val v = child.eval(input)
    if (v != null) b.add(v.asInstanceOf[Number].doubleValue())
    b
  }

  override def merge(b: TDigestBuffer, o: TDigestBuffer): TDigestBuffer = {
    b.merge(o); b
  }

  override def eval(b: TDigestBuffer): Any =
    new GenericArrayData(ps.map(b.quantile))

  override def serialize(b: TDigestBuffer): Array[Byte] = TDigestBuffer.write(b)
  override def deserialize(bytes: Array[Byte]): TDigestBuffer =
    TDigestBuffer.read(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): TDigestQuantiles =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TDigestQuantiles =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TDigestQuantiles =
    copy(child = newChildren(0), psExpr = newChildren(1))

  override def prettyName: String = "graft_tdigest_quantiles"
}

/** `graft_tdigest_state(x)` — the ClickHouse `quantileTDigestState`
  * combinator: aggregates like [[TDigestQuantiles]] but emits the
  * SERIALIZED DIGEST. The AggregatingMergeTree idiom for quantiles at
  * 100 TB: each ingest part persists one O(δ) digest per group; later
  * queries fold states via [[TDigestMerge]] and never rescan the facts.
  * The t-digest merge is the SAME operation as its partial/final merge,
  * so persisting states loses nothing beyond the usual re-compression.
  */
case class TDigestState(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TDigestBuffer] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[NumericType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a numeric column, got ${child.dataType.catalogString}")

  override def createAggregationBuffer(): TDigestBuffer =
    new TDigestBuffer(200.0)

  override def update(b: TDigestBuffer, input: InternalRow): TDigestBuffer = {
    val v = child.eval(input)
    if (v != null) b.add(v.asInstanceOf[Number].doubleValue())
    b
  }

  override def merge(b: TDigestBuffer, o: TDigestBuffer): TDigestBuffer = {
    b.merge(o); b
  }

  override def eval(b: TDigestBuffer): Any = TDigestBuffer.write(b)
  override def serialize(b: TDigestBuffer): Array[Byte] = TDigestBuffer.write(b)
  override def deserialize(bytes: Array[Byte]): TDigestBuffer =
    TDigestBuffer.read(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): TDigestState =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TDigestState =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TDigestState =
    copy(child = newChildren(0))

  override def prettyName: String = "graft_tdigest_state"
}

/** `graft_tdigest_merge(state, array(p…))` — the `quantileTDigestMerge`
  * combinator: folds persisted [[TDigestState]] blobs back into one
  * digest and finishes it to the quantile array. The fold buffer is
  * δ = 200 — the same compression [[TDigestState]] writes — so the
  * round-trip loses nothing beyond the re-compression every t-digest
  * merge pays (a state written at a HIGHER δ would be re-compressed
  * down to 200 here; the engine always writes 200).
  */
case class TDigestMerge(
    child: Expression,
    psExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TDigestBuffer] {

  private lazy val ps: Array[Double] =
    psExpr.eval().asInstanceOf[ArrayData].toDoubleArray()

  override def children: Seq[Expression] = Seq(child, psExpr)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != BinaryType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a binary state column, got ${child.dataType.catalogString}")
    else TDigestPs.check(prettyName, psExpr)

  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def createAggregationBuffer(): TDigestBuffer =
    new TDigestBuffer(200.0)

  override def update(b: TDigestBuffer, input: InternalRow): TDigestBuffer = {
    val v = child.eval(input)
    if (v == null) return b
    b.merge(TDigestBuffer.read(v.asInstanceOf[Array[Byte]]))
    b
  }

  override def merge(b: TDigestBuffer, o: TDigestBuffer): TDigestBuffer = {
    b.merge(o); b
  }

  override def eval(b: TDigestBuffer): Any =
    new GenericArrayData(ps.map(b.quantile))

  override def serialize(b: TDigestBuffer): Array[Byte] = TDigestBuffer.write(b)
  override def deserialize(bytes: Array[Byte]): TDigestBuffer =
    TDigestBuffer.read(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): TDigestMerge =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TDigestMerge =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TDigestMerge =
    copy(child = newChildren(0), psExpr = newChildren(1))

  override def prettyName: String = "graft_tdigest_merge"
}
