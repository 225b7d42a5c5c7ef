package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeReference, AttributeSet, JoinedRow, RowOrdering, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.types.{LongType, TimestampType}

/** AS-OF JOIN as a first-class Catalyst operator — extension level (c) of
  * the builder brief (custom `LogicalPlan` + `SparkStrategy` +
  * `SparkPlan`), complementing the composition-level spelling in
  * `TradeQueries.qxAsofTradeQuote` (union + carry-forward window over
  * the same semantics: reference dashboards price trades against the
  * prevailing order-book quote, GD-adjacent; see FIDELITY.md).
  *
  * For each left row, emit the `valueCol` of the LAST right row with the
  * same key and right time ≤ left time — ties on right time broken by
  * the highest `rightOrd` (arrival order), exactly the window entry's
  * (time, m, seq) ordering. NULL when no right row precedes.
  *
  * WHY a physical operator: the window spelling pays a union of both
  * tables plus ONE window sort over |L|+|R| rows per key. This exec
  * declares `ClusteredDistribution` on the key for both children and
  * per-child `requiredChildOrdering` (key, time[, ord]) — Catalyst's
  * EnsureRequirements co-partitions the sides and sorts them
  * INDEPENDENTLY (two smaller sorts, each spillable, no unioned
  * wide-row stream with NULL-padded columns), and the merge itself is a
  * single forward pass with O(1) state per partition: the right cursor
  * never rewinds, nothing is buffered. At 100 TB that means the quote
  * stream is read once, sorted once in its own (narrower) shape, and
  * the trade stream never carries quote columns through a shuffle.
  */
case class AsOfJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    keyCols: Seq[String],
    leftTime: String,
    rightTime: String,
    rightOrd: String,
    valueCol: String,
    valueAttr: AttributeReference)
  extends BinaryNode {

  override def output: Seq[Attribute] = left.output :+ valueAttr

  // the value column is CREATED here, not forwarded from a child
  override def producedAttributes: AttributeSet = AttributeSet(valueAttr :: Nil)

  // the operator consumes key/time/ord/value columns by NAME (it holds no
  // Expression fields), so they must be declared as references or
  // ColumnPruning strips them from the children; the right side's OTHER
  // columns stay prunable — exactly the projection a scan should get.
  // Name matching is case-insensitive, like Spark's default resolution.
  override def references: AttributeSet = AttributeSet(
    left.output.filter(a => keyCols.exists(_.equalsIgnoreCase(a.name)) ||
      a.name.equalsIgnoreCase(leftTime)) ++
      right.output.filter(a => keyCols.exists(_.equalsIgnoreCase(a.name)) ||
        a.name.equalsIgnoreCase(rightTime) ||
        a.name.equalsIgnoreCase(rightOrd) || a.name.equalsIgnoreCase(valueCol)))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsOfJoinPlan]] to [[AsOfJoinExec]]; injected via
  * `SparkSessionExtensions.injectPlannerStrategy`
  * ([[graft.GraftExtensions]]) or `spark.experimental.extraStrategies`
  * ([[AsOf.join]] installs it on first use).
  */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, keys, lt, rt, ro, v, attr) =>
      AsOfJoinExec(keys, lt, rt, ro, v, attr, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(
    keyCols: Seq[String],
    leftTime: String,
    rightTime: String,
    rightOrd: String,
    valueCol: String,
    valueAttr: AttributeReference,
    left: SparkPlan,
    right: SparkPlan)
  extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output :+ valueAttr

  override def producedAttributes: AttributeSet = AttributeSet(valueAttr :: Nil)

  /** Exact-name match first; a UNIQUE case-insensitive match as the
    * fallback (Spark's default resolution). Two case-variant columns and
    * no exact hit is ambiguous — fail, never bind the first one.
    */
  private def attrOf(side: SparkPlan, name: String): Attribute = {
    val ci = side.output.filter(_.name.equalsIgnoreCase(name))
    ci.find(_.name == name)
      .orElse(if (ci.length == 1) ci.headOption else None)
      .getOrElse(throw new IllegalArgumentException(
        if (ci.length > 1)
          s"as-of join: column $name is ambiguous among ${ci.map(_.name)}"
        else s"as-of join: column $name not found in ${side.output.map(_.name)}"))
  }

  /** The merge loop compares times/ord with `getLong`, which is only
    * meaningful for long-backed physical types — reject anything else
    * loudly instead of comparing raw row words.
    */
  private def requireLongBacked(a: Attribute, role: String): Unit =
    require(a.dataType == TimestampType || a.dataType == LongType,
      s"as-of join: $role column ${a.name} must be TIMESTAMP or BIGINT, " +
        s"got ${a.dataType.simpleString}")

  private def leftKeys: Seq[Attribute] = keyCols.map(attrOf(left, _))
  private def rightKeys: Seq[Attribute] = keyCols.map(attrOf(right, _))

  // co-partition both sides on the key; EnsureRequirements inserts the
  // exchanges (or elides them when a child is already hash-partitioned
  // on the key — e.g. the bucketed materialized layout)
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  // per-child sorts: (key, time) left, (key, time, ord) right — two
  // independent spillable sorts instead of one over the union
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ attrOf(left, leftTime)).map(SortOrder(_, Ascending)),
    (rightKeys ++ Seq(attrOf(right, rightTime), attrOf(right, rightOrd)))
      .map(SortOrder(_, Ascending)))

  override def outputOrdering: Seq[SortOrder] =
    (leftKeys :+ attrOf(left, leftTime)).map(SortOrder(_, Ascending))

  // left-preserving 1:1 output — the key clustering EnsureRequirements
  // just established survives this operator, so a downstream
  // groupBy(key) must not pay a fresh exchange
  override def outputPartitioning: Partitioning = left.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    requireLongBacked(attrOf(left, leftTime), "left time")
    requireLongBacked(attrOf(right, rightTime), "right time")
    requireLongBacked(attrOf(right, rightOrd), "right ord")
    val keyTypes = leftKeys.map(_.dataType)
    val lOut = left.output
    val rOut = right.output
    val lKeyAttrs = leftKeys
    val rKeyAttrs = rightKeys
    val out = output
    val vAttr = valueAttr
    // resolve through attrOf (exact-first, unique-ci fallback), then
    // locate by exprId so index and attribute can never disagree
    val ltIdx = lOut.indexWhere(_.exprId == attrOf(left, leftTime).exprId)
    val rtIdx = rOut.indexWhere(_.exprId == attrOf(right, rightTime).exprId)
    val rvIdx = rOut.indexWhere(_.exprId == attrOf(right, valueCol).exprId)
    val valueType = vAttr.dataType

    left.execute().zipPartitions(right.execute()) { (lit, rit) =>
      val lKeyProj = UnsafeProjection.create(lKeyAttrs, lOut)
      val rKeyProj = UnsafeProjection.create(rKeyAttrs, rOut)
      val outProj = UnsafeProjection.create(out, lOut :+ vAttr)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(keyTypes)
      val joined = new JoinedRow
      val valueRow = new GenericInternalRow(1)

      // one-row lookahead into the right stream (rows are engine-reused
      // buffers: extract BEFORE advancing, copy anything retained)
      var pending: InternalRow = if (rit.hasNext) rit.next() else null
      var lastVal: Any = null
      var lastValKey: InternalRow = null // copied key of lastVal's row

      new Iterator[InternalRow] {
        override def hasNext: Boolean = lit.hasNext
        override def next(): InternalRow = {
          val l = lit.next()
          val lKey = lKeyProj(l)
          if (l.isNullAt(ltIdx))
            throw new IllegalArgumentException("as-of join: NULL left time")
          val lt = l.getLong(ltIdx)
          var advancing = true
          while (advancing && pending != null) {
            val pKey = rKeyProj(pending)
            if (pending.isNullAt(rtIdx))
              throw new IllegalArgumentException("as-of join: NULL right time")
            val c = keyOrd.compare(pKey, lKey)
            if (c < 0) {
              // right side still on an earlier key: discard
              pending = if (rit.hasNext) rit.next() else null
            } else if (c == 0 && pending.getLong(rtIdx) <= lt) {
              // prevailing candidate: remember value (rows arrive in
              // (time, ord) order, so the last consumed wins)
              // copyValue deep-copies every buffer-backed shape (UTF8String,
              // UnsafeArrayData, UnsafeRow, ...) — a plain reference would
              // alias the sort iterator's reused row buffer
              lastVal =
                if (pending.isNullAt(rvIdx)) null
                else InternalRow.copyValue(pending.get(rvIdx, valueType))
              lastValKey = pKey.copy()
              pending = if (rit.hasNext) rit.next() else null
            } else {
              // right side is ahead (later key, or same key but a future
              // timestamp): keep it for subsequent left rows
              advancing = false
            }
          }
          val v =
            if (lastValKey != null && keyOrd.compare(lastValKey, lKey) == 0) lastVal
            else null
          valueRow.update(0, v)
          outProj(joined(l, valueRow))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

/** Public API: `AsOf.join(trades, quotes, Seq("secid"), "time", "time",
  * "quote_seq", "price", "quote_price")`.
  */
object AsOf {
  def join(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String, rightOrd: String,
      valueCol: String, outName: String): DataFrame = {
    val spark = left.sparkSession
    // runtime installation path (the library-config path is
    // spark.sql.extensions=graft.GraftExtensions); synchronized so two
    // threads building joins concurrently can't both append the strategy
    AsOf.synchronized {
      if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy))
        spark.experimental.extraStrategies =
          spark.experimental.extraStrategies :+ AsOfJoinStrategy
    }
    val lplan = left.queryExecution.analyzed
    val rplan = right.queryExecution.analyzed
    val ci = rplan.output.filter(_.name.equalsIgnoreCase(valueCol))
    val vt = ci.find(_.name == valueCol)
      .orElse(if (ci.length == 1) ci.headOption else None)
      .getOrElse(throw new IllegalArgumentException(
        s"as-of join: no unambiguous column $valueCol")).dataType
    val attr = AttributeReference(outName, vt, nullable = true)()
    org.apache.spark.sql.GraftSqlBridge.ofRows(spark,
      AsOfJoinPlan(lplan, rplan, keys, leftTime, rightTime, rightOrd, valueCol, attr))
  }
}
