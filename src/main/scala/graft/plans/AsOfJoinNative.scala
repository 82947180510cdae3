package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.classic.Strategy
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{Distribution, Partitioning, StatefulOpClusteredDistribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}
import org.apache.spark.sql.graft.Bridge

/** Native as-of join: a whole-operator extension (logical node + planner
  * strategy + physical sort-merge exec) for the one relational shape Spark's
  * built-ins can't express directly.
  *
  * Compared to the composed union+window formulation
  * (graft.operators.AsOfJoin.asOf), the physical operator streams each
  * co-partitioned, co-sorted key group once with a single carried right row —
  * no unioned wide schema, no window buffer. Children are planned with
  * StatefulOpClusteredDistribution (fixed partition count, the same
  * mechanism streaming stateful operators use) so AQE cannot coalesce the
  * two sides inconsistently, and with required orderings so the planner
  * inserts spilling SortExecs.
  *
  * Semantics: for each left row, the latest right row of the same key with
  * right.ts <= left.ts (ties on right (key, ts) resolved by the sort's
  * tiebreak column — highest wins, matching the composed operator and
  * DuckDB's ASOF JOIN on pre-deduplicated input).
  */
case class AsOfJoinNode(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKey: Attribute,
    rightKey: Attribute,
    leftTs: Attribute,
    rightTs: Attribute,
    rightTiebreak: Attribute) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.filterNot(_.exprId == rightKey.exprId).map(_.withNullability(true))
  override protected def withNewChildrenInternal(newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinNode =
    copy(left = newLeft, right = newRight)
}

case class AsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKey: Attribute,
    rightKey: Attribute,
    leftTs: Attribute,
    rightTs: Attribute,
    rightTiebreak: Attribute,
    override val output: Seq[Attribute]) extends BinaryExecNode {

  override def requiredChildDistribution: Seq[Distribution] = Seq(
    StatefulOpClusteredDistribution(Seq(leftKey), conf.numShufflePartitions),
    StatefulOpClusteredDistribution(Seq(rightKey), conf.numShufflePartitions))

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTs, Ascending),
      SortOrder(rightTiebreak, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    val lKey = BindReferences.bindReference(leftKey: Expression, left.output)
    val lTs = BindReferences.bindReference(leftTs: Expression, left.output)
    val rKey = BindReferences.bindReference(rightKey: Expression, right.output)
    val rTs = BindReferences.bindReference(rightTs: Expression, right.output)
    val keyOrdering = org.apache.spark.sql.catalyst.util.TypeUtils
      .getInterpretedOrdering(leftKey.dataType)
    // right side must bind as nullable: unmatched left rows read a null row
    val joinedSchema = left.output ++ right.output.map(_.withNullability(true))
    val outputAttrs = output
    val rightArity = right.output.length

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val proj = UnsafeProjection.create(outputAttrs, joinedSchema)
      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(rightArity)
      val rBuf = rIter.buffered
      var carried: InternalRow = null
      var carriedKey: Any = null

      lIter.map { lRow =>
        val lk = lKey.eval(lRow)
        val ltAny = lTs.eval(lRow)
        if (lk == null || ltAny == null) {
          // null key/ts never matches (same as the composed join and SQL ASOF)
          proj(joined(lRow, nullRight))
        } else {
          val lt = ltAny.asInstanceOf[Long]
          if (carriedKey != null && keyOrdering.compare(carriedKey.asInstanceOf[AnyRef], lk.asInstanceOf[AnyRef]) != 0) {
            carried = null; carriedKey = null
          }
          var advance = true
          while (advance && rBuf.hasNext) {
            val peek = rBuf.head
            val rk = rKey.eval(peek)
            val rtAny = if (rk == null) null else rTs.eval(peek)
            if (rk == null || rtAny == null) {
              rBuf.next() // null-keyed/ts right rows match nothing
            } else {
              val cmp = keyOrdering.compare(rk.asInstanceOf[AnyRef], lk.asInstanceOf[AnyRef])
              if (cmp < 0) {
                rBuf.next() // earlier key: its carry can never match again
              } else if (cmp == 0 && rtAny.asInstanceOf[Long] <= lt) {
                carried = rBuf.next().copy()
                carriedKey = lk
              } else {
                advance = false
              }
            }
          }
          val r = if (carried != null && carriedKey != null &&
            keyOrdering.compare(carriedKey.asInstanceOf[AnyRef], lk.asInstanceOf[AnyRef]) == 0) carried
          else nullRight
          proj(joined(lRow, r))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinStrategy extends Strategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case n: AsOfJoinNode =>
      AsOfJoinExec(planLater(n.left), planLater(n.right),
        n.leftKey, n.rightKey, n.leftTs, n.rightTs, n.rightTiebreak, n.output) :: Nil
    case _ => Nil
  }
}

object AsOfJoinNative {

  /** Native as-of join with the same output shape as
    * graft.operators.AsOfJoin.asOf: left columns + asof_<payload> columns.
    */
  def asOf(left: DataFrame, right: DataFrame, key: String, leftTs: String,
           rightTs: String, rightTiebreak: String, payload: Seq[String]): DataFrame = {
    import org.apache.spark.sql.functions.col
    // prefix the right side so the joined output has unambiguous names
    val rcols = (Seq(key, rightTs, rightTiebreak) ++ payload).distinct
    val r = right.select(rcols.map(c => col(c).as(if (c == key) c else s"__r_$c")): _*)
    val lPlan = Bridge.analyzed(left)
    val rPlan = Bridge.analyzed(r)
    def attr(p: LogicalPlan, name: String): Attribute = p.output.find(_.name == name).get
    val node = AsOfJoinNode(lPlan, rPlan,
      attr(lPlan, key), attr(rPlan, key), attr(lPlan, leftTs), attr(rPlan, s"__r_$rightTs"),
      attr(rPlan, s"__r_$rightTiebreak"))
    val joined = Bridge.ofRows(left.sparkSession, node)
    val leftCols = left.columns.map(col)
    val payloadCols = (rightTs +: payload.filterNot(_ == rightTs)).map(p => col(s"__r_$p").as(s"asof_$p"))
    joined.select(leftCols ++ payloadCols: _*)
  }
}
