package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.classic.Strategy
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference}
import org.apache.spark.sql.catalyst.plans.logical.{LeafNode, LogicalPlan, Statistics}
import org.apache.spark.sql.execution.{LeafExecNode, SparkPlan}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.StructType

/** A driver-deferred summary source: a leaf logical node whose rows are
  * produced by a driver-side thunk that runs at EXECUTION time, not at plan
  * construction.
  *
  * Purpose: sink-verification queries (dataset_export) must perform a real
  * write + read-back round trip, but a query REGISTRY must stay inert —
  * plan-only consumers (plan audits, bench plan-hashing, .explain) iterate
  * every entry and must not trigger write jobs. Wrapping the side effect in
  * this node moves it from DataFrame CONSTRUCTION to the first action, the
  * same deferral discipline every other query already has for free.
  *
  * The thunk runs on the driver inside doExecute — the same nested-job
  * pattern Spark's own BroadcastExchangeExec uses (child plans executed
  * eagerly during plan materialization). It is re-run on every action, so
  * thunks must be self-contained (fresh scratch paths per call).
  */
case class DeferredSummaryNode(
    label: String,
    override val output: Seq[Attribute],
    thunk: () => Array[InternalRow]) extends LeafNode {
  // A deferred summary is a handful of rows by contract (it exists to carry
  // an aggregate proof, not data): advertise a tiny size so joins against
  // it broadcast.
  override def computeStats(): Statistics = Statistics(sizeInBytes = 256)
  // The thunk is a JVM closure: its toString carries a per-run lambda
  // identity (Lambda$N/0xADDR@HASH) that would churn plan fingerprints on
  // identical code — keep it out of the explain string.
  override def stringArgs: Iterator[Any] = Iterator(label, output)
}

case class DeferredSummaryExec(
    label: String,
    override val output: Seq[Attribute],
    thunk: () => Array[InternalRow]) extends LeafExecNode {
  override def stringArgs: Iterator[Any] = Iterator(label, output)
  override protected def doExecute(): RDD[InternalRow] = {
    // Driver-side: the thunk may itself run Spark jobs (write + read-back).
    // Rows come back as collected (copied) UnsafeRows; a 1-partition
    // parallelize hands them to the parent plan.
    val rows = thunk()
    sparkContext.parallelize(rows.toIndexedSeq, 1)
  }
}

/** A driver-deferred FRAME source: like [[DeferredSummaryNode]], but the
  * thunk returns a whole DataFrame whose rows may be corpus-sized — the
  * deferral vehicle for kernels that must interleave driver actions with
  * plan construction (IRLS moment collects, data-dependent pointer-jumping
  * loops, kmeans/PQ codebook training, eager lineage-truncation
  * checkpoints). Wrapping them moves every such job from DataFrame
  * CONSTRUCTION to first action, so a registry of 246 queries can be
  * constructed, plan-audited, and plan-hashed without scanning a byte.
  *
  * Unlike the summary node, output cardinality is UNKNOWN — stats advertise
  * the session's defaultSizeInBytes so a join against a deferred frame is
  * never auto-broadcast. The inner plan stays reachable for test-time
  * audits via [[DeferredFrameNode.frame]] (building it MAY run jobs — that
  * is the point of the deferral).
  *
  * COMPOSITION CONTRACT: the leaf is an optimization boundary. Catalyst
  * sees an opaque relation, so a Filter or Project applied ON TOP of a
  * wrapped registry entry stays ABOVE the leaf — it can never push into
  * the inner plan's scans (DeferredCompositionSpec pins this: the inner
  * frame's PushedFilters stay empty and the outer filter evaluates
  * post-hoc over the full kernel output). Correct, but at corpus scale the
  * kernel still reads everything. The registry rows are terminal driver
  * surfaces, so this costs them nothing; a library USER composing further
  * work on top of a deferred entry (e.g. filtering `pagerank` to one
  * node's rank) should instead compose on the underlying `graft.analysis`
  * / `graft.curation` kernel functions directly, where pushdown and
  * column pruning reach the scans as usual.
  */
case class DeferredFrameNode(
    label: String,
    override val output: Seq[Attribute],
    frame: () => DataFrame) extends LeafNode {
  override def computeStats(): Statistics =
    Statistics(sizeInBytes = conf.defaultSizeInBytes)
  override def stringArgs: Iterator[Any] = Iterator(label, output)
}

case class DeferredFrameExec(
    label: String,
    override val output: Seq[Attribute],
    frame: () => DataFrame) extends LeafExecNode {
  override def stringArgs: Iterator[Any] = Iterator(label, output)
  override protected def doExecute(): RDD[InternalRow] = {
    // Driver-side: building the inner frame may run nested jobs (the
    // BroadcastExchangeExec pattern); its physical RDD is then consumed
    // positionally by the parent, so only the column TYPES must agree.
    val df = frame()
    val declared = StructType(output.map(a =>
      org.apache.spark.sql.types.StructField(a.name, a.dataType, a.nullable)))
    // structural (positional-type) AND name equality: the parent consumes
    // rows positionally, so equalsStructurally alone would let a
    // same-typed column swap/rename ship mislabeled values silently — the
    // drift must fail loudly HERE, at first action, with the column named
    require(org.apache.spark.sql.types.DataType.equalsStructurally(
      df.schema, declared, ignoreNullability = true) &&
      df.schema.fieldNames.sameElements(declared.fieldNames),
      s"deferred frame '$label' schema drifted: ${df.schema.sql} vs declared ${declared.sql}")
    df.queryExecution.toRdd
  }
}

object DeferredSummaryStrategy extends Strategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case DeferredSummaryNode(label, out, thunk) =>
      DeferredSummaryExec(label, out, thunk) :: Nil
    case DeferredFrameNode(label, out, thunk) =>
      DeferredFrameExec(label, out, thunk) :: Nil
    case _ => Nil
  }
}

object DeferredSummary {
  /** Builds a DataFrame whose rows are produced by `thunk` at first action.
    * The thunk must return InternalRows matching `schema` (use
    * `executeCollect()` on a frame whose agg casts pin the exact types).
    * Requires [[GraftExtensions]] on the session (GraftSession registers
    * it) — without the injected strategy, planning fails with an explicit
    * "no plan for DeferredSummaryNode".
    */
  def of(spark: SparkSession, label: String, schema: StructType)
        (thunk: () => Array[InternalRow]): DataFrame = {
    val attrs = schema.map(f => AttributeReference(f.name, f.dataType, f.nullable)())
    Bridge.ofRows(spark, DeferredSummaryNode(label, attrs, thunk))
  }

  /** Builds a DataFrame whose rows come from the frame `thunk` at first
    * action. `ddl` is the static output contract (checked structurally,
    * nullability ignored, when the thunk runs). */
  def frame(spark: SparkSession, label: String, ddl: String)
           (thunk: () => DataFrame): DataFrame = {
    val schema = StructType.fromDDL(ddl)
    val attrs = schema.map(f => AttributeReference(f.name, f.dataType, f.nullable)())
    Bridge.ofRows(spark, DeferredFrameNode(label, attrs, thunk))
  }
}
