package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.classic.Strategy
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}
import org.apache.spark.sql.graft.Bridge

/** Native as-of join: a whole-operator extension (logical node + planner
  * strategy + physical sort-merge exec) for the one relational shape Spark's
  * built-ins can't express directly.
  *
  * Compared to the composed union+window formulation
  * (graft.operators.AsOfJoin.asOf), the physical operator streams each
  * co-partitioned, co-sorted key group once with a single carried right row —
  * no unioned wide schema, no window buffer. Children are planned with the
  * same ClusteredDistribution contract SortMergeJoinExec uses — EnsureRequirements
  * co-partitions both sides and AQE coalesces them consistently — and with
  * required orderings so the planner inserts spilling SortExecs.
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

  // Same contract as SortMergeJoinExec: ClusteredDistribution on both sides.
  // EnsureRequirements co-partitions the children (inserting compatible
  // hash exchanges), and AQE's shuffle coalescing treats the two sides of a
  // binary node consistently — while letting it shrink the partition count
  // when the data is small, which a fixed StatefulOpClusteredDistribution
  // forbids (that cost 32 near-empty tasks per side at bench scale).
  override def requiredChildDistribution: Seq[Distribution] = Seq(
    ClusteredDistribution(Seq(leftKey)),
    ClusteredDistribution(Seq(rightKey)))

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTs, Ascending),
      SortOrder(rightTiebreak, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  /** Timestamps must be physically long-backed; enforced at plan time so a
    * DateType/IntegerType misuse fails with a clear message, not a cast
    * error deep inside doExecute. */
  private def requireLongBacked(a: Attribute, side: String): Unit = a.dataType match {
    case org.apache.spark.sql.types.TimestampType |
         org.apache.spark.sql.types.TimestampNTZType |
         org.apache.spark.sql.types.LongType => ()
    case other => throw new IllegalArgumentException(
      s"AsOfJoinExec: $side timestamp column '${a.name}' must be TIMESTAMP or BIGINT, got $other")
  }
  requireLongBacked(leftTs, "left")
  requireLongBacked(rightTs, "right")
  // both key readers (and the generic ordering) are built from the LEFT key
  // type — a silent left/right type mismatch would read the wrong field
  // width instead of failing
  require(leftKey.dataType == rightKey.dataType,
    s"AsOfJoinExec: key types must match, got ${leftKey.dataType} vs ${rightKey.dataType}")
  require(leftTs.dataType == rightTs.dataType,
    s"AsOfJoinExec: timestamp types must match, got ${leftTs.dataType} vs ${rightTs.dataType}")

  override protected def doExecute(): RDD[InternalRow] = {
    import org.apache.spark.sql.types._
    val lTsOrd = left.output.indexWhere(_.exprId == leftTs.exprId)
    val rTsOrd = right.output.indexWhere(_.exprId == rightTs.exprId)
    val lKeyOrd = left.output.indexWhere(_.exprId == leftKey.exprId)
    val rKeyOrd = right.output.indexWhere(_.exprId == rightKey.exprId)
    require(lTsOrd >= 0 && rTsOrd >= 0 && lKeyOrd >= 0 && rKeyOrd >= 0,
      "as-of key/timestamp columns must be direct child outputs")
    val keyType = leftKey.dataType
    // long-backed keys take a primitive path: no key projections, no
    // generated ordering — three fewer codegen units (the cold-run cost)
    // and zero per-row allocation.
    val primitiveKey = keyType match {
      case LongType | IntegerType | ShortType | ByteType |
           TimestampType | TimestampNTZType | DateType => true
      case _ => false
    }
    // right side must bind as nullable: unmatched left rows read a null row
    val joinedSchema = left.output ++ right.output.map(_.withNullability(true))
    val outputAttrs = output
    val rightArity = right.output.length
    val leftOutput = left.output
    val rightOutput = right.output
    val lKeyAttr = leftKey
    val rKeyAttr = rightKey

    def keyAsLong(dt: DataType): (InternalRow, Int) => Long = dt match {
      case LongType | TimestampType | TimestampNTZType => (r, i) => r.getLong(i)
      case IntegerType | DateType => (r, i) => r.getInt(i).toLong
      case ShortType => (r, i) => r.getShort(i).toLong
      case ByteType => (r, i) => r.getByte(i).toLong
    }

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val proj = UnsafeProjection.create(outputAttrs, joinedSchema)
      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(rightArity)
      // Carried state is always a private copy: sorter iterators reuse both
      // the row object AND (on spill) the backing buffer, so caching a live
      // row or an evaluated non-primitive key would silently mutate.
      // UnsafeRow.copyFrom reuses the carry buffer — no steady-state alloc.
      var carried: InternalRow = null
      def stashRow(dst: InternalRow, src: InternalRow): InternalRow = (dst, src) match {
        case (d: UnsafeRow, s: UnsafeRow) => d.copyFrom(s); d
        case (null, s: UnsafeRow) => s.copy()
        case (_, s) => s.copy()
      }

      if (primitiveKey) {
        val lKeyGet = keyAsLong(keyType)
        val rKeyGet = keyAsLong(keyType)
        var carriedKey = 0L
        var hasCarried = false
        // One-row lookahead with the peeked row's key/ts extracted ONCE:
        // the old buffered-iterator shape re-extracted (null checks + field
        // reads) on every left row that peeked at the same right row.
        // Null-keyed/ts right rows (which match nothing) are skipped eagerly
        // inside the pull.
        var peekRow: InternalRow = null
        var peekKey = 0L
        var peekTs = 0L
        def pullPeek(): Unit = {
          while (peekRow == null && rIter.hasNext) {
            val r = rIter.next()
            if (!r.isNullAt(rKeyOrd) && !r.isNullAt(rTsOrd)) {
              peekRow = r
              peekKey = rKeyGet(r, rKeyOrd)
              peekTs = r.getLong(rTsOrd)
            }
          }
        }
        pullPeek()
        lIter.map { lRow =>
          if (lRow.isNullAt(lKeyOrd) || lRow.isNullAt(lTsOrd)) {
            // null key/ts never matches (same as the composed join and SQL ASOF)
            proj(joined(lRow, nullRight))
          } else {
            val lk = lKeyGet(lRow, lKeyOrd)
            val lt = lRow.getLong(lTsOrd)
            if (hasCarried && carriedKey != lk) hasCarried = false
            // advance while the peek is at an earlier key (its carry can
            // never match again) or a usable same-key row at/before lt
            while (peekRow != null &&
                   (peekKey < lk || (peekKey == lk && peekTs <= lt))) {
              if (peekKey == lk) {
                carried = stashRow(carried, peekRow)
                carriedKey = lk
                hasCarried = true
              }
              peekRow = null
              pullPeek()
            }
            proj(joined(lRow, if (hasCarried) carried else nullRight))
          }
        }
      } else {
        // generic keys (string/decimal/...): codegen'd single-field key
        // projections + generated UnsafeRow ordering; carried key is copied
        // so a sort-spill buffer reuse can never alias it (strings point
        // into sorter memory).
        val lKeyProj = UnsafeProjection.create(Seq(lKeyAttr: Expression), leftOutput)
        val rKeyProj = UnsafeProjection.create(Seq(rKeyAttr: Expression), rightOutput)
        val keyOrdering = org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
          .create(StructType(Seq(StructField("k", keyType))))
        var carriedKey: UnsafeRow = null
        var hasCarried = false
        // the primitive path's peekKey/peekTs cache, generalized: project
        // the peeked row's key/ts ONCE per pull — without this, every left
        // row stalled on the same peek re-ran the codegen'd projection.
        // peekKey aliases rKeyProj's reuse buffer, which is only rewritten
        // inside pullPeek, after the previous peek has been consumed.
        var peekRow: InternalRow = null
        var peekKey: UnsafeRow = null
        var peekTs = 0L
        def pullPeek(): Unit = {
          while (peekRow == null && rIter.hasNext) {
            val r = rIter.next()
            val rk = rKeyProj(r)
            if (!rk.isNullAt(0) && !r.isNullAt(rTsOrd)) {
              peekRow = r
              peekKey = rk
              peekTs = r.getLong(rTsOrd)
            }
          }
        }
        pullPeek()
        lIter.map { lRow =>
          val lk = lKeyProj(lRow)
          if (lk.isNullAt(0) || lRow.isNullAt(lTsOrd)) {
            proj(joined(lRow, nullRight))
          } else {
            val lt = lRow.getLong(lTsOrd)
            if (hasCarried && keyOrdering.compare(carriedKey, lk) != 0) hasCarried = false
            var advance = true
            while (advance && peekRow != null) {
              val cmp = keyOrdering.compare(peekKey, lk)
              if (cmp < 0) {
                peekRow = null; pullPeek()
              } else if (cmp == 0 && peekTs <= lt) {
                carried = stashRow(carried, peekRow)
                carriedKey = stashRow(carriedKey, lk).asInstanceOf[UnsafeRow]
                hasCarried = true
                peekRow = null; pullPeek()
              } else {
                advance = false
              }
            }
            proj(joined(lRow, if (hasCarried) carried else nullRight))
          }
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
    // prefix the right side so the joined output has unambiguous names.
    // The key gets BOTH forms when it is also a payload column: the bare
    // name joins, the __r_ alias carries it to asof_<key> — same output
    // shape the composed AsOfJoin produces for that call.
    val rcols = (Seq(key, rightTs, rightTiebreak) ++ payload).distinct
    val reserved = rcols.filterNot(_ == key).map(c => s"__r_$c").toSet ++
      (rightTs +: payload).map(p => s"asof_$p")
    val clash = left.columns.filter(reserved) ++
      right.columns.filter(reserved.filterNot(_.startsWith("asof_")))
    require(clash.isEmpty,
      s"AsOfJoinNative.asOf: input columns ${clash.mkString(", ")} collide with reserved __r_*/asof_* names")
    val rsel = rcols.map(c => col(c).as(if (c == key) c else s"__r_$c")) ++
      (if (payload.contains(key)) Seq(col(key).as(s"__r_$key")) else Nil)
    val r = right.select(rsel: _*)
    val lPlan = Bridge.analyzed(left)
    val rPlan = Bridge.analyzed(r)
    // resolve like Spark does under the default case-insensitive resolver,
    // and fail with the column and side instead of a bare None.get
    def attr(p: LogicalPlan, name: String): Attribute =
      p.output.find(_.name == name)
        .orElse(p.output.find(_.name.equalsIgnoreCase(name)))
        .getOrElse(throw new IllegalArgumentException(
          s"AsOfJoinNative.asOf: no column '$name' among [${p.output.map(_.name).mkString(", ")}]"))
    val node = AsOfJoinNode(lPlan, rPlan,
      attr(lPlan, key), attr(rPlan, key), attr(lPlan, leftTs), attr(rPlan, s"__r_$rightTs"),
      attr(rPlan, s"__r_$rightTiebreak"))
    val joined = Bridge.ofRows(left.sparkSession, node)
    val leftCols = left.columns.map(col)
    val payloadCols = (rightTs +: payload.filterNot(_ == rightTs)).map(p => col(s"__r_$p").as(s"asof_$p"))
    joined.select(leftCols.toIndexedSeq ++ payloadCols: _*)
  }
}
