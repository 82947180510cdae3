package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, attach the most recent right row (same
  * key) with right.ts <= left.ts.
  *
  * Spark lacks this operator; rather than a custom SparkPlan, it composes
  * scalably from a union + one window pass: tag both sides, sort each key
  * partition by (ts, side), and carry the last right payload forward. One
  * shuffle on the key, streaming window — the same plan shape a native
  * sort-merge as-of join would produce, with AQE/salting applying as usual.
  *
  * The right side is pre-deduplicated to its latest row per (key, ts) so
  * equal-timestamp matches are unambiguous.
  */
object AsOfJoin {

  /** @param left      fact rows to enrich
    * @param right     timeline rows to match backwards against
    * @param key       equi-join key column name (both sides)
    * @param leftTs    left event-time column name
    * @param rightTs   right event-time column name
    * @param rightTiebreak right column name making (key, ts) ordering total
    * @param payload   right columns to carry (emitted as asof_<name>)
    * @param toleranceSeconds optional max lookback: a carried match older
    *                  than this many seconds is nulled out (the pandas
    *                  merge_asof `tolerance` contract). The carry itself is
    *                  unchanged — only the emission is gated — so one window
    *                  pass still serves any tolerance.
    * @param direction "backward" (most recent right with r.ts <= l.ts, the
    *                  default), "forward" (earliest right with
    *                  r.ts >= l.ts — merge_asof direction='forward'), or
    *                  "nearest" (whichever of the two is closer in time;
    *                  ties prefer backward — the merge_asof convention).
    *                  Forward is the SAME one-window plan with the
    *                  event-time order reversed; nearest evaluates both
    *                  carries over ONE shuffle (two Window nodes share the
    *                  key exchange, only the sort differs) and picks
    *                  row-locally. At equal timestamps the right row
    *                  always sorts first, so boundary matches stay
    *                  inclusive in every direction.
    */
  def asOf(left: DataFrame, right: DataFrame, key: String, leftTs: String,
           rightTs: String, rightTiebreak: String, payload: Seq[String],
           toleranceSeconds: Option[Long] = None,
           direction: String = "backward"): DataFrame = {
    require(Seq("backward", "forward", "nearest").contains(direction),
      s"asOf direction must be backward|forward|nearest, got $direction")
    graft.util.TempCols.assertFree(left, "__ts", "__pay", "__tag", "__carry", "__cb", "__cf")
    graft.util.TempCols.assertFree(right, "__ts", "__pay", "__tag", "__carry", "__cb", "__cf")
    // null-keyed/ts right rows can never match (SQL join semantics — the
    // window would otherwise group null keys together and carry them)
    val rightClean = right.filter(col(key).isNotNull && col(rightTs).isNotNull)
    val r = Snapshots.latest(rightClean, Seq(col(key), col(rightTs)), col(rightTiebreak))
      .select(col(key), col(rightTs).as("__ts"),
        struct((rightTs +: payload).map(col): _*).as("__pay"))
      .withColumn("__tag", lit(0))
    val leftCols = left.columns
    val l = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__pay", lit(null).cast(r.schema("__pay").dataType))
      .withColumn("__tag", lit(1))
      .select((Seq(key, "__ts", "__pay", "__tag") ++ leftCols.filterNot(_ == key)).map(col): _*)
    val unioned = r.select(col(key), col("__ts"), col("__pay"), col("__tag"))
      .unionByName(l, allowMissingColumns = true)
    def overDir(dir: String): Column = {
      val tsOrder = if (dir == "backward") col("__ts").asc else col("__ts").desc
      last(col("__pay"), ignoreNulls = true).over(
        Window.partitionBy(col(key))
          .orderBy(tsOrder, col("__tag").asc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    }
    // tolerance gate per carried side: INTERVAL comparison (not epoch
    // casts) — exact at microsecond resolution and the same expression an
    // oracle dialect writes
    def gate(carry: Column, dir: String): Column = toleranceSeconds match {
      case Some(tol) =>
        require(tol >= 0, s"asOf tolerance must be >= 0 seconds, got $tol")
        val inWindow =
          if (dir == "backward")
            carry.getField(rightTs) >= col("__ts") - expr(s"INTERVAL $tol SECOND")
          else
            carry.getField(rightTs) <= col("__ts") + expr(s"INTERVAL $tol SECOND")
        when(inWindow, carry)
      case None => carry
    }
    val gated = direction match {
      case "backward" | "forward" =>
        unioned.withColumn("__carry", gate(overDir(direction), direction))
      case "nearest" =>
        // both carries over the SAME key exchange; choose the closer side
        // row-locally, ties to backward (the merge_asof convention)
        val both = unioned
          .withColumn("__cb", gate(overDir("backward"), "backward"))
          .withColumn("__cf", gate(overDir("forward"), "forward"))
        both.withColumn("__carry",
            when(col("__cf").isNull, col("__cb"))
              .when(col("__cb").isNull, col("__cf"))
              .when(col("__ts") - col(s"__cb.$rightTs") <=
                col(s"__cf.$rightTs") - col("__ts"), col("__cb"))
              .otherwise(col("__cf")))
          .drop("__cb", "__cf")
    }
    val out = gated.filter(col("__tag") === 1)
    val payloadCols = (rightTs +: payload).map(p => col(s"__carry.$p").as(s"asof_$p"))
    out.select(leftCols.toIndexedSeq.map(col) ++ payloadCols: _*)
  }
}
