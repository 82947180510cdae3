package graft.analysis

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Traffic analysis + deterministic message sampling — the two automated-
  * analysis exports the reference runs alongside engagement counts
  * (reference: src/engagement_db_to_analysis/automated_analysis.py:103-116:
  * `sample_messages.export_sample_messages_csv` with limit_per_code, and
  * `traffic_analysis.export_traffic_analysis_csv` over configured
  * [start, end) labelled time blocks).
  */
object Traffic {

  /** Message counts per labelled time block. `blocks` is the traffic-label
    * config table (`block_label`, `block_start`, `block_end`) — configuration-
    * sized, so it broadcasts; the range join [start, end) never shuffles the
    * fact side. Blocks may overlap (a message counts in every block that
    * covers it), matching the reference's independent per-label counts.
    */
  def trafficCounts(messages: DataFrame, ts: Column, category: Column,
                    blocks: DataFrame): DataFrame =
    messages.join(broadcast(blocks),
        ts >= col("block_start") && ts < col("block_end"))
      .groupBy(col("block_label"), col("block_start"), category.as("category"))
      .agg(count(lit(1)).as("n_messages"))

  /** Uniform 6h/1d/... block config over [rangeStart, rangeEnd): the common
    * traffic-label shape. Built with `sequence` — no driver-side loop.
    */
  def uniformBlocks(any: DataFrame, rangeStart: String, rangeEnd: String,
                    blockExpr: String, labelFormat: String = "yyyyMMddHH"): DataFrame =
    any.sparkSession.range(1)
      .select(explode(sequence(
        lit(rangeStart).cast("timestamp"),
        lit(rangeEnd).cast("timestamp") - expr(s"INTERVAL $blockExpr"),
        expr(s"INTERVAL $blockExpr"))).as("block_start"))
      .select(
        concat(lit("blk_"), date_format(col("block_start"), labelFormat)).as("block_label"),
        col("block_start"),
        (col("block_start") + expr(s"INTERVAL $blockExpr")).as("block_end"))

  /** Up to `limitPerCode` sample messages per code, deterministically
    * pseudo-random: ranked by md5 of the message id (stable across runs and
    * engines — no rand()), id as tiebreak. One window over the code
    * partition; with small k the per-partition top-k filter is pushed by
    * Spark's WindowGroupLimit optimization.
    */
  def sampleMessages(messages: DataFrame, code: Column, id: Column, text: Column,
                     limitPerCode: Int): DataFrame = {
    // no reserved-name guard needed: the select below projects the input
    // down to (code, message_id, text) before __rank is added
    messages
      .select(code.as("code"), id.as("message_id"), text.as("text"))
      .withColumn("__rank",
        row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("code")).orderBy(md5(col("message_id").cast("string")), col("message_id"))))
      .filter(col("__rank") <= limitPerCode)
      .withColumnRenamed("__rank", "sample_rank")
  }
}
