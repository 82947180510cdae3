package graft.tmp

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-12 probe (VERDICT r11 #5): pagerank's 100x parity evidence without
  * the DuckDB oracle (whose recursive SQL exhausts spill at sf10).
  *
  * Runs the SHIPPED query-shaped pagerank (Graph.pageRank: r6-quantized
  * contributions, DECIMAL(18,6) sums, per-iteration re-round) against an
  * INDEPENDENT in-Spark formulation of the same algebra — SQL-rendered,
  * micro-unit BIGINT accumulation, no decimal type, its own join order —
  * at the key-shifted replica scales (/tmp/sf3, /tmp/sf10; see MakeSf1).
  * Exact frame equality (except() both ways) is the pass condition.
  */
object PageRankDiffProbeR12 {

  def naiveMicroPageRank(spark: SparkSession, edgesIn: DataFrame,
                         iters: Int, d: Double): DataFrame = {
    val e = edgesIn.where("src IS NOT NULL AND dst IS NOT NULL")
      .select("src", "dst").distinct().localCheckpoint()
    val outdeg = e.groupBy("src").agg(count(lit(1)).as("o"))
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct().localCheckpoint()
    val n = nodes.count().toDouble
    val base = (1.0 - d) / n
    var rank = nodes.selectExpr("node",
      s"floor((1.0/$n) * 1.0e6 + 0.5) / 1.0e6 AS rank").localCheckpoint()
    for (_ <- 0 until iters) {
      val contrib = rank.join(outdeg, rank("node") === outdeg("src"))
        .join(e, "src")
        .selectExpr("dst AS node",
          "CAST(floor(rank / CAST(o AS DOUBLE) * 1.0e6 + 0.5) AS BIGINT) AS micro")
        .groupBy("node").agg(sum(col("micro")).as("m"))
      rank = nodes.join(contrib, Seq("node"), "left")
        .selectExpr("node",
          s"floor(($base + $d * (CAST(coalesce(m, 0L) AS DOUBLE) / 1.0e6)) * 1.0e6 + 0.5) / 1.0e6 AS rank")
        .localCheckpoint()
    }
    rank
  }

  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq else Seq("/tmp/sf3", "/tmp/sf10")
    val spark = graft.GraftSession.builder("local[32]", 32,
      graft.GraftSession.CpuDenseMaxPartitionBytes).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    dirs.foreach { dir =>
      val t0 = System.nanoTime()
      // the query's own edge derivation (props-digit key mod 150)
      val k = "CAST(CASE WHEN length(NULLIF(regexp_extract(props, '[0-9]+', 0), '')) <= 9 THEN NULLIF(regexp_extract(props, '[0-9]+', 0), '') END AS INT)"
      val edges = graft.GraftSession.table(spark, dir, "events")
        .where(s"$k IS NOT NULL AND user_id IS NOT NULL")
        .selectExpr("user_id AS src", s"CAST($k % 150 AS BIGINT) AS dst")
      val shipped = graft.analysis.Graph
        .pageRank(edges, col("src"), col("dst"), 5, 0.75)
      val naive = naiveMicroPageRank(spark, edges, 5, 0.75)
      val nShipped = shipped.count()
      val nNaive = naive.count()
      val onlyShipped = shipped.except(naive).count()
      val onlyNaive = naive.except(shipped).count()
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"PAGERANK_DIFF dir=$dir rows_shipped=$nShipped rows_naive=$nNaive " +
        f"only_shipped=$onlyShipped only_naive=$onlyNaive secs=$secs%.1f " +
        (if (nShipped == nNaive && onlyShipped == 0 && onlyNaive == 0) "MATCH" else "MISMATCH"))
    }
    spark.stop()
  }
}
