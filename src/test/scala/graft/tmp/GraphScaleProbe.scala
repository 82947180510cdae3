package graft.tmp

import org.apache.spark.sql.functions._
import graft.GraftSession

/** Throwaway dev probe for the graph operators.
  *
  * 1) PageRank, 5 iterations over 10M random edges / ~1M nodes — per-
  *    iteration cost and total.
  * 2) Triangle counting at 5M random edges / 500k nodes, PLUS a planted
  *    100k-degree hub. Degree-ordered orientation keeps hub wedges
  *    bounded; an id-ordered orientation at a LOW-id hub would generate
  *    C(100k, 2) ≈ 5·10⁹ wedges from that node alone (measured here as
  *    the id-ordered wedge count, computed arithmetically — running it
  *    would be the point of failure).
  */
object GraphScaleProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("local[32]", 64).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"SCALE $tag ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val nEdges = 10000000L
    val edges = spark.range(nEdges).select(
      pmod(xxhash64(col("id") * 2), lit(1000000)).as("src"),
      pmod(xxhash64(col("id") * 2 + 1), lit(1000000)).as("dst"))
      .localCheckpoint()
    println(s"pagerank edges: ${edges.count()}")
    time("pagerank_5iter_10M_edges") {
      val pr = graft.analysis.Graph.pageRank(edges, col("src"), col("dst"), 5, 0.75)
      println(s"ranked nodes: ${pr.count()}")
    }

    // triangles: 5M random edges over 500k nodes + a 100k-degree hub at a
    // LOW id (the adversarial case for id-ordered orientation)
    val rand = spark.range(5000000L).select(
      pmod(xxhash64(col("id") * 3), lit(500000)).as("src"),
      pmod(xxhash64(col("id") * 3 + 1), lit(500000)).as("dst"))
    val hub = spark.range(100000L).select(lit(0L).as("src"), (col("id") + 1).as("dst"))
    val tEdges = rand.unionByName(hub).localCheckpoint()
    println(s"triangle edges: ${tEdges.count()}")
    time("triangles_5M_edges_plus_100k_hub") {
      val t = graft.analysis.Graph.triangleCount(tEdges, col("src"), col("dst"))
        .collect().head
      println(s"nodes=${t.getLong(0)} edges=${t.getLong(1)} triangles=${t.getLong(2)}")
    }
    spark.stop()
  }
}
