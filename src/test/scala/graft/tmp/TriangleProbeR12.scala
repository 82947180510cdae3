package graft.tmp

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Round-12 A/B: triangle core with lazy-persist sharing (shipped) vs the
  * r11 eager localCheckpoint, on the dense sf10 replica graph.
  */
object TriangleProbeR12 {
  def closedTrianglesCkpt(edgesIn: DataFrame, src: Column, dst: Column): DataFrame = {
    val und = edgesIn.select(src.as("a"), dst.as("b"))
      .filter(col("a").isNotNull && col("b").isNotNull && col("a") =!= col("b"))
      .select(least(col("a"), col("b")).as("a"), greatest(col("a"), col("b")).as("b"))
      .distinct()
      .localCheckpoint()
    val deg = und.select(explode(array(col("a"), col("b"))).as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("deg"))
    val withDeg = und
      .join(deg.select(col("node").as("a"), col("deg").as("da")), Seq("a"))
      .join(deg.select(col("node").as("b"), col("deg").as("db")), Seq("b"))
    val oriented = withDeg.select(
      when(struct(col("da"), col("a")) < struct(col("db"), col("b")), col("a"))
        .otherwise(col("b")).as("src"),
      when(struct(col("da"), col("a")) < struct(col("db"), col("b")), col("b"))
        .otherwise(col("a")).as("dst"),
      when(struct(col("da"), col("a")) < struct(col("db"), col("b")), col("db"))
        .otherwise(col("da")).as("ddst"))
      .localCheckpoint()
    val wedges = oriented.as("e1").join(oriented.as("e2"),
        col("e1.src") === col("e2.src") &&
          (struct(col("e1.ddst"), col("e1.dst")) < struct(col("e2.ddst"), col("e2.dst"))))
      .select(col("e1.src").as("wa"), col("e1.dst").as("wb"), col("e2.dst").as("wc"))
    val closed = wedges.join(oriented.select(col("src").as("wb"), col("dst").as("wc")),
      Seq("wb", "wc"))
      .select(col("wa"), col("wb"), col("wc"))
    val counts = closed.agg(count(lit(1)).as("n_triangles"))
    und.agg(count(lit(1)).as("n_edges"))
      .crossJoin(deg.agg(count(lit(1)).as("n_nodes")))
      .crossJoin(counts)
      .select(col("n_nodes"), col("n_edges"), col("n_triangles"))
  }

  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/tmp/sf10"
    val spark = graft.GraftSession.builder("local[32]", 32,
      graft.GraftSession.CpuDenseMaxPartitionBytes).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val ev = graft.GraftSession.table(spark, dir, "events")
    ev.count()
    val k = graft.text.Cleaners.firstInt(col("props"))
    def edges = ev.filter(k.isNotNull && col("user_id").isNotNull)
      .select(col("user_id").as("src"), (k % 150).cast("long").as("dst"))
    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"$label%-28s ${(System.nanoTime() - t0) / 1e9}%7.1fs")
    }
    for (i <- 1 to 2)
      time(s"r11 checkpoint rep$i") {
        closedTrianglesCkpt(edges, col("src"), col("dst")).collect().foreach(println)
      }
    for (i <- 1 to 2)
      time(s"shipped lazy-share rep$i") {
        graft.analysis.Graph.triangleCount(edges, col("src"), col("dst"))
          .collect().foreach(println)
      }
  }
}
