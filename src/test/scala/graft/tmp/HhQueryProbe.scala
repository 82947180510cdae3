package graft.tmp

/** Dev probe: print the topk_values_sketch rows at sf0.01. */
object HhQueryProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.get("local[8]")
    val df = graft.SparkEntry.queries("topk_values_sketch")(spark, "/root/testdata/sf0.01")
      .orderBy("source", "rank")
    df.collect().take(8).foreach(println)
    println("ROWS=" + df.count())
    spark.stop()
  }
}
