package graft.tmp

import org.apache.spark.sql.functions._
import graft.GraftSession

/** Throwaway dev probe for the pointer-jumping connected components. */
object CcProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("local[4]", 4).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val chain = (0L until 20L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    try {
      val got = graft.dedup.Dedup.connectedComponents(chain, "doc_a", "doc_b")
        .as[(Long, Long)].collect()
      println("OK rows=" + got.length + " comps=" + got.map(_._2).distinct.toSeq.sorted)
    } catch {
      case e: Throwable => e.printStackTrace()
    }
    spark.stop()
  }
}
