package graft.tmp

import org.apache.spark.sql.functions._
import graft.GraftSession

/** Throwaway dev probe: does the PqEncodeCodes codebook argument leak a
  * JVM-identity array rendering ([[[D@hex) into the optimized-plan string
  * Bench fingerprints? */
object PqPlanStringProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("local[4]", 4).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val cb = Array(Array(Array(0.1, 0.2), Array(0.3, 0.4)))
    val df = spark.range(3).select(col("id"),
      graft.functions.VectorExpressions.pqEncodeCodes(
        array(col("id").cast("double"), lit(0.2)), cb).as("codes"))
    val s = df.queryExecution.optimizedPlan.toString
    println("PLANSTR " + s.replace("\n", " | "))
    println("HASID " + s.matches("(?s).*@[0-9a-f]{4,}.*"))
    spark.stop()
  }
}
