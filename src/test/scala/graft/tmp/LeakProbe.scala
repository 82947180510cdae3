package graft.tmp

import graft.GraftSession
import org.apache.spark.sql.functions._

/** Throwaway dev harness: stage-wise timing of crossSourceLeakage's parts. */
object LeakProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/sf10")
    val spark = GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = GraftSession.table(spark, sfDir, "documents")
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"LEAKPROBE $label n=$n ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    // stage 1: split only
    time("split")(docs.select(size(split(col("text"), " ", -1)).as("n")).agg(sum(col("n"))).head.getLong(0))
    // stage 2: wordChunks explode (private — reproduce inline)
    val w = split(col("text"), " ", -1)
    val window = 16; val stride = 8
    val nExtra = floor((greatest(lit(0), size(w) - window) + (stride - 1)) / lit(stride.toDouble)).cast("int")
    val chunks = transform(sequence(lit(0), nExtra), i => slice(w, (i * stride + 1).cast("int"), lit(window)))
    time("chunks_explode")(docs.select(col("source").as("__src"), explode(chunks).as("ws"))
      .filter(size(col("ws")) === window).count())
    // stage 3: + md5
    time("md5")(docs.select(col("source").as("__src"), explode(chunks).as("ws"))
      .filter(size(col("ws")) === window)
      .select(md5(array_join(col("ws"), " ")).as("__h"), col("__src"))
      .agg(count(col("__h"))).head.getLong(0))
    // stage 4: full srcSets agg
    time("srcsets")(docs.select(col("source").as("__src"), explode(chunks).as("ws"))
      .filter(size(col("ws")) === window)
      .groupBy(md5(array_join(col("ws"), " ")).as("__h"))
      .agg(array_sort(collect_set(col("__src"))).as("__srcs"))
      .filter(size(col("__srcs")) > 1).count())
    spark.stop()
  }
}
