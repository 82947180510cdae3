package graft.tmp

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Throwaway: where does dedup_prefix_filter's time go at sf0.1? */
object PrefixProbe2 {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROBE $tag ${(System.nanoTime() - t0) / 1e9}%.2f s -> $r"); r
    }
    val d = graft.GraftSession.table(spark, "/root/testdata/sf0.1", "documents")
    time("docs")(d.count())
    val tau = 0.4
    val docs = d.select(col("doc_id"), graft.functions.ShingleExpressions.distinctShingles(col("text"), 3).as("shingles"))
      .withColumn("sz", size(col("shingles"))).filter(col("sz") > 0)
    time("shingle_pass")(docs.agg(sum("sz"), avg("sz"), max("sz")).collect().mkString(","))
    val ex = docs.select(col("doc_id"), col("sz"), explode(col("shingles")).as("sh"))
    val freq = ex.groupBy(col("sh")).agg(count(lit(1)).as("__df"))
    time("freq_distinct_shingles")(freq.count())
    println("PROBE hot df>100=" + freq.filter(col("__df") > 100).count()
      + " df>1000=" + freq.filter(col("__df") > 1000).count()
      + " max=" + freq.agg(max("__df")).collect()(0))
    val ranked = ex.join(freq, Seq("sh"))
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col("doc_id")).orderBy(col("__df"), col("sh"))))
      .filter(col("__rn") <= (col("sz") - ceil(lit(tau) * col("sz") - lit(1e-9)) + 1).cast("int"))
      .select(col("doc_id"), col("sz"), col("sh"))
    time("ranked_prefix_rows")(ranked.count())
    val candRaw = ranked.as("a").join(ranked.as("b"),
      col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id") &&
        least(col("a.sz"), col("b.sz")).cast("double") >=
          lit(tau) * greatest(col("a.sz"), col("b.sz")).cast("double") - lit(1e-9))
    time("cand_raw")(candRaw.count())
    val cand = candRaw.select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b")).distinct()
    time("cand_distinct")(cand.count())
    time("full_operator")(graft.dedup.Dedup.prefixFilterJoin(d, col("doc_id"), col("text"), 3, 0.4).count())
    spark.stop()
  }
}
