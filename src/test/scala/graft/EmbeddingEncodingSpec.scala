package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DoubleType}

/** Ingest type-tolerance for the embedding column: pandas/pyarrow writers
  * default float lists to list<double>, while the corpus contract is
  * list<float>. `GraftSession.table` must normalize the wide encoding at
  * the boundary (float-representable values round-trip exactly), and the
  * float-typed kernels must reject a raw double vector LOUDLY instead of
  * reading garbage — the round-6 ts-drift lesson applied to the third
  * likely writer-drift column after ts/date/money.
  */
class EmbeddingEncodingSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"
  private val probes = Seq("embedding_covariance", "embedding_dim_stats", "ann_topk")

  test("list<double> embeddings normalize to the float contract at ingest") {
    val base = java.nio.file.Files.createTempDirectory("graft-emb-variants").toString
    val emb = GraftSession.table(spark, sfDir, "embeddings")
    emb.withColumn("embedding", col("embedding").cast(ArrayType(DoubleType)))
      .write.mode("overwrite").parquet(s"$base/wide/embeddings.parquet")
    // the other tables ride along unchanged so every probe query runs
    Seq("events", "documents").foreach { t =>
      GraftSession.table(spark, sfDir, t)
        .write.mode("overwrite").parquet(s"$base/wide/$t.parquet")
    }
    assert(GraftSession.table(spark, s"$base/wide", "embeddings")
      .schema("embedding").dataType === emb.schema("embedding").dataType)
    probes.foreach { q =>
      val canonical = SparkEntry.queries(q)(spark, sfDir)
        .collect().map(_.toString).sorted.toSeq
      val viaWide = SparkEntry.queries(q)(spark, s"$base/wide")
        .collect().map(_.toString).sorted.toSeq
      assert(viaWide === canonical, s"$q drifted under list<double> embeddings")
    }
  }

  test("gramMoments rejects a non-float vector at analysis time") {
    import spark.implicits._
    val doubles = Seq((1L, Seq(1.0, 2.0))).toDF("id", "vec")
    val ex = intercept[org.apache.spark.sql.AnalysisException] {
      doubles.agg(graft.functions.GramMatrixAgg.gramMoments(col("vec"), 2)).collect()
    }
    assert(ex.getMessage.contains("array<float>"))
  }
}
