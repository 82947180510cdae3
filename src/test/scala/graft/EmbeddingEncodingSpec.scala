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

  test("gramMoments reads double vectors via the typed accessor; rejects other types") {
    import spark.implicits._
    // float and double encodings of the same values must produce identical
    // moments (the double path reads 8-byte elements, never reinterprets)
    val doubles = Seq((1L, Seq(0.25, -1.5)), (2L, Seq(2.0, 0.125))).toDF("id", "vec")
    val floats = doubles.select(col("id"),
      col("vec").cast("array<float>").as("vec"))
    def moments(df: org.apache.spark.sql.DataFrame) =
      df.agg(graft.functions.GramMatrixAgg.gramMoments(col("vec"), 2).as("g"))
        .select(explode(col("g"))).collect().map(_.toString).toSeq
    assert(moments(doubles) === moments(floats))
    // a non-numeric-array input fails at analysis, not with garbage
    val strings = Seq((1L, Seq("a", "b"))).toDF("id", "vec")
    val ex = intercept[org.apache.spark.sql.AnalysisException] {
      strings.agg(graft.functions.GramMatrixAgg.gramMoments(col("vec"), 2)).collect()
    }
    assert(ex.getMessage.contains("array<float> or array<double>"))
  }
}
