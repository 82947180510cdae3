package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DateType, TimestampNTZType, TimestampType}

/** Ingest type-tolerance contract for the relational date columns.
  *
  * Round 6's testdata regeneration silently flipped `events.ts` from
  * TIMESTAMP to TIMESTAMP_NTZ and broke an operator at plan time. The
  * same drift can hit `l_shipdate` / `o_orderdate`: the values are
  * midnight-only, so an upstream writer could legitimately re-encode them
  * as parquet DATE, TIMESTAMP(adjustedToUTC=true), or
  * TIMESTAMP(adjustedToUTC=false). Every relational query must return the
  * same rows under all three — the usage classes covered are range
  * comparison against literals (q1), date column in the output + join
  * filters (q3), datediff bucketing (q12), and interval arithmetic inside
  * a join condition (q21).
  */
class DateEncodingSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"
  private val probes = Seq(
    "q1_pricing_summary", "q3_shipping_priority", "q12_late_shipments", "q21_waiting_suppliers")
  // tables those four queries touch; lineitem/orders carry the date columns
  private val passthrough = Seq("customer", "supplier", "nation", "region")

  /** Collects with date-like output columns normalized to `yyyy-MM-dd`
    * strings so DATE and midnight TIMESTAMP variants compare equal. */
  private def rows(df: DataFrame): Seq[String] = {
    val normalized = df.select(df.schema.fields.map { f =>
      f.dataType match {
        case DateType | TimestampType | TimestampNTZType =>
          col(f.name).cast(DateType).cast("string").as(f.name)
        case _ => col(f.name)
      }
    }.toIndexedSeq: _*)
    normalized.collect().map(_.toString).sorted.toSeq
  }

  test("relational queries are invariant to the shipdate/orderdate parquet encoding") {
    val base = java.nio.file.Files.createTempDirectory("graft-date-variants").toString
    val variants: Seq[(String, (DataFrame, String) => DataFrame)] = Seq(
      "date" -> ((df, c) => df.withColumn(c, col(c).cast(DateType))),
      "ltz"  -> ((df, c) => df.withColumn(c, col(c).cast(TimestampType))),
      "ntz"  -> ((df, c) => df.withColumn(c, col(c).cast(TimestampNTZType))))
    variants.foreach { case (tag, enc) =>
      val dir = s"$base/$tag"
      enc(GraftSession.table(spark, sfDir, "lineitem"), "l_shipdate")
        .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
      enc(GraftSession.table(spark, sfDir, "orders"), "o_orderdate")
        .write.mode("overwrite").parquet(s"$dir/orders.parquet")
      passthrough.foreach(t => GraftSession.table(spark, sfDir, t)
        .write.mode("overwrite").parquet(s"$dir/$t.parquet"))
    }
    probes.foreach { name =>
      val want = rows(SparkEntry.queries(name)(spark, sfDir))
      assert(want.nonEmpty, s"$name returned no rows at $sfDir — probe is vacuous")
      variants.foreach { case (tag, _) =>
        val got = rows(SparkEntry.queries(name)(spark, s"$base/$tag"))
        assert(got == want, s"$name differs under $tag encoding")
      }
    }
  }
}
