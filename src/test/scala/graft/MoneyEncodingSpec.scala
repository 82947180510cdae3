package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ingest type-tolerance contract for the money columns.
  *
  * The testdata writer stores l_quantity/l_extendedprice/l_discount/l_tax
  * as DOUBLE today, but a 2-decimal money feed is just as legitimately
  * written as DECIMAL(12,2) (and a regeneration could flip it, as round 6
  * flipped the timestamp encoding). The engine's §3 discipline — cast to
  * DECIMAL before summing — must make the aggregate rows identical under
  * either physical encoding. Pinned on the headline pricing/revenue
  * queries plus the q19 disjunctive filter (quantity range predicates on
  * the re-encoded column).
  */
class MoneyEncodingSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"
  private val money = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
  private val probes = Seq("q1_pricing_summary", "q6_forecast_revenue", "q19_disjunctive_revenue")
  private val passthrough = Seq("orders", "customer", "supplier", "nation", "region", "part")

  private def rows(df: DataFrame): Seq[String] = {
    // normalize decimal-vs-double output types to a fixed rendering; the
    // VALUES must agree exactly for 2-decimal money under the decimal-sum
    // discipline
    val normalized = df.select(df.schema.fields.map { f =>
      f.dataType match {
        case _: org.apache.spark.sql.types.DecimalType | org.apache.spark.sql.types.DoubleType =>
          format_number(col(f.name).cast("decimal(38,6)"), 6).as(f.name)
        case _ => col(f.name)
      }
    }.toIndexedSeq: _*)
    normalized.collect().map(_.toString).sorted.toSeq
  }

  test("pricing aggregates are invariant to the money-column parquet encoding") {
    val base = java.nio.file.Files.createTempDirectory("graft-money-variants").toString
    val variants: Seq[(String, DataFrame => DataFrame)] = Seq(
      "double"  -> identity,
      "decimal" -> (df => money.foldLeft(df)((d, c) =>
        d.withColumn(c, col(c).cast("decimal(12,2)")))))
    variants.foreach { case (tag, enc) =>
      val dir = s"$base/$tag"
      enc(GraftSession.table(spark, sfDir, "lineitem"))
        .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
      passthrough.foreach(t => GraftSession.table(spark, sfDir, t)
        .write.mode("overwrite").parquet(s"$dir/$t.parquet"))
    }
    probes.foreach { name =>
      val want = rows(SparkEntry.queries(name)(spark, s"$base/double"))
      assert(want.nonEmpty, s"$name returned no rows — probe is vacuous")
      val got = rows(SparkEntry.queries(name)(spark, s"$base/decimal"))
      assert(got == want, s"$name differs between double and decimal money encodings")
    }
  }
}
