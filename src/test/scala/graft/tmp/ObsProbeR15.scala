package graft.tmp

import org.apache.spark.sql.functions._
import org.apache.spark.sql.Observation
import org.apache.spark.sql.expressions.Window

object ObsProbeR15 {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.builder("local[4]", 4).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val df = (1 to 20).map(i => (i.toLong, s"k${i % 3}")).toDF("id", "k")

    // (a) observe -> filter -> collect
    val o1 = Observation("o1")
    val a = df.observe(o1, count(lit(1)).as("n")).filter(col("id") > 5)
    a.collect()
    println("a: " + o1.get)

    // (b) observe -> window -> filter -> collect
    val o2 = Observation("o2")
    val w = Window.partitionBy(col("k")).orderBy(col("id"))
    val b = df.withColumn("occ", count(lit(1)).over(w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .withColumn("rn", row_number().over(w))
      .observe(o2, count(lit(1)).as("n"), max(col("occ")).as("mx"))
      .filter(col("occ") <= 10)
    b.collect()
    println("b: " + o2.get)

    // (c) observe -> filter -> self-join(plain side) -> collect
    val o3 = Observation("o3")
    val c0 = df.withColumn("occ", count(lit(1)).over(w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .observe(o3, count(lit(1)).as("n"))
      .filter(col("occ") <= 10).drop("occ")
    val plain = df.withColumn("occ", count(lit(1)).over(Window.partitionBy(col("k"))))
      .filter(col("occ") <= 10).drop("occ")
    val j = c0.as("x").join(plain.as("y"), col("x.k") === col("y.k") && col("x.id") < col("y.id"))
    println("join rows: " + j.count())
    println("c: " + o3.get)

    // (d) shareLazily base -> explode -> window -> observe -> filter ->
    //     join(plain side) -> distinct -> collect  (the simhash shape)
    val o4 = Observation("o4")
    val base = org.apache.spark.sql.graft.Bridge.shareLazily(
      df.select(col("id"), col("k")))
    def banded = base.select(col("id"),
        explode(array(struct(lit(0).as("band"), col("k").as("bk")),
          struct(lit(1).as("band"), substring(col("k"), 1, 1).as("bk")))).as("bs"))
      .select(col("id"), col("bs.band").as("band"), col("bs.bk").as("bk"))
    val wb = Window.partitionBy(col("band"), col("bk")).orderBy(col("id"))
    val dObs = banded
      .withColumn("occ", count(lit(1)).over(wb.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .withColumn("rn", row_number().over(wb))
      .observe(o4, count(lit(1)).as("n"), max(col("occ")).as("mx"))
      .filter(col("occ") <= 100)
      .drop("occ", "rn")
    val dPlain = banded
      .withColumn("occ", count(lit(1)).over(Window.partitionBy(col("band"), col("bk"))))
      .filter(col("occ") <= 100).drop("occ")
    val dj = dObs.as("x").join(dPlain.as("y"),
        col("x.band") === col("y.band") && col("x.bk") === col("y.bk") && col("x.id") < col("y.id"))
      .select(col("x.id").as("a"), col("y.id").as("b")).distinct()
    println("d rows: " + dj.count())
    println("d: " + o4.get)
    org.apache.spark.sql.graft.Bridge.releaseShared()
    spark.stop()
  }
}
