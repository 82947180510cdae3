package graft.tmp

import org.apache.spark.sql.functions._
import graft.GraftSession

/** r15 optimization probe: where does regression_logit_multi's wall time
  * go? Times each structural piece of the IRLS loop separately.
  * Throwaway measurement tool (test scope, never shipped).
  */
object GlmProbeR15 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.builder("local[32]", 32,
      GraftSession.CpuDenseMaxPartitionBytes).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $label%-42s ${(System.nanoTime() - t0) / 1e9}%8.3f s"); r
    }
    val ev = GraftSession.table(spark, dir, "events")
    t("events count (warm cache)") { ev.count() }
    println(s"[probe] events rows = ${ev.count()}")

    val k = col("user_id")
    def dummy(cond: org.apache.spark.sql.Column) = when(cond, lit(1.0)).otherwise(lit(0.0))
    val xs = Seq(dummy(k % 2 === 1), dummy(k % 7 === 0), dummy(k % 3 === 1), dummy(k % 3 === 2))
    val y = when(col("value").isNotNull, when(col("value") > 50, 1.0).otherwise(0.0))
    val p = 5

    for (rep <- 1 to 2) {
      println(s"[probe] === rep $rep ===")
      val prepared = ev.select(
        col("event_type") +: lit(1.0).as("__x0") +:
          xs.zipWithIndex.map { case (c, i) => c.cast("double").as(s"__x${i + 1}") } :+
          y.cast("double").as("__y"): _*)
        .filter(((1 until p).map(i => s"__x$i IS NOT NULL") :+ "__y IS NOT NULL").mkString(" AND "))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      t("persist materialize (count)") { prepared.count() }

      // one IRLS moment pass: eta/mu/w/u + 20 qsum aggs, literal zero betas
      def qsum(term: String) =
        s"CAST(SUM(CAST(FLOOR(($term) * 1.0e12 + 0.5) AS DECIMAL(38,0))) AS DOUBLE) / 1.0e12"
      val eta = (0 until p).map(i => s"(__b_$i * __x$i)").reduce((a, b) => s"($a + $b)")
      def momentPass(src: org.apache.spark.sql.DataFrame) = {
        val withB = src
        val d1 = withB.withColumn("__eta", expr(eta))
          .withColumn("__mu", expr("FLOOR((1.0 / (1.0 + EXP(-(__eta)))) * 1.0e9 + 0.5) / 1.0e9"))
          .withColumn("__w", expr("(__mu * (1.0 - __mu))"))
          .withColumn("__u", expr("((__w * __eta) + (__y - __mu))"))
        val entries = for { i <- 0 until p; j <- i until p } yield (i, j)
        val aggs = expr("COUNT(*)").as("__n") +:
          (entries.map { case (i, j) => expr(qsum(s"((__x$i * __x$j) * __w)")).as(s"__a_${i}_$j") } ++
            (0 until p).map(i => expr(qsum(s"(__x$i * __u)")).as(s"__r_$i")))
        d1.groupBy(col("event_type")).agg(aggs.head, aggs.tail: _*).collect()
      }
      val zeros = (0 until p).foldLeft(prepared)((d, i) => d.withColumn(s"__b_$i", lit(0.0)))
      val m1 = t("moment pass 1 (literal zeros) + collect") { momentPass(zeros) }

      // beta rejoin variants
      import org.apache.spark.sql.Row
      import org.apache.spark.sql.types.{DoubleType, StructField, StructType}
      val groups = m1.map(_.getString(0))
      val betaSchema = StructType(StructField("event_type",
        org.apache.spark.sql.types.StringType, nullable = true) +:
        (0 until p).map(i => StructField(s"__b_$i", DoubleType, nullable = false)))
      val betaRows = groups.map(g => Row.fromSeq(g +: Seq.fill(p)(0.1)))
      def betaDf() = spark.createDataFrame(
        java.util.Arrays.asList(betaRows: _*), betaSchema)

      t("moment pass via broadcast-join betas") {
        momentPass(prepared.join(broadcast(betaDf()), Seq("event_type")))
      }
      t("moment pass via broadcast-join betas (2)") {
        momentPass(prepared.join(broadcast(betaDf()), Seq("event_type")))
      }
      // literal-map variant: element_at on a literal map<string,array<double>>
      val mapCol = map(groups.flatMap(g =>
        Seq(lit(g), array((0 until p).map(_ => lit(0.1)): _*))): _*)
      t("moment pass via literal-map betas") {
        val attached = prepared.withColumn("__bs", element_at(mapCol, col("event_type")))
        val withB = (0 until p).foldLeft(attached)((d, i) =>
          d.withColumn(s"__b_$i", element_at(col("__bs"), i + 1)))
          .filter(col("__bs").isNotNull)
        momentPass(withB.drop("__bs"))
      }
      t("moment pass via literal-map betas (2)") {
        val attached = prepared.withColumn("__bs", element_at(mapCol, col("event_type")))
        val withB = (0 until p).foldLeft(attached)((d, i) =>
          d.withColumn(s"__b_$i", element_at(col("__bs"), i + 1)))
          .filter(col("__bs").isNotNull)
        momentPass(withB.drop("__bs"))
      }
      // how much of the pass is the decimal qsums vs plain double sums?
      t("moment pass, plain double sums (no qsum)") {
        val d1 = zeros.withColumn("__eta", expr(eta))
          .withColumn("__mu", expr("FLOOR((1.0 / (1.0 + EXP(-(__eta)))) * 1.0e9 + 0.5) / 1.0e9"))
          .withColumn("__w", expr("(__mu * (1.0 - __mu))"))
          .withColumn("__u", expr("((__w * __eta) + (__y - __mu))"))
        val entries = for { i <- 0 until p; j <- i until p } yield (i, j)
        val aggs = expr("COUNT(*)").as("__n") +:
          (entries.map { case (i, j) => expr(s"SUM((__x$i * __x$j) * __w)").as(s"__a_${i}_$j") } ++
            (0 until p).map(i => expr(s"SUM(__x$i * __u)").as(s"__r_$i")))
        d1.groupBy(col("event_type")).agg(aggs.head, aggs.tail: _*).collect()
      }
      t("full logitByGroup (5 xs, 6 iters) + count") {
        graft.analysis.Glm.logitByGroup(ev, "event_type", xs, y,
          Seq("b0", "b1", "b2", "b3", "b4")).count()
      }
      println(s"[probe] prepared partitions = ${prepared.rdd.getNumPartitions}")

      // split-long qsum: q = floor(term*grid+0.5) (LONG), split into three
      // <=2^21 limbs summed as longs, reconstructed exactly in decimal per
      // group. Bit-identical to the decimal qsum for |q| <= ~9e15.
      def qsumSplit(term: String, alias: String): Seq[(String, String)] = {
        val q = s"FLOOR(($term) * 1.0e12 + 0.5)"
        Seq(
          (s"${alias}__lo", s"SUM(PMOD($q, 2097152))"),
          (s"${alias}__mid", s"SUM(PMOD(($q DIV 2097152), 2097152))"),
          (s"${alias}__hi", s"SUM(($q DIV 2097152) DIV 2097152)"))
      }
      def momentPassSplit(src: org.apache.spark.sql.DataFrame) = {
        val d1 = src.withColumn("__eta", expr(eta))
          .withColumn("__mu", expr("FLOOR((1.0 / (1.0 + EXP(-(__eta)))) * 1.0e9 + 0.5) / 1.0e9"))
          .withColumn("__w", expr("(__mu * (1.0 - __mu))"))
          .withColumn("__u", expr("((__w * __eta) + (__y - __mu))"))
        val entries = for { i <- 0 until p; j <- i until p } yield (i, j)
        val parts = entries.flatMap { case (i, j) =>
          qsumSplit(s"((__x$i * __x$j) * __w)", s"__a_${i}_$j") } ++
          (0 until p).flatMap(i => qsumSplit(s"(__x$i * __u)", s"__r_$i"))
        val aggs = expr("COUNT(*)").as("__n") +:
          parts.map { case (a, e) => expr(e).as(a) }
        val agg = d1.groupBy(col("event_type")).agg(aggs.head, aggs.tail: _*)
        // reconstruct: (hi*2^42 + mid*2^21 + lo) / 1e12, exact decimal
        val recon = (entries.map { case (i, j) => s"__a_${i}_$j" } ++
          (0 until p).map(i => s"__r_$i")).map { a =>
          expr(s"CAST(CAST(${a}__hi AS DECIMAL(38,0)) * 4398046511104 + " +
            s"CAST(${a}__mid AS DECIMAL(38,0)) * 2097152 + " +
            s"CAST(${a}__lo AS DECIMAL(38,0)) AS DOUBLE) / 1.0e12").as(a)
        }
        agg.select(col("event_type") +: col("__n") +: recon: _*).collect()
      }
      t("moment pass SPLIT-LONG (1 part)") { momentPassSplit(zeros) }
      t("moment pass SPLIT-LONG (1 part) (2)") { momentPassSplit(zeros) }

      val prepared32 = prepared.repartition(32)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      t("repartition(32) materialize") { prepared32.count() }
      val zeros32 = (0 until p).foldLeft(prepared32)((d, i) => d.withColumn(s"__b_$i", lit(0.0)))
      t("moment pass decimal (32 parts)") { momentPass(zeros32) }
      t("moment pass decimal (32 parts) (2)") { momentPass(zeros32) }
      t("moment pass SPLIT-LONG (32 parts)") { momentPassSplit(zeros32) }
      t("moment pass SPLIT-LONG (32 parts) (2)") { momentPassSplit(zeros32) }
      // equality check: decimal vs split-long on real betas
      val a1 = momentPass(zeros).sortBy(_.getString(0))
      val a2 = momentPassSplit(zeros).sortBy(_.getString(0))
      val eq = a1.zip(a2).forall { case (r1, r2) =>
        (0 until r1.length).forall(i => r1.get(i) == r2.get(i)) }
      println(s"[probe] split-long == decimal qsum: $eq")
      prepared32.unpersist(blocking = true)
      prepared.unpersist(blocking = true)
    }
    spark.stop()
  }
}
