package graft

import org.apache.spark.sql.functions._

import graft.functions.HeavyHittersAgg.heavyHitters

/** Pins the Misra-Gries heavy-hitters aggregate: exact-regime equality
  * with true counts, the n/(capacity+1) undercount bound in the
  * approximation regime, and lower-bound/coverage guarantees under
  * many-partition merges.
  */
class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  // skewed synthetic stream: value "v<i>" appears ~n/i times (zipf-ish),
  // spread over many partitions so partial buffers genuinely merge
  private def zipfDf(n: Int, parts: Int) = {
    val rows = (1 to n).map { i =>
      val v = "v" + java.lang.Long.numberOfTrailingZeros(java.lang.Long.highestOneBit(i))
      (i.toLong, v)
    }
    rows.toDF("id", "value").repartition(parts)
  }

  private def sketch(df: org.apache.spark.sql.DataFrame, cap: Int, k: Int): Seq[(String, Long)] =
    df.agg(heavyHitters(col("value"), cap, k).as("hh"))
      .select(explode(col("hh")).as("e"))
      .select(col("e.value"), col("e.cnt"))
      .as[(String, Long)].collect().toSeq

  private def trueCounts(df: org.apache.spark.sql.DataFrame): Map[String, Long] =
    df.groupBy("value").count().as[(String, Long)].collect().toMap

  test("exact regime: capacity >= distinct values reproduces true counts") {
    val df = zipfDf(4096, 16)
    val truth = trueCounts(df)
    val got = sketch(df, cap = 64, k = 13) // 13 distinct "v<log2>" values
    assert(got.toMap == truth, s"exact regime must equal groupBy counts")
    // deterministic order: (cnt desc, value asc)
    val expectOrder = truth.toSeq.sortBy { case (v, c) => (-c, v) }.take(13)
    assert(got == expectOrder)
  }

  test("approximation regime: lower bounds within n/(capacity+1), hot values present") {
    val n = 20000
    val df = zipfDf(n, 32)
    val truth = trueCounts(df)
    val cap = 4
    val got = sketch(df, cap, k = 4).toMap
    val bound = n.toLong / (cap + 1)
    got.foreach { case (v, est) =>
      val t = truth(v)
      assert(est <= t, s"$v: estimate $est must lower-bound true $t")
      assert(t - est <= bound, s"$v: undercount ${t - est} exceeds n/(cap+1)=$bound")
    }
    // coverage: every value hotter than the bound must be reported
    truth.filter(_._2 > bound).keys.foreach { v =>
      assert(got.contains(v), s"hot value $v (true ${truth(v)} > $bound) missing")
    }
  }

  test("sf10 replica regime: capacity-1024 saturation with tied counts is a tested bound") {
    // SF10_PARITY_R11 recorded topk_values_sketch diverging from the exact
    // oracle past saturation: the key-shifted replica TIES token counts, so
    // rank order reorders while every reported count stays a lower bound
    // within n/(capacity+1). This pins that regime at the QUERY's own
    // capacity (1024): vocabulary 3x capacity, counts tied in blocks (the
    // replica shape), asserting (a) lower-bound, (b) the undercount bound,
    // (c) coverage of every value hotter than the bound, (d) the
    // deterministic (cnt desc, value asc) output order under ties.
    val cap = 1024
    val distinct = 3 * cap
    // block-tied zipf-ish counts: value v_i has count 40 - (i mod 8)*2 (ties
    // in blocks of 384), plus 16 hot values at 4000 each
    val rows = (0 until distinct).flatMap { i =>
      val c = if (i < 16) 4000 else 40 - (i % 8) * 2
      Seq.fill(c)(f"v$i%04d")
    }
    val n = rows.length.toLong
    val df = rows.toDF("value").repartition(32)
    val truth = trueCounts(df)
    val got = sketch(df, cap, k = 64)
    val bound = n / (cap + 1)
    got.foreach { case (v, est) =>
      val t = truth(v)
      assert(est <= t, s"$v: estimate $est must lower-bound true $t")
      assert(t - est <= bound, s"$v: undercount ${t - est} exceeds n/(cap+1)=$bound")
    }
    val gotMap = got.toMap
    truth.filter(_._2 > bound).keys.foreach { v =>
      assert(gotMap.contains(v), s"hot value $v (true ${truth(v)} > $bound) missing")
    }
    // deterministic tie order: (estimated cnt desc, value asc)
    assert(got == got.sortBy { case (v, c) => (-c, v) },
      "output must be ordered (cnt desc, value asc) even under tied estimates")
  }

  test("grouped sketch matches per-group exact counts in the exact regime") {
    val df = (1 to 3000).map { i =>
      (s"g${i % 3}", s"tok${i % (7 + i % 3)}")
    }.toDF("g", "value").repartition(8)
    val got = df.groupBy(col("g"))
      .agg(heavyHitters(col("value"), 128, 3).as("hh"))
      .select(col("g"), posexplode(col("hh")).as(Seq("pos", "e")))
      .select(col("g"), col("pos"), col("e.value"), col("e.cnt"))
      .as[(String, Int, String, Long)].collect().toSeq.sorted
    val want = df.groupBy(col("g"), col("value")).count()
      .as[(String, String, Long)].collect().toSeq
      .groupBy(_._1).toSeq.flatMap { case (g, rows) =>
        rows.sortBy { case (_, v, c) => (-c, v) }.take(3).zipWithIndex
          .map { case ((_, v, c), i) => (g, i, v, c) }
      }.sorted
    assert(got == want)
  }
}
