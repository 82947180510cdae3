package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted join for skewed keys.
  *
  * When one join key carries a disproportionate share of rows (the
  * "hot participant"), a plain shuffle join puts the whole key on one task.
  * Salting splits the hot key across `saltBuckets` tasks: the fact side gets
  * a pseudo-random salt per row, the (smaller) build side is replicated once
  * per bucket. Join results are identical to the unsalted join; only the
  * partitioning changes. AQE's skew-join handles sort-merge cases
  * automatically — this helper covers aggregations/joins AQE can't split.
  */
object SkewJoin {

  /** Inner join facts⋈dim on `key`, spreading each fact key over
    * `saltBuckets` partitions. The salt is derived from xxhash64 of a
    * distributing column — deterministic per row, uniform across buckets.
    */
  def saltedJoin(facts: DataFrame, dim: DataFrame, key: String,
                 distributeBy: Column, saltBuckets: Int): DataFrame = {
    graft.util.TempCols.assertFree(facts, "__salt")
    graft.util.TempCols.assertFree(dim, "__salt", "__salt_i")
    val salted = facts.withColumn("__salt", pmod(xxhash64(distributeBy), lit(saltBuckets)))
    val replicated = dim
      .withColumn("__salt_i", explode(sequence(lit(0), lit(saltBuckets - 1))))
      .withColumn("__salt", col("__salt_i").cast("long")).drop("__salt_i")
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  /** Two-phase skew-safe distinct count per key-set: partial distinct on
    * (salt, keys) then merge — bounds any single task's state even when one
    * group dominates.
    */
  def skewSafeDistinctCount(df: DataFrame, groupCols: Seq[Column], distinctCol: Column,
                            saltBuckets: Int): DataFrame = {
    graft.util.TempCols.assertFree(df, "__salt", "__partial")
    val pre = df
      .withColumn("__salt", pmod(xxhash64(distinctCol), lit(saltBuckets)))
      .groupBy(groupCols :+ col("__salt"): _*)
      .agg(countDistinct(distinctCol).as("__partial"))
    pre.groupBy(groupCols: _*).agg(sum(col("__partial")).as("n_distinct"))
  }
}
