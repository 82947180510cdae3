package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Reversible de-identification table: stable participant URN -> uuid
  * mapping, persisted so re-identification stays possible for authorized
  * flows.
  *
  * Reference semantics: the uuid_table every ingest sync passes raw URNs
  * through before writing to the engagement DB (reference:
  * sync_rapid_pro_to_engagement_db.py usage of uuid_table;
  * rapid_pro_to_engagement_db.py:117 normalises URNs first).
  *
  * Spark-first: the mapping is itself a DataFrame (distinct URNs with a
  * deterministic keyed hash), so building it is one distinct-shuffle,
  * re-keying datasets is a broadcast/shuffle join, and at 100 TB nothing is
  * ever collected to the driver.
  */
object UuidTable {

  /** Deterministic uuid-shaped token from a URN (keyed hash; the key keeps
    * the mapping non-invertible without the table).
    */
  private def uuidFor(urn: Column, hashKey: String): Column = {
    val h = sha2(concat(lit(hashKey), urn), 256)
    concat_ws("-",
      substring(h, 1, 8), substring(h, 9, 4), substring(h, 13, 4),
      substring(h, 17, 4), substring(h, 21, 12))
  }

  /** Build (or extend) the mapping for every distinct URN in `df`. */
  def build(df: DataFrame, urnCol: String, hashKey: String = "graft"): DataFrame =
    df.select(col(urnCol).as("urn")).distinct()
      .withColumn("participant_uuid", uuidFor(col("urn"), hashKey))

  /** Replace the URN column with the mapped uuid. URNs missing from the
    * table get a freshly computed uuid (same keyed hash) instead of being
    * silently dropped — new participants must never lose messages.
    */
  def pseudonymize(df: DataFrame, urnCol: String, table: DataFrame, hashKey: String = "graft"): DataFrame =
    df.join(table.withColumnRenamed("urn", urnCol), Seq(urnCol), "left")
      .withColumn("participant_uuid",
        coalesce(col("participant_uuid"), uuidFor(col(urnCol), hashKey)))
      .drop(urnCol)

  /** Re-attach URNs for an authorized re-identification flow; uuids absent
    * from the table keep a null urn rather than dropping the row.
    */
  def reidentify(df: DataFrame, table: DataFrame): DataFrame =
    df.join(table, Seq("participant_uuid"), "left")
}
