package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.Snapshots

/** Nested-API ingestion: the reference's form/social sources deliver one
  * nested submission per participant (answers array inside a response
  * object) which the sync flattens into one message row per answer.
  *
  * Reference semantics: google_form_to_engagement_db (one Message per
  * answer, reference: src/google_form_to_engagement_db/
  * google_form_to_engagement_db.py:1), telegram/facebook comment flattening.
  *
  * Spark-first: explicit schema + from_json (no inference scan), explode of
  * the answers array, origin-id derivation for ingest dedup. All
  * expression-level — the ingest is a single distributed map over raw
  * payloads.
  */
object JsonIngest {

  /** Schema of a form submission payload. */
  val submissionSchema: StructType = StructType(Seq(
    StructField("response_id", StringType),
    StructField("participant", StringType),
    StructField("submitted_at", TimestampType),
    StructField("answers", ArrayType(StructType(Seq(
      StructField("question_id", StringType),
      StructField("text", StringType)))))))

  /** Flatten raw JSON payload rows (column `payload`) into one message row
    * per answer, with a deterministic origin id for ingest dedup.
    */
  def flattenSubmissions(raw: DataFrame): DataFrame =
    raw
      .withColumn("sub", from_json(col("payload"), submissionSchema))
      .select(col("sub.response_id").as("response_id"),
        col("sub.participant").as("participant_urn"),
        col("sub.submitted_at").as("timestamp"),
        posexplode(col("sub.answers")).as(Seq("answer_idx", "answer")))
      .select(
        // plain concat so a null response_id yields a NULL origin id (never
        // colliding in ingest dedup) instead of collapsing to the bare index
        concat(col("response_id"), lit("/"), col("answer_idx").cast("string")).as("origin_id"),
        col("participant_urn"), col("timestamp"),
        col("answer.question_id").as("dataset"),
        col("answer.text").as("text"))

  /** Two-way merge sync: combine local and remote snapshots of the same
    * record space, keeping the newest version of each key (ties resolved by
    * preferring the remote side, like a sync that treats the remote store
    * as authoritative).
    * Reference: engagement-db <-> Coda bidirectional sync
    * (src/engagement_db_coda_sync/coda_to_engagement_db.py:1,
    * engagement_db_to_coda.py:1) — each side updates the other with
    * whichever message snapshot is newer.
    */
  def mergeSync(local: DataFrame, remote: DataFrame, key: String, versionCol: String): DataFrame = {
    val tagged = local.withColumn("__src", lit(0))
      .unionByName(remote.withColumn("__src", lit(1)))
    Snapshots.latest(tagged, Seq(col(key)), col(versionCol), col("__src"))
      .drop("__src")
  }
}
