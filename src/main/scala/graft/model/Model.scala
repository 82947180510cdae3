package graft.model

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Typed data model mirroring the reference's engagement-db records
  * (engagement_database.data_models.Message: message_id, text, timestamp,
  * participant_uuid, direction, channel_operator, status, dataset, labels,
  * last_updated — reference: src/common/get_messages_in_datasets.py usage).
  *
  * `Dataset[Message]` gives compile-time field checks for the stateful/typed
  * paths (streaming sessions, custom folds); the DataFrame operators stay
  * schema-dynamic.
  */
case class Label(scheme_id: String, code_id: String, assigned_at: java.sql.Timestamp)

case class Message(
    message_id: Long,
    participant_uuid: String,
    timestamp: java.sql.Timestamp,
    dataset: String,
    text: String,
    value: Double)

object Model {

  /** Adapts the events test table into the typed Message model (event ≈
    * message snapshot: event_id ≈ message_id, user_id ≈ participant_uuid,
    * event_type ≈ dataset, props ≈ text).
    */
  def eventsAsMessages(spark: SparkSession, events: DataFrame): Dataset[Message] = {
    import spark.implicits._
    events.select(
      col("event_id").as("message_id"),
      col("user_id").cast("string").as("participant_uuid"),
      col("ts").as("timestamp"),
      col("event_type").as("dataset"),
      col("props").as("text"),
      col("value").as("value")).as[Message]
  }
}
