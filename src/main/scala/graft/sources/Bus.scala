package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}

/** Event-bus sink/source builders (S11/S12): shape the envelope into broker
  * frames and configure the streaming writer. The frame contract mirrors the
  * reference sinks —
  *  - Kafka (sink/kafka/kafka.go:156-181): key = aggregate_id so the BROKER's
  *    hash partitioner distributes; value = the JSON envelope.
  *  - NATS (sink/nats/sink.go:140-174): the producer computes the partition
  *    itself — `calc_partition(fnv1a32(aggregate_id), n)` — and addresses
  *    topic `name.p`; we emit the partition as an explicit column.
  * No broker (and no spark-sql-kafka connector jar) ships in this container,
  * so integration stops at the `DataStreamWriter`; the frame shaping (the
  * testable part) is pure columns and `kafkaWriter`/`kafkaSource` activate on
  * a deployment with the connector on the classpath.
  */
object Bus {

  /** Kafka-shaped frame: (key, value, topic). */
  def kafkaFrame(events: DataFrame, topic: String): DataFrame =
    events.select(
      col("aggregate_id").cast("string").as("key"),
      to_json(struct(
        col("id"), col("aggregate_id"), col("aggregate_version"),
        col("aggregate_kind"), col("kind"), col("body"),
        col("discriminator"), col("created_at"))).as("value"),
      lit(topic).as("topic"))

  /** NATS-shaped frame: explicit 1-based partition + `topic.partition`
    * subject (sink/nats/topic.go:9-19).
    */
  def natsFrame(events: DataFrame, topic: String, partitions: Int): DataFrame = {
    val part = graft.functions.calc_partition(col("aggregate_id_hash"), partitions)
    events.select(
      col("aggregate_id").cast("string").as("key"),
      to_json(struct(
        col("id"), col("aggregate_id"), col("aggregate_version"),
        col("aggregate_kind"), col("kind"), col("body"),
        col("discriminator"), col("created_at"))).as("value"),
      part.as("partition"),
      concat(lit(topic), lit("."), part).as("subject"))
  }

  /** Streaming Kafka writer for a framed stream. `pollInterval` reproduces
    * the reference's poller cadence (S13, sink/poller/poller.go:83 —
    * default 200 ms).
    */
  def kafkaWriter(framed: Dataset[Row], bootstrap: String, checkpoint: String,
      pollInterval: String = "200 milliseconds"): DataStreamWriter[Row] =
    framed.writeStream
      .format("kafka")
      .option("kafka.bootstrap.servers", bootstrap)
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.ProcessingTime(pollInterval))

  /** Kafka source for the live side of a projection (T3): start position by
    * timestamp reproduces the reference's `until − offset` overlap re-read
    * (projection/kafka/subscriber.go:251-276).
    */
  def kafkaSource(spark: org.apache.spark.sql.SparkSession, bootstrap: String,
      topic: String, startAtMs: Long): DataFrame =
    spark.readStream
      .format("kafka")
      .option("kafka.bootstrap.servers", bootstrap)
      .option("subscribe", topic)
      .option("startingOffsetsByTimestamp", s"""{"$topic": {"-1": $startAtMs}}""")
      .load()
}
