package graft.core

import java.sql.Timestamp
import org.apache.spark.sql.types._

/** The engine's fixed event envelope. One row per event; the global log is a
  * Parquet table of these, bucketed by `pmod(aggregate_id_hash, B)` and sorted
  * by `id` (ULID) within files so min/max stats skip whole files on time-range
  * scans. Mirrors the reference envelope (eventstore.go:61-72) and PostgreSQL
  * DDL (store/postgresql/store.go:687-703); the dynamic `disc_*` columns
  * become a single `MAP<STRING,STRING>` that Catalyst prunes and pushes down.
  */
case class EventRow(
    id: String,                              // 26-char ULID; lexicographic == time order
    aggregate_id: String,
    aggregate_id_hash: Int,                  // fnv1a32(aggregate_id)
    aggregate_version: Int,                  // 1-based per stream
    aggregate_kind: String,
    kind: String,
    body: String,                            // JSON payload, schema-on-read by kind
    discriminator: Map[String, String],
    created_at: Timestamp,
    migration: Int,                          // 0 = active; >0 = invalidated by revision N
    migrated: Boolean
)

/** Snapshot of an aggregate's folded state at `aggregate_version`
  * (reference: eventstore.go:78-86, store/postgresql/store.go:737-747).
  */
case class SnapshotRow(
    id: String,
    aggregate_id: String,
    aggregate_version: Int,
    aggregate_kind: String,
    body: String,
    created_at: Timestamp,
    discriminator: Map[String, String]
)

object EventSchema {
  val events: StructType = StructType(Seq(
    StructField("id", StringType, nullable = false),
    StructField("aggregate_id", StringType, nullable = false),
    StructField("aggregate_id_hash", IntegerType, nullable = false),
    StructField("aggregate_version", IntegerType, nullable = false),
    StructField("aggregate_kind", StringType, nullable = false),
    StructField("kind", StringType, nullable = false),
    StructField("body", StringType, nullable = true),
    StructField("discriminator", MapType(StringType, StringType), nullable = true),
    StructField("created_at", TimestampType, nullable = false),
    StructField("migration", IntegerType, nullable = false),
    StructField("migrated", BooleanType, nullable = false)
  ))

  val snapshots: StructType = StructType(Seq(
    StructField("id", StringType, nullable = false),
    StructField("aggregate_id", StringType, nullable = false),
    StructField("aggregate_version", IntegerType, nullable = false),
    StructField("aggregate_kind", StringType, nullable = false),
    StructField("body", StringType, nullable = true),
    StructField("created_at", TimestampType, nullable = false),
    StructField("discriminator", MapType(StringType, StringType), nullable = true)
  ))
}
