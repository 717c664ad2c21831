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
  /** Name of the materialized top-level column for a declared discriminator
    * key — the Spark restatement of the reference's physical `disc_<key>`
    * columns (prefix constant store/store.go:15; ALTER TABLE + index,
    * store/postgresql/store.go:712-726).
    */
  def discColName(key: String): String = s"disc_$key"

  /** Extend an envelope schema with one nullable string column per declared
    * discriminator key. Written alongside the map on every write so scans
    * scoped to a declared key filter on a plain column parquet row-group
    * stats can skip on, instead of decoding the MAP for every row. Files
    * written before a key was declared simply lack the column and read as
    * null — filter sites keep the map predicate as the source of truth and
    * use the column only as a pushable pruning twin.
    */
  def withDiscColumns(base: StructType, keys: Seq[String]): StructType =
    StructType(base.fields ++ keys.map(k => StructField(discColName(k), StringType, nullable = true)))

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
