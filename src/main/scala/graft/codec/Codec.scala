package graft.codec

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.ObjectNode
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Schema-on-read codec registry: event kind → payload schema + an upcaster
  * chain that lifts old payload shapes to the current one at decode time
  * (reference: encoding/jsoncodec/codec.go:26-80). Two forms are provided:
  *
  *  - a Column-level form (`decoded`, `upcastColumn`) that stays inside
  *    Catalyst — `from_json(body, schemaFor(kind))` plus per-kind column
  *    transforms, the 100 TB path;
  *  - a row-level JSON form (`upcastJson`) used by the point-read
  *    `EventStore.retrieve` fold and by migrations.
  */
final case class Upcaster(
    fromKind: String,
    toKind: String,
    lift: JsonNode => JsonNode,
    /** Optional Catalyst form of the same lift: transforms the PARSED struct
      * (fromKind's schema) into the toKind shape. When every link of a chain
      * provides one, decoding + upcasting runs entirely inside whole-stage
      * codegen — the 100 TB path; the JsonNode form remains the row-level
      * fallback for point reads and migrations.
      */
    columnLift: Option[Column => Column] = None)

class Codec extends Serializable {
  private var schemas = Map.empty[String, StructType]
  private var upcasters = Map.empty[String, Upcaster]

  def register(kind: String, schema: StructType): this.type = {
    schemas += kind -> schema; this
  }

  def registerUpcaster(u: Upcaster): this.type = {
    upcasters += u.fromKind -> u; this
  }

  def schemaFor(kind: String): Option[StructType] = schemas.get(kind)

  /** Terminal kind after following the upcaster chain. */
  def resolveKind(kind: String): String =
    upcasters.get(kind).map(u => resolveKind(u.toKind)).getOrElse(kind)

  /** Row-level decode: apply the upcaster chain to a payload, returning the
    * terminal (kind, body). Mirrors the reference's decode loop
    * (encoding/jsoncodec/codec.go:51-80).
    */
  def upcastJson(kind: String, body: String): (String, String) = {
    var k = kind
    var node = Codec.mapper.readTree(if (body == null || body.isEmpty) "{}" else body)
    while (upcasters.contains(k)) {
      val u = upcasters(k)
      node = u.lift(node)
      k = u.toKind
    }
    (k, Codec.mapper.writeValueAsString(node))
  }

  /** Column-level decode of a body for one kind: parse with the kind's OWN
    * schema, then apply the column-level upcaster chain so the result is in
    * the terminal kind's shape. Rows of other kinds get null; composes with
    * `filter(kind === …)` so Catalyst prunes both rows and JSON fields.
    * Falls back to the kind's own shape un-lifted if a chain link lacks a
    * `columnLift` (callers can still `upcastJson` row-level).
    */
  def decoded(kindCol: Column, bodyCol: Column, kind: String): Column = {
    val ownSchema = schemaFor(kind).orElse(schemaFor(resolveKind(kind)))
    ownSchema match {
      case Some(s) =>
        var c = from_json(bodyCol, s)
        var k = kind
        while (upcasters.contains(k) && upcasters(k).columnLift.isDefined) {
          val u = upcasters(k)
          c = u.columnLift.get(c)
          k = u.toKind
        }
        when(kindCol === kind, c)
      case None => lit(null)
    }
  }

  /** Decode a MIXED column of kinds into one terminal-shaped struct: each
    * kind in `kinds` is parsed with its own schema and lifted through its
    * chain; the first matching branch wins (schema-on-read dispatch).
    */
  def decodedAny(kindCol: Column, bodyCol: Column, kinds: Seq[String]): Column =
    kinds.map(k => (k, decoded(kindCol, bodyCol, k)))
      .foldRight(lit(null): Column) { case ((k, c), acc) =>
        when(kindCol === k, c).otherwise(acc)
      }
}

object Codec {
  private[codec] val mapper = new ObjectMapper()

  def obj(): ObjectNode = mapper.createObjectNode()
  def parse(s: String): JsonNode = mapper.readTree(if (s == null || s.isEmpty) "{}" else s)
  def write(n: JsonNode): String = mapper.writeValueAsString(n)
}
