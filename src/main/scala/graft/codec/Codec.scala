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
final case class Upcaster(fromKind: String, toKind: String, lift: JsonNode => JsonNode)

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

  /** Column-level decode of a body for one kind: rows of that kind get a
    * parsed struct, everything else null. Composes with `filter(kind === …)`
    * so Catalyst prunes both rows and JSON fields.
    */
  def decoded(kindCol: Column, bodyCol: Column, kind: String): Column =
    schemaFor(resolveKind(kind)) match {
      case Some(s) => when(kindCol === kind, from_json(bodyCol, s))
      case None => lit(null)
    }
}

object Codec {
  private[codec] val mapper = new ObjectMapper()

  def obj(): ObjectNode = mapper.createObjectNode()
  def parse(s: String): JsonNode = mapper.readTree(if (s == null || s.isEmpty) "{}" else s)
  def write(n: JsonNode): String = mapper.writeValueAsString(n)
}
