package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.Scan
import org.apache.spark.sql.types.{DataTypes, StructType}

/** CALL-able index MAINTENANCE procedures — the guarded-mutation half of
  * the SQL surface ([[SqlOps]] is the read half). The r13 read/write split
  * is kept on purpose: mutations stay the SAME fenced Scala bodies, they
  * are merely REACHABLE from pure SQL now —
  *
  * {{{
  *   spark.sql.catalog.graft = graft.sources.GraftCatalog
  *   CALL graft.lsh_compact('/idx')   -- LshIndex.compactIngest, fenced
  *   CALL graft.ivf_compact('/idx')   -- Similarity.compactIvfIngest, fenced
  * }}}
  *
  * Spark's own DSv2 procedure protocol (`ProcedureCatalog` /
  * `BoundProcedure`, the CALL statement) is the vehicle — the body runs at
  * CALL EXECUTION, never at analysis, so EXPLAIN/DESCRIBE of a CALL cannot
  * mutate anything. Every refusal the Scala API raises (mutation fence
  * held, pending build, batch-id guard) surfaces through SQL with the
  * byte-identical message, because it IS the same code path.
  *
  * A previously-pure-SQL operator could probe and screen but never fold a
  * streaming-ingest side area; on a SQL-only deployment the side area
  * would grow unboundedly (every probe unions it) with no sanctioned way
  * to fold it — the operational gap this closes.
  */
object Procedures {

  /** name → (description, fenced body). Both bodies take the index root
    * path; both hold their family's mutation fence and pass the
    * pending-build choke point — exactly the Scala API.
    */
  private val all: Map[String, (String, (SparkSession, String) => Unit)] = Map(
    "lsh_compact" -> (("Fold a persisted MinHash-LSH index's pending " +
      "streaming-ingest batches into sigs/ (LshIndex.compactIngest — " +
      "fenced, marker-before-move, idempotent)",
      (s, p) => LshIndex.compactIngest(s, p))),
    "ivf_compact" -> (("Fold a persisted IVF index's pending " +
      "streaming-ingest batches into the cell table " +
      "(Similarity.compactIvfIngest — fenced, marker-before-move, " +
      "idempotent)",
      (s, p) => Similarity.compactIvfIngest(s, p))),
    "phash_compact" -> (("Fold a persisted perceptual-hash index's pending " +
      "streaming-ingest batches into sigs/ (PhashIndex.compactIngest — " +
      "fenced, marker-before-move, idempotent; the image family)",
      (s, p) => PhashIndex.compactIngest(s, p))))

  def names: Seq[String] = all.keys.toSeq.sorted

  def load(name: String): UnboundProcedure =
    all.get(name.toLowerCase) match {
      case Some((desc, body)) => new PathProcedure(name.toLowerCase, desc, body)
      case None => throw new IllegalArgumentException(
        s"graft catalog has no procedure '$name'; available: " +
          names.mkString(", "))
    }

  /** One string parameter (the index root), no result set: the procedure
    * is its side effect, and failure IS the loud refusal.
    */
  private final class PathProcedure(procName: String, desc: String,
      body: (SparkSession, String) => Unit)
      extends UnboundProcedure with BoundProcedure {
    override def name(): String = procName
    override def description(): String = desc
    override def bind(inputType: StructType): BoundProcedure = this
    override def parameters(): Array[ProcedureParameter] =
      Array(ProcedureParameter.in("path", DataTypes.StringType)
        .comment("index root directory").build())
    override def isDeterministic: Boolean = false
    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val path = input.getUTF8String(0)
      require(path != null, s"$procName: path must not be NULL")
      body(SparkSession.active, path.toString)
      java.util.Collections.emptyIterator[Scan]()
    }
  }
}
