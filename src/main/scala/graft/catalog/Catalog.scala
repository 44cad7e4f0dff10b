package graft.catalog

import graft.ast._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types._
import scala.collection.mutable

/** In-memory catalog: named schemas (with single inheritance via `extends`,
  * reference fsql/parser.scala:31-39), and named relations (batch tables or
  * streams). The reference's `SimpleCatalog` was a bare
  * `HashMap[String,String]` stub (fsql/Catalog.scala:9-17, comment "should
  * be logical plan"); ours holds real schemas and DataFrame factories.
  *
  * Relations are stored as thunks so a stream registration doesn't start a
  * source until first use, and a batch parquet table re-reads lazily.
  */
final class Catalog {

  private val schemas = mutable.Map.empty[String, StructType]
  private val relations = mutable.Map.empty[String, () => DataFrame]
  private val streamNames = mutable.Set.empty[String]
  // declared via CREATE STREAM, independent of whether the source is an
  // actually-streaming DataFrame (a file/derived-source stream executes as
  // batch); DROP TABLE/STREAM kind checks use this, not streaming-ness
  private val declaredStreams = mutable.Set.empty[String]

  // --- schemas -------------------------------------------------------------

  /** Register a schema; `parent` fields are prepended (single inheritance). */
  def createSchema(name: String, fields: Seq[FieldDef], parent: Option[String]): StructType = {
    val own = StructType(fields.map(toStructField))
    val merged = parent match {
      case Some(p) =>
        val ps = schema(p).getOrElse(
          throw new IllegalArgumentException(s"unknown parent schema: $p"))
        StructType(ps.fields ++ own.fields)
      case None => own
    }
    schemas(norm(name)) = merged
    merged
  }

  def schema(name: String): Option[StructType] = schemas.get(norm(name))

  def resolveSchema(ref: SchemaRef): StructType = ref match {
    case NamedSchema(n) =>
      schema(n).getOrElse(throw new IllegalArgumentException(s"unknown schema: $n"))
    case InlineSchema(fs) => StructType(fs.map(toStructField))
  }

  // --- relations -----------------------------------------------------------

  def registerTable(name: String, df: => DataFrame): Unit =
    relations(norm(name)) = () => df

  def registerStream(name: String, df: => DataFrame): Unit = {
    relations(norm(name)) = () => df
    streamNames += norm(name)
  }

  def relation(name: String): DataFrame =
    Catalog.normalizeNtz(relations.getOrElse(norm(name), throw new IllegalArgumentException(
      s"unknown table or stream: $name (known: ${relations.keys.toSeq.sorted.mkString(", ")})"))())

  def isStream(name: String): Boolean = streamNames(norm(name))

  def markDeclaredStream(name: String): Unit = declaredStreams += norm(name)
  def isDeclaredStream(name: String): Boolean =
    declaredStreams(norm(name)) || streamNames(norm(name))
  def hasRelation(name: String): Boolean = relations.contains(norm(name))
  def relationNames: Seq[String] = relations.keys.toSeq.sorted

  def hasSchema(name: String): Boolean = schemas.contains(norm(name))

  // --- model artifacts -------------------------------------------------------
  // Named pointers to trained model artifacts on storage (an IVF index
  // layout, a BPE merge-list file, …): (kind, path, content hash). The
  // hash is computed at registration so a later SHOW MODELS can audit
  // whether the artifact on disk still matches what was registered.

  final case class ModelEntry(kind: String, path: String, hash: String)
  private val models = mutable.Map.empty[String, ModelEntry]

  def registerModel(name: String, kind: String, path: String, hash: String): Unit =
    models(norm(name)) = ModelEntry(kind, path, hash)
  def model(name: String): Option[ModelEntry] = models.get(norm(name))
  def hasModel(name: String): Boolean = models.contains(norm(name))
  def dropModel(name: String): Unit = { models.remove(norm(name)); () }
  def modelNames: Seq[String] = models.keys.toSeq.sorted

  def dropRelation(name: String): Unit = {
    relations.remove(norm(name))
    streamNames.remove(norm(name))
    declaredStreams.remove(norm(name))
  }

  def dropSchema(name: String): Unit = schemas.remove(norm(name))

  // --- relation-valued table functions ------------------------------------
  // `FROM fn(rel [, lit…])` — the SQL surface for pipeline operators
  // (GraftSession pre-registers the M4 suite; users add their own via
  // GraftSession.registerTableFunction). Arguments resolve at translation
  // time to catalog relations (bare identifiers) or literals.
  private val tableFns =
    mutable.Map.empty[String, Seq[TfArg] => DataFrame]

  def registerTableFunction(name: String, fn: Seq[TfArg] => DataFrame): Unit =
    tableFns(norm(name)) = fn

  def tableFunction(name: String): Option[Seq[TfArg] => DataFrame] =
    tableFns.get(norm(name))

  def tableFunctionNames: Seq[String] = tableFns.keys.toSeq.sorted

  // --- operator-internal pinned caches -----------------------------------
  // Count/session window translations pin a shuffled RDD (persist
  // MEMORY_AND_DISK) so their multi-pass reads cannot drift (range-boundary
  // resampling on recompute). Those RDDs are registered here so a session
  // can release them deterministically instead of waiting for the
  // ContextCleaner's weak-ref GC (ADVICE r6: long-lived sessions accumulate
  // cached blocks until a driver GC happens to run).
  private val pinnedRdds = mutable.Buffer.empty[org.apache.spark.rdd.RDD[_]]

  def registerPinned(rdd: org.apache.spark.rdd.RDD[_]): Unit =
    pinnedRdds.synchronized { pinnedRdds += rdd }

  /** Unpersist every operator-pinned RDD registered so far; returns how
    * many were released.
    *
    * CALL ONLY BETWEEN STATEMENTS — i.e. after every DataFrame translated
    * since the last release has been fully consumed (written/collected)
    * or abandoned. Releasing while a translated-but-unconsumed unkeyed
    * count/session window is still alive is NOT merely nondeterministic:
    * the recompute re-runs the range partitioner, and if its sampled
    * boundaries differ from the ones the translation-time boundary-merge
    * (broadcast patch map) was computed from, the stamped session/window
    * bounds are SILENTLY WRONG — rows land in partitions the patch map
    * does not describe. Nothing enforces the protocol; the consumers in
    * this repo (Verify/Bench, gate code) release only after a full
    * materialization of the statement result. */
  def releasePinned(): Int = pinnedRdds.synchronized {
    val n = pinnedRdds.length
    pinnedRdds.foreach(_.unpersist(blocking = false))
    pinnedRdds.clear()
    n
  }

  private def norm(s: String) = s.toLowerCase(java.util.Locale.ROOT)

  // --- FSQL type names → Spark types (fsql/parser.scala:355 + the wider
  // JDBC universe of flinkdsl/jdbc.scala_:45-109) -------------------------

  def toStructField(f: FieldDef): StructField =
    StructField(f.name, toDataType(f.dataType), f.nullable)

  def toDataType(name: String): DataType = Catalog.toDataType(name)
}

object Catalog {

  /** `dt` with every TIMESTAMP_NTZ (recursively, through arrays/maps/
    * structs) replaced by TIMESTAMP. Identity when NTZ-free. */
  def ntzFree(dt: DataType): DataType = dt match {
    case TimestampNTZType      => TimestampType
    case ArrayType(et, n)      => ArrayType(ntzFree(et), n)
    case MapType(k, v, n)      => MapType(ntzFree(k), ntzFree(v), n)
    case StructType(fs)        =>
      StructType(fs.map(f => f.copy(dataType = ntzFree(f.dataType))))
    case other                 => other
  }

  /** Normalize TIMESTAMP_NTZ columns to TIMESTAMP at the catalog boundary.
    *
    * Spark 4 reads parquet timestamps written without UTC adjustment
    * (isAdjustedToUTC=false — e.g. pandas/pyarrow defaults) as
    * `TIMESTAMP_NTZ`, a type many time functions reject (`unix_micros`,
    * watermarks pre-3.4 semantics) and whose row values surface as
    * `java.time.LocalDateTime` instead of `java.sql.Timestamp`. Rather
    * than defending at every operator, the catalog presents ONE timestamp
    * type: naive timestamps are interpreted in the session time zone
    * (Spark's own NTZ→TZ cast convention; graft's driver entry points pin
    * `spark.sql.session.timeZone=UTC`, making the conversion value-exact —
    * the stored micros are unchanged). Operators that accept arbitrary
    * user DataFrames (bypassing the catalog) add their own casts. */
  def normalizeNtz(df: DataFrame): DataFrame = {
    val needs = df.schema.fields.filter(f => ntzFree(f.dataType) != f.dataType)
    if (needs.isEmpty) df
    else needs.foldLeft(df) { (acc, f) =>
      acc.withColumn(f.name,
        org.apache.spark.sql.functions.col(s"`${f.name}`").cast(ntzFree(f.dataType)))
    }
  }

  /** FSQL/DDL type names → Spark types — shared by field definitions and
    * the dialect's CAST(e AS type). */
  def toDataType(name: String): DataType = name.toLowerCase(java.util.Locale.ROOT) match {
    case "int" | "integer"            => IntegerType
    case "string" | "varchar" | "text" => StringType
    case "double"                     => DoubleType
    case "date"                       => DateType
    case "byte" | "tinyint"           => ByteType
    case "short" | "smallint"         => ShortType
    case "long" | "bigint"            => LongType
    case "float" | "real"             => FloatType
    case "character" | "char"         => StringType
    case "boolean" | "bool"           => BooleanType
    case "timestamp"                  => TimestampType
    case "time"                       => TimestampType
    case "decimal" | "numeric"        => DecimalType(38, 18)
    case "binary" | "blob"            => BinaryType
    case s if s.startsWith("array<") && s.endsWith(">") =>
      ArrayType(toDataType(s.stripPrefix("array<").stripSuffix(">")))
    case other =>
      throw new IllegalArgumentException(s"unknown data type: $other")
  }
}

/** A resolved table-function argument: a catalog relation (bare
  * identifier in the call) or a literal value. */
sealed trait TfArg
object TfArg {
  final case class Rel(name: String, df: DataFrame) extends TfArg
  final case class Lit(value: Any) extends TfArg
}
