package graft.sources

import java.util

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.sources.{DataSourceRegister, EqualTo, Filter, In}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 connector for the reference's per-group JSON embedding
  * store — one `{filename: [float, …]}` object per group file
  * (`/root/reference/src/extract_embedding.py:134-137`), surfaced as a
  * NATIVE Spark source: `spark.read.format("embjson").load(dir)` →
  * rows (group, image_key, embedding). This upgrades S4 from the
  * `ImageIngest.readJsonEmbeddings` helper (wholetext + from_json over a
  * MapType, which must materialize every file as ONE string row and parse
  * every float even for key-only queries) to a connector that
  *
  *  - plans ONE InputPartition per group file (parallelism = files, the
  *    natural grain of the layout);
  *  - prunes columns at the source (`SupportsPushDownRequiredColumns`):
  *    a key-only scan never parses a float — Jackson `skipChildren()`
  *    hops over the array tokens;
  *  - pushes `group = …` / `group IN (…)` down to FILE PRUNING
  *    (`SupportsPushDownFilters`): group IS the file stem, so the
  *    filtered files never open — the same partition-pruning contract as
  *    the parquet bucket scans, reported via `pushedFilters`;
  *  - streams each file through Jackson's incremental parser instead of
  *    holding the whole object in memory (the helper's wholetext row) —
  *    a multi-GB group file reads at constant memory;
  *  - resolves every filesystem call through the SESSION Hadoop
  *    configuration (`spark.hadoop.*` credentials/fs impls apply), on
  *    the driver for listing and serialized to executors for the reads
  *    — the same conf plumbing as the built-in file sources, so the
  *    connector genuinely works against any configured filesystem;
  *  - accepts multi-path loads (`.load(dir1, dir2)`): the file list is
  *    the path-sorted union, with duplicate directories rejected.
  *
  * Registered as `embjson` via DataSourceRegister (META-INF/services).
  * EmbJsonSourceSpec pins row parity with the helper, pruning, file
  * pruning, multi-path, and conf propagation; the `s_embjson_source`
  * gate replays the quantized content checksum from the parquet twin in
  * DuckDB.
  */
class EmbJsonDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "embjson"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    EmbJson.Schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new EmbJsonTable(EmbJson.resolvePaths(properties))
  override def supportsExternalMetadata(): Boolean = false
}

object EmbJson {
  val Schema: StructType = StructType(Seq(
    StructField("group", StringType, nullable = false),
    StructField("image_key", StringType, nullable = false),
    StructField("embedding", ArrayType(FloatType, containsNull = false),
      nullable = false)))

  /** `.load(dir)` arrives as `path`; `.load(d1, d2, …)` as `paths`, a
    * JSON-encoded string array (Spark's DataFrameReader convention).
    * Both are honored; neither present is a clear error, not a null NPE.
    */
  private[sources] def resolvePaths(
      properties: util.Map[String, String]): Seq[String] = {
    val single = Option(properties.get("path")).toSeq
    val multi = Option(properties.get("paths")).toSeq.flatMap { js =>
      val p = new com.fasterxml.jackson.core.JsonFactory()
        .createParser(js)
      import com.fasterxml.jackson.core.JsonToken
      require(p.nextToken() == JsonToken.START_ARRAY,
        s"embjson: malformed paths option: $js")
      val out = Seq.newBuilder[String]
      while (p.nextToken() != JsonToken.END_ARRAY) out += p.getText
      out.result()
    }
    val all = single ++ multi
    require(all.nonEmpty, "embjson requires a path: .load(dir) or .load(dirs*)")
    // Dedup on QUALIFIED URIs, not raw strings: `.load(dir, dir + "/")`
    // or a `file:`-qualified path beside its bare twin names the same
    // directory and would silently double every row — exactly what this
    // require exists to refuse. Qualification uses the session conf so
    // default-FS / working-dir resolution matches what listing will do.
    val conf = org.apache.spark.sql.SparkSession.active
      .sessionState.newHadoopConf()
    val qualified = all.map { dir =>
      val p = new Path(dir)
      p.getFileSystem(conf).makeQualified(p).toString
    }
    require(qualified.distinct.length == qualified.length,
      s"embjson: duplicate load paths would duplicate rows: $all " +
        s"(qualified: $qualified)")
    qualified
  }

  /** Deterministic listing: all *.json files under each dir, path-sorted
    * across the union. Filesystem resolved per path from the GIVEN conf
    * (the session's), never a bare `new Configuration()` — otherwise
    * `spark.hadoop.*` settings (credentials, fs impls) are silently
    * ignored.
    */
  def listFiles(dirs: Seq[String], conf: Configuration): Seq[(String, String)] =
    dirs.flatMap { dir =>
      val p = new Path(dir)
      val fs = p.getFileSystem(conf)
      if (!fs.exists(p)) Seq.empty
      else fs.listStatus(p).toSeq
        .filter(s => s.isFile && s.getPath.getName.endsWith(".json"))
        .map(s => (s.getPath.toString,
          s.getPath.getName.stripSuffix(".json")))
    }.sortBy(_._1)
}

/** Hadoop Configuration is not java-serializable; this is the standard
  * write/readFields envelope (the built-in sources' pattern) carrying
  * the session conf to executor-side readers.
  */
final class SerializableHadoopConf(@transient var value: Configuration)
    extends Serializable {
  private def writeObject(out: java.io.ObjectOutputStream): Unit = {
    out.defaultWriteObject()
    value.write(out)
  }
  private def readObject(in: java.io.ObjectInputStream): Unit = {
    in.defaultReadObject()
    value = new Configuration(false)
    value.readFields(in)
  }
}

final class EmbJsonTable(paths: Seq[String]) extends Table with SupportsRead {
  override def name(): String = s"embjson:${paths.mkString(",")}"
  override def schema(): StructType = EmbJson.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new EmbJsonScanBuilder(paths)
}

final class EmbJsonScanBuilder(paths: Seq[String]) extends ScanBuilder
    with SupportsPushDownRequiredColumns with SupportsPushDownFilters {
  private var required: StructType = EmbJson.Schema
  private var pushed: Array[Filter] = Array.empty
  private var groups: Option[Set[String]] = None

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  /** `group` equality/membership prunes FILES (group == file stem — the
    * mapping is exact, so the filter is fully consumed here and Spark
    * plans no residual). Everything else stays with Spark.
    */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (ours, rest) = filters.partition {
      case EqualTo("group", _: String) => true
      case In("group", vs) => vs.forall(_.isInstanceOf[String])
      case _ => false
    }
    pushed = ours
    val sets = ours.map {
      case EqualTo("group", v: String) => Set(v)
      case In("group", vs) => vs.map(_.asInstanceOf[String]).toSet
    }
    if (sets.nonEmpty) groups = Some(sets.reduce(_ intersect _))
    rest
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan = new EmbJsonScan(paths, required, groups)
}

final class EmbJsonScan(paths: Seq[String], required: StructType,
    groups: Option[Set[String]]) extends Scan with Batch {
  // the session conf, captured at PLAN time on the driver and shipped to
  // every reader — spark.hadoop.* settings reach both listing and reads
  private val conf = new SerializableHadoopConf(
    SparkSession.active.sessionState.newHadoopConf())
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String = {
    val g = groups.map(s => s.toSeq.sorted.mkString("groups=[", ",", "]"))
      .getOrElse("groups=*")
    s"embjson ${paths.mkString(",")} $g cols=[${required.fieldNames.mkString(",")}]"
  }
  override def planInputPartitions(): Array[InputPartition] =
    EmbJson.listFiles(paths, conf.value)
      .filter { case (_, g) => groups.forall(_.contains(g)) }
      .map { case (f, g) => EmbJsonInputPartition(f, g): InputPartition }
      .toArray
  override def createReaderFactory(): PartitionReaderFactory =
    new EmbJsonReaderFactory(required.fieldNames, conf)
}

final case class EmbJsonInputPartition(file: String, group: String)
  extends InputPartition

final class EmbJsonReaderFactory(cols: Array[String],
    conf: SerializableHadoopConf) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new EmbJsonReader(partition.asInstanceOf[EmbJsonInputPartition], cols,
      conf.value)
}

/** Streams one group file: `{ "key": [floats], … }`. Jackson's pull
  * parser yields one (key, array) entry at a time — constant memory in
  * the file size — and `skipChildren()` hops the float tokens entirely
  * when the projection dropped the embedding column.
  */
final class EmbJsonReader(p: EmbJsonInputPartition, cols: Array[String],
    conf: Configuration) extends PartitionReader[InternalRow] {
  import com.fasterxml.jackson.core.{JsonFactory, JsonParser, JsonToken}

  private val needEmbedding = cols.contains("embedding")
  private val fs = new Path(p.file).getFileSystem(conf)
  private val in = fs.open(new Path(p.file))
  private val parser: JsonParser =
    new JsonFactory().createParser(in: java.io.InputStream)
  require(parser.nextToken() == JsonToken.START_OBJECT,
    s"${p.file}: expected a single JSON object")

  private val groupUtf = UTF8String.fromString(p.group)
  private var curKey: UTF8String = _
  private var curVec: ArrayData = _

  override def next(): Boolean = {
    val t = parser.nextToken()
    if (t == JsonToken.END_OBJECT || t == null) return false
    require(t == JsonToken.FIELD_NAME, s"${p.file}: unexpected token $t")
    curKey = UTF8String.fromString(parser.currentName())
    require(parser.nextToken() == JsonToken.START_ARRAY,
      s"${p.file}: value of ${parser.currentName()} is not an array")
    if (needEmbedding) {
      val buf = new scala.collection.mutable.ArrayBuffer[Float](64)
      while (parser.nextToken() != JsonToken.END_ARRAY)
        buf += parser.getFloatValue
      curVec = ArrayData.toArrayData(buf.toArray)
    } else {
      parser.skipChildren()
      curVec = null
    }
    true
  }

  override def get(): InternalRow =
    InternalRow.fromSeq(cols.toSeq.map {
      case "group" => groupUtf
      case "image_key" => curKey
      case "embedding" => curVec
      case other => throw new IllegalArgumentException(s"unknown column $other")
    })

  override def close(): Unit = { parser.close(); in.close() }
}
