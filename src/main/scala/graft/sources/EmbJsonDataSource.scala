package graft.sources

import java.util

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
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
  *    a multi-GB group file reads at constant memory.
  *
  * Registered as `embjson` via DataSourceRegister (META-INF/services).
  * EmbJsonSourceSpec pins row parity with the helper, pruning, and file
  * pruning; the `s_embjson_source` gate replays the quantized content
  * checksum from the parquet twin in DuckDB.
  */
class EmbJsonDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "embjson"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    EmbJson.Schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new EmbJsonTable(properties.get("path"))
  override def supportsExternalMetadata(): Boolean = false
}

object EmbJson {
  val Schema: StructType = StructType(Seq(
    StructField("group", StringType, nullable = false),
    StructField("image_key", StringType, nullable = false),
    StructField("embedding", ArrayType(FloatType, containsNull = false),
      nullable = false)))

  /** Deterministic listing: all *.json files under `dir`, path-sorted.
    * Hadoop FS so the connector works against any configured filesystem,
    * not only local.
    */
  def listFiles(dir: String): Seq[(String, String)] = {
    val p = new Path(dir)
    val fs = p.getFileSystem(new Configuration())
    if (!fs.exists(p)) return Seq.empty
    fs.listStatus(p).toSeq
      .filter(s => s.isFile && s.getPath.getName.endsWith(".json"))
      .map(s => (s.getPath.toString,
        s.getPath.getName.stripSuffix(".json")))
      .sortBy(_._1)
  }
}

final class EmbJsonTable(path: String) extends Table with SupportsRead {
  require(path != null, "embjson requires a path: .load(dir)")
  override def name(): String = s"embjson:$path"
  override def schema(): StructType = EmbJson.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new EmbJsonScanBuilder(path)
}

final class EmbJsonScanBuilder(path: String) extends ScanBuilder
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

  override def build(): Scan = new EmbJsonScan(path, required, groups)
}

final class EmbJsonScan(path: String, required: StructType,
    groups: Option[Set[String]]) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String = {
    val g = groups.map(s => s.toSeq.sorted.mkString("groups=[", ",", "]"))
      .getOrElse("groups=*")
    s"embjson $path $g cols=[${required.fieldNames.mkString(",")}]"
  }
  override def planInputPartitions(): Array[InputPartition] =
    EmbJson.listFiles(path)
      .filter { case (_, g) => groups.forall(_.contains(g)) }
      .map { case (f, g) => EmbJsonInputPartition(f, g): InputPartition }
      .toArray
  override def createReaderFactory(): PartitionReaderFactory =
    new EmbJsonReaderFactory(required.fieldNames)
}

final case class EmbJsonInputPartition(file: String, group: String)
  extends InputPartition

final class EmbJsonReaderFactory(cols: Array[String])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new EmbJsonReader(partition.asInstanceOf[EmbJsonInputPartition], cols)
}

/** Streams one group file: `{ "key": [floats], … }`. Jackson's pull
  * parser yields one (key, array) entry at a time — constant memory in
  * the file size — and `skipChildren()` hops the float tokens entirely
  * when the projection dropped the embedding column.
  */
final class EmbJsonReader(p: EmbJsonInputPartition, cols: Array[String])
    extends PartitionReader[InternalRow] {
  import com.fasterxml.jackson.core.{JsonFactory, JsonParser, JsonToken}

  private val needEmbedding = cols.contains("embedding")
  private val fs = new Path(p.file).getFileSystem(new Configuration())
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
