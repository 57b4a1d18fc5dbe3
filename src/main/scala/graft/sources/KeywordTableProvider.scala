package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{DataSourceRegister, EqualTo, Filter, In}
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** S1 as a first-class DataSource V2 connector (the "live system" form
  * named in SURVEY.md §2.1): `spark.read.format("graft-keyword")`.
  *
  * The reference crawls one search URL per keyword (test.py:129-144); the
  * connector models each keyword as a directory of JSON-lines snapshot
  * files under `base/<keyword>/` — the crawler's landing zone — and scans
  * them in parallel, one input partition per file, each row tagged with
  * its keyword.
  *
  * Scale behaviors a 1000-executor cluster needs are in the scan builder,
  * not bolted on:
  *   - keyword predicate pushdown (`keyword = 'x'` / `keyword IN (...)`)
  *     prunes whole directories at PLANNING time — unselected keywords
  *     contribute zero input partitions, the scan never opens them;
  *   - column pruning: the JSON parser extracts only the fields the query
  *     asks for (readSchema is the pruned schema).
  *
  * Options: `fields` (required) — comma-separated payload field names,
  * all read as strings; `path` — the base directory.
  */
class KeywordTableProvider extends TableProvider with DataSourceRegister {

  override def shortName(): String = "graft-keyword"

  private def fieldsOf(options: CaseInsensitiveStringMap): Seq[String] = {
    val f = options.get("fields")
    require(f != null && f.nonEmpty,
      "graft-keyword requires option 'fields': comma-separated payload field names")
    f.split(",").map(_.trim).filter(_.nonEmpty).toSeq
  }

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    StructType(StructField("keyword", StringType, nullable = false) +:
      fieldsOf(options).map(StructField(_, StringType, nullable = true)))

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table = {
    val options = new CaseInsensitiveStringMap(properties)
    val path = options.get("path")
    require(path != null && path.nonEmpty, "graft-keyword requires a load path")
    KeywordTable(path, schema)
  }
}

case class KeywordTable(base: String, tableSchema: StructType)
    extends Table with SupportsRead {
  override def name(): String = s"graft-keyword:$base"
  override def schema(): StructType = tableSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new KeywordScanBuilder(base, tableSchema)
}

/** Pushdown happens here: keyword equality/IN filters become a directory
  * allow-list (fully handled — no residual re-evaluation needed, so they
  * are accepted and reported as pushed); everything else is left to Spark.
  */
class KeywordScanBuilder(base: String, full: StructType)
    extends ScanBuilder with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns {

  private var required: StructType = full
  private var pushed: Array[Filter] = Array.empty
  private var keywordAllowList: Option[Set[String]] = None

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, rejected) = filters.partition {
      case EqualTo("keyword", _: String) => true
      case In("keyword", vs) => vs.forall(_.isInstanceOf[String])
      case _ => false
    }
    val allowed = accepted.flatMap {
      case EqualTo(_, v: String) => Seq(v)
      case In(_, vs) => vs.map(_.asInstanceOf[String]).toSeq
      case _ => Seq.empty
    }.toSet
    if (accepted.nonEmpty) {
      keywordAllowList = Some(keywordAllowList.fold(allowed)(_ intersect allowed))
    }
    pushed = accepted
    rejected
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit = {
    required = requiredSchema
  }

  override def build(): Scan = KeywordScan(base, required, keywordAllowList, pushed)
}

case class KeywordScan(base: String, readSchemaV: StructType,
                       keywords: Option[Set[String]], pushed: Array[Filter])
    extends Scan with Batch {
  override def readSchema(): StructType = readSchemaV
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-keyword base=$base keywords=${keywords.fold("*")(_.mkString(","))} " +
      s"PushedFilters: [${pushed.mkString(", ")}]"

  // planning-time pruning: unselected keyword directories contribute no
  // input partitions at all
  override def planInputPartitions(): Array[InputPartition] = {
    val baseDir = new java.io.File(base)
    val dirs = Option(baseDir.listFiles()).getOrElse(Array.empty)
      .filter(_.isDirectory)
      .filter(d => keywords.forall(_.contains(d.getName)))
      .sortBy(_.getName)
    dirs.flatMap { d =>
      Option(d.listFiles()).getOrElse(Array.empty)
        .filter(f => f.isFile && f.getName.endsWith(".json"))
        .sortBy(_.getName)
        .map(f => KeywordFilePartition(d.getName, f.getAbsolutePath): InputPartition)
    }
  }

  override def createReaderFactory(): PartitionReaderFactory =
    KeywordReaderFactory(readSchemaV)
}

case class KeywordFilePartition(keyword: String, file: String) extends InputPartition

case class KeywordReaderFactory(schema: StructType) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[KeywordFilePartition]
    new KeywordFileReader(p.keyword, p.file, schema)
  }
}

/** Streams one JSON-lines snapshot file; Jackson (already on Spark's
  * classpath) parses each line, and only the pruned schema's fields are
  * extracted.
  */
class KeywordFileReader(keyword: String, file: String, schema: StructType)
    extends PartitionReader[InternalRow] {

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
  private val source = scala.io.Source.fromFile(file, "UTF-8")
  private val lines = source.getLines().filter(_.trim.nonEmpty)
  private var current: InternalRow = _

  override def next(): Boolean = {
    if (!lines.hasNext) return false
    val node = mapper.readTree(lines.next())
    val values = schema.fields.map { f =>
      if (f.name == "keyword") UTF8String.fromString(keyword)
      else {
        val v = node.get(f.name)
        if (v == null || v.isNull) null else UTF8String.fromString(v.asText())
      }
    }
    current = new GenericInternalRow(values.asInstanceOf[Array[Any]])
    true
  }

  override def get(): InternalRow = current
  override def close(): Unit = source.close()
}
