package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.expressions.aggregate.{Aggregation, CountStar}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.sources.{DataSourceRegister, EqualTo, Filter, In, IsNotNull}
import org.apache.spark.sql.types._
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
  * Options: `fields` (required) — comma-separated payload fields, each
  * `name` (string) or `name:type` (string|long|int|double|boolean);
  * `path` — the base directory. The same option types the write path
  * (schema must match for AppendData resolution).
  */
class KeywordTableProvider extends TableProvider with DataSourceRegister {

  override def shortName(): String = "graft-keyword"

  private def fieldsOf(options: CaseInsensitiveStringMap): Seq[StructField] = {
    val f = options.get("fields")
    require(f != null && f.nonEmpty,
      "graft-keyword requires option 'fields': comma-separated payload fields (name or name:type)")
    f.split(",").map(_.trim).filter(_.nonEmpty).toSeq.map { spec =>
      spec.split(":") match {
        case Array(n) => StructField(n.trim, StringType, nullable = true)
        case Array(n, t) =>
          val dt = t.trim.toLowerCase match {
            case "string" => StringType
            case "long" | "bigint" => LongType
            case "int" | "integer" => IntegerType
            case "double" => DoubleType
            case "boolean" => BooleanType
            case other => throw new IllegalArgumentException(
              s"graft-keyword: unsupported field type '$other' in '$spec'")
          }
          StructField(n.trim, dt, nullable = true)
        case _ => throw new IllegalArgumentException(
          s"graft-keyword: bad field spec '$spec'")
      }
    }
  }

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    StructType(StructField("keyword", StringType, nullable = true) +:
      fieldsOf(options))

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table = {
    val options = new CaseInsensitiveStringMap(properties)
    val path = options.get("path")
    require(path != null && path.nonEmpty, "graft-keyword requires a load path")
    KeywordTable(path, schema)
  }
}

case class KeywordTable(base: String, tableSchema: StructType)
    extends Table with SupportsRead with SupportsWrite {
  override def name(): String = s"graft-keyword:$base"
  override def schema(): StructType = tableSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.MICRO_BATCH_READ, TableCapability.STREAMING_WRITE)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new KeywordScanBuilder(base, tableSchema,
      "keyword".equalsIgnoreCase(options.get("partitioning")),
      Option(options.get("maxFilesPerTrigger")).map { v =>
        val n = try v.toInt catch {
          case _: NumberFormatException => throw new IllegalArgumentException(
            s"maxFilesPerTrigger must be a positive integer, got '$v'")
        }
        // 0 would make every advance() a no-op: the stream stalls forever
        // with no error (AvailableNow terminates having ingested nothing)
        if (n <= 0) throw new IllegalArgumentException(
          s"maxFilesPerTrigger must be positive, got $n")
        n
      })
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new KeywordWriteBuilder(base, info.schema())
}

/** Pushdown happens here: keyword equality/IN filters become a directory
  * allow-list (fully handled — no residual re-evaluation needed, so they
  * are accepted and reported as pushed); everything else is left to Spark.
  */
class KeywordScanBuilder(base: String, full: StructType,
                         keywordGrouped: Boolean = false,
                         maxFilesPerTrigger: Option[Int] = None)
    extends ScanBuilder with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns
    with SupportsPushDownAggregates
    with SupportsPushDownLimit
    with SupportsPushDownTopN {

  private var required: StructType = full
  private var pushed: Array[Filter] = Array.empty
  private var keywordAllowList: Option[Set[String]] = None
  // Some(byKeyword) once a COUNT(*) [GROUP BY keyword] is accepted
  private var countPushed: Option[(Boolean, Int)] = None
  private var pushedLimit: Option[Int] = None
  private var topNPushed = false

  /** LIMIT pushdown (partial): each file reader stops after `limit`
    * rows instead of draining its snapshot — Spark re-applies the
    * global limit on top (isPartiallyPushed stays true). For LIMIT k
    * over a crawler landing zone this reads k lines per file instead
    * of every byte of every snapshot.
    */
  override def pushLimit(limit: Int): Boolean = {
    pushedLimit = Some(limit)
    true
  }

  /** ORDER BY keyword LIMIT k pushdown (partial): every input
    * partition is one snapshot file of ONE keyword directory, so all
    * its rows tie on the sort key — ANY k rows of the file are a
    * valid per-partition top-k by keyword (either direction; keyword
    * is never null, so null ordering is moot). Readers therefore
    * stop after k lines exactly like plain LIMIT pushdown, and
    * Spark's TakeOrderedAndProject merges the per-partition survivors
    * (isPartiallyPushed = true). Sorts on any payload field are
    * declined — rows within a snapshot are not ordered by payload.
    */
  override def pushTopN(orders: Array[
      org.apache.spark.sql.connector.expressions.SortOrder],
      limit: Int): Boolean = {
    val keywordOnly = orders.nonEmpty && orders.forall(_.expression() match {
      case n: org.apache.spark.sql.connector.expressions.NamedReference =>
        n.fieldNames.sameElements(Array("keyword"))
      case _ => false
    })
    if (keywordOnly) {
      pushedLimit = Some(limit)
      topNPushed = true
    }
    keywordOnly
  }
  override def isPartiallyPushed: Boolean = true

  /** COUNT(*) pushdown, optionally grouped by keyword: a count never
    * needs the JSON payload, so the reader emits one pre-counted row
    * per file (line count) instead of parsing every record — at
    * crawler scale the difference between "stat the landing zone" and
    * "deserialize 100 TB to count it". PARTIAL pushdown
    * (supportCompletePushDown = false): Spark still runs the final
    * aggregation, summing the per-file counts, which also keeps
    * multiple files per keyword correct.
    */
  override def supportCompletePushDown(agg: Aggregation): Boolean = false
  override def pushAggregation(agg: Aggregation): Boolean = {
    val byKeyword = agg.groupByExpressions.toSeq match {
      case Seq() => Some(false)
      case Seq(n: org.apache.spark.sql.connector.expressions.NamedReference)
          if n.fieldNames.sameElements(Array("keyword")) => Some(true)
      case _ => None
    }
    val countsOnly = agg.aggregateExpressions.nonEmpty &&
      agg.aggregateExpressions.forall(_.isInstanceOf[CountStar])
    (byKeyword, countsOnly) match {
      case (Some(g), true) =>
        countPushed = Some((g, agg.aggregateExpressions.length)); true
      case _ => false
    }
  }

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, rejected) = filters.partition {
      case EqualTo("keyword", _: String) => true
      case In("keyword", vs) => vs.forall(_.isInstanceOf[String])
      // trivially true: the reader tags every row with its directory name
      case IsNotNull("keyword") => true
      case _ => false
    }
    // only VALUE-bearing filters narrow the allow-list: gating on
    // accepted.nonEmpty would let a lone IsNotNull set it to the empty
    // set and prune every directory (zero rows from a correct query)
    val valueFilters = accepted.filterNot(_.isInstanceOf[IsNotNull])
    val allowed = valueFilters.flatMap {
      case EqualTo(_, v: String) => Seq(v)
      case In(_, vs) => vs.map(_.asInstanceOf[String]).toSeq
      case _ => Seq.empty
    }.toSet
    if (valueFilters.nonEmpty) {
      keywordAllowList = Some(keywordAllowList.fold(allowed)(_ intersect allowed))
    }
    pushed = accepted
    rejected
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit = {
    required = requiredSchema
  }

  override def build(): Scan = countPushed match {
    case Some((byKeyword, nCounts)) =>
      KeywordCountScan(base, byKeyword, nCounts, keywordAllowList, pushed,
        keywordGrouped && byKeyword)
    case None =>
      KeywordScan(base, required, keywordAllowList, pushed, keywordGrouped,
        pushedLimit, topNPushed, maxFilesPerTrigger)
  }
}

/** Scan produced when COUNT(*) was pushed down: one output row per
  * snapshot file carrying its line count (and keyword when grouped) —
  * no JSON parsing at all. Spark's final aggregate sums the partials —
  * the Exchange it inserts moves one tiny (keyword, count) row per
  * FILE, negligible at any scale. (The scan still reports the opt-in
  * keyword grouping, but Spark 4.1's pushed-aggregate rewrite aliases
  * the group column (`keyword AS group_col_0`), so the reported
  * partitioning cannot currently satisfy the final agg's distribution
  * — shuffle elision applies to row-level scans, count pushdown wins
  * by not parsing.)
  */
case class KeywordCountScan(base: String, byKeyword: Boolean, nCounts: Int,
                            keywords: Option[Set[String]], pushed: Array[Filter],
                            keywordGrouped: Boolean = false)
    extends Scan with Batch
    with org.apache.spark.sql.connector.read.SupportsReportPartitioning {

  override def outputPartitioning():
      org.apache.spark.sql.connector.read.partitioning.Partitioning =
    if (keywordGrouped) {
      val nKeys = planInputPartitions()
        .map(_.asInstanceOf[KeywordFilePartition].keyword).distinct.length
      new org.apache.spark.sql.connector.read.partitioning.KeyGroupedPartitioning(
        Array(org.apache.spark.sql.connector.expressions.Expressions.identity("keyword")),
        nKeys)
    } else
      new org.apache.spark.sql.connector.read.partitioning.UnknownPartitioning(0)
  override def readSchema(): StructType = StructType(
    (if (byKeyword) Seq(StructField("keyword", StringType, nullable = true))
     else Seq.empty) ++
      (0 until nCounts).map(i => StructField(s"count$i", LongType, nullable = false)))
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-keyword base=$base PushedAggregation: [COUNT(*)]" +
      (if (byKeyword) " PushedGroupBy: [keyword]" else "")

  override def planInputPartitions(): Array[InputPartition] =
    KeywordScanUtil.listPartitions(base, keywords, None)

  override def createReaderFactory(): PartitionReaderFactory =
    KeywordCountReaderFactory(byKeyword, nCounts)
}

case class KeywordCountReaderFactory(byKeyword: Boolean, nCounts: Int)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[KeywordFilePartition]
    new PartitionReader[InternalRow] {
      private var done = false
      override def next(): Boolean = !done && { done = true; true }
      override def get(): InternalRow = {
        val src = scala.io.Source.fromFile(p.file, "UTF-8")
        val n = try src.getLines().count(_.trim.nonEmpty) finally src.close()
        val counts = Seq.fill(nCounts)(java.lang.Long.valueOf(n.toLong))
        val values: Seq[Any] =
          if (byKeyword) UTF8String.fromString(p.keyword) +: counts else counts
        new GenericInternalRow(values.toArray)
      }
      override def close(): Unit = ()
    }
  }
}

case class KeywordScan(base: String, readSchemaV: StructType,
                       keywords: Option[Set[String]], pushed: Array[Filter],
                       keywordGrouped: Boolean = false,
                       limit: Option[Int] = None,
                       topN: Boolean = false,
                       maxFilesPerTrigger: Option[Int] = None)
    extends Scan with Batch
    with org.apache.spark.sql.connector.read.SupportsRuntimeFiltering
    with org.apache.spark.sql.connector.read.SupportsReportPartitioning
    with org.apache.spark.sql.connector.read.SupportsReportStatistics {
  override def readSchema(): StructType = readSchemaV
  override def toBatch: Batch = this
  override def toMicroBatchStream(checkpointLocation: String):
      org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    new KeywordMicroBatchStream(base, readSchemaV, maxFilesPerTrigger)
  override def description(): String =
    s"graft-keyword base=$base keywords=${keywords.fold("*")(_.mkString(","))} " +
      s"PushedFilters: [${pushed.mkString(", ")}]" +
      limit.fold("")(l =>
        if (topN) s" PushedTopN: keyword, $l" else s" PushedLimit: $l")

  /** Size statistics from the pruned file listing (file bytes are an
    * upper bound on deserialized size here — JSON keys repeat per
    * line). This is what lets Catalyst/AQE and size-gated broadcast
    * helpers treat connector tables like parquet ones: a small keyword
    * slice reports small and becomes the build side instead of
    * defaulting to "unknown = infinite".
    */
  override def estimateStatistics():
      org.apache.spark.sql.connector.read.Statistics =
    new org.apache.spark.sql.connector.read.Statistics {
      private val bytes = planInputPartitions().map(p =>
        new java.io.File(p.asInstanceOf[KeywordFilePartition].file).length).sum
      override def sizeInBytes(): java.util.OptionalLong =
        java.util.OptionalLong.of(bytes)
      override def numRows(): java.util.OptionalLong =
        java.util.OptionalLong.empty()
    }

  // runtime filtering (the DSv2 form of dynamic partition pruning): when
  // the keyword column joins a selective dim, Spark hands the dim's
  // actual keys here AT RUNTIME and input partitions are re-planned —
  // whole directories drop out based on data only known mid-query
  @volatile private var runtimeAllow: Option[Set[String]] = None
  /** Observable for tests/diagnostics: the runtime-narrowed keyword set. */
  def runtimeKeywords: Option[Set[String]] = runtimeAllow
  override def filterAttributes():
      Array[org.apache.spark.sql.connector.expressions.NamedReference] =
    Array(org.apache.spark.sql.connector.expressions.Expressions.column("keyword"))
  override def filter(filters: Array[Filter]): Unit = {
    val allowed = filters.flatMap {
      case EqualTo("keyword", v: String) => Seq(v)
      case In("keyword", vs) if vs.forall(_.isInstanceOf[String]) =>
        vs.map(_.asInstanceOf[String]).toSeq
      case _ => Seq.empty
    }.toSet
    if (allowed.nonEmpty) {
      runtimeAllow = Some(runtimeAllow.fold(allowed)(_ intersect allowed))
    }
  }

  // planning-time pruning: unselected keyword directories contribute no
  // input partitions at all
  override def planInputPartitions(): Array[InputPartition] =
    KeywordScanUtil.listPartitions(base, keywords, runtimeAllow)

  // storage-partitioned execution, OPT-IN via .option("partitioning",
  // "keyword"): the layout IS partitioned by keyword (one directory per
  // keyword), so the scan can report KeyGroupedPartitioning and Spark
  // groups the per-file input partitions by partitionKey() — a
  // per-keyword aggregation (or keyword-keyed join against another
  // keyword-partitioned table) then runs WITHOUT an Exchange. The
  // tradeoff is real and why it's opt-in: grouping collapses
  // per-file scan parallelism to one task per keyword, which is wrong
  // for scan-heavy queries over few hot keywords but removes the full
  // shuffle from every per-keyword rollup. Same contract as declaring
  // a bucketed table layout.
  override def outputPartitioning():
      org.apache.spark.sql.connector.read.partitioning.Partitioning =
    if (keywordGrouped) {
      val nKeys = planInputPartitions()
        .map(_.asInstanceOf[KeywordFilePartition].keyword).distinct.length
      new org.apache.spark.sql.connector.read.partitioning.KeyGroupedPartitioning(
        Array(org.apache.spark.sql.connector.expressions.Expressions.identity("keyword")),
        nKeys)
    } else
      new org.apache.spark.sql.connector.read.partitioning.UnknownPartitioning(0)

  override def createReaderFactory(): PartitionReaderFactory =
    KeywordReaderFactory(readSchemaV, limit)
}

case class KeywordFilePartition(keyword: String, file: String) extends InputPartition
    with org.apache.spark.sql.connector.read.HasPartitionKey {
  override def partitionKey(): InternalRow =
    new GenericInternalRow(Array[Any](UTF8String.fromString(keyword)))
}

/** Directory-layout listing shared by the row scan and the pushed-count
  * scan: one partition per committed snapshot file, pruned to the
  * planning-time and (for the row scan) runtime keyword allow-lists.
  */
object KeywordScanUtil {
  /** Keyword -> directory name: percent-encoded to pure ASCII. The JVM
    * maps `File` names through the platform locale (`sun.jnu.encoding`);
    * under a POSIX/C locale a non-ASCII keyword (the reference's
    * 區塊鏈工程師) would be mangled to '?' bytes on disk and never match
    * its filter again.
    *
    * Deliberately NOT URLEncoder/URLDecoder: their '+' = space rule
    * would misread a legacy zone directory literally named "C++" as
    * "C  ", and a stray '%' (e.g. a hand-made "50%off" dir) would make
    * decode THROW and abort every scan of the zone. This codec escapes
    * space as %20, keeps [A-Za-z0-9._-] verbatim (existing ASCII zones
    * keep their exact layout), and decodes defensively: a '%' not
    * followed by two hex digits is a literal '%', so legacy RAW
    * (unencoded) directories read back as themselves — UNLESS the raw
    * name itself contains a valid %XX triple (a pre-codec dir literally
    * named "50%AB" reads back as keyword "50«"); such names are
    * indistinguishable from encoded output, and the decode wins. A zone
    * carrying legacy dirs with literal %-hex-hex names must re-land
    * those keywords (or rename the dirs) before mixing in encoded ones.
    * Compatibility
    * contract: raw-ASCII zones (every zone any shipped round wrote) and
    * this codec's zones are both readable; dirs written by a transient
    * URLEncoder build ('+' for space, verbatim '*') are NOT — re-land
    * those keywords.
    */
  def dirName(kw: String): String = {
    val sb = new StringBuilder
    kw.getBytes(java.nio.charset.StandardCharsets.UTF_8).foreach { b =>
      val c = (b & 0xff).toChar
      if (c.isLetterOrDigit && c < 128 || c == '.' || c == '_' || c == '-') sb.append(c)
      else sb.append(f"%%${b & 0xff}%02X")
    }
    sb.toString
  }
  def dirKeyword(name: String): String = {
    val out = new java.io.ByteArrayOutputStream()
    var i = 0
    def hex(c: Char): Int =
      if (c >= '0' && c <= '9') c - '0'
      else if (c >= 'A' && c <= 'F') c - 'A' + 10
      else if (c >= 'a' && c <= 'f') c - 'a' + 10
      else -1
    while (i < name.length) {
      val c = name.charAt(i)
      if (c == '%' && i + 2 < name.length &&
          hex(name.charAt(i + 1)) >= 0 && hex(name.charAt(i + 2)) >= 0) {
        out.write(hex(name.charAt(i + 1)) * 16 + hex(name.charAt(i + 2)))
        i += 3
      } else {
        // literal pass-through (legacy/unencoded dirs) — by CODE POINT:
        // substring(i, i+1) would split a surrogate pair and mangle
        // non-BMP characters to '?'
        val cp = name.codePointAt(i)
        new String(Character.toChars(cp))
          .getBytes(java.nio.charset.StandardCharsets.UTF_8).foreach(out.write(_))
        i += Character.charCount(cp)
      }
    }
    new String(out.toByteArray, java.nio.charset.StandardCharsets.UTF_8)
  }

  def listPartitions(base: String, keywords: Option[Set[String]],
                     runtimeAllow: Option[Set[String]]): Array[InputPartition] = {
    val baseDir = new java.io.File(base)
    val dirs = Option(baseDir.listFiles()).getOrElse(Array.empty)
      .filter(d => d.isDirectory && !isHidden(d.getName))
      .map(d => (d, dirKeyword(d.getName)))
      .filter { case (_, kw) => keywords.forall(_.contains(kw)) }
      .filter { case (_, kw) => runtimeAllow.forall(_.contains(kw)) }
      .sortBy(_._2)
    dirs.flatMap { case (d, kw) =>
      Option(d.listFiles()).getOrElse(Array.empty)
        .filter(f => f.isFile && f.getName.endsWith(".json") && !isHidden(f.getName))
        .sortBy(_.getName)
        .map(f => KeywordFilePartition(kw, f.getAbsolutePath): InputPartition)
    }
  }

  /** Hadoop's hidden-path convention: '.'-prefixed (in-flight staging
    * files — they end in .json too, so the suffix filter alone would
    * expose half-written batches to readers) and '_'-prefixed (the
    * `_epochs` commit-marker directory) names are never data.
    */
  def isHidden(name: String): Boolean =
    name.startsWith(".") || name.startsWith("_")
}

case class KeywordReaderFactory(schema: StructType, limit: Option[Int] = None)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[KeywordFilePartition]
    new KeywordFileReader(p.keyword, p.file, schema, limit)
  }
}

/** Streams one JSON-lines snapshot file; Jackson (already on Spark's
  * classpath) parses each line, and only the pruned schema's fields are
  * extracted.
  */
class KeywordFileReader(keyword: String, file: String, schema: StructType,
                        limit: Option[Int] = None)
    extends PartitionReader[InternalRow] {

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
  private val source = scala.io.Source.fromFile(file, "UTF-8")
  private val lines = source.getLines().filter(_.trim.nonEmpty)
  private var current: InternalRow = _
  private var emitted = 0

  override def next(): Boolean = {
    // partial LIMIT pushdown: stop draining this snapshot once the
    // per-partition quota is met; Spark applies the global limit above
    if (limit.exists(emitted >= _)) return false
    if (!lines.hasNext) return false
    emitted += 1
    val node = mapper.readTree(lines.next())
    val values = schema.fields.map { f =>
      if (f.name == "keyword") UTF8String.fromString(keyword)
      else {
        val v = node.get(f.name)
        if (v == null || v.isNull) null
        else f.dataType match {
          case StringType => UTF8String.fromString(v.asText())
          case LongType => java.lang.Long.valueOf(v.asLong())
          case IntegerType => java.lang.Integer.valueOf(v.asInt())
          case DoubleType => java.lang.Double.valueOf(v.asDouble())
          case BooleanType => java.lang.Boolean.valueOf(v.asBoolean())
          case other => throw new UnsupportedOperationException(
            s"graft-keyword read: unsupported type $other for ${f.name}")
        }
      }
    }
    current = new GenericInternalRow(values.asInstanceOf[Array[Any]])
    true
  }

  override def get(): InternalRow = current
  override def close(): Unit = source.close()
}

/** DSv2 write path (the live-system form of the S5/S6 JSON sinks): rows
  * must carry a `keyword` string column; every other column is
  * serialized as one JSON object per line into
  * `base/<keyword>/part-<task>-<uuid>.json` — the same layout the
  * reader scans.
  *
  * Two-phase commit: each task writes `.staging-` files and reports
  * them in its commit message; the driver renames them into place on
  * job commit and deletes them on abort, so a failed/speculated task
  * never leaves half-written files visible to readers (append-only
  * sources have no other isolation).
  */
class KeywordWriteBuilder(base: String, schema: StructType) extends WriteBuilder {
  require(schema.fieldNames.contains("keyword"),
    "graft-keyword write requires a 'keyword' string column")
  override def build(): Write = new Write {
    override def toBatch: BatchWrite = new KeywordBatchWrite(base, schema)
    override def toStreaming:
        org.apache.spark.sql.connector.write.streaming.StreamingWrite =
      new KeywordStreamingWrite(base, schema)
  }
}

case class KeywordStagedFiles(files: Seq[String]) extends WriterCommitMessage

/** Shared two-phase commit: rename staged files into place / delete on
  * abort — used identically by the batch job commit and each streaming
  * epoch commit.
  */
private object KeywordCommit {
  def commit(messages: Array[WriterCommitMessage]): Unit =
    messages.foreach {
      case KeywordStagedFiles(files) => files.foreach { f =>
        val staged = new java.io.File(f)
        val finalName = staged.getName.stripPrefix(".staging-")
        if (!staged.renameTo(new java.io.File(staged.getParentFile, finalName)))
          throw new java.io.IOException(s"commit rename failed for $f")
      }
      case _ =>
    }

  def abort(messages: Array[WriterCommitMessage]): Unit =
    messages.foreach {
      case KeywordStagedFiles(files) =>
        files.foreach(f => new java.io.File(f).delete())
      case _ =>
    }
}

class KeywordBatchWrite(base: String, schema: StructType) extends BatchWrite {
  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    KeywordWriterFactory(base, schema)
  override def commit(messages: Array[WriterCommitMessage]): Unit =
    KeywordCommit.commit(messages)
  override def abort(messages: Array[WriterCommitMessage]): Unit =
    KeywordCommit.abort(messages)
}

/** Streaming sink form (`writeStream.format("graft-keyword")`): each
  * micro-batch stages its files and the EPOCH commit renames them into
  * place, so readers never observe a half-written batch.
  *
  * EXACTLY-ONCE via the idempotent-batch-id pattern (the connector form
  * of EventStream.writeBatchIdempotent): a `base/_epochs/epoch-<id>`
  * marker is written after an epoch's renames complete, and the epoch
  * commit consults it first —
  *   - marker present (the epoch already committed; Spark replays it
  *     after a restart between sink commit and offset-log write): the
  *     replayed staging files are DISCARDED, no duplicate data;
  *   - marker absent but epoch-prefixed data files exist (a previous
  *     attempt crashed mid-rename): the partial output is deleted and
  *     replaced by this attempt's files, then the marker is written.
  * File names carry the epoch id, which is what makes both the replay
  * detection and the partial-output cleanup possible. The marker dir is
  * '_'-prefixed and therefore invisible to readers (KeywordScanUtil
  * hidden-path rule).
  */
class KeywordStreamingWrite(base: String, schema: StructType)
    extends org.apache.spark.sql.connector.write.streaming.StreamingWrite {
  private def marker(epochId: Long): java.io.File =
    new java.io.File(new java.io.File(base, "_epochs"), s"epoch-$epochId")

  // "epoch7-" prefix (dash included, so epoch70 never matches epoch7)
  private def deletePartialEpochOutput(epochId: Long): Unit = {
    val baseDir = new java.io.File(base)
    Option(baseDir.listFiles()).getOrElse(Array.empty)
      .filter(d => d.isDirectory && !KeywordScanUtil.isHidden(d.getName))
      .foreach { d =>
        Option(d.listFiles()).getOrElse(Array.empty)
          .filter(f => f.isFile && f.getName.startsWith(s"epoch$epochId-"))
          .foreach(_.delete())
      }
  }

  override def createStreamingWriterFactory(info: PhysicalWriteInfo):
      org.apache.spark.sql.connector.write.streaming.StreamingDataWriterFactory =
    KeywordStreamingWriterFactory(base, schema)

  override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
    val m = marker(epochId)
    if (m.exists()) {
      KeywordCommit.abort(messages) // epoch already durable: drop the replay
    } else {
      deletePartialEpochOutput(epochId)
      // The per-file renames are not atomic as a GROUP: a crash inside
      // KeywordCommit.commit leaves the renamed subset visible (they pass
      // the .json/non-hidden read filters) until the epoch retries and
      // deletePartialEpochOutput heals it. Exactly-once holds across
      // retries; readers that must never observe a mid-crash half epoch
      // should additionally gate on the epoch marker's existence.
      KeywordCommit.commit(messages)
      m.getParentFile.mkdirs()
      m.createNewFile()
    }
  }

  override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit =
    KeywordCommit.abort(messages)
}

case class KeywordStreamingWriterFactory(base: String, schema: StructType)
    extends org.apache.spark.sql.connector.write.streaming.StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long,
                            epochId: Long): DataWriter[InternalRow] =
    new KeywordDataWriter(base, schema, partitionId, taskId, s"epoch$epochId-")
}

case class KeywordWriterFactory(base: String, schema: StructType)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new KeywordDataWriter(base, schema, partitionId, taskId)
}

class KeywordDataWriter(base: String, schema: StructType,
                        partitionId: Int, taskId: Long,
                        namePrefix: String = "")
    extends DataWriter[InternalRow] {

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
  private val kwOrd = schema.fieldIndex("keyword")
  private val payloadFields =
    schema.fields.zipWithIndex.filter(_._2 != kwOrd)
  private val writers = scala.collection.mutable.Map[String, java.io.Writer]()
  private val staged = scala.collection.mutable.ArrayBuffer[String]()
  private val uuid = java.util.UUID.randomUUID().toString.take(8)

  private def writerFor(kw: String): java.io.Writer =
    writers.getOrElseUpdate(kw, {
      val dir = new java.io.File(base, KeywordScanUtil.dirName(kw))
      dir.mkdirs()
      val f = new java.io.File(dir,
        s".staging-${namePrefix}part-$partitionId-$taskId-$uuid.json")
      staged += f.getAbsolutePath
      new java.io.BufferedWriter(new java.io.OutputStreamWriter(
        new java.io.FileOutputStream(f), java.nio.charset.StandardCharsets.UTF_8))
    })

  override def write(row: InternalRow): Unit = {
    val kw = row.getUTF8String(kwOrd).toString
    val node = mapper.createObjectNode()
    payloadFields.foreach { case (f, i) =>
      if (row.isNullAt(i)) node.putNull(f.name)
      else f.dataType match {
        case StringType => node.put(f.name, row.getUTF8String(i).toString)
        case LongType => node.put(f.name, row.getLong(i))
        case IntegerType => node.put(f.name, row.getInt(i))
        case DoubleType => node.put(f.name, row.getDouble(i))
        case BooleanType => node.put(f.name, row.getBoolean(i))
        case other => throw new UnsupportedOperationException(
          s"graft-keyword write: unsupported type $other for ${f.name}")
      }
    }
    val w = writerFor(kw)
    w.write(mapper.writeValueAsString(node))
    w.write("\n")
  }

  override def commit(): WriterCommitMessage = {
    writers.values.foreach(_.close())
    KeywordStagedFiles(staged.toSeq)
  }

  override def abort(): Unit = {
    writers.values.foreach(w => scala.util.Try(w.close()))
    staged.foreach(f => new java.io.File(f).delete())
  }

  override def close(): Unit = ()
}

/** DSv2 streaming read (the S3 incremental-scroll surface in connector
  * form): each micro-batch processes the snapshot files that appeared
  * since the last committed offset.
  *
  * The offset is a per-keyword lexicographic HIGH-WATERMARK (the
  * largest file name ingested in each directory), not the full file
  * set: a crawler landing zone accumulates millions of snapshot files,
  * and a file-set offset would serialize every file ever seen into
  * every offset-log line, growing without bound. The watermark keeps
  * each offset entry O(#keywords). Correctness requires snapshot names
  * to be monotone within a directory (a new file sorts after the
  * watermark) — which the timestamped snapshot naming scheme (S7,
  * reference test.py run layout) guarantees; a file arriving UNDER the
  * watermark would be skipped, exactly like a back-dated file under
  * Spark's own file-source maxFileAge. Exactly-once at the source: a
  * restarted query resumes from the checkpointed watermarks and never
  * re-reads a file.
  */
class KeywordMicroBatchStream(base: String, schema: StructType,
                              maxFilesPerTrigger: Option[Int] = None)
    extends org.apache.spark.sql.connector.read.streaming.MicroBatchStream
    with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {
  import org.apache.spark.sql.connector.read.streaming.{Offset, ReadLimit, ReadMaxFiles}

  /** (keyword, fileName, absolutePath) for every committed snapshot. */
  private def allFiles(): Seq[(String, String, String)] = {
    val baseDir = new java.io.File(base)
    Option(baseDir.listFiles()).getOrElse(Array.empty)
      .filter(d => d.isDirectory && !KeywordScanUtil.isHidden(d.getName))
      .sortBy(d => KeywordScanUtil.dirKeyword(d.getName))
      .flatMap { d =>
        Option(d.listFiles()).getOrElse(Array.empty)
          .filter(f => f.isFile && f.getName.endsWith(".json") &&
            !KeywordScanUtil.isHidden(f.getName))
          .sortBy(_.getName)
          .map(f => (KeywordScanUtil.dirKeyword(d.getName), f.getName,
            f.getAbsolutePath))
      }.toSeq
  }

  private def currentWatermarks(): KeywordWatermarkOffset =
    KeywordWatermarkOffset(allFiles().groupBy(_._1).map {
      case (kw, fs) => kw -> fs.map(_._2).max
    })

  // Trigger.AvailableNow: the end offset is pinned ONCE at query start,
  // so the run drains exactly the files present then and terminates even
  // while the crawler keeps landing new snapshots
  @volatile private var pinned: Option[KeywordWatermarkOffset] = None
  override def prepareForTriggerAvailableNow(): Unit =
    pinned = Some(currentWatermarks())

  /** Admission control (T4 rate limiting in connector form): with
    * `.option("maxFilesPerTrigger", n)` each micro-batch admits at most
    * n pending snapshot files (deterministic arrival order — timestamped
    * snapshot names, keyword as tiebreak) and
    * the watermarks advance only past the admitted ones — a backlogged
    * landing zone drains in bounded batches instead of one giant
    * catch-up batch. Composes with Trigger.AvailableNow: the wrapper
    * keeps issuing batches until the pinned end offset is reached.
    */
  override def getDefaultReadLimit: ReadLimit =
    maxFilesPerTrigger.map(ReadLimit.maxFiles).getOrElse(ReadLimit.allAvailable())

  private def advance(start: KeywordWatermarkOffset,
                      end: KeywordWatermarkOffset, n: Int,
                      files: Seq[(String, String, String)]): Offset = {
    val lo = start.watermarks
    val hi = end.watermarks
    // ARRIVAL order (snapshot names are timestamped — S7), not keyword
    // order: under a continuous trigger a chatty keyword early in the
    // alphabet must not starve the rest of the zone. Within one keyword
    // the name order is preserved, so any prefix that admits a file also
    // admits every older file of that keyword — the per-keyword
    // high-watermark offsets stay exact.
    val pending = files
      .filter { case (kw, name, _) =>
        hi.get(kw).exists(name <= _) && lo.get(kw).forall(name > _)
      }
      .sortBy { case (kw, name, _) => (name, kw) }
    if (pending.isEmpty) start
    else KeywordWatermarkOffset(lo ++ pending.take(n).groupBy(_._1).map {
      case (kw, fs) => kw -> fs.map(_._2).max
    })
  }

  override def latestOffset(start: Offset, limit: ReadLimit): Offset =
    limit match {
      case mf: ReadMaxFiles =>
        // ONE landing-zone listing per planning cycle: the target
        // watermarks and the pending set derive from the same snapshot
        // (a second recursive listing per trigger would dominate offset
        // planning on exactly the backlogged zones admission targets)
        val files = allFiles()
        val target = pinned.getOrElse(
          KeywordWatermarkOffset(files.groupBy(_._1).map {
            case (kw, fs) => kw -> fs.map(_._2).max
          }))
        advance(start.asInstanceOf[KeywordWatermarkOffset], target,
                mf.maxFiles(), files)
      case _ => pinned.getOrElse(currentWatermarks())
    }
  override def reportLatestOffset(): Offset = currentWatermarks()

  override def latestOffset(): Offset = pinned.getOrElse(currentWatermarks())
  override def initialOffset(): Offset = KeywordWatermarkOffset(Map.empty)
  override def deserializeOffset(json: String): Offset =
    KeywordWatermarkOffset.fromJson(json)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val lo = start.asInstanceOf[KeywordWatermarkOffset].watermarks
    val hi = end.asInstanceOf[KeywordWatermarkOffset].watermarks
    allFiles()
      .filter { case (kw, name, _) =>
        hi.get(kw).exists(name <= _) && lo.get(kw).forall(name > _)
      }
      .map { case (kw, _, f) => KeywordFilePartition(kw, f): InputPartition }
      .toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    KeywordReaderFactory(schema)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

/** Offset = keyword -> highest ingested file name. Serialized as a
  * SINGLE-LINE JSON object with SORTED keys: the streaming offset log
  * is line-based (one line per source), and Spark decides "no new
  * data" by comparing offset JSON strings, so serialization must be
  * deterministic.
  */
case class KeywordWatermarkOffset(watermarks: Map[String, String])
    extends org.apache.spark.sql.connector.read.streaming.Offset {
  override def json(): String = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val obj = mapper.createObjectNode()
    watermarks.toSeq.sortBy(_._1).foreach { case (k, v) => obj.put(k, v) }
    mapper.writeValueAsString(obj)
  }
}

object KeywordWatermarkOffset {
  def fromJson(json: String): KeywordWatermarkOffset = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val node = mapper.readTree(json)
    val names = node.fieldNames()
    val b = Map.newBuilder[String, String]
    while (names.hasNext) { val k = names.next(); b += k -> node.get(k).asText() }
    KeywordWatermarkOffset(b.result())
  }
}
