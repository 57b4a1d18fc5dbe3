package graft.sink

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** Pure-JVM writer for the SQLite 3 database file format — closes the
  * reference's S9 surface literally (`sqlite3 jobs.db 'SELECT * FROM
  * jobs'`, README.md:61-69) with no JDBC driver dependency: the file
  * format is a public, stable spec (sqlite.org/fileformat2.html) and a
  * small single-table database needs only its table-b-tree subset.
  *
  * Scope (asserted, not silently degraded):
  *  - one table per file; TEXT / INTEGER(long) / NULL columns;
  *  - each row's record must fit a leaf page's local payload
  *    (~4 KB — no overflow chains), the natural shape of the
  *    reference's job rows;
  *  - multi-level interior b-tree (no structural row cap), and the
  *    writer STREAMS: rows arrive one executor partition at a time
  *    (`toLocalIterator`), leaf pages go straight to disk as they fill,
  *    and the only retained state is one (page, max-rowid) tuple per
  *    ~4 KB page — driver heap stays flat at fact scale. The output is
  *    still a single local file (like the reference's jobs.db), so the
  *    funnel is the disk, not memory.
  *
  * Layout written: page 1 = 100-byte header + sqlite_schema leaf
  * holding the CREATE TABLE row; pages 2..k+1 = table leaves packed in
  * rowid order; optional page k+2 = table interior root. Verified
  * against the real sqlite3 library by `tools/check_sqlite.py`
  * (dev tool) and structurally + via round-trip parse in SqliteSinkSpec.
  */
object SqliteWriter {

  private val PAGE = 4096
  private val SQLITE_VERSION_NUMBER = 3045000 // any plausible writer version

  // ---- low-level encoders -------------------------------------------------

  /** SQLite varint: big-endian base-128, high bit = continuation; 9th
    * byte (if present) carries 8 bits. Values here are non-negative.
    */
  private[graft] def varint(v: Long): Array[Byte] = {
    require(v >= 0, s"negative varint $v")
    if (v <= 0x7f) Array(v.toByte)
    else if (v >>> 56 != 0) {
      // 9-byte form: bytes 0-7 carry 7 bits each (high bit set), byte 8
      // carries the low 8 bits LITERALLY — not another base-128 group
      val out = new Array[Byte](9)
      out(8) = (v & 0xff).toByte
      var x = v >>> 8
      var i = 7
      while (i >= 0) { out(i) = ((x & 0x7f) | 0x80).toByte; x >>>= 7; i -= 1 }
      out
    } else {
      val groups = new scala.collection.mutable.ArrayBuffer[Byte]
      var x = v
      while (x > 0) { groups.prepend((x & 0x7f).toByte); x >>>= 7 }
      (0 until groups.size - 1).foreach(i =>
        groups(i) = (groups(i) | 0x80).toByte)
      groups.toArray
    }
  }

  private def be16(v: Int): Array[Byte] = Array((v >> 8).toByte, v.toByte)
  private def be32(v: Int): Array[Byte] =
    Array((v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)

  /** Minimal-width twos-complement big-endian integer serial type:
    * returns (serialType, bodyBytes). Schema format 4 enables the
    * one-byte 0/1 serials.
    */
  private[graft] def intSerial(v: Long): (Long, Array[Byte]) = v match {
    case 0 => (8L, Array.empty)
    case 1 => (9L, Array.empty)
    case _ =>
      def fits(bits: Int) = v >= -(1L << (bits - 1)) && v < (1L << (bits - 1))
      val (st, n) =
        if (fits(8)) (1L, 1) else if (fits(16)) (2L, 2)
        else if (fits(24)) (3L, 3) else if (fits(32)) (4L, 4)
        else if (fits(48)) (5L, 6) else (6L, 8)
      val b = new Array[Byte](n)
      (0 until n).foreach(i => b(n - 1 - i) = ((v >> (8 * i)) & 0xff).toByte)
      (st, b)
  }

  /** One record (row payload): header of serial types + body. Values:
    * null | Long | String.
    */
  private[graft] def record(values: Seq[Any]): Array[Byte] = {
    val parts = values.map {
      case null => (0L, Array.empty[Byte])
      case v: Long => intSerial(v)
      case v: Int => intSerial(v.toLong)
      case s: String =>
        val b = s.getBytes(StandardCharsets.UTF_8)
        (2L * b.length + 13L, b)
      case other =>
        throw new IllegalArgumentException(
          s"unsupported sqlite value type: ${other.getClass}")
    }
    val serials = parts.flatMap(p => varint(p._1)).toArray
    // header size varint includes its own width — iterate to fixpoint
    // (stable after one step at any size)
    var hdrLen = serials.length + 1
    while (varint(hdrLen.toLong).length + serials.length != hdrLen)
      hdrLen = serials.length + varint(hdrLen.toLong).length
    val out = new ByteArrayOutputStream()
    out.write(varint(hdrLen.toLong))
    out.write(serials)
    parts.foreach(p => out.write(p._2))
    out.toByteArray
  }

  /** Table-leaf cell: varint(payload len) + varint(rowid) + payload. */
  private def leafCell(rowid: Long, payload: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    out.write(varint(payload.length.toLong))
    out.write(varint(rowid))
    out.write(payload)
    out.toByteArray
  }

  /** A b-tree page image: cells packed from the tail, pointer array
    * after the header. `headerAt` is 100 on page 1, else 0.
    */
  private def pageImage(pageType: Int, cells: Seq[Array[Byte]],
                        headerAt: Int, rightMost: Int = 0): Array[Byte] = {
    val page = new Array[Byte](PAGE)
    val hdrLen = if (pageType == 5) 12 else 8
    var tail = PAGE
    val ptrs = cells.map { c => tail -= c.length; System.arraycopy(c, 0, page, tail, c.length); tail }
    val hdr = new ByteArrayOutputStream()
    hdr.write(pageType)
    hdr.write(be16(0))             // first freeblock
    hdr.write(be16(cells.size))
    hdr.write(be16(tail & 0xffff)) // cell content start
    hdr.write(0)                   // fragmented bytes
    if (pageType == 5) hdr.write(be32(rightMost))
    val h = hdr.toByteArray
    System.arraycopy(h, 0, page, headerAt, h.length)
    var off = headerAt + hdrLen
    ptrs.foreach { p =>
      page(off) = ((p >> 8) & 0xff).toByte; page(off + 1) = (p & 0xff).toByte
      off += 2
    }
    page
  }

  /** Greedy fill: cells per leaf limited by free space (usable - 8
    * header, 2 pointer bytes per cell).
    */
  private def leafFits(used: Int, cell: Array[Byte]): Boolean = {
    require(cell.length <= PAGE - 35,
      s"row payload ${cell.length} exceeds single-page local maximum")
    used + cell.length + 2 <= PAGE
  }

  // ---- public API ---------------------------------------------------------

  private def sqlTypeName(dt: DataType): String = dt match {
    case StringType => "TEXT"
    case LongType | IntegerType => "INTEGER"
    case other =>
      throw new IllegalArgumentException(s"unsupported sqlite column type $other")
  }

  /** Write `df` as a real SQLite database file holding one `table`.
    *
    * Streams via `toLocalIterator` — the driver holds ONE partition of
    * rows plus ONE leaf page under assembly at a time, never the whole
    * DataFrame, so a fact-scale input costs time and disk but not driver
    * heap. (Single-file SQLite output is inherently a single-writer
    * funnel; the bound removed here is memory, not the funnel.)
    */
  def write(df: DataFrame, path: String, table: String): Unit = {
    val schema = df.schema
    schema.fields.foreach(f => sqlTypeName(f.dataType)) // validate early
    writeRows(schema, scala.jdk.CollectionConverters
      .IteratorHasAsScala(df.toLocalIterator()).asScala, path, table)
  }

  private[graft] def writeRows(schema: StructType, rows: IterableOnce[Row],
                               path: String, table: String): Unit = {
    val createSql = schema.fields
      .map(f => s""""${f.name}" ${sqlTypeName(f.dataType)}""")
      .mkString(s"CREATE TABLE \"$table\"(", ", ", ")")

    // Leaf pages stream straight to disk at their final offsets (pages
    // 2..nLeaves+1 in rowid order); only the (page, max-rowid) index —
    // one entry per ~4 KB page — is retained for the interior levels.
    val raf = new java.io.RandomAccessFile(path, "rw")
    try {
    raf.setLength(0)
    val leafIndex = scala.collection.mutable.ArrayBuffer[(Int, Long)]()
    var nextPage = 2
    def emitLeaf(cells: Seq[Array[Byte]], maxRowid: Long): Unit = {
      raf.seek((nextPage - 1).toLong * PAGE)
      raf.write(pageImage(13, cells, headerAt = 0))
      leafIndex.append((nextPage, maxRowid))
      nextPage += 1
    }
    var cur = scala.collection.mutable.ArrayBuffer[Array[Byte]]()
    var used = 8
    var rowCount = 0L
    rows.iterator.foreach { r =>
      val vals = schema.fields.indices.map { j =>
        if (r.isNullAt(j)) null
        else schema.fields(j).dataType match {
          case StringType => r.getString(j)
          case LongType => r.getLong(j)
          case IntegerType => r.getInt(j).toLong
        }
      }
      rowCount += 1
      val cell = leafCell(rowCount, record(vals))
      if (!leafFits(used, cell)) {
        emitLeaf(cur.toSeq, rowCount - 1)
        cur = scala.collection.mutable.ArrayBuffer(); used = 8
      }
      cur.append(cell); used += cell.length + 2
    }
    if (cur.nonEmpty || leafIndex.isEmpty) emitLeaf(cur.toSeq, rowCount)
    val nLeaves = leafIndex.size

    // page plan: 1 = schema; 2..nLeaves+1 = leaves (rowid order); then
    // interior levels bottom-up, each page fanning into <= FANOUT
    // children, until a single root remains — a real multi-level table
    // b-tree, so the row count is bounded by disk, not by one root page.
    // Interior cell = 4-byte child page + varint(largest rowid in that
    // child's subtree); the level's right-most child rides the header.
    val FANOUT = 200 // 200 * (4 + <=9 + 2) + 12 bytes <= PAGE, any rowid width
    var level: Seq[(Int, Long)] = leafIndex.toSeq
    // balanced grouping, NOT grouped(FANOUT): a trailing group of size 1
    // would become an interior page with ZERO cells (right-most pointer
    // only), which real sqlite3's moveToLeftmost cannot traverse. Evenly
    // spread sizes keep every group >= 2 whenever the level splits.
    def balanced(xs: Seq[(Int, Long)]): Seq[Seq[(Int, Long)]] = {
      val k = (xs.size + FANOUT - 1) / FANOUT
      val base = xs.size / k; val extra = xs.size % k
      val out = scala.collection.mutable.ArrayBuffer[Seq[(Int, Long)]]()
      var off = 0
      (0 until k).foreach { g =>
        val sz = base + (if (g < extra) 1 else 0)
        out.append(xs.slice(off, off + sz)); off += sz
      }
      out.toSeq
    }
    while (level.size > 1) {
      level = balanced(level).map { group =>
        val cells = group.dropRight(1).map { case (child, key) =>
          val out = new ByteArrayOutputStream()
          out.write(be32(child))
          out.write(varint(key))
          out.toByteArray
        }
        raf.seek((nextPage - 1).toLong * PAGE)
        raf.write(pageImage(5, cells, headerAt = 0, rightMost = group.last._1))
        val pageNo = nextPage
        nextPage += 1
        (pageNo, group.last._2)
      }.toSeq
    }
    val rootPage = level.head._1
    val nPages = nextPage - 1

    // page 1: header + sqlite_schema leaf with the CREATE TABLE row
    val schemaCell = leafCell(1L, record(Seq(
      "table", table, table, rootPage.toLong, createSql)))
    // page 1's usable area starts after the 100-byte file header; the
    // 8-byte page header + one 2-byte cell pointer must not collide with
    // the tail-packed cell (a very wide CREATE TABLE would otherwise be
    // silently overwritten by the header copy -> corrupt file)
    require(100 + 8 + 2 + schemaCell.length <= PAGE,
      s"CREATE TABLE statement too large for the schema page " +
        s"(${schemaCell.length} bytes; limit ${PAGE - 110})")
    val page1 = pageImage(13, Seq(schemaCell), headerAt = 100)
    val hdr = new ByteArrayOutputStream()
    hdr.write("SQLite format 3".getBytes(StandardCharsets.US_ASCII)); hdr.write(0)
    hdr.write(be16(PAGE))
    hdr.write(1); hdr.write(1)      // file format write/read version (legacy)
    hdr.write(0)                    // reserved bytes per page
    hdr.write(64); hdr.write(32); hdr.write(32) // payload fractions (fixed)
    hdr.write(be32(1))              // file change counter
    hdr.write(be32(nPages))
    hdr.write(be32(0)); hdr.write(be32(0)) // freelist head/count
    hdr.write(be32(1))              // schema cookie
    hdr.write(be32(4))              // schema format (4: 0/1 serials allowed)
    hdr.write(be32(0))              // default page cache
    hdr.write(be32(0))              // largest root page (vacuum)
    hdr.write(be32(1))              // text encoding: UTF-8
    hdr.write(be32(0)); hdr.write(be32(0)); hdr.write(be32(0)) // user/vacuum/appid
    hdr.write(new Array[Byte](20))  // reserved
    hdr.write(be32(1))              // version-valid-for
    hdr.write(be32(SQLITE_VERSION_NUMBER))
    System.arraycopy(hdr.toByteArray, 0, page1, 0, 100)

    raf.seek(0)
    raf.write(page1)
    } finally raf.close()
  }
}
