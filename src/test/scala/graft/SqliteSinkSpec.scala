package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import graft.sink.SqliteWriter

/** S9 literal form: the pure-JVM SQLite file writer. Structural checks
  * against the published file format plus an independent in-spec page
  * walk that re-reads every row; `tools/check_sqlite.py` (dev tool)
  * additionally opens the same files with the REAL sqlite3 library —
  * its output is recorded in the tool's header comment.
  */
class SqliteSinkSpec extends SparkSpec {

  private def readU16(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 8) | (b(off + 1) & 0xff)
  private def readU32(b: Array[Byte], off: Int): Long =
    ((b(off) & 0xffL) << 24) | ((b(off + 1) & 0xffL) << 16) |
      ((b(off + 2) & 0xffL) << 8) | (b(off + 3) & 0xffL)

  private def readVarint(b: Array[Byte], off: Int): (Long, Int) = {
    var v = 0L; var i = off
    while ({ v = (v << 7) | (b(i) & 0x7f); (b(i) & 0x80) != 0 && i - off < 8 }) i += 1
    (v, i + 1 - off)
  }

  /** Minimal independent reader: walk the table b-tree, decode every
    * record into Seq[Any] (null | Long | String).
    */
  private def readAll(path: String): Seq[Seq[Any]] = {
    val bytes = Files.readAllBytes(Paths.get(path))
    val page = readU16(bytes, 16)
    def pageAt(n: Int) = bytes.slice((n - 1) * page, n * page)

    def decodeRecord(payload: Array[Byte]): Seq[Any] = {
      val (hdrLen, n0) = readVarint(payload, 0)
      var i = n0
      val serials = scala.collection.mutable.ArrayBuffer[Long]()
      while (i < hdrLen) { val (st, n) = readVarint(payload, i); serials.append(st); i += n }
      var body = hdrLen.toInt
      serials.toSeq.map {
        case 0 => null
        case 8 => 0L
        case 9 => 1L
        case st if st >= 1 && st <= 6 =>
          val n = Seq(1, 2, 3, 4, 6, 8)(st.toInt - 1)
          var v = if ((payload(body) & 0x80) != 0) -1L else 0L
          (0 until n).foreach(k => v = (v << 8) | (payload(body + k) & 0xffL))
          body += n; v
        case st if st >= 13 && st % 2 == 1 =>
          val n = ((st - 13) / 2).toInt
          val s = new String(payload, body, n, "UTF-8"); body += n; s
        case st => fail(s"unexpected serial type $st")
      }
    }

    def walk(pageNo: Int): Seq[Seq[Any]] = {
      val p = pageAt(pageNo)
      val hdrAt = if (pageNo == 1) 100 else 0
      p(hdrAt) & 0xff match {
        case 13 =>
          val nCells = readU16(p, hdrAt + 3)
          (0 until nCells).map { c =>
            val cellOff = readU16(p, hdrAt + 8 + 2 * c)
            val (plen, n1) = readVarint(p, cellOff)
            val (_, n2) = readVarint(p, cellOff + n1)
            decodeRecord(p.slice(cellOff + n1 + n2, cellOff + n1 + n2 + plen.toInt))
          }
        case 5 =>
          val nCells = readU16(p, hdrAt + 3)
          val kids = (0 until nCells).map { c =>
            readU32(p, readU16(p, hdrAt + 12 + 2 * c)).toInt
          } :+ readU32(p, hdrAt + 8).toInt
          kids.flatMap(walk)
        case t => fail(s"unexpected page type $t on page $pageNo")
      }
    }

    // page 1's schema row: (type, name, tbl_name, rootpage, sql)
    val schemaRow = walk(1).head
    assert(schemaRow.head == "table")
    walk(schemaRow(3).asInstanceOf[Long].toInt)
  }

  test("small table: header, schema row, and full round-trip") {
    import spark.implicits._
    val dir = Paths.get("/tmp/graft_sqlite_check")
    Files.createDirectories(dir)
    val path = dir.resolve("jobs.db").toString
    val df = Seq(
      ("區塊鏈工程師", "Acme 科技", 5L),
      ("資料工程師", "Beta 資訊", 12L),
      (null, "空值公司", 0L)
    ).toDF("job_name", "company", "applicants")
    SqliteWriter.write(df, path, "jobs")

    val bytes = Files.readAllBytes(Paths.get(path))
    assert(new String(bytes, 0, 15, "US-ASCII") == "SQLite format 3")
    assert(readU16(bytes, 16) == 4096)
    assert(readU32(bytes, 28) * 4096 == bytes.length) // page count == file size
    assert(readU32(bytes, 56) == 1)                   // UTF-8

    val rows = readAll(path)
    assert(rows == Seq(
      Seq("區塊鏈工程師", "Acme 科技", 5L),
      Seq("資料工程師", "Beta 資訊", 12L),
      Seq(null, "空值公司", 0L)))
  }

  test("multi-page table: interior root, order preserved, all rows intact") {
    import spark.implicits._
    val dir = Paths.get("/tmp/graft_sqlite_check")
    Files.createDirectories(dir)
    val path = dir.resolve("big.db").toString
    // ~300-byte rows x 500 => ~12 leaf pages behind one interior root
    val df = spark.range(500).select(
      concat(lit("職位"), col("id")).as("job_name"),
      concat(lit("說明"), lpad(col("id").cast("string"), 250, "x")).as("description"),
      (col("id") * 7).as("rank"))
    SqliteWriter.write(df, path, "jobs")

    val bytes = Files.readAllBytes(Paths.get(path))
    val nPages = readU32(bytes, 28).toInt
    assert(nPages > 4, s"expected a multi-page b-tree, got $nPages pages")
    // root must be an interior page (type 5)
    val rows = readAll(path)
    assert(rows.size == 500)
    assert(rows.head == Seq("職位0", "說明" + "x" * 249 + "0", 0L))
    assert(rows(499) == Seq("職位499", "說明" + "x" * 247 + "499", 499L * 7))
    // rowid order == insertion order
    assert(rows.map(_(2).asInstanceOf[Long]) == (0L until 500L).map(_ * 7))
  }

  test("negative and boundary integers take minimal serials and survive") {
    val path = Files.createTempDirectory("sqlite").resolve("ints.db").toString
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("v", LongType)))
    val vals = Seq(0L, 1L, -1L, 127L, 128L, -128L, 32767L, 65536L,
      Int.MaxValue.toLong, Long.MaxValue, Long.MinValue)
    val rows = vals.map(v => org.apache.spark.sql.Row(v)).toArray
    SqliteWriter.writeRows(schema, rows, path, "t")
    assert(readAll(path).map(_.head) == vals)
  }

  test("two interior levels: 60k rows walk back intact through the tree") {
    import org.apache.spark.sql.types._
    val dir = Paths.get("/tmp/graft_sqlite_check")
    Files.createDirectories(dir)
    val path = dir.resolve("deep.db").toString
    val schema = StructType(Seq(
      StructField("k", LongType), StructField("name", StringType)))
    val n = 60000
    val rows = Array.tabulate(n)(i =>
      org.apache.spark.sql.Row(i * 3L, s"名稱$i"))
    SqliteWriter.writeRows(schema, rows, path, "jobs")
    // >200 leaves forces a second interior level above the FANOUT=200 root
    val bytes = Files.readAllBytes(Paths.get(path))
    val nPages = readU32(bytes, 28).toInt
    assert(nPages > 203, s"expected two interior levels, got $nPages pages")
    val back = readAll(path)
    assert(back.size == n)
    assert(back.head == Seq(0L, "名稱0"))
    assert(back(n - 1) == Seq((n - 1) * 3L, s"名稱${n - 1}"))
    assert(back.map(_.head.asInstanceOf[Long]) == (0 until n).map(_ * 3L))
  }

  test("no zero-cell interior pages at unlucky level sizes (n ≡ 1 mod fanout)") {
    import org.apache.spark.sql.types._
    val dir = Paths.get("/tmp/graft_sqlite_check")
    Files.createDirectories(dir)
    val schema = StructType(Seq(
      StructField("k", LongType), StructField("pad", StringType)))
    // ~480-byte rows -> 8 per leaf; counts chosen to land level sizes on
    // and around the k*FANOUT+1 boundary where naive grouped(FANOUT)
    // would emit an interior page with zero cells (sqlite3-untraversable)
    for (n <- Seq(1601, 1608, 1616)) {
      val path = dir.resolve(s"edge$n.db").toString
      val rows = Array.tabulate(n)(i =>
        org.apache.spark.sql.Row(i.toLong, "p" * 470))
      SqliteWriter.writeRows(schema, rows, path, "jobs")
      val bytes = Files.readAllBytes(Paths.get(path))
      val nPages = readU32(bytes, 28).toInt
      (2 to nPages).foreach { p =>
        val off = (p - 1) * 4096
        if ((bytes(off) & 0xff) == 5)
          assert(readU16(bytes, off + 3) >= 1,
            s"zero-cell interior page $p in edge$n.db ($nPages pages)")
      }
      assert(readAll(path).size == n)
    }
  }

  test("fact-scale write streams: driver live-set stays flat over ~300 MB of rows") {
    import org.apache.spark.sql.types._
    val dir = Paths.get("/tmp/graft_sqlite_check")
    Files.createDirectories(dir)
    val path = dir.resolve("streamed.db").toString
    val schema = StructType(Seq(
      StructField("k", LongType), StructField("pad", StringType)))
    val n = 300000
    val rt = Runtime.getRuntime
    def usedAfterGc(): Long = { System.gc(); rt.totalMemory() - rt.freeMemory() }
    val baseline = usedAfterGc()
    var peakOverBaseline = 0L
    // rows are GENERATED lazily; a writer that buffered cells (the old
    // collect()-based shape) would hold ~300 MB live and fail the probe —
    // the streaming writer's live set is one leaf page + the page index
    val rows = Iterator.tabulate(n) { i =>
      if (i % 25000 == 24999)
        peakOverBaseline = math.max(peakOverBaseline, usedAfterGc() - baseline)
      org.apache.spark.sql.Row(i.toLong, s"第${i}行" + "x" * 1000)
    }
    SqliteWriter.writeRows(schema, rows, path, "jobs")
    assert(peakOverBaseline < 150L * 1024 * 1024,
      s"driver live-set grew ${peakOverBaseline / 1024 / 1024} MB during a " +
        "streamed write — writer is buffering rows")
    val bytes = Files.readAllBytes(Paths.get(path))
    assert(bytes.length > 300 * 1024 * 1024, s"file only ${bytes.length} bytes")
    val back = readAll(path)
    assert(back.size == n)
    assert(back.head == Seq(0L, "第0行" + "x" * 1000))
    assert(back(n - 1) == Seq((n - 1).toLong, s"第${n - 1}行" + "x" * 1000))
  }

  test("varint: 9-byte form carries 8 literal bits in the last byte") {
    val v = (1L << 56) | 0xab
    val b = SqliteWriter.varint(v)
    assert(b.length == 9)
    assert((b(8) & 0xff) == 0xab)                    // literal low byte
    assert(b.take(8).forall(x => (x & 0x80) != 0))   // continuation bits
    val hi = b.take(8).foldLeft(0L)((acc, x) => (acc << 7) | (x & 0x7f))
    assert(((hi << 8) | (b(8) & 0xff)) == v)
    // boundary: 2^56 - 1 still fits the 8-byte base-128 form
    assert(SqliteWriter.varint((1L << 56) - 1).length == 8)
  }

  test("oversized CREATE TABLE is rejected, never silently corrupted") {
    import org.apache.spark.sql.types._
    val schema = StructType((0 until 200).map(i =>
      StructField("very_long_column_name_padding_" + "x" * 20 + i, StringType)))
    val ex = intercept[IllegalArgumentException] {
      SqliteWriter.writeRows(schema, Array.empty[org.apache.spark.sql.Row],
        Files.createTempDirectory("sqlite").resolve("wide.db").toString, "t")
    }
    assert(ex.getMessage.contains("schema page"))
  }
}
