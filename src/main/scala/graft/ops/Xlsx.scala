package graft.ops

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Minimal, dependency-free .xlsx ingestion.
  *
  * The reference's ONLY input format is Excel (reference
  * /root/reference/main.py:19-21 `pd.read_excel`, driven by folders of
  * .xlsx named in config.ini:5-6), which the port previously substituted
  * with parquet/csv/json/orc because no Excel connector exists offline.
  * An xlsx is just a ZIP of small XML parts, so this closes the gap with
  * `java.util.zip` + a tolerant hand parser — no new dependencies.
  *
  * Parts read (ECMA-376 / ISO 29500 SpreadsheetML, the public format):
  *   - `xl/sharedStrings.xml` — `<si>` entries; all `<t>` runs of an entry
  *     are concatenated (rich-text runs split one logical string).
  *   - first `xl/worksheets/sheet*.xml` (natural order — pandas
  *     `read_excel` default sheet 0): `<row>` / `<c r=.. t=..><v>..`
  *     cells. Cell types handled: `s` (shared string), `str` (formula
  *     string), `inlineStr` (`<is><t>`), `b` (boolean -> true/false),
  *     default numeric/general (the raw `<v>` text).
  *
  * Contract (pandas-concat shape, same as the rest of S2):
  *   - Row 1 is the header; its cell texts are the column names.
  *   - Values land as STRINGS, then one distributed aggregate infers each
  *     column as BIGINT / DOUBLE / STRING (all non-null values must
  *     parse; the aggregate's driver state is 2 flags per column). That
  *     keeps `unionByName` against typed parquet working under ANSI.
  *   - Date serials are NOT decoded (they surface as their numeric
  *     serial) — the reference's own sheets are string/number tables.
  *
  * Shape at scale: one task PER FILE (`parallelize(paths)`), each parsing
  * its own workbook — the format itself caps a sheet at ~1M rows, so a
  * file is a natural, bounded partition; a folder of many workbooks
  * parses fully parallel. The only driver-side work is reading the FIRST
  * file's header row (schema must exist at plan time). Anything that has
  * outgrown Excel belongs in parquet at landing — this reader is for
  * fidelity with the reference's actual inputs, not a columnar path (no
  * pushdown, no pruning; the scaladoc on [[Ingest.folderMixed]] says the
  * same).
  */
object Xlsx {

  // ---- pure XML-subset parsing (unit-testable without Spark) ----

  private def unescape(s: String): String = {
    if (!s.contains('&')) return s
    val out = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '&') {
        val semi = s.indexOf(';', i + 1)
        val ent = if (semi > i) s.substring(i + 1, semi) else ""
        ent match {
          case "amp" => out += '&'; i = semi + 1
          case "lt" => out += '<'; i = semi + 1
          case "gt" => out += '>'; i = semi + 1
          case "quot" => out += '"'; i = semi + 1
          case "apos" => out += '\''; i = semi + 1
          case e if e.startsWith("#x") || e.startsWith("#X") =>
            out += Integer.parseInt(e.drop(2), 16).toChar; i = semi + 1
          case e if e.startsWith("#") =>
            out += e.drop(1).toInt.toChar; i = semi + 1
          case _ => out += c; i += 1 // not an entity we know — literal '&'
        }
      } else { out += c; i += 1 }
    }
    out.toString
  }

  /** All top-level element bodies `<tag ...>BODY</tag>` for `tag`,
    * in document order. Self-closed `<tag/>` yields an empty body. */
  private def elements(xml: String, tag: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var from = 0
    while (from < xml.length) {
      val open = xml.indexOf("<" + tag, from)
      if (open < 0 || open + 1 + tag.length >= xml.length) from = xml.length
      else {
        val tagEnd = xml.indexOf('>', open)
        // guard against <tagX...> matching <tag
        val nextCh = xml.charAt(open + 1 + tag.length)
        if (nextCh != ' ' && nextCh != '>' && nextCh != '/') from = open + 1
        else if (xml.charAt(tagEnd - 1) == '/') { out += ""; from = tagEnd + 1 }
        else {
          val close = xml.indexOf("</" + tag + ">", tagEnd)
          out += xml.substring(tagEnd + 1, close)
          from = close + tag.length + 3
        }
      }
    }
    out.result()
  }

  private def attr(openTag: String, name: String): Option[String] = {
    val k = name + "=\""
    val i = openTag.indexOf(k)
    if (i < 0) None
    else {
      val start = i + k.length
      Some(openTag.substring(start, openTag.indexOf('"', start)))
    }
  }

  /** `<si>` entries of sharedStrings.xml: concatenated `<t>` runs. */
  private[ops] def parseSharedStrings(xml: String): IndexedSeq[String] =
    elements(xml, "si").map(si =>
      elements(si, "t").map(unescape).mkString).toIndexedSeq

  /** "A"->0, "AB"->27 — the column index of an A1-style reference. */
  private[ops] def colIndex(ref: String): Int = {
    var i = 0; var acc = 0
    while (i < ref.length && ref.charAt(i).isLetter) {
      acc = acc * 26 + (ref.charAt(i).toUpper - 'A' + 1); i += 1
    }
    acc - 1
  }

  /** Sheet XML -> rows of (colIndex, text); null text for empty `<v/>`. */
  private[ops] def parseSheet(xml: String,
                              shared: IndexedSeq[String]): Seq[Array[(Int, String)]] =
    elements(xml, "row").map { row =>
      var nextPos = 0
      // cells need their OPEN TAG attributes (r=, t=), so scan manually
      val cells = Seq.newBuilder[(Int, String)]
      var from = 0
      while (from < row.length) {
        val open = row.indexOf("<c", from)
        if (open < 0 || open + 2 >= row.length) from = row.length
        else if (!" />".contains(row.charAt(open + 2))) from = open + 1
        else {
          val tagEnd = row.indexOf('>', open)
          val openTag = row.substring(open, tagEnd)
          val selfClosed = row.charAt(tagEnd - 1) == '/'
          val body =
            if (selfClosed) ""
            else {
              val close = row.indexOf("</c>", tagEnd)
              row.substring(tagEnd + 1, close)
            }
          val pos = attr(openTag, "r").map(colIndex).getOrElse(nextPos)
          nextPos = pos + 1
          val t = attr(openTag, "t").getOrElse("")
          val raw = t match {
            case "inlineStr" => Some(elements(body, "t").map(unescape).mkString)
            case _ => elements(body, "v").headOption.map(unescape)
          }
          val value = raw.map { v =>
            t match {
              case "s" => shared(v.trim.toInt)
              case "b" => if (v.trim == "1" || v.trim.equalsIgnoreCase("true")) "true" else "false"
              case _ => v
            }
          }.orNull
          cells += ((pos, value))
          from = tagEnd + (if (selfClosed) 1 else body.length + 5)
        }
      }
      cells.result().toArray
    }

  /** Read one worksheet of one workbook (0-based `sheet`, natural
    * sheetN.xml order — pandas `read_excel(sheet_name=N)`): data rows
    * padded/ordered to the max column index seen in row 1. */
  private[ops] def parseWorkbook(bytes: Array[Byte], sheet: Int = 0): Seq[Array[String]] = {
    val zis = new java.util.zip.ZipInputStream(
      new java.io.ByteArrayInputStream(bytes))
    var shared = IndexedSeq.empty[String]
    var sheets = List.empty[(String, String)] // (entry name, xml)
    try {
      var e = zis.getNextEntry
      while (e != null) {
        val name = e.getName
        if (name == "xl/sharedStrings.xml" ||
          (name.startsWith("xl/worksheets/sheet") && name.endsWith(".xml"))) {
          val xml = new String(zis.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
          if (name == "xl/sharedStrings.xml") shared = parseSharedStrings(xml)
          else sheets ::= (name, xml)
        }
        e = zis.getNextEntry
      }
    } finally zis.close()
    require(sheets.nonEmpty, "xlsx has no xl/worksheets/sheet*.xml entry")
    // natural order on the numeric suffix — sheet2 < sheet10
    def sheetNo(n: String) =
      n.stripPrefix("xl/worksheets/sheet").stripSuffix(".xml").toIntOption
        .getOrElse(Int.MaxValue)
    val ordered = sheets.sortBy(s => (sheetNo(s._1), s._1))
    require(sheet >= 0 && sheet < ordered.length,
      s"sheet index $sheet out of range — workbook has ${ordered.length} sheet(s)")
    val rows = parseSheet(ordered(sheet)._2, shared)
    if (rows.isEmpty) return Seq.empty
    val width = rows.head.map(_._1).maxOption.fold(0)(_ + 1)
    rows.map { cells =>
      val arr = new Array[String](width)
      cells.foreach { case (i, v) => if (i < width) arr(i) = v }
      arr
    }
  }

  // ---- the writer (the reference's SINK format) ----

  /** The xlsx row-count format cap (ECMA-376 worksheet limit). */
  val MaxRows = 1048576L

  private def xmlEscape(s: String): String = {
    val out = new StringBuilder(s.length)
    s.foreach {
      case '&' => out ++= "&amp;"
      case '<' => out ++= "&lt;"
      case '>' => out ++= "&gt;"
      case '"' => out ++= "&quot;"
      case c => out += c
    }
    out.toString
  }

  private def colLetters(i0: Int): String = {
    var i = i0 + 1
    val sb = new StringBuilder
    while (i > 0) { val r = (i - 1) % 26; sb.insert(0, ('A' + r).toChar); i = (i - 1) / 26 }
    sb.toString
  }

  /** Write `df` as one workbook — the reference's OUTPUT side
    * (main.py:521-553 appends resolved rows to `output.xlsx`; its
    * checked-in sample stores strings as `t="inlineStr"` and numbers as
    * plain `<v>`, which is exactly what this emits, so the reference's
    * own tooling reads the result). Strings go inline (no shared-string
    * table — append-friendly and simpler), numeric/boolean columns go
    * native, nulls leave the cell absent.
    *
    * SCALE GUARD, loud: an xlsx sheet is format-capped at [[MaxRows]]
    * rows and is a single driver-written file — this is a REPORTING
    * sink for resolved/decision tables, not a data path. Rows stream
    * through `toLocalIterator` (one partition in driver memory at a
    * time), and exceeding the cap throws naming the parquet sink.
    * Append semantics (S3) = read existing + union + rewrite, WITHOUT
    * the reference's off-by-one spacer row (main.py:533 leaves a blank
    * row per append batch — documented, not ported; SURVEY §2.1 S3). */
  def write(df: org.apache.spark.sql.DataFrame, path: String): Unit = {
    val header = df.columns.toSeq
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(df.sparkSession.sparkContext.hadoopConfiguration)
    val zos = new java.util.zip.ZipOutputStream(fs.create(p, true))
    def put(name: String, body: String): Unit = {
      zos.putNextEntry(new java.util.zip.ZipEntry(name))
      zos.write(body.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      zos.closeEntry()
    }
    try {
      put("[Content_Types].xml",
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
          |<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
          |<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
          |<Default Extension="xml" ContentType="application/xml"/>
          |<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
          |<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>
          |</Types>""".stripMargin)
      put("_rels/.rels",
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
          |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
          |<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
          |</Relationships>""".stripMargin)
      put("xl/workbook.xml",
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
          |<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
          |<sheets><sheet name="Sheet1" sheetId="1" r:id="rId1"/></sheets>
          |</workbook>""".stripMargin)
      put("xl/_rels/workbook.xml.rels",
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
          |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
          |<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>
          |</Relationships>""".stripMargin)

      zos.putNextEntry(new java.util.zip.ZipEntry("xl/worksheets/sheet1.xml"))
      val w = new java.io.OutputStreamWriter(zos, java.nio.charset.StandardCharsets.UTF_8)
      w.write("<?xml version=\"1.0\" encoding=\"UTF-8\" standalone=\"yes\"?>\n" +
        "<worksheet xmlns=\"http://schemas.openxmlformats.org/spreadsheetml/2006/main\"><sheetData>")
      def cell(ref: String, v: Any): String = v match {
        case null => ""
        case b: Boolean => s"""<c r="$ref" t="b"><v>${if (b) 1 else 0}</v></c>"""
        case n @ (_: Long | _: Int | _: Short | _: Byte | _: Double | _: Float |
                  _: java.math.BigDecimal | _: scala.math.BigDecimal) =>
          s"""<c r="$ref"><v>$n</v></c>"""
        case s => s"""<c r="$ref" t="inlineStr"><is><t>${xmlEscape(s.toString)}</t></is></c>"""
      }
      def rowXml(rowNo: Long, vals: Seq[Any]): String =
        s"""<row r="$rowNo">""" +
          vals.zipWithIndex.map { case (v, i) => cell(colLetters(i) + rowNo, v) }.mkString +
          "</row>"
      w.write(rowXml(1L, header))
      var n = 1L
      val it = df.toLocalIterator()
      while (it.hasNext) {
        n += 1
        require(n <= MaxRows,
          s"xlsx sheets are format-capped at $MaxRows rows — this is a " +
            "reporting sink for resolved/decision tables; write parquet " +
            "(Resolve.writeSink) for data-scale output")
        w.write(rowXml(n, it.next().toSeq))
      }
      w.write("</sheetData></worksheet>")
      w.flush()
      zos.closeEntry()
    } finally zos.close()
  }

  /** S3 append semantics: existing rows (if any) + `df`'s rows, one
    * rewrite. Columns must match the existing header by name/order. */
  def append(spark: SparkSession, path: String, df: org.apache.spark.sql.DataFrame): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) write(df, path)
    else {
      val existing = read(spark, Seq(path))
      require(existing.columns.sameElements(df.columns),
        s"append column mismatch: existing ${existing.columns.mkString(",")} " +
          s"vs new ${df.columns.mkString(",")}")
      // MATERIALIZE the existing rows before the rewrite: write() truncates
      // the file first and a lazy plan would then re-parse the truncated
      // zip mid-stream. Driver memory is bounded by the format's own
      // MaxRows cap — this is a reporting sink (see write()).
      val snapshot = spark.createDataFrame(
        new java.util.ArrayList(java.util.Arrays.asList(existing.collect(): _*)),
        existing.schema)
      // union on the existing file's INFERRED types — a type-incompatible
      // append fails loudly instead of silently stringifying
      write(snapshot.unionByName(df.selectExpr(existing.schema.fields.map(f =>
        s"CAST(`${f.name}` AS ${f.dataType.sql}) AS `${f.name}`").toIndexedSeq: _*)), path)
    }
  }

  // ---- the Spark-facing reader ----

  /** Read a set of .xlsx files as ONE DataFrame: header from the first
    * file's row 1, rows from every file aligned positionally to it
    * (the pandas `read_excel` + `concat` shape the reference runs),
    * column types inferred BIGINT / DOUBLE / STRING by one distributed
    * aggregate over all values. `sheet` selects the 0-based worksheet
    * in every workbook (the reference's selectable `sheet=0` default,
    * main.py:19-21); extra cells beyond the header width are dropped. */
  def read(spark: SparkSession, paths: Seq[String], sheet: Int = 0): DataFrame = {
    require(paths.nonEmpty, "Xlsx.read needs at least one path")
    val conf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    def readBytes(p: String, hc: org.apache.hadoop.conf.Configuration): Array[Byte] = {
      val hp = new org.apache.hadoop.fs.Path(p)
      val in = hp.getFileSystem(hc).open(hp)
      try {
        val out = new java.io.ByteArrayOutputStream()
        val buf = new Array[Byte](65536)
        var n = in.read(buf)
        while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
        out.toByteArray
      } finally in.close()
    }
    // schema must exist at PLAN time: read only the first file's header
    // on the driver (one small zip), everything else parses in executors
    val header = parseWorkbook(readBytes(paths.head, spark.sparkContext.hadoopConfiguration), sheet)
      .headOption.getOrElse(throw new IllegalArgumentException(
        s"${paths.head} has no rows — cannot take a header"))
      .map(h => Option(h).getOrElse(""))
    require(header.forall(_.nonEmpty) && header.distinct.length == header.length,
      s"header row must be non-empty and unique, got: ${header.mkString(", ")}")
    val width = header.length
    val schema = StructType(header.map(StructField(_, StringType, nullable = true)))
    val rows = spark.sparkContext
      .parallelize(paths, paths.size)
      .flatMap { p =>
        parseWorkbook(readBytes(p, conf.value), sheet).drop(1).map { r =>
          Row.fromSeq((0 until width).map(i => if (i < r.length) r(i) else null))
        }
      }
    val raw = spark.createDataFrame(rows, schema)
    // type inference, distributed: a column is BIGINT if every non-null
    // value try_casts; else DOUBLE on the same rule; else STRING. One
    // aggregate row = 2 longs per column of driver state.
    val flags = raw.select(header.flatMap { c =>
      Seq(
        sum(when(col(c).isNotNull &&
          expr(s"try_cast(`$c` AS BIGINT)").isNull, 1L).otherwise(0L))
          .as(s"${c}__notlong"),
        sum(when(col(c).isNotNull &&
          expr(s"try_cast(`$c` AS DOUBLE)").isNull, 1L).otherwise(0L))
          .as(s"${c}__notdbl"))
    }: _*).head()
    raw.select(header.zipWithIndex.map { case (c, i) =>
      val notLong = Option(flags.get(2 * i)).fold(0L)(_.asInstanceOf[Long])
      val notDbl = Option(flags.get(2 * i + 1)).fold(0L)(_.asInstanceOf[Long])
      if (notLong == 0L) col(c).cast("bigint").as(c)
      else if (notDbl == 0L) col(c).cast("double").as(c)
      else col(c)
    }: _*)
  }
}
