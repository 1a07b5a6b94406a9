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
  *   - `xl/workbook.xml` + `xl/_rels/workbook.xml.rels` — the declared
  *     sheet list (names, workbook order) and its rId -> worksheet-part
  *     mapping, so sheets resolve by NAME or by 0-based workbook position
  *     (pandas `read_excel(sheet_name=...)` accepts both). Files missing
  *     these parts (hand-rolled fixtures) fall back to natural
  *     sheetN.xml order, index selection only.
  *   - `xl/styles.xml` — cellXfs number-format ids, to recognize
  *     DATE-styled numeric cells (Excel stores dates as day serials with
  *     a style, not a cell type). Builtin date format ids plus a
  *     y/m/d/h/s scan of custom format codes mark the date styles.
  *   - the selected `xl/worksheets/sheetN.xml`: `<row>` / `<c r=.. t=..
  *     s=..><v>..` cells. Cell types handled: `s` (shared string), `str`
  *     (formula string), `inlineStr` (`<is><t>`), `b` (boolean ->
  *     true/false), `d` (ISO date), default numeric/general (the raw
  *     `<v>` text; decoded from the 1899-12-30-epoch day serial when the
  *     cell's style is a date format — the pre-1900-03-01 serials keep
  *     Lotus's fictitious leap-day offset, exactly as pandas/openpyxl).
  *
  * Contract (pandas-concat shape, same as the rest of S2):
  *   - Row 1 of each file is its header; the result's columns are the
  *     NAME-ALIGNED union across files in first-seen order, and each
  *     file's rows map into it by its OWN header (pandas `concat` aligns
  *     by column name and null-fills — positional alignment silently
  *     corrupted reordered/subset workbooks, ADVICE r11). Duplicate
  *     names within a file fail loudly.
  *   - Values land as STRINGS, then one distributed aggregate infers each
  *     column's type from the cells' DECLARED kinds plus their text:
  *     BIGINT / DOUBLE only for columns whose non-null cells are all
  *     numeric-TYPED (a string-typed "007" SKU column stays STRING —
  *     text-only inference stripped leading zeros, ADVICE r11), DATE /
  *     TIMESTAMP for all-date-styled columns, STRING otherwise. Booleans
  *     surface as "true"/"false" strings (pandas-object shape, pinned by
  *     IngestSpec). The aggregate's driver state is 5 longs per column.
  *
  * Shape at scale: one task PER FILE (`parallelize(paths)`), each parsing
  * its own workbook — the format itself caps a sheet at ~1M rows, so a
  * file is a natural, bounded partition; a folder of many workbooks
  * parses fully parallel. Driver-side work is one small collect of
  * per-file HEADER name lists (computed distributed, one tiny task per
  * file; schema must exist at plan time). Anything that has outgrown
  * Excel belongs in parquet at landing — this reader is for fidelity
  * with the reference's actual inputs, not a columnar path (no pushdown,
  * no pruning; the scaladoc on [[Ingest.folderMixed]] says the same).
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

  /** All OPEN TAGS `<tag ...>` / `<tag .../>` for `tag`, in document
    * order — for self-closing elements whose payload is attributes
    * (sheet/Relationship/xf/numFmt), which [[elements]] collapses to "". */
  private def openTags(xml: String, tag: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var from = 0
    while (from < xml.length) {
      val open = xml.indexOf("<" + tag, from)
      if (open < 0 || open + 1 + tag.length >= xml.length) from = xml.length
      else {
        val nextCh = xml.charAt(open + 1 + tag.length)
        if (nextCh != ' ' && nextCh != '>' && nextCh != '/') from = open + 1
        else {
          val tagEnd = xml.indexOf('>', open)
          out += xml.substring(open, tagEnd + 1)
          from = tagEnd + 1
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

  // ---- date styles ----

  /** ECMA-376 builtin date/time number-format ids (18.8.30): date, time,
    * and datetime formats, including the reserved locale-variant ranges. */
  private val BuiltinDateFmts: Set[Int] =
    ((14 to 22) ++ (27 to 36) ++ (45 to 47) ++ (50 to 58)).toSet

  /** A custom format code is a date format when, after stripping quoted
    * literals, color/condition brackets, and escapes, it still contains a
    * y/m/d/h/s token — the ECMA-376 date placeholders. (Elapsed-time
    * codes like [h]:mm:ss count as dates; they decode as datetimes.) */
  private[ops] def isDateFormatCode(code: String): Boolean = {
    val sb = new StringBuilder
    var i = 0
    while (i < code.length) {
      code.charAt(i) match {
        case '"' => i += 1; while (i < code.length && code.charAt(i) != '"') i += 1; i += 1
        case '[' => i += 1; while (i < code.length && code.charAt(i) != ']') i += 1; i += 1
        case '\\' => i += 2
        case c => sb += c; i += 1
      }
    }
    sb.toString.toLowerCase.exists("ymdhs".contains(_))
  }

  /** styles.xml -> the set of cellXf INDICES (what a cell's `s` attribute
    * references) whose number format is a date format. */
  private[ops] def parseDateStyles(stylesXml: String): Set[Int] = {
    val customDate: Set[Int] = openTags(stylesXml, "numFmt").flatMap { t =>
      for (id <- attr(t, "numFmtId"); code <- attr(t, "formatCode")
           if isDateFormatCode(unescape(code))) yield id.toInt
    }.toSet
    val xfs = elements(stylesXml, "cellXfs").headOption
      .map(openTags(_, "xf")).getOrElse(Seq.empty)
    xfs.zipWithIndex.flatMap { case (xf, i) =>
      val fmt = attr(xf, "numFmtId").flatMap(_.toIntOption).getOrElse(0)
      if (BuiltinDateFmts.contains(fmt) || customDate.contains(fmt)) Some(i) else None
    }.toSet
  }

  /** Excel day serial to an ISO "yyyy-MM-dd HH:mm:ss" string;
    * time-of-day rounds to the second. Two epochs exist in the wild
    * (ADVICE/VERDICT r12 #5): the default 1899-12-30 (serials < 61
    * inherit Lotus's fictitious 1900-02-29 offset — the openpyxl/pandas
    * convention) and the Mac 1904-01-01 epoch, declared by
    * `<workbookPr date1904="1"/>` in workbook.xml; decoding a 1904
    * workbook against the 1900 epoch lands every date 1,462 days early,
    * which pandas/openpyxl (the reference's readers, main.py:19-21)
    * never do. */
  private[ops] def dateSerialToIso(serial: Double,
                                   date1904: Boolean = false): String = {
    val days = math.floor(serial).toLong
    val secs = math.round((serial - days) * 86400.0)
    val epoch = if (date1904) java.time.LocalDate.of(1904, 1, 1)
                else java.time.LocalDate.of(1899, 12, 30)
    epoch.atStartOfDay.plusDays(days).plusSeconds(secs).format(IsoFmt)
  }

  private val IsoFmt =
    java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss")

  /** The inverse: LocalDateTime -> day serial, for the writer. */
  private[ops] def toSerial(dt: java.time.LocalDateTime): Double =
    java.time.Duration.between(
      java.time.LocalDate.of(1899, 12, 30).atStartOfDay, dt).getSeconds / 86400.0

  // ---- sheet parsing ----

  /** One parsed cell: 0-based column, text value, and the DECLARED kind —
    * 'n' numeric-typed, 's' string-typed, 'b' boolean, 'd' date (style-
    * decoded serial or a t="d" ISO cell), '0' empty. Kind drives type
    * inference: text alone cannot distinguish a numeric cell from a
    * string cell that happens to look numeric (ADVICE r11). */
  private[ops] final case class XCell(pos: Int, value: String, kind: Char)

  /** Sheet XML -> rows of cells; empty `<v/>` cells carry kind '0'. */
  private[ops] def parseSheet(xml: String, shared: IndexedSeq[String],
                              dateStyles: Set[Int],
                              date1904: Boolean = false): Seq[Array[XCell]] =
    elements(xml, "row").map { row =>
      var nextPos = 0
      // cells need their OPEN TAG attributes (r=, t=, s=), so scan manually
      val cells = Seq.newBuilder[XCell]
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
          val styleIsDate = attr(openTag, "s")
            .flatMap(_.toIntOption).exists(dateStyles.contains)
          val cell = raw match {
            case None => XCell(pos, null, '0')
            case Some(v) => t match {
              case "s" => XCell(pos, shared(v.trim.toInt), 's')
              case "str" | "inlineStr" | "e" => XCell(pos, v, 's')
              case "b" => XCell(pos,
                if (v.trim == "1" || v.trim.equalsIgnoreCase("true")) "true" else "false", 'b')
              case "d" => // ISO-typed date cell (rare; normalize to one shape)
                val iso = v.trim.replace('T', ' ')
                XCell(pos, if (iso.length == 10) iso + " 00:00:00" else iso.take(19), 'd')
              case _ if styleIsDate => // numeric serial + date style = a date
                v.trim.toDoubleOption match {
                  case Some(d) => XCell(pos, dateSerialToIso(d, date1904), 'd')
                  case None => XCell(pos, v, 'n') // malformed; surface raw
                }
              case _ => XCell(pos, v, 'n')
            }
          }
          cells += cell
          from = tagEnd + (if (selfClosed) 1 else body.length + 5)
        }
      }
      cells.result().toArray
    }

  // ---- workbook assembly ----

  private final case class WorkbookParts(
      shared: IndexedSeq[String],
      sheetsByEntry: Map[String, String], // entry name -> sheet xml
      declared: Seq[(String, String)],    // workbook order: (sheet name, entry name)
      dateStyles: Set[Int],
      date1904: Boolean)                  // <workbookPr date1904/> Mac epoch

  private def readParts(bytes: Array[Byte]): WorkbookParts = {
    val zis = new java.util.zip.ZipInputStream(
      new java.io.ByteArrayInputStream(bytes))
    var shared = IndexedSeq.empty[String]
    var workbookXml = ""
    var relsXml = ""
    var stylesXml = ""
    var sheets = List.empty[(String, String)]
    try {
      var e = zis.getNextEntry
      while (e != null) {
        val name = e.getName
        def body() = new String(zis.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
        name match {
          case "xl/sharedStrings.xml" => shared = parseSharedStrings(body())
          case "xl/workbook.xml" => workbookXml = body()
          case "xl/_rels/workbook.xml.rels" => relsXml = body()
          case "xl/styles.xml" => stylesXml = body()
          case n if n.startsWith("xl/worksheets/sheet") && n.endsWith(".xml") =>
            sheets ::= (n, body())
          case _ => ()
        }
        e = zis.getNextEntry
      }
    } finally zis.close()
    require(sheets.nonEmpty, "xlsx has no xl/worksheets/sheet*.xml entry")
    // rId -> worksheet entry (targets may be relative or /xl/-absolute)
    val relTargets: Map[String, String] = openTags(relsXml, "Relationship").flatMap { t =>
      for (id <- attr(t, "Id"); tgt <- attr(t, "Target")) yield
        id -> (if (tgt.startsWith("/")) tgt.stripPrefix("/") else "xl/" + tgt)
    }.toMap
    val declared: Seq[(String, String)] = openTags(workbookXml, "sheet").flatMap { t =>
      for (nm <- attr(t, "name"); rid <- attr(t, "r:id");
           entry <- relTargets.get(rid)) yield (unescape(nm), entry)
    }
    val dateStyles = if (stylesXml.isEmpty) Set.empty[Int] else parseDateStyles(stylesXml)
    // ECMA-376 §18.2.28: date1904 accepts "1"/"true" (absent -> 1900 epoch)
    val date1904 = openTags(workbookXml, "workbookPr").exists(t =>
      attr(t, "date1904").exists(v => v == "1" || v.equalsIgnoreCase("true")))
    WorkbookParts(shared, sheets.toMap, declared, dateStyles, date1904)
  }

  /** Read one worksheet of one workbook. `sel` is `Left(0-based index)`
    * in the workbook's DECLARED sheet order (pandas `sheet_name=N`) or
    * `Right(sheet name)` (pandas `sheet_name="Costs"` — main.py:19-21's
    * `sheet` parameter accepts both; VERDICT r11 missing #1). Fixtures
    * without workbook.xml/rels fall back to natural sheetN.xml order,
    * index selection only. */
  private[ops] def parseWorkbook(bytes: Array[Byte],
                                 sel: Either[Int, String]): Seq[Array[XCell]] = {
    val parts = readParts(bytes)
    // natural order on the numeric suffix — sheet2 < sheet10
    def sheetNo(n: String) =
      n.stripPrefix("xl/worksheets/sheet").stripSuffix(".xml").toIntOption
        .getOrElse(Int.MaxValue)
    val ordered: Seq[String] =
      if (parts.declared.nonEmpty) parts.declared.map(_._2)
      else parts.sheetsByEntry.keys.toSeq.sortBy(n => (sheetNo(n), n))
    val entry = sel match {
      case Left(i) =>
        require(i >= 0 && i < ordered.length,
          s"sheet index $i out of range — workbook has ${ordered.length} sheet(s)")
        ordered(i)
      case Right(name) =>
        require(parts.declared.nonEmpty,
          "workbook has no xl/workbook.xml sheet list — select by index")
        parts.declared.find(_._1 == name).map(_._2).getOrElse(
          throw new IllegalArgumentException(
            s"no sheet named '$name' — workbook has: " +
              parts.declared.map(_._1).mkString(", ")))
    }
    parseSheet(parts.sheetsByEntry(entry), parts.shared, parts.dateStyles,
      parts.date1904)
  }

  /** Backwards-compatible index form. */
  private[ops] def parseWorkbook(bytes: Array[Byte], sheet: Int): Seq[Array[XCell]] =
    parseWorkbook(bytes, Left(sheet))

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
    * native, TIMESTAMP/DATE columns go as day serials with the builtin
    * datetime style (numFmtId 22 — Excel and this reader both decode
    * them; sub-second precision truncates), nulls leave the cell absent.
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
          |<Override PartName="/xl/styles.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.styles+xml"/>
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
          |<Relationship Id="rId2" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/styles" Target="styles.xml"/>
          |</Relationships>""".stripMargin)
      // style index 1 = builtin datetime format 22 ("m/d/yy h:mm") — the
      // one style the writer emits, for TIMESTAMP/DATE columns
      put("xl/styles.xml",
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
          |<styleSheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
          |<fonts count="1"><font/></fonts>
          |<fills count="1"><fill><patternFill patternType="none"/></fill></fills>
          |<borders count="1"><border/></borders>
          |<cellStyleXfs count="1"><xf numFmtId="0"/></cellStyleXfs>
          |<cellXfs count="2"><xf numFmtId="0"/><xf numFmtId="22" applyNumberFormat="1"/></cellXfs>
          |</styleSheet>""".stripMargin)

      zos.putNextEntry(new java.util.zip.ZipEntry("xl/worksheets/sheet1.xml"))
      val w = new java.io.OutputStreamWriter(zos, java.nio.charset.StandardCharsets.UTF_8)
      w.write("<?xml version=\"1.0\" encoding=\"UTF-8\" standalone=\"yes\"?>\n" +
        "<worksheet xmlns=\"http://schemas.openxmlformats.org/spreadsheetml/2006/main\"><sheetData>")
      def serialCell(ref: String, dt: java.time.LocalDateTime): String =
        s"""<c r="$ref" s="1"><v>${toSerial(dt)}</v></c>"""
      def cell(ref: String, v: Any): String = v match {
        case null => ""
        case b: Boolean => s"""<c r="$ref" t="b"><v>${if (b) 1 else 0}</v></c>"""
        case n @ (_: Long | _: Int | _: Short | _: Byte | _: Double | _: Float |
                  _: java.math.BigDecimal | _: scala.math.BigDecimal) =>
          s"""<c r="$ref"><v>$n</v></c>"""
        case t: java.sql.Timestamp => // session tz is UTC; interpret the instant there
          serialCell(ref, t.toInstant.atZone(java.time.ZoneOffset.UTC).toLocalDateTime)
        case d: java.sql.Date => serialCell(ref, d.toLocalDate.atStartOfDay)
        case t: java.time.Instant =>
          serialCell(ref, t.atZone(java.time.ZoneOffset.UTC).toLocalDateTime)
        case d: java.time.LocalDate => serialCell(ref, d.atStartOfDay)
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

  /** Read a set of .xlsx files as ONE DataFrame; `sheet` selects the
    * 0-based worksheet (workbook order) in every workbook. See the
    * object scaladoc for the name-aligned union + kind-driven inference
    * contract. */
  def read(spark: SparkSession, paths: Seq[String], sheet: Int = 0): DataFrame =
    readImpl(spark, paths, Left(sheet))

  /** Read selecting the worksheet by NAME in every workbook — pandas
    * `read_excel(sheet_name="...")`, the reference's `sheet` parameter's
    * other accepted form (main.py:19-21). */
  def readByName(spark: SparkSession, paths: Seq[String], sheetName: String): DataFrame =
    readImpl(spark, paths, Right(sheetName))

  private def headerCells(cells: Seq[Array[XCell]]): Option[Seq[String]] =
    cells.headOption.map { row1 =>
      val width = row1.map(_.pos).maxOption.fold(0)(_ + 1)
      val arr = new Array[String](width)
      row1.foreach(c => if (c.pos < width) arr(c.pos) = c.value)
      arr.toSeq.map(h => Option(h).getOrElse(""))
    }

  /** Driver-side so callers see the IllegalArgumentException unwrapped,
    * not a SparkException around a task failure. */
  private def validateHeader(h: Option[Seq[String]], path: String): Seq[String] = {
    val header = h.getOrElse(throw new IllegalArgumentException(
      s"$path has no rows — cannot take a header"))
    require(header.forall(_.nonEmpty) && header.distinct.length == header.length,
      s"header row must be non-empty and unique in $path, got: ${header.mkString(", ")}")
    header
  }

  /** Re-throw the argument/parse error buried in a task-failure chain, if
    * any — sheet-name and workbook-shape errors surface loudly either
    * way, but the unwrapped form names the actual problem first. */
  private def unwrapArg[T](body: => T): T =
    try body catch {
      case e: Throwable =>
        var c: Throwable = e
        while (c != null && !c.isInstanceOf[IllegalArgumentException]) c = c.getCause
        throw (if (c != null) c else e)
    }

  private def readImpl(spark: SparkSession, paths: Seq[String],
                       sel: Either[Int, String]): DataFrame = {
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
    // schema must exist at PLAN time: sweep every file's header row with
    // one tiny distributed task per file, collect only the NAME LISTS
    // (bounded: columns-per-file), and union them in first-seen order —
    // the pandas-concat column set (ADVICE r11: positional alignment
    // silently corrupted reordered/subset folders)
    val headerByPath: Map[String, Seq[String]] = unwrapArg {
      spark.sparkContext
        .parallelize(paths, paths.size)
        .map(p => p -> headerCells(parseWorkbook(readBytes(p, conf.value), sel)))
        .collect()
    }.map { case (p, h) => p -> validateHeader(h, p) }.toMap
    val header: Seq[String] = paths.foldLeft(Vector.empty[String]) { (acc, p) =>
      acc ++ headerByPath(p).filterNot(acc.contains)
    }
    val width = header.length
    val globalIdx: Map[String, Int] = header.zipWithIndex.toMap
    // one extra hidden column carries the per-cell DECLARED kinds so type
    // inference can see them ('n'/'s'/'b'/'d', '0' = null) without a
    // second parse of every workbook
    val schema = StructType(header.map(StructField(_, StringType, nullable = true)) :+
      StructField("__kinds", StringType, nullable = false))
    val rows = spark.sparkContext
      .parallelize(paths, paths.size)
      .flatMap { p =>
        val cells = parseWorkbook(readBytes(p, conf.value), sel)
        val fileHeader = validateHeader(headerCells(cells), p)
        val filePos: Array[Int] = fileHeader.map(globalIdx).toArray
        cells.drop(1).map { r =>
          val vals = new Array[String](width)
          val kinds = Array.fill[Char](width)('0')
          r.foreach { c =>
            // cells beyond the file's own header width are dropped
            if (c.pos < filePos.length && c.value != null) {
              val gi = filePos(c.pos)
              vals(gi) = c.value
              kinds(gi) = c.kind
            }
          }
          Row.fromSeq(vals.toSeq :+ new String(kinds))
        }
      }
    val raw = spark.createDataFrame(rows, schema)
    // type inference, distributed, kind-aware: BIGINT/DOUBLE only when
    // every non-null cell is numeric-TYPED and its text parses; DATE /
    // TIMESTAMP when every non-null cell is date-kind (DATE if no cell
    // carries a time of day); STRING otherwise. One aggregate row =
    // 5 longs per column of driver state.
    def kindAt(i: Int) = substring(col("__kinds"), i + 1, 1)
    val flags = raw.select(header.zipWithIndex.flatMap { case (c, i) =>
      val k = kindAt(i)
      Seq(
        sum(when(col(c).isNotNull &&
          expr(s"try_cast(`$c` AS BIGINT)").isNull, 1L).otherwise(0L))
          .as(s"${c}__notlong"),
        sum(when(col(c).isNotNull &&
          expr(s"try_cast(`$c` AS DOUBLE)").isNull, 1L).otherwise(0L))
          .as(s"${c}__notdbl"),
        sum(when(k =!= "n" && k =!= "0", 1L).otherwise(0L)).as(s"${c}__notnum"),
        sum(when(k =!= "d" && k =!= "0", 1L).otherwise(0L)).as(s"${c}__notdate"),
        sum(when(k === "d" && !col(c).endsWith(" 00:00:00"), 1L).otherwise(0L))
          .as(s"${c}__hastime"))
    }: _*).head()
    raw.select(header.zipWithIndex.map { case (c, i) =>
      def f(j: Int) = Option(flags.get(5 * i + j)).fold(0L)(_.asInstanceOf[Long])
      val (notLong, notDbl, notNum, notDate, hasTime) = (f(0), f(1), f(2), f(3), f(4))
      if (notNum == 0L && notLong == 0L) col(c).cast("bigint").as(c)
      else if (notNum == 0L && notDbl == 0L) col(c).cast("double").as(c)
      else if (notDate == 0L && hasTime == 0L) col(c).cast("date").as(c)
      else if (notDate == 0L) col(c).cast("timestamp").as(c)
      else col(c)
    }: _*)
  }
}
