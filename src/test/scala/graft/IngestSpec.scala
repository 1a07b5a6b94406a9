package graft

import java.nio.file.Files

import graft.ops.Ingest

/** Source surface (SURVEY §2.1): mixed-format folder scan with by-name
  * schema alignment — the reference's "read every tabular file in the data
  * folder and concat" generalized past a single format. */
class IngestSpec extends SparkTestBase {
  import spark.implicits._

  test("folderMixed: parquet + csv + json in one folder align by name with null fill") {
    val dir = Files.createTempDirectory("graft-mixed").toString
    Seq((1L, "alpha"), (2L, "beta")).toDF("id", "name")
      .coalesce(1).write.parquet(dir + "/p")
    Seq((3L, "gamma", 9.5)).toDF("id", "name", "score")
      .coalesce(1).write.option("header", "true").csv(dir + "/c")
    Seq((4L, "delta")).toDF("id", "extra")
      .coalesce(1).write.json(dir + "/j")
    Seq((5L, "epsilon", 7.25)).toDF("id", "name", "score")
      .coalesce(1).write.orc(dir + "/o")
    // flatten the per-format subdirs into one folder of files
    val flat = Files.createTempDirectory("graft-flat").toString
    for (sub <- Seq("p", "c", "j", "o");
         f <- new java.io.File(dir, sub).listFiles
         if f.getName.endsWith(".parquet") || f.getName.endsWith(".csv")
           || f.getName.endsWith(".json") || f.getName.endsWith(".orc"))
      Files.copy(f.toPath, java.nio.file.Paths.get(flat, f.getName))

    val out = Ingest.folderMixed(spark, flat)
    assert(out.count() === 5)
    assert(out.columns.toSet === Set("id", "name", "score", "extra"))
    val byId = out.collect().map(r => r.getAs[Long]("id") -> r).toMap
    assert(byId(1L).getAs[String]("name") === "alpha")
    assert(byId(1L).isNullAt(byId(1L).fieldIndex("score")))     // parquet row: no csv col
    assert(byId(3L).getAs[Double]("score") === 9.5)             // csv row with inferSchema
    assert(byId(4L).getAs[String]("extra") === "delta")         // json-only column
    assert(byId(4L).isNullAt(byId(4L).fieldIndex("name")))
    assert(byId(5L).getAs[String]("name") === "epsilon")        // orc row
    assert(byId(5L).getAs[Double]("score") === 7.25)
  }

  test("folderMixed: empty folder is a loud error") {
    val dir = Files.createTempDirectory("graft-empty").toString
    val e = intercept[IllegalArgumentException](Ingest.folderMixed(spark, dir))
    assert(e.getMessage.contains("no parquet/csv/json"))
  }

  test("jsonl/csv round trip: embedded delimiters, quotes, newlines, null vs empty, unicode") {
    val dir = Files.createTempDirectory("graft-rt").toString
    val df = Seq(
      (1L, "plain", Option("en"), 10L),
      (2L, "comma, \"quote\" and\nnewline\ttab", Option(""), 0L),
      (3L, "unicode café ☃ snowman", Option.empty[String], -5L),
      (4L, "", Option("backslash \\N literal-ish \\"), 7L)
    ).toDF("id", "text", "lang", "n")
    Ingest.writeJsonl(df, s"$dir/j")
    Ingest.writeCsv(df, s"$dir/c")
    def rows(d: org.apache.spark.sql.DataFrame) =
      d.orderBy("id").collect().map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) null else r.getString(2), r.getLong(3))).toSeq
    val want = Seq(
      (1L, "plain", "en", 10L),
      (2L, "comma, \"quote\" and\nnewline\ttab", "", 0L),
      (3L, "unicode café ☃ snowman", null, -5L),
      (4L, "", "backslash \\N literal-ish \\", 7L))
    assert(rows(Ingest.jsonl(spark, s"$dir/j", df.schema)) === want,
      "JSONL must round-trip every value byte-exactly, null/empty distinct")
    assert(rows(Ingest.csv(spark, s"$dir/c", df.schema)) === want,
      "CSV must round-trip via quoteAll + escape + \\N null token")
  }

  test("jsonl FAILFAST: a malformed line is a loud error, not a null row") {
    val dir = Files.createTempDirectory("graft-badjson").toString
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dir, "part-0.json"),
      "{\"id\": 1, \"text\": \"ok\"}\n{not json at all\n")
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("text",
        org.apache.spark.sql.types.StringType)))
    val e = intercept[org.apache.spark.SparkException] {
      Ingest.jsonl(spark, dir, schema).collect()
    }
    assert(e.getMessage.contains("Malformed") ||
      Option(e.getCause).exists(_.getMessage.contains("Malformed")))
  }

  /** Write a minimal SpreadsheetML workbook the way openpyxl/Excel lay it
    * out: sharedStrings + one worksheet, rich-text runs, inline strings,
    * bools, self-closed empty cells, XML entities — the surface
    * Xlsx.parseWorkbook must survive. */
  private def writeWorkbook(path: String, sharedXml: String, sheetXml: String): Unit = {
    val zos = new java.util.zip.ZipOutputStream(new java.io.FileOutputStream(path))
    def put(name: String, body: String): Unit = {
      zos.putNextEntry(new java.util.zip.ZipEntry(name))
      zos.write(body.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      zos.closeEntry()
    }
    put("[Content_Types].xml", "<Types/>") // present in real files, ignored
    put("xl/workbook.xml", "<workbook><sheets><sheet name=\"S1\" sheetId=\"1\"/></sheets></workbook>")
    if (sharedXml.nonEmpty) put("xl/sharedStrings.xml", sharedXml)
    put("xl/worksheets/sheet1.xml", sheetXml)
    zos.close()
  }

  test("xlsx: round-trips a generated workbook — shared/rich/inline strings, bools, blanks, types inferred") {
    val dir = Files.createTempDirectory("graft-xlsx").toString
    val shared =
      """<sst count="4" uniqueCount="4">
        |<si><t>id</t></si>
        |<si><t>name</t></si>
        |<si><t>score</t></si>
        |<si><r><t>al</t></r><r><t>pha</t></r></si>
        |</sst>""".stripMargin
    val sheet =
      """<worksheet><sheetData>
        |<row r="1"><c r="A1" t="s"><v>0</v></c><c r="B1" t="s"><v>1</v></c><c r="C1" t="s"><v>2</v></c><c r="D1" t="str"><v>flag</v></c></row>
        |<row r="2"><c r="A2"><v>1</v></c><c r="B2" t="s"><v>3</v></c><c r="C2"><v>9.5</v></c><c r="D2" t="b"><v>1</v></c></row>
        |<row r="3"><c r="A3"><v>2</v></c><c r="B3" t="inlineStr"><is><t>be&amp;ta &lt;x&gt;</t></is></c><c r="C3"/><c r="D3" t="b"><v>0</v></c></row>
        |<row r="4"><c r="A4"><v>3</v></c><c r="C4"><v>7</v></c></row>
        |</sheetData></worksheet>""".stripMargin
    writeWorkbook(s"$dir/t.xlsx", shared, sheet)
    val df = graft.ops.Xlsx.read(spark, Seq(s"$dir/t.xlsx"))
    assert(df.columns.toSeq === Seq("id", "name", "score", "flag"))
    // inference: id all-long -> bigint; score has 9.5 -> double; rest string
    assert(df.schema("id").dataType.typeName === "long")
    assert(df.schema("score").dataType.typeName === "double")
    assert(df.schema("name").dataType.typeName === "string")
    val byId = df.collect().map(r => r.getAs[Long]("id") -> r).toMap
    assert(byId.size === 3)
    assert(byId(1L).getAs[String]("name") === "alpha") // rich-text runs joined
    assert(byId(1L).getAs[Double]("score") === 9.5)
    assert(byId(1L).getAs[String]("flag") === "true")
    assert(byId(2L).getAs[String]("name") === "be&ta <x>") // entities unescaped
    assert(byId(2L).isNullAt(byId(2L).fieldIndex("score"))) // self-closed cell
    assert(byId(2L).getAs[String]("flag") === "false")
    assert(byId(3L).isNullAt(byId(3L).fieldIndex("name"))) // skipped cell (B4 absent)
    assert(byId(3L).getAs[Double]("score") === 7.0)
    assert(byId(3L).isNullAt(byId(3L).fieldIndex("flag"))) // short row padded
  }

  test("xlsx: folderMixed unions a workbook with parquet by name (VERDICT r10 #4)") {
    val dir = Files.createTempDirectory("graft-xlsx-mixed").toString
    Seq((1L, "alpha", 1.5)).toDF("id", "name", "score")
      .coalesce(1).write.parquet(dir + "/p")
    for (f <- new java.io.File(dir, "p").listFiles if f.getName.endsWith(".parquet"))
      Files.copy(f.toPath, java.nio.file.Paths.get(dir, f.getName))
    val shared = "<sst><si><t>id</t></si><si><t>name</t></si><si><t>beta</t></si></sst>"
    val sheet =
      """<worksheet><sheetData>
        |<row r="1"><c r="A1" t="s"><v>0</v></c><c r="B1" t="s"><v>1</v></c></row>
        |<row r="2"><c r="A2"><v>2</v></c><c r="B2" t="s"><v>2</v></c></row>
        |</sheetData></worksheet>""".stripMargin
    writeWorkbook(s"$dir/w.xlsx", shared, sheet)
    val out = Ingest.folderMixed(spark, dir)
    assert(out.columns.toSet === Set("id", "name", "score"))
    val byId = out.collect().map(r => r.getAs[Long]("id") -> r).toMap
    assert(byId(1L).getAs[String]("name") === "alpha")
    assert(byId(2L).getAs[String]("name") === "beta") // xlsx row
    assert(byId(2L).isNullAt(byId(2L).fieldIndex("score"))) // null-filled
  }

  test("xlsx writer: write -> read round-trip; inline strings match the reference's own output shape; append (S3)") {
    import graft.ops.Xlsx
    val dir = Files.createTempDirectory("graft-xlsx-w").toString
    val df = Seq(
      (1L, "CH-S09FTXD-BL/SC", 762.5, true),
      (2L, "a <tag> & \"quote\"", 610.0, false))
      .toDF("row_id", "sku", "price", "kept")
    Xlsx.write(df, s"$dir/out.xlsx")
    val back = Xlsx.read(spark, Seq(s"$dir/out.xlsx"))
    assert(back.columns.toSeq === Seq("row_id", "sku", "price", "kept"))
    assert(back.schema("row_id").dataType.typeName === "long")
    assert(back.schema("price").dataType.typeName === "double")
    val byId = back.collect().map(r => r.getAs[Long]("row_id") -> r).toMap
    assert(byId(1L).getAs[String]("sku") === "CH-S09FTXD-BL/SC")
    assert(byId(2L).getAs[String]("sku") === "a <tag> & \"quote\"") // escape round-trip
    assert(byId(1L).getAs[Double]("price") === 762.5)
    assert(byId(1L).getAs[String]("kept") === "true") // bools read back as strings
    // the bytes really are the reference's output shape: inline strings
    val zf = new java.util.zip.ZipFile(s"$dir/out.xlsx")
    val sheet = new String(zf.getInputStream(
      zf.getEntry("xl/worksheets/sheet1.xml")).readAllBytes(),
      java.nio.charset.StandardCharsets.UTF_8)
    zf.close()
    assert(sheet.contains("t=\"inlineStr\""), "strings must store inline like output.xlsx")
    assert(!sheet.contains("t=\"s\""), "no shared-string table on the write path")
    // S3 append: existing + new rows, no spacer row (the main.py:533
    // off-by-one is documented as not ported)
    Xlsx.append(spark, s"$dir/out.xlsx",
      Seq((3L, "new", 1.0, true)).toDF("row_id", "sku", "price", "kept"))
    assert(Xlsx.read(spark, Seq(s"$dir/out.xlsx")).count() === 3)
    intercept[IllegalArgumentException](Xlsx.append(spark, s"$dir/out.xlsx",
      Seq((4L, "x")).toDF("row_id", "other")))
  }

  test("config: INI round-trip with the reference's exact conventions (S5)") {
    import graft.ops.Config
    // the reference's own config.ini shape (main.py:643-686)
    val text =
      """; engine settings
        |[multithreading]
        |multithreading = False
        |
        |[pre_browse]
        |search_file = /data/sort.xlsx
        |data_folder =
        |
        |[settings]
        |out_1 = True
        |out_2 = true
        |column_index1 = 0
        |column_index2 = 3
        |threshold = 3
        |""".stripMargin
    val ini = Config.parse(text)
    val s = Config.Settings.fromIni(ini)
    assert(!s.multithreading)
    assert(s.searchFile === Some("/data/sort.xlsx"))
    assert(s.dataFolder === None) // empty string means unset (main.py:655)
    assert(s.out1)
    assert(!s.out2, "only the literal 'True' enables — the reference compares strings")
    assert(s.columnIndex2 === 3 && s.threshold === 3)
    // the GUI's mutate-threshold-then-write loop (main.py:370-374)
    val dir = Files.createTempDirectory("graft-ini").toString
    Config.save(spark, s"$dir/config.ini", s.copy(threshold = 7).toIni(ini))
    val back = Config.load(spark, s"$dir/config.ini")
    assert(Config.Settings.fromIni(back) === s.copy(threshold = 7))
    // comments dropped on write — configparser-faithful lossiness
    assert(!Config.render(back).contains("engine settings"))
    // section/key ORDER survives the round trip (configparser preserves it)
    assert(back.sections.map(_._1) === Vector("multithreading", "pre_browse", "settings"))
    assert(back.sections.last._2.map(_._1) ===
      Vector("out_1", "out_2", "column_index1", "column_index2", "threshold"))
    // session bridge: conf keys carry every setting and read back equal
    Config.applyToSession(spark, s.copy(threshold = 7))
    assert(Config.sessionSettings(spark) === s.copy(threshold = 7))
    // unknown junk fails loudly, never silently skips a setting
    intercept[IllegalArgumentException](Config.parse("[a]\nnot a kv line"))
    intercept[IllegalArgumentException](Config.parse("orphan = 1"))
    intercept[IllegalArgumentException](
      Config.Settings.fromIni(Config.parse("[settings]\nthreshold = x")))
  }

  test("xlsx: two workbooks concat like the reference's folder loop; bad header fails loudly") {
    val dir = Files.createTempDirectory("graft-xlsx2").toString
    val shared = "<sst><si><t>id</t></si><si><t>v</t></si></sst>"
    def sheet(idVal: Int) =
      s"""<worksheet><sheetData>
         |<row r="1"><c r="A1" t="s"><v>0</v></c><c r="B1" t="s"><v>1</v></c></row>
         |<row r="2"><c r="A2"><v>$idVal</v></c><c r="B2"><v>${idVal * 10}</v></c></row>
         |</sheetData></worksheet>""".stripMargin
    writeWorkbook(s"$dir/a.xlsx", shared, sheet(1))
    writeWorkbook(s"$dir/b.xlsx", shared, sheet(2))
    val df = graft.ops.Xlsx.read(spark, Seq(s"$dir/a.xlsx", s"$dir/b.xlsx"))
    assert(df.count() === 2)
    assert(df.select(org.apache.spark.sql.functions.sum("v")).head.getLong(0) === 30L)
    // duplicate header names must fail loudly, not silently misalign
    val dupShared = "<sst><si><t>x</t></si></sst>"
    val dupSheet =
      """<worksheet><sheetData>
        |<row r="1"><c r="A1" t="s"><v>0</v></c><c r="B1" t="s"><v>0</v></c></row>
        |</sheetData></worksheet>""".stripMargin
    writeWorkbook(s"$dir/dup.xlsx", dupShared, dupSheet)
    val e = intercept[IllegalArgumentException](
      graft.ops.Xlsx.read(spark, Seq(s"$dir/dup.xlsx")))
    assert(e.getMessage.contains("unique"))
  }

  /** A 2-sheet workbook with workbook.xml + rels (real Excel layout) and
    * a styles part whose cellXf index 1 is a date format. */
  private def writeWorkbook2(path: String, stylesXml: String,
                             sheets: Seq[(String, String)],
                             workbookPr: String = ""): Unit = {
    val zos = new java.util.zip.ZipOutputStream(new java.io.FileOutputStream(path))
    def put(name: String, body: String): Unit = {
      zos.putNextEntry(new java.util.zip.ZipEntry(name))
      zos.write(body.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      zos.closeEntry()
    }
    put("[Content_Types].xml", "<Types/>")
    put("xl/workbook.xml",
      "<workbook>" + workbookPr + "<sheets>" + sheets.zipWithIndex.map { case ((nm, _), i) =>
        s"""<sheet name="$nm" sheetId="${i + 1}" r:id="rId${i + 1}"/>"""
      }.mkString + "</sheets></workbook>")
    put("xl/_rels/workbook.xml.rels",
      "<Relationships>" + sheets.indices.map { i =>
        s"""<Relationship Id="rId${i + 1}" Target="worksheets/sheet${i + 1}.xml"/>"""
      }.mkString + "</Relationships>")
    if (stylesXml.nonEmpty) put("xl/styles.xml", stylesXml)
    sheets.zipWithIndex.foreach { case ((_, xml), i) =>
      put(s"xl/worksheets/sheet${i + 1}.xml", xml)
    }
    zos.close()
  }

  test("xlsx: sheet selection by NAME via workbook.xml + rels (VERDICT r11 #1)") {
    val dir = Files.createTempDirectory("graft-xlsx-name").toString
    def sheet(hdr: String, v: Int) =
      s"""<worksheet><sheetData>
         |<row r="1"><c r="A1" t="inlineStr"><is><t>$hdr</t></is></c></row>
         |<row r="2"><c r="A2"><v>$v</v></c></row>
         |</sheetData></worksheet>""".stripMargin
    writeWorkbook2(s"$dir/m.xlsx", "",
      Seq("Summary" -> sheet("a", 1), "Costs" -> sheet("b", 2)))
    val byName = graft.ops.Xlsx.readByName(spark, Seq(s"$dir/m.xlsx"), "Costs")
    assert(byName.columns.toSeq === Seq("b"))
    assert(byName.head.getLong(0) === 2L)
    // index selection follows the DECLARED workbook order, same as pandas
    assert(graft.ops.Xlsx.read(spark, Seq(s"$dir/m.xlsx"), sheet = 1)
      .columns.toSeq === Seq("b"))
    val e = intercept[IllegalArgumentException](
      graft.ops.Xlsx.readByName(spark, Seq(s"$dir/m.xlsx"), "Nope").collect())
    assert(e.getMessage.contains("Summary") && e.getMessage.contains("Costs"),
      "the error must list the available sheet names")
  }

  test("xlsx: date-styled serial cells decode; all-date columns infer DATE/TIMESTAMP (VERDICT r11 #2)") {
    val dir = Files.createTempDirectory("graft-xlsx-date").toString
    // cellXf 0 = general, 1 = builtin date 14, 2 = custom date code
    val styles =
      """<styleSheet><numFmts count="1"><numFmt numFmtId="164" formatCode="yyyy\-mm\-dd hh:mm"/></numFmts>
        |<cellXfs count="3"><xf numFmtId="0"/><xf numFmtId="14"/><xf numFmtId="164"/></cellXfs>
        |</styleSheet>""".stripMargin
    // 45292 = 2024-01-01; 45292.5 = noon (1899-12-30 epoch)
    val sheet =
      """<worksheet><sheetData>
        |<row r="1"><c r="A1" t="inlineStr"><is><t>day</t></is></c><c r="B1" t="inlineStr"><is><t>at</t></is></c><c r="C1" t="inlineStr"><is><t>plain</t></is></c></row>
        |<row r="2"><c r="A2" s="1"><v>45292</v></c><c r="B2" s="2"><v>45292.5</v></c><c r="C2"><v>45292</v></c></row>
        |<row r="3"><c r="A3" s="1"><v>45323</v></c><c r="B3" s="2"><v>45323.25</v></c><c r="C3"><v>7</v></c></row>
        |</sheetData></worksheet>""".stripMargin
    writeWorkbook2(s"$dir/d.xlsx", styles, Seq("S" -> sheet))
    val df = graft.ops.Xlsx.read(spark, Seq(s"$dir/d.xlsx"))
    assert(df.schema("day").dataType.typeName === "date",
      "all-date column with no time-of-day must infer DATE")
    assert(df.schema("at").dataType.typeName === "timestamp",
      "custom y/m/d format code must register as a date style")
    assert(df.schema("plain").dataType.typeName === "long",
      "unstyled serial stays a number — style drives the decode")
    val rows = df.orderBy("day").collect()
    assert(rows(0).getDate(0).toString === "2024-01-01")
    assert(rows(0).getTimestamp(1).toString.startsWith("2024-01-01 12:00:00"))
    assert(rows(1).getDate(0).toString === "2024-02-01")
    assert(rows(1).getTimestamp(1).toString.startsWith("2024-02-01 06:00:00"))
  }

  test("xlsx: <workbookPr date1904/> decodes serials against the Mac epoch (VERDICT r12 #5)") {
    val dir = Files.createTempDirectory("graft-xlsx-1904").toString
    val styles =
      """<styleSheet><cellXfs count="2"><xf numFmtId="0"/><xf numFmtId="14"/></cellXfs>
        |</styleSheet>""".stripMargin
    // 1904-epoch serials sit 1,462 days below 1900-epoch ones:
    // 45292 - 1462 = 43830 = 2024-01-01 under date1904
    val sheet =
      """<worksheet><sheetData>
        |<row r="1"><c r="A1" t="inlineStr"><is><t>day</t></is></c></row>
        |<row r="2"><c r="A2" s="1"><v>43830</v></c></row>
        |</sheetData></worksheet>""".stripMargin
    writeWorkbook2(s"$dir/mac.xlsx", styles, Seq("S" -> sheet),
      workbookPr = """<workbookPr date1904="1"/>""")
    val mac = graft.ops.Xlsx.read(spark, Seq(s"$dir/mac.xlsx"))
    assert(mac.head.getDate(0).toString === "2024-01-01",
      "date1904 workbook must decode against the 1904-01-01 epoch")
    // the SAME serial without the flag is 1,462 days earlier (1900 epoch)
    writeWorkbook2(s"$dir/win.xlsx", styles, Seq("S" -> sheet))
    val win = graft.ops.Xlsx.read(spark, Seq(s"$dir/win.xlsx"))
    assert(win.head.getDate(0).toString === "2019-12-31")
    // date1904="false" and absent mean the same thing
    writeWorkbook2(s"$dir/win2.xlsx", styles, Seq("S" -> sheet),
      workbookPr = """<workbookPr date1904="false"/>""")
    assert(graft.ops.Xlsx.read(spark, Seq(s"$dir/win2.xlsx"))
      .head.getDate(0).toString === "2019-12-31")
  }

  test("xlsx: heterogeneous folder aligns by column NAME, pandas-concat style (ADVICE r11)") {
    val dir = Files.createTempDirectory("graft-xlsx-het").toString
    val shared = "<sst><si><t>id</t></si><si><t>v</t></si><si><t>extra</t></si></sst>"
    // file a: (id, v); file b: REVERSED order (v, id) plus a new column
    val sheetA =
      """<worksheet><sheetData>
        |<row r="1"><c r="A1" t="s"><v>0</v></c><c r="B1" t="s"><v>1</v></c></row>
        |<row r="2"><c r="A2"><v>1</v></c><c r="B2"><v>10</v></c></row>
        |</sheetData></worksheet>""".stripMargin
    val sheetB =
      """<worksheet><sheetData>
        |<row r="1"><c r="A1" t="s"><v>1</v></c><c r="B1" t="s"><v>0</v></c><c r="C1" t="s"><v>2</v></c></row>
        |<row r="2"><c r="A2"><v>20</v></c><c r="B2"><v>2</v></c><c r="C2"><v>99</v></c></row>
        |</sheetData></worksheet>""".stripMargin
    writeWorkbook(s"$dir/a.xlsx", shared, sheetA)
    writeWorkbook(s"$dir/b.xlsx", shared, sheetB)
    val df = graft.ops.Xlsx.read(spark, Seq(s"$dir/a.xlsx", s"$dir/b.xlsx"))
    // union header in first-seen order; b's rows align by NAME, not position
    assert(df.columns.toSeq === Seq("id", "v", "extra"))
    val byId = df.collect().map(r => r.getAs[Long]("id") -> r).toMap
    assert(byId(1L).getAs[Long]("v") === 10L)
    assert(byId(2L).getAs[Long]("v") === 20L, "reversed columns must not swap values")
    assert(byId(1L).isNullAt(byId(1L).fieldIndex("extra")), "missing column null-fills")
    assert(byId(2L).getAs[Long]("extra") === 99L)
  }

  test("xlsx: string-TYPED numeric-looking cells stay STRING — no leading-zero loss (ADVICE r11)") {
    val dir = Files.createTempDirectory("graft-xlsx-sku").toString
    val shared = "<sst><si><t>sku</t></si><si><t>n</t></si><si><t>007</t></si><si><t>042</t></si></sst>"
    val sheet =
      """<worksheet><sheetData>
        |<row r="1"><c r="A1" t="s"><v>0</v></c><c r="B1" t="s"><v>1</v></c></row>
        |<row r="2"><c r="A2" t="s"><v>2</v></c><c r="B2"><v>7</v></c></row>
        |<row r="3"><c r="A3" t="s"><v>3</v></c><c r="B3"><v>42</v></c></row>
        |</sheetData></worksheet>""".stripMargin
    writeWorkbook(s"$dir/s.xlsx", shared, sheet)
    val df = graft.ops.Xlsx.read(spark, Seq(s"$dir/s.xlsx"))
    assert(df.schema("sku").dataType.typeName === "string",
      "string-typed cells must never be retyped by their text")
    assert(df.schema("n").dataType.typeName === "long")
    assert(df.select("sku").collect().map(_.getString(0)).toSet === Set("007", "042"))
  }

  test("xlsx writer: TIMESTAMP/DATE columns round-trip through date-styled serials") {
    import graft.ops.Xlsx
    val dir = Files.createTempDirectory("graft-xlsx-wd").toString
    val df = Seq(
      (1L, java.sql.Timestamp.valueOf("2024-01-01 12:30:45"),
        java.sql.Date.valueOf("2024-02-01")),
      (2L, java.sql.Timestamp.valueOf("2023-06-15 00:00:00"),
        java.sql.Date.valueOf("2023-06-15")))
      .toDF("id", "at", "day")
    Xlsx.write(df, s"$dir/d.xlsx")
    val back = Xlsx.read(spark, Seq(s"$dir/d.xlsx"))
    assert(back.schema("at").dataType.typeName === "timestamp")
    assert(back.schema("day").dataType.typeName === "date")
    val byId = back.collect().map(r => r.getAs[Long]("id") -> r).toMap
    assert(byId(1L).getAs[java.sql.Timestamp]("at").toString
      .startsWith("2024-01-01 12:30:45"))
    assert(byId(1L).getAs[java.sql.Date]("day").toString === "2024-02-01")
    assert(byId(2L).getAs[java.sql.Date]("day").toString === "2023-06-15")
  }
}
