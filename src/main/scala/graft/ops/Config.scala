package graft.ops

import org.apache.spark.sql.SparkSession

/** S5: the reference's INI config round-trip, re-expressed for a Spark
  * session.
  *
  * The reference persists its settings in `config.ini` (reference
  * /root/reference/main.py:643-686 reads it at startup; :370-374 and
  * :625-641 WRITE it back when the GUI mutates threshold/multithreading),
  * with three sections — [multithreading], [pre_browse] (search_file /
  * data_folder paths), [settings] (out_1, out_2, column_index1/2,
  * threshold). The port previously parameterized everything through
  * harness args/Spark conf and had no persistence; this closes that gap:
  *
  *   - [[parse]]/[[render]]: a configparser-compatible INI subset
  *     (sections, `key = value`, `;`/`#` comments, blank lines).
  *     Round-tripping DROPS comments — exactly what the reference's own
  *     `config.write` does, so that lossiness is faithful, not a bug.
  *   - [[Settings]]: the typed view with the reference's exact
  *     conventions — booleans are the literal string "True"
  *     (main.py:650, 663, 668), empty path strings mean "unset"
  *     (main.py:655-661), ints parse strictly.
  *   - [[applyToSession]]/[[sessionSettings]]: the Spark bridge — every
  *     setting lands on `spark.graft.*` conf keys, so the engine's
  *     operators (threshold, out_1/out_2 gates, [[Materialize]] mode)
  *     read ONE source of truth per session and a driver can persist the
  *     session state back to INI for the next run.
  *
  * Documented reference bug NOT reproduced: main.py:658-661 assigns
  * `search_file = None` when DATA_FOLDER is empty (a copy-paste slip that
  * clears the wrong variable); the intended behavior — each empty path
  * clears itself — is what [[Settings.fromIni]] implements (the F4
  * regex-bug precedent: implement the intent, document the deviation).
  *
  * Scale note: config is driver-side metadata (one tiny file via the
  * Hadoop FS API, so the same code reads file:// local runs and an
  * object store on a cluster); nothing here touches executors.
  */
object Config {

  /** Order-preserving INI document: sections of key-value pairs. */
  final case class Ini(sections: Vector[(String, Vector[(String, String)])]) {
    def get(section: String, key: String): Option[String] =
      sections.collectFirst { case (s, kvs) if s == section =>
        kvs.collectFirst { case (k, v) if k == key => v }
      }.flatten
    /** configparser.set semantics: update in place, append if absent
      * (section created at the end if absent). */
    def set(section: String, key: String, value: String): Ini = {
      val si = sections.indexWhere(_._1 == section)
      if (si < 0) Ini(sections :+ (section -> Vector(key -> value)))
      else {
        val (name, kvs) = sections(si)
        val ki = kvs.indexWhere(_._1 == key)
        val updated =
          if (ki < 0) kvs :+ (key -> value) else kvs.updated(ki, key -> value)
        Ini(sections.updated(si, name -> updated))
      }
    }
  }

  /** Parse the configparser subset the reference uses. Unknown lines
    * (neither section, comment, blank, nor `k = v` / `k : v`) fail
    * loudly — a silently-skipped setting is the worst failure mode a
    * config reader can have. */
  def parse(text: String): Ini = {
    var sections = Vector.empty[(String, Vector[(String, String)])]
    var current: Option[(String, Vector[(String, String)])] = None
    def flush(): Unit = current.foreach { s => sections :+= s; current = None }
    for ((line0, i) <- text.linesIterator.zipWithIndex) {
      val line = line0.trim
      if (line.isEmpty || line.startsWith(";") || line.startsWith("#")) ()
      else if (line.startsWith("[") && line.endsWith("]")) {
        flush(); current = Some(line.substring(1, line.length - 1).trim -> Vector.empty)
      } else {
        val eq = line.indexWhere(c => c == '=' || c == ':')
        require(eq > 0, s"config line ${i + 1} is not 'key = value': $line0")
        val (k, v) = (line.substring(0, eq).trim, line.substring(eq + 1).trim)
        current match {
          case Some((name, kvs)) => current = Some(name -> (kvs :+ (k -> v)))
          case None => throw new IllegalArgumentException(
            s"config line ${i + 1} sets '$k' before any [section]")
        }
      }
    }
    flush()
    Ini(sections)
  }

  /** configparser.write layout: `[section]`, `key = value`, one blank
    * line between sections. Comments are dropped — the reference's own
    * writes do the same. */
  def render(ini: Ini): String =
    ini.sections.map { case (name, kvs) =>
      (s"[$name]" +: kvs.map { case (k, v) => s"$k = $v" }).mkString("\n")
    }.mkString("", "\n\n", "\n")

  def load(spark: SparkSession, path: String): Ini = {
    val p = new org.apache.hadoop.fs.Path(path)
    val in = p.getFileSystem(spark.sparkContext.hadoopConfiguration).open(p)
    try parse(new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8))
    finally in.close()
  }

  def save(spark: SparkSession, path: String, ini: Ini): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    val out = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .create(p, /* overwrite = */ true)
    try out.write(render(ini).getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  /** The reference's settings surface, typed. Defaults mirror its
    * fallbacks (empty string -> None; missing boolean -> false — only
    * the literal "True" enables, main.py:650). */
  final case class Settings(multithreading: Boolean,
                            searchFile: Option[String],
                            dataFolder: Option[String],
                            out1: Boolean, out2: Boolean,
                            columnIndex1: Int, columnIndex2: Int,
                            threshold: Int) {
    /** config.set round-trip: write every field back onto `ini`,
      * preserving section/key order for untouched entries. */
    def toIni(ini: Ini): Ini = ini
      .set("multithreading", "multithreading",
        if (multithreading) "True" else "False")
      .set("pre_browse", "search_file", searchFile.getOrElse(""))
      .set("pre_browse", "data_folder", dataFolder.getOrElse(""))
      .set("settings", "out_1", if (out1) "True" else "False")
      .set("settings", "out_2", if (out2) "True" else "False")
      .set("settings", "column_index1", columnIndex1.toString)
      .set("settings", "column_index2", columnIndex2.toString)
      .set("settings", "threshold", threshold.toString)
  }

  object Settings {
    private def bool(ini: Ini, s: String, k: String) =
      ini.get(s, k).contains("True") // the reference's exact comparison
    private def int(ini: Ini, s: String, k: String) =
      ini.get(s, k).map(v => v.trim.toIntOption.getOrElse(
        throw new IllegalArgumentException(s"[$s] $k is not an int: '$v'")))
        .getOrElse(0)
    private def path(ini: Ini, s: String, k: String) =
      ini.get(s, k).filter(_.nonEmpty)
    def fromIni(ini: Ini): Settings = Settings(
      multithreading = bool(ini, "multithreading", "multithreading"),
      searchFile = path(ini, "pre_browse", "search_file"),
      dataFolder = path(ini, "pre_browse", "data_folder"),
      out1 = bool(ini, "settings", "out_1"),
      out2 = bool(ini, "settings", "out_2"),
      columnIndex1 = int(ini, "settings", "column_index1"),
      columnIndex2 = int(ini, "settings", "column_index2"),
      threshold = int(ini, "settings", "threshold"))
  }

  // the Spark-session bridge: one conf key per setting
  val Prefix = "spark.graft.config."

  def applyToSession(spark: SparkSession, s: Settings): Unit = {
    spark.conf.set(Prefix + "multithreading", s.multithreading.toString)
    spark.conf.set(Prefix + "searchFile", s.searchFile.getOrElse(""))
    spark.conf.set(Prefix + "dataFolder", s.dataFolder.getOrElse(""))
    spark.conf.set(Prefix + "out1", s.out1.toString)
    spark.conf.set(Prefix + "out2", s.out2.toString)
    spark.conf.set(Prefix + "columnIndex1", s.columnIndex1.toString)
    spark.conf.set(Prefix + "columnIndex2", s.columnIndex2.toString)
    spark.conf.set(Prefix + "threshold", s.threshold.toString)
  }

  def sessionSettings(spark: SparkSession): Settings = Settings(
    multithreading = spark.conf.get(Prefix + "multithreading", "false").toBoolean,
    searchFile = Option(spark.conf.get(Prefix + "searchFile", "")).filter(_.nonEmpty),
    dataFolder = Option(spark.conf.get(Prefix + "dataFolder", "")).filter(_.nonEmpty),
    out1 = spark.conf.get(Prefix + "out1", "false").toBoolean,
    out2 = spark.conf.get(Prefix + "out2", "false").toBoolean,
    columnIndex1 = spark.conf.get(Prefix + "columnIndex1", "0").toInt,
    columnIndex2 = spark.conf.get(Prefix + "columnIndex2", "0").toInt,
    threshold = spark.conf.get(Prefix + "threshold", "0").toInt)
}
