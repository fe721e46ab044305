package graft.ingest

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

/** Declared multi-source ingest settings for the TRANSCRIPT pipeline —
  * the config surface behind `RollupMain --source settings:<json>`, the
  * analogue of the reference's whole orchestration entry
  * (`Main.java:36-60`: load config, validate, then run every declared
  * `CsvSettings` with per-setting status rows).
  *
  * JSON shape (flat objects, engine-owned — no external parser deps,
  * same hand-rolled approach as the SnapshotTable manifest):
  *
  * {{{
  * {"settings": [
  *   {"paths": ["/data/a.csv"], "delimiter": ",", "quote": "\"",
  *    "tsFormat": "ISO"},
  *   {"paths": ["/data/b.csv"], "tsFormat": "UNIX"},
  *   {"paths": ["/data/c.csv"], "tsFormat": "CUSTOM",
  *    "pattern": "dd/MM/yyyy HH:mm", "zone": "Europe/Paris"}
  * ]}
  * }}}
  *
  * Validation split mirrors the engine's two failure planes: SHAPE
  * errors (no settings, a setting without paths, unknown tsFormat,
  * CUSTOM without pattern) fail the whole load fail-fast, like
  * [[ConfigValidator]]; RUNTIME errors (missing file, malformed rows)
  * surface later as per-setting FAILED status without aborting the
  * other settings — the reference isolates per-setting failures the
  * same way (`Main.java:51-60` catches per-setting).
  */
object TranscriptSettings {

  final case class Setting(
      paths: Seq[String],
      delimiter: String = ",",
      quote: String = "\"",
      tsFormat: CsvSource.TsFormat = CsvSource.Iso) {
    def options: CsvSource.Options =
      CsvSource.Options(delimiter, quote, tsFormat)
  }

  def load(path: String): Seq[Setting] =
    parse(new String(Files.readAllBytes(Paths.get(path)), StandardCharsets.UTF_8))

  private def fail(msg: String): Nothing = throw new IllegalArgumentException(msg)

  private[graft] def parse(json: String): Seq[Setting] = {
    val arr = """"settings"\s*:\s*\[([\s\S]*)\]""".r.findFirstMatchIn(json)
      .getOrElse(fail("settings json: missing \"settings\" array"))
      .group(1)
    // setting objects are flat (no nested braces), so brace matching is
    // a simple non-greedy scan
    val objs = """\{[^{}]*\}""".r.findAllIn(arr).toSeq
    if (objs.isEmpty) fail("settings json: empty \"settings\" array")
    objs.map { obj =>
      def strField(name: String): Option[String] =
        (s""""$name"\\s*:\\s*"((?:[^"\\\\]|\\\\.)*)"""").r
          .findFirstMatchIn(obj).map(m => unesc(m.group(1)))
      val paths = s""""paths"\\s*:\\s*\\[([^\\]]*)\\]""".r.findFirstMatchIn(obj)
        .map(m => """"((?:[^"\\]|\\.)*)"""".r.findAllMatchIn(m.group(1))
          .map(g => unesc(g.group(1))).toSeq)
        .getOrElse(Seq.empty)
      if (paths.isEmpty) fail("settings json: each setting needs a non-empty \"paths\" array")
      val fmt = strField("tsFormat").getOrElse("ISO") match {
        case "ISO" => CsvSource.Iso
        case "UNIX" => CsvSource.Unix
        case "CUSTOM" => CsvSource.Custom(
          strField("pattern").getOrElse(
            fail("settings json: CUSTOM tsFormat needs a \"pattern\"")),
          strField("zone").getOrElse("UTC"))
        case other => fail(s"settings json: unknown tsFormat '$other' (ISO|UNIX|CUSTOM)")
      }
      Setting(paths, strField("delimiter").getOrElse(","),
        strField("quote").getOrElse("\""), fmt)
    }
  }

  private def unesc(s: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        // full JSON escape set — this file is USER-written json (unlike
        // the engine-written manifests, whose escaper only ever emits
        // \" \\ \n \uXXXX): a TSV setting declares {"delimiter": "\t"},
        // and dropping the backslash would split rows on the letter 't'
        s.charAt(i + 1) match {
          case '"' => sb += '"'; i += 2
          case '\\' => sb += '\\'; i += 2
          case '/' => sb += '/'; i += 2
          case 'n' => sb += '\n'; i += 2
          case 't' => sb += '\t'; i += 2
          case 'r' => sb += '\r'; i += 2
          case 'b' => sb += '\b'; i += 2
          case 'f' => sb += '\f'; i += 2
          case 'u' =>
            // validate before parsing: a truncated or non-hex (or
            // signed — parseInt accepts '-') sequence must be the same
            // pointed settings-json error as every other bad escape
            if (i + 6 > s.length ||
                !s.substring(i + 2, i + 6).forall(c =>
                  ('0' to '9').contains(c) || ('a' to 'f').contains(c) ||
                  ('A' to 'F').contains(c)))
              fail(s"settings json: bad \\u escape near '${s.substring(i)}'")
            sb += Integer.parseInt(s.substring(i + 2, i + 6), 16).toChar; i += 6
          case other => fail(s"settings json: unknown escape '\\$other'")
        }
      } else { sb += c; i += 1 }
    }
    sb.toString
  }
}
