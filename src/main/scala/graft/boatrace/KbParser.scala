package graft.boatrace

import java.nio.charset.Charset
import java.util.regex.Pattern

import scala.collection.immutable.VectorBuilder

/** Pure single-pass parser for the official boatrace K (競走成績) and
  * B (番組表) fixed-format CP932 text files.
  *
  * Semantics re-expressed from the reference's line-oriented state
  * machine (/root/reference/main.py:126-218, patterns
  * /root/reference/patterns.py:23-41) and verified against its golden
  * CSV corpus (odds/ byte-for-byte, table/ value-for-value — see
  * KbParserGoldenSpec). Unlike the reference, which scans each file
  * once per output table (4 passes), this parser emits all four tables
  * in ONE pass; the outputs are identical because no extraction
  * pattern matches a line belonging to a different table (asserted by
  * the golden suite).
  *
  * Fidelity notes (SURVEY §2.2-2.3):
  *  - All regexes run with UNICODE_CHARACTER_CLASS so `\s`/`\d`/`\D`
  *    match full-width whitespace (U+3000) and digits exactly like
  *    Python's `re` on `str` — the data mixes half- and full-width
  *    forms throughout.
  *  - Lines keep their trailing '\n' during matching: several patterns
  *    (e.g. venue `ボートレース(\D+)\s`) rely on the newline as their
  *    trailing whitespace.
  *  - Section header handling consumes 4 lines (race/meet name is 2
  *    below, venue 4 below); those consumed lines are never pattern-
  *    checked — and the 4th (venue) line IS still checked for the
  *    race counter and row patterns, mirroring the reference's
  *    mutation of its loop variable.
  *  - The payout block is an ordered 10-pattern walk that advances one
  *    line per bet type except after 複勝1 (place-1/place-2 share one
  *    line); any non-matching pattern yields "-1" but the walk still
  *    advances. A レース不成立 (void race) line yields an all-"-1" row
  *    and consumes nothing.
  */
object KbParser {

  private val U = Pattern.UNICODE_CHARACTER_CLASS

  // Section header: exactly 28 leading whitespace + ＊＊＊　競走成績/番組表　＊＊＊
  // (patterns.py:23). Anchored prefix match.
  private val Header =
    Pattern.compile("^\\s{28}＊＊＊　競走成績　＊＊＊|^\\s{28}＊＊＊　番組表　＊＊＊", U)
  // Race/meet name: first non-whitespace run after exactly 10 spaces,
  // 2 lines below the header (patterns.py:24). Anchored prefix match.
  private val RaceName = Pattern.compile("\\s{10}([^\\s]+)", U)
  // Venue: ボートレース(\D+)\s, 4 lines below the header (patterns.py:25).
  private val RacePlace = Pattern.compile("ボートレース(\\D+)\\s", U)
  // Race counter: H\d+m (K files, half-width) or Ｈ…ｍ (B files,
  // full-width) — main.py:158.
  private val RaceRound = Pattern.compile("H\\d+m|Ｈ[^ｍ]+ｍ", U)
  // Per-race condition line (patterns.py:26).
  private val Env =
    Pattern.compile("m\\s+([^　]+)\\s+風\\s+([^　]+)\\s+(\\d+)m\\s+波\\s+(\\d+)cm", U)
  // Program line: lane, reg no, name, age, branch, weight, class, 4
  // rate columns, then motor/boat number-and-rate pairs where only the
  // rates are captured (patterns.py:27; motor/boat numbers deliberately
  // uncaptured per patterns.py:5-9).
  private val Schedule = Pattern.compile(
    "^([1-6])\\s(\\d{4})(\\D+)(\\d{2})(\\D+)(\\d{2})([AB][12])\\s+(\\d+.\\d{2})\\s+(\\d+.\\d{2})\\s+(\\d+.\\d{2})\\s+(\\d+.\\d{2})\\s+\\d+\\s+(\\d+.\\d{2})\\s+\\d+\\s+(\\d+.\\d{2})", U)
  // Finisher line: rank prints as 0\d (01..06) — disqualified/flying/
  // late boats (S0/F/L…) never match and are silently dropped
  // (patterns.py:21,28).
  private val Result = Pattern.compile(
    "\\s+0(\\d)\\s+\\d\\s+(\\d{4})\\s+\\D+\\s\\d+\\s+\\d+\\s+(\\d+.\\d{2})", U)
  // Payout block trigger (patterns.py:29).
  private val OddsTrigger = Pattern.compile("\\s+単勝|\\s+レース不成立", U)
  // Ordered payout walk (patterns.py:30-41). Indices 6-7 (拡連複13/23)
  // are generic `\d-\d` matchers relying purely on line order.
  private val OddsWalk: Array[Pattern] = Array(
    "\\s+単勝\\s+\\d\\s+(\\d+)",
    "\\s+複勝\\s+\\d\\s+(\\d+)",
    "\\s+複勝\\s+\\d\\s+\\d+\\s+\\d\\s+(\\d+)",
    "\\s+２連単\\s+\\d-\\d\\s+(\\d+)",
    "\\s+２連複\\s+\\d-\\d\\s+(\\d+)",
    "\\s+拡連複\\s+\\d-\\d\\s+(\\d+)",
    "\\s+\\d-\\d\\s+(\\d+)",
    "\\s+\\d-\\d\\s+(\\d+)",
    "\\s+３連単\\s+\\d-\\d-\\d\\s+(\\d+)",
    "\\s+３連複\\s+\\d-\\d-\\d\\s+(\\d+)\\s+人気\\s+\\d+",
  ).map(Pattern.compile(_, U))

  private val Cp932: Charset = Charset.forName("windows-31j")

  /** Decode CP932 bytes and split into lines that keep their trailing
    * '\n' (universal-newline normalization first, like Python text
    * mode). */
  def decodeLines(bytes: Array[Byte]): Array[String] = {
    val text = new String(bytes, Cp932).replace("\r\n", "\n").replace('\r', '\n')
    val out = Array.newBuilder[String]
    var start = 0
    var i = 0
    while (i < text.length) {
      if (text.charAt(i) == '\n') { out += text.substring(start, i + 1); start = i + 1 }
      i += 1
    }
    if (start < text.length) out += text.substring(start)
    out.result()
  }

  /** Derive the reference's date string ("2020-08-01") from an
    * official file name like K200801.TXT / b200801 (main.py:69-70
    * builds file names from the date; we invert it). */
  def dateFromFileName(fileName: String): String = {
    val digits = fileName.dropWhile(!_.isDigit).takeWhile(_.isDigit)
    require(digits.length == 6, s"unexpected boatrace file name: $fileName")
    s"20${digits.substring(0, 2)}-${digits.substring(2, 4)}-${digits.substring(4, 6)}"
  }

  def parseBytes(date: String, bytes: Array[Byte]): ParsedTables =
    parse(date, decodeLines(bytes))

  /** One pass over the file: section-state tracking (P1-P4 of SURVEY
    * §2.2) + row extraction for all four tables (P5, O1-O5). */
  def parse(date: String, lines: Array[String]): ParsedTables = {
    val results = new VectorBuilder[ResultRow]
    val envs = new VectorBuilder[EnvRow]
    val odds = new VectorBuilder[OddsRow]
    val schedules = new VectorBuilder[ScheduleRow]

    var raceName = ""
    var racePlace = ""
    var raceNum = 0
    def raceId = s"$date$racePlace$raceName${raceNum}R"
    def lineAt(j: Int): String = if (j < lines.length) lines(j) else ""

    var i = 0
    while (i < lines.length) {
      var line = lines(i)

      if (Header.matcher(line).lookingAt()) {
        // Name is 2 lines below, venue 4 below; both consumed. The
        // reference then falls through with the venue line as its
        // current line, so counter/row checks below see lineAt(i+4).
        val nameM = RaceName.matcher(lineAt(i + 2))
        if (nameM.lookingAt()) raceName = nameM.group(1)
        val placeM = RacePlace.matcher(lineAt(i + 4))
        if (placeM.find()) racePlace = placeM.group(1)
        raceNum = 0
        i += 4
        line = lineAt(i)
      }

      if (RaceRound.matcher(line).find()) raceNum += 1

      // K tables: finisher rows and per-race environment rows can share
      // a line with the counter (the race title line carries the env).
      val rm = Result.matcher(line)
      if (rm.find())
        results += ResultRow(raceId, rm.group(1), rm.group(2), rm.group(3))
      val em = Env.matcher(line)
      if (em.find())
        envs += EnvRow(raceId, em.group(1), em.group(2), em.group(3),
          em.group(4), racePlace)

      // B table.
      val sm = Schedule.matcher(line)
      if (sm.find())
        schedules += ScheduleRow(raceId, sm.group(1), sm.group(2), sm.group(3),
          sm.group(4), sm.group(5), sm.group(6), sm.group(7), sm.group(8),
          sm.group(9), sm.group(10), sm.group(11), sm.group(12), sm.group(13))

      // Payout block (O1-O5).
      if (OddsTrigger.matcher(line).find()) {
        if (line.contains("レース不成立")) {
          // ≥5 rule violations void the whole race (main.py:168-170).
          val v = Vector.fill(10)("-1")
          odds += OddsRow(raceId, v(0), v(1), v(2), v(3), v(4), v(5), v(6),
            v(7), v(8), v(9))
        } else {
          var cur = i
          val vals = new Array[String](10)
          var k = 0
          while (k < 10) {
            val m = OddsWalk(k).matcher(lineAt(cur))
            vals(k) = if (m.lookingAt()) m.group(1) else "-1"
            // 複勝1/複勝2 share one line: don't advance after index 1.
            if (k != 1) cur += 1
            k += 1
          }
          odds += OddsRow(raceId, vals(0), vals(1), vals(2), vals(3), vals(4),
            vals(5), vals(6), vals(7), vals(8), vals(9))
          // The reference's last readline consumed line `cur` without
          // examining it; resume scanning at cur+1 (i += 1 below).
          i = cur
        }
      }

      i += 1
    }

    ParsedTables(results.result(), envs.result(), odds.result(),
      schedules.result())
  }
}
