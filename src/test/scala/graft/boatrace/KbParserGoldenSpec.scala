package graft.boatrace

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

/** Differential suite against the reference's committed golden corpus
  * (/root/reference, read-only): all 31 August-2020 dates have both
  * the CP932 inputs (txt/) and the expected outputs (odds/, table/).
  * SURVEY §5 verified the goldens are deterministic reproductions of
  * the inputs, so byte/value parity here proves parser parity.
  */
class KbParserGoldenSpec extends AnyFunSuite {

  private val ref = "/root/reference"
  private val augustDates: Seq[String] =
    (1 to 31).map(d => f"2020-08-$d%02d")

  private def kFile(date: String) =
    Paths.get(s"$ref/txt/K${date.substring(2).replace("-", "")}.TXT")
  private def bFile(date: String) =
    Paths.get(s"$ref/txt/B${date.substring(2).replace("-", "")}.TXT")

  private def parseK(date: String): ParsedTables =
    KbParser.parseBytes(date, Files.readAllBytes(kFile(date)))
  private def parseB(date: String): ParsedTables =
    KbParser.parseBytes(date, Files.readAllBytes(bFile(date)))

  test("odds CSV is byte-identical to all 31 August goldens") {
    augustDates.foreach { date =>
      val got = GoldenCsv.oddsCsv(parseK(date).odds)
      val want = Files.readAllBytes(Paths.get(s"$ref/odds/$date.csv"))
      assert(got.sameElements(want), s"odds byte mismatch for $date")
    }
  }

  test("date derivation from official file names") {
    assert(KbParser.dateFromFileName("K200801.TXT") === "2020-08-01")
    assert(KbParser.dateFromFileName("B201231.TXT") === "2020-12-31")
  }

  test("void race 不成立 → all -1 odds (K200812/K200814 corpus edge)") {
    val rows = parseK("2020-08-12").odds ++ parseK("2020-08-14").odds
    assert(rows.exists(_.values.forall(_ == "-1")))
  }

  test("特払い refund and partial void → -1 sentinels (K200813)") {
    val o = parseK("2020-08-13").odds
    // 徳山 6R: only 2 finishers → wide13/23, trifecta, trio all void.
    val tok6 = o.filter(r => r.raceId.contains("徳　山")
      && r.raceId.endsWith("6R") && !r.raceId.endsWith("16R"))
    assert(tok6.nonEmpty && tok6.forall(r =>
      r.wide13 == "-1" && r.wide23 == "-1" && r.trifecta == "-1" && r.trio == "-1"))
    // 琵琶湖 8R: 単勝 特払い 70 refund → win undetected.
    assert(o.exists(r => r.raceId.contains("琵琶湖") && r.win == "-1"))
    // 江戸川 7R: missing 複勝2 → -1.
    assert(o.exists(r => r.raceId.contains("江戸川") && r.place2 == "-1"))
  }

  test("cancelled 中止 races are silently absent (K200813 戸田 → 10 rows)") {
    val toda = parseK("2020-08-13").odds.filter(_.raceId.contains("戸　田"))
    assert(toda.size === 10)
  }

  test("non-finishers are dropped by the rank pattern (徳山 6R → 2 results)") {
    val rows = parseK("2020-08-13").results
      .filter(r => r.raceId.contains("徳　山")
        && r.raceId.endsWith("6R") && !r.raceId.endsWith("16R"))
    assert(rows.map(_.rank).sorted === Vector("1", "2"))
  }

  test("env: one row per non-cancelled race; venue carries U+3000") {
    val t = parseK("2020-08-01")
    assert(t.envs.size === t.odds.size)
    assert(t.envs.exists(_.venue == "大　村"))
  }

  test("schedule parse: 6 boats per race on a clean date") {
    val b = parseB("2020-08-01").schedules
    assert(b.nonEmpty)
    val perRace = b.groupBy(_.raceId).values.map(_.size)
    assert(perRace.forall(n => n >= 3 && n <= 6))
    assert(b.forall(_.playerId.matches("\\d{4}")))
  }

  test("single-pass K parse emits no schedule rows and vice versa") {
    assert(parseK("2020-08-01").schedules.isEmpty)
    val b = parseB("2020-08-01")
    assert(b.results.isEmpty && b.envs.isEmpty && b.odds.isEmpty)
  }
}
