package graft.boatrace

/** Row types for the four relational tables the reference extracts
  * from the official K (競走成績 race results) and B (番組表 program)
  * text files — schemas from /root/reference/main.py:104-108.
  *
  * Values are kept as raw strings at this layer (the reference's
  * storage typing, SURVEY §1.3: everything is parsed as strings and
  * typed downstream). `BoatracePipeline` exposes the typed/decomposed
  * view used for partitioning and queries.
  */
final case class ResultRow(
    raceId: String,     // レースID
    rank: String,       // 順位 (1-6; non-finishers never produce a row)
    playerId: String,   // 選手登番
    exhibition: String) // 展示

final case class EnvRow(
    raceId: String,     // レースID
    weather: String,    // 天候
    windDir: String,    // 風向 (無風 = calm)
    windSpeed: String,  // 風速 (m)
    waveHeight: String, // 波高 (cm)
    venue: String)      // 会場 (may contain U+3000, e.g. 大　村)

/** Payouts in yen per ¥100 ticket; "-1" = void / undetected
  * (/root/reference/main.py:170,180). */
final case class OddsRow(
    raceId: String,
    win: String,        // 単勝
    place1: String,     // 複勝1
    place2: String,     // 複勝2
    exacta: String,     // 2連単
    quinella: String,   // 2連複
    wide12: String,     // 拡連複12
    wide13: String,     // 拡連複13
    wide23: String,     // 拡連複23
    trifecta: String,   // 3連単
    trio: String) {     // 3連複
  def values: Seq[String] =
    Seq(win, place1, place2, exacta, quinella, wide12, wide13, wide23,
      trifecta, trio)
}

final case class ScheduleRow(
    raceId: String,
    lane: String,       // 艇番 1-6
    playerId: String,   // 選手登番
    name: String,       // 名前
    age: String,        // 年齢
    branch: String,     // 支部
    weight: String,     // 体重
    rank: String,       // 階級 A1/A2/B1/B2
    nationalWin: String,   // 全国勝率
    nationalTop2: String,  // 全国2率
    localWin: String,      // 当地勝率
    localTop2: String,     // 当地2率
    motorTop2: String,     // モーター2率
    boatTop2: String)      // ボート2率

/** All tables produced by one parsed file. K files populate results /
  * envs / odds; B files populate schedules. */
final case class ParsedTables(
    results: Vector[ResultRow],
    envs: Vector[EnvRow],
    odds: Vector[OddsRow],
    schedules: Vector[ScheduleRow])

object ParsedTables {
  val empty: ParsedTables =
    ParsedTables(Vector.empty, Vector.empty, Vector.empty, Vector.empty)
}
