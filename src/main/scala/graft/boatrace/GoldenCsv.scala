package graft.boatrace

/** Byte-parity CSV rendering of parsed tables, matching the
  * reference's csv.writer output (UTF-8, CRLF row terminator, minimal
  * quoting — /root/reference/main.py:228-238). Used by the golden
  * differential suite; the production sink is Parquet
  * (BoatracePipeline).
  */
object GoldenCsv {

  val OddsHeader: Seq[String] = Seq("レースID", "単勝", "複勝1", "複勝2",
    "2連単", "2連複", "拡連複12", "拡連複13", "拡連複23", "3連単", "3連複")

  val ResultHeader: Seq[String] = Seq("レースID", "順位", "選手登番", "展示")

  val EnvHeader: Seq[String] = Seq("レースID", "天候", "風向", "風速", "波高", "会場")

  val ScheduleHeader: Seq[String] = Seq("レースID", "艇番", "選手登番", "名前",
    "年齢", "支部", "体重", "階級", "全国勝率", "全国2率", "当地勝率", "当地2率",
    "モーター2率", "ボート2率")

  private def render(header: Seq[String], rows: Iterable[Seq[String]]): Array[Byte] = {
    val sb = new StringBuilder
    sb.append(header.mkString(",")).append("\r\n")
    rows.foreach(r => sb.append(r.mkString(",")).append("\r\n"))
    sb.toString.getBytes("UTF-8")
  }

  def oddsCsv(rows: Iterable[OddsRow]): Array[Byte] =
    render(OddsHeader, rows.map(r => r.raceId +: r.values))
}
