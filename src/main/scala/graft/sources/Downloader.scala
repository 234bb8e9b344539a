package graft.sources

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.file.{Files, Path, Paths}

/** Driver-side ingestion utility (SURVEY §2.1 S1/S2): fetch the
  * official K (results) / B (program) LZH archives with the same URL
  * scheme as the reference (main.py:33-41) and an idempotence cache
  * (main.py:61-66). Deliberately sequential with a politeness delay
  * (main.py:42,76 — the rate limit is per-origin, so this must NOT be
  * distributed across executors; parsing fans out, fetching does not).
  */
final class Downloader(
    cacheDir: Path,
    baseUrl: String = "http://www1.mbrace.or.jp/od2",
    politenessMillis: Long = 3000,
    client: HttpClient = HttpClient.newHttpClient()) {

  /** URL for a date's archive. kind is "K" (競走成績) or "B" (番組表).
    * date is ISO `yyyy-MM-dd`. Mirrors main.py:67-71:
    * `od2/{K|B}/YYYYMM/{k|b}YYMMDD.lzh`. */
  def archiveUrl(kind: String, date: String): String = {
    val Array(y, m, d) = date.split("-")
    s"$baseUrl/$kind/$y$m/${kind.toLowerCase}${y.substring(2)}$m$d.lzh"
  }

  /** Local cache path `{cacheDir}/{K|B}{date}.lzh` (main.py:62). */
  def cachePath(kind: String, date: String): Path =
    cacheDir.resolve(s"$kind$date.lzh")

  /** Fetch one archive unless already cached; returns the cache path.
    * Sleeps the politeness interval before every actual request. */
  def download(kind: String, date: String,
      checkExistence: Boolean = true): Path = {
    val target = cachePath(kind, date)
    if (checkExistence && Files.exists(target)) return target
    Thread.sleep(politenessMillis)
    val req = HttpRequest.newBuilder(URI.create(archiveUrl(kind, date))).build()
    val resp = client.send(req, HttpResponse.BodyHandlers.ofByteArray())
    if (resp.statusCode() != 200)
      throw new java.io.IOException(
        s"GET ${archiveUrl(kind, date)} -> ${resp.statusCode()}")
    Files.createDirectories(cacheDir)
    Files.write(target, resp.body())
    target
  }

  /** Fetch K+B for every date in the (inclusive) ISO date range —
    * the reference's month loop (main.py:270-275) generalized. */
  def downloadRange(from: String, to: String): Seq[Path] = {
    val start = java.time.LocalDate.parse(from)
    val end = java.time.LocalDate.parse(to)
    Iterator.iterate(start)(_.plusDays(1)).takeWhile(!_.isAfter(end))
      .flatMap(d => Seq(download("K", d.toString), download("B", d.toString)))
      .toSeq
  }
}

object Downloader {
  def apply(cacheDir: String): Downloader = new Downloader(Paths.get(cacheDir))
}
