package graft.sources

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

/** Network-free checks of the ingestion utility: URL scheme parity
  * with the reference (main.py:33-41) and cache idempotence
  * (main.py:61-66). The actual fetch path is exercised only when the
  * origin is reachable (never in this offline environment). */
class DownloaderSpec extends AnyFunSuite {

  test("archive URLs match the reference scheme") {
    val d = Downloader("/tmp/lzh-cache-test")
    assert(d.archiveUrl("K", "2020-08-01") ===
      "http://www1.mbrace.or.jp/od2/K/202008/k200801.lzh")
    assert(d.archiveUrl("B", "2020-12-31") ===
      "http://www1.mbrace.or.jp/od2/B/202012/b201231.lzh")
  }

  test("cached archives are returned without touching the network") {
    val dir = Files.createTempDirectory("lzh-cache")
    val d = new Downloader(dir, politenessMillis = 0)
    val target = d.cachePath("K", "2020-08-01")
    Files.write(target, Array[Byte](1, 2, 3))
    // offline: would throw on any real request; the cache hit must not
    assert(d.download("K", "2020-08-01") === target)
  }
}
