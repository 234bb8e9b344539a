package graft.sources

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

/** Differential golden test for the lh5 decoder: every August-2020
  * archive in the reference corpus must decompress to exactly the
  * bytes of its committed extracted TXT. */
class LhaSpec extends AnyFunSuite {

  private val lzhDir = Paths.get("/root/reference/lzh")
  private val txtDir = Paths.get("/root/reference/txt")

  test("every 2020-08 K/B archive decodes byte-identically to txt/ goldens") {
    val archives = Files.list(lzhDir).toArray.map(_.toString)
      .filter(p => p.contains("2020-08"))
      .sorted
    assert(archives.length === 62) // 31 days × (K + B)
    var checked = 0
    for (a <- archives) {
      // extract() verifies the per-entry CRC16, so decompression
      // correctness holds independent of the golden comparison.
      val entries = Lha.extract(Files.readAllBytes(Paths.get(a)))
      assert(entries.nonEmpty, s"$a: no entries")
      for (e <- entries) {
        val golden = txtDir.resolve(e.name)
        assert(Files.exists(golden), s"$a: unexpected entry ${e.name}")
        // goldens are git-LF-normalized; raw archive content is CRLF
        val normalized = Lha.normalizeNewlines(e.data)
        val expected = Files.readAllBytes(golden)
        assert(normalized.length === expected.length,
          s"$a/${e.name}: size ${normalized.length} != ${expected.length}")
        assert(java.util.Arrays.equals(normalized, expected),
          s"$a/${e.name}: content mismatch")
        checked += 1
      }
    }
    assert(checked === 62)
  }

  test("decoder rejects unknown methods instead of corrupting output") {
    val fake = new Array[Byte](64)
    fake(0) = 33
    System.arraycopy("-lz9-".getBytes("ASCII"), 0, fake, 2, 5)
    assertThrows[UnsupportedOperationException](Lha.extract(fake))
  }
}
