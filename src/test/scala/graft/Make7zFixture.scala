package graft

import java.io.File
import java.nio.file.{Files, Paths}

import org.apache.commons.compress.archivers.sevenz.SevenZOutputFile

/** Regenerates the committed `src/test/resources/graft/fixtures/mini.7z`
  * — a two-game Lumbras-shaped PGN tree (nested dir + a bare directory
  * entry) in the reference's actual archive container (dvc.yaml:19
  * extracts `.7z` with `7z x`). LZMA2 via commons-compress +
  * XZ-for-Java, the same public codecs the extractor reads with. Run
  * `sbt "Test/runMain graft.Make7zFixture"` if the layout ever needs to
  * change; the fixture is committed so ArchiveStagesSpec exercises the
  * read path against stable known-good bytes.
  */
object Make7zFixture {
  def main(args: Array[String]): Unit = {
    val out = Paths.get("src/test/resources/graft/fixtures/mini.7z")
    Files.createDirectories(out.getParent)
    val pgn1 =
      """[Event "Mini Open"]
        |[Site "Somewhere"]
        |[White "Alpha"]
        |[Black "Beta"]
        |[Result "1-0"]
        |[UTCDate "2023.04.05"]
        |[UTCTime "10:00:00"]
        |[TimeControl "300+3"]
        |[Termination "Normal"]
        |
        |1. e4 e5 2. Nf3 Nc6 1-0
        |""".stripMargin
    val pgn2 =
      """[Event "Mini Open"]
        |[Site "Somewhere"]
        |[White "Gamma"]
        |[Black "Delta"]
        |[Result "0-1"]
        |[UTCDate "2023.04.06"]
        |[UTCTime "11:30:00"]
        |[TimeControl "180+2"]
        |[Termination "Time forfeit"]
        |
        |1. d4 d5 2. c4 e6 0-1
        |""".stripMargin
    val z = new SevenZOutputFile(new File(out.toString))
    try {
      def add(name: String, content: Option[String]): Unit = {
        val e = new org.apache.commons.compress.archivers.sevenz.SevenZArchiveEntry
        e.setName(name)
        e.setDirectory(content.isEmpty)
        z.putArchiveEntry(e)
        content.foreach(c => z.write(c.getBytes("UTF-8")))
        z.closeArchiveEntry()
      }
      add("games", None)
      add("games/round1.pgn", Some(pgn1))
      add("games/nested", None)
      add("games/nested/round2.pgn", Some(pgn2))
    } finally z.close()
    println(s"wrote $out (${Files.size(out)} bytes)")
  }
}
