package graft

import java.io.ByteArrayOutputStream
import java.nio.file.{Files, Path}
import java.util.zip.{ZipEntry, ZipOutputStream}

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.pipeline.{ArchiveStages, ChessPipeline}
import graft.pipeline.ArchiveStages.{ArchiveSource, FileTransport, Transport}

/** download@key/unzip@key acquisition stages (reference dvc.yaml:9-25):
  * staging, idempotent skip, zip-slip rejection, and the full
  * catalog→publish replay through ChessPipeline.
  */
class ArchiveStagesSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def pgn(white: String, date: String, moves: String): String =
    s"""[Event "T"]
       |[Site "S"]
       |[White "$white"]
       |[Black "B"]
       |[Result "1-0"]
       |[UTCDate "$date"]
       |[UTCTime "10:00:00"]
       |[TimeControl "300+3"]
       |[Termination "Normal"]
       |
       |$moves 1-0
       |""".stripMargin

  private def zipOf(dir: Path, name: String, entries: (String, String)*): Path = {
    val p = dir.resolve(name)
    val zout = new ZipOutputStream(Files.newOutputStream(p))
    try entries.foreach { case (entryName, content) =>
      zout.putNextEntry(new ZipEntry(entryName))
      zout.write(content.getBytes("UTF-8"))
      zout.closeEntry()
    } finally zout.close()
    p
  }

  private lazy val root: Path = {
    val d = Files.createTempDirectory("acquire")
    zipOf(d, "src_a.zip",
      "games/one.pgn" -> (
        pgn("P1", "2020.01.15", "1. e4 e5 2. Nf3 Nc6 3. Bb5 a6") + "\n" +
        pgn("P2", "2020.02.20", "1. d4 d5 2. c4 e6")),
      "games/two.pgn" -> pgn("P3", "2020.03.05", "1. e4 c5"))
    zipOf(d, "src_b.zip",
      "three.pgn" -> pgn("P4", "2021.03.10", "1. e4 e5 2. Nf3 Nc6"))
    Seq(
      ("C60", "Ruy Lopez", "1. e4 e5 2. Nf3 Nc6 3. Bb5", "e2e4 e7e5 g1f3 b8c6 f1b5"),
      ("D00", "Queen's Pawn Game", "1. d4 d5", "d2d4 d7d5"))
      .toDF("eco", "name", "pgn", "uci")
      .write.parquet(d.resolve("openings").toString)
    d
  }

  private def sources(d: Path): Seq[ArchiveSource] = Seq(
    ArchiveSource("src_a", d.resolve("src_a.zip").toUri.toString),
    ArchiveSource("src_b", d.resolve("src_b.zip").toString)) // plain path form

  test("download + extract stage the PGN tree with nested entries intact") {
    val work = Files.createTempDirectory("acq_stage").toString
    val acquired = ArchiveStages.acquire(sources(root), work, FileTransport)
    assert(acquired.map(_.key) == Seq("src_a", "src_b")) // deterministic order
    val aDir = acquired.head.pgnDir
    assert(Files.exists(java.nio.file.Paths.get(aDir, "games", "one.pgn")))
    assert(Files.readString(java.nio.file.Paths.get(aDir, "games", "one.pgn"))
      .contains("[White \"P1\"]"))
    // the extracted tree is readable by the distributed PGN source
    // (recursive discovery S2 finds games/*.pgn under the source root)
    val games = spark.read.format("pgn").load(aDir)
    assert(games.count() == 3)
  }

  test("re-acquire skips both stages; a damaged archive re-runs exactly its own") {
    val work = Files.createTempDirectory("acq_idem").toString
    var fetches = 0
    val counting = new Transport {
      def fetch(url: String, dest: Path): Unit = {
        fetches += 1; FileTransport.fetch(url, dest)
      }
    }
    ArchiveStages.acquire(sources(root), work, counting)
    assert(fetches == 2)
    val aOne = java.nio.file.Paths.get(work, "pgn", "src_a", "games", "one.pgn")
    val mtime = Files.getLastModifiedTime(aOne)
    ArchiveStages.acquire(sources(root), work, counting)
    assert(fetches == 2, "second run must not re-fetch")
    assert(Files.getLastModifiedTime(aOne) == mtime, "second run must not re-extract")
    // truncate one staged archive: only that source re-runs
    Files.writeString(java.nio.file.Paths.get(work, "downloaded", "src_b.zip"), "x")
    ArchiveStages.acquire(sources(root), work, counting)
    assert(fetches == 3, "exactly the damaged source re-fetches")
    assert(Files.getLastModifiedTime(aOne) == mtime, "src_a untouched")
  }

  test("a corrupt archive fails the stage loudly, not as a silent empty source") {
    // ZipInputStream reports garbage as "zero entries", not an exception —
    // the stage must refuse to record success for it
    val d = Files.createTempDirectory("acq_corrupt")
    Files.writeString(d.resolve("bad.zip"), "<html>mega quota exceeded</html>")
    val work = Files.createTempDirectory("acq_corrupt_work").toString
    val ex = intercept[IllegalArgumentException] {
      ArchiveStages.acquire(
        Seq(ArchiveSource("bad", d.resolve("bad.zip").toString)),
        work, FileTransport)
    }
    assert(ex.getMessage.contains("no archive file entries"))
    // no extract manifest written: the next replay re-runs the stage
    assert(!Files.exists(
      java.nio.file.Paths.get(work, "pgn", "bad", "_graft_archive_manifest")))
  }

  test("a directory-only zip fails the corruption guard (zero payload)") {
    // a zip whose only entries are directories carries no PGN files; the
    // guard counts FILE entries, so this must fail like an empty archive
    val d = Files.createTempDirectory("acq_dironly")
    zipOf(d, "hollow.zip", "games/" -> "", "games/sub/" -> "")
    val work = Files.createTempDirectory("acq_dironly_work").toString
    val ex = intercept[IllegalArgumentException] {
      ArchiveStages.acquire(
        Seq(ArchiveSource("hollow", d.resolve("hollow.zip").toString)),
        work, FileTransport)
    }
    assert(ex.getMessage.contains("no archive file entries"))
    assert(!Files.exists(
      java.nio.file.Paths.get(work, "pgn", "hollow", "_graft_archive_manifest")))
  }

  test("the committed mini.7z extracts through the same staging/manifest path") {
    // the reference's archives are 7z (dvc.yaml:19 `7z x`); the committed
    // fixture is a Lumbras-shaped PGN tree (nested dir + bare directory
    // entry) in that container, regenerable via Test/runMain
    // graft.Make7zFixture
    val fixture = java.nio.file.Paths.get(
      getClass.getResource("/graft/fixtures/mini.7z").toURI)
    val work = Files.createTempDirectory("acq_7z").toString
    var fetches = 0
    val counting = new Transport {
      def fetch(url: String, dest: Path): Unit = {
        fetches += 1; FileTransport.fetch(url, dest)
      }
    }
    val acquired = ArchiveStages.acquire(
      Seq(ArchiveSource("lumbras_mini", fixture.toUri.toString)),
      work, counting)
    // download preserved the container extension for the codec dispatch
    assert(Files.exists(
      java.nio.file.Paths.get(work, "downloaded", "lumbras_mini.7z")))
    val dir = acquired.head.pgnDir
    val r1 = java.nio.file.Paths.get(dir, "games", "round1.pgn")
    val r2 = java.nio.file.Paths.get(dir, "games", "nested", "round2.pgn")
    assert(Files.readString(r1).contains("[White \"Alpha\"]"))
    assert(Files.readString(r2).contains("[Termination \"Time forfeit\"]"))
    // the extracted tree reads through the distributed PGN source
    val games = spark.read.format("pgn").load(dir)
    assert(games.count() == 2)
    // idempotent skip: same manifest contract as the zip path
    val mtime = Files.getLastModifiedTime(r1)
    ArchiveStages.acquire(
      Seq(ArchiveSource("lumbras_mini", fixture.toUri.toString)),
      work, counting)
    assert(fetches == 1, "7z re-acquire must not re-fetch")
    assert(Files.getLastModifiedTime(r1) == mtime, "7z re-acquire must not re-extract")
  }

  test("an extension-less URL serving 7z bytes still extracts (magic-byte dispatch)") {
    // the reference's real mega.nz/file/<id> URLs carry no extension —
    // the stage name heuristic says .zip, but extract must trust content
    val fixture = java.nio.file.Paths.get(
      getClass.getResource("/graft/fixtures/mini.7z").toURI)
    val d = Files.createTempDirectory("acq_noext")
    val noext = d.resolve("file_ABC123")
    Files.copy(fixture, noext)
    val work = Files.createTempDirectory("acq_noext_work").toString
    val acquired = ArchiveStages.acquire(
      Seq(ArchiveSource("mega_mini", noext.toString)), work, FileTransport)
    assert(Files.exists(
      java.nio.file.Paths.get(work, "downloaded", "mega_mini.zip")),
      "staged under the name heuristic")
    assert(Files.readString(java.nio.file.Paths.get(
      acquired.head.pgnDir, "games", "round1.pgn")).contains("[White \"Alpha\"]"))
  }

  test("a 7z with only directory entries fails the corruption guard") {
    val d = Files.createTempDirectory("acq_7z_hollow")
    val hollow = d.resolve("hollow.7z")
    val z = new org.apache.commons.compress.archivers.sevenz.SevenZOutputFile(
      hollow.toFile)
    try {
      val e = new org.apache.commons.compress.archivers.sevenz.SevenZArchiveEntry
      e.setName("games")
      e.setDirectory(true)
      z.putArchiveEntry(e)
      z.closeArchiveEntry()
    } finally z.close()
    val work = Files.createTempDirectory("acq_7z_hollow_work").toString
    val ex = intercept[IllegalArgumentException] {
      ArchiveStages.acquire(
        Seq(ArchiveSource("hollow", hollow.toString)), work, FileTransport)
    }
    assert(ex.getMessage.contains("no archive file entries"))
  }

  test("zip-slip entries fail the stage instead of escaping the target dir") {
    val d = Files.createTempDirectory("acq_slip")
    zipOf(d, "evil.zip", "../escape.pgn" -> "nope")
    val work = Files.createTempDirectory("acq_slip_work").toString
    val ex = intercept[IllegalArgumentException] {
      ArchiveStages.acquire(
        Seq(ArchiveSource("evil", d.resolve("evil.zip").toString)),
        work, FileTransport)
    }
    assert(ex.getMessage.contains("zip-slip"))
    assert(!Files.exists(d.resolve("escape.pgn")))
    assert(!Files.exists(java.nio.file.Paths.get(work).getParent.resolve("escape.pgn")))
  }

  test("end-to-end replay: acquire → ingest → enrich → partitioned publish") {
    val work = Files.createTempDirectory("acq_e2e")
    val acquired = ArchiveStages.acquire(sources(root), work.toString, FileTransport)
    val openings = spark.read.parquet(root.resolve("openings").toString)
    ChessPipeline.run(spark, acquired, openings,
      work.resolve("staging").toString, work.resolve("out").toString)
    val out = spark.read.parquet(work.resolve("out").toString)
    assert(out.count() == 4)
    assert(out.columns.length == 20)
    // enrichment reached the published rows (Ruy Lopez prefix from src_a)
    assert(out.filter(col("Opening") === "Ruy Lopez").count() == 1)
    assert(out.select("DataSource").distinct().as[String].collect().sorted
      .sameElements(Array("src_a", "src_b")))
  }
}
