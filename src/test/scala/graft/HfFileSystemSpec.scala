package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import org.apache.hadoop.fs.Path

/** The `hf://` scheme end-to-end: the reference ingests its openings
  * dimension from `hf://datasets/Lichess/chess-openings` + a recursive
  * `*.parquet` glob (/root/reference/dvc.yaml:3). With HfFileSystem
  * registered, that URI works VERBATIM — scheme resolution, recursive
  * listing, leaf-glob filtering, parquet footer + column range reads all
  * run through the filesystem, against the injected offline transport
  * ([[LocalHfTransport]]; the shipped default is the HTTP hub endpoints).
  */
class HfFileSystemSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private lazy val hubRoot: java.nio.file.Path = {
    val root = Files.createTempDirectory("hf_hub")
    // repo layout <root>/<repoType>/<org>/<repo>/<inner...>, nested data
    // dir + a non-parquet file the leaf glob must skip (hub repos carry
    // README.md next to their data)
    val data = Files.createDirectories(
      root.resolve("datasets/Lichess/chess-openings/data"))
    Seq(
      ("C60", "Ruy Lopez", "1. e4 e5 2. Nf3 Nc6 3. Bb5", "e2e4 e7e5 g1f3 b8c6 f1b5"),
      ("A00", "Polish Opening", "1. b4", "b2b4"))
      .toDF("eco", "name", "pgn", "uci")
      .coalesce(1).write.mode("overwrite").parquet(data.resolve("part0").toString)
    Files.writeString(
      root.resolve("datasets/Lichess/chess-openings/README.md"), "# openings")
    val conf = spark.sparkContext.hadoopConfiguration
    conf.set("fs.hf.impl", classOf[graft.sources.HfFileSystem].getName)
    conf.set("fs.hf.transport.impl",
      classOf[graft.sources.LocalHfTransport].getName)
    conf.set("fs.hf.test.root", root.toString)
    root
  }

  test("the reference's hf:// dataset URI loads verbatim through OpeningsSource") {
    hubRoot
    val df = graft.sources.OpeningsSource.load(spark,
      "hf://datasets/Lichess/chess-openings/**/*.parquet")
    assert(df.count() == 2)
    assert(df.select("eco").collect().map(_.getString(0)).sorted
      .sameElements(Array("A00", "C60")))
  }

  test("an @revision repo segment parses and resolves") {
    hubRoot
    val df = graft.sources.OpeningsSource.load(spark,
      "hf://datasets/Lichess/chess-openings@main/**/*.parquet")
    assert(df.count() == 2)
  }

  test("ranged reads return exact bytes; writes are rejected") {
    hubRoot
    val conf = spark.sparkContext.hadoopConfiguration
    val p = new Path("hf://datasets/Lichess/chess-openings/README.md")
    val fs = p.getFileSystem(conf)
    val st = fs.getFileStatus(p)
    assert(!st.isDirectory && st.getLen == "# openings".length)
    val in = fs.open(p, 4096)
    try {
      // positioned read from a nonzero offset (the parquet footer shape)
      val buf = new Array[Byte](8)
      in.readFully(2, buf, 0, 8)
      assert(new String(buf) == "openings")
      // stream read after seek
      in.seek(2)
      assert(in.read() == 'o'.toInt)
    } finally in.close()
    intercept[UnsupportedOperationException] {
      fs.delete(p, false)
    }
    intercept[java.io.FileNotFoundException] {
      fs.getFileStatus(new Path("hf://datasets/Lichess/chess-openings/nope"))
    }
  }
}
