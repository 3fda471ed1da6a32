package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** The network-free slice of the default hf:// transport: tree-API body
  * parsing must survive realistic hub payloads — in particular
  * LFS-stored files (nested `"lfs":{...}` object), which is how real
  * dataset parquet is stored; a flat brace-free entry regex drops them.
  */
class HfTreeParseSpec extends AnyFunSuite {

  test("parseTreeBody keeps LFS entries, nested objects, sizes and dirs") {
    val body =
      """[
        |{"type":"file","oid":"abc","size":12,"path":"README.md"},
        |{"type":"file","oid":"def","size":3811224,
        | "lfs":{"oid":"sha256:aa","size":3811224,"pointerSize":134},
        | "path":"data/train-00000-of-00001.parquet",
        | "lastCommit":{"id":"c1","title":"add data","date":"2024-01-01T00:00:00Z"}},
        |{"type":"directory","oid":"t1","size":0,"path":"data/sub"}
        |]""".stripMargin
    val entries = HttpHfTransport.parseTreeBody(body)
    assert(entries.map(e => (e.name, e.size, e.isDir)) == Seq(
      ("README.md", 12L, false),
      ("train-00000-of-00001.parquet", 3811224L, false),
      ("sub", 0L, true)))
  }

  test("empty and entry-free bodies parse to nothing") {
    assert(HttpHfTransport.parseTreeBody("[]").isEmpty)
    assert(HttpHfTransport.parseTreeBody("""{"error":"Repo not found"}""").isEmpty)
  }
}
