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

  test("depth-2 nested objects do not drop entries or shadow top-level fields") {
    // lastCommit.author is a depth-2 object (a shape the hub could add any
    // time); the nested lfs object carries its OWN "size" before the
    // entry's — the parser must read the top-level one
    val body =
      """[
        |{"type":"file","oid":"x1",
        | "lfs":{"oid":"sha256:bb","size":999999,"pointerSize":134},
        | "size":42,"path":"data/a.parquet",
        | "lastCommit":{"id":"c2","author":{"name":"ann","email":"a@b.c"},
        |  "title":"braces } in \" strings {","date":"2024-02-02T00:00:00Z"}},
        |{"type":"directory","size":0,"path":"data/nested"}
        |]""".stripMargin
    val entries = HttpHfTransport.parseTreeBody(body)
    assert(entries.map(e => (e.name, e.size, e.isDir)) == Seq(
      ("a.parquet", 42L, false),
      ("nested", 0L, true)))
  }
}
