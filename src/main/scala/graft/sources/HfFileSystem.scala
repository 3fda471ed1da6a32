package graft.sources

import java.io.{FileNotFoundException, IOException}
import java.net.{HttpURLConnection, URI, URL}

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FSDataInputStream, FSDataOutputStream, FSInputStream, FileStatus, FileSystem, Path}
import org.apache.hadoop.fs.permission.FsPermission
import org.apache.hadoop.util.Progressable

/** Location of one object inside a Hugging Face hub repo, parsed from an
  * `hf://` URI: `hf://datasets/Lichess/chess-openings@main/x/y.parquet` →
  * repoType `datasets` (the URI authority), orgRepo
  * `Lichess/chess-openings`, revision `main` (an optional `@rev` suffix on
  * the repo segment; defaults to `main`), inner path `x/y.parquet`.
  */
final case class HfLoc(repoType: String, orgRepo: String, revision: String,
    inner: String) {
  def child(name: String): HfLoc =
    copy(inner = if (inner.isEmpty) name else s"$inner/$name")
}

/** One directory entry under an [[HfLoc]]. */
final case class HfEntry(name: String, size: Long, isDir: Boolean)

/** Pluggable I/O behind [[HfFileSystem]] — the ArchiveStages injection
  * discipline applied to the filesystem layer: the scheme, path parsing,
  * listing, glob filtering and seekable range reads are all engine surface
  * (testable offline through a local transport); only THIS trait touches
  * the network. Selected via the Hadoop conf key `fs.hf.transport.impl`
  * (class name, no-arg constructor); defaults to [[HttpHfTransport]].
  */
trait HfTransport {
  def configure(conf: Configuration): Unit = ()
  /** Direct children of a directory-like location (empty for a file or a
    * nonexistent path — disambiguated by [[stat]]).
    */
  def list(loc: HfLoc): Seq[HfEntry]
  /** Status of the location itself: None if it does not exist. The
    * returned entry's `name` is ignored for the root.
    */
  def stat(loc: HfLoc): Option[HfEntry]
  /** Read up to `len` bytes at byte offset `pos` into `buf[off..)`;
    * returns bytes read, -1 at EOF.
    */
  def readRange(loc: HfLoc, pos: Long, buf: Array[Byte], off: Int,
      len: Int): Int
}

/** Default transport: the public HF hub HTTP endpoints — `GET
  * /api/<type>/<orgRepo>/tree/<rev>/<path>` for listings (minimal
  * hand-rolled extraction of the `path`/`size`/`type` fields; the
  * container has no JSON dependency and the tree schema is stable) and
  * ranged `GET /<[datasets/]orgRepo>/resolve/<rev>/<path>` for file
  * bytes — the same resolve endpoint the reference's `hf://` glob hits
  * (/root/reference/dvc.yaml:3). Untestable in this zero-egress container
  * by construction; the spec exercises [[HfFileSystem]] through a local
  * transport instead, and this class keeps the networked default honest
  * (endpoint shapes are public documentation).
  */
class HttpHfTransport extends HfTransport {
  private var base = "https://huggingface.co"
  override def configure(conf: Configuration): Unit =
    base = conf.get("fs.hf.endpoint", base)

  private def typedPrefix(loc: HfLoc): String =
    // resolve URLs carry the repo type EXCEPT for models (the hub default)
    if (loc.repoType == "models") loc.orgRepo else s"${loc.repoType}/${loc.orgRepo}"

  private def get(url: String, range: Option[String]): HttpURLConnection = {
    val c = new URL(url).openConnection().asInstanceOf[HttpURLConnection]
    c.setInstanceFollowRedirects(true)
    // a hung connection must fail a task, not block it forever
    c.setConnectTimeout(30000)
    c.setReadTimeout(120000)
    range.foreach(r => c.setRequestProperty("Range", r))
    c
  }

  private val NextRe = """<([^>]+)>\s*;\s*rel="next"""".r

  override def list(loc: HfLoc): Seq[HfEntry] = {
    var url: String =
      s"$base/api/${loc.repoType}/${loc.orgRepo}/tree/${loc.revision}" +
        (if (loc.inner.isEmpty) "" else s"/${loc.inner}")
    val out = Seq.newBuilder[HfEntry]
    var pages = 0
    // the tree endpoint pages with a Link: rel="next" cursor — follow it.
    // Every failure mode here must THROW, never truncate: a partial
    // listing would make a Spark load silently succeed with a subset of
    // the dataset, which is worse than failing the job.
    while (url != null) {
      if (pages >= 1000)
        throw new IOException(
          s"hf tree listing for ${loc.orgRepo}/${loc.inner} exceeded " +
            s"$pages pages — refusing to return a truncated listing")
      val c = get(url, None)
      c.getResponseCode match {
        case 200 =>
          val body = new String(c.getInputStream.readAllBytes(),
            java.nio.charset.StandardCharsets.UTF_8)
          val parsed = HttpHfTransport.parseTreeBody(body)
          // a non-empty 200 body that parses to zero entries means the
          // response shape changed under us, not that the dir is empty
          if (parsed.isEmpty && body.replaceAll("\\s+", "") != "[]")
            throw new IOException(
              s"hf tree body from $url yielded zero parsed entries " +
                s"(${body.length} bytes) — response shape not understood")
          out ++= parsed
          url = Option(c.getHeaderField("Link"))
            .flatMap(NextRe.findFirstMatchIn(_)).map(_.group(1)).orNull
        case 404 if pages == 0 =>
          // nonexistent path — the contract's "empty" case (stat
          // disambiguates); anything else (429/5xx) is NOT nonexistence
          return Seq.empty
        case rc =>
          // includes a 404 on a CONTINUATION page (cursor invalidated,
          // repo moved mid-listing): pages already fetched must not be
          // returned as if they were the whole directory
          throw new IOException(s"hf tree listing failed: HTTP $rc for $url")
      }
      pages += 1
    }
    out.result()
  }

  override def stat(loc: HfLoc): Option[HfEntry] = {
    if (loc.inner.isEmpty)
      return Some(HfEntry(loc.orgRepo, 0L, isDir = true))
    val c = get(s"$base/${typedPrefix(loc)}/resolve/${loc.revision}/${loc.inner}",
      Some("bytes=0-0"))
    c.setRequestMethod("HEAD")
    c.getResponseCode match {
      case rc @ (200 | 206) =>
        // 206 answers our bytes=0-0 probe: only "bytes 0-0/<total>"
        // carries the size — Content-Length is the RANGE's length (1),
        // so an unknown total ("bytes 0-0/*") must error, not publish a
        // bogus 1-byte file. 200 means the server ignored the Range
        // header and Content-Length IS the full size.
        val len =
          if (rc == 200) c.getContentLengthLong.max(0L)
          else Option(c.getHeaderField("Content-Range"))
            .flatMap(_.split('/').last.toLongOption)
            .getOrElse(throw new IOException(
              s"hf resolve HEAD for ${loc.orgRepo}/${loc.inner} answered " +
                "206 without a parseable Content-Range total"))
        Some(HfEntry(loc.inner.substring(loc.inner.lastIndexOf('/') + 1),
          len, isDir = false))
      case 404 =>
        // resolve serves only FILES → a directory 404s here; only a tree
        // listing can tell "directory" from "nonexistent"
        val ls = list(loc)
        if (ls.nonEmpty) Some(HfEntry(loc.inner, 0L, isDir = true)) else None
      case rc =>
        // 429/5xx etc. must surface as an error — reporting "not found"
        // under rate limiting would silently drop data from a load
        throw new IOException(
          s"hf resolve HEAD failed: HTTP $rc for ${loc.orgRepo}/${loc.inner}")
    }
  }

  override def readRange(loc: HfLoc, pos: Long, buf: Array[Byte], off: Int,
      len: Int): Int = {
    if (len == 0) return 0
    val c = get(s"$base/${typedPrefix(loc)}/resolve/${loc.revision}/${loc.inner}",
      Some(s"bytes=$pos-${pos + len - 1}"))
    c.getResponseCode match {
      case rc @ (206 | 200) =>
        val in = c.getInputStream
        try {
          // a hop that drops the Range header legally answers 200 with the
          // FULL body from offset 0 — returning its head as "the bytes at
          // pos" would silently corrupt every seek'd read; skip to pos
          if (rc == 200 && pos > 0) in.skipNBytes(pos)
          // loop to fill: one socket read returns a few KB regardless of
          // len, and surfacing each short read to the caller would turn one
          // column chunk into hundreds of fresh HTTPS requests
          var n = 0
          var r = 0
          while (n < len && r >= 0) {
            r = in.read(buf, off + n, len - n)
            if (r > 0) n += r
          }
          if (n == 0) -1 else n
        } finally in.close()
      case 416 => -1 // requested range past EOF
      case rc => throw new IOException(s"hf resolve read failed: HTTP $rc")
    }
  }
}

object HttpHfTransport {
  private val TypeRe = """"type"\s*:\s*"(file|directory)"""".r
  private val PathRe = """"path"\s*:\s*"((?:[^"\\]|\\.)*)"""".r
  private val SizeRe = """"size"\s*:\s*(\d+)""".r

  /** Top-level JSON array elements of `body`, by brace-depth tracking with
    * string/escape awareness — arbitrary nesting depth (the hub adds
    * nested objects like `"lfs":{...}` and `"lastCommit":{author:{...}}`
    * over time; a fixed-depth regex silently drops entries when it
    * deepens).
    */
  private[sources] def splitTopLevelObjects(body: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var i = 0; var depth = 0; var start = -1
    var inStr = false; var esc = false
    while (i < body.length) {
      val ch = body.charAt(i)
      if (inStr) {
        if (esc) esc = false
        else if (ch == '\\') esc = true
        else if (ch == '"') inStr = false
      } else ch match {
        case '"' => inStr = true
        case '{' => if (depth == 0) start = i; depth += 1
        case '}' =>
          depth -= 1
          if (depth == 0 && start >= 0) {
            out += body.substring(start, i + 1); start = -1
          }
        case _ =>
      }
      i += 1
    }
    out.result()
  }

  /** The object string with the CONTENT of nested objects/arrays blanked,
    * so field regexes only ever match top-level keys — the nested `lfs`
    * object carries its own `"size"` which must not shadow the entry's.
    */
  private def topLevelView(obj: String): String = {
    val sb = new StringBuilder(obj.length)
    var depth = 0; var inStr = false; var esc = false
    var i = 0
    while (i < obj.length) {
      val ch = obj.charAt(i)
      if (inStr) {
        if (depth <= 1) sb.append(ch)
        if (esc) esc = false
        else if (ch == '\\') esc = true
        else if (ch == '"') inStr = false
      } else ch match {
        case '"' => inStr = true; if (depth <= 1) sb.append(ch)
        case '{' | '[' => depth += 1; if (depth <= 1) sb.append(ch)
        case '}' | ']' => if (depth <= 1) sb.append(ch); depth -= 1
        case _ => if (depth <= 1) sb.append(ch)
      }
      i += 1
    }
    sb.toString
  }

  /** Entries from one tree-API response body — pure, unit-tested against
    * a realistic LFS-bearing payload (the network-free slice of the
    * default transport). Objects without a recognizable `type`+`path`
    * pair are skipped; [[HttpHfTransport.list]] fails loudly when a
    * non-empty body parses to zero entries.
    */
  private[sources] def parseTreeBody(body: String): Seq[HfEntry] =
    splitTopLevelObjects(body).flatMap { obj =>
      val flat = topLevelView(obj)
      TypeRe.findFirstMatchIn(flat).flatMap { tm =>
        PathRe.findFirstMatchIn(flat).map { pm =>
          val full = pm.group(1)
          HfEntry(full.substring(full.lastIndexOf('/') + 1),
            SizeRe.findFirstMatchIn(flat).map(_.group(1).toLong).getOrElse(0L),
            tm.group(1) == "directory")
        }
      }
    }
}

/** Read-only Hadoop FileSystem for the `hf://` scheme, so the reference's
  * dataset URI (`hf://datasets/Lichess/chess-openings` + the recursive
  * `*.parquet` leaf glob, /root/reference/dvc.yaml:3) works VERBATIM
  * through every Spark reader via [[OpeningsSource.load]]'s glob
  * translation. Register with
  * `spark.hadoop.fs.hf.impl = graft.sources.HfFileSystem`.
  *
  * Hadoop instantiates filesystems reflectively and caches them per
  * (scheme, authority), so all state comes from `initialize`: the
  * transport class is read from `fs.hf.transport.impl` (defaults to the
  * HTTP hub endpoints). Mutating operations throw — the hub is a
  * versioned artifact store, not a writable filesystem; writes belong to
  * the export pipeline's own sinks.
  */
class HfFileSystem extends FileSystem {
  private var fsUri: URI = _
  private var transport: HfTransport = _
  private var workDir: Path = _

  override def initialize(name: URI, conf: Configuration): Unit = {
    super.initialize(name, conf)
    setConf(conf)
    fsUri = URI.create(s"hf://${name.getAuthority}")
    val cls = conf.getClass("fs.hf.transport.impl",
      classOf[HttpHfTransport], classOf[HfTransport])
    transport = cls.getDeclaredConstructor().newInstance()
    transport.configure(conf)
    workDir = new Path(s"hf://${name.getAuthority}/")
  }

  override def getScheme: String = "hf"
  override def getUri: URI = fsUri
  override def getWorkingDirectory: Path = workDir
  override def setWorkingDirectory(dir: Path): Unit = { workDir = dir }

  /** `hf://<repoType>/<org>/<repo[@rev]>/<inner...>` → [[HfLoc]]. */
  private[sources] def parse(f: Path): HfLoc = {
    val u = f.toUri
    val repoType = Option(u.getAuthority).getOrElse(
      throw new IllegalArgumentException(s"hf URI needs an authority: $f"))
    val segs = Option(u.getPath).getOrElse("").split("/").filter(_.nonEmpty)
    require(segs.length >= 2,
      s"hf URI needs org/repo after the repo type: $f")
    val (repoSeg, rev) = segs(1).split("@", 2) match {
      case Array(r, v) => (r, v)
      case Array(r) => (r, "main")
    }
    HfLoc(repoType, s"${segs(0)}/$repoSeg", rev,
      segs.drop(2).mkString("/"))
  }

  private def qualify(f: Path): Path =
    f.makeQualified(fsUri, workDir)

  private def toStatus(p: Path, e: HfEntry): FileStatus =
    new FileStatus(e.size, e.isDir, 1, 128L << 20, 0L, qualify(p))

  override def getFileStatus(f: Path): FileStatus =
    transport.stat(parse(f)) match {
      case Some(e) => toStatus(f, e)
      case None => throw new FileNotFoundException(f.toString)
    }

  override def listStatus(f: Path): Array[FileStatus] = {
    val loc = parse(f)
    // stat FIRST: the HTTP tree API called on a FILE path returns that
    // file's own entry, so a list-first fallback would fabricate the
    // doubled child path <file>/<name>; a file must list as itself
    transport.stat(loc) match {
      case None => throw new FileNotFoundException(f.toString)
      case Some(e) if !e.isDir => Array(toStatus(f, e))
      case Some(_) =>
        transport.list(loc).map(e => toStatus(new Path(f, e.name), e)).toArray
    }
  }

  override def open(f: Path, bufferSize: Int): FSDataInputStream = {
    val loc = parse(f)
    val st = transport.stat(loc).getOrElse(throw new FileNotFoundException(f.toString))
    if (st.isDir) throw new IOException(s"cannot open directory $f")
    new FSDataInputStream(new HfSeekableStream(transport, loc, st.size))
  }

  private def readOnly: Nothing =
    throw new UnsupportedOperationException("hf:// is read-only")
  override def create(f: Path, permission: FsPermission, overwrite: Boolean,
      bufferSize: Int, replication: Short, blockSize: Long,
      progress: Progressable): FSDataOutputStream = readOnly
  override def append(f: Path, bufferSize: Int,
      progress: Progressable): FSDataOutputStream = readOnly
  override def rename(src: Path, dst: Path): Boolean = readOnly
  override def delete(f: Path, recursive: Boolean): Boolean = readOnly
  override def mkdirs(f: Path, permission: FsPermission): Boolean = readOnly
}

/** Seekable stream over ranged transport reads — what parquet footer and
  * column-chunk reads need (`seek` + `read`, and positioned `readFully`
  * via FSInputStream's default seek-read-restore).
  */
private[sources] class HfSeekableStream(t: HfTransport, loc: HfLoc,
    len: Long) extends FSInputStream {
  private var pos = 0L
  override def seek(p: Long): Unit = {
    if (p < 0 || p > len) throw new IOException(s"seek $p out of [0, $len]")
    pos = p
  }
  override def getPos: Long = pos
  override def seekToNewSource(targetPos: Long): Boolean = false
  override def read(): Int = {
    val b = new Array[Byte](1)
    if (read(b, 0, 1) <= 0) -1 else b(0) & 0xff
  }
  override def read(b: Array[Byte], off: Int, length: Int): Int = {
    if (pos >= len) return -1
    val n = t.readRange(loc, pos, b, off,
      math.min(length.toLong, len - pos).toInt)
    if (n > 0) pos += n
    n
  }
}
