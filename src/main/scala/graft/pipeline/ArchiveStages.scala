package graft.pipeline

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.security.MessageDigest
import java.util.zip.ZipInputStream

import org.apache.commons.compress.archivers.sevenz.SevenZFile

/** Acquisition stages — the analog of the reference's `download@key` /
  * `unzip@key` DVC stages (reference dvc.yaml:9-25: `mega-get
  * "https://mega.nz/file/<id>"` into `data/downloaded/<key>.7z`, then
  * `7z x` into `data/pgn/<key>/`), closing the end-to-end replay path
  * scrape → acquire → ingest → enrich → publish. The reference runs these
  * as shell steps OUTSIDE DuckDB for the same reason they are driver-side
  * file staging here: acquisition is transport, not engine surface — the
  * cluster never sees an archive byte, it reads the extracted PGN tree
  * through the distributed source ([[graft.sources.PgnDataSource]]).
  *
  * Two honest boundaries, both injectable/documented (the FakeDecoder
  * discipline — plumbing real and tested, environment-dependent edge
  * stubbed visibly):
  *
  *  - network: fetching goes through a one-method [[Transport]]; the
  *    zero-egress container supplies [[FileTransport]] (file:// copies)
  *    in specs, a real deployment drops in an HTTP/mega client with the
  *    same contract.
  *  - archive container: ZIP via the JDK's `java.util.zip`, and the
  *    reference's actual 7z format (dvc.yaml:19 runs `7z x`) via the
  *    pure-JVM commons-compress `SevenZFile` (LZMA2 through the public
  *    XZ-for-Java codec — no native tool dependency). Both go through
  *    the same zip-slip path validation, payload corruption guard, and
  *    staging/manifest contract; the container is picked by the staged
  *    archive's MAGIC BYTES (the reference's mega.nz URLs carry no
  *    extension, so names cannot be trusted).
  *
  * Idempotency mirrors the repo's DVC-hash analog
  * ([[ChessPipeline]]/dvc.lock): `download` skips when the staged archive
  * exists and its recorded manifest (URL + size + SHA-256) is intact;
  * `extract` skips when the output tree's manifest matches the archive's
  * SHA-256 — so a re-run after a partial failure re-does exactly the
  * broken stages, same skip granularity (per source) as `dvc repro`.
  */
object ArchiveStages {

  /** One acquirable source: `key` names the staging dirs (the dvc foreach
    * key), `url` is whatever the transport understands.
    */
  final case class ArchiveSource(key: String, url: String)

  /** The network boundary. `fetch` must leave the complete artifact at
    * `dest` or throw — partial files must not survive (write to a temp
    * name and move, as [[FileTransport]] does).
    */
  trait Transport {
    def fetch(url: String, dest: Path): Unit
  }

  /** `file://` (or plain-path) transport — the in-container stand-in for
    * the reference's `mega-get`. Atomic: copies to `<dest>.part`, then
    * moves into place.
    */
  object FileTransport extends Transport {
    def fetch(url: String, dest: Path): Unit = {
      val src = Paths.get(
        if (url.startsWith("file://")) new java.net.URI(url).getPath else url)
      val part = dest.resolveSibling(dest.getFileName.toString + ".part")
      Files.copy(src, part, StandardCopyOption.REPLACE_EXISTING)
      Files.move(part, dest, StandardCopyOption.REPLACE_EXISTING,
        StandardCopyOption.ATOMIC_MOVE)
    }
  }

  /** download@key: stage `<downloadDir>/<key>.zip` via the transport,
    * skipping sources whose staged archive + manifest are intact. Returns
    * (key, archive path) in deterministic key order (the W2 discipline).
    */
  /** One staged archive: the path plus its SHA-256, computed once here and
    * threaded into [[extract]] so a no-op replay hashes each archive once,
    * not once per stage.
    */
  final case class Staged(key: String, archive: Path, sha256: String)

  def download(
      sources: Seq[ArchiveSource],
      downloadDir: String,
      transport: Transport): Seq[Staged] = {
    val dir = Files.createDirectories(Paths.get(downloadDir))
    sources.sortBy(_.key).map { src =>
      // the staged name mirrors the URL's container format for
      // readability (the reference stages <key>.7z, dvc.yaml:10);
      // extract() dispatches on magic bytes, so an extension-less URL
      // (mega.nz/file/<id>) staged as .zip still extracts correctly
      val ext = if (src.url.toLowerCase.endsWith(".7z")) "7z" else "zip"
      val archive = dir.resolve(s"${src.key}.$ext")
      val manifest = dir.resolve(s"${src.key}.manifest")
      val existingHash =
        if (Files.exists(archive) && Files.exists(manifest)) Some(sha256(archive))
        else None
      val hash = existingHash.filter { h =>
        Files.readString(manifest).trim == s"${src.url}|${Files.size(archive)}|$h"
      } match {
        case Some(h) =>
          println(s"[acquire] skip download ${src.key} (manifest match)")
          h
        case None =>
          transport.fetch(src.url, archive)
          val h = sha256(archive)
          Files.writeString(manifest, s"${src.url}|${Files.size(archive)}|$h")
          h
      }
      Staged(src.key, archive, hash)
    }
  }

  /** unzip@key: extract the staged archive into `<pgnRoot>/<key>/`,
    * skipping when the output tree's manifest matches the archive hash.
    * Every entry path is validated against zip-slip (an entry like
    * `../../evil` must fail the whole stage, not escape the target dir).
    */
  def extract(key: String, archive: Path, pgnRoot: String,
      archiveHash: Option[String] = None): Path = {
    val outDir = Paths.get(pgnRoot, key)
    val manifest = outDir.resolve("_graft_archive_manifest")
    val hash = archiveHash.getOrElse(sha256(archive))
    if (Files.exists(manifest) && Files.readString(manifest).trim == hash) {
      println(s"[acquire] skip extract $key (manifest match)")
      return outDir
    }
    // a stale or partial tree is torn down before re-extraction (the
    // reference's dvc `outs` semantics: the stage owns its output dir)
    if (Files.exists(outDir)) {
      import scala.jdk.CollectionConverters._
      val walk = Files.walk(outDir)
      try walk.iterator().asScala.toSeq.reverse.foreach(Files.delete)
      finally walk.close()
    }
    Files.createDirectories(outDir)
    // dispatch on the staged file's MAGIC BYTES, not its name: the
    // reference's real download URLs (mega.nz/file/<id>) carry no
    // extension, so a name heuristic would run ZipInputStream over LZMA2
    // bytes and fail every acquire — the content itself is authoritative
    val extracted =
      if (isSevenZ(archive)) extract7z(archive, outDir)
      else extractZip(archive, outDir)
    // ZipInputStream reports garbage (an HTML error page, a truncated
    // fetch) as "no entries", not as an exception — succeeding here would
    // record the bad archive's hash as done and every replay would skip a
    // permanently-empty source. Fail the stage loudly instead, like the
    // reference's `7z x` does. (SevenZFile throws on a bad signature, but
    // a VALID directory-only archive still lands here with zero files.)
    require(extracted > 0,
      s"extract $key: no archive file entries found in $archive — corrupt, " +
        "empty, or directory-only (no payload)")
    Files.writeString(manifest, hash)
    outDir
  }

  /** 7z signature: `37 7A BC AF 27 1C` (public format spec). */
  private def isSevenZ(archive: Path): Boolean = {
    val sig = Array[Byte](0x37, 0x7a, 0xbc.toByte, 0xaf.toByte, 0x27, 0x1c)
    val head = new Array[Byte](6)
    val in = Files.newInputStream(archive)
    val n = try in.readNBytes(head, 0, 6) finally in.close()
    n == 6 && head.sameElements(sig)
  }

  /** Entry loop shared contract: validate each entry path against the
    * target root (zip-slip), create dirs, copy file payloads, and return
    * the FILE entry count (directory entries carry no payload and do not
    * count toward the corruption guard).
    */
  private def extractZip(archive: Path, outDir: Path): Long = {
    var extracted = 0L
    val zin = new ZipInputStream(Files.newInputStream(archive))
    try {
      val rootNorm = outDir.toAbsolutePath.normalize
      Iterator.continually(zin.getNextEntry).takeWhile(_ != null).foreach { e =>
        val target = outDir.resolve(e.getName).toAbsolutePath.normalize
        require(target.startsWith(rootNorm),
          s"zip-slip entry rejected: ${e.getName}")
        if (e.isDirectory) Files.createDirectories(target)
        else {
          Files.createDirectories(target.getParent)
          Files.copy(zin, target, StandardCopyOption.REPLACE_EXISTING)
          extracted += 1
        }
        zin.closeEntry()
      }
    } finally zin.close()
    extracted
  }

  /** The reference's actual container (dvc.yaml:19 `7z x`): pure-JVM
    * 7z/LZMA2 via commons-compress + XZ-for-Java — public, in-classpath,
    * no native `7z` binary. Random-access format, so entries stream one
    * at a time through `getInputStream`; same zip-slip and payload-count
    * contract as the ZIP path.
    */
  private def extract7z(archive: Path, outDir: Path): Long = {
    var extracted = 0L
    val sz = SevenZFile.builder().setPath(archive).get()
    try {
      val rootNorm = outDir.toAbsolutePath.normalize
      Iterator.continually(sz.getNextEntry).takeWhile(_ != null).foreach { e =>
        val target = outDir.resolve(e.getName).toAbsolutePath.normalize
        require(target.startsWith(rootNorm),
          s"zip-slip entry rejected: ${e.getName}")
        if (e.isDirectory) Files.createDirectories(target)
        else {
          Files.createDirectories(target.getParent)
          val in = sz.getInputStream(e)
          try Files.copy(in, target, StandardCopyOption.REPLACE_EXISTING)
          finally in.close()
          extracted += 1
        }
      }
    } finally sz.close()
    extracted
  }

  /** The composed acquisition front-end: download + extract every source,
    * returning [[ChessPipeline.Source]]s ready for
    * [[ChessPipeline.run]] — `acquire(...) ++ pipeline` replays the
    * reference's full DAG from catalog to published parquet.
    */
  def acquire(
      sources: Seq[ArchiveSource],
      workDir: String,
      transport: Transport): Seq[ChessPipeline.Source] =
    download(sources, s"$workDir/downloaded", transport).map { s =>
      ChessPipeline.Source(s.key,
        extract(s.key, s.archive, s"$workDir/pgn", Some(s.sha256)).toString)
    }

  private def sha256(p: Path): String = {
    val md = MessageDigest.getInstance("SHA-256")
    val in = Files.newInputStream(p)
    try {
      val buf = new Array[Byte](1 << 16)
      Iterator.continually(in.read(buf)).takeWhile(_ > 0)
        .foreach(n => md.update(buf, 0, n))
    } finally in.close()
    md.digest().map("%02x".format(_)).mkString
  }
}
