package graft.sources

import java.io.RandomAccessFile

import org.apache.hadoop.conf.Configuration

/** Offline [[HfTransport]] backing `hf://` with a local directory tree —
  * the injectable-transport seam in productized form: lay out
  * `<root>/<repoType>/<org>/<repo>/<inner...>` on disk, point
  * `fs.hf.test.root` at it, and every HfFileSystem operation (scheme
  * resolution, recursive listing, glob filter, parquet footer + column
  * range reads) runs through THIS class with zero network — how the
  * specs AND the q175 gate query exercise the reference's verbatim
  * `hf://datasets/...` URI (/root/reference/dvc.yaml:3) in a zero-egress
  * container, and how an air-gapped deployment would serve a mirrored
  * hub snapshot. Top-level with a no-arg constructor because the
  * filesystem instantiates the transport reflectively from the
  * `fs.hf.transport.impl` conf key — exactly how a real alternative
  * transport (a CDN mirror, an auth proxy) plugs in.
  */
class LocalHfTransport extends HfTransport {
  private var root = ""
  override def configure(conf: Configuration): Unit =
    root = conf.get("fs.hf.test.root", "/nonexistent")

  private def file(loc: HfLoc): java.io.File =
    new java.io.File(s"$root/${loc.repoType}/${loc.orgRepo}" +
      (if (loc.inner.isEmpty) "" else s"/${loc.inner}"))

  override def list(loc: HfLoc): Seq[HfEntry] = {
    val f = file(loc)
    if (!f.isDirectory) Seq.empty
    else f.listFiles().toSeq.sortBy(_.getName)
      .map(c => HfEntry(c.getName, c.length(), c.isDirectory))
  }

  override def stat(loc: HfLoc): Option[HfEntry] = {
    val f = file(loc)
    if (!f.exists()) None
    else Some(HfEntry(f.getName, if (f.isDirectory) 0L else f.length(),
      f.isDirectory))
  }

  override def readRange(loc: HfLoc, pos: Long, buf: Array[Byte], off: Int,
      len: Int): Int = {
    val raf = new RandomAccessFile(file(loc), "r")
    try { raf.seek(pos); raf.read(buf, off, len) } finally raf.close()
  }
}
