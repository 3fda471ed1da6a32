package graft

import java.net.URI

import org.apache.hadoop.fs.RawLocalFileSystem

/** A Hadoop FileSystem serving the custom scheme `norenfs://` — a local
  * delegate standing in for an OBJECT STORE: a scheme outside
  * StreamingPublish's atomic-rename allowlist. Registered via
  * `fs.norenfs.impl` in PgnStreamingSpec to prove the publisher refuses
  * non-atomic-rename destinations loudly (and proceeds when the
  * deployment asserts safety via the conf override). Hadoop instantiates
  * it reflectively → top-level class, no-arg constructor.
  */
class NoRenameFs extends RawLocalFileSystem {
  override def getScheme: String = "norenfs"
  override def getUri: URI = URI.create("norenfs:///")
}
