package graft.tools

import java.net.URI

import org.apache.hadoop.fs.{Path, RawLocalFileSystem}

/** A Hadoop FileSystem serving `renameless://` — a local delegate that
  * REFUSES every rename the publisher issues: commit markers
  * (`_graft_*`) and batch-tagged data promotes (`b<id>-part-*`). This is
  * the adversarial object-store model for StreamingPublish's marker
  * mode: the protocol must commit via conditional-create and promote via
  * the copy+delete fallback, never via a marker rename.
  *
  * Lives in main (not test) scope so [[PipelineScaleBench]] can run the
  * CORPUS-scale chaos protocol through it (r12 verdict: the mid-promote
  * kill window under copy-fallback had only spec-scale evidence).
  *
  * Renames from Spark's own FileOutputCommitter (plain `part-*` /
  * `_temporary` destinations, used by the parquet write INTO the staging
  * subtree) are allowed — on a real object store that write goes through
  * a store-native committer (e.g. the S3A magic committer), which is
  * orthogonal to the publish protocol: the staging tree is
  * underscore-invisible to readers and wiped on replay regardless.
  * Hadoop instantiates the class reflectively → top-level, no-arg ctor.
  */
class RenamelessFs extends RawLocalFileSystem {
  override def getScheme: String = "renameless"
  override def getUri: URI = URI.create("renameless:///")
  override def rename(src: Path, dst: Path): Boolean = {
    val n = dst.getName
    val publisherRename =
      n.startsWith("_graft_") || n.matches("^b\\d+-.*")
    if (publisherRename) false else super.rename(src, dst)
  }
}
