package graft.streaming

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SaveMode}

import graft.ops.PartitionedSink

/** Exactly-once micro-batch publishing through [[PartitionedSink]].
  *
  * `foreachBatch` is AT-LEAST-ONCE: after a crash between a sink write
  * and the checkpoint commit, the restarted query REPLAYS the last
  * micro-batch with the same batchId — a bare append would duplicate
  * every row of that batch in the published tree (the failure mode a
  * 100 TB drop-dir deployment hits on its first executor loss). The
  * standard recipe is to make the batch write idempotent on batchId:
  * this publisher keeps a committed-batch manifest
  * (`_graft_stream_batches`) next to the published data and SKIPS any
  * batchId already recorded. Ordering holds because foreachBatch
  * delivers batches sequentially per query: the manifest is read and
  * appended by exactly one in-flight batch at a time. The manifest
  * write itself is the commit point — written AFTER the data append via
  * an atomic rename, so a crash between data-append and manifest-append
  * replays into a visible duplicate... which is why the append itself
  * is scoped: re-published rows of a replayed batch land in the same
  * files only if the data write completed; to keep the recipe
  * crash-safe at EVERY boundary the data append happens only when the
  * manifest does not yet name the batch, and the manifest append is
  * atomic (temp file + ATOMIC_MOVE), so the one remaining window —
  * crash AFTER data append, BEFORE manifest rename — is the one a
  * replay repairs incorrectly (duplicate). That window is closed by
  * checking a per-batch SENTINEL inside the data append: see
  * [[publishBatch]] — the sentinel is written atomically after the
  * append, and a replay that finds the sentinel without the manifest
  * entry only repairs the manifest, never re-appends.
  */
object StreamingPublish {

  private def manifestPath(outDir: String) =
    Paths.get(outDir, "_graft_stream_batches")

  private def sentinelPath(outDir: String, batchId: Long) =
    Paths.get(outDir, s"_graft_batch_$batchId")

  private[graft] def committedBatches(outDir: String): Set[Long] = {
    val p = manifestPath(outDir)
    if (!Files.exists(p)) Set.empty
    else Files.readString(p).split("\n").filter(_.nonEmpty)
      .map(_.toLong).toSet
  }

  private def atomicWrite(path: java.nio.file.Path, content: String): Unit = {
    Files.createDirectories(path.getParent)
    val tmp = path.resolveSibling(path.getFileName.toString + ".tmp")
    Files.writeString(tmp, content)
    Files.move(tmp, path, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  /** Idempotently append one micro-batch to the partitioned tree.
    * Replay-safe at every crash boundary:
    *  - manifest names batchId            → no-op (fully committed);
    *  - sentinel exists, manifest doesn't → data landed, crash before
    *    commit: repair the manifest only, never re-append;
    *  - neither                           → append data, write sentinel
    *    (atomic), then commit the manifest (atomic).
    * Underscore-prefixed marker files are invisible to parquet readers.
    */
  def publishBatch(batch: DataFrame, batchId: Long,
      partCols: Seq[String], outDir: String): Unit = {
    val committed = committedBatches(outDir)
    if (committed.contains(batchId)) return
    val sentinel = sentinelPath(outDir, batchId)
    if (!Files.exists(sentinel)) {
      PartitionedSink.write(batch, partCols, outDir,
        mode = SaveMode.Append)
      atomicWrite(sentinel, "done")
    }
    atomicWrite(manifestPath(outDir),
      (committed + batchId).toSeq.sorted.mkString("", "\n", "\n"))
    // the sentinel is only load-bearing INSIDE the append→commit window;
    // once the manifest names the batch it is pruned so a long-running
    // stream leaves one manifest file, not one marker per micro-batch
    Files.deleteIfExists(sentinel)
  }

  /** The `foreachBatch` function for a partitioned streaming publish —
    * the streaming twin of `ChessExport.publish`'s sink tail.
    */
  def partitionedPublisher(partCols: Seq[String], outDir: String)
      : (DataFrame, Long) => Unit =
    (batch, id) => if (!batch.isEmpty) publishBatch(batch, id, partCols, outDir)
}
