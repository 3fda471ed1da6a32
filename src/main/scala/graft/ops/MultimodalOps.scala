package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Multimodal-column plumbing: image/audio/video as opaque `binary` payloads
  * with typed metadata, processed batch-wise per partition.
  *
  * The decode step is a clearly-marked deterministic STUB (the container has
  * no image/audio codecs): [[FakeDecoder.decode]] computes a 16-bin byte
  * histogram "embedding" from the payload. Everything around it — the
  * (payload, meta) schema, the typed `Dataset.mapPartitions` batch shape
  * (the JVM analog of `mapInPandas`: one iterator per partition, amortized
  * per-batch setup, no per-row driver involvement), the frame-sampling
  * explode, the pooling resize — is real, tested Spark plumbing that a real
  * decoder drops into by replacing ONE function.
  *
  * Scale notes: payloads stay columnar-compressed in parquet until the
  * partition iterator touches them; decode is a narrow transformation (no
  * shuffle), so 100 TB of media decodes at scan parallelism. Feature
  * extraction output (small fixed-width vectors) is what flows into the
  * similarity/dedup operators above — the heavy bytes never shuffle.
  */
object MultimodalOps {

  val HistBins = 16

  final case class MediaRow(media_id: Long, kind: String, payload: Array[Byte],
      width: Int, height: Int)
  final case class MediaFeatures(media_id: Long, n_bytes: Int, features: Seq[Double])
  final case class MediaFrame(media_id: Long, frame_idx: Int, frame: Array[Byte])

  /** STUB decoder — replace with a real codec where available. Deterministic:
    * normalized histogram of `byte % HistBins` (unsigned).
    */
  object FakeDecoder {
    def decode(payload: Array[Byte]): Seq[Double] = {
      val counts = new Array[Long](HistBins)
      var i = 0
      while (i < payload.length) {
        counts((payload(i) & 0xFF) % HistBins) += 1
        i += 1
      }
      val n = math.max(payload.length, 1).toDouble
      counts.toSeq.map(_ / n)
    }
  }

  /** Synthesize a media table from `documents` (UTF-8 bytes as the payload;
    * deterministic metadata) — stands in for `spark.read` of a real media
    * dataset.
    */
  def mediaTable(spark: SparkSession, sfDir: String): Dataset[MediaRow] = {
    import spark.implicits._
    Tables.documents(spark, sfDir)
      .select(
        col("doc_id").as("media_id"),
        when(col("doc_id") % 2 === 0, "image").otherwise("audio").as("kind"),
        encode(col("text"), "utf-8").as("payload"),
        (col("doc_id") % 640 + 64).cast("int").as("width"),
        (col("doc_id") % 480 + 48).cast("int").as("height"))
      .as[MediaRow]
  }

  /** Batch feature extraction: one decoder instantiation per partition, rows
    * streamed through it (mapInPandas-shaped).
    */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition setup would go here (codec init, model load, …)
      rows.map(r => MediaFeatures(r.media_id, r.payload.length,
        FakeDecoder.decode(r.payload)))
    }
  }

  /** Frame sampling: every `stride`-th fixed-size window of the payload
    * becomes one frame row (video keyframe-sampling shape).
    */
  def sampleFrames(media: Dataset[MediaRow], frameBytes: Int = 32,
      stride: Int = 4): Dataset[MediaFrame] = {
    import media.sparkSession.implicits._
    media.flatMap { r =>
      val n = r.payload.length / frameBytes
      (0 until n by stride).map { f =>
        MediaFrame(r.media_id, f,
          java.util.Arrays.copyOfRange(r.payload, f * frameBytes, (f + 1) * frameBytes))
      }
    }
  }

  /** Average-pool features to a coarser width (resize shape). */
  def poolFeatures(feats: Dataset[MediaFeatures], factor: Int = 4): Dataset[MediaFeatures] = {
    import feats.sparkSession.implicits._
    feats.map { f =>
      val pooled = f.features.grouped(factor).map(g => g.sum / g.size).toSeq
      f.copy(features = pooled)
    }
  }

  /** q30: media pipeline as a query — synthesize → decode → flatten the
    * feature vector into oracle-comparable columns.
    */
  def mediaFeatures(spark: SparkSession, sfDir: String): DataFrame = {
    val feats = extractFeatures(mediaTable(spark, sfDir))
    val r4 = (c: org.apache.spark.sql.Column) => floor(c * 10000.0 + 0.5) / 10000.0
    feats.toDF().select(
      col("media_id") +: col("n_bytes") +:
        (0 until HistBins).map(b => r4(element_at(col("features"), b + 1)).as(s"f$b")): _*)
  }

  /** q58: frame sampling as a gate query — every 4th 32-byte window of each
    * payload becomes a frame row, checksummed for comparison (md5 of the
    * frame bytes; payloads are ASCII so the DuckDB oracle reproduces the
    * same bytes from the source text). The explode is a narrow flatMap —
    * frames inherit scan parallelism, no shuffle.
    */
  def frameSample(spark: SparkSession, sfDir: String): DataFrame =
    sampleFrames(mediaTable(spark, sfDir)).toDF()
      .select(col("media_id"), col("frame_idx"),
        md5(col("frame")).as("frame_md5"))

  val frameSampleSql: String =
    """SELECT media_id, f::INT AS frame_idx,
      |       md5(substring(text, (f * 32)::INT + 1, 32)) AS frame_md5
      |FROM (SELECT doc_id AS media_id, text,
      |             unnest(range(0, greatest(length(text) // 32, 0))) AS f
      |      FROM documents)
      |WHERE f % 4 = 0""".stripMargin

  /** Oracle: the documents are ASCII, so byte histogram ≡ char-code histogram
    * — expressible in DuckDB over the same text.
    */
  val mediaFeaturesSql: String = {
    val chars = "string_split_regex(text, '')"
    val fCols = (0 until HistBins).map { b =>
      s"floor((len(list_filter($chars, c -> ord(c) % $HistBins = $b))::DOUBLE / " +
        s"greatest(length(text), 1)) * 10000.0 + 0.5) / 10000.0 AS f$b"
    }.mkString(",\n       ")
    s"""SELECT doc_id AS media_id, length(text)::INT AS n_bytes,
       |       $fCols
       |FROM documents""".stripMargin
  }
}
