package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.MultimodalOps
import graft.ops.MultimodalOps._

class MultimodalSpec extends AnyFunSuite with SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  test("fake decoder: normalized histogram sums to ~1, deterministic") {
    val f = FakeDecoder.decode("hello world".getBytes("UTF-8"))
    assert(f.length == HistBins)
    assert(math.abs(f.sum - 1.0) < 1e-9)
    assert(f == FakeDecoder.decode("hello world".getBytes("UTF-8")))
    assert(FakeDecoder.decode(Array.emptyByteArray).sum == 0.0)
  }

  test("media table carries binary payload + typed metadata") {
    val m = mediaTable(spark, sf).collect()
    assert(m.length == 500)
    assert(m.forall(r => r.payload.nonEmpty && r.width >= 64 && r.height >= 48))
    assert(m.map(_.kind).toSet == Set("image", "audio"))
  }

  test("partition-batched feature extraction preserves rows and width") {
    val feats = extractFeatures(mediaTable(spark, sf)).collect()
    assert(feats.length == 500)
    assert(feats.forall(_.features.length == HistBins))
    assert(feats.forall(f => math.abs(f.features.sum - 1.0) < 1e-9))
  }

  test("frame sampling yields strided fixed-size frames") {
    val frames = sampleFrames(mediaTable(spark, sf), frameBytes = 32, stride = 4)
      .collect()
    assert(frames.nonEmpty)
    assert(frames.forall(_.frame.length == 32))
    assert(frames.forall(_.frame_idx % 4 == 0))
  }

  test("pooling shrinks feature width by the factor") {
    val pooled = poolFeatures(extractFeatures(mediaTable(spark, sf)), 4).head(3)
    assert(pooled.forall(_.features.length == HistBins / 4))
  }
}
