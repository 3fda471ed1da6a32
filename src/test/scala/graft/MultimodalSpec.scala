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

  test("phashChunks: degenerate payloads hash to zero; ramp sets high cells") {
    assert(phashChunks(Array.emptyByteArray) == Seq.fill(PhashChunks)(0))
    // constant bytes: every cell mean EQUALS the global mean — the strict
    // inequality keeps all bits off (engine-agnostic tie rule)
    assert(phashChunks(Array.fill(256)(7.toByte)) == Seq.fill(PhashChunks)(0))
    // ascending ramp over 0..255 with 4 bytes per cell: exactly the upper
    // half of cells exceeds the global mean
    val bits = phashChunks(Array.tabulate(256)(_.toByte))
      .map(Integer.bitCount).sum
    assert(bits == PhashCells / 2, s"ramp set $bits bits")
  }

  test("phashPairs: verified hamming matches an independent recount") {
    val rows = MultimodalOps.phashPairs(spark, sf).collect()
    assert(rows.nonEmpty, "expected pairs at the calibrated threshold")
    assert(rows.forall(r => r.getLong(0) < r.getLong(1)))
    assert(rows.forall(_.getInt(2) <= PhashMaxHamming))
    val hashes = mediaTable(spark, sf).collect()
      .map(r => r.media_id -> phashChunks(r.payload)).toMap
    rows.foreach { r =>
      val (a, b) = (hashes(r.getLong(0)), hashes(r.getLong(1)))
      val ham = a.zip(b).map { case (x, y) => Integer.bitCount(x ^ y) }.sum
      assert(ham == r.getInt(2), s"pair ${r.getLong(0)},${r.getLong(1)}")
      // banding soundness: an emitted candidate matched some chunk-TRIPLE
      // band, so at least three chunks must be exactly equal
      assert(a.zip(b).count { case (x, y) => x == y } >= 3,
        "fewer than 3 shared chunks")
    }
  }

  test("phash band arity: wider bands nest (arity 4 ⊆ 3 ⊆ 2) and windows publish") {
    // a matching chunk k-tuple implies every sub-tuple matches, so each
    // arity step's candidate set (hence verified output) is a subset of
    // the narrower arity's — the recall window shrinking 6 → 5 → 4 is
    // exactly this nesting, published by phashGuaranteedHamming
    assert(Seq(2, 3, 4).map(MultimodalOps.phashGuaranteedHamming) == Seq(6, 5, 4))
    def pairsAt(arity: Int): Set[(Long, Long)] = {
      spark.conf.set(MultimodalOps.PhashArityKey, arity.toString)
      try MultimodalOps.phashPairs(spark, sf).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      finally spark.conf.unset(MultimodalOps.PhashArityKey)
    }
    val (p2, p3, p4) = (pairsAt(2), pairsAt(3), pairsAt(4))
    assert(p4.subsetOf(p3) && p3.subsetOf(p2))
    // default (no conf) is the oracle-mirrored triple geometry
    assert(MultimodalOps.phashPairs(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet == p3)
    intercept[IllegalArgumentException] {
      spark.conf.set(MultimodalOps.PhashArityKey, "5")
      try MultimodalOps.phashPairs(spark, sf)
      finally spark.conf.unset(MultimodalOps.PhashArityKey)
    }
  }

  test("phash adaptive arity: density rule escalates at est ≥ N, probe stays default here") {
    // decision boundary of the integer rule: Σ S³-products ≥ N⁵ escalates
    assert(MultimodalOps.phashArityFor(1000, BigInt(1000).pow(5)) == 4)
    assert(MultimodalOps.phashArityFor(1000, BigInt(1000).pow(5) - 1)
      == MultimodalOps.PhashDefaultArity)
    // degenerate corpus never escalates (mirrors the SQL's n > 0 guard)
    assert(MultimodalOps.phashArityFor(0, BigInt(0))
      == MultimodalOps.PhashDefaultArity)
    // the spec corpus is hash-sparse: the measured probe keeps triples,
    // so the q125 gate geometry is unchanged by the adaptive default
    assert(MultimodalOps.phashAdaptiveArity(spark, sf) == 3)
  }
}
