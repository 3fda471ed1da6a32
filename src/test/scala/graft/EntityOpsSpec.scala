package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.EntityOps

class EntityOpsSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("canonicalize: word-order variants block together, rep is min string, dist is surface spread") {
    val names = Seq(
      "acme blue widget", "blue acme widget", "widget acme blue", // one entity, reordered
      "zeta gadget", "zeta gadget",                               // exact dup
      "lonely part"                                               // singleton → filtered
    ).toDF("n")
    val out = EntityOps.canonicalizeNames(names, "n").collect()
      .map(r => r.getString(0) -> (r.getString(1), r.getLong(2), r.getLong(3),
        r.getInt(4))).toMap
    assert(out.size == 2, s"expected 2 multi-variant blocks, got $out")
    val (rep1, nv1, nn1, md1) = out("acme blue widget")
    assert(rep1 == "acme blue widget" && nv1 == 3 && nn1 == 3)
    // levenshtein("acme blue widget" -> "blue acme widget") = 8
    assert(md1 > 0, "reordered names must show nonzero surface spread")
    val (rep2, nv2, nn2, md2) = out("gadget zeta")
    assert(rep2 == "zeta gadget" && nv2 == 2 && nn2 == 1 && md2 == 0)
  }

  test("canonicalize: distances agree with a reference levenshtein") {
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) => if (j == 0) i else if (i == 0) j else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val names = Seq("alpha beta", "beta alpha").toDF("n")
    val row = EntityOps.canonicalizeNames(names, "n").collect().head
    assert(row.getInt(4) == lev("beta alpha", "alpha beta"))
  }

  test("goldenRecord: survivorship rules verified against the source records") {
    val sf = "/root/testdata/sf0.001"
    val rows = EntityOps.goldenRecord(spark, sf).collect()
    val base = graft.Tables.customer(spark, sf)
      .select("c_custkey", "c_name", "c_acctbal", "c_mktsegment").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getString(3)))
    assert(rows.length == base.length, "one golden record per entity")
    val byKey = base.map(t => t._1 -> t).toMap
    rows.foreach { r =>
      val k = r.getLong(0)
      val (_, name, bal, seg) = byKey(k)
      val inB = k % EntityOps.GoldenSrcBMod != 0
      assert(r.getLong(4) == (if (inB) 2L else 1L), s"$k: source count")
      // segment survives from source A (B never tracks it)
      assert(r.getString(3) == seg, s"$k: segment must survive the null")
      // name rule: equal lengths → lexicographic max = the original
      // lowercase form; balance rule: max of {bal, r2(bal·1.01)}
      assert(r.getString(1) == (if (inB) Seq(name, name.toUpperCase).max else name))
      val balB = math.floor(bal * 1.01 * 100.0 + 0.5) / 100.0
      val expectBal = if (inB) math.max(bal, balB) else bal
      assert(r.getDouble(2) == expectBal, s"$k: balance rule")
    }
  }
}
