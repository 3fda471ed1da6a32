package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the bench's own self-adjudication plumbing (r13 verdict #1 +
  * advice): the prior-record filter feeding the baseline48 load flag,
  * and the physical-core parse behind the oversubscription threshold.
  * Pure-function tests — no Spark session.
  */
class BenchSpec extends AnyFunSuite {

  private val sf = "/root/testdata/sf0.1"

  private def record(baseline48: Double, sfDir: String = sf,
      extra: String = ""): String =
    s"""{"metric":"total","value":100.0,"baseline48":$baseline48,""" +
      s""""failed":[]$extra,"sf":"$sfDir"}"""

  test("usable prior: clean same-sf zero-failure record is accepted") {
    assert(Bench.usablePriorBaseline48(record(21.36), sf).contains(21.36))
    // a pre-r13 record with no load_suspect key at all is still usable
    // (the committed definitive records predate the flag)
    assert(Bench.usablePriorBaseline48(
      record(21.36, extra = ""","load_suspect":false"""), sf)
      .contains(21.36))
  }

  test("usable prior rejects a load_suspect:true record (r13 verdict #1)") {
    // the r13 working-tree case: the driver's loaded run overwrote
    // bench_full.json at baseline48 25.73 (+20% over the true 21.36) —
    // accepted as the floor, it would loosen the +15% flag to +38%
    assert(Bench.usablePriorBaseline48(
      record(25.73, extra = ""","load_suspect":true,"load_suspect_reasons":["baseline48 25.7s vs prior 21.4s"]"""),
      sf).isEmpty)
  }

  test("usable prior parses the record as JSON (r14 advice): pretty-printed " +
      "flags still reject, pretty-printed clean records still accept, and " +
      "flag text embedded in another field's value is inert") {
    // a hand-edited / pretty-printed record writes "load_suspect": true
    // (space after the colon) — the old exact-substring check sailed
    // past it and re-admitted the contaminated prior
    assert(Bench.usablePriorBaseline48(
      record(25.73, extra = ""","load_suspect" : true"""), sf).isEmpty)
    assert(Bench.usablePriorBaseline48(
      record(5.0, extra = ""","restricted"  :  true"""), sf).isEmpty)
    // the ACCEPT side tolerates the same formatting: pretty-printed
    // sf / failed / baseline48 fields must not silently disable the
    // floor (no prior → no flag → weaker self-adjudication)
    val pretty =
      s"""{ "metric": "total", "value": 100.0, "baseline48": 21.36,
         |  "failed": [ ], "sf": "$sf" }""".stripMargin
    assert(Bench.usablePriorBaseline48(pretty, sf).contains(21.36))
    // and flag-shaped TEXT inside some other field's string value (e.g.
    // a reasons array quoting another record) must not false-reject —
    // only the real top-level boolean counts
    assert(Bench.usablePriorBaseline48(
      record(21.36, extra =
        ""","load_suspect":false,"notes":["prior had \"restricted\": true"]"""),
      sf).contains(21.36))
  }

  test("usable prior rejects restricted, failed, wrong-sf and zero records") {
    assert(Bench.usablePriorBaseline48(
      record(5.0, extra = ""","restricted":true"""), sf).isEmpty)
    assert(Bench.usablePriorBaseline48(
      s"""{"baseline48":5.0,"failed":["q03"],"sf":"$sf"}""", sf).isEmpty)
    assert(Bench.usablePriorBaseline48(
      record(21.36, sfDir = "/root/repo/localdata/sf25"), sf).isEmpty)
    assert(Bench.usablePriorBaseline48(record(0.0), sf).isEmpty)
    assert(Bench.usablePriorBaseline48("not json", sf).isEmpty)
  }

  test("cpu-topology parse: distinct (physical id, core id) pairs + logical count") {
    // 2-socket, 2 cores each, SMT2: 8 logical processors, 4 physical
    def block(proc: Int, phys: Int, core: Int): Seq[String] = Seq(
      s"processor\t: $proc", "vendor_id\t: x", s"physical id\t: $phys",
      "siblings\t: 4", s"core id\t\t: $core", "cpu cores\t: 2", "")
    val smt = (block(0, 0, 0) ++ block(1, 0, 1) ++ block(2, 1, 0) ++
      block(3, 1, 1) ++ block(4, 0, 0) ++ block(5, 0, 1) ++
      block(6, 1, 0) ++ block(7, 1, 1))
    assert(Bench.parseCpuTopology(smt.iterator).contains((4, 8)))
    // no SMT: logical == physical
    val flat = (0 until 4).flatMap(i => block(i, 0, i))
    assert(Bench.parseCpuTopology(flat.iterator).contains((4, 4)))
    // topology fields absent (non-x86 /proc/cpuinfo): None → caller
    // falls back to availableProcessors
    assert(Bench.parseCpuTopology(
      Seq("processor : 0", "bogomips : 48.00").iterator).isEmpty)
  }

  test("quiet mt/st ratio: SMT scales by physical cores, quota composes") {
    // r13-advice scenario: 32 spin threads on 16 physical / 32 logical
    // (SMT), unconstrained → quiet mt legitimately ~2× st
    val smt = Bench.quietMtRatioFor(nThreads = 32, physCores = 16,
      logicalCores = 32, availCpus = 32)
    assert(smt == 2.0)
    assert(!Bench.overSubFor(st = 1000, mt = 1800, smt),
      "quiet SMT box (mt=1.8x st) must not flag")
    assert(Bench.overSubFor(st = 1000, mt = 3000, smt),
      "mt=3x st on the SMT box must flag")
    // cgroup CPU quota: 8 cpus granted on a 64-core non-SMT host —
    // /proc/cpuinfo reads the host but availableProcessors the grant
    val quota = Bench.quietMtRatioFor(nThreads = 32, physCores = 64,
      logicalCores = 64, availCpus = 8)
    assert(quota == 4.0)
    assert(!Bench.overSubFor(st = 1000, mt = 4500, quota),
      "quiet quota-limited container (mt=4.5x st) must not flag")
    assert(Bench.overSubFor(st = 1000, mt = 6000, quota))
    // BOTH: cpuset of 8 logical cpus on a 32-phys/64-logical SMT host —
    // the 8 may be 4 hyperthread pairs, so worst-case effective
    // parallelism is 4 and a quiet box walls at ~8× st (r14 review)
    val both = Bench.quietMtRatioFor(nThreads = 32, physCores = 32,
      logicalCores = 64, availCpus = 8)
    assert(both == 8.0)
    assert(!Bench.overSubFor(st = 1000, mt = 9000, both),
      "quiet SMT+cpuset container (mt=9x st) must not flag")
    assert(Bench.overSubFor(st = 1000, mt = 11000, both),
      "mt=11x st on the SMT+cpuset container must still flag")
    // unconstrained non-SMT box: ratio 1, classic 1.25x threshold
    val flat = Bench.quietMtRatioFor(nThreads = 32, physCores = 32,
      logicalCores = 32, availCpus = 32)
    assert(flat == 1.0)
    assert(Bench.overSubFor(st = 1000, mt = 1300, flat))
    assert(!Bench.overSubFor(st = 0, mt = 99999, flat),
      "st=0 (probe failure) must not flag")
  }
}
