package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench's canonical contention gate ([[BenchGate]]): catches the
  * uniformly-slow window that canary swing and cross-pass spikes are
  * structurally blind to (both only see contention UNEVEN in time —
  * the r14 closing artifact banked a 1.73× window at swing 1.47). */
class BenchGateSpec extends AnyFunSuite {

  private val canonical = Map("q1" -> 1.0, "q2" -> 2.0, "q3" -> 3.0)

  test("a uniformly-slow pass trips the gate even with zero swing") {
    // every query 1.5× its quiet cost — no canary or spike detector
    // would fire, the canonical one must
    val measured = Seq("q1" -> 1.5, "q2" -> 3.0, "q3" -> 4.5)
    assert(BenchGate.ratioVsCanonical(measured, canonical) === Some(1.5))
    assert(BenchGate.overCanonical(measured, canonical))
  }

  test("a quiet pass (within 1.3x) does not trip") {
    val measured = Seq("q1" -> 1.1, "q2" -> 2.2, "q3" -> 3.2)
    assert(!BenchGate.overCanonical(measured, canonical))
  }

  test("gates the OVERLAP only: new queries absent from the canonical " +
      "never inflate the ratio, and a profiling subset gates against " +
      "its own entries") {
    // q_new is expensive but unrecorded — excluded from both sides
    val grown = Seq("q1" -> 1.0, "q2" -> 2.0, "q3" -> 3.0, "q_new" -> 50.0)
    assert(BenchGate.ratioVsCanonical(grown, canonical) === Some(1.0))
    assert(!BenchGate.overCanonical(grown, canonical))
    // SPARK_GRAFT_ONLY-style subset: only q2 measured
    assert(BenchGate.ratioVsCanonical(Seq("q2" -> 4.0), canonical) ===
      Some(2.0))
    assert(BenchGate.overCanonical(Seq("q2" -> 4.0), canonical))
  }

  test("no overlap, empty canonical, or zero-time entries disarm the " +
      "gate instead of dividing by zero or gating wrongly") {
    assert(BenchGate.ratioVsCanonical(Seq("qX" -> 9.0), canonical) === None)
    assert(!BenchGate.overCanonical(Seq("qX" -> 9.0), canonical))
    assert(BenchGate.ratioVsCanonical(Seq("q1" -> 1.0), Map.empty) === None)
    // a failed query times-to-error near 0 — excluded, not a divisor
    assert(BenchGate.ratioVsCanonical(Seq("q1" -> 0.0, "q2" -> 2.0),
      canonical) === Some(1.0))
    // a zero canonical entry is likewise excluded
    assert(BenchGate.ratioVsCanonical(Seq("q1" -> 1.0),
      Map("q1" -> 0.0)) === None)
  }

  test("loadCanonical: parses the committed file at the matching SF, " +
      "disarms on SF mismatch, missing file, and malformed JSON") {
    val dir = java.nio.file.Files.createTempDirectory("graft_benchgate")
    dir.toFile.deleteOnExit()
    val f = new java.io.File(dir.toFile, "canon.json")
    java.nio.file.Files.writeString(f.toPath,
      """{"sf":"sf0.1","queries":{"q1":1.25,"q2":2.5}}""")
    assert(BenchGate.loadCanonical(f.getPath, "/root/testdata/sf0.1") ===
      Map("q1" -> 1.25, "q2" -> 2.5))
    // recorded at sf0.1, benched at sf0.01 → disarmed
    assert(BenchGate.loadCanonical(f.getPath, "/root/testdata/sf0.01") ===
      Map.empty)
    assert(BenchGate.loadCanonical(
      new java.io.File(dir.toFile, "nope.json").getPath,
      "/root/testdata/sf0.1") === Map.empty)
    val bad = new java.io.File(dir.toFile, "bad.json")
    java.nio.file.Files.writeString(bad.toPath, "{not json")
    assert(BenchGate.loadCanonical(bad.getPath, "/root/testdata/sf0.1") ===
      Map.empty)
  }

  test("the COMMITTED canonical file is loadable and covers the " +
      "registered surface at sf0.1") {
    val m = BenchGate.loadCanonical("tools/bench_canonical.json",
      "/root/testdata/sf0.1")
    assert(m.nonEmpty, "committed canonical must parse")
    val names = SparkEntry.queries.keySet
    val covered = names.intersect(m.keySet)
    // every canonical entry names a live query, and the overlap is
    // big enough that the gate means something
    assert(m.keySet.subsetOf(names),
      s"stale canonical entries: ${m.keySet.diff(names).take(5)}")
    assert(covered.size >= (names.size * 3) / 4,
      s"canonical covers ${covered.size}/${names.size} queries — " +
        "re-record it (tools/bench_canonical.json) from a quiet window")
  }
}
