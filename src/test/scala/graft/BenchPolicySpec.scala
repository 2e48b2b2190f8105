package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench measurement-robustness policy, pinned pure: this is the
  * code that decides what the official per-round artifact reports, so
  * its trigger boundaries live under unit test instead of only full
  * bench runs. */
class BenchPolicySpec extends AnyFunSuite {

  private val id = (s: String) => s

  test("steady file applies only at its pinned SF (canonicalized)") {
    val lines = Seq(
      "# per-query steady-state seconds",
      "# sf=/data/sf0.1",
      "q01\t0.152",
      "v23\t4.158")
    assert(BenchPolicy.parseSteady(lines, "/data/sf0.1", id) ===
      Map("q01" -> 0.152, "v23" -> 4.158))
    // different SF: the whole file is ignored, fallback rule applies
    assert(BenchPolicy.parseSteady(lines, "/data/sf0.01", id) === Map.empty)
    // canonicalization decides the match (trailing slash, symlinks)
    assert(BenchPolicy.parseSteady(lines, "/data/sf0.1/",
      _.stripSuffix("/")).nonEmpty)
  }

  test("malformed baseline lines degrade to fewer entries, never a crash") {
    val lines = Seq("# sf=/d", "ok\t1.5", "no-tab-line", "bad\tNaNish",
      "too\tmany\tfields", "")
    val m = BenchPolicy.parseSteady(lines, "/d", id)
    assert(m === Map("ok" -> 1.5))
  }

  test("steady-referenced trigger: 3x own steady with a 2 s floor") {
    val steady = Map("fast" -> 0.2, "heavy" -> 4.0)
    // 3x a sub-second steady stays under the floor — jitter never retries
    assert(!BenchPolicy.anomalous(steady, "fast", 1.9, Seq(0.5)))
    assert(BenchPolicy.anomalous(steady, "fast", 2.1, Seq(0.5)))
    // heavy query: the 3x bound governs, not the floor
    assert(!BenchPolicy.anomalous(steady, "heavy", 11.9, Nil))
    assert(BenchPolicy.anomalous(steady, "heavy", 12.1, Nil))
  }

  test("family fallback: over 12 s AND over 4x the running median") {
    val none = Map.empty[String, Double]
    // no prior measurements: never triggers (nothing to compare against)
    assert(!BenchPolicy.anomalous(none, "q", 100.0, Nil))
    val prior = Seq(1.0, 2.0, 3.0) // lower median = 2.0
    assert(!BenchPolicy.anomalous(none, "q", 7.9, prior), "under 12 s")
    assert(!BenchPolicy.anomalous(none, "q", 12.5,
      Seq(4.0, 5.0, 6.0)), "over 12 s but under 4x median 5")
    assert(BenchPolicy.anomalous(none, "q", 12.5, prior))
    // a genuinely heavy family moves the median with it
    assert(!BenchPolicy.anomalous(none, "q", 30.0, Seq(10.0, 11.0, 12.0)))
  }

  test("median is the size/2-index median, shared by trigger and kept value") {
    assert(BenchPolicy.median(Seq(3.0, 1.0, 2.0)) === 2.0)
    assert(BenchPolicy.median(Seq(4.0, 1.0, 2.0, 3.0)) === 3.0) // upper of even
    assert(BenchPolicy.median(Seq(7.0)) === 7.0)
    intercept[IllegalArgumentException](BenchPolicy.median(Nil))
  }
}
