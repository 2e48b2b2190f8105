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
    // 3x a sub-second steady stays under both floors — jitter never
    // retries (0.2 s steady at 1.5 s is 7.5x but only +1.3 s absolute)
    assert(!BenchPolicy.anomalous(steady, "fast", 1.5, Seq(0.5)))
    assert(BenchPolicy.anomalous(steady, "fast", 2.1, Seq(0.5)))
    // heavy query: the 3x bound governs, not the floor
    assert(!BenchPolicy.anomalous(steady, "heavy", 11.9, Nil))
    assert(BenchPolicy.anomalous(steady, "heavy", 12.1, Nil))
  }

  test("proportional floor: sub-2 s stalls over 1.5 s excess re-measure") {
    // the v02 shape from round 9: steady 0.536 s published at 1.77 s =
    // 3.3x, under the bare 2 s floor. The proportional arm triggers at
    // over 3x AND over 1.5 s absolute excess.
    val steady = Map("v02" -> 0.5, "tiny" -> 0.3)
    assert(BenchPolicy.anomalous(steady, "v02", 2.05, Nil), "over hard floor")
    assert(!BenchPolicy.anomalous(steady, "v02", 1.9, Nil),
      "3.8x but excess 1.4 s: under both floors")
    assert(BenchPolicy.anomalous(steady, "v02", 2.01, Nil),
      "4x and excess 1.51 s: proportional arm fires")
    // sub-second jitter still never trips: 0.3 -> 1.0 s is 3.3x but
    // only +0.7 s absolute
    assert(!BenchPolicy.anomalous(steady, "tiny", 1.0, Nil))
    assert(BenchPolicy.anomalous(steady, "tiny", 1.81, Nil),
      "6x and excess 1.51 s")
  }

  test("escalation: 2-of-3 stalls keep observing until the median clears") {
    // the d16 shape from round 9: steady 1.49 s, observations
    // [8.74, 5.24, 1.45] — median-of-three 5.24 is itself 3.5x steady
    val steady = Map("d16" -> 1.49)
    val none = Nil
    // fewer than three observations: always take more
    assert(BenchPolicy.needMore(steady, "d16", Seq(8.74), none))
    assert(BenchPolicy.needMore(steady, "d16", Seq(8.74, 5.24), none))
    // three observed, median still a stall -> escalate
    assert(BenchPolicy.needMore(steady, "d16", Seq(8.74, 5.24, 1.45), none))
    // four observed, even-size median (upper middle) is STILL the stall
    // value -> one more
    assert(BenchPolicy.needMore(steady, "d16",
      Seq(8.74, 5.24, 1.45, 1.50), none))
    // five observed: hard cap regardless of median
    assert(!BenchPolicy.needMore(steady, "d16",
      Seq(8.74, 5.24, 1.45, 1.50, 1.48), none))
    // ...and the kept value at the cap is now the steady-shaped median
    assert(BenchPolicy.median(Seq(8.74, 5.24, 1.45, 1.50, 1.48)) === 1.50)
    // clean 1-of-3 shape stops at three, exactly as before
    assert(!BenchPolicy.needMore(steady, "d16", Seq(8.74, 1.45, 1.50), none))
    // no-steady fallback: family rule governs the escalation median too
    assert(!BenchPolicy.needMore(Map.empty, "q",
      Seq(20.0, 1.0, 1.2), Seq(1.0, 1.1, 1.2)), "median 1.2 under 12 s")
    assert(BenchPolicy.needMore(Map.empty, "q",
      Seq(20.0, 19.0, 1.2), Seq(1.0, 1.1, 1.2)), "median 19 over 4x family")
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

  test("twin dir name: same basename, different path -> different twin") {
    val a = BenchPolicy.twinDirName("/root/testdata/sf0.1")
    val b = BenchPolicy.twinDirName("/mnt/other/sf0.1")
    assert(a.startsWith("sfwarm_sf0.1_"), a)
    assert(b.startsWith("sfwarm_sf0.1_"), b)
    assert(a !== b, "two corpora sharing a basename reused one twin dir")
    // deterministic: the same canonical path always maps to the same twin
    assert(a === BenchPolicy.twinDirName("/root/testdata/sf0.1"))
    // degenerate inputs still produce a usable name
    assert(BenchPolicy.twinDirName("").startsWith("sfwarm_"))
  }
}
