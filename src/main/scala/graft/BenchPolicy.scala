package graft

/** The measurement-robustness policy behind [[Bench]], extracted pure so
  * the one code path that decides what the official artifact reports is
  * unit-tested (BenchPolicySpec) rather than exercised only by full
  * bench runs.
  *
  * Two-tier anomaly trigger:
  *  - a query WITH a checked-in steady-state reference retries when a
  *    measurement exceeds 3x its own steady time, floored at 2 s so
  *    sub-second jitter never retries (steady times are controlled
  *    SPARK_GRAFT_REPEAT=2 figures — a genuine 3x move of steady cost
  *    would be a code change, which regenerates the file);
  *  - a query WITHOUT one (new this round, or a bench at an SF the file
  *    does not pin) falls back to the cross-query family rule: over an
  *    absolute 12 s AND over 4x the running median of queries measured
  *    so far — genuinely heavy queries move the median with them, so
  *    real load growth never trips it.
  * A triggered query is measured twice more and the MEDIAN of the three
  * observations kept — the standard robust estimator: neither the stall
  * nor the luckiest run. */
object BenchPolicy {

  /** Parse `plans/bench_steady.tsv`-format lines into the per-query
    * steady map. The file pins the SF directory it was measured at on a
    * `# sf=<dir>` line; when that does not match the measured SF (after
    * `canon`, so trailing slashes or symlinks cannot defeat the check)
    * the whole file is ignored — 3x a DIFFERENT scale factor's time is
    * not an anomaly bound. Malformed lines are skipped, not fatal: a
    * hand-edited baseline must degrade to the family rule, never crash
    * the bench. */
  def parseSteady(lines: Seq[String], sfDir: String,
      canon: String => String): Map[String, Double] = {
    val sfOk = lines.find(_.startsWith("# sf="))
      .map(_.stripPrefix("# sf="))
      .exists(s => canon(s) == canon(sfDir))
    if (!sfOk) Map.empty
    else lines.filterNot(_.startsWith("#")).flatMap { l =>
      l.split("\t") match {
        case Array(n, t) => scala.util.Try(n -> t.toDouble).toOption
        case _ => None
      }
    }.toMap
  }

  /** The size/2-index median of the sorted sequence (exact middle for
    * odd sizes, the upper of the two middles for even) — the exact
    * estimator the retry keeps, shared so the trigger's running-median
    * fallback and the kept value can never use different definitions. */
  def median(xs: Seq[Double]): Double = {
    require(xs.nonEmpty, "median of nothing")
    val s = xs.sorted
    s(s.size / 2)
  }

  /** Should this single-shot measurement be re-measured? `priorTimes`
    * are the kept times of queries already measured this run (the
    * family-rule baseline). */
  def anomalous(steady: Map[String, Double], name: String,
      elapsed: Double, priorTimes: Iterable[Double]): Boolean =
    steady.get(name) match {
      case Some(s) => elapsed > math.max(3.0 * s, 2.0)
      case None => priorTimes.nonEmpty && elapsed > 12.0 &&
        elapsed > 4 * median(priorTimes.toSeq)
    }
}
