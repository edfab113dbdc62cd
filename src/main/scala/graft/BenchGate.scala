package graft

/** PURE regression-gate arithmetic for [[Bench]] — separated so the
  * flag logic itself is unit-testable ([[graft.BenchGateSpec]]).
  *
  * History: the round-12 ABSOLUTE gate flagged phantom regressions
  * whenever the box speed moved; the round-14 BOX-CONTROL gate misfired
  * 161 false flags on its first cross-box run, because a synthetic
  * CPU+shuffle probe doesn't track what the corpus is actually bound
  * by (per-query fixed overheads: job scheduling, small-file IO).
  *
  * Round-15 design — the normalizer is the MEDIAN RATIO of queries
  * shared between the two runs. It is self-calibrating: whatever mix
  * of CPU speed, FS latency, and scheduler overhead separates the two
  * boxes, the corpus median measures exactly that mix. One genuine
  * regression cannot move the median of dozens of shared queries, so
  * it still flags; a CORPUS-WIDE regression moves the median instead
  * of the flags, so it is reported separately by comparing the median
  * against the synthetic box control — engine code cannot slow the
  * control down, so `median >> control` means the corpus itself (the
  * code), not the box, regressed. */
object BenchGate {

  final case class Verdict(
      /** name -> (now, prev), worst normalized ratio first. */
      regressions: Seq[(String, (Double, Double))],
      /** The normalizer actually used (median shared ratio, or the
        * clamped control fallback when too few queries are shared). */
      medianRatio: Double,
      nShared: Int,
      /** The whole corpus moved >1.4× more than the box control did —
        * a code-level slowdown the per-query gate cannot see. */
      corpusSlowdown: Boolean)

  def median(xs: Seq[Double]): Double = {
    require(xs.nonEmpty, "median of nothing")
    val s = xs.sorted
    s(s.size / 2)
  }

  private def clampControl(c: Double): Double =
    math.min(2.5, math.max(0.4, c))

  /** Flag queries slower than `threshold` × the corpus-normalized
    * previous time. Previous times ≤ `minPrevSec` are pure noise at
    * corpus scale and never participate (neither in the median nor as
    * flag candidates). `controlScale` = controlNow / controlPrev
    * (pass 1.0 when the previous record carries no control). */
  def evaluate(
      now: Map[String, Double],
      prev: Map[String, Double],
      controlScale: Double,
      threshold: Double = 1.5,
      minPrevSec: Double = 0.3): Verdict = {
    val sharedRatios = now.toSeq.flatMap { case (k, v) =>
      prev.get(k).filter(_ > minPrevSec).map(old => v / old)
    }
    // below ~8 shared queries a median is an anecdote — fall back to
    // the box control, clamped so a pathological control reading can't
    // mask a real 2×+ regression
    val normalizer =
      if (sharedRatios.size >= 8) median(sharedRatios)
      else clampControl(controlScale)
    val regs = now.toSeq.collect {
      case (k, v) if prev.get(k).exists(old =>
          old > minPrevSec && v > threshold * old * normalizer) =>
        k -> (v, prev(k))
    }.sortBy { case (_, (n, o)) => -(n / o) }
    // corpus-level flag needs BOTH conditions: the corpus moved a lot
    // in absolute terms AND more than the box control explains — the
    // control alone is unreliable in both directions (the r14 lesson),
    // so a sub-1.4× corpus move never flags no matter what it claims
    val corpusSlow = sharedRatios.size >= 8 && normalizer > 1.4 &&
      normalizer > 1.4 * clampControl(controlScale)
    Verdict(regs, normalizer, sharedRatios.size, corpusSlow)
  }
}
