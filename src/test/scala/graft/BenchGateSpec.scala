package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench regression gate's arithmetic — pure functions of two
  * per-query maps, so the failure modes that cost rounds 11-14 real
  * adjudication time are pinned here as unit tests. */
class BenchGateSpec extends AnyFunSuite {

  private def corpus(n: Int, base: Double = 1.0): Map[String, Double] =
    (1 to n).map(i => s"q$i" -> base * (0.4 + 0.05 * i)).toMap

  test("uniform box scatter flags nothing, even when the control lies (the r14 misfire)") {
    val prev = corpus(40)
    // every query 1.11x slower (new box), control claims the box is
    // 2.4x FASTER — exactly the round-14 cross-box shape that produced
    // 161 false flags under control-normalization
    val now = prev.map { case (k, v) => k -> v * 1.11 }
    val v = BenchGate.evaluate(now, prev, controlScale = 1.0 / 2.4)
    assert(v.regressions.isEmpty,
      s"uniform scatter must not flag: ${v.regressions.take(5)}")
    assert(math.abs(v.medianRatio - 1.11) < 0.01)
    assert(!v.corpusSlowdown, "a box-speed move is not a corpus slowdown")
  }

  test("an injected genuine 2x slowdown on one query IS flagged") {
    val prev = corpus(40)
    val now = prev.map { case (k, v) => k -> (if (k == "q20") v * 2.0 else v * 1.05) }
    val v = BenchGate.evaluate(now, prev, controlScale = 1.0)
    assert(v.regressions.map(_._1) === Seq("q20"))
    val (nowT, prevT) = v.regressions.head._2
    assert(nowT === prev("q20") * 2.0 && prevT === prev("q20"))
  }

  test("one regression still flags on a uniformly slower box") {
    val prev = corpus(40)
    val now = prev.map { case (k, v) => k -> (if (k == "q7") v * 3.0 else v * 1.3) }
    val v = BenchGate.evaluate(now, prev, controlScale = 1.3)
    assert(v.regressions.map(_._1) === Seq("q7"))
  }

  test("a corpus-wide 2x slowdown reports corpusSlowdown instead of 40 per-query flags") {
    val prev = corpus(40)
    val now = prev.map { case (k, v) => k -> v * 2.0 }
    val v = BenchGate.evaluate(now, prev, controlScale = 1.0)
    assert(v.regressions.isEmpty,
      "the median absorbs a uniform move — the corpus flag carries it")
    assert(v.corpusSlowdown, "median 2.0 vs control 1.0 is a code-level slowdown")
  }

  test("sub-300ms previous times neither flag nor vote in the median") {
    val prev = Map("tiny" -> 0.05, "big1" -> 2.0, "big2" -> 3.0)
    val now = Map("tiny" -> 0.4, "big1" -> 2.1, "big2" -> 3.1)
    val v = BenchGate.evaluate(now, prev, controlScale = 1.0)
    assert(v.regressions.isEmpty, "0.05s -> 0.4s is scheduling noise, not a regression")
    assert(v.nShared === 2)
  }

  test("too few shared queries falls back to the clamped control") {
    val prev = Map("a" -> 1.0, "b" -> 1.0)
    val now = Map("a" -> 0.5, "b" -> 4.0)
    // control says the box is 10x faster; the clamp keeps the scale at
    // 0.4 so the genuine 4x query still flags
    val v = BenchGate.evaluate(now, prev, controlScale = 0.1)
    assert(v.nShared === 2)
    assert(v.regressions.map(_._1) === Seq("b"))
  }

  test("disjoint corpora (renamed queries, new sf) produce no flags and no median") {
    val v = BenchGate.evaluate(Map("x" -> 1.0), Map("y" -> 1.0), controlScale = 1.0)
    assert(v.regressions.isEmpty && v.nShared === 0 && !v.corpusSlowdown)
  }

  test("worst normalized ratio sorts first") {
    val prev = corpus(40)
    val now = prev.map { case (k, v) =>
      k -> (if (k == "q5") v * 2.0 else if (k == "q6") v * 5.0 else v)
    }
    val v = BenchGate.evaluate(now, prev, controlScale = 1.0)
    assert(v.regressions.map(_._1) === Seq("q6", "q5"))
  }
}
