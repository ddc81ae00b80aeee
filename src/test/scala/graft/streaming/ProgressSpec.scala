package graft.streaming

import org.scalacheck.{Gen, Prop, Test => ScTest}
import org.scalatest.funsuite.AnyFunSuite

/** ScalaCheck properties for the A8 progress arithmetic (monotone,
  * producer-capped, ≤100 — reference streams/pipeline/progress.py). */
class ProgressSpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val res = ScTest.check(ScTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, res.status.toString)
  }

  private val pct = Gen.chooseNum(-10.0, 140.0) // includes out-of-range raw inputs

  test("update is monotone non-decreasing") {
    check(Prop.forAll(pct, pct, pct) { (prev, raw, prod) =>
      Progress.update(prev, raw, prod) >= prev
    })
  }

  test("update never exceeds 100 once in range") {
    check(Prop.forAll(Gen.chooseNum(0.0, 100.0), pct, pct) { (prev, raw, prod) =>
      Progress.update(prev, raw, prod) <= 100.0 || Progress.update(prev, raw, prod) == prev
    })
  }

  test("update is capped by producer progress unless previously higher") {
    check(Prop.forAll(Gen.chooseNum(0.0, 100.0), pct, Gen.chooseNum(0.0, 100.0)) {
      (prev, raw, prod) =>
        val v = Progress.update(prev, raw, prod)
        v <= math.max(prev, prod)
    })
  }

  test("a sequence of updates is monotone and converges under finalize") {
    check(Prop.forAll(Gen.listOfN(30, Gen.zip(pct, Gen.chooseNum(0.0, 100.0)))) { steps =>
      val trace = steps.scanLeft(0.0) { case (p, (raw, prod)) => Progress.update(p, raw, prod) }
      val monotone = trace.sliding(2).forall { case Seq(a, b) => b >= a; case _ => true }
      val fin = Progress.finalizeValue(trace.last, 100.0)
      monotone && fin == 100.0
    })
  }

  test("force-update fires near completion") {
    assert(Progress.shouldForceUpdate(96.0))
    assert(Progress.shouldForceUpdate(100.0))
    assert(!Progress.shouldForceUpdate(90.0))
  }
}
