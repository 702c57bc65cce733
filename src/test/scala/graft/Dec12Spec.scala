package graft

import java.math.{BigDecimal => JBigDecimal}

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{Dec12Acc => Acc}
import graft.functions.Dec12Acc

/** The fast decimal(30,12) accumulator must be BIT-IDENTICAL to the
  * reference per-term BigDecimal chain on every input — including the
  * values engineered to sit ON or NEAR the half-up rounding boundary
  * (where the fast path must detect ambiguity and fall back). */
class Dec12Spec extends AnyFunSuite {

  private def reference(xs: Seq[Double]): JBigDecimal =
    xs.foldLeft(JBigDecimal.valueOf(0L, 12))((a, x) =>
      a.add(Dec12Acc.cast12(x)))

  private def fast(xs: Seq[Double]): JBigDecimal = {
    val acc = new Acc
    xs.foreach(acc.add)
    acc.value
  }

  test("parity on typical gram-term magnitudes (deterministic pseudo-random)") {
    val rnd = new scala.util.Random(42)
    val xs = Seq.fill(20000)((rnd.nextDouble() - 0.5) * 4.0)
    assert(fast(xs).compareTo(reference(xs)) === 0)
  }

  test("parity on constructed half-up boundary ties and near-ties") {
    val xs = Seq(
      0.5e-12, -0.5e-12, 1.5e-12, 2.5e-12,          // exact .5 ulp-of-scale
      1.0000000000005, -1.0000000000005,            // .5 at the 13th digit
      0.1, 0.2, 0.3, 0.7,                           // classic non-dyadics
      1.0 / 3.0, 2.0 / 3.0, -1.0 / 3.0,
      1e-13, -1e-13, 4.9999999999999e-13,           // below one scale ulp
      123456.0000000000005, -123456.0000000000005,  // big + boundary
      19.999999999999, -19.999999999999,            // near fast-path bound
      25.0, -25.0, 3.0e13, -3.0e13, 5.0e6,          // past the bound
      0.0, -0.0)
    assert(fast(xs).compareTo(reference(xs)) === 0)
    // each individually too (no cancellation masking)
    xs.foreach { x =>
      assert(fast(Seq(x)).compareTo(reference(Seq(x))) === 0, s"x=$x")
    }
  }

  test("long accumulator spill: many large same-sign terms stay exact") {
    // 19.5+ε terms: unscaled ~1.95e13 each; 10^6 of them crosses the
    // 4.5e18 spill threshold several times over
    val xs = Seq.fill(300000)(19.500000001)
    assert(fast(xs).compareTo(reference(xs)) === 0)
  }
}
