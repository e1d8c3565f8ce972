package graft.core

/** (Nearly-)correctly-rounded pow for positive finite bases.
  *
  * Why: the reference's proj4 runs under node/V8 whose Math.pow is the
  * platform's correctly-rounded pow (glibc ≥ 2.28), while the JVM offers
  * only fdlibm (StrictMath, ≤1 ulp error) and a platform intrinsic
  * (Math.pow, also ≤1 ulp). Lambert Conformal Conic is the one projection
  * whose formulas use general-exponent pow (t^ns, t^(e/2)), so a 1-ulp pow
  * difference breaks the byte-for-byte .prj parity contract on some
  * parameter sets (found by the conic fuzz suite).
  *
  * Method: double-double arithmetic (Dekker/Knuth error-free transforms,
  * exact products via Math.fma) — log(x) as an fdlibm seed refined by one
  * Newton step against a ~2^-95-accurate double-double exp (Taylor with
  * term recurrence, no coefficient tables), then exp(y·log x). Intermediate
  * accuracy ~2^-90, so the final rounding matches the true correctly-rounded
  * result except when the exact value sits within ~2^-90 of a rounding
  * boundary (probability ~2^-37 per call) — far beyond anything a fixed
  * test corpus can hit. Verified bit-for-bit against glibc pow over
  * millions of random inputs in the projection domain (see PowCRSpec and
  * scripts/powcr_check.py).
  *
  * Domain: x > 0 finite, y finite (all the conic formulas guarantee this);
  * y == 2 short-circuits to x·x (exact in every libm).
  */
object PowCR {

  // ---- error-free transforms ----
  @inline private def quickSumHi(a: Double, b: Double): Double = a + b
  // returns (s, e) packed as two slots of a 2-array-free computation:
  // we carry pairs explicitly through locals instead of allocating.

  /** pow(x, y) rounded like a correctly-rounded libm (glibc/V8). */
  def pow(x: Double, y: Double): Double = {
    require(x >= 0 && !x.isInfinite && !y.isNaN && !y.isInfinite,
      s"PowCR domain: x>=0 finite, y finite (got x=$x y=$y)")
    if (x == 0.0) return if (y > 0) 0.0 else if (y == 0) 1.0 else Double.PositiveInfinity
    if (y == 2.0) return x * x
    if (y == 1.0) return x
    if (y == 0.0) return 1.0
    if (x == 1.0) return 1.0
    // w = y * log(x) in double-double
    val (lhi, llo) = logDD(x)
    val (whi0, wlo0) = ddMulD(lhi, llo, y)
    // overflow/underflow guard (not reachable from the conic formulas)
    if (whi0 > 709.9) return Double.PositiveInfinity
    if (whi0 < -745.0) return 0.0
    val (rhi, rlo) = expDD(whi0, wlo0)
    rhi + rlo
  }

  /** log(x) as a double-double: fdlibm seed + one Newton step vs expDD. */
  private def logDD(x: Double): (Double, Double) = {
    val l0 = StrictMath.log(x)
    val (ehi, elo) = expDD(l0, 0.0)
    // d = (x - e)/e in double-double; log(x) = l0 + log(1+d) ≈ l0 + d - d²/2
    val (nhi, nlo) = ddAdd(x, 0.0, -ehi, -elo)
    val (dhi, dlo) = ddDiv(nhi, nlo, ehi, elo)
    val (d2hi, d2lo) = ddMul(dhi, dlo, dhi, dlo)
    val (chi, clo) = ddAdd(dhi, dlo, -0.5 * d2hi, -0.5 * d2lo)
    ddAdd(l0, 0.0, chi, clo)
  }

  private val Ln2Hi = 0.6931471805599453
  private val Ln2Lo = 2.3190468138462996e-17

  /** exp of a double-double, result as double-double (relative ~2^-95). */
  private def expDD(zhi: Double, zlo: Double): (Double, Double) = {
    val k = Math.rint(zhi / Ln2Hi)
    // r = z - k*ln2 (double-double)
    val (mhi, mlo) = ddMulD(Ln2Hi, Ln2Lo, -k)
    var (rhi, rlo) = ddAdd(zhi, zlo, mhi, mlo)
    // Taylor with term recurrence: term_{n} = term_{n-1} * r / n
    var sumHi = 1.0; var sumLo = 0.0
    var termHi = 1.0; var termLo = 0.0
    var n = 1
    while (n <= 30) {
      val (t1, t2) = ddMul(termHi, termLo, rhi, rlo)
      val (t3, t4) = ddDivD(t1, t2, n.toDouble)
      termHi = t3; termLo = t4
      val (s1, s2) = ddAdd(sumHi, sumLo, termHi, termLo)
      sumHi = s1; sumLo = s2
      n += 1
    }
    val ki = k.toInt
    (Math.scalb(sumHi, ki), Math.scalb(sumLo, ki))
  }

  // ---- double-double primitives ----

  /** a + b with exact error via Knuth two-sum, merged for two dd operands. */
  private def ddAdd(ahi: Double, alo: Double, bhi: Double, blo: Double): (Double, Double) = {
    var s = ahi + bhi
    val bb = s - ahi
    var e = (ahi - (s - bb)) + (bhi - bb)
    e += alo + blo
    val hi = s + e
    val lo = e - (hi - s)
    (hi, lo)
  }

  /** dd × dd (fma-exact products). */
  private def ddMul(ahi: Double, alo: Double, bhi: Double, blo: Double): (Double, Double) = {
    val p = ahi * bhi
    var e = Math.fma(ahi, bhi, -p)
    e += ahi * blo + alo * bhi
    val hi = p + e
    val lo = e - (hi - p)
    (hi, lo)
  }

  /** dd × double. */
  private def ddMulD(ahi: Double, alo: Double, b: Double): (Double, Double) = {
    val p = ahi * b
    var e = Math.fma(ahi, b, -p)
    e += alo * b
    val hi = p + e
    val lo = e - (hi - p)
    (hi, lo)
  }

  /** dd ÷ dd (two Newton-ish quotient corrections). */
  private def ddDiv(ahi: Double, alo: Double, bhi: Double, blo: Double): (Double, Double) = {
    val q1 = ahi / bhi
    val (m1, m2) = ddMulD(bhi, blo, q1)
    val (r1, r2) = ddAdd(ahi, alo, -m1, -m2)
    val q2 = r1 / bhi
    val (m3, m4) = ddMulD(bhi, blo, q2)
    val (s1, s2) = ddAdd(r1, r2, -m3, -m4)
    val q3 = s1 / bhi
    val (hi0, lo0) = ddAdd(q1, 0.0, q2, 0.0)
    ddAdd(hi0, lo0, q3, 0.0)
  }

  /** dd ÷ double. */
  private def ddDivD(ahi: Double, alo: Double, b: Double): (Double, Double) = {
    val q1 = ahi / b
    val p = q1 * b
    val pe = Math.fma(q1, b, -p)
    val (r1, r2) = ddAdd(ahi, alo, -p, -pe)
    val q2 = (r1 + r2) / b
    val hi = q1 + q2
    val lo = q2 - (hi - q1)
    (hi, lo)
  }
}
