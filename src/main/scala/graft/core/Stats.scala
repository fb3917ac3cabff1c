package graft.core

import breeze.numerics.lgamma

/** Small-sample test statistics for the correlation reports — the
  * engine-side stand-in for scipy.stats.spearmanr's p-value
  * (/root/reference/graphem/benchmark.py:173-194 reports (rho, p) per
  * measure; visualization.py:29-33 prints both).
  *
  * The p-value uses the same t-approximation scipy uses for spearmanr:
  * t = rho * sqrt((n-2)/(1-rho^2)) against Student's t with n-2 degrees
  * of freedom, two-sided. The t CDF is evaluated through the
  * regularized incomplete beta function (continued-fraction expansion —
  * standard public-domain numerics, e.g. NIST DLMF 8.17).
  */
object Stats {

  /** Continued fraction for the incomplete beta (modified Lentz). */
  private def betacf(a: Double, b: Double, x: Double): Double = {
    val MaxIter = 300
    val Eps = 1e-15
    val FpMin = 1e-300
    val qab = a + b; val qap = a + 1.0; val qam = a - 1.0
    var c = 1.0
    var d = 1.0 - qab * x / qap
    if (math.abs(d) < FpMin) d = FpMin
    d = 1.0 / d
    var h = d
    var m = 1
    var converged = false
    while (m <= MaxIter && !converged) {
      val m2 = 2 * m
      var aa = m * (b - m) * x / ((qam + m2) * (a + m2))
      d = 1.0 + aa * d
      if (math.abs(d) < FpMin) d = FpMin
      c = 1.0 + aa / c
      if (math.abs(c) < FpMin) c = FpMin
      d = 1.0 / d
      h *= d * c
      aa = -(a + m) * (qab + m) * x / ((a + m2) * (qap + m2))
      d = 1.0 + aa * d
      if (math.abs(d) < FpMin) d = FpMin
      c = 1.0 + aa / c
      if (math.abs(c) < FpMin) c = FpMin
      d = 1.0 / d
      val del = d * c
      h *= del
      if (math.abs(del - 1.0) < Eps) converged = true
      m += 1
    }
    h
  }

  /** Regularized incomplete beta I_x(a, b). */
  def regIncBeta(a: Double, b: Double, x: Double): Double = {
    if (x <= 0.0) 0.0
    else if (x >= 1.0) 1.0
    else {
      val ln = lgamma(a + b) - lgamma(a) - lgamma(b) +
        a * math.log(x) + b * math.log1p(-x)
      val front = math.exp(ln)
      if (x < (a + 1.0) / (a + b + 2.0)) front * betacf(a, b, x) / a
      else 1.0 - front * betacf(b, a, 1.0 - x) / b
    }
  }

  /** Two-sided p-value of |t| against Student's t with `df` degrees of
    * freedom: P(|T| >= t) = I_{df/(df+t^2)}(df/2, 1/2).
    */
  def studentTwoSidedP(t: Double, df: Double): Double = {
    if (df <= 0 || t.isNaN) Double.NaN
    else regIncBeta(df / 2.0, 0.5, df / (df + t * t))
  }

  /** scipy-compatible Spearman p-value from (rho, n): t-approximation,
    * two-sided. NaN for n < 3 or undefined rho; 0 at |rho| = 1.
    */
  def spearmanPValue(rho: Double, n: Long): Double = {
    if (n < 3 || rho.isNaN) Double.NaN
    else if (math.abs(rho) >= 1.0) 0.0
    else {
      val df = (n - 2).toDouble
      val t = rho * math.sqrt(df / (1.0 - rho * rho))
      studentTwoSidedP(math.abs(t), df)
    }
  }
}
