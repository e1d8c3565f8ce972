package graft.tools

/** Emits seeded (x, y, PowCR.pow(x,y)) triples as raw IEEE bits for the
  * cross-language glibc comparison (scripts/powcr_check.py): the parity
  * contract is bit-equality with the correctly-rounded platform pow that
  * node/V8 uses. runMain graft.tools.PowCheck [n]
  */
object PowCheck {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 200000
    val rnd = new scala.util.Random(7)
    val out = new java.io.PrintWriter(new java.io.BufferedWriter(
      new java.io.OutputStreamWriter(System.out), 1 << 20))
    var i = 0
    while (i < n) {
      // projection-domain-ish: bases spanning (1e-3, 1e3), exponents (-5, 5)
      val x = Math.exp(rnd.nextDouble() * 14 - 7)
      val y = rnd.nextDouble() * 10 - 5
      out.println(java.lang.Double.doubleToLongBits(x).toString + " " +
        java.lang.Double.doubleToLongBits(y) + " " +
        java.lang.Double.doubleToLongBits(graft.core.PowCR.pow(x, y)))
      i += 1
    }
    out.flush()
  }
}
