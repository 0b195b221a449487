package graft.operators

/** Driver-side eigensolver for PCA over embedding moment matrices (q95).
  *
  * Scale contract: the DISTRIBUTED part of PCA is the one-pass,
  * map-side-collapsed moment-matrix aggregate ([[graft.queries.Similarity
  * .secondMoments]]); this solver only ever sees the resulting d x d
  * matrix (d = embedding width, 64 here — a few KB), so it is O(d^3)
  * driver work INDEPENDENT of corpus size. The projection that follows is
  * again distributed (codegen dot products). This is the classic
  * "aggregate → tiny driver solve → broadcast back" split; nothing here
  * touches data-sized state.
  *
  * Determinism: cyclic Jacobi with a FIXED sweep order (row-major upper
  * triangle), a fixed sweep count bound, and a pinned sign convention
  * (the coordinate with the largest |value| — first index on ties — is
  * made positive). Same input matrix → bit-identical axes on every run
  * and every JVM, which is what lets q95 be re-run comparable and its
  * spec assert exact reproducibility.
  */
object Pca {

  /** Eigen-decomposition of a symmetric d x d matrix by cyclic Jacobi
    * rotations. Returns (eigenvalue, unit eigenvector) pairs sorted by
    * eigenvalue descending (ties: ascending original column index, which
    * the stable sort preserves).
    */
  def jacobiEigen(
      sym: Array[Array[Double]],
      maxSweeps: Int = 64,
      tol: Double = 1e-12): Seq[(Double, Array[Double])] = {
    val d = sym.length
    require(sym.forall(_.length == d), "matrix must be square")
    // work on a copy; v accumulates the rotations (columns = eigenvectors)
    val a = Array.tabulate(d, d)((i, j) => sym(i)(j))
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)

    def offDiagNorm(): Double = {
      var s = 0.0
      var i = 0
      while (i < d) {
        var j = i + 1
        while (j < d) { s += a(i)(j) * a(i)(j); j += 1 }
        i += 1
      }
      math.sqrt(s)
    }

    var sweep = 0
    while (sweep < maxSweeps && offDiagNorm() > tol) {
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          val apq = a(p)(q)
          if (math.abs(apq) > tol / (d * d)) {
            // classic two-sided rotation zeroing a(p)(q)
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * apq)
            val t = math.signum(theta) match {
              case 0.0 => 1.0 / (theta + math.sqrt(theta * theta + 1.0))
              case s0 => s0 / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
            }
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val s = t * c
            var k = 0
            while (k < d) {
              val akp = a(k)(p); val akq = a(k)(q)
              a(k)(p) = c * akp - s * akq
              a(k)(q) = s * akp + c * akq
              k += 1
            }
            k = 0
            while (k < d) {
              val apk = a(p)(k); val aqk = a(q)(k)
              a(p)(k) = c * apk - s * aqk
              a(q)(k) = s * apk + c * aqk
              k += 1
            }
            k = 0
            while (k < d) {
              val vkp = v(k)(p); val vkq = v(k)(q)
              v(k)(p) = c * vkp - s * vkq
              v(k)(q) = s * vkp + c * vkq
              k += 1
            }
          }
          q += 1
        }
        p += 1
      }
      sweep += 1
    }

    val pairs = (0 until d).map { j =>
      val vec = Array.tabulate(d)(i => v(i)(j))
      // pinned sign: largest-|component| coordinate (first on ties) positive
      var best = 0
      var i = 1
      while (i < d) { if (math.abs(vec(i)) > math.abs(vec(best))) best = i; i += 1 }
      if (vec(best) < 0) { i = 0; while (i < d) { vec(i) = -vec(i); i += 1 } }
      (a(j)(j), vec)
    }
    pairs.sortBy { case (lambda, _) => -lambda }
  }
}
