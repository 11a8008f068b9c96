package graft.functions

/** Deterministic symmetric eigensolver: CYCLIC Jacobi (fixed pivot
  * order, fixed sweep count bound) — small-d driver-side linear algebra
  * for PCA (q121). d is the embedding dimension (64 here): O(d³) per
  * sweep ≈ 260k flops, microseconds on the driver; the DATA never moves
  * (the d×d covariance arrives pre-reduced from the Covariance
  * aggregator).
  *
  * Determinism contract: given bit-identical input, the pivot order,
  * rotation formulas, final sort (eigenvalue desc, original index asc)
  * and sign convention (largest-|component| positive, ties to the
  * lowest index) are all fixed — no randomness, no data-dependent
  * iteration counts beyond the convergence cutoff. */
object Eigen {

  /** Eigen-decompose symmetric `aIn` (row-major d×d). Returns
    * (eigenvalues, eigenvectors) sorted by eigenvalue DESCENDING;
    * `vectors(k)` is the unit eigenvector for `values(k)`. */
  def jacobi(aIn: Array[Array[Double]], maxSweeps: Int = 30)
      : (Array[Double], Array[Array[Double]]) = {
    val d = aIn.length
    require(aIn.forall(_.length == d), "matrix must be square")
    val a = aIn.map(_.clone())
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)

    def offDiag: Double = {
      var s = 0.0
      var p = 0
      while (p < d) {
        var q = p + 1
        while (q < d) { s += a(p)(q) * a(p)(q); q += 1 }
        p += 1
      }
      s
    }

    var sweep = 0
    while (sweep < maxSweeps && offDiag > 1e-20) {
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          val apq = a(p)(q)
          if (math.abs(apq) > 1e-300) {
            // stable rotation (Golub & Van Loan §8.4): tan via the
            // smaller root, |t| ≤ 1 so c ≥ 1/√2
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * apq)
            val t =
              if (theta >= 0) 1.0 / (theta + math.sqrt(1.0 + theta * theta))
              else 1.0 / (theta - math.sqrt(1.0 + theta * theta))
            val c = 1.0 / math.sqrt(1.0 + t * t)
            val s = t * c
            val app = a(p)(p); val aqq = a(q)(q)
            a(p)(p) = app - t * apq
            a(q)(q) = aqq + t * apq
            a(p)(q) = 0.0; a(q)(p) = 0.0
            var k = 0
            while (k < d) {
              if (k != p && k != q) {
                val akp = a(k)(p); val akq = a(k)(q)
                a(k)(p) = c * akp - s * akq; a(p)(k) = a(k)(p)
                a(k)(q) = s * akp + c * akq; a(q)(k) = a(k)(q)
              }
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

    // sort desc by eigenvalue (original index asc on exact ties), then
    // fix each vector's sign: largest-|component| (lowest index on ties)
    // made positive
    val order = (0 until d).sortBy(i => (-a(i)(i), i))
    val values = order.map(i => a(i)(i)).toArray
    val vectors = order.map { i =>
      val col = Array.tabulate(d)(k => v(k)(i))
      var best = 0
      var k = 1
      while (k < d) { if (math.abs(col(k)) > math.abs(col(best))) best = k; k += 1 }
      if (col(best) < 0) col.map(x => -x) else col
    }.toArray
    (values, vectors)
  }
}
