package graft.ml

/** Exact (O(n²)) t-SNE for driver-collected bounded samples — the engine
  * contract for M6 (SURVEY.md §2.8): the reference never reduces more than
  * ~500 rows/group (caps via L1), so the input here is small by
  * construction; the distributed default for reduce2d is PCA.
  *
  * Mirrors the reference's knobs (src/analyze_embedding_with_tsne.py:59-77):
  * perplexity clamped to min(p, max(5, n-1)), seeded, gradient descent with
  * momentum and early exaggeration. Deterministic for a fixed seed —
  * correctness is asserted on shape/determinism/neighborhood preservation,
  * never on exact coordinates (SURVEY.md §7.3).
  */
object Tsne {

  def fitTransform(
      x: Array[Array[Double]],
      perplexity: Double = 30.0,
      iterations: Int = 500,
      seed: Long = 42L,
      learningRate: Double = -1.0): Array[Array[Double]] = {
    val n = x.length
    if (n == 0) return Array.empty
    if (n == 1) return Array(Array(0.0, 0.0))
    val perp = math.min(perplexity, math.max(5.0, (n - 1).toDouble))
    // lr=auto (the reference's setting): max(n / early_exaggeration / 4, 50)
    // — a fixed large lr diverges on small/unstructured inputs
    val eta = if (learningRate > 0) learningRate else math.max(n / 12.0 / 4.0, 50.0)

    // pairwise squared distances
    val d2 = Array.ofDim[Double](n, n)
    var i = 0
    while (i < n) {
      var j = i + 1
      while (j < n) {
        var s = 0.0
        var k = 0
        while (k < x(i).length) { val dl = x(i)(k) - x(j)(k); s += dl * dl; k += 1 }
        d2(i)(j) = s; d2(j)(i) = s
        j += 1
      }
      i += 1
    }

    // binary-search per-row precision for target perplexity → P matrix
    val p = Array.ofDim[Double](n, n)
    val logU = math.log(perp)
    i = 0
    while (i < n) {
      var beta = 1.0
      var betaMin = Double.NegativeInfinity
      var betaMax = Double.PositiveInfinity
      var iter = 0
      while (iter < 50) {
        var sum = 0.0
        var hTerm = 0.0
        var j = 0
        while (j < n) {
          if (j != i) {
            val e = math.exp(-d2(i)(j) * beta)
            sum += e
            hTerm += beta * d2(i)(j) * e
          }
          j += 1
        }
        val h = if (sum > 0) math.log(sum) + hTerm / sum else 0.0
        val diff = h - logU
        if (math.abs(diff) < 1e-5) iter = 50
        else {
          if (diff > 0) { betaMin = beta; beta = if (betaMax.isInfinite) beta * 2 else (beta + betaMax) / 2 }
          else { betaMax = beta; beta = if (betaMin.isInfinite) beta / 2 else (beta + betaMin) / 2 }
          iter += 1
        }
      }
      var j = 0
      var sum = 0.0
      while (j < n) { if (j != i) { p(i)(j) = math.exp(-d2(i)(j) * beta); sum += p(i)(j) }; j += 1 }
      j = 0
      while (j < n) { if (sum > 0) p(i)(j) /= sum; j += 1 }
      i += 1
    }
    // symmetrize + normalize
    val pSym = Array.ofDim[Double](n, n)
    var total = 0.0
    i = 0
    while (i < n) {
      var j = 0
      while (j < n) { pSym(i)(j) = (p(i)(j) + p(j)(i)) / (2.0 * n); total += pSym(i)(j); j += 1 }
      i += 1
    }

    // init=pca (the reference's choice, src/analyze_embedding_with_tsne.py:69):
    // project onto the top-2 principal directions via seeded power iteration,
    // scaled to 1e-4 std — deterministic, and puts macro structure in place
    // before gradient descent (random init measurably degrades neighborhood
    // purity on separated clusters)
    val y = pcaInit(x, seed)
    val dy = Array.ofDim[Double](n, 2)
    val gains = Array.fill(n, 2)(1.0)

    var it = 0
    while (it < iterations) {
      val exaggeration = if (it < 100) 4.0 else 1.0
      // q matrix (student-t)
      val num = Array.ofDim[Double](n, n)
      var qSum = 0.0
      i = 0
      while (i < n) {
        var j = i + 1
        while (j < n) {
          val dx = y(i)(0) - y(j)(0); val dyv = y(i)(1) - y(j)(1)
          val v = 1.0 / (1.0 + dx * dx + dyv * dyv)
          num(i)(j) = v; num(j)(i) = v; qSum += 2 * v
          j += 1
        }
        i += 1
      }
      // gradient
      i = 0
      while (i < n) {
        var g0 = 0.0; var g1 = 0.0
        var j = 0
        while (j < n) {
          if (j != i) {
            val q = math.max(num(i)(j) / qSum, 1e-12)
            val mult = (exaggeration * pSym(i)(j) - q) * num(i)(j)
            g0 += mult * (y(i)(0) - y(j)(0))
            g1 += mult * (y(i)(1) - y(j)(1))
          }
          j += 1
        }
        // adaptive gains (van der Maaten's scheme) keep early exaggeration
        // + momentum from diverging
        val momentum = if (it < 250) 0.5 else 0.8
        gains(i)(0) = if ((g0 > 0) != (dy(i)(0) > 0)) gains(i)(0) + 0.2
          else math.max(gains(i)(0) * 0.8, 0.01)
        gains(i)(1) = if ((g1 > 0) != (dy(i)(1) > 0)) gains(i)(1) + 0.2
          else math.max(gains(i)(1) * 0.8, 0.01)
        dy(i)(0) = momentum * dy(i)(0) - eta * gains(i)(0) * 4 * g0
        dy(i)(1) = momentum * dy(i)(1) - eta * gains(i)(1) * 4 * g1
        y(i)(0) += dy(i)(0)
        y(i)(1) += dy(i)(1)
        i += 1
      }
      // re-center
      val c0 = y.map(_(0)).sum / n; val c1 = y.map(_(1)).sum / n
      i = 0
      while (i < n) { y(i)(0) -= c0; y(i)(1) -= c1; i += 1 }
      it += 1
    }
    y
  }

  /** Top-2 PCA projection scaled to 1e-4 std via deflated power iteration on
    * the centered data (O(n·d) per sweep — no d×d covariance materialized).
    */
  private def pcaInit(x: Array[Array[Double]], seed: Long): Array[Array[Double]] = {
    val n = x.length
    val d = x(0).length
    val mu = Array.tabulate(d)(j => x.map(_(j)).sum / n)
    val xc = x.map(r => Array.tabulate(d)(j => r(j) - mu(j)))
    val rng = new scala.util.Random(seed)

    def powerIter(orthoTo: Option[Array[Double]]): Array[Double] = {
      var v = Array.fill(d)(rng.nextGaussian())
      var it = 0
      while (it < 60) {
        orthoTo.foreach { u =>
          val proj = v.indices.map(i => v(i) * u(i)).sum
          v = Array.tabulate(d)(i => v(i) - proj * u(i))
        }
        // w = Xᵀ(X v)
        val xv = xc.map(r => r.indices.map(i => r(i) * v(i)).sum)
        val w = Array.tabulate(d)(j => xc.indices.map(i => xv(i) * xc(i)(j)).sum)
        val norm = math.sqrt(w.map(a => a * a).sum)
        v = if (norm > 0) w.map(_ / norm) else v
        it += 1
      }
      v
    }
    val v1 = powerIter(None)
    val v2 = powerIter(Some(v1))
    val proj = xc.map(r => Array(
      r.indices.map(i => r(i) * v1(i)).sum,
      r.indices.map(i => r(i) * v2(i)).sum))
    // scale each component to std 1e-4 (sklearn's pca-init convention)
    (0 until 2).foreach { k =>
      val m = proj.map(_(k)).sum / n
      val sd = math.sqrt(proj.map(p => (p(k) - m) * (p(k) - m)).sum / n)
      val s = if (sd > 0) 1e-4 / sd else 1.0
      proj.foreach(p => p(k) = (p(k) - m) * s)
    }
    proj
  }
}
