package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{Gram, Vectors}

/** Distributed PCA over the embedding corpus — principal-axis analysis
  * as a training-data-pipeline primitive (embedding-drift monitoring,
  * axis-aligned outlier audits, whitening pre-passes for ANN).
  *
  * Shape of the computation at 100 TB:
  *   1. ONE distributed pass reduces the corpus to a (dim+1)²
  *      second-moment matrix via [[graft.functions.GramAggExpr]] —
  *      fixed ~17 KB buffers, partial-agg'd map-side; vectors never
  *      shuffle. The constant-1 augmentation makes the same pass yield
  *      per-dim sums and the row count (mean + covariance in one job).
  *   2. The eigen-iteration runs DRIVER-side on the 64×64 matrix —
  *      O(dim²) bounded model state, the same posture as
  *      [[KMeans]] (k×dim longs) — using EXACT integer power iteration:
  *      quantized inputs, truncating rescales, deterministic under any
  *      partitioning, and replayed bit-for-bit by the DuckDB oracle as
  *      a chained-CTE matrix-vector recurrence.
  *   3. Projection folds the learned component back as literals:
  *      score = dot(q, v) − dot(mu, v) — the centering term is a
  *      CONSTANT, so the per-row work is one codegen'd integer dot
  *      ([[Vectors.dotCol]]) and projection stays a map-only stage.
  *
  * All arithmetic is Long with truncating division, mirrored exactly by
  * DuckDB's `//` (both truncate toward zero — verified for negatives).
  * Magnitude budget at sf10 (500 k vectors, |q| ≤ 6e5): raw Gram
  * ≤ 1.8e17, centering terms ≤ 7.2e17, matvec partials ≤ 2^47 — all
  * inside Long with ≥ 12× headroom. The budget holds to ~2-3 M vectors
  * at this quantization; a larger corpus drops the quantize scale one
  * decade per 100× rows (the component only needs relative precision,
  * and the iteration renormalizes every step).
  */
object Pca {

  val Dim = 64
  val Steps = 8
  /** Fixed-point scale of the iterated component vector (2^10). */
  val VScale = 1024L
  /** Gram rescale target: |entries| ≲ 2^21 keeps matvecs ≤ 2^47. */
  val GramCap = 1L << 20

  /** One distributed pass: (n, per-dim sums s, raw Gram G) of the
    * quantized embeddings. Driver state is (dim+1)² longs. */
  def moments(emb: DataFrame, vecCol: String = "embedding")
      : (Long, Array[Long], Array[Array[Long]]) = {
    val aug = concat(Vectors.quantizeCol(col(vecCol)), array(lit(1L)))
    val tri = Par.widen(emb)
      .agg(Gram.agg(aug, Dim + 1).as("g"))
      .head().getSeq[Long](0).toArray
    val m = Gram.unpack(tri, Dim + 1)
    val n = m(Dim)(Dim)
    val s = Array.tabulate(Dim)(i => m(i)(Dim))
    (n, s, Array.tabulate(Dim, Dim)((i, j) => m(i)(j)))
  }

  /** Truncated integer means mu = s / n (exactly DuckDB's `s // n`). */
  def means(n: Long, s: Array[Long]): Array[Long] =
    s.map(_ / math.max(n, 1L))

  /** Exact-integer centering: for ANY constant mu,
    * Σ (q_i − mu_i)(q_j − mu_j) = G_ij − mu_i s_j − mu_j s_i + n mu_i mu_j.
    * Using truncated mu keeps every term a Long — no floats anywhere. */
  def centered(n: Long, s: Array[Long], g: Array[Array[Long]])
      : Array[Array[Long]] = {
    val d = s.length
    val mu = means(n, s)
    Array.tabulate(d, d)((i, j) =>
      g(i)(j) - mu(i) * s(j) - mu(j) * s(i) + n * mu(i) * mu(j))
  }

  /** Truncating rescale of the centered Gram so matvecs stay in Long. */
  def rescaled(c: Array[Array[Long]]): Array[Array[Long]] = {
    val d = c.length
    var maxAbs = 1L
    c.foreach(_.foreach(x => maxAbs = math.max(maxAbs, math.abs(x))))
    val cdiv = math.max(maxAbs / GramCap, 1L)
    Array.tabulate(d, d)((i, j) => c(i)(j) / cdiv)
  }

  private def matvec(gs: Array[Array[Long]], v: Array[Long]): Array[Long] =
    Array.tabulate(gs.length) { i =>
      var acc = 0L; var j = 0
      while (j < gs.length) { acc += gs(i)(j) * v(j); j += 1 }
      acc
    }

  /** One deterministic iteration run on an already-rescaled Gram: start
    * all-[[VScale]], [[Steps]] × (matvec → optional orthogonalization
    * against `ortho` → truncating rescale). With `ortho` set this is
    * deflation by projection — the second-component iteration: proj =
    * (w·o)/(o·o) truncated, w ← w − proj·o, every op elementwise
    * integer (magnitudes ≤ 2^47, see scaladoc budget). */
  def iterate(gs: Array[Array[Long]],
      ortho: Option[Array[Long]] = None): Array[Long] = {
    val d = gs.length
    var v = Array.fill(d)(VScale)
    var t = 0
    while (t < Steps) {
      var w = matvec(gs, v)
      ortho.foreach { o =>
        var dot = 0L; var den = 0L; var i = 0
        while (i < d) { dot += w(i) * o(i); den += o(i) * o(i); i += 1 }
        val pj = dot / math.max(den, 1L)
        w = Array.tabulate(d)(i => w(i) - pj * o(i))
      }
      val mw = math.max(w.map(math.abs).max, 1L)
      v = w.map(x => x * VScale / mw)
      t += 1
    }
    v
  }

  /** Integer power iteration with truncating rescales.
    * Returns (component v at scale ±[[VScale]], Rayleigh numerator
    * Σ v·(Gs v), Rayleigh denominator Σ v·v) — the quotient estimates
    * the dominant eigenvalue of the RESCALED Gram. Every step is
    * elementwise-deterministic (no float sums), so any engine replaying
    * the recurrence reproduces it exactly. */
  def powerIteration(c: Array[Array[Long]]): (Array[Long], Long, Long) = {
    val d = c.length
    val gs = rescaled(c)
    val v = iterate(gs)
    val w9 = matvec(gs, v)
    var num = 0L; var den = 0L; var i = 0
    while (i < d) { num += v(i) * w9(i); den += v(i) * v(i); i += 1 }
    (v, num, den)
  }

  /** Fit on the corpus: component + means, all bounded driver state. */
  def fit(emb: DataFrame): (Array[Long], Array[Long], Long, Long) = {
    val (n, s, g) = moments(emb)
    val (v, num, den) = powerIteration(centered(n, s, g))
    (v, means(n, s), num, den)
  }

  /** Top TWO components: the second is deflated by per-step projection
    * against the converged first — same rescaled Gram, same integer
    * recurrence, so both replay in the oracle's CTE chain. */
  def fitTwo(emb: DataFrame): (Array[Long], Array[Long], Array[Long]) = {
    val (n, s, g) = moments(emb)
    val gs = rescaled(centered(n, s, g))
    val v1 = iterate(gs)
    val v2 = iterate(gs, Some(v1))
    (v1, v2, means(n, s))
  }

  /** Both components as a 64-row frame (dim, v1_q, v2_q, plus their
    * exact integer dot — the orthogonality audit, near 0 by
    * construction). */
  def topTwoComponents(spark: SparkSession, emb: DataFrame): DataFrame = {
    import spark.implicits._
    val (v1, v2, _) = fitTwo(emb)
    val orth = v1.indices.map(i => v1(i) * v2(i)).sum
    v1.indices
      .map(i => (i + 1, v1(i), v2(i), orth))
      .toDF("dim", "v1_q", "v2_q", "orth_q")
      .orderBy("dim")
  }

  /** The learned top component as a 64-row frame:
    * (dim 1-based, v_q at scale ±1024, Rayleigh num/den). */
  def topComponent(spark: SparkSession, emb: DataFrame): DataFrame = {
    import spark.implicits._
    val (v, _, num, den) = fit(emb)
    v.toSeq.zipWithIndex
      .map { case (vq, i) => (i + 1, vq, num, den) }
      .toDF("dim", "v_q", "lam_num", "lam_den")
      .orderBy("dim")
  }

  /** Per-label distribution of the corpus along the principal axis —
    * the drift/outlier audit. The component and the centering constant
    * fold in as literals: a map-only codegen'd integer dot per row,
    * then an ordinary partial-agg'd groupBy(label). */
  def projectByLabel(emb: DataFrame): DataFrame = {
    val (v, mu, _, _) = fit(emb)
    val vLit = array(v.map(lit(_)): _*)
    val centerDot = v.indices.map(i => mu(i) * v(i)).sum
    emb
      .select(col("label"),
        (Vectors.dotCol(Vectors.quantizeCol(col("embedding")), vLit) -
          lit(centerDot)).as("score"))
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n_vecs"),
        sum(col("score")).as("score_sum"),
        min(col("score")).as("score_min"),
        max(col("score")).as("score_max"))
      .orderBy(col("label"))
  }
}
