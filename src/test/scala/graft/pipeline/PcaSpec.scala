package graft.pipeline

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.Gram

/** Distributed PCA: the bounded Gram aggregate against a brute-force
  * replica, the integer power iteration against a known-dominant-axis
  * matrix, and the end-to-end determinism/centering invariants. */
class PcaSpec extends SparkSpec {

  private def vecDf(rows: Seq[(Long, Seq[Float], Int)]) = {
    import spark.implicits._
    rows.toDF("vec_id", "embedding", "label")
  }

  private val sample = Seq(
    (1L, Seq(0.5f, -0.25f, 0.125f), 0),
    (2L, Seq(-0.5f, 0.25f, -0.125f), 0),
    (3L, Seq(0.4f, -0.2f, 0.1f), 1),
    (4L, Seq(0.01f, 0.02f, -0.03f), 1),
    (5L, Seq(-0.3f, 0.15f, -0.075f), 2))

  private def quant(x: Float): Long = math.floor(x.toDouble * 1e6).toLong

  test("GramAggExpr matches the brute-force augmented second moment") {
    val df = vecDf(sample)
    val aug = concat(graft.functions.Vectors.quantizeCol(col("embedding")),
      array(lit(1L)))
    val tri = df.agg(Gram.agg(aug, 4)).head().getSeq[Long](0).toArray
    assert(tri.length === 4 * 5 / 2)
    val m = Gram.unpack(tri, 4)
    val qs = sample.map { case (_, e, _) => e.map(quant) :+ 1L }
    for (i <- 0 until 4; j <- 0 until 4) {
      val expect = qs.map(q => q(i) * q(j)).sum
      assert(m(i)(j) === expect, s"cell ($i,$j)")
      assert(m(i)(j) === m(j)(i), s"symmetry ($i,$j)")
    }
    // augmentation corner = n, last column = per-dim sums
    assert(m(3)(3) === sample.size.toLong)
    for (i <- 0 until 3)
      assert(m(i)(3) === qs.map(_(i)).sum)
  }

  test("GramAggExpr merges across partitions to the same matrix") {
    val df = vecDf(sample)
    val aug = concat(graft.functions.Vectors.quantizeCol(col("embedding")),
      array(lit(1L)))
    val one = df.coalesce(1).agg(Gram.agg(aug, 4)).head().getSeq[Long](0)
    val many = df.repartition(5).agg(Gram.agg(aug, 4)).head().getSeq[Long](0)
    assert(one === many)
  }

  test("centering identity equals literal centered sums") {
    val qs = sample.map { case (_, e, _) => e.map(quant).toArray }
    val n = qs.size.toLong
    val s = Array.tabulate(3)(i => qs.map(_(i)).sum)
    val g = Array.tabulate(3, 3)((i, j) => qs.map(q => q(i) * q(j)).sum)
    val mu = s.map(_ / n)
    // Pca.centered works on Dim-sized inputs; replicate the formula here
    val c = Array.tabulate(3, 3)((i, j) =>
      g(i)(j) - mu(i) * s(j) - mu(j) * s(i) + n * mu(i) * mu(j))
    val brute = Array.tabulate(3, 3)((i, j) =>
      qs.map(q => (q(i) - mu(i)) * (q(j) - mu(j))).sum)
    for (i <- 0 until 3; j <- 0 until 3)
      assert(c(i)(j) === brute(i)(j), s"cell ($i,$j)")
  }

  test("power iteration finds the dominant axis of a diagonal matrix") {
    val d = Pca.Dim
    val c = Array.ofDim[Long](d, d)
    c(5)(5) = 1000000L // dominant
    c(7)(7) = 10L
    val (v, num, den) = Pca.powerIteration(c)
    assert(math.abs(v(5)) === Pca.VScale)
    assert(v.zipWithIndex.filter(_._2 != 5).forall(p => math.abs(p._1) < 8))
    // Rayleigh quotient ≈ rescaled dominant eigenvalue: num/den within
    // integer truncation of c(5)(5) (cdiv = 1 here since max < 2^20... it
    // is not: 1e6 < 2^20*... maxAbs/GramCap = 1e6/2^20 = 0 -> cdiv 1)
    assert(den > 0)
    assert(math.abs(num.toDouble / den - 1000000.0) < 2.0)
  }

  /** Deterministic 64-dim corpus with a planted dominant direction:
    * dim 0 varies ±0.4 across rows, the rest is small structured noise. */
  private def corpus64(n: Int) = vecDf((1 to n).map { r =>
    val base = if (r % 2 == 0) 0.4f else -0.4f
    val e = (0 until Pca.Dim).map { d =>
      if (d == 0) base
      else (((r * 31 + d * 17) % 13) - 6) * 0.004f
    }
    (r.toLong, e, r % 3)
  })

  test("the Gram pass partial-aggregates: bounded buffers shuffle, not vectors") {
    val df = corpus64(40).repartition(4)
    val aug = concat(graft.functions.Vectors.quantizeCol(col("embedding")),
      array(lit(1L)))
    val p = df.agg(Gram.agg(aug, Pca.Dim + 1))
      .queryExecution.executedPlan.toString
    val objAggs = p.linesIterator.count(_.contains("ObjectHashAggregate"))
    assert(objAggs >= 2, s"expected partial+final ObjectHashAggregate:\n$p")
    assert(!p.contains("Sort "), s"no sort may touch the vector stream:\n$p")
  }

  test("fit is partition-independent end to end") {
    val df = corpus64(40)
    val a = Pca.fit(df)
    val b = Pca.fit(df.repartition(7))
    assert(a._1.toSeq === b._1.toSeq)
    assert(a._2.toSeq === b._2.toSeq)
    assert(a._3 === b._3 && a._4 === b._4)
  }

  /** Two planted axes: dim 0 strongest (±0.4), dim 1 second (±0.15,
    * varying independently via r/2 parity), tiny structured noise. */
  private def corpus2axes(n: Int) = vecDf((1 to n).map { r =>
    val a = if (r % 2 == 0) 0.4f else -0.4f
    val b = if ((r / 2) % 2 == 0) 0.15f else -0.15f
    val e = (0 until Pca.Dim).map { d =>
      if (d == 0) a
      else if (d == 1) b
      else (((r * 31 + d * 17) % 13) - 6) * 0.002f
    }
    (r.toLong, e, r % 3)
  })

  test("second component deflates onto the planted second axis, orthogonal") {
    val df = corpus2axes(64)
    val (v1, v2, _) = Pca.fitTwo(df)
    assert(math.abs(v1(0)) === Pca.VScale, "first axis = dim 0")
    assert(v2.map(math.abs).zipWithIndex.maxBy(_._1)._2 === 1,
      "second axis = dim 1")
    // exact integer orthogonality audit: tiny relative to |v|² ≈ 2^20
    val orth = v1.indices.map(i => v1(i) * v2(i)).sum
    assert(math.abs(orth) < Pca.VScale * 8,
      s"components far from orthogonal: $orth")
    // deflation determinism across partitionings
    val (w1, w2, _) = Pca.fitTwo(df.repartition(9))
    assert(v1.toSeq === w1.toSeq && v2.toSeq === w2.toSeq)
  }

  test("component is unit-scale, aligned with the planted axis; projection exact") {
    val df = corpus64(40)
    val comp = Pca.topComponent(spark, df).collect()
    val vs = comp.map(_.getLong(1))
    assert(vs.map(math.abs).max === Pca.VScale)
    // the planted high-variance direction is dim 0 (row 1 of the output)
    assert(math.abs(vs(0)) === Pca.VScale)
    val proj = Pca.projectByLabel(df).collect()
    assert(proj.map(_.getInt(0)).toSeq === Seq(0, 1, 2))
    assert(proj.map(_.getLong(1)).sum === 40L)
    // min <= max and sum within [n*min, n*max] for each label
    proj.foreach { r =>
      val (n, sm, mn, mx) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(mn <= mx && sm >= n * mn && sm <= n * mx)
    }
  }
}
