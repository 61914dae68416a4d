package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Product-quantization ANN: encoding invariants + ADC recall floor. */
class PqSpec extends SparkSpec {
  import spark.implicits._

  /** Deterministic synthetic corpus: 3 well-separated direction groups
    * in 8 dims (m=2 subspaces of 4), small within-group jitter. */
  private def corpus = {
    val base = Seq(
      Array(1f, 0f, 0f, 0f, 1f, 0f, 0f, 0f),
      Array(0f, 1f, 0f, 0f, 0f, 1f, 0f, 0f),
      Array(0f, 0f, 1f, 0f, 0f, 0f, 1f, 0f))
    (0L until 60L).map { i =>
      val b = base((i % 3).toInt)
      val j = 0.01f * ((i / 3) % 7)
      (i, b.map(x => x + j * (if (x == 0f) 1f else -1f)))
    }.toDF("vec_id", "embedding")
  }

  test("codes are within [0, nCode) and encoding is repartition-invariant") {
    val df = corpus
    val e1 = Similarity.pqEncode(df, m = 2, nCode = 4)
      .orderBy($"vec_id").collect().toSeq
    val e2 = Similarity.pqEncode(df.repartition(7), m = 2, nCode = 4)
      .orderBy($"vec_id").collect().toSeq
    assert(e1.map(_.toString) == e2.map(_.toString))
    for (r <- e1; s <- 1 to 2) {
      val c = r.getInt(s)
      assert(c >= 0 && c < 4, s"code $c out of range in $r")
    }
  }

  test("same-direction vectors share codes; different directions differ") {
    val codes = Similarity.pqEncode(corpus, m = 2, nCode = 6)
      .collect().map(r => (r.getLong(0) % 3, (r.getInt(1), r.getInt(2))))
    val byGroup = codes.groupBy(_._1).map { case (g, rs) =>
      g -> rs.map(_._2).distinct.size
    }
    // jitter is small vs the group separation: each direction group must
    // collapse onto very few code pairs, and groups must not collide
    assert(byGroup.values.forall(_ <= 3), s"groups not compact: $byGroup")
    val distinctAcross = codes.map(_._2).distinct.size
    assert(distinctAcross >= 3, "groups collapsed onto one code pair")
  }

  test("ADC top-k recall vs brute force is far above chance on real data") {
    // measured on the sf0.001 embeddings: recall@5 = 0.20 with the
    // untrained 16-codeword sampled codebook (chance = 5/499 ≈ 0.01).
    // The floor pins the 20x-above-chance behavior without chasing the
    // exact value; a trained per-subspace codebook (KMeans.train on each
    // slice) is the production lever for higher recall.
    val df = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = df.filter($"vec_id" < 10)
    val exact = Similarity.bruteForceTopK(q, df, k = 5)
    val approx = Similarity.pqAdcTopK(q, df, k = 5, m = 4, nCode = 16)
    val rec = Similarity.recallAtK(approx, exact, 5)
      .agg(avg($"recall")).as[Double].head()
    assert(rec >= 0.1, s"mean recall@5 $rec below floor")
  }

  test("training monotonically reduces the quantization objective") {
    // Lloyd's rounds can only decrease sum-of-squared quantization error
    // (up to the truncating-mean rounding, which is bounded by one unit
    // per dim); recall is a noisy downstream proxy at 500 vectors, the
    // objective is the rigorous claim. Measured on sf0.001: iters=1
    // cuts the error by ~2x vs the sampled seeds.
    val df = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    def err(iters: Int): Long =
      Similarity.pqQuantizationError(df, m = 4, nCode = 16, trainIters = iters)
        .as[Long].head()
    val e0 = err(0)
    val e1 = err(1)
    val e2 = err(2)
    assert(e1 < e0, s"round 1 must improve: $e1 !< $e0")
    assert(e2 <= e1 + e1 / 100, s"round 2 must not regress (>1%): $e2 vs $e1")
  }

  test("trained codebook is repartition-invariant") {
    val df = corpus
    val e1 = Similarity.pqEncode(df, m = 2, nCode = 4, trainIters = 2)
      .orderBy($"vec_id").collect().toSeq
    val e2 = Similarity.pqEncode(df.repartition(7), m = 2, nCode = 4, trainIters = 2)
      .orderBy($"vec_id").collect().toSeq
    assert(e1.map(_.toString) == e2.map(_.toString))
  }

  test("ADC ranking never crosses direction groups before exhausting its own") {
    val df = corpus
    val q = df.filter($"vec_id" === 0L) // group 0
    val top = Similarity.pqAdcTopK(q, df, k = 5, m = 2, nCode = 6)
      .orderBy($"rank").collect()
    assert(top.forall(_.getLong(2) % 3 == 0L),
      s"top-5 left the query's direction group: ${top.mkString(",")}")
  }

  test("argmin kernel: reference-object loop == naive distance argmin") {
    // the expression that replaced the literal-folded least(struct(...))
    // chains (which overflowed janino's 64 KB method limit) — pin its
    // semantics against a naive implementation over deterministic
    // pseudo-random inputs, including the tie-to-lowest-code rule
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    def rnd(seed: Long, n: Int, mod: Long): IndexedSeq[Long] =
      IndexedSeq.tabulate(n)(i =>
        ((seed * 6364136223846793005L + i * 1442695040888963407L) >>> 17) % mod - mod / 2)
    (0 until 50).foreach { t =>
      val sub = 1 + t % 7
      val nCode = 1 + t % 9
      val off = t % 3
      val x = rnd(t + 1L, off + sub, 1000L)
      val cw = IndexedSeq.tabulate(nCode)(c =>
        if (c > 0 && t % 5 == 0) rnd(1000L + t, sub, 7L) // force ties
        else rnd(c * 31L + t, sub, 7L))
      val naive = cw.zipWithIndex.map { case (w, c) =>
        val d = (0 until sub).map { j =>
          val diff = x(off + j) - w(j); diff * diff
        }.sum
        (d, c)
      }.min // lowest dist, ties to lowest code
      val arr = new GenericArrayData(x.map(java.lang.Long.valueOf).toArray[Any])
      val flat = cw.flatten.toArray
      val ww = cw.map(w => w.map(v => v * v).sum).toArray
      assert(graft.functions.PqOps.argmin(arr, flat, ww, off, sub) == naive._2,
        s"t=$t x=$x cw=$cw")
      assert(graft.functions.PqOps.minDist(arr, flat, ww, off, sub) == naive._1,
        s"t=$t dist mismatch")
    }
  }
}
