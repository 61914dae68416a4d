package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed Lloyd's k-means over embedding columns — the offline
  * training job the IVF coarse quantizer ([[Similarity.ivfTopK]]) and
  * SemDeDup clustering ([[Similarity.semanticDedup]]) assume exists
  * (both currently seed their Voronoi cells with deterministic pivots
  * and note "k-means stand-in" in their docs; this closes that gap).
  *
  * All arithmetic is exact-integer on the floor(x*1e6) quantization
  * ([[Similarity.quantize]]): squared distances, per-cluster sums and
  * truncating means are order-independent 64-bit math, so the result is
  * bit-identical across partitionings and engines — the DuckDB oracle
  * reproduces it exactly.
  *
  * SCALE (the whole point of this formulation):
  *   - Assignment is ONE codegen'd projection per iteration: the k
  *     centroids fold into the plan as array literals, distance to each
  *     is a [[graft.functions.DotLongExpr]] against the row vector, and
  *     argmin is `least()` over (dist, cid) structs. No join, no
  *     shuffle, no per-row driver involvement — the corpus is scanned
  *     in place, exactly like the IVF cell assignment.
  *   - The update step aggregates per-(cluster, dim) sums with map-side
  *     partial aggregation: the shuffle carries at most
  *     tasks x k x dim partial rows regardless of corpus size, and the
  *     driver collects exactly k x dim (cid, dim, sum, count) rows —
  *     bounded model state, never data.
  *   - Iterations are a driver loop over those bounded collects (the
  *     same shape as MLlib's KMeans, minus its sampling-based init);
  *     `iters` is small and fixed, so lineage stays shallow.
  *
  * Seeds are the k lowest-id corpus vectors — deterministic, so tests
  * and the oracle agree; swap in k-means|| sampling at real scale (the
  * iteration body is init-agnostic). Empty clusters keep their previous
  * centroid (same convention as the oracle's COALESCE).
  */
object KMeans {

  /** Centroid state: cluster id -> quantized components. */
  final case class Model(centroids: IndexedSeq[(Long, IndexedSeq[Long])])

  private def dot(a: Column, b: Column): Column =
    graft.functions.Vectors.dotCol(a, b)

  /** (vec_id, v, qn) quantized projection with self-norm; compute-dense
    * per-row stages downstream, so widen to the parallelism floor. */
  private[graft] def quantized(corpus: DataFrame, idCol: String, embCol: String): DataFrame =
    Par.widen(corpus.select(
      col(idCol).cast("long").as("vec_id"),
      Similarity.quantize(col(embCol)).as("v")))
      .withColumn("qn", dot(col("v"), col("v")))

  /** Squared euclidean distance to a literal centroid:
    * |v|^2 + |c|^2 - 2 v.c — one DotLongExpr per centroid, |c|^2 folded
    * as a constant. Exact Long math (|dist| <= 4 * dim * 1e12). */
  private def distTo(c: IndexedSeq[Long]): Column = {
    val cn = c.map(x => x * x).sum
    col("qn") + lit(cn) - lit(2L) * dot(col("v"), typedLit(c))
  }

  /** Argmin cluster id over the centroid set: lexicographic `least()`
    * on (dist, cid) structs — codegen'd, ties break to the lowest cid. */
  private[graft] def assignExpr(cs: IndexedSeq[(Long, IndexedSeq[Long])]): Column =
    least(cs.map { case (cid, c) =>
      struct(distTo(c).as("d"), lit(cid).as("cid"))
    }: _*).getField("cid")

  /** Run `iters` Lloyd rounds from the k lowest-id seeds. */
  def train(
      corpus: DataFrame, k: Int, iters: Int,
      idCol: String = "vec_id", embCol: String = "embedding"): Model = {
    require(k >= 2 && iters >= 0)
    val q = quantized(corpus, idCol, embCol).persist()
    try {
      // deterministic init: k lowest-id vectors, cid by id rank
      var cs: IndexedSeq[(Long, IndexedSeq[Long])] =
        q.orderBy(col("vec_id")).limit(k).collect().zipWithIndex
          .map { case (r, i) => (i.toLong, r.getSeq[Long](1).toIndexedSeq) }
          .toIndexedSeq
      var it = 0
      while (it < iters) {
        // per-(cluster, dim) sums: partial-agg'd map-side; k*dim rows out
        val sums = q.select(assignExpr(cs).as("cid"), posexplode(col("v")))
          .groupBy(col("cid"), col("pos"))
          .agg(sum(col("col")).as("s"), count(lit(1)).as("n"))
          .collect()
          .groupBy(_.getLong(0))
          .map { case (cid, rows) =>
            val n = rows.head.getLong(3)
            // truncating integer mean — matches the oracle's
            // trunc(sum/count) exactly (quotient magnitudes < 2^53)
            val m = rows.sortBy(_.getInt(1)).map(r => r.getLong(2) / n)
            cid -> m.toIndexedSeq
          }
        cs = cs.map { case (cid, prev) => (cid, sums.getOrElse(cid, prev)) }
        it += 1
      }
      Model(cs)
    } finally { q.unpersist(blocking = false) }
  }

  /** Final-assignment audit: per-cluster membership count, centroid L1
    * mass, and exact integer inertia under the trained model. All-k
    * output (empty clusters show n_members=0), ordered by cid. */
  def stats(
      corpus: DataFrame, model: Model,
      idCol: String = "vec_id", embCol: String = "embedding"): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val q = quantized(corpus, idCol, embCol)
    val dists = model.centroids.map { case (cid, c) =>
      struct(distTo(c).as("d"), lit(cid).as("cid"))
    }
    val best = least(dists: _*)
    val agg = q.select(best.getField("cid").as("cid"), best.getField("d").as("d"))
      .groupBy(col("cid"))
      .agg(count(lit(1)).as("n"), sum(col("d")).as("i"))
    val meta = model.centroids
      .map { case (cid, c) => (cid, c.map(math.abs).sum) }
      .toDF("cid", "c_l1")
    meta.join(agg, Seq("cid"), "left")
      .select(col("cid"),
        coalesce(col("n"), lit(0L)).as("n_members"),
        col("c_l1"),
        coalesce(col("i"), lit(0L)).as("inertia"))
      .orderBy(col("cid"))
  }

  /** train + stats in one call — the catalog entry shape. */
  def trainStats(
      corpus: DataFrame, k: Int, iters: Int,
      idCol: String = "vec_id", embCol: String = "embedding"): DataFrame =
    stats(corpus, train(corpus, k, iters, idCol, embCol), idCol, embCol)

  /** Greedy k-center selection (farthest-point traversal, Gonzalez
    * 1985): pick k maximally-spread corpus vectors, then assign every
    * vector to its nearest pick — the diversity-sampling / coreset-
    * seeding step of embedding-based data curation (the "spread" dual
    * of [[Similarity.semanticDedup]]'s "collapse"), and the classic
    * 2-approximation of the k-center coverage radius.
    *
    * Selection is deterministic: seed = lowest-id vector; each round
    * picks the candidate maximizing min-distance to the chosen set
    * (exact integer squared L2 on the quantized projection), ties to
    * the lowest id; already-chosen ids are excluded so duplicate
    * vectors cannot re-pick the seed. The DuckDB oracle unrolls the
    * same rounds.
    *
    * SCALE: each round folds the chosen centers into ONE codegen'd
    * projection (literal arrays + [[graft.functions.DotLongExpr]], the
    * [[assignExpr]] shape) and reduces with TakeOrdered(1) — a
    * one-row driver round-trip per round, k x dim longs of driver
    * state, no shuffle of the corpus. The final assignment is the same
    * literal-folded argmin projection. O(k^2) distance terms total per
    * row is the price of keeping the loop stateless (no cached dmin
    * column whose lineage grows per round); k is small by definition.
    *
    * @return (vec_id, center_rank, center_id, dist_q) — one row per
    *         corpus vector; dist_q = exact squared distance to its
    *         center (0 for the centers themselves). If k exceeds the
    *         corpus size, every vector becomes a center and selection
    *         stops there (the [[train]] convention: tolerate short
    *         corpora, never throw mid-job).
    */
  def kCenterSelect(
      corpus: DataFrame, k: Int,
      idCol: String = "vec_id", embCol: String = "embedding"): DataFrame = {
    require(k >= 1, s"k-center needs k >= 1, got $k")
    val q = quantized(corpus, idCol, embCol).persist()
    try {
      val seedRows = q.orderBy(col("vec_id")).limit(1).collect()
      require(seedRows.nonEmpty, "k-center: corpus is empty — nothing to select")
      var cs: IndexedSeq[(Long, Long, IndexedSeq[Long])] = IndexedSeq(
        (0L, seedRows(0).getLong(0), seedRows(0).getSeq[Long](1).toIndexedSeq))
      var exhausted = false
      while (cs.size < k && !exhausted) {
        val dmin = cs.map(c => distTo(c._3)) match {
          case Seq(one) => one
          case many => least(many: _*)
        }
        val next = q.filter(!col("vec_id").isin(cs.map(_._2): _*))
          .select(col("vec_id"), col("v"), dmin.as("d"))
          .orderBy(col("d").desc, col("vec_id"))
          .limit(1).collect()
        // k > |corpus|: every vector is already a center — stop with
        // the centers found (the train() convention: tolerate, don't
        // throw mid-job)
        if (next.isEmpty) exhausted = true
        else cs = cs :+ ((cs.size.toLong, next(0).getLong(0),
          next(0).getSeq[Long](1).toIndexedSeq))
      }
      val best = cs.map { case (rk, _, c) =>
        struct(distTo(c).as("d"), lit(rk).as("rk"))
      } match {
        case Seq(one) => one
        case many => least(many: _*)
      }
      val spark = corpus.sparkSession
      import spark.implicits._
      val cents = cs.map { case (rk, id, _) => (rk, id) }
        .toDF("center_rank", "center_id")
      q.select(col("vec_id"), best.getField("rk").as("center_rank"),
          best.getField("d").as("dist_q"))
        .join(broadcast(cents), "center_rank")
        .select(col("vec_id"), col("center_rank"), col("center_id"),
          col("dist_q"))
    } finally { q.unpersist(blocking = false) }
  }
}
