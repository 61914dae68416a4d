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
}
