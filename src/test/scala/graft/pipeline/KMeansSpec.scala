package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

class KMeansSpec extends SparkSpec {
  import spark.implicits._

  /** Two tight blobs far apart + ids ordered so the two seeds start in
    * the same blob — Lloyd's must still split them apart by round 2. */
  private def blobs = {
    val a = (0L until 20L).map(i => (i, Array(0.1f + 0.001f * i, 0.1f)))
    val b = (20L until 40L).map(i => (i, Array(10.0f, 10.0f + 0.001f * i)))
    (a ++ b).toDF("vec_id", "embedding")
  }

  test("separates well-separated blobs and reduces inertia per round") {
    val df = blobs
    val r0 = KMeans.stats(df, KMeans.train(df, k = 2, iters = 0)).collect()
    val r2 = KMeans.stats(df, KMeans.train(df, k = 2, iters = 2)).collect()
    assert(r2.map(_.getLong(1)).sorted.toSeq == Seq(20L, 20L),
      "2 rounds must split the blobs 20/20")
    assert(r2.map(_.getLong(3)).sum < r0.map(_.getLong(3)).sum,
      "training must not increase inertia")
  }

  test("result is invariant under repartitioning") {
    val df = blobs
    val m1 = KMeans.trainStats(df, k = 3, iters = 2).collect().toSeq
    val m2 = KMeans.trainStats(df.repartition(7), k = 3, iters = 2)
      .collect().toSeq
    assert(m1.map(_.toString) == m2.map(_.toString))
  }

  test("empty clusters keep their previous centroid and report n=0") {
    // all points identical: after round 1 everything lands in cid 0
    // (lowest-cid tiebreak); cids 1..2 go empty but stay in the output
    val df = (0L until 10L).map(i => (i, Array(1.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val out = KMeans.trainStats(df, k = 3, iters = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3)))
    assert(out.toSeq == Seq((0L, 10L, 0L), (1L, 0L, 0L), (2L, 0L, 0L)))
  }

  test("kCenterSelect: farthest-point picks spread across blobs") {
    // seed is id 0 (blob A); the second pick must come from blob B, and
    // every vector must be assigned to a center in its own blob
    val out = KMeans.kCenterSelect(blobs, k = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val centers = out.filter(_._4 == 0L).map(o => (o._2, o._1)).sorted
    assert(centers.head == (0L, 0L) && centers(1)._2 >= 20L,
      s"second center must be in the far blob: ${centers.toSeq}")
    assert(out.forall(o => (o._1 < 20L) == (o._3 < 20L)),
      "assignment must keep each blob with its own center")
  }

  test("kCenterSelect: deterministic under repartitioning; duplicates never re-pick") {
    val dup = (0L until 12L).map(i => (i, Array(1.0f, 2.0f)))
      .toDF("vec_id", "embedding") // all identical vectors
    val out = KMeans.kCenterSelect(dup, k = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // all-identical corpus: the exclusion guard still terminates the 3
    // rounds, and every vector assigns to (rank 0, id 0) at distance 0
    assert(out.length == 12 &&
      out.forall(o => o._2 == 0L && o._3 == 0L && o._4 == 0L))
    val a = KMeans.kCenterSelect(blobs, k = 4).collect().map(_.toString).toSeq
    val b = KMeans.kCenterSelect(blobs.repartition(7), k = 4)
      .collect().map(_.toString).toSeq
    assert(a.sorted == b.sorted)
  }

  test("kCenterSelect: k beyond the corpus stops at |corpus| centers") {
    val tiny = Seq((1L, Array(0f, 0f)), (2L, Array(1f, 1f)),
      (3L, Array(2f, 2f))).toDF("vec_id", "embedding")
    val out = KMeans.kCenterSelect(tiny, k = 7).collect()
      .map(r => (r.getLong(0), r.getLong(3)))
    assert(out.length == 3 && out.forall(_._2 == 0L),
      "every vector becomes its own center, no crash")
  }

  test("assignment ties break to the lowest cluster id") {
    // identical seed centroids: every point is equidistant to both, so
    // all of them must land on cid 0 deterministically
    val df = Seq((0L, Array(1.0f, 0f)), (1L, Array(1.0f, 0f)),
      (2L, Array(1.0f, 0f))).toDF("vec_id", "embedding")
    val out = KMeans.trainStats(df, k = 2, iters = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSeq == Seq((0L, 3L), (1L, 0L)))
  }
}
