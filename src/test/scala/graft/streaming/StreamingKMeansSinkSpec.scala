package graft.streaming

import java.nio.file.Files

import graft.SparkSpec
import graft.pipeline.KMeans
import org.apache.spark.sql.DataFrame

class StreamingKMeansSinkSpec extends SparkSpec {
  import spark.implicits._

  private def blobA(ids: Seq[Long]): DataFrame =
    ids.map(i => (i, Array(1.0f, 0.001f * i, 0f))).toDF("vec_id", "embedding")
  private def blobB(ids: Seq[Long]): DataFrame =
    ids.map(i => (i, Array(0f, 0.001f * i, 1.0f))).toDF("vec_id", "embedding")

  test("one streamed batch equals one Lloyd round of batch training") {
    val root = Files.createTempDirectory("skm").toString + "/m"
    val corpus = blobA(0L until 10L).union(blobB(10L until 20L))
    assert(StreamingKMeansSink.mergeBatch(corpus, root, batchId = 0L, k = 2))
    val streamed = StreamingKMeansSink.model(root).get
    val batch = KMeans.train(corpus, k = 2, iters = 1)
    assert(streamed.centroids == batch.centroids,
      "single-batch streaming must reproduce one batch Lloyd round exactly")
  }

  test("replayed batch id is a NOOP; state survives reload") {
    val root = Files.createTempDirectory("skm").toString + "/m"
    assert(StreamingKMeansSink.mergeBatch(blobA(0L until 5L), root, 0L, k = 2))
    val s1 = StreamingKMeansSink.loadState(root).get
    // replay same id and an older id: both NOOP
    assert(!StreamingKMeansSink.mergeBatch(blobB(20L until 30L), root, 0L, k = 2))
    assert(StreamingKMeansSink.loadState(root).get == s1)
    // a NEW batch applies and bumps the applied id
    assert(StreamingKMeansSink.mergeBatch(blobB(20L until 30L), root, 1L, k = 2))
    val s2 = StreamingKMeansSink.loadState(root).get
    assert(s2.applied == 1L && s2 != s1)
  }

  test("short/empty opening batches skip without failing; state compacts") {
    val root = Files.createTempDirectory("skm").toString + "/m"
    // batch 0 empty, batch 1 below k: both skip, no state, no crash
    assert(!StreamingKMeansSink.mergeBatch(blobA(Seq.empty), root, 0L, k = 3))
    assert(!StreamingKMeansSink.mergeBatch(blobA(0L until 2L), root, 1L, k = 3))
    assert(StreamingKMeansSink.loadState(root).isEmpty)
    // first viable batch seeds; further batches fold in
    assert(StreamingKMeansSink.mergeBatch(blobA(0L until 5L), root, 2L, k = 3))
    assert(StreamingKMeansSink.mergeBatch(blobB(10L until 15L), root, 3L, k = 3))
    assert(StreamingKMeansSink.loadState(root).get.applied == 3L)
    // only the newest state file survives compaction
    import scala.jdk.CollectionConverters._
    val states = java.nio.file.Files.list(java.nio.file.Paths.get(root))
      .iterator().asScala.map(_.getFileName.toString)
      .filter(_.startsWith("state-")).toSeq
    assert(states == Seq("state-3"))
  }

  test("incrementally streamed blobs end up separated; model probes IVF") {
    val root = Files.createTempDirectory("skm").toString + "/m"
    // batch 0 contains members of BOTH blobs (seeds must straddle them)
    val batches = Seq(
      blobA(0L until 5L).union(blobB(10L until 15L)),
      blobA(5L until 10L),
      blobB(15L until 20L))
    batches.zipWithIndex.foreach { case (b, i) =>
      assert(StreamingKMeansSink.mergeBatch(b, root, i.toLong, k = 2))
    }
    val model = StreamingKMeansSink.model(root).get
    val corpus = blobA(0L until 10L).union(blobB(10L until 20L))
    val stats = KMeans.stats(corpus, model).collect()
    assert(stats.map(_.getLong(1)).sorted.toSeq == Seq(10L, 10L),
      s"streamed model must separate the blobs: ${stats.mkString(";")}")
    // and it drops straight into the trained-IVF probe path
    val got = graft.pipeline.Similarity
      .ivfTopKTrained(corpus.filter($"vec_id" === 3L), corpus, 1, model, nProbe = 1)
      .collect()
    assert(got.length == 1 && got.head.getLong(2) < 10L,
      "probe must stay within the query's blob")
  }
}
