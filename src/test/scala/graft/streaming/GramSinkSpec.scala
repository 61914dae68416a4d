package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.DataFrame

import graft.SparkSpec
import graft.pipeline.Pca

/** Streaming Gram maintenance: exact equivalence with the batch pass,
  * replay idempotence, compaction, and component recovery mid-stream. */
class GramSinkSpec extends SparkSpec {
  import spark.implicits._

  /** 64-dim corpus with a planted dominant axis on dim 0. */
  private def vecs(ids: Seq[Long]): DataFrame =
    ids.map { r =>
      val base = if (r % 2 == 0) 0.4f else -0.4f
      val e = (0 until Pca.Dim).map { d =>
        if (d == 0) base
        else (((r * 31 + d * 17) % 13) - 6) * 0.004f
      }
      (r, e)
    }.toDF("vec_id", "embedding")

  test("streamed batches reproduce the batch moments bit-for-bit") {
    val root = Files.createTempDirectory("gram").toString + "/g"
    assert(GramSink.mergeBatch(vecs(0L until 10L), root, 0L))
    assert(GramSink.mergeBatch(vecs(10L until 25L), root, 1L))
    assert(GramSink.mergeBatch(vecs(25L until 40L), root, 2L))
    val (sn, ss, sg) = GramSink.moments(root).get
    val (bn, bs, bg) = Pca.moments(vecs(0L until 40L))
    assert(sn === bn)
    assert(ss.toSeq === bs.toSeq)
    assert(sg.map(_.toSeq).toSeq === bg.map(_.toSeq).toSeq)
  }

  test("component mid-stream equals batch fit over applied batches") {
    val root = Files.createTempDirectory("gram").toString + "/g"
    assert(GramSink.mergeBatch(vecs(0L until 20L), root, 0L))
    val (v, mu) = GramSink.component(root).get
    val (bv, bmu, _, _) = Pca.fit(vecs(0L until 20L))
    assert(v.toSeq === bv.toSeq)
    assert(mu.toSeq === bmu.toSeq)
    assert(math.abs(v(0)) === Pca.VScale, "planted axis dominates")
  }

  test("replayed/old batch ids are NOOPs; state compacts to newest") {
    val root = Files.createTempDirectory("gram").toString + "/g"
    assert(GramSink.mergeBatch(vecs(0L until 5L), root, 0L))
    val s1 = GramSink.loadState(root).get
    assert(!GramSink.mergeBatch(vecs(5L until 9L), root, 0L))
    assert(GramSink.loadState(root).get == s1)
    assert(GramSink.mergeBatch(vecs(5L until 9L), root, 1L))
    assert(GramSink.loadState(root).get.applied === 1L)
    import scala.jdk.CollectionConverters._
    val states = java.nio.file.Files.list(java.nio.file.Paths.get(root))
      .iterator().asScala.map(_.getFileName.toString)
      .filter(_.startsWith("state-")).toSeq
    assert(states == Seq("state-1"))
  }

  test("empty batch applies as a zero delta (id advances, matrix unchanged)") {
    val root = Files.createTempDirectory("gram").toString + "/g"
    assert(GramSink.mergeBatch(vecs(0L until 5L), root, 0L))
    val before = GramSink.loadState(root).get
    assert(GramSink.mergeBatch(vecs(Seq.empty), root, 1L))
    val after = GramSink.loadState(root).get
    assert(after.applied === 1L)
    assert(after.tri === before.tri)
  }
}
