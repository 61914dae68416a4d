package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.pipeline.Vocab

/** The ingest-maintained DSIR feature table (j43's sink): incremental
  * insert/update/delete/echo maintenance must equal the batch-built
  * [[Vocab.dsirFeatures]] over the final doc states, exactly. */
class DsirFeatureSinkSpec extends SparkSpec {
  import spark.implicits._

  private def changes(rows: (Long, String, String, Boolean, String)*): DataFrame =
    rows.toDF("seq", "id", "rev", "deleted", "doc")

  private def doc(text: String, lang: String = "en") =
    s"""{"text":"$text","lang":"$lang"}"""

  private def featSet(df: DataFrame): Set[(String, Boolean, Long, Long)] =
    df.select("id", "is_t", "b", "n")
      .as[(String, Boolean, Long, Long)].collect().toSet

  private def batchTwin(docs: (String, String, String)*): DataFrame =
    Vocab.dsirFeatures(
        docs.toDF("id", "text", "lang"), "id", "text",
        col("lang") === "en", nBuckets = 64)
      .select(col("doc").as("id"), col("is_t"), col("b"), col("n"))

  test("insert/update/delete/echo converge to the batch-built table") {
    val root = Files.createTempDirectory("dsirsink").toString
    val b1 = changes(
      (1L, "a", "1-x", false, doc("alpha beta alpha")),
      (2L, "b", "1-y", false, doc("gamma delta", lang = "fr")),
      (3L, "c", "1-z", false, doc("epsilon")))
    val b2 = changes(
      (4L, "a", "2-x2", false, doc("alpha beta alpha zeta")), // update
      (5L, "b", "1-y", false, doc("gamma delta", lang = "fr")), // echo
      (6L, "c", "2-z", true, null), // delete
      (7L, "d", "1-d", false, doc("eta theta")))
    DsirFeatureSink.applyBatch(root, b1, 0, buckets = 4)
    DsirFeatureSink.applyBatch(root, b2, 1, buckets = 4)
    val want = batchTwin(
      ("a", "alpha beta alpha zeta", "en"),
      ("b", "gamma delta", "fr"),
      ("d", "eta theta", "en"))
    assert(featSet(DsirFeatureSink.readFeatures(spark, root)) ==
      featSet(want))
  }

  test("a replayed batchId is a NOOP; a rev-equal echo recomputes nothing") {
    val root = Files.createTempDirectory("dsirsink2").toString
    val b = changes((1L, "x", "1-a", false, doc("one two two")))
    assert(DsirFeatureSink.applyBatch(root, b, 0, buckets = 4).nonEmpty)
    assert(DsirFeatureSink.applyBatch(root, b, 0, buckets = 4).isEmpty)
    // same rev in a NEW batch: echo path keeps the stored rows (the
    // manifest advances, only the echo's bucket rewrites)
    val echo = changes((2L, "x", "1-a", false, doc("one two two")))
    DsirFeatureSink.applyBatch(root, echo, 1, buckets = 4)
    assert(featSet(DsirFeatureSink.readFeatures(spark, root)) ==
      featSet(batchTwin(("x", "one two two", "en"))))
  }

  test("per-doc row count is bounded by nBuckets regardless of text length") {
    val root = Files.createTempDirectory("dsirsink3").toString
    val long = (1 to 500).map(i => s"tok$i").mkString(" ")
    val b = changes((1L, "big", "1-a", false, doc(long)))
    DsirFeatureSink.applyBatch(root, b, 0, buckets = 4, nBuckets = 16)
    val n = DsirFeatureSink.readFeatures(spark, root).count()
    assert(n <= 16L, s"feature rows per doc must be <= nBuckets, got $n")
  }
}
