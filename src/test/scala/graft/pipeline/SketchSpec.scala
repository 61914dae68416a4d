package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SketchSpec extends SparkSpec {

  private def estimate(n: Int, parts: Int = 4): (Double, Long) = {
    import spark.implicits._
    val df = (1 to n).map(i => s"doc-$i").toDF("x").repartition(parts)
    val r = Sketch.hllSummary(df, "x").collect().head
    (r.getDouble(4), r.getLong(0)) // corrected estimate
  }

  test("hll: corrected estimate within ~3 standard errors across scales") {
    // se = 1.04/sqrt(512) ≈ 4.6% -> accept 15%; small n exercises the
    // linear-counting branch, large n the raw harmonic estimator
    for (n <- Seq(100, 1000, 20000)) {
      val (est, _) = estimate(n)
      assert(math.abs(est - n) / n < 0.15, s"n=$n est=$est")
    }
  }

  test("hll: partitioning-invariant (integer path, mergeable max)") {
    val a = estimate(5000, parts = 1)
    val b = estimate(5000, parts = 17)
    assert(a == b)
  }

  test("cms: estimates always >= exact, tight on a skewed stream") {
    import spark.implicits._
    // zipf-ish: key k appears ~3000/k times; 3000 rows for k=1
    val rows = (1 to 50).flatMap(k => Seq.fill(3000 / k)(s"key-$k"))
    val df = rows.toDF("key").repartition(11)
    val sk = df.agg(graft.functions.Cms.sketch($"key", 4, 1024))
      .collect().head.getSeq[Long](0)
    val exact = rows.groupBy(identity).view.mapValues(_.size.toLong).toMap
    for ((key, n) <- exact) {
      val u = org.apache.spark.unsafe.types.UTF8String.fromString(key)
      val est = (0 until 4).map(d =>
        sk(d * 1024 + (graft.functions.Cms.hash48(d, u) % 1024).toInt)).min
      assert(est >= n, s"$key: est $est < exact $n")
      // N = total rows, width 1024: error bound 2N/width w.h.p.
      assert(est - n <= 2L * rows.size / 1024 + 1,
        s"$key: overestimate ${est - n} beyond CMS bound")
    }
    // the grid's total per row d is exactly the row count
    for (d <- 0 until 4)
      assert(sk.slice(d * 1024, (d + 1) * 1024).sum == rows.size)
  }

  test("cms: mergeable — sketch is partitioning-invariant") {
    import spark.implicits._
    val rows = (1 to 2000).map(i => s"k-${i % 97}")
    val one = rows.toDF("key").repartition(1)
      .agg(graft.functions.Cms.sketch($"key")).collect().head.getSeq[Long](0)
    val many = rows.toDF("key").repartition(13)
      .agg(graft.functions.Cms.sketch($"key")).collect().head.getSeq[Long](0)
    assert(one == many)
  }

  test("hll: streaming bucket state converges to the batch estimate") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[String]
    val ckpt = java.nio.file.Files.createTempDirectory("hll").toString
    val q = Sketch.hllBuckets(input.toDF().toDF("x"), "x")
      .writeStream.format("memory").queryName("hll_buckets")
      .outputMode("complete")
      .option("checkpointLocation", ckpt)
      .start()
    val data = (1 to 3000).map(i => s"v$i")
    try {
      input.addData(data.take(1000))
      q.processAllAvailable()
      input.addData(data.drop(1000))
      q.processAllAvailable()
      val streamed = Sketch.estimateFromBuckets(
        spark.sql("SELECT bucket, mrho FROM hll_buckets"))
        .collect().head
      val batch = Sketch.hllSummary(data.toDF("x"), "x").collect().head
      assert(streamed == batch) // identical mergeable state either way
    } finally q.stop()
  }

  test("cms: streaming update-mode grid equals the batch sketch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[String]
    val ckpt = java.nio.file.Files.createTempDirectory("cms").toString
    // a TypedImperativeAggregate is just an aggregate to the planner —
    // the same sketch runs as a streaming complete-mode aggregation
    val q = input.toDF().toDF("key")
      .agg(graft.functions.Cms.sketch($"key", 2, 256).as("sk"))
      .writeStream.format("memory").queryName("cms_grid")
      .outputMode("complete")
      .option("checkpointLocation", ckpt)
      .start()
    val data = (1 to 1500).map(i => s"k-${i % 31}")
    try {
      input.addData(data.take(700))
      q.processAllAvailable()
      input.addData(data.drop(700))
      q.processAllAvailable()
      val streamed = spark.sql("SELECT sk FROM cms_grid")
        .collect().head.getSeq[Long](0)
      val batch = data.toDF("key")
        .agg(graft.functions.Cms.sketch($"key", 2, 256))
        .collect().head.getSeq[Long](0)
      assert(streamed == batch)
    } finally q.stop()
  }

  test("hll: duplicates do not move the estimate") {
    import spark.implicits._
    val base = (1 to 800).map(i => s"d$i")
    val dup = base ++ base ++ base
    val e1 = Sketch.hllSummary(base.toDF("x"), "x").collect().head.getDouble(3)
    val e2 = Sketch.hllSummary(dup.toDF("x"), "x").collect().head.getDouble(3)
    assert(e1 == e2)
  }
}
