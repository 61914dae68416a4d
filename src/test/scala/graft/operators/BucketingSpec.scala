package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

class BucketingSpec extends SparkSpec {

  test("layoutFor: key, bucket count, and projection are part of the identity") {
    val dir = Files.createTempDirectory("bkt-fp").toString
    val base = Bucketing.layoutFor(dir, "t", "k1", 8, Seq("k1", "v"))
    assert(Bucketing.layoutFor(dir, "t", "k1", 8, Seq("k1", "v")) == base)
    assert(Bucketing.layoutFor(dir, "t", "k2", 8, Seq("k1", "v")) != base)
    assert(Bucketing.layoutFor(dir, "t", "k1", 16, Seq("k1", "v")) != base)
    assert(Bucketing.layoutFor(dir, "t", "k1", 8, Seq("k1", "v", "w")) != base)
  }

  test("ensureBucketed: refuses to reuse a table bucketed another way") {
    import spark.implicits._
    val df = (1L to 20L).map(i => (i, i % 3)).toDF("k", "v")
    val path = Files.createTempDirectory("bkt-guard").toString + "/data"
    val table = "graft_bkt_guard_spec"
    Bucketing.ensureBucketed(spark, df, table, path, "k", 4)
    // same layout: idempotent no-op
    Bucketing.ensureBucketed(spark, df, table, path, "k", 4)
    // different bucket count or key under the SAME table name must fail
    // loudly instead of silently "co-locating" a wrong join
    intercept[IllegalArgumentException] {
      Bucketing.ensureBucketed(spark, df, table, path, "k", 8)
    }
    intercept[IllegalArgumentException] {
      Bucketing.ensureBucketed(spark, df, table, path, "v", 4)
    }
    spark.sql(s"DROP TABLE IF EXISTS $table")
  }
}
