package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Micro-bench for the Spark 4 shredded-variant scan (VERDICT r11
  * stretch item): is `variant_get` over a SHREDDED parquet variant
  * column (typed subcolumns + scan pushdown) measurably faster than
  * (a) parse_json at query time from text (j18's current plan) and
  * (b) an UNSHREDDED stored variant? Run:
  *
  *   SPARK_GRAFT_SF_DIR=/tmp/sf1 sbt "runMain graft.VariantProbe"
  *
  * Prints one line per plan with wall seconds (min of 2 after warmup)
  * and the shredded file layout, to decide whether a j38 catalog entry
  * is worth adopting.
  */
object VariantProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val base = java.nio.file.Files.createTempDirectory("varprobe")
    val plain = base.resolve("plain").toString
    val shred = base.resolve("shred").toString
    val ev = Tables.load(spark, sfDir, "events")
      .select($"event_id", parse_json($"props").as("v"))
    // unshredded store: variant as one binary column
    spark.conf.set("spark.sql.variant.writeShredding.enabled", "false")
    ev.write.mode("overwrite").parquet(plain)
    // shredded store: writer infers typed subcolumns from the data
    spark.conf.set("spark.sql.variant.writeShredding.enabled", "true")
    spark.conf.set("spark.sql.variant.inferShreddingSchema", "true")
    ev.write.mode("overwrite").parquet(shred)
    spark.conf.set("spark.sql.variant.writeShredding.enabled", "false")
    spark.conf.set("spark.sql.variant.inferShreddingSchema", "false")

    def time(label: String)(mk: => org.apache.spark.sql.DataFrame): Unit = {
      def once: (Double, Long) = {
        val t0 = System.nanoTime()
        val n = mk.filter($"k" > 50).count()
        ((System.nanoTime() - t0) / 1e9, n)
      }
      once // warmup
      val (t1, n) = once
      val (t2, _) = once
      println(f"$label%-28s ${math.min(t1, t2)}%8.3f s  rows=$n")
    }
    time("parse_json-from-text") {
      Tables.load(spark, sfDir, "events").select($"event_id",
        try_variant_get(parse_json($"props"), "$.k", "int").as("k"))
    }
    time("stored-variant-unshredded") {
      spark.read.parquet(plain).select($"event_id",
        try_variant_get($"v", "$.k", "int").as("k"))
    }
    time("stored-variant-shredded") {
      spark.read.parquet(shred).select($"event_id",
        try_variant_get($"v", "$.k", "int").as("k"))
    }
    spark.conf.set("spark.sql.variant.pushVariantIntoScan", "false")
    time("shredded-no-scan-pushdown") {
      spark.read.parquet(shred).select($"event_id",
        try_variant_get($"v", "$.k", "int").as("k"))
    }
    spark.conf.set("spark.sql.variant.pushVariantIntoScan", "true")
    // show whether the shredded footer actually carries typed_value
    val f = java.nio.file.Files.walk(java.nio.file.Paths.get(shred))
      .iterator()
    var sample: String = null
    while (f.hasNext) { val p = f.next()
      if (p.toString.endsWith(".parquet")) sample = p.toString }
    println("schema of " + sample)
    spark.read.parquet(sample).printSchema()
    println("sizes: plain=" + dirSize(plain) + " shred=" + dirSize(shred))
  }

  private def dirSize(d: String): Long = {
    val it = java.nio.file.Files.walk(java.nio.file.Paths.get(d)).iterator()
    var s = 0L
    while (it.hasNext) { val p = it.next()
      if (java.nio.file.Files.isRegularFile(p))
        s += java.nio.file.Files.size(p) }
    s
  }
}
