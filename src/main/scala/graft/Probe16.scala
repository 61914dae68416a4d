package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway stage probe for round-16 measurements (not part of the
  * driver surface; noop-sink timings per guide §1.4). */
object Probe16 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf30")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.pipeline.{Contamination, Par, TextOps}

    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"PROBE $label%-40s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val docs = Tables.load(spark, sfDir, "documents")
    val nGram = 3
    spark.sparkContext.setJobDescription("p55 stage probe")

    val w0 = Par.widen(docs.select(col("doc_id"), col("source"), col("text")))

    // per-partition row counts — effective scan parallelism
    def dist(label: String, d: org.apache.spark.sql.DataFrame): Unit = {
      val c = d.groupBy(spark_partition_id().as("p")).count()
        .orderBy(desc("count")).collect()
      println(s"PROBE $label nparts=${c.length} " +
        s"max=${c.head.getLong(1)} min=${c.last.getLong(1)}")
    }
    dist("scan dist", docs.select(col("doc_id")))
    dist("widen dist", w0)

    def shingleStage(d: org.apache.spark.sql.DataFrame) = d
      .select(col("source"),
        explode(array_distinct(
          TextOps.shingles(TextOps.tokens(col("text")), nGram))).as("s"))
      .select(col("source"), unhex(md5(col("s"))).as("h"))
    for (r <- 1 to 2)
      time(s"shingle+md5 over widen r$r") { noop(shingleStage(w0)) }

    // A/B: h-agg with map-side combine (groupBy's own exchange) vs the
    // explicit same-key repartition (no map-side combine)
    val sh1 = shingleStage(w0).select(col("h"), lit(0).as("w"),
      lit(1L).as("bit"))
    val aggDirect = sh1.groupBy(col("h"))
      .agg(expr("bit_or(if(w = 0, bit, 0L))").as("m0"))
    val parts = Par.scaledShuffleParts(docs.select(col("source"), col("text")))
    println(s"PROBE scaledShuffleParts = $parts")
    val aggRepart = sh1.repartition(parts, col("h")).groupBy(col("h"))
      .agg(expr("bit_or(if(w = 0, bit, 0L))").as("m0"))
    for (r <- 1 to 2) time(s"h-agg direct r$r") { noop(aggDirect) }
    for (r <- 1 to 2) time(s"h-agg repart r$r") { noop(aggRepart) }

    val full = Contamination.sourceOverlap(docs, nGram = 3)
    for (r <- 1 to 2) time(s"full sourceOverlap r$r") { full.count() }

    spark.stop()
  }
}
