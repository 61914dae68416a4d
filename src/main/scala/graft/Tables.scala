package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table loaders for the driver testdata layout (TESTDATA.md).
  *
  * All §2 query-plane operators (SURVEY.md) run over these typed tables;
  * the schemaless-JSON document plane is exercised via `events.props`
  * (a raw JSON string column) and the CDC fixtures in `graft.cdc`.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Plan cache: re-listing the parquet footer/file index per query adds
    * fixed latency to every catalog entry; the logical plan is immutable,
    * so one instance per (session, dir, table) is shared. When
    * [[pinHot]] has been called the cached entry is also persisted. */
  private val cache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String, String), DataFrame]

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    cache.getOrElseUpdate((spark, dir, name), {
      // events.ts is parquet TIMESTAMP(NANOS), which Spark's vectorized
      // reader rejects; read nanos as long and normalize to TimestampType
      // (microsecond) so every downstream operator sees a real timestamp.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val df = spark.read.parquet(s"$dir/$name.parquet")
      if (name == "events")
        df.withColumn("ts",
          org.apache.spark.sql.functions.timestamp_micros(
            org.apache.spark.sql.functions.expr("ts div 1000")))
      else df
    })

  /** Pin every testdata table in executor memory (deserialized columnar
    * cache) — the hot-working-set posture a resident engine runs with;
    * used by Bench so repeated queries measure compute, not parquet
    * decode. */
  def pinHot(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).persist().count())

  /** Register every table as a temp view so spark.sql(...) works too. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
