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
      // events.ts arrives in generator-dependent physical types — parquet
      // TIMESTAMP(NANOS) (which Spark's vectorized reader rejects; read
      // nanos as long), epoch-long, or TIMESTAMP_NTZ — so normalize by the
      // ACTUAL schema to session-zoned TimestampType (microseconds) and
      // every downstream operator sees one canonical type.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val df = spark.read.parquet(s"$dir/$name.parquet")
      if (name == "events") {
        import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
        import org.apache.spark.sql.types.{LongType, TimestampType}
        df.schema("ts").dataType match {
          case LongType =>
            df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
          case TimestampType => df
          case _ => df.withColumn("ts", col("ts").cast(TimestampType))
        }
      } else df
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
