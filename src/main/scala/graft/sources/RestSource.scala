package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, StructType}

/** HTTP table-function sources — SURVEY.md §2.1 S6/S7.
  *
  * The reference reads a CouchDB map/reduce view over REST and turns it
  * into rows with `json_to_recordset((SELECT (content::json->>'rows')
  * ::json FROM http_get(url))) AS x(key text, value text)`
  * (reference README.md:194-202). Spark-first: the HTTP fetch is a
  * driver-side call behind [[Fetcher]] (a view result is one small JSON
  * payload — the heavy lifting already happened in the view build), and
  * the recordset expansion is `from_json` + `inline` on a one-row
  * DataFrame. For a large result the same parse runs distributed over a
  * Dataset of page payloads (`readViewPages`).
  */
trait Fetcher extends Serializable {
  /** GET the url, return the response body. */
  def get(url: String): String
}

/** Production fetcher: JDK HTTP client (not exercised in tests —
  * zero-egress environment). */
final class JdkFetcher(auth: Option[(String, String)] = None) extends Fetcher {
  @transient private lazy val client = java.net.http.HttpClient.newHttpClient()
  override def get(url: String): String = {
    val b = java.net.http.HttpRequest.newBuilder(java.net.URI.create(url)).GET()
    auth.foreach { case (u, p) =>
      b.header("Authorization", "Basic " + java.util.Base64.getEncoder
        .encodeToString(s"$u:$p".getBytes("UTF-8")))
    }
    client.send(b.build(),
      java.net.http.HttpResponse.BodyHandlers.ofString()).body()
  }
}

object RestSource {

  /** CouchDB view response shape: {"rows":[{"key":...,"value":...}]}. */
  private val viewSchema: DataType = DataType.fromDDL(
    "rows ARRAY<STRUCT<key: STRING, value: STRING>>")

  /** Read one CouchDB view result as a (key, value) DataFrame — the S6
    * `http_get` + `json_to_recordset` pipeline. */
  def readView(spark: SparkSession, fetcher: Fetcher, url: String): DataFrame = {
    import spark.implicits._
    Seq(fetcher.get(url)).toDF("body")
      .select(explode(from_json(col("body"), viewSchema)
        .getField("rows")).as("r"))
      .select(col("r.key").as("key"), col("r.value").as("value"))
  }

  /** Distributed variant: one payload page per input row (e.g. paged
    * `skip/limit` view reads fetched by executors via mapPartitions
    * upstream); the parse + explode runs fully parallel. */
  def parseViewPages(pages: DataFrame, bodyCol: String = "body"): DataFrame =
    pages
      .select(explode(from_json(col(bodyCol), viewSchema)
        .getField("rows")).as("r"))
      .select(col("r.key").as("key"), col("r.value").as("value"))
}

/** S7: document-table bootstrap — the daemon probes pg_catalog and
  * auto-creates `(id text PRIMARY KEY, doc jsonb)` for new feeds
  * (reference bin/daemon.js:233-262). Spark analog: catalog probe +
  * empty keyed table registration. */
object Bootstrap {
  val docTableSchema: StructType =
    StructType.fromDDL("id STRING, rev STRING, doc STRING")

  /** Ensure a temp view with the doc-table schema exists; returns true
    * if it was created (the daemon's CREATE TABLE branch). */
  def ensureDocTable(spark: SparkSession, name: String): Boolean = {
    val mangled = graft.streaming.FeedConfig.mangle(name)
    if (spark.catalog.tableExists(mangled)) false
    else {
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], docTableSchema)
        .createOrReplaceTempView(mangled)
      true
    }
  }
}
