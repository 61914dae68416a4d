package graft.sources

import graft.SparkSpec

class RestSourceSpec extends SparkSpec {

  private val viewBody =
    """{"rows":[{"key":"::Planet PostgreSQL::","value":"7778"},
      |{"key":"BBC News","value":"2998"}]}""".stripMargin

  test("readView parses a CouchDB view payload into (key, value) rows (S6)") {
    val fetched = scala.collection.mutable.ArrayBuffer.empty[String]
    val f = new Fetcher {
      override def get(url: String): String = { fetched += url; viewBody }
    }
    val df = RestSource.readView(spark, f,
      "http://couch/db/_design/fetch/_view/by_feedName?group=true")
    val rows = df.collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(rows == Seq(("::Planet PostgreSQL::", "7778"), ("BBC News", "2998")))
    assert(fetched.size == 1)
  }

  test("parseViewPages expands many payload pages distributed") {
    import spark.implicits._
    val pages = Seq(viewBody, viewBody).toDF("body").repartition(2)
    assert(RestSource.parseViewPages(pages).count() == 4)
  }

  test("ensureDocTable creates once, then reports existing (S7)") {
    assert(Bootstrap.ensureDocTable(spark, "my-new-feed"))
    assert(!Bootstrap.ensureDocTable(spark, "my-new-feed"))
    assert(spark.table("my_new_feed").schema.fieldNames.toSeq ==
      Seq("id", "rev", "doc"))
  }
}
