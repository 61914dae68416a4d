package graft.streaming

import org.scalatest.funsuite.AnyFunSuite

/** The stateful CouchStubServer mode backing the j21 write-back gate:
  * a real CouchDB stores the doc, assigns the next rev under the rev
  * guard, and echoes the write on `_changes` — these tests pin that
  * contract (create/update/conflict/delete, echo shape, deterministic
  * revs, view reduce) over real HTTP. */
class StatefulStubSpec extends AnyFunSuite {

  private val client = java.net.http.HttpClient.newHttpClient()

  private def post(url: String, body: String): (Int, String) = {
    val req = java.net.http.HttpRequest.newBuilder(java.net.URI.create(url))
      .header("Content-Type", "application/json")
      .POST(java.net.http.HttpRequest.BodyPublishers.ofString(body)).build()
    val r = client.send(req,
      java.net.http.HttpResponse.BodyHandlers.ofString())
    (r.statusCode(), r.body())
  }

  private def get(url: String): String =
    client.send(
      java.net.http.HttpRequest.newBuilder(java.net.URI.create(url))
        .GET().build(),
      java.net.http.HttpResponse.BodyHandlers.ofString()).body()

  private def md5(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString

  private def withStub(f: (String, CouchStubServer) => Unit): Unit = {
    val stub = new CouchStubServer("db", IndexedSeq.empty, stateful = true)
    val port = stub.start()
    try f(s"http://127.0.0.1:$port/db", stub) finally stub.stop()
  }

  test("create assigns rev 1-md5(id:1), stores, and echoes on _changes") {
    withStub { (url, _) =>
      val (code, body) = post(s"$url/_bulk_docs",
        """{"docs":[{"_id":"a","v":1},{"_id":"b","v":1}]}""")
      assert(code == 201)
      val revA = "1-" + md5("a:1")
      assert(body.contains(s""""ok":true,"id":"a","rev":"$revA""""))
      val changes = get(s"$url/_changes?since=0")
      assert(changes.contains(
        s""""id":"a","changes":[{"rev":"$revA"}],"doc":{"_id":"a","_rev":"$revA","v":1}"""))
      assert(changes.contains(""""last_seq":2"""))
      val info = get(url)
      assert(info.contains(""""update_seq":2""") &&
        info.contains(""""doc_count":2"""))
    }
  }

  test("update needs the CURRENT rev; wrong or missing rev is a conflict row") {
    withStub { (url, _) =>
      post(s"$url/_bulk_docs", """{"docs":[{"_id":"a","v":1}]}""")
      val rev1 = "1-" + md5("a:1")
      // missing rev on an existing doc -> conflict
      val (_, c1) = post(s"$url/_bulk_docs", """{"docs":[{"_id":"a","v":9}]}""")
      assert(c1.contains(""""error":"conflict""""))
      // stale rev -> conflict
      val (_, c2) = post(s"$url/_bulk_docs",
        """{"docs":[{"_id":"a","_rev":"1-wrong","v":9}]}""")
      assert(c2.contains(""""error":"conflict""""))
      // correct rev -> rev 2, echoed
      val (_, ok) = post(s"$url/_bulk_docs",
        s"""{"docs":[{"_id":"a","_rev":"$rev1","v":2}]}""")
      val rev2 = "2-" + md5("a:2")
      assert(ok.contains(s""""rev":"$rev2""""))
      val changes = get(s"$url/_changes?since=1")
      assert(changes.contains(s""""doc":{"_id":"a","_rev":"$rev2","v":2}"""))
      // conflicts did NOT append change lines: seqs stay dense
      assert(changes.contains(""""last_seq":2"""))
    }
  }

  test("_deleted removes the doc, emits a deleted change, drops doc_count") {
    withStub { (url, _) =>
      post(s"$url/_bulk_docs",
        """{"docs":[{"_id":"a","v":1},{"_id":"b","v":1}]}""")
      val revA = "1-" + md5("a:1")
      post(s"$url/_bulk_docs",
        s"""{"docs":[{"_id":"a","_rev":"$revA","_deleted":true}]}""")
      val changes = get(s"$url/_changes?since=2")
      assert(changes.contains(""""deleted":true"""))
      assert(get(url).contains(""""doc_count":1"""))
      // a recreate after delete starts a fresh generation at ordinal 3
      val (_, re) = post(s"$url/_bulk_docs", """{"docs":[{"_id":"a","v":5}]}""")
      assert(re.contains(s""""rev":"3-${md5("a:3")}""""))
    }
  }

  test("single-doc PUT takes the id from the URL and rev-guards (409)") {
    withStub { (url, _) =>
      val (c1, b1) = post(s"$url/x", """{"v":1}""")
      assert(c1 == 201 && b1.contains(s""""rev":"1-${md5("x:1")}""""))
      val (c2, _) = post(s"$url/x", """{"v":2}""") // no _rev -> conflict
      assert(c2 == 409)
    }
  }

  test("count_by view reduces the CURRENT state: updates re-key, deletes drop") {
    withStub { (url, _) =>
      post(s"$url/_bulk_docs",
        """{"docs":[{"_id":"1","lang":"en"},{"_id":"2","lang":"en"},{"_id":"3","lang":"de"}]}""")
      assert(get(s"$url/_design/g/_view/count_by_lang?group=true") ==
        """{"rows":[{"key":"de","value":1},{"key":"en","value":2}]}""")
      // update doc 2 to de, delete doc 3 -> en:1, de:1
      val rev2 = "1-" + md5("2:1"); val rev3 = "1-" + md5("3:1")
      post(s"$url/_bulk_docs",
        s"""{"docs":[{"_id":"2","_rev":"$rev2","lang":"de"},
           |{"_id":"3","_rev":"$rev3","_deleted":true}]}""".stripMargin)
      assert(get(s"$url/_design/g/_view/count_by_lang?group=true") ==
        """{"rows":[{"key":"de","value":1},{"key":"en","value":1}]}""")
    }
  }
}
