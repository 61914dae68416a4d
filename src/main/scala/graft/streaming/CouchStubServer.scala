package graft.streaming

import java.net.InetSocketAddress

import com.sun.net.httpserver.{HttpExchange, HttpServer}

/** Minimal read-only CouchDB-compatible server over a fixed change
  * list — the benchmark/demo stand-in for a real CouchDB in this
  * zero-egress environment (tests use the richer recording stub in
  * HttpChangesFeedSpec; this one is tuned for throughput so the bench
  * measures the CLIENT, not the stub).
  *
  * Serves the two endpoints [[HttpChangesFeed]] speaks:
  *   GET /{db}            -> {"update_seq":N,"doc_count":N}
  *   GET /{db}/_changes   -> {"results":[...],"last_seq":N}
  * with since/limit paging. `lines(i)` must be the change object with
  * seq == i+1 (dense seqs), so a page is an array slice — O(1) lookup,
  * no server-side JSON parsing. */
final class CouchStubServer(db: String, lines: IndexedSeq[String]) {
  private var server: HttpServer = _
  private var pool: java.util.concurrent.ExecutorService = _

  def start(): Int = {
    server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    // a few handler threads so parallel partition readers aren't
    // serialized by the server; daemon so a forgotten stop() can't
    // keep the JVM alive
    pool = java.util.concurrent.Executors.newFixedThreadPool(8, r => {
      val t = new Thread(r, "couch-stub"); t.setDaemon(true); t
    })
    server.setExecutor(pool)
    server.createContext("/", (ex: HttpExchange) => {
      val path = ex.getRequestURI.getPath
      val params = Option(ex.getRequestURI.getQuery).getOrElse("")
        .split("&").filter(_.contains("="))
        .map { kv => val Array(k, v) = kv.split("=", 2); k -> v }.toMap
      val body: (Int, String) =
        if (path == s"/$db/_changes") {
          val since = params.getOrElse("since", "0").toLong
          val limit = params.getOrElse("limit", Int.MaxValue.toString).toLong
          val from = math.min(math.max(since, 0L), lines.length.toLong).toInt
          val until = math.min(from + math.min(limit, Int.MaxValue.toLong),
            lines.length.toLong).toInt
          val page = lines.slice(from, until)
          val last = if (until > from) until.toLong else since
          (200, page.mkString("""{"results":[""", ",",
            s"""],"last_seq":$last}"""))
        } else if (path == s"/$db") {
          (200, s"""{"db_name":"$db","update_seq":${lines.length},""" +
            s""""doc_count":${lines.length}}""")
        } else (404, """{"error":"not_found","reason":"no_db_file"}""")
      val bytes = body._2.getBytes("UTF-8")
      ex.getResponseHeaders.add("Content-Type", "application/json")
      ex.sendResponseHeaders(body._1, bytes.length)
      ex.getResponseBody.write(bytes)
      ex.close()
    })
    server.start()
    server.getAddress.getPort
  }

  def stop(): Unit = if (server != null) {
    server.stop(0)
    pool.shutdownNow()
  }
}
