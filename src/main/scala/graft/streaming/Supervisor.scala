package graft.streaming

import scala.collection.mutable

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Multi-feed control plane — the reference daemon's finder/watchdog
  * lifecycle (`bin/daemon.js:96-230`, SURVEY.md §2.11 T7) over
  * `StreamingQueryManager`.
  *
  * The reference polls a registry table every 60 s ("finder":
  * `SELECT pgtable, since FROM since_checkpoints WHERE enabled=True ORDER
  * BY pgtable`, bin/daemon.js:103), spawns a follower per new row, and a
  * 50 s watchdog reaps dead/disabled feeds (bin/daemon.js:191-215).
  * Here the registry is a [[FeedRegistry]] of feed configs and
  * `reconcile()` is the finder+watchdog in one idempotent pass — call it
  * from any scheduler.
  */
final case class FeedConfig(
    name: String,
    feedPath: String,
    storeRoot: String,
    checkpoint: String,
    enabled: Boolean = true,
    since: Long = 0L,
    maxChangesPerTrigger: Option[Long] = None)

object FeedConfig {
  /** Feed-name mangling `-`→`_` (reference lib/index.js:32,
    * bin/daemon.js:115): CouchDB db names allow `-`, SQL tables don't. */
  def mangle(name: String): String = name.replace("-", "_")
}

final class Supervisor(
    spark: SparkSession,
    trigger: Trigger = Trigger.ProcessingTime("1 second"),
    backoff: RestartBackoff = RestartBackoff.default,
    clock: () => Long = () => System.currentTimeMillis()) {

  private val running = mutable.Map.empty[String, StreamingQuery]
  private val failures = mutable.Map.empty[String, FailureRecord]

  def activeFeeds: Set[String] = synchronized {
    running.filter(_._2.isActive).keySet.toSet
  }

  /** Consecutive failure count per feed (restart-backoff state). */
  def failureCounts: Map[String, Int] = synchronized {
    failures.map { case (n, r) => n -> r.count }.toMap
  }

  /** One finder+watchdog pass (idempotent):
    *  - start a query for every enabled feed not running (finder,
    *    bin/daemon.js:96-165);
    *  - stop queries whose feed is disabled or gone (reaper,
    *    bin/daemon.js:191-215);
    *  - forget terminated queries so a later pass restarts them
    *    (the reference's `alive=false` → respawn path), with
    *    per-feed restart backoff for failed queries (the reference's
    *    randomized 10-60 s reconnect sleep, lib/index.js:225-229 — T6).
    * Returns (started, stopped) feed names. */
  def reconcile(registry: Seq[FeedConfig]): (Seq[String], Seq[String]) =
    synchronized {
      val now = clock()
      val enabled = registry.filter(_.enabled)
        .map(f => FeedConfig.mangle(f.name) -> f).toMap

      // a feed observed healthy resets its backoff; one that died with
      // an exception escalates it; a clean finish (AvailableNow
      // completion) restarts freely
      running.foreach { case (n, q) =>
        if (q.isActive) failures.remove(n)
        else {
          if (q.exception.isDefined) {
            val rec = failures.getOrElse(n, FailureRecord(0, 0L))
            failures(n) = FailureRecord(rec.count + 1, now)
          } else failures.remove(n)
          running.remove(n)
        }
      }

      val toStop = running.keys.filterNot(enabled.contains).toSeq
      toStop.foreach { n => running(n).stop(); running.remove(n) }

      val toStart = enabled
        .filterNot { case (n, _) => running.contains(n) }
        .filter { case (n, _) =>
          failures.get(n).forall(r => now - r.atMillis >= backoff.delayMs(r.count))
        }
      val started = toStart.toSeq.flatMap { case (n, f) =>
        // a feed that fails to START must not kill the finder pass
        // (the daemon survives per-feed errors, bin/daemon.js:75-94);
        // it joins the backoff queue like an async failure
        scala.util.Try(ChangesPipeline.start(
          spark, f.feedPath, f.storeRoot, f.checkpoint, n,
          since = f.since, maxChangesPerTrigger = f.maxChangesPerTrigger,
          trigger = trigger)) match {
          case scala.util.Success(q) =>
            running(n) = q
            Some(n)
          case scala.util.Failure(_) =>
            val rec = failures.getOrElse(n, FailureRecord(0, 0L))
            failures(n) = FailureRecord(rec.count + 1, now)
            None
        }
      }
      (started.sorted, toStop.sorted)
    }

  /** Per-feed status in the daemon's `/_status` shape
    * (bin/daemon.js:288-297, daemon-README.md:107-113). */
  def status(checkpoints: Map[String, String] = Map.empty): Seq[FeedStatus] =
    synchronized {
      running.toSeq.sortBy(_._1).map { case (name, q) =>
        FeedStatus(
          feed = name,
          alive = q.isActive,
          status = if (q.isActive) "running" else "stopped",
          since = Option(q.lastProgress)
            .flatMap(p => Option(p.sources).flatMap(_.headOption))
            .flatMap(s => Option(s.endOffset))
            .flatMap(o => scala.util.Try(
              ChangesOffset.fromJson(o).seq).toOption)
            .getOrElse(0L),
          sinceCheckpoint = checkpoints.get(name)
            .flatMap(SinceCheckpoints.lastSince).getOrElse(0L))
      }
    }

  def statusJson(checkpoints: Map[String, String] = Map.empty): String =
    status(checkpoints).map(_.json).mkString("[", ",", "]")

  def stopAll(): Unit = synchronized {
    running.values.foreach(q => if (q.isActive) q.stop())
    running.clear()
  }
}

final case class FailureRecord(count: Int, atMillis: Long)

/** Restart delay policy — exponential with a cap, standing in for the
  * reference's randomized 10-60 s sleep (deterministic here so the
  * supervisor is testable; randomize via a custom instance to avoid
  * thundering herds across many feeds). */
final case class RestartBackoff(baseMs: Long, maxMs: Long) {
  def delayMs(failures: Int): Long =
    if (failures <= 0) 0L
    else math.min(maxMs, baseMs << math.min(failures - 1, 10))
}

object RestartBackoff {
  val default: RestartBackoff = RestartBackoff(10000L, 60000L)
}

final case class FeedStatus(
    feed: String, alive: Boolean, status: String,
    since: Long, sinceCheckpoint: Long) {
  def json: String =
    s"""{"feed":"$feed","status":{"alive":$alive,"status":"$status",""" +
      s""""since":$since,"since_checkpoint":$sinceCheckpoint}}"""
}

/** Minimal HTTP status endpoint — the daemon's control API on :8888
  * (bin/daemon.js:264-310, T8): `/_status` per-feed JSON, `/_finder`
  * forces a reconcile pass. JDK built-in server; localhost only. */
final class StatusServer(
    supervisor: Supervisor,
    registry: () => Seq[FeedConfig],
    checkpoints: () => Map[String, String] = () => Map.empty,
    port: Int = 8888) {
  import com.sun.net.httpserver.{HttpExchange, HttpServer}

  private var server: HttpServer = _

  def start(): Int = {
    server = HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", port), 0)
    def respond(ex: HttpExchange, body: String): Unit = {
      val bytes = body.getBytes("UTF-8")
      ex.getResponseHeaders.add("Content-Type", "application/json")
      ex.sendResponseHeaders(200, bytes.length)
      ex.getResponseBody.write(bytes)
      ex.close()
    }
    server.createContext("/_status",
      (ex: HttpExchange) => respond(ex, supervisor.statusJson(checkpoints())))
    server.createContext("/_finder", (ex: HttpExchange) => {
      val (started, stopped) = supervisor.reconcile(registry())
      respond(ex,
        s"""{"started":${started.map("\"" + _ + "\"").mkString("[", ",", "]")},""" +
          s""""stopped":${stopped.map("\"" + _ + "\"").mkString("[", ",", "]")}}""")
    })
    server.start()
    server.getAddress.getPort
  }

  def stop(): Unit = if (server != null) server.stop(0)
}
