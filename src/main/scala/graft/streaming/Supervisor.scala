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
  *
  * Failure classes (reference lib/index.js:205-230): a fatal error —
  * the feed/database is gone or misconfigured (`no_db_file`, Postgres
  * `42P01`) — STOPS the feed (no retry) until the operator disables and
  * re-enables it; everything else (`ECONNREFUSED`-style transient I/O)
  * restarts with backoff.
  */
final case class FeedConfig(
    name: String,
    feedPath: String,
    storeRoot: String,
    checkpoint: String,
    enabled: Boolean = true,
    since: Long = 0L,
    maxChangesPerTrigger: Option[Long] = None,
    sink: FeedSink = FeedSink.Store)

/** What a supervised feed maintains: the versioned doc store
  * ([[MergeSink]], the reference's pgtable) or a standing BM25
  * inverted index ([[InvertedIndexSink]] — `storeRoot` is then the
  * index root). Same finder/watchdog/backoff lifecycle either way. */
sealed trait FeedSink
object FeedSink {
  case object Store extends FeedSink
  final case class Index(textField: String = "text", nBuckets: Int = 64)
    extends FeedSink
}

object FeedConfig {
  /** Feed-name mangling `-`→`_` (reference lib/index.js:32,
    * bin/daemon.js:115): CouchDB db names allow `-`, SQL tables don't. */
  def mangle(name: String): String = name.replace("-", "_")
}

final class Supervisor(
    spark: SparkSession,
    trigger: Trigger = Trigger.ProcessingTime("1 second"),
    backoff: BackoffPolicy = RestartBackoff.default,
    clock: () => Long = () => System.currentTimeMillis()) {

  private val running = mutable.Map.empty[String, (StreamingQuery, FeedConfig)]
  private val failures = mutable.Map.empty[String, FailureRecord]
  private val halted = mutable.LinkedHashMap.empty[String, String]

  def activeFeeds: Set[String] = synchronized {
    running.filter(_._2._1.isActive).keySet.toSet
  }

  /** Consecutive failure count per feed (restart-backoff state). */
  def failureCounts: Map[String, Int] = synchronized {
    failures.map { case (n, r) => n -> r.count }.toMap
  }

  /** Feeds stopped for a fatal error class, with the reason — the
    * reference's "stop the feed" outcome for `no_db_file`/`42P01`
    * (lib/index.js:211-223). Cleared when the feed leaves the enabled
    * registry (disable → re-enable = operator reset). */
  def haltedFeeds: Map[String, String] = synchronized { halted.toMap }

  /** Fatal = the feed target is gone/misconfigured; retrying can never
    * help. Transient = everything else (connection refused, timeouts,
    * executor loss) — restart with backoff. */
  private def fatalReason(e: Throwable): Option[String] =
    Iterator.iterate(e)(_.getCause).takeWhile(_ != null).take(16)
      .collectFirst {
        case f: FeedGoneException => f.getMessage
        case f: java.io.FileNotFoundException => s"gone: ${f.getMessage}"
      }

  /** The watchdog/reaper half alone (bin/daemon.js:191-215, forced via
    * `/_watchdog` bin/daemon.js:278): forget terminated queries —
    * transient failures join the backoff queue for the next finder
    * pass, fatal failures halt the feed. Returns (reaped, halted). */
  def watchdog(): (Seq[String], Seq[String]) = synchronized { reap(clock()) }

  private def reap(now: Long): (Seq[String], Seq[String]) = {
    val reaped = mutable.Buffer.empty[String]
    val newlyHalted = mutable.Buffer.empty[String]
    running.toSeq.foreach { case (n, (q, _)) =>
      if (q.isActive) failures.remove(n)
      else {
        q.exception match {
          case Some(ex) => fatalReason(ex) match {
            case Some(reason) =>
              halted(n) = reason
              failures.remove(n)
              newlyHalted += n
            case None =>
              val rec = failures.getOrElse(n, FailureRecord(0, 0L))
              failures(n) = FailureRecord(rec.count + 1, now)
              reaped += n
          }
          case None => // clean finish (AvailableNow completion)
            failures.remove(n)
            reaped += n
        }
        running.remove(n)
      }
    }
    (reaped.sorted.toSeq, newlyHalted.sorted.toSeq)
  }

  /** One finder+watchdog pass (idempotent):
    *  - reap terminated queries ([[watchdog]]), classifying failures
    *    fatal-vs-transient;
    *  - stop queries whose feed is disabled or gone (reaper,
    *    bin/daemon.js:191-215) and clear halt state for feeds leaving
    *    the registry (disable → re-enable = operator reset);
    *  - start a query for every enabled, non-halted feed not running
    *    (finder, bin/daemon.js:96-165), respecting per-feed restart
    *    backoff (the reference's randomized 10-60 s reconnect sleep,
    *    lib/index.js:225-229 — T6; see [[JitteredBackoff]]).
    * Returns (started, stopped) feed names. */
  def reconcile(registry: Seq[FeedConfig]): (Seq[String], Seq[String]) =
    synchronized {
      val now = clock()
      val enabled = registry.filter(_.enabled)
        .map(f => FeedConfig.mangle(f.name) -> f).toMap

      reap(now)

      halted.keys.filterNot(enabled.contains).toSeq.foreach { n =>
        halted.remove(n); failures.remove(n)
      }

      val toStop = running.keys.filterNot(enabled.contains).toSeq
      toStop.foreach { n => running(n)._1.stop(); running.remove(n) }

      val toStart = enabled
        .filterNot { case (n, _) => running.contains(n) || halted.contains(n) }
        .filter { case (n, _) =>
          failures.get(n).forall(r =>
            now - r.atMillis >= backoff.delayMs(n, r.count))
        }
      val started = toStart.toSeq.flatMap { case (n, f) =>
        // a feed that fails to START must not kill the finder pass
        // (the daemon survives per-feed errors, bin/daemon.js:75-94);
        // fatal-class start errors halt, transient ones back off
        scala.util.Try(f.sink match {
          case FeedSink.Store =>
            // S7 auto table creation (bin/daemon.js:233-262): the finder
            // creates the missing store BEFORE connecting the feed, so
            // a fresh registry row is queryable (empty) immediately
            MergeSink.bootstrap(spark, f.storeRoot)
            ChangesPipeline.start(
            spark, f.feedPath, f.storeRoot, f.checkpoint, n,
            since = f.since, maxChangesPerTrigger = f.maxChangesPerTrigger,
            trigger = trigger)
          case FeedSink.Index(textField, nBuckets) =>
            ChangesPipeline.startIndexing(
              spark, f.feedPath, f.storeRoot, f.checkpoint, n,
              textField = textField, nBuckets = nBuckets, since = f.since,
              maxChangesPerTrigger = f.maxChangesPerTrigger,
              trigger = trigger)
        }) match {
          case scala.util.Success(q) =>
            running(n) = (q, f)
            Some(n)
          case scala.util.Failure(e) =>
            fatalReason(e) match {
              case Some(reason) => halted(n) = reason
              case None =>
                val rec = failures.getOrElse(n, FailureRecord(0, 0L))
                failures(n) = FailureRecord(rec.count + 1, now)
            }
            None
        }
      }
      (started.sorted, toStop.sorted)
    }

  /** Per-feed status in the daemon's `/_status` shape
    * (bin/daemon.js:288-297, daemon-README.md:107-113). Before the
    * first progress event, `since` reports the configured resume point
    * (not 0) — matching what the reference's status would show for a
    * feed that has connected but not yet received a change. */
  def status(checkpoints: Map[String, String] = Map.empty): Seq[FeedStatus] =
    synchronized {
      running.toSeq.sortBy(_._1).map { case (name, (q, cfg)) =>
        FeedStatus(
          feed = name,
          alive = q.isActive,
          status = if (q.isActive) "running" else "stopped",
          since = Option(q.lastProgress)
            .flatMap(p => Option(p.sources).flatMap(_.headOption))
            .flatMap(s => Option(s.endOffset))
            .flatMap(o => scala.util.Try(
              ChangesOffset.fromJson(o).seq).toOption)
            .getOrElse(cfg.since),
          sinceCheckpoint = checkpoints.get(name)
            .flatMap(SinceCheckpoints.lastSince).getOrElse(0L))
      }
    }

  def statusJson(checkpoints: Map[String, String] = Map.empty): String =
    status(checkpoints).map(_.json).mkString("[", ",", "]")

  def stopAll(): Unit = synchronized {
    running.values.foreach { case (q, _) => if (q.isActive) q.stop() }
    running.clear()
  }
}

final case class FailureRecord(count: Int, atMillis: Long)

/** Restart delay policy (T6). `delayMs(feed, failures)` lets a policy
  * desynchronize across feeds; the 1-arg form is the per-feed shape. */
trait BackoffPolicy {
  def delayMs(failures: Int): Long
  def delayMs(feed: String, failures: Int): Long = delayMs(failures)
}

/** Deterministic exponential-with-cap — testable default. */
final case class RestartBackoff(baseMs: Long, maxMs: Long)
    extends BackoffPolicy {
  def delayMs(failures: Int): Long =
    if (failures <= 0) 0L
    else math.min(maxMs, baseMs << math.min(failures - 1, 10))
}

object RestartBackoff {
  val default: RestartBackoff = RestartBackoff(10000L, 60000L)
}

/** The reference's randomized restart delay — `Math.floor(Math.random()
  * * (60000 - 10000) + 10000)` (lib/index.js:225-229) — exists to avoid
  * a thundering herd when many feeds lose the same server. Here the
  * delay is a hash of (seed, feed, attempt): uniformly spread over
  * [minMs, maxMs) like the reference, but STABLE for a given attempt so
  * repeated reconcile passes agree on when the retry is due (a fresh
  * random per check would make the due-time flap). */
final case class JitteredBackoff(minMs: Long, maxMs: Long, seed: Long = 0L)
    extends BackoffPolicy {
  override def delayMs(failures: Int): Long = delayMs("", failures)
  override def delayMs(feed: String, failures: Int): Long =
    if (failures <= 0) 0L
    else {
      val h = scala.util.hashing.MurmurHash3.productHash(
        (seed, feed, failures))
      minMs + math.floorMod(h.toLong, math.max(1L, maxMs - minMs))
    }
}

final case class FeedStatus(
    feed: String, alive: Boolean, status: String,
    since: Long, sinceCheckpoint: Long) {
  def json: String =
    s"""{"feed":"$feed","status":{"alive":$alive,"status":"$status",""" +
      s""""since":$since,"since_checkpoint":$sinceCheckpoint}}"""
}

/** Minimal HTTP control endpoint — the daemon's API on :8888
  * (bin/daemon.js:264-310, T8): `/_status` per-feed JSON, `/_finder`
  * forces a reconcile pass, `/_watchdog` forces a reap pass
  * (bin/daemon.js:278). JDK built-in server; localhost only. */
final class StatusServer(
    supervisor: Supervisor,
    registry: () => Seq[FeedConfig],
    checkpoints: () => Map[String, String] = () => Map.empty,
    port: Int = 8888) {
  import com.sun.net.httpserver.{HttpExchange, HttpServer}

  private var server: HttpServer = _

  private def names(ns: Seq[String]): String =
    ns.map("\"" + _ + "\"").mkString("[", ",", "]")

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
        s"""{"started":${names(started)},"stopped":${names(stopped)}}""")
    })
    server.createContext("/_watchdog", (ex: HttpExchange) => {
      val (reaped, newlyHalted) = supervisor.watchdog()
      val haltedJson = supervisor.haltedFeeds.toSeq.sortBy(_._1)
        .map { case (n, r) =>
          s""""$n":"${r.replace("\\", "\\\\").replace("\"", "\\\"")}""""
        }.mkString("{", ",", "}")
      respond(ex,
        s"""{"reaped":${names(reaped)},"newly_halted":${names(newlyHalted)},""" +
          s""""halted":$haltedJson}""")
    })
    server.start()
    server.getAddress.getPort
  }

  def stop(): Unit = if (server != null) server.stop(0)
}
