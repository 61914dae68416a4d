package graft.streaming

import java.util.concurrent.ConcurrentLinkedQueue

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.sql.streaming.StreamingQueryListener._

/** The reference's EventEmitter bus (`connect`, `change.start/success`,
  * `checkpoint`, `error`, `stop` — reference lib/index.js:42, 199-232,
  * SURVEY §2.11 T9) projected onto Spark's StreamingQueryListener.
  *
  * One listener serves every feed on the session; events carry the
  * query name (= mangled feed name), so a log sink or the status API
  * can fan back out per feed.
  */
final class EventLog extends StreamingQueryListener {

  final case class Entry(event: String, query: String, detail: String)

  private val entries = new ConcurrentLinkedQueue[Entry]()

  def all: Seq[Entry] = entries.iterator().asScala.toSeq
  def forQuery(name: String): Seq[Entry] = all.filter(_.query == name)
  def clear(): Unit = entries.clear()

  /** `connect` (lib/index.js:251-255: feed confirmed). */
  override def onQueryStarted(e: QueryStartedEvent): Unit =
    entries.add(Entry("connect", e.name, e.id.toString))

  /** `change.success` + `checkpoint` per micro-batch: Spark commits
    * offsets with the batch, so one progress event covers both
    * (SURVEY §2.11 T5: strictly better than the timer-based 20 s/120 s
    * checkpoint cadence). */
  override def onQueryProgress(e: QueryProgressEvent): Unit = {
    val p = e.progress
    entries.add(Entry("change.success", p.name,
      s"rows=${p.numInputRows}"))
    entries.add(Entry("checkpoint", p.name,
      Option(p.sources).flatMap(_.headOption)
        .flatMap(s => Option(s.endOffset)).getOrElse("")))
  }

  /** `stop` / `error` (lib/index.js:205-230 error classification). */
  override def onQueryTerminated(e: QueryTerminatedEvent): Unit =
    entries.add(Entry(
      if (e.exception.isDefined) "error" else "stop",
      e.id.toString,
      e.exception.getOrElse("")))
}
