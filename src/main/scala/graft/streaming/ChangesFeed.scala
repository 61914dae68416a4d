package graft.streaming

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

import graft.cdc.ChangeEvent

/** A CouchDB `_changes` feed client abstraction.
  *
  * The reference follows the feed over a long-lived HTTP socket
  * (reference lib/index.js:50-53, 243-290: `follow.Feed({db,
  * include_docs:true})`, resume from `since`, 30 s inactivity timeout).
  * In the Spark source the same contract becomes a pull API keyed by the
  * monotonic `seq`: "give me changes with seq in (since, until]" — which
  * is exactly what a micro-batch needs and what CouchDB's
  * `_changes?since=N&limit=M` endpoint serves.
  *
  * Implementations:
  *  - [[FileChangesFeed]] — JSONL file(s) on disk; deterministic test /
  *    replay feed (one line per change, the wire shape FIXTURES.md §1);
  *  - an HTTP implementation is a thin drop-in (`GET
  *    /db/_changes?include_docs=true&since=N&limit=M`) — not included
  *    here because this environment is zero-egress; nothing else in the
  *    source changes.
  */
trait ChangesFeed extends Serializable {
  /** Highest seq currently available (the feed's `last_seq`). */
  def latestSeq(): Long

  /** Changes with `seq` in (since, until], ordered by seq. */
  def changes(since: Long, until: Long): Iterator[ChangeEvent]

  /** Seqs available in (since, +inf), ascending — used by admission
    * control to cap a micro-batch at N changes. */
  def seqsAfter(since: Long): Seq[Long]
}

object ChangesFeed {
  /** Parse one `_changes` JSON line (the reference's change object
    * `{seq, id, changes:[{rev}], deleted?, doc}`, lib/index.js:185-195).
    * Lines without a seq (e.g. the `last_seq` trailer) return None. */
  def parseLine(mapper: ObjectMapper, line: String): Option[ChangeEvent] = {
    val trimmed = line.trim
    if (trimmed.isEmpty) return None
    val n: JsonNode = mapper.readTree(trimmed)
    if (!n.has("seq") || !n.has("id")) return None
    val rev =
      if (n.has("changes") && n.get("changes").size() > 0)
        n.get("changes").get(0).path("rev").asText(null)
      else null
    val doc = if (n.has("doc") && !n.get("doc").isNull)
      mapper.writeValueAsString(n.get("doc")) else null
    Some(ChangeEvent(
      seq = n.get("seq").asLong(),
      id = n.get("id").asText(),
      rev = rev,
      deleted = n.path("deleted").asBoolean(false),
      doc = doc))
  }
}

/** JSONL-backed feed: `path` is a file or a directory of `*.jsonl`
  * files. Each line is one change event; seq order need not match line
  * order (the reader sorts). Serializable so executors can re-open it —
  * only the path ships with the task, never the data. */
final class FileChangesFeed(val path: String) extends ChangesFeed {
  @transient private lazy val mapper = new ObjectMapper()

  private def files(): Seq[java.io.File] = {
    val f = new java.io.File(path)
    if (f.isDirectory)
      f.listFiles((_, n) => n.endsWith(".jsonl")).toSeq.sortBy(_.getName)
    else if (f.exists) Seq(f)
    else Seq.empty
  }

  private def allEvents(): Iterator[ChangeEvent] =
    files().iterator.flatMap { f =>
      val src = scala.io.Source.fromFile(f, "UTF-8")
      try src.getLines().flatMap(ChangesFeed.parseLine(mapper, _)).toVector
      finally src.close()
    }

  override def latestSeq(): Long =
    allEvents().map(_.seq).foldLeft(0L)(math.max)

  override def changes(since: Long, until: Long): Iterator[ChangeEvent] =
    allEvents().filter(e => e.seq > since && e.seq <= until)
      .toVector.sortBy(_.seq).iterator

  override def seqsAfter(since: Long): Seq[Long] =
    allEvents().map(_.seq).filter(_ > since).toVector.sorted
}
