package graft.streaming

import java.io.{BufferedReader, FileInputStream, InputStreamReader}
import java.nio.charset.StandardCharsets

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
  *    replay feed (one line per change, the wire shape FIXTURES.md §1).
  *    Splittable by byte range, so a large feed file parses in parallel
  *    across partition readers instead of once per reader.
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

  /** Events from one byte slice of a JSONL file: skip to `startByte`,
    * discard the partial line unless at 0, stop once the slice is
    * consumed (a line STARTING inside the slice belongs to it — the
    * standard splittable-text convention, so slices never duplicate or
    * drop a line). */
  def readSlice(file: String, startByte: Long, endByte: Long)
      : Iterator[ChangeEvent] = {
    val mapper = new ObjectMapper()
    val in = new FileInputStream(file)
    var pos = 0L
    if (startByte > 0) {
      var skipped = 0L
      while (skipped < startByte) skipped += in.skip(startByte - skipped)
      pos = startByte
    }
    val reader = new BufferedReader(
      new InputStreamReader(in, StandardCharsets.UTF_8), 1 << 16)
    var linePos = pos // byte position where the NEXT line starts
    if (startByte > 0) {
      val partial = reader.readLine()
      if (partial == null) { reader.close(); return Iterator.empty }
      linePos += partial.getBytes(StandardCharsets.UTF_8).length + 1
    }
    new Iterator[ChangeEvent] {
      private var nextEv: ChangeEvent = _
      private var done = false
      private def advance(): Unit = {
        nextEv = null
        while (nextEv == null && !done) {
          if (linePos > endByte) { done = true; reader.close() }
          else {
            val line = reader.readLine()
            if (line == null) { done = true; reader.close() }
            else {
              linePos += line.getBytes(StandardCharsets.UTF_8).length + 1
              nextEv = ChangesFeed.parseLine(mapper, line).orNull
            }
          }
        }
      }
      advance()
      override def hasNext: Boolean = nextEv != null
      override def next(): ChangeEvent = {
        val e = nextEv; advance(); e
      }
    }
  }
}

/** JSONL-backed feed: `path` is a file or a directory of `*.jsonl`
  * files. Each line is one change event; seq order need not match line
  * order (readers sort their slice). Serializable so executors can
  * re-open it — only the path ships with the task, never the data.
  * Driver-side seq scans are memoized per (file, mtime, size). */
final class FileChangesFeed(val path: String) extends ChangesFeed {
  @transient private lazy val mapper = new ObjectMapper()

  def files(): Seq[java.io.File] = {
    val f = new java.io.File(path)
    if (f.isDirectory)
      f.listFiles((_, n) => n.endsWith(".jsonl")).toSeq.sortBy(_.getName)
    else if (f.exists) Seq(f)
    else Seq.empty
  }

  // (path, mtime, length) -> sorted seqs; driver calls latestSeq /
  // seqsAfter once or twice per trigger — without the memo each call
  // is a full file parse.
  @transient private lazy val seqCache =
    scala.collection.mutable.Map.empty[(String, Long, Long), Array[Long]]

  private def seqsOf(f: java.io.File): Array[Long] = synchronized {
    val key = (f.getPath, f.lastModified(), f.length())
    seqCache.getOrElseUpdate(key, {
      val src = scala.io.Source.fromFile(f, "UTF-8")
      try src.getLines()
        .flatMap(ChangesFeed.parseLine(mapper, _)).map(_.seq)
        .toArray.sorted
      finally src.close()
    })
  }

  private def allSeqs(): Array[Long] = {
    val arrs = files().map(seqsOf)
    if (arrs.isEmpty) Array.empty
    else if (arrs.size == 1) arrs.head
    else arrs.flatten.sorted.toArray
  }

  override def latestSeq(): Long =
    allSeqs().lastOption.getOrElse(0L)

  override def changes(since: Long, until: Long): Iterator[ChangeEvent] =
    files().iterator.flatMap(f =>
      ChangesFeed.readSlice(f.getPath, 0L, Long.MaxValue))
      .filter(e => e.seq > since && e.seq <= until)
      .toVector.sortBy(_.seq).iterator

  override def seqsAfter(since: Long): Seq[Long] = {
    val all = allSeqs()
    val from = java.util.Arrays.binarySearch(all, since + 1) match {
      case i if i >= 0 => i
      case i => -i - 1
    }
    all.drop(from).toSeq
  }

  /** Byte-range slices across all files, ~`target` total — the unit of
    * read parallelism for planInputPartitions. */
  def slices(target: Int): Seq[(String, Long, Long)] = {
    val fs = files()
    if (fs.isEmpty) return Seq.empty
    val perFile = math.max(1, target / fs.size)
    fs.flatMap { f =>
      val len = f.length()
      val n = math.max(1, math.min(perFile, (len / (1 << 20)).toInt + 1))
      (0 until n).map { i =>
        val s = len * i / n
        val e = if (i == n - 1) Long.MaxValue else len * (i + 1) / n - 1
        (f.getPath, s, e)
      }
    }
  }
}
