package graft.streaming

import java.nio.ByteBuffer
import java.nio.channels.FileChannel
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path}

import scala.jdk.CollectionConverters._

/** A read-only `IndexedSeq[String]` over the lines of a directory of
  * text part files (taken in file-name order) that keeps only byte
  * OFFSETS in driver memory — 8 bytes per line instead of the line
  * itself. [[CouchStubServer]] seeds from an `IndexedSeq[String]`
  * (its storage stand-in for an external CouchDB); slurping a staged
  * corpus-sized feed through `Files.readAllLines` made the driver hold
  * every change line at once, and at growing SF those single-threaded
  * slurps become each gate's wall-clock. This view scans each file once
  * to index newline positions, then serves:
  *
  *  - `apply(i)`: one positional `FileChannel.read` (thread-safe, no
  *    lock — the stub's handler pool reads pages concurrently);
  *  - `iterator`/`foreach`: a streaming buffered pass (the view-engine
  *    fold), never one-open-per-line.
  *
  * Lines must be '\n'-separated UTF-8 without embedded newlines —
  * exactly what `DataFrame.write.text` produces. Ordering across files
  * is the caller's contract (stage with a global `orderBy` when the
  * stub's positional `_changes` pager needs dense seq order).
  *
  * LIFECYCLE: the view holds one open FileChannel per part file for its
  * whole life — [[close]] releases them (and [[CouchStubServer.stop]]
  * closes closeable seedings, so the gate pattern `finally stub.stop()`
  * needs nothing extra). `apply` after close throws
  * ClosedChannelException, by design.
  */
final class FileBackedLines(files: Seq[Path])
    extends scala.collection.immutable.IndexedSeq[String]
    with AutoCloseable {

  /** All `.txt` part files under `dir`, in name order. */
  def this(dir: Path) = this {
    scala.util.Using.resource(Files.list(dir)) { st =>
      st.iterator().asScala
        .filter(_.getFileName.toString.endsWith(".txt"))
        .toSeq.sortBy(_.getFileName.toString)
    }
  }

  private val chans: Array[FileChannel] =
    files.map(f => FileChannel.open(f)).toArray

  /** Per file: start offset of each line (position after the previous
    * '\n'), built in one buffered scan. A trailing newline-less final
    * line is indexed too; an empty file contributes nothing. */
  private val offsets: Array[Array[Long]] = files.map { f =>
    val out = new scala.collection.mutable.ArrayBuffer[Long]
    scala.util.Using.resource(
      new java.io.BufferedInputStream(Files.newInputStream(f), 1 << 20)) { in =>
      var pos = 0L
      var atLineStart = true
      var b = in.read()
      while (b >= 0) {
        if (atLineStart) { out += pos; atLineStart = false }
        if (b == '\n') atLineStart = true
        pos += 1L
        b = in.read()
      }
    }
    out.toArray
  }.toArray

  private val fileEnd: Array[Long] = chans.map(_.size())

  /** Exclusive cumulative line counts: file i holds global indices
    * [cum(i), cum(i+1)). */
  private val cum: Array[Long] = offsets.scanLeft(0L)(_ + _.length)

  override val length: Int = {
    require(cum.last <= Int.MaxValue, s"${cum.last} lines exceed IndexedSeq")
    cum.last.toInt
  }

  override def apply(i: Int): String = {
    if (i < 0 || i >= length)
      throw new IndexOutOfBoundsException(s"$i of $length")
    // locate the file: last f with cum(f) <= i
    var f = java.util.Arrays.binarySearch(cum, i.toLong)
    if (f < 0) f = -f - 2
    while (cum(f + 1) <= i.toLong) f += 1 // skip empty files
    val j = (i.toLong - cum(f)).toInt
    val start = offsets(f)(j)
    val end =
      if (j + 1 < offsets(f).length) offsets(f)(j + 1) else fileEnd(f)
    val buf = ByteBuffer.allocate((end - start).toInt)
    var read = 0
    while (read < buf.capacity()) {
      val n = chans(f).read(buf, start + read)
      require(n > 0, s"short read at $start+$read of ${files(f)}")
      read += n
    }
    var len = buf.capacity()
    if (len > 0 && buf.get(len - 1) == '\n') len -= 1
    if (len > 0 && buf.get(len - 1) == '\r') len -= 1
    new String(buf.array(), 0, len, StandardCharsets.UTF_8)
  }

  /** Release the per-file channels. Iterators already in flight keep
    * their own readers (closed as each file drains); positional reads
    * after close throw ClosedChannelException. */
  override def close(): Unit = chans.foreach { c =>
    try c.close() catch { case _: java.io.IOException => () }
  }

  /** Streaming pass for foreach/fold consumers: one buffered reader per
    * file, no per-line channel reads. The reader for a file closes when
    * that file drains OR when a read fails mid-pass; a consumer that
    * abandons the iterator early (find/exists short-circuits) leaves at
    * most ONE reader for the GC's cleaner — callers wanting prompt
    * release should drain fully or use [[apply]]. */
  override def iterator: Iterator[String] =
    files.iterator.flatMap { f =>
      // readAllLines-free: the BufferedReader's lines are consumed and
      // dropped one at a time; the reader closes when its file drains
      val r = Files.newBufferedReader(f, StandardCharsets.UTF_8)
      def readOrClose(): String = {
        val l =
          try r.readLine()
          catch { case e: java.io.IOException => r.close(); throw e }
        if (l == null) r.close()
        l
      }
      new Iterator[String] {
        private var nextLine = readOrClose()
        def hasNext: Boolean = nextLine != null
        def next(): String = {
          val l = nextLine
          nextLine = readOrClose()
          l
        }
      }
    }
}
