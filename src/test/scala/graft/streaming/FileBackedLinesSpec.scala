package graft.streaming

import java.nio.charset.StandardCharsets
import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

class FileBackedLinesSpec extends AnyFunSuite {

  private def dirWith(files: (String, String)*): java.nio.file.Path = {
    val d = Files.createTempDirectory("fbl")
    files.foreach { case (name, content) =>
      Files.write(d.resolve(name), content.getBytes(StandardCharsets.UTF_8))
    }
    d
  }

  test("indexes lines across part files in name order") {
    val d = dirWith(
      "part-00000.txt" -> "a0\na1\n",
      "part-00001.txt" -> "b0\n",
      "part-00002.txt" -> "c0\nc1\nc2\n")
    val v = new FileBackedLines(d)
    assert(v.length == 6)
    assert(v.toList == List("a0", "a1", "b0", "c0", "c1", "c2"))
    assert(v(0) == "a0" && v(2) == "b0" && v(5) == "c2")
    assert(v.last == "c2")
    assert(v.slice(1, 4) == Seq("a1", "b0", "c0"))
  }

  test("handles empty part files and a newline-less final line") {
    val d = dirWith(
      "part-00000.txt" -> "",
      "part-00001.txt" -> "x\ny", // no trailing newline
      "part-00002.txt" -> "",
      "part-00003.txt" -> "z\n")
    val v = new FileBackedLines(d)
    assert(v.length == 3)
    assert(v.toList == List("x", "y", "z"))
    assert(v(1) == "y" && v(2) == "z")
  }

  test("non-.txt files are ignored; utf-8 survives the round-trip") {
    val d = dirWith(
      "part-00000.txt" -> "café 中文\nplain\n",
      "_SUCCESS" -> "",
      "part-00000.txt.crc" -> "junk")
    val v = new FileBackedLines(d)
    assert(v.length == 2)
    assert(v(0) == "café 中文")
    // apply() (positional channel read) and iterator (buffered pass)
    // must agree byte-for-byte
    assert(v.iterator.toList == (0 until v.length).map(v(_)).toList)
  }

  test("serves as a CouchStubServer storage stand-in") {
    val lines = (1 to 7).map(i =>
      s"""{"seq":$i,"id":"$i","changes":[{"rev":"1-a"}],"doc":{"k":$i}}""")
    val d = dirWith(
      "part-00000.txt" -> lines.take(3).mkString("", "\n", "\n"),
      "part-00001.txt" -> lines.drop(3).mkString("", "\n", "\n"))
    val stub = new CouchStubServer("db", new FileBackedLines(d))
    val port = stub.start()
    try {
      val body = new String(
        new java.net.URI(s"http://127.0.0.1:$port/db/_changes?since=5")
          .toURL.openStream().readAllBytes(), StandardCharsets.UTF_8)
      assert(body.contains(""""seq":6""") && body.contains(""""seq":7"""))
      assert(!body.contains(""""seq":5"""))
      assert(body.contains(""""last_seq":7"""))
    } finally stub.stop()
  }
}
