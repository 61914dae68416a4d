package graft.pipeline

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Context-window chunking invariants: full coverage, overlap, short-doc
  * and exact-fit edges, fingerprint-equality ⇒ slice-equality, and the
  * dedup audit's token accounting. */
class ChunkingSpec extends SparkSpec {

  private def docs(rows: (Long, String, String)*) = {
    import spark.implicits._
    rows.toSeq.toDF("doc_id", "text", "source")
  }

  private def words(n: Int, tag: String = "w") =
    (0 until n).map(i => s"$tag$i").mkString(" ")

  test("short doc yields one chunk covering every token") {
    val out = Chunking.plan(docs((1L, words(7), "a"))).collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getAs[Long]("tok_start") === 0L)
    assert(r.getAs[Long]("tok_end") === 7L)
    assert(r.getAs[Long]("n_tok") === 7L)
  }

  test("exact-window doc yields one chunk; one more token adds a chunk") {
    assert(Chunking.plan(docs((1L, words(Chunking.Win), "a"))).count() === 1)
    assert(Chunking.plan(docs((1L, words(Chunking.Win + 1), "a"))).count() === 2)
  }

  test("chunks cover all tokens, overlap by win−stride, last may be short") {
    val n = 500
    val rows = Chunking.plan(docs((1L, words(n), "a")))
      .orderBy("chunk_id").collect()
    val expected = 1 + math.ceil(
      (n - Chunking.Win).toDouble / Chunking.Stride).toInt
    assert(rows.length === expected)
    rows.zipWithIndex.foreach { case (r, k) =>
      assert(r.getAs[Long]("tok_start") === k.toLong * Chunking.Stride)
      assert(r.getAs[Long]("tok_end") ===
        math.min(k.toLong * Chunking.Stride + Chunking.Win, n.toLong))
    }
    // coverage: consecutive starts differ by stride < win ⇒ no gaps
    assert(rows.last.getAs[Long]("tok_end") === n.toLong)
  }

  test("identical token slices get identical fingerprints across docs") {
    val t = words(50, "same")
    val out = Chunking.plan(docs((1L, t, "a"), (2L, t, "b"))).collect()
    assert(out.length === 2)
    assert(out.map(_.getAs[String]("chunk_md5")).distinct.length === 1)
  }

  test("dedup audit accounts every token and prices duplicates") {
    val t = words(30, "dup")
    val d = docs((1L, t, "s"), (2L, t, "s"), (3L, words(40, "uniq"), "s"))
    val a = Chunking.dedupAudit(d).collect()
    assert(a.length === 1)
    val r = a.head
    assert(r.getAs[Long]("n_chunks") === 3L)
    assert(r.getAs[Long]("n_distinct") === 2L)
    assert(r.getAs[Long]("tok_total") === 30L + 30L + 40L)
    assert(r.getAs[Long]("tok_saved") === 30L)
  }

  test("plan is a generator over each row — no shuffle in the plan") {
    val p = Chunking.plan(docs((1L, words(10), "a")))
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), s"chunk plan must not shuffle:\n$p")
  }

  test("bpeCountsCached == naive per-slice encode on every window edge") {
    // the vocab-cache plan must reproduce the naive composition
    // (re-encode each chunk's token slice) chunk-for-chunk: exercise
    // short docs, the exact-fit boundary, one-past boundaries, long
    // docs, repeated words (type-cache hits) and merge-active words
    // (multi-char tokens the BPE table actually rewrites)
    val win = 32; val stride = 24
    val texts = Seq(
      "hello",                                     // single word
      words(7),                                    // short
      words(win),                                  // exact fit
      words(win + 1),                              // one past
      words(stride * 3 + win),                     // boundary-aligned
      words(101, "the"),                           // heavy type reuse
      (0 until 90).map(i => s"inter${i % 5}national").mkString(" "))
    val d = docs(texts.zipWithIndex.map {
      case (t, i) => ((i + 1).toLong, t, "s") }: _*)
    val naive = Chunking.plan(d, win, stride, keepSlice = true)
      .select(col("doc_id"), col("chunk_id"),
        graft.functions.Text.bpeCount(col("chunk_toks")).as("bpe_tokens"))
      .orderBy("doc_id", "chunk_id").collect().map(_.toString).toSeq
    val cached = Chunking.bpeCountsCached(d, win, stride)
      .orderBy("doc_id", "chunk_id").collect().map(_.toString).toSeq
    assert(cached === naive)
  }
}
