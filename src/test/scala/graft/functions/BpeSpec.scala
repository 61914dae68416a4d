package graft.functions

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

/** BPE application invariants.
  *
  * The p70 oracle replays greedy merge passes as REPLACE chains over a
  * `|sym||sym|` delimiter encoding; the kernel walks symbol arrays. The
  * property test here proves those two formulations identical on random
  * words (the delimiter reference is implemented independently, with
  * String.replace), so the DuckDB oracle and the codegen'd kernel can
  * only agree or both be wrong in the same hand-checked way — and the
  * hand cases pin the known encodings.
  */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  private def enc(w: String): Seq[String] =
    Bpe.encodeWord(w, Bpe.PRETRAINED).toSeq

  /** Independent reference: the oracle's delimiter-REPLACE formulation.
    * Java String.replace(CharSequence) is a left-to-right
    * non-overlapping scan — the same contract as SQL REPLACE. */
  private def refCount(word: String): Int = {
    var s = word.map(c => s"|$c|").mkString
    for (m <- Bpe.PRETRAINED)
      s = s.replace(s"|${m(0)}||${m(1)}|", s"|${m(0)}${m(1)}|")
    (s.length - s.replace("|", "").length) / 2
  }

  test("hand-pinned encodings (chained merges land)") {
    assert(enc("customer") === Seq("cu", "st", "o", "mer"))
    assert(enc("hash") === Seq("hash")) // a+s, as+h, h+ash chain
    assert(enc("batch") === Seq("batch")) // at+c, atc+h, b+atch chain
    assert(enc("scan") === Seq("scan")) // a+n, c+an, s+can chain
    assert(enc("query") === Seq("q", "u", "er", "y"))
    assert(enc("stream") === Seq("st", "r", "e", "a", "m"))
    assert(enc("the") === Seq("t", "h", "e"))
    assert(enc("row") === Seq("row"))
  }

  test("edges: empty word, single char, unknown alphabet") {
    assert(enc("") === Seq.empty)
    assert(enc("x") === Seq("x"))
    assert(enc("zzz") === Seq("z", "z", "z"))
  }

  test("greedy left-to-right: overlapping pair runs merge pairwise") {
    // 'erer' -> er, er (rule 1 both); 'eee'+'r': e, e, er
    assert(enc("erer") === Seq("er", "er"))
    assert(enc("eeer") === Seq("e", "e", "er"))
  }

  test("kernel == delimiter-REPLACE reference on random words (property)") {
    val alpha = "abcehijlmnoprstuwc"
    val wordGen = Gen.chooseNum(0, 12).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf(alpha.toSeq)).map(_.mkString))
    val words = (1 to 400).flatMap(i =>
      wordGen.apply(Gen.Parameters.default, Seed(9100L + i)))
    assert(words.nonEmpty)
    for (w <- words)
      assert(enc(w).length === refCount(w), s"word '$w'")
  }

  test("SQL surface: bpe_count registered and codegen'd") {
    graft.GraftFunctions.install(spark)
    val out = Seq(("customer batch zz", 1), ("", 2))
      .toDF("text", "id")
      .selectExpr("id", "bpe_count(split(text, ' ')) AS n")
      .orderBy("id")
      .collect()
    // customer=4 batch=1 zz=2 -> 7; empty text splits to [""] -> 0
    assert(out.map(r => (r.getInt(0), r.getLong(1))).toSeq ===
      Seq((1, 7L), (2, 0L)))
  }

  test("expression stays inside whole-stage codegen") {
    // text must depend on a non-foldable column or ConstantFolding
    // evaluates the expression at plan time and nothing is codegen'd
    val df = spark.range(1)
      .select(concat(lit("customer batch"),
        when(col("id") < 0, "x").otherwise("")).as("text"))
      .select(Text.bpeCount(split(col("text"), " ")).as("n"))
    assert(df.head().getLong(0) === 5L)
    val p = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    val projLine = p.linesIterator
      .dropWhile(!_.matches(".*\\(\\d+\\) Project.*")).take(2).mkString("\n")
    assert(projLine.contains("codegen id"), s"Project not codegen'd:\n$p")
    assert(p.contains("bpecountexpr"), p)
  }
}
