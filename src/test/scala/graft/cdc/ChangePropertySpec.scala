package graft.cdc

import org.apache.spark.sql.DataFrame
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

/** Property tests for the CDC merge (SURVEY.md §5): idempotence, replay
  * convergence, order-independence, count invariant.
  *
  * ScalaCheck generators are driven manually with fixed seeds (the
  * scalatest-scalacheck bridge artifact isn't on the offline classpath);
  * 12 deterministic samples per property.
  */
class ChangePropertySpec extends SparkSpec {
  import spark.implicits._

  /** Deterministic sample set from a generator. */
  private def samples[A](g: Gen[A], n: Int = 12): Seq[A] =
    (1 to n).flatMap(i =>
      g.apply(Gen.Parameters.default.withSize(8 + i * 2), Seed(i.toLong)))

  private def forAll[A](g: Gen[A])(body: A => Unit): Unit =
    samples(g).foreach(body)

  private def whenever(cond: Boolean)(body: => Unit): Unit =
    if (cond) body

  private val ids = Gen.oneOf("a", "b", "c", "d", "e")

  /** Random change sequence with monotonically-assigned seqs; rev derives
    * deterministically from (id, seq) so redelivery duplicates are
    * byte-identical (CouchDB semantics). */
  private val changeSeqGen: Gen[List[ChangeEvent]] =
    Gen.listOf(Gen.zip(ids, Gen.oneOf(true, false))).map { picks =>
      picks.zipWithIndex.map { case ((id, del), i) =>
        val seq = i + 1L
        val rev = s"${seq % 4 + 1}-h$id$seq"
        ChangeEvent(seq, id, rev,
          deleted = del, doc = if (del) null else s"""{"id":"$id","s":$seq}""")
      }
    }

  private def df(ch: Seq[ChangeEvent]): DataFrame =
    ch.toDF().select("seq", "id", "rev", "deleted", "doc")

  private val empty: DataFrame =
    Seq.empty[(String, String, String)].toDF("id", "rev", "doc")

  private def stateSet(d: DataFrame): Set[(String, String, String)] =
    d.select("id", "rev", "doc").as[(String, String, String)].collect().toSet

  test("idempotence: applying a batch twice == once") {
    forAll(changeSeqGen) { ch =>
      val once = ChangeApply.applyChanges(empty, df(ch))
      val twice = ChangeApply.applyChanges(once, df(ch))
      assert(stateSet(once) == stateSet(twice))
    }
  }

  test("replay from older checkpoint converges (at-least-once safety)") {
    forAll(changeSeqGen) { ch =>
      whenever(ch.length >= 2) {
        val (b1, b2) = ch.splitAt(ch.length / 2)
        val split = ChangeApply.applyAll(empty, Seq(df(b1), df(b2)))
        // replay: second application starts from an older checkpoint and
        // re-delivers b1 alongside b2
        val replay = ChangeApply.applyAll(empty, Seq(df(b1), df(b1 ++ b2)))
        assert(stateSet(split) == stateSet(replay))
      }
    }
  }

  test("order-independence within a batch after seq dedup (T1)") {
    forAll(changeSeqGen) { ch =>
      val shuffled = scala.util.Random.shuffle(ch)
      assert(stateSet(ChangeApply.applyChanges(empty, df(ch))) ==
        stateSet(ChangeApply.applyChanges(empty, df(shuffled))))
    }
  }

  test("count invariant: |state| == |live ids| (nagios check semantics)") {
    forAll(changeSeqGen) { ch =>
      val live = ch.groupBy(_.id).values
        .map(_.maxBy(_.seq)).count(!_.deleted)
      val st = ChangeApply.applyChanges(empty, df(ch))
      assert(st.count() == live)
    }
  }

  test("batched == one-by-one serialized apply (reference equivalence)") {
    forAll(changeSeqGen) { ch =>
      val batched = ChangeApply.applyChanges(empty, df(ch))
      val serial = ch.foldLeft(Map.empty[String, (String, String)]) {
        case (st, c) =>
          if (c.deleted) st - c.id
          else st.get(c.id) match {
            case Some((rev, _)) if rev == c.rev => st // NOOP
            case _ => st + (c.id -> (c.rev, c.doc))
          }
      }
      val serialSet = serial.map { case (id, (rev, doc)) => (id, rev, doc) }.toSet
      assert(stateSet(batched) == serialSet)
    }
  }
}
