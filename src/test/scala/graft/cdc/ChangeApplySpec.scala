package graft.cdc

import org.apache.spark.sql.DataFrame
import graft.SparkSpec

/** Unit grid for the T4 upsert decision tree (FIXTURES.md §4) and the
  * batch-collapse semantics (T1). */
class ChangeApplySpec extends SparkSpec {
  import spark.implicits._

  private def state(rows: (String, String, String)*): DataFrame =
    rows.toDF("id", "rev", "doc")

  private def changes(rows: (Long, String, String, Boolean, String)*): DataFrame =
    rows.toDF("seq", "id", "rev", "deleted", "doc")

  private def stateSet(df: DataFrame): Set[(String, String, String)] =
    df.select("id", "rev", "doc").as[(String, String, String)].collect().toSet

  private def actions(df: DataFrame): Map[String, String] =
    df.select("id", "action").as[(String, String)].collect().toMap

  test("absent + doc => INSERT") {
    val out = ChangeApply.planActions(
      state(), changes((1L, "a", "1-x", false, """{"v":1}""")))
    assert(actions(out) == Map("a" -> "INSERT"))
  }

  test("absent + excluded type => IGNORE (lib/index.js:131-146)") {
    val out = ChangeApply.planActions(
      state(),
      changes((1L, "a", "1-x", false, """{"type":"Harms::X"}""")),
      excludeTypes = Set("Harms::X"))
    assert(actions(out) == Map("a" -> "IGNORE"))
  }

  test("present + excluded type => still UPDATE (exclusion guards insert only)") {
    val out = ChangeApply.planActions(
      state(("a", "1-x", """{"type":"Harms::X"}""")),
      changes((1L, "a", "2-y", false, """{"type":"Harms::X"}""")),
      excludeTypes = Set("Harms::X"))
    assert(actions(out) == Map("a" -> "UPDATE"))
  }

  test("present + rev differs => UPDATE") {
    val out = ChangeApply.planActions(
      state(("a", "1-x", """{"v":1}""")),
      changes((2L, "a", "2-y", false, """{"v":2}""")))
    assert(actions(out) == Map("a" -> "UPDATE"))
  }

  test("present + same rev => NOOP (idempotent replay, lib/index.js:125-128)") {
    val out = ChangeApply.planActions(
      state(("a", "1-x", """{"v":1}""")),
      changes((2L, "a", "1-x", false, """{"v":1}""")))
    assert(actions(out) == Map("a" -> "NOOP"))
  }

  test("present + deleted => DELETE") {
    val out = ChangeApply.planActions(
      state(("a", "1-x", """{"v":1}""")),
      changes((2L, "a", "2-y", true, null)))
    assert(actions(out) == Map("a" -> "DELETE"))
  }

  test("absent + deleted => DELETE_NOOP (nothing to delete)") {
    val out = ChangeApply.planActions(
      state(), changes((2L, "a", "2-y", true, null)))
    assert(actions(out) == Map("a" -> "DELETE_NOOP"))
  }

  test("rev compare is full-string, not ordinal (lib/index.js:110)") {
    // same ordinal, different hash => must UPDATE, not NOOP
    val out = ChangeApply.planActions(
      state(("a", "2-aaa", """{"v":1}""")),
      changes((2L, "a", "2-bbb", false, """{"v":2}""")))
    assert(actions(out) == Map("a" -> "UPDATE"))
  }

  test("batch collapse: max(seq) wins per key (T1)") {
    val st = ChangeApply.applyChanges(
      state(),
      changes(
        (1L, "a", "1-x", false, """{"v":1}"""),
        (3L, "a", "3-z", false, """{"v":3}"""),
        (2L, "a", "2-y", false, """{"v":2}""")))
    assert(stateSet(st) == Set(("a", "3-z", """{"v":3}""")))
  }

  test("delete-then-recreate within one batch: latest wins") {
    val st = ChangeApply.applyChanges(
      state(("a", "1-x", """{"v":1}""")),
      changes(
        (2L, "a", "2-y", true, null),
        (3L, "a", "1-new", false, """{"v":9}""")))
    assert(stateSet(st) == Set(("a", "1-new", """{"v":9}""")))
  }

  test("echo convergence (T10): write-back echo with same rev NOOPs") {
    val s0 = state(("a", "2-echo", """{"v":2}"""))
    val st = ChangeApply.applyChanges(
      s0, changes((5L, "a", "2-echo", false, """{"v":2}""")))
    assert(stateSet(st) == stateSet(s0))
  }

  test("applyAll folds batches in order") {
    val st = ChangeApply.applyAll(
      state(),
      Seq(
        changes((1L, "a", "1-x", false, """{"v":1}"""),
          (2L, "b", "1-y", false, """{"v":2}""")),
        changes((3L, "a", "2-z", false, """{"v":3}"""),
          (4L, "b", "2-w", true, null))))
    assert(stateSet(st) == Set(("a", "2-z", """{"v":3}""")))
  }

  test("map hook transforms docs pre-upsert (P9, lib/index.js:188-190)") {
    import org.apache.spark.sql.functions._
    val st = ChangeApply.applyChanges(
      state(),
      changes((1L, "a", "1-x", false, """{"v":1}""")),
      mapDoc = Some(d => regexp_replace(d, "1", "7")))
    assert(stateSet(st) == Set(("a", "1-x", """{"v":7}""")))
  }
}
