package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join — for every left row, the single most recent
  * right row with `rightTime <= leftTime` in the same key group (the
  * time-series join Spark lacks as a built-in; DuckDB spells it
  * `ASOF JOIN`, pandas `merge_asof`).
  *
  * Implementation is union + running `last(_, ignoreNulls)` over a
  * key-partitioned window, NOT a range join:
  *
  *  - a range-predicate join (`l.key = r.key AND r.ts <= l.ts`) plans as
  *    an equi-join on key with a per-group filter, materializing every
  *    (left, earlier-right) pair before picking the max — O(n·m) per key
  *    group, a scale-killer when a key has millions of rows;
  *  - the union plan shuffles each row exactly ONCE (by key), sorts
  *    within partitions, and streams a single running state per group —
  *    O((n+m) log(n+m)) per partition, no pair blow-up, and the window
  *    is key-partitioned so 100 TB spreads across every executor.
  *
  * Tie semantics: a right row at exactly `rightTime == leftTime` IS
  * visible to that left row (<=, matching DuckDB ASOF). Among right rows
  * sharing the same (key, time) — ambiguous under as-of semantics —
  * the one with the greatest `carried` struct wins (deterministic).
  */
object AsOfJoin {

  /** @param left      probe side; all its columns survive
    * @param right     build side; only `carry` columns survive
    * @param key       equi-key column name present on both sides
    * @param leftTime  event-time column on `left`
    * @param rightTime event-time column on `right`
    * @param carry     right columns to carry onto each left row
    *                  (null-valued when no right row precedes);
    *                  emitted as `prefix + name`
    */
  def backward(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTime: String,
      rightTime: String,
      carry: Seq[String],
      prefix: String = "asof_"): DataFrame = {
    val carryStruct = struct(carry.map(right(_)): _*)
    val l = left.select(
      col(key).as("__k"), col(leftTime).as("__t"),
      lit(1).as("__isLeft"), struct(left.columns.map(col): _*).as("__row"),
      lit(null).cast(right.select(carryStruct).schema.head.dataType).as("__c"))
    val r = right.select(
      col(key).as("__k"), col(rightTime).as("__t"),
      lit(0).as("__isLeft"), lit(null).cast(l.schema("__row").dataType).as("__row"),
      carryStruct.as("__c"))
    // right rows sort BEFORE left rows at equal time (__isLeft 0 < 1) so
    // an exactly-simultaneous right row is visible; __c breaks right-side
    // time ties deterministically
    val w = Window.partitionBy("__k")
      .orderBy(col("__t"), col("__isLeft"), col("__c"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val joined = l.unionByName(r)
      .withColumn("__carried", last(col("__c"), ignoreNulls = true).over(w))
      .filter(col("__isLeft") === 1)
    val outLeft = left.columns.map(c => col("__row").getField(c).as(c))
    val outCarry = carry.map(c => col("__carried").getField(c).as(prefix + c))
    joined.select(outLeft ++ outCarry: _*)
  }
}
