package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Band (interval) join on a totally ordered axis WITHOUT an equi-key.
  *
  * The declarative form — `a JOIN b ON b.x >= a.x + lo AND b.x < a.x + hi`
  * — has no equi-condition, so Catalyst can only plan a broadcast
  * nested-loop or cartesian product: O(|A|·|B|) comparisons, dead at
  * scale. The reference's query plane inherits the same shape from
  * PostgreSQL (a nested-loop over a btree at best, still serial).
  *
  * Scale-correct plan: quantize the axis into fixed buckets of width
  * exactly `hi - lo`. A right row lands in ONE bucket; a left row's
  * interval `[x+lo, x+hi)` spans AT MOST TWO consecutive buckets, so the
  * left side explodes into <= 2 probe keys and the join becomes a plain
  * equi-join on the bucket id followed by the exact range predicate.
  * Each qualifying pair is emitted exactly once (right bucket is unique;
  * left probes are de-duplicated). Cost: one shuffle on a fixed-width
  * long key, |A|·<=2 + |B| rows — linear, AQE-skew-splittable.
  *
  * Axis values are exact non-negative integers (e.g. `unix_micros(ts)`),
  * so bucket arithmetic is reproducible across engines. Bucket ids use
  * `(x - x % w) / w`, never `floor(x / w)`: Spark's `/` on longs is
  * DOUBLE division, and a double rounding a hair below an exact multiple
  * flips `floor` off by one at bucket boundaries; the subtract-mod form
  * divides an exactly-representable multiple of w, which is exact.
  */
object RangeJoin {

  /** Exact floor-division of a non-negative long column by a constant. */
  private def floorDiv(x: Column, w: Long): Column =
    ((x - (x % w)) / w).cast("long")

  /** Pairs (left, right) with `right(axis) ∈ [left(axis)+lo, left(axis)+hi)`.
    *
    * @param left     probe side; its columns survive with their names
    * @param right    build side; its columns survive with their names
    *                 (caller must disambiguate duplicates beforehand)
    * @param leftAxis exact-integer axis column on `left`
    * @param rightAxis exact-integer axis column on `right`
    * @param lo,hi    band offsets, `lo < hi`; bucket width = hi - lo
    */
  def bandJoin(
      left: DataFrame, right: DataFrame,
      leftAxis: Column, rightAxis: Column,
      lo: Long, hi: Long): DataFrame = {
    require(lo < hi, s"need lo < hi, got [$lo, $hi)")
    val w = hi - lo
    val r = right.withColumn("__rj_bucket", floorDiv(rightAxis, w))
    val l = left
      .withColumn("__rj_lax", leftAxis.cast("long"))
      .withColumn("__rj_bucket",
        explode(array_distinct(array(
          floorDiv(leftAxis + lo, w),
          floorDiv(leftAxis + hi - 1, w)))))
    l.join(r, "__rj_bucket")
      .where(rightAxis >= col("__rj_lax") + lo &&
        rightAxis < col("__rj_lax") + hi)
      .drop("__rj_bucket", "__rj_lax")
  }
}
