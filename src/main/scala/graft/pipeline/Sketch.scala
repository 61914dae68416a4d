package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic, engine-portable cardinality sketch — a HyperLogLog
  * built from md5 so that every intermediate (bucket, rho, the scaled
  * harmonic sum) is EXACT integer arithmetic reproduced bit-for-bit by
  * the DuckDB oracle. Built-in `approx_count_distinct` is also HLL but
  * its hash/seed is engine-private — fine in production, untestable
  * cross-engine; this sketch trades a few ns/row for full determinism.
  *
  * Why a sketch at 100 TB: exact `COUNT(DISTINCT x)` shuffles every
  * distinct value; the HLL reduces each partition to a 512-slot max-rho
  * table map-side (partial aggregation — max is mergeable), so the
  * shuffle carries m integers per partition regardless of data size.
  * Two corpora's sketches union by taking per-bucket max — the
  * cross-dataset dedup-accounting primitive.
  */
object Sketch {

  /** Bucket-count exponent: m = 2^b = 512 buckets; standard error
    * ~1.04/sqrt(m) ≈ 4.6 %. */
  val B = 9
  val M: Int = 1 << B
  private val WBITS = 32 - B // 23 value bits after the bucket bits

  /** alpha_m * m^2 * 2^(WBITS+1) — the estimator's constant numerator,
    * computed ONCE here and embedded as the same double literal in the
    * Spark plan and the oracle SQL (identical division both engines). */
  val K: Double =
    0.7213 / (1.0 + 1.079 / M) * M * M * (1L << (WBITS + 1)).toDouble

  /** One-row HLL summary of `valueCol`'s distinct count:
    * (used_buckets, zero_buckets, sum_scaled, estimate,
    * estimate_corrected — linear counting m·ln(m/zeros) in the small
    * range, the standard HLL correction below 2.5m where the raw
    * estimator is biased high).
    *
    * v = first 32 bits of md5(value); bucket = top B bits; rho = leading
    * zeros of the remaining WBITS bits + 1 (via length(bin(w)) — exact
    * integer bit-length, no float log). Each bucket keeps max(rho); the
    * harmonic sum is computed scaled by 2^(WBITS+1) so it stays an exact
    * BIGINT; the estimate is the single final double division. */
  /** The sketch's state table: (bucket, mrho), one row per touched
    * bucket — at most M rows however large the input. A single max
    * aggregation, so it runs UNCHANGED as a Structured Streaming
    * update-mode aggregation (streaming allows one aggregation per
    * query; the one-row estimate reduction happens batch-side via
    * [[estimateFromBuckets]] in foreachBatch — same split as the
    * trending top-k). Two sketches union by max per bucket. */
  def hllBuckets(df: DataFrame, valueCol: String): DataFrame = {
    val v = conv(substring(md5(col(valueCol).cast("string")), 1, 8), 16, 10)
      .cast("long")
    val w = v.bitwiseAND(lit((1L << WBITS) - 1))
    val rho = when(w === 0, lit(WBITS + 1))
      .otherwise(lit(WBITS + 1) - length(bin(w)))
    df.select(shiftright(v, WBITS).as("bucket"), rho.cast("int").as("rho"))
      .groupBy("bucket").agg(max("rho").as("mrho"))
  }

  /** One-row estimate from a (bucket, mrho) state table. */
  def estimateFromBuckets(buckets: DataFrame): DataFrame =
    buckets
      .agg(count(lit(1)).as("used_buckets"),
        sum(expr(s"shiftleft(CAST(1 AS BIGINT), ${WBITS + 1} - mrho)"))
          .as("sp"))
      .select(col("used_buckets"),
        (lit(M.toLong) - col("used_buckets")).as("zero_buckets"),
        (col("sp") + (lit(M.toLong) - col("used_buckets")) *
          lit(1L << (WBITS + 1))).as("sum_scaled"))
      .select(col("used_buckets"), col("zero_buckets"), col("sum_scaled"),
        (lit(K) / col("sum_scaled").cast("double")).as("estimate"))
      .withColumn("estimate_corrected",
        when(col("zero_buckets") > 0 && col("estimate") <= lit(2.5 * M),
          lit(M.toDouble) * log(lit(M.toDouble) /
            col("zero_buckets").cast("double")))
          .otherwise(col("estimate")))

  def hllSummary(df: DataFrame, valueCol: String): DataFrame =
    estimateFromBuckets(hllBuckets(df, valueCol))

  /** Histogram quantile sketch: per-group quantile ESTIMATES from a
    * fixed equi-width bin grid — the third mergeable sketch next to HLL
    * and CMS. Exact per-group quantiles need a full sort or rank of the
    * group; the histogram reduces each partition to at most `bins`
    * counted rows map-side (counts are additive = mergeable), so the
    * shuffle is O(groups × bins) whatever the corpus size, and two
    * corpora's histograms merge by adding counts. The estimate is the
    * inclusive upper edge of the first bin whose cumulative count
    * reaches ceil(q·n) — off by at most one bin width from the exact
    * quantile, which p58's oracle-checked audit measures directly.
    *
    * The grid is GLOBAL (one [min,max] for all groups), which is what
    * makes per-group histograms mergeable into corpus-level ones and
    * the sketch usable as streaming update-mode state. All arithmetic
    * is exact integer ops on the canonical long values — both engines
    * agree bit-for-bit. Caller guarantees (max-min+1)·bins fits a long.
    *
    * @param qsPermille quantiles as permille (500 = median, 900 = p90)
    * @return one row per group: groupCol, n, and `p<q>_est` per q
    */
  def histQuantiles(
      df: DataFrame, groupCol: String, valueCol: String,
      bins: Int, qsPermille: Seq[Int]): DataFrame = {
    require(bins > 0 && qsPermille.nonEmpty)
    import org.apache.spark.sql.expressions.Window
    val vals = df.select(col(groupCol), col(valueCol).cast("long").as("__v"))
    val bounds = vals.agg(min("__v").as("__lo"), max("__v").as("__hi"))
    val binned = vals.crossJoin(broadcast(bounds))
      .withColumn("__span", col("__hi") - col("__lo") + lit(1L))
      .withColumn("__bin", expr(s"((__v - __lo) * $bins) DIV __span"))
      .groupBy(col(groupCol), col("__bin"))
      .agg(count(lit(1)).as("__cnt"),
        first("__lo").as("__lo"), first("__span").as("__span"))
    val wCum = Window.partitionBy(groupCol).orderBy("__bin")
      .rowsBetween(Window.unboundedPreceding, 0)
    val wAll = Window.partitionBy(groupCol)
    val cum = binned
      .withColumn("__cum", sum("__cnt").over(wCum))
      .withColumn("__n", sum("__cnt").over(wAll))
      .withColumn("__edge",
        expr(s"__lo + ((__bin + 1) * __span) DIV $bins - 1"))
    val ests = qsPermille.map { q =>
      min(when(col("__cum") >= expr(s"($q * __n + 999) DIV 1000"),
        col("__edge"))).as(s"p${q}_est")
    }
    cum.groupBy(col(groupCol))
      .agg(max("__n").as("n"), ests: _*)
  }
}
