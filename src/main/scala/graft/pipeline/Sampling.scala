package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling / dataset-split operators.
  *
  * Training pipelines must never sample with `rand()`: results change
  * per run, per partitioning, and per engine, making experiments
  * unreproducible and making the train/test boundary leak when data is
  * reprocessed. Everything here keys on md5(salt:id) — the same doc
  * lands in the same split on every engine that agrees on md5 (DuckDB
  * reproduces it exactly), re-runs are idempotent, and changing the
  * salt re-rolls the assignment intentionally.
  *
  * Granularity is permille (md5-derived bucket in [0, 1000)): weights
  * are quantized to 0.1 %, plenty for split ratios.
  */
object Sampling {

  /** md5-derived bucket in [0, 1000): the first 8 hex chars of
    * md5(salt:id) as an integer, mod 1000. Uniform (md5 avalanche),
    * deterministic, engine-portable. */
  def hashBucket(id: Column, salt: String): Column =
    conv(substring(md5(concat(lit(s"$salt:"), id.cast("string"))), 1, 8),
      16, 10).cast("long") % 1000

  /** Named split assignment, e.g.
    * `hashSplit($"doc_id", Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))`.
    * Weights must sum to 1.0 (±rounding); assignment follows cumulative
    * permille thresholds over [[hashBucket]]. */
  def hashSplit(
      id: Column, weights: Seq[(String, Double)],
      salt: String = "split"): Column = {
    require(weights.nonEmpty, "hashSplit needs at least one split")
    require(math.abs(weights.map(_._2).sum - 1.0) < 1e-6,
      s"split weights must sum to 1.0, got ${weights.map(_._2).sum}")
    val bucket = hashBucket(id, salt)
    val cum = weights.scanLeft(0L) { case (acc, (_, w)) =>
      acc + math.round(w * 1000)
    }.tail
    val cases = weights.map(_._1).zip(cum)
    cases.init.foldRight(lit(cases.last._1): Column) {
      case ((name, upper), rest) => when(bucket < upper, lit(name)).otherwise(rest)
    }
  }

  /** Deterministic Bernoulli-style sample: keep iff bucket < fraction
    * (permille-quantized). Same id always gets the same verdict. */
  def hashSample(id: Column, fraction: Double,
      salt: String = "sample"): Column =
    hashBucket(id, salt) < math.round(fraction * 1000)

  /** Weighted sampling without replacement (Efraimidis-Spirakis A-ES),
    * deterministic: each row draws u = md5-derived uniform in (0,1] and
    * ranks by key = ln(u)/w (equivalently u^(1/w)); the top-k keys are
    * a weight-proportional sample. rand()-free — the draw is a pure
    * function of (id, salt), so engines and re-runs agree exactly.
    *
    * Weights must be positive for A-ES to be well-defined; they are
    * clamped to >= 1e-6 so a zero weight yields a finite (deeply
    * negative, i.e. effectively-never-sampled) key instead of
    * -Infinity, whose downstream nano-quantization would overflow
    * BIGINT and diverge across engines. Negative weights are clamped
    * too (unclamped they would silently invert the ranking); callers
    * wanting hard exclusion should filter, not pass w <= 0.
    *
    * SCALE: one projection + a global top-k (TakeOrderedAndProject) —
    * no shuffle beyond the k survivors per partition. */
  def weightedSampleKey(
      id: Column, weight: Column, salt: String = "wsample"): Column = {
    // 12 hex chars = 48 bits: (h+1)/2^48 ∈ (0,1], exact in a double
    val h = conv(substring(md5(concat(lit(s"$salt:"), id.cast("string"))),
      1, 12), 16, 10).cast("long")
    log((h.cast("double") + lit(1.0d)) / lit(281474976710656.0d)) /
      greatest(weight, lit(1e-6d))
  }

  /** Stratified balanced sampling: deterministically thin each group to
    * ~`cap` rows in expectation — the language/domain rebalancing step
    * of corpus curation (down-weight over-represented strata; groups at
    * or under the cap are untouched).
    *
    * A row survives iff `hashBucket(id) < (min(cap, n_g) * 1000) DIV
    * n_g` — a per-group Bernoulli keep-rate of ~cap/n_g quantized to
    * permille. Deterministic per (id, salt): re-runs and engines agree
    * row-for-row, and the survivor set of a smaller cap is a subset of
    * a larger cap's (nested samples, the property curriculum-mixing
    * jobs need).
    *
    * SCALE: group counts are a tiny aggregate (|groups| rows) joined
    * back by broadcast — the data itself never shuffles; one scan, one
    * map-side filter. Exact-count quotas would need a per-group rank
    * (see [[capPerGroup]]) and shuffle everything. */
  def balancedSample(
      df: DataFrame, groupCol: String, idCol: String, cap: Long,
      salt: String = "balance"): DataFrame = {
    val counts = df.groupBy(col(groupCol)).agg(count(lit(1)).as("__n"))
    df.join(broadcast(counts), groupCol)
      .where(hashBucket(col(idCol), salt) <
        expr(s"(least(CAST($cap AS BIGINT), __n) * 1000) DIV __n"))
      .drop("__n")
  }

  /** Repetition capping: keep at most `n` rows per group, ranked by
    * `order` (pass a deterministic total order — e.g. quality desc then
    * id — or the survivor set is partition-dependent). The
    * over-represented-domain quota of web-corpus curation.
    *
    * SCALE: one partitioned window — groups rank in parallel, nothing
    * global. A pathologically hot group (one domain = half the corpus)
    * skews its task; pre-filter with a cheap per-group count + TABLESAMPLE
    * before exact ranking if that matters. */
  def capPerGroup(
      df: DataFrame, groupCol: String, order: Seq[Column], n: Int): DataFrame =
    df.withColumn("rk",
      row_number().over(Window.partitionBy(col(groupCol)).orderBy(order: _*)))
      .where(col("rk") <= n)

  /** EXACT-size stratified sample: allocate `total` slots across the
    * strata proportionally with largest-remainder (Hamilton) rounding —
    * the eval-set construction where "100 docs, stratum shares as close
    * to proportional as integers allow" is a hard spec, unlike
    * [[balancedSample]]'s per-group expectation. Within a stratum the
    * survivors are the `quota` lowest md5 draws (deterministic,
    * engine-portable, re-run-stable).
    *
    * Largest-remainder: base_s = floor(total*n_s/N); the
    * `total - Σ base_s` leftover slots go to the strata with the largest
    * `(total*n_s) mod N`, ties broken by the stratum key. All integer
    * arithmetic — both engines agree exactly.
    *
    * SCALE: quota math runs on the |strata|-row aggregate (an
    * unpartitioned window over strata is bounded by stratum CARDINALITY,
    * not corpus size — the IVF-pivot pattern); quotas broadcast back and
    * the only corpus-proportional work is the per-stratum rank window,
    * which partitions by stratum. Output rows = `total`.
    *
    * Returns the input columns plus `quota` (the stratum's slot count)
    * and `rk` (1-based draw rank within the stratum). */
  def stratifiedQuota(
      df: DataFrame, strata: Seq[String], idCol: String, total: Int,
      salt: String = "quota"): DataFrame = {
    require(strata.nonEmpty && total > 0)
    val sCols = strata.map(col)
    val counts = df.groupBy(sCols: _*).agg(count(lit(1)).as("__n"))
    // grand total + leftover as whole-frame windows over the tiny
    // strata aggregate (avoids a self-join of counts with its own agg)
    val wAll = Window.partitionBy()
    // NB: "__tot", not "__N" — Spark resolves column names
    // case-insensitively by default, so withColumn("__N") would
    // silently REPLACE "__n"
    val quotas = counts
      .withColumn("__tot", sum(col("__n")).over(wAll))
      .withColumn("__base", expr(s"($total * __n) DIV __tot"))
      .withColumn("__rem", expr(s"($total * __n) % __tot"))
      .withColumn("__extra", sum(col("__base")).over(wAll))
      .withColumn("__rrk", row_number().over(
        Window.orderBy(col("__rem").desc +: sCols: _*)))
      .withColumn("quota",
        (col("__base") +
          when(col("__rrk") <= lit(total) - col("__extra"), 1L)
            .otherwise(0L)).cast("long"))
      .select(sCols :+ col("quota"): _*)
    val wd = Window.partitionBy(sCols: _*)
      .orderBy(md5(concat(lit(s"$salt:"), col(idCol).cast("string"))),
        col(idCol))
    df.join(broadcast(quotas), strata)
      .withColumn("rk", row_number().over(wd).cast("long"))
      .where(col("rk") <= col("quota"))
  }
}
