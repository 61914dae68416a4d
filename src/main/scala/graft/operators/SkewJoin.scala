package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation joins.
  *
  * At 100 TB a handful of hot keys (the reference's analog: one CouchDB
  * feed with millions of docs next to tiny ones) can pin a shuffle join
  * on one straggler task. AQE's skew-join splitting handles the common
  * case at runtime; salting is the explicit, planner-independent tool
  * for known-skewed keys: spread the big side across `salts` sub-keys
  * and replicate the other side to every sub-key. Result is EXACTLY the
  * plain equi-join (verified by the q23 oracle).
  */
object SkewJoin {

  /** Salted inner equi-join.
    *
    * @param skewed     the large/skewed side
    * @param replicated the side small enough to replicate `salts` times
    * @param cond       equi-join condition (applied alongside the salt)
    * @param salts      fan-out factor; the hot key's rows land on
    *                   `salts` tasks instead of one
    * @param saltSource deterministic per-row column on the skewed side
    *                   used to derive the salt (e.g. a line number);
    *                   hashed then bucketed into [0, salts)
    */
  def saltedInnerJoin(
      skewed: DataFrame,
      replicated: DataFrame,
      cond: Column,
      salts: Int,
      saltSource: Column): DataFrame = {
    val s = skewed.withColumn("__salt", pmod(hash(saltSource), lit(salts)))
    val r = replicated.withColumn("__salt",
      explode(array((0 until salts).map(lit): _*)))
    s.join(r, cond && s("__salt") === r("__salt"))
      .drop("__salt")
  }
}
