package graft.pipeline

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec
import graft.functions.TopK

/** The bounded top-k aggregate must be indistinguishable from the
  * `row_number() OVER (PARTITION BY q ORDER BY cos DESC, id)` window it
  * replaced — across partitionings (merge path), ties, NaN, and
  * k larger than the group. */
class TopKSpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (1 to n).flatMap(i =>
      g.apply(Gen.Parameters.default.withSize(20), Seed(4200L + i)))

  private def viaAgg(df: org.apache.spark.sql.DataFrame, k: Int) =
    df.groupBy(col("q"))
      .agg(TopK.agg(col("cos"), col("id"), k).as("tk"))
      .select(col("q"), explode(col("tk")).as("e"))
      .select(col("q"), col("e.rank").as("rank"),
        col("e.neighbor_id").as("id"), col("e.cos").as("cos"))

  private def viaWindow(df: org.apache.spark.sql.DataFrame, k: Int) = {
    val w = Window.partitionBy(col("q")).orderBy(col("cos").desc, col("id"))
    df.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("q"), col("rank"), col("id"), col("cos"))
  }

  test("matches the window formulation on a deterministic fixture") {
    val rows = for {
      q <- 0L until 7L
      i <- 0L until 53L
    } yield (q, i, ((i * 2654435761L + q) % 97).toDouble / 97.0)
    val df = rows.toDF("q", "id", "cos").repartition(5)
    for (k <- Seq(1, 3, 10, 60)) {
      val a = viaAgg(df, k).orderBy("q", "rank").collect()
      val b = viaWindow(df, k).orderBy("q", "rank").collect()
      assert(a.toSeq == b.toSeq, s"k=$k")
    }
  }

  test("ties break by id ascending, exactly like the window") {
    val df = Seq(
      (1L, 10L, 0.5), (1L, 3L, 0.5), (1L, 7L, 0.5), (1L, 1L, 0.2)
    ).toDF("q", "id", "cos").repartition(3)
    val got = viaAgg(df, 3).orderBy("rank").collect()
      .map(r => (r.getInt(1), r.getLong(2))).toSeq
    assert(got == Seq((1, 3L), (2, 7L), (3, 10L)))
  }

  test("k larger than the group yields ranks 1..n") {
    val df = Seq((1L, 5L, 0.9), (1L, 6L, 0.1)).toDF("q", "id", "cos")
    assert(viaAgg(df, 100).count() == 2)
  }

  test("partition-count invariance (merge path is exercised)") {
    val rows = (0L until 500L).map(i =>
      (i % 4, i, ((i * 2654435761L) % 1000).toDouble))
    val one = viaAgg(rows.toDF("q", "id", "cos").coalesce(1), 5)
      .orderBy("q", "rank").collect().toSeq
    val many = viaAgg(rows.toDF("q", "id", "cos").repartition(13), 5)
      .orderBy("q", "rank").collect().toSeq
    assert(one == many)
  }

  test("property: agg == window for random scores incl. ties") {
    val gen = Gen.listOfN(120, for {
      q <- Gen.choose(0L, 3L)
      id <- Gen.choose(0L, 40L)
      c <- Gen.oneOf(Gen.choose(0, 5).map(_.toDouble / 5.0),
        Gen.choose(0.0, 1.0))
    } yield (q, id, c))
    samples(gen, 8).foreach { rows =>
      val df = rows.toDF("q", "id", "cos").repartition(7)
      val a = viaAgg(df, 4).orderBy("q", "rank", "id").collect().toSeq
      val b = viaWindow(df, 4).orderBy("q", "rank", "id").collect().toSeq
      assert(a == b)
    }
  }
}
