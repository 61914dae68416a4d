package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

class DistributedRankSpec extends SparkSpec {

  test("withRowNumber equals the serial row_number for any partition count") {
    import spark.implicits._
    val rng = new scala.util.Random(7)
    val d = (1 to 500).map(i => (i.toLong, rng.nextInt(50))).toDF("id", "v")
    val serial = d
      .withColumn("rn", row_number().over(Window.orderBy($"v".desc, $"id")))
      .orderBy("id").collect().map(r => (r.getLong(0), r.getInt(2))).toSeq
    for (parts <- Seq(1, 3, 17, 64)) {
      val got = DistributedRank
        .withRowNumber(d, "rn", numParts = parts)($"v".desc, $"id")
        .df.orderBy("id")
        .collect().map(r => (r.getLong(0), r.getLong(2).toInt)).toSeq
      assert(got == serial, s"numParts=$parts diverged")
    }
  }

  test("withRowNumber reports the exact total") {
    import spark.implicits._
    val d = (1 to 123).map(_.toLong).toDF("id")
    assert(DistributedRank.withRowNumber(d, "rn")(col("id")).total == 123L)
  }

  test("withExclusivePrefixSum equals the serial running sum") {
    import spark.implicits._
    val rng = new scala.util.Random(11)
    val rows = (1 to 300).map(i => (i.toLong, rng.nextInt(100).toLong))
    val d = rows.toDF("id", "w")
    val expect = rows.sortBy(_._1)
      .scanLeft((0L, 0L)) { case ((_, acc), (id, w)) => (id, acc + w) }
      .sliding(2).map { case Seq((_, acc), (id, _)) => (id, acc) }.toSeq
      .map { case (id, acc) => id -> acc }.toMap
    val s = DistributedRank
      .withExclusivePrefixSum(d, $"w", "pre", numParts = 13)($"id")
    val got = s.df.collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    // rebuild the serial exclusive prefix directly as a cross-check
    var acc = 0L
    rows.sortBy(_._1).foreach { case (id, w) =>
      assert(got(id) == acc, s"id=$id")
      acc += w
    }
    assert(s.total == rows.map(_._2).sum)
    assert(expect.forall { case (id, p) => got(id) == p })
  }

  test("ntileOfRank matches SQL NTILE for awkward n/k combinations") {
    import spark.implicits._
    for ((n, k) <- Seq((100, 10), (101, 10), (109, 10), (7, 10), (10, 3), (1, 1))) {
      val d = (1 to n).map(_.toLong).toDF("id")
      val sql = d
        .withColumn("nt", ntile(k).over(Window.orderBy($"id")))
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      val got = d.withColumn("rn", $"id")
        .withColumn("nt", DistributedRank.ntileOfRank($"rn", n.toLong, k))
        .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
      assert(got == sql, s"n=$n k=$k diverged")
    }
  }

  test("cumeDistOfRank matches SQL CUME_DIST under a total order") {
    import spark.implicits._
    val n = 37
    val d = (1 to n).map(_.toLong).toDF("id")
    val sql = d.withColumn("cd", cume_dist().over(Window.orderBy($"id")))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val got = d.withColumn("cd", DistributedRank.cumeDistOfRank($"id", n.toLong))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got == sql)
  }

  test("block loss after the pin FAILS loudly instead of renumbering") {
    import spark.implicits._
    // the scaladoc's failure-semantics contract: the phase-1 placement
    // pin is non-replayable by design — losing its blocks (an executor
    // death on a cluster; an unpersist here) must error the query, not
    // silently recompute a possibly different row->partition assignment
    // against phase 2's already-collected offsets
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val d = (1 to 200).map(i => (i.toLong, i % 7)).toDF("id", "v")
    val s = DistributedRank.withRowNumber(d, "rn", numParts = 8)($"v", $"id")
    assert(s.df.count() == 200L) // pinned blocks alive: reads fine
    val pinned = spark.sparkContext.getPersistentRDDs
      .filterNot { case (id, _) => before(id) }
    assert(pinned.nonEmpty, "scan must pin a localCheckpoint RDD")
    pinned.values.foreach(_.unpersist(blocking = true))
    val ex = intercept[org.apache.spark.SparkException] { s.df.count() }
    val msg = Iterator.iterate[Throwable](ex)(_.getCause)
      .takeWhile(_ != null).map(t => Option(t.getMessage).getOrElse(""))
      .mkString(" | ")
    assert(msg.toLowerCase.contains("checkpoint") ||
      msg.toLowerCase.contains("block"), s"unexpected failure: $msg")
  }

  test("reliable path: the SAME block loss is survived when graft.rank.checkpointDir is set") {
    import spark.implicits._
    // the durable twin of the fail-loud contract above (VERDICT r13
    // task 5): with the conf set, the placement pin is a reliable
    // checkpoint() — dropping every cached block (the executor-loss
    // simulation that makes the local pin throw) re-reads the durable
    // files and the ranks come back IDENTICAL, not renumbered
    val ckpt = java.nio.file.Files.createTempDirectory("drck").toString
    spark.conf.set(DistributedRank.ReliableDirConf, ckpt)
    try {
      val before = spark.sparkContext.getPersistentRDDs.keySet
      val d = (1 to 200).map(i => (i.toLong, i % 7)).toDF("id", "v")
      val s = DistributedRank.withRowNumber(d, "rn", numParts = 8)($"v", $"id")
      val want = s.df.orderBy("id").collect()
        .map(r => (r.getLong(0), r.getLong(2))).toSeq
      spark.sparkContext.getPersistentRDDs
        .filterNot { case (id, _) => before(id) }
        .values.foreach(_.unpersist(blocking = true))
      val got = s.df.orderBy("id").collect()
        .map(r => (r.getLong(0), r.getLong(2))).toSeq
      assert(got == want, "durable pin renumbered after block loss")
    } finally spark.conf.unset(DistributedRank.ReliableDirConf)
  }

  test("plan shape: window is partition-local, offsets broadcast, no SinglePartition") {
    import spark.implicits._
    val d = (1 to 200).map(_.toLong).toDF("id")
    val out = DistributedRank.withRowNumber(d, "rn")(col("id")).df
    val p = out.queryExecution.executedPlan.toString
    assert(!p.contains("SinglePartition"), s"single-partition stage:\n$p")
    assert(p.linesIterator.filter(_.contains("windowspecdefinition"))
      .forall(_.contains("__dr_pid")), s"window not partition-local:\n$p")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"),
      s"offsets not broadcast:\n$p")
  }
}
