package graft

import org.apache.spark.sql.SparkSession

/** Isolated live-cost baseline for the artifact-backed streaming gates
  * (VERDICT r12 task 1, third part): for each gate, delete its cached
  * result artifact, time the LIVE rebuild (stubs, feeds, supervised
  * queries, write-backs — staged feed artifacts stay warm, they are
  * shared ingest-side staging), then time the warm artifact read.
  * Prints one JSON line per run:
  *
  *   {"metric":"jgate_isolated","sf":...,
  *    "gates":{"j21_writeback_roundtrip":{"live":N,"warm":N},...}}
  *
  * Recorded per round into BENCH_sf1.json (`jgate_isolated_r{N}`) so a
  * regression in the streaming MACHINERY surfaces the way query-plane
  * regressions do, without the fixed control-plane waits polluting the
  * catalog bench signal.
  *
  *   SPARK_GRAFT_SF_DIR=... sbt "runMain graft.GateBench"
  */
object GateBench {

  /** gate name -> its cachedGate artifact key prefix. */
  val gateKeys: Map[String, String] = Map(
    "j19_streaming_replay" -> "j19gate-v1",
    "j21_writeback_roundtrip" -> "j21gate-v1",
    "j24_bucketed_store" -> "j24gate-v1",
    "j25_deltalog_store" -> "j25gate-v1",
    "j26_multi_feed_union" -> "j26gate-v1",
    "j29_ingest_filter_map" -> "j29gate-v1",
    "j30_faulted_feed_convergence" -> "j30gate-v1",
    "j31_basic_auth_feed" -> "j31gate-v1",
    "j32_since_checkpoints_view" -> "j32gate-v1",
    "j34_fatal_halt_lifecycle" -> "j34gate-v1",
    "j35_live_tail" -> "j35gate-v1",
    "j36_single_put_roundtrip" -> "j36gate-v1",
    "j37_bootstrap" -> "j37gate-v1",
    "j42_repopulate" -> "j42repop-v1",
    // the compaction-heavy index builds (VERDICT r12 task 5: re-bench
    // on the fold-manifest tree) — artifact-backed since earlier rounds
    "j20_streaming_index" -> "j20idx-c1",
    "j27_streaming_ann_index" -> "j27annidx-p4-c1",
    "j28_streaming_lsh_dedup" -> "j28lsh-v2",
    // event bus + the stateful Structured Streaming gates
    "j33_event_bus" -> "j33events-v1",
    "j39_streaming_sessionize" -> "j39sess-v3",
    "j40_stream_interval_join" -> "j40join-v3",
    "j41_stream_sliding_counts" -> "j41slide-v2")

  private def dropArtifacts(key: String): Unit = {
    val tmp = new java.io.File(sys.props("java.io.tmpdir"))
    Option(tmp.listFiles()).getOrElse(Array.empty)
      .filter(_.getName.startsWith(s"graft-$key-"))
      .foreach { d =>
        scala.util.Using.resource(java.nio.file.Files.walk(d.toPath)) { st =>
          import scala.jdk.CollectionConverters._
          st.sorted(java.util.Comparator.reverseOrder())
            .iterator().asScala.toList
        }.foreach(java.nio.file.Files.deleteIfExists(_))
      }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.cleaner.periodicGC.interval", "2min")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val names = gateKeys.keys.toSeq.sorted
      .filter(n => only.forall(_.exists(n.startsWith)))
    def time(name: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir).count()
      val t = (System.nanoTime() - t0) / 1e9
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      t
    }
    def ms(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    val rows = names.map { n =>
      dropArtifacts(gateKeys(n))
      val live = time(n)
      val warm = time(n)
      System.err.println(f"[gatebench] $n%-32s live=$live%8.3f warm=$warm%8.3f")
      s""""$n":{"live":${ms(live)},"warm":${ms(warm)}}"""
    }
    println(s"""{"metric":"jgate_isolated","sf":"$sfDir","gates":{${
      rows.mkString(",")}}}""")
    spark.stop()
  }
}
