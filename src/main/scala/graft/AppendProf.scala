package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage decomposition for the SMALL-commit append paths (round 17): the
  * `append_events` head (two sorted appends of ~50k tiny event batches) and
  * the `stream_roundtrip` head (AvailableNow drain through the eslog
  * source → eslog sink in 8 rate-limited micro-batches, each ending in a
  * sink append + checkpoint WAL writes). Run with `GRAFT_APPEND_TIMING=1`
  * to additionally get EsLog.append's internal stage marks
  * (load/normalize/plan/pass1/write/metas+footers/commit) on stderr.
  *
  * Usage: runMain graft.AppendProf [reps] */
object AppendProf {
  def main(args: Array[String]): Unit = {
    val reps = if (args.length > 0) args(0).toInt else 3
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.files.maxPartitionBytes", "16m")
      .config("spark.sql.files.openCostInBytes", "1m")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timed(name: String)(body: => Unit): Double = {
      val t0 = System.nanoTime()
      body
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[appendprof] $name: $sec%.3f s")
      sec
    }
    // warm both paths once
    Fixtures.eventsStreamFresh(spark, sfDir)
    Fixtures.streamRoundtripFresh(spark, sfDir)
    Fixtures.dropFresh()
    (1 to reps).foreach { _ =>
      timed("append_events") { Fixtures.eventsStreamFresh(spark, sfDir); () }
      Fixtures.dropFresh()
    }
    (1 to reps).foreach { _ =>
      timed("stream_roundtrip") { Fixtures.streamRoundtripFresh(spark, sfDir); () }
      Fixtures.dropFresh()
    }
    spark.stop()
  }
}
