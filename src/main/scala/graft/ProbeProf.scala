package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage decomposition for `multimodal_probe_persisted` — the
  * [[graft.operators.Multimodal.mediaDedupProbeAt]] path. The head's SQL
  * plan is already minimal (library never shuffles, incoming broadcast,
  * partition-pruned scan), so where do its ~1.5 s go? Each timed piece below
  * is one of the probe's sequential driver-visible steps:
  *
  *  - `chunk_materialize`: CDC-chunk the incoming set + shared() cache +
  *    the guard count (the probe's first two jobs);
  *  - `bucket_collect`: the distinct probed-bucket collect (job 3);
  *  - `snapshot_reads`: params sidecar read + chunks-tree schema inference
  *    (driver-side parquet footer reads + listing);
  *  - `probe_join`: the broadcast join + pair aggregate, forced by noop,
  *    reusing an already-materialized incoming cache;
  *  - `full_head`: the registry body verbatim (sum of the above plus
  *    whatever this decomposition misses).
  *
  * Usage: runMain graft.ProbeProf [reps] [sfDir]
  */
object ProbeProf {
  def main(args: Array[String]): Unit = {
    val reps = if (args.length > 0) args(0).toInt else 5
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
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
    import graft.operators.{IndexCommit, Multimodal, OpUtil}

    val dir = Fixtures.mediaLibraryIndexDir(spark, sfDir)
    def incoming = Fixtures.documents(spark, sfDir)
      .select(col("doc_id").as("media_id"), col("text").cast("binary").as("payload"))
    def force(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // warm
    force(Multimodal.mediaDedupProbeAt(spark, dir, incoming, "media_id",
      "payload", minShared = 4))

    def med(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)
    def timed(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }

    val stages = scala.collection.mutable.LinkedHashMap[String, Seq[Double]]()
    def stage(name: String)(body: => Unit): Unit = {
      stages(name) = (1 to reps).map(_ => timed(body))
      println(f"[probeprof] $name: median ${med(stages(name))}%.3f s  " +
        stages(name).map(s => f"$s%.3f").mkString(","))
    }

    stage("chunk_materialize") {
      val snap = IndexCommit.readSnapshot(dir, "chunks")
      val p = spark.read.parquet(snap.sidecar("params")).collect().head
      val (w, d) = (p.getAs[Int]("window"), p.getAs[Int]("divisor"))
      val inc = OpUtil.shared(
        Multimodal.cdcChunkRows(incoming, "media_id", "payload", w, d)
          .select(col("media_id").as("incoming"), col("ch")))
      inc.count(); ()
    }
    stage("bucket_collect") {
      val snap = IndexCommit.readSnapshot(dir, "chunks")
      val p = spark.read.parquet(snap.sidecar("params")).collect().head
      val (w, d, n) = (p.getAs[Int]("window"), p.getAs[Int]("divisor"),
        p.getAs[Int]("n_buckets"))
      val inc = OpUtil.shared(
        Multimodal.cdcChunkRows(incoming, "media_id", "payload", w, d)
          .select(col("media_id").as("incoming"), col("ch")))
      inc.select(pmod(col("ch"), lit(n.toLong)).cast("int").as("b"))
        .distinct().collect(); ()
    }
    stage("snapshot_reads") {
      val snap = IndexCommit.readSnapshot(dir, "chunks")
      spark.read.parquet(snap.sidecar("params")).collect()
      snap.dirs.foreach(d => spark.read.parquet(d).schema)
      ()
    }
    // library side alone: tree read + bucket filter + noop (no join)
    stage("lib_scan") {
      val snap = IndexCommit.readSnapshot(dir, "chunks")
      force(spark.read.parquet(snap.dirs: _*))
    }
    stage("lib_listing_only") {
      val snap = IndexCommit.readSnapshot(dir, "chunks")
      spark.read.parquet(snap.dirs: _*).queryExecution.executedPlan
      ()
    }
    stage("lib_count") {
      val snap = IndexCommit.readSnapshot(dir, "chunks")
      spark.read.parquet(snap.dirs: _*).count(); ()
    }
    locally {
      val snap = IndexCommit.readSnapshot(dir, "chunks")
      val reused = spark.read.parquet(snap.dirs: _*)
      reused.count()
      stage("lib_count_reused") { reused.count(); () }
      stage("lib_noop_reused") { force(reused) }
    }
    // the join + pair aggregate given an ALREADY materialized incoming cache
    // (built outside the timing): what the broadcast build + join job cost
    locally {
      val snap = IndexCommit.readSnapshot(dir, "chunks")
      val p = spark.read.parquet(snap.sidecar("params")).collect().head
      val (w, d, n) = (p.getAs[Int]("window"), p.getAs[Int]("divisor"),
        p.getAs[Int]("n_buckets"))
      val inc = OpUtil.shared(
        Multimodal.cdcChunkRows(incoming, "media_id", "payload", w, d)
          .select(col("media_id").as("incoming"), col("ch")))
      inc.count()
      val probed = inc.select(pmod(col("ch"), lit(n.toLong)).cast("int").as("b"))
        .distinct().collect().map(_.getInt(0)).toSeq
      val chunks = spark.read.parquet(snap.dirs: _*)
      val libId = chunks.columns.filterNot(c => c == "ch" || c == "bucket").head
      val lib = chunks.where(col("bucket").isin(probed: _*))
        .select(col(libId).as("existing"), col("ch"))
      stage("probe_join_only") {
        force(broadcast(inc).join(lib, Seq("ch"))
          .where(col("incoming") =!= col("existing"))
          .groupBy("incoming", "existing").agg(count(lit(1)).as("n_shared"))
          .where(col("n_shared") >= 4))
      }
    }
    stage("full_head") {
      force(Multimodal.mediaDedupProbeAt(spark, dir, incoming, "media_id",
        "payload", minShared = 4))
    }
    spark.stop()
  }
}
