package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage decomposition for the export head (the r16 verdict's diagnosis
  * item: `export_objects_64k` read 11.7x its envelope with a 23.5% GC share
  * and a reproduced clean re-measure — attribute it to a stage, don't
  * guess). Reproduces the bench's 64k stream (16 x 131 MiB commits of
  * 64 KiB batches), then times, `reps` times each:
  *
  *   - `fetch_hash`:   fetch the committed range + full payload hash — the
  *                     scan/decode substrate every other stage sits on;
  *   - `export_objs`:  the bench head verbatim (fetch + per-batch
  *                     FlatRecordBatch encode + object framing, forced by
  *                     the metadata aggregate) — minus `fetch_hash` ≈ the
  *                     ENCODE cost;
  *   - `export_files`: the same objects written one file per object —
  *                     minus `export_objs` ≈ the file-WRITE cost.
  *
  * Prints per-rep seconds and a one-line JSON summary with per-stage
  * medians, the derived encode/write deltas, and the GC share of each
  * stage's timed window.
  *
  * Usage: runMain graft.ExportProf [reps] */
object ExportProf {
  def main(args: Array[String]): Unit = {
    val reps = if (args.length > 0) args(0).toInt else 5
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

    // the bench's 64k stream, verbatim: 2 warm + 16 timed-shape commits
    val dir = java.nio.file.Files.createTempDirectory("exportprof-").toString
    val n64k = 2000L
    val nCommits = 16
    val warm = 2
    graft.eslog.EsLog.create(dir, streamId = 99L)
    graft.eslog.EsLog.open(dir, 1L)
    val batches = spark.range(n64k).select(
      col("id"), expr("cast(repeat(uuid(), 1820) as binary)").as("payload"))
    batches.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    batches.count()
    (1 to warm + nCommits).foreach { _ =>
      graft.eslog.EsLog.append(spark, dir, batches, 1L)
    }
    val (a, b) = (warm * n64k, (warm + nCommits) * n64k)
    val payloadBytes = nCommits * n64k * 36L * 1820L

    def gcMillis(): Long = {
      var t = 0L
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
        .forEach(x => if (x.getCollectionTime > 0) t += x.getCollectionTime)
      t
    }
    val secs = scala.collection.mutable.LinkedHashMap[String,
      scala.collection.mutable.ArrayBuffer[Double]]()
    val gcs = scala.collection.mutable.LinkedHashMap[String,
      scala.collection.mutable.ArrayBuffer[Double]]()
    def stage(name: String)(body: => Unit): Unit = {
      val g0 = gcMillis(); val t0 = System.nanoTime()
      body
      val sec = (System.nanoTime() - t0) / 1e9
      val gc = (gcMillis() - g0) / 1e3
      secs.getOrElseUpdate(name, scala.collection.mutable.ArrayBuffer()) += sec
      gcs.getOrElseUpdate(name, scala.collection.mutable.ArrayBuffer()) +=
        (if (sec > 0) gc / sec else -1.0)
      println(f"[exportprof] $name: $sec%.3f s (gc ${100 * gc / sec}%.1f%%)")
    }
    var outIdx = 0
    def stages(): Unit = {
      stage("fetch_hash") {
        graft.eslog.EsLog.fetch(spark, dir, a, b)
          .agg(expr("bit_xor(xxhash64(payload))"), count(lit(1))).collect(); ()
      }
      stage("export_objs") {
        graft.eslog.EsLog.exportObjects(spark, dir, a, b)
          .agg(sum(col("data_len")), count(lit(1))).collect(); ()
      }
      stage("export_files") {
        outIdx += 1
        val out = java.nio.file.Files
          .createTempDirectory(s"exportprof-out$outIdx-").toString + "/bucket"
        graft.eslog.EsLog.exportObjectFiles(spark, dir, out, a, b,
          maxObjectBytes = 8 * 1024 * 1024); ()
      }
    }
    stages() // warm pass (codegen/JIT), untimed in the summary
    secs.clear(); gcs.clear()
    (1 to reps).foreach(_ => stages())

    def median(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)
    val m = secs.map { case (k, v) => k -> median(v.toSeq) }
    val g = gcs.map { case (k, v) => k -> median(v.toSeq) }
    def f3(x: Double): String = f"$x%.3f"
    println(
      s"""{"export_decompose":1,"reps":$reps""" +
      s""","payload_bytes":$payloadBytes""" +
      m.map { case (k, v) => s""","${k}_median_sec":${f3(v)}""" }.mkString +
      g.map { case (k, v) => s""","${k}_gc_frac":${f3(v)}""" }.mkString +
      s""","encode_delta_sec":${f3(m("export_objs") - m("fetch_hash"))}""" +
      s""","write_delta_sec":${f3(m("export_files") - m("export_objs"))}""" +
      s""","export_mbps":${f3(payloadBytes / 1e6 / m("export_objs"))}}""")
    spark.stop()
  }
}
