package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage decomposition for the backfill head (round 17 optimization work:
  * `backfill_objects_64k` is the most expensive bench head at 3.1 s
  * best-of-3 — attribute it to a stage before touching anything, the
  * [[ExportProf]] treatment). Reproduces the bench's backfill source (16 x
  * 131 MiB commits exported as 8 MiB reference objects), then times,
  * `reps` times each:
  *
  *   - `read_nodecode`:  binaryFile read of the bucket + byte-length sum —
  *                       the raw IO substrate;
  *   - `decode_count`:   binaryFile read + TieredObject.decodeAll + a
  *                       count of decoded rows — adds the object decode
  *                       (readMeta + parseEntries) and row materialization;
  *   - `backfill_full`:  the bench head verbatim (decode + classify +
  *                       cut-planning pass + boundary-aligned shuffle +
  *                       stats pass + sorted parquet write + CAS commit)
  *                       into a FRESH imported-boundary stream per rep.
  *
  * Prints per-rep seconds and a one-line JSON summary with per-stage
  * medians, the derived decode/shuffle+write deltas, and the GC share of
  * each stage's timed window.
  *
  * Usage: runMain graft.BackfillProf [reps] */
object BackfillProf {
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

    // the bench's 64k stream + exported object bucket, verbatim
    val dir = java.nio.file.Files.createTempDirectory("backfillprof-").toString
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
    val bucket = java.nio.file.Files
      .createTempDirectory("backfillprof-obj-").toString + "/bucket"
    graft.eslog.EsLog.exportObjectFiles(spark, dir, bucket, a, b,
      maxObjectBytes = 8 * 1024 * 1024)

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
      println(f"[backfillprof] $name: $sec%.3f s (gc ${100 * gc / sec}%.1f%%)")
    }
    def stages(): Unit = {
      stage("read_nodecode") {
        spark.read.format("binaryFile")
          .option("recursiveFileLookup", "true").load(bucket)
          .agg(sum(octet_length(col("content")))).collect(); ()
      }
      stage("decode_count") {
        import spark.implicits._
        spark.read.format("binaryFile")
          .option("recursiveFileLookup", "true").load(bucket)
          .select(col("content").as("obj")).as[Array[Byte]]
          .flatMap(bytes => graft.model.TieredObject.decodeAll(bytes))
          .agg(count(lit(1)), sum(octet_length(col("payload")))).collect(); ()
      }
      stage("backfill_full") {
        val dst = Fixtures.importedStreamFresh(spark, a)
        graft.eslog.EsLog.backfillObjectDir(spark, dst, bucket, 1L)
        Fixtures.dropFresh()
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
      s"""{"backfill_decompose":1,"reps":$reps""" +
      s""","payload_bytes":$payloadBytes""" +
      m.map { case (k, v) => s""","${k}_median_sec":${f3(v)}""" }.mkString +
      g.map { case (k, v) => s""","${k}_gc_frac":${f3(v)}""" }.mkString +
      s""","decode_delta_sec":${f3(m("decode_count") - m("read_nodecode"))}""" +
      s""","shuffle_write_delta_sec":${f3(m("backfill_full") - m("decode_count"))}""" +
      s""","backfill_mbps":${f3(payloadBytes / 1e6 / m("backfill_full"))}}""")
    spark.stop()
  }
}
