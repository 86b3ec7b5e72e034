package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler for the append path — not part of the library surface. */
object BenchProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t(name: String)(body: => Unit): Unit = {
      val t0 = System.nanoTime(); body
      println(f"[probe] $name: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    spark.range(1000).selectExpr("sum(id)").collect()

    val n64k = 2000L
    val batches = spark.range(n64k).select(
      col("id"), expr("cast(repeat(uuid(), 1820) as binary)").as("payload"))
    batches.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    batches.count()

    // floor: plain parquet write of the cached frame
    for (i <- 1 to 3) {
      val out = java.nio.file.Files.createTempDirectory("probe-raw-").toString + "/w"
      t(s"raw parquet write #$i") { batches.write.parquet(out) }
    }
    // floor: noop write (cache read + codegen only, no parquet)
    for (i <- 1 to 2)
      t(s"noop write #$i") { batches.write.format("noop").mode("overwrite").save() }
    // pass-1-alike: internal rdd stats only
    for (i <- 1 to 2) t(s"internal stats #$i") {
      val rdd = org.apache.spark.sql.graftshim.GraftShims.internalRdd(batches)
      rdd.mapPartitionsWithIndex { (pid, it) =>
        var n = 0L; it.foreach(_ => n += 1); Iterator((pid, n))
      }.collect()
    }
    // full append
    val dir = java.nio.file.Files.createTempDirectory("probe-eslog-").toString
    graft.eslog.EsLog.create(dir, streamId = 1L)
    graft.eslog.EsLog.open(dir, 1L)
    for (i <- 1 to 4)
      t(s"eslog append #$i") { graft.eslog.EsLog.append(spark, dir, batches, 1L) }
    // write-side variants
    def raw(name: String)(w: org.apache.spark.sql.DataFrameWriter[org.apache.spark.sql.Row] => Unit): Unit = {
      val out = java.nio.file.Files.createTempDirectory("probe-v-").toString + "/w"
      t(name) { val wr = batches.write; w(wr); wr.parquet(out) }
    }
    raw("raw write uncompressed") { _.option("compression", "none") }
    raw("raw write nodict") { _.option("parquet.enable.dictionary", "false") }
    raw("raw write nodict nochecksum") {
      _.option("parquet.enable.dictionary", "false")
        .option("parquet.page.write-checksum.enabled", "false")
    }
    raw("raw write 16MiB blocks") { _.option("parquet.block.size", (16L * 1024 * 1024).toString) }

    // dedup pipeline stage timing at sf0.1
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    docs.count()
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    for (i <- 1 to 2) {
      t(s"capped shingles #$i") { noop(graft.operators.Dedup.cappedShingles(docs, "doc_id", "text", 3, 1000)) }
      t(s"signatures #$i") { noop(graft.operators.Dedup.minHashSignatures(docs, "doc_id", "text", 3, 16)) }
      t(s"lsh candidates #$i") { noop(graft.operators.Dedup.minHashLshCandidates(docs, "doc_id", "text")) }
      t(s"jaccard #$i") { noop(graft.operators.Dedup.ngramJaccard(docs, "doc_id", "text")) }
    }
    spark.stop()
  }
}
