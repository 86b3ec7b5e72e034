package graft

import org.apache.spark.sql.functions._

import graft.eslog.EsLog
import graft.model.{FlatRecordBatch, TieredObject, WalSegment}

/** The migration-OUT half of the interop surface: [[EsLog.exportObjects]] /
  * [[EsLog.exportWal]] must emit artifacts byte-valid under the reference's
  * own layouts (readable by the same decoders the ingest path uses on real
  * reference output) and round-trip hash-identically through the ingest
  * twins. Layout invariants are asserted on the exported bytes themselves,
  * not just round-tripped. */
class InteropExportSpec extends SparkTestBase {

  private lazy val srcDir: String = {
    val dir = tmpDir("graft-export-src-")
    val s = spark
    import s.implicits._
    val in = (0L until 400L).map { i =>
      (s"payload-$i-" + ("x" * (i % 64).toInt), Map("k" -> s"v$i"), 1000L + i)
    }.toDF("text", "properties", "base_timestamp")
      .select(col("text").cast("binary").as("payload"), col("properties"),
        col("base_timestamp"))
    EsLog.create(dir, streamId = 7L)
    EsLog.open(dir, 1L)
    EsLog.append(spark, dir, in, 1L)
    dir
  }

  // ------------------------------------------------------------- objects

  test("exportObjects: every object byte-valid, rolls at the soft cap, all rows covered") {
    val objs = EsLog.exportObjects(spark, srcDir,
      maxObjectBytes = 4 * 1024, sparseBytes = 1024).collect()
    assert(objs.length > 1, "4 KiB cap over ~400 records must roll")
    var total = 0
    var sawIndexEntries = false
    objs.foreach { r =>
      val startOff = r.getAs[Long]("start_offset")
      val endOff = r.getAs[Long]("end_offset")
      val bytes = r.getAs[Array[Byte]]("obj")
      // self-describing: footer magic + delimiter + index recoverable
      val meta = TieredObject.readMeta(bytes, startOff)
      assert(meta.dataLen === r.getAs[Int]("data_len"))
      assert(meta.endOffset === endOff)
      if (meta.sparseIndex.nonEmpty) sawIndexEntries = true
      val rows = TieredObject.decodeAll(bytes)
      assert(rows.head.base_offset === startOff)
      assert(rows.map(x => x.base_offset + x.last_offset_delta).max === endOff)
      // soft cap: overshoot bounded by one batch
      val maxFrame = rows.map(x => FlatRecordBatch.encode(x).length).max
      assert(meta.dataLen <= 4 * 1024 + maxFrame)
      total += rows.size
    }
    assert(total === 400)
    assert(sawIndexEntries, "1 KiB granularity must produce sparse-index entries")
    // objects tile the offset space disjointly
    val spans = objs.map(r => (r.getAs[Long]("start_offset"), r.getAs[Long]("end_offset")))
      .sortBy(_._1)
    spans.sliding(2).foreach {
      case Array((_, e1), (s2, _)) => assert(e1 <= s2)
      case _ =>
    }
  }

  test("exportObjects -> ingestObjects round-trips hash-identically") {
    val objs = EsLog.exportObjects(spark, srcDir,
      maxObjectBytes = 4 * 1024, sparseBytes = 1024)
    val dst = tmpDir("graft-export-obj-rt-")
    EsLog.create(dst, streamId = 8L)
    EsLog.open(dst, 1L)
    EsLog.ingestObjects(spark, dst, objs, 1L, sortByEmbeddedOffset = true)
    val a = EsLog.scan(spark, srcDir)
      .select("base_offset", "base_timestamp", "payload").collect()
      .map(r => (r.getLong(0), r.getLong(1), new String(r.getAs[Array[Byte]](2))))
      .sortBy(_._1)
    val b = EsLog.scan(spark, dst)
      .select("base_offset", "base_timestamp", "payload").collect()
      .map(r => (r.getLong(0), r.getLong(1), new String(r.getAs[Array[Byte]](2))))
      .sortBy(_._1)
    assert(a.toSeq === b.toSeq)
  }

  test("exportObjects honors [start, end) with straddle semantics") {
    val objs = EsLog.exportObjects(spark, srcDir, start = 100L, end = 150L,
      maxObjectBytes = 1024 * 1024).collect()
    val rows = objs.flatMap(r =>
      TieredObject.decodeAll(r.getAs[Array[Byte]]("obj")))
    assert(rows.map(_.base_offset).min === 100L)
    assert(rows.map(_.base_offset).max === 149L)
  }

  // ----------------------------------------------------------------- WAL

  test("exportWal: fixed-size sealed segments, contiguous WAL offsets, CRC-scannable") {
    val segBytes = 16 * 1024
    val segs = EsLog.exportWal(spark, srcDir,
      segmentBytes = segBytes, blockSize = 256).collect()
    assert(segs.length > 1, "16 KiB segments over ~400 records must roll")
    // contiguous offsets: exactly {0..k-1} * segmentBytes
    val offs = segs.map(_.getAs[Long]("wal_offset")).sorted
    assert(offs.toSeq === (0 until segs.length).map(_.toLong * segBytes))
    var total = 0L
    segs.foreach { r =>
      val off = r.getAs[Long]("wal_offset")
      val bytes = r.getAs[Array[Byte]]("seg")
      assert(bytes.length === segBytes, "padded to exactly segmentBytes")
      val scan = WalSegment.scanSegment(bytes, off)
      assert(scan.isSealed && !scan.torn)
      assert(scan.payloads.size.toLong === r.getAs[Long]("n_records"))
      total += scan.payloads.size
      // every payload is a decodable FlatRecordBatch frame
      scan.payloads.foreach { p =>
        assert(FlatRecordBatch.decodeAll(p).nonEmpty)
      }
    }
    assert(total === 400L)
    // a segment scanned under the WRONG wal offset fails its CRC (recycled-
    // segment protection, segment.rs:310-328) and recovers nothing
    val first = segs.find(_.getAs[Long]("wal_offset") === 0L).get
    val wrong = WalSegment.scanSegment(first.getAs[Array[Byte]]("seg"), 12345L)
    assert(wrong.torn && wrong.payloads.isEmpty)
  }

  test("exportWal footer carries true earliest/latest batch timestamps") {
    val segBytes = 16 * 1024
    val segs = EsLog.exportWal(spark, srcDir,
      segmentBytes = segBytes, blockSize = 256).collect()
    segs.foreach { r =>
      val off = r.getAs[Long]("wal_offset")
      val bytes = r.getAs[Array[Byte]]("seg")
      val ts = WalSegment.scanSegment(bytes, off).payloads
        .flatMap(p => FlatRecordBatch.decodeAll(p)).map(_.base_timestamp)
      val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.BIG_ENDIAN)
      val earliest = bb.getLong(bytes.length - 16)
      val latest = bb.getLong(bytes.length - 8)
      assert(earliest === ts.min)
      assert(latest === ts.max)
    }
  }

  test("exportWal -> ingestWal round-trips hash-identically") {
    val segs = EsLog.exportWal(spark, srcDir,
      segmentBytes = 16 * 1024, blockSize = 256)
    val dst = tmpDir("graft-export-wal-rt-")
    EsLog.create(dst, streamId = 9L)
    EsLog.open(dst, 1L)
    EsLog.ingestWal(spark, dst, segs, 1L, sortByEmbeddedOffset = true)
    val a = EsLog.scan(spark, srcDir)
      .select("base_offset", "base_timestamp", "payload").collect()
      .map(r => (r.getLong(0), r.getLong(1), new String(r.getAs[Array[Byte]](2))))
      .sortBy(_._1)
    val b = EsLog.scan(spark, dst)
      .select("base_offset", "base_timestamp", "payload").collect()
      .map(r => (r.getLong(0), r.getLong(1), new String(r.getAs[Array[Byte]](2))))
      .sortBy(_._1)
    assert(a.toSeq === b.toSeq)
  }

  private def scanTriples(dir: String): Seq[(Long, Long, String)] =
    EsLog.scan(spark, dir)
      .select("base_offset", "base_timestamp", "payload").collect()
      .map(r => (r.getLong(0), r.getLong(1), new String(r.getAs[Array[Byte]](2))))
      .sortBy(_._1).toSeq

  test("file-level round trip: object bucket layout and WAL store-directory layout") {
    // objects: one raw file per object, names sort in offset order
    val objDir = tmpDir("graft-objdir-")
    val nObj = EsLog.exportObjectFiles(spark, srcDir, objDir,
      maxObjectBytes = 4 * 1024, sparseBytes = 1024)
    val objFiles = new java.io.File(objDir).listFiles.map(_.getName)
      .filter(_.startsWith("obj-")).sorted
    assert(objFiles.length.toLong === nObj && nObj > 1)
    val starts = objFiles.map(_.split("-")(1).toLong)
    assert(starts.toSeq === starts.sorted.toSeq, "key listing must sort by offset")
    val dst1 = tmpDir("graft-objdir-rt-")
    EsLog.create(dst1, streamId = 10L); EsLog.open(dst1, 1L)
    EsLog.ingestObjectDir(spark, dst1, objDir, 1L)
    assert(scanTriples(dst1) === scanTriples(srcDir))

    // WAL: one raw file per segment, named by base WAL offset in decimal —
    // the reference store's own naming, parsed back by ingestWalDir
    val walDir = tmpDir("graft-waldir-")
    val nSeg = EsLog.exportWalFiles(spark, srcDir, walDir,
      segmentBytes = 16 * 1024, blockSize = 256)
    val segFiles = new java.io.File(walDir).listFiles.map(_.getName)
      .filter(_.forall(_.isDigit))
    assert(segFiles.length.toLong === nSeg && nSeg > 1)
    val dst2 = tmpDir("graft-waldir-rt-")
    EsLog.create(dst2, streamId = 11L); EsLog.open(dst2, 1L)
    EsLog.ingestWalDir(spark, dst2, walDir, 1L)
    assert(scanTriples(dst2) === scanTriples(srcDir))
  }

  test("offloadStream: micro-batched offload drains the head; same-checkpoint re-run is a no-op") {
    val root = tmpDir("graft-offload-")
    val objDir = s"$root/objects"
    val ckpt = s"$root/ckpt"
    val q = EsLog.offloadStream(spark, srcDir, objDir, ckpt,
      maxObjectBytes = 8 * 1024, sparseBytes = 2048, maxOffsetsPerTrigger = 100)
    q.awaitTermination(300000)
    // objects land in per-trigger batch-<id>/ dirs (replay hygiene — a
    // divergent replay rewrites exactly its own directory)
    def objFiles() = new java.io.File(objDir).listFiles
      .filter(d => d.isDirectory && d.getName.startsWith("batch-"))
      .flatMap(_.listFiles).filter(_.getName.startsWith("obj-"))
    val files = objFiles()
    val batchDirs = new java.io.File(objDir).listFiles.filter(_.isDirectory).length
    assert(batchDirs >= 4, s"4 triggers -> 4 batch dirs, got $batchDirs")
    assert(files.length >= 4, s"4 triggers x >=1 object each, got ${files.length}")
    // every object parses and the union covers the whole stream exactly once
    val rows = files.flatMap(f => TieredObject.decodeAll(
      java.nio.file.Files.readAllBytes(f.toPath)))
    assert(rows.length === 400)
    assert(rows.map(_.base_offset).sorted.toSeq === (0L until 400L))
    // checkpointed: a second run sees no new offsets, writes no new keys
    val q2 = EsLog.offloadStream(spark, srcDir, objDir, ckpt,
      maxObjectBytes = 8 * 1024, sparseBytes = 2048, maxOffsetsPerTrigger = 100)
    q2.awaitTermination(300000)
    val names2 = objFiles().map(f => f.getParentFile.getName + "/" + f.getName).sorted
    assert(names2.toSeq ===
      files.map(f => f.getParentFile.getName + "/" + f.getName).sorted.toSeq)
  }

  test("range-aligned export + reference key scheme: <stream>-<range>/<offset>, round-trips") {
    // a 2-range stream: epoch 1 first half, seal-on-open, epoch 2 second half
    val dir = tmpDir("graft-export-2seg-")
    val s = spark
    import s.implicits._
    def half(lo: Int, hi: Int) = (lo until hi).map(i =>
      (s"p-$i", Map("k" -> s"v$i"), 100L + i))
      .toDF("text", "properties", "base_timestamp")
      .select(col("text").cast("binary").as("payload"), col("properties"),
        col("base_timestamp"))
    EsLog.create(dir, streamId = 12L)
    EsLog.open(dir, 1L)
    EsLog.append(spark, dir, half(0, 100), 1L)
    EsLog.open(dir, 2L) // seal-on-open: range 0 closes, range 1 opens
    EsLog.append(spark, dir, half(100, 200), 2L)

    // every object holds exactly one range_index
    val objs = EsLog.exportObjects(spark, dir, maxObjectBytes = 1024 * 1024).collect()
    assert(objs.map(_.getAs[Int]("range_index")).distinct.sorted.toSeq === Seq(0, 1))
    objs.foreach { r =>
      val ranges = TieredObject.decodeAll(r.getAs[Array[Byte]]("obj"))
        .map(_.range_index).distinct
      assert(ranges === Seq(r.getAs[Int]("range_index")))
    }

    // reference keys: <stream_id>-<range_index>/<start_offset>
    val out = tmpDir("graft-export-refkeys-")
    EsLog.exportObjectFiles(spark, dir, out, referenceKeys = true)
    // drop the local FS's hidden .crc checksum siblings — Spark's file
    // listing (and any object store) never sees dot-files
    val keys = new java.io.File(out).listFiles.filter(_.isDirectory)
      .flatMap(d => d.listFiles.filterNot(_.getName.startsWith("."))
        .map(f => s"${d.getName}/${f.getName}")).sorted
    assert(keys.exists(_.startsWith("12-0/")) && keys.exists(_.startsWith("12-1/")),
      keys.mkString(", "))
    keys.foreach(k => assert(k.matches("12-[01]/[0-9]+"), k))

    // the nested layout round-trips through the recursive directory ingest
    val dst = tmpDir("graft-export-refkeys-rt-")
    EsLog.create(dst, streamId = 13L); EsLog.open(dst, 1L)
    EsLog.ingestObjectDir(spark, dst, out, 1L)
    val a = EsLog.scan(spark, dir).select("base_offset", "payload").collect()
      .map(r => (r.getLong(0), new String(r.getAs[Array[Byte]](1)))).sortBy(_._1)
    val b = EsLog.scan(spark, dst).select("base_offset", "payload").collect()
      .map(r => (r.getLong(0), new String(r.getAs[Array[Byte]](1)))).sortBy(_._1)
    assert(a.toSeq === b.toSeq)
  }

  test("exportWal rejects a segmentBytes too small for one record") {
    val e = intercept[org.apache.spark.SparkException] {
      EsLog.exportWal(spark, srcDir, segmentBytes = 64).collect()
    }
    assert(e.getMessage != null)
  }
}
