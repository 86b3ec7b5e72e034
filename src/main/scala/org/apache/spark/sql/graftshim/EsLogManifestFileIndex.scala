package org.apache.spark.sql.graftshim

import org.apache.hadoop.fs.{FileStatus, Path}

import org.apache.spark.sql.classic
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.execution.datasources.{FileFormat, FileIndex, HadoopFsRelation, PartitionDirectory}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.sources.BaseRelation
import org.apache.spark.sql.types.{LongType, StructType}

/** A manifest entry the index prunes on: absolute path + the stats the
  * metadata log committed with the file. `streamId` = the owning stream for
  * multi-stream (catalog) scans; -1 = unknown/single-stream (never pruned
  * on). */
final case class ManifestFile(absPath: String, bytes: Long,
                              startOffset: Long, endOffset: Long,
                              minTimestamp: Long, maxTimestamp: Long,
                              streamId: Long = -1L,
                              rows: Long = -1L) // -1 = unknown (blocks metadata-only count)

/** Manifest-driven [[FileIndex]]: the stream's committed file set (a metadata
  * snapshot taken at plan time) exposed to Spark's NATIVE parquet relation —
  * the Delta/TahoeFileIndex technique. The scan that results is the
  * vectorized, whole-stage-codegen parquet path with columns pruned and
  * filters pushed to the reader; this class only decides WHICH files
  * participate, using the per-file offset/timestamp stats from the manifest
  * (the reference's range routing, replication_stream.rs:393-421).
  *
  * Pruning is conservative (supersets): Spark re-applies every data filter
  * exactly after the scan. */
class EsLogManifestFileIndex(val streamDir: String, files: Seq[ManifestFile])
    extends FileIndex {

  override def rootPaths: Seq[Path] = Seq(new Path(streamDir))
  override def partitionSchema: StructType = StructType(Nil)
  override def sizeInBytes: Long = files.map(_.bytes).sum
  override def inputFiles: Array[String] = files.map(_.absPath).toArray
  override def refresh(): Unit = ()

  /** Exact aggregate stats of the manifest snapshot, when every entry
    * carries a row count — serves `count(*)` / `min(base_offset)` /
    * `min/max(base_timestamp)` from metadata alone (see
    * [[EsLogMetadataOnlyCount]]). The relation builders only construct this
    * index for streams whose every committed row is readable (mid-file-trim
    * streams fall back to the exact row-bounded V1 relation; multi-stream
    * scans put straddle residuals in a Filter ABOVE the relation, which
    * blocks the rewrite), so the manifest stats ARE the scan's. */
  def manifestStats: Option[EsLogManifestStats] =
    if (files.isEmpty) Some(EsLogManifestStats(0L, 0L, 0L, 0L, empty = true))
    else if (files.forall(_.rows >= 0))
      Some(EsLogManifestStats(files.map(_.rows).sum, files.map(_.startOffset).min,
        files.map(_.minTimestamp).min, files.map(_.maxTimestamp).max, empty = false))
    else None

  override def listFiles(partitionFilters: Seq[Expression],
                         dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
    var lo = Long.MinValue; var hi = Long.MaxValue      // base_offset ∈ [lo, hi)
    var tsLo = Long.MinValue; var tsHi = Long.MaxValue  // base_timestamp ∈ [tsLo, tsHi)
    var sidLo = Long.MinValue; var sidHi = Long.MaxValue // stream_id ∈ [sidLo, sidHi)
    def attr(e: Expression): Option[String] = e match {
      case a: AttributeReference => Some(a.name)
      case _ => None
    }
    def long(e: Expression): Option[Long] = e match {
      case Literal(v: Long, LongType) => Some(v)
      case _ => None
    }
    def tighten(name: String, newLo: Long => Unit, newHi: Long => Unit)
               (a: Option[String], v: Option[Long], isLo: Boolean, inclusive: Boolean): Unit =
      for (n <- a; value <- v; if n == name)
        // value + 1 would wrap at Long.MaxValue (e.g. `<= Long.MaxValue`),
        // collapsing hi to Long.MinValue and pruning every file; leave such a
        // bound unbounded instead — pruning must stay a conservative superset.
        if (isLo) { if (inclusive) newLo(value) else if (value != Long.MaxValue) newLo(value + 1) }
        else { if (inclusive) { if (value != Long.MaxValue) newHi(value + 1) } else newHi(value) }
    def offBound = tighten("base_offset", v => lo = math.max(lo, v), v => hi = math.min(hi, v)) _
    def tsBound = tighten("base_timestamp", v => tsLo = math.max(tsLo, v), v => tsHi = math.min(tsHi, v)) _
    def sidBound = tighten("stream_id", v => sidLo = math.max(sidLo, v), v => sidHi = math.min(sidHi, v)) _
    def each(b: (Option[String], Option[Long], Boolean, Boolean) => Unit)(e: Expression): Unit = e match {
      case GreaterThanOrEqual(a, l) => b(attr(a), long(l), true, true); b(attr(l), long(a), false, true)
      case GreaterThan(a, l)        => b(attr(a), long(l), true, false); b(attr(l), long(a), false, false)
      case LessThan(a, l)           => b(attr(a), long(l), false, false); b(attr(l), long(a), true, false)
      case LessThanOrEqual(a, l)    => b(attr(a), long(l), false, true); b(attr(l), long(a), true, true)
      case EqualTo(a, l)            => b(attr(a), long(l), true, true); b(attr(a), long(l), false, true)
                                       b(attr(l), long(a), true, true); b(attr(l), long(a), false, true)
      case _ => ()
    }
    dataFilters.foreach { f => each(offBound)(f); each(tsBound)(f); each(sidBound)(f) }

    // file [startOffset, endOffset) may hold a qualifying row iff spans
    // overlap; stream_id is constant per file, so an id bound drops whole
    // streams from a multi-stream (catalog) scan — the per-stream pruning a
    // union of N single-stream relations used to get from N indexes.
    val selected = files.filter { f =>
      f.endOffset > lo && (hi == Long.MaxValue || f.startOffset < hi) &&
        f.maxTimestamp >= tsLo && (tsHi == Long.MaxValue || f.minTimestamp < tsHi) &&
        (f.streamId == -1L ||
          (f.streamId >= sidLo && (sidHi == Long.MaxValue || f.streamId < sidHi)))
    }
    val statuses = selected.map { f =>
      new FileStatus(f.bytes, false, 1, 128L * 1024 * 1024, 0L, new Path(f.absPath))
    }.toArray
    Seq(PartitionDirectory(InternalRow.empty, statuses))
  }
}

/** Read-only parquet format for manifest-backed relations: a SQL
  * `INSERT INTO` over a `USING eslog` catalog table plans as
  * InsertIntoHadoopFsRelationCommand, which would write raw part files into
  * the stream directory — UNMANIFESTED, so scans would silently never see
  * the rows. Writes must go through the commit protocol (EsLog.append /
  * `df.write.format("eslog")` / the streaming sink); this makes the bypass
  * loud instead of silently lossy. */
private class EsLogReadOnlyParquet extends ParquetFileFormat {
  override def prepareWrite(sparkSession: org.apache.spark.sql.SparkSession,
                            job: org.apache.hadoop.mapreduce.Job,
                            options: Map[String, String],
                            dataSchema: StructType)
      : org.apache.spark.sql.execution.datasources.OutputWriterFactory =
    throw new UnsupportedOperationException(
      "direct INSERT into an eslog scan relation bypasses the offset/manifest " +
        "commit protocol; append with df.write.format(\"eslog\") (or CREATE TABLE " +
        "... USING eslog AS SELECT ..., or the streaming sink) instead")
}

object EsLogManifestFileIndex {
  /** The stream as Spark's native parquet relation over the manifest
    * snapshot: vectorized scan + codegen, no Row conversion (the fix for the
    * V1 PrunedFilteredScan conversion tax). `sizeInBytes` comes from the
    * manifest, so broadcast decisions see real sizes. */
  def relation(spark: org.apache.spark.sql.SparkSession, streamDir: String,
               files: Seq[ManifestFile], schema: StructType,
               options: Map[String, String]): BaseRelation =
    HadoopFsRelation(
      new EsLogManifestFileIndex(streamDir, files),
      partitionSchema = StructType(Nil),
      dataSchema = schema,
      bucketSpec = None,
      fileFormat = new EsLogReadOnlyParquet,
      options = options)(spark.asInstanceOf[classic.SparkSession])
}
