package graft.model

import org.apache.spark.sql.types._

/** Core record-batch row — the engine's unit relation.
  *
  * Mirrors the reference's `RecordBatchMeta` (FlatBuffers table at
  * components/protocol/fbs/model.fbs:6-36) plus the opaque payload
  * (components/model/src/record/flat_record.rs:20-38): a batch covers logical
  * offsets `[base_offset, base_offset + last_offset_delta)` within one stream,
  * payload is raw bytes by design, properties are a string map.
  *
  * `base_timestamp` is epoch milliseconds (the reference stores an i64 unix
  * timestamp — components/model/src/record/mod.rs:148); keeping it integral
  * sidesteps timezone semantics in the storage layer. Decode to TIMESTAMP at
  * the query layer when event-time processing is wanted.
  */
final case class RecordBatchRow(
    stream_id: Long,
    range_index: Int,
    flags: Short,
    base_offset: Long,
    last_offset_delta: Int,
    base_timestamp: Long,
    properties: Map[String, String],
    payload: Array[Byte]
) {
  /** [base_offset, endOffset) — left-inclusive right-exclusive, as everywhere
    * in the reference (rpc.fbs:402-412). */
  def endOffset: Long = base_offset + last_offset_delta
}

object RecordBatchRow {
  /** Canonical Spark schema for the record-batch relation. Declared fully
    * nullable to match what Spark's Parquet writer actually persists — a scan
    * that trusted a false non-null flag could miscompile under codegen. */
  val schema: StructType = StructType(Seq(
    StructField("stream_id", LongType, nullable = true),
    StructField("range_index", IntegerType, nullable = true),
    StructField("flags", ShortType, nullable = true),
    StructField("base_offset", LongType, nullable = true),
    StructField("last_offset_delta", IntegerType, nullable = true),
    StructField("base_timestamp", LongType, nullable = true),
    StructField("properties", MapType(StringType, StringType), nullable = true),
    StructField("payload", BinaryType, nullable = true)
  ))

  val columns: Seq[String] = schema.fieldNames.toSeq
}
