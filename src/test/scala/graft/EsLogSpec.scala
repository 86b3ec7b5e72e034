package graft

import org.apache.spark.sql.functions._
import graft.eslog.EsLog
import graft.meta.FencedException

class EsLogSpec extends SparkTestBase {

  test("probe: events.parquet ns timestamp read mode") {
    val df = spark.read.parquet(sf("events"))
    info(s"events schema: ${df.schema.simpleString}")
    assert(df.count() == 1000)
  }

  test("e2e: append events as record batches, fetch back, offsets = event_id") {
    val dir = tmpDir("eslog-e2e-")
    EsLog.create(dir, streamId = 1L)
    EsLog.open(dir, epoch = 1L)
    val events = spark.read.parquet(sf("events"))
    val input = events.select(
      col("event_id"),
      to_json(struct(col("event_id"), col("user_id"), col("event_type"),
        col("value"), col("props"))).cast("binary").as("payload"),
      map(lit("event_type"), col("event_type")).as("properties"),
      (col("ts").cast("decimal(38,0)") / 1000000L).cast("long").as("base_timestamp"))
    val (first, next) = EsLog.append(spark, dir, input, epoch = 1L,
      sortKey = Some("event_id"), numPartitions = 4)
    assert(first == 0L && next == 1000L)
    assert(EsLog.nextOffset(dir) == 1000L)

    val back = EsLog.scan(spark, dir)
    assert(back.count() == 1000)
    // offset assignment must follow the sort key exactly
    val joined = back
      .select(col("base_offset"), get_json_object(col("payload").cast("string"), "$.event_id").cast("long").as("eid"))
      .where(col("base_offset") =!= col("eid"))
    assert(joined.count() == 0)
  }

  test("fetch range pruning + straddle semantics; trim; reopen fencing") {
    val dir = tmpDir("eslog-rng-")
    EsLog.create(dir, streamId = 2L)
    EsLog.open(dir, 1L)
    val n = 100
    val input = spark.range(n).select(
      col("id"), col("id").cast("string").cast("binary").as("payload"))
    EsLog.append(spark, dir, input, 1L, sortKey = Some("id"), numPartitions = 4)

    val part = EsLog.fetch(spark, dir, 10, 20)
    val offs = part.select("base_offset").collect().map(_.getLong(0)).sorted
    assert(offs.sameElements(10L until 20L))

    // trim to 30: offsets below vanish
    EsLog.trim(dir, 30L)
    val after = EsLog.scan(spark, dir)
    assert(after.agg(min("base_offset")).collect().head.getLong(0) == 30L)
    assert(EsLog.startOffset(dir) == 30L)
    assert(EsLog.nextOffset(dir) == 100L)

    // fetch below trim returns nothing below start
    assert(EsLog.fetch(spark, dir, 0, 35).agg(min("base_offset")).collect().head.getLong(0) == 30L)

    // reopen with higher epoch seals; stale writer fenced
    EsLog.open(dir, 2L)
    assertThrows[FencedException] {
      EsLog.append(spark, dir, input, 1L)
    }
    // new epoch continues contiguously in a new segment
    val (f2, n2) = EsLog.append(spark, dir, input.limit(5), 2L, sortKey = Some("id"))
    assert(f2 == 100L && n2 == 105L)
    val segs = EsLog.listSegments(spark, dir).collect()
    assert(segs.length == 2)
  }

  test("multi-record batches keep offset arithmetic (last_offset_delta > 1)") {
    val dir = tmpDir("eslog-delta-")
    EsLog.create(dir); EsLog.open(dir, 1L)
    val input = spark.range(10).select(
      col("id"),
      lit("x").cast("binary").as("payload"),
      (col("id") % 3 + 1).cast("int").as("last_offset_delta"))
    val (_, next) = EsLog.append(spark, dir, input, 1L, sortKey = Some("id"))
    // deltas: ids 0..9 -> 1,2,3,1,2,3,1,2,3,1 = 19
    assert(next == 19L)
    val back = EsLog.scan(spark, dir)
    assert(back.agg(sum("last_offset_delta")).collect().head.getLong(0) == 19L)
    // fetch straddling a multi-offset batch returns it whole
    val straddle = EsLog.fetch(spark, dir, 1, 2).collect()
    assert(straddle.length == 1 && straddle.head.getAs[Long]("base_offset") == 1L)
  }

  test("describe/update/delete surface") {
    val dir = tmpDir("eslog-ddl-")
    EsLog.create(dir, streamId = 9L, replica = 3, ackCount = 2, retentionMs = 1000L)
    val st = EsLog.describe(dir)
    assert(st.streamId == 9L && st.replica == 3 && st.ackCount == 2)
    EsLog.update(dir, retentionMs = Some(5000L))
    assert(EsLog.describe(dir).retentionMs == 5000L)
    EsLog.delete(dir)
    assert(EsLog.describe(dir).deleted)
    assertThrows[IllegalStateException](EsLog.scan(spark, dir))
  }
}
