package graft

import org.apache.spark.sql.functions._
import graft.operators.{Session, SessionEvent, Sessionize}

/** Batch and streaming sessionization must agree: the streaming operator
  * emits exactly the closed sessions; each user's newest session stays open
  * in GroupState. */
class SessionizeSpec extends SparkTestBase {

  test("batch sessions = streaming closed sessions + one open tail per user") {
    import spark.implicits._
    Fixtures.tune(spark)
    val ev = eventsDf
      .select(col("user_id"), expr("ts div 1000000").as("t"))
    val gap = 86400000L

    val batch = Sessionize.batch(ev, "user_id", "t", gap)
      .as[Session].collect().toSet
    val users = ev.select("user_id").distinct().count()

    // streaming over a single AvailableNow batch through the eslog source
    val dir = tmpDir("sess-")
    graft.eslog.EsLog.create(dir)
    graft.eslog.EsLog.open(dir, 1L)
    graft.eslog.EsLog.append(spark, dir,
      eventsDf.select(
        col("event_id"),
        col("props").cast("binary").as("payload"),
        map(lit("user_id"), col("user_id").cast("string")).as("properties"),
        expr("ts div 1000000").as("base_timestamp")),
      1L, sortKey = Some("event_id"), numPartitions = 4)
    val src = spark.readStream.format("eslog").load(dir)
      .select(col("properties")("user_id").cast("long").as("user_id"),
        col("base_timestamp").as("t"))
      .as[SessionEvent]
    val q = Sessionize.streamingClosed(src, gap).toDF()
      .writeStream.format("memory").queryName("sess_spec")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)

    val streamed = spark.table("sess_spec").as[Session].collect().toSet
    assert(streamed.size + users == batch.size,
      s"closed=${streamed.size} users=$users batch=${batch.size}")
    // every emitted session is a batch session, and per user only the
    // highest sid (the open tail) is missing
    assert(streamed.subsetOf(batch))
    val missing = batch -- streamed
    assert(missing.size == users)
    val maxSid = batch.groupBy(_.user_id).view.mapValues(_.map(_.sid).max).toMap
    assert(missing.forall(s => s.sid == maxSid(s.user_id)))
  }
}
