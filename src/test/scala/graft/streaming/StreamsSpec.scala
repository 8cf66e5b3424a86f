package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

class StreamsSpec extends SparkSpec {

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 00:$minute%02d:00")

  test("windowedCounts over a memory stream matches the batch result") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val mem = MemoryStream[Streams.Event]
    val events = Seq(
      Streams.Event(1, ts(1), 10, "click", 1.0),
      Streams.Event(2, ts(4), 10, "click", 2.0),
      Streams.Event(3, ts(11), 11, "view", 3.0),
      Streams.Event(4, ts(12), 10, "click", 4.0))
    mem.addData(events: _*)

    val q = Streams.windowedCounts(mem.toDF())
      .writeStream.format("memory").queryName("wc")
      .outputMode("complete").start()
    try { q.processAllAvailable() } finally q.stop()

    val streamed = s.table("wc")
      .select($"w_start", $"event_type", $"n", $"total_value")
      .orderBy($"w_start", $"event_type")
      .collect().map(_.toSeq).toSeq
    val batch = Streams.windowedCounts(events.toDF())
      .orderBy($"w_start", $"event_type")
      .collect().map(_.toSeq).toSeq
    assert(streamed == batch)
    // [00:00,00:10): 2 clicks; [00:10,00:20): 1 click + 1 view
    assert(streamed.map(_(2)) == Seq(2L, 1L, 1L))
  }

  test("sessionize groups events by inactivity gap per user") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val mem = MemoryStream[Streams.Event]
    // user 10: events at 00:01, 00:05 (same session), 00:59 (new session)
    // user 11: single event
    mem.addData(
      Streams.Event(1, ts(1), 10, "click", 1.0),
      Streams.Event(2, ts(5), 10, "click", 1.0),
      Streams.Event(3, ts(59), 10, "click", 1.0),
      Streams.Event(4, ts(30), 11, "view", 1.0))

    val q = Streams.sessionize(mem.toDS(), gapMs = 30L * 60 * 1000)
      .writeStream.format("memory").queryName("sess")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try { q.awaitTermination(120000) } finally q.stop()

    // only CLOSED sessions are emitted: user 10's first (01..05, 2 events)
    val closed = s.table("sess").as[Streams.Session].collect().toSeq
    assert(closed == Seq(Streams.Session(10, ts(1), ts(5), 2)))
  }

  test("event-time sessionization closes sessions when the watermark passes the gap") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val mem = MemoryStream[Streams.Event]
    val q = Streams.sessionizeEventTime(mem.toDS(), gapMs = 30L * 60 * 1000)
      .writeStream.format("memory").queryName("sess_et")
      .outputMode("append").start()
    try {
      // batch 1: one open session for user 10 (events at 00:01, 00:05)
      mem.addData(
        Streams.Event(1, ts(1), 10, "click", 1.0),
        Streams.Event(2, ts(5), 10, "click", 1.0))
      q.processAllAvailable()
      assert(s.table("sess_et").count() == 0) // still open
      // batch 2: an event 2h later advances the watermark (1:50) far past
      // the session's deadline (00:05 + 30min) -> session times out
      mem.addData(Streams.Event(3, Timestamp.valueOf("2024-01-01 02:00:00"), 99, "view", 1.0))
      q.processAllAvailable()
      // timeouts fire as of the NEXT batch's watermark evaluation
      mem.addData(Streams.Event(4, Timestamp.valueOf("2024-01-01 02:01:00"), 99, "view", 1.0))
      q.processAllAvailable()
      val closed = s.table("sess_et").as[Streams.Session].collect().toSeq
      assert(closed.contains(Streams.Session(10, ts(1), ts(5), 2)), closed.toString)
    } finally q.stop()
  }

  test("a late event earlier than the open session's start extends it backward") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val mem = MemoryStream[Streams.Event]
    val q = Streams.sessionizeEventTime(mem.toDS(), gapMs = 30L * 60 * 1000)
      .writeStream.format("memory").queryName("sess_late")
      .outputMode("append").start()
    try {
      mem.addData(Streams.Event(1, ts(10), 10, "click", 1.0))
      q.processAllAvailable()
      mem.addData(Streams.Event(2, ts(5), 10, "click", 1.0)) // late, earlier
      q.processAllAvailable()
      // advance the watermark far past the session deadline, then one
      // more batch so the event-time timeout fires
      mem.addData(Streams.Event(3, Timestamp.valueOf("2024-01-01 02:00:00"), 99, "view", 1.0))
      q.processAllAvailable()
      mem.addData(Streams.Event(4, Timestamp.valueOf("2024-01-01 02:01:00"), 99, "view", 1.0))
      q.processAllAvailable()
      val closed = s.table("sess_late").as[Streams.Session].collect().toSeq
      assert(closed.contains(Streams.Session(10, ts(5), ts(10), 2)), closed.toString)
    } finally q.stop()
  }

  test("dedupStream drops repeated event ids within the watermark") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val mem = MemoryStream[Streams.Event]
    mem.addData(
      Streams.Event(1, ts(1), 10, "click", 1.0),
      Streams.Event(1, ts(1), 10, "click", 1.0), // dup id
      Streams.Event(2, ts(2), 10, "click", 2.0))
    val q = Streams.dedupStream(mem.toDF())
      .writeStream.format("memory").queryName("dd")
      .outputMode("append").start()
    try { q.processAllAvailable() } finally q.stop()
    val ids = s.table("dd").select("event_id").as[Long].collect().sorted.toSeq
    assert(ids == Seq(1L, 2L))
  }

  test("stream-stream interval join pairs purchases with preceding clicks only") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val mem = MemoryStream[Streams.Event]
    mem.addData(
      Streams.Event(1, ts(1), 10, "click", 1.5),   // within window of purchase@05
      Streams.Event(2, ts(5), 10, "purchase", 9.0),
      Streams.Event(3, ts(20), 10, "click", 2.5),  // AFTER the purchase: no match
      Streams.Event(4, ts(3), 11, "click", 3.5))   // other user
    val q = Streams.purchaseClickJoin(mem.toDF())
      .writeStream.format("memory").queryName("pcj")
      .outputMode("append").start()
    try { q.processAllAvailable() } finally q.stop()
    val got = s.table("pcj")
      .select($"user_id", $"purchase_id", $"click_value")
      .as[(Long, Long, Double)].collect().toSeq
    assert(got == Seq((10L, 2L, 1.5)))
  }

  test("csvIngestStream dedups per key within each micro-batch") {
    val s = spark
    import s.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_stream").toString
    val inDir = s"$tmp/in"; val outDir = s"$tmp/out"; val cp = s"$tmp/cp"
    new java.io.File(inDir).mkdirs()
    val csv = "locid,loctimezone,country,locname,business\n" +
      "L1,tz1,US,a,b1\nL2,tz2,UK,c,d\nL1,tz9,DE,e,b2\n"
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$inDir/f1.csv"), csv)

    val q = Streams.csvIngestStream(s, inDir, outDir, cp)
    try { q.processAllAvailable() } finally q.stop()

    val out = s.read.parquet(outDir)
    assert(out.count() == 2) // L1 deduped
    assert(out.filter($"locid" === "L1").count() == 1)
  }
}
