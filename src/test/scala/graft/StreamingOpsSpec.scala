package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Tables
import graft.streaming.StreamingOps
import graft.streaming.StreamingOps.{Ev, Session}

/** Proves the streaming path computes the same answers as the
  * oracle-checked batch path: same transform under readStream
  * (tumbling agg) and the flatMapGroupsWithState sessionizer vs the
  * window-function batch sessionizer, on the driver's events table.
  */
class StreamingOpsSpec extends AnyFunSuite {
  import TestSpark._

  test("tumblingAgg under a file readStream equals the batch result") {
    val batch = StreamingOps.tumblingAgg(Tables.events(spark, sf))
      .orderBy("bucket_start", "event_type")
      .collect()

    // stream the same parquet through the identical transform (the
    // file source needs a directory, so stage the file into one)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val dir = java.nio.file.Files.createTempDirectory("events_stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf/events.parquet"),
      dir.resolve("events.parquet"))
    val raw = spark.readStream
      .schema(spark.read.parquet(s"$sf/events.parquet").schema)
      .parquet(dir.toString)
      .transform(Tables.normalizeEventsTs)
    val q = StreamingOps.tumblingAggStream(raw)
      .writeStream.format("memory").queryName("tumbling_test")
      .outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()

    val streamed = spark.table("tumbling_test")
      .orderBy("bucket_start", "event_type").collect()
    assert(streamed.toSeq === batch.toSeq)
  }

  test("slidingAgg under a file readStream equals the batch result") {
    val batch = StreamingOps.slidingAgg(Tables.events(spark, sf))
      .orderBy("window_start", "event_type")
      .collect()

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val dir = java.nio.file.Files.createTempDirectory("events_sliding")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf/events.parquet"),
      dir.resolve("events.parquet"))
    val raw = spark.readStream
      .schema(spark.read.parquet(s"$sf/events.parquet").schema)
      .parquet(dir.toString)
      .transform(Tables.normalizeEventsTs)
    val q = StreamingOps.slidingAggStream(raw)
      .writeStream.format("memory").queryName("sliding_test")
      .outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()

    val streamed = spark.table("sliding_test")
      .orderBy("window_start", "event_type").collect()
    assert(streamed.toSeq === batch.toSeq)
    // every event lands in exactly width/slide = 2 windows
    val nEvents = Tables.events(spark, sf).count()
    val nWindowed = batch.map(_.getAs[Long]("n")).sum
    assert(nWindowed === 2 * nEvents)
  }

  test("file source -> transform -> parquet sink E2E with checkpoint") {
    import spark.implicits._
    // incremental arrival: documents split into 3 parquet files
    val inDir = java.nio.file.Files.createTempDirectory("docs_in")
    val outDir = java.nio.file.Files.createTempDirectory("docs_out")
    val ckDir = java.nio.file.Files.createTempDirectory("docs_ck")
    val docs = Tables.documents(spark, sf).collect()
    val schema = Tables.documents(spark, sf).schema
    docs.grouped(math.max(docs.length / 3, 1)).zipWithIndex.foreach {
      case (chunk, i) =>
        spark.createDataFrame(
          spark.sparkContext.parallelize(chunk.toIndexedSeq), schema)
          .write.parquet(s"$inDir/chunk_$i")
    }
    def transformTokens(df: org.apache.spark.sql.DataFrame) =
      df.select(col("doc_id"),
        size(split(trim(col("text")), "\\s+")).as("n_tokens"))
    val q = transformTokens(
        spark.readStream.schema(schema)
          .option("maxFilesPerTrigger", "1")
          .parquet(s"$inDir/*"))
      .writeStream.format("parquet")
      .option("path", outDir.toString)
      .option("checkpointLocation", ckDir.toString)
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()

    val streamed = spark.read.parquet(outDir.toString)
      .orderBy("doc_id").collect()
    val batch = transformTokens(Tables.documents(spark, sf))
      .orderBy("doc_id").collect()
    assert(streamed.toSeq === batch.toSeq)
  }

  test("streaming dropDuplicates equals batch distinct (stateful dedup)") {
    import spark.implicits._
    val batch = Tables.events(spark, sf)
      .select("user_id", "event_type").distinct()
      .orderBy("user_id", "event_type").collect()

    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val q = mem.toDF().toDF("user_id", "event_type")
      .dropDuplicates("user_id", "event_type")
      .writeStream.format("memory").queryName("dedup_test")
      .outputMode("append").start()
    try {
      val rows = Tables.events(spark, sf)
        .select("user_id", "event_type").as[(Long, String)].collect()
      // two chunks with overlap: state must dedup across micro-batches
      mem.addData(rows.take(rows.length / 2 + 100).toIndexedSeq)
      q.processAllAvailable()
      mem.addData(rows.drop(rows.length / 2 - 100).toIndexedSeq)
      q.processAllAvailable()
    } finally q.stop()

    val streamed = spark.table("dedup_test")
      .orderBy("user_id", "event_type").collect()
    assert(streamed.toSeq === batch.toSeq)
  }

  test("dropDuplicatesWithinWatermark equals batch keep-first dedup") {
    import spark.implicits._
    val batch = StreamingOps.dedupFirstBatch(Tables.events(spark, sf))
      .orderBy("user_id", "event_type").collect()

    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, java.sql.Timestamp, String, Long)]
    val stream = mem.toDF().toDF("user_id", "ts", "event_type", "event_id")
    // The watermark must cover the corpus's event-time span (~1 month):
    // dropDuplicatesWithinWatermark EVICTS a key once the watermark
    // passes its event time and will re-emit that key's next event —
    // with a 1-hour delay here, each (user, type) would surface ~once
    // per batch, not once ever. Bounded-state dedup equals global
    // batch dedup only while keys stay inside the watermark window.
    val q = StreamingOps.dedupStreamWithinWatermark(stream, "90 days")
      .writeStream.format("memory").queryName("dedup_wm_test")
      .outputMode("append").start()
    try {
      // event-time arrival order (the backfill/replay case where the
      // streaming keep-first-arrival contract coincides with batch
      // keep-earliest), split across micro-batches so eviction +
      // cross-batch state are exercised
      val rows = Tables.events(spark, sf)
        .select("user_id", "ts", "event_type", "event_id")
        .as[(Long, java.sql.Timestamp, String, Long)].collect()
        .sortBy(r => (r._2.getTime, r._4))
      rows.grouped(math.max(rows.length / 3, 1)).foreach { chunk =>
        mem.addData(chunk.toIndexedSeq)
        q.processAllAvailable()
      }
    } finally q.stop()

    val streamed = spark.table("dedup_wm_test")
      .orderBy("user_id", "event_type").collect()
    assert(streamed.toSeq === batch.toSeq)
  }

  test("stateful sessionization runs on the RocksDB state store backend") {
    import spark.implicits._
    val batch = StreamingOps.sessionStatsBatch(Tables.events(spark, sf))
      .select("user_id", "session_no", "n_events", "start_us", "end_us")
      .as[(Long, Int, Long, Long, Long)].collect().toSet

    // the production state backend for large state: spillable,
    // checkpointed RocksDB instead of the default in-JVM-heap map
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      implicit val sqlCtx = spark.sqlContext
      val mem = MemoryStream[StreamingOps.Ev]
      val out = StreamingOps.sessionizeStream(spark, mem.toDS(),
          idleTimeout = false)
        .writeStream.format("memory").queryName("rocksdb_session_test")
        .outputMode("append").start()
      try {
        val evs = Tables.events(spark, sf)
          .select(col("user_id"), unix_micros(col("ts")).as("us"),
            col("event_id"))
          .as[StreamingOps.Ev].collect().sortBy(e => (e.us, e.event_id))
        evs.grouped(math.max(evs.length / 3, 1)).foreach { chunk =>
          mem.addData(chunk.toIndexedSeq)
          out.processAllAvailable()
        }
      } finally out.stop()
      val streamed = spark.table("rocksdb_session_test")
        .select("user_id", "session_no", "n_events", "start_us", "end_us")
        .as[(Long, Int, Long, Long, Long)].collect().toSet
      // open tail sessions are unemitted in append mode — the emitted
      // (closed) sessions must be a subset equal on closed keys
      val closedBatch = batch.filter(b => streamed.exists(s =>
        s._1 == b._1 && s._2 == b._2))
      assert(streamed === closedBatch)
      assert(streamed.nonEmpty)
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("checkpoint recovery: a restarted query resumes exactly-once") {
    import spark.implicits._
    val inDir = java.nio.file.Files.createTempDirectory("ck_in")
    val outDir = java.nio.file.Files.createTempDirectory("ck_out")
    val ckDir = java.nio.file.Files.createTempDirectory("ck_ck")
    val docs = Tables.documents(spark, sf).collect()
    val schema = Tables.documents(spark, sf).schema
    def writeChunk(chunk: Array[org.apache.spark.sql.Row], i: Int): Unit =
      spark.createDataFrame(
        spark.sparkContext.parallelize(chunk.toIndexedSeq), schema)
        .write.parquet(s"$inDir/chunk_$i")
    def transform(df: org.apache.spark.sql.DataFrame) =
      df.select(col("doc_id"),
        size(split(trim(col("text")), "\\s+")).as("n_tokens"))
    def startQuery() = transform(
        spark.readStream.schema(schema).parquet(s"$inDir/*"))
      .writeStream.format("parquet")
      .option("path", outDir.toString)
      .option("checkpointLocation", ckDir.toString)
      .outputMode("append").start()

    val (first, second) = docs.splitAt(docs.length / 2)
    writeChunk(first, 0)
    val q1 = startQuery()
    try q1.processAllAvailable() finally q1.stop()
    // new data arrives while the query is DOWN; the restarted query
    // must pick it up from the checkpoint without reprocessing chunk 0
    writeChunk(second, 1)
    val q2 = startQuery()
    try q2.processAllAvailable() finally q2.stop()

    val streamed = spark.read.parquet(outDir.toString)
      .orderBy("doc_id").collect()
    val batch = transform(Tables.documents(spark, sf))
      .orderBy("doc_id").collect()
    assert(streamed.toSeq === batch.toSeq)
  }

  test("Trigger.AvailableNow drains the backlog and stops on its own") {
    val inDir = java.nio.file.Files.createTempDirectory("an_in")
    val outDir = java.nio.file.Files.createTempDirectory("an_out")
    val ckDir = java.nio.file.Files.createTempDirectory("an_ck")
    val docs = Tables.documents(spark, sf)
    val schema = docs.schema
    docs.write.parquet(s"$inDir/chunk_0")
    // the scheduled-backfill deployment form: process everything
    // available, checkpoint, terminate — no long-running query
    val q = spark.readStream.schema(schema).parquet(s"$inDir/*")
      .select(col("doc_id"),
        size(split(trim(col("text")), "\\s+")).as("n_tokens"))
      .writeStream.format("parquet")
      .option("path", outDir.toString)
      .option("checkpointLocation", ckDir.toString)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .outputMode("append").start()
    assert(q.awaitTermination(120000), "AvailableNow query did not terminate")
    val streamed = spark.read.parquet(outDir.toString)
      .orderBy("doc_id").collect()
    val batch = docs.select(col("doc_id"),
        size(split(trim(col("text")), "\\s+")).as("n_tokens"))
      .orderBy("doc_id").collect()
    assert(streamed.toSeq === batch.toSeq)
  }

  test("foreachBatch sink: batchId-keyed writes stay idempotent under retry") {
    import spark.implicits._
    val outDir = java.nio.file.Files.createTempDirectory("fb_out")
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val q = mem.toDF().toDF("user_id", "event_type")
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
        // the epoch id keys the output path: a retried epoch
        // OVERWRITES its own partition instead of appending a second
        // copy — the standard exactly-once-effects recipe for sinks
        // without transactions
        batch.write.mode("overwrite").parquet(s"$outDir/batch=$batchId")
        // simulate the retry the contract protects against
        batch.write.mode("overwrite").parquet(s"$outDir/batch=$batchId")
        ()
      }
      .start()
    val rows = Tables.events(spark, sf)
      .select("user_id", "event_type").as[(Long, String)].collect()
    try {
      rows.grouped(math.max(rows.length / 3, 1)).foreach { chunk =>
        mem.addData(chunk.toIndexedSeq)
        q.processAllAvailable()
      }
    } finally q.stop()
    // every input row exactly once despite each epoch writing twice
    val written = spark.read.parquet(s"$outDir/batch=*")
    assert(written.count() === rows.length)
  }

  test("streaming as-of attribution equals the batch custom as-of join") {
    import spark.implicits._
    // batch truth through the custom Catalyst operator
    val e = Tables.events(spark, sf)
    val p = e.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("p_us"))
    val s = e.filter(col("event_type") === "signup")
      .select(col("user_id").as("s_user"), unix_micros(col("ts")).as("signup_us"))
    val batch = graft.plans.AsOfJoin.asofJoin(spark, p, s,
        Seq("user_id"), Seq("s_user"), "p_us", "signup_us")
      .select(col("event_id"), col("signup_us"))
      .collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap

    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Long, Int, Long)]
    val q = StreamingOps.asofStream(spark, mem.toDS())
      .writeStream.format("memory").queryName("asof_stream_test")
      .outputMode("append").start()
    try {
      val rows = e.filter(col("event_type").isin("purchase", "signup"))
        .select(col("user_id"), unix_micros(col("ts")).as("us"),
          when(col("event_type") === "signup", 0).otherwise(1).as("kind"),
          col("event_id"))
        .as[(Long, Long, Int, Long)].collect()
        .sortBy(r => (r._2, r._3, r._4))
      rows.grouped(math.max(rows.length / 3, 1)).foreach { chunk =>
        mem.addData(chunk.toIndexedSeq)
        q.processAllAvailable()
      }
    } finally q.stop()

    val streamed = spark.table("asof_stream_test")
      .select("id", "right_us").collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(streamed === batch)
  }

  test("left-outer watermarked stream-stream join emits null-padded " +
      "rows once the watermark closes the window, matching batch") {
    import spark.implicits._
    // the s07 shape: clicks left-joined to same-user views in the
    // preceding hour; unmatched clicks must surface as null rows —
    // in streaming that emission happens ONLY when the watermark
    // proves no matching view can still arrive
    val e = Tables.events(spark, sf)
      .select(col("event_id"), col("user_id"), col("ts"), col("event_type"))
    def sides(df: org.apache.spark.sql.DataFrame) = (
      df.filter(col("event_type") === "click")
        .select(col("event_id").as("c_id"), col("user_id").as("c_user"),
          col("ts").as("c_ts")),
      df.filter(col("event_type") === "view")
        .select(col("event_id").as("v_id"), col("user_id").as("v_user"),
          col("ts").as("v_ts")))
    def joinCond = col("c_user") === col("v_user") &&
      col("v_ts") <= col("c_ts") &&
      col("c_ts") < col("v_ts") + expr("INTERVAL 1 HOUR")

    val (bc, bv) = sides(e)
    val batch = bc.join(bv, joinCond, "left_outer")
      .select(col("c_id"), col("v_id")).collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) -1L else r.getLong(1))).toSet

    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, java.sql.Timestamp, Long, String)]
    val stream = mem.toDF().toDF("event_id", "ts", "user_id", "event_type")
    val (sc, sv) = sides(stream)
    val q = sc.withWatermark("c_ts", "2 hours")
      .join(sv.withWatermark("v_ts", "2 hours"), joinCond, "leftOuter")
      .select(col("c_id"), col("v_id"))
      .writeStream.format("memory").queryName("ss_outer_join_test")
      .outputMode("append").start()
    val Sentinel = 1000000000000L
    try {
      val rows = e.select("event_id", "ts", "user_id", "event_type")
        .as[(Long, java.sql.Timestamp, Long, String)].collect()
      val maxTs = rows.map(_._2.getTime).max
      mem.addData(rows.toIndexedSeq)
      q.processAllAvailable()
      // null-padded rows for clicks near the stream's end are still
      // held as state: the watermark has not passed their windows. A
      // far-future sentinel on BOTH sides advances it past every
      // open window — only then may the engine emit the outer rows.
      val future = new java.sql.Timestamp(maxTs + 30L * 24 * 3600 * 1000)
      mem.addData(Seq(
        (Sentinel, future, Sentinel, "click"),
        (Sentinel + 1, future, Sentinel, "view")))
      q.processAllAvailable()
    } finally q.stop()

    val streamed = spark.table("ss_outer_join_test").collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) -1L else r.getLong(1)))
      .filter(_._1 < Sentinel).toSet
    assert(streamed === batch,
      "streaming left-outer join diverged from the batch outer join")
    // and the outer rows genuinely exist (the surface under test)
    assert(streamed.exists(_._2 == -1L),
      "no null-padded row was emitted — the outer path never fired")
  }

  test("watermarked stream-stream join matches the batch interval join") {
    import spark.implicits._
    // purchases joined to same-user signups within the preceding hour
    val e = Tables.events(spark, sf)
      .select(col("event_id"), col("user_id"), col("ts"), col("event_type"))
    def sides(df: org.apache.spark.sql.DataFrame) = (
      df.filter(col("event_type") === "purchase")
        .select(col("event_id").as("p_id"), col("user_id").as("p_user"),
          col("ts").as("p_ts")),
      df.filter(col("event_type") === "signup")
        .select(col("event_id").as("s_id"), col("user_id").as("s_user"),
          col("ts").as("s_ts")))
    def joinCond = col("p_user") === col("s_user") &&
      col("s_ts") <= col("p_ts") &&
      col("s_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR")

    val (bp, bs) = sides(e)
    val batch = bp.join(bs, joinCond)
      .select("p_id", "s_id").orderBy("p_id", "s_id").collect()

    implicit val sqlCtx = spark.sqlContext
    // re-shape: MemoryStream of the raw tuples, restore columns
    val mem = MemoryStream[(Long, java.sql.Timestamp, Long, String)]
    val stream = mem.toDF().toDF("event_id", "ts", "user_id", "event_type")
    val (sp, ss) = sides(stream)
    val q = sp.withWatermark("p_ts", "2 hours")
      .join(ss.withWatermark("s_ts", "2 hours"), joinCond)
      .select("p_id", "s_id")
      .writeStream.format("memory").queryName("ss_join_test")
      .outputMode("append").start()
    try {
      mem.addData(e.select("event_id", "ts", "user_id", "event_type")
        .as[(Long, java.sql.Timestamp, Long, String)].collect().toIndexedSeq)
      q.processAllAvailable()
    } finally q.stop()

    val streamed = spark.table("ss_join_test")
      .orderBy("p_id", "s_id").collect()
    assert(streamed.toSeq === batch.toSeq)
  }

  test("event-time sessionizer handles cross-batch disorder (watermark buffer)") {
    import spark.implicits._
    val evs = Tables.events(spark, sf)
      .select(col("user_id"), unix_micros(col("ts")).as("us"), col("event_id"))
      .as[Ev].collect().sortBy(_.us)

    // batch truth on the same events
    val batch = StreamingOps.sessionStatsBatch(Tables.events(spark, sf))
      .select("user_id", "session_no", "n_events", "start_us", "end_us")
      .as[(Long, Int, Long, Long, Long)].collect()
      .map(r => Session(r._1, r._2, r._3, r._4, r._5)).toSet

    // deterministic DISORDER: shuffle within 64-event blocks (hours of
    // jitter), well inside the 7-day watermark delay
    val rnd = new scala.util.Random(7)
    val disordered = evs.grouped(64).flatMap(b => rnd.shuffle(b.toSeq)).toSeq

    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, java.sql.Timestamp, Long)]
    val stream = mem.toDF().toDF("user_id", "ts", "event_id")
    val out = StreamingOps.sessionizeEventTime(spark, stream, "7 days")
      .writeStream.format("memory").queryName("evt_session_test")
      .outputMode("append").start()
    def toRow(e: Ev) =
      (e.user_id, new java.sql.Timestamp(e.us / 1000) {
        setNanos(((e.us % 1000000) * 1000).toInt)
      }, e.event_id)
    try {
      disordered.grouped(disordered.length / 3 + 1).foreach { c =>
        mem.addData(c.map(toRow).toIndexedSeq); out.processAllAvailable()
      }
      // two far-future flush rounds per user: the watermark lags one
      // batch behind the data, so round 1 advances it and round 2's
      // batch finalizes every real session against it
      for (k <- 1 to 2) {
        val flushUs = evs.last.us + k * 30L * 86400 * 1000 * 1000
        mem.addData(evs.map(_.user_id).distinct.toIndexedSeq
          .map(u => toRow(Ev(u, flushUs, Long.MaxValue - k))))
        out.processAllAvailable()
      }
    } finally out.stop()

    // ignore sessions formed by the flush events themselves
    val streamed = spark.table("evt_session_test").as[Session].collect()
      .filter(_.start_us <= evs.last.us).toSet
    assert(streamed === batch,
      s"missing=${(batch -- streamed).take(3)} extra=${(streamed -- batch).take(3)}")
  }

  test("stateful stream sessionizer agrees with the batch sessionizer") {
    import spark.implicits._
    val evs = Tables.events(spark, sf)
      .select(col("user_id"), unix_micros(col("ts")).as("us"), col("event_id"))
      .as[Ev].collect().sortBy(_.us)

    // batch truth
    val batch = StreamingOps.sessionStatsBatch(Tables.events(spark, sf))
      .select("user_id", "session_no", "n_events", "start_us", "end_us")
      .as[(Long, Int, Long, Long, Long)].collect()
      .map(r => Session(r._1, r._2, r._3, r._4, r._5)).toSet

    // stream in three chronological chunks + a far-future flush event
    // per user (closes every open tail session so Append emits it)
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val out = StreamingOps.sessionizeStream(spark, mem.toDS(),
      idleTimeout = false)
      .writeStream.format("memory").queryName("session_test")
      .outputMode("append").start()
    try {
      val chunks = evs.grouped(math.max(evs.length / 3, 1)).toSeq
      chunks.foreach { c => mem.addData(c.toIndexedSeq); out.processAllAvailable() }
      val flushUs = evs.last.us + 365L * 86400 * 1000 * 1000
      mem.addData(evs.map(_.user_id).distinct.toIndexedSeq
        .map(u => Ev(u, flushUs, Long.MaxValue)))
      out.processAllAvailable()
    } finally out.stop()

    val streamed = spark.table("session_test").as[Session].collect().toSet
    assert(streamed === batch)
  }

  test("idle timeout keeps a session_no tombstone (no renumbering on return)") {
    // The processing-time timeout path cannot fire under
    // processAllAvailable, so the transition is verified directly:
    // closing an open session must leave a tombstone whose `closed`
    // counter continues the numbering when the user returns.
    import StreamingOps.{SessState, Session, onIdleTimeout}
    val (tomb, out) = onIdleTimeout(7L, SessState(closed = 2, 5L, 100L, 900L))
    assert(out.toSeq === Seq(Session(7L, 3, 5L, 100L, 900L)))
    assert(tomb === SessState(3, 0L, 0L, 0L))
    // a returning user's next session numbers from the tombstone
    assert(tomb.closed + 1 === 4)
    // timing out an already-empty tombstone emits nothing, keeps count
    val (tomb2, out2) = onIdleTimeout(7L, tomb)
    assert(out2.isEmpty && tomb2.closed === 3)
  }

  test("window distinct-users: chained dedup→agg stream equals batch") {
    import spark.implicits._
    val batch = StreamingOps
      .windowDistinctUsersBatch(Tables.events(spark, sf))
      .orderBy("bucket_start").collect()

    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, Long)]
    val q = StreamingOps.windowDistinctUsersStream(
        mem.toDF().toDF("ts", "user_id"))
      .writeStream.format("memory").queryName("wdu_test")
      .outputMode("append").start()
    val rows = Tables.events(spark, sf).select("ts", "user_id")
      .as[(java.sql.Timestamp, Long)].collect().sortBy(_._1.getTime)
    val maxTs = rows.last._1.getTime
    try {
      rows.grouped(math.max(rows.length / 3, 1)).foreach { chunk =>
        mem.addData(chunk.toIndexedSeq)
        q.processAllAvailable()
      }
      // append mode emits a window only once the watermark passes its
      // end, and the watermark used by batch N comes from batch N-1 —
      // two far-future sentinel batches force every real window to
      // finalize regardless of whether a no-data micro-batch runs
      for (off <- Seq(3600L * 1000, 7200L * 1000)) {
        mem.addData(Seq((new java.sql.Timestamp(maxTs + off), -1L)))
        q.processAllAvailable()
      }
    } finally q.stop()

    // compare only real windows (sentinel buckets start after maxTs)
    val streamed = spark.table("wdu_test")
      .filter(col("bucket_start") <= new java.sql.Timestamp(maxTs))
      .orderBy("bucket_start").collect()
    assert(streamed.nonEmpty)
    assert(streamed.toSeq === batch.toSeq)
  }
}
