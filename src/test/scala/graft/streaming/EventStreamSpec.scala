package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{SparkTestBase, Tables}

/** Streaming/batch equivalence: the incremental queries must converge to
  * the same answers as their batch twins once the watermark has passed
  * all data — Structured Streaming's correctness contract.
  */
class EventStreamSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  /** Materialize the (ns-normalized) events as a plain parquet dir the
    * file-stream source can read, plus one far-future sentinel row so the
    * watermark passes every real event and all windows/sessions flush.
    */
  private lazy val streamDir: String = {
    val dir = Files.createTempDirectory("graft-stream").toString
    val ev  = Tables.events(spark, Sf0001)
      .select("event_id", "ts", "user_id", "event_type", "value")
    val sentinel = Seq(
      (-1L, java.sql.Timestamp.valueOf("2030-01-01 00:00:00"), -1L, "sentinel", 0.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    ev.union(sentinel).coalesce(1).write.mode("overwrite").parquet(dir)
    dir
  }

  private def runToCompletion(df: org.apache.spark.sql.DataFrame, name: String): Unit = {
    val q = df.writeStream.format("memory").queryName(name).outputMode("append").start()
    try q.processAllAvailable()
    finally q.stop()
  }

  test("streaming hourly agg converges to the batch answer") {
    val src = spark.readStream
      .schema("event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING, value DOUBLE")
      .parquet(streamDir)
    runToCompletion(EventStream.hourly(src), "hourly_out")
    val got = spark.table("hourly_out")
      .filter(col("event_type") =!= "sentinel")
      .as[(java.sql.Timestamp, String, Long, Double)].collect().toSet
    val want = graft.ops.Events.hourly(spark, Sf0001)
      .as[(java.sql.Timestamp, String, Long, Double)].collect().toSet
    assert(got == want)
  }

  test("streaming sliding windows converge to the batch answer") {
    val src = spark.readStream
      .schema("event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING, value DOUBLE")
      .parquet(streamDir)
    runToCompletion(EventStream.sliding(src), "sliding_out")
    val got = spark.table("sliding_out")
      .filter(col("event_type") =!= "sentinel")
      .as[(Long, Long, String, Long, Double)].collect().toSet
    val want = graft.ops.Events.slidingHourly(spark, Sf0001)
      .as[(Long, Long, String, Long, Double)].collect().toSet
    assert(got == want)
  }

  test("streaming native session windows converge to the batch answer") {
    val src = spark.readStream
      .schema("event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING, value DOUBLE")
      .parquet(streamDir)
    runToCompletion(EventStream.sessions(src), "sessions_out")
    val got = spark.table("sessions_out")
      .filter(col("user_id") =!= -1L) // drop the watermark sentinel's session
      .as[(Long, Long, Long, Long, Double)].collect().toSet
    val want = graft.ops.Events.sessionNative(spark, Sf0001)
      .as[(Long, Long, Long, Long, Double)].collect().toSet
    assert(got == want)
  }

  test("streaming dynamic-gap session windows converge to the batch answer") {
    val src = spark.readStream
      .schema("event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING, value DOUBLE")
      .parquet(streamDir)
    runToCompletion(EventStream.sessionsDynamic(src), "dyn_sessions_out")
    val got = spark.table("dyn_sessions_out")
      .filter(col("user_id") =!= -1L) // drop the watermark sentinel's session
      .as[(Long, Long, Long, Long)].collect().toSet
    val want = graft.ops.Events.sessionDynamicGap(spark, Sf0001)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got == want)
  }

  test("restart from checkpoint resumes exactly-once (state + file-sink manifest)") {
    // the streaming analogue of the reference's crash/exactly-once
    // probes (play.sh crash test): stop the query between micro-batches
    // (a clean batch-boundary stop, not a mid-batch crash), restart a
    // NEW query instance from the same checkpoint, and the final output
    // must be the batch answer exactly — aggregation state recovers
    // from the state store, and the file sink's commit manifest keeps
    // replayed batches from double-writing. Phase 1 delivers the first
    // half of the events and stops with windows still open; phase 2
    // appends the rest plus the watermark sentinel and finishes the job.
    val base   = Files.createTempDirectory("graft-restart")
    val srcDir = base.resolve("src").toString
    val outDir = base.resolve("out").toString
    val ckpt   = base.resolve("ckpt").toString
    val ev = Tables.events(spark, Sf0001)
      .select("event_id", "ts", "user_id", "event_type", "value")
    val cut = lit(graft.ops.Events.IncrCutUs)
    ev.filter(unix_micros(col("ts")) < cut)
      .coalesce(1).write.mode("append").parquet(srcDir)

    def runOnce(): Unit = {
      val src = spark.readStream
        .schema("event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING, value DOUBLE")
        .parquet(srcDir)
      val q = EventStream.hourly(src).writeStream
        .format("parquet")
        .option("checkpointLocation", ckpt)
        .option("path", outDir)
        .outputMode("append")
        .start()
      try q.processAllAvailable()
      finally q.stop()
    }

    runOnce() // phase 1: half the data, then the query dies
    val sentinel = Seq(
      (-1L, java.sql.Timestamp.valueOf("2030-01-01 00:00:00"), -1L, "sentinel", 0.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    ev.filter(unix_micros(col("ts")) >= cut).union(sentinel)
      .coalesce(1).write.mode("append").parquet(srcDir)
    runOnce() // phase 2: restart from the checkpoint, finish the stream

    val got = spark.read.parquet(outDir) // manifest-filtered exactly-once view
      .filter(col("event_type") =!= "sentinel")
      .as[(java.sql.Timestamp, String, Long, Double)].collect().toSet
    val want = graft.ops.Events.hourly(spark, Sf0001)
      .as[(java.sql.Timestamp, String, Long, Double)].collect().toSet
    assert(got == want)
  }

  test("streaming moments equal the batch stats bit-for-bit") {
    // complete-mode global agg: decimal-exact running sums mean the final
    // table must equal Stats.moments EXACTLY, not approximately
    // the sentinel only exists to push watermarks for the windowed tests;
    // complete-mode needs no watermark, and its 1-row group would hit the
    // ANSI divide-by-zero in var's (n-1) divisor — drop it at the source
    val src = spark.readStream
      .schema("event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING, value DOUBLE")
      .parquet(streamDir)
      .filter(col("event_type") =!= "sentinel")
    val q = EventStream.moments(src).writeStream
      .format("memory").queryName("moments_out").outputMode("complete").start()
    try q.processAllAvailable()
    finally q.stop()
    val got = spark.table("moments_out")
      .as[(String, Long, Double, Double, Double, Double, Double)].collect().toSet
    val want = graft.ops.Stats.moments(spark, Sf0001)
      .as[(String, Long, Double, Double, Double, Double, Double)].collect().toSet
    assert(got == want)
  }

  test("sessionize invariants: events partition exactly into sessions") {
    val total = Tables.events(spark, Sf0001).count()
    val sessions = graft.ops.Events.sessionize(spark, Sf0001)
      .select("n_events", "start_us", "end_us")
      .as[(Long, Long, Long)].collect()
    assert(sessions.map(_._1).sum == total, "session sizes must sum to the event count")
    assert(sessions.forall { case (_, s, e) => s <= e }, "session start must not exceed end")
  }

  test("stream-stream interval join converges to the batch join") {
    val src = spark.readStream
      .schema("event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING, value DOUBLE")
      .parquet(streamDir)
    runToCompletion(EventStream.clickPurchaseJoin(src), "ssjoin_out")
    val got = spark.table("ssjoin_out")
      .select("user_id", "purchase_id", "click_id")
      .as[(Long, Long, Long)].collect().toSet
    val ev = Tables.events(spark, Sf0001)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts").as("click_ts"), col("event_id").as("click_id"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("purchase_ts"), col("event_id").as("purchase_id"))
    val want = purchases
      .join(clicks,
        col("p_user") === col("user_id") &&
          col("click_ts") <= col("purchase_ts") &&
          col("click_ts") >= col("purchase_ts") - org.apache.spark.sql.functions.expr("INTERVAL 1 HOUR"))
      .select(col("p_user"), col("purchase_id"), col("click_id"))
      .as[(Long, Long, Long)].collect().toSet
    assert(got == want)
    assert(want.nonEmpty, "fixture should contain click->purchase pairs")
  }

  test("stream-static enrichment join matches the batch join and stays stateless") {
    val src = spark.readStream
      .schema("event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING, value DOUBLE")
      .parquet(streamDir)
    runToCompletion(EventStream.enrich(src, Tables.customer(spark, Sf0001)), "enrich_out")
    val got = spark.table("enrich_out")
      .filter(col("event_type") =!= "sentinel")
      .as[(Long, Long, String, String)].collect().toSet
    val want = Tables.events(spark, Sf0001)
      .join(Tables.customer(spark, Sf0001).select(col("c_custkey"), col("c_mktsegment")),
        col("user_id") === col("c_custkey"), "left")
      .select("event_id", "user_id", "event_type", "c_mktsegment")
      .as[(Long, Long, String, String)].collect().toSet
    assert(got == want)
    assert(got.forall(_._4 != null), "fixture user ids should all enrich")
  }

  test("streaming dedup drops replayed events within the watermark") {
    val dir = Files.createTempDirectory("graft-dedup").toString
    val ev = Tables.events(spark, Sf0001)
      .select("event_id", "ts", "user_id", "event_type", "value")
      .limit(200)
    ev.union(ev).coalesce(1).write.mode("overwrite").parquet(dir) // every event twice
    val src = spark.readStream
      .schema("event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING, value DOUBLE")
      .parquet(dir)
    runToCompletion(EventStream.dedup(src), "dedup_out")
    assert(spark.table("dedup_out").count() == 200)
  }

  test("stateful streaming funnel converges to the batch funnel counts") {
    val src = spark.readStream
      .schema("event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING, value DOUBLE")
      .parquet(streamDir)
      .as[Event]
    val q = EventStream.funnelStages(src).toDF()
      .writeStream.format("memory").queryName("funnel_out").outputMode("update").start()
    try q.processAllAvailable()
    finally q.stop()
    // stage is monotone per user, so the max over emitted updates is the
    // final stage
    val stages = spark.table("funnel_out")
      .filter(col("user_id") =!= -1L)
      .groupBy("user_id").agg(max("stage").as("stage"))
      .as[(Long, Int)].collect()
    val got = Map(
      "1_view"     -> stages.count(_._2 >= 1).toLong,
      "2_click"    -> stages.count(_._2 >= 2).toLong,
      "3_purchase" -> stages.count(_._2 >= 3).toLong)
    val want = graft.ops.Events.funnel(spark, Sf0001)
      .as[(String, Long)].collect().toMap
    assert(want("3_purchase") > 0, "fixture should complete some funnels")
    assert(got == want, s"streaming funnel $got != batch funnel $want")
  }

  test("streaming funnel carries state across micro-batches (time-split delivery)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val all = Tables.events(spark, Sf0001)
      .select("event_id", "ts", "user_id", "event_type", "value")
      .as[Event].collect().sortBy(e => (e.ts.getTime, e.event_id))
    val mid    = all(all.length / 2).ts
    val stream = MemoryStream[Event]
    val q = EventStream.funnelStages(stream.toDS()).toDF()
      .writeStream.format("memory").queryName("funnel_mb_out").outputMode("update").start()
    try {
      // two event-time-ordered batches: frontier state built in batch 1
      // must qualify clicks/purchases arriving in batch 2
      stream.addData(all.filter(!_.ts.after(mid)).toSeq)
      q.processAllAvailable()
      stream.addData(all.filter(_.ts.after(mid)).toSeq)
      q.processAllAvailable()
    } finally q.stop()
    val stages = spark.table("funnel_mb_out")
      .groupBy("user_id").agg(max("stage").as("stage"))
      .as[(Long, Int)].collect()
    val got = Map(
      "1_view"     -> stages.count(_._2 >= 1).toLong,
      "2_click"    -> stages.count(_._2 >= 2).toLong,
      "3_purchase" -> stages.count(_._2 >= 3).toLong)
    val want = graft.ops.Events.funnel(spark, Sf0001)
      .as[(String, Long)].collect().toMap
    assert(got == want, s"multi-batch streaming funnel $got != batch funnel $want")
  }

  test("streaming attribution rollup equals the batch query bit-for-bit, across batch splits") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val all = Tables.events(spark, Sf0001)
      .select("event_id", "ts", "user_id", "event_type", "value")
      .as[Event].collect().sortBy(e => (e.ts.getTime, e.event_id))
    val mid    = all(all.length / 2).ts
    val stream = MemoryStream[Event]
    val q = EventStream.attributeConversions(stream.toDS()).toDF()
      .writeStream.format("memory").queryName("attr_out").outputMode("append").start()
    try {
      // the cross-batch case that matters: a touch in batch 1 must credit
      // a purchase arriving in batch 2
      stream.addData(all.filter(!_.ts.after(mid)).toSeq)
      q.processAllAvailable()
      stream.addData(all.filter(_.ts.after(mid)).toSeq)
      q.processAllAvailable()
    } finally q.stop()
    // roll the emitted conversions up EXACTLY the way the batch query
    // does: count, decimal(38,6)-summed value, exact-integer mean lag
    val convs = spark.table("attr_out")
      .as[(Long, Long, String, Double, Long)].collect()
    val got = convs.groupBy(_._3).map { case (ch, rows) =>
      val sumValue = rows
        .map(r => java.math.BigDecimal.valueOf(r._4).setScale(6, java.math.RoundingMode.HALF_UP))
        .reduce(_ add _).doubleValue()
      val gaps = rows.map(_._5).filter(_ >= 0)
      val avgGap =
        if (gaps.isEmpty) None
        else Some(gaps.sum.toDouble / (gaps.length.toDouble * 1000000.0))
      ch -> ((rows.length.toLong, sumValue, avgGap))
    }
    val want = graft.ops.Events.attribution(spark, Sf0001)
      .as[(String, Long, Double, Option[Double])].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got.keySet == want.keySet, s"channels ${got.keySet} != ${want.keySet}")
    got.foreach { case (ch, g) =>
      assert(g == want(ch), s"channel $ch: streaming $g != batch ${want(ch)}")
    }
    // every purchase in the fixture was attributed exactly once
    assert(convs.map(_._2).distinct.length == convs.length)
    assert(convs.length == all.count(_.event_type == "purchase"))
  }

  test("streaming corpus diff converges to the batch snapshot diff across batch splits") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // the sf0.001 corpus has no exact-duplicate docs and no digit runs,
    // so append both: an exact copy (its non-survivor side must surface
    // as "removed") and a digit-bearing doc (the PII mask must surface
    // it as "changed") — in BOTH twins
    val base = Tables.documents(spark, Sf0001)
    val extra = base.orderBy("doc_id").limit(1)
      .select(
        array(
          struct((col("doc_id") + lit(1000000L)).as("doc_id"), col("text")),
          struct((col("doc_id") + lit(2000000L)).as("doc_id"),
            concat(col("text"), lit(" id 12345")).as("text"))).as("xs"),
        col("lang"), col("source"))
      .select(explode(col("xs")).as("x"), col("lang"), col("source"))
      .select(col("x.doc_id"), col("x.text"), col("lang"), col("source"),
        length(col("x.text")).cast("long").as("n_chars"))
    val docs = base.unionByName(extra)
    val v1 = graft.ops.Dedup.diffBase(docs).as[(Long, String)].collect()
      .map { case (id, d) => DocVer(id, 1, d) }
    val v2 = graft.ops.Dedup.diffNext(docs).as[(Long, String)].collect()
      .map { case (id, d) => DocVer(id, 2, d) }
    // delta-merge delivery: the baseline snapshot plus a few EARLY v2
    // arrivals in batch 1 (the per-key fold is order-independent), then
    // the rest of the new snapshot split across two arbitrary batches
    val (v2early, v2rest) = v2.splitAt(10)
    val (v2a, v2b)        = v2rest.splitAt(v2rest.length / 2)
    val stream = MemoryStream[DocVer]
    val q = CorpusStream.corpusDiff(stream.toDS()).toDF()
      .writeStream.format("memory").queryName("cdiff_out").outputMode("update").start()
    try {
      stream.addData(v1.toSeq ++ v2early.toSeq)
      q.processAllAvailable()
      stream.addData(v2a.toSeq)
      q.processAllAvailable()
      stream.addData(v2b.toSeq)
      q.processAllAvailable()
    } finally q.stop()
    // the settled status per doc is its LAST update (max n_seen)
    val got = spark.table("cdiff_out")
      .groupBy("doc_id").agg(max(struct(col("n_seen"), col("status"))).as("m"))
      .select(col("doc_id"), col("m.status"))
      .as[(Long, String)].collect().toSet
    val want = graft.ops.Dedup.snapshotDiffOf(docs)
      .as[(Long, String)].collect().toSet
    assert(got == want, s"streaming diff diverged from batch corpus_diff " +
      s"(got ${got.size} rows, want ${want.size})")
    assert(want.exists(_._2 == "removed") && want.exists(_._2 == "changed"),
      "fixture should exercise removed AND changed statuses")
  }

  test("streaming incremental dedup emits exactly the batch delta matches, any delivery order") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val docs = Tables.documents(spark, Sf0001)
      .select("doc_id", "text").as[(Long, String)].collect()
    val m   = graft.ops.Dedup.DeltaMod
    val arr = docs.map { case (id, t) => DocArrival(id, snap = id % m != 0, t) }
    val (snapRecs, deltaRecs) = arr.partition(_.snap)
    // adversarial delivery: most of the snapshot first, then half the
    // delta INTERLEAVED with snapshot stragglers, then the rest — the
    // id-keyed precedence rule must make the result delivery-independent
    val (snapA, snapB) = snapRecs.splitAt(snapRecs.length - 5)
    val (d1, d2)       = deltaRecs.splitAt(deltaRecs.length / 2)
    val stream = MemoryStream[DocArrival]
    val q = CorpusStream.incrementalDedup(stream.toDS()).toDF()
      .writeStream.format("memory").queryName("incdedup_out").outputMode("append").start()
    try {
      stream.addData(snapA.toSeq)
      q.processAllAvailable()
      stream.addData(d1.toSeq ++ snapB.toSeq)
      q.processAllAvailable()
      stream.addData(d2.toSeq)
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("incdedup_out").distinct()
      .as[(Long, Long, Double)].collect().toSet
    val full = graft.ops.Dedup.minhash(spark, Sf0001)
      .as[(Long, Long, Double)].collect()
    val want = full.flatMap { case (a, b, j) =>
      (if (b % m == 0) Seq((b, a, j)) else Nil) ++
        (if (a % m == 0 && b % m != 0) Seq((a, b, j)) else Nil)
    }.toSet
    assert(want.nonEmpty, "fixture should produce delta matches")
    assert(got == want,
      s"streaming matches diverged: extra=${(got -- want).take(3)}, missing=${(want -- got).take(3)}")
  }

  test("online anomalies match a batch prefix-window twin bit-for-bit, across batch splits") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.expressions.Window
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val all = Tables.events(spark, Sf0001)
      .select("event_id", "ts", "user_id", "event_type", "value")
      .as[Event].collect().sortBy(e => (e.ts.getTime, e.ts.getNanos, e.event_id))

    // batch twin: z-score each event against its type's PREFIX moments
    // (rows before it in event-time order) — the same decimal-quantized
    // sums and expression order as the streaming state machine
    val w = Window.partitionBy("event_type").orderBy("ts", "event_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val pfx = Tables.events(spark, Sf0001)
      .withColumn("pn", count(lit(1)).over(w))
      .withColumn("psx", sum(col("value").cast("decimal(38,6)")).over(w).cast("double"))
      .withColumn("psxx",
        sum((col("value") * col("value")).cast("decimal(38,6)")).over(w).cast("double"))
      // when() guards: ANSI mode rejects the pn = 0 / pn = 1 divisions
      // the prefix of each group would otherwise evaluate
      .withColumn("mean", when(col("pn") >= 2, col("psx") / col("pn").cast("double")))
      .withColumn("std",
        when(col("pn") >= 2,
          sqrt((col("psxx") - col("psx") * col("psx") / col("pn").cast("double")) /
            (col("pn").cast("double") - lit(1.0)))))
      .withColumn("flagged",
        coalesce(
          col("pn") >= 2 && col("std") > 0 &&
            abs((col("value") - col("mean")) / col("std")) > lit(3.0),
          lit(false)))
    val want = pfx.groupBy("event_type")
      .agg(count(lit(1)).as("n_seen"),
        sum(when(col("flagged"), 1L).otherwise(0L)).as("n_flagged"))
      .as[(String, Long, Long)].collect().toSet

    val mid    = all(all.length / 2).ts
    val stream = MemoryStream[Event]
    val q = EventStream.onlineAnomalies(stream.toDS()).toDF()
      .writeStream.format("memory").queryName("anom_out").outputMode("update").start()
    try {
      // split delivery: prefix moments built in batch 1 must carry into
      // batch 2's z-scores
      stream.addData(all.filter(!_.ts.after(mid)).toSeq)
      q.processAllAvailable()
      stream.addData(all.filter(_.ts.after(mid)).toSeq)
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("anom_out")
      .groupBy("event_type")
      .agg(max("n_seen").as("n_seen"), max("n_flagged").as("n_flagged"))
      .as[(String, Long, Long)].collect().toSet
    assert(got == want, s"streaming $got != batch prefix twin $want")
    assert(got.exists(_._3 > 0), "fixture should produce at least one prefix anomaly")
  }

  test("streaming HLL registers converge to the batch sketch bit-for-bit, any delivery order") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val all = Tables.events(spark, Sf0001)
      .select("event_id", "ts", "user_id", "event_type", "value")
      .as[Event].collect()
    // adversarial delivery: shuffled deterministically (hash order) and
    // split so every batch re-delivers users already registered — the
    // pointwise-max register update must be idempotent across batches
    val shuffled = all.sortBy(e => (e.user_id * 2654435761L) ^ e.event_id)
    val third    = shuffled.length / 3
    val stream   = MemoryStream[Event]
    val q = EventStream.hllUsers(stream.toDS()).toDF()
      .writeStream.format("memory").queryName("hll_out").outputMode("update").start()
    try {
      stream.addData(shuffled.take(third).toSeq)
      q.processAllAvailable()
      stream.addData(shuffled.slice(third, 2 * third).toSeq)
      q.processAllAvailable()
      stream.addData(shuffled.drop(2 * third).toSeq)
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("hll_out")
      .groupBy("event_type")
      .agg(max(struct(col("n_seen"), col("v_zero"), col("est_hll"))).as("m"))
      .select(col("event_type"), col("m.v_zero"), col("m.est_hll"))
      .as[(String, Long, Double)].collect().toSet
    val want = graft.ops.Sketches.hllDistinct(spark, Sf0001)
      .select("event_type", "v_zero", "est_hll")
      .as[(String, Long, Double)].collect().toSet
    assert(got == want, s"streaming HLL $got != batch sketch $want")
  }

  test("streaming lifetimes reproduce the batch Kaplan-Meier bit-for-bit, any delivery order") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val all = Tables.events(spark, Sf0001)
      .select("event_id", "ts", "user_id", "event_type", "value")
      .as[Event].collect()
    // adversarial delivery: deterministic shuffle + 3 batches that
    // re-deliver keys — min/max state must be order-free and idempotent
    val shuffled = all.sortBy(e => (e.event_id * 2654435761L) ^ e.user_id)
    val third    = shuffled.length / 3
    val stream   = MemoryStream[Event]
    val q = EventStream.lifetimes(stream.toDS()).toDF()
      .writeStream.format("memory").queryName("lt_out").outputMode("update").start()
    try {
      stream.addData(shuffled.take(third).toSeq)
      q.processAllAvailable()
      stream.addData(shuffled.slice(third, 2 * third).toSeq)
      q.processAllAvailable()
      stream.addData(shuffled.drop(2 * third).toSeq)
      q.processAllAvailable()
    } finally q.stop()
    // latest state per key: first_us only shrinks, last_us only grows
    val finalLt = spark.table("lt_out")
      .groupBy("user_id", "event_type")
      .agg(min(col("first_us")).as("f"), max(col("last_us")).as("l"))
    val wantLt = Tables.events(spark, Sf0001)
      .groupBy(col("event_type"), col("user_id"))
      .agg(min(expr("unix_micros(ts)")).as("f"), max(expr("unix_micros(ts)")).as("l"))
      .select("user_id", "event_type", "f", "l")
      .as[(Long, String, Long, Long)].collect().toSet
    assert(finalLt.select("user_id", "event_type", "f", "l")
      .as[(Long, String, Long, Long)].collect().toSet == wantLt,
      "streaming lifetimes diverge from the batch min/max aggregate")
    // the SAME KM fold over the streaming state equals the batch query
    val gmax = finalLt.agg(max(col("l")).as("g"))
    val got = graft.ops.Events
      .survivalKmFromLifetimes(
        finalLt.select(col("event_type"), col("user_id"), col("f"), col("l")), gmax)
      .as[(String, Long, Long, Double, Double, Long, Double)].collect().toSet
    val want = graft.ops.Events.survivalKm(spark, Sf0001)
      .as[(String, Long, Long, Double, Double, Long, Double)].collect().toSet
    assert(got == want, s"streaming KM $got != batch $want")
  }

  test("stateful sessionization converges to the batch gaps-and-islands answer") {
    val src = spark.readStream
      .schema("event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING, value DOUBLE")
      .parquet(streamDir)
      .as[Event]
    runToCompletion(EventStream.sessionize(src).toDF(), "sessions_out")
    val got = spark.table("sessions_out")
      .filter(col("user_id") =!= -1L)
      .select("user_id", "session_start_us", "session_end_us", "n_events")
      .as[(Long, Long, Long, Long)].collect().toSet
    val want = graft.ops.Events.sessionize(spark, Sf0001)
      .select(col("user_id"), col("start_us"), col("end_us"), col("n_events"))
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got == want)
  }

  test("every streaming twin's sink schema is driver-safe (output-type lint)") {
    // round-13: the batch catalog's output-type lint (no DECIMAL/FLOAT
    // result columns — the round-7-11 hash-compare bug class) extended to
    // the streaming sinks, which live outside SparkEntry.queries and so
    // outside the smoke gate. Schema derivation needs no query start.
    import org.apache.spark.sql.Encoders
    import graft.Smoke
    val src = spark.readStream
      .schema("event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING, value DOUBLE")
      .parquet(streamDir)
    val untyped = Seq(
      "hourly"            -> EventStream.hourly(src),
      "sliding"           -> EventStream.sliding(src),
      "sessions"          -> EventStream.sessions(src),
      "sessionsDynamic"   -> EventStream.sessionsDynamic(src),
      "clickPurchaseJoin" -> EventStream.clickPurchaseJoin(src),
      "enrich"            -> EventStream.enrich(src, Tables.customer(spark, Sf0001)),
      "dedup"             -> EventStream.dedup(src),
      "moments"           -> EventStream.moments(src),
      "ingestProfile"     -> CorpusStream.ingestProfile(
        Tables.documents(spark, Sf0001)))
    for ((n, df) <- untyped)
      Smoke.outputTypeViolation(df.schema).foreach(v =>
        fail(s"streaming sink $n has a driver-unsafe output column: $v"))
    // typed transforms: the sink schema IS the result encoder's schema
    val typed = Seq(
      "AnomalyCount"   -> Encoders.product[AnomalyCount].schema,
      "HllEstimate"    -> Encoders.product[HllEstimate].schema,
      "Lifetime"       -> Encoders.product[Lifetime].schema,
      "FunnelStage"    -> Encoders.product[FunnelStage].schema,
      "AttributedConv" -> Encoders.product[AttributedConv].schema,
      "Session"        -> Encoders.product[Session].schema,
      "DocDiff"        -> Encoders.product[DocDiff].schema,
      "DeltaMatch"     -> Encoders.product[DeltaMatch].schema)
    for ((n, schema) <- typed)
      Smoke.outputTypeViolation(schema).foreach(v =>
        fail(s"streaming sink $n has a driver-unsafe output column: $v"))
  }
}
