package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Typed view of an event row for stateful processing. */
case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
    event_type: String, value: Double)

/** A closed user session emitted by the stateful sessionizer. */
case class Session(user_id: Long, session_start_us: Long, session_end_us: Long,
    n_events: Long)

private case class SessionState(startUs: Long, endUs: Long, n: Long)

/** A user's current funnel stage (0 = none … 3 = purchased). */
case class FunnelStage(user_id: Long, stage: Int)

/** One attributed conversion ([[EventStream.attributeConversions]]);
  * `gap_us` is -1 for a direct (touchless) purchase.
  */
case class AttributedConv(user_id: Long, event_id: Long, channel: String,
    value: Double, gap_us: Long)

private case class TouchState(tType: String, tUs: Long, maxUs: Long)

/** An event type's cumulative online-anomaly tally. */
case class AnomalyCount(event_type: String, n_seen: Long, n_flagged: Long)

/** An event type's running HLL distinct-user estimate. */
case class HllEstimate(event_type: String, n_seen: Long, v_zero: Long, est_hll: Double)

/** Running (user, type) lifetime emitted by [[EventStream.lifetimes]]. */
case class Lifetime(user_id: Long, event_type: String, first_us: Long, last_us: Long)

/** Per-type HLL register array (the mergeable sketch state). */
private case class HllRegs(nSeen: Long, regs: Array[Byte])

/** Running prefix moments per event type: count, scale-6 unscaled Σv and
  * Σv², flags so far, and the latest event time (order enforcement).
  */
private case class AnomalyState(n: Long, sx6: Long, sxx6: Long, nFlagged: Long, maxUs: Long)

/** Funnel frontier times (epoch µs; Long.MaxValue = stage not reached);
  * maxUs tracks the latest event time seen so cross-batch order
  * violations fail loudly instead of silently dropping stages.
  */
private case class FunnelState(tv: Long, tc: Long, tp: Long, maxUs: Long)

/** Structured Streaming surface: the batch Events plans re-expressed as
  * incremental queries. The reference is pure batch (SURVEY.md §2.3 —
  * streaming row “No”), so this is parity-plus: the same logical
  * aggregations running on an unbounded source with watermark-driven
  * state eviction.
  *
  * Scale: state is keyed by (window, type) / user_id — partitioned by the
  * shuffle like any agg; watermarks bound state size, which is what makes
  * the operator viable on an unbounded 100 TB/day firehose.
  */
object EventStream extends Serializable {

  val SessionGapMinutes = 30L

  /** Full-microsecond epoch value — `Timestamp.getTime` alone is
    * millisecond-truncated; the sub-ms part lives in the nanos field.
    * floorDiv, not `/`: for pre-epoch timestamps truncation toward zero
    * would pair a too-high second with the always-positive nanos and
    * flip the sub-second sign (matching `unix_micros` requires flooring).
    */
  private def tsMicros(ts: java.sql.Timestamp): Long =
    Math.floorDiv(ts.getTime, 1000L) * 1000000L + ts.getNanos / 1000L

  /** Tumbling-window counts/sums with a 1-hour watermark — the streaming
    * twin of `events_hourly` (graft.ops.Events.hourly).
    */
  def hourly(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour").as("win"), col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("value").cast("decimal(38,6)")).cast("double").as("total_value"))
      .select(col("win.start").as("hour"), col("event_type"), col("n"), col("total_value"))

  /** Sliding (hopping) windows, 1 hour every 15 minutes — the streaming
    * twin of `events_sliding` (graft.ops.Events.slidingHourly): identical
    * expression, incremental execution; state is bounded by the 4 OPEN
    * windows per (slide, type), each emitted once the watermark passes
    * its end.
    */
  def sliding(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour", "15 minutes").as("w"), col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("value").cast("decimal(38,6)")).cast("double").as("total_value"))
      .select(
        unix_micros(col("w.start")).as("win_start_us"),
        unix_micros(col("w.end")).as("win_end_us"),
        col("event_type"), col("n"), col("total_value"))

  /** Native session-window aggregation (30-min gap) — the streaming twin
    * of `events_session_native` (graft.ops.Events.sessionNative). Same
    * logical plan, executed incrementally: Spark keeps one merging
    * session per (user, open window) in the state store and emits a
    * session once the watermark passes its end, so state is bounded by
    * ACTIVE sessions, not history — the property that makes native
    * session windows the firehose-scale sessionizer.
    */
  def sessions(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(col("user_id"), session_window(col("ts"), s"$SessionGapMinutes minutes"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(38,6)")).cast("double").as("total_value"))
      .select(
        col("user_id"),
        unix_micros(col("session_window.start")).as("start_us"),
        unix_micros(col("session_window.end")).as("end_us"),
        col("n_events"),
        col("total_value"))

  /** Dynamic-gap variant of [[sessions]] — the same per-event gap
    * expression as the batch `events_session_dyngap`, run incrementally:
    * purchases close their session after 10 minutes of silence, other
    * activity after 30. State is still bounded by active sessions.
    */
  def sessionsDynamic(events: DataFrame): DataFrame = {
    val gap = when(col("event_type") === "purchase", expr("make_interval(0,0,0,0,0,10,0)"))
      .otherwise(expr("make_interval(0,0,0,0,0,30,0)"))
    events
      .withWatermark("ts", "1 hour")
      .groupBy(col("user_id"), session_window(col("ts"), gap))
      .agg(count(lit(1)).as("n_events"))
      .select(
        col("user_id"),
        unix_micros(col("session_window.start")).as("start_us"),
        unix_micros(col("session_window.end")).as("end_us"),
        col("n_events"))
  }

  /** Stream-stream interval join: each purchase joined to the same user's
    * clicks in the preceding hour. Both sides carry watermarks so join
    * state is evicted once no matching row can still arrive — the bounded
    * -state form of a streaming join (unbounded joins are a memory leak
    * at firehose scale).
    */
  def clickPurchaseJoin(events: DataFrame): DataFrame = {
    val clicks = events
      .filter(col("event_type") === "click")
      .select(col("user_id"), col("ts").as("click_ts"), col("event_id").as("click_id"))
      .withWatermark("click_ts", "2 hours")
    val purchases = events
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts").as("purchase_ts"), col("event_id").as("purchase_id"))
      .withWatermark("purchase_ts", "2 hours")
    purchases
      .alias("p")
      .join(
        clicks.alias("c"),
        expr("c.user_id = p.user_id AND click_ts <= purchase_ts AND " +
          "click_ts >= purchase_ts - INTERVAL 1 HOUR"))
      .select(col("p.user_id").as("user_id"), col("purchase_id"), col("click_id"))
  }

  /** Stream-static enrichment join — the most common production streaming
    * shape: each event joined to a bounded dimension table (customer
    * segment) that is NOT part of the stream. The static side re-plans per
    * micro-batch, so at dimension-table scale it broadcasts exactly like
    * the batch dim joins (q5/q10); no state, no watermark — the join is
    * stateless because only the stream side is unbounded. A left join
    * keeps events whose key has no dimension row (loud nulls beat silent
    * drops when the dim table lags the stream).
    */
  def enrich(events: DataFrame, customers: DataFrame): DataFrame =
    events.join(
      customers.select(col("c_custkey"), col("c_mktsegment")),
      col("user_id") === col("c_custkey"),
      "left")
      .select(col("event_id"), col("user_id"), col("event_type"), col("c_mktsegment"))

  /** Streaming exact dedup: drop replayed event ids while the watermark
    * allows a duplicate to still arrive — state is evicted once the
    * watermark passes, so dedup state stays bounded on an unbounded
    * stream (the streaming twin of `dedup_exact`).
    */
  def dedup(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("event_id")

  /** Running exact moments per event type — the streaming twin of
    * `graft.ops.Stats.moments`. The running state is the decimal-exact
    * (n, Σx, Σx², min, max) tuple, so after ANY micro-batch the emitted
    * moments equal the batch answer over the prefix consumed so far —
    * not merely at convergence. A global (unwindowed) aggregate keyed on
    * the low-cardinality event_type: state is a handful of rows, so no
    * watermark is needed and the query runs in complete output mode.
    */
  def moments(events: DataFrame): DataFrame =
    events
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n"),
        sum(col("value").cast("decimal(38,6)")).cast("double").as("sx"),
        sum((col("value") * col("value")).cast("decimal(38,6)")).cast("double").as("sxx"),
        min(col("value")).as("min_value"),
        max(col("value")).as("max_value"))
      .select(
        col("event_type"),
        col("n"),
        (col("sx") / col("n")).as("mean_value"),
        ((col("sxx") - col("sx") * col("sx") / col("n")) / (col("n") - lit(1.0)))
          .as("var_value"),
        sqrt((col("sxx") - col("sx") * col("sx") / col("n")) / (col("n") - lit(1.0)))
          .as("std_value"),
        col("min_value"),
        col("max_value"))

  /** Online 3-sigma anomaly detection — the streaming counterpart of
    * `graft.ops.Stats.anomaly3Sigma` with the causally-correct semantics
    * an unbounded stream forces: each event is z-scored against the
    * moments of the events BEFORE it (its type's running prefix), since a
    * stream can never see the final statistics the batch audit uses.
    * State per event type is three exact counters (count + scale-6
    * decimal-quantized Σv and Σv² as unscaled longs — `Math.addExact`
    * turns counter overflow into a loud failure, and the quantization is
    * the same decimal(38,6) discipline as every batch sum, so a batch
    * prefix-window twin reproduces the flags bit-for-bit). Emits each
    * type's cumulative (seen, flagged) after every micro-batch.
    *
    * Cross-batch exactness requires event-time-ordered delivery (a late
    * event would have been scored against a different prefix); like the
    * funnel, the operator enforces that contract loudly.
    */
  def onlineAnomalies(events: Dataset[Event]): Dataset[AnomalyCount] = {
    import events.sparkSession.implicits._

    def q6(v: Double): Long =
      java.math.BigDecimal.valueOf(v)
        .setScale(6, java.math.RoundingMode.HALF_UP)
        .unscaledValue().longValueExact()

    def fn(tpe: String, batch: Iterator[Event], state: GroupState[AnomalyState]): AnomalyCount = {
      var s = state.getOption.getOrElse(AnomalyState(0L, 0L, 0L, 0L, Long.MinValue))
      batch.toVector.sortBy(e => (tsMicros(e.ts), e.event_id)).foreach { e =>
        val us = tsMicros(e.ts)
        if (us < s.maxUs)
          throw new IllegalStateException(
            s"onlineAnomalies: out-of-order cross-batch delivery for type $tpe — " +
              "prefix z-scores require event-time-ordered batches")
        var flagged = s.nFlagged
        if (s.n >= 2) {
          // same expression order as the batch twin's window columns:
          // decimal sums surface as doubles, then plain IEEE arithmetic
          val sx   = java.math.BigDecimal.valueOf(s.sx6, 6).doubleValue()
          val sxx  = java.math.BigDecimal.valueOf(s.sxx6, 6).doubleValue()
          val n    = s.n.toDouble
          val mean = sx / n
          val std  = math.sqrt((sxx - sx * sx / n) / (n - 1.0))
          if (std > 0 && math.abs((e.value - mean) / std) > 3.0) flagged += 1
        }
        s = AnomalyState(
          s.n + 1,
          Math.addExact(s.sx6, q6(e.value)),
          Math.addExact(s.sxx6, q6(e.value * e.value)),
          flagged,
          math.max(s.maxUs, us))
      }
      state.update(s)
      AnomalyCount(tpe, s.n, s.nFlagged)
    }

    events
      .groupByKey(_.event_type)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout)(fn)
  }

  /** Streaming HyperLogLog — the mergeable-register property that makes
    * the batch sketch (`graft.ops.Sketches.hllDistinct`) a streaming
    * operator for free: state per event type is the 512-byte register
    * array, updated by pointwise max, so duplicate users across
    * micro-batches can never inflate it and delivery order is
    * irrelevant (max is a commutative idempotent monoid). The estimator
    * replays the batch side's arithmetic step for step — rank from the
    * leading-zero count (the JVM twin of `length(bin(w))`), the exact
    * integer harmonic sum scaled by 2^52, the same IEEE multiply/divide
    * chain, the same decimal(38,6) rounding — so once the stream drains,
    * the estimate equals the batch query BIT-FOR-BIT (spec-pinned).
    * Emits each type's running estimate after every micro-batch; state
    * is 512 bytes per type regardless of stream length.
    */
  def hllUsers(events: Dataset[Event]): Dataset[HllEstimate] = {
    import events.sparkSession.implicits._
    import graft.ops.Sketches.{HllAlpha, HllM, HllRankBits}

    def fn(tpe: String, batch: Iterator[Event], state: GroupState[HllRegs]): HllEstimate = {
      val st   = state.getOption.getOrElse(HllRegs(0L, new Array[Byte](HllM)))
      val regs = st.regs.clone()
      var n    = st.nSeen
      batch.foreach { e =>
        n += 1
        val h      = graft.functions.TextHash.hash60Jvm(e.user_id.toString)
        val bucket = (h >>> HllRankBits).toInt
        val w      = h & ((1L << HllRankBits) - 1)
        val rank =
          if (w == 0) HllRankBits + 1
          else HllRankBits + 1 - (64 - java.lang.Long.numberOfLeadingZeros(w))
        if (rank > regs(bucket)) regs(bucket) = rank.toByte
      }
      state.update(HllRegs(n, regs))
      var observed = 0
      var sumInt   = 0L
      var i        = 0
      while (i < HllM) {
        if (regs(i) > 0) observed += 1
        sumInt += 1L << (HllRankBits + 1 - regs(i))
        i += 1
      }
      val vZero = (HllM - observed).toLong
      val raw = HllAlpha * (HllM.toDouble * HllM) *
        math.pow(2.0, HllRankBits + 1) / sumInt.toDouble
      val est =
        if (raw <= 2.5 * HllM && vZero > 0) HllM.toDouble * math.log(HllM.toDouble / vZero)
        else raw
      val est6 = java.math.BigDecimal.valueOf(est)
        .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
      HllEstimate(tpe, n, vZero, est6)
    }

    events
      .groupByKey(_.event_type)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout)(fn)
  }

  /** Stateful per-(user, type) lifetime tracking — the streaming side
    * of `events_survival_km`: state per key is two longs (first/last
    * event micros), updated by min/max — commutative idempotent
    * monoids, so ANY delivery order and any batch split converge to
    * the same final state (the [[hllUsers]] argument; contrast the
    * order-ENFORCING attribution/funnel twins). Each micro-batch emits
    * the key's running lifetime; once the stream drains, the latest
    * row per key equals the batch per-(type, user) min/max aggregate
    * bit-for-bit, and feeding those lifetimes through the SAME
    * Kaplan-Meier fold (`Events.survivalKmFromLifetimes`) reproduces
    * the batch survival summary exactly — an incremental retention
    * curve whose state is 16 bytes per (user, type).
    */
  def lifetimes(events: Dataset[Event]): Dataset[Lifetime] = {
    import events.sparkSession.implicits._

    def fn(key: (Long, String), batch: Iterator[Event],
        state: GroupState[(Long, Long)]): Lifetime = {
      var (f, l) = state.getOption.getOrElse((Long.MaxValue, Long.MinValue))
      batch.foreach { e =>
        val us = tsMicros(e.ts)
        if (us < f) f = us
        if (us > l) l = us
      }
      state.update((f, l))
      Lifetime(key._1, key._2, f, l)
    }

    events
      .groupByKey(e => (e.user_id, e.event_type))
      .mapGroupsWithState(GroupStateTimeout.NoTimeout)(fn)
  }

  /** Stateful streaming funnel — the incremental twin of
    * `graft.ops.Events.funnel`: per user, a frontier state machine tracks
    * the earliest qualifying view/click/purchase times (strictly
    * increasing), emitting the user's current stage each update. Events
    * are sorted per batch like the sessionizer; across batches the
    * recurrence is only exact for event-time-ordered delivery (a late
    * view could retroactively qualify a click already discarded), so the
    * operator ENFORCES that contract — a cross-batch regression throws
    * instead of silently under-reporting stages. Feed it an event-time
    * sorted stream (e.g. watermark-reordered upstream). State per user is
    * four longs — bounded regardless of stream length.
    */
  def funnelStages(events: Dataset[Event]): Dataset[FunnelStage] = {
    import events.sparkSession.implicits._

    def fn(userId: Long, batch: Iterator[Event], state: GroupState[FunnelState]): FunnelStage = {
      val s0 = state.getOption
        .getOrElse(FunnelState(Long.MaxValue, Long.MaxValue, Long.MaxValue, Long.MinValue))
      var tv    = s0.tv
      var tc    = s0.tc
      var tp    = s0.tp
      var maxUs = s0.maxUs
      batch.toVector.sortBy(e => (tsMicros(e.ts), e.event_id)).foreach { e =>
        val us = tsMicros(e.ts)
        if (us < maxUs)
          throw new IllegalStateException(
            s"funnelStages: out-of-order cross-batch delivery for user $userId " +
              s"(event at $us µs after state advanced to $maxUs µs) — the frontier " +
              "recurrence requires event-time-ordered batches")
        maxUs = math.max(maxUs, us)
        e.event_type match {
          case "view"     => tv = math.min(tv, us)
          case "click"    => if (us > tv) tc = math.min(tc, us)
          case "purchase" => if (us > tc) tp = math.min(tp, us)
          case _          => ()
        }
      }
      state.update(FunnelState(tv, tc, tp, maxUs))
      val stage =
        if (tp != Long.MaxValue) 3
        else if (tc != Long.MaxValue) 2
        else if (tv != Long.MaxValue) 1
        else 0
      FunnelStage(userId, stage)
    }

    events
      .groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout)(fn)
  }

  /** Streaming last-touch attribution — the incremental twin of
    * `events_attribution`: per-user state is ONE (touch_type, touch_us)
    * pair (the batch window's `last(..., ignoreNulls)` frontier), so a
    * purchase is credited the moment it arrives, with constant state
    * per user regardless of history length. Emits one attributed
    * conversion row per purchase (Append mode); the per-channel rollup
    * is a plain downstream aggregation, and the spec pins the drained
    * rollup to the batch query bit-for-bit (same decimal value sums,
    * same exact-integer lag arithmetic).
    *
    * Like the funnel, cross-batch exactness requires event-time-ordered
    * delivery (a late touch would re-attribute an already-emitted
    * conversion); the operator enforces that contract loudly.
    */
  def attributeConversions(events: Dataset[Event]): Dataset[AttributedConv] = {
    import events.sparkSession.implicits._

    def fn(userId: Long, batch: Iterator[Event],
        state: GroupState[TouchState]): Iterator[AttributedConv] = {
      var s   = state.getOption.getOrElse(TouchState("", Long.MinValue, Long.MinValue))
      val out = Vector.newBuilder[AttributedConv]
      batch.toVector.sortBy(e => (tsMicros(e.ts), e.event_id)).foreach { e =>
        val us = tsMicros(e.ts)
        if (us < s.maxUs)
          throw new IllegalStateException(
            s"attributeConversions: out-of-order cross-batch delivery for user $userId — " +
              "last-touch attribution requires event-time-ordered batches")
        e.event_type match {
          case "view" | "click" | "signup" =>
            s = TouchState(e.event_type, us, math.max(s.maxUs, us))
          case "purchase" =>
            out += (if (s.tType.isEmpty)
              AttributedConv(userId, e.event_id, "direct", e.value, -1L)
            else
              AttributedConv(userId, e.event_id, s.tType, e.value, us - s.tUs))
            s = s.copy(maxUs = math.max(s.maxUs, us))
          case _ =>
            s = s.copy(maxUs = math.max(s.maxUs, us))
        }
      }
      state.update(s)
      out.result().iterator
    }

    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout)(fn)
  }

  /** Stateful sessionization via flatMapGroupsWithState with event-time
    * timeout — the streaming twin of `events_sessionize`: a session
    * closes when the watermark passes its end + gap.
    */
  def sessionize(events: Dataset[Event]): Dataset[Session] = {
    import events.sparkSession.implicits._
    val gapUs = SessionGapMinutes * 60L * 1000000L

    def fn(userId: Long, batch: Iterator[Event], state: GroupState[SessionState]): Iterator[Session] = {
      if (state.hasTimedOut) {
        val s   = state.get
        val out = Session(userId, s.startUs, s.endUs, s.n)
        state.remove()
        return Iterator.single(out)
      }
      val sorted = batch.toVector.sortBy(e => (tsMicros(e.ts), e.event_id))
      val closed = Vector.newBuilder[Session]
      var cur    = state.getOption
      sorted.foreach { e =>
        val us = tsMicros(e.ts)
        cur match {
          case Some(s) if us - s.endUs <= gapUs =>
            // min/max, not assignment: an in-watermark out-of-order event
            // must never move the session end backwards (it would diverge
            // from the batch answer and could set a timeout timestamp the
            // watermark has already passed, failing the query)
            cur = Some(SessionState(math.min(s.startUs, us), math.max(s.endUs, us), s.n + 1))
          case Some(s) =>
            closed += Session(userId, s.startUs, s.endUs, s.n)
            cur = Some(SessionState(us, us, 1))
          case None =>
            cur = Some(SessionState(us, us, 1))
        }
      }
      cur match {
        case Some(s) =>
          state.update(s)
          state.setTimeoutTimestamp(s.endUs / 1000L + SessionGapMinutes * 60L * 1000L)
        case None => ()
      }
      closed.result().iterator
    }

    events
      .withWatermark("ts", "30 minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(fn)
  }
}
