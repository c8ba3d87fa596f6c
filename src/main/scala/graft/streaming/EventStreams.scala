package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming pipelines over the events schema
  * (event_id, ts, user_id, event_type, value, props) — the streaming ingest
  * path for the engine (SURVEY §2.10 names this a stretch beyond reference
  * parity; the batch shapes are q19 and friends).
  *
  * All transforms are source-agnostic DataFrame→DataFrame functions: bind
  * them to `spark.readStream` (kafka/file/rate) in production or to a
  * MemoryStream in tests, and the same code runs batch when handed a static
  * DataFrame (tested both ways in EventStreamsSpec).
  *
  * Scale notes: watermark + windowed aggregation keeps state bounded by
  * (windows in flight × key cardinality); dedup state is bounded by the
  * watermark horizon; the sessionizer uses per-key timeout-driven state
  * eviction rather than unbounded buffers.
  */
object EventStreams {

  /** Tumbling 1-hour event-time windows with a 2-hour watermark: count +
    * sum(value) per (window, event_type). Append-mode capable: windows
    * close once the watermark passes. */
  def hourlyTypeCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum("value").as("sum_value"))
      .select(col("w.start").as("window_start"), col("event_type"), col("n"), col("sum_value"))

  /** Streaming exact dedup on event_id within the watermark horizon —
    * the streaming counterpart of q24 (late duplicates beyond the horizon
    * are dropped by definition of the watermark contract).
    * `dropDuplicatesWithinWatermark`, NOT `dropDuplicates(event_id)`: the
    * plain variant only evicts state when the event-time column is part of
    * the dedup key, so keyed on event_id alone its state store would grow
    * one entry per distinct id forever. */
  def dedupEvents(events: DataFrame): DataFrame =
    events.withWatermark("ts", "2 hours").dropDuplicatesWithinWatermark("event_id")

  /** Stream-stream interval join: clicks joined to the same user's
    * purchases within `windowSeconds` AFTER the click. Both sides carry
    * watermarks and the join condition bounds event-time distance, so
    * state on each side is evicted once the watermark passes the interval
    * — the only formulation where stream-stream join state stays bounded.
    * Works identically in batch (inner join with the same predicate). */
  def clickPurchaseJoin(clicks: DataFrame, purchases: DataFrame,
                        windowSeconds: Long = 3600): DataFrame = {
    val c = clicks.withWatermark("ts", "1 hour")
      .select(col("user_id"), col("event_id").as("click_id"), col("ts").as("click_ts"))
    val p = purchases.withWatermark("ts", "2 hours")
      .select(col("user_id").as("p_user_id"), col("event_id").as("purchase_id"),
        col("ts").as("purchase_ts"), col("value").as("purchase_value"))
    c.join(p,
      col("user_id") === col("p_user_id") &&
        col("purchase_ts") >= col("click_ts") &&
        col("purchase_ts") <= col("click_ts") + expr(s"INTERVAL $windowSeconds SECONDS"))
      .select("click_id", "user_id", "click_ts", "purchase_id", "purchase_ts", "purchase_value")
  }

  /** Stream-static enrichment: left-join the stream against a broadcast
    * dimension on `key`. The static side is re-resolved every micro-batch
    * (so a slowly-changing dimension table picks up updates between
    * batches) and broadcast — no stream-side shuffle, stateless, which is
    * what keeps enrichment viable at full ingest rate. */
  def enrich(events: DataFrame, dim: DataFrame, key: String): DataFrame =
    events.join(broadcast(dim), Seq(key), "left_outer")

  /** Declarative sessionization via the built-in `session_window` — the
    * Catalyst-native form of the 30-minute gap rule (same semantics as
    * [[graft.operators.EventOps.sessionize]]'s window formulation and the
    * stateful [[sessionize]] below). Works identically in batch and
    * streaming; under `readStream` add a watermark so closed sessions can
    * emit in append mode. Prefer this unless per-event emission or custom
    * state (the flatMapGroupsWithState path) is required. */
  def sessionWindows(events: DataFrame, gap: String = "30 minutes"): DataFrame =
    events
      .groupBy(session_window(col("ts"), gap).as("sw"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum("value").as("sum_value"))
      .select(col("user_id"), col("sw.start").as("session_start"),
        col("sw.end").as("session_end"), col("n_events"), col("sum_value"))

  final case class FunnelUpdate(userId: Long, stage: Int,
                                vUs: Long, cUs: Option[Long], pUs: Option[Long])
  // not `private`: the state encoder's generated code must access the class
  final case class FunnelState(vUs: Long, cUs: Long, pUs: Long) // -1 = unset

  /** Streaming funnel (the continuous counterpart of
    * [[graft.operators.PipelineOps.q56Funnel]]): per user, track first
    * view → first click at-or-after it → first purchase at-or-after that,
    * via `flatMapGroupsWithState`. Emits an update whenever a user's stage
    * advances (Append mode; suppress non-advancing batches).
    *
    * State is three longs per user — bounded by user cardinality, not
    * event volume; add a timeout eviction policy for abandonment-window
    * semantics in production. Rows are processed in event-time order
    * within each batch, so on a single batch (or in-order arrival) the
    * result matches the batch q56 exactly (asserted in EventStreamsSpec);
    * under cross-batch out-of-order arrival the funnel is best-effort by
    * design — a stage, once reached, is never retracted. */
  def funnel(spark: SparkSession, events: DataFrame): DataFrame = {
    import spark.implicits._
    val typed = events
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("us"))
      .as[(Long, String, Long)]
    typed.groupByKey(_._1)
      .flatMapGroupsWithState[FunnelState, FunnelUpdate](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (userId, rows, state: GroupState[FunnelState]) =>
          var st = state.getOption.getOrElse(FunnelState(-1L, -1L, -1L))
          val before = st
          // secondary sort by funnel-stage priority: the batch q56 accepts
          // click/purchase at us >= the prior stage's us (inclusive), so on
          // a timestamp TIE the earlier stage must be applied first or the
          // later-stage event is silently dropped
          val stageRank = Map("view" -> 0, "click" -> 1, "purchase" -> 2)
          rows.toVector.sortBy(r => (r._3, stageRank.getOrElse(r._2, 3))).foreach { case (_, et, us) =>
            if (et == "view" && st.vUs < 0) st = st.copy(vUs = us)
            else if (et == "click" && st.vUs >= 0 && st.cUs < 0 && us >= st.vUs)
              st = st.copy(cUs = us)
            else if (et == "purchase" && st.cUs >= 0 && st.pUs < 0 && us >= st.cUs)
              st = st.copy(pUs = us)
          }
          if (st == before) Iterator.empty
          else {
            state.update(st)
            val stage = 1 + (if (st.cUs >= 0) 1 else 0) + (if (st.pUs >= 0) 1 else 0)
            Iterator(FunnelUpdate(userId, stage, st.vUs,
              Option(st.cUs).filter(_ >= 0), Option(st.pUs).filter(_ >= 0)))
          }
      }.toDF()
  }

  final case class SessionUpdate(userId: Long, nEvents: Long, totalValue: Double,
                                 startMs: Long, endMs: Long, closed: Boolean)
  private final case class SessionState(nEvents: Long, totalValue: Double,
                                        startMs: Long, endMs: Long)

  /** Per-user session aggregation with a 30-minute inactivity gap, via
    * `flatMapGroupsWithState` (the custom-state path, SURVEY §2.10 /
    * builder prompt). Emits a closed session when the gap elapses. */
  def sessionize(spark: SparkSession, events: DataFrame): DataFrame = {
    import spark.implicits._
    val typed = events.select(col("user_id"), col("ts").cast("long").as("tsSec"), col("value"))
      .as[(Long, Long, Double)]
    typed.groupByKey(_._1)
      .flatMapGroupsWithState[SessionState, SessionUpdate](
        OutputMode.Append(), GroupStateTimeout.ProcessingTimeTimeout()) {
        case (userId, rows, state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(SessionUpdate(userId, s.nEvents, s.totalValue, s.startMs, s.endMs, closed = true))
          } else {
            val sorted = rows.toVector.sortBy(_._2)
            var st = state.getOption.getOrElse(SessionState(0, 0.0, sorted.head._2 * 1000, sorted.head._2 * 1000))
            val out = Vector.newBuilder[SessionUpdate]
            sorted.foreach { case (_, tsSec, v) =>
              val tsMs = tsSec * 1000
              if (st.nEvents > 0 && tsMs - st.endMs > 30 * 60 * 1000) {
                out += SessionUpdate(userId, st.nEvents, st.totalValue, st.startMs, st.endMs, closed = true)
                st = SessionState(0, 0.0, tsMs, tsMs)
              }
              st = SessionState(st.nEvents + 1, st.totalValue + v, st.startMs, tsMs)
            }
            state.update(st)
            state.setTimeoutDuration("30 minutes")
            out += SessionUpdate(userId, st.nEvents, st.totalValue, st.startMs, st.endMs, closed = false)
            out.result().iterator
          }
      }.toDF()
  }
}
