package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Per-key open-session accumulator for StreamOps.sessionize. Top-level and
  * public: the state encoder's generated code instantiates it reflectively. */
case class SessionState(n: Long, fare: Double, startMs: Long, lastMs: Long)

/** Per-user funnel state for StreamOps.conversionFunnel: the most recent
  * view's event-time in MICROseconds (ms would silently truncate the
  * fixture's micro timestamps and break batch/stream parity). */
case class FunnelState(lastViewUs: Long)

/** Per-key running-moment state for StreamOps.anomalyFlags: count, sum,
  * and sum of squares — O(1) per key, accumulated in arrival order so the
  * batch twin's running-window fold reproduces it bit-for-bit. */
case class AnomalyState(n: Long, sum: Double, sumsq: Double)

/** One flagged event from StreamOps.anomalyFlags. */
case class AnomalyFlag(event_type: String, event_id: Long, value: Double,
    n_before: Long, z: Double)

/** Per-key CDC state for StreamOps.cdcApplyStream: the winning (ts, id)
  * order key with its op/value, plus the lifetime op count. */
case class CdcKeyState(tsUs: Long, eid: Long, op: String, value: Double,
    nOps: Long)

/** One current-state emission from StreamOps.cdcApplyStream. */
case class CdcRow(user_id: Long, last_op: String, value: Double, n_ops: Long)

/** Per-window Misra–Gries counter state for StreamOps.topKPerWindow:
  * parallel key/count arrays (a Map column would need a custom encoder),
  * never longer than the counter budget m. */
case class TopKState(keys: Seq[String], counts: Seq[Long])

/** Per-key signed aggregate state: exact-integer (n_rows, sum_v). */
case class SignedState(nRows: Long, sumV: Long)
case class SignedStateRow(key: String, n_rows: Long, sum_v: Long)

/** Per-key open SCD2 version for StreamOps.scd2Stream: the currently
  * valid (from, id, attrs) triple awaiting its successor. */
case class Scd2KeyState(tsUs: Long, eid: Long, attrs: String)

/** One SCD2 dimension row emission from StreamOps.scd2Stream. */
case class Scd2Row(key: String, valid_from_us: Long, eid: Long,
    attrs: String, valid_to_us: Option[Long], is_current: Boolean)

/** Streaming operators beyond the reference's surface (SURVEY.md §2.4
  * lists these as absent there): sliding & session event-time windows,
  * watermark-bounded streaming dedup, stream-static enrichment joins, and
  * custom sessionization state via flatMapGroupsWithState. All are
  * standard Structured Streaming building blocks — state is always
  * watermark-bounded so they hold at unbounded input. */
object StreamOps {

  /** Overlapping (sliding) event-time windows: window(duration, slide).
    * slide < duration ⇒ each event lands in duration/slide windows. */
  def slidingMetrics(df: DataFrame, timeCol: String, keyCol: String,
      valueCol: String, duration: String, slide: String, lateness: String,
      streaming: Boolean): DataFrame = {
    val src = if (streaming) df.withWatermark(timeCol, lateness) else df
    src.groupBy(window(col(timeCol), duration, slide), col(keyCol))
      .agg(count(lit(1)).as("n_events"), avg(col(valueCol)).as("avg_fare"))
      .select(col(keyCol), col("n_events"), col("avg_fare"),
        col("window.start").as("window_start"), col("window.end").as("window_end"))
  }

  /** APPEND-mode windowed aggregate — W3's complement (the reference
    * runs update mode, streaming_job.py:129; append is the mode most
    * production sinks accept): each (window × key) aggregate is emitted
    * EXACTLY ONCE, when the watermark passes the window's end, and
    * never revised. Streaming form: watermark → tumbling window × key →
    * count/avg, run with `outputMode("append")` — Spark finalizes a
    * window when watermark ≥ window.end. Batch twin (the gated form,
    * plan-identical above the closure filter): the same aggregate
    * restricted to CLOSED windows, window_end + lateness ≤ max(event
    * time) — the final watermark of a drained stream — so the twin's
    * rows are exactly the set the append stream has emitted once the
    * last epoch's watermark advances. Exactly-once across epochs is
    * pinned in StreamingSpec.
    *
    * Scale shape: one map-side-combined keyed aggregate; the closure
    * filter joins a broadcast 1-row max — nothing corpus-sized past
    * the aggregate; streaming state is bounded by OPEN windows only
    * (append mode frees a window's state at emission). */
  def appendCloseWindows(df: DataFrame, timeCol: String, keyCol: String,
      idCol: String, valueCol: String, duration: String, lateness: String,
      streaming: Boolean): DataFrame = {
    def agg(src: DataFrame): DataFrame = src
      .groupBy(window(col(timeCol), duration), col(keyCol))
      .agg(count(col(idCol)).as("total_trips"),
        avg(col(valueCol)).as("average_fare"))
      .select(col(keyCol), col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("total_trips"), col("average_fare"))
    if (streaming) agg(df.withWatermark(timeCol, lateness))
    else {
      val wm = broadcast(df.agg(max(col(timeCol)).as("__maxts")))
      agg(df).crossJoin(wm)
        .filter(col("window_end") + expr(s"INTERVAL $lateness") <=
          col("__maxts"))
        .drop("__maxts")
    }
  }

  /** Session windows: events within `gap` of each other merge into one
    * session per key (built-in session_window — state merges adjacent
    * sessions and closes them once the watermark passes the gap). */
  def sessionMetrics(df: DataFrame, timeCol: String, keyCol: String,
      valueCol: String, gap: String, lateness: String, streaming: Boolean): DataFrame = {
    val src = if (streaming) df.withWatermark(timeCol, lateness) else df
    src.groupBy(session_window(col(timeCol), gap), col(keyCol))
      .agg(count(lit(1)).as("n_events"), sum(col(valueCol)).as("session_fare"))
      .select(col(keyCol), col("n_events"), col("session_fare"),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"))
  }

  /** Windowed mergeable quantile sketch over a stream: per (event-time
    * window, bucket) counts with bucket = floor(value / width) — the
    * fixed-grid dyadic histogram (Profile.quantileSketch) as a streaming
    * aggregation. Counts are ALGEBRAIC, so partial aggregation, state
    * updates, and window merges are all plain addition (the sketch's
    * exactly-associative merge is what makes it streaming-legal), and
    * state per window is bounded by OCCUPIED BUCKETS (<= universe/width),
    * never by row count — the property that lets a 100 TB/day stream keep
    * per-window quantile state in memory. Read quantiles from the emitted
    * state with [[graft.ops.Profile.quantilesFromSketchBy]]. */
  def quantileSketchStream(df: DataFrame, timeCol: String, value: Column,
      width: Long, duration: String, lateness: String,
      streaming: Boolean): DataFrame = {
    require(width >= 1, "width >= 1")
    val src = if (streaming) df.withWatermark(timeCol, lateness) else df
    src.select(col(timeCol), value.cast("long").as("__v"))
      .select(col(timeCol),
        ((col("__v") - pmod(col("__v"), lit(width))) / lit(width))
          .cast("long").as("bucket"))
      .groupBy(window(col(timeCol), duration), col("bucket"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"), col("bucket"), col("cnt"))
  }

  /** Streaming exact dedup on an id column with watermark-bounded state
    * (`dropDuplicatesWithinWatermark`): duplicates arriving within the
    * lateness bound are suppressed; state for older ids is evicted. On a
    * batch frame falls back to plain dropDuplicates (same semantics when
    * the input is finite). */
  def dedupStream(df: DataFrame, timeCol: String, idCol: String,
      lateness: String, streaming: Boolean): DataFrame =
    if (streaming)
      df.withWatermark(timeCol, lateness).dropDuplicatesWithinWatermark(Seq(idCol))
    else df.dropDuplicates(Seq(idCol))

  /** Streaming near-duplicate suppression for document streams: a doc
    * whose full 64-permutation MinHash signature equals an earlier doc's
    * within the watermark is dropped (64/64 agreeing minima ⇒ Jaccard ≈ 1
    * — re-posts, boilerplate, trivial edits of whitespace-identical
    * token streams). State = one 64-bit signature hash per distinct doc
    * inside the watermark, evicted like any streaming-dedup key. Softer
    * thresholds (banded LSH) belong offline, where candidates can be
    * exactly verified — a stream can't retract an already-emitted doc. */
  def nearDupDedupStream(docs: DataFrame, timeCol: String, textCol: String,
      lateness: String, streaming: Boolean, shingleSize: Int = 3): DataFrame = {
    val sig = graft.functions.textnative.text_minhash(
      col(textCol), shingleSize, graft.ops.Dedup.hashFamily(64), (1L << 31) - 1)
    val keyed = docs.withColumn("__sig_key", xxhash64(sig))
    dedupStream(keyed, timeCol, "__sig_key", lateness, streaming).drop("__sig_key")
  }

  /** Stream-static enrichment join: the static dim is broadcast per
    * micro-batch (no state, no shuffle of the stream). */
  def enrich(stream: DataFrame, dim: DataFrame, key: String): DataFrame =
    stream.join(broadcast(dim), Seq(key), "left")

  /** Per-window approximate distinct counting via mergeable DataSketches
    * HLL — the streaming cardinality monitor (distinct users per window)
    * whose state per open window is ONE sketch (~2^lgK bytes), not the
    * key set a windowed countDistinct would hold. The same call is the
    * batch twin (`streaming = false`); below sketch saturation (sparse
    * mode) the estimate is EXACT, which is what the parity test pins.
    * countDistinct itself is unsupported in streaming aggregation — the
    * sketch form is the 100 TB (and the only) shape. */
  def distinctPerWindow(df: DataFrame, timeCol: String, keyCol: String,
      duration: String, lateness: String, streaming: Boolean): DataFrame = {
    val base = if (streaming) df.withWatermark(timeCol, lateness) else df
    base.groupBy(window(col(timeCol), duration))
      .agg(hll_sketch_estimate(hll_sketch_agg(col(keyCol)))
          .as("approx_distinct"),
        count(lit(1)).as("n_events"))
      .select(col("window.start").as("window_start"),
        col("approx_distinct"), col("n_events"))
  }

  /** Stream-stream (or batch-batch) interval join: left rows paired with
    * right rows of the same key whose time lies in
    * [left.time - maxDelaySec, left.time] — the attribution/correlation
    * join. In streaming both sides carry a watermark and the join
    * condition bounds the time range, so each side's buffered state is
    * evicted once the other side's watermark passes `maxDelay + lateness`
    * — state stays bounded at unbounded input; the executed join is a
    * key-equality shuffle with a range predicate, never a cross product.
    * Column names must be disjoint apart from the key (pre-alias).
    *
    * `joinType` extends the same plan to `left_outer`: a left row with no
    * in-range partner is emitted with nulls — in streaming, only once the
    * right watermark has passed the row's whole candidate interval (the
    * point at which "no partner yet" becomes "no partner ever"), which is
    * exactly why the outer side REQUIRES the event-time range condition:
    * it bounds when the null verdict is safe to emit. */
  def intervalJoin(left: DataFrame, right: DataFrame, keyCol: String,
      leftTimeCol: String, rightTimeCol: String, maxDelaySec: Long,
      lateness: String, streaming: Boolean,
      joinType: String = "inner"): DataFrame = {
    val (l, r) =
      if (streaming)
        (left.withWatermark(leftTimeCol, lateness),
          right.withWatermark(rightTimeCol, lateness))
      else (left, right)
    l.join(r,
      l(keyCol) === r(keyCol) &&
        r(rightTimeCol) >= l(leftTimeCol) - expr(s"INTERVAL $maxDelaySec SECONDS") &&
        r(rightTimeCol) <= l(leftTimeCol),
      joinType)
      .drop(r(keyCol))
  }

  /** One closed trip session per (key) burst of activity. */
  case class TripSession(city: String, n_trips: Long, total_fare: Double,
      session_start: java.sql.Timestamp, session_end: java.sql.Timestamp)

  /** Custom sessionization with explicit state (flatMapGroupsWithState,
    * event-time timeout): demonstrates arbitrary per-key state where the
    * built-in session_window's merge semantics don't fit (e.g. emitting
    * only on session close). State is dropped via event-time timeout tied
    * to the watermark — bounded at scale. */
  def sessionize(spark: SparkSession, events: DataFrame, gapMs: Long): Dataset[TripSession] = {
    import spark.implicits._
    val typed = events
      .select(col("city"), col("event_timestamp").cast("timestamp").as("ts"),
        col("fare_amount"))
      .withWatermark("ts", "10 minutes")
      .as[(String, java.sql.Timestamp, Double)]

    typed.groupByKey(_._1).flatMapGroupsWithState(
      OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
      (city: String, rows: Iterator[(String, java.sql.Timestamp, Double)],
       state: GroupState[SessionState]) =>
        if (state.hasTimedOut) {
          val s = state.get
          state.remove()
          Iterator.single(TripSession(city, s.n, s.fare,
            new java.sql.Timestamp(s.startMs), new java.sql.Timestamp(s.lastMs)))
        } else {
          val sorted = rows.toSeq.sortBy(_._2.getTime)
          var closed = List.empty[TripSession]
          var cur = state.getOption
          sorted.foreach { case (_, ts, fare) =>
            val t = ts.getTime
            cur match {
              case Some(s) if t - s.lastMs <= gapMs =>
                cur = Some(s.copy(n = s.n + 1, fare = s.fare + fare, lastMs = t))
              case Some(s) =>
                closed ::= TripSession(city, s.n, s.fare,
                  new java.sql.Timestamp(s.startMs), new java.sql.Timestamp(s.lastMs))
                cur = Some(SessionState(1, fare, t, t))
              case None =>
                cur = Some(SessionState(1, fare, t, t))
            }
          }
          cur.foreach { s =>
            state.update(s)
            state.setTimeoutTimestamp(s.lastMs + gapMs)
          }
          closed.reverseIterator
        }
    }
  }

  /** One view→purchase conversion. */
  case class Conversion(user_id: Long, purchase_id: Long,
      view_ts: java.sql.Timestamp, purchase_ts: java.sql.Timestamp,
      latency_s: Double)

  private def tsMicros(ts: java.sql.Timestamp): Long =
    ts.getTime / 1000 * 1000000L + ts.getNanos / 1000

  /** One ranked heavy-hitter row for [[topKPerWindow]]. */
  case class TopKRow(window_start: java.sql.Timestamp, key: String,
      cnt: Long, rnk: Long)

  /** Per-window top-k heavy hitters. Batch form: exact — tumbling-window
    * counts ranked (count desc, key asc), rank ≤ k. Streaming form: one
    * Misra–Gries counter set of budget `m` per OPEN window held in
    * flatMapGroupsWithState keyed by the window, emitted as a final
    * ranked top-k when the watermark closes the window (append-mode —
    * dashboards get one immutable row set per window).
    *
    * The MG sketch is why this holds at 100 TB/unbounded key domains:
    * per-window state is ≤ m counters REGARDLESS of key cardinality
    * (a windowed groupBy count holds every distinct key in state), at
    * the standard price — surviving counts are undercounts by at most
    * N/m and any key with true frequency > N/m is guaranteed present.
    * With m ≥ the window's distinct-key count the sketch never sheds
    * and the streaming output equals the batch twin exactly
    * (StreamingSpec pins both regimes). */
  /** Streaming CDC apply — the continuously-maintained current table the
    * batch [[graft.ops.Profile.cdcApply]] computes at rest: per-key state
    * holds only the winning (ts, id) order key, its op/value, and the
    * lifetime op count (O(1) per key; bounded by key cardinality like
    * the accumulated-metrics upsert). Each batch emits every touched
    * key's NEW current row in update mode — delete ops emit a
    * `last_op = "D"` tombstone so a downstream upsert sink can drop the
    * key; filtering tombstones from the latest emissions reproduces the
    * batch operator's output exactly (StreamingSpec pins it). The
    * max-by-(ts,id) merge is order-insensitive, so late-arriving rows
    * WITHIN the retained state never corrupt the winner — unlike a
    * last-writer-wins sink. */
  def cdcApplyStream(log: DataFrame, keyCol: String, opCol: String,
      tsCol: String, idCol: String, valueCol: String): DataFrame = {
    val spark = log.sparkSession
    import spark.implicits._
    val typed = log.select(col(keyCol).cast("long").as("k"),
        col(opCol).cast("string").as("op"),
        col(tsCol).cast("timestamp").as("ts"),
        col(idCol).cast("long").as("id"),
        col(valueCol).cast("double").as("v"))
      .as[(Long, String, java.sql.Timestamp, Long, Double)]
    typed.groupByKey(_._1).flatMapGroupsWithState(
      OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
      (key: Long, rows: Iterator[(Long, String, java.sql.Timestamp, Long, Double)],
       state: GroupState[CdcKeyState]) =>
        var st = state.getOption
          .getOrElse(CdcKeyState(Long.MinValue, Long.MinValue, "", 0.0, 0L))
        rows.foreach { case (_, op, ts, id, v) =>
          val us = tsMicros(ts)
          val wins = us > st.tsUs || (us == st.tsUs && id > st.eid)
          st =
            if (wins) CdcKeyState(us, id, op, v, st.nOps + 1)
            else st.copy(nOps = st.nOps + 1)
        }
        state.update(st)
        Iterator.single(CdcRow(key, st.op, st.value, st.nOps))
    }.toDF()
  }

  /** Signed (retractable) aggregate state maintained over a CHANGELOG
    * stream — the reference's S5 "maintained state" intent
    * (streaming_job.py:37-58) extended to retractions at the engine's
    * signed-state algebra ([[graft.ops.Profile.signedAggState]]): each
    * row carries op I/D; per key the state folds (n_rows, sum_v) with
    * sign +1/−1 in exact integers. The streaming form keeps the O(1)
    * per-key state in GroupState and emits the key's NEW ABSOLUTE state
    * per touched key per batch (update mode) — absolute, not a delta,
    * so the downstream upsert sink's keyed REPLACE is idempotent under
    * foreachBatch replay by construction (no ON CONFLICT accumulate
    * quirk to reproduce); a key whose rows net to zero emits a
    * tombstone (n_rows = 0) the sink deletes on. The batch twin is one
    * map-side-combinable signed aggregation of the same arithmetic;
    * StreamingSpec pins batch/streaming parity and sink replay.
    * Returns (key, n_rows, sum_v), batch mode dropping netted-out keys
    * exactly as [[graft.ops.Profile.mergeAggStates]] does. */
  def signedAggStream(log: DataFrame, keyCol: String, opCol: String,
      value: Column, streaming: Boolean): DataFrame = {
    if (!streaming) {
      log.select(col(keyCol).cast("string").as("key"),
          when(col(opCol) === "D", lit(-1L)).otherwise(lit(1L)).as("__s"),
          value.cast("long").as("__v"))
        .groupBy(col("key"))
        .agg(sum(col("__s")).as("n_rows"),
          sum(col("__v") * col("__s")).as("sum_v"))
        .filter(col("n_rows") > 0)
    } else {
      val spark = log.sparkSession
      import spark.implicits._
      val typed = log.select(col(keyCol).cast("string").as("key"),
          col(opCol).cast("string").as("op"),
          value.cast("long").as("v"))
        .as[(String, String, Long)]
      typed.groupByKey(_._1).flatMapGroupsWithState(
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (key: String, rows: Iterator[(String, String, Long)],
         state: GroupState[SignedState]) =>
          var st = state.getOption.getOrElse(SignedState(0L, 0L))
          rows.foreach { case (_, op, v) =>
            val s = if (op == "D") -1L else 1L
            st = SignedState(st.nRows + s, st.sumV + s * v)
          }
          state.update(st)
          Iterator.single(SignedStateRow(key, st.nRows, st.sumV))
      }.toDF()
    }
  }

  /** Streaming SCD2 (slowly-changing-dimension type 2) maintenance — the
    * reference's S5 "maintained state in the sink" intent lifted from
    * running totals to full dimension HISTORY: every attribute version
    * becomes a (valid_from, valid_to, is_current) row; a new version
    * CLOSES the previous open row and opens its own. The streaming side
    * keeps one open version per key in GroupState and emits, per batch,
    * the closed predecessors plus the (re-)opened current row — update-
    * mode emissions a sink reconciles by replacing on (key, valid_from,
    * id), the stream_signed_state replace discipline (a version once
    * closed never reopens, so closed beats open at equal keys and
    * replays are idempotent). Within a batch rows are applied in
    * (ts, id) order; across batches arrival must respect that order per
    * key (the [[anomalyFlags]] convention under which batch and stream
    * twins agree exactly — SCD2 history is order-defined, so an
    * out-of-order changelog is a data bug upstream, not a merge case).
    *
    * The batch twin is one per-key window pass (lead over (ts, id)) —
    * [[graft.ops.Profile.scd2]] on the compacted changelog, restated on
    * micros + a packed attrs string so both twins share one schema.
    * State is O(1) per key (the open version only), bounded by key
    * cardinality, never by stream length. */
  def scd2Stream(log: DataFrame, keyCol: String, tsUsCol: String,
      idCol: String, attrsCol: String, streaming: Boolean): DataFrame = {
    if (!streaming) {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("key"))
        .orderBy(col("valid_from_us"), col("eid"))
      log.select(col(keyCol).cast("string").as("key"),
          col(tsUsCol).cast("long").as("valid_from_us"),
          col(idCol).cast("long").as("eid"),
          col(attrsCol).cast("string").as("attrs"))
        .withColumn("valid_to_us", lead(col("valid_from_us"), 1).over(w))
        .withColumn("is_current", col("valid_to_us").isNull)
    } else {
      val spark = log.sparkSession
      import spark.implicits._
      val typed = log.select(col(keyCol).cast("string").as("key"),
          col(tsUsCol).cast("long").as("ts_us"),
          col(idCol).cast("long").as("eid"),
          col(attrsCol).cast("string").as("attrs"))
        .as[(String, Long, Long, String)]
      typed.groupByKey(_._1).flatMapGroupsWithState(
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (key: String, rows: Iterator[(String, Long, Long, String)],
         state: GroupState[Scd2KeyState]) =>
          var open = state.getOption
          val out = scala.collection.mutable.ArrayBuffer.empty[Scd2Row]
          rows.toSeq.sortBy(r => (r._2, r._3)).foreach {
            case (_, ts, eid, attrs) =>
              open.foreach { p =>
                out += Scd2Row(key, p.tsUs, p.eid, p.attrs, Some(ts),
                  is_current = false)
              }
              open = Some(Scd2KeyState(ts, eid, attrs))
          }
          open.foreach { p =>
            state.update(p)
            out += Scd2Row(key, p.tsUs, p.eid, p.attrs, None,
              is_current = true)
          }
          out.iterator
      }.toDF()
    }
  }

  /** Running-profile anomaly detection: flag an event whose value sits
    * more than `threshold` sample standard deviations from its key's
    * running mean — computed over STRICTLY PRECEDING events only, so a
    * flag never depends on data after the event (the online-scoring
    * semantics; a global z-score like ts_zscore would let the future
    * vouch for the past).
    *
    * Batch and streaming twins share the identical arithmetic: the batch
    * side folds (n, Σv, Σv²) with a running window in (time, id) order;
    * the streaming side accumulates the SAME three numbers per key in
    * GroupState in the same order, so when batches arrive time-ordered
    * the outputs agree bit-for-bit (StreamingSpec pins it). State is
    * O(1) per key and deliberately un-expiring: a key's value profile is
    * lifetime state like the accumulated-metrics upsert, not
    * window state — bounded by key cardinality, not stream length. */
  def anomalyFlags(events: DataFrame, timeCol: String, keyCol: String,
      idCol: String, valueCol: String, threshold: Double, minN: Long,
      streaming: Boolean): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    if (!streaming) {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col(keyCol))
        .orderBy(col(timeCol), col(idCol))
        .rowsBetween(Window.unboundedPreceding, -1)
      events
        .withColumn("n_before", count(col(valueCol)).over(w))
        .withColumn("__s", sum(col(valueCol)).over(w))
        .withColumn("__ss", sum(col(valueCol) * col(valueCol)).over(w))
        .filter(col("n_before") >= minN)
        .withColumn("__mean", col("__s") / col("n_before"))
        .withColumn("__var", (col("__ss") - col("__s") * col("__s") / col("n_before"))
          / (col("n_before") - 1))
        .filter(col("__var") > 0)
        .withColumn("z", round((col(valueCol) - col("__mean")) / sqrt(col("__var")), 6))
        .filter(abs(col("z")) > threshold)
        .select(col(keyCol).as("event_type"), col(idCol).as("event_id"),
          col(valueCol).as("value"), col("n_before"), col("z"))
    } else {
      val typed = events.select(col(keyCol).cast("string").as("k"),
          col(idCol).cast("long").as("id"),
          col(timeCol).cast("timestamp").as("ts"),
          col(valueCol).cast("double").as("v"))
        .as[(String, Long, java.sql.Timestamp, Double)]
      typed.groupByKey(_._1).flatMapGroupsWithState(
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (key: String, rows: Iterator[(String, Long, java.sql.Timestamp, Double)],
         state: GroupState[AnomalyState]) =>
          val sorted = rows.toSeq.sortBy(r => (tsMicros(r._3), r._2))
          var st = state.getOption.getOrElse(AnomalyState(0L, 0.0, 0.0))
          val out = Seq.newBuilder[AnomalyFlag]
          sorted.foreach { case (_, id, _, v) =>
            if (st.n >= minN) {
              val mean = st.sum / st.n
              val vr = (st.sumsq - st.sum * st.sum / st.n) / (st.n - 1)
              if (vr > 0) {
                // same rounding as the batch twin's round(x, 6)
                val z = BigDecimal(java.lang.Double.toString(
                    (v - mean) / math.sqrt(vr)))
                  .setScale(6, scala.math.BigDecimal.RoundingMode.HALF_UP)
                  .toDouble
                if (math.abs(z) > threshold) out += AnomalyFlag(key, id, v, st.n, z)
              }
            }
            st = AnomalyState(st.n + 1, st.sum + v, st.sumsq + v * v)
          }
          state.update(st)
          out.result().iterator
      }.toDF()
    }
  }

  def topKPerWindow(df: DataFrame, timeCol: String, keyCol: String,
      duration: String, k: Int, m: Int, lateness: String,
      streaming: Boolean): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    if (!streaming) {
      import org.apache.spark.sql.expressions.Window
      val rk = Window.partitionBy(col("w"))
        .orderBy(col("cnt").desc, col("key"))
      df.groupBy(window(col(timeCol), duration).as("w"),
          col(keyCol).cast("string").as("key"))
        .agg(count(lit(1)).as("cnt"))
        .withColumn("rnk", row_number().over(rk).cast("long"))
        .filter(col("rnk") <= k)
        .select(col("w.start").as("window_start"), col("key"), col("cnt"),
          col("rnk"))
    } else {
      // the watermark tag rides the raw time column, not the extracted
      // window fields — keep it in the Dataset so EventTimeTimeout
      // resolves (the lambda never reads it)
      val typed = df
        .withWatermark(timeCol, lateness)
        .select(window(col(timeCol), duration).as("w"),
          col(keyCol).cast("string").as("key"), col(timeCol))
        .select(col("w.start").as("ws"), col("w.end").as("we"), col("key"),
          col(timeCol))
        .as[(java.sql.Timestamp, java.sql.Timestamp, String, java.sql.Timestamp)]
      typed.groupByKey(r => (tsMicros(r._1), tsMicros(r._2)))
        .flatMapGroupsWithState(
          OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
          (win: (Long, Long),
           rows: Iterator[(java.sql.Timestamp, java.sql.Timestamp, String,
             java.sql.Timestamp)],
           state: GroupState[TopKState]) =>
            if (state.hasTimedOut) {
              val st = state.getOption.getOrElse(TopKState(Nil, Nil))
              state.remove()
              val ws = java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(
                win._1 / 1000000L, win._1 % 1000000L * 1000))
              st.keys.zip(st.counts)
                .sortBy { case (key, c) => (-c, key) }.take(k)
                .zipWithIndex.iterator
                .map { case ((key, c), i) => TopKRow(ws, key, c, i + 1L) }
            } else {
              val cnt = scala.collection.mutable.LinkedHashMap[String, Long]()
              state.getOption.foreach(st =>
                st.keys.zip(st.counts).foreach { case (key, c) => cnt(key) = c })
              rows.foreach { r =>
                val key = r._3
                if (cnt.contains(key)) cnt(key) += 1
                else if (cnt.size < m) cnt(key) = 1
                else {
                  // Misra–Gries shed: decrement every counter, drop zeros
                  cnt.keys.toSeq.foreach { k2 =>
                    val c = cnt(k2) - 1
                    if (c == 0) cnt.remove(k2) else cnt(k2) = c
                  }
                }
              }
              state.update(TopKState(cnt.keys.toSeq, cnt.values.toSeq))
              // fire once the watermark passes the window end
              state.setTimeoutTimestamp(win._2 / 1000)
              Iterator.empty
            }
        }.toDF()
    }
  }

  /** Cross-event-type state machine: each purchase is attributed to the
    * user's most recent PRECEDING view within `maxDelaySec` — the
    * conversion-funnel operator (where [[sessionize]] demonstrates
    * same-type burst state, this keeps state ACROSS event types).
    *
    * Batch form: one window pass per user — running max of view
    * timestamps over (ts, event_id) order, strictly-preceding frame.
    * Streaming form: flatMapGroupsWithState holds one timestamp per user
    * (the last view), emits a conversion per qualifying purchase, and
    * drops state via event-time timeout `maxDelaySec` past the last view
    * — after that no purchase can use it, so state is watermark-bounded:
    * |users active within the horizon| entries, independent of stream
    * length. Both paths order ties by (ts, event_id), so they agree
    * row-for-row on an in-order feed (StreamingSpec pins the parity).
    *
    * A view is NOT consumed by a conversion: two purchases after one
    * view both attribute to it (the window form has the same semantics
    * by construction). */
  def conversionFunnel(events: DataFrame, timeCol: String, userCol: String,
      idCol: String, typeCol: String, maxDelaySec: Long, lateness: String,
      streaming: Boolean): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    if (!streaming) {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col(userCol))
        .orderBy(col(timeCol), col(idCol))
        .rowsBetween(Window.unboundedPreceding, -1)
      val lastView = max(when(col(typeCol) === "view", col(timeCol))).over(w)
      events
        .withColumn("__view_ts", lastView)
        .filter(col(typeCol) === "purchase" && col("__view_ts").isNotNull &&
          col(timeCol).cast("double") - col("__view_ts").cast("double") <= maxDelaySec)
        .select(col(userCol).as("user_id"), col(idCol).as("purchase_id"),
          col("__view_ts").as("view_ts"), col(timeCol).as("purchase_ts"),
          (col(timeCol).cast("double") - col("__view_ts").cast("double")).as("latency_s"))
    } else {
      val typed = events
        .select(col(userCol).cast("long").as("user_id"),
          col(idCol).cast("long").as("event_id"),
          col(timeCol).cast("timestamp").as("ts"),
          col(typeCol).cast("string").as("event_type"))
        .withWatermark("ts", lateness)
        .as[(Long, Long, java.sql.Timestamp, String)]
      typed.groupByKey(_._1).flatMapGroupsWithState(
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (user: Long, rows: Iterator[(Long, Long, java.sql.Timestamp, String)],
         state: GroupState[FunnelState]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val sorted = rows.toSeq.sortBy(r => (tsMicros(r._3), r._2))
            var out = List.empty[Conversion]
            var lastView = state.getOption.map(_.lastViewUs)
            sorted.foreach { case (_, id, ts, typ) =>
              val us = tsMicros(ts)
              if (typ == "view") lastView = Some(us)
              else if (typ == "purchase") lastView.foreach { v =>
                // identical arithmetic to the batch twin: micro-exact
                // epoch doubles subtracted
                val latency = us / 1e6 - v / 1e6
                if (latency <= maxDelaySec)
                  out ::= Conversion(user, id,
                    java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(
                      v / 1000000L, v % 1000000L * 1000)),
                    java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(
                      us / 1000000L, us % 1000000L * 1000)),
                    latency)
              }
            }
            lastView.foreach { v =>
              state.update(FunnelState(v))
              state.setTimeoutTimestamp(v / 1000 + maxDelaySec * 1000)
            }
            out.reverseIterator
          }
      }.toDF()
    }
  }
}
