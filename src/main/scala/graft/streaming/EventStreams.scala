package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/** Structured-Streaming forms of the engine's incremental semantics.
  *
  * The reference is a polling micro-batch system (P/replicator.py:193-247);
  * its streaming semantics (watermark-like settling T2, exactly-once per
  * chunk T3, late-data-as-updates T6) live in the control table. These
  * transforms give the same operators an event-time streaming surface:
  * identical logical plans run in batch (for the DuckDB oracle) and under
  * `readStream` (for continuous ingest).
  */
object EventStreams {

  /** Tumbling event-time window aggregate with watermark; works over a
    * batch DataFrame too (window() is engine-agnostic).
    */
  def windowedCounts(events: DataFrame, windowDur: String = "5 minutes",
      watermark: String = "10 minutes"): DataFrame = {
    val withWm =
      if (events.isStreaming) events.withWatermark("ts", watermark) else events
    withWm
      .groupBy(window(col("ts"), windowDur), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(round(col("value") * 100).cast("long")).as("value_cents"))
      .select(unix_micros(col("window.start")).as("window_start_us"),
        col("event_type"), col("n"), col("value_cents"))
  }

  /** Hopping-window aggregate — duration > slide, so windows OVERLAP and
    * each event lands in duration/slide of them (the smoothing dashboards
    * and rate-limiters want; tumbling [[windowedCounts]] is the
    * slide == duration special case). Spark compiles the multi-window
    * assignment to an Expand (one row per covered window) BEFORE partial
    * aggregation, so the replication cost is paid map-side and the
    * shuffle still carries per-(window, type) aggregates, not events —
    * the property PlanAudit pins (st8). Streaming: watermark bounds open
    * windows exactly as in the tumbling form.
    */
  def windowedCountsHopping(events: DataFrame,
      windowDur: String = "10 minutes", slide: String = "5 minutes",
      watermark: String = "10 minutes"): DataFrame = {
    val withWm =
      if (events.isStreaming) events.withWatermark("ts", watermark) else events
    withWm
      .groupBy(window(col("ts"), windowDur, slide), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(round(col("value") * 100).cast("long")).as("value_cents"))
      .select(unix_micros(col("window.start")).as("window_start_us"),
        col("event_type"), col("n"), col("value_cents"))
  }

  /** Per-window heavy hitters: `space_saving_topk` under a (streaming or
    * batch) tumbling event-time window. On a stream the sketch buffer IS
    * the state-store payload — O(capacity) per open window regardless of
    * key cardinality, serialized/merged by the TypedImperativeAggregate
    * path — and the watermark both bounds open-window state and, in
    * append mode, drives the one-shot emit of each finalized window's
    * top-k. Below `capacity` distinct keys per window the counts are
    * exact (err = 0), which is the oracle-gated regime (a9).
    *
    * Returns (window_start_us, user_id, cnt, rnk), rnk 1..k ordered
    * (cnt DESC, user_id ASC).
    */
  def windowedTopK(events: DataFrame, windowDur: String = "1 hour",
      watermark: String = "10 minutes", capacity: Int = 512,
      k: Int = 5): DataFrame = {
    val withWm =
      if (events.isStreaming) events.withWatermark("ts", watermark) else events
    withWm
      .groupBy(window(col("ts"), windowDur))
      .agg(graft.functions.SpaceSaving
        .spaceSavingTopK(col("user_id"), capacity, k).as("hh"))
      .select(unix_micros(col("window.start")).as("window_start_us"),
        posexplode(col("hh")).as(Seq("pos", "e")))
      .select(col("window_start_us"), col("e.item").as("user_id"),
        col("e.cnt").as("cnt"), (col("pos") + 1).cast("int").as("rnk"))
  }

  /** Per-window value quantiles (latency/price percentile dashboards —
    * "p50/p95 per hour") from ONE mergeable KLL sketch per window: the
    * sketch is the aggregation-buffer/state-store payload,
    * O(k·log(n/k)) bytes per open window regardless of row count, so
    * the shuffle carries sketches, not events, and a stream can emit
    * per-window percentiles in append mode with watermark-bounded state
    * — exact quantile state would be unbounded per window. While a
    * window's DISTINCT values stay ≤ k the answer is exact
    * (quantile_disc-identical, err = 0), which is the oracle-gated
    * regime (st9); past it every window carries its own worst-case
    * rank-error certificate in `err`.
    *
    * Returns (window_start_us, p50_cents, p95_cents, err, n).
    */
  def windowedQuantiles(events: DataFrame, windowDur: String = "1 hour",
      watermark: String = "10 minutes", k: Int = 1024,
      probs: Seq[Double] = Seq(0.5, 0.95)): DataFrame = {
    val withWm =
      if (events.isStreaming) events.withWatermark("ts", watermark) else events
    withWm
      .select(col("ts"), round(col("value") * 100).cast("long").as("v"))
      .groupBy(window(col("ts"), windowDur))
      .agg(graft.functions.Kll.kllQuantiles(col("v"), k, probs).as("s"))
      .select(unix_micros(col("window.start")).as("window_start_us"),
        col("s.qs").getItem(0).as("p50_cents"),
        col("s.qs").getItem(1).as("p95_cents"),
        col("s.err").as("err"), col("s.n").as("n"))
  }

  /** Per-window distinct users — the audience/reach counter. Exact mode
    * (`approx = false`) is the batch/oracle form; a STREAM must use
    * `approx = true`: Spark refuses exact distinct aggregation on a
    * streaming DataFrame (distinct state is unbounded per window), while
    * HLL++ partial aggregates are fixed-size, mergeable state — the
    * sketch IS the state-store payload, O(2^p) bytes per open window
    * regardless of user cardinality, and the watermark bounds open
    * windows and drives append-mode emit. HLL++ is deterministic for a
    * given input multiset, so the streaming result equals the batch
    * approx result exactly (StreamingSpec), and the `rsd` contract ties
    * both to the exact count.
    */
  def windowedDistinct(events: DataFrame, windowDur: String = "1 hour",
      watermark: String = "10 minutes", approx: Boolean = false,
      rsd: Double = 0.05): DataFrame = {
    val withWm =
      if (events.isStreaming) events.withWatermark("ts", watermark)
      else events
    val users =
      if (approx) approx_count_distinct(col("user_id"), rsd)
      else count_distinct(col("user_id"))
    withWm
      .groupBy(window(col("ts"), windowDur))
      .agg(users.as("n_users"), count(lit(1)).as("n_events"))
      .select(unix_micros(col("window.start")).as("window_start_us"),
        col("n_users"), col("n_events"))
  }

  /** Stream-stream interval join — the continuous form of the j10
    * attribution query: every event within `windowDur` AFTER a purchase
    * by the same user, matched as both sides ARRIVE (inner stream-stream
    * joins emit on match; the watermark only bounds how long purchase
    * state is retained — without the time-range condition + watermark,
    * join state would grow forever, the stream-stream scale-killer).
    * The same plan runs in batch for the spec's equivalence check.
    *
    * Returns (p_event_id, event_id, user_id, p_ts_us, ts_us).
    */
  def attributionJoin(events: DataFrame, windowDur: String = "30 minutes",
      watermark: String = "1 hour"): DataFrame = {
    val wm =
      if (events.isStreaming) events.withWatermark("ts", watermark)
      else events
    val purchases = wm.where(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("event_id").as("p_event_id"),
        col("ts").as("p_ts"))
    wm.as("e").join(purchases.as("p"),
        col("e.user_id") === col("p.p_user") &&
          col("e.ts") >= col("p.p_ts") &&
          col("e.ts") <= col("p.p_ts") + expr(s"interval $windowDur"))
      .select(col("p.p_event_id"), col("e.event_id"), col("e.user_id"),
        unix_micros(col("p.p_ts")).as("p_ts_us"),
        unix_micros(col("e.ts")).as("ts_us"))
  }

  /** Gap-based sessionization per user: a new session starts when the gap
    * from the previous event exceeds `gapUs`. Expressed as
    * lag + running-sum (batch form; the streaming form of the same
    * semantics is [[sessionizeStreaming]]).
    */
  def sessionize(events: DataFrame, gapUs: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    events
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("ts_us"))
      .withColumn("prev_us", lag(col("ts_us"), 1).over(byUser))
      .withColumn("new_session",
        (col("prev_us").isNull || (col("ts_us") - col("prev_us")) > gapUs)
          .cast("int"))
      .withColumn("session_seq",
        sum(col("new_session")).over(
          byUser.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("session_seq"))
      .agg(count(lit(1)).as("n_events"),
        min(col("ts_us")).as("session_start_us"),
        max(col("ts_us")).as("session_end_us"))
  }

  /** A user's buffered event times awaiting session closure. */
  final case class SessionBuffer(tsUs: Seq[Long])

  /** A closed session emitted by [[sessionizeStateful]]. */
  final case class SessionOut(user_id: Long, session_start_us: Long,
      session_end_us: Long, n_events: Long)

  /** Custom-state streaming sessionization: per-user
    * `flatMapGroupsWithState` buffers event times as explicit state and
    * emits a session only once the WATERMARK passes its end + gap — the
    * point after which no admissible event (the operator drops rows below
    * the watermark) can extend or bridge it. That makes the output EXACT
    * for any disorder the watermark admits, including late events
    * arriving in a later micro-batch, unlike eager close-on-gap
    * operators. State per user is bounded by the watermark horizon.
    * Event-time timeouts re-finalize idle users. On a batch Dataset the
    * watermark is +∞ by construction (no more data can come), so every
    * session — trailing included — is emitted.
    */
  def sessionizeStateful(events: DataFrame, gapUs: Long,
      watermark: String = "30 minutes"): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = events.sparkSession
    import spark.implicits._
    val streaming = events.isStreaming
    val base =
      if (streaming) events.withWatermark("ts", watermark) else events
    // the watermarked ts column must survive the projection for
    // event-time timeout to resolve
    base.select(col("user_id"), col("ts"), unix_micros(col("ts")).as("ts_us"))
      .as[(Long, java.sql.Timestamp, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[SessionBuffer, SessionOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (user: Long, rows: Iterator[(Long, java.sql.Timestamp, Long)],
            state: GroupState[SessionBuffer]) =>
          val buf = (state.getOption.map(_.tsUs).getOrElse(Seq.empty) ++
            rows.map(_._3)).sorted
          if (buf.isEmpty) {
            if (state.exists) state.remove()
            Iterator.empty
          } else {
            // split the sorted buffer into gap-delimited sessions
            val sessions =
              scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
            var start = buf.head; var last = buf.head; var n = 1L
            buf.tail.foreach { t =>
              if (t - last <= gapUs) { last = t; n += 1 }
              else { sessions += ((start, last, n)); start = t; last = t; n = 1L }
            }
            sessions += ((start, last, n))
            // a session is final iff no admissible future event can land
            // within its gap: end + gap < watermark (batch: everything)
            val wmUs =
              if (streaming) state.getCurrentWatermarkMs() * 1000L
              else Long.MaxValue
            val firstOpen = sessions.indexWhere(_._2 + gapUs >= wmUs)
            val (emit, keepFrom) =
              if (firstOpen < 0) (sessions.toSeq, None)
              else (sessions.take(firstOpen).toSeq,
                Some(sessions(firstOpen)._1))
            keepFrom match {
              case None => if (state.exists) state.remove()
              case Some(from) =>
                state.update(SessionBuffer(buf.dropWhile(_ < from)))
                // fire once the watermark can close the earliest open
                // session (ceil to ms + margin — flooring would fire
                // before end + gap and is rejected when at the watermark)
                val dueMs = (sessions(firstOpen)._2 + gapUs) / 1000L + 2L
                state.setTimeoutTimestamp(
                  math.max(dueMs, state.getCurrentWatermarkMs() + 1L))
            }
            emit.iterator.map { case (s, e, c) => SessionOut(user, s, e, c) }
          }
      }
      .toDF()
  }

  /** Per-stage candidate event-times a user may still promote. */
  final case class FunnelState(stageTs: Seq[Seq[Long]])

  /** A user's current funnel progress (update-mode: latest row wins). */
  final case class FunnelOut(user_id: Long, stages_reached: Int)

  /** Stateful streaming conversion funnel: per-user state machine over
    * `flatMapGroupsWithState`, emitting (user, stages reached) in UPDATE
    * mode after each micro-batch. EXACT under any cross-batch disorder:
    * the chain first_k = min{ts ∈ S_k : ts > first_(k−1)} is recomputed
    * from retained candidates, and because every first_k can only
    * DECREASE as data arrives (admissible sets only grow), a stage-k
    * timestamp can matter later iff it is below the current first_k. A
    * stage with no first yet keeps all its candidates (any of them may
    * become admissible when the previous stage's first drops below it).
    *
    * State bound: candidate-relevance pruning alone does NOT bound the
    * pre-conversion pattern (a user with many clicks and no view keeps
    * every click). The watermark does: a candidate at or below the
    * current watermark that is not itself a first can never become one —
    * any chain rewrite that promoted it would need a future event with
    * an even older timestamp, which the watermark excludes — so it is
    * dropped. Set a `withWatermark("ts", ...)` on the input to bound
    * state to the disorder horizon; without one (and in batch, where the
    * single pass ends the stream) state for pre-conversion users grows
    * with their event count, the price of an exact all-history funnel.
    */
  def funnelStateful(events: DataFrame, stages: Seq[String]): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = events.sparkSession
    import spark.implicits._
    val idx = stages.zipWithIndex.toMap
    val n = stages.length
    events
      // the watermarked event-time column (`ts`) must SURVIVE this
      // projection: dropping it detaches the watermark from the plan and
      // getCurrentWatermarkMs throws, silently disabling state pruning
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("us"), col("ts"))
      .as[(Long, String, Long, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[FunnelState, FunnelOut](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (user: Long, rows: Iterator[(Long, String, Long, java.sql.Timestamp)],
            state: GroupState[FunnelState]) =>
          val cand = Array.fill(n)(Vector.newBuilder[Long])
          state.getOption.foreach(_.stageTs.zipWithIndex.foreach {
            case (ts, i) => cand(i) ++= ts
          })
          rows.foreach { case (_, typ, us, _) =>
            idx.get(typ).foreach(i => cand(i) += us)
          }
          val sets = cand.map(_.result())
          // recompute the first-per-stage chain from scratch
          val firsts = Array.fill(n)(Option.empty[Long])
          var prev = Long.MinValue
          var k = 0
          var broken = false
          while (k < n && !broken) {
            val adm = sets(k).filter(_ > prev)
            if (adm.isEmpty) broken = true
            else { firsts(k) = Some(adm.min); prev = adm.min }
            k += 1
          }
          // prune: keep ts that could still become stage k's first —
          // below the stage's current first, and above the watermark
          // (a ts ≤ wm that is not already a first would need an even
          // older future event to become admissible; the watermark
          // excludes that)
          val wmUs =
            try state.getCurrentWatermarkMs() * 1000L
            catch { // no watermark set (or batch): no horizon to prune on
              case _: UnsupportedOperationException => Long.MinValue
            }
          val kept = (0 until n).map { i =>
            val below = firsts(i) match {
              case Some(f) => sets(i).filter(_ <= f)
              case None => sets(i)
            }
            below.filter(v => v > wmUs || firsts(i).contains(v))
          }
          state.update(FunnelState(kept))
          Iterator.single(FunnelOut(user, firsts.count(_.isDefined)))
      }
      .toDF()
  }

  /** Windowed-funnel state: stages reached so far (downward-closed mask)
    * plus per-stage event times still inside the disorder+horizon window.
    */
  final case class WFunnelState(reached: Int, stageTs: Seq[Seq[Long]])

  /** Stateful streaming form of
    * [[graft.ops.EventAnalytics.funnelWindowed]]: per-user progress
    * through a stage chain that must complete within `horizonUs` of its
    * anchoring stage-1 event, emitted in UPDATE mode as (user,
    * stages_reached). Exact under cross-batch disorder: each batch
    * re-runs the max-anchor sweep (a_i = best anchor completing stages
    * 1..i strictly before t; reach_k at event p iff a_{k-1} ≥ p −
    * horizon) over retained + new events, OR-ing into the reached mask —
    * reach flags only ever turn on, so accumulation is monotone.
    *
    * State bound comes from the horizon itself: any chain ending at a
    * future event p (necessarily above the watermark) has anchor
    * ≥ p − horizon > wm − horizon, so every event at or below
    * wm − horizon can never join a future chain and is dropped. State is
    * therefore O(events per user per horizon+disorder window) — set a
    * `withWatermark("ts", …)` on the input; without one (and in batch)
    * nothing is pruned, the price of exactness over all history.
    */
  def funnelWindowedStateful(events: DataFrame, stages: Seq[String],
      horizonUs: Long): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = events.sparkSession
    import spark.implicits._
    val idx = stages.zipWithIndex.toMap
    val n = stages.length
    events
      // keep the watermarked `ts` column alive through the projection —
      // see funnelStateful; without it the horizon prune never engages
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("us"), col("ts"))
      .as[(Long, String, Long, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[WFunnelState, FunnelOut](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (user: Long, rows: Iterator[(Long, String, Long, java.sql.Timestamp)],
            state: GroupState[WFunnelState]) =>
          val prev = state.getOption.getOrElse(
            WFunnelState(0, Seq.fill(n)(Nil)))
          val sets = Array.fill(n)(Vector.newBuilder[Long])
          prev.stageTs.zipWithIndex.foreach { case (ts, i) => sets(i) ++= ts }
          rows.foreach { case (_, typ, us, _) =>
            idx.get(typ).foreach(i => sets(i) += us)
          }
          val kept = sets.map(_.result())
          // merged sweep in time order; ties share the pre-tie anchor
          // state so "strictly before" matches the batch RANGE window
          val evs = kept.zipWithIndex
            .flatMap { case (ts, i) => ts.map(t => (t, i)) }
            .sortBy(_._1)
          val a = Array.fill(n)(Long.MinValue) // a(i): best anchor thru stage i+1
          var reached = prev.reached
          var p = 0
          while (p < evs.length) {
            var q = p
            while (q < evs.length && evs(q)._1 == evs(p)._1) q += 1
            // reads against pre-group state
            val updates = (p until q).map { j =>
              val (t, i) = evs(j)
              if (i == 0) reached |= 1
              else if (a(i - 1) != Long.MinValue && a(i - 1) >= t - horizonUs)
                reached |= 1 << i
              (i, if (i == 0) t else a(i - 1))
            }
            updates.foreach { case (i, carry) =>
              if (carry != Long.MinValue && carry > a(i)) a(i) = carry
            }
            p = q
          }
          // events strictly below wm − horizon can never anchor or join
          // a future chain (its final event would sit AT or above the
          // watermark but within horizon of them; Spark admits ts == wm,
          // and the batch reach test is inclusive, so an anchor at
          // exactly wm − horizon still completes a chain at exactly the
          // watermark) — drop only below the boundary, the mask remembers
          val wmUs =
            try state.getCurrentWatermarkMs() * 1000L
            catch { case _: UnsupportedOperationException => Long.MinValue }
          val cutoff =
            if (wmUs == Long.MinValue) Long.MinValue else wmUs - horizonUs
          state.update(WFunnelState(reached,
            kept.map(_.filter(_ >= cutoff)).toSeq))
          // reach is downward-closed, so progress = contiguous low bits
          var k = 0
          while (k < n && (reached & (1 << k)) != 0) k += 1
          Iterator.single(FunnelOut(user, k))
      }
      .toDF()
  }

  /** Streaming sessionization via session_window (state handled by the
    * engine; append-mode with watermark).
    */
  def sessionizeStreaming(events: DataFrame, gap: String,
      watermark: String = "30 minutes"): DataFrame =
    events.withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), unix_micros(col("session_window.start")).as("session_start_us"),
        col("n_events"))

  /** Streaming exact dedup — the continuous-ingest form of dd1: emit the
    * first document seen per content hash and drop re-arrivals. Keyed on
    * the 32-byte sha so state stores hashes, not documents, and
    * `dropDuplicatesWithinWatermark` lets the engine EVICT state older
    * than the watermark — without it the dedup map grows with corpus
    * size, which is the streaming scale-killer. Trade-off (documented,
    * inherent): a duplicate arriving later than the watermark delay
    * re-emits; batch dd1 over the accumulated corpus is the exact
    * backstop.
    */
  def dedupStream(docs: DataFrame, watermark: String = "1 hour",
      tsCol: String = "ts", idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val hashed = docs.withColumn("content_sha", sha2(col(textCol), 256))
    if (hashed.isStreaming)
      hashed.withWatermark(tsCol, watermark)
        .dropDuplicatesWithinWatermark("content_sha")
    else {
      // dropDuplicates keeps an ARBITRARY row; the batch backstop must be
      // deterministic and match the streaming first-arrival semantics,
      // so keep the earliest (tsCol, idCol) row per content hash
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("content_sha").orderBy(tsCol, idCol)
      hashed.withColumn("__rn", row_number().over(w))
        .where(col("__rn") === 1).drop("__rn")
    }
  }

  /** Per-source running token total for [[mixtureSampleStream]] — the
    * WHOLE state: one Long per source, constant regardless of corpus
    * size (the right streaming-quota state shape; a seen-doc set would
    * grow with the stream).
    */
  final case class QuotaUsed(seen: Long)

  /** Streaming mixture enforcement — the continuous-ingest twin of
    * [[graft.ops.TextAnalysis.mixtureSample]]: each source spends its
    * token budget as documents ARRIVE, admitting a doc iff the running
    * per-source token total (counting every doc seen, admitted or not —
    * exactly the batch form's window `cum`) stays ≤ the budget. Within a
    * micro-batch, rows are consumed in the batch form's deterministic
    * ([[graft.ops.TextAnalysis.sampleRank]], id) order, so when arrival
    * order refines hash order (e.g. replaying a curated corpus in
    * sample order) the admitted set equals the batch prefix EXACTLY
    * (StreamingSpec); under arbitrary arrival the semantics are
    * greedy-online — the budget still cannot be exceeded, which is the
    * production guarantee quota enforcement needs. Sources absent from
    * `budgets` admit nothing. Works unchanged on a batch Dataset (one
    * "micro-batch" = the hash-order prefix).
    */
  def mixtureSampleStream(docs: DataFrame, budgets: Map[String, Long],
      idCol: String = "doc_id", textCol: String = "text",
      sourceCol: String = "source"): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).as("doc_id"), col(sourceCol).as("source"),
        graft.ops.TextAnalysis.tokenCountOf(
          graft.ops.TextAnalysis.stats(col(textCol))).cast("long")
          .as("n_tok"),
        graft.ops.TextAnalysis.sampleRank(col(idCol)).as("hr"))
      .as[(Long, String, Long, Long)]
      .groupByKey(_._2)
      .flatMapGroupsWithState[QuotaUsed, (Long, String, Long)](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (source: String, rows: Iterator[(Long, String, Long, Long)],
            state: GroupState[QuotaUsed]) =>
          val budget = budgets.getOrElse(source, 0L)
          var seen = state.getOption.map(_.seen).getOrElse(0L)
          val admitted = rows.toSeq.sortBy(r => (r._4, r._1)).flatMap { r =>
            seen += r._3
            if (seen <= budget) Some((r._1, r._2, r._3)) else None
          }
          state.update(QuotaUsed(seen))
          admitted.iterator
      }
      .toDF("doc_id", "source", "n_tok")
  }

  /** Per-shard running token total for [[packStream]]. */
  final case class PackState(totalTokens: Long)
  final case class PackOut(doc_id: Long, source: String, n_tokens: Long,
      start_seq: Long, start_off: Long, n_seqs: Long)

  /** Ingest-time sequence packing — the streaming twin of
    * [[graft.ops.TextAnalysis.packSequencesAppend]]: per-shard state is
    * ONE long (the running token total), each micro-batch's docs extend
    * the shard's token stream in deterministic sampleRank order within
    * the batch, and emitted (start_seq, start_off, n_seqs) coordinates
    * are final the moment they appear (append-mode legal — earlier
    * coordinates are immutable by construction, exactly the ingest
    * contract training shards need). Replaying the same micro-batches
    * through [[graft.ops.TextAnalysis.packSequencesAppend]] yields the
    * identical coordinates (StreamingSpec asserts bit parity).
    */
  def packStream(docs: DataFrame, seqLen: Long,
      idCol: String = "doc_id", textCol: String = "text",
      sourceCol: String = "source"): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    require(seqLen > 0, s"seqLen must be positive, got $seqLen")
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).as("doc_id"), col(sourceCol).as("source"),
        size(split(col(textCol), "\\s+")).cast("long").as("n_tokens"),
        graft.ops.TextAnalysis.sampleRank(col(idCol)).as("hr"))
      .as[(Long, String, Long, Long)]
      .groupByKey(_._2)
      .flatMapGroupsWithState[PackState, PackOut](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (source: String, rows: Iterator[(Long, String, Long, Long)],
            state: GroupState[PackState]) =>
          var off = state.getOption.map(_.totalTokens).getOrElse(0L)
          val out = rows.toSeq.sortBy(r => (r._4, r._1)).map {
            case (id, _, n, _) =>
              val o = PackOut(id, source, n, off / seqLen, off % seqLen,
                (off + n - 1) / seqLen - off / seqLen + 1)
              off += n
              o
          }
          state.update(PackState(off))
          out.iterator
      }
      .toDF()
  }

  /** Host a micro-batch sink: run `transform` over a parquet-backed stream
    * into an in-memory table (used by specs; production would point at the
    * chunk export dirs and a foreachBatch committing via the catalog).
    */
  def runToMemory(spark: SparkSession, srcDir: String, schema: StructType,
      queryName: String, transform: DataFrame => DataFrame,
      outputMode: String = "append"): StreamingQuery = {
    val src = spark.readStream.schema(schema).parquet(srcDir)
    transform(src).writeStream
      .outputMode(outputMode)
      .format("memory")
      .queryName(queryName)
      .trigger(Trigger.AvailableNow())
      .start()
  }
}
