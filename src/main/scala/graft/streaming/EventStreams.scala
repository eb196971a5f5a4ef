package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.{DataFrame, Dataset, Encoder}
import graft.queries.Eventing

/** Structured Streaming plane (SURVEY.md §2.9): the event-time
  * transforms from `graft.queries.Eventing` applied to an unbounded
  * input, plus a stateful sessionizer on `flatMapGroupsWithState`.
  *
  * Design: batch and streaming share ONE transform definition — the
  * Eventing functions take a DataFrame and are oblivious to whether it
  * came from `read` or `readStream`; this module only adds what
  * unbounded execution needs (watermarks, output mode, state timeout).
  * The DuckDB oracle checks the batch plane; `StreamingSpec` replays
  * the same rows through MemoryStream and asserts the streaming results
  * converge to the batch answer (the exactly-once contract).
  *
  * Scale notes: state is keyed by (window|user) — the store holds one
  * entry per open key, watermarks bound it; shuffle is the same single
  * exchange as the batch plan.
  */
object EventStreams extends Serializable {

  /** Typed event row (events table schema after ts normalization). */
  case class Ev(event_id: Long, ts: Timestamp, user_id: Long,
      event_type: String, value: Double)

  /** Open-session accumulator kept in the state store. */
  case class SessionAcc(startUs: Long, lastUs: Long, n: Long, sum: Double)

  /** Emitted closed session — matches Eventing.sessions's schema. */
  case class SessionOut(session_start: Timestamp, session_end: Timestamp,
      user_id: Long, n_events: Long, session_value: Double)

  private val gapUs: Long = 30L * 60 * 1000000

  /** Tumbling 1-hour aggregation with a 2-hour watermark: late events
    * beyond the watermark are dropped, windows finalize incrementally.
    */
  def tumblingStream(events: DataFrame): DataFrame =
    Eventing.tumbling(events.withWatermark("ts", "2 hours"))

  /** Sliding-window variant, same watermark. */
  def slidingStream(events: DataFrame): DataFrame =
    Eventing.sliding(events.withWatermark("ts", "2 hours"))

  /** Session windows via the built-in session_window (state-store backed
    * under streaming execution). */
  def sessionStream(events: DataFrame): DataFrame =
    Eventing.sessions(events.withWatermark("ts", "2 hours"))

  /** Stream-stream inner join with both sides watermarked and the
    * event-time range bounded — purchases attributed to the same
    * user's signup within the preceding hour. The time bound is what
    * lets the state store evict signup rows once the watermark passes
    * (unbounded stream-stream joins never release state).
    */
  def purchaseAttribution(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    val purchases = events.filter(col("event_type") === "purchase")
      .withWatermark("ts", "1 hour")
      .select(col("event_id").as("p_id"), col("user_id").as("p_user"),
        col("ts").as("p_ts"), round(col("value"), 2).as("p_value"))
    val signups = events.filter(col("event_type") === "signup")
      .withWatermark("ts", "1 hour")
      .select(col("event_id").as("s_id"), col("user_id").as("s_user"),
        col("ts").as("s_ts"))
    purchases.join(signups,
      col("p_user") === col("s_user") &&
        col("s_ts") <= col("p_ts") &&
        col("s_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR"))
      .select(col("p_id"), col("p_user"), col("p_value"), col("s_id"))
  }

  /** Stream-stream LEFT OUTER join: the attribution shape of
    * `purchaseAttribution`, but purchases with NO qualifying signup
    * emit too (null s_id). An outer result exists only because the
    * watermark makes "no match can still arrive" provable — the state
    * store holds each purchase until the watermark passes the end of
    * its one-hour lookback, then emits the null-extended row and
    * evicts. Both watermarks sit UPSTREAM of the type filters so every
    * event (whatever its type) advances event time: a quiet purchase
    * stream must not stall the proof that signups are absent.
    */
  def purchaseAttributionOuter(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    val purchases = events.withWatermark("ts", "1 hour")
      .filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("user_id").as("p_user"),
        col("ts").as("p_ts"), round(col("value"), 2).as("p_value"))
    val signups = events.withWatermark("ts", "1 hour")
      .filter(col("event_type") === "signup")
      .select(col("event_id").as("s_id"), col("user_id").as("s_user"),
        col("ts").as("s_ts"))
    purchases.join(signups,
      col("p_user") === col("s_user") &&
        col("s_ts") <= col("p_ts") &&
        col("s_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR"),
      "leftOuter")
      .select(col("p_id"), col("p_user"), col("p_value"), col("s_id"))
  }

  /** Stream-static enrichment: the unbounded event stream joined to a
    * bounded dimension (user → tier). The static side is planned as a
    * broadcast on every micro-batch — no stream-side state, no
    * watermark needed for the join itself (only the downstream agg
    * keeps windowed state). This is THE standard enrich-at-ingest
    * shape: at 100 TB/day the dimension rides along each batch while
    * the fact stream never reshuffles for the join. */
  def enrichedTierCounts(events: DataFrame, userTiers: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    events.withWatermark("ts", "2 hours")
      .join(broadcast(userTiers), "user_id")
      .groupBy(window(col("ts"), "1 hour"), col("tier"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value")), 2).as("tier_value"))
      .select(col("window.start").as("window_start"), col("tier"),
        col("n_events"), col("tier_value"))
  }

  /** Exactly-once ingest dedup: duplicate event_ids arriving within the
    * watermark horizon collapse to one row; state for an id is dropped
    * once the watermark passes it (bounded memory, unlike plain
    * dropDuplicates on a stream). The streaming face of `ext.Dedup`. */
  def dedupStream(events: DataFrame): DataFrame =
    events.withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("event_id")

  /** Funnel stage reached by a user: 1 = view, 2 = click after view,
    * 3 = purchase after that click (the streaming face of batch e10). */
  case class FunnelHit(user_id: Long, stage: Int, at: Timestamp)

  /** Per-user funnel progress kept in the state store: first qualifying
    * time per stage, MinValue = not reached. */
  case class FunnelState(tView: Long, tClick: Long, tPurchase: Long)

  /** Streaming funnel: a per-user state machine on
    * flatMapGroupsWithState emitting one FunnelHit the first time each
    * stage is reached — the incremental form of e10's min-chain
    * (t_view = first view, t_click = first click strictly after it,
    * t_purchase = first purchase strictly after that). Batch mode
    * (`streaming = false`) sees complete, sorted groups, so the machine
    * reproduces e10's stage cohorts exactly (spec-asserted). Streaming
    * mode is monotone best-effort under out-of-order input: a late
    * event can never retract an emitted hit (Append has no retraction);
    * an admissible late view may lower t_view without re-evaluating
    * clicks already rejected — the standard funnel-at-ingest trade-off,
    * resolved exactly by the batch recompute. State is one 24-byte
    * triple per user, dropped via event-time timeout once the user is
    * idle past the attribution horizon — after that a returning user
    * re-enters the funnel as a fresh cohort member (choose the horizon
    * >= the longest credit window the analysis allows).
    */
  def funnelize(events: Dataset[Ev], streaming: Boolean = false,
      horizonDays: Int = 30): Dataset[FunnelHit] = {
    implicit val evEnc: Encoder[Ev] = ExpressionEncoder()
    implicit val stEnc: Encoder[FunnelState] = ExpressionEncoder()
    implicit val outEnc: Encoder[FunnelHit] = ExpressionEncoder()
    implicit val keyEnc: Encoder[Long] = ExpressionEncoder()
    val unset = Long.MinValue

    def toUs(t: Timestamp): Long = t.getTime * 1000 + (t.getNanos / 1000) % 1000

    def fn(userId: Long, rows: Iterator[Ev],
        state: GroupState[FunnelState]): Iterator[FunnelHit] = {
      if (state.hasTimedOut) { state.remove(); return Iterator.empty }
      val out = scala.collection.mutable.ArrayBuffer[FunnelHit]()
      var st = state.getOption.getOrElse(FunnelState(unset, unset, unset))
      val sorted = rows.toArray.sortBy(e => (toUs(e.ts), e.event_id))
      var lastUs = unset
      sorted.foreach { e =>
        val t = toUs(e.ts)
        lastUs = math.max(lastUs, t)
        e.event_type match {
          case "view" if st.tView == unset =>
            st = st.copy(tView = t)
            out += FunnelHit(userId, 1, e.ts)
          case "click" if st.tView != unset && st.tClick == unset && t > st.tView =>
            st = st.copy(tClick = t)
            out += FunnelHit(userId, 2, e.ts)
          case "purchase" if st.tClick != unset && st.tPurchase == unset && t > st.tClick =>
            st = st.copy(tPurchase = t)
            out += FunnelHit(userId, 3, e.ts)
          case _ => ()
        }
      }
      if (streaming) {
        state.update(st)
        if (lastUs != unset)
          state.setTimeoutTimestamp(lastUs / 1000 + horizonDays * 24L * 3600 * 1000)
      } else if (state.exists) state.remove()
      out.iterator
    }

    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelState, FunnelHit](
        OutputMode.Append(),
        if (streaming) GroupStateTimeout.EventTimeTimeout()
        else GroupStateTimeout.NoTimeout())(fn)
  }

  /** Custom stateful sessionization on flatMapGroupsWithState: the
    * general form for session logic session_window can't express
    * (per-session aggregates beyond count/sum, custom close rules).
    * `streaming = false` (batch): every group arrives complete, the
    * final open session is flushed at group end — the spec cross-checks
    * this against Eventing.sessions. `streaming = true`: open sessions
    * persist in the state store and close via event-time timeout once
    * the watermark passes last-event + gap.
    */
  def sessionize(events: Dataset[Ev], streaming: Boolean = false): Dataset[SessionOut] = {
    implicit val evEnc: Encoder[Ev] = ExpressionEncoder()
    implicit val accEnc: Encoder[SessionAcc] = ExpressionEncoder()
    implicit val outEnc: Encoder[SessionOut] = ExpressionEncoder()
    implicit val keyEnc: Encoder[Long] = ExpressionEncoder()

    def toUs(t: Timestamp): Long = t.getTime * 1000 + (t.getNanos / 1000) % 1000
    def fromUs(us: Long): Timestamp = {
      val t = new Timestamp(us / 1000)
      t.setNanos(((us % 1000000) * 1000).toInt)
      t
    }
    def round2(x: Double): Double = // Spark round(): HALF_UP on the decimal form
      java.math.BigDecimal.valueOf(x).setScale(2, java.math.RoundingMode.HALF_UP).doubleValue()

    def fn(userId: Long, rows: Iterator[Ev],
        state: GroupState[SessionAcc]): Iterator[SessionOut] = {
      val out = scala.collection.mutable.ArrayBuffer[SessionOut]()
      def close(a: SessionAcc): Unit = out += SessionOut(
        fromUs(a.startUs), fromUs(a.lastUs + gapUs),
        userId, a.n, round2(a.sum))

      // event-time order within the chunk; ACROSS micro-batches the
      // watermark only DROPS events, it does not order them, so a
      // still-admissible late event may precede the stored state. The
      // transitions below never regress state: later-than-gap events
      // close and restart, in-range events merge via min/max (so a
      // late event can extend a session backward), and an event older
      // than start-gap is an isolated already-complete session emitted
      // directly. (A late event that would have BRIDGED two already-
      // emitted sessions cannot be recovered under Append output — the
      // inherent fMGWS trade-off vs session_window's buffered state.)
      val sorted = rows.toArray.sortBy(e => (toUs(e.ts), e.event_id))
      var acc = state.getOption.orNull
      sorted.foreach { e =>
        val t = toUs(e.ts)
        acc match {
          case null => acc = SessionAcc(t, t, 1, e.value)
          case a if t > a.lastUs + gapUs =>
            close(a); acc = SessionAcc(t, t, 1, e.value)
          case a if t + gapUs < a.startUs =>
            close(SessionAcc(t, t, 1, e.value)) // isolated earlier session
          case a => acc = SessionAcc(math.min(a.startUs, t),
            math.max(a.lastUs, t), a.n + 1, a.sum + e.value)
        }
      }
      if (state.hasTimedOut) {
        state.getOption.foreach(close)
        state.remove()
      } else if (streaming) {
        if (acc != null) {
          state.update(acc)
          state.setTimeoutTimestamp(acc.lastUs / 1000 + 30 * 60 * 1000)
        }
      } else if (acc != null) {
        // batch: timeouts never fire — flush the final open session now
        close(acc)
        if (state.exists) state.remove()
      }
      out.iterator
    }

    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionAcc, SessionOut](
        OutputMode.Append(),
        if (streaming) GroupStateTimeout.EventTimeTimeout()
        else GroupStateTimeout.NoTimeout())(fn)
  }

  /** One exploded (band, band_hash) probe row of a document's minhash
    * signature — the unit the online near-dup operator keys its state
    * by. Carries ALL three band hashes so first-agreeing-band emission
    * needs no second stateful pass. */
  case class DocSig(band: Int, bh: String, doc_id: Long,
      bh0: String, bh1: String, bh2: String, sh: Array[Long])

  /** A signature retained in a bucket's state store. */
  case class StoredSig(doc_id: Long, bh0: String, bh1: String,
      bh2: String, sh: Array[Long])

  /** Verified near-dup pair, emitted the moment the later document
    * arrives. */
  case class NearPair(doc_a: Long, doc_b: Long, jaccard: Double)

  /** ONLINE near-duplicate detection — the streaming face of
    * `ext.Dedup.nearDupPairs`: documents arrive as a stream, each keeps
    * its minhash signature in the state store of every band bucket it
    * hashes into, and a verified pair (exact Jaccard over the stored
    * shingle-hash sets >= threshold) is emitted THE MOMENT the later
    * document arrives — the shape of an ingest pipeline that rejects
    * near-duplicates before they ever land in the corpus.
    *
    * Exactly-once across buckets without a second stateful dedup pass:
    * a pair sharing several bands would be found in several groups, so
    * a group emits only when ITS band is the FIRST band the two
    * signatures agree on (d09's first-agreeing-block discipline — a
    * pure map-side decision, since every row carries all three band
    * hashes). Rows within a micro-batch are processed in doc_id order,
    * so output is independent of how the source chops batches.
    *
    * Input: `Dedup.docSignatures` columns (doc_id, sh, bh0..bh2) from
    * a streaming source. State: one signature list per occupied
    * (band, band_hash) bucket — the certification harness runs a
    * bounded corpus with NoTimeout; a production deployment adds a
    * processing-time timeout sized to its ingest horizon the same way
    * funnelize does. The arithmetic (shingle hashing, permutations,
    * band hashes, HALF_UP rounding) is bit-identical to the batch
    * pipeline, so the online pairs hash-match d06's DuckDB oracle. */
  def nearDupStream(sigs: DataFrame, threshold: Double): Dataset[NearPair] = {
    implicit val sigEnc: Encoder[DocSig] = ExpressionEncoder()
    implicit val stEnc: Encoder[List[StoredSig]] = ExpressionEncoder()
    implicit val outEnc: Encoder[NearPair] = ExpressionEncoder()
    implicit val keyEnc: Encoder[(Int, String)] = ExpressionEncoder()
    import org.apache.spark.sql.functions._

    def fn(key: (Int, String), rows: Iterator[DocSig],
        state: GroupState[List[StoredSig]]): Iterator[NearPair] = {
      val have = scala.collection.mutable.ArrayBuffer[StoredSig]()
      have ++= state.getOption.getOrElse(Nil)
      val out = scala.collection.mutable.ArrayBuffer[NearPair]()
      rows.toArray.sortBy(_.doc_id).foreach { d =>
        val dset = d.sh.toSet
        have.foreach { s =>
          val first =
            if (s.bh0 == d.bh0) 0
            else if (s.bh1 == d.bh1) 1
            else if (s.bh2 == d.bh2) 2
            else -1
          if (first == key._1) {
            val inter = s.sh.count(dset.contains)
            val jac = inter.toDouble / (s.sh.length + d.sh.length - inter)
            // Spark round(): HALF_UP over BigDecimal.valueOf's decimal
            // form — match it exactly so the oracle's threshold filter
            // agrees on boundary pairs
            val r = java.math.BigDecimal.valueOf(jac)
              .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
            if (r >= threshold)
              out += NearPair(math.min(s.doc_id, d.doc_id),
                math.max(s.doc_id, d.doc_id), r)
          }
        }
        have += StoredSig(d.doc_id, d.bh0, d.bh1, d.bh2, d.sh)
      }
      state.update(have.toList)
      out.iterator
    }

    sigs.select(explode(array((0 until 3).map(b =>
        struct(lit(b).as("band"), col(s"bh$b").as("bh"))): _*)).as("bk"),
        col("doc_id"), col("bh0"), col("bh1"), col("bh2"), col("sh"))
      .select(col("bk.band").as("band"), col("bk.bh").as("bh"),
        col("doc_id"), col("bh0"), col("bh1"), col("bh2"), col("sh"))
      .as[DocSig]
      .groupByKey(s => (s.band, s.bh))
      .flatMapGroupsWithState[List[StoredSig], NearPair](
        OutputMode.Append(), GroupStateTimeout.NoTimeout())(fn)
  }

  /** One scored event from the rolling z-score detector. */
  case class ZOut(user_id: Long, event_id: Long, cents: Long,
      n_prior: Long, z: Double, is_anomaly: Boolean)

  /** ONLINE ANOMALY DETECTION: per-user rolling z-score over event
    * values (the streaming face of the batch w16 operator) on
    * flatMapGroupsWithState. State per user is the last <=8 event
    * values in cent units — O(1) per key. Arithmetic is EXACTLY
    * w16's: with trailing count n, sum s1, sum of squares s2 (all
    * exact BIGINTs), z = (n·x − s1) / sqrt(n·(n·s2 − s1²)) — one IEEE
    * sqrt + one division, so the streaming scores hash-match the
    * batch window oracle bit for bit. Events within a micro-batch are
    * processed in (ts, event_id) order per user; across batches the
    * state carries the trailing window forward, which is exact when
    * batches respect event-time order per key (the bounded gate run
    * is one batch; a production deployment fronts this with the
    * watermark-buffered reorder stage every event-time state machine
    * needs). */
  def zscoreStream(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    val s = events.sparkSession
    import s.implicits._
    val fn = (uid: Long, it: Iterator[(Long, Long, Long, Long)],
        state: GroupState[List[Long]]) => {
      // (user_id, event_id, tsMicros, cents) sorted by event time
      val sorted = it.toVector.sortBy(r => (r._3, r._2))
      var window = state.getOption.getOrElse(Nil) // oldest-first, <=8
      val out = Vector.newBuilder[ZOut]
      sorted.foreach { case (_, eid, _, x) =>
        val n = window.length.toLong
        if (n >= 4) {
          var s1 = 0L; var s2 = 0L
          window.foreach { c => s1 += c; s2 += c * c }
          if (n * s2 > s1 * s1) {
            val z = (n * x - s1).toDouble /
              math.sqrt((n * (n * s2 - s1 * s1)).toDouble)
            out += ZOut(uid, eid, x, n, z, math.abs(z) > 2.0)
          }
        }
        window = (window :+ x).takeRight(8)
      }
      state.update(window)
      out.result().iterator
    }
    events.select(col("user_id").cast("long"), col("event_id").cast("long"),
        unix_micros(col("ts")).as("us"),
        round(col("value") * 100).cast("long").as("cents"))
      .as[(Long, Long, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[List[Long], ZOut](
        OutputMode.Append(), GroupStateTimeout.NoTimeout())(fn)
      .toDF()
  }

  /** Streaming -> RDBMS serving layer: attach a key-scoped idempotent
    * JDBC upsert (graft.sources.Sources.upsertJdbc) as a foreachBatch
    * sink. Structured Streaming guarantees at-least-once foreachBatch
    * execution; delete-then-insert on the key columns makes a REPLAYED
    * micro-batch a clean no-op, so the composition is effectively
    * exactly-once per key — the standard pattern for serving aggregates
    * out of a stream into a relational store (the reference's MySQL
    * table, fed continuously instead of per upload). Call `.start()` on
    * the returned writer (plus trigger/checkpoint options). */
  def jdbcUpsertSink(stream: DataFrame, url: String, table: String,
      keyCols: Seq[String],
      props: java.util.Properties = new java.util.Properties):
      org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    stream.writeStream.foreachBatch {
      (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        graft.sources.Sources.upsertJdbc(batch.toDF(), url, table, keyCols, props)
    }
}
