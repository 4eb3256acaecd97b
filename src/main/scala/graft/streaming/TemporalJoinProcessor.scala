package graft.streaming

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** One event routed to the S4b temporal join (keyed by user_id
  * upstream): purchases double as dimension input (they move the SCD2
  * band) and every event is a fact probe. */
case class TemporalEvent(tsu: Long, event_id: Long, isPurchase: Boolean,
                         cents: Long)

/** S4b — STREAMING TEMPORAL DIM JOIN (Flink's event-time temporal
  * table join over a CDC-maintained dimension): each fact event joins
  * the S18 SCD2 version in effect at its EVENT TIME. Executed the way
  * Flink executes it — the versioned build side is not re-keyed and
  * re-shuffled as a version stream; it accumulates in keyed state
  * co-located with the probes, and each probe looks the band up at its
  * own timestamp. The dimension semantics are S18's exactly: the same
  * Scd2State tuple, the same exact-integer cents accumulation, the
  * same band thresholds (single-sourced via [[Scd2Bands.bandOf]], so
  * this operator provably consumes the same dimension S18 publishes).
  *
  * Version semantics: versions are [valid_from, valid_to) with
  * valid_from = the transition purchase's ts (inclusive), so on a
  * (ts) tie the dimension update applies BEFORE the fact probe — the
  * transition purchase itself joins the band it opens. Within a batch
  * rows sort by (tsu, dim-before-fact, event_id); across batches the
  * clean replay is globally (ts, event_id)-ordered per key (the
  * S8/S14/S18 contract, pinned in StreamingSpec) — and the shipped
  * corpus has ZERO same-(user, ts) pairs, so the tie rule is
  * belt-and-braces, not load-bearing. An event before its user's
  * first purchase has no version in effect and emits band 'none'.
  *
  * 100 TB: one user_id shuffle shared by both roles, state = ONE
  * Scd2State tuple per user (bands monotone — no version history
  * retained), O(1) work per event. On an out-of-order stream the
  * standard design buffers probes per key until the watermark clears
  * their event time (buffer bounded by rate × delay — Flink's
  * temporal-join operator exactly); on the ordered replay that buffer
  * is degenerate and omitted. */
class TemporalJoinProcessor(midCents: Long, highCents: Long)
    extends StatefulProcessor[Long, TemporalEvent, (Long, Long, String)] {

  @transient private var st: ValueState[Scd2State] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    st = getHandle.getValueState[Scd2State](
      "scd2dim", Encoders.product[Scd2State], TTLConfig.NONE)

  override def handleInputRows(user: Long, rows: Iterator[TemporalEvent],
                               timers: TimerValues)
      : Iterator[(Long, Long, String)] = {
    var cur = Option(st.get())
    val out = scala.collection.mutable.ListBuffer[(Long, Long, String)]()
    rows.toSeq
      .sortBy(e => (e.tsu, if (e.isPurchase) 0 else 1, e.event_id))
      .foreach { e =>
        if (e.isPurchase) {
          val cum = cur.map(_.cumCents).getOrElse(0L) + e.cents
          val nb = Scd2Bands.bandOf(cum, midCents, highCents)
          cur = cur match {
            case Some(s0) if nb == s0.band => Some(s0.copy(cumCents = cum))
            case _                         => Some(Scd2State(nb, e.tsu, cum))
          }
        }
        out += ((user, e.event_id, cur.map(_.band).getOrElse("none")))
      }
    cur.foreach(st.update)
    out.iterator
  }
}

/** The S18/S4b dimension's band function, single-sourced so the
  * maintainer and the temporal join cannot drift. */
object Scd2Bands {
  def bandOf(cumCents: Long, midCents: Long, highCents: Long): String =
    if (cumCents < midCents) "low"
    else if (cumCents < highCents) "mid"
    else "high"
}
