package graft.etl

import java.time.{Duration, Instant}
import scala.annotation.tailrec

/** Batch-incremental driver loop — the reference's windowed backfill and
  * watermark advance (reference `src/run.py:100-126`, `flow.py:174-198`):
  * bounded windows walk from `start` to `end`; each window's cursor
  * advances conservatively to max(event_time)+1min, or jumps to the window
  * end when the window was empty.
  *
  * `process` is the per-window pipeline (fetch → normalize → enrich →
  * upsert) returning the max event time seen, if any. Window bounds are
  * pushed-down predicates on the source scan, so each iteration reads only
  * its slice — the property that bounds memory in the reference and bounds
  * scan volume at 100 TB here.
  */
object Incremental {

  @tailrec
  def backfill(
      start: Instant,
      end: Instant,
      window: Duration = Duration.ofDays(30))(
      process: (Instant, Instant) => Option[Instant]): Unit = {
    if (start.isBefore(end)) {
      val winEnd = Seq(start.plus(window), end).min
      val maxSeen = process(start, winEnd)
      val next = maxSeen match {
        case Some(m) =>
          val adv = m.plus(Duration.ofMinutes(1))
          // guard against a stuck cursor when max(event) <= window start
          if (adv.isAfter(start)) adv else winEnd
        case None => winEnd // empty window → jump (reference run.py:120-123)
      }
      backfill(next, end, window)(process)
    }
  }

  /** One incremental run: read cursor, process everything since, advance
    * (reference `run.py:128-162`). */
  def runOnce(state: StateStore, now: Instant = Instant.now())(
      process: String => Option[Instant]): Unit = {
    val since = state.sinceIso(now)
    process(since).foreach(state.advanceFrom)
  }

  private implicit val instantOrdering: Ordering[Instant] =
    Ordering.fromLessThan(_.isBefore(_))
}
