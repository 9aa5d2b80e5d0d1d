package graft.pipeline

import java.time.LocalDate

/** Month-stepped date-range generation (F3).
  *
  * Reference: `airflow/dags/crimeapi/utils/helper.py:41-65` — a full
  * load walks `[start, end]` in one-calendar-month query windows with
  * the final remainder clamped to the end date
  * (`relativedelta(months=1)` steps, `crime_etl.py:110-228`). Bucketed
  * windows bound each API fetch and make a multi-year backfill a
  * sequence of small idempotent loads.
  *
  * Contract (property-tested): inclusive `[bucketStart, bucketEnd]`
  * pairs that cover every day of `[start, end]` exactly once — no gaps,
  * no overlaps, remainder clamped.
  */
object DateRanges {

  def monthBuckets(start: String, end: String): Seq[(String, String)] = {
    val s = LocalDate.parse(start)
    val e = LocalDate.parse(end)
    require(!e.isBefore(s), s"end $end before start $start")
    val buf = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var cur = s
    while (!cur.isAfter(e)) {
      val next = cur.plusMonths(1)
      val stop = if (next.minusDays(1).isBefore(e)) next.minusDays(1) else e
      buf += ((cur.toString, stop.toString))
      cur = next
    }
    buf.toSeq
  }
}
