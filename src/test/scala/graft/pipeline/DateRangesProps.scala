package graft.pipeline

import org.scalacheck.{Gen, Prop, Properties}

import java.time.LocalDate
import java.time.temporal.ChronoUnit

/** Property tests for the F3 month-bucketed range generator (SURVEY.md
  * §5.3): the buckets must cover `[start, end]` exactly — no gaps, no
  * overlaps, remainder clamped (`helper.py:41-65`). */
object DateRangesProps extends Properties("DateRanges") {

  private val dates = for {
    epoch <- Gen.choose(0L, 20L * 365)
    span  <- Gen.choose(0L, 5L * 365)
  } yield {
    val s = LocalDate.of(2000, 1, 1).plusDays(epoch)
    (s, s.plusDays(span))
  }

  property("buckets cover [start,end] exactly once, in order") = Prop.forAll(dates) { case (s, e) =>
    val buckets = DateRanges.monthBuckets(s.toString, e.toString).map { case (a, b) =>
      (LocalDate.parse(a), LocalDate.parse(b))
    }
    val contiguous = buckets.sliding(2).forall {
      case Seq((_, prevEnd), (nextStart, _)) => nextStart == prevEnd.plusDays(1)
      case _                                 => true
    }
    val wellFormed = buckets.forall { case (a, b) => !b.isBefore(a) }
    val totalDays = buckets.map { case (a, b) => ChronoUnit.DAYS.between(a, b) + 1 }.sum
    buckets.head._1 == s && buckets.last._2 == e && contiguous && wellFormed &&
      totalDays == ChronoUnit.DAYS.between(s, e) + 1
  }

  property("every bucket spans at most one calendar month") = Prop.forAll(dates) { case (s, e) =>
    DateRanges.monthBuckets(s.toString, e.toString).forall { case (a, b) =>
      val start = LocalDate.parse(a)
      !LocalDate.parse(b).isAfter(start.plusMonths(1).minusDays(1))
    }
  }
}
