package graft.ops

/** Shared parsing for user-facing duration strings ("30 minutes",
  * "2 hours"). One definition so the gap/within grammars of the funnel and
  * both sessionizers can't drift apart. */
object Intervals {

  /** Parse a SUB-DAY duration to microseconds. Month/day units are
    * rejected: they are calendar-dependent (a "1 day" gap is 23 or 25
    * hours twice a year in DST zones), and every current caller compares
    * epoch-micros differences. */
  def subDayMicros(s: String): Long = {
    val iv = org.apache.spark.sql.catalyst.util.IntervalUtils
      .stringToInterval(org.apache.spark.unsafe.types.UTF8String.fromString(s))
    require(iv.months == 0 && iv.days == 0,
      s"duration must be sub-day (hours/minutes/seconds), got '$s'")
    iv.microseconds
  }
}
