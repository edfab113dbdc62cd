package graft.model

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Injectable clock (SURVEY §7.4 item 4).
  *
  * The reference calls `current_timestamp()` / `datetime.now()` /
  * `CURRENT_DATE` in five places (`bronze_to_silver.py:78`, `:164`;
  * `build_dimensions.py:60-62`; `create_views.sql:96`;
  * `sample_queries.sql:42`), which makes outputs wall-clock-dependent and
  * untestable. All graft pipeline stages take a `Clock`; production uses
  * [[SystemClock]], tests and the correctness oracle use [[FixedClock]].
  */
sealed trait Clock {
  def nowTs: Column
  def nowDate: Column
}

case object SystemClock extends Clock {
  def nowTs: Column   = current_timestamp()
  def nowDate: Column = current_date()
}

/** @param isoTs e.g. "2024-06-01 12:00:00" (interpreted in session TZ, UTC) */
final case class FixedClock(isoTs: String) extends Clock {
  def nowTs: Column   = to_timestamp(lit(isoTs))
  def nowDate: Column = to_date(lit(isoTs))
}
