package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Deterministic argmax as a typed `Aggregator` UDAF (SURVEY.md §2.8's
  * reserved UDAF surface): the id with the highest score in each group,
  * ties broken by SMALLEST id — a total order, so the result is
  * independent of partition merge order (built-in `max_by` leaves ties
  * unspecified).
  *
  * Scale shape: this is the one-pass alternative to the window-rank
  * top-1 idiom (`row_number().over(partitionBy(g).orderBy(...)) === 1`).
  * The window form shuffles EVERY row to its group's partition and
  * sorts it; the aggregator form carries one (score, id) pair per group
  * through a partial+final hash aggregate — map-side combine reduces
  * the exchange to one row per group per mapper, no sort at all. At
  * 10^10 rows over 10^7 groups that is the difference between shuffling
  * the corpus and shuffling the group directory.
  */
object ArgMaxLong extends Aggregator[(Double, Long), (Double, Long), Long] {
  /** Neutral element: any real (score, id) beats it (NaN included —
    * comparison uses the total order below, where NaN sorts above
    * +Inf). */
  def zero: (Double, Long) = (Double.NegativeInfinity, Long.MaxValue)
  // java.lang.Double.compare is a TOTAL order (NaN greater than
  // everything, -0.0 < 0.0) — the same ordering Spark's sort uses, so
  // this agrees with the window-rank formulation even on NaN scores.
  // Naive `>` would skip NaN candidates entirely (NaN > x is false)
  // and emit the sentinel id for an all-NaN group.
  private def better(x: (Double, Long), y: (Double, Long)): (Double, Long) = {
    val c = java.lang.Double.compare(y._1, x._1)
    if (c > 0 || (c == 0 && y._2 < x._2)) y else x
  }
  def reduce(b: (Double, Long), a: (Double, Long)): (Double, Long) =
    better(b, a)
  def merge(b1: (Double, Long), b2: (Double, Long)): (Double, Long) =
    better(b1, b2)
  def finish(r: (Double, Long)): Long = r._2
  def bufferEncoder: Encoder[(Double, Long)] =
    Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong)
  def outputEncoder: Encoder[Long] = Encoders.scalaLong
}

object ArgMaxFunctions {
  /** arg_max_id(score, id): id of the max score, min id on ties.
    * Inputs must be non-null (filter first — a null score has no
    * defined place in the order). */
  val arg_max_id: (Column, Column) => Column = {
    val f = udaf(ArgMaxLong)
    (score, id) => f(score, id)
  }
}
