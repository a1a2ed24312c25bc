package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Bounded top-k as a typed `Aggregator` — the custom-UDAF surface
  * (SURVEY §2b "UDF/UDAF"), used where built-ins genuinely can't: a
  * per-GROUP top-k with map-side partial aggregation.
  *
  * The window formulation (`row_number() OVER (PARTITION BY g ORDER BY
  * score)` then `rk <= k`) shuffles EVERY row to its group's reducer
  * before any pruning; with few/hot groups that reducer melts. This
  * aggregator's buffer is the k-bounded candidate list, so each mapper
  * sends at most k rows per group into the shuffle (same asymptotics
  * as TakeOrderedAndProject, but per group). Plans as
  * ObjectHashAggregate with partial + final steps; ordering
  * (score DESC, id ASC) is total, so the result is independent of
  * partitioning and merge order.
  */
object TopK {

  /** scored candidate; the tiebreak on `id` makes the order total */
  final case class Scored(score: Long, id: Long)

  class TopKByScore(k: Int) extends Aggregator[Scored, Seq[Scored], Seq[Scored]] {
    require(k > 0)

    private def best(xs: Seq[Scored]): Seq[Scored] =
      xs.sortBy(s => (-s.score, s.id)).take(k)

    /** insert into the already-(-score, id)-sorted buffer at its
      * ordered position — O(k) copy per accepted row instead of the
      * O(k log k) sort-the-whole-buffer that reduce used to pay
      */
    private def insertSorted(xs: Seq[Scored], a: Scored): Seq[Scored] = {
      val (before, after) = xs.span(s =>
        s.score > a.score || (s.score == a.score && s.id < a.id))
      (before :+ a) ++ after
    }

    override def zero: Seq[Scored] = Seq.empty

    override def reduce(b: Seq[Scored], a: Scored): Seq[Scored] =
      if (b.size < k) insertSorted(b, a)
      else {
        val worst = b.last // the buffer is kept sorted
        if (a.score > worst.score || (a.score == worst.score && a.id < worst.id))
          insertSorted(b, a).take(k)
        else b
      }

    override def merge(b1: Seq[Scored], b2: Seq[Scored]): Seq[Scored] =
      best(b1 ++ b2)

    override def finish(r: Seq[Scored]): Seq[Scored] = r

    override def bufferEncoder: Encoder[Seq[Scored]] = ExpressionEncoder()
    override def outputEncoder: Encoder[Seq[Scored]] = ExpressionEncoder()
  }
}
