package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** ClickHouse `topK(k)` analog (SURVEY.md §2 B.4 `q_udaf_topk`) — the one
  * genuinely custom aggregate the reference's delegated query surface needs.
  *
  * Space-saving heavy-hitters: the buffer holds at most `capacity` counters;
  * an unseen item evicts the current minimum and inherits its count + 1
  * (Metwally et al., "Efficient Computation of Frequent and Top-k Elements
  * in Data Streams"). With `capacity` ≥ distinct(group) the result is exact —
  * which is what makes the DuckDB rank-SQL oracle valid on the fixtures —
  * while at 100 TB the bounded buffer keeps partial aggregation map-side and
  * the shuffle payload O(capacity) per group.
  *
  * Output: top `k` items by (count DESC, item ASC) — total tie-break order.
  */
case class TopKBuffer(counts: Map[String, Long])

class TopKAggregator(k: Int, capacity: Int)
    extends Aggregator[String, TopKBuffer, Seq[String]] {

  override def zero: TopKBuffer = TopKBuffer(Map.empty)

  override def reduce(b: TopKBuffer, item: String): TopKBuffer =
    b.counts.get(item) match {
      case Some(c) => TopKBuffer(b.counts.updated(item, c + 1))
      case None if b.counts.size < capacity =>
        TopKBuffer(b.counts.updated(item, 1L))
      case None =>
        // evict the (min count, max item) victim; deterministic tie-break
        val (victim, vc) = b.counts.minBy { case (i, c) => (c, i) }
        TopKBuffer(b.counts - victim + (item -> (vc + 1)))
    }

  override def merge(a: TopKBuffer, b: TopKBuffer): TopKBuffer = {
    val summed = b.counts.foldLeft(a.counts) { case (m, (i, c)) =>
      m.updated(i, m.getOrElse(i, 0L) + c)
    }
    TopKBuffer(
      if (summed.size <= capacity) summed
      else summed.toSeq.sortBy { case (i, c) => (-c, i) }.take(capacity).toMap)
  }

  override def finish(b: TopKBuffer): Seq[String] =
    b.counts.toSeq.sortBy { case (i, c) => (-c, i) }.take(k).map(_._1)

  override def bufferEncoder: Encoder[TopKBuffer] = Encoders.product[TopKBuffer]
  override def outputEncoder: Encoder[Seq[String]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[String]]()
}

/** ClickHouse `topKWeighted(k)(item, weight)` analog: space-saving with
  * WEIGHTED increments — each row adds its weight instead of 1, and an
  * unseen item evicts the (min weight, max item) victim and inherits
  * victim weight + its own (the standard weighted extension of the same
  * Metwally et al. scheme; exact when capacity ≥ distinct(group), which
  * is what makes the rank-SQL oracle valid). Merge/finish/tie-break are
  * identical to [[TopKAggregator]] — the buffer means "accumulated
  * weight" instead of "count". */
class WeightedTopKAggregator(k: Int, capacity: Int)
    extends Aggregator[(String, Long), TopKBuffer, Seq[String]] {

  override def zero: TopKBuffer = TopKBuffer(Map.empty)

  override def reduce(b: TopKBuffer, in: (String, Long)): TopKBuffer = {
    val (item, w) = in
    b.counts.get(item) match {
      case Some(c) => TopKBuffer(b.counts.updated(item, c + w))
      case None if b.counts.size < capacity =>
        TopKBuffer(b.counts.updated(item, w))
      case None =>
        val (victim, vc) = b.counts.minBy { case (i, c) => (c, i) }
        TopKBuffer(b.counts - victim + (item -> (vc + w)))
    }
  }

  override def merge(a: TopKBuffer, b: TopKBuffer): TopKBuffer = {
    val summed = b.counts.foldLeft(a.counts) { case (m, (i, c)) =>
      m.updated(i, m.getOrElse(i, 0L) + c)
    }
    TopKBuffer(
      if (summed.size <= capacity) summed
      else summed.toSeq.sortBy { case (i, c) => (-c, i) }.take(capacity).toMap)
  }

  override def finish(b: TopKBuffer): Seq[String] =
    b.counts.toSeq.sortBy { case (i, c) => (-c, i) }.take(k).map(_._1)

  override def bufferEncoder: Encoder[TopKBuffer] = Encoders.product[TopKBuffer]
  override def outputEncoder: Encoder[Seq[String]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[String]]()
}

object TopK {
  /** topk(col) as a Column aggregate usable in groupBy().agg() */
  def topk(c: Column, k: Int, capacity: Int = 1024): Column =
    udaf(new TopKAggregator(k, capacity)).apply(c)

  /** topkWeighted(item, weight) as a Column aggregate */
  def topkWeighted(item: Column, weight: Column, k: Int, capacity: Int = 1024): Column =
    udaf(new WeightedTopKAggregator(k, capacity)).apply(item, weight)
}
