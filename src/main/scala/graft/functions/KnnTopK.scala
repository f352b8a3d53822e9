package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Bounded exact top-k-by-score aggregate for the k-NN join
  * (SURVEY.md §2 B.14 `q_sim_knn`).
  *
  * The scale problem it solves: per-probe exact top-k via
  * `collect_list` is unbounded per-group memory, and a window
  * `row_number() OVER (PARTITION BY pid)` runs one task per probe over
  * the probe's whole candidate set. An `Aggregator` instead rides
  * Spark's partial aggregation: every map task keeps at most k hits per
  * probe, the shuffle payload is O(k) per (probe, partition), and the
  * final merge is a k+k list merge — exact result, bounded state,
  * map-side combined.
  *
  * Ordering is (cos DESC, vec_id ASC) on the ALREADY-ROUNDED cosine, so
  * the result is a total order reproducible by the DuckDB oracle's
  * `row_number()` over the same rounded score.
  */
case class KnnHit(cos: Double, vec_id: Long)

class KnnTopKAggregator(k: Int)
    extends Aggregator[KnnHit, Seq[KnnHit], Seq[KnnHit]] {

  private def best(xs: Seq[KnnHit]): Seq[KnnHit] =
    xs.sortBy(h => (-h.cos, h.vec_id)).take(k)

  override def zero: Seq[KnnHit] = Nil
  // buffer never exceeds k entries, so per-row cost is O(k log k) bounded
  override def reduce(b: Seq[KnnHit], h: KnnHit): Seq[KnnHit] = best(b :+ h)
  override def merge(a: Seq[KnnHit], b: Seq[KnnHit]): Seq[KnnHit] = best(a ++ b)
  override def finish(b: Seq[KnnHit]): Seq[KnnHit] = best(b)

  override def bufferEncoder: Encoder[Seq[KnnHit]] = ExpressionEncoder[Seq[KnnHit]]()
  override def outputEncoder: Encoder[Seq[KnnHit]] = ExpressionEncoder[Seq[KnnHit]]()
}

object KnnTopK {
  /** knn_topk(cos, vec_id) as a Column aggregate for groupBy().agg() */
  def knnTopk(cos: Column, vecId: Column, k: Int): Column =
    udaf(new KnnTopKAggregator(k)).apply(cos, vecId)
}
