package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator` form of the ordered-middle-row semantics (SURVEY §2.4
  * A3 / §7.2: "Aggregator[IN,BUF,OUT] registered via functions.udaf if the
  * expr form proves awkward"). The expression form (Kernels.orderedMiddle)
  * is the default; this demonstrates the reference's custom-UDAF surface as
  * a typed, merge-correct Spark aggregate: buffers accumulate values and
  * the finish step takes the upper-middle of the sorted buffer — identical
  * results to the expression by construction.
  *
  * Buffers are O(group size) like the reference's in-memory groups; for
  * 100 TB use the expression form or a sketch when groups can be huge.
  */
object OrderedMiddleAgg extends Aggregator[Double, List[Double], Option[Double]] {
  override def zero: List[Double] = Nil
  override def reduce(b: List[Double], a: Double): List[Double] = a :: b
  override def merge(b1: List[Double], b2: List[Double]): List[Double] = b1 ::: b2
  override def finish(r: List[Double]): Option[Double] =
    if (r.isEmpty) None
    else {
      val sorted = r.sorted
      Some(sorted(sorted.length / 2)) // upper middle on even counts
    }
  override def bufferEncoder: Encoder[List[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[List[Double]]()
  override def outputEncoder: Encoder[Option[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Option[Double]]()
}
