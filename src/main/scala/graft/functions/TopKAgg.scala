package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.{col, struct, udaf}

/** Bounded top-k aggregate: keeps the k best (score DESC, id ASC) pairs
  * per group with an O(k) buffer and a merge-correct partial aggregate.
  *
  * This is the scale-shape fix for "top-k neighbors from a pair stream":
  * the window form (`row_number().over(partitionBy(key).orderBy(...))`)
  * must SHUFFLE AND SORT every candidate pair — O(n·c) exchanged rows for
  * c candidates per key — because WindowExec has no partial aggregation.
  * A bounded Aggregator runs inside hash aggregation, so each map task
  * reduces its share of a key's candidates to k rows BEFORE the exchange:
  * the shuffle carries at most k·tasks rows per key regardless of the
  * candidate count. Same output bit-for-bit (exact comparisons on exact
  * doubles, deterministic id tie-break), so the DuckDB window oracle is
  * unchanged.
  *
  * The buffer is a descending-sorted List capped at k — inserts into a
  * k=5 list are a few comparisons; merge is a bounded sorted-list merge.
  */
case class TopKAgg(k: Int)
    extends Aggregator[ScoredId, List[ScoredId], Seq[ScoredId]] {
  require(k > 0, "k must be positive")

  // java.lang.Double.compare is Catalyst's SortOrder semantics for doubles
  // (total order: -0.0 < 0.0, NaN greatest) — primitive >/== would diverge
  // from the window form on signed zeros
  private def better(a: ScoredId, b: ScoredId): Boolean = {
    val c = java.lang.Double.compare(a.score, b.score)
    c > 0 || (c == 0 && a.id < b.id)
  }

  override def zero: List[ScoredId] = Nil

  override def reduce(buf: List[ScoredId], a: ScoredId): List[ScoredId] = {
    // insert in order, keep first k — List ops on a ≤k+1 element list
    val (pre, post) = buf.span(better(_, a))
    if (pre.length >= k) buf else (pre ::: (a :: post)).take(k)
  }

  override def merge(b1: List[ScoredId], b2: List[ScoredId]): List[ScoredId] = {
    val out = List.newBuilder[ScoredId]
    var (x, y) = (b1, b2)
    var n = 0
    while (n < k && (x.nonEmpty || y.nonEmpty)) {
      if (y.isEmpty || (x.nonEmpty && better(x.head, y.head))) {
        out += x.head; x = x.tail
      } else { out += y.head; y = y.tail }
      n += 1
    }
    out.result()
  }

  override def finish(r: List[ScoredId]): Seq[ScoredId] = r

  override def bufferEncoder: Encoder[List[ScoredId]] =
    ExpressionEncoder[List[ScoredId]]()
  override def outputEncoder: Encoder[Seq[ScoredId]] =
    ExpressionEncoder[Seq[ScoredId]]()
}

/** (score, id) candidate — a named case class so the Aggregator's input
  * and buffer encoders are plain product encoders. */
case class ScoredId(score: Double, id: Long)

object TopKAgg {
  /** Untyped column form: `topK(5)(scoreCol, idCol)` → array<struct<score,id>>
    * sorted best-first. Compose with posexplode for (rank, id, score) rows.
    * (udaf flattens a product input encoder into one parameter per field,
    * so the returned function takes the two columns directly.) */
  def topK(k: Int): (Column, Column) => Column = {
    val fn = udaf(TopKAgg(k), ExpressionEncoder[ScoredId]())
    (score: Column, id: Column) => fn(score, id)
  }
}
