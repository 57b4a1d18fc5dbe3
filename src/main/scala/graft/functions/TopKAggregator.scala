package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed top-k aggregator (SURVEY.md §2.8: "custom Aggregator[IN,BUF,OUT]
  * for similarity top-k"). Keeps a bounded, sorted buffer per partition
  * and merges buffers pairwise — the scale-correct alternative to
  * window row_number over ALL scored candidates, which must shuffle and
  * sort every candidate row. With this aggregator only k rows per
  * partition survive the shuffle.
  *
  * Ordering: score desc, then id asc — the same deterministic tie-break
  * the window formulation uses, so results are identical.
  */
object TopKAggregator {

  case class Scored(id: Long, score: Double)

  private def better(a: Scored, b: Scored): Boolean =
    a.score > b.score || (a.score == b.score && a.id < b.id)

  /** Insert keeping the buffer sorted (best-first) and bounded at k. */
  private def insert(buf: List[Scored], x: Scored, k: Int): List[Scored] = {
    val (front, back) = buf.span(better(_, x))
    val merged = front ::: x :: back
    if (merged.length > k) merged.take(k) else merged
  }

  def topK(k: Int): Aggregator[Scored, List[Scored], Seq[Scored]] =
    new Aggregator[Scored, List[Scored], Seq[Scored]] {
      override def zero: List[Scored] = Nil
      override def reduce(b: List[Scored], a: Scored): List[Scored] =
        insert(b, a, k)
      override def merge(b1: List[Scored], b2: List[Scored]): List[Scored] =
        b2.foldLeft(b1)((acc, x) => insert(acc, x, k))
      override def finish(r: List[Scored]): Seq[Scored] = r
      override def bufferEncoder: Encoder[List[Scored]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[List[Scored]]()
      override def outputEncoder: Encoder[Seq[Scored]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Scored]]()
    }
}
