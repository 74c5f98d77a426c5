package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** One reservoir entry: the A-ES rank key and the document it ranks. */
final case class KeyedDoc(key: Double, doc_id: Long)

/** Bounded weighted-reservoir aggregator — the typed `Aggregator`
  * (custom UDAF) form of A-ES top-k per GROUP: each group keeps the k
  * lexicographically smallest (key, doc_id) entries, where key =
  * -ln(u)/w is the Efraimidis–Spirakis exponential rank (q105's
  * whole-corpus formulation, per group here).
  *
  * The scale property is the MERGEABLE BOUNDED buffer: Spark plans a
  * typed Aggregator as ObjectHashAggregate with partial aggregation,
  * so every map task reduces its slice to ≤ 2k entries per group
  * BEFORE the shuffle and `merge` combines partials associatively —
  * the exchange carries O(groups × k × tasks) entries, never the
  * corpus, which is what makes "a weighted sample per source" safe at
  * 100 TB. (A window-rank formulation shuffles every row to its
  * group.) Determinism: the key is a pure function of (doc_id, w) and
  * (key, doc_id) ordering is total, so any partition assignment and
  * any merge order produce the same reservoir — the same property the
  * SQL window oracle checks.
  */
final class ReservoirTopK(k: Int)
    extends Aggregator[KeyedDoc, Seq[KeyedDoc], Seq[KeyedDoc]] {
  require(k > 0)

  private def lt(a: KeyedDoc, b: KeyedDoc): Boolean =
    a.key < b.key || (a.key == b.key && a.doc_id < b.doc_id)

  private def trim(xs: Seq[KeyedDoc]): Seq[KeyedDoc] = xs.sortWith(lt).take(k)

  /** Amortization bound: `reduce` appends without sorting until the
    * buffer reaches 2k (min 64), then trims back to k — one
    * O(cap log cap) sort per ≥k appends is O(log k) amortized per row,
    * vs the previous trim-per-row O(k log k). The exchange still
    * carries ≤ cap = O(k) entries per partial, so the mergeable-
    * bounded-buffer scale property is unchanged; `merge`/`finish`
    * trim exactly, so the result is bit-identical to the always-
    * sorted form (the (key, doc_id) order is total). */
  private val cap = math.max(2 * k, 64)

  override def zero: Seq[KeyedDoc] = Seq.empty

  override def reduce(b: Seq[KeyedDoc], a: KeyedDoc): Seq[KeyedDoc] = {
    val nb = b :+ a
    if (nb.size > cap) trim(nb) else nb
  }

  override def merge(b1: Seq[KeyedDoc], b2: Seq[KeyedDoc]): Seq[KeyedDoc] =
    trim(b1 ++ b2)

  override def finish(r: Seq[KeyedDoc]): Seq[KeyedDoc] = trim(r)

  override def bufferEncoder: Encoder[Seq[KeyedDoc]] = ExpressionEncoder()

  override def outputEncoder: Encoder[Seq[KeyedDoc]] = ExpressionEncoder()
}
