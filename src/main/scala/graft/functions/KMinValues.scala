package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** k-minimum-values sketch accumulator: keeps the k smallest *distinct*
  * values seen, as a sorted ascending array.
  *
  * This is the distributed shape of a KMV distinct sketch (reference
  * exposes sketching via its engine's approx aggregates; ours is
  * deterministic so the sketch itself is oracle-checkable): each map task
  * folds its rows into a ≤k-element buffer (binary-search insert, O(log k)
  * compare + bounded copy), the shuffle moves at most k longs per
  * (partition, group) — never the full distinct set — and merges are
  * linear two-pointer unions. Contrast with a row_number window over all
  * distinct hashes, which sorts every distinct value of a group on one
  * reducer; at 100 TB that global sort is the bottleneck, this never
  * materializes more than k values anywhere.
  *
  * Values are assumed non-null (callers filter); duplicates are absorbed
  * by the sketch itself, so no upstream distinct pass is needed.
  */
class KMinAgg(k: Int) extends Aggregator[Long, Array[Long], Array[Long]] {

  override def zero: Array[Long] = Array.emptyLongArray

  override def reduce(b: Array[Long], x: Long): Array[Long] = {
    val pos = java.util.Arrays.binarySearch(b, x)
    if (pos >= 0) b // already in the sketch
    else {
      val ins = -pos - 1
      if (b.length < k) {
        val nb = new Array[Long](b.length + 1)
        System.arraycopy(b, 0, nb, 0, ins)
        nb(ins) = x
        System.arraycopy(b, ins, nb, ins + 1, b.length - ins)
        nb
      } else if (ins < k) {
        // saturated: shift the tail right in place, dropping the max
        System.arraycopy(b, ins, b, ins + 1, k - ins - 1)
        b(ins) = x
        b
      } else b // larger than the current k-th minimum: no-op
    }
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    if (a.isEmpty) return b
    if (b.isEmpty) return a
    val out = new Array[Long](math.min(k, a.length + b.length))
    var i = 0; var j = 0; var m = 0
    var last = 0L; var seen = false
    while (m < out.length && (i < a.length || j < b.length)) {
      val v =
        if (j >= b.length || (i < a.length && a(i) <= b(j))) {
          val t = a(i); i += 1; t
        } else { val t = b(j); j += 1; t }
      if (!seen || v != last) { out(m) = v; m += 1; last = v; seen = true }
    }
    if (m == out.length) out else java.util.Arrays.copyOf(out, m)
  }

  override def finish(r: Array[Long]): Array[Long] = r

  override def bufferEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()
}
