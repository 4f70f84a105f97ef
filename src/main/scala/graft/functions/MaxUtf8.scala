package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Max of a string column under UNSIGNED UTF-8 BYTE order — the order
  * Spark's native `max(string)` (UTF8String.compareTo) and DuckDB's
  * binary-collation `max(varchar)` both use. Exists because Catalyst's
  * `Max` over a var-length type cannot run in HashAggregateExec (the
  * UnsafeRow aggregation buffer only mutates fixed-size fields), so
  * `max(string)` group-bys silently fall back to SortAggregate — a
  * per-partition sort of the whole input. As a typed Aggregator this
  * plans as ObjectHashAggregate: hash-table grouping, partial
  * aggregation before the shuffle, no sort anywhere.
  *
  * Not `java.lang.String` comparison: that orders by UTF-16 code unit,
  * which disagrees with UTF-8 byte order for supplementary-plane
  * characters (surrogates sort below U+E000..U+FFFF, while their code
  * points sort above) — this aggregator must agree with the native
  * `max` it replaces, so it compares the raw UTF-8 bytes. */
final class MaxUtf8Aggregator extends Aggregator[String, String, String] {

  private def utf8Lt(a: String, b: String): Boolean = {
    val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val n = math.min(x.length, y.length)
    var i = 0
    while (i < n) {
      val c = (x(i) & 0xff) - (y(i) & 0xff)
      if (c != 0) return c < 0
      i += 1
    }
    x.length < y.length
  }

  override def zero: String = null
  override def reduce(b: String, x: String): String =
    if (x == null) b else if (b == null || utf8Lt(b, x)) x else b
  override def merge(a: String, b: String): String = reduce(a, b)
  override def finish(b: String): String = b
  override def bufferEncoder: Encoder[String] = Encoders.STRING
  override def outputEncoder: Encoder[String] = Encoders.STRING
}
