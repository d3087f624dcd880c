package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Per-group text statistics in ONE pass — a typed
  * `Aggregator[IN, BUF, OUT]` (SURVEY §7.3's custom-aggregate
  * showcase). The buffer is algebraic (merge is associative +
  * commutative), so Spark runs it map-side partial → shuffle → final,
  * like any built-in aggregate; usable as a `TypedColumn` via
  * `toColumn` or registered with `functions.udaf`.
  */
object TokenStatsAggregator extends Aggregator[String, TokenStatsBuf, TokenStats] {

  override def zero: TokenStatsBuf = TokenStatsBuf(0L, 0L, 0L, 0L)

  override def reduce(b: TokenStatsBuf, text: String): TokenStatsBuf =
    if (text == null) b.copy(nDocs = b.nDocs + 1)
    else {
      val toks = text.trim.split("\\s+").count(_.nonEmpty).toLong
      TokenStatsBuf(b.nDocs + 1, b.nTokens + toks, b.nChars + text.length,
        math.max(b.maxTokens, toks))
    }

  override def merge(a: TokenStatsBuf, b: TokenStatsBuf): TokenStatsBuf =
    TokenStatsBuf(a.nDocs + b.nDocs, a.nTokens + b.nTokens,
      a.nChars + b.nChars, math.max(a.maxTokens, b.maxTokens))

  override def finish(b: TokenStatsBuf): TokenStats =
    TokenStats(b.nDocs, b.nTokens, b.nChars, b.maxTokens,
      if (b.nDocs == 0) 0.0 else b.nTokens.toDouble / b.nDocs.toDouble)

  override def bufferEncoder: Encoder[TokenStatsBuf] = Encoders.product[TokenStatsBuf]
  override def outputEncoder: Encoder[TokenStats] = Encoders.product[TokenStats]
}

case class TokenStatsBuf(nDocs: Long, nTokens: Long, nChars: Long, maxTokens: Long)
case class TokenStats(
    n_docs: Long, n_tokens: Long, n_chars: Long, max_tokens: Long, avg_tokens: Double)
