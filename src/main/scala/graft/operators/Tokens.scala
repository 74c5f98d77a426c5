package graft.operators

/** THE tokenization of this engine, in both dialects — whitespace
  * split of the lowercased text, empties dropped, multiplicity kept.
  * Dedup sketches (q30-q35) and text analysis (q40-q49) must agree on
  * one tokenization or their oracles silently diverge; both modules
  * reference these single definitions.
  *
  * Also the shared md5-first-byte uniform hash (range [0, 256)) used
  * by every deterministic sampling operator (q16/q19/q19b) — one
  * definition per dialect keeps the Spark and DuckDB sides in
  * lockstep. */
object Tokens {

  /** Spark SQL: array<string> of whitespace tokens of `text`. */
  val toksExpr: String =
    "filter(split(lower(text), '\\\\s+'), t -> t != '')"

  /** DuckDB: the same token list. */
  val toksSql: String =
    "list_filter(string_split_regex(lower(text), '\\s+'), t -> t <> '')"

  /** Spark SQL: uniform hash in [0, 256) from the first two md5 hex
    * digits of `keyExpr` cast to string. */
  def mdByteExpr(keyExpr: String): String =
    s"(instr('0123456789abcdef', substr(md5(cast($keyExpr AS STRING)), 1, 1)) - 1) * 16" +
      s" + (instr('0123456789abcdef', substr(md5(cast($keyExpr AS STRING)), 2, 1)) - 1)"

  /** DuckDB: the same uniform hash. */
  def mdByteSql(keyExpr: String): String =
    s"(instr('0123456789abcdef', substr(md5(CAST($keyExpr AS VARCHAR)), 1, 1)) - 1) * 16" +
      s" + (instr('0123456789abcdef', substr(md5(CAST($keyExpr AS VARCHAR)), 2, 1)) - 1)"

  /** Fold the first `digits` hex digits of hex-string expression `h`
    * into a uniform non-negative BIGINT (numeric order == the
    * lexicographic order of the fixed-length hex prefix). The fold is
    * written with instr/substr only, whose semantics are identical in
    * Spark SQL and DuckDB — ONE definition serves both dialects, so
    * any key or sketch built from it is in lockstep across engines
    * (identical values, hence identical joins/order statistics, even
    * under hash truncation). Each weight is CAST to BIGINT: weights
    * below 2^31 would otherwise be INT literals and 15 * 16^7
    * overflows int32 under ANSI mode. */
  def hexFold(h: String, digits: Int): String =
    (0 until digits).map { i =>
      s"(instr('0123456789abcdef', substr($h, ${i + 1}, 1)) - 1)" +
        s" * CAST(${BigInt(16).pow(digits - 1 - i)} AS BIGINT)"
    }.mkString(" + ")

  /** 48-bit fold (12 hex digits) — the sampling/sketch hash width. */
  def hex48(h: String): String = hexFold(h, 12)
}
