package graft.functions

/** Shared word-tokenize + word-k-gram construction used by the
  * corpus operators (p06 contamination, p09 repetition, d07
  * boilerplate). One definition on each engine side so a
  * tokenization change can never silently de-synchronize operators
  * that claim identical gram semantics.
  *
  * Tokens = `split(lower(trim(text)), '\s+')`; a k-gram = k
  * consecutive tokens joined with a single space.
  */
object TextGrams {

  /** Spark SQL expression string: tokens array from a text column. */
  def tokensExpr(textCol: String): String =
    s"split(lower(trim($textCol)), '\\\\s+')"

  /** Spark SQL expression string: word-k-grams over a tokens array
    * column `tsCol` (requires `size(tsCol) >= k`).
    */
  def gramExpr(tsCol: String, k: Int): String = {
    val parts = (0 until k).map {
      case 0 => s"element_at($tsCol, i)"
      case j => s"element_at($tsCol, CAST(i+$j AS INT))"
    }.mkString(", ")
    s"transform(sequence(1, size($tsCol)-${k - 1}), i -> concat_ws(' ', $parts))"
  }

  /** DuckDB twin of [[tokensExpr]]. */
  def tokensSql(textCol: String): String =
    s"string_split_regex(lower(trim($textCol)), '\\s+')"

  /** DuckDB twin of [[gramExpr]]. */
  def gramSql(tsCol: String, k: Int): String = {
    val parts = (0 until k).map {
      case 0 => s"$tsCol[i]"
      case j => s"$tsCol[i+$j]"
    }.mkString(" || ' ' || ")
    s"list_transform(range(1, len($tsCol) - ${k - 2}), i -> $parts)"
  }
}
