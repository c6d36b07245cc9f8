package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic random-hyperplane machinery shared by the ANN bucket
  * path (s02) and the LSH-gated embedding dedup (d05).
  *
  * Each hyperplane is a ±1 sign vector derived from md5 — the one hash
  * primitive that is byte-identical across Spark and DuckDB (SURVEY.md
  * §4) — so the SAME buckets are computable in both engines and every
  * pipeline built on them is exactly oracle-checkable. Sign for
  * (table, plane, dim) = +1 iff the first hex digit of
  * md5("table:plane:dim") is even.
  *
  * The signed projection is a SEQUENTIAL fold (Spark `aggregate`,
  * DuckDB `list_reduce`, both left-to-right) so the float sum — and
  * therefore the sign test — is bit-identical in both engines. Sign
  * arrays are materialized driver-side as expression literals: zero
  * per-row hashing at scale.
  */
object Hyperplanes {

  /** Embedding dimensionality of the `embeddings` table. */
  val DIM = 64

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** +1.0 / -1.0 sign for one (table, plane, dimension) cell. */
  def sign(table: Int, plane: Int, i: Int): Double =
    if ("02468ace".contains(md5hex(s"$table:$plane:$i").charAt(0))) 1.0 else -1.0

  def signs(table: Int, plane: Int): IndexedSeq[Double] =
    (0 until DIM).map(sign(table, plane, _))

  /** Signed projection of `vecCol` onto hyperplane (table, plane) as a
    * Spark SQL expression string — sequential left fold over the
    * element products. (A flat 64-term ± expression tree was tried and
    * is ~10× SLOWER: 3200 scalar nodes per row blow the codegen method
    * limits into interpreted evaluation; one higher-order fold per
    * plane is the faster shape.)
    */
  def projExpr(vecCol: String, table: Int, plane: Int): String = {
    val arr = signs(table, plane)
      .map(s => if (s > 0) "1.0D" else "-1.0D").mkString(", ")
    s"aggregate(zip_with($vecCol, array($arr), (x, s) -> CAST(x AS DOUBLE) * s), " +
      "CAST(0.0 AS DOUBLE), (acc, y) -> acc + y)"
  }

  /** Bucket id for one table: `planes` sign bits packed little-endian. */
  def bucketCol(vecCol: String, table: Int, planes: Int): Column =
    (0 until planes)
      .map(p => when(expr(projExpr(vecCol, table, p)) > 0, lit(1 << p)).otherwise(lit(0)))
      .reduce(_ + _)

  /** DuckDB twin of [[projExpr]] — same fold order, same literals. */
  def projSql(vecCol: String, table: Int, plane: Int): String = {
    val arr = signs(table, plane)
      .map(s => if (s > 0) "1.0" else "-1.0").mkString(", ")
    s"list_reduce(list_transform(range(1, ${DIM + 1}), " +
      s"i -> $vecCol[i]::DOUBLE * ([$arr])[i]), (a, b) -> a + b)"
  }

  /** DuckDB twin of [[bucketCol]]. */
  def bucketSql(vecCol: String, table: Int, planes: Int): String =
    (0 until planes)
      .map(p => s"(CASE WHEN ${projSql(vecCol, table, p)} > 0 THEN ${1 << p} ELSE 0 END)")
      .mkString(" + ")
}
