package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Cross-engine-exact aggregation helpers.
  *
  * Floating-point SUM is order-dependent; Spark's partial aggregation
  * order differs from a single-threaded oracle, so `sum(double)` can
  * diverge in the low bits. Casting each addend to DECIMAL makes the
  * sum exact (and order-independent); casting the final result to
  * DOUBLE yields bit-identical values in Spark and DuckDB.
  */
object Exact {

  /** Exact SUM of a numeric column: decimal-accumulate, emit double. */
  def dsum(c: Column, scale: Int = 2): Column =
    sum(c.cast(DecimalType(18, scale))).cast("double")

  /** Exact AVG: decimal sum as double, one IEEE division by count —
    * bit-identical across engines (unlike avg(double)).
    */
  def davg(c: Column, scale: Int = 2): Column =
    (sum(c.cast(DecimalType(18, scale))).cast("double") / count(c)).cast("double")

  /** percentage num*100.0/den with NULLIF(den,0) guard, double IEEE. */
  def pct(num: Column, den: Column): Column =
    num.cast("double") * lit(100.0) / when(den === 0, null).otherwise(den.cast("double"))

  /** Guarded ratio num/den (NULL when den = 0). */
  def ratio(num: Column, den: Column): Column =
    num.cast("double") / when(den === 0, null).otherwise(den.cast("double"))
}
