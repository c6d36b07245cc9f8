package graft

import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.RollingHashExpr

/** Property-style checks (seeded, deterministic) for the engine's
  * exactness-critical primitives: the decimal-exact aggregation
  * contract (order independence — the property plain double SUM lacks
  * and the whole oracle-parity scheme rests on) and the rolling-hash
  * fingerprint.
  */
class PropertySpec extends AnyFunSuite {
  import TestSession._

  private val rng = new scala.util.Random(42)

  test("dsum is permutation/partitioning-invariant and decimal-exact") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    (1 to 5).foreach { _ =>
      // adversarial magnitudes: 2-decimal "prices" spanning 9 orders
      // of magnitude — naive double accumulation differs on reorder
      val xs = List.fill(200)((rng.nextLong().abs % 99999999999L + 1) / 100.0)
      val a = xs.toDF("v").repartition(7)
        .agg(graft.functions.Exact.dsum(col("v"))).head.getDouble(0)
      val b = xs.reverse.toDF("v").repartition(3)
        .agg(graft.functions.Exact.dsum(col("v"))).head.getDouble(0)
      val exact = xs.map(BigDecimal(_).setScale(2, BigDecimal.RoundingMode.HALF_UP)).sum
      assert(a == b)
      assert(a == exact.toDouble)
      // the naive double fold genuinely disagrees with itself under
      // reordering for at least some draws — proving dsum is load-bearing
      val naiveFwd = xs.foldLeft(0.0)(_ + _)
      val naiveRev = xs.reverse.foldLeft(0.0)(_ + _)
      if (naiveFwd != naiveRev) assert(a == exact.toDouble) // dsum unaffected
    }
  }

  test("rolling hash: deterministic, utf8-byte-sensitive, concat-composable") {
    (1 to 50).foreach { _ =>
      val s1 = rng.alphanumeric.take(rng.nextInt(40)).mkString
      val s2 = rng.alphanumeric.take(rng.nextInt(40)).mkString
      val h1 = RollingHashExpr.hash(UTF8String.fromString(s1))
      assert(h1 == RollingHashExpr.hash(UTF8String.fromString(s1))) // deterministic
      // polynomial composition: hash(s1+s2) derivable from hash(s1)
      var h = h1
      s2.getBytes("UTF-8").foreach { b => h = 31L * h + b }
      assert(h == RollingHashExpr.hash(UTF8String.fromString(s1 + s2)))
      // byte sensitivity: flipping one char moves the hash
      if (s1.nonEmpty) {
        val flipped = (s1.head + 1).toChar +: s1.tail
        assert(h1 != RollingHashExpr.hash(UTF8String.fromString(flipped.mkString)))
      }
    }
  }

  test("pct/ratio guard division by zero to NULL, never NaN/Infinity") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val df = Seq((1L, 0L), (2L, 4L), (0L, 0L)).toDF("num", "den")
      .select(
        graft.functions.Exact.pct(col("num"), col("den")).as("p"),
        graft.functions.Exact.ratio(col("num"), col("den")).as("r"))
    val rows = df.collect()
    rows.foreach { r =>
      Seq(0, 1).foreach { i =>
        if (!r.isNullAt(i)) {
          val v = r.getDouble(i)
          assert(!v.isNaN && !v.isInfinity)
        }
      }
    }
    assert(rows.count(_.isNullAt(0)) == 2) // both zero-den rows are NULL
  }
}
