package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class ExtensionsSpec extends AnyFunSuite {

  test("GraftExtensions injects rolling_hash into a fresh session") {
    val base = TestSession.spark // ensure shared context exists first
    val prevDefault = SparkSession.getDefaultSession
    val prevActive = SparkSession.getActiveSession
    try {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      val s = SparkSession.builder()
        .master("local[4]")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      val h = s.sql("SELECT rolling_hash('spark') AS h").head.getLong(0)
      val direct = graft.functions.RollingHashExpr.hash(
        org.apache.spark.unsafe.types.UTF8String.fromString("spark"))
      assert(h == direct)
      val err = intercept[Exception](s.sql("SELECT rolling_hash('a','b')").collect())
      assert(err.getMessage.contains("rolling_hash expects 1 argument"))
    } finally {
      prevDefault.foreach(SparkSession.setDefaultSession)
      prevActive.foreach(SparkSession.setActiveSession)
    }
    assert(base.sql("SELECT 1").count() == 1)
  }
}
