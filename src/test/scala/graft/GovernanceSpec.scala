package graft

import org.scalatest.funsuite.AnyFunSuite

class GovernanceSpec extends AnyFunSuite {
  import TestSession._

  test("governed connection enforces row filter and masks; ungoverned connection is untouched") {
    val governed = Engine.connect(spark)
    Engine.openGoverned(governed, sf, Seq(
      Engine.Policy("customer",
        rowFilter = Some("c_mktsegment = 'BUILDING'"),
        masks = Map(
          "c_name" -> Engine.MaskShowLast4,
          "c_acctbal" -> Engine.MaskNull))))

    val rows = governed.sql(
      "SELECT c_name, c_acctbal, c_mktsegment FROM customer").collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getString(2) == "BUILDING"), "row filter leaked other segments")
    assert(rows.forall(_.isNullAt(1)), "null mask leaked acctbal")
    assert(rows.forall(r => r.getString(0).dropRight(4).forall(_ == 'X')),
      "show-last-4 mask leaked name prefix")
    assert(rows.forall(_.getString(0).length >= 4))

    // a second, ungoverned connection over the same engine sees raw data
    val open = Engine.connect(spark)
    Engine.open(open, sf)
    val raw = open.sql("SELECT c_name, c_acctbal FROM customer").collect()
    assert(raw.exists(r => !r.isNullAt(1)), "ungoverned connection lost acctbal")
    assert(raw.exists(_.getString(0).startsWith("Customer#")),
      "ungoverned connection lost raw names")
    assert(raw.length > rows.length, "row filter should shrink the governed view")
  }

  test("hash mask is a stable deterministic transform") {
    val governed = Engine.connect(spark)
    Engine.openGoverned(governed, sf, Seq(
      Engine.Policy("customer", masks = Map("c_name" -> Engine.MaskHash))))
    val a = governed.sql("SELECT c_custkey, c_name FROM customer ORDER BY c_custkey LIMIT 5").collect()
    val b = governed.sql("SELECT c_custkey, c_name FROM customer ORDER BY c_custkey LIMIT 5").collect()
    assert(a.map(_.getString(1)).sameElements(b.map(_.getString(1))))
    assert(a.forall(_.getString(1).matches("[0-9a-f]{32}")), "hash mask should emit md5 hex")
  }

  test("date-show-year mask coarsens timestamps to Jan 1") {
    val governed = Engine.connect(spark)
    Engine.openGoverned(governed, sf, Seq(
      Engine.Policy("orders", masks = Map("o_orderdate" -> Engine.MaskDateYear))))
    val dates = governed.sql("SELECT DISTINCT o_orderdate FROM orders").collect()
    assert(dates.nonEmpty)
    assert(dates.forall { r =>
      val d = r.getDate(0).toLocalDate
      d.getMonthValue == 1 && d.getDayOfMonth == 1
    }, "masked dates must collapse to the year start")
  }
}
