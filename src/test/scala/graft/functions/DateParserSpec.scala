package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Format cases carried over from the reference date-parser test suite
  * (behavioural parity, `DateParserTest.scala` in /root/reference/src/test). */
class DateParserSpec extends AnyFunSuite {

  test("ISO datetime 2012-01-01T10:22:00") {
    val r = DateParser.parseDate("2012-01-01T10:22:00").get
    assert(r.startYear == "2012" && r.startMonth == "01" && r.startDay == "01")
    assert(r.singleDate)
  }

  test("year only 2012 -> Jan 1 start, Dec 31 end, not single") {
    val r = DateParser.parseDate("2012").get
    assert(r.startDate.get.toString == "2012-01-01")
    assert(r.endDate.get.toString == "2012-12-31")
    assert(!r.singleDate)
  }

  test("year-month 2012-02") {
    val r = DateParser.parseDate("2012-02").get
    assert(r.startDate.get.toString == "2012-02-01")
    assert(r.startYear == "2012" && r.startMonth == "02")
  }

  test("millis + zone variants") {
    for (s <- Seq("2013-11-06T19:59:14.961", "2013-11-06T19:59:14.961+1000",
      "2013-11-06T19:59:14.961+10:00")) {
      val r = DateParser.parseDate(s).get
      assert(r.startYear == "2013" && r.startMonth == "11" && r.startDay == "06", s)
      assert(r.singleDate, s)
    }
  }

  test("minutes-only time with zone 2018-09-19T08:50+1000") {
    val r = DateParser.parseDate("2018-09-19T08:50+1000").get
    assert(r.startYear == "2018" && r.startMonth == "09" && r.startDay == "19")
  }

  test("month names 1978-April-01 / 1978-December-01") {
    assert(DateParser.parseDate("1978-April-01").get.startMonth == "04")
    assert(DateParser.parseDate("1978-December-01").get.startMonth == "12")
  }

  test("trailing hyphen 1978-01-") {
    val r = DateParser.parseDate("1978-01-").get
    assert(r.startYear == "1978" && r.startMonth == "01")
  }

  test("date range 1978-01-01/1979-02-13") {
    val r = DateParser.parseDate("1978-01-01/1979-02-13").get
    assert(r.startYear == "1978" && r.endYear == "1979")
    assert(r.startMonth == "01" && r.endMonth == "02")
    assert(!r.singleDate)
  }

  test("month range 1978-01/1979-05") {
    val r = DateParser.parseDate("1978-01/1979-05").get
    assert(r.startYear == "1978" && r.endYear == "1979" && r.endMonth == "05")
  }

  test("year range 1978/1991 and same-century 1978/91") {
    for (s <- Seq("1978/1991", "1978/91")) {
      val r = DateParser.parseDate(s).get
      assert(r.startYear == "1978" && r.endYear == "1991", s)
      assert(!r.singleDate)
    }
  }

  test("abbreviated day range 2007-11-13/15 completes from start month") {
    val r = DateParser.parseDate("2007-11-13/15").get
    assert(r.startYear == "2007" && r.startMonth == "11" && r.startDay == "13")
    assert(r.endYear == "2007" && r.endMonth == "11" && r.endDay == "15")
    assert(r.endDate.get.toString == "2007-11-15")
    assert(!r.singleDate)
  }

  test("abbreviated month range 1906-06/07 completes from start year") {
    val r = DateParser.parseDate("1906-06/07").get
    assert(r.startYear == "1906" && r.startMonth == "06")
    assert(r.endYear == "1906" && r.endMonth == "07")
    assert(r.endDate.get.toString == "1906-07-31")
  }

  test("timestamp range collapsing to single date") {
    val r = DateParser.parseDate("2005-06-12 00:00:00.0/2005-06-12 00:00:00.0").get
    assert(r.singleDate)
    assert(r.startYear == "2005" && r.startDay == "12")
  }

  test("timestamp range spanning years") {
    val r = DateParser.parseDate("2002-03-10 00:00:00.0/2003-03-10 00:00:00.0").get
    assert(r.startYear == "2002" && r.endYear == "2003" && !r.singleDate)
  }

  test("garbage returns None") {
    assert(DateParser.parseDate("not a date").isEmpty)
    assert(DateParser.parseDate("").isEmpty)
    assert(DateParser.parseDate(null).isEmpty)
    assert(DateParser.parseDate("2012-13-40").isEmpty)
  }
}
