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

  // ── round-3 breadth: the remaining reference DateParserTest families ──

  test("dd-MMM-yyyy: 21-Aug-2005") {
    val r = DateParser.parseDate("21-Aug-2005").get
    assert(r.startYear == "2005" && r.startMonth == "08" && r.startDay == "21")
    assert(r.singleDate)
  }

  test("MMM-yyyy: Aug-2005 is a month date") {
    val r = DateParser.parseDate("Aug-2005").get
    assert(r.startYear == "2005" && r.startMonth == "08" && r.startDay == "")
    assert(r.startDate.get.toString == "2005-08-01")
    assert(r.endDate.get.toString == "2005-08-31")
  }

  test("MMM-yy: Jan-94 resolves 2-digit year with 1920 pivot") {
    val r = DateParser.parseDate("Jan-94").get
    assert(r.startYear == "1994" && r.startMonth == "01")
    // below the pivot wraps to 2000s
    assert(DateParser.parseDate("Jan-15").get.startYear == "2015")
    assert(DateParser.parseDate("Jan-21").get.startYear == "1921")
  }

  test("dd-MMM-yy and dd/MM/yy truncated-year forms") {
    val r = DateParser.parseDate("14-Jan-94").get
    assert(r.startYear == "1994" && r.startMonth == "01" && r.startDay == "14")
    val r2 = DateParser.parseDate("05/02/78").get
    assert(r2.startYear == "1978" && r2.startMonth == "02" && r2.startDay == "05")
    val r3 = DateParser.parseDate("01/02/01").get
    assert(r3.startYear == "2001" && r3.startMonth == "02" && r3.startDay == "01")
  }

  test("dd-MM-yyyy: 12-06-2005") {
    val r = DateParser.parseDate("12-06-2005").get
    assert(r.startYear == "2005" && r.startMonth == "06" && r.startDay == "12")
  }

  test("verbose EEE MMM dd HH:mm:ss zzz yyyy: Fri Aug 12 15:19:20 EST 2011") {
    val r = DateParser.parseDate("Fri Aug 12 15:19:20 EST 2011").get
    assert(r.startYear == "2011" && r.startMonth == "08" && r.startDay == "12")
  }

  test("verbose range Mon Apr 23 .. 1984/Sun Apr 29 .. 1984") {
    val r = DateParser.parseDate(
      "Mon Apr 23 00:00:00 EST 1984/Sun Apr 29 00:00:00 EST 1984").get
    assert(r.startDay == "23" && r.endDay == "29")
    assert(r.startYear == "1984" && r.endYear == "1984" && !r.singleDate)
  }

  test("day-month range end completion: 1998-9-30/10-7") {
    for (s <- Seq("1998-9-30/10-7", "1998-09-30/10-07")) {
      val r = DateParser.parseDate(s).get
      assert(r.startMonth == "09" && r.startDay == "30", s)
      assert(r.endMonth == "10" && r.endDay == "07", s)
      assert(r.endDate.get.toString == "1998-10-07", s)
    }
  }

  test("dmy ranges with '&' and 'to' separators") {
    for (s <- Seq("05-02-1978/06-03-1979", "05-02-1978 & 06-03-1979",
      "05-02-1978 to 06-03-1979")) {
      val r = DateParser.parseDate(s).get
      assert(r.startYear == "1978" && r.startDay == "05", s)
      assert(r.endYear == "1979" && r.endDay == "06", s)
    }
  }

  test("day 00 means year-month: 2011-05-00") {
    val r = DateParser.parseDate("2011-05-00").get
    assert(r.startYear == "2011" && r.startMonth == "05" && r.startDay == "")
  }

  test("bare Z suffix and short offsets") {
    assert(DateParser.parseDate("2011-10-31Z").get.startDay == "31")
    assert(DateParser.parseDate("2001-03-14T00:00:00+11").get.startDay == "14")
    assert(DateParser.parseDate("2001-03-14T00:00:00-1130").get.startDay == "14")
    assert(DateParser.parseDate("2001-03-14T00:00:00-05").get.startDay == "14")
  }

  test("MM uuuu and MMMM uuuu month dates") {
    assert(DateParser.parseDate("06 1994").get.startMonth == "06")
    val r = DateParser.parseDate("June 1994").get
    assert(r.startYear == "1994" && r.startMonth == "06")
  }

  test("leading slash or hyphen is shed") {
    assert(DateParser.parseDate("/1994").get.startYear == "1994")
    assert(DateParser.parseDate("-1994-06").get.startMonth == "06")
  }

  test("leap years: 2000-02-29 and 2012-02-29 valid, 2014-02-29 not") {
    assert(DateParser.parseDate("2000-02-29").isDefined)
    assert(DateParser.parseDate("2012-02-29").isDefined)
    assert(DateParser.parseDate("2014-02-29").isEmpty)
    assert(DateParser.parseDate("0 01").isEmpty)
  }
}
