package graft.functions

import java.time.LocalDate
import org.scalatest.funsuite.AnyFunSuite
import graft.model.AssertionCodes._

/** Behavioural parity with the reference EVENT processor, case-for-case from
  * `ProcessEventTest.scala` and `DatePrecisionTest.scala` in
  * /root/reference/src/test/scala/au/org/ala/biocache/. Date expectations are
  * the typed equivalents of the reference's formatted strings: a
  * month-precision "1978-12" is epoch day of 1978-12-01 plus
  * datePrecision "Month". */
class EventKernelSpec extends AnyFunSuite {

  private def run(eventDate: String = null, eventDateEnd: String = null,
      year: String = null, month: String = null, day: String = null,
      verbatim: String = null, datePrecision: String = null,
      modified: String = null, dateIdentified: String = null,
      georeferenced: String = null): EventResult =
    EventKernel.process(eventDate, eventDateEnd, year, month, day, verbatim,
      datePrecision, modified, dateIdentified, georeferenced)

  private def d(s: String): Integer = LocalDate.parse(s).toEpochDay.toInt

  private def has(r: EventResult, code: graft.model.ErrorCode): Boolean =
    r.codes.contains(code.code)

  test("yyyy-MM-dd sets year, month, day (ProcessEventTest:39)") {
    val r = run(eventDate = "1978-12-31")
    assert(r.startEpochDay == d("1978-12-31"))
    assert(r.day == 31 && r.month == 12 && r.year == 1978)
    assert(r.endEpochDay == null)
  }

  test("ISO datetime with millis (ProcessEventTest:53)") {
    val r = run(eventDate = "2013-11-06T19:59:14.961")
    assert(r.startEpochDay == d("2013-11-06"))
    assert(r.day == 6 && r.month == 11 && r.year == 2013)
    assert(r.endEpochDay == null)
  }

  test("ISO datetime with offset (ProcessEventTest:67)") {
    val r = run(eventDate = "2018-09-19T08:50+1000")
    assert(r.startEpochDay == d("2018-09-19"))
    assert(r.day == 19 && r.month == 9 && r.year == 2018)
  }

  test("identical start/end verbatim range leaves end unset (ProcessEventTest:81)") {
    val r = run(verbatim = "1978-12-31/1978-12-31")
    assert(r.startEpochDay == d("1978-12-31"))
    assert(r.day == 31 && r.month == 12 && r.year == 1978)
    assert(r.endEpochDay == null)
  }

  test("year+month+day fields make the event date (ProcessEventTest:97)") {
    val r = run(year = "1978", month = "12", day = "31")
    assert(r.startEpochDay == d("1978-12-31"))
  }

  test("two-digit year field pivots to last century (ProcessEventTest:112)") {
    val r = run(year = "78", month = "12", day = "31")
    assert(r.startEpochDay == d("1978-12-31"))
    assert(r.year == 1978)
  }

  test("day/month transposed repair (ProcessEventTest:127)") {
    val r = run(year = "78", month = "16", day = "6")
    assert(r.startEpochDay == d("1978-06-16"))
    assert(r.day == 16 && r.month == 6 && r.year == 1978)
    assert(has(r, DAY_MONTH_TRANSPOSED))
  }

  test("untransposable month invalidates the date (ProcessEventTest:144)") {
    val r = run(year = "78", month = "16", day = "16")
    assert(r.startEpochDay == null)
    assert(r.day == 16 && r.month == null && r.year == 1978)
    assert(has(r, INVALID_COLLECTION_DATE))
  }

  test("month > 12 invalidates (ProcessEventTest:163)") {
    val r = run(year = "1978", month = "40", day = "16")
    assert(r.startEpochDay == null)
    assert(r.day == 16 && r.month == null && r.year == 1978)
    assert(has(r, INVALID_COLLECTION_DATE))
  }

  test("two-digit year 11 pivots to this century (ProcessEventTest:182)") {
    val r = run(year = "11", month = "02", day = "01")
    assert(r.startEpochDay == d("2011-02-01"))
    assert(r.year == 2011)
    assert(!has(r, INVALID_COLLECTION_DATE))
  }

  test("plain valid date carries no invalid flag (ProcessEventTest:201)") {
    val r = run(eventDate = "1973-10-14")
    assert(!has(r, INVALID_COLLECTION_DATE))
    assert(r.day == 14 && r.month == 10 && r.year == 1973)
  }

  test("today parses to the current year (ProcessEventTest:218)") {
    val r = run(eventDate = LocalDate.now.toString)
    assert(r.year == LocalDate.now.getYear)
    assert(!has(r, INVALID_COLLECTION_DATE))
  }

  test("two days in the future is invalid (ProcessEventTest:229)") {
    val r = run(eventDate = LocalDate.now.plusDays(2).toString)
    assert(has(r, INVALID_COLLECTION_DATE))
  }

  test("identification predates occurrence (ProcessEventTest:240)") {
    assert(has(run(eventDate = " 2013-01-01", dateIdentified = "2012-01-01"),
      ID_PRE_OCCURRENCE))
    assert(!has(run(eventDate = " 2013-01-01", dateIdentified = "2013-01-01"),
      ID_PRE_OCCURRENCE))
  }

  test("georeferencing off the collection day (ProcessEventTest:260)") {
    assert(has(run(eventDate = " 2013-01-01", georeferenced = "2013-04-01"),
      GEOREFERENCE_POST_OCCURRENCE))
    assert(!has(run(eventDate = " 2013-01-01", georeferenced = "2013-01-01"),
      GEOREFERENCE_POST_OCCURRENCE))
  }

  test("first of month/year/century (ProcessEventTest:285)") {
    val r = run(year = "2000", month = "1", day = "1")
    assert(has(r, FIRST_OF_MONTH) && has(r, FIRST_OF_YEAR) && has(r, FIRST_OF_CENTURY))
  }

  test("first of month/year only (ProcessEventTest:307)") {
    val r = run(year = "2001", month = "1", day = "1")
    assert(has(r, FIRST_OF_MONTH) && has(r, FIRST_OF_YEAR) && !has(r, FIRST_OF_CENTURY))
  }

  test("first of month only (ProcessEventTest:329)") {
    val r = run(year = "2001", month = "2", day = "1")
    assert(has(r, FIRST_OF_MONTH) && !has(r, FIRST_OF_YEAR) && !has(r, FIRST_OF_CENTURY))
  }

  test("not first of anything (ProcessEventTest:351)") {
    val r = run(year = "2001", month = "2", day = "2")
    assert(!has(r, FIRST_OF_MONTH) && !has(r, FIRST_OF_YEAR))
  }

  test("bare year field: incomplete but not invalid (ProcessEventTest:385)") {
    val r = run(year = "2014")
    assert(has(r, INCOMPLETE_COLLECTION_DATE))
    assert(!has(r, INVALID_COLLECTION_DATE))
    assert(r.year == 2014)
  }

  test("complete day month year fields (ProcessEventTest:394)") {
    val r = run(year = "2014", month = "01", day = "11")
    assert(!has(r, INCOMPLETE_COLLECTION_DATE))
    assert(!has(r, INVALID_COLLECTION_DATE))
  }

  test("year-month eventDate: incomplete, not invalid (ProcessEventTest:405)") {
    val r = run(eventDate = "2014-02")
    assert(has(r, INCOMPLETE_COLLECTION_DATE))
    assert(!has(r, INVALID_COLLECTION_DATE))
    assert(r.startEpochDay == d("2014-02-01"))
  }

  test("invalid year-month 2012-22 (ProcessEventTest:414)") {
    val r = run(eventDate = "2012-22")
    assert(r.startEpochDay == null)
    assert(has(r, INVALID_COLLECTION_DATE))
  }

  test("dateIdentified year-only comparisons (ProcessEventTest:422-470)") {
    assert(has(run(eventDate = "2012-02-01", dateIdentified = "2011"),
      ID_PRE_OCCURRENCE))
    assert(!has(run(eventDate = "2012-01-01", dateIdentified = "2012"),
      ID_PRE_OCCURRENCE))
    assert(has(run(eventDate = "2012-02-01", dateIdentified = "2012-01-01"),
      ID_PRE_OCCURRENCE))
    assert(!has(run(eventDate = "2012-02-01", dateIdentified = "2012-02-01"),
      ID_PRE_OCCURRENCE))
    assert(!has(run(eventDate = "2012-02-01", dateIdentified = "2012-03-01"),
      ID_PRE_OCCURRENCE))
  }

  test("georeferencedDate before/same/after (ProcessEventTest:472-500)") {
    assert(has(run(eventDate = "2012-02-01", georeferenced = "2012-01-01"),
      GEOREFERENCE_POST_OCCURRENCE))
    assert(!has(run(eventDate = "2012-02-01", georeferenced = "2012-02-01"),
      GEOREFERENCE_POST_OCCURRENCE))
    assert(has(run(eventDate = "2012-02-01", georeferenced = "2012-03-01"),
      GEOREFERENCE_POST_OCCURRENCE))
  }

  test("complete vs incomplete verbatim (ProcessEventTest:520-536)") {
    assert(has(run(verbatim = "2014-02"), INCOMPLETE_COLLECTION_DATE))
    assert(!has(run(verbatim = "2014-02"), INVALID_COLLECTION_DATE))
    assert(!has(run(verbatim = "2014-02-15"), INCOMPLETE_COLLECTION_DATE))
  }

  test("First Fleet arrival implies a null date (ProcessEventTest:538)") {
    val fields = run(year = "1788", month = "01", day = "26")
    assert(has(fields, INVALID_COLLECTION_DATE))
    assert(fields.startEpochDay == null)
    val parsed = run(eventDate = "1788-01-26")
    assert(has(parsed, INVALID_COLLECTION_DATE))
    assert(parsed.startEpochDay == null)
  }

  test("range eventDate nulls day/month/year, sets end (ProcessEventTest:560)") {
    val r = run(eventDate = "1978-12-31/1979-01-02")
    assert(r.startEpochDay == d("1978-12-31"))
    assert(r.endEpochDay == d("1979-01-02"))
    assert(r.day == null && r.month == null && r.year == null)
  }

  test("verbatim range contributes the end next to y/m/d fields (ProcessEventTest:574)") {
    val r = run(year = "1978", month = "12", day = "31",
      verbatim = "1978-12-31/1979-01-02")
    assert(r.startEpochDay == d("1978-12-31"))
    assert(r.endEpochDay == d("1979-01-02"))
    assert(r.day == null && r.month == null && r.year == null)
  }

  test("separate start and end dates (ProcessEventTest:613)") {
    val r = run(eventDate = "31/12/1978", eventDateEnd = "02/01/1979")
    assert(r.startEpochDay == d("1978-12-31"))
    assert(r.endEpochDay == d("1979-01-02"))
  }

  test("month precision truncates and nulls the day (ProcessEventTest:625)") {
    val r = run(eventDate = "01/12/1978", eventDateEnd = "31/12/1978",
      datePrecision = "M")
    assert(r.startEpochDay == d("1978-12-01"))
    assert(r.endEpochDay == d("1978-12-01"))
    assert(r.datePrecision == "Month")
    assert(r.day == null && r.month == 12 && r.year == 1978)
  }

  test("day precision keeps everything (ProcessEventTest:639)") {
    val r = run(eventDate = "01/12/1978", eventDateEnd = "01/12/1978",
      datePrecision = "D")
    assert(r.startEpochDay == d("1978-12-01"))
    assert(r.endEpochDay == d("1978-12-01"))
    assert(r.datePrecision == "Day")
    assert(r.day == 1 && r.month == 12 && r.year == 1978)
  }

  test("day precision spelled out (ProcessEventTest:656)") {
    val r = run(eventDate = "04/08/2009", eventDateEnd = "04/08/2009",
      datePrecision = "Day")
    assert(r.startEpochDay == d("2009-08-04"))
    assert(r.day == 4 && r.month == 8 && r.year == 2009)
  }

  test("year-range precision truncates to years and nulls fields (ProcessEventTest:674)") {
    val r = run(eventDate = "01/01/2005", eventDateEnd = "31/12/2009",
      datePrecision = "YY")
    assert(r.startEpochDay == d("2005-01-01"))
    assert(r.endEpochDay == d("2009-01-01"))
    assert(r.datePrecision == "Year Range")
    assert(r.day == null && r.month == null && r.year == null)
  }

  test("ambiguous truncated dates stay unparsed (ProcessEventTest:692-762)") {
    for (bad <- Seq("26-6-5", "24-6-2", "24-5-26")) {
      val r = run(eventDate = bad)
      assert(r.startEpochDay == null, bad)
      assert(r.endEpochDay == null, bad)
    }
    val v = run(verbatim = "02/02/2")
    assert(v.startEpochDay == null)
  }

  test("blank precision leaves a full date alone (DatePrecisionTest:21)") {
    val r = run(eventDate = "2000-01-01")
    assert(r.startEpochDay == d("2000-01-01"))
    assert(r.datePrecision == "Day")
  }

  test("precision vocab variants map to canonical (DatePrecisionTest:31-115)") {
    for (p <- Seq("D", "d", "day", "Day")) {
      val r = run(eventDate = "2000-03-15", datePrecision = p)
      assert(r.startEpochDay == d("2000-03-15"), p)
      assert(r.datePrecision == "Day", p)
    }
    for (p <- Seq("O", "Month", "M")) {
      val r = run(eventDate = "2000-03-15", datePrecision = p)
      assert(r.startEpochDay == d("2000-03-01"), p)
      assert(r.datePrecision == "Month", p)
      assert(r.day == null && r.month == 3)
    }
    val y = run(eventDate = "2000-03-15", datePrecision = "Y")
    assert(y.startEpochDay == d("2000-01-01"))
    assert(y.datePrecision == "Year")
    assert(y.day == null && y.month == null && y.year == 2000)
  }

  test("determined precision: single dates and ranges") {
    assert(run(eventDate = "2000-03-15").datePrecision == "Day")
    assert(run(eventDate = "2000-03").datePrecision == "Month")
    assert(run(eventDate = "1906-06/07").datePrecision == "Year") // reference
    // decision table: the month-spanning same-year branch wins last
    assert(run(eventDate = "1978/1991").datePrecision == "Year Range")
    assert(run().datePrecision == "Not Supplied")
  }

  test("all-null row: missing + invalid + incomplete, nothing else") {
    val r = run()
    assert(r.codes.toSet == Set(MISSING_COLLECTION_DATE.code,
      INVALID_COLLECTION_DATE.code, INCOMPLETE_COLLECTION_DATE.code))
    assert(r.startEpochDay == null && r.year == null)
  }

  test("modified/dateIdentified/georeferenced normalise to dates") {
    val r = run(eventDate = "2012-02-01", modified = "2013-05-05T10:00:00",
      dateIdentified = "2012-02-01", georeferenced = "2012-02-01")
    assert(r.modifiedEpochDay == d("2013-05-05"))
    assert(r.dateIdentifiedEpochDay == d("2012-02-01"))
    assert(r.georeferencedEpochDay == d("2012-02-01"))
  }
}
