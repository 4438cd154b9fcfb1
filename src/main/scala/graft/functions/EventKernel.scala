package graft.functions

import java.time.LocalDate
import scala.collection.mutable.ArrayBuffer
import scala.util.Try

/** UDF return shape for the EVENT stage kernel. PUBLIC top-level with boxed
  * nullable fields (Janino codegen requirement — see ParsedDate note in
  * graft.processors). Epoch-day ints stand in for the reference's formatted
  * date strings: the engine's schema is typed (DateType), so a month- or
  * year-precision date is carried as the first day of its period plus the
  * `datePrecision` label, where the reference reformats the string itself
  * ("1978-12").
  */
case class EventResult(
    startEpochDay: java.lang.Integer, endEpochDay: java.lang.Integer,
    year: java.lang.Integer, month: java.lang.Integer, day: java.lang.Integer,
    datePrecision: String,
    modifiedEpochDay: java.lang.Integer,
    dateIdentifiedEpochDay: java.lang.Integer,
    georeferencedEpochDay: java.lang.Integer,
    codes: Array[Int])

/** Pure-Scala EVENT stage kernel: a faithful port of the reference's
  * `processor/EventProcessor.scala:48-654` control flow (in
  * /root/reference/src/main/scala/au/org/ala/biocache/), unit-testable
  * without a SparkSession and invoked once per row as a single UDF.
  *
  * Semantics carried over:
  *  - `validateNumber` triage of the discrete year/month/day fields, with
  *    day/month transposition repair (`:77-92`);
  *  - `runYearValidation` (`:315-354`): two-digit-year pivot against the
  *    current year (with the constructed-date future check that demotes a
  *    this-century pivot), years 100–1599 out of range, future years, and
  *    the First Fleet sentinel (1788-01-26 "implies a null date");
  *  - resolution priority: valid year+month+day fields first, then
  *    `eventDate`, then `verbatimEventDate`; a separately supplied
  *    `eventDateEnd` always parses; a verbatim range can contribute the end
  *    date when nothing else has (`:145-270`);
  *  - `processOtherDates` (`:404-450`): modified/dateIdentified/
  *    georeferencedDate normalisation plus ID_PRE_OCCURRENCE and
  *    GEOREFERENCE_POST_OCCURRENCE checks against the event start;
  *  - `processFirstDates` (`:357-384`): first-of-month/year/century flags,
  *    evaluated before precision reformatting (reference stage order);
  *  - `checkPrecision` + `reformatToPrecision` (`:473-645`): datePrecision
  *    vocab match, per-precision truncation and day/month/year nullify
  *    flags, range component nulling, and the determined-precision decision
  *    table (ported as written, including its overlapping-branch quirks).
  */
object EventKernel {
  import graft.model.AssertionCodes._

  val DAY_PRECISION = "Day"
  val MONTH_PRECISION = "Month"
  val YEAR_PRECISION = "Year"
  val DAY_RANGE_PRECISION = "Day Range"
  val MONTH_RANGE_PRECISION = "Month Range"
  val YEAR_RANGE_PRECISION = "Year Range"
  val NOT_SUPPLIED = "Not Supplied"

  private def blank(s: String): Boolean = s == null || s.trim.isEmpty

  private def toIntOpt(s: String): Option[Int] =
    if (s == null || s.isEmpty) None else Try(s.trim.toInt).toOption

  /** String date components of one side of a (possibly ranged) date — the
    * shape the reference's reformatToPrecision works over after re-parsing
    * the processed strings. Empty string = component unknown. */
  private case class C(y: String, m: String, d: String)

  private def compsOf(ld: LocalDate): C =
    C(ld.getYear.toString, f"${ld.getMonthValue}%02d", f"${ld.getDayOfMonth}%02d")

  /** Reference `EventDate.equals` on start vs end is STRING equality of the
    * formatted sides; component equality is the typed equivalent. */
  private def isRange(pd: EventDate): Boolean =
    pd.startYear != pd.endYear || pd.startMonth != pd.endMonth ||
      pd.startDay != pd.endDay

  def process(eventDate: String, eventDateEnd: String, yearS: String,
      monthS: String, dayS: String, verbatim: String, datePrecisionRaw: String,
      modified: String, dateIdentified: String, georeferenced: String): EventResult = {

    val codes = ArrayBuffer[Int]()
    val today = LocalDate.now
    val currentYear = today.getYear

    if (blank(dayS) && blank(monthS) && blank(yearS) && blank(eventDate) &&
      blank(eventDateEnd) && blank(verbatim))
      codes += MISSING_COLLECTION_DATE.code

    // reference validateNumber: null/garbage → (-1, false)
    def validateNumber(s: String, f: Int => Boolean): (Int, Boolean) =
      if (s == null) (-1, false)
      else toIntOpt(s) match {
        case Some(n) => (n, f(n))
        case None => (-1, false)
      }

    var (year, validYear) = validateNumber(yearS, y => y > 0 && y <= currentYear)
    var (month, validMonth) = validateNumber(monthS, m => m >= 1 && m <= 12)
    var (day, validDay) = validateNumber(dayS, d => d >= 1 && d <= 31)
    var comment = ""

    // day/month transposition repair (EventProcessor.scala:77-92)
    val monthInt = Option(monthS).flatMap(toIntOpt)
    val dayInt = Option(dayS).flatMap(toIntOpt)
    if (!validMonth && monthInt.isDefined && dayInt.isDefined) {
      if (monthInt.get > 12 && dayInt.get <= 12) {
        month = dayInt.get
        day = monthInt.get
        codes += DAY_MONTH_TRANSPOSED.code
        validMonth = true
      } else codes += INVALID_COLLECTION_DATE.code
    }
    if (day == 0 || day > 31) codes += INVALID_COLLECTION_DATE.code

    // runYearValidation (EventProcessor.scala:315-354)
    def runYearValidation(rawyear: Int, d: Int, m: Int): (String, Boolean, Int) = {
      var validY = true; var c = ""; var y = rawyear
      if (y > 0) {
        if (y < 100) {
          if (y > currentYear % 100) {
            y += ((currentYear / 100) - 1) * 100 // last century
          } else {
            y += (currentYear / 100) * 100 // this century...
            if (d > 0 && m > 0) { // ...unless that lands in the future
              val candidate = Try(LocalDate.of(y, m, d)).toOption
              if (candidate.exists(_.isAfter(today))) y -= 100
            }
          }
        } else if (y >= 100 && y < 1600) {
          y = -1; validY = false; c = "Year out of range"
        } else if (y > currentYear) {
          y = -1; validY = false; c = "Future year supplied"
        } else if (y == 1788 && m == 1 && d == 26) {
          validY = false; c = "First Fleet arrival implies a null date"
        }
      }
      (c, validY, y)
    }

    if (year > 0) {
      val (c, vy, ny) = runYearValidation(year, day, month)
      comment = c; validYear = vy; year = ny
      if (c.nonEmpty) codes += INVALID_COLLECTION_DATE.code
    }

    // construct from the discrete fields when all three are valid
    var date: Option[LocalDate] = None // control: "a date was resolved"
    var dateComplete = false
    if (validYear && validDay && validMonth) {
      Try(LocalDate.of(year, month, day)) match {
        case scala.util.Success(ld) => date = Some(ld); dateComplete = true
        case _ =>
          comment = "Invalid year, day, month"
          codes += INVALID_COLLECTION_DATE.code
      }
    }

    var pYear: Option[Int] = if (validYear) Some(year) else None
    var pMonth: Option[Int] = if (validMonth) Some(month) else None
    var pDay: Option[Int] = if (validDay) Some(day) else None
    var pStart: Option[LocalDate] = date
    var startC: Option[C] = date.map(compsOf)
    var pEnd: Option[LocalDate] = None
    var endC: Option[C] = None

    // shared by the eventDate and verbatim branches: parse-side year
    // validation + eventDate reconstruction under the pivoted year
    def applyParsedYearValidation(pd: EventDate): Unit =
      if (pd.startYear.nonEmpty) {
        val (c, vy, ny) = runYearValidation(pd.startYear.toInt,
          toIntOpt(pd.startDay).getOrElse(0), toIntOpt(pd.startMonth).getOrElse(0))
        comment = c; validYear = vy; year = ny
        if (vy) {
          pYear = Some(ny)
          if (pd.startDay.nonEmpty && pd.startMonth.nonEmpty) {
            pStart = Try(LocalDate.of(ny, pd.startMonth.toInt, pd.startDay.toInt)).toOption
            startC = pStart.map(compsOf)
          }
        } else {
          pStart = None; startC = None; pYear = None
        }
      }

    // eventDate, when the discrete fields did not make a date (:145-200)
    if (date.isEmpty && !blank(eventDate)) {
      DateParser.parseDate(eventDate).foreach { pd =>
        date = pd.startDate
        pStart = pd.startDate
        startC = Some(C(pd.startYear, pd.startMonth, pd.startDay))
        if (isRange(pd)) {
          pEnd = pd.endDate
          endC = Some(C(pd.endYear, pd.endMonth, pd.endDay))
        }
        pDay = toIntOpt(pd.startDay)
        pMonth = toIntOpt(pd.startMonth)
        applyParsedYearValidation(pd)
        dateComplete = pd.startYear.nonEmpty && pd.startMonth.nonEmpty &&
          pd.startDay.nonEmpty
        // isFutureDate on the parsed start (DateUtil.scala:17-30)
        if (pd.startDate.exists(_.isAfter(today)))
          codes += INVALID_COLLECTION_DATE.code
      }
    }

    // separately supplied end date always parses (:202-211)
    if (!blank(eventDateEnd)) {
      DateParser.parseDate(eventDateEnd).foreach { pd =>
        pEnd = pd.startDate
        endC = Some(C(pd.startYear, pd.startMonth, pd.startDay))
      }
    }

    // verbatim, when still nothing; else it may contribute the end (:213-268)
    if (date.isEmpty && !blank(verbatim)) {
      DateParser.parseDate(verbatim).foreach { pd =>
        pStart = pd.startDate
        startC = Some(C(pd.startYear, pd.startMonth, pd.startDay))
        if (isRange(pd)) {
          pEnd = pd.endDate
          endC = Some(C(pd.endYear, pd.endMonth, pd.endDay))
        }
        pDay = toIntOpt(pd.startDay)
        pMonth = toIntOpt(pd.startMonth)
        pYear = toIntOpt(pd.startYear)
        applyParsedYearValidation(pd)
        dateComplete = pd.startYear.nonEmpty && pd.startMonth.nonEmpty &&
          pd.startDay.nonEmpty
      }
    } else if (pEnd.isEmpty && !blank(verbatim)) {
      DateParser.parseDate(verbatim).foreach { pd =>
        if (isRange(pd)) {
          pEnd = pd.endDate
          endC = Some(C(pd.endYear, pd.endMonth, pd.endDay))
        }
      }
    }

    // invalid-date assertion (:271-274)
    if (!validYear && (pStart.isEmpty || comment.nonEmpty))
      codes += INVALID_COLLECTION_DATE.code

    // future check with one day of timezone slack (:276-279)
    if (date.isDefined && date.get.isAfter(today.plusDays(1)))
      codes += INVALID_COLLECTION_DATE.code

    if (!dateComplete) codes += INCOMPLETE_COLLECTION_DATE.code

    // processOtherDates (:404-450)
    def startEpoch(s: String): Option[Int] =
      if (blank(s)) None
      else DateParser.parseDate(s).flatMap(_.startDate).map(_.toEpochDay.toInt)
    val modEpoch = startEpoch(modified)
    val diEpoch = startEpoch(dateIdentified)
    val gdEpoch = startEpoch(georeferenced)
    if (pStart.isDefined) {
      val ev = pStart.get.toEpochDay.toInt
      diEpoch.foreach(di => if (di < ev) codes += ID_PRE_OCCURRENCE.code)
      gdEpoch.foreach(gd => if (gd != ev) codes += GEOREFERENCE_POST_OCCURRENCE.code)
    }

    // processFirstDates (:357-384) — before precision nulling, as in the
    // reference stage order
    if (pDay.contains(1)) {
      codes += FIRST_OF_MONTH.code
      if (pMonth.contains(1)) {
        codes += FIRST_OF_YEAR.code
        pYear.foreach(y => if (y > 0 && y % 100 == 0) codes += FIRST_OF_CENTURY.code)
      }
    }

    // checkPrecision + reformatToPrecision (:473-645)
    var precision: String = null

    def truncate(granularity: Char): Unit = {
      def t(ld: LocalDate): LocalDate = granularity match {
        case 'M' => ld.withDayOfMonth(1)
        case 'Y' => ld.withDayOfYear(1)
        case _ => ld
      }
      pStart = pStart.map(t)
      pEnd = pEnd.map(t)
    }

    def reformat(granularity: Char, nullifyDay: Boolean, nullifyMonth: Boolean,
        nullifyYear: Boolean): Unit = {
      truncate(granularity)
      if (nullifyDay) pDay = None
      if (nullifyMonth) pMonth = None
      if (nullifyYear) pYear = None

      // range component nulling (:570-585)
      (startC, endC) match {
        case (Some(s), Some(e)) =>
          if (s.d.nonEmpty && e.d.nonEmpty && s.d != e.d) pDay = None
          if (s.m.nonEmpty && e.m.nonEmpty && s.m != e.m) { pMonth = None; pDay = None }
          if (s.y.nonEmpty && e.y.nonEmpty && s.y != e.y) {
            pYear = None; pMonth = None; pDay = None
          }
        case _ => ()
      }

      // determined precision (:590-643) — ported branch-for-branch,
      // including the non-chained second `if` that lets YEAR overwrite
      // MONTH_RANGE for month-spanning ranges
      if (precision == null || precision.isEmpty) {
        var det = ""
        (startC, endC) match {
          case (Some(s), Some(e)) =>
            det = DAY_RANGE_PRECISION
            if (s.d == e.d && s.d.nonEmpty && s.m == e.m && s.m.nonEmpty &&
              s.y == e.y && s.y.nonEmpty) det = DAY_PRECISION
            if ((s.d != e.d || (s.d.isEmpty && e.d.isEmpty)) &&
              s.m == e.m && s.m.nonEmpty && s.y == e.y && s.y.nonEmpty)
              det = MONTH_PRECISION
            else if (s.d.isEmpty && e.d.isEmpty) det = MONTH_RANGE_PRECISION
            if ((s.d != e.d || (s.d.isEmpty && e.d.isEmpty)) &&
              (s.m != e.m || (s.m.isEmpty && e.m.isEmpty)) &&
              s.y == e.y && s.y.nonEmpty) det = YEAR_PRECISION
            else if (s.m.isEmpty && e.m.isEmpty) det = YEAR_RANGE_PRECISION
          case (Some(_), None) =>
            det = DAY_PRECISION
            if (pDay.isEmpty && pMonth.isDefined && pYear.isDefined)
              det = MONTH_PRECISION
            if (pDay.isEmpty && pMonth.isEmpty && pYear.isDefined)
              det = YEAR_PRECISION
          case _ => det = NOT_SUPPLIED
        }
        precision = det
      }
    }

    if (!blank(datePrecisionRaw) && pStart.isDefined) {
      graft.vocab.DatePrecision.matchTerm(datePrecisionRaw) match {
        case Some(canonical) =>
          precision = canonical
          canonical match {
            case DAY_PRECISION => reformat('D', false, false, false)
            case MONTH_PRECISION => reformat('M', true, false, false)
            case YEAR_PRECISION => reformat('Y', true, true, false)
            case DAY_RANGE_PRECISION => reformat('M', false, false, false)
            case MONTH_RANGE_PRECISION => reformat('M', true, false, false)
            case YEAR_RANGE_PRECISION => reformat('Y', true, true, true)
            case _ => reformat('D', false, false, false)
          }
        case None => () // unmatched precision term: reference leaves
        // everything untouched (no reformat, no determined precision)
      }
    } else {
      reformat('D', false, false, false)
    }

    def boxI(o: Option[Int]): java.lang.Integer = o.map(Int.box).orNull
    EventResult(
      boxI(pStart.map(_.toEpochDay.toInt)), boxI(pEnd.map(_.toEpochDay.toInt)),
      boxI(pYear), boxI(pMonth), boxI(pDay),
      precision,
      boxI(modEpoch), boxI(diEpoch), boxI(gdEpoch),
      codes.distinct.sorted.toArray)
  }
}
