package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Predicate semantics per reference diepy/core.py:547-630. */
class TypeInferSpec extends AnyFunSuite {
  import TypeInfer._

  test("isInt accepts python-int forms") {
    assert(isInt("0")); assert(isInt("42")); assert(isInt("-7"))
    assert(isInt("+3")); assert(isInt(" 12 ")); assert(isInt("007"))
    assert(!isInt("1.0")); assert(!isInt("abc")); assert(!isInt(""))
    assert(!isInt("1e3")); assert(!isInt("-")); assert(!isInt("12a"))
  }

  test("unicode decimal digits parse like python int(), not saturate") {
    // Character.isDigit accepts any Nd digit — and so does
    // Long.parseLong (it goes through Character.digit), exactly like
    // Python's int(); regression-guard that the sampleValue path never
    // hits the saturation branch for such values
    val arabicThree = "٣"
    assert(isInt(arabicThree))
    val cd = ColumnDef("c").sampleValue(arabicThree)
    assert(cd.tpe == "int" && cd.minValue == 0L && cd.maxValue == 3L)
  }

  test("isFloat accepts python-float forms") {
    assert(isFloat("2.83")); assert(isFloat("-0.5")); assert(isFloat("1e3"))
    assert(isFloat("135.134")); assert(isFloat("3")); assert(isFloat("inf"))
    assert(isFloat("nan")); assert(isFloat(".5"))
    assert(!isFloat("abc")); assert(!isFloat("")); assert(!isFloat("1,5"))
  }

  test("date-only strings classify as date") {
    assert(isDate("2013-10-11")); assert(isDate("10/11/2013"))
    assert(isDate("2013.10.11")); assert(isDate("11 Oct 2013"))
    assert(isDate("Oct 11, 2013")); assert(isDate("20131011"))
    assert(!isTime("2013-10-11")); assert(!isDateTime("2013-10-11"))
  }

  test("time-only strings classify as time") {
    assert(isTime("12:01:02")); assert(isTime("13:04"))
    // fractional seconds and AM/PM shapes contain '.'/' ' but are TIME
    assert(isTime("09:30:15.123456")); assert(isTime("09:30:15.123"))
    assert(isTime("1:30 PM")); assert(isTime("1:30:05 AM"))
    assert(!isDate("12:01:02")); assert(!isDateTime("12:01:02"))
  }

  test("full datetimes classify as datetime") {
    assert(isDateTime("2013-10-11 13:04:05"))
    assert(isDateTime("2000-12-12 14:23:45.132500"))
    assert(!isTime("2013-10-11 13:04:05"))
  }

  test("midnight datetime also passes is_date (reference quirk core.py:608-609)") {
    assert(isDate("2013-10-11 00:00:00"))
    assert(isDateTime("2013-10-11 00:00:00"))
  }

  test("non-temporal text matches nothing") {
    for (s <- Seq("hello", "", "12:99:99", "2013-13-45"))
      assert(!isDate(s) && !isTime(s) && !isDateTime(s), s)
  }
}
