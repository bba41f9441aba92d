package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import Functions.{formatTime, globToRegex}

/** format_time semantics derived from gluettalax.py:91-119; glob semantics
  * from fnmatch (the compat contract of all four reference list commands).
  */
class FunctionsSpec extends AnyFunSuite {

  test("format_time zero") { assert(formatTime(0) == "0s") }
  test("format_time seconds only") { assert(formatTime(45) == "45s") }
  test("format_time minute rollover") { assert(formatTime(60) == "1m") }
  test("format_time multi unit") { assert(formatTime(94028) == "1d 2h 7m 8s") }
  test("format_time skips zero components") { assert(formatTime(86401) == "1d 1s") }
  test("format_time exact day") { assert(formatTime(86400) == "1d") }
  test("format_time negative signs every component") {
    // reference puts '-' on each emitted part (gluettalax.py:107-108)
    assert(formatTime(-3661) == "-1h -1m -1s")
    assert(formatTime(-1000) == "-16m -40s")
  }

  test("format_time property: roundtrip decomposition") {
    val rnd = new scala.util.Random(42)
    (1 to 500).map(_ => rnd.nextLong(10000000L)).foreach { s =>
      val out = formatTime(s)
      val total = "(\\d+)([dhms])".r.findAllMatchIn(out).map { m =>
        val v = m.group(1).toLong
        m.group(2) match {
          case "d" => v * 86400; case "h" => v * 3600
          case "m" => v * 60; case "s" => v
        }
      }.sum
      assert(total == s)
    }
  }

  private def matches(p: String, s: String): Boolean =
    s.matches(globToRegex(p))

  test("glob star") {
    assert(matches("large*", "large bolt"))
    assert(!matches("large*", "xlarge bolt"))
    assert(matches("*bolt", "large bolt"))
    assert(matches("*", ""))
  }
  test("glob question mark") {
    assert(matches("b?lt", "bolt"))
    assert(!matches("b?lt", "boolt"))
  }
  test("glob char class") {
    assert(matches("b[aeiou]lt", "bolt"))
    assert(!matches("b[xyz]lt", "bolt"))
    assert(matches("b[!xyz]lt", "bolt"))
    assert(!matches("b[!aeiou]lt", "bolt"))
  }
  test("glob anchoring is whole-string") {
    assert(!matches("bolt", "large bolt"))
    assert(!matches("large", "large bolt"))
  }
  test("glob escapes regex metacharacters") {
    assert(matches("a.b", "a.b"))
    assert(!matches("a.b", "axb"))
    assert(matches("a+b(c)", "a+b(c)"))
    assert(matches("x|y", "x|y"))
    assert(!matches("x|y", "x"))
  }
  test("glob case sensitive (POSIX fnmatch)") {
    assert(!matches("Large*", "large bolt"))
  }
  test("glob unterminated class is literal") {
    assert(matches("a[b", "a[b"))
  }

  test("glob property: literal strings match themselves") {
    val pool = ('a' to 'z') ++ ('0' to '9') ++ Seq('.', '+', '(', ')', '{', '}', '$', '^', '|', ' ')
    val rnd = new scala.util.Random(42)
    (1 to 500).foreach { _ =>
      val s = Seq.fill(rnd.nextInt(20))(pool(rnd.nextInt(pool.size))).mkString
      assert(matches(s, s), s"'$s' should glob-match itself")
    }
  }
}
