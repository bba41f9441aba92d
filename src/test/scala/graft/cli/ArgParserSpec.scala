package graft.cli

import org.scalatest.funsuite.AnyFunSuite
import graft.InvalidOption
import ArgParser.parseArgs

/** The 14 cases of the reference's test/test_parse_args.py:38-135, ported
  * verbatim — this file is the compatibility spec for A19/A20 — plus
  * ScalaCheck generalizations (option order never changes the result).
  */
class ArgParserSpec extends AnyFunSuite {

  val helpText1 = "<crawler_name> [--async] [--timeout=seconds]"
  val defaultArgs1: Map[String, Any] = Map("op_async" -> false, "timeout" -> 123)
  val helpText2 = "[<job_name>] [--lines=num] [--noheaders]"
  val defaultArgs2: Map[String, Any] = Map("lines" -> null, "op_noheaders" -> false)
  val helpText3 = "<job_name> [--async] [--param=value...]"
  val defaultArgs3: Map[String, Any] = Map("op_async" -> false)

  test("none args") {
    parseArgs(null, helpText2)
  }

  test("empty list") {
    parseArgs(Nil, helpText2)
  }

  test("parse ok 1 full") {
    val r = parseArgs(Seq("run_crawler", "NAME", "--async", "--timeout=456"), helpText1, defaultArgs1)
    assert(r.positional1.contains("NAME"))
    assert(r.kargs("timeout") == "456")
    assert(r.kargs("op_async") == true)
  }

  test("parse ok 1 space") {
    val r = parseArgs(Seq("run_crawler", "NAME", "--timeout", "456", "--async"), helpText1, defaultArgs1)
    assert(r.positional1.contains("NAME"))
    assert(r.kargs("timeout") == "456")
    assert(r.kargs("op_async") == true)
  }

  test("parse ok 1 part") {
    val r = parseArgs(Seq("run_crawler", "NAME", "--timeout=456"), helpText1, defaultArgs1)
    assert(r.positional1.contains("NAME"))
    assert(r.kargs("timeout") == "456")
    assert(r.kargs("op_async") == false)
  }

  test("parse defaults") {
    val r = parseArgs(Seq("run_crawler", "NAME"), helpText1, defaultArgs1)
    assert(r.positional1.contains("NAME"))
    assert(r.kargs("timeout") == 123) // int default survives untouched
    assert(r.kargs("op_async") == false)
  }

  test("parse missing required") {
    assertThrows[InvalidOption] {
      parseArgs(Seq("run_crawler"), helpText1, defaultArgs1)
    }
  }

  test("parse invalid excess positional") {
    assertThrows[InvalidOption] {
      parseArgs(Seq("run_crawler", "A", "B"), helpText1, defaultArgs1)
    }
  }

  test("parse ok 2") {
    val r = parseArgs(Seq("list_runs", "NAME", "--lines=1"), helpText2, defaultArgs2)
    assert(r.positional1.contains("NAME"))
    assert(r.kargs("lines") == "1")
  }

  test("parse ok 2 defaults") {
    val r = parseArgs(Seq("list_runs"), helpText2, defaultArgs2)
    assert(r.positional1.isEmpty)
    assert(r.kargs("lines") == null)
  }

  test("parse ok 2 no name") {
    val r = parseArgs(Seq("list_runs", "--lines=123", "--noheaders"), helpText2, defaultArgs2)
    assert(r.positional1.isEmpty)
    assert(r.kargs("lines") == "123")
    assert(r.kargs("op_noheaders") == true)
  }

  test("parse ok 2 no name reverse order") {
    val r = parseArgs(Seq("list_runs", "--noheaders", "--lines=123"), helpText2, defaultArgs2)
    assert(r.positional1.isEmpty)
    assert(r.kargs("lines") == "123")
    assert(r.kargs("op_noheaders") == true)
  }

  test("parse ok 3 free-form params") {
    val r = parseArgs(Seq("run_job", "NAME", "--a=1", "--b=2"), helpText3, defaultArgs3)
    assert(r.positional1.contains("NAME"))
    assert(r.kargs("a") == "1")
    assert(r.kargs("b") == "2")
  }

  test("parse ok 3 defaults") {
    val r = parseArgs(Seq("run_job", "NAME"), helpText3, defaultArgs3)
    assert(r.positional1.contains("NAME"))
  }

  // --- generalizations beyond the ported spec ---

  test("missing value for trailing valued option") {
    assertThrows[InvalidOption] {
      parseArgs(Seq("cmd", "NAME", "--timeout"), helpText1, defaultArgs1)
    }
  }

  test("single-dash junk rejected") {
    assertThrows[InvalidOption] {
      parseArgs(Seq("cmd", "-x"), helpText2, defaultArgs2)
    }
  }

  test("property: option order never changes the result") {
    // invariant from reference test_parse_args.py:116-121, generalized over
    // all permutations of every option subset
    val options = Seq("--lines=7", "--noheaders", "--extra=x")
    for {
      n <- 0 to options.size
      subset <- options.combinations(n)
      perms = subset.permutations.toList
    } {
      val results = perms.map(p => parseArgs("c" +: p, helpText2, defaultArgs2))
      assert(results.distinct.size == 1, s"order-dependent result for $subset")
    }
  }

  test("property: --k=v and --k v are equivalent") {
    val rnd = new scala.util.Random(42)
    (1 to 200).foreach { _ =>
      val k = Seq("alpha", "beta", "lines")(rnd.nextInt(3))
      val v = rnd.alphanumeric.take(1 + rnd.nextInt(8)).mkString
      val a = parseArgs(Seq("c", "N", s"--$k=$v"), helpText3, defaultArgs3)
      val b = parseArgs(Seq("c", "N", s"--$k", v), helpText3, defaultArgs3)
      assert(a == b)
    }
  }
}
