package graft.cli

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite
import graft.InvalidOption
import ArgParser.parseArgs

/** ScalaCheck generalization of the reference's hand-written invariance
  * cases (SURVEY §5: "random usage grammars × random arg orderings") — the
  * two ported single-example properties (`test_parse_args.py:116-121`,
  * ArgParserSpec "property:" tests) hold over the whole grammar space:
  *
  *  1. option ORDER never changes the parse (reference invariant);
  *  2. `--k=v` and `--k v` are interchangeable per option independently;
  *  3. omitting any required positional raises InvalidOption.
  *
  * Generators mirror the reference grammar: `<req>` positionals, `[opt]`
  * optional positionals, `[--k=v]` valued and `[--k]` boolean options.
  * Positional values precede options (required slots consume dashed args
  * too — the reference's documented greedy-fill quirk, ArgParser.scala).
  */
class ArgParserPropSpec extends AnyFunSuite {

  private val ident: Gen[String] =
    for {
      h <- Gen.alphaLowerChar
      t <- Gen.listOfN(4, Gen.alphaLowerChar)
    } yield (h :: t).mkString

  private val value: Gen[String] =
    Gen.listOfN(5, Gen.alphaNumChar).map("v" + _.mkString)

  private case class Grammar(req: List[String], opt: List[String],
      valued: List[String], flags: List[String]) {
    // usage lines carry NO leading command name (helpText1-3 in the ported
    // spec): args(0) is the command and parseArgs drops it, but parseUsage
    // would read a leading word as a required positional
    def usage: String = (req.map(r => s"<$r>") ++ opt.map(o => s"[<$o>]")
      ++ valued.map(v => s"[--$v=x]") ++ flags.map(f => s"[--$f]")).mkString(" ")
  }

  private val grammar: Gen[Grammar] =
    for {
      names <- Gen.listOfN(10, ident).map(_.distinct)
        .retryUntil(_.size >= 8)
      nReq <- Gen.choose(0, 2)
      nOpt <- Gen.choose(0, 2)
      nVal <- Gen.choose(0, 2)
      nFlag <- Gen.choose(0, 2)
    } yield {
      val it = names.iterator
      Grammar(List.fill(nReq)(it.next()), List.fill(nOpt)(it.next()),
        List.fill(nVal)(it.next()), List.fill(nFlag)(it.next()))
    }

  /** A concrete invocation: values for every required, a prefix of the
    * optionals, and a sub-selection of the options with =v / space-v form
    * chosen per option. */
  private case class Invocation(g: Grammar, posVals: List[String],
      optTokens: List[List[String]])

  private val invocation: Gen[Invocation] =
    for {
      g <- grammar
      nOptGiven <- Gen.choose(0, g.opt.size)
      pos <- Gen.listOfN(g.req.size + nOptGiven, value)
      useEq <- Gen.listOfN(g.valued.size, Gen.oneOf(true, false))
      takeVal <- Gen.listOfN(g.valued.size, Gen.oneOf(true, false))
      takeFlag <- Gen.listOfN(g.flags.size, Gen.oneOf(true, false))
      vals <- Gen.listOfN(g.valued.size, value)
    } yield {
      val valTokens = g.valued.lazyZip(useEq).lazyZip(takeVal).lazyZip(vals)
        .toList.collect {
          case (k, eq, true, v) =>
            if (eq) List(s"--$k=$v") else List(s"--$k", v)
        }
      val flagTokens = g.flags.zip(takeFlag).collect {
        case (f, true) => List(s"--$f")
      }
      Invocation(g, pos, valTokens ++ flagTokens)
    }

  private def check(p: Prop, name: String): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(300), p)
    assert(res.passed, s"$name: $res")
  }

  test("property: option order never changes the parse (any grammar)") {
    check(Prop.forAll(invocation, Gen.long) { (inv, seed) =>
      val base = "cmd" :: inv.posVals ::: inv.optTokens.flatten
      val shuffled = "cmd" :: inv.posVals :::
        new scala.util.Random(seed).shuffle(inv.optTokens).flatten
      parseArgs(base, inv.g.usage) == parseArgs(shuffled, inv.g.usage)
    }, "option-order invariance")
  }

  test("property: --k=v and --k v parse identically (any grammar)") {
    check(Prop.forAll(invocation) { inv =>
      val eqForm = inv.optTokens.map {
        case List(k, v) if k.startsWith("--") && !k.contains('=') =>
          List(s"$k=$v")
        case other => other
      }
      parseArgs("cmd" :: inv.posVals ::: inv.optTokens.flatten, inv.g.usage) ==
        parseArgs("cmd" :: inv.posVals ::: eqForm.flatten, inv.g.usage)
    }, "=v / space-v equivalence")
  }

  test("property: omitting any required positional raises InvalidOption") {
    check(Prop.forAll(invocation.retryUntil(_.g.req.nonEmpty)) { inv =>
      // drop the LAST positional value: with no optionals given this leaves
      // a required slot empty; with optionals given the optional slot
      // steals nothing from required (greedy fill) — so drop down to
      // req-1 values to guarantee a hole
      val short = inv.posVals.take(inv.g.req.size - 1)
      try { parseArgs("cmd" :: short, inv.g.usage); false }
      catch { case _: InvalidOption => true }
    }, "missing required")
  }
}
