package graft

import graft.sources.GraphSource._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Round-trip property for the graph-search parser: any canonical
  * chain AST rendered to its surface syntax must parse back to exactly
  * the same AST. Canonical = And/Or nodes carry >= 2 children and no
  * direct child of the same connective (the parser flattens chains of
  * one connective into a single n-ary node), which is precisely the
  * shape the parser produces.
  */
class SearchParserPropSpec extends AnyFunSuite {

  private val genKind = Gen.oneOf("graph_root", "cloud", "aws.ec2_instance")
  private val genPath = Gen.oneOf("name", "cores", "age.hours")
  private val genOp = Gen.oneOf("==", "!=", ">", ">=", "<", "<=")

  private val genProp: Gen[Pred] = for {
    path <- genPath
    op <- genOp
    quoted <- Gen.oneOf(true, false)
    value <- if (quoted) Gen.oneOf("a b", "42", "x-1", "")
             else Gen.oneOf("42", "4.5", "foo", "Bar.baz")
  } yield PropPred(PropFilter(path, op, value, quoted))

  private val genAtom: Gen[Pred] =
    Gen.oneOf(genKind.map(IsKind.apply), genProp)

  /** Compound generators exclude a same-connective direct child so the
    * generated tree is already in the parser's flattened normal form. */
  private def genPred(depth: Int): Gen[Pred] =
    if (depth <= 0) genAtom
    else Gen.frequency(
      3 -> genAtom,
      1 -> Gen.choose(2, 3).flatMap(n =>
        Gen.listOfN(n, genNonAnd(depth - 1)).map(AndPred.apply)),
      1 -> Gen.choose(2, 3).flatMap(n =>
        Gen.listOfN(n, genNonOr(depth - 1)).map(OrPred.apply)),
      1 -> genPred(depth - 1).map(NotPred.apply))

  private def genNonAnd(depth: Int): Gen[Pred] =
    genPred(depth).retryUntil(!_.isInstanceOf[AndPred])
  private def genNonOr(depth: Int): Gen[Pred] =
    genPred(depth).retryUntil(!_.isInstanceOf[OrPred])

  private val genTraversal: Gen[Traversal] = for {
    min <- Gen.choose(0, 3)
    max <- Gen.oneOf(Gen.const(None), Gen.choose(min, min + 3).map(Some(_)))
    rev <- Gen.oneOf(true, false)
  } yield Traversal(min, max, rev)

  private val genSort: Gen[Seq[SortKey]] = Gen.choose(0, 2).flatMap(n =>
    Gen.listOfN(n, for {
      p <- genPath
      asc <- Gen.oneOf(true, false)
    } yield SortKey(p, asc)))

  private val genChain: Gen[SearchChain] = for {
    nHops <- Gen.choose(0, 2)
    steps <- Gen.listOfN(nHops + 1, genPred(2))
    hops <- Gen.listOfN(nHops, genTraversal)
    sort <- genSort
    limit <- Gen.oneOf(Gen.const(None), Gen.choose(1, 99).map(Some(_)))
  } yield SearchChain(steps, hops, sort, limit)

  // ---- Renderer: AST -> surface syntax --------------------------------

  private def renderPred(p: Pred): String = p match {
    case IsKind(k) => s"is($k)"
    case PropPred(PropFilter(path, op, v, quoted)) =>
      val lit = if (quoted) "\"" + v + "\"" else v
      s"$path $op $lit"
    case AndPred(ps) => ps.map(paren).mkString(" and ")
    case OrPred(ps) => ps.map(paren).mkString(" or ")
    case NotPred(inner) => s"not ${paren(inner)}"
    case TruePred => sys.error("TruePred is implicit; never rendered")
  }

  /** Parenthesize compound children so precedence can't re-associate
    * the rendered form differently from the source AST. */
  private def paren(p: Pred): String = p match {
    case _: AndPred | _: OrPred | _: NotPred => s"(${renderPred(p)})"
    case _ => renderPred(p)
  }

  private def renderTrav(t: Traversal): String = {
    val range = s"[${t.min}:${t.max.getOrElse("")}]"
    if (t.reverse) s"<-$range-" else s"-$range->"
  }

  private def render(c: SearchChain): String = {
    val body = renderPred(c.steps.head) +
      c.hops.zip(c.steps.tail).map { case (h, s) =>
        " " + renderTrav(h) + (s match {
          case TruePred => ""
          case p => " " + renderPred(p)
        })
      }.mkString
    val sorts = c.sort.map(k =>
      s" sort ${k.path} ${if (k.ascending) "asc" else "desc"}").mkString
    val lim = c.limit.map(n => s" limit $n").getOrElse("")
    body + sorts + lim
  }

  test("render -> parseChain round-trips every canonical chain") {
    // NotPred(NotPred(x)) renders as "not (not x)" which parses back
    // identically, and every other shape is canonical by construction.
    val prop = Prop.forAll(genChain) { chain =>
      val parsed = parseChain(render(chain))
      if (parsed != Some(chain)) {
        System.err.println(s"rendered: ${render(chain)}\nast: $chain\ngot: $parsed")
        false
      } else true
    }
    val r = SCTest.check(SCTest.Parameters.default
      .withMinSuccessfulTests(300), prop)
    assert(r.passed, r.status.toString)
  }

  test("malformed inputs never partially parse") {
    Seq(
      "", "and", "is()", "is(a) and", "is(a) or or is(b)",
      "is(a) -[:2]->", "is(a) -[1:2]-> and", "not", "( is(a)",
      "is(a) sort limit", "is(a) limit", "is(a) limit -3",
      "name ==", "== foo", "is(a) name", "is(a) extra garbage ==",
      // Out-of-Int-range numerics must yield None, not throw.
      "is(a) limit 3000000000", "is(a) -[4294967296:]->",
      "is(a) -[1:99999999999]->")
      .foreach { s =>
        assert(parseChain(s).isEmpty, s"should not parse: '$s'")
      }
  }
}
