package graft

import org.apache.spark.sql.functions.col
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Canonicalization laws for the q_dedup_url operator
  * (TextQueries.canonicalizeUrl), checked over generated messy URLs:
  *
  *  1. Idempotence — canon(canon(u)) == canon(u): the canonical form
  *     is a fixed point (a crawl that re-ingests its own canonical
  *     keys must not split groups).
  *  2. Param-order invariance — shuffling the query params never
  *     changes the canonical form.
  *  3. Noise invariance — scheme/host case, a fragment, an http :80
  *     port, extra tracking params (utm_*, sess=), and a trailing
  *     slash all canonicalize away.
  *
  * Properties are evaluated through the REAL Spark expression (one
  * batched DataFrame per property, not per case) so the laws hold for
  * the codegen'd column, not a Scala re-implementation.
  */
class UrlCanonPropSpec extends SparkSpecBase {

  private val genHost: Gen[String] = for {
    a <- Gen.alphaLowerStr.map(_.take(6)).suchThat(_.nonEmpty)
    tld <- Gen.oneOf("com", "org", "example.net")
  } yield s"$a.$tld"

  private val genSeg: Gen[String] =
    Gen.alphaNumStr.map(_.take(5)).suchThat(_.nonEmpty)

  private val genParam: Gen[String] = for {
    k <- Gen.oneOf("id", "page", "ref", "q")
    v <- Gen.alphaNumStr.map(_.take(4))
  } yield s"$k=$v"

  private val genTracking: Gen[String] = for {
    k <- Gen.oneOf("utm_source", "utm_campaign", "sess")
    v <- Gen.alphaNumStr.map(_.take(4))
  } yield s"$k=$v"

  private case class RawUrl(scheme: String, host: String, port: String,
      segs: List[String], slash: Boolean, params: List[String],
      tracking: List[String], frag: String) {
    def render(shuffledParams: List[String] = params ++ tracking,
        caseNoise: Boolean = false): String = {
      val sch = if (caseNoise) scheme.toUpperCase else scheme
      val h = if (caseNoise) host.toUpperCase else host
      val p = "/" + segs.mkString("/") + (if (slash) "/" else "")
      val q = if (shuffledParams.isEmpty) "" else
        "?" + shuffledParams.mkString("&")
      s"$sch://$h$port$p$q$frag"
    }
  }

  private val genUrl: Gen[RawUrl] = for {
    scheme <- Gen.oneOf("http", "https")
    host <- genHost
    port <- Gen.oneOf("", ":80", ":8443")
    nseg <- Gen.choose(1, 3)
    segs <- Gen.listOfN(nseg, genSeg)
    slash <- Gen.oneOf(true, false)
    np <- Gen.choose(0, 3)
    params <- Gen.listOfN(np, genParam)
    nt <- Gen.choose(0, 2)
    tracking <- Gen.listOfN(nt, genTracking)
    frag <- Gen.oneOf("", "#top", "#sec2")
  } yield RawUrl(scheme, host, port, segs, slash, params, tracking, frag)

  /** Canonicalize a batch of URL strings through the live expression. */
  private def canonAll(urls: Seq[String]): Seq[String] = {
    import spark.implicits._
    urls.toDF("url")
      .select(graft.queries.TextQueries.canonicalizeUrl(col("url")))
      .collect().map(_.getString(0)).toSeq
  }

  private def check(p: Prop): Unit = {
    val r = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(40), p)
    assert(r.passed, r.status.toString)
  }

  test("idempotence: the canonical form is a fixed point") {
    val cases = Gen.listOfN(60, genUrl).sample.get.map(_.render())
    val once = canonAll(cases)
    val twice = canonAll(once)
    once.zip(twice).zip(cases).foreach { case ((a, b), raw) =>
      assert(a == b, s"not a fixed point for $raw: $a -> $b")
    }
  }

  test("param order never changes the canonical form") {
    check(Prop.forAll(genUrl) { u =>
      val all = u.params ++ u.tracking
      val Seq(a, b) = canonAll(Seq(
        u.render(all), u.render(all.reverse)))
      a == b
    })
  }

  test("case, fragment, tracking params, trailing slash are noise") {
    check(Prop.forAll(genUrl) { u =>
      val clean = u.copy(tracking = Nil, frag = "", slash = false)
      val noisy = u.copy(slash = true)
      val Seq(a, b) = canonAll(Seq(
        clean.render(clean.params),
        noisy.render(noisy.params ++ noisy.tracking, caseNoise = true)))
      a == b
    })
  }

  test("utm-PREFIXED params strip; utmX lookalikes survive (r14 advisor)") {
    // LIKE 'utm_%' treated '_' as a single-char wildcard, silently
    // merging URLs that differ only in a param NAMED utm<X> (e.g.
    // utme=1 vs utme=2). The fix is startsWith: lookalikes are real
    // params and must survive canonicalization.
    val Seq(a, b, c, d) = canonAll(Seq(
      "http://site.com/x?utme=1", "http://site.com/x?utme=2",
      "http://site.com/x?utm_source=feed&id=1",
      "http://site.com/x?id=1"))
    assert(a == "http://site.com/x?utme=1")
    assert(b == "http://site.com/x?utme=2")
    assert(a != b, "utmX lookalikes must not merge")
    assert(c == d, "utm_ tracking params must strip")
  }

  test("http :80 strips; https :80 and explicit :8443 survive") {
    val Seq(a, b, c) = canonAll(Seq(
      "http://site.com:80/x", "https://site.com:80/x",
      "http://site.com:8443/x"))
    assert(a == "http://site.com/x")
    assert(b == "https://site.com:80/x")
    assert(c == "http://site.com:8443/x")
  }
}
