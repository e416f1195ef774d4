package graft.ingest

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** The real DOM walk behind the Trustpilot source (r10 "What's missing
  * #3"): the tolerant HTML parser's contract, the BS4-shaped query
  * semantics the reference's extraction uses, and the BRIDGING PROOF —
  * the pre-extracted JSON fixtures the connector tier has ingested since
  * round 1 are exactly what the DOM walk yields from page HTML, and
  * `Normalize.trustpilot` produces identical rows through either path.
  */
class HtmlDocSpec extends AnyFunSuite {

  private def fixture(name: String): String =
    new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(
      getClass.getResource(s"/fixtures/trustpilot_html/$name").toURI)), "UTF-8")

  // ---- parser contract ----------------------------------------------------

  test("nesting, class-subset matching and document order") {
    val doc = HtmlDoc.parse(
      """<div class="a b"><p class="x">one</p><div class="b"><p class="x y">two</p></div></div>""")
    assert(doc.findAll("p", Set("x")).map(_.textStripped) == Seq("one", "two"))
    assert(doc.findAll("p", Set("x", "y")).map(_.textStripped) == Seq("two"))
    assert(doc.findAll("div", Set("b")).length == 2) // subset, not exact match
    assert(doc.find("div", Set("a", "b")).isDefined)
    assert(doc.findAll("p", Set("z")).isEmpty)
  }

  test("extra/reordered classes still match: subset semantics pinned where BS4 exact-string differs (r12)") {
    // BS4's dict filter with a space-joined STRING matches the class
    // attribute as an exact string — `class="b a"` or `class="a b extra"`
    // would silently fall out of the reference's extraction. Subset
    // matching is the deliberate, documented divergence (HtmlDoc.findAll
    // scaladoc): real pages append/reorder classes freely; pin the intent
    val doc = HtmlDoc.parse(
      """<ul>
        |<li class="a b">plain</li>
        |<li class="b a">reordered</li>
        |<li class="a b promoted">extra</li>
        |<li class="a">short</li>
        |</ul>""".stripMargin)
    assert(doc.findAll("li", Set("a", "b")).map(_.textStripped)
      == Seq("plain", "reordered", "extra"),
      "subset matching must survive class reordering and additions")
    assert(doc.findAll("li", Set("a")).length == 4)
  }

  test("get_text(strip=True) semantics: stripped fragments concatenated") {
    val doc = HtmlDoc.parse("<p>  Sup<strong>erb</strong>\n  !  </p>")
    assert(doc.find("p").get.textStripped == "Superb!")
  }

  test("attribute quoting variants, entities, void and self-closing elements") {
    val doc = HtmlDoc.parse(
      """<img src=/a.png alt="R &amp; D"><br/><input type='text' disabled><a href="/x">l</a>""")
    assert(doc.find("img").get.attr("alt").contains("R & D"))
    assert(doc.find("input").get.attr("type").contains("text"))
    assert(doc.find("input").get.attr("disabled").contains(""))
    assert(doc.find("a").get.attr("href").contains("/x"))
  }

  test("script/style bodies are raw text, comments and doctype are skipped") {
    val doc = HtmlDoc.parse(
      """<!DOCTYPE html><!-- <div class="k">ghost</div> -->
        |<script>var s = "<div class='k'>ghost</div>";</script>
        |<style>.k { color: red }</style><div class="k">real</div>""".stripMargin)
    assert(doc.findAll("div", Set("k")).map(_.textStripped) == Seq("real"))
  }

  test("unclosed tags recover without losing following content") {
    val doc = HtmlDoc.parse("<div><p>open<div class=\"inner\">x</div></div><span>tail</span>")
    assert(doc.find("span").map(_.textStripped).contains("tail"))
  }

  // ---- the Trustpilot card walk vs the pre-extracted JSON fixture ----------

  private val jsonRows: Map[Int, (String, String, String, String, String)] = Map(
    1 -> (("Ann", "Rated 4 out of 5 stars", "Good", "Nice", "23 January 2025")),
    2 -> (("Bob", "Rated 5 out of 5 stars", "Great", "Superb", "5 March 2025")),
    4 -> (("Cyn", null, "Hmm", "Meh", "not a date")))

  test("the DOM walk yields exactly the pre-extracted fixture fields, page by page") {
    for ((page, (author, alt, title, body, date)) <- jsonRows) {
      val cards = TrustpilotHtml.extractCards(fixture(s"acme.com.p$page.html"))
      assert(cards.length == 1, s"page $page: expected 1 card, got ${cards.length}")
      val c = cards.head
      assert(c.author_name == author, s"page $page author")
      assert(c.rating_alt == alt, s"page $page rating alt")
      assert(c.review_title == title, s"page $page title")
      assert(c.review_body == body, s"page $page body")
      assert(c.review_date_str == date, s"page $page date")
    }
  }

  test("a card missing the show class is filtered; an empty page yields no cards") {
    // p1 carries a hidden card (cardWrapper WITHOUT styles_show) — the
    // class-PAIR filter must skip it, like the reference's dict filter
    assert(TrustpilotHtml.extractCards(fixture("acme.com.p1.html")).length == 1)
    assert(TrustpilotHtml.extractCards(fixture("acme.com.p3.html")).isEmpty,
      "the no-reviews page must extract zero cards (the page-walk stop signal)")
  }

  // ---- the Feefo block walk (attribute filters) vs its JSON fixture --------

  test("the Feefo DOM walk yields exactly the pre-extracted fixture fields") {
    val html = new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(
      getClass.getResource("/fixtures/feefo_html/acme-ltd.p1.html").toURI)), "UTF-8")
    val blocks = FeefoHtml.extractBlocks(html)
    assert(blocks.length == 2)
    val dee = blocks.head
    assert(dee.customer_name == "Dee" && dee.customer_location == "UK")
    assert(dee.purchase_date_str == "Date of purchase: 15/03/2025")
    assert(dee.service_review == "fast", // FIRST comment in document order
      s"service review picked '${dee.service_review}' — must not be the product comment")
    assert(dee.product_review == "solid") // the comment nested under the wrapper
    val eli = blocks(1)
    assert(eli.customer_name == "Eli" && eli.service_review == "ok")
    assert(eli.product_review == null && eli.customer_location == null)
  }

  test("Normalize.feefo is identical through the HTML walk and the JSON fixture") {
    val spark = TestSpark.spark
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val html = new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(
      getClass.getResource("/fixtures/feefo_html/acme-ltd.p1.html").toURI)), "UTF-8")
    val viaHtml = FeefoHtml.extractBlocks(html).toDF()
    val viaJson = spark.read.json(
      getClass.getResource("/fixtures/feefo/acme-ltd.json").getPath)
    def normalize(raw: org.apache.spark.sql.DataFrame) =
      Normalize.feefo(raw, lit("Acme Ltd"), lit("acme-ltd"),
          lit(java.sql.Timestamp.valueOf("2025-06-01 00:00:00")))
        .orderBy("customer_name").collect().toSeq
    assert(normalize(viaHtml) == normalize(viaJson),
      "the Feefo DOM walk and the pre-extracted fixture diverge after normalization")
  }

  test("Normalize.trustpilot is identical through the HTML walk and the JSON fixture") {
    val spark = TestSpark.spark
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val viaHtml = Seq(1, 2, 4)
      .flatMap(p => TrustpilotHtml.extractCards(fixture(s"acme.com.p$p.html")))
      .toDF()
    val viaJson = spark.read.json(
      getClass.getResource("/fixtures/trustpilot/acme.com.json").getPath)
    def normalize(raw: org.apache.spark.sql.DataFrame) =
      Normalize.trustpilot(raw, lit("Acme"), lit("acme.com"),
          lit(java.sql.Timestamp.valueOf("2025-06-01 00:00:00")))
        .orderBy("author_name").collect().toSeq
    assert(normalize(viaHtml) == normalize(viaJson),
      "the DOM walk and the pre-extracted fixture diverge after normalization")
  }

  // ---- MainContent: boilerplate removal (r15, E148) ------------------------

  test("MainContent strips nav/header/footer/aside subtrees by tag") {
    val html =
      """<html><body>
        |<nav><ul><li><a href="/">Home</a></li><li><a href="/p">Products page</a></li></ul></nav>
        |<header><h1>Big Site Name Here</h1></header>
        |<article><p>The actual article body sentence with enough characters to keep.</p></article>
        |<aside><p>A long aside promotion paragraph that would pass length checks easily.</p></aside>
        |<footer><p>Copyright and contact information paragraph long enough to keep.</p></footer>
        |</body></html>""".stripMargin
    assert(MainContent.mainBlocks(html) ==
      Seq("The actual article body sentence with enough characters to keep."))
  }

  test("MainContent strips chrome by class/id token, including on otherwise-plain divs") {
    val html =
      """<body>
        |<div class="sidebar"><p>Sidebar text long enough to pass every length threshold here.</p></div>
        |<div id="comments"><p>A comment long enough to pass every length threshold easily.</p></div>
        |<div class="content main"><p>Main content paragraph that must survive the walk intact.</p></div>
        |<div class="related"><h3>Also read</h3><p>Related-links blurb long enough to pass the length test.</p></div>
        |</body>""".stripMargin
    assert(MainContent.mainBlocks(html) ==
      Seq("Main content paragraph that must survive the walk intact."))
  }

  test("MainContent drops link-dense blocks but keeps prose with a citation link") {
    val linky = """<body><p><a href="#">Read more</a> <a href="#">Subscribe now</a> <a href="#">Share this article</a></p></body>"""
    assert(MainContent.mainBlocks(linky).isEmpty)
    val cited =
      """<body><p>A full sentence of running prose that cites <a href="#">one source</a> and keeps going with more words.</p></body>"""
    assert(MainContent.mainBlocks(cited).size == 1)
  }

  test("MainContent emits outermost blocks once (no double-count through nesting)") {
    val html =
      """<body><blockquote><p>A quoted paragraph nested inside a blockquote block element here.</p></blockquote></body>"""
    val spans = MainContent.mainBlocks(html)
    assert(spans == Seq("A quoted paragraph nested inside a blockquote block element here."))
  }

  test("MainContent keeps short headings but not short body fragments") {
    val html = "<body><h2>Title</h2><p>too short</p>" +
      "<p>A body paragraph comfortably past the twenty-five character floor.</p></body>"
    assert(MainContent.mainBlocks(html) ==
      Seq("Title", "A body paragraph comfortably past the twenty-five character floor."))
  }
}
