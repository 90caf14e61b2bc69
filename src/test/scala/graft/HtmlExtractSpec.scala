package graft

import org.apache.spark.sql.functions.col

import graft.operators.TextAnalysis

/** [[TextAnalysis.htmlMainText]] — the extraction-order invariants that
  * the t31 oracle can't isolate individually: element-content removal,
  * decode-after-strip, entity decode order, the \b tag-boundary guard,
  * and the two keep rules firing independently. */
class HtmlExtractSpec extends SparkSpec {
  import spark.implicits._

  private def extract(html: String,
      minTokens: Int = 5, maxLinkPermyriad: Int = 2000) = {
    val out = TextAnalysis.htmlMainText(
      Seq((1L, html)).toDF("doc_id", "html"),
      minTokens = minTokens, maxLinkPermyriad = maxLinkPermyriad)
      .collect().head
    (out.getAs[String]("main_text"), out.getAs[Long]("n_blocks"),
      out.getAs[Long]("n_kept"), out.getAs[Long]("n_dropped_link"))
  }

  test("script/style ELEMENTS vanish with their content, case-insensitive") {
    val (txt, _, _, _) = extract(
      """<p>alpha beta gamma delta epsilon</p>
        |<SCRIPT type="x">var kept = "should not appear";</SCRIPT>
        |<style media="all">.p { content: "nor this" }</style>""".stripMargin)
    assert(txt === "alpha beta gamma delta epsilon")
  }

  test("decode AFTER strip: markup spelled as entities survives as prose") {
    // <b>bold</b> written with entities is PROSE — a decode-before-strip
    // implementation would decode it into real markup and strip it.
    val (txt, _, _, _) = extract(
      "<p>use the &lt;b&gt;bold&lt;/b&gt; tag here</p>")
    assert(txt === "use the <b>bold</b> tag here")
  }

  test("&amp; decodes LAST: &amp;lt; means literal '&lt;'") {
    val (txt, _, _, _) = extract(
      "<p>write &amp;lt; to show a less-than sign ok</p>")
    assert(txt === "write &lt; to show a less-than sign ok")
  }

  test("inline tags strip in place without splitting the block") {
    val (txt, _, kept, _) = extract(
      "<p>one <b>two</b> three <em>four</em> five <span>six</span></p>")
    assert(txt === "one two three four five six")
    assert(kept === 1L)
  }

  test("\\b guard: <param>/<link> are not block boundaries (p/li prefixes)") {
    val (txt, _, kept, _) = extract(
      "<p>one two <param name=x> three <link href=y> four five six</p>")
    assert(kept === 1L)
    assert(txt === "one two three four five six")
  }

  test("the two drop rules fire independently and are counted") {
    val html =
      "<p>a long enough plain paragraph right here</p>" + // kept
        "<p>too short</p>" + // dropped: < minTokens, not a link drop
        "<p>go <a href=x>here</a> and <a href=y>there</a> and <a href=z>back</a></p>" // 6 toks, 3 links
    val (txt, blocks, kept, droppedLink) = extract(html)
    assert(txt === "a long enough plain paragraph right here")
    assert(blocks === 3L)
    assert(kept === 1L)
    assert(droppedLink === 1L)
  }

  test("link density is measured BEFORE tag strip, against block tokens") {
    // 1 link over 8 tokens = 1250 permyriad ≤ 2000 → kept.
    val (txt, _, kept, _) = extract(
      "<p>read <a href=x>this piece</a> for the full background today</p>")
    assert(kept === 1L)
    assert(txt === "read this piece for the full background today")
  }

  test("whitespace collapses across newlines, tabs, and &nbsp;") {
    val (txt, _, _, _) = extract(
      "<p>alpha\n\tbeta&nbsp;&nbsp;gamma   delta epsilon</p>")
    assert(txt === "alpha beta gamma delta epsilon")
  }

  test("comments vanish; empty and markup-only pages yield empty output") {
    val (txt, blocks, kept, _) = extract(
      "<!-- five words hiding in here --><div></div><br/>")
    assert(txt === "")
    assert(blocks === 0L)
    assert(kept === 0L)
  }
}
