package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** PII/URL scrub (C21) edge cases the registered oracle query can't
  * isolate: pass-through of clean text, multiple hits per class, the
  * URL-before-email order contract, and placeholder stability. */
class ScrubSpec extends AnyFunSuite {
  import SparkTest._

  private def scrub(s: String): String = {
    import spark.implicits._
    Seq(s).toDF("t").select(TextFunctions.redactPii(col("t"))).head().getString(0)
  }

  test("clean text passes through byte-identical") {
    val s = "the quick brown fox jumps over 12 lazy dogs"
    assert(scrub(s) == s)
  }

  private def html(s: String): String = {
    import spark.implicits._
    Seq(s).toDF("t").select(TextFunctions.htmlToText(col("t"))).head().getString(0)
  }

  test("htmlToText: blocks die with their content, tags strip, entities decode last") {
    assert(html("<p>hello <b>world</b></p>") == "hello world")
    // script/style payloads must not leak into the text — including a
    // bare '<' inside the script that tag-stripping alone would mangle
    assert(html("a<script>var x = 1 < 2;</script>b<style>p{}</style>c") == "a b c")
    // entity decode AFTER tag strip: &lt;3 survives as a literal <3;
    // &amp;lt; decodes ONE pass to the literal string &lt;
    assert(html("I &lt;3 <i>markup</i> &amp;lt; escapes") == "I <3 markup &lt; escapes")
    // attributes (with quoted '>'-free values), multiline whitespace
    assert(html("<a href=\"http://x.io\" rel=\"no\">link</a>\n\n  text") == "link text")
    // plain text with no markup passes through byte-identical
    val plain = "no markup at all, just text"
    assert(html(plain) == plain)
    // bare '<' in prose is TEXT, not a tag opener (the HTML5 lexer
    // rule): inequality spans must survive, not vanish to the next '>'
    assert(html("scores: 3 < 5 but 9 > 7 overall") == "scores: 3 < 5 but 9 > 7 overall")
    assert(html("I <3 you <b>so</b> much") == "I <3 you so much")
  }

  test("each class redacts, repeatedly, in one pass") {
    assert(scrub("mail a@b.io and c.d+e@f-g.org today") ==
      "mail <EMAIL> and <EMAIL> today")
    assert(scrub("see https://x.io/a and http://y.z/b?q=1 end") ==
      "see <URL> and <URL> end")
    assert(scrub("call +1 (555) 123-4567 or 020 7946 0958.") ==
      "call <PHONE> or <PHONE>.")
  }

  test("an email inside a URL disappears as part of the URL, not as <EMAIL>") {
    assert(scrub("https://x.io/unsub?u=a@b.io done") == "<URL> done")
  }

  test("placeholders survive later stages (no digits for the phone pass to eat)") {
    assert(scrub("a@b.io https://x.io +1 (555) 123-4567") ==
      "<EMAIL> <URL> <PHONE>")
  }

  test("short digit runs in prose are not phones") {
    assert(scrub("chapter 12 of 30, page 1984") == "chapter 12 of 30, page 1984")
  }

  test("IPs, dotted versions, and decimal runs are not phones") {
    val s = "server 192.168.100.200 runs v2.31.4167 and pi is 3.14159 2.71828"
    assert(scrub(s) == s)
  }

  private def domains(s: String): Seq[String] = {
    import spark.implicits._
    Seq(s).toDF("t").select(TextFunctions.urlDomains(col("t")))
      .head().getSeq[String](0)
  }

  test("piiStats counts mirror the scrub chain and refuse column collisions") {
    import spark.implicits._
    val df = Seq(
      (1L, "mail a@b.io or https://x.io/u?e=c@d.io call +1 (555) 123-4567"),
      (2L, "clean prose only")).toDF("doc_id", "t")
    val got = TextFunctions.piiStats(df, col("t"))
      .orderBy(col("doc_id"))
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getBoolean(5)))
    // the email INSIDE the URL query string counts as the URL, not as
    // a second email — the redactPii order contract
    assert(got.toSeq == Seq(
      (1L, 1L, 1L, 1L, true),
      (2L, 0L, 0L, 0L, false)), s"got ${got.toSeq}")

    val e = intercept[IllegalArgumentException] {
      TextFunctions.piiStats(df.withColumn("n_urls", lit(9L)), col("t"))
    }
    assert(e.getMessage.contains("n_urls"))

    // NULL text reports 0/false — not NULLs that vanish from both
    // sides of a clean/dirty filter
    val withNull = Seq((3L, null: String)).toDF("doc_id", "t")
    val nr = TextFunctions.piiStats(withNull, col("t")).head()
    assert((nr.getLong(2), nr.getLong(3), nr.getLong(4), nr.getBoolean(5)) ==
      (0L, 0L, 0L, false), s"got $nr")
  }

  test("urlDomains: host stops at path/query/fragment, lowercases, keeps ports") {
    assert(domains("see https://A.B.com/x http://c.io?q=1 https://d.net#f") ==
      Seq("a.b.com", "c.io", "d.net"))
    assert(domains("dev http://localhost:8080/admin up") == Seq("localhost:8080"))
    assert(domains("no urls here, just ftp://x.io and mailto:a@b.io") == Seq.empty)
  }

  test("urlDomains: prose punctuation never pollutes the domain key") {
    // trailing comma/period and quote/paren wrappers stop the host
    assert(domains("read https://a.io, then https://b.io. done") ==
      Seq("a.io", "b.io"))
    assert(domains("(https://c.io) \"https://d.io\" https://e.io!") ==
      Seq("c.io", "d.io", "e.io"))
    // adjacent URLs with no separator both surface, neither fused
    assert(domains("https://a.io,https://b.io") == Seq("a.io", "b.io"))
  }

  test("domainStats counts urls per domain and distinct docs separately") {
    import spark.implicits._
    val df = Seq(
      (1L, "go https://x.io/a then https://x.io/b and https://y.io/c"),
      (2L, "see https://x.io/d"),
      (3L, "plain text")).toDF("doc_id", "t")
    val got = TextFunctions.domainStats(df, col("doc_id"), col("t"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set(("x.io", 3L, 2L), ("y.io", 1L, 1L)), s"got $got")
  }
}
