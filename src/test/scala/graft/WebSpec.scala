package graft

import org.apache.spark.sql.functions._

import graft.operators.Web

/** r7 additions, seventh wave: URL parse / registrable-domain /
  * canonical normalization — component extraction, tracking-param
  * strip, default-port and trailing-slash collapse, non-URL refusal. */
class WebSpec extends SparkSuite {
  import spark.implicits._

  private def one(u: String): org.apache.spark.sql.Row =
    Seq(u).toDF("u").select(
      Web.urlScheme(col("u")).as("scheme"),
      Web.urlHost(col("u")).as("host"),
      Web.urlPort(col("u")).as("port"),
      Web.urlPath(col("u")).as("path"),
      Web.registrableDomain(Web.urlHost(col("u"))).as("domain"),
      Web.urlNormalize(col("u")).as("norm")).collect().head

  test("parse: components, userinfo and port split off the host") {
    val r = one("HTTPS://user:pw@WWW.Shop.Example.COM:8443/a/b?x=1#f")
    assert(r.getAs[String]("scheme") == "https")
    assert(r.getAs[String]("host") == "www.shop.example.com")
    assert(r.getAs[Long]("port") == 8443L)
    assert(r.getAs[String]("path") == "/a/b")
    assert(r.getAs[String]("domain") == "example.com")
    assert(r.getAs[String]("norm") ==
      "https://www.shop.example.com:8443/a/b?x=1")
  }

  test("IPv6 bracket literals: host keeps brackets, port parses (r8)") {
    val r = one("http://[::1]:8080/x?a=1")
    assert(r.getAs[String]("host") == "[::1]")
    assert(r.getAs[Long]("port") == 8080L)
    assert(r.getAs[String]("path") == "/x")
    assert(r.getAs[String]("domain") == null) // no dotted labels
    assert(r.getAs[String]("norm") == "http://[::1]:8080/x?a=1")
    val r2 = one("https://[2001:db8::7]/p/")
    assert(r2.getAs[String]("host") == "[2001:db8::7]")
    assert(r2.isNullAt(r2.fieldIndex("port")))
    assert(r2.getAs[String]("norm") == "https://[2001:db8::7]/p")
  }

  test("bare tracking params (no '=') strip like valued ones (r8)") {
    val r = one("http://ex.org/p?gclid&a=1&utm_source")
    assert(r.getAs[String]("norm") == "http://ex.org/p?a=1")
    // a non-tracking bare param survives
    val r2 = one("http://ex.org/p?flag&a=1")
    assert(r2.getAs[String]("norm") == "http://ex.org/p?a=1&flag")
  }

  test("normalize: default ports, tracking params, sort, trailing slash") {
    val r = one("http://A.B.example.com:80/p/?utm_source=x&b=2&a=1")
    assert(r.getAs[String]("norm") == "http://a.b.example.com/p?a=1&b=2")
    // root path stays a single slash; https 443 drops
    val r2 = one("https://ex.org:443/?fbclid=abc")
    assert(r2.getAs[String]("norm") == "https://ex.org/")
    // non-default port survives
    val r3 = one("http://ex.org:8080/x")
    assert(r3.getAs[String]("norm") == "http://ex.org:8080/x")
  }

  test("registrable domain: multi-part second-level heuristic") {
    val d = Seq("www.news.bbc.co.uk", "sub.example.com", "example.org",
      "localhost").toDF("h")
      .select(Web.registrableDomain(col("h")).as("d"))
      .collect().map(r => Option(r.getAs[String]("d")))
    assert(d(0).contains("bbc.co.uk"))
    assert(d(1).contains("example.com"))
    assert(d(2).contains("example.org"))
    assert(d(3).isEmpty) // single label: no registrable domain
  }

  test("non-URL inputs refuse with null, not garbage") {
    val r = one("not a url at all")
    assert(r.isNullAt(r.fieldIndex("scheme")))
    assert(r.isNullAt(r.fieldIndex("host")))
    assert(r.isNullAt(r.fieldIndex("norm")))
  }

  test("dedup key: equivalent messy variants collapse to one norm") {
    val urls = Seq(
      "http://EX.com/a?b=2&a=1",
      "http://ex.com:80/a/?a=1&b=2#frag",
      "HTTP://user@ex.com/a?utm_campaign=c&a=1&b=2").toDF("u")
      .select(Web.urlNormalize(col("u")).as("n"))
      .collect().map(_.getAs[String]("n")).toSet
    assert(urls == Set("http://ex.com/a?a=1&b=2"))
  }
}
