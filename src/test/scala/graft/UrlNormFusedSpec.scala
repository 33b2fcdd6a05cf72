package graft

import org.apache.spark.sql.functions._

import graft.operators.Web

/** Optimization r10: the fused one-byte-walk [[graft.functions.UrlKernels]]
  * must return EXACTLY what the declarative seven-regex composition
  * ([[Web.urlNormalizeDeclarative]]) returns — including Java-regex
  * backtracking quirks. Fixed adversarial cases first (each one pins a
  * documented quirk), then a seeded component fuzz. */
class UrlNormFusedSpec extends SparkSuite {
  import spark.implicits._

  private def both(urls: Seq[String]): Seq[(String, String, String)] =
    urls.toDF("u")
      .select(col("u"), Web.urlNormalize(col("u")).as("fused"),
        Web.urlNormalizeDeclarative(col("u")).as("decl"))
      .collect()
      .map(r => (r.getString(0),
        if (r.isNullAt(1)) null else r.getString(1),
        if (r.isNullAt(2)) null else r.getString(2)))
      .toSeq

  private def assertAgree(urls: Seq[String]): Unit = {
    val bad = both(urls).filter { case (_, f, d) => f != d }
    assert(bad.isEmpty,
      s"fused != declarative on ${bad.size} inputs, first 5: ${bad.take(5)}")
  }

  test("fixed adversarial cases agree (and pin the quirk semantics)") {
    val cases = Seq(
      // plain + case/port/tracking/sort/slash handling
      "HTTP://www.Ex.COM:80/p/?utm_source=x&b=2&a=1",
      "https://ex.org:443/?fbclid=abc",
      "http://ex.org:8080/x",
      "ftp://Files.example.Co.UK:21/a//b///?z=9&utm_campaign=s#frag",
      // userinfo strip, empty-host backtrack (host becomes "x@")
      "http://user:pw@h.example.com/a",
      "http://x@/",
      "http://@host/",
      "http://a@b@c/p",
      // the port-backtracking quirk: host b, port 1
      "http://a:1@b/",
      // IPv6 brackets, broken brackets, bracket-then-junk
      "http://[::1]:8080/x?a=1",
      "https://[2001:db8::7]/p/",
      "http://[::1/p",
      "http://[a]x:8/p",
      "http://u@[::1]:9/p",
      // port digit runs: non-digit tail, overflow, leading zeros, empty
      "http://h:80abc/x",
      "http://h:00080/x",
      "http://h:99999999999999999999/x",
      "http://h:/p",
      "http://h:1:2/p",
      // path/query/fragment interleavings incl. '?' after '#'
      "http://h",
      "http://h/",
      "http://h///",
      "http://h/p#f?a=1",
      "http://h/p?",
      "http://h/p?#",
      "http://h/p?&&",
      "http://h/p?a=1&&b=2&",
      "http://h/p?gclid&a=1&utm_source",
      "http://h/p?flag&a=1",
      "http://h/p?b=%20&a=+&B=2&a=1",
      "http://h/p??x=1",
      "http://h/p?a=1#x?b=2",
      // tracking-param edges: prefix-only vs full match, '=' variants
      "http://h/p?utm_=1&utm=2&utma=3&utm_x_y=4",
      "http://h/p?mc_cid=z&mc_eid&mc_x=1",
      "http://h/p?GCLID=caps&gclid=low",
      // scheme edges
      "a://h/p",
      "a+b-c.9://h/p",
      "1http://h/p",
      "://h/p",
      "http:/h/p",
      "http//h/p",
      "",
      "not a url at all",
      // non-ASCII host bytes (Unicode lowercase path)
      "http://\u00dcber.Example.COM/p",
      "http://h\u00d8st/p?x=\u00e9",
      // '?' before any '#', multiple '&' runs, param that is just '='
      "http://h/p?=&==&a",
      // userinfo with excluded chars stops the userinfo scan
      "http://u/v@h/p",
      "http://u?v@h/p",
      "http://u#v@h/p",
      // trailing line terminators: \\z (and RE2's $) must NOT strip
      // the slashes before a final \n / \r\n / u0085 / u2028 / u2029
      // (the Java-$ quirk the r10 advice flagged); these pin
      // end-of-text semantics on every terminator class
      "http://h/p/\n",
      "http://h/p//\r\n",
      "http://h/p/\r",
      "http://h/p/\u0085",
      "http://h/p/\u2028",
      "http://h/p/\u2029",
      "http://h/p\n/",
      "http://h/p/\n?b=2&a=1")
    assertAgree(cases)
  }

  test("seeded component fuzz agrees (2000 URLs)") {
    val rnd = new scala.util.Random(20261234L)
    val schemes = Seq("http", "HTTP", "https", "HtTpS", "ftp", "a+b-c.9",
      "1bad", "", "x")
    val seps = Seq("://", ":/", "//", ":", "")
    val uis = Seq("", "user@", "user:pw@", "@", "a@b@", "a:1@", "u?x@")
    val hosts = Seq("ex.com", "WWW.Ex.Org", "h", "[::1]", "[2001:db8::7]",
      "[broken", "", "h\u00d8st", "a@b")
    val ports = Seq("", ":80", ":443", ":8080", ":0", ":00080",
      ":99999999999999999999", ":", ":x", ":1:2", ":80abc")
    val paths = Seq("", "/", "//", "/p", "/p/", "/p//q///", "/a b",
      "/p\u00e9",
      // line-terminator tails: the \z vs Java-$ divergence class
      "/p/\n", "/p//\r\n", "/p/\r", "/p/\u2028", "/p/\u0085", "/p\n/")
    val queries = Seq("", "?", "?a=1", "?b=2&a=1", "?utm_source=x&b=2",
      "?gclid&flag", "?&&", "?a=1&&b=2&", "?=&a", "?z=9&utm_campaign=s",
      "?GCLID=x&gclid=y", "?mc_cid=1&mc_eid&mc_x=2", "??x")
    val frags = Seq("", "#", "#f", "#f?late=1")
    val urls = (1 to 2000).map { _ =>
      schemes(rnd.nextInt(schemes.size)) + seps(rnd.nextInt(seps.size)) +
        uis(rnd.nextInt(uis.size)) + hosts(rnd.nextInt(hosts.size)) +
        ports(rnd.nextInt(ports.size)) + paths(rnd.nextInt(paths.size)) +
        queries(rnd.nextInt(queries.size)) + frags(rnd.nextInt(frags.size))
    }
    assertAgree(urls)
  }

  test("null input stays null; non-string input refuses at analysis") {
    val r = Seq[Option[String]](None).toDF("u")
      .select(Web.urlNormalize(col("u")).as("n")).collect().head
    assert(r.isNullAt(0))
    intercept[Exception] {
      Seq(1).toDF("u").select(graft.functions.url_normalize(col("u")))
        .collect()
    }
  }
}
