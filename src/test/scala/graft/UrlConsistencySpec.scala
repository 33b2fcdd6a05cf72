package graft

import org.apache.spark.sql.functions._

import graft.functions.UrlFunctions
import graft.operators.Web

/** Locks the two URL tiers together: [[graft.functions.UrlFunctions]]
  * (parse_url-native fast path, q65-q67) and [[graft.operators.Web]]
  * (RE2-portable strict path, q342) must agree on clean inputs — the
  * documented differences are ONLY the strict tier's extras (userinfo,
  * multi-part registrable domains, root-path convention). */
class UrlConsistencySpec extends SparkSuite {
  import spark.implicits._

  test("scheme/host agree on clean URLs; canonical keys agree modulo root") {
    val urls = Seq(
      "https://www.example.com/a/b?x=1&utm_source=s",
      "HTTP://Shop.Example.COM:80/p",
      "https://ex.org:8443/x/?b=2&a=1",
      "http://sub.site.net/only").toDF("u")
    val both = urls.select(
      UrlFunctions.urlScheme(col("u")).as("s1"),
      Web.urlScheme(col("u")).as("s2"),
      UrlFunctions.urlHost(col("u")).as("h1"),
      Web.urlHost(col("u")).as("h2"),
      UrlFunctions.urlCanonicalize(col("u")).as("c1"),
      Web.urlNormalize(col("u")).as("c2")).collect()
    both.foreach { r =>
      assert(r.getAs[String]("s1") == r.getAs[String]("s2"))
      assert(r.getAs[String]("h1") == r.getAs[String]("h2"))
      // the strict tier keeps a root "/" where the fast path drops it;
      // on non-root paths the keys are identical
      assert(r.getAs[String]("c2") == r.getAs[String]("c1") ||
        r.getAs[String]("c2") == r.getAs[String]("c1") + "/")
    }
  }

  test("the documented divergence: multi-part registrable domains") {
    val r = Seq("https://www.news.bbc.co.uk/x").toDF("u").select(
      UrlFunctions.urlRegisteredDomain(col("u")).as("fast"),
      Web.registrableDomain(Web.urlHost(col("u"))).as("strict"))
      .collect().head
    assert(r.getAs[String]("fast") == "co.uk")     // last-2 heuristic
    assert(r.getAs[String]("strict") == "bbc.co.uk") // multi-part aware
  }
}
