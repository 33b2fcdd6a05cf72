package graft

import org.apache.spark.sql.functions._
import graft.functions.UrlFunctions._

class UrlSpec extends SparkSuite {
  import spark.implicits._

  private lazy val urls = Seq(
    "HTTPS://WWW.News.Example.COM:443/a/b/?utm_source=x&id=7&ref=home#top",
    "http://example.com:8080/",
    "https://sub.domain.example.org/path",
    "https://example.com"
  ).toDF("url")

  test("canonicalize: case, default port, trailing slash, utm drop, " +
      "param sort, fragment drop") {
    val got = urls.select(urlCanonicalize(col("url"))).as[String].collect()
    assert(got(0) == "https://www.news.example.com/a/b?id=7&ref=home")
    assert(got(1) == "http://example.com:8080")
    assert(got(2) == "https://sub.domain.example.org/path")
    assert(got(3) == "https://example.com")
  }

  test("host, registered domain, port, path depth") {
    val r = urls.select(urlHost(col("url")), urlRegisteredDomain(col("url")),
      urlPort(col("url")), urlPathDepth(col("url"))).collect()
    assert(r(0).getString(0) == "www.news.example.com")
    assert(r(0).getString(1) == "example.com")
    assert(r(0).getString(2) == "443")
    assert(r(0).getInt(3) == 2)
    assert(r(1).getString(2) == "8080")
    assert(r(2).getString(1) == "example.org")
    assert(r(3).getInt(3) == 0)
  }

  test("canonical form is a dedup key: equivalent spellings collide") {
    val variants = Seq(
      "https://Example.com:443/x?b=2&a=1",
      "HTTPS://example.COM/x/?a=1&b=2&utm_campaign=z#sec"
    ).toDF("url")
    val canon = variants.select(urlCanonicalize(col("url")))
      .distinct().as[String].collect()
    assert(canon.toSeq == Seq("https://example.com/x?a=1&b=2"))
  }
}
