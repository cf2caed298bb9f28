package graft.ext

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class WebSpec extends SparkTestBase {
  import spark.implicits._

  test("url extraction, host, and registrable domain") {
    val df = Seq(
      (1L, "read https://docs.sub.example.org/a/b and http://example.net:8080/x?q=1 now"),
      (2L, "no links here"),
      (3L, "bare host https://localhost/page end")
    ).toDF("id", "text")
    val got = df.select(
      col("id"),
      Web.extractUrls(col("text")).as("urls"),
      Web.urlHost(try_element_at(Web.extractUrls(col("text")), lit(1))).as("host"),
      Web.registrableDomain(
        Web.urlHost(try_element_at(Web.extractUrls(col("text")), lit(1)))).as("domain"))
      .collect().map(r => r.getLong(0) ->
        ((r.getSeq[String](1), r.getString(2), r.getString(3)))).toMap
    assert(got(1L)._1 === Seq("https://docs.sub.example.org/a/b", "http://example.net:8080/x?q=1"))
    assert(got(1L)._2 === "docs.sub.example.org")
    assert(got(1L)._3 === "example.org")
    assert(got(2L)._1 === Seq.empty)
    assert(got(3L)._2 === "localhost" && got(3L)._3 === "localhost")
    // port is not part of the host
    assert(df.filter(col("id") === 1)
      .select(Web.urlHost(try_element_at(Web.extractUrls(col("text")), lit(2))))
      .head().getString(0) === "example.net")
  }

  test("blocklist filter drops exactly the blocked domains; stats aggregate the rest") {
    val docs = Seq(
      (1L, "example.org", 10L), (2L, "spam.example", 20L),
      (3L, "example.org", 30L), (4L, "other.net", 40L)
    ).toDF("doc_id", "domain", "n_chars")
    val blocked = Seq("spam.example").toDF("domain")
    val kept = Web.filterBlockedDomains(docs, "domain", blocked)
    assert(kept.select("doc_id").as[Long].collect().sorted.toSeq === Seq(1L, 3L, 4L))
    val stats = Web.domainStats(kept, "domain", "n_chars")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(stats === Map("example.org" -> ((2L, 40L)), "other.net" -> ((1L, 40L))))
  }
}
