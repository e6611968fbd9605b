package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.UrlCuration

/** URL canonicalization + domain frequency cap ([[UrlCuration]]):
  * host/domain extraction goldens, the cap's determinism and group
  * semantics, and null-URL handling. */
class UrlCurationSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def hostOf(u: String): Option[String] =
    Seq(Option(u)).toDF("u")
      .select(UrlCuration.urlHost(col("u"))).as[Option[String]].head()

  private def domainOf(u: String): Option[String] =
    Seq(Option(u)).toDF("u")
      .select(UrlCuration.registrableDomain(
        UrlCuration.urlHost(col("u")))).as[Option[String]].head()

  test("host extraction goldens: schemes, userinfo, ports, www, case, " +
      "query/fragment; garbage and bare strings yield null") {
    assert(hostOf("https://www.Example.COM/a/b?q=1") === Some("example.com"))
    assert(hostOf("http://sub.host.org:8080/path") === Some("sub.host.org"))
    assert(hostOf("ftp://user:pw@Files.Site.NET/x") === Some("files.site.net"))
    assert(hostOf("https://host.io#frag") === Some("host.io"))
    assert(hostOf("custom+scheme-1://abc.de") === Some("abc.de"))
    assert(hostOf("not a url") === None)
    assert(hostOf("/relative/path") === None)
    assert(hostOf("") === None)
  }

  test("registrable-domain heuristic: last two labels; dotless hosts " +
      "pass through; coarser-only on multi-label public suffixes") {
    assert(domainOf("https://a.b.example.com/x") === Some("example.com"))
    assert(domainOf("https://example.com") === Some("example.com"))
    assert(domainOf("http://localhost:9000/") === Some("localhost"))
    // PSL-less: co.uk collapses COARSER (documented) — cap only tightens
    assert(domainOf("https://shop.example.co.uk") === Some("co.uk"))
  }

  test("domainCap keeps at most `cap` rows per domain, chosen " +
      "deterministically by the order columns; null URLs form their " +
      "own capped group; answers stable across reruns") {
    val df = (0 until 30).map { i =>
      val url =
        if (i % 10 == 9) null
        else s"https://www.d${i % 3}.org/doc/$i"
      (i.toLong, url, (i * 7 % 13).toLong)
    }.toDF("id", "url", "q")
    val capped = UrlCuration.domainCap(df, "url", cap = 3,
      Seq(col("q").desc, col("id").asc))
    val got = capped.select("_domain", "id")
      .as[(Option[String], Long)].collect().toSet
    // exact expectation computed independently
    val expect = (0 until 30).map { i =>
      val d = if (i % 10 == 9) None else Some(s"d${i % 3}.org")
      (d, i.toLong, (i * 7 % 13).toLong)
    }.groupBy(_._1).toSeq.flatMap { case (d, rows) =>
      rows.sortBy(r => (-r._3, r._2)).take(3).map(r => (d, r._2))
    }.toSet
    assert(got === expect)
    assert(capped.count() === capped.count()) // deterministic re-eval
    // every domain at most cap rows
    val perDomain = capped.groupBy("_domain").count()
      .select("count").as[Long].collect()
    assert(perDomain.forall(_ <= 3L))
  }

  test("domainCap refuses inputs that already carry the reserved " +
      "_domain/_rk columns instead of silently overwriting them") {
    val base = Seq((1L, "https://a.org/x")).toDF("id", "url")
    val e1 = intercept[IllegalArgumentException](UrlCuration.domainCap(
      base.withColumn("_domain", lit("caller-data")), "url", 3,
      Seq(col("id"))))
    assert(e1.getMessage.contains("_domain"))
    val e2 = intercept[IllegalArgumentException](UrlCuration.domainCap(
      base.withColumn("_rk", lit(9)), "url", 3, Seq(col("id"))))
    assert(e2.getMessage.contains("_rk"))
  }
}
