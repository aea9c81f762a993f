package graft

import org.apache.spark.sql.functions._

import graft.functions.UrlOps

/** Native URL expressions: codegen output == the UrlOps library
  * functions; malformed inputs yield NULL instead of killing the job.
  */
class UrlExprsSpec extends SparkSpec {

  test("graft_url_normalize/_host/_domain match UrlOps; malformed → NULL") {
    import spark.implicits._
    val urls = Seq(
      "HTTP://WWW.Site.COM:80/a/./b/../p.html?utm_source=x&id=1#f",
      "https://MÜNCHEN.de/p?id=1",
      "http://user.github.io/x",
      "/relative/no/scheme",       // malformed for normalize
      "not a url at all",
      null.asInstanceOf[String])
    val out = urls.toDF("url")
      .select(col("url"),
        call_function("graft_url_normalize", col("url")).as("n"),
        call_function("graft_url_host", col("url")).as("h"))
      .collect()
    urls.zip(out).foreach { case (u, row) =>
      val expected: Option[(String, String)] =
        if (u == null) None
        else try {
          Some((UrlOps.normalize(u), UrlOps.toAsciiHost(UrlOps.parse(u).host)))
        } catch { case _: IllegalArgumentException => None }
      expected match {
        case Some((n, h)) =>
          assert(row.getString(1) == n && row.getString(2) == h)
        case None =>
          assert(row.isNullAt(1) && row.isNullAt(2), s"'$u' must yield NULLs")
      }
    }
    // domain over hosts, incl. PSL wildcard/exception arms
    val hosts = Seq("www.example.com", "a.b.test.ck", "city.kawasaki.jp",
      "bucket.s3.amazonaws.com")
    val doms = hosts.toDF("host")
      .select(call_function("graft_url_domain", col("host")).as("d"))
      .as[String].collect().toSeq
    assert(doms == hosts.map(UrlOps.registrableDomain))
  }
}
