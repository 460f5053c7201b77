package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions._
import graft.url.Urls

/** Validates the native Catalyst expressions through the codegen path
  * (DataFrame execution) against the direct Scala calls. */
class ExpressionSpec extends AnyFunSuite with SparkSpecBase {

  test("codegen path agrees with direct Scala calls") {
    import spark.implicits._
    val urls = Seq(
      "HTTP://Example.COM:80/a/../b#f",
      "http://h.fix.test/p?sid=1&x=2",
      "not a url",
      "http://example.com/img.png",
      null
    ).toDF("url")

    val got = urls
      .select(
        col("url"),
        url_canonicalize(col("url")).as("canon"),
        url_canon_filter(col("url")).as("cf"),
        url_host(col("url")).as("host"),
        url_hash64(col("url")).as("h64"),
        url_hash_interleave(col("url")).as("ih"),
        url_accept(col("url")).as("ok")
      )
      .collect()

    for (r <- got) {
      val u = r.getAs[String]("url")
      assert(r.getAs[String]("canon") == Urls.canonicalize(u), s"canon($u)")
      assert(r.getAs[String]("host") == Urls.hostOf(u), s"host($u)")
      if (u != null) {
        assert(r.getAs[Long]("h64") == Urls.hash64(u), s"h64($u)")
        assert(r.getAs[Int]("ih") == Urls.interleaveHash(u), s"ih($u)")
      }
    }
  }

  test("expressions usable from SQL text") {
    val df = spark.sql("SELECT url_canonicalize('HTTP://A.COM:80/x/../y') AS c")
    assert(df.collect().head.getString(0) == "http://a.com/y")
  }
}
