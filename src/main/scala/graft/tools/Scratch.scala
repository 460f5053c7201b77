package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Working verification driver (edited per change under test). Currently:
  * round-5 batch — crawldb stats tools, FreeGenerator, FastUrlFilter,
  * index-replace, parsefilter-regex — driven through the public API with
  * plan audits (stats aggs must be single-shuffle partial aggregations;
  * replace/flags must stay inside WholeStageCodegen). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val dir = "/root/testdata/sf0.01"

    def codegen(df: org.apache.spark.sql.DataFrame, what: String): Unit = {
      val plan = df.queryExecution.executedPlan.toString
      val nEx = plan.linesIterator.count(_.contains("Exchange"))
      println(s"$what: exchanges=$nEx codegenSpans=" +
        plan.linesIterator.count(_.contains("WholeStageCodegen")))
    }

    // --- stats tools over a real-shaped frontier: expect ONE exchange each
    //     (partial_count map-side, final after one shuffle) ---
    val completion = graft.queries.Relational.crawlCompletion(spark, dir)
    codegen(completion, "crawlCompletionStats")
    completion.explain("formatted")
    println("completion rows: " + completion.count())

    val pstats = graft.queries.Relational.protocolStatus(spark, dir)
    codegen(pstats, "protocolStatusStats")
    pstats.show(10, false)

    // --- FreeGenerator: text lines → fetchlist; expect exchanges = 2
    //     (distinct + host repartition), host-sticky output ---
    val fg = graft.queries.Relational.freeGenerate(spark, dir)
    codegen(fg, "freeGenerate")
    println("freeGenerate rows: " + fg.count())

    // --- index-replace + regex flags: zero exchanges, pure codegen ---
    val rep = graft.queries.Relational.indexReplace(spark, dir)
    codegen(rep, "indexReplace")
    rep.show(3, false)
    val flags = graft.queries.Relational.regexFlags(spark, dir)
    codegen(flags, "regexFlags")
    println("flag distribution:")
    flags.groupBy("has_digit", "has_longword", "has_body").count().show(false)

    // --- FastUrlFilter through a crawl config (extraUrlFilters seam) ---
    val fast = graft.url.FastUrlFilter.parse(
      "Domain fix.test\n  DenyPath ^/blocked\n")
    val cfgF = graft.frontier.CrawlConfig(extraUrlFilters = Seq(fast))
    val lines = Seq("http://a.fix.test/ok", "http://a.fix.test/blocked/x",
      "http://b.other.test/blocked/x").toDS()
    val tasks = graft.frontier.FrontierTools.freeGenerate(lines, cfgF, 1L).collect()
    println("fast-filtered fetchlist: " + tasks.map(_.url).sorted.mkString(", "))
    assert(tasks.map(_.url).toSet ==
      Set("http://a.fix.test/ok", "http://b.other.test/blocked/x"))

    spark.stop()
  }
}
