package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch driver for ad-hoc verification runs (see .claude/skills/verify). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.register(spark)
    val dir = "/root/testdata/sf0.001"

    println("=== q_scan_filter_project (pushdown check) ===")
    graft.queries.Relational.scanFilterProject(spark, dir).explain("formatted")

    println("=== q_registered_domain (codegen PSL expr) ===")
    graft.queries.Relational.registeredDomain(spark, dir).explain("formatted")

    println("=== q_segment_merge (partial-agg max_by) ===")
    graft.queries.Relational.segmentMerge(spark, dir).explain("formatted")
    spark.stop()
  }
}
