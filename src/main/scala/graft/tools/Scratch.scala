package graft.tools

import org.apache.spark.sql.SparkSession

/** Working verification driver (edited per change under test). Currently:
  * whole-surface plan audit — every SparkEntry query's physical plan is
  * scanned for scale anti-patterns (CartesianProduct /
  * BroadcastNestedLoopJoin anywhere except the two documented brute-force
  * similarity baselines) and for whole-stage-codegen coverage. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      // AQE wraps the static plan in AdaptiveSparkPlan(isFinalPlan=false),
      // hiding WholeStageCodegen spans from explain before execution — off
      // here so the audit sees the real codegen boundaries (the engine runs
      // with AQE on; codegen is unaffected by it)
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.register(spark)

    val dir = "/root/testdata/sf0.001"
    // brute-force exact baselines: the cross join IS the documented design
    // (broadcast query side / bounded maxId); the ANN siblings are the
    // scale path
    val allowedCross = Set("q_embed_topk", "q_embed_pairs")
    var bad = 0
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, q) =>
      try {
        val df = q(spark, dir)
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        val cross = plan.contains("CartesianProduct") ||
          plan.contains("BroadcastNestedLoopJoin")
        // formatted mode marks codegen stages as "* Node (n)" + "[codegen id : k]"
        val codegen = plan.contains("codegen id") || plan.contains("WholeStageCodegen")
        val verdict =
          if (cross && !allowedCross(name)) { bad += 1; "ANTI-PATTERN" }
          else if (cross) "cross-ok(baseline)"
          else "ok"
        println(f"$name%-24s $verdict%-20s codegen=$codegen")
      } catch {
        case e: Exception => bad += 1; println(f"$name%-24s ERROR ${e.getMessage.take(80)}")
      }
    }
    println(if (bad == 0) "PLAN AUDIT CLEAN" else s"PLAN AUDIT: $bad offenders")
    spark.stop()
  }
}
