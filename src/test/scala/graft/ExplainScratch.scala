package graft

/** Throwaway plan-audit harness: print the formatted physical plan of a
  * driver entry. `sbt "Test/runMain graft.ExplainScratch <entry> [sfDir]"`. */
object ExplainScratch {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("x3_rule_topk_l2")
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = EngineSession.builder("local[8]", 8).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.queries(name)(spark, dir)
    println(s"=== $name (optimized) ===")
    println(df.queryExecution.optimizedPlan.treeString.take(8000))
    println(s"=== $name (formatted physical) ===")
    println(org.apache.spark.sql.execution.debug.codegenString(
      df.queryExecution.executedPlan).take(400))
    df.explain("formatted")
    spark.stop()
  }
}
