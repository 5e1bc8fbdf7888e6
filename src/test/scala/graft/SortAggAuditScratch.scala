package graft

/** Throwaway round-20 sweep: build every registered entry on sf0.001 and
  * flag plans containing SortAggregate (usually a dropDuplicates/first()
  * whose buffer type HashAggregate cannot hold — the x2_editdist1 plan
  * defect) or ObjectHashAggregate fallback sorts. Build-only.
  * `sbt "Test/runMain graft.SortAggAuditScratch"`. */
object SortAggAuditScratch {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = EngineSession.builder("local[8]", 8).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val rows = SparkEntry.queries.toSeq.sortBy(_._1)
      .filterNot { case (n, _) => Bench.streamBuilderEntries(n) }
      .flatMap { case (name, fn) =>
        try {
          val p = fn(spark, dir).queryExecution.executedPlan.toString
          def count(prefix: String) = p.linesIterator.count(
            _.dropWhile(!_.isLetter).startsWith(prefix))
          val sa = count("SortAggregate")
          val oha = count("ObjectHashAggregate")
          if (sa > 0 || oha > 0)
            Some(f"$name%-28s sortAgg=$sa%2d objHashAgg=$oha%2d")
          else None
        } catch { case e: Throwable =>
          Some(s"$name BUILD-FAIL ${e.getClass.getSimpleName}") }
      }
    println("=== sort-aggregate smells ===")
    rows.foreach(println)
    println(s"=== ${rows.size} flagged of ${SparkEntry.queries.size} ===")
    spark.stop()
  }
}
