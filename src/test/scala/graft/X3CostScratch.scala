package graft

/** Throwaway cost breakdown for the float-ANN standing adjudication
  * (round-16 verdict #2): times each stage of x3_ann_pq / x3_ann_lsh
  * separately in one session. Not part of the driver surface. */
object X3CostScratch {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = EngineSession.builder("local[8]", 8).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.functions._
    import graft.ops.Similarity
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"  $label%-32s ${(System.nanoTime() - t0) / 1e9}%6.3f s"); r
    }
    // warm session machinery
    emb.groupBy((col("vec_id") % 2).as("k")).count().collect()
    (1 to 3).foreach { round =>
      println(s"--- round $round: x3_ann_pq stages ---")
      val books = time("trainPqCodebooks (driver)") {
        Similarity.trainPqCodebooks(emb, dim = 64, m = 16, ksub = 16)
      }
      val queries = emb.filter(col("vec_id") < 20)
      val codes = time("cachedPqCodes read+count") {
        val c = graft.queries.FixtureCache.cached(spark, dir, "pq-codes-d64-m16-k16", "v1") {
          Similarity.pqEncode(emb, books)
        }; c.count(); c
      }
      val serve = time("pq serve localCheckpoint") {
        Similarity.pqTopKFromCodes(queries, emb, codes, books, k = 5, rerank = 25)
          .localCheckpoint(true)
      }
      time("assembly+collect") {
        val gt = graft.queries.FixtureCache.cached(spark, dir, "x3-gt-q20-k5", "v1") {
          Similarity.bruteForceTopK(queries, emb, 5)
            .select(col("query_id"), col("neighbor_id"))
        }
        val recall = serve.select("query_id", "neighbor_id")
          .join(gt.select(col("query_id"), col("neighbor_id"), lit(1L).as("in_exact")),
            Seq("query_id", "neighbor_id"), "left")
          .groupBy(col("query_id"))
          .agg(expr("sum(coalesce(in_exact, 0)) * 1000 DIV 5").as("recall_pm"))
        gt.select(col("query_id")).distinct()
          .join(broadcast(recall), Seq("query_id"), "left")
          .join(broadcast(serve), Seq("query_id"), "left")
          .na.fill(Map("rank" -> -1, "neighbor_id" -> -1L, "sim" -> 0.0, "recall_pm" -> 0L))
          .collect()
      }
      println(s"--- round $round: x3_ann_lsh stages ---")
      val iso = time("lsh iso serve ckpt") {
        Similarity.lshTopK(queries, emb, k = 5, dim = 64).localCheckpoint(true)
      }
      time("lsh clustered serve+recall agg") {
        graft.queries.LlmOps.queries("x3_ann_lsh")(spark, dir).collect()
      }
    }
    spark.stop()
  }
}
