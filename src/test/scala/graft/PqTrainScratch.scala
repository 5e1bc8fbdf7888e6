package graft

import org.apache.spark.sql.functions._
import graft.ops.Similarity

/** Throwaway parameter sweep for the trained-PQ entry: which (corpus, m,
  * ksub, rounds) shows an honest, stable Lloyd win? Prints avg recall_pm
  * for seed (rounds=0) vs trained per configuration.
  * `sbt "Test/runMain graft.PqTrainScratch"`. */
object PqTrainScratch {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = EngineSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val real = emb.select($"vec_id",
      Similarity.milliQuantize($"embedding").as("mv")).localCheckpoint(true)
    val realQ = real.filter($"vec_id" >= 80 && $"vec_id" < 100)

    def recall(corpus: org.apache.spark.sql.DataFrame,
               queries: org.apache.spark.sql.DataFrame,
               m: Int, ksub: Int, rounds: Int): Double = {
      val cb = Similarity.trainPqCodebooksInt(corpus, m, 64 / m, ksub, rounds)
        .localCheckpoint(true)
      val approx = Similarity.pqServeInt(queries, corpus, cb, m, 64 / m, k = 5)
      val gt = Similarity.bruteForceTopKInt(queries, corpus, k = 5)
        .select($"query_id", $"neighbor_id", lit(1L).as("in_exact"))
      approx.select("query_id", "neighbor_id")
        .join(gt, Seq("query_id", "neighbor_id"), "left")
        .groupBy($"query_id")
        .agg(expr("sum(coalesce(in_exact, 0)) * 1000 DIV 5").as("r"))
        .agg(avg($"r")).as[Double].head()
    }
    if (args.headOption.contains("sweep")) {
      for (m <- Seq(8, 16); ksub <- Seq(16, 32)) {
        val s0 = recall(real, realQ, m, ksub, 0)
        val s2 = recall(real, realQ, m, ksub, 2)
        val s3 = recall(real, realQ, m, ksub, 3)
        println(f"real      m=$m%-3d ksub=$ksub%-3d seed=$s0%6.1f r2=$s2%6.1f r3=$s3%6.1f")
      }
    } else {
      // stage timing of the x3_ann_pq_trained composition (run 2x: warm)
      def t(label: String)(f: => Unit): Unit = {
        val t0 = System.nanoTime()
        f
        println(f"$label%-18s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      }
      (1 to 2).foreach { r =>
        println(s"--- round $r")
        t("milli-ckpt") { real.count() }
        var cb: org.apache.spark.sql.DataFrame = null
        t("train-2r") { cb = Similarity.trainPqCodebooksInt(real, 16, 4, 16, 2) }
        var served: org.apache.spark.sql.DataFrame = null
        t("serve-ckpt") {
          served = Similarity.pqServeInt(realQ, real, cb, 16, 4, 5)
            .localCheckpoint(true) }
        t("serve-seed") {
          Similarity.pqServeInt(realQ, real,
              Similarity.trainPqCodebooksInt(real, 16, 4, 16, 0), 16, 4, 5)
            .write.format("noop").mode("overwrite").save() }
        t("full-entry") {
          graft.queries.LlmOps.x3_ann_pq_trained(spark, dir)
            .write.format("noop").mode("overwrite").save() }
      }
    }
    spark.stop()
  }
}
