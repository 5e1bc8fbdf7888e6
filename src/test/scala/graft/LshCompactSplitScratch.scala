package graft

import org.apache.spark.sql.functions._

/** Throwaway split-timer for `x2_lsh_compact` (round-20 verdict #4): time
  * each leg of the file-level maintenance cycle separately — standing
  * build, night-1 pruned classify, keeper append, compaction, night-2
  * classify — so the entry's board number can be attributed between the
  * classify legs (the code round 20 touched) and the file-cycle barriers
  * (on the clock by design). `sbt "Test/runMain graft.LshCompactSplitScratch [reps]"`. */
object LshCompactSplitScratch {
  def main(args: Array[String]): Unit = {
    val reps = args.headOption.map(_.toInt).getOrElse(3)
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = EngineSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    def docs = graft.tables.Tables.documents(spark, dir)
    def leg[A](label: String, t: collection.mutable.Map[String, Double])(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      t(label) = t.getOrElse(label, 0.0) + (System.nanoTime() - t0) / 1e9
      r
    }
    (1 to reps).foreach { rep =>
      val t = collection.mutable.Map.empty[String, Double]
      val idxDir = java.nio.file.Files.createTempDirectory("graft_split").toString
      leg("1_build", t) {
        Dedup0.buildLshBandIndex(docs.filter($"doc_id" % 20 === 3), idxDir)
      }
      val b1 = docs.filter($"doc_id" % 20 === 1)
      val (idx1, nb1) = leg("2_read1", t)(
        graft.ops.Dedup.readLshBandIndex(spark, idxDir))
      val keepers1 = leg("3_classify1", t) {
        val k = b1.join(
          graft.ops.Dedup.lshIngestClassifyBucketed(idx1, b1, "text", "doc_id",
            nBuckets = nb1)
            .filter($"status" === "keep").select($"doc_id"),
          Seq("doc_id")).localCheckpoint(true)
        k
      }
      leg("4_append", t)(
        graft.ops.Dedup.appendLshBandIndex(keepers1, "text", "doc_id", idxDir,
          nBuckets = 8))
      leg("5_compact", t)(
        graft.ops.Dedup.compactLshBandIndex(spark, idxDir, maxFilesPerBucket = 1))
      val (idx2, nb2) = leg("6_read2", t)(
        graft.ops.Dedup.readLshBandIndex(spark, idxDir))
      leg("7_classify2", t) {
        graft.ops.Dedup.lshIngestClassifyBucketed(idx2,
            docs.filter($"doc_id" % 20 === 6), "text", "doc_id", nBuckets = nb2)
          .orderBy($"doc_id")
          .write.format("noop").mode("overwrite").save()
      }
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(idxDir))
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      val total = t.values.sum
      println(f"rep $rep total $total%.3f s :: " +
        t.toSeq.sorted.map { case (k, v) => f"$k=$v%.3f" }.mkString("  "))
    }
    spark.stop()
  }
  // buildLshBandIndex with the entry's 8-bucket layout
  private object Dedup0 {
    def buildLshBandIndex(corpus: org.apache.spark.sql.DataFrame,
                          idxDir: String): Unit =
      graft.ops.Dedup.buildLshBandIndex(corpus, "text", "doc_id", idxDir,
        nBuckets = 8)
  }
}
