package graft

import org.apache.spark.sql.functions._

/** Throwaway hot-spot isolation for the winnowing pipeline: times the gram
  * explode alone, + md5, + conv, and the full two-window selection, each
  * interleaved 3x. `sbt "Test/runMain graft.WinnowScratch"`. */
object WinnowScratch {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = EngineSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$dir/documents.parquet")

    def base = docs.filter(length(col("text")) >= 11)
      .select(col("doc_id"), col("text").as("__t"))
      .withColumn("pos", explode(expr("sequence(1, length(__t) - 7, 1)")))

    def t(label: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      println(f"$label%-22s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
    }
    (1 to 3).foreach { r =>
      println(s"--- round $r")
      t("explode-only") { base.select(col("doc_id"), col("pos")) }
      t("explode+substr") { base.select(col("doc_id"), col("pos"),
        expr("substring(__t, pos, 8)").as("g")) }
      t("explode+md5") { base.select(col("doc_id"), col("pos"),
        md5(expr("substring(__t, pos, 8)")).as("m")) }
      t("explode+md5+conv") { base.select(col("doc_id"), col("pos"),
        conv(substring(md5(expr("substring(__t, pos, 8)")), 1, 15), 16, 10)
          .cast("bigint").as("h")) }
      t("full-winnow") { graft.ops.Dedup.winnowFingerprints(docs, "text", "doc_id") }
    }
    // Long-doc regime (the asymptotic case the round-15 WinnowSelect
    // Expression exists for): 200 docs × ~100 KB — the windowed-SQL form
    // pays O(len) substring head-rescans per gram (O(len²) per doc) plus a
    // 20M-gram-row shuffle; the Expression walks bytes once per doc.
    val long = spark.range(200).select(col("id").as("doc_id"),
      concat_ws(" ", flatten(array_repeat(
        split(concat(lit("alpha bravo charlie delta echo foxtrot golf "),
          col("id")), " "), 2000))).as("text")).localCheckpoint()
    println(s"--- long-doc regime: 200 docs x ~${long.select(
      avg(length(col("text")))).head.getDouble(0).toLong} chars")
    (1 to 3).foreach { r =>
      def run(label: String, impl: String): Unit = {
        spark.conf.set("graft.winnow.impl", impl)
        try t(s"$label r$r") {
          graft.ops.Dedup.winnowFingerprints(long, "text", "doc_id") }
        finally spark.conf.unset("graft.winnow.impl")
      }
      run("long-expr", "expr")
      run("long-window", "window")
    }
    spark.stop()
  }
}
