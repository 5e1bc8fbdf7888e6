package graft

import org.apache.spark.sql.functions._
import graft.ops.{Sketch, TextOps}

/** Throwaway stage isolation for x4_cms_shingles. */
object CmsScratch {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = EngineSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    def t(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"$label%-16s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
    }
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    (1 to 2).foreach { r =>
      println(s"--- round $r")
      var keys: org.apache.spark.sql.DataFrame = null
      t("keys-ckpt") {
        keys = docs.select(explode(TextOps.shinglesAll(split($"text", " "), 3)).as("k"))
          .localCheckpoint(true)
      }
      t("counters") {
        Sketch.cmsCounters(keys, "k", 4, 4096)
          .write.format("noop").mode("overwrite").save()
      }
      t("exact+top20") {
        keys.groupBy($"k").agg(count(lit(1)).as("c"))
          .orderBy($"c".desc, $"k".asc).limit(20)
          .write.format("noop").mode("overwrite").save()
      }
      t("full-entry") {
        graft.queries.LlmOps.queries("x4_cms_shingles")(spark, dir)
          .write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
