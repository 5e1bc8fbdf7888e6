package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.Dedup

/** Ad-hoc stage profiler for the dedup operators (dev tool, not part of the
  * driver contract). Times each phase of the MinHash pipeline separately so
  * regressions point at a stage, not a query. */
object Profile {
  def time[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[profile] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val docs = spark.read.parquet(s"$dir/documents.parquet")
    time("read+count")(docs.count())

    val sh = docs.select(col("doc_id").as("id"), Dedup.shingles(col("text"), 3).as("sh"))
    time("shingles only")(sh.write.format("noop").mode("overwrite").save())

    val sigs = sh.filter(size(col("sh")) > 0)
      .select(col("id"), Dedup.minhashSignature(col("sh"), 16).as("sig"))
    time("shingles+signature")(sigs.write.format("noop").mode("overwrite").save())

    val ck = time("localCheckpoint")(sigs.localCheckpoint(true))

    val banded = ck.select(col("id"), col("sig"),
      posexplode(array((0 until 8).map { b =>
        xxhash64(concat_ws(",", slice(col("sig"), b * 2 + 1, 2)))
      }: _*)).as(Seq("band", "band_hash")))
    time("banding")(banded.write.format("noop").mode("overwrite").save())

    time("full minhashLshPairs")(
      Dedup.minhashLshPairs(docs, "text", "doc_id",
        shingleSize = 3, bands = 8, rowsPerBand = 2, minJaccard = 0.25)
        .write.format("noop").mode("overwrite").save())

    time("full simhashPairs")(
      Dedup.simhashPairs(docs, "text", "doc_id", maxHamming = 7)
        .write.format("noop").mode("overwrite").save())

    time("full ngramJaccardPairs")(
      Dedup.ngramJaccardPairs(docs, "text", "doc_id", 3, 0.3)
        .write.format("noop").mode("overwrite").save())

    spark.stop()
  }
}
