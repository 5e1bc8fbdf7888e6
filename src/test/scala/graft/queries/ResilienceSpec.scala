package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Operational resilience at scale: on a 100 TB store some file WILL be
  * torn (failed writer, partial upload). The engine must degrade to
  * skip-and-continue when told to, and fail loudly when not. */
class ResilienceSpec extends SparkSpec {
  import spark.implicits._

  test("corrupt file in a store: ignoreCorruptFiles skips it, default fails loudly") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_corrupt").toString
    spark.range(100).select($"id", ($"id" % 7).as("v"))
      .coalesce(2).write.parquet(s"$tmp/store")
    // a torn file: parquet magic at the head, garbage footer
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$tmp/store/part-torn.snappy.parquet"),
      "PAR1 this is not a footer".getBytes("UTF-8"))
    val strict = spark.read.parquet(s"$tmp/store")
    intercept[Exception] { strict.count() } // fail loudly by default
    val lenient = spark.read
      .option("ignoreCorruptFiles", "true").parquet(s"$tmp/store")
    assert(lenient.count() === 100) // every healthy row survives
    assert(lenient.agg(sum($"v")).as[Long].head() ===
      (0L until 100L).map(_ % 7).sum)
  }
}
