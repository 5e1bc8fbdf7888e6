package graft
import org.apache.spark.sql.SparkSession

/** Driver bench contract: run every SparkEntry query on SPARK_GRAFT_SF_DIR,
  * print ONE JSON line with total + per-query seconds.
  *
  * Queries are materialized through the `noop` sink (not `.count()`) so
  * column pruning can't skip projection work and the measured time reflects
  * the full operator, while still avoiding any collect-to-driver cost. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = EngineSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Optional comma-separated subset for local iteration, e.g.
    //   SPARK_GRAFT_ONLY=q4_join_shuffle,q8_outer_join
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
    val results = selected.map { case (name, fn) =>
      val t0 = System.nanoTime()
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
      }
      // Release anything the query pinned (persist/localCheckpoint inside
      // operators like the LSH signature materialization): leaked blocks
      // GC-thrash every later query in the shared JVM.
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      val sec = (System.nanoTime() - t0) / 1e9
      System.err.println(f"[bench] $name%-24s $sec%9.3f s")
      name -> sec
    }
    // Keep the JSON line compact (3-decimal seconds): the driver parses it
    // out of a bounded tail of the process output, so an over-long line gets
    // truncated mid-JSON and recorded as unparseable.
    val qs = results.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val total = f"${results.map(_._2).sum}%.3f"
    spark.stop()
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    Console.out.flush()
  }
}
