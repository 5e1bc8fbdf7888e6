package graft

import org.apache.spark.sql.SparkSession

/** Throwaway interleaved A/B harness for streaming-census tuning (memory:
  * bench-variance discipline — never compare timings across sessions).
  * Not part of the driver surface; run via
  * `sbt "Test/runMain graft.BenchScratch p29_stream_correlate"`. */
object BenchScratch {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("p29_stream_correlate")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = EngineSession.builder("local[8]", 8).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val fn = SparkEntry.queries(name)

    def run(label: String, conf: Map[String, String]): (Double, Long, String) = {
      val prev = conf.keys.map(k => k -> spark.conf.getOption(k)).toMap
      conf.foreach { case (k, v) => spark.conf.set(k, v) }
      try {
        val t0 = System.nanoTime()
        val rows = fn(spark, dir).collect()
        val sec = (System.nanoTime() - t0) / 1e9
        val hash = rows.map(_.toString).sorted.mkString("|").hashCode.toHexString
        (sec, rows.length.toLong, hash)
      } finally prev.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None)    => spark.conf.unset(k)
      }
    }

    val all = Seq(
      "base" -> Map.empty[String, String],
      "noData-off" -> Map("spark.sql.streaming.noDataMicroBatches.enabled" -> "false"),
      "parts1" -> Map("graft.census.shuffle" -> "1"),
      "parts1+noData-off" -> Map(
        "graft.census.shuffle" -> "1",
        "spark.sql.streaming.noDataMicroBatches.enabled" -> "false"),
      "parts1+rocksdb" -> Map(
        "graft.census.shuffle" -> "1",
        "spark.sql.streaming.stateStore.providerClass" ->
          "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"))
    val variants =
      if (name.contains("p28"))
        // round-15: explicit sentinel timeout batch vs scheduler no-data
        Seq("evict-tick" -> Map("graft.p28.evict" -> "tick"),
          "evict-nodata" -> Map("graft.p28.evict" -> "nodata"))
      else if (name.contains("p32"))
        // round-15: sentinel-tick eviction batch vs scheduler no-data batches
        Seq("evict-tick" -> Map("graft.p32.evict" -> "tick"),
          "evict-nodata" -> Map("graft.p32.evict" -> "nodata"))
      else if (name.contains("pq_trained"))
        // round-17: trained arm served from the persisted encode artifact
        // vs the round-16 both-arms-live-encode shape
        Seq("codes" -> Map("graft.x3.pqserve" -> "codes"),
          "live" -> Map("graft.x3.pqserve" -> "live"))
      else if (name.contains("x3_ann"))
        // round-17: ONE-pass spine+recall assembly (approx rows join once)
        // vs the round-16 two-pass shape (recall join, then spine outer);
        // crossed with the runtime bloom-filter injection on/off (the r16
        // spine lesson suspected INSIDE the serves)
        Seq("assembly-fold" -> Map("graft.x3.assembly" -> "fold"),
          "assembly-twopass" -> Map("graft.x3.assembly" -> "twopass"),
          "fold+no-bloom" -> Map("graft.x3.assembly" -> "fold",
            "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "false"),
          "twopass+no-bloom" -> Map("graft.x3.assembly" -> "twopass",
            "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "false"))
      else if (name.contains("x10_pipeline_incremental") ||
        name.contains("x10_state_reps"))
        // round-18: partition-pruned bucketed band-index probe vs the
        // full-scan frame form (at sf0.1 the delta touches every bucket,
        // so this isolates the pruning machinery's own cost)
        Seq("probe-pruned" -> Map("graft.x10.probe" -> "pruned"),
          "probe-full" -> Map("graft.x10.probe" -> "full"),
          "probe-shingleprune" -> Map("graft.x10.probe" -> "pruned",
            "graft.x10.shingleprune" -> "1"))
      else if (name.contains("q10_approx"))
        // round-19: the exact-NDV evidence arm vs the sketch-only
        // production shape (the r7 body) — the q10 re-baseline split
        Seq("evidence" -> Map.empty[String, String],
          "sketch-only" -> Map("graft.q10.evidence" -> "0"))
      else if (name.contains("winnow"))
        // round-15: per-doc codegen byte-offset selection vs windowed SQL
        Seq("expr" -> Map("graft.winnow.impl" -> "expr"),
          "window" -> Map("graft.winnow.impl" -> "window"))
      else if (name.contains("simhash"))
        // round-15: per-row codegen signature vs exploded-word aggregate
        Seq("expr" -> Map("graft.simhash.impl" -> "expr"),
          "agg" -> Map("graft.simhash.impl" -> "agg"))
      else all

    // warmup once, then interleave 3 rounds of every variant
    run("warmup", Map.empty)
    val results = collection.mutable.Map.empty[String, List[Double]]
    var hashes = Map.empty[String, String]
    (1 to 3).foreach { r =>
      variants.foreach { case (label, conf) =>
        val (sec, n, h) = run(label, conf)
        results(label) = sec :: results.getOrElse(label, Nil)
        hashes += label -> h
        println(f"round $r  $label%-18s $sec%6.2f s  rows=$n hash=$h")
      }
    }
    println("--- medians ---")
    variants.foreach { case (label, _) =>
      val xs = results(label).sorted
      println(f"$label%-18s median=${xs(xs.size / 2)}%6.2f s  hash=${hashes(label)}")
    }
    spark.stop()
  }
}
