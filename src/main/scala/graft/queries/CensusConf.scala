package graft.queries

import org.apache.spark.sql.SparkSession

/** Session tuning for the embedded streaming census entries (p27/p28/p29,
  * cdc_dedup_stream, the health pipeline): their fixtures are a few hundred
  * rows, so the engine session's 32 shuffle partitions are pure per-trigger
  * state-store commit overhead (every micro-batch commits one store per
  * partition per stateful operator), and the no-data micro-batches Spark
  * schedules after each watermark advance double the trigger count for
  * entries whose OUTPUT doesn't depend on them.
  *
  * Round-13 interleaved A/B (same session, 3 rounds, identical census
  * hashes): p29 4.67→2.60 s, p28 4.76→3.31 s (partitions only), p27
  * 1.92→1.61 s, cdc_dedup_stream 1.84→1.44 s. RocksDB state store was
  * also A/B'd for p29 and is ~18% SLOWER than the default HDFS-backed
  * provider here (2.31 vs 1.95 s median, identical hash): JNI + disk
  * commit costs dwarf any benefit when per-query state is a few hundred
  * keys — RocksDB earns its keep only when state outgrows executor heap.
  *
  * `noDataBatches = true` keeps no-data batches ON — REQUIRED for any entry
  * whose results ride a state timeout (p28: the event-time staleness
  * timeout fires in the no-data batch after the horizon tick advances the
  * watermark; disabling it deadlocks the drain loop).
  *
  * This is per-entry bench tuning of the EMBEDDED census fixtures, not a
  * production default: a real deployment sizes shuffle partitions to its
  * ingest rate and leaves no-data batches on for timely eviction/timeouts.
  * Override the partition count with the `graft.census.shuffle` conf.
  */
object CensusConf {
  /** Apply the tuning; pass the returned previous values to [[restore]] in
    * the caller's `finally`. */
  def narrow(s: SparkSession, noDataBatches: Boolean): (String, String) = {
    val prev = (s.conf.get("spark.sql.shuffle.partitions"),
      s.conf.get("spark.sql.streaming.noDataMicroBatches.enabled"))
    s.conf.set("spark.sql.shuffle.partitions",
      s.conf.getOption("graft.census.shuffle").getOrElse("1"))
    if (!noDataBatches)
      s.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "false")
    prev
  }

  def restore(s: SparkSession, prev: (String, String)): Unit = {
    s.conf.set("spark.sql.shuffle.partitions", prev._1)
    s.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", prev._2)
  }
}
