package graft

import org.apache.spark.sql.SparkSession

/** Canonical SparkSession configuration for this engine — the settings every
  * entry point (driver mains, tests, and library users) needs for correct and
  * scale-stable behavior:
  *
  *   - AQE on: runtime shuffle coalescing + skew-join splitting, the 100 TB
  *     posture for the fact-fact joins this engine leaves un-broadcast;
  *   - UTC session time zone: all oracle SQL and CDC `es` epoch handling is
  *     timezone-free by contract (SURVEY.md §7.4);
  *   - `InferFiltersFromGenerate` excluded: the rule plants a not-empty
  *     filter under every explode, and predicate pushdown then substitutes
  *     the generator input's alias into it — for the CDC path that alias is
  *     a (non-codegen, per-call-expensive) from_json, so the "optimization"
  *     triples the JSON parse work per message (see [[graft.cdc.CanalJson]]
  *     .flatten). The filter's only benefit is skipping empty arrays, which
  *     explode's own semantics already provide.
  */
object EngineSession {
  val excludedRules: String =
    "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate"

  def builder(master: String, shufflePartitions: Int): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.optimizer.excludedRules", excludedRules)
      // graft's Catalyst surface: native SQL functions + the top-k
      // candidate-prefilter optimizer rule (SURVEY.md §2.8 / §4)
      .withExtensions(new GraftExtensions)

  /** Production streaming-state configuration: the RocksDB provider spills
    * state to local disk instead of holding it in an executor heap map —
    * the difference between "state fits in RAM" and "state fits on disk"
    * for long-horizon dedup/session/alert state at 100 TB ingest. Changelog
    * checkpointing ships per-batch deltas to the checkpoint location rather
    * than full snapshots. Per-QUERY conf: apply via `spark.conf.set` (or at
    * session build) before starting the stream. */
  val rocksDbStateConfigs: Map[String, String] = Map(
    "spark.sql.streaming.stateStore.providerClass" ->
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled" -> "true")
}
