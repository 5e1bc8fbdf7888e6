package graft

/** Throwaway phase-level profiler for the streaming-census entries: runs an
  * entry N times in one session and prints wall time per run plus the
  * micro-batch count and cumulative trigger durations from the streaming
  * progress events — so "fixed micro-batch machinery" stops being a guess
  * and becomes a number per phase (trigger execution vs everything else).
  * `sbt "Test/runMain graft.CensusPhaseScratch p32_stream_outer [n]"`. */
object CensusPhaseScratch {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("p32_stream_outer")
    val n = args.lift(1).map(_.toInt).getOrElse(3)
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = EngineSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val fn = SparkEntry.queries(name)

    @volatile var batches = 0
    @volatile var triggerMs = 0L
    @volatile var addBatchMs = 0L
    @volatile var planMs = 0L
    val listener = new org.apache.spark.sql.streaming.StreamingQueryListener {
      import org.apache.spark.sql.streaming.StreamingQueryListener._
      override def onQueryStarted(e: QueryStartedEvent): Unit = ()
      override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(e: QueryProgressEvent): Unit = {
        batches += 1
        triggerMs += e.progress.batchDuration
        val d = e.progress.durationMs
        addBatchMs += Option(d.get("addBatch")).map(_.longValue).getOrElse(0L)
        planMs += Option(d.get("queryPlanning")).map(_.longValue).getOrElse(0L)
      }
    }
    spark.streams.addListener(listener)
    // interleaved A/B: even runs = tmpfs /dev/shm checkpoints, odd runs =
    // disk /tmp checkpoints (default) — per-batch WAL + state-delta I/O is
    // the suspected fixed cost. NOTE: entries that call CensusConf.narrow
    // inside their builder set their OWN per-run /dev/shm checkpoint since
    // round 14, overriding this toggle — for those, both arms measure
    // tmpfs and the A/B axis is phase telemetry only. Each shm run gets a
    // FRESH uuid-suffixed
    // checkpoint base (named streaming queries reuse the same checkpoint
    // subdir, so a reused base would make run 2 attempt checkpoint
    // recovery from run 1's state — MemoryStream recovery fails or skews
    // the measurement), and the dir is deleted after the run.
    (1 to n).foreach { i =>
      val shm = i % 2 == 0
      val shmBase =
        s"/dev/shm/graft-census-scratch-${java.util.UUID.randomUUID()}"
      if (shm)
        spark.conf.set("spark.sql.streaming.checkpointLocation", shmBase)
      else spark.conf.unset("spark.sql.streaming.checkpointLocation")
      batches = 0; triggerMs = 0; addBatchMs = 0; planMs = 0
      val t0 = System.nanoTime()
      val rows = fn(spark, dir).collect().length
      val sec = (System.nanoTime() - t0) / 1e9
      // listener bus is async; let the tail progress events land
      Thread.sleep(500)
      println(f"run $i (${if (shm) "shm " else "disk"}): $sec%6.2f s  rows=$rows  microBatches=$batches " +
        f"triggerMs=$triggerMs addBatchMs=$addBatchMs planMs=$planMs " +
        f"nonTrigger=${sec - triggerMs / 1000.0}%6.2f s")
      if (shm) {
        import scala.reflect.io.Directory
        new Directory(new java.io.File(shmBase)).deleteRecursively()
      }
    }
    spark.streams.removeListener(listener)
    spark.stop()
  }
}
