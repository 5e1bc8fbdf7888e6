package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec

/** Test-side scan-footprint probe (round-18 verdict #2): the pruned-probe
  * claims were plan-asserted (non-empty `PartitionFilters`) but carried no
  * measured FILES/BYTES evidence — the 100 TB argument rested on plan
  * shape alone. This reads each parquet scan node's own
  * post-partition-pruning listing (`selectedPartitions`: the exact file
  * set the scan will open), so DedupSpec/SimilaritySpec can assert a
  * bucket-subset probe reads STRICTLY fewer files and bytes than the
  * full-scan twin, and that the twin reads the whole index. */
object ScanStats {

  /** (files, bytes) the plan's parquet scans rooted under `dir` will read,
    * summed from the scan nodes' post-pruning listings. Uses the pre-AQE
    * physical plan — partition pruning here is STATIC (literal IN from the
    * bounded bucket collect), so it is already resolved at this stage. */
  def indexScanFootprint(df: DataFrame, dir: String): (Long, Long) = {
    val root = java.nio.file.Paths.get(dir).toAbsolutePath.normalize.toString
    // path-equality or a separator-bounded prefix — a raw startsWith would
    // wrongly count a sibling dir sharing the prefix, /tmp/idx2 under
    // /tmp/idx (round-19 ADVICE)
    def under(p: String): Boolean =
      p == root || p.startsWith(root + java.io.File.separator)
    val scans = df.queryExecution.sparkPlan.collectWithSubqueries {
      case s: FileSourceScanExec
          if s.relation.location.rootPaths.exists(
            rp => under(rp.toUri.getPath)) => s
    }
    require(scans.nonEmpty, s"no parquet scan rooted under $dir in the plan")
    (scans.map(_.selectedPartitions.totalNumberOfFiles).sum,
      scans.map(_.selectedPartitions.totalFileSize).sum)
  }

  /** The on-disk ground truth: every data file under `dir` — what a
    * full scan selects. */
  def dirFootprint(dir: String): (Long, Long) = {
    val st = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
    try {
      val files = st.filter(java.nio.file.Files.isRegularFile(_))
        .filter(p => p.getFileName.toString.startsWith("part-"))
        .toArray.map(_.asInstanceOf[java.nio.file.Path])
      (files.length.toLong, files.map(java.nio.file.Files.size).sum)
    } finally st.close()
  }
}
