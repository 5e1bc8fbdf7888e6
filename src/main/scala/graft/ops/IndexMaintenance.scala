package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** Shared staged-swap compaction over a directory-partitioned parquet
  * index (`<partCol>=<value>` directories) — the rewrite-data-files
  * action BOTH maintained index families need after their append paths:
  * integer IVF lists ([[Similarity.compactIvfIndexInt]]) and the
  * band-key-bucketed LSH band index ([[Dedup.compactLshBandIndex]]).
  * Nightly appends add one file per touched partition per ingest; at
  * 100 TB that is the classic small-file pathology — a probed
  * partition's read cost becomes dominated by per-file open/footer
  * overhead instead of bytes.
  *
  * Commit mechanics (the contract SimilaritySpec/DedupSpec pin): only
  * partitions whose data-file count exceeds the threshold are rewritten
  * — a partition-pruned read of exactly those values, hash-repartitioned
  * on the partition column so each lands as ONE staged file; partitions
  * at or under the threshold keep their standing files byte-for-byte.
  * The staged files RENAME IN FIRST and the displaced standing files
  * delete after, so a crash mid-swap leaves DUPLICATE rows (detectable:
  * id counts exceed distinct; repair: delete the non-staged files, whose
  * names the still-present staging dir identifies) rather than silently
  * MISSING rows. A rename that reports failure ABORTS before any
  * displaced delete (round-17 ADVICE). Rows are only moved, never
  * changed, so compact-then-serve is bit-identical to the uncompacted
  * index and every consumer's oracle is unchanged. Single-writer
  * pipeline contract, same as build and append; a production deployment
  * would wrap the swap in a table format's atomic metadata commit
  * (Iceberg/Delta rewrite-data-files). */
private[ops] object IndexMaintenance {

  /** Rewrite only the partitions whose data-file count exceeds
    * `maxFilesPerPartition` down to one file each; returns how many were
    * compacted (bounded driver-side metadata — one FileSystem listing per
    * partition dir). `parse` turns a directory's value text into the
    * partition column's literal type so the pruning filter stays typed
    * (a string-cast compare would defeat static partition pruning). */
  def compactPartitionedIndex(spark: SparkSession, path: String,
                              partCol: String, parse: String => Any,
                              maxFilesPerPartition: Int): Int = {
    import org.apache.hadoop.fs.Path
    val root = new Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def dataFiles(dir: Path) = fs.listStatus(dir)
      .filter(f => f.isFile && f.getPath.getName.startsWith("part-"))
    val prefix = s"$partCol="
    val over = fs.listStatus(root)
      .filter(d => d.isDirectory && d.getPath.getName.startsWith(prefix))
      .filter(d => dataFiles(d.getPath).length > maxFilesPerPartition)
      .map(_.getPath.getName.stripPrefix(prefix))
      .sorted
    if (over.isEmpty) return 0
    val staging =
      new Path(path + s".compact-staging-${ProcessHandle.current().pid()}")
    // partition-pruned read of exactly the over-threshold partitions; one
    // shuffle task per partition value -> one staged file per partition
    spark.read.parquet(path)
      .filter(col(partCol).isin(over.map(parse).toSeq: _*))
      .repartition(col(partCol))
      .write.mode("overwrite").partitionBy(partCol).parquet(staging.toString)
    over.foreach { v =>
      val dst = new Path(root, s"$prefix$v")
      // standing files listed BEFORE the staged file moves in (UUID part-
      // names never collide), then deleted — add-then-remove ordering. A
      // rename that reports failure ABORTS before any displaced delete:
      // deleting after a silent rename failure would drop the partition's
      // rows outright, which is strictly worse than the documented
      // duplicate-rows crash mode (round-17 ADVICE).
      val displaced = dataFiles(dst)
      dataFiles(new Path(staging, s"$prefix$v")).foreach { f =>
        val moved = new Path(dst, f.getPath.getName)
        if (!fs.rename(f.getPath, moved))
          throw new java.io.IOException(
            s"compactPartitionedIndex: rename ${f.getPath} -> $moved " +
              "failed; aborting with standing files intact (duplicate-rows " +
              "repair mode: delete non-staged files named by the staging dir)")
      }
      displaced.foreach(f => fs.delete(f.getPath, false))
    }
    fs.delete(staging, true)
    over.length
  }
}
