package graft

import org.apache.spark.sql.functions._

/** Throwaway hot-spot isolation for the winnowing pipeline: times the gram
  * explode alone, + md5, + conv, and the full two-window selection, each
  * interleaved 3x. `sbt "Test/runMain graft.WinnowScratch"`. */
object WinnowScratch {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = EngineSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$dir/documents.parquet")

    def base = docs.filter(length(col("text")) >= 11)
      .select(col("doc_id"), col("text").as("__t"))
      .withColumn("pos", explode(expr("sequence(1, length(__t) - 7, 1)")))

    def t(label: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      println(f"$label%-22s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
    }
    (1 to 3).foreach { r =>
      println(s"--- round $r")
      t("explode-only") { base.select(col("doc_id"), col("pos")) }
      t("explode+substr") { base.select(col("doc_id"), col("pos"),
        expr("substring(__t, pos, 8)").as("g")) }
      t("explode+md5") { base.select(col("doc_id"), col("pos"),
        md5(expr("substring(__t, pos, 8)")).as("m")) }
      t("explode+md5+conv") { base.select(col("doc_id"), col("pos"),
        conv(substring(md5(expr("substring(__t, pos, 8)")), 1, 15), 16, 10)
          .cast("bigint").as("h")) }
      t("full-winnow") { graft.ops.Dedup.winnowFingerprints(docs, "text", "doc_id") }
    }
    // Long-doc regime (the asymptotic case the round-15 WinnowSelect
    // Expression exists for): 200 docs × ~100 KB — the windowed-SQL form
    // pays O(len) substring head-rescans per gram (O(len²) per doc) plus a
    // 20M-gram-row shuffle; the Expression walks bytes once per doc.
    val long = spark.range(200).select(col("id").as("doc_id"),
      concat_ws(" ", flatten(array_repeat(
        split(concat(lit("alpha bravo charlie delta echo foxtrot golf "),
          col("id")), " "), 2000))).as("text")).localCheckpoint()
    println(s"--- long-doc regime: 200 docs x ~${long.select(
      avg(length(col("text")))).head.getDouble(0).toLong} chars")
    (1 to 3).foreach { r =>
      def run(label: String, impl: String): Unit = {
        spark.conf.set("graft.winnow.impl", impl)
        try t(s"$label r$r") {
          graft.ops.Dedup.winnowFingerprints(long, "text", "doc_id") }
        finally spark.conf.unset("graft.winnow.impl")
      }
      run("long-expr", "expr")
      run("long-window", "window")
    }
    // Round-16 refactor A/B, driver-free (pure static-call timing on the
    // same 200 × 100 KB strings, interleaved): the shipped long-carrying
    // select vs a test-local copy of the round-15 String-carrying loop
    // (per-gram 15-char String alloc + String.compareTo window minima).
    val texts = long.select(col("text")).collect()
      .map(r => org.apache.spark.unsafe.types.UTF8String.fromString(r.getString(0)))
    def tStatic(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"$label%-22s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
    }
    (1 to 3).foreach { r =>
      tStatic(s"static-long r$r") {
        texts.foreach(t => graft.functions.WinnowSelect.select(t, 8, 4)) }
      tStatic(s"static-string r$r") {
        texts.foreach(t => WinnowScratch.selectOldString(t, 8, 4)) }
    }
    spark.stop()
  }

  /** The round-15 String-carrying selection, kept ONLY as the A/B baseline
    * for the allocation-free refactor (not used by any production path). */
  def selectOldString(str: org.apache.spark.unsafe.types.UTF8String,
                      k: Int, w: Int): Int = {
    import org.apache.spark.unsafe.types.UTF8String
    val hexDigits = "0123456789abcdef".toCharArray
    val bytes = str.getBytes
    val len = bytes.length
    var nChars = 0
    val offs = new Array[Int](len + 1)
    var bi = 0
    while (bi < len) {
      offs(nChars) = bi
      bi += UTF8String.numBytesForFirstByte(bytes(bi))
      nChars += 1
    }
    offs(nChars) = len
    val nGrams = nChars - (k - 1)
    if (nChars < k + w - 1) return 0
    val md = java.security.MessageDigest.getInstance("MD5")
    val hashes = new Array[String](nGrams)
    var g = 0
    while (g < nGrams) {
      md.reset()
      md.update(bytes, offs(g), offs(g + k) - offs(g))
      val d = md.digest()
      val hex = new Array[Char](15)
      var j = 0
      while (j < 15) {
        val b = d(j >> 1) & 0xff
        hex(j) = hexDigits(if ((j & 1) == 0) b >> 4 else b & 0xf)
        j += 1
      }
      hashes(g) = new String(hex)
      g += 1
    }
    val selected = new Array[Boolean](nGrams)
    var s = 0
    while (s + w <= nGrams) {
      var m = hashes(s)
      var i = s + 1
      while (i < s + w) {
        if (hashes(i).compareTo(m) < 0) m = hashes(i)
        i += 1
      }
      i = s
      while (i < s + w) {
        if (hashes(i) == m) selected(i) = true
        i += 1
      }
      s += 1
    }
    var n = 0
    var p = 0
    while (p < nGrams) { if (selected(p)) n += 1; p += 1 }
    n
  }
}
