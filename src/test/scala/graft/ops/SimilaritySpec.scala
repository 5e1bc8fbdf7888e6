package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  test("cosine/dot/norm basic identities") {
    val df = Seq((Seq(1.0f, 0.0f), Seq(0.0f, 1.0f)), (Seq(1.0f, 1.0f), Seq(1.0f, 1.0f)))
      .toDF("a", "b")
    val out = df.select(
      round(VectorFunctions.cosine($"a", $"b"), 6).as("cos"),
      round(VectorFunctions.dot($"a", $"b"), 6).as("dot"),
      round(VectorFunctions.l2Norm($"a"), 6).as("norm"))
      .as[(Double, Double, Double)].collect()
    assert(out(0) === ((0.0, 0.0, 1.0)))
    assert(out(1)._1 === 1.0 && out(1)._2 === 2.0)
  }

  test("brute-force top-k returns the true nearest neighbors") {
    // 1D-ish vectors on a circle: nearest by angle
    def vec(deg: Double): Seq[Float] = {
      val r = math.toRadians(deg)
      Seq(math.cos(r).toFloat, math.sin(r).toFloat)
    }
    val corpus = Seq(
      (0L, vec(0)), (1L, vec(10)), (2L, vec(20)), (3L, vec(90)), (4L, vec(180))
    ).toDF("vec_id", "embedding")
    val res = Similarity.bruteForceTopK(corpus.filter($"vec_id" === 0), corpus, k = 2)
      .select($"rank", $"neighbor_id").as[(Int, Long)].collect().sortBy(_._1)
    assert(res.toSeq === Seq((1, 1L), (2, 2L)))
  }

  test("LSH top-k achieves high recall vs brute force on clustered data") {
    // deterministic pseudo-random corpus: two tight clusters
    def noise(i: Int, d: Int): Float = (((i * 37 + d * 101) % 97) / 970.0f)
    val dim = 16
    val rows = (0 until 200).map { i =>
      val base = if (i % 2 == 0) Array.fill(dim)(1.0f) else Array.fill(dim)(-1.0f)
      (i.toLong, base.zipWithIndex.map { case (v, d) => v + noise(i, d) }.toSeq)
    }
    val corpus = rows.toDF("vec_id", "embedding")
    val queries = corpus.filter($"vec_id" < 10)
    val exact = Similarity.bruteForceTopK(queries, corpus, k = 5)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    val approx = Similarity.lshTopK(queries, corpus, k = 5, dim = dim, nBits = 8)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    assert(recall >= 0.8, s"LSH recall $recall below 0.8")
  }

  test("IVF top-k achieves high recall vs brute force and is deterministic") {
    def noise(i: Int, d: Int): Float = (((i * 37 + d * 101) % 97) / 970.0f)
    val dim = 16
    val rows = (0 until 200).map { i =>
      val base = if (i % 2 == 0) Array.fill(dim)(1.0f) else Array.fill(dim)(-1.0f)
      (i.toLong, base.zipWithIndex.map { case (v, d) => v + noise(i, d) }.toSeq)
    }
    val corpus = rows.toDF("vec_id", "embedding")
    val queries = corpus.filter($"vec_id" < 10)
    val exact = Similarity.bruteForceTopK(queries, corpus, k = 5)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    def run() = Similarity.ivfTopK(queries, corpus, k = 5, dim = dim, nLists = 8, nProbe = 2)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    val approx = run()
    val recall = (exact intersect approx).size.toDouble / exact.size
    assert(recall >= 0.8, s"IVF recall $recall below 0.8")
    assert(run() === approx, "IVF result must be deterministic across runs")
  }

  test("int8 top-k: high recall on spread vectors, exact within tie cover") {
    val dim = 16
    // spread corpus: deterministic pseudo-random elements in [-1, 1) —
    // neighbor-similarity gaps far exceed the int8 dot's ~2·√dim·(0.5/127)
    // error bound, so the integer candidate ranking is nearly exact
    def rnd(i: Int, d: Int): Float =
      (((i * 2654435761L + d * 40503L) % 2048L) - 1024L) / 1024.0f
    val spread = (0 until 200).map { i =>
      (i.toLong, (0 until dim).map(d => rnd(i, d)))
    }.toDF("vec_id", "embedding")
    val sq = spread.filter($"vec_id" < 10)
    val exactS = Similarity.bruteForceTopK(sq, spread, k = 5)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    val out = Similarity.int8TopK(sq, spread, k = 5, rerank = 20)
      .select($"query_id", $"neighbor_id", $"q_dot").as[(Long, Long, Long)]
      .collect()
    val recallS = (exactS intersect out.map(r => (r._1, r._2)).toSet).size
      .toDouble / exactS.size
    assert(recallS >= 0.9, s"int8 recall $recallS below 0.9 on spread corpus")
    // |q_dot| ≤ dim·127² by construction
    assert(out.forall(r => math.abs(r._3) <= dim.toLong * 127 * 127))

    // clustered corpus: ~100 in-cluster candidates whose true cosines differ
    // by LESS than the quantization error — candidate order inside the tie
    // group is noise, so rerank must cover the whole neighborhood (the
    // int8TopK doc rule); once it does, recall is exact
    def noise(i: Int, d: Int): Float = (((i * 37 + d * 101) % 97) / 970.0f)
    val clustered = (0 until 200).map { i =>
      val base = if (i % 2 == 0) Array.fill(dim)(1.0f) else Array.fill(dim)(-1.0f)
      (i.toLong, base.zipWithIndex.map { case (v, d) => v + noise(i, d) }.toSeq)
    }.toDF("vec_id", "embedding")
    val cq = clustered.filter($"vec_id" < 10)
    val exactC = Similarity.bruteForceTopK(cq, clustered, k = 5)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    val approxC = Similarity.int8TopK(cq, clustered, k = 5, rerank = 100)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    assert(approxC === exactC,
      "rerank covering the tie neighborhood must reproduce exact top-k")
  }

  test("persisted IVF index: partition-pruned probe read matches in-memory ivfTopK") {
    def noise(i: Int, d: Int): Float = (((i * 37 + d * 101) % 97) / 970.0f)
    val dim = 16
    val rows = (0 until 200).map { i =>
      val base = if (i % 2 == 0) Array.fill(dim)(1.0f) else Array.fill(dim)(-1.0f)
      (i.toLong, base.zipWithIndex.map { case (v, d) => v + noise(i, d) }.toSeq)
    }
    val corpus = rows.toDF("vec_id", "embedding")
    val queries = corpus.filter($"vec_id" < 6)
    val dir = java.nio.file.Files.createTempDirectory("ivf_idx").toString
    try {
      val cents = Similarity.writeIvfIndex(corpus, dim, nLists = 8, path = dir)
      val fromIndex = Similarity.ivfTopKFromIndex(spark, queries, dir, cents,
        k = 5, nProbe = 2)
      val inMem = Similarity.ivfTopK(queries, corpus, k = 5, dim = dim,
        nLists = 8, nProbe = 2)
      assert(
        fromIndex.select($"query_id", $"rank", $"neighbor_id").as[(Long, Int, Long)]
          .collect().toSet ===
        inMem.select($"query_id", $"rank", $"neighbor_id").as[(Long, Int, Long)]
          .collect().toSet)
      // the probe read must prune on the partition column, not scan+filter:
      // require a NON-EMPTY PartitionFilters list that names the `list`
      // partition column (an empty list — scan-everything — also prints
      // "PartitionFilters: [", which a plain contains-check lets pass)
      val plan = fromIndex.queryExecution.executedPlan.toString
      assert("PartitionFilters: \\[[^\\]]*list".r.findFirstIn(plan).isDefined,
        s"expected non-empty partition filter on `list`, got:\n$plan")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("integer IVF index: pruned-read serve equals the in-memory certified " +
    "twin and prunes on the list partition") {
    def noise(i: Int, d: Int): Float = (((i * 37 + d * 101) % 97) / 970.0f)
    val dim = 16
    val rows = (0 until 200).map { i =>
      val base = if (i % 2 == 0) Array.fill(dim)(1.0f) else Array.fill(dim)(-1.0f)
      (i.toLong, base.zipWithIndex.map { case (v, d) => v + noise(i, d) }.toSeq)
    }
    val corpus = rows.toDF("vec_id", "embedding")
    val queries = corpus.filter($"vec_id" < 6)
    val dir = java.nio.file.Files.createTempDirectory("ivf_idx_int").toString
    try {
      val cents = Similarity.writeIvfIndexInt(corpus, nLists = 8, path = dir)
      assert(cents.length === 8 && cents.map(_._1).toSeq === (0L until 8L))
      val fromIndex = Similarity.ivfTopKFromIndexInt(spark, queries, dir, cents,
        k = 5, nProbe = 2)
      val inMem = Similarity.ivfTopKIntCertified(queries, corpus, k = 5,
        nLists = 8, nProbe = 2)
      assert(
        fromIndex.select($"query_id", $"rank", $"neighbor_id", $"d2m")
          .as[(Long, Int, Long, Long)].collect().toSet ===
        inMem.select($"query_id", $"rank", $"neighbor_id", $"d2m")
          .as[(Long, Int, Long, Long)].collect().toSet)
      // the probe read must prune on the partition column, not scan+filter:
      // require a NON-EMPTY PartitionFilters list that names the `list`
      // partition column (an empty list — scan-everything — also prints
      // "PartitionFilters: [", which a plain contains-check lets pass)
      val plan = fromIndex.queryExecution.executedPlan.toString
      assert("PartitionFilters: \\[[^\\]]*list".r.findFirstIn(plan).isDefined,
        s"expected non-empty partition filter on `list`, got:\n$plan")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("trained integer IVF: ivfServeInt with seed centroids equals the " +
    "certified twin; two Lloyd rounds beat the seed baseline on the " +
    "x3_ann_ivf_trained clustered corpus") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val m = emb.select($"vec_id", Similarity.milliQuantize($"embedding").as("mv"))
    val queries = m.filter($"vec_id" >= 60 && $"vec_id" < 80)
    // serve-equivalence: the factored serve at seed centroids IS the
    // certified twin (same mechanics, same ties)
    val seedCents = m.filter($"vec_id" < 8).select($"vec_id".as("cid"), $"mv".as("cv"))
    val viaServe = Similarity.ivfServeInt(queries, m, seedCents, k = 5, nProbe = 2)
      .select($"query_id", $"rank", $"neighbor_id", $"list_id", $"d2m")
      .as[(Long, Int, Long, Long, Long)].collect().toSet
    val viaTwin = Similarity.ivfTopKIntCertified(
        emb.filter($"vec_id" >= 60 && $"vec_id" < 80), emb,
        k = 5, nLists = 8, nProbe = 2)
      .select($"query_id", $"rank", $"neighbor_id", $"list_id", $"d2m")
      .as[(Long, Int, Long, Long, Long)].collect().toSet
    assert(viaServe === viaTwin)
    // the trained >= seed recall floor on the entry's own clustered corpus
    // (sf0.01, the driver's verify scale). Cluster structure routes even
    // the degenerate cluster-0 seeds consistently, so the SEED baseline is
    // high on average (970 per-mille at sf0.01, 960 at sf0.001) — the
    // Lloyd win shows up per-query: trained recall is a PERFECT 1000 for
    // every probe, while some seed probes drop to 400. Pin exactly that:
    // per-query trained >= seed everywhere, trained = 1000 everywhere, and
    // at least one probe where the seed baseline actually lost.
    val perQuery = graft.queries.LlmOps.x3_ann_ivf_trained(
        spark, "/root/testdata/sf0.01")
      .select($"query_id", $"recall_pm", $"seed_recall_pm").distinct()
      .as[(Long, Long, Long)].collect()
    assert(perQuery.length === 20)
    perQuery.foreach { case (q, t, se) =>
      assert(t >= se, s"query $q: trained $t below seed baseline $se")
      assert(t === 1000L, s"query $q: trained recall $t not perfect")
    }
    assert(perQuery.exists(_._3 < 1000L),
      "expected at least one probe where the seed baseline misses (the Lloyd win witness)")
    // Lloyd preserves the centroid id space: 16 lists, empty lists keep
    // their previous centroid (no nulls, no dropped cids)
    val trainedCents = Similarity.trainIvfCentroidsInt(
      m.filter($"vec_id" < 500), nLists = 16, rounds = 2)
    assert(trainedCents.count() === 16L)
    assert(trainedCents.filter($"cv".isNull).count() === 0L)
  }

  test("trained-centroid persisted index: the serve prunes on the list " +
    "partition and equals the in-memory trained serve") {
    val dir = "/root/testdata/sf0.001"
    val entry = graft.queries.LlmOps.x3_ann_ivf_trained_index(spark, dir)
    val plan = entry.queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*list".r.findFirstIn(plan).isDefined,
      s"expected non-empty partition filter on `list`, got:\n$plan")
    val viaIndex = entry
      .as[(Long, Int, Long, Long, Long)].collect().toSet
    val viaMemory = graft.queries.LlmOps.x3_ann_ivf_trained(spark, dir)
      .filter($"rank" =!= -1)
      .select($"query_id", $"rank", $"neighbor_id", $"list_id", $"d2m")
      .as[(Long, Int, Long, Long, Long)].collect().toSet
    assert(viaIndex === viaMemory)
  }

  test("integer Lloyd trainers are partitioning-invariant (int sums " +
    "commute, floor-div means exact) — the trained model is a pure " +
    "function of the corpus") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val m = emb.select($"vec_id", Similarity.milliQuantize($"embedding").as("mv"))
    def centsOf(df: org.apache.spark.sql.DataFrame) =
      Similarity.trainIvfCentroidsInt(df, nLists = 16, rounds = 2)
        .select($"cid", $"cv").as[(Long, Seq[Long])].collect().sortBy(_._1).toSeq
    assert(centsOf(m) === centsOf(m.repartition(7)))
    def booksOf(df: org.apache.spark.sql.DataFrame) =
      Similarity.trainPqCodebooksInt(df, mSub = 16, dsub = 4, ksub = 16,
          rounds = 2)
        .select($"j", $"cid", $"bv").as[(Int, Long, Seq[Long])]
        .collect().sortBy(t => (t._1, t._2)).toSeq
    assert(booksOf(m) === booksOf(m.repartition(7)))
  }

  test("IVF index append: fixed-centroid batch ingest equals the full " +
    "rebuild and never rewrites standing partition files") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    def files(dir: String): Map[String, Long] = {
      val root = java.nio.file.Paths.get(dir)
      val st = java.nio.file.Files.walk(root)
      try st.filter(java.nio.file.Files.isRegularFile(_))
        .filter(p => p.toString.endsWith(".parquet"))
        .toArray.map(_.asInstanceOf[java.nio.file.Path])
        .map(p => root.relativize(p).toString ->
          java.nio.file.Files.size(p)).toMap
      finally st.close()
    }
    val incDir = java.nio.file.Files.createTempDirectory("ivf_app_inc").toString
    val fullDir = java.nio.file.Files.createTempDirectory("ivf_app_full").toString
    try {
      val cents = Similarity.writeIvfIndexInt(emb.filter($"vec_id" < 400),
        nLists = 16, path = incDir)
      val standingFiles = files(incDir)
      Similarity.appendIvfIndexInt(spark, emb.filter($"vec_id" >= 400),
        cents, incDir)
      val afterFiles = files(incDir)
      // every standing file survives byte-for-byte in place; the append
      // only ADDED files
      standingFiles.foreach { case (f, size) =>
        assert(afterFiles.get(f).contains(size),
          s"standing index file $f was rewritten by the append")
      }
      assert(afterFiles.size > standingFiles.size)
      // and the served result is bit-identical to a full rebuild
      val centsFull = Similarity.writeIvfIndexInt(emb, nLists = 16, path = fullDir)
      assert(cents.map(_._1).toSeq === centsFull.map(_._1).toSeq)
      def serve(dir: String, c: Array[(Long, Array[Long])]) =
        Similarity.ivfTopKFromIndexInt(spark, emb.filter($"vec_id" < 20),
            dir, c, k = 5, nProbe = 4)
          .select($"query_id", $"rank", $"neighbor_id", $"list_id", $"d2m")
          .as[(Long, Int, Long, Long, Long)].collect().toSet
      assert(serve(incDir, cents) === serve(fullDir, centsFull))
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(incDir))
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(fullDir))
    }
  }

  test("IVF index compaction: over-threshold lists collapse to one file, " +
    "under-threshold lists keep their standing files byte-for-byte, and " +
    "the serve is bit-identical to the uncompacted index") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    def filesPerList(dir: String): Map[String, Seq[(String, Long)]] = {
      val root = java.nio.file.Paths.get(dir)
      val st = java.nio.file.Files.walk(root)
      try st.filter(java.nio.file.Files.isRegularFile(_))
        .filter(p => p.getFileName.toString.startsWith("part-"))
        .toArray.map(_.asInstanceOf[java.nio.file.Path])
        .map(p => root.relativize(p).getName(0).toString ->
          (root.relativize(p).toString, java.nio.file.Files.size(p)))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSeq.sorted).toMap
      finally st.close()
    }
    val dir = java.nio.file.Files.createTempDirectory("ivf_cmp").toString
    try {
      val cents = Similarity.writeIvfIndexInt(emb.filter($"vec_id" < 400),
        nLists = 16, path = dir)
      Similarity.appendIvfIndexInt(spark,
        emb.filter($"vec_id" >= 400 && $"vec_id" < 450), cents, dir)
      Similarity.appendIvfIndexInt(spark, emb.filter($"vec_id" >= 450),
        cents, dir)
      val before = filesPerList(dir)
      // the appends actually created the pathology this test compacts
      assert(before.values.exists(_.size > 1), s"no multi-file list: $before")
      val serveBefore = Similarity.ivfTopKFromIndexInt(spark,
          emb.filter($"vec_id" >= 20 && $"vec_id" < 40), dir, cents,
          k = 5, nProbe = 4)
        .select($"query_id", $"rank", $"neighbor_id", $"list_id", $"d2m")
        .as[(Long, Int, Long, Long, Long)].collect().toSet
      // threshold 2: some lists are over (compacted to ONE file), single- or
      // double-file lists stay untouched — both branches must be exercised
      val maxFiles = 2
      assert(before.values.exists(_.size > maxFiles) &&
        before.values.exists(_.size <= maxFiles),
        s"fixture must exercise both branches at threshold $maxFiles: $before")
      val n = Similarity.compactIvfIndexInt(spark, dir, maxFilesPerList = maxFiles)
      val after = filesPerList(dir)
      assert(n === before.values.count(_.size > maxFiles))
      before.foreach { case (list, fs) =>
        if (fs.size > maxFiles)
          assert(after(list).size === 1, s"$list not compacted: ${after(list)}")
        else // untouched partitions keep their exact files (name + size)
          assert(after(list) === fs, s"$list was rewritten: ${after(list)} vs $fs")
      }
      // no staging residue
      assert(!new java.io.File(dir + "").getParentFile.listFiles()
        .exists(_.getName.startsWith(new java.io.File(dir).getName + ".compact-staging")),
        "compaction staging dir not cleaned up")
      // rows only moved: the serve is bit-identical
      val serveAfter = Similarity.ivfTopKFromIndexInt(spark,
          emb.filter($"vec_id" >= 20 && $"vec_id" < 40), dir, cents,
          k = 5, nProbe = 4)
        .select($"query_id", $"rank", $"neighbor_id", $"list_id", $"d2m")
        .as[(Long, Int, Long, Long, Long)].collect().toSet
      assert(serveAfter === serveBefore)
      // idempotent: a second compaction at the same threshold is a no-op
      assert(Similarity.compactIvfIndexInt(spark, dir, maxFilesPerList = maxFiles) === 0)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("measured pruning payoff: an nProbe-subset IVF serve reads " +
    "STRICTLY fewer index files and bytes than probing every list, which " +
    "reads the whole index — scan-node listing vs on-disk ground truth") {
    import graft.ScanStats
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val dir = java.nio.file.Files.createTempDirectory("ivf_fp").toString
    try {
      spark.catalog.clearCache()
      val nLists = 16
      val cents = Similarity.writeIvfIndexInt(emb, nLists = nLists, path = dir)
      def serve(nProbe: Int) = Similarity.ivfTopKFromIndexInt(spark,
        emb.filter($"vec_id" < 4), dir, cents, k = 5, nProbe = nProbe)
      val (fsF, fsB) = ScanStats.dirFootprint(dir)
      // probing every list selects the whole index — the baseline is real
      val (fullF, fullB) = ScanStats.indexScanFootprint(serve(nLists), dir)
      assert((fullF, fullB) === ((fsF, fsB)))
      // a 4-query, nProbe=2 batch touches a strict list subset; measured
      // at this fixture: 7/16 files, 0.44x bytes — at a production nLists
      // the saving is ~|probed lists|/nLists
      val (prF, prB) = ScanStats.indexScanFootprint(serve(2), dir)
      assert(prF < fullF && prB < fullB,
        s"IVF probe not cheaper: files $prF/$fullF bytes $prB/$fullB")
      info(f"IVF $prF/$fullF files ${prB.toDouble / fullB}%.2fx bytes")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("trained integer PQ: pqServeInt with seed codebooks equals the " +
    "certified twin; two Lloyd rounds beat the seed codebooks' ADC recall") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val m = emb.select($"vec_id", Similarity.milliQuantize($"embedding").as("mv"))
    // serve-equivalence at the certified twin's parameters (m=8, ksub=8)
    val seedCb8 = Similarity.trainPqCodebooksInt(m, mSub = 8, dsub = 8,
      ksub = 8, rounds = 0)
    val viaServe = Similarity.pqServeInt(
        m.filter($"vec_id" >= 80 && $"vec_id" < 100), m, seedCb8,
        mSub = 8, dsub = 8, k = 5)
      .select($"query_id", $"rank", $"neighbor_id", $"adc_d2m")
      .as[(Long, Int, Long, Long)].collect().toSet
    val viaTwin = Similarity.pqTopKIntCertified(
        emb.filter($"vec_id" >= 80 && $"vec_id" < 100), emb,
        k = 5, dim = 64, m = 8, ksub = 8)
      .select($"query_id", $"rank", $"neighbor_id", $"adc_d2m")
      .as[(Long, Int, Long, Long)].collect().toSet
    assert(viaServe === viaTwin)
    // the Lloyd win on the entry's own configuration (sf0.01, the driver's
    // verify scale; deterministic: trained 290 vs seed 220 per-mille avg)
    val perQuery = graft.queries.LlmOps.x3_ann_pq_trained(
        spark, "/root/testdata/sf0.01")
      .select($"query_id", $"recall_pm", $"seed_recall_pm").distinct()
      .as[(Long, Long, Long)].collect()
    assert(perQuery.length === 20)
    val (tAvg, sAvg) = (perQuery.map(_._2).sum / 20.0, perQuery.map(_._3).sum / 20.0)
    assert(tAvg > sAvg,
      s"trained ADC recall $tAvg did not beat the seed codebooks' $sAvg")
    assert(tAvg >= sAvg + 50,
      s"expected a decisive Lloyd win, got trained $tAvg vs seed $sAvg")
  }

  test("PQ codes are bounded, reconstruction is lossy-but-close, recall high with re-rank") {
    def noise(i: Int, d: Int): Float = (((i * 37 + d * 101) % 97) / 970.0f)
    val dim = 16
    val rows = (0 until 200).map { i =>
      val base = if (i % 2 == 0) Array.fill(dim)(1.0f) else Array.fill(dim)(-1.0f)
      (i.toLong, base.zipWithIndex.map { case (v, d) => v + noise(i, d) }.toSeq)
    }
    val corpus = rows.toDF("vec_id", "embedding")
    val queries = corpus.filter($"vec_id" < 10)
    val books = Similarity.trainPqCodebooks(corpus, dim, m = 8, ksub = 8)
    // every code addresses a real codebook entry
    val codes = corpus.select(explode(Similarity.pqCodes($"embedding", books)))
      .as[Int].collect()
    assert(codes.forall(c => c >= 0 && c < 8))
    // reconstruction keeps the cluster structure: cosine(original, recon) high
    val minCos = corpus
      .select(Similarity.pqReconstruct(Similarity.pqCodes($"embedding", books), books)
        .as("recon"), $"embedding")
      .select(min(VectorFunctions.cosine($"embedding", $"recon"))).as[Double].head()
    assert(minCos > 0.9, s"reconstruction cosine $minCos too lossy")
    // ADC + exact re-rank recovers the exact top-k almost everywhere
    val exact = Similarity.bruteForceTopK(queries, corpus, k = 5)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    def run() = Similarity.pqTopK(queries, corpus, k = 5, dim = dim,
        m = 8, ksub = 8, rerank = 25)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    val approx = run()
    val recall = (exact intersect approx).size.toDouble / exact.size
    assert(recall >= 0.8, s"PQ recall $recall below 0.8")
    assert(run() === approx, "PQ result must be deterministic across runs")
  }

  test("PQ recall vs exact ground truth on the real corpus (x3_ann_pq parameters)") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val queries = emb.filter($"vec_id" < 20)
    val exact = Similarity.bruteForceTopK(queries, emb, k = 5)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    val approx = Similarity.pqTopK(queries, emb, k = 5, dim = 64,
        m = 16, ksub = 16, rerank = 25)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    assert(recall >= 0.8, s"PQ recall $recall over ${exact.size} true pairs")
  }

  test("PQ serving from a persisted codes table is row-identical to the " +
    "inline encode path (same books => same ADC scores => same re-rank)") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val queries = emb.filter($"vec_id" < 20)
    val books = Similarity.trainPqCodebooks(emb, dim = 64, m = 16, ksub = 16)
    val inline = Similarity.pqTopK(queries, emb, k = 5, dim = 64,
        m = 16, ksub = 16, rerank = 25)
      .select($"query_id", $"rank", $"neighbor_id", $"sim")
      .as[(Long, Int, Long, Double)].collect().toSet
    // round-trip the codes through parquet exactly as the fixture does
    val tmp = java.nio.file.Files.createTempDirectory("pq_codes").toString
    Similarity.pqEncode(emb, books).write.mode("overwrite").parquet(tmp)
    val fromCodes = Similarity.pqTopKFromCodes(queries, emb,
        spark.read.parquet(tmp), books, k = 5, rerank = 25)
      .select($"query_id", $"rank", $"neighbor_id", $"sim")
      .as[(Long, Int, Long, Double)].collect().toSet
    assert(fromCodes === inline)
  }

  test("x3_cosine_neardup's 16-bit sign bucket keeps the candidate join near-linear") {
    // the certification twin must not degenerate into a within-bucket
    // cartesian: on the real corpus the 16-bit bucket keeps occupancy ~1,
    // so candidate pairs stay below n (a 4-bit bucket yields ~n²/16)
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val n = emb.count()
    val bucket = (1 to 16).map(i =>
      (element_at($"embedding", i) > 0).cast("bigint") * (1L << (16 - i)))
      .reduce(_ + _)
    val byBucket = emb.select(bucket.as("b")).groupBy($"b").count()
    val candidates = byBucket
      .select(sum($"count" * ($"count" - 1) / 2).cast("bigint")).as[Long].head()
    val maxOccupancy = byBucket.select(max($"count")).as[Long].head()
    assert(candidates < n, s"candidate pairs $candidates not near-linear in n=$n")
    assert(maxOccupancy <= 4, s"bucket occupancy $maxOccupancy unexpectedly high")
  }

  test("semantic decontamination: a 500-item eval set routes through sign " +
    "buckets with bounded candidates and high recall on high-sim pairs") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    // eval = a re-keyed copy of the corpus: every corpus vector has an
    // IDENTICAL twin in eval, whose signatures collide in every band — so
    // catching all 500 self-contaminations is guaranteed, not probabilistic
    val eval = emb.select(($"vec_id" + 10000L).as("vec_id"), $"embedding")
    val cand = Similarity.signBucketCandidates(emb, eval, dim = 64)
      .localCheckpoint(false)
    val nCand = cand.count()
    assert(nCand < 500L * 500L / 2,
      s"candidate pairs $nCand not meaningfully below the 250k cross product")
    // recall over truly-contaminated pairs (cosine >= 0.9): deterministic
    // (seeded planes, fixed corpus), spec contract recall >= 0.8
    val exact = emb.select($"vec_id", $"embedding".as("a"))
      .crossJoin(eval.select($"vec_id".as("eval_id"), $"embedding".as("b")))
      .filter(VectorFunctions.cosine($"a", $"b") >= 0.9)
      .select($"vec_id", $"eval_id").as[(Long, Long)].collect().toSet
    val got = cand.select($"vec_id", $"eval_id").as[(Long, Long)].collect().toSet
    val recall = (exact intersect got).size.toDouble / exact.size
    assert(recall >= 0.8, s"sign-bucket recall $recall over ${exact.size} pairs")
    // the routed operator takes the bucketed path (eval > bruteForceEvalMax)
    // and still reports every corpus vector, identical twins at sim 1.0
    val out = Similarity.semanticDecontaminate(emb, eval, dim = 64,
        simThreshold = 0.9)
      .as[(Long, Long, Double)].collect()
    assert(out.length === 500)
    assert(out.forall { case (_, hits, maxSim) => hits >= 1L && maxSim === 1.0 },
      "every corpus vector's identical eval twin must be flagged")
  }

  test("semantic decontamination: an EMPTY eval set reports every corpus " +
    "vector clean instead of dropping the corpus") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val out = Similarity.semanticDecontaminate(
        emb, emb.filter($"vec_id" < 0), dim = 64)
      .as[(Long, Long, Double)].collect()
    assert(out.length === emb.count().toInt)
    // -2.0 sits outside cosine's range, so "no scored pair" can never be
    // confused with a legitimate similarity of -1.0
    assert(out.forall { case (_, hits, maxSim) => hits === 0L && maxSim === -2.0 })
  }

  test("MMR rerank: pick 1 is pure relevance; later picks trade off diversity") {
    // query at 0° sits BETWEEN a twin pair at −40°/−41° and a lone point at
    // +40°: pure relevance would take the twins first (1, 2, …); greedy MMR
    // with signed cosine picks 1, then the ANTI-similar far point 4 (its
    // negative sim-to-selected is a diversity bonus), then 3 — the second
    // twin (sim-to-selected ≈ 1) never makes the cut
    def vec(deg: Double): Seq[Float] = {
      val r = math.toRadians(deg)
      Seq(math.cos(r).toFloat, math.sin(r).toFloat)
    }
    val corpus = Seq(
      (0L, vec(0)), (1L, vec(-40)), (2L, vec(-41)), (3L, vec(40)),
      (4L, vec(80)), (5L, vec(120)), (6L, vec(-120))
    ).toDF("vec_id", "embedding")
    val got = Similarity.mmrRerank(corpus.filter($"vec_id" === 0), corpus, k = 3, pool = 6)
      .orderBy($"pick_rank")
      .select($"cand_id", $"pick_rank").as[(Long, Long)].collect().toSeq
    assert(got.map(_._2) === Seq(1L, 2L, 3L))
    assert(got.map(_._1) === Seq(1L, 4L, 3L))
    assert(!got.map(_._1).contains(2L)) // the redundant twin is skipped
  }

  test("MMR rerank equals a naive driver-side greedy replay") {
    def noise(i: Int, d: Int): Float = (((i * 37 + d * 101) % 97) / 97.0f)
    val dim = 8
    val rows = (0 until 40).map(i => (i.toLong, (0 until dim).map(d => noise(i, d))))
    val corpus = rows.toDF("vec_id", "embedding")
    val got = Similarity.mmrRerank(corpus.filter($"vec_id" < 2), corpus, k = 4, pool = 8)
      .select($"query_id", $"pick_rank", $"cand_id", $"score_m")
      .as[(Long, Long, Long, Long)].collect().toSet

    def cosM(a: Seq[Float], b: Seq[Float]): Long = {
      val dot = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
      val na = math.sqrt(a.map(x => x.toDouble * x.toDouble).sum)
      val nb = math.sqrt(b.map(x => x.toDouble * x.toDouble).sum)
      math.round(BigDecimal(dot / (na * nb)).setScale(3, BigDecimal.RoundingMode.HALF_UP)
        .toDouble * 1000)
    }
    val emb = rows.toMap
    val expected = (0L until 2L).flatMap { qid =>
      val pool = rows.map(_._1).filter(_ != qid)
        .map(c => (c, cosM(emb(qid), emb(c))))
        .sortBy { case (c, m) => (-m, c) }.take(8)
      var sel = Vector.empty[(Long, Long, Long, Long)]
      for (t <- 1 to 4) {
        val picked = sel.map(_._3).toSet
        val best = pool.filterNot(p => picked(p._1)).map { case (c, relM) =>
          val maxsim = if (picked.isEmpty) 0L
            else picked.map(s => cosM(emb(c), emb(s))).max
          (c, relM - maxsim)
        }.minBy { case (c, score) => (-score, c) }
        sel :+= ((qid, t.toLong, best._1, best._2))
      }
      sel
    }.toSet
    assert(got === expected)
  }

  test("hybrid RRF: fused score recomputes from the arm ranks, sentinels " +
    "never co-occur, ordering is (rrf desc, id)") {
    val out = graft.queries.LlmOps.x3_hybrid_rrf(spark, "/root/testdata/sf0.001")
      .select($"doc_id", $"rank_lex", $"rank_vec", $"rrf")
      .as[(Long, Long, Long, Long)].collect()
    assert(out.length === 20)
    def contrib(r: Long): Long = if (r > 0) 1000000000L / (60L + r) else 0L
    out.foreach { case (id, rl, rv, rrf) =>
      assert(rrf === contrib(rl) + contrib(rv), s"doc $id rrf mismatch")
      assert(rl >= -1 && rl <= 30 && rl != 0, s"doc $id rank_lex $rl")
      assert(rv >= -1 && rv <= 30 && rv != 0, s"doc $id rank_vec $rv")
      assert(rl > 0 || rv > 0, s"doc $id in neither arm")
    }
    // output honors the fused total order with the id tie-break
    val key = out.map { case (id, _, _, rrf) => (-rrf, id) }
    assert(key.toSeq === key.sortBy(identity).toSeq)
    // a doc present in BOTH arms outranks the same ranks split across docs
    assert(out.map(_._4).max === out.head._4)
  }

  test("packed-long argmin (pqEncodeInt): (d2 asc, cid asc) tie-break " +
    "identical to a min_by-over-struct reference, including exact ties") {
    // round-20 internals change: the integer assignment argmin is
    // min(d2 * 2^16 + cid) instead of min_by(cid, struct(d2, cid)) — this
    // pins the packed order against the struct reference on a frame with
    // a deliberate EXACT distance tie (the packed form must still take
    // the smaller cid) and a case where the larger cid wins on distance.
    val corpus = Seq(
      (100L, Seq(0L, 0L, 5L, 5L)),   // sub 0: tie between cid 0 and 1
      (101L, Seq(9L, 9L, 0L, 0L)))   // sub 0: cid 1 strictly closer
      .toDF("vec_id", "mv")
    val cb = Seq(
      (0, 0L, Seq(1L, 1L)), (0, 1L, Seq(-1L, -1L)),
      (1, 0L, Seq(0L, 0L)), (1, 1L, Seq(6L, 6L)))
      .toDF("j", "cid", "bv")
    val got = Similarity.pqEncodeInt(corpus, cb, mSub = 2, dsub = 2)
      .select($"neighbor_id", $"j", $"code").as[(Long, Int, Long)]
      .collect().toSet
    // hand-computed lexicographic reference:
    //   vec 100 sub 0, slice (0,0): d2(cid0 @ (1,1)) = 2 = d2(cid1 @ (-1,-1))
    //     — EXACT tie, smaller cid wins → 0
    //   vec 100 sub 1, slice (5,5): d2(cid0 @ (0,0)) = 50, d2(cid1 @ (6,6)) = 2 → 1
    //   vec 101 sub 0, slice (9,9): d2(cid0) = 128, d2(cid1) = 200 → 0
    //   vec 101 sub 1, slice (0,0): d2(cid0) = 0 → 0
    assert(got === Set((100L, 0, 0L), (100L, 1, 1L),
      (101L, 0, 0L), (101L, 1, 0L)),
      s"packed argmin must match the (d2 asc, cid asc) reference, got $got")
  }

  test("packed-long argmin domain guard: out-of-domain d2 fails loudly " +
    "instead of mis-assigning; oversized nLists/ksub fail at the entry") {
    // Round-20 verdict #6 / ADVICE: the 2^46 d2 bound and the 2^16 cid
    // bound were argued in comments only — a vector domain with larger
    // coordinates would silently corrupt the argmin (d2*2^16 wraps). Now
    // enforced: a crafted slice whose squared distance exceeds 2^46
    // (1e8 deltas -> d2 = 2e16 > 7.04e13) must raise, not return codes.
    val corpus = Seq((100L, Seq(100000000L, 100000000L))).toDF("vec_id", "mv")
    val cb = Seq((0, 0L, Seq(0L, 0L))).toDF("j", "cid", "bv")
    val e = intercept[Exception] {
      Similarity.pqEncodeInt(corpus, cb, mSub = 1, dsub = 2).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("packedArgmin")),
      s"expected the packedArgmin domain error, got: ${msgs(e).take(2)}")
    // the integer-id bounds fail at the public entry points (bounded
    // driver-side checks, no job runs)
    val m = Seq((0L, Seq(1L, 1L))).toDF("vec_id", "mv")
    intercept[IllegalArgumentException] {
      Similarity.trainIvfCentroidsInt(m, nLists = 1 << 16, rounds = 1)
    }
    intercept[IllegalArgumentException] {
      Similarity.trainPqCodebooksInt(m, mSub = 1, dsub = 2, ksub = 1 << 16,
        rounds = 1)
    }
    intercept[IllegalArgumentException] {
      Similarity.appendIvfIndexInt(spark, m.toDF("vec_id", "embedding"),
        Array((1L << 16, Array(0L, 0L))), "/tmp/never-written")
    }
    ()
  }
}
