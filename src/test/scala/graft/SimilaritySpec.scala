package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** Quality checks for the approximate similarity paths: the approximations
  * must stay close to the exact answers, not just run. Uses the sf0.001
  * embeddings table (100 vectors, dim 64). */
class SimilaritySpec extends SparkTestBase {

  test("int8 quantization: byte-bounded codes, cosine-faithful reconstruction") {
    import org.apache.spark.sql.functions._
    val emb = spark.read.parquet(sf("embeddings"))
    val q = graft.operators.Similarity.quantizeInt8(emb, "vec_id", "embedding")
    // codes stay in [-127, 127]
    val outOfRange = q.select(explode(col("q")).as("b"))
      .where(col("b") > 127 || col("b") < -127).count()
    assert(outOfRange == 0L)
    // reconstruction keeps cosine >= 0.999 against the original vector
    val joined = graft.operators.Similarity.dequantizeInt8(q)
      .join(emb.select(col("vec_id"), col("embedding")), "vec_id")
    val worst = joined.select(graft.operators.Similarity.cosine(
        col("v_approx"), col("embedding").cast("array<double>")).as("c"))
      .agg(min("c")).collect().head.getDouble(0)
    assert(worst >= 0.999, s"worst reconstruction cosine $worst")
  }

  private def emb = {
    Fixtures.tune(spark)
    spark.read.parquet(sf("embeddings"))
  }

  private def topKPairs(df: DataFrame): Set[(Long, Long)] =
    df.select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("k-means centroids are deterministic and unit-norm") {
    val a = Similarity.kmeansCentroids(emb, "vec_id", "embedding", nlist = 8)
    val b = Similarity.kmeansCentroids(emb, "vec_id", "embedding", nlist = 8)
    assert(a.length == 8)
    a.zip(b).foreach { case (x, y) => assert(x.sameElements(y)) }
    a.foreach { c =>
      val n = math.sqrt(c.map(x => x * x).sum)
      assert(math.abs(n - 1.0) < 1e-9, s"centroid norm $n")
    }
  }

  test("IVF with k-means centroids: recall@5 >= 0.9 vs exact top-k") {
    val queries = emb.where(col("vec_id") < 10)
    val exact = topKPairs(Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", k = 5))
    val approx = topKPairs(Similarity.ivfTopKKmeans(emb, queries, "vec_id", "embedding",
      k = 5, nlist = 8, nprobe = 4))
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.9, s"recall $recall (${(exact & approx).size}/${exact.size})")
  }

  test("materialized IVF index: build-once/search-many equals the inline path, survives persistence") {
    val queries = emb.where(col("vec_id") < 10)
    val inline = Similarity.ivfTopKKmeans(emb, queries, "vec_id", "embedding",
      k = 5, nlist = 8, nprobe = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val idx = Similarity.buildIvfIndex(emb, "vec_id", "embedding", nlist = 8)
    val viaIndex = Similarity.searchIvfIndex(idx, queries, "vec_id", "embedding",
      k = 5, nprobe = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(viaIndex == inline)
    // the index is plain tables: persist, reload, search — identical results
    val root = tmpDir("ivfidx-")
    idx.centroids.write.parquet(s"$root/centroids")
    idx.cells.write.parquet(s"$root/cells")
    val reloaded = Similarity.IvfIndex(
      spark.read.parquet(s"$root/centroids"),
      spark.read.parquet(s"$root/cells"))
    val viaReloaded = Similarity.searchIvfIndex(reloaded, queries, "vec_id", "embedding",
      k = 5, nprobe = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(viaReloaded == inline)
  }

  test("partition-pruned persisted IVF index: nprobe cells' files only, identical results") {
    val queries = emb.where(col("vec_id") < 2)
    val idx = Similarity.buildIvfIndex(emb, "vec_id", "embedding", nlist = 8)
    val root = tmpDir("ivfpart-")
    Similarity.writeIvfIndex(idx, root)
    val viaMemory = Similarity.searchIvfIndex(idx, queries, "vec_id", "embedding",
        k = 5, nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val pruned = Similarity.searchIvfIndexAt(spark, root, queries,
      "vec_id", "embedding", k = 5, nprobe = 2)
    assert(pruned.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      == viaMemory, "persisted+pruned search must equal the in-memory index")
    // the pruning proof: the cells scan's SELECTED partitions (the planner's
    // post-pruning file listing — `inputFiles` reports the pre-pruning
    // index) cover only the probed cell=N/ directories (<= 3 queries x
    // nprobe 4 distinct cells, out of 8 on disk). AQE off so the physical
    // scan is reachable by plain tree collect (query stages are leaves).
    val allCells = new java.io.File(s"$root/cells").listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("cell=")).map(_.getName).toSet
    assert(allCells.size == 8, s"expected 8 cell partitions on disk: $allCells")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val again = Similarity.searchIvfIndexAt(spark, root, queries,
        "vec_id", "embedding", k = 5, nprobe = 2)
      val scans = again.queryExecution.executedPlan.collect {
        case s: org.apache.spark.sql.execution.FileSourceScanExec
          if s.relation.location.rootPaths.exists(_.toString.contains("/cells")) => s
      }
      assert(scans.nonEmpty, "no file scan over the cells table found in the plan")
      val readDirs = scans.flatMap(_.selectedPartitions.toPartitionArray.toSeq)
        .map(pf => pf.filePath.toString.split("/cells/")(1).split("/")(0)).toSet
      assert(readDirs.nonEmpty && readDirs.forall(_.startsWith("cell=")), readDirs.toString)
      assert(readDirs.size <= 2 * 2 && readDirs.size < allCells.size,
        s"scan must plan only probed cells: planned $readDirs of $allCells")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("appendToIvfIndex: added vectors searchable, quantizer fixed, equals in-memory full set") {
    // FAISS add(): build on the even-id half (quantizer trains there and
    // stays fixed), append the odd half with NO re-train; the persisted
    // search must equal an in-memory index holding the base centroids and
    // the FULL corpus's cell assignment
    val base = emb.where(col("vec_id") % 2 === 0)
    val added = emb.where(col("vec_id") % 2 === 1)
    val queries = emb.where(col("vec_id") < 3)
    val baseIdx = Similarity.buildIvfIndexSampled(base, "vec_id", "embedding", nlist = 8)
    val root = tmpDir("ivfappend-")
    Similarity.writeIvfIndex(baseIdx, root)
    Similarity.appendToIvfIndex(spark, root, added, "vec_id", "embedding")
    // centroids on disk are untouched by the append
    val centsAfter = spark.read.parquet(s"$root/centroids")
      .collect().map(_.getLong(0)).sorted
    assert(centsAfter.sameElements(baseIdx.centroids.collect().map(_.getLong(0)).sorted),
      "append must never re-train the quantizer")
    val viaMemory = Similarity.searchIvfIndex(
      Similarity.IvfIndex(baseIdx.centroids,
        baseIdx.cells.unionByName(Similarity.assignCellsExpr(
          added, "vec_id", "embedding", baseIdx.centroids))),
      queries, "vec_id", "embedding", k = 5, nprobe = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val viaDisk = Similarity.searchIvfIndexAt(spark, root, queries,
      "vec_id", "embedding", k = 5, nprobe = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(viaDisk == viaMemory,
      "appended persisted search must equal the in-memory full assignment")
    // odd-id (appended) neighbors actually appear in some result
    assert(viaDisk.exists(_._2 % 2 == 1), s"appended vectors never surfaced: $viaDisk")
    // transactional append mechanism: the batch landed as an immutable
    // DELTA TREE behind a CAS'd pointer commit (base tree + one delta in
    // the live set); compaction folds the live set to ONE tree with ONE
    // file per cell, changes nothing about search results, and leaves the
    // superseded trees on disk for in-flight readers until vacuum
    import graft.operators.IndexCommit
    val treesAfterAppend = IndexCommit.resolveDirs(root, "cells")
    assert(treesAfterAppend.size == 2 && treesAfterAppend.head.endsWith("/cells"),
      s"append must commit base + one delta tree: $treesAfterAppend")
    Similarity.compactIvfIndex(spark, root)
    val treesAfterCompact = IndexCommit.resolveDirs(root, "cells")
    assert(treesAfterCompact.size == 1, s"compact must fold to one tree: $treesAfterCompact")
    def filesPerCell(tree: String): Map[String, Int] = new java.io.File(tree).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("cell="))
      .map(d => d.getName ->
        d.listFiles().count(f => f.getName.endsWith(".parquet"))).toMap
    assert(filesPerCell(treesAfterCompact.head).values.forall(_ == 1),
      s"compaction must leave one file per cell: ${filesPerCell(treesAfterCompact.head)}")
    assert(treesAfterAppend.forall(t => new java.io.File(t).exists()),
      "superseded trees must survive until vacuum (reader transparency)")
    val viaCompacted = Similarity.searchIvfIndexAt(spark, root, queries,
      "vec_id", "embedding", k = 5, nprobe = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(viaCompacted == viaDisk, "compaction must never change search results")
    // vacuum reclaims exactly the superseded trees; search is unaffected
    val dead = Similarity.vacuumIvfIndex(spark, root)
    assert(dead.toSet == treesAfterAppend.map(_.split("/").last).toSet,
      s"vacuum must reclaim the superseded trees: $dead")
    assert(treesAfterAppend.forall(t => !new java.io.File(t).exists()))
    val viaVacuumed = Similarity.searchIvfIndexAt(spark, root, queries,
      "vec_id", "embedding", k = 5, nprobe = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(viaVacuumed == viaDisk, "vacuum must never change search results")
  }

  test("partition-pruned persisted LSH index: probed (tbl,bucket) dirs only, identical results") {
    val queries = emb.where(col("vec_id") < 2)
    val idx = Similarity.buildLshIndex(emb, "vec_id", "embedding", dim = 64)
    val root = tmpDir("lshpart-")
    Similarity.writeLshIndex(idx, root)
    val viaMemory = Similarity.searchLshIndex(idx, queries, "vec_id", "embedding", k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val pruned = Similarity.searchLshIndexAt(spark, root, queries,
      "vec_id", "embedding", k = 5)
    assert(pruned.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      == viaMemory, "persisted+pruned search must equal the in-memory index")
    // pruning proof via the planner's selected partitions: 2 queries x 4
    // tables probe <= 8 (tbl,bucket) dirs of the many on disk
    val allDirs = {
      def walk(f: java.io.File): Seq[String] = f.listFiles().toSeq
        .filter(_.isDirectory).flatMap(d =>
          if (d.getName.startsWith("bucket=")) Seq(d.getParentFile.getName + "/" + d.getName)
          else walk(d))
      walk(new java.io.File(s"$root/buckets")).toSet
    }
    assert(allDirs.size > 8, s"fixture needs more buckets than probes: $allDirs")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val again = Similarity.searchLshIndexAt(spark, root, queries,
        "vec_id", "embedding", k = 5)
      val scans = again.queryExecution.executedPlan.collect {
        case s: org.apache.spark.sql.execution.FileSourceScanExec
          if s.relation.location.rootPaths.exists(_.toString.contains("/buckets")) => s
      }
      assert(scans.nonEmpty, "no file scan over the buckets table found")
      val readDirs = scans.flatMap(_.selectedPartitions.toPartitionArray.toSeq)
        .map { pf =>
          val parts = pf.filePath.toString.split("/buckets/")(1).split("/")
          parts(0) + "/" + parts(1)
        }.toSet
      assert(readDirs.nonEmpty && readDirs.size <= 2 * 4 && readDirs.size < allDirs.size,
        s"scan must plan only probed buckets: planned ${readDirs.size} of ${allDirs.size}")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("materialized LSH index: persisted buckets answer queries identically") {
    val queries = emb.where(col("vec_id") < 10)
    val inline = Similarity.hyperplaneLshTopK(emb, queries, "vec_id", "embedding",
      k = 5, dim = 64).collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val idx = Similarity.buildLshIndex(emb, "vec_id", "embedding", dim = 64)
    val root = tmpDir("lshidx-")
    idx.buckets.write.parquet(s"$root/buckets")
    val reloaded = Similarity.LshIndex(
      spark.read.parquet(s"$root/buckets"), idx.dim, idx.planes, idx.tables)
    val viaReloaded = Similarity.searchLshIndex(reloaded, queries, "vec_id", "embedding", k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(viaReloaded == inline)
  }

  test("PQ: deterministic codebooks, bounded codes, ADC == distance to the reconstruction") {
    val books = Similarity.pqCodebooks(emb, "vec_id", "embedding", m = 8, ksub = 16)
    val books2 = Similarity.pqCodebooks(emb, "vec_id", "embedding", m = 8, ksub = 16)
    books.zip(books2).foreach { case (a, b) =>
      a.zip(b).foreach { case (x, y) => assert(x.sameElements(y)) } }
    assert(books.length == 8 && books.forall(_.length == 16)
      && books.forall(_.forall(_.length == 8)))
    val codes = Similarity.pqEncode(emb, "vec_id", "embedding", books)
    val bad = codes.select(explode(col("codes")).as("c"))
      .where(col("c") < 0 || col("c") >= 16).count()
    assert(bad == 0L)
    // The ADC law: adist(q, x) is EXACTLY the squared L2 between q and the
    // reconstructed vector, up to fold-order rounding (per-subspace partial
    // sums vs one flat fold) — pin it to 1e-9.
    val queries = emb.where(col("vec_id") < 5)
    val adc = Similarity.pqTopK(emb, queries, "vec_id", "embedding", k = 3, books)
    val recon = Similarity.pqDecode(codes, books)
      .select(col("vec_id").as("nid"), col("v_approx"))
    val joined = adc.join(recon, "nid").join(
      queries.select(col("vec_id").as("qid"),
        col("embedding").cast("array<double>").as("qvec")), "qid")
    val worst = joined.select(abs(
        aggregate(zip_with(col("qvec"), col("v_approx"),
          (x, y) => (x - y) * (x - y)), lit(0.0), _ + _) - col("adist")).as("err"))
      .agg(max("err")).collect().head.getDouble(0)
    assert(worst < 1e-9, s"ADC vs reconstruction distance diverged by $worst")
  }

  test("materialized PQ index: persisted codes + codebooks answer identically") {
    val queries = emb.where(col("vec_id") < 10)
    val books = Similarity.pqCodebooks(emb, "vec_id", "embedding", m = 8, ksub = 16)
    val inline = Similarity.pqTopK(emb, queries, "vec_id", "embedding", k = 5, books)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    val idx = Similarity.buildPqIndex(emb, "vec_id", "embedding")
    val root = tmpDir("pqidx-")
    idx.codes.write.parquet(s"$root/codes")
    idx.books.write.parquet(s"$root/books")
    val reloaded = Similarity.PqIndex(
      spark.read.parquet(s"$root/books"), spark.read.parquet(s"$root/codes"))
    val viaReloaded = Similarity.searchPqIndex(reloaded, queries, "vec_id", "embedding", k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    assert(viaReloaded == inline)
  }

  test("IVF-PQ: nprobe = nlist equals the full ADC sweep; pruning keeps in-cluster recall") {
    val books = Similarity.pqCodebooks(emb, "vec_id", "embedding", m = 8, ksub = 16)
    val cents = Similarity.kmeansCentroids(emb, "vec_id", "embedding", nlist = 8)
    val queries = emb.where(col("vec_id") < 10)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    // the law: probing every cell = scanning every code, bit-for-bit
    val all = rows(Similarity.ivfPqTopK(emb, queries, "vec_id", "embedding",
      k = 5, cents, books, nprobe = 8))
    val full = rows(Similarity.pqTopK(emb, queries, "vec_id", "embedding", k = 5, books))
    assert(all == full, s"nprobe=nlist diverged from the full sweep: ${all.diff(full)}")
    // pruned probing still returns k rows per query (candidates non-empty)
    val pruned = Similarity.ivfPqTopK(emb, queries, "vec_id", "embedding",
      k = 5, cents, books, nprobe = 4)
    assert(pruned.groupBy("qid").count().collect().forall(_.getLong(1) == 5L))
  }

  test("PQ ADC respects cluster structure: every query's top-1 is from its own cluster") {
    import spark.implicits._
    // 4 well-separated clusters in dim 16 (m=4 subspaces of 4): center c
    // puts mass 10 in block c; members add small deterministic jitter.
    val rows = (0 until 40).map { i =>
      val c = i % 4
      val v = Array.tabulate(16) { d =>
        val base = if (d / 4 == c) 10.0 else 0.0
        base + 0.01 * ((i * 16 + d) % 7)
      }
      (i.toLong, v.toSeq)
    }
    val df = rows.toDF("vec_id", "embedding")
    val books = Similarity.pqCodebooks(df, "vec_id", "embedding", m = 4, ksub = 8)
    val top1 = Similarity.pqTopK(df, df.where(col("vec_id") < 4), "vec_id",
        "embedding", k = 1, books)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(top1.length == 4)
    top1.foreach { case (qid, nid) =>
      assert(qid % 4 == nid % 4, s"query $qid matched cross-cluster neighbor $nid") }
  }

  test("randomProject: interpreted eval == codegen, dim mismatch -> null, JL geometry holds") {
    val emb = spark.read.parquet(sf("embeddings"))
    val proj = Similarity.projectEmbeddings(emb, "vec_id", "embedding",
      dim = 64, outDim = 16)
    // interpreted twin: recompute one row JVM-side from the same weights
    val w = Similarity.rademacherWeights(0, 16, 64)
    val row0 = emb.where(col("vec_id") === 0)
      .select(col("embedding").cast("array<double>")).collect()(0)
      .getSeq[Double](0).toArray
    val expect = w.map(r => r.zip(row0).map { case (a, b) => a * b }
      .foldLeft(0.0)(_ + _) / 4.0)
    val got = proj.where(col("vec_id") === 0).collect()(0).getSeq[Double](1)
    // same fold order JVM-side, so exact equality
    expect.zip(got).foreach { case (e, g) => assert(e === g) }
    // a wrong-dimension vector projects to null, not garbage
    val s = spark
    import s.implicits._
    val bad = Seq((1L, Array(1.0, 2.0))).toDF("vec_id", "embedding")
    assert(Similarity.projectEmbeddings(bad, "vec_id", "embedding", 64, 16)
      .where(col("proj").isNull).count() === 1L)
    // JL property: projected cosine approximates true cosine on average
    val joined = emb.select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .join(proj, "vec_id")
    val a = joined.select(col("vec_id").as("i"), col("v").as("va"), col("proj").as("pa"))
    val b = joined.select(col("vec_id").as("j"), col("v").as("vb"), col("proj").as("pb"))
    val err = a.join(b, col("i") < col("j"))
      .select(abs(Similarity.cosine(col("va"), col("vb")) -
        Similarity.cosine(col("pa"), col("pb"))).as("err"))
      .agg(avg("err")).collect()(0).getDouble(0)
    assert(err < 0.25, s"mean |cos - cos_proj| = $err — JL geometry lost")
  }

  test("projectedTopK: recall@5 >= 0.8 vs exact, exact-rerank scores match brute force") {
    val emb = spark.read.parquet(sf("embeddings"))
    val queries = emb.where(col("vec_id") < 10)
    val exact = topKPairs(Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", k = 5))
    val approx = Similarity.projectedTopK(emb, queries, "vec_id", "embedding",
      dim = 64, outDim = 32, k = 5, candidates = 128)
    val recall = (exact & topKPairs(approx)).size.toDouble / exact.size
    assert(recall >= 0.8, s"recall $recall")
    // widening the candidate set must buy recall (the knob works): the
    // measured curve on this fixture is 16 -> 0.34, 128 -> 0.84, 200 -> 0.96
    val narrow = (exact & topKPairs(Similarity.projectedTopK(emb, queries,
      "vec_id", "embedding", dim = 64, outDim = 32, k = 5, candidates = 16)))
      .size.toDouble / exact.size
    assert(narrow < recall, s"candidates knob inert: $narrow !< $recall")
    // any pair the approx shares with exact must carry the EXACT cosine:
    // the rerank is full-precision, not projected
    val brute = Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", k = 5)
      .select(col("qid"), col("nid"), col("score").as("bscore"))
    val diff = approx.join(brute, Seq("qid", "nid"))
      .where(col("score") =!= col("bscore")).count()
    assert(diff === 0L)
  }

  test("pcaTrain: orthonormal components, descending eigenvalues, deterministic, eigen-residual ~ 0") {
    val emb = spark.read.parquet(sf("embeddings"))
    val m = Similarity.pcaTrain(emb, "vec_id", "embedding", k = 8)
    assert(m.k == 8 && m.dim == 64)
    // rows orthonormal
    for (i <- 0 until 8; j <- i until 8) {
      val dot = m.components(i).zip(m.components(j)).map { case (a, b) => a * b }.sum
      val want = if (i == j) 1.0 else 0.0
      assert(math.abs(dot - want) < 1e-9, s"<w$i, w$j> = $dot")
    }
    // eigenvalues descending, positive, ratios within (0, 1]
    m.explainedVariance.sliding(2).foreach {
      case Array(a, b) => assert(a >= b)
      case _ =>
    }
    assert(m.explainedVariance.forall(_ >= 0))
    val cum = m.explainedRatio.sum
    assert(cum > 0 && cum <= 1.0 + 1e-12, s"cum ratio $cum")
    // deterministic: a second train is bit-identical
    val m2 = Similarity.pcaTrain(emb, "vec_id", "embedding", k = 8)
    m.components.zip(m2.components).foreach { case (a, b) => assert(a.sameElements(b)) }
    assert(m.explainedVariance.sameElements(m2.explainedVariance))
    // each component is a true eigenvector of the sample covariance:
    // ||C·w − λ·w|| ~ 0, recomputing C independently from the same sample
    val sample = emb.select(col("vec_id"),
        col("embedding").cast("array<double>").as("v"))
      .orderBy("vec_id").limit(4096).collect().map(_.getSeq[Double](1).toArray)
    val n = sample.length
    val d = 64
    val mean = Array.tabulate(d)(j => sample.map(_(j)).sum / n)
    val cov = Array.tabulate(d, d)((a, b) =>
      sample.map(v => (v(a) - mean(a)) * (v(b) - mean(b))).sum / n)
    m.components.zip(m.explainedVariance).foreach { case (w, lambda) =>
      val cw = Array.tabulate(d)(a => w.zipWithIndex.map { case (x, b) => cov(a)(b) * x }.sum)
      val resid = math.sqrt(cw.zip(w).map { case (c, x) => (c - lambda * x) * (c - lambda * x) }.sum)
      assert(resid < 1e-6, s"eigen residual $resid for lambda $lambda")
    }
    assert(mean.zip(m.mean).forall { case (a, b) => math.abs(a - b) < 1e-12 })
  }

  test("pcaProject: codegen equals the JVM fold exactly; full-k round trip reconstructs the input") {
    val emb = spark.read.parquet(sf("embeddings"))
    val m = Similarity.pcaTrain(emb, "vec_id", "embedding", k = 8)
    val got = Similarity.pcaProject(emb, "vec_id", "embedding", m)
      .where(col("vec_id") === 3).collect()(0).getSeq[Double](1)
    val x = emb.where(col("vec_id") === 3)
      .select(col("embedding").cast("array<double>")).collect()(0)
      .getSeq[Double](0).toArray
    val bias = m.bias
    m.components.zipWithIndex.foreach { case (w, p) =>
      var s = 0.0
      var i = 0
      while (i < 64) { s += x(i) * w(i); i += 1 }
      assert(s - bias(p) === got(p)) // identical fold order => exact
    }
    // k = d: y = W(x - mu) with orthonormal W reconstructs x = mu + W'y
    val full = Similarity.pcaTrain(emb, "vec_id", "embedding", k = 64)
    val y = Similarity.pcaProject(emb, "vec_id", "embedding", full)
      .where(col("vec_id") === 3).collect()(0).getSeq[Double](1).toArray
    val xhat = Array.tabulate(64)(i =>
      full.mean(i) + full.components.zipWithIndex.map { case (w, p) => w(i) * y(p) }.sum)
    val err = math.sqrt(x.zip(xhat).map { case (a, b) => (a - b) * (a - b) }.sum)
    assert(err < 1e-6, s"reconstruction error $err")
    // data-adaptive beats data-oblivious at equal k on this corpus: PCA-8
    // captures more pairwise-cosine geometry than JL-8
    val proj8 = Similarity.pcaProject(emb, "vec_id", "embedding", m)
    val jl8 = Similarity.projectEmbeddings(emb, "vec_id", "embedding", dim = 64, outDim = 8)
    def meanCosErr(p: org.apache.spark.sql.DataFrame): Double = {
      val joined = emb.select(col("vec_id"),
        col("embedding").cast("array<double>").as("v")).join(p, "vec_id")
      val a = joined.select(col("vec_id").as("i"), col("v").as("va"), col("proj").as("pa"))
      val b = joined.select(col("vec_id").as("j"), col("v").as("vb"), col("proj").as("pb"))
      a.join(b, col("i") < col("j"))
        .select(abs(Similarity.cosine(col("va"), col("vb")) -
          Similarity.cosine(col("pa"), col("pb"))).as("e"))
        .agg(avg("e")).collect()(0).getDouble(0)
    }
    val pcaErr = meanCosErr(proj8)
    val jlErr = meanCosErr(jl8)
    assert(pcaErr < jlErr, s"PCA-8 err $pcaErr !< JL-8 err $jlErr")
  }

  test("projection exprs survive CODEGEN_ONLY with fallback disabled (no silent eval path)") {
    val emb = spark.read.parquet(sf("embeddings"))
    val m = Similarity.pcaTrain(emb, "vec_id", "embedding", k = 8)
    val prevMode = spark.conf.getOption("spark.sql.codegen.factoryMode")
    val prevFall = spark.conf.getOption("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val jl = Similarity.projectEmbeddings(emb, "vec_id", "embedding", 64, 16).collect()
      assert(jl.length.toLong == emb.count() && jl.forall(!_.isNullAt(1)))
      val pc = Similarity.pcaProject(emb, "vec_id", "embedding", m).collect()
      assert(pc.forall(!_.isNullAt(1)))
      // null contract holds under codegen too
      val s = spark
      import s.implicits._
      val bad = Seq((1L, Array(1.0, 2.0))).toDF("vec_id", "embedding")
      assert(Similarity.projectEmbeddings(bad, "vec_id", "embedding", 64, 16)
        .collect()(0).isNullAt(1))
      assert(Similarity.pcaProject(bad, "vec_id", "embedding", m)
        .collect()(0).isNullAt(1))
    } finally {
      def restore(k: String, v: Option[String]): Unit = v match {
        case Some(x) => spark.conf.set(k, x)
        case None => spark.conf.unset(k)
      }
      restore("spark.sql.codegen.factoryMode", prevMode)
      restore("spark.sql.codegen.fallback", prevFall)
    }
  }

  test("pcaTopK: adaptive axes beat JL at EQUAL dims; 8 PCA dims ~ 32 JL dims") {
    val emb = spark.read.parquet(sf("embeddings"))
    val queries = emb.where(col("vec_id") < 10)
    val exact = topKPairs(Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", k = 5))
    val m = Similarity.pcaTrain(emb, "vec_id", "embedding", k = 8)
    def recall(pairs: Set[(Long, Long)]): Double = (exact & pairs).size.toDouble / exact.size
    val pca8 = recall(topKPairs(Similarity.pcaTopK(emb, queries, "vec_id",
      "embedding", m, k = 5, candidates = 64)))
    val jl8 = recall(topKPairs(Similarity.projectedTopK(emb, queries, "vec_id",
      "embedding", dim = 64, outDim = 8, k = 5, candidates = 64)))
    val jl32 = recall(topKPairs(Similarity.projectedTopK(emb, queries, "vec_id",
      "embedding", dim = 64, outDim = 32, k = 5, candidates = 64)))
    // equal dims: data-adaptive must win clearly
    assert(pca8 > jl8, s"PCA-8 recall $pca8 !> JL-8 recall $jl8")
    // the 4x-cheaper PCA space lands within 10 points of JL-32
    // (measured on this fixture: pca8 0.58, jl8 well below, jl32 0.62)
    assert(pca8 >= jl32 - 0.10, s"PCA-8 $pca8 far below JL-32 $jl32")
    assert(pca8 >= 0.5, s"PCA-8 recall $pca8")
  }

  test("embedding near-dup LSH recall vs the exact all-pairs baseline") {
    val exact = Similarity.embeddingNearDups(emb, "vec_id", "embedding", 0.4)
      .select("i", "j").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Similarity.embeddingNearDupsLsh(emb, "vec_id", "embedding",
      threshold = 0.4, dim = 64, planes = 4, tables = 12)
      .select("i", "j").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.subsetOf(exact), s"LSH found pairs the exact path did not: ${lsh -- exact}")
    if (exact.nonEmpty) {
      val recall = (exact & lsh).size.toDouble / exact.size
      assert(recall >= 0.8, s"recall $recall (${(exact & lsh).size}/${exact.size})")
    }
  }

  test("assignCellsExpr == assignCells bit-for-bit (window-free argmax twin)") {
    import org.apache.spark.sql.functions._
    import graft.operators.Similarity
    val emb = spark.read.parquet(sf("embeddings"))
    val idx = Similarity.buildIvfIndexSampled(emb, "vec_id", "embedding", nlist = 16)
    // the WINDOW formulation is the executable spec (assignCells itself now
    // routes integral-cid tables through the expression — r17): pin the
    // expression path against it explicitly, and the production cells too
    val w = Similarity.assignCellsWindow(emb, "vec_id", "embedding", idx.centroids)
      .select("nid", "cell").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val a = idx.cells.select("nid", "cell").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val b = Similarity.assignCellsExpr(emb, "vec_id", "embedding", idx.centroids)
      .select("nid", "cell").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(a == b)
    assert(w == b)
  }

  test("semanticProbeStream == semanticProbe on a batch, and the JSON payload round-trips floats") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    import graft.operators.{Dedup, Similarity}
    val emb = spark.read.parquet(sf("embeddings"))
    val idx = Similarity.buildIvfIndexSampled(
      emb.where(col("vec_id") < 400), "vec_id", "embedding", nlist = 16)
    val incoming = emb.where(col("vec_id") >= 400)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("existing", "incoming", "cosine").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val batch = pairs(Dedup.semanticProbe(idx, incoming, "vec_id", "embedding", 0.4))
    val tween = pairs(Dedup.semanticProbeStream(idx, incoming, "vec_id", "embedding", 0.4))
    assert(batch == tween && batch.nonEmpty)
    // the streaming fixture's payload codec: to_json -> from_json is exact
    val schema = new StructType().add("embedding", ArrayType(FloatType))
    val rt = incoming.select(col("vec_id"),
        from_json(to_json(struct(col("embedding"))), schema)
          .getField("embedding").as("back"), col("embedding"))
      .where(not(col("back") <=> col("embedding")))
    assert(rt.count() == 0, "JSON float round-trip must be exact")
  }

  test("diverseSample: per-cell quota, full coverage, deterministic, equals the window twin") {
    import spark.implicits._
    val e = emb
    val cents = Similarity.kmeansCentroids(e, "vec_id", "embedding", nlist = 8)
    val k = 5
    val s1 = Similarity.diverseSample(e, "vec_id", "embedding", cents, k = k, seed = 3)
      .select("cell", "vec_id").as[(Long, Long)].collect().toSet

    val cdf = cents.zipWithIndex.map { case (v, i) => (i.toLong, v.toSeq) }.toSeq
      .toDF("cid", "cvec")
    val cells = Similarity.assignCellsExpr(e, "vec_id", "embedding", cdf)
      .select(col("cell"), col("nid").as("vec_id"))

    // quota: never more than k per cell; a cell with <= k members keeps ALL
    // of them (coverage — the point of the diverse draw)
    val drawn = s1.groupBy(_._1).map { case (c, xs) => c -> xs.size }
    val pop = cells.groupBy("cell").count().as[(Long, Long)].collect().toMap
    assert(drawn.forall { case (_, n) => n <= k })
    pop.foreach { case (cell, n) =>
      assert(drawn.getOrElse(cell, 0) == math.min(n, k.toLong).toInt,
        s"cell $cell: population $n, drew ${drawn.getOrElse(cell, 0)}")
    }

    // deterministic + bit-equal to the declarative window twin (the oracle's
    // formulation)
    val s2 = Similarity.diverseSample(e, "vec_id", "embedding", cents, k = k, seed = 3)
      .select("cell", "vec_id").as[(Long, Long)].collect().toSet
    assert(s1 == s2)
    val twin = graft.operators.Sampling
      .sampleKPerGroupViaWindow(cells, Seq("cell"), "vec_id", k, seed = 3)
      .select("cell", "vec_id").as[(Long, Long)].collect().toSet
    assert(s1 == twin)
    // a different seed draws a different sample (sanity that the seed wires)
    val s3 = Similarity.diverseSample(e, "vec_id", "embedding", cents, k = k, seed = 4)
      .select("cell", "vec_id").as[(Long, Long)].collect().toSet
    assert(s1 != s3)
  }
}
