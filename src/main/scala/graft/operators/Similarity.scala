package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Portable

/** Vector similarity search over an embedding column (`array<float>`).
  *
  * Two paths, per the usual scale trade-off:
  *
  *  - [[bruteForceTopK]]: exact cosine top-k. The query set is broadcast
  *    (small side), the corpus streams through one scan — no shuffle of the
  *    corpus, no driver collect. Right up to ~thousands of queries; it is
  *    also the recall oracle for the approximate path.
  *  - [[hyperplaneLshTopK]]: random-hyperplane (sign) LSH. Each vector gets a
  *    `planes`-bit bucket per table; candidates = same bucket in any table,
  *    re-ranked exactly. The corpus-side join key is the bucket, so the
  *    quadratic cross join becomes a hash join on O(N · tables) rows — the
  *    100 TB path. Hyperplane weights are ±1 Rademacher vectors derived from
  *    the portable md5 hash, so results are reproducible anywhere (and by the
  *    SQL oracle).
  *
  * All arithmetic is double (array<float> cast up), folded left-to-right, so
  * an independent engine reproduces scores bit-for-bit.
  */
object Similarity {

  /** dot(a,b) — sequential left fold, bit-deterministic. Runs as the
    * codegen'd [[org.apache.spark.sql.graftshim.DotProduct]] loop (the HOF formulation
    * `aggregate(zip_with(..))` computes the identical IEEE fold but is
    * interpreted per element; the custom Expression keeps the scalar inside
    * whole-stage codegen). */
  def dot(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graftshim.GraftShims
    GraftShims.column(org.apache.spark.sql.graftshim.DotProduct(GraftShims.expr(a), GraftShims.expr(b)))
  }

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** cosine(a,b) — fused single-pass codegen
    * ([[org.apache.spark.sql.graftshim.CosineSim]]): bit-identical to
    * `dot(a,b) / (norm(a) * norm(b))` but one loop instead of three. */
  def cosine(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graftshim.GraftShims
    GraftShims.column(org.apache.spark.sql.graftshim.CosineSim(GraftShims.expr(a), GraftShims.expr(b)))
  }

  private def asDouble(c: Column): Column = c.cast("array<double>")

  /** Int8 symmetric quantization of an embedding column — the 4× storage
    * lever for a 100 TB embedding corpus: per-vector scale = max |x|,
    * q[i] = round(x[i] · 127 / scale) as a signed byte (an all-zero vector
    * quantizes to zeros). Integer output + IEEE-exact scale arithmetic, so
    * an independent engine reproduces every byte. A write-path projection —
    * run once at export, not in a scoring loop. */
  def quantizeInt8(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val v = asDouble(col(vecCol))
    df.select(col(idCol), v.as("v"),
        array_max(transform(v, x => abs(x))).as("q_scale"))
      .select(col(idCol), col("q_scale"),
        when(col("q_scale") === 0.0,
          transform(col("v"), _ => lit(0).cast("tinyint")))
          .otherwise(transform(col("v"),
            x => round(x * lit(127.0) / col("q_scale")).cast("tinyint")))
          .as("q"))
  }

  /** Inverse of [[quantizeInt8]]: x'[i] = q[i] · scale / 127. Lossy by
    * construction — reconstruction keeps cosine ≈ 1 (unit-tested ≥ 0.999);
    * use for recall-tolerant candidate generation over quantized storage,
    * re-rank against the full-precision column. */
  def dequantizeInt8(df: DataFrame, qCol: String = "q",
                     scaleCol: String = "q_scale"): DataFrame =
    df.withColumn("v_approx",
      transform(col(qCol), b => b.cast("double") * col(scaleCol) / lit(127.0)))

  /** Exact cosine top-k: for each query vector, the k nearest corpus vectors
    * (self excluded), ties broken by id. Queries are broadcast; ranking is a
    * window partitioned by query (shuffle keyed by query id only). */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
                     vecCol: String, k: Int): DataFrame = {
    val c = OpUtil.rebalance(corpus).select(col(idCol).as("nid"), asDouble(col(vecCol)).as("nvec"))
    val q = queries.select(col(idCol).as("qid"), asDouble(col(vecCol)).as("qvec"))
    val scored = c.join(broadcast(q), col("nid") =!= col("qid"))
      .select(col("qid"), col("nid"), cosine(col("qvec"), col("nvec")).as("score"))
    val w = Window.partitionBy("qid").orderBy(col("score").desc, col("nid").asc)
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select("qid", "nid", "rank", "score")
  }

  /** Deterministic ±1 Rademacher weight for (table, plane, dim): bit 0 of the
    * portable 60-bit md5 hash of "t:p:d" — computed JVM-side so the plan
    * carries one literal array per plane instead of `dim` hash expressions
    * (same values the SQL oracle derives with md5 in-engine). */
  def rademacherWeights(table: Int, planes: Int, dim: Int): Array[Array[Double]] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(planes, dim) { (p, d) =>
      md.reset()
      val hex = md.digest(s"$table:$p:$d".getBytes("UTF-8"))
        .take(8).map(b => f"$b%02x").mkString.take(15)
      if ((java.lang.Long.parseLong(hex, 16) & 1L) == 1L) 1.0 else -1.0
    }
  }

  /** `planes`-bit sign bucket of a vector under table `t`: bit p is the sign
    * of `Σ_d w(t,p,d)·v[d]`, folded left-to-right like [[dot]]. All planes
    * project in ONE codegen'd pass over the vector
    * ([[org.apache.spark.sql.graftshim.LshBucketExpr]]) — bit-compatible
    * with the composed per-plane `when(dot > 0, 1<<p)` sum. */
  def lshBucket(vec: Column, table: Int, planes: Int, dim: Int): Column = {
    import org.apache.spark.sql.graftshim.GraftShims
    val w = rademacherWeights(table, planes, dim)
    GraftShims.column(org.apache.spark.sql.graftshim.LshBucketExpr(
      GraftShims.expr(vec.cast("array<double>")), w.map(_.toSeq).toSeq))
  }

  /** Johnson–Lindenstrauss random projection to `outDim` dimensions: `y_p =
    * (Σ_d w(t,p,d)·v[d]) / √outDim` under the same deterministic Rademacher
    * family as [[lshBucket]] — the LSH bucket keeps the signs, this keeps the
    * folded values. One codegen'd pass over the vector
    * ([[org.apache.spark.sql.graftshim.RandomProjectExpr]]); every component
    * is a left-to-right IEEE fold, so an independent engine reproduces each
    * double bit-exactly. The 100 TB lever: a 64→16 projection cuts embedding
    * bytes 4× and JL preserves pairwise geometry to O(√(log n / outDim)) —
    * project once at write time, generate candidates in projected space,
    * re-rank survivors against the full-precision column. */
  def randomProject(vec: Column, outDim: Int, dim: Int, table: Int = 0): Column = {
    import org.apache.spark.sql.graftshim.GraftShims
    val w = rademacherWeights(table, outDim, dim)
    GraftShims.column(org.apache.spark.sql.graftshim.RandomProjectExpr(
      GraftShims.expr(vec.cast("array<double>")), w.map(_.toSeq).toSeq,
      1.0 / math.sqrt(outDim.toDouble)))
  }

  /** Corpus-level [[randomProject]]: `(id, proj)` with `proj` the `outDim`-d
    * projection of `vecCol`. A write-path map — no shuffle, no state. */
  def projectEmbeddings(df: DataFrame, idCol: String, vecCol: String,
                        dim: Int, outDim: Int, table: Int = 0): DataFrame =
    df.select(col(idCol),
      randomProject(col(vecCol), outDim, dim, table).as("proj"))

  /** Projected-space candidate generation with exact re-rank: score ALL
    * candidates cheaply in `outDim`-d projected space, keep each query's
    * `candidates` best, then re-rank ONLY those against the full-precision
    * vectors and emit top `k`. The cheap pass does the quadratic work on
    * vectors `dim/outDim`× smaller; the exact pass is O(candidates) per
    * query. Queries broadcast both passes — the corpus never shuffles on
    * anything but the final per-query window. Deterministic: projected
    * scores are bit-exact (see [[randomProject]]), ties break by id. */
  def projectedTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
                    vecCol: String, dim: Int, outDim: Int, k: Int,
                    candidates: Int, table: Int = 0): DataFrame =
    projectedTopKWith(corpus, queries, idCol, vecCol,
      v => randomProject(v, outDim, dim, table), k, candidates)

  /** [[projectedTopK]] with a PCA projection ([[pcaTrain]]) as the cheap
    * space — data-adaptive axes, so the same projected dimension keeps
    * more of the candidate ordering than the data-oblivious JL matrix
    * (pinned comparatively in SimilaritySpec). */
  def pcaTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
              vecCol: String, model: PcaModel, k: Int,
              candidates: Int): DataFrame =
    projectedTopKWith(corpus, queries, idCol, vecCol,
      v => pcaProjectCol(v, model), k, candidates)

  private def pcaProjectCol(vec: Column, model: PcaModel): Column = {
    import org.apache.spark.sql.graftshim.GraftShims
    GraftShims.column(org.apache.spark.sql.graftshim.AffineProjectExpr(
      GraftShims.expr(vec.cast("array<double>")),
      model.components.map(_.toSeq).toSeq, model.bias.toSeq))
  }

  private def projectedTopKWith(corpus: DataFrame, queries: DataFrame,
                                idCol: String, vecCol: String,
                                proj: Column => Column, k: Int,
                                candidates: Int): DataFrame = {
    require(candidates >= k, s"candidates $candidates < k $k")
    val c = OpUtil.rebalance(corpus).select(
      col(idCol).as("nid"), asDouble(col(vecCol)).as("nvec"),
      proj(col(vecCol)).as("nproj"))
    val q = queries.select(
      col(idCol).as("qid"), asDouble(col(vecCol)).as("qvec"),
      proj(col(vecCol)).as("qproj"))
    val cheap = c.join(broadcast(q), col("nid") =!= col("qid"))
      .select(col("qid"), col("nid"), col("qvec"), col("nvec"),
        cosine(col("qproj"), col("nproj")).as("pscore"))
    val wP = Window.partitionBy("qid").orderBy(col("pscore").desc, col("nid").asc)
    val survivors = cheap.withColumn("prank", row_number().over(wP))
      .where(col("prank") <= candidates)
    val wE = Window.partitionBy("qid").orderBy(col("score").desc, col("nid").asc)
    survivors
      .select(col("qid"), col("nid"), cosine(col("qvec"), col("nvec")).as("score"))
      .withColumn("rank", row_number().over(wE).cast("long"))
      .where(col("rank") <= k)
      .select("qid", "nid", "rank", "score")
  }

  /** A trained PCA projection: `components` is k×d with ORTHONORMAL rows
    * (eigenvectors of the sample covariance, eigenvalue-descending, sign
    * fixed so each row's largest-|coefficient| entry is positive),
    * `explainedVariance(p)` its eigenvalue, `totalVariance` the trace. */
  final case class PcaModel(mean: Array[Double],
                            components: Array[Array[Double]],
                            explainedVariance: Array[Double],
                            totalVariance: Double) {
    def k: Int = components.length
    def dim: Int = mean.length
    /** `bias_p = Σ_d w_pd·μ_d` — the affine offset `y = Wx − Wμ` needs. */
    def bias: Array[Double] = components.map { row =>
      var s = 0.0; var d = 0
      while (d < mean.length) { s += row(d) * mean(d); d += 1 }
      s
    }
    def explainedRatio: Array[Double] =
      explainedVariance.map(v => if (totalVariance == 0) 0.0 else v / totalVariance)
  }

  /** Train PCA on a bounded deterministic sample — the same posture as the
    * IVF quantizer ([[kmeansCentroids]]): collect the first `sampleN`
    * vectors by id (deterministic at any SF, O(sampleN·d²) driver work,
    * never corpus-proportional), mean-center, eigendecompose the sample
    * covariance with cyclic Jacobi (exact for symmetric d×d; d ≤ 1024
    * guard). The DISTRIBUTED half is [[pcaProject]] — one codegen'd pass.
    * Unlike [[randomProject]]'s data-oblivious JL matrix, these axes chase
    * the corpus's actual variance, so the same k keeps more geometry. */
  def pcaTrain(corpus: DataFrame, idCol: String, vecCol: String, k: Int,
               sampleN: Int = 4096): PcaModel = {
    val sample: Array[Array[Double]] = corpus
      .select(col(idCol).as("id"), asDouble(col(vecCol)).as("v"))
      .orderBy("id").limit(sampleN)
      .collect().map(_.getSeq[Double](1).toArray)
    require(sample.nonEmpty, "empty sample")
    val d = sample.head.length
    require(k >= 1 && k <= d, s"k $k out of range for dim $d")
    require(d <= 1024, s"dim $d past the driver eigensolve guard")
    val n = sample.length
    val mean = new Array[Double](d)
    sample.foreach { v => var i = 0; while (i < d) { mean(i) += v(i); i += 1 } }
    var i = 0
    while (i < d) { mean(i) /= n; i += 1 }
    // covariance (upper triangle, then mirror)
    val cov = Array.ofDim[Double](d, d)
    sample.foreach { v =>
      var a = 0
      while (a < d) {
        val xa = v(a) - mean(a)
        var b = a
        while (b < d) { cov(a)(b) += xa * (v(b) - mean(b)); b += 1 }
        a += 1
      }
    }
    var a = 0
    while (a < d) {
      var b = a
      while (b < d) { cov(a)(b) /= n; cov(b)(a) = cov(a)(b); b += 1 }
      a += 1
    }
    val trace = (0 until d).map(i => cov(i)(i)).sum
    val (evals, evecs) = jacobiEigSym(cov) // descending, columns = vectors
    val order = evals.indices.sortBy(i => (-evals(i), i)).take(k)
    val comps = order.map { ei =>
      val row = Array.tabulate(d)(j => evecs(j)(ei))
      // deterministic sign: largest-|coefficient| entry positive
      var mi = 0
      var m = 0.0
      var j = 0
      while (j < d) { if (math.abs(row(j)) > m) { m = math.abs(row(j)); mi = j }; j += 1 }
      if (row(mi) < 0) row.map(-_) else row
    }.toArray
    PcaModel(mean, comps, order.map(evals).toArray, trace)
  }

  /** Cyclic Jacobi eigendecomposition of a symmetric matrix: returns
    * (eigenvalues, eigenvector matrix V with V(:,i) the i-th vector).
    * O(d³) per sweep, converges quadratically; bounded sweeps with an
    * off-diagonal tolerance — plenty for the ≤1024-dim guard. */
  private def jacobiEigSym(m0: Array[Array[Double]]): (Array[Double], Array[Array[Double]]) = {
    val d = m0.length
    val a = m0.map(_.clone)
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    var off = Double.MaxValue
    // RELATIVE convergence: an absolute 1e-14 would never converge for
    // large-magnitude feature scales (off-diagonals bottom out at
    // eps·‖A‖, not at eps) and over-iterate for tiny ones
    val frob = math.sqrt(m0.iterator.flatMap(_.iterator).map(x => x * x).sum)
    val tol = 1e-14 * math.max(1.0, frob)
    while (sweep < 64 && off > tol) {
      off = 0.0
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          val apq = a(p)(q)
          off = math.max(off, math.abs(apq))
          if (math.abs(apq) > 1e-300) {
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * apq)
            // |theta| past ~1e150: theta² overflows, and the -Inf fallback
            // would compute 1/(-Inf + Inf) = NaN, poisoning the whole
            // decomposition — use the asymptotic rotation t = 1/(2θ)
            val t =
              if (math.abs(theta) > 1e150) 1.0 / (2.0 * theta)
              else math.signum(theta) / (math.abs(theta) + math.sqrt(theta * theta + 1.0)) match {
                case 0.0 => 1.0 / (theta + math.sqrt(theta * theta + 1.0))
                case x => x
              }
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val s = t * c
            var i = 0
            while (i < d) {
              val aip = a(i)(p); val aiq = a(i)(q)
              a(i)(p) = c * aip - s * aiq
              a(i)(q) = s * aip + c * aiq
              i += 1
            }
            i = 0
            while (i < d) {
              val api = a(p)(i); val aqi = a(q)(i)
              a(p)(i) = c * api - s * aqi
              a(q)(i) = s * api + c * aqi
              val vip = v(i)(p); val viq = v(i)(q)
              v(i)(p) = c * vip - s * viq
              v(i)(q) = s * vip + c * viq
              i += 1
            }
          }
          q += 1
        }
        p += 1
      }
      sweep += 1
    }
    (Array.tabulate(d)(i => a(i)(i)), v)
  }

  /** Persist a [[PcaModel]] as one tiny parquet dataset under `dir`
    * (scheme-aware — any Hadoop FS): rows `(p, w, b, evar)` per component
    * plus a `p = -1` row carrying `(mean, 0, totalVariance)`. Parquet
    * doubles round-trip bit-exactly, so a projection through the reloaded
    * model equals the in-memory one to the last bit. A trained model is a
    * single immutable artifact (no appends — retrain = rewrite), so this
    * deliberately does NOT ride the IndexCommit pointer machinery. */
  def writePcaModel(spark: SparkSession, dir: String, model: PcaModel): Unit = {
    import spark.implicits._
    val rows = model.components.zipWithIndex.map { case (w, p) =>
      (p, w.toSeq, model.bias(p), model.explainedVariance(p))
    }.toSeq :+ ((-1, model.mean.toSeq, 0.0, model.totalVariance))
    rows.toDF("p", "w", "b", "evar")
      .coalesce(1).write.mode("overwrite").parquet(dir)
  }

  /** Load a model written by [[writePcaModel]]. */
  def readPcaModel(spark: SparkSession, dir: String): PcaModel = {
    val rows = spark.read.parquet(dir)
      .select(col("p"), col("w").cast("array<double>"), col("b"), col("evar"))
      .collect() // bounded: k + 1 rows
      .map(r => (r.getInt(0), r.getSeq[Double](1).toArray, r.getDouble(2), r.getDouble(3)))
      .sortBy(_._1)
    val (meanRow, compRows) = rows.partition(_._1 == -1)
    require(meanRow.length == 1 && compRows.nonEmpty, s"corrupt PCA model at $dir")
    PcaModel(meanRow.head._2, compRows.map(_._2),
      compRows.map(_._4), meanRow.head._4)
  }

  /** Distributed PCA projection `y = W(x − μ)` — one shuffle-free codegen'd
    * pass ([[org.apache.spark.sql.graftshim.AffineProjectExpr]], the bias
    * `W·μ` folded in driver-side). Write-path map, like [[projectEmbeddings]]. */
  def pcaProject(df: DataFrame, idCol: String, vecCol: String,
                 model: PcaModel): DataFrame =
    df.select(col(idCol), pcaProjectCol(col(vecCol), model).as("proj"))

  /** Embedding-cosine near-duplicate pairs, exact: all (i < j) with cosine >=
    * threshold via an all-pairs broadcast pass. O(N²/2) scoring — this is the
    * small-scale recall oracle ONLY; the scale path is
    * [[embeddingNearDupsLsh]], which replaces the quadratic scan with a
    * bucketed candidate join. */
  def embeddingNearDups(corpus: DataFrame, idCol: String, vecCol: String,
                        threshold: Double): DataFrame = {
    val a = corpus.select(col(idCol).as("i"), asDouble(col(vecCol)).as("va"))
    val b = corpus.select(col(idCol).as("j"), asDouble(col(vecCol)).as("vb"))
    a.join(broadcast(b), col("i") < col("j"))
      .select(col("i"), col("j"), cosine(col("va"), col("vb")).as("cosine"))
      .where(col("cosine") >= threshold)
  }

  /** Embedding-cosine near-duplicate pairs at corpus scale: hyperplane-LSH
    * candidates — self equi-join on (table, bucket) with i < j — verified
    * with the exact cosine and thresholded. Cost is O(N·tables) bucket rows
    * plus candidate verification, never N²; pairs are found iff they collide
    * in at least one table (probability follows the S-curve in `planes` /
    * `tables`), so raise `tables` (or lower `planes`) to push recall up for
    * a given threshold. [[embeddingNearDups]] is the exact baseline to
    * measure that recall against. */
  def embeddingNearDupsLsh(corpus: DataFrame, idCol: String, vecCol: String,
                           threshold: Double, dim: Int,
                           planes: Int = 8, tables: Int = 4): DataFrame = {
    val e = OpUtil.rebalance(corpus).select(col(idCol).as("id"), asDouble(col(vecCol)).as("v"))
    val eb = e.select(col("id"), col("v"),
      posexplode(array((0 until tables).map(t => lshBucket(col("v"), t, planes, dim)): _*))
        .as(Seq("tbl", "bucket")))
    val cands = eb.as("a").join(eb.as("b"),
        col("a.tbl") === col("b.tbl") && col("a.bucket") === col("b.bucket") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("i"), col("a.v").as("va"), col("b.id").as("j"), col("b.v").as("vb"))
      .distinct()
    cands.select(col("i"), col("j"), cosine(col("va"), col("vb")).as("cosine"))
      .where(col("cosine") >= threshold)
  }

  /** IVF-style ANN: a coarse quantizer of `nlist` centroids partitions the
    * corpus into cells; a query probes its `nprobe` closest cells and only
    * their members are scored exactly. The centroid set here is a
    * deterministic sample (lowest `nlist` ids) — fully SQL-reproducible, so
    * it is what the DuckDB oracle checks bit-for-bit; [[ivfTopKKmeans]] is
    * the better-balanced variant. The plan shape (cell equi-join, no
    * all-pairs) is identical in both. At corpus scale the cell assignment is
    * one broadcast pass and the candidate join is a hash join on the cell id. */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
              vecCol: String, k: Int, nlist: Int = 16, nprobe: Int = 4): DataFrame = {
    val cents = corpus.select(col(idCol).as("cid"), asDouble(col(vecCol)).as("cvec"))
      .orderBy("cid").limit(nlist)
    ivfWithCentroids(corpus, queries, idCol, vecCol, k, cents, nprobe)
  }

  /** Deterministic k-means centroids for the IVF coarse quantizer, computed
    * driver-side over a bounded sample: the `sampleN` lowest-id vectors
    * (a top-k by id — never a full collect), L2-normalized, Lloyd's
    * algorithm with cosine (= dot on unit vectors) assignment for a fixed
    * `iters` iterations, empty cells keeping their previous centroid.
    * Deterministic by construction — fixed sample, fixed iteration count,
    * sequential accumulation — so repeated runs plan identical literals. */
  def kmeansCentroids(corpus: DataFrame, idCol: String, vecCol: String,
                      nlist: Int, sampleN: Int = 4096, iters: Int = 5): Array[Array[Double]] = {
    val sample: Array[Array[Double]] = corpus
      .select(col(idCol).as("id"), asDouble(col(vecCol)).as("v"))
      .orderBy("id").limit(sampleN)
      .collect().map(_.getSeq[Double](1).toArray)
    require(sample.length >= nlist, s"sample ${sample.length} < nlist $nlist")
    def unit(v: Array[Double]): Array[Double] = {
      val n = math.sqrt(v.map(x => x * x).sum)
      if (n == 0) v else v.map(_ / n)
    }
    val pts = sample.map(unit)
    val dim = pts.head.length
    var cents = pts.take(nlist).map(_.clone)
    for (_ <- 0 until iters) {
      val sums = Array.fill(nlist, dim)(0.0)
      val counts = new Array[Long](nlist)
      pts.foreach { v =>
        var best = 0; var bestDot = Double.MinValue
        for (c <- 0 until nlist) {
          var d = 0.0; var i = 0
          while (i < dim) { d += cents(c)(i) * v(i); i += 1 }
          if (d > bestDot) { bestDot = d; best = c }
        }
        var i = 0
        while (i < dim) { sums(best)(i) += v(i); i += 1 }
        counts(best) += 1
      }
      cents = Array.tabulate(nlist) { c =>
        if (counts(c) == 0) cents(c)
        else unit(sums(c).map(_ / counts(c)))
      }
    }
    cents
  }

  /** IVF ANN with k-means centroids (see [[kmeansCentroids]]): better cell
    * balance — and thus tail latency — than the sampled quantizer on
    * clustered data. Same bucketed plan as [[ivfTopK]]. */
  def ivfTopKKmeans(corpus: DataFrame, queries: DataFrame, idCol: String,
                    vecCol: String, k: Int, nlist: Int = 16, nprobe: Int = 4,
                    sampleN: Int = 4096, iters: Int = 5): DataFrame =
    ivfTopKWith(corpus, queries, idCol, vecCol, k,
      kmeansCentroids(corpus, idCol, vecCol, nlist, sampleN, iters), nprobe)

  /** [[ivfTopKKmeans]] with caller-supplied centroids (index `i` becomes cell
    * id `i`): lets a caller compute [[kmeansCentroids]] once and reuse the
    * exact same literals elsewhere — e.g. to generate an oracle query that
    * reproduces the search bit-for-bit. */
  def ivfTopKWith(corpus: DataFrame, queries: DataFrame, idCol: String,
                  vecCol: String, k: Int, cents: Array[Array[Double]],
                  nprobe: Int = 4): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val cdf = cents.zipWithIndex.map { case (v, i) => (i.toLong, v.toSeq) }.toSeq
      .toDF("cid", "cvec")
    ivfWithCentroids(corpus, queries, idCol, vecCol, k, cdf, nprobe)
  }

  /** Rank `cents` cells for each row of `df` by cosine: broadcast centroid
    * pass, window over the row id — the only corpus-wide work in IVF. */
  private def rankCells(df: DataFrame, id: String, vec: String,
                        cents: DataFrame): DataFrame = {
    val w = Window.partitionBy(id).orderBy(col("cscore").desc, col("cid").asc)
    df.crossJoin(broadcast(cents))
      .withColumn("cscore", cosine(col(vec), col("cvec")))
      .withColumn("crank", row_number().over(w))
  }

  /** Exact scoring + top-k over the (cell-pruned) candidate join. */
  private def ivfSearch(cells: DataFrame, probes: DataFrame, k: Int): DataFrame = {
    val cands = cells.join(probes, Seq("cell"))
      .where(col("nid") =!= col("qid"))
      .select("qid", "qvec", "nid", "nvec").distinct()
    val w = Window.partitionBy("qid").orderBy(col("score").desc, col("nid").asc)
    cands.select(col("qid"), col("nid"), cosine(col("qvec"), col("nvec")).as("score"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select("qid", "nid", "rank", "score")
  }

  private def ivfWithCentroids(corpus: DataFrame, queries: DataFrame, idCol: String,
                               vecCol: String, k: Int, cents: DataFrame,
                               nprobe: Int): DataFrame =
    searchIvfIndex(IvfIndex(cents, assignCells(corpus, idCol, vecCol, cents)),
      queries, idCol, vecCol, k, nprobe)

  /** Materialized IVF index — build once at WRITE time, search many times
    * (the deployment shape at corpus scale: the quantizer and the corpus
    * cell assignment are one-off work; a query then touches only its
    * `nprobe` cells). Both members are plain DataFrames, so the index
    * persists as ordinary tables: write [[cells]] partitioned or bucketed BY
    * `cell` (`df.write.bucketBy(n, "cell")...`) and the search-time
    * candidate join co-locates on the bucket with no corpus shuffle;
    * [[centroids]] is tiny and broadcasts. The reference has no ANN surface
    * — this is part of the training-data-pipeline extension
    * (SURVEY "LLM-data-pipeline operators"). */
  final case class IvfIndex(centroids: DataFrame, cells: DataFrame)

  /** [[buildIvfIndex]] with the deterministic lowest-id coarse quantizer
    * ([[ivfTopK]]'s) instead of k-means — the variant whose every step is
    * reproducible by plain SQL (the oracle path), trading cell balance. */
  def buildIvfIndexSampled(corpus: DataFrame, idCol: String, vecCol: String,
                           nlist: Int = 16): IvfIndex = {
    val cents = corpus.select(col(idCol).as("cid"), asDouble(col(vecCol)).as("cvec"))
      .orderBy("cid").limit(nlist)
    IvfIndex(cents, assignCells(corpus, idCol, vecCol, cents))
  }

  private[operators] def assignCells(corpus: DataFrame, idCol: String, vecCol: String,
                          cents: DataFrame): DataFrame = {
    // CORPUS-side assignment is the one corpus-wide pass of every IVF
    // build/search — r17 (guide §2.4, remove shuffles outright): route it
    // through the window-free argmax expression whenever the cell ids are
    // integral (every index this repo builds), so assignment is a pure
    // per-row codegen'd projection instead of crossJoin + row_number —
    // no corpus shuffle, no sort. Bit-equal by construction (score DESC,
    // cid ASC tie-break both ways) and pinned in SimilaritySpec against
    // [[assignCellsWindow]], which stays as the executable spec (and the
    // fallback for exotic non-integral cell-id tables).
    val integralCid = cents.schema.fields.find(_.name == "cid").exists(f =>
      f.dataType == org.apache.spark.sql.types.LongType ||
        f.dataType == org.apache.spark.sql.types.IntegerType ||
        f.dataType == org.apache.spark.sql.types.ShortType ||
        f.dataType == org.apache.spark.sql.types.ByteType)
    if (integralCid) assignCellsExpr(OpUtil.rebalance(corpus), idCol, vecCol, cents)
    else assignCellsWindow(corpus, idCol, vecCol, cents)
  }

  /** The window formulation of [[assignCells]] (crossJoin + row_number over
    * (cscore DESC, cid ASC)) — kept as the executable spec the expression
    * path is pinned against, and the path for non-integral cell ids. */
  private[graft] def assignCellsWindow(corpus: DataFrame, idCol: String, vecCol: String,
                          cents: DataFrame): DataFrame = {
    val c = OpUtil.rebalance(corpus)
      .select(col(idCol).as("nid"), asDouble(col(vecCol)).as("nvec"))
    rankCells(c, "nid", "nvec", cents).where(col("crank") === 1)
      .select(col("nid"), col("nvec"), col("cid").as("cell"))
  }

  /** Window-free twin of [[assignCells]]: the centroids (collected once —
    * nlist tiny rows) become ONE codegen'd argmax expression
    * (`array_max` over `struct(score, -cid)`), so nearest-cell assignment
    * is a pure per-row projection — legal inside a STREAMING micro-batch
    * (no window function, no crossjoin) and shuffle-free in batch. The
    * tie-break is identical to [[assignCells]]: score DESC, cid ASC
    * (max of `(s, -cid)` picks the higher score, then the lower cid), so
    * the two paths are bit-equal (unit-pinned in SimilaritySpec). */
  def assignCellsExpr(df: DataFrame, idCol: String, vecCol: String,
                      centroids: DataFrame): DataFrame =
    assignCellsExprScored(df, idCol, vecCol, centroids).drop("cscore")

  /** [[assignCellsExpr]] keeping the winning cosine score as `cscore` —
    * the per-row statistic the drift probe aggregates (same single
    * codegen'd argmax; the score is a field of the struct already in
    * hand). */
  private[operators] def assignCellsExprScored(df: DataFrame, idCol: String,
                                               vecCol: String,
                                               centroids: DataFrame): DataFrame = {
    val cents: Array[(Long, Seq[Double])] = centroids
      .select(col("cid").cast("long"), col("cvec").cast("array<double>"))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1)))
    require(cents.nonEmpty, "empty centroid table")
    val v = asDouble(col(vecCol))
    val scored = cents.map { case (cid, cv) =>
      struct(cosine(v, typedlit(cv)).as("s"), lit(-cid).as("nc"))
    }
    val best = array_max(array(scored.toSeq: _*))
    df.select(col(idCol).as("nid"), asDouble(col(vecCol)).as("nvec"),
      (-best.getField("nc")).as("cell"), best.getField("s").as("cscore"))
  }

  /** Embedding-diversity sample: nearest-centroid cell assignment + a seeded
    * uniform draw of `k` rows PER CELL — the cluster-quota corpus draw
    * (SemDeDup/DDC-style pretraining-data curation: uniform-over-corpus
    * oversamples dense regions of embedding space; uniform-over-cells covers
    * every populated region). Returns (cell, idCol).
    *
    * Scale shape: assignment is [[assignCellsExpr]]'s single codegen'd
    * argmax projection (centroids ride the plan as literals — no join, no
    * shuffle), and the per-cell draw is the bounded-state top-k aggregate
    * ([[Sampling.sampleKPerGroup]] — O(k) state per cell per partition,
    * map-side partials), so the whole draw is one narrow pass + one
    * nlist-key aggregate regardless of corpus size. Deterministic: same
    * centroids + seed => same sample on any cluster layout.
    *
    * Same distinct-id precondition as [[Sampling.sampleKPerGroup]]. */
  def diverseSample(corpus: DataFrame, idCol: String, vecCol: String,
                    cents: Array[Array[Double]], k: Int, seed: Int = 0): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val cdf = cents.zipWithIndex.map { case (v, i) => (i.toLong, v.toSeq) }.toSeq
      .toDF("cid", "cvec")
    val cells = assignCellsExpr(corpus, idCol, vecCol, cdf)
      .select(col("cell"), col("nid").as(idCol))
    Sampling.sampleKPerGroup(cells, Seq("cell"), idCol, k, seed)
  }

  /** Build the [[IvfIndex]]: k-means coarse quantizer ([[kmeansCentroids]])
    * + one broadcast assignment pass over the corpus. */
  def buildIvfIndex(corpus: DataFrame, idCol: String, vecCol: String,
                    nlist: Int = 16, sampleN: Int = 4096, iters: Int = 5): IvfIndex = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val cents = kmeansCentroids(corpus, idCol, vecCol, nlist, sampleN, iters)
      .zipWithIndex.map { case (v, i) => (i.toLong, v.toSeq) }.toSeq
      .toDF("cid", "cvec")
    IvfIndex(cents, assignCells(corpus, idCol, vecCol, cents))
  }

  /** Search a prebuilt [[IvfIndex]]: rank the query against the (broadcast)
    * centroids, probe the top `nprobe` cells, score exactly, top-k. The
    * corpus is touched only through `index.cells`, pruned by the cell
    * equi-join. */
  def searchIvfIndex(index: IvfIndex, queries: DataFrame, idCol: String,
                     vecCol: String, k: Int, nprobe: Int = 4): DataFrame = {
    val q = queries.select(col(idCol).as("qid"), asDouble(col(vecCol)).as("qvec"))
    val probes = rankCells(q, "qid", "qvec", index.centroids)
      .where(col("crank") <= nprobe)
      .select(col("qid"), col("qvec"), col("cid").as("cell"))
    ivfSearch(index.cells, probes, k)
  }

  /** Persist an [[IvfIndex]] as ordinary parquet tables: tiny `centroids`
    * plus `cells` PARTITIONED BY `cell` — the on-disk layout that makes a
    * probe read only its cells' files (hive-style `cell=N/` directories =
    * static partition pruning at planning time, no data-file I/O for
    * unprobed cells). Build once at write time, search many times.
    *
    * The cells tree is registered in the index's [[IndexCommit]] pointer
    * log, which is what makes every later maintenance op ([[appendToIvfIndex]]
    * / [[compactIvfIndex]]) transactional; a REBUILD into a live index dir
    * commits a fresh versioned tree, so concurrent searches keep their
    * snapshot until [[vacuumIvfIndex]]. */
  def writeIvfIndex(index: IvfIndex, dir: String): Unit = {
    // every sidecar is written BEFORE the pointer flip under a
    // generation-unique name (bare on a first build, fresh-suffixed on a
    // REBUILD into a live index), and the commit carries the names — so a
    // reader resolving one committed snapshot can never pair this build's
    // centroids/params with another generation's cells trees
    // (IndexCommit.ReadSnapshot), and old snapshots keep their sidecars
    // until vacuum
    val centName = IndexCommit.sidecarName(dir, "centroids")
    val paramsName = IndexCommit.sidecarName(dir, "params")
    val driftName = IndexCommit.sidecarName(dir, "drift")
    index.centroids.write.mode("overwrite").parquet(s"$dir/$centName")
    // tiny params sidecar: the id column's type, so an append can cast to
    // it WITHOUT schema-inferring the (ever-growing) cells tree — a
    // type-forked nid (INT vs BIGINT footers under one inferred schema)
    // breaks every subsequent vectorized read
    val spark = index.cells.sparkSession
    import spark.implicits._
    Seq(index.cells.schema("nid").dataType.catalogString)
      .toDF("id_type").write.mode("overwrite").parquet(s"$dir/$paramsName")
    // drift baseline: the build corpus's per-cell assignment quality (mean
    // cosine of each member to its centroid — one broadcast join + one
    // nlist-key aggregate over rows already materialized above). Appends
    // compare their batch against this to answer "has the corpus drifted
    // from the quantizer?" from SQL ([[ivfDrift]]).
    val cents = index.centroids
      .select(col("cid"), col("cvec").cast("array<double>").as("cvec"))
    index.cells.join(broadcast(cents), index.cells("cell") === cents("cid"))
      .groupBy(col("cell"))
      .agg(count(lit(1)).as("n"),
        avg(cosine(col("nvec"), col("cvec"))).as("mean_score"))
      .write.mode("overwrite").parquet(s"$dir/$driftName")
    IndexCommit.commitBase(dir, "cells", Map("centroids" -> centName,
        "params" -> paramsName, "drift" -> driftName)) { tree =>
      index.cells.write.mode("overwrite").partitionBy("cell").parquet(tree)
    }
  }

  /** One committed snapshot of the IVF index — trees AND sidecars resolved
    * from the same state (legacy bare names for pre-pointer indexes). */
  private def ivfSnapshot(dir: String): IndexCommit.ReadSnapshot =
    IndexCommit.readSnapshot(dir, "cells")

  /** The persisted id type, from the snapshot's params sidecar when present
    * (indexes written since the sidecar existed) else one cells schema
    * inference. */
  private def persistedIdType(spark: SparkSession,
                              snap: IndexCommit.ReadSnapshot): String =
    try spark.read.parquet(snap.sidecar("params")).collect().head.getString(0)
    catch { case scala.util.control.NonFatal(_) =>
      spark.read.parquet(snap.dirs.head)
        .schema("nid").dataType.catalogString
    }

  /** FAISS `IVFIndex.add()` for the persisted index: assign NEW vectors to
    * the EXISTING centroids and APPEND their cell rows under the
    * partitioned layout — the coarse quantizer is fixed at build time (the
    * standard IVF maintenance contract: adding does not re-train; re-train
    * by rebuilding when the corpus distribution drifts), so a 100 TB
    * pipeline ingesting embeddings daily extends the index with one
    * narrow, shuffle-free pass over the new batch
    * ([[assignCellsExpr]] — centroids ride the plan as literals; legal
    * inside a streaming micro-batch too) instead of re-clustering the
    * corpus. Probes ([[searchIvfIndexAt]]) see old and new rows alike,
    * with the same planner-time partition pruning. Repeated small appends
    * grow one delta tree per call — [[compactIvfIndex]] folds them back to
    * one file per cell.
    *
    * The append is TRANSACTIONAL ([[IndexCommit.appendTree]]): the batch
    * lands as an immutable delta tree made visible by one CAS'd pointer
    * commit — a crash before the commit leaves the index exactly as it
    * was (plus one orphan tree for [[vacuumIvfIndex]]), and a `batchId`
    * (pass the `foreachBatch` batch id) makes retried/duplicated
    * micro-batch delivery append exactly once at the INDEX level: a batch
    * id already in the committed state is skipped, returning false. */
  def appendToIvfIndex(spark: SparkSession, dir: String, newVecs: DataFrame,
                       idCol: String, vecCol: String,
                       batchId: Option[String] = None): Boolean = {
    // reads ONLY the tiny centroids + params tables — never the cells tree,
    // whose file listing grows with every prior append (the per-micro-batch
    // cost in the foreachBatch deployment must not scale with index age).
    // The id cast pins the persisted column type: a caller whose id column
    // is INT must not fork an INT64 index's footers. Sidecars resolve
    // through ONE snapshot whose generation fences the commit below: a
    // REBUILD landing after this read aborts the append instead of letting
    // stale-centroid assignments onto the new index.
    val snap = ivfSnapshot(dir)
    val cents = spark.read.parquet(snap.sidecar("centroids"))
    val typed = newVecs.withColumn(idCol,
      col(idCol).cast(persistedIdType(spark, snap)))
    // materialize the scored assignment ONCE: the tree write and the drift
    // aggregate both read it (OpUtil.shared), so the batch is chunked and
    // argmax'd a single time
    val scored = OpUtil.shared(
      assignCellsExprScored(typed, idCol, vecCol, cents))
    // the drift statistic: this batch's mean assignment cosine, recorded
    // in the append commit's info map — one bounded aggregate over rows
    // already in hand; [[ivfDrift]] compares it to the build baseline
    val stat = scored.agg(count(lit(1)), avg(col("cscore"))).collect().head
    val info = Map(
      "batch_n" -> stat.getLong(0).toString,
      "batch_mean_score" ->
        (if (stat.isNullAt(1)) "NaN" else stat.getDouble(1).toString))
    IndexCommit.appendTree(spark, dir, "cells", batchId, info,
        derivedFromBase = if (snap.version >= 0) Some(snap.baseVersion) else None) { tree =>
      scored.drop("cscore")
        .write.mode("overwrite").partitionBy("cell").parquet(tree)
    }
  }

  /** The operator's answer to "when should this index re-train?": one row
    * per append commit, comparing the batch's mean assignment cosine
    * (recorded in the commit's info map at append time) against the BUILD
    * corpus's baseline (the `drift/` sidecar [[writeIvfIndex]] persists).
    * `drift` = baseline − batch mean: near 0 for batches drawn from the
    * build distribution, clearly positive when the corpus has moved away
    * from the fixed quantizer (vectors land far from every centroid).
    * Surfaced in SQL as `graft_sim_index_drift('dir')`. Pre-drift-sidecar
    * indexes report a null baseline. Driver-side O(#commits) — commits
    * are per-maintenance-op. */
  def ivfDrift(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types._
    val snap = ivfSnapshot(dir)
    val base: Option[Double] =
      try {
        val r = spark.read.parquet(snap.sidecar("drift"))
          .agg(sum(col("mean_score") * col("n")) / sum(col("n")))
          .collect().head
        if (r.isNullAt(0)) None else Some(r.getDouble(0))
      } catch { case scala.util.control.NonFatal(_) => None }
    val rows = IndexCommit.history(dir)
      .filter(e => e.kind == "append" && e.info.contains("batch_mean_score"))
      // the baseline is THIS generation's build corpus: appends subsumed by
      // a rebuild compare against a quantizer that no longer serves them —
      // drop them rather than report drift against the wrong baseline
      // (pre-generation logs carry baseVersion 0 on every entry, so this
      // filter is a no-op there)
      .filter(_.baseVersion == snap.baseVersion)
      .map { e =>
        val mean = e.info("batch_mean_score").toDouble
        org.apache.spark.sql.Row(e.version,
          e.info.get("batch_n").map(_.toLong).getOrElse(0L),
          mean,
          base.map(java.lang.Double.valueOf).orNull,
          base.map(b => java.lang.Double.valueOf(b - mean)).orNull)
      }
    val schema = StructType(Seq(
      StructField("version", LongType, nullable = false),
      StructField("batch_n", LongType, nullable = false),
      StructField("batch_mean_score", DoubleType, nullable = false),
      StructField("base_mean_score", DoubleType, nullable = true),
      StructField("drift", DoubleType, nullable = true)))
    spark.createDataFrame(
      scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava, schema)
  }

  /** Compact a persisted index's cells layout back to ONE file per cell —
    * the maintenance pass that bounds [[appendToIvfIndex]]'s small-file /
    * delta-tree growth (probe cost grows with file count, not row count,
    * once files are small). Row content is untouched, so search results
    * are identical before and after (oracle-pinned).
    *
    * READER-TRANSPARENT ([[IndexCommit.compactTrees]]): the merged tree is
    * written beside the live trees and made visible by one CAS'd pointer
    * commit — a search planned at any moment reads a consistent committed
    * snapshot, no quiesce window; delta trees a rival appends DURING the
    * rewrite survive in the committed set. A crash at any point leaves the
    * pointer on the pre-compact version. Superseded trees stay on disk for
    * in-flight readers until [[vacuumIvfIndex]]. */
  def compactIvfIndex(spark: SparkSession, dir: String): Unit = {
    // pre-pointer recovery: an r11-format index left mid-swap by the OLD
    // rename-based compact (cells missing, cells-old present) is restored
    // before the pointer log bootstraps around `cells/`
    def p(s: String) = new org.apache.hadoop.fs.Path(s)
    val fs = p(dir).getFileSystem(spark.sessionState.newHadoopConf())
    if (IndexCommit.load(dir).isEmpty &&
        !fs.exists(p(s"$dir/cells")) && fs.exists(p(s"$dir/cells-old")))
      require(fs.rename(p(s"$dir/cells-old"), p(s"$dir/cells")),
        s"compact: cannot recover $dir/cells-old back to $dir/cells")
    IndexCommit.compactTrees(spark, dir, "cells") { (srcs, target) =>
      // one shuffle keyed by cell: partitionBy then splits the (few) cells
      // sharing a hash partition into one file per cell directory
      readCellTrees(spark, srcs).repartition(col("cell"))
        .write.mode("overwrite").partitionBy("cell").parquet(target)
    }
  }

  /** Reclaim cells trees superseded by [[compactIvfIndex]] (and orphans
    * from crashed maintenance) that no committed reader can reach — see
    * [[IndexCommit.vacuum]] for the grace-period contract. */
  def vacuumIvfIndex(spark: SparkSession, dir: String,
                     graceMs: Long = 0L): Seq[String] =
    IndexCommit.vacuum(spark, dir, "cells", graceMs)

  /** Union of cells trees under one schema with the partition column's
    * inferred type corrected to LONG (directory VALUES with small cids
    * infer INT, and a pruning filter must compare the partition column
    * un-cast). Trees share one write path, so the non-partition columns
    * agree by construction. */
  private def readCellTrees(spark: SparkSession, dirs: Seq[String]): DataFrame = {
    import org.apache.spark.sql.types.{LongType, StructType}
    val inferred = IndexCommit.inferAcross(spark, dirs).getOrElse(
      spark.read.parquet(dirs.head).schema) // all-empty: surface Spark's error
    val fixed = StructType(inferred.map {
      case f if f.name == "cell" => f.copy(dataType = LongType)
      case f => f
    })
    dirs.map(d => spark.read.schema(fixed).parquet(d)).reduce(_.unionByName(_))
  }

  /** Open a persisted index: centroids + the union of live cells trees
    * resolved through the commit pointer — one committed snapshot, stable
    * under concurrent maintenance. */
  def readIvfIndex(spark: SparkSession, dir: String,
                   version: Option[Long] = None): IvfIndex = {
    val snap = IndexCommit.readSnapshot(dir, "cells", version)
    IvfIndex(spark.read.parquet(snap.sidecar("centroids")),
      readCellTrees(spark, snap.dirs))
  }

  /** Search a PERSISTED index with guaranteed partition pruning: the
    * distinct probed cells (bounded by `nlist`, never by the query count —
    * a legal driver collect) become a static `isin` filter on the partition
    * column, so the cells scan plans over exactly the probed `cell=N/`
    * directories (`inputFiles`-pinned in SimilaritySpec). Results are
    * bit-identical to [[searchIvfIndex]] on the in-memory index. */
  def searchIvfIndexAt(spark: SparkSession, dir: String, queries: DataFrame,
                       idCol: String, vecCol: String, k: Int,
                       nprobe: Int = 4,
                       version: Option[Long] = None): DataFrame = {
    val index = readIvfIndex(spark, dir, version)
    val q = queries.select(col(idCol).as("qid"), asDouble(col(vecCol)).as("qvec"))
    val probes = rankCells(q, "qid", "qvec", index.centroids)
      .where(col("crank") <= nprobe)
      .select(col("qid"), col("qvec"), col("cid").as("cell"))
    val probed = probes.select("cell").distinct().collect().map(_.getLong(0))
    ivfSearch(index.cells.where(col("cell").isin(probed.toSeq: _*)), probes, k)
  }

  /** Materialized hyperplane-LSH index: the corpus exploded to one row per
    * (table, bucket) membership — a plain DataFrame, persistable
    * partitioned/bucketed by `(tbl, bucket)` so search co-locates on the
    * bucket key. The hyperplanes are derived deterministically from
    * (table, plane, dim) ([[rademacherWeights]]), so an index built
    * yesterday answers queries bucketed today — no weight state to store
    * beyond the three ints. */
  final case class LshIndex(buckets: DataFrame, dim: Int, planes: Int, tables: Int)

  private def lshBucketed(df: DataFrame, ic: String, vc: String,
                          dim: Int, planes: Int, tables: Int): DataFrame =
    df.select(col(ic), col(vc),
      posexplode(array((0 until tables).map(t => lshBucket(col(vc), t, planes, dim)): _*))
        .as(Seq("tbl", "bucket")))

  /** Build the [[LshIndex]]: one projection pass over the corpus. */
  def buildLshIndex(corpus: DataFrame, idCol: String, vecCol: String, dim: Int,
                    planes: Int = 8, tables: Int = 4): LshIndex = {
    val c = OpUtil.rebalance(corpus)
      .select(col(idCol).as("nid"), asDouble(col(vecCol)).as("nvec"))
    LshIndex(lshBucketed(c, "nid", "nvec", dim, planes, tables), dim, planes, tables)
  }

  /** Search a prebuilt [[LshIndex]]: bucket the queries under the same
    * deterministic hyperplanes, candidate equi-join on (table, bucket),
    * exact re-rank. */
  def searchLshIndex(index: LshIndex, queries: DataFrame, idCol: String,
                     vecCol: String, k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("qid"), asDouble(col(vecCol)).as("qvec"))
    val cb = index.buckets
    val qb = lshBucketed(q, "qid", "qvec", index.dim, index.planes, index.tables)
    val cands = cb.join(broadcast(qb),
        cb("tbl") === qb("tbl") && cb("bucket") === qb("bucket") && col("nid") =!= col("qid"))
      .select(col("qid"), col("qvec"), col("nid"), col("nvec"))
      .distinct()
    val scored = cands.select(col("qid"), col("nid"),
      cosine(col("qvec"), col("nvec")).as("score"))
    val w = Window.partitionBy("qid").orderBy(col("score").desc, col("nid").asc)
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select("qid", "nid", "rank", "score")
  }

  /** Persist an [[LshIndex]]'s buckets PARTITIONED BY (tbl, bucket) — the
    * on-disk layout where a probe reads only its buckets' files. The
    * hyperplanes are positionally derived ([[rademacherWeights]]), so only
    * the bucket table needs storing; `dim`/`planes`/`tables` ride a tiny
    * params file. */
  def writeLshIndex(index: LshIndex, dir: String): Unit = {
    val spark = index.buckets.sparkSession
    import spark.implicits._
    // id_type rides the sidecar so appendToLshIndex can cast without
    // schema-inferring the growing buckets tree; the sidecar is written
    // BEFORE the pointer flip under a generation-unique name (see
    // writeIvfIndex) so snapshot readers never mix generations
    val paramsName = IndexCommit.sidecarName(dir, "params")
    Seq((index.dim, index.planes, index.tables,
        index.buckets.schema("nid").dataType.catalogString))
      .toDF("dim", "planes", "tables", "id_type")
      .write.mode("overwrite").parquet(s"$dir/$paramsName")
    IndexCommit.commitBase(dir, "buckets", Map("params" -> paramsName)) { tree =>
      index.buckets.write.mode("overwrite").partitionBy("tbl", "bucket")
        .parquet(tree)
    }
  }

  /** [[appendToIvfIndex]]'s LSH twin — and the easier one: the hyperplanes
    * are POSITIONALLY derived (`rademacherWeights(table, plane, dim)`), so
    * there is no trained state to hold fixed at all — an index built
    * incrementally is BIT-IDENTICAL to one built in a single pass (no
    * quantizer-drift caveat, no df-cap contract). New vectors bucket under
    * the params-sidecar's (dim, planes, tables) and land as an immutable
    * delta tree behind one CAS'd pointer commit — the same transactional /
    * replay-safe contract as [[appendToIvfIndex]] (`batchId` skips an
    * already-applied batch, returning false); [[compactLshIndex]] folds
    * delta-tree growth. */
  def appendToLshIndex(spark: SparkSession, dir: String, newVecs: DataFrame,
                       idCol: String, vecCol: String,
                       batchId: Option[String] = None): Boolean = {
    // params + trees resolve from ONE snapshot; its generation fences the
    // commit (a rebuild landing after this read aborts the append instead
    // of letting old-params buckets onto the new index)
    val snap = IndexCommit.readSnapshot(dir, "buckets")
    val p = spark.read.parquet(snap.sidecar("params")).collect().head
    // by-name sidecar reads: the sidecar schema has evolved once already
    // (id_type added) and positional reads silently misread on the next
    // evolution
    val (dim, planes, tables) = (p.getAs[Int]("dim"),
      p.getAs[Int]("planes"), p.getAs[Int]("tables"))
    // id cast pins the persisted nid type (sidecar since the append API
    // exists; older indexes fall back to one buckets schema inference) —
    // a type-forked column breaks every later vectorized read
    val idType =
      if (p.schema.fieldNames.contains("id_type")) p.getAs[String]("id_type")
      else spark.read.parquet(snap.dirs.head)
        .schema("nid").dataType.catalogString
    val c = newVecs.select(col(idCol).cast(idType).as("nid"),
      asDouble(col(vecCol)).as("nvec"))
    IndexCommit.appendTree(spark, dir, "buckets", batchId,
        derivedFromBase = if (snap.version >= 0) Some(snap.baseVersion) else None) { tree =>
      lshBucketed(c, "nid", "nvec", dim, planes, tables)
        .write.mode("overwrite").partitionBy("tbl", "bucket").parquet(tree)
    }
  }

  /** Fold a persisted LSH index's delta trees back to ONE file per
    * (tbl, bucket) — the rewrite [[appendToLshIndex]]'s contract promises,
    * reader-transparent exactly as [[compactIvfIndex]] (one CAS'd pointer
    * flip, no quiesce window, rival appends survive). Row content is
    * untouched, so search results are identical before and after. */
  def compactLshIndex(spark: SparkSession, dir: String): Unit =
    IndexCommit.compactTrees(spark, dir, "buckets") { (srcs, target) =>
      readBucketTrees(spark, srcs).repartition(col("tbl"), col("bucket"))
        .write.mode("overwrite").partitionBy("tbl", "bucket").parquet(target)
    }

  /** Reclaim superseded/orphaned buckets trees — see [[IndexCommit.vacuum]]
    * for the grace-period contract. */
  def vacuumLshIndex(spark: SparkSession, dir: String,
                     graceMs: Long = 0L): Seq[String] =
    IndexCommit.vacuum(spark, dir, "buckets", graceMs)

  /** Union of buckets trees with the partition columns re-read as INT —
    * the type [[lshBucketed]] produces, so probe filters compare un-cast
    * and pruning engages. */
  private def readBucketTrees(spark: SparkSession, dirs: Seq[String]): DataFrame = {
    import org.apache.spark.sql.types.{IntegerType, StructType}
    val inferred = IndexCommit.inferAcross(spark, dirs).getOrElse(
      spark.read.parquet(dirs.head).schema) // all-empty: surface Spark's error
    val fixed = StructType(inferred.map {
      case f if f.name == "tbl" || f.name == "bucket" =>
        f.copy(dataType = IntegerType)
      case f => f
    })
    dirs.map(d => spark.read.schema(fixed).parquet(d)).reduce(_.unionByName(_))
  }

  /** Open a persisted LSH index: the union of live buckets trees resolved
    * through the commit pointer — one committed snapshot, stable under
    * concurrent maintenance. */
  def readLshIndex(spark: SparkSession, dir: String,
                   version: Option[Long] = None): LshIndex = {
    val snap = IndexCommit.readSnapshot(dir, "buckets", version)
    val p = spark.read.parquet(snap.sidecar("params")).collect().head
    LshIndex(readBucketTrees(spark, snap.dirs),
      p.getAs[Int]("dim"), p.getAs[Int]("planes"), p.getAs[Int]("tables"))
  }

  /** Search a PERSISTED LSH index with guaranteed partition pruning: the
    * distinct probed (tbl, bucket) pairs — bounded by `tables * 2^planes`
    * by construction, never the query count — become a static filter on
    * the partition columns, so the scan plans only the probed
    * `tbl=T/bucket=B/` directories. Results are bit-identical to
    * [[searchLshIndex]] on the in-memory index. */
  def searchLshIndexAt(spark: SparkSession, dir: String, queries: DataFrame,
                       idCol: String, vecCol: String, k: Int,
                       version: Option[Long] = None): DataFrame = {
    val index = readLshIndex(spark, dir, version)
    val q = queries.select(col(idCol).as("qid"), asDouble(col(vecCol)).as("qvec"))
    val qb = lshBucketed(q, "qid", "qvec", index.dim, index.planes, index.tables)
    val probed = qb.select("tbl", "bucket").distinct().collect()
      .map(r => (r.getAs[Number]("tbl").intValue, r.getAs[Number]("bucket").intValue))
    val pruned = index.buckets.where(
      probed.map { case (t, b) => col("tbl") === t && col("bucket") === b }
        .reduceOption(_ || _).getOrElse(lit(false)))
    searchLshIndex(index.copy(buckets = pruned), queries, idCol, vecCol, k)
  }

  /** Approximate top-k via hyperplane LSH: bucket join per table, exact
    * re-rank of candidates. `tables` trades recall for cost. Inline form of
    * [[buildLshIndex]] + [[searchLshIndex]]. */
  def hyperplaneLshTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
                        vecCol: String, k: Int, dim: Int,
                        planes: Int = 8, tables: Int = 4): DataFrame =
    searchLshIndex(buildLshIndex(corpus, idCol, vecCol, dim, planes, tables),
      queries, idCol, vecCol, k)

  // ------------------------------------------------------------------ PQ

  /** Squared L2 distance with the same left fold every other scalar here
    * uses: `(((0 + t1) + t2) + ...)` over `(a[i]-b[i])^2` terms — and since
    * every term is `>= +0.0`, the fold equals the oracle's init-free
    * `list_reduce` bit-for-bit. */
  private def sqDist(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0.0), _ + _)

  /** Deterministic per-subspace codebooks for product quantization: the
    * vector splits into `m` contiguous subvectors of `dim/m` components and
    * each subspace trains its own `ksub`-centroid quantizer — storage per
    * vector drops from `dim` floats to `m` small codes (m=8, ksub=16 turns a
    * 64-float embedding into 8 nibbles: 64× smaller, the compression that
    * makes a 100 TB embedding corpus scannable). Training mirrors
    * [[kmeansCentroids]]'s determinism contract: bounded sample (`sampleN`
    * lowest ids — a top-k by id, never a full collect), init = the sample's
    * first `ksub` subvectors, fixed `iters` Lloyd iterations under plain
    * squared L2 (PQ quantizes raw subvectors — no normalization), empty
    * cells keep their previous centroid, sequential accumulation. Repeated
    * runs produce identical literals, so the codebooks can be spliced into
    * generated oracle SQL like the IVF centroids. Returns
    * `books(j)(c) = centroid c of subspace j`. */
  def pqCodebooks(corpus: DataFrame, idCol: String, vecCol: String,
                  m: Int = 8, ksub: Int = 16, sampleN: Int = 4096,
                  iters: Int = 5): Array[Array[Array[Double]]] = {
    val sample: Array[Array[Double]] = corpus
      .select(col(idCol).as("id"), asDouble(col(vecCol)).as("v"))
      .orderBy("id").limit(sampleN)
      .collect().map(_.getSeq[Double](1).toArray)
    require(sample.length >= ksub, s"sample ${sample.length} < ksub $ksub")
    val dim = sample.head.length
    require(dim % m == 0, s"dim $dim not divisible by m $m")
    val dsub = dim / m
    Array.tabulate(m) { j =>
      val pts = sample.map(v => java.util.Arrays.copyOfRange(v, j * dsub, (j + 1) * dsub))
      var cents = pts.take(ksub).map(_.clone)
      for (_ <- 0 until iters) {
        val sums = Array.fill(ksub, dsub)(0.0)
        val counts = new Array[Long](ksub)
        pts.foreach { v =>
          var best = 0; var bestD = Double.MaxValue
          for (c <- 0 until ksub) {
            var d = 0.0; var i = 0
            while (i < dsub) { val t = v(i) - cents(c)(i); d += t * t; i += 1 }
            if (d < bestD) { bestD = d; best = c }
          }
          var i = 0
          while (i < dsub) { sums(best)(i) += v(i); i += 1 }
          counts(best) += 1
        }
        cents = Array.tabulate(ksub) { c =>
          if (counts(c) == 0) cents(c) else sums(c).map(_ / counts(c))
        }
      }
      cents
    }
  }

  /** The PQ code array for vector column `v`: per subspace, the 0-based id
    * of the nearest centroid (squared L2; ties to the lowest id via
    * first-match `array_position`). */
  private def pqCodesCol(books: Array[Array[Array[Double]]], v: Column): Column = {
    val dsub = books(0)(0).length
    array(books.indices.map { j =>
      val bookLit = typedlit(books(j).map(_.toSeq).toSeq)
      val sub = slice(v, j * dsub + 1, dsub)
      val dists = transform(bookLit, c => sqDist(sub, c))
      (array_position(dists, array_min(dists)) - 1).cast("int")
    }: _*)
  }

  /** A query's ADC distance table: `dt(j)(c)` = exact squared subspace
    * distance from `v`'s j-th subvector to centroid c of subspace j. */
  private def pqDistTableCol(books: Array[Array[Array[Double]]], v: Column): Column = {
    val dsub = books(0)(0).length
    array(books.indices.map { j =>
      val bookLit = typedlit(books(j).map(_.toSeq).toSeq)
      val sub = slice(v, j * dsub + 1, dsub)
      transform(bookLit, c => sqDist(sub, c))
    }: _*)
  }

  /** ADC score from a code array and a distance table: m lookups + adds in
    * fixed order (every term >= +0.0, so the zero-seeded fold is oracle-
    * reproducible). */
  private def adcCol(codes: Column, dt: Column): Column =
    aggregate(zip_with(codes, dt, (cd, t) => element_at(t, cd + 1)),
      lit(0.0), _ + _)

  /** Encode vectors against [[pqCodebooks]]: one shuffle-free codegen'd
    * projection — the write-path compression pass; persist `(id, codes)` as
    * the searchable corpus. Emits `(idCol, codes array<int>)`. */
  def pqEncode(corpus: DataFrame, idCol: String, vecCol: String,
               books: Array[Array[Array[Double]]]): DataFrame =
    corpus.select(col(idCol), pqCodesCol(books, asDouble(col(vecCol))).as("codes"))

  /** Reconstruct the quantized vector (concatenated per-subspace centroids) —
    * the decode side of [[pqEncode]], for re-rank-free consumers and for the
    * reconstruction-quality unit pin. Adds `v_approx array<double>`. */
  def pqDecode(codes: DataFrame, books: Array[Array[Array[Double]]],
               codesCol: String = "codes"): DataFrame = {
    val booksLit = typedlit(books.map(_.map(_.toSeq).toSeq).toSeq)
    codes.withColumn("v_approx",
      flatten(zip_with(col(codesCol), booksLit,
        (cd, book) => element_at(book, cd + 1))))
  }

  /** Asymmetric-distance (ADC) top-k over PQ codes: each query precomputes
    * one `m × ksub` table of exact subspace distances, and scoring a corpus
    * vector is `m` table lookups + adds over its codes — never a touch of
    * the original floats. `adist(q, x) = Σ_j ||q_j - books(j)(codes_j)||²`,
    * i.e. the exact squared L2 between the query and the RECONSTRUCTED
    * vector (the classic PQ approximation), folded in fixed order so an
    * independent engine reproduces it bit-for-bit.
    *
    * Plan shape: queries (with their distance tables) broadcast, the codes
    * relation streams through one scan — the same shape as
    * [[bruteForceTopK]], but the scan side carries `m` ints per row instead
    * of `dim` floats (the 100 TB lever: a full-corpus ADC sweep reads ~3%
    * of the bytes). For sublinear candidate generation compose with the IVF
    * cells ([[buildIvfIndex]]): search only the probed cells' codes — the
    * standard IVF-PQ split. Emits `(qid, nid, rank, adist)`, ascending
    * distance, ties to the lower id. */
  def pqTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
             vecCol: String, k: Int,
             books: Array[Array[Array[Double]]]): DataFrame =
    pqSearchCodes(
      pqEncode(OpUtil.rebalance(corpus), idCol, vecCol, books)
        .select(col(idCol).as("nid"), col("codes")),
      queries, idCol, vecCol, k, books)

  /** ADC search over an ALREADY-ENCODED corpus `(nid, codes)` — the
    * search-many half of [[buildPqIndex]]. */
  private def pqSearchCodes(codes: DataFrame, queries: DataFrame, idCol: String,
                            vecCol: String, k: Int,
                            books: Array[Array[Array[Double]]]): DataFrame = {
    val q = queries.select(col(idCol).as("qid"),
      pqDistTableCol(books, asDouble(col(vecCol))).as("dt"))
    val scored = codes.join(broadcast(q), col("nid") =!= col("qid"))
      .select(col("qid"), col("nid"), adcCol(col("codes"), col("dt")).as("adist"))
    val w = Window.partitionBy("qid").orderBy(col("adist").asc, col("nid").asc)
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select("qid", "nid", "rank", "adist")
  }

  /** Materialized PQ index — build once at WRITE time, search many times.
    * Both members are plain DataFrames, so the index persists as ordinary
    * tables: [[PqIndex.codes]] is the compressed corpus (`m` ints per
    * vector — the only thing a search scans), [[PqIndex.books]] the tiny
    * codebook table `(j, c, cvec)` that reloads into literals. */
  final case class PqIndex(books: DataFrame, codes: DataFrame)

  /** Codebooks as a persistable DataFrame `(j, c, cvec)`. */
  def pqBooksToDF(spark: org.apache.spark.sql.SparkSession,
                  books: Array[Array[Array[Double]]]): DataFrame = {
    import spark.implicits._
    (for { j <- books.indices; c <- books(j).indices }
      yield (j, c, books(j)(c).toSeq)).toDF("j", "c", "cvec")
  }

  /** Reload persisted codebooks into the literal form the search plans
    * splice in. Requires the dense (j, c) grid [[pqBooksToDF]] wrote. */
  def pqBooksFromDF(books: DataFrame): Array[Array[Array[Double]]] = {
    val rows = books.select("j", "c", "cvec").collect()
      .map(r => ((r.getInt(0), r.getInt(1)), r.getSeq[Double](2).toArray)).toMap
    val m = rows.keys.map(_._1).max + 1
    val ksub = rows.keys.map(_._2).max + 1
    require(rows.size == m * ksub, s"codebook grid not dense: ${rows.size} != $m*$ksub")
    Array.tabulate(m, ksub)((j, c) => rows((j, c)))
  }

  /** Build the [[PqIndex]]: train codebooks, encode the corpus once. */
  def buildPqIndex(corpus: DataFrame, idCol: String, vecCol: String,
                   m: Int = 8, ksub: Int = 16, sampleN: Int = 4096,
                   iters: Int = 5): PqIndex = {
    val books = pqCodebooks(corpus, idCol, vecCol, m, ksub, sampleN, iters)
    PqIndex(pqBooksToDF(corpus.sparkSession, books),
      pqEncode(OpUtil.rebalance(corpus), idCol, vecCol, books)
        .select(col(idCol).as("nid"), col("codes")))
  }

  /** Search a prebuilt [[PqIndex]]: reload the codebooks, ADC-score the
    * persisted codes. Equal to the inline [[pqTopK]] (unit-pinned through a
    * parquet round trip). */
  def searchPqIndex(index: PqIndex, queries: DataFrame, idCol: String,
                    vecCol: String, k: Int): DataFrame =
    pqSearchCodes(index.codes, queries, idCol, vecCol, k,
      pqBooksFromDF(index.books))

  /** Persist a [[PqIndex]] as the FIFTH transactional index family: a
    * `codes/` tree behind an [[IndexCommit]] pointer (append/compact/
    * vacuum/time-travel like the IVF/LSH/MinHash/media layouts) with the
    * codebooks + id-type riding generation-named sidecars. No partition
    * columns — ADC is deliberately a full sweep over `m` ints per vector
    * (the compression IS the 100 TB lever; for sublinear probing compose
    * with IVF cells, [[ivfPqTopK]]). */
  def writePqIndex(index: PqIndex, dir: String): Unit = {
    val booksName = IndexCommit.sidecarName(dir, "books")
    val paramsName = IndexCommit.sidecarName(dir, "params")
    index.books.write.mode("overwrite").parquet(s"$dir/$booksName")
    val spark = index.codes.sparkSession
    import spark.implicits._
    Seq(index.codes.schema("nid").dataType.catalogString)
      .toDF("id_type").write.mode("overwrite").parquet(s"$dir/$paramsName")
    IndexCommit.commitBase(dir, "codes",
        Map("books" -> booksName, "params" -> paramsName)) { tree =>
      index.codes.write.mode("overwrite").parquet(tree)
    }
  }

  /** Union of codes trees under one schema (a committed tree can be
    * legitimately empty and carry no footers — infer from the first that
    * has one). */
  private def readCodeTrees(spark: SparkSession, dirs: Seq[String]): DataFrame = {
    val schema = IndexCommit.inferAcross(spark, dirs).getOrElse(
      spark.read.parquet(dirs.head).schema) // all-empty: surface Spark's error
    dirs.map(d => spark.read.schema(schema).parquet(d)).reduce(_.unionByName(_))
  }

  /** Open a persisted PQ index — books and codes resolved from ONE
    * committed snapshot (optionally a PAST one: time travel, valid until
    * [[vacuumPqIndex]]). */
  def readPqIndex(spark: SparkSession, dir: String,
                  version: Option[Long] = None): PqIndex = {
    val snap = IndexCommit.readSnapshot(dir, "codes", version)
    PqIndex(spark.read.parquet(snap.sidecar("books")),
      readCodeTrees(spark, snap.dirs))
  }

  /** [[appendToIvfIndex]]'s PQ twin: encode NEW vectors with the EXISTING
    * codebooks (fixed at build time — the FAISS add() contract; re-train by
    * rebuilding when the corpus distribution drifts) and land them as an
    * immutable delta tree behind one CAS'd pointer commit. Encoding is
    * deterministic per row, so an incrementally-extended index ADC-scores
    * BIT-IDENTICALLY to a one-pass encode of the union under the same
    * books. `batchId` replays are skipped (returns false); a rebuild
    * landing mid-append aborts on the generation fence (rows encoded with
    * superseded books must not mix into the new index). */
  def appendToPqIndex(spark: SparkSession, dir: String, newVecs: DataFrame,
                      idCol: String, vecCol: String,
                      batchId: Option[String] = None): Boolean = {
    val snap = IndexCommit.readSnapshot(dir, "codes")
    val books = pqBooksFromDF(spark.read.parquet(snap.sidecar("books")))
    val idType =
      try spark.read.parquet(snap.sidecar("params")).collect().head.getString(0)
      catch { case scala.util.control.NonFatal(_) =>
        spark.read.parquet(snap.dirs.head).schema("nid").dataType.catalogString
      }
    val typed = newVecs.withColumn(idCol, col(idCol).cast(idType))
    val slice = pqEncode(typed, idCol, vecCol, books)
      .select(col(idCol).as("nid"), col("codes"))
    IndexCommit.appendTree(spark, dir, "codes", batchId,
        derivedFromBase = if (snap.version >= 0) Some(snap.baseVersion) else None) { tree =>
      slice.write.mode("overwrite").parquet(tree)
    }
  }

  /** Fold a persisted PQ index's delta trees back to ONE tree —
    * reader-transparent (one CAS'd pointer flip, rival appends survive).
    * Row content untouched, so searches are identical before and after. */
  def compactPqIndex(spark: SparkSession, dir: String): Unit =
    IndexCommit.compactTrees(spark, dir, "codes") { (srcs, target) =>
      readCodeTrees(spark, srcs).write.mode("overwrite").parquet(target)
    }

  /** Reclaim superseded/orphaned codes trees + sidecar generations — see
    * [[IndexCommit.vacuum]] for the grace-period contract. */
  def vacuumPqIndex(spark: SparkSession, dir: String,
                    graceMs: Long = 0L): Seq[String] =
    IndexCommit.vacuum(spark, dir, "codes", graceMs)

  /** ADC top-k over a PERSISTED PQ index; `version` pins the search to a
    * past commit (time travel). Results are bit-identical to
    * [[searchPqIndex]] on the equivalent in-memory index. */
  def searchPqIndexAt(spark: SparkSession, dir: String, queries: DataFrame,
                      idCol: String, vecCol: String, k: Int,
                      version: Option[Long] = None): DataFrame =
    searchPqIndex(readPqIndex(spark, dir, version), queries, idCol, vecCol, k)

  /** IVF-PQ — the standard billion-scale ANN split, both halves composed:
    * the IVF coarse quantizer PRUNES (a query touches only its `nprobe`
    * nearest cells' rows, sublinear candidate generation) and PQ codes
    * COMPRESS what those cells store (`m` small codes per vector; scoring
    * is ADC table lookups, never float math over the corpus). Cell
    * assignment is the same deterministic cosine rank as the IVF family;
    * candidates come from a cell equi-join (probes broadcast — no
    * nested-loop over the corpus), and each corpus vector lives in exactly
    * one cell, so no dedup pass is needed. With `nprobe = nlist` this
    * equals [[pqTopK]]'s full ADC sweep bit-for-bit (law unit-pinned);
    * smaller `nprobe` trades recall for touching `nprobe/nlist` of the
    * corpus. Emits `(qid, nid, rank, adist)`. */
  def ivfPqTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
                vecCol: String, k: Int, cents: Array[Array[Double]],
                books: Array[Array[Array[Double]]], nprobe: Int = 4): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val cdf = cents.zipWithIndex.map { case (v, i) => (i.toLong, v.toSeq) }.toSeq
      .toDF("cid", "cvec")
    val cells = assignCells(corpus, idCol, vecCol, cdf)
    val codes = cells.select(col("nid"), col("cell"),
      pqCodesCol(books, col("nvec")).as("codes"))
    // dt computed in the query projection (once per query), then riding the
    // bounded centroid cross join into the probe rows
    val q = queries.select(col(idCol).as("qid"), asDouble(col(vecCol)).as("qvec"),
      pqDistTableCol(books, asDouble(col(vecCol))).as("dt"))
    val probes = rankCells(q, "qid", "qvec", cdf)
      .where(col("crank") <= nprobe)
      .select(col("qid"), col("cid").as("cell"), col("dt"))
    val scored = codes.join(broadcast(probes), Seq("cell"))
      .where(col("nid") =!= col("qid"))
      .select(col("qid"), col("nid"), adcCol(col("codes"), col("dt")).as("adist"))
    val w = Window.partitionBy("qid").orderBy(col("adist").asc, col("nid").asc)
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select("qid", "nid", "rank", "adist")
  }

  // --------------------------------------------------- persisted IVF-PQ

  /** Persist the composed IVF-PQ index — the billion-scale ANN deployment
    * shape (FAISS `IndexIVFPQ` on disk): `(nid, codes)` rows PARTITIONED
    * BY their IVF cell, so a search PRUNES to its `nprobe` cells'
    * directories at planning time AND scores `m` small ints per vector
    * (never the floats) — sublinear candidate generation times ~30×
    * compression, the two levers multiplied. Centroids, codebooks, and
    * id-type ride generation-named sidecars behind the same
    * [[IndexCommit]] pointer as every other family (transactional
    * append/compact/vacuum, time travel, rebuild fencing). */
  def writeIvfPqIndex(corpus: DataFrame, idCol: String, vecCol: String,
                      dir: String, cents: Array[Array[Double]],
                      books: Array[Array[Array[Double]]]): Unit = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val cdf = cents.zipWithIndex.map { case (v, i) => (i.toLong, v.toSeq) }.toSeq
      .toDF("cid", "cvec")
    val centName = IndexCommit.sidecarName(dir, "centroids")
    val booksName = IndexCommit.sidecarName(dir, "books")
    val paramsName = IndexCommit.sidecarName(dir, "params")
    cdf.write.mode("overwrite").parquet(s"$dir/$centName")
    pqBooksToDF(spark, books).write.mode("overwrite").parquet(s"$dir/$booksName")
    Seq(corpus.schema(idCol).dataType.catalogString)
      .toDF("id_type").write.mode("overwrite").parquet(s"$dir/$paramsName")
    IndexCommit.commitBase(dir, "pqcells", Map("centroids" -> centName,
        "books" -> booksName, "params" -> paramsName)) { tree =>
      assignCells(corpus, idCol, vecCol, cdf)
        .select(col("nid"), pqCodesCol(books, col("nvec")).as("codes"), col("cell"))
        .write.mode("overwrite").partitionBy("cell").parquet(tree)
    }
  }

  /** Union of pqcells trees with the partition column re-read as LONG (the
    * [[assignCells]] cell id type, so probe filters prune un-cast). */
  private def readPqCellTrees(spark: SparkSession, dirs: Seq[String]): DataFrame = {
    import org.apache.spark.sql.types.{LongType, StructType}
    val inferred = IndexCommit.inferAcross(spark, dirs).getOrElse(
      spark.read.parquet(dirs.head).schema)
    val fixed = StructType(inferred.map {
      case f if f.name == "cell" => f.copy(dataType = LongType)
      case f => f
    })
    dirs.map(d => spark.read.schema(fixed).parquet(d)).reduce(_.unionByName(_))
  }

  /** [[appendToIvfIndex]] and [[appendToPqIndex]] composed: assign NEW
    * vectors to the EXISTING centroids and encode them with the EXISTING
    * codebooks (both fixed at build — the FAISS add() contract twice
    * over), landing one replay-guarded, rebuild-fenced delta tree. Reads
    * only the tiny sidecars, never the growing cells listing; both the
    * assignment and the encoding are deterministic per row, so the
    * extended index searches BIT-IDENTICALLY to a one-pass build over the
    * union under the same quantizers. */
  def appendToIvfPqIndex(spark: SparkSession, dir: String, newVecs: DataFrame,
                         idCol: String, vecCol: String,
                         batchId: Option[String] = None): Boolean = {
    val snap = IndexCommit.readSnapshot(dir, "pqcells")
    val cdf = spark.read.parquet(snap.sidecar("centroids"))
    val books = pqBooksFromDF(spark.read.parquet(snap.sidecar("books")))
    val idType =
      try spark.read.parquet(snap.sidecar("params")).collect().head.getString(0)
      catch { case scala.util.control.NonFatal(_) =>
        spark.read.parquet(snap.dirs.head).schema("nid").dataType.catalogString
      }
    val typed = newVecs.withColumn(idCol, col(idCol).cast(idType))
    val slice = assignCellsExpr(typed, idCol, vecCol, cdf)
      .select(col("nid"), pqCodesCol(books, col("nvec")).as("codes"), col("cell"))
    IndexCommit.appendTree(spark, dir, "pqcells", batchId,
        derivedFromBase = if (snap.version >= 0) Some(snap.baseVersion) else None) { tree =>
      slice.write.mode("overwrite").partitionBy("cell").parquet(tree)
    }
  }

  /** Fold a persisted IVF-PQ index back to ONE file per cell —
    * reader-transparent, search-invariant (one CAS'd pointer flip). */
  def compactIvfPqIndex(spark: SparkSession, dir: String): Unit =
    IndexCommit.compactTrees(spark, dir, "pqcells") { (srcs, target) =>
      readPqCellTrees(spark, srcs).repartition(col("cell"))
        .write.mode("overwrite").partitionBy("cell").parquet(target)
    }

  /** Reclaim superseded/orphaned pqcells trees + sidecar generations. */
  def vacuumIvfPqIndex(spark: SparkSession, dir: String,
                       graceMs: Long = 0L): Seq[String] =
    IndexCommit.vacuum(spark, dir, "pqcells", graceMs)

  /** Search a PERSISTED IVF-PQ index: the query ranks the (broadcast)
    * centroids, its `nprobe` cells push as a static partition filter
    * (bounded by nlist, never query count), and ADC scores only those
    * cells' codes. Bit-identical to the inline [[ivfPqTopK]] under the
    * same quantizers; `version` pins a past commit (time travel). */
  def searchIvfPqIndexAt(spark: SparkSession, dir: String, queries: DataFrame,
                         idCol: String, vecCol: String, k: Int,
                         nprobe: Int = 4,
                         version: Option[Long] = None): DataFrame = {
    val snap = IndexCommit.readSnapshot(dir, "pqcells", version)
    val cdf = spark.read.parquet(snap.sidecar("centroids"))
    val books = pqBooksFromDF(spark.read.parquet(snap.sidecar("books")))
    val q = queries.select(col(idCol).as("qid"), asDouble(col(vecCol)).as("qvec"),
      pqDistTableCol(books, asDouble(col(vecCol))).as("dt"))
    val probes = rankCells(q, "qid", "qvec", cdf)
      .where(col("crank") <= nprobe)
      .select(col("qid"), col("cid").as("cell"), col("dt"))
    val probed = probes.select("cell").distinct().collect().map(_.getLong(0))
    val codes = readPqCellTrees(spark, snap.dirs)
      .where(col("cell").isin(probed.toSeq: _*))
    val scored = codes.join(broadcast(probes), Seq("cell"))
      .where(col("nid") =!= col("qid"))
      .select(col("qid"), col("nid"), adcCol(col("codes"), col("dt")).as("adist"))
    val w = Window.partitionBy("qid").orderBy(col("adist").asc, col("nid").asc)
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select("qid", "nid", "rank", "adist")
  }
}
