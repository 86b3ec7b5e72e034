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
}
