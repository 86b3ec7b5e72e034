package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.eslog.EsLog
import graft.functions.Portable
import graft.operators.Similarity
import graft.sql.{GraftFunctions, GraftSqlExtensions}

/** SQL surface: graft functions callable from `spark.sql` text, registered
  * either on a live session ([[GraftFunctions.register]]) or at session build
  * via `spark.sql.extensions` ([[GraftSqlExtensions]]). Every SQL result is
  * checked against the DataFrame-API formulation it mirrors. */
class GraftSqlSpec extends SparkTestBase {

  override def beforeAll(): Unit = {
    super.beforeAll()
    GraftFunctions.register(spark)
    spark.read.parquet(sf("embeddings")).createOrReplaceTempView("emb_sql")
  }

  test("graft_dot / graft_cosine match the DataFrame formulations") {
    val viaSql = spark.sql(
      """SELECT vec_id, graft_dot(embedding, embedding) AS d,
        |       graft_cosine(embedding, embedding) AS c
        |FROM emb_sql WHERE vec_id < 50""".stripMargin).collect()
    val emb = spark.read.parquet(sf("embeddings")).where(col("vec_id") < 50)
    val viaDf = emb.select(col("vec_id"),
        Similarity.dot(col("embedding"), col("embedding")).as("d"),
        Similarity.cosine(col("embedding"), col("embedding")).as("c"))
      .collect()
    val sqlMap = viaSql.map(r => r.getLong(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    viaDf.foreach { r =>
      val (d, c) = sqlMap(r.getLong(0))
      assert(d == r.getDouble(1), "dot must be bit-identical")
      assert(c == r.getDouble(2), "cosine must be bit-identical")
    }
    assert(viaDf.nonEmpty && viaSql.length == viaDf.length)
  }

  test("graft_hash60 matches Portable.hash60, both arities") {
    val viaSql = spark.sql(
      """SELECT vec_id, graft_hash60(CAST(vec_id AS STRING)) AS h,
        |       graft_hash60(7, CAST(vec_id AS STRING)) AS hs
        |FROM emb_sql WHERE vec_id < 20""".stripMargin).collect()
    val viaDf = spark.read.parquet(sf("embeddings")).where(col("vec_id") < 20)
      .select(col("vec_id"),
        Portable.hash60(col("vec_id").cast("string")).as("h"),
        Portable.hash60(7, col("vec_id").cast("string")).as("hs"))
      .collect()
    assert(viaSql.map(_.toSeq).toSet == viaDf.map(_.toSeq).toSet)
  }

  test("graft_lsh_bucket matches Similarity.lshBucket") {
    val viaSql = spark.sql(
      "SELECT vec_id, graft_lsh_bucket(embedding, 2, 8, 64) AS b FROM emb_sql")
      .collect()
    val viaDf = spark.read.parquet(sf("embeddings"))
      .select(col("vec_id"), Similarity.lshBucket(col("embedding"), 2, 8, 64).as("b"))
      .collect()
    assert(viaSql.map(_.toSeq).toSet == viaDf.map(_.toSeq).toSet)
  }

  test("graft_rproject matches Similarity.randomProject, composes with graft_cosine") {
    val viaSql = spark.sql(
      "SELECT vec_id, graft_rproject(embedding, 16, 64) AS y FROM emb_sql")
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val viaDf = spark.read.parquet(sf("embeddings"))
      .select(col("vec_id"),
        Similarity.randomProject(col("embedding"), outDim = 16, dim = 64).as("y"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(viaSql.keySet == viaDf.keySet)
    viaSql.foreach { case (id, y) => assert(y == viaDf(id), s"vec $id") }
    // composes in-query with the other registered scalars
    val cos = spark.sql(
      """SELECT graft_cosine(graft_rproject(a.embedding, 16, 64),
        |                    graft_rproject(b.embedding, 16, 64)) AS c
        |FROM emb_sql a JOIN emb_sql b ON b.vec_id = a.vec_id + 1
        |WHERE a.vec_id < 5""".stripMargin).collect()
    assert(cos.length == 5 && cos.forall(r => math.abs(r.getDouble(0)) <= 1.0 + 1e-12))
  }

  test("graft_export_objects / graft_export_wal TVFs equal the Scala export surface") {
    val dir = tmpDir("sqlexport-")
    EsLog.create(dir, streamId = 78L)
    EsLog.open(dir, 1L)
    val in = spark.range(300).select(
      col("id"), concat(lit("payload-"), col("id")).cast("binary").as("payload"))
    EsLog.append(spark, dir, in, 1L, sortKey = Some("id"), numPartitions = 4)

    val objSql = spark.sql(
      s"""SELECT count(*) AS n, sum(data_len) AS bytes, min(start_offset) AS lo
         |FROM graft_export_objects('$dir', 0, 9223372036854775807, 4096)""".stripMargin)
      .collect().head
    val objApi = EsLog.exportObjects(spark, dir, maxObjectBytes = 4096)
      .agg(count(lit(1)), sum("data_len"), min("start_offset")).collect().head
    assert(objSql.getLong(0) == objApi.getLong(0) && objSql.getLong(0) > 1)
    assert(objSql.getLong(1) == objApi.getLong(1))
    assert(objSql.getLong(2) == 0L)

    val walSql = spark.sql(
      s"""SELECT count(*) AS n, sum(n_records) AS recs
         |FROM graft_export_wal('$dir', 0, 9223372036854775807, 16384)""".stripMargin)
      .collect().head
    val walApi = EsLog.exportWal(spark, dir, segmentBytes = 16384)
      .agg(count(lit(1)), sum("n_records")).collect().head
    assert(walSql.getLong(0) == walApi.getLong(0) && walSql.getLong(0) > 1)
    assert(walSql.getLong(1) == 300L && walApi.getLong(1) == 300L)

    // pure-SQL migration round trip: bucket-layout files in, new stream out,
    // and the ingest fires at EXECUTION time only
    val objDir = tmpDir("sqlexport-objs-")
    EsLog.exportObjectFiles(spark, dir, objDir, maxObjectBytes = 4096)
    val dst = tmpDir("sqlexport-dst-")
    EsLog.create(dst, streamId = 79L)
    EsLog.open(dst, 1L)
    val stmt = s"SELECT * FROM graft_ingest_objects('$dst', '$objDir', 1)"
    spark.sql(stmt).explain() // analysis + EXPLAIN must not ingest
    assert(EsLog.nextOffset(dst) == 0L, "EXPLAIN must be side-effect-free")
    val res = spark.sql(stmt).collect()
    assert(res.head.getBoolean(1))
    assert(EsLog.scan(spark, dst).count() == 300L)
  }

  test("PCA SQL surface: build procedure (EXPLAIN-safe) + project/describe TVFs equal the Scala path") {
    val dir = tmpDir("sqlpca-") + "/model"
    val stmt = s"SELECT * FROM graft_pca_build('$dir', 'emb_sql', 'vec_id', 'embedding', 8)"
    spark.sql(stmt).explain() // EXPLAIN must not train or write
    assert(!new java.io.File(dir).exists(), "EXPLAIN of a build wrote the model")
    assert(spark.sql(stmt).collect().head.getBoolean(1))
    val viaSql = spark.sql(
      s"SELECT vec_id, proj FROM graft_pca_project('$dir', 'emb_sql', 'vec_id', 'embedding')")
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val m = Similarity.pcaTrain(spark.read.parquet(sf("embeddings")),
      "vec_id", "embedding", k = 8)
    val viaDf = Similarity.pcaProject(spark.read.parquet(sf("embeddings")),
      "vec_id", "embedding", m)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(viaSql.keySet == viaDf.keySet)
    viaSql.foreach { case (id, y) => assert(y == viaDf(id), s"vec $id") }
    val desc = spark.sql(s"SELECT * FROM graft_pca_describe('$dir')").collect()
    assert(desc.length == 8)
    desc.zipWithIndex.foreach { case (r, i) =>
      assert(r.getInt(0) == i)
      assert(r.getDouble(1) == m.explainedVariance(i))
    }
  }

  test("graft_decontaminate / graft_decontaminate_fuzzy equal the Dedup operator path") {
    val docs = spark.read.parquet(sf("documents"))
    docs.createOrReplaceTempView("docs_sql")
    val bench = graft.operators.Sampling.sampleByHash(docs, "doc_id", num = 1, den = 20)
    bench.createOrReplaceTempView("bench_sql")
    val exactSql = spark.sql(
      "SELECT * FROM graft_decontaminate('docs_sql', 'bench_sql', 'doc_id', 'text', 3)")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exactDf = graft.operators.Dedup.decontaminate(docs, bench, "doc_id", "text", k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exactSql == exactDf && exactSql.nonEmpty)
    val fuzzySql = spark.sql(
      "SELECT * FROM graft_decontaminate_fuzzy('docs_sql', 'bench_sql', 'doc_id', 'text')")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val fuzzyDf = graft.operators.Dedup.decontaminateFuzzy(docs, bench, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(fuzzySql == fuzzyDf && fuzzySql.nonEmpty)
    // benchmark members live in the corpus, so each self-matches at 1.0
    val benchIds = bench.select("doc_id").collect().map(_.getLong(0)).toSet
    benchIds.foreach { b =>
      assert(fuzzyDf.exists { case (i, j, jac) => i == b && j == b && jac == 1.0 },
        s"bench doc $b not self-flagged")
    }
  }

  test("graft_bloom_slots matches the Sketch.bloomSketch slot family") {
    import spark.implicits._
    val vals = Seq("alpha", "beta", "gamma").toDF("v")
    vals.createOrReplaceTempView("bloom_vals")
    val viaSql = spark.sql(
      "SELECT v, explode(graft_bloom_slots(v, 1024, 5)) AS slot FROM bloom_vals")
      .select("slot").as[Long].collect().toSet
    val viaOp = graft.operators.Sketch.bloomSketch(vals, col("v"), m = 1024, k = 5)
      .as[Long].collect().toSet
    assert(viaSql == viaOp, s"sql $viaSql vs operator $viaOp")
    assert(viaSql.forall(s => s >= 0 && s < 1024))
  }

  test("graft_kmv aggregate from SQL matches the operator path") {
    Fixtures.tune(spark)
    spark.read.parquet(sf("documents")).createOrReplaceTempView("docs_sql")
    val viaSql = spark.sql(
      """WITH t AS (SELECT lang, explode(split(text, ' ')) AS tok FROM docs_sql)
        |SELECT lang, graft_kmv(graft_hash60(tok), 32) AS ks
        |FROM t WHERE tok <> '' GROUP BY lang""".stripMargin)
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    val docs = spark.read.parquet(sf("documents"))
      .select(col("lang"), explode(split(col("text"), " ")).as("tok"))
      .where(col("tok") =!= "")
    val viaOp = graft.operators.Sketch.kmvKeptHashes(docs, Seq("lang"), col("tok"), 32)
      .groupBy("lang").agg(sort_array(collect_list("_h")).as("ks"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    assert(viaSql.keySet === viaOp.keySet)
    viaSql.keySet.foreach { lang => assert(viaSql(lang) === viaOp(lang), lang) }
  }

  test("graft_hll aggregate from SQL matches the operator path") {
    Fixtures.tune(spark)
    spark.read.parquet(sf("documents")).createOrReplaceTempView("docs_hll_sql")
    // SQL registers -> sparse rows (posexplode, drop zeros), vs the operator
    val viaSql = spark.sql(
      """WITH t AS (SELECT lang, explode(split(text, ' ')) AS tok FROM docs_hll_sql),
        |r AS (SELECT lang, graft_hll(graft_hash60(tok), 6) AS regs
        |      FROM t WHERE tok <> '' GROUP BY lang)
        |SELECT lang, pos AS bucket, col AS rho FROM r
        |LATERAL VIEW posexplode(regs) AS pos, col
        |WHERE col > 0""".stripMargin)
      .collect().map(r => (r.getString(0), r.getInt(1).toLong, r.getInt(2).toLong)).toSet
    val docs = spark.read.parquet(sf("documents"))
      .select(col("lang"), explode(split(col("text"), " ")).as("tok"))
      .where(col("tok") =!= "")
    val viaOp = graft.operators.Sketch.hllSketch(docs, Seq("lang"), col("tok"), p = 6)
      .select("lang", "bucket", "rho")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(viaSql === viaOp)
  }

  test("graft_topk aggregate from SQL matches the sampler path") {
    Fixtures.tune(spark)
    spark.read.parquet(sf("documents")).createOrReplaceTempView("docs_topk")
    val viaSql = spark.sql(
      """SELECT lang, transform(
        |  graft_topk(graft_hash60(7, CAST(doc_id AS STRING)), doc_id, 20), e -> e.v) AS ids
        |FROM docs_topk GROUP BY lang""".stripMargin)
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1).toSet).toMap
    val viaOp = graft.operators.Sampling.sampleKPerGroup(
        spark.read.parquet(sf("documents")), Seq("lang"), "doc_id", k = 20, seed = 7)
      .groupBy("lang").agg(collect_set("doc_id").as("ids"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1).toSet).toMap
    assert(viaSql === viaOp)
  }

  test("graft_quantile_sample aggregate from SQL matches the operator path") {
    Fixtures.tune(spark)
    spark.read.parquet(sf("documents")).createOrReplaceTempView("docs_qs")
    val viaSql = spark.sql(
      """SELECT lang,
        |  graft_quantile_sample(graft_hash60(CAST(doc_id AS STRING)),
        |                        CAST(length(text) AS BIGINT), 64) AS vals
        |FROM docs_qs GROUP BY lang""".stripMargin)
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    // operator path emits rank reads; compare the p0/p1000 reads against the
    // SQL array's endpoints and the p500 read against its middle rank
    val viaOp = graft.operators.Stats.quantilesSample(
        spark.read.parquet(sf("documents"))
          .select(col("lang"), col("doc_id").cast("string").as("rk"),
            length(col("text")).cast("long").as("v")),
        Seq("lang"), col("rk"), col("v"), k = 64, permille = Seq(0, 500, 1000))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    viaSql.foreach { case (lang, vals) =>
      val n = vals.size
      assert(viaOp((lang, 0L)) === vals.head, s"$lang p0")
      assert(viaOp((lang, 500L)) === vals((n - 1) / 2), s"$lang p500")
      assert(viaOp((lang, 1000L)) === vals.last, s"$lang p1000")
    }
  }

  test("bad calls fail at analysis: wrong arity, non-literal config args") {
    intercept[Exception] { spark.sql("SELECT graft_dot(array(1.0d))").collect() }
    intercept[Exception] {
      spark.sql("SELECT graft_lsh_bucket(embedding, vec_id, 8, 64) FROM emb_sql").collect()
    }
  }

  test("graft_scan / graft_fetch TVFs read an eslog stream from SQL") {
    val dir = tmpDir("sqltvf-")
    EsLog.create(dir, streamId = 77L)
    EsLog.open(dir, 1L)
    val in = spark.range(300).select(
      col("id"), col("id").cast("string").cast("binary").as("payload"))
    EsLog.append(spark, dir, in, 1L, sortKey = Some("id"), numPartitions = 4)

    val scanned = spark.sql(s"SELECT count(*) AS n FROM graft_scan('$dir')").collect()
    assert(scanned.head.getLong(0) == 300)

    // TVF output composes with the registered scalar functions and the rest
    // of the query (filter, aggregate) like any relation
    val fetched = spark.sql(
      s"""SELECT count(*) AS n, min(base_offset) AS lo, max(base_offset) AS hi
         |FROM graft_fetch('$dir', 100, 200)""".stripMargin).collect().head
    val direct = EsLog.fetch(spark, dir, 100, 200)
      .agg(count(lit(1)), min("base_offset"), max("base_offset")).collect().head
    assert(fetched.getLong(0) == direct.getLong(0))
    assert(fetched.getLong(1) == direct.getLong(1))
    assert(fetched.getLong(2) == direct.getLong(2))

    val hist = spark.sql(s"SELECT count(*) AS n FROM graft_history('$dir')").collect()
    assert(hist.head.getLong(0) >= 3) // create + open + append

    // time travel from SQL: scan the snapshot BEFORE a second append
    val v = spark.sql(s"SELECT max(version) FROM graft_history('$dir')")
      .collect().head.getLong(0)
    EsLog.append(spark, dir, spark.range(50).select(
      col("id"), col("id").cast("string").cast("binary").as("payload")), 1L,
      sortKey = Some("id"), numPartitions = 2)
    assert(spark.sql(s"SELECT count(*) FROM graft_scan('$dir')")
      .collect().head.getLong(0) == 350)
    assert(spark.sql(s"SELECT count(*) FROM graft_scan('$dir', $v)")
      .collect().head.getLong(0) == 300,
      "versioned graft_scan must read the pre-append snapshot")

    // incremental read from SQL: exactly the second append, by offset range
    val v2 = spark.sql(s"SELECT max(version) FROM graft_history('$dir')")
      .collect().head.getLong(0)
    val delta = spark.sql(
      s"SELECT count(*) AS n, min(base_offset) AS lo, max(base_offset) AS hi " +
        s"FROM graft_scan_delta('$dir', $v, $v2)").collect().head
    assert(delta.getLong(0) == 50 && delta.getLong(1) == 300 && delta.getLong(2) == 349,
      s"graft_scan_delta must deliver the second append only: $delta")
    assert(spark.sql(s"SELECT count(*) FROM graft_scan_delta('$dir', $v2, $v2)")
      .collect().head.getLong(0) == 0)

    EsLog.delete(dir)
  }

  test("time-index and consumer-group TVFs: fetch_time, offset_for_time, group offsets") {
    val dir = tmpDir("sqltime-")
    EsLog.create(dir, streamId = 76L)
    EsLog.open(dir, 1L)
    val in = spark.range(400).select(
      col("id"), col("id").cast("string").cast("binary").as("payload"),
      (col("id") * 10L).as("base_timestamp"))
    EsLog.append(spark, dir, in, 1L, sortKey = Some("id"), numPartitions = 4)

    val tw = spark.sql(
      s"""SELECT count(*) AS n, min(base_offset) AS lo, max(base_offset) AS hi
         |FROM graft_fetch_time('$dir', 1000, 2000)""".stripMargin).collect().head
    assert(tw.getLong(0) == 100 && tw.getLong(1) == 100 && tw.getLong(2) == 199)

    assert(spark.sql(s"SELECT offset FROM graft_offset_for_time('$dir', 1995)")
      .collect().head.getLong(0) == 200)
    assert(spark.sql(s"SELECT offset FROM graft_offset_for_time('$dir', 99999)")
      .collect().head.getLong(0) == 400) // past newest -> next_offset

    // group position: absent -> (false, start); CAS commit; fenced retry
    val g0 = spark.sql(s"SELECT * FROM graft_group_offset('$dir', 'sqlg')").collect().head
    assert(!g0.getBoolean(1) && g0.getLong(2) == 0L)
    val c1 = spark.sql(
      s"SELECT committed FROM graft_commit_group_offset('$dir', 'sqlg', 250, NULL)")
      .collect().head.getBoolean(0)
    assert(c1)
    val g1 = spark.sql(s"SELECT * FROM graft_group_offset('$dir', 'sqlg')").collect().head
    assert(g1.getBoolean(1) && g1.getLong(2) == 250L)
    // stale expected refuses; position unchanged
    val c2 = spark.sql(
      s"SELECT committed FROM graft_commit_group_offset('$dir', 'sqlg', 300, 99)")
      .collect().head.getBoolean(0)
    assert(!c2)
    assert(EsLog.groupOffset(dir, "sqlg").contains(250L))
    // duplicate commit of the SAME offset = success (idempotent retry rule)
    val c3 = spark.sql(
      s"SELECT committed FROM graft_commit_group_offset('$dir', 'sqlg', 250, NULL)")
      .collect().head.getBoolean(0)
    assert(c3)
    // lag surface: named group, one snapshot (position 250 vs head 400)
    val lag = spark.sql(s"SELECT * FROM graft_group_lag('$dir', 'sqlg')").collect().head
    assert(lag.getString(0) == "sqlg" && lag.getBoolean(1) &&
      lag.getLong(2) == 250L && lag.getLong(3) == 400L && lag.getLong(4) == 150L,
      lag.toString)
    // uncommitted group: the whole backlog, committed=false
    val lag0 = spark.sql(s"SELECT * FROM graft_group_lag('$dir', 'nope')").collect().head
    assert(!lag0.getBoolean(1) && lag0.getLong(2) == 0L && lag0.getLong(4) == 400L)
    // all-groups listing: exactly the committed groups, name-ordered
    EsLog.commitGroupOffset(dir, "another", 400L, None)
    val all = spark.sql(s"SELECT grp, lag FROM graft_group_lag('$dir')").collect()
    assert(all.map(r => (r.getString(0), r.getLong(1))).toSeq ==
      Seq(("another", 0L), ("sqlg", 150L)), all.mkString(","))
    EsLog.delete(dir)
  }

  test("pipeline-operator TVFs: SQL results equal the Scala operator path") {
    import graft.operators.{Dedup, TextOps}
    val docs = Fixtures.documents(spark, "/root/testdata/sf0.001")
    docs.createOrReplaceTempView("sqldocs")
    def rows(df: org.apache.spark.sql.DataFrame): Set[String] =
      df.collect().map(_.toString).toSet
    // temp-view input
    assert(rows(spark.sql("SELECT * FROM graft_dedup_exact('sqldocs', 'doc_id', 'text')"))
      == rows(Dedup.exact(docs, "doc_id", "text")))
    assert(rows(spark.sql(
        "SELECT * FROM graft_dedup_minhash('sqldocs', 'doc_id', 'text', 3, 16, 4)"))
      == rows(Dedup.minHashLshCandidates(docs, "doc_id", "text")))
    assert(rows(spark.sql("SELECT * FROM graft_text_stats('sqldocs', 'doc_id', 'text')"))
      == rows(TextOps.tokenStats(docs, "doc_id", "text")))
    assert(rows(spark.sql("SELECT * FROM graft_text_quality('sqldocs', 'doc_id', 'text')"))
      == rows(TextOps.qualityScore(docs, "doc_id", "text")))
    assert(rows(spark.sql("SELECT * FROM graft_text_langid('sqldocs', 'doc_id', 'text')"))
      == rows(TextOps.languageId(docs, "doc_id", "text")))
    // parquet-path input resolves the same corpus directly
    assert(spark.sql(
      "SELECT count(*) FROM graft_text_stats('/root/testdata/sf0.001/documents.parquet', 'doc_id', 'text')")
      .collect().head.getLong(0) == docs.count())
    // the media TVF over the binary payload form of the same corpus
    spark.sql("SELECT doc_id AS media_id, CAST(text AS BINARY) AS payload FROM sqldocs")
      .createOrReplaceTempView("sqlmedia")
    assert(rows(spark.sql(
        "SELECT * FROM graft_media_dedup_cdc('sqlmedia', 'media_id', 'payload', 8, 16, 2, 64)"))
      == rows(graft.operators.Multimodal.binaryNearDupsCdc(
          spark.table("sqlmedia"), "media_id", "payload",
          window = 8, divisor = 16, minShared = 2, maxDf = 64)))
    // pipeline TVFs compose directly over an eslog STREAM dir: the path
    // resolves through the metadata log, payload auto-casts to string for
    // the text family
    val sdir = tmpDir("sqlops-stream-")
    EsLog.create(sdir, streamId = 91L); EsLog.open(sdir, 1L)
    EsLog.append(spark, sdir, docs.select(col("doc_id"),
        col("text").cast("binary").as("payload")), epoch = 1L)
    val viaStream = spark.sql(
      s"SELECT * FROM graft_text_stats('$sdir', 'base_offset', 'payload')")
    assert(viaStream.count() == docs.count())
    assert(viaStream.agg(sum("n_tokens")).collect().head.getLong(0) ==
      TextOps.tokenStats(docs, "doc_id", "text")
        .agg(sum("n_tokens")).collect().head.getLong(0),
      "stream-dir TVF must see the same corpus")
    EsLog.delete(sdir)
    // composable: TVF output joins like any relation
    val joined = spark.sql(
      """SELECT s.doc_id FROM graft_text_stats('sqldocs', 'doc_id', 'text') s
        |JOIN graft_text_langid('sqldocs', 'doc_id', 'text') l USING (doc_id)
        |WHERE s.n_tokens > 0""".stripMargin).count()
    assert(joined == docs.count())
  }

  test("sampling + ANN probe TVFs: SQL equals the Scala operator path") {
    import graft.operators.{Sampling, Similarity}
    val docs = Fixtures.documents(spark, "/root/testdata/sf0.001")
    docs.createOrReplaceTempView("sqldocs_samp")
    def rows(df: org.apache.spark.sql.DataFrame): Set[String] =
      df.collect().map(_.toString).toSet
    // temperature rebalancing: alpha 0.5 (500 permille), both input forms
    assert(rows(spark.sql(
        "SELECT * FROM graft_sample_temperature('sqldocs_samp', 'doc_id', 'source', 500, 3)"))
      == rows(Sampling.sampleTemperature(docs, "doc_id", "source", 0.5, seed = 3)))
    assert(rows(spark.sql(
        "SELECT * FROM graft_sample_temperature('" + sf("documents") +
          "', 'doc_id', 'source', 0)"))
      == rows(Sampling.sampleTemperature(
          spark.read.parquet(sf("documents")), "doc_id", "source", 0.0)))
    // CCNet quality bucketing
    assert(rows(spark.sql(
        "SELECT * FROM graft_text_lm_buckets('sqldocs_samp', 'doc_id', 'text', 'source')"))
      == rows(graft.operators.TextOps.lmBuckets(docs, "doc_id", "text", "source")))
    // token-budget admission: budgets ride an ordinary relation
    val budgets = (0 until 10).map(i => (s"src$i", 600L))
    import spark.implicits._
    budgets.toDF("source", "budget").createOrReplaceTempView("sql_budgets")
    assert(rows(spark.sql(
        "SELECT * FROM graft_sample_token_budget('sqldocs_samp', 'doc_id', 'text', " +
          "'source', 'sql_budgets', 7)"))
      == rows(Sampling.sampleToTokenBudget(docs, "doc_id", "text", "source",
          budgets, seed = 7)))
    // ANN probe over a PERSISTED partition-pruned IVF index
    val emb = spark.read.parquet(sf("embeddings"))
    val idx = Similarity.buildIvfIndex(emb, "vec_id", "embedding", nlist = 8)
    val root = tmpDir("sqlsim-")
    Similarity.writeIvfIndex(idx, root)
    emb.where(col("vec_id") < 3).createOrReplaceTempView("sql_queries")
    assert(rows(spark.sql(
        s"SELECT * FROM graft_sim_search('$root', 'sql_queries', 'vec_id', 'embedding', 5, 2)"))
      == rows(Similarity.searchIvfIndexAt(spark, root,
          emb.where(col("vec_id") < 3), "vec_id", "embedding", k = 5, nprobe = 2)))
    // composable: the TVF output joins like any relation
    val j = spark.sql(
      s"""SELECT s.qid, count(*) AS n
         |FROM graft_sim_search('$root', 'sql_queries', 'vec_id', 'embedding', 5, 2) s
         |GROUP BY s.qid""".stripMargin).collect()
    assert(j.forall(_.getLong(1) == 5L), j.mkString(","))
    // media probe over a persisted bucket-partitioned chunk library index
    import graft.operators.Multimodal
    val media = docs.select(col("doc_id").as("media_id"),
      col("text").cast("binary").as("payload"))
    val lib = media.where(col("media_id") % 2 === 0)
      .select(col("media_id").as("existing_id"), col("payload"))
    val mroot = tmpDir("sqlmediaidx-")
    Multimodal.writeMediaLibraryIndex(lib, "existing_id", "payload", mroot,
      divisor = 16)
    media.createOrReplaceTempView("sql_incoming")
    assert(rows(spark.sql(
        s"SELECT * FROM graft_media_probe('$mroot', 'sql_incoming', 'media_id', 'payload', 4)"))
      == rows(Multimodal.mediaDedupProbeAt(spark, mroot, media,
          "media_id", "payload", minShared = 4)))
  }

  test("graft_fanout_intent TVF: reports the in-flight span, clears on completion") {
    val src = tmpDir("sqlfanout-src-")
    EsLog.create(src, streamId = 105L); EsLog.open(src, 1L)
    val dst = tmpDir("sqlfanout-dst-")
    EsLog.create(dst, streamId = 106L); EsLog.open(dst, 1L)
    EsLog.append(spark, src, spark.range(10).select(
      col("id"), col("id").cast("string").cast("binary").as("payload")),
      1L, sortKey = Some("id"))
    val none = spark.sql(s"SELECT * FROM graft_fanout_intent('$src', 'g')").collect().head
    assert(!none.getBoolean(0) && none.getLong(1) == -1L && none.getLong(2) == -1L)
    // a crash inside process leaves the intent behind — the TVF surfaces it
    try EsLog.fanOutRun(spark, src, Seq(dst), "g", 1L, None, _ => ()) { (_, _) =>
      throw new RuntimeException("injected")
    } catch { case e: RuntimeException if e.getMessage == "injected" => () }
    val some = spark.sql(s"SELECT * FROM graft_fanout_intent('$src', 'g')").collect().head
    assert(some.getBoolean(0) && some.getLong(1) == 0L && some.getLong(2) == 10L)
    // adopting and completing the intent clears it
    EsLog.fanOutRun(spark, src, Seq(dst), "g", 1L, Some("sk"), _ => ()) { (s, _) =>
      s.select(col("base_offset").as("sk"), col("payload"))
    }
    assert(!spark.sql(s"SELECT * FROM graft_fanout_intent('$src', 'g')")
      .collect().head.getBoolean(0))
    assert(EsLog.nextOffset(dst) == 10L)
  }

  test("graft_catalog_fanout_intents TVF: catalog-wide sweep equals the Scala surface") {
    val root = tmpDir("sqlfanoutcat-")
    val cat = new graft.eslog.EsCatalog(root)
    Seq("a", "b", "dst").foreach(n => cat.createStream(n))
    Seq("a", "b", "dst").foreach(n => EsLog.open(cat.streamDir(n), 1L))
    Seq("a", "b").foreach { n =>
      EsLog.append(spark, cat.streamDir(n), spark.range(6).select(
        col("id"), col("id").cast("string").cast("binary").as("payload")),
        1L, sortKey = Some("id"))
    }
    // intent in flight on 'a' only (crash inside process); 'b' untouched
    try EsLog.fanOutRun(spark, cat.streamDir("a"), Seq(cat.streamDir("dst")),
      "g", 1L, None, _ => ()) { (_, _) => throw new RuntimeException("injected") }
    catch { case e: RuntimeException if e.getMessage == "injected" => () }
    def rows(df: org.apache.spark.sql.DataFrame): Set[String] =
      df.collect().map(_.toString).toSet
    val sql = spark.sql(s"SELECT * FROM graft_catalog_fanout_intents('$root')")
    assert(rows(sql) == rows(cat.fanOutIntents(spark)))
    val got = sql.collect().map(r =>
      (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == Seq(("a", "g", 0L, 6L)), got.toString)
    // completing the adopted intent empties the sweep
    EsLog.fanOutRun(spark, cat.streamDir("a"), Seq(cat.streamDir("dst")),
      "g", 1L, Some("sk"), _ => ()) { (s, _) =>
      s.select(col("base_offset").as("sk"), col("payload"))
    }
    assert(spark.sql(s"SELECT * FROM graft_catalog_fanout_intents('$root')").count() == 0L)
  }

  test("index-maintenance TVFs: add/compact from SQL, searches equal the Scala surface") {
    import graft.operators.{Multimodal, Similarity}
    import spark.implicits._
    def rows(df: org.apache.spark.sql.DataFrame): Set[String] =
      df.collect().map(_.toString).toSet
    // IVF: build on half the vectors, add the rest via SQL, compact via SQL
    val vecs = (0 until 40).map { i =>
      (i.toLong, (0 until 8).map(j => ((i * 31 + j * 7) % 13 - 6).toFloat).toArray)
    }.toDF("vec_id", "embedding")
    val idx = tmpDir("sqlsimadd-")
    Similarity.writeIvfIndex(Similarity.buildIvfIndexSampled(
      vecs.where(col("vec_id") % 2 === 0), "vec_id", "embedding", nlist = 4), idx)
    vecs.where(col("vec_id") % 2 === 1).createOrReplaceTempView("sql_new_vecs")
    val added = spark.sql(
      s"SELECT * FROM graft_sim_index_add('$idx', 'sql_new_vecs', 'vec_id', 'embedding')")
      .collect().head
    assert(added.getString(0) == idx && added.getBoolean(1), added.toString)
    vecs.where(col("vec_id") < 4).createOrReplaceTempView("sql_q_vecs")
    val viaSql = rows(spark.sql(
      s"SELECT * FROM graft_sim_search('$idx', 'sql_q_vecs', 'vec_id', 'embedding', 3, 2)"))
    assert(viaSql == rows(Similarity.searchIvfIndexAt(spark, idx,
      vecs.where(col("vec_id") < 4), "vec_id", "embedding", k = 3, nprobe = 2)))
    val compacted = spark.sql(
      s"SELECT * FROM graft_sim_index_compact('$idx')").collect().head
    assert(compacted.getBoolean(1))
    assert(viaSql == rows(spark.sql(
      s"SELECT * FROM graft_sim_search('$idx', 'sql_q_vecs', 'vec_id', 'embedding', 3, 2)")),
      "compaction must not change SQL search results")
    // media library: add via SQL, probe equals the Scala probe
    val media = (0 until 12).map { i =>
      (i.toLong, (0 until 50).map(j =>
        f"${graft.functions.Portable.md5Long(s"m${i % 6}:$j")}%08x").mkString)
    }.toDF("media_id", "payload")
      .select(col("media_id"), col("payload").cast("binary").as("payload"))
    val mdir = tmpDir("sqlmediaadd-")
    Multimodal.writeMediaLibraryIndex(
      media.where(col("media_id") < 6).withColumnRenamed("media_id", "existing_id"),
      "existing_id", "payload", mdir, divisor = 16)
    media.where(col("media_id") >= 6).createOrReplaceTempView("sql_new_media")
    val madded = spark.sql(
      s"SELECT * FROM graft_media_index_add('$mdir', 'sql_new_media', 'media_id', 'payload')")
      .collect().head
    assert(madded.getString(0) == mdir && madded.getBoolean(1), madded.toString)
    media.createOrReplaceTempView("sql_probe_media")
    assert(rows(spark.sql(
        s"SELECT * FROM graft_media_probe('$mdir', 'sql_probe_media', 'media_id', 'payload', 4)"))
      == rows(Multimodal.mediaDedupProbeAt(spark, mdir, media,
          "media_id", "payload", minShared = 4)))
  }

  test("index-maintenance procedures run at EXECUTION time: EXPLAIN is side-effect-free, batch_id replays skip") {
    import graft.operators.{IndexCommit, Similarity}
    import spark.implicits._
    val vecs = (0 until 40).map { i =>
      (i.toLong, (0 until 8).map(j => ((i * 31 + j * 7) % 13 - 6).toFloat).toArray)
    }.toDF("vec_id", "embedding")
    val idx = tmpDir("sqlproc-")
    Similarity.writeIvfIndex(Similarity.buildIvfIndexSampled(
      vecs.where(col("vec_id") % 2 === 0), "vec_id", "embedding", nlist = 4), idx)
    vecs.where(col("vec_id") % 2 === 1).createOrReplaceTempView("sql_proc_vecs")
    val stmt =
      s"SELECT * FROM graft_sim_index_add('$idx', 'sql_proc_vecs', 'vec_id', 'embedding', 'b1')"
    val v0 = IndexCommit.load(idx).get.version
    // EXPLAIN resolves + plans but never executes: the index must not move
    spark.sql(s"EXPLAIN $stmt").collect()
    spark.sql(s"EXPLAIN EXTENDED $stmt").collect()
    assert(IndexCommit.load(idx).get.version == v0,
      "EXPLAIN of an index-maintenance procedure must be side-effect-free")
    // building the DataFrame (analysis) is also inert; collect() executes
    val df = spark.sql(stmt)
    assert(IndexCommit.load(idx).get.version == v0,
      "analysis of an index-maintenance procedure must be side-effect-free")
    val row = df.collect().head
    assert(row.getString(0) == idx && row.getBoolean(1))
    assert(IndexCommit.load(idx).get.version == v0 + 1)
    // a replayed statement with the same batch_id is skipped: ok = false
    val replay = spark.sql(stmt).collect().head
    assert(!replay.getBoolean(1), "replayed batch_id must report ok=false")
    assert(IndexCommit.load(idx).get.version == v0 + 1)
    // compact procedure: EXPLAIN inert, execution folds to one tree
    val cstmt = s"SELECT * FROM graft_sim_index_compact('$idx')"
    spark.sql(s"EXPLAIN $cstmt").collect()
    assert(IndexCommit.load(idx).get.version == v0 + 1)
    assert(spark.sql(cstmt).collect().head.getBoolean(1))
    assert(IndexCommit.load(idx).get.dirs.size == 1)
    // vacuum procedure reclaims the superseded trees; search still works
    assert(spark.sql(s"SELECT * FROM graft_sim_index_vacuum('$idx')")
      .collect().head.getBoolean(1))
    val live = IndexCommit.load(idx).get.dirs.toSet
    val onDisk = new java.io.File(idx).listFiles()
      .filter(_.isDirectory).map(_.getName)
      .filter(n => n == "cells" || n.startsWith("cells-")).toSet
    assert(onDisk == live, s"vacuum must leave exactly the live trees: $onDisk vs $live")
    vecs.where(col("vec_id") < 4).createOrReplaceTempView("sql_proc_q")
    assert(spark.sql(
      s"SELECT * FROM graft_sim_search('$idx', 'sql_proc_q', 'vec_id', 'embedding', 3, 2)")
      .count() > 0)
  }

  test("dedup index SQL surface: add/compact procedures + pruned probe TVF") {
    import graft.operators.Dedup
    import spark.implicits._
    val docs = (0 until 60).map { i =>
      // four base texts, each present in the indexed (i%3==0) AND probe
      // (i%3==2) slices (gcd(3,4)=1 => both slices cover all i%4 classes)
      (i.toLong, (0 until 30).map(j => s"w${i % 4}t$j").mkString(" "))
    }.toDF("doc_id", "text")
    val dir = tmpDir("sqldedupidx-")
    Dedup.writeMinHashIndex(docs.where(col("doc_id") % 3 === 0),
      "doc_id", "text", dir, nBuckets = 8)
    docs.where(col("doc_id") % 3 === 1).createOrReplaceTempView("sql_dedup_add")
    docs.where(col("doc_id") % 3 === 2).createOrReplaceTempView("sql_dedup_probe")
    val added = spark.sql(
      s"SELECT * FROM graft_dedup_index_add('$dir', 'sql_dedup_add', 'doc_id', 'text', 'b1')")
      .collect().head
    assert(added.getString(0) == dir && added.getBoolean(1))
    assert(!spark.sql(
      s"SELECT * FROM graft_dedup_index_add('$dir', 'sql_dedup_add', 'doc_id', 'text', 'b1')")
      .collect().head.getBoolean(1), "replayed batch_id must report ok=false")
    val viaSql = spark.sql(
      s"SELECT * FROM graft_dedup_probe('$dir', 'sql_dedup_probe', 'doc_id', 'text')")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val viaScala = Dedup.probeMinHashIndexAt(spark, dir,
      docs.where(col("doc_id") % 3 === 2), "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(viaSql == viaScala && viaSql.nonEmpty)
    // TIME TRAVEL from SQL: version 0 = the pre-append index, so the probe
    // must see only base (i%3==0) candidates — no appended (i%3==1) docs
    val atV0 = spark.sql(
      s"SELECT * FROM graft_dedup_probe('$dir', 'sql_dedup_probe', 'doc_id', 'text', 0)")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(atV0.nonEmpty && atV0.forall(_._1 % 3 == 0), atV0.toString)
    assert(atV0 != viaSql && atV0.subsetOf(viaSql))
    assert(spark.sql(s"SELECT * FROM graft_dedup_index_compact('$dir')")
      .collect().head.getBoolean(1))
    assert(spark.sql(
      s"SELECT * FROM graft_dedup_probe('$dir', 'sql_dedup_probe', 'doc_id', 'text')")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet == viaSql,
      "compaction must not change probe results")
    // the index history reads from SQL: base -> append -> compact
    val hist = spark.sql(s"SELECT * FROM graft_index_describe('$dir')")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2),
        r.getInt(3), r.getBoolean(4))).toSeq
    assert(hist.map(h => (h._1, h._2, h._3, h._4)) ==
      Seq((0L, "base", 1, 0), (1L, "append", 2, 1), (2L, "compact", 1, 1)),
      hist.toString)
    assert(hist.count(_._5) == 1 && hist.last._5)
    // vacuum procedure reclaims the superseded sigs trees; probe unchanged
    assert(spark.sql(s"SELECT * FROM graft_dedup_index_vacuum('$dir')")
      .collect().head.getBoolean(1))
    val live = graft.operators.IndexCommit.load(dir).get.dirs.toSet
    val onDisk = new java.io.File(dir).listFiles()
      .filter(_.isDirectory).map(_.getName)
      .filter(n => n == "sigs" || n.startsWith("sigs-")).toSet
    assert(onDisk == live, s"vacuum must leave exactly the live trees: $onDisk vs $live")
    assert(spark.sql(
      s"SELECT * FROM graft_dedup_probe('$dir', 'sql_dedup_probe', 'doc_id', 'text')")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet == viaSql,
      "vacuum must not change probe results")
  }

  test("LSH index SQL surface: add/compact/vacuum procedures + pruned search TVF") {
    import graft.operators.{IndexCommit, Similarity}
    import spark.implicits._
    val vecs = (0 until 48).map { i =>
      (i.toLong, (0 until 8).map(j => ((i * 17 + j * 5) % 11 - 5).toFloat).toArray)
    }.toDF("vec_id", "embedding")
    val dir = tmpDir("sqllshidx-")
    Similarity.writeLshIndex(Similarity.buildLshIndex(
      vecs.where(col("vec_id") % 2 === 0), "vec_id", "embedding",
      dim = 8, planes = 4, tables = 2), dir)
    vecs.where(col("vec_id") % 2 === 1).createOrReplaceTempView("sql_lsh_add")
    val added = spark.sql(
      s"SELECT * FROM graft_lsh_index_add('$dir', 'sql_lsh_add', 'vec_id', 'embedding', 'b1')")
      .collect().head
    assert(added.getString(0) == dir && added.getBoolean(1))
    assert(!spark.sql(
      s"SELECT * FROM graft_lsh_index_add('$dir', 'sql_lsh_add', 'vec_id', 'embedding', 'b1')")
      .collect().head.getBoolean(1), "replayed batch_id must report ok=false")
    // hyperplanes are positionally derived: the incrementally-built index
    // must search bit-identically to a one-pass build over the full corpus
    vecs.where(col("vec_id") < 4).createOrReplaceTempView("sql_lsh_q")
    def res(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val viaSql = res(spark.sql(
      s"SELECT * FROM graft_lsh_search('$dir', 'sql_lsh_q', 'vec_id', 'embedding', 3)"))
    val onePass = res(Similarity.searchLshIndex(
      Similarity.buildLshIndex(vecs, "vec_id", "embedding", dim = 8, planes = 4, tables = 2),
      vecs.where(col("vec_id") < 4), "vec_id", "embedding", 3))
    assert(viaSql == onePass && viaSql.nonEmpty)
    assert(spark.sql(s"SELECT * FROM graft_lsh_index_compact('$dir')")
      .collect().head.getBoolean(1))
    assert(spark.sql(s"SELECT * FROM graft_lsh_index_vacuum('$dir')")
      .collect().head.getBoolean(1))
    val live = IndexCommit.load(dir).get.dirs.toSet
    val onDisk = new java.io.File(dir).listFiles()
      .filter(_.isDirectory).map(_.getName)
      .filter(n => n == "buckets" || n.startsWith("buckets-")).toSet
    assert(onDisk == live, s"vacuum must leave exactly the live trees: $onDisk vs $live")
    assert(res(spark.sql(
      s"SELECT * FROM graft_lsh_search('$dir', 'sql_lsh_q', 'vec_id', 'embedding', 3)"))
      == viaSql, "compact+vacuum must not change search results")
  }

  test("index BUILD from SQL: all four families, results pinned against the Scala surface") {
    import graft.operators.{Dedup, IndexCommit, Multimodal, Similarity}
    import spark.implicits._
    val vecs = (0 until 40).map { i =>
      (i.toLong, (0 until 8).map(j => ((i * 23 + j * 3) % 9 - 4).toFloat).toArray)
    }.toDF("vec_id", "embedding")
    vecs.createOrReplaceTempView("sql_build_vecs")
    vecs.where(col("vec_id") < 4).createOrReplaceTempView("sql_build_q")
    def res(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // IVF: EXPLAIN of the build is inert; the built index searches
    // identically to a Scala-side build (k-means quantizer is deterministic)
    val ivfDir = tmpDir("sqlbuild-ivf-")
    val bstmt =
      s"SELECT * FROM graft_sim_index_build('$ivfDir', 'sql_build_vecs', 'vec_id', 'embedding', 4)"
    spark.sql(s"EXPLAIN $bstmt").collect()
    assert(IndexCommit.load(ivfDir).isEmpty, "EXPLAIN of a build must not create the index")
    assert(spark.sql(bstmt).collect().head.getBoolean(1))
    val scalaIvf = tmpDir("sqlbuild-ivf2-")
    Similarity.writeIvfIndex(Similarity.buildIvfIndex(vecs, "vec_id", "embedding", 4), scalaIvf)
    assert(res(spark.sql(
        s"SELECT * FROM graft_sim_search('$ivfDir', 'sql_build_q', 'vec_id', 'embedding', 3, 2)"))
      == res(Similarity.searchIvfIndexAt(spark, scalaIvf,
          vecs.where(col("vec_id") < 4), "vec_id", "embedding", 3, 2)))
    // LSH
    val lshDir = tmpDir("sqlbuild-lsh-")
    assert(spark.sql(
      s"SELECT * FROM graft_lsh_index_build('$lshDir', 'sql_build_vecs', 'vec_id', 'embedding', 8, 4, 2)")
      .collect().head.getBoolean(1))
    assert(res(spark.sql(
        s"SELECT * FROM graft_lsh_search('$lshDir', 'sql_build_q', 'vec_id', 'embedding', 3)"))
      == res(Similarity.searchLshIndex(
          Similarity.buildLshIndex(vecs, "vec_id", "embedding", dim = 8, planes = 4, tables = 2),
          vecs.where(col("vec_id") < 4), "vec_id", "embedding", 3)))
    // MinHash dedup
    val docs = (0 until 40).map { i =>
      // gcd(2, 3) = 1: both the even (indexed) and odd (probe) slices cover
      // every i%3 text class, so cross-slice candidates exist
      (i.toLong, (0 until 30).map(j => s"w${i % 3}t$j").mkString(" "))
    }.toDF("doc_id", "text")
    docs.where(col("doc_id") % 2 === 0).createOrReplaceTempView("sql_build_docs")
    docs.where(col("doc_id") % 2 === 1).createOrReplaceTempView("sql_build_probe")
    val dDir = tmpDir("sqlbuild-dedup-")
    assert(spark.sql(
      s"SELECT * FROM graft_dedup_index_build('$dDir', 'sql_build_docs', 'doc_id', 'text', 3, 16, 4, 8)")
      .collect().head.getBoolean(1))
    val scalaD = tmpDir("sqlbuild-dedup2-")
    Dedup.writeMinHashIndex(docs.where(col("doc_id") % 2 === 0), "doc_id", "text",
      scalaD, nBuckets = 8)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val viaSql = pairs(spark.sql(
      s"SELECT * FROM graft_dedup_probe('$dDir', 'sql_build_probe', 'doc_id', 'text')"))
    assert(viaSql == pairs(Dedup.probeMinHashIndexAt(spark, scalaD,
      docs.where(col("doc_id") % 2 === 1), "doc_id", "text")) && viaSql.nonEmpty)
    // media chunk library (test divisor for few-hundred-byte payloads)
    val media = (0 until 12).map { i =>
      (i.toLong, (s"hdr$i" + ("pqrs" * 60 + (i % 3).toString) * 2).getBytes("UTF-8"))
    }.toDF("media_id", "payload")
    media.createOrReplaceTempView("sql_build_media")
    val mDir = tmpDir("sqlbuild-media-")
    assert(spark.sql(
      s"SELECT * FROM graft_media_index_build('$mDir', 'sql_build_media', 'media_id', 'payload', 16)")
      .collect().head.getBoolean(1))
    assert(pairs(spark.sql(
        s"SELECT existing, incoming FROM graft_media_probe('$mDir', 'sql_build_media', 'media_id', 'payload', 4)"))
      == pairs(Multimodal.mediaDedupProbeAt(spark, mDir, media,
          "media_id", "payload", minShared = 4)
          .select("existing", "incoming")))
  }

  test("PQ index SQL surface: build/add/compact/vacuum procedures + search TVF") {
    import graft.operators.{IndexCommit, Similarity}
    import spark.implicits._
    val vecs = (0 until 40).map { i =>
      (i.toLong, (0 until 8).map(j => ((i * 13 + j * 7) % 10 - 5).toFloat).toArray)
    }.toDF("vec_id", "embedding")
    vecs.where(col("vec_id") % 2 === 0).createOrReplaceTempView("sql_pq_base")
    vecs.where(col("vec_id") % 2 === 1).createOrReplaceTempView("sql_pq_add")
    vecs.where(col("vec_id") < 4).createOrReplaceTempView("sql_pq_q")
    val dir = tmpDir("sqlpqidx-")
    assert(spark.sql(
      s"SELECT * FROM graft_pq_index_build('$dir', 'sql_pq_base', 'vec_id', 'embedding', 4, 8)")
      .collect().head.getBoolean(1))
    assert(spark.sql(
      s"SELECT * FROM graft_pq_index_add('$dir', 'sql_pq_add', 'vec_id', 'embedding', 'b1')")
      .collect().head.getBoolean(1))
    assert(!spark.sql(
      s"SELECT * FROM graft_pq_index_add('$dir', 'sql_pq_add', 'vec_id', 'embedding', 'b1')")
      .collect().head.getBoolean(1), "replayed batch_id must report ok=false")
    def res(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // bit-equal to a one-pass encode of the union under the base-trained books
    val books = Similarity.pqCodebooks(vecs.where(col("vec_id") % 2 === 0),
      "vec_id", "embedding", m = 4, ksub = 8)
    val viaSql = res(spark.sql(
      s"SELECT * FROM graft_pq_search('$dir', 'sql_pq_q', 'vec_id', 'embedding', 3)"))
    assert(viaSql == res(Similarity.pqTopK(vecs, vecs.where(col("vec_id") < 4),
      "vec_id", "embedding", k = 3, books)) && viaSql.nonEmpty)
    assert(spark.sql(s"SELECT * FROM graft_pq_index_compact('$dir')")
      .collect().head.getBoolean(1))
    assert(spark.sql(s"SELECT * FROM graft_pq_index_vacuum('$dir')")
      .collect().head.getBoolean(1))
    assert(IndexCommit.load(dir).get.dirs.size == 1)
    assert(res(spark.sql(
      s"SELECT * FROM graft_pq_search('$dir', 'sql_pq_q', 'vec_id', 'embedding', 3)"))
      == viaSql, "compact+vacuum must not change search results")
  }

  test("IVF-PQ index SQL surface: build/add/compact/vacuum procedures + pruned search TVF") {
    import graft.operators.{IndexCommit, Similarity}
    import spark.implicits._
    val vecs = (0 until 48).map { i =>
      (i.toLong, (0 until 8).map(j => ((i * 11 + j * 5) % 12 - 6).toFloat).toArray)
    }.toDF("vec_id", "embedding")
    vecs.where(col("vec_id") % 2 === 0).createOrReplaceTempView("sql_ivfpq_base")
    vecs.where(col("vec_id") % 2 === 1).createOrReplaceTempView("sql_ivfpq_add")
    vecs.where(col("vec_id") < 4).createOrReplaceTempView("sql_ivfpq_q")
    val dir = tmpDir("sqlivfpq-")
    assert(spark.sql(
      s"SELECT * FROM graft_ivf_pq_index_build('$dir', 'sql_ivfpq_base', 'vec_id', 'embedding', 4, 4, 8)")
      .collect().head.getBoolean(1))
    assert(spark.sql(
      s"SELECT * FROM graft_ivf_pq_index_add('$dir', 'sql_ivfpq_add', 'vec_id', 'embedding', 'b1')")
      .collect().head.getBoolean(1))
    assert(!spark.sql(
      s"SELECT * FROM graft_ivf_pq_index_add('$dir', 'sql_ivfpq_add', 'vec_id', 'embedding', 'b1')")
      .collect().head.getBoolean(1), "replayed batch_id must report ok=false")
    def res(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // bit-equal to the inline composition under the base-trained quantizers
    val base = vecs.where(col("vec_id") % 2 === 0)
    val cents = Similarity.kmeansCentroids(base, "vec_id", "embedding", nlist = 4)
    val books = Similarity.pqCodebooks(base, "vec_id", "embedding", m = 4, ksub = 8)
    val viaSql = res(spark.sql(
      s"SELECT * FROM graft_ivf_pq_search('$dir', 'sql_ivfpq_q', 'vec_id', 'embedding', 3, 2)"))
    assert(viaSql == res(Similarity.ivfPqTopK(vecs, vecs.where(col("vec_id") < 4),
      "vec_id", "embedding", k = 3, cents, books, nprobe = 2)) && viaSql.nonEmpty)
    assert(spark.sql(s"SELECT * FROM graft_ivf_pq_index_compact('$dir')")
      .collect().head.getBoolean(1))
    assert(spark.sql(s"SELECT * FROM graft_ivf_pq_index_vacuum('$dir')")
      .collect().head.getBoolean(1))
    assert(IndexCommit.load(dir).get.dirs.size == 1)
    assert(res(spark.sql(
      s"SELECT * FROM graft_ivf_pq_search('$dir', 'sql_ivfpq_q', 'vec_id', 'embedding', 3, 2)"))
      == viaSql, "compact+vacuum must not change search results")
  }

  test("graft_symlink_manifest TVF: export from SQL, external read equals scan") {
    val dir = tmpDir("sqlsym-")
    EsLog.create(dir, streamId = 75L)
    EsLog.open(dir, 1L)
    EsLog.append(spark, dir, spark.range(200).select(
      col("id"), col("id").cast("string").cast("binary").as("payload")), 1L,
      sortKey = Some("id"), numPartitions = 2)
    val row = spark.sql(s"SELECT * FROM graft_symlink_manifest('$dir')").collect().head
    assert(row.getString(0) == dir && row.getLong(2) == 2L)
    val files = spark.read.textFile(row.getString(1)).collect().toSeq
    assert(spark.read.parquet(files: _*).count() == 200L)
    EsLog.delete(dir)
  }

  test("pure-SQL stream lifecycle: create -> INSERT INTO -> scan -> describe -> drop") {
    val root = tmpDir("sqlddl-")

    // CREATE (idempotent: re-running the statement returns created=false)
    val c1 = spark.sql(s"SELECT * FROM graft_create_stream('$root', 'sql1')").collect().head
    assert(c1.getString(0) == "sql1" && c1.getBoolean(2), c1.toString)
    val c2 = spark.sql(s"SELECT * FROM graft_create_stream('$root', 'sql1')").collect().head
    assert(c2.getLong(1) == c1.getLong(1) && !c2.getBoolean(2), c2.toString)

    // INSERT: a `USING eslog` catalog table + plain SQL INSERT INTO. The
    // injected resolution rule (EsLogInsertRewrite) routes the rows through
    // the real append path — offset assignment, footer audit, CAS manifest
    // commit — never Spark's raw InsertIntoHadoopFsRelationCommand (which
    // would drop unmanifested part files no scan ever sees).
    val dir = s"$root/streams/sql1"
    spark.sql(s"CREATE TABLE graft_sql_ddl_t USING eslog OPTIONS (path '$dir')")
    try {
      spark.sql("INSERT INTO graft_sql_ddl_t " +
        "SELECT CAST(CAST(id AS STRING) AS BINARY) AS payload FROM range(120)")

      // SCAN: TVF + catalog table read the same committed rows
      assert(spark.sql(s"SELECT count(*) AS n FROM graft_scan('$dir')")
        .collect().head.getLong(0) == 120)
      assert(spark.sql("SELECT count(*) FROM graft_sql_ddl_t")
        .collect().head.getLong(0) == 120)

      // DESCRIBE: offsets reflect the committed append
      val d = spark.sql(s"SELECT * FROM graft_describe_stream('$root', 'sql1')").collect().head
      assert(d.getAs[Long]("next_offset") == 120L && !d.getAs[Boolean]("deleted"), d.toString)

      // a second INSERT appends contiguously (offsets continue at 120)
      spark.sql("INSERT INTO graft_sql_ddl_t " +
        "SELECT CAST(CAST(id AS STRING) AS BINARY) AS payload FROM range(30)")
      val d2 = spark.sql(s"SELECT * FROM graft_describe_stream('$root', 'sql1')").collect().head
      assert(d2.getAs[Long]("next_offset") == 150L, d2.toString)
      assert(spark.sql("SELECT count(*) FROM graft_sql_ddl_t")
        .collect().head.getLong(0) == 150)

      // CLONE from SQL: a deep copy readable through the TVF, source intact
      val cdst = tmpDir("sqlddl-clone-")
      val cl = spark.sql(s"SELECT * FROM graft_clone_stream('$dir', '$cdst/c1')")
        .collect().head
      assert(cl.getAs[Long]("next_offset") == 150L, cl.toString)
      assert(spark.sql(s"SELECT count(*) FROM graft_scan('$cdst/c1')")
        .collect().head.getLong(0) == 150)

      // LIST + combined scan see the stream
      val listed = spark.sql(s"SELECT name FROM graft_list_streams('$root')")
        .collect().map(_.getString(0))
      assert(listed.sameElements(Array("sql1")), listed.mkString(","))
      assert(spark.sql(s"SELECT count(*) FROM graft_catalog_scan('$root')")
        .collect().head.getLong(0) == 150)

      // registry history: the create is visible as a put event with its id
      val hist = spark.sql(
        s"SELECT op, name, stream_id FROM graft_registry_history('$root')")
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      assert(hist.sameElements(Array(("put", "sql1", c1.getLong(1)))), hist.mkString(","))

      // INSERT OVERWRITE would violate append-only — rejected at analysis
      val e = intercept[Exception] {
        spark.sql("INSERT OVERWRITE TABLE graft_sql_ddl_t " +
          "SELECT CAST(CAST(id AS STRING) AS BINARY) AS payload FROM range(5)")
      }
      def msgs(t: Throwable): Seq[String] =
        Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
      assert(msgs(e).exists(_.contains("append-only")), e.toString)
      // a query column the by-name append would silently drop fails analysis
      // instead of committing corrupted rows (ts here would be discarded and
      // base_timestamp default to 0 for every row)
      val e2 = intercept[Exception] {
        spark.sql("INSERT INTO graft_sql_ddl_t " +
          "SELECT CAST(CAST(id AS STRING) AS BINARY) AS payload, id AS ts FROM range(5)")
      }
      assert(msgs(e2).exists(_.contains("unrecognized column")), e2.toString)
      // an explicit column list renames positionally, standard INSERT shape
      spark.sql("INSERT INTO graft_sql_ddl_t (payload, base_timestamp) " +
        "SELECT CAST(CAST(id AS STRING) AS BINARY), id + 7 FROM range(5)")
      assert(spark.sql(s"SELECT count(*) FROM graft_fetch('$dir', 150, 155) " +
        "WHERE base_timestamp >= 7").collect().head.getLong(0) == 5,
        "column-list INSERT must map the second column to base_timestamp")
      // ALTER (UPDATE_STREAM) from SQL: NULL leaves a field unchanged
      val alt = spark.sql(s"SELECT * FROM graft_alter_stream('$root', 'sql1', " +
        "3, 2, 86400000)").collect().head
      assert(alt.getAs[Int]("replica") == 3 && alt.getAs[Int]("ack_count") == 2
        && alt.getAs[Long]("retention_ms") == 86400000L, alt.toString)
      val alt2 = spark.sql(s"SELECT * FROM graft_alter_stream('$root', 'sql1', " +
        "NULL, NULL, 1000)").collect().head
      assert(alt2.getAs[Int]("replica") == 3 && alt2.getAs[Long]("retention_ms") == 1000L,
        s"NULL must leave replica/ack unchanged: $alt2")
      // -1 stays retention's explicit "unlimited" (restorable from SQL)
      val alt3 = spark.sql(s"SELECT * FROM graft_alter_stream('$root', 'sql1', " +
        "NULL, NULL, -1)").collect().head
      assert(alt3.getAs[Long]("retention_ms") == -1L, alt3.toString)
      // a NO-OP alter commits nothing: snapshot ids must not shift
      val vBefore = spark.sql(s"SELECT max(version) FROM graft_history('$dir')")
        .collect().head.getLong(0)
      spark.sql(s"SELECT * FROM graft_alter_stream('$root', 'sql1', " +
        "NULL, NULL, NULL)").collect()
      spark.sql(s"SELECT * FROM graft_alter_stream('$root', 'sql1', " +
        "3, 2, -1)").collect() // values already in effect — also a no-op
      assert(spark.sql(s"SELECT max(version) FROM graft_history('$dir')")
        .collect().head.getLong(0) == vBefore,
        "no-op alters must not append metadata-log commits")
      // an out-of-Int-range replica fails analysis instead of wrapping
      val eOv = intercept[Exception] {
        spark.sql(s"SELECT * FROM graft_alter_stream('$root', 'sql1', " +
          "4294967296, NULL, NULL)").collect()
      }
      assert(Option(eOv.getMessage).exists(m =>
          m.contains("overflow") || m.contains("literal integer")),
        eOv.toString)
      val dAlt = spark.sql(s"SELECT * FROM graft_describe_stream('$root', 'sql1')")
        .collect().head
      assert(dAlt.getAs[Int]("replica") == 3 && dAlt.getAs[Long]("retention_ms") == -1L,
        dAlt.toString)

      // a case-DIFFERING writable column is delivered, never silently
      // clobbered with its default (normalize's presence check is
      // case-insensitive, like Spark's own resolution)
      spark.sql("INSERT INTO graft_sql_ddl_t (payload, FLAGS) " +
        "SELECT CAST(CAST(id AS STRING) AS BINARY), CAST(1 AS SMALLINT) FROM range(3)")
      assert(spark.sql(s"SELECT count(*) FROM graft_fetch('$dir', 155, 158) " +
        "WHERE flags = 1").collect().head.getLong(0) == 3,
        "uppercase FLAGS values must survive the by-name append")
      assert(spark.sql(s"SELECT count(*) FROM graft_scan('$dir')")
        .collect().head.getLong(0) == 158, "failed INSERTs must not have committed rows")
    } finally spark.sql("DROP TABLE IF EXISTS graft_sql_ddl_t")

    // DROP (idempotent)
    assert(spark.sql(s"SELECT * FROM graft_drop_stream('$root', 'sql1')")
      .collect().head.getBoolean(1))
    assert(!spark.sql(s"SELECT * FROM graft_drop_stream('$root', 'sql1')")
      .collect().head.getBoolean(1))
    assert(spark.sql(s"SELECT * FROM graft_list_streams('$root')").collect().isEmpty)
  }

  test("DDL statements: CREATE/ALTER/DESCRIBE/DROP STREAM, SHOW STREAMS round-trip") {
    val root = tmpDir("graft-sql-ddl-")
    // CREATE with options
    val c = spark.sql(
      s"CREATE STREAM ddl1 IN '$root' WITH (retention_ms = 86400000, replica = 3)")
      .collect().head
    assert(c.getString(0) == "ddl1" && c.getBoolean(2))
    // bare CREATE on an existing stream FAILS (real DDL semantics) ...
    intercept[Exception](spark.sql(s"CREATE STREAM ddl1 IN '$root'").collect())
    // ... IF NOT EXISTS is the no-op form
    val c2 = spark.sql(s"CREATE STREAM IF NOT EXISTS ddl1 IN '$root'").collect().head
    assert(!c2.getBoolean(2) && c2.getLong(1) == c.getLong(1))
    // EXPLAIN must NOT create (execution-time side effect — the r12 contract)
    spark.sql(s"EXPLAIN CREATE STREAM ddl_explain_only IN '$root'").collect()
    assert(spark.sql(s"SELECT * FROM graft_list_streams('$root')")
      .collect().map(_.getString(0)).toSet == Set("ddl1"))
    // ALTER SET + DESCRIBE read-back
    spark.sql(s"ALTER STREAM ddl1 IN '$root' SET (retention_ms = 1000)").collect()
    val d = spark.sql(s"DESCRIBE STREAM ddl1 IN '$root'").collect().head
    assert(d.getLong(7) == 1000L && d.getLong(5) == 3L) // retention altered, replica kept
    // SHOW STREAMS
    spark.sql(s"CREATE STREAM ddl2 IN '$root'").collect()
    assert(spark.sql(s"SHOW STREAMS IN '$root'").collect()
      .map(_.getString(0)).toSet == Set("ddl1", "ddl2"))
    // DROP: bare drop of a missing stream fails; IF EXISTS is the no-op form
    assert(spark.sql(s"DROP STREAM ddl2 IN '$root'").collect().head.getBoolean(1))
    intercept[Exception](spark.sql(s"DROP STREAM ddl2 IN '$root'").collect())
    val dr = spark.sql(s"DROP STREAM IF EXISTS ddl2 IN '$root'").collect().head
    assert(!dr.getBoolean(1))
    // ordinary SQL still parses through the delegate
    assert(spark.sql("SELECT 1 + 1 AS two").collect().head.getInt(0) == 2)
  }

  test("session built with spark.sql.extensions=GraftSqlExtensions has the functions") {
    // newSession() shares the SparkContext but NOT the function registry;
    // building a separate session with the extensions class proves the
    // injectFunction path (what a cluster user configures) works end to end.
    val s2 = SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-test")
      .config("spark.sql.extensions", classOf[GraftSqlExtensions].getName)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      val r = s2.sql(
        "SELECT graft_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d").collect()
      assert(r.head.getDouble(0) == 11.0)
    } finally {
      // drop only the session, not the shared context other suites use
      SparkSession.setActiveSession(spark)
      SparkSession.setDefaultSession(spark)
    }
  }

  test("PD migration SQL surface: graft_ingest_pd / graft_export_pd / graft_backfill_objects") {
    import graft.model.PdSnapshot
    import graft.model.PdSnapshot.{PdRange, PdStream}
    import spark.implicits._
    // a source stream whose export bucket will backfill the migrated one
    val src = tmpDir("sqlpd-src-")
    graft.eslog.EsLog.create(src, streamId = 33L)
    graft.eslog.EsLog.open(src, 1L)
    graft.eslog.EsLog.append(spark, src,
      spark.range(120).select(col("id"),
        col("id").cast("string").cast("binary").as("payload")),
      1L, sortKey = Some("id"))
    val objDir = tmpDir("sqlpd-bucket-")
    graft.eslog.EsLog.exportObjectFiles(spark, src, objDir, maxObjectBytes = 2048)
    // the PD dump as a temp view
    PdSnapshot.renderStream(PdStream(33L, 1, 1, -1L), Seq(
      PdRange(33L, 1L, 0, 30L, 90L, Seq.empty),
      PdRange(33L, 2L, 1, 90L, -1L, Seq.empty)))
      .toDF("key", "value").createOrReplaceTempView("pd_dump")
    val catRoot = tmpDir("sqlpd-cat-")
    assert(spark.sql(s"SELECT * FROM graft_ingest_pd('$catRoot', 'pd_dump')")
      .collect().head.getBoolean(1))
    val dst = new graft.eslog.EsCatalog(catRoot).streamDir("pd-33")
    assert(spark.sql(s"SELECT * FROM graft_backfill_objects('$dst', '$objDir', 2)")
      .collect().head.getBoolean(1))
    val st = graft.meta.MetaLog.load(dst)
    assert(st.startOffset == 30L && st.nextOffset == 120L)
    // export twin round-trips: keys in the PD's exact formats
    val keys = spark.sql(s"SELECT key FROM graft_export_pd('$catRoot')")
      .collect().map(_.getString(0))
    assert(keys.contains("streams/00000000000000000033"))
    assert(keys.contains("s/00000000000000000033/ranges/00000000001"))
    // EXPLAIN never mutates: a fresh catalog root stays empty
    val fresh = tmpDir("sqlpd-fresh-")
    spark.sql(s"EXPLAIN SELECT * FROM graft_ingest_pd('$fresh', 'pd_dump')").collect()
    assert(new graft.eslog.EsCatalog(fresh).streamNames().isEmpty)
  }

  test("V2 catalog plugin: name-addressed SELECT/INSERT/SHOW/CREATE/DROP round-trip") {
    val root = tmpDir("es-cat-plugin-")
    spark.conf.set("spark.sql.catalog.es2", classOf[graft.sql.EsCatalogPlugin].getName)
    spark.conf.set("spark.sql.catalog.es2.root", root)
    val cat = new graft.eslog.EsCatalog(root)
    cat.createStream("events")
    val dir = cat.streamDir("events")
    graft.eslog.EsLog.open(dir, 1L)
    import spark.implicits._
    graft.eslog.EsLog.append(spark,  dir,
      (0 until 100).map(i => (s"p$i", Map("k" -> s"v${i % 3}"), i.toLong))
        .toDF("payload", "properties", "base_timestamp"), 1L)

    // SELECT by name — and the plan must be the V1 manifest fast path
    val sel = spark.sql(
      "SELECT base_offset, cast(payload AS STRING) AS p FROM es2.default.events")
    assert(sel.count() == 100)
    assert(sel.where(col("base_offset") === 7).collect().head.getString(1) == "p7")
    val optimized = sel.queryExecution.optimizedPlan.toString
    assert(!optimized.contains("RelationV2"),
      s"catalog read must land on the V1 fast path, got:\n$optimized")
    // pushdown survives the catalog identity: filter reaches parquet
    val pushed = spark.sql(
      "SELECT payload FROM es2.default.events WHERE base_offset = 42")
      .queryExecution.executedPlan.toString
    assert(pushed.contains("PushedFilters") && pushed.contains("base_offset"),
      s"offset filter must push into the scan:\n$pushed")

    // INSERT by name goes through the commit protocol (offsets assigned)
    spark.sql(
      "INSERT INTO es2.default.events SELECT cast('x' AS BINARY) AS payload, map('k','w') AS properties")
    assert(spark.sql("SELECT count(*) FROM es2.default.events").collect().head.getLong(0) == 101)
    assert(graft.meta.MetaLog.load(dir).nextOffset == 101L)
    // overwrite rejected loudly
    val e = intercept[Exception](spark.sql(
      "INSERT OVERWRITE es2.default.events SELECT cast('y' AS BINARY) AS payload"))
    assert(e.getMessage.contains("append-only"))
    // by-name validation still applies (unknown column fails analysis)
    val e2 = intercept[Exception](spark.sql(
      "INSERT INTO es2.default.events SELECT cast('y' AS BINARY) AS nonsense"))
    assert(e2.getMessage.contains("payload"))

    // SHOW TABLES / CREATE / DROP
    assert(spark.sql("SHOW TABLES IN es2.default").collect()
      .map(_.getString(1)).contains("events"))
    spark.sql("CREATE TABLE es2.default.clicks TBLPROPERTIES ('retention_ms'='86400000')")
    assert(cat.getStream("clicks").isDefined)
    assert(graft.meta.MetaLog.load(cat.streamDir("clicks")).retentionMs == 86400000L)
    val e3 = intercept[Exception](spark.sql("CREATE TABLE es2.default.clicks"))
    assert(e3.getMessage.toLowerCase.contains("already exists"))
    spark.sql("DROP TABLE es2.default.clicks")
    assert(cat.getStream("clicks").isEmpty)
    // programmatic and SQL surfaces share ONE registry
    assert(spark.sql("SHOW TABLES IN es2.default").count() == cat.streamNames().size)
  }

  test("V2 catalog plugin: STREAMING read by name through the V1 fallback") {
    val root = tmpDir("es-cat-stream-")
    spark.conf.set("spark.sql.catalog.es3", classOf[graft.sql.EsCatalogPlugin].getName)
    spark.conf.set("spark.sql.catalog.es3.root", root)
    val cat = new graft.eslog.EsCatalog(root)
    cat.createStream("feed")
    val dir = cat.streamDir("feed")
    graft.eslog.EsLog.open(dir, 1L)
    import spark.implicits._
    graft.eslog.EsLog.append(spark, dir,
      (0 until 60).map(i => Tuple1(s"m$i")).toDF("payload"), 1L)
    val ckpt = tmpDir("es-cat-stream-ckpt-")
    val q = spark.readStream.table("es3.default.feed")
      .writeStream.format("memory").queryName("cat_feed")
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    assert(q.awaitTermination(300000))
    val got = spark.sql("SELECT count(*) FROM cat_feed").collect().head.getLong(0)
    assert(got == 60L, s"streaming read by catalog name drained $got of 60 rows")
  }

  test("V2 catalog plugin: ALTER TABLE SET/UNSET TBLPROPERTIES is UPDATE_STREAM") {
    val root = tmpDir("es-cat-alter-")
    spark.conf.set("spark.sql.catalog.es4", classOf[graft.sql.EsCatalogPlugin].getName)
    spark.conf.set("spark.sql.catalog.es4.root", root)
    val cat = new graft.eslog.EsCatalog(root)
    cat.createStream("cfg")
    val dir = cat.streamDir("cfg")
    assert(graft.meta.MetaLog.load(dir).retentionMs == -1L)

    // SET maps replica/ack_count/retention_ms onto the UPDATE_STREAM commit
    spark.sql("ALTER TABLE es4.default.cfg SET TBLPROPERTIES(" +
      "'retention_ms'='86400000', 'replica'='3', 'ack_count'='2')")
    val st = graft.meta.MetaLog.load(dir)
    assert(st.retentionMs == 86400000L && st.replica == 3 && st.ackCount == 2)
    // ... and the STREAM DDL surface sees the same registry state
    val desc = spark.sql(s"DESCRIBE STREAM cfg IN '$root'").collect().head
    assert(desc.getAs[Long]("retention_ms") == 86400000L)
    assert(desc.getAs[Long]("replica") == 3L)

    // UNSET retention restores the unlimited default (-1)
    spark.sql("ALTER TABLE es4.default.cfg UNSET TBLPROPERTIES('retention_ms')")
    assert(graft.meta.MetaLog.load(dir).retentionMs == -1L)

    // unknown property and schema changes throw, never silently ignore
    val e1 = intercept[Exception](spark.sql(
      "ALTER TABLE es4.default.cfg SET TBLPROPERTIES('compression'='zstd')"))
    assert(e1.getMessage.contains("compression"))
    val e2 = intercept[Exception](spark.sql(
      "ALTER TABLE es4.default.cfg ADD COLUMN extra STRING"))
    assert(e2.getMessage.toLowerCase.contains("schema"))
    // missing table fails as NoSuchTable, not NPE
    val e3 = intercept[Exception](spark.sql(
      "ALTER TABLE es4.default.missing SET TBLPROPERTIES('replica'='2')"))
    assert(e3.getMessage.toLowerCase.contains("not") ||
      e3.getMessage.toLowerCase.contains("missing"))
  }

  test("V2 catalog plugin: VERSION AS OF / TIMESTAMP AS OF pin the manifest snapshot") {
    val root = tmpDir("es-cat-tt-")
    spark.conf.set("spark.sql.catalog.es6", classOf[graft.sql.EsCatalogPlugin].getName)
    spark.conf.set("spark.sql.catalog.es6.root", root)
    val cat = new graft.eslog.EsCatalog(root)
    cat.createStream("tt")
    val dir = cat.streamDir("tt")
    graft.eslog.EsLog.open(dir, 1L)
    import spark.implicits._
    // first commit: record timestamps 0..99 ms
    graft.eslog.EsLog.append(spark, dir,
      (0 until 100).map(i => (s"a$i", i.toLong)).toDF("payload", "base_timestamp"), 1L)
    val v1 = graft.meta.MetaLog.latestVersion(dir)
    // second commit: record timestamps 100000..100049 ms
    graft.eslog.EsLog.append(spark, dir,
      (0 until 50).map(i => (s"b$i", 100000L + i)).toDF("payload", "base_timestamp"), 1L)

    // VERSION AS OF sees only the first commit, matching graft_scan('dir', v)
    assert(spark.sql(s"SELECT count(*) FROM es6.default.tt").collect().head.getLong(0) == 150)
    assert(spark.sql(s"SELECT count(*) FROM es6.default.tt VERSION AS OF $v1")
      .collect().head.getLong(0) == 100)
    assert(spark.sql(s"SELECT count(*) FROM graft_scan('$dir', $v1)")
      .collect().head.getLong(0) == 100)
    // identical row set, not just identical counts
    assert(spark.sql(s"SELECT cast(payload AS STRING) p FROM es6.default.tt VERSION AS OF $v1")
      .collect().map(_.getString(0)).sorted.toSeq ===
      spark.sql(s"SELECT cast(payload AS STRING) p FROM graft_scan('$dir', $v1)")
        .collect().map(_.getString(0)).sorted.toSeq)
    // ... and the pinned read still lands on the V1 fast path
    val opt = spark.sql(s"SELECT payload FROM es6.default.tt VERSION AS OF $v1")
      .queryExecution.optimizedPlan.toString
    assert(!opt.contains("RelationV2"), s"pinned read must use the V1 path:\n$opt")

    // TIMESTAMP AS OF is record-time (the fetchByTime clock): a moment
    // between the two commits' record spans resolves to the first snapshot
    assert(spark.sql(
      "SELECT count(*) FROM es6.default.tt TIMESTAMP AS OF '1970-01-01 00:00:30'")
      .collect().head.getLong(0) == 100)
    // ... and after both spans, to the full stream
    assert(spark.sql(
      "SELECT count(*) FROM es6.default.tt TIMESTAMP AS OF '1970-01-01 01:00:00'")
      .collect().head.getLong(0) == 150)
    // before any data: the stream-created-but-empty snapshot (record-time
    // semantics — no committed record has ts <= T, so the table is empty)
    assert(spark.sql(
      "SELECT count(*) FROM es6.default.tt TIMESTAMP AS OF '1969-06-01 00:00:00'")
      .collect().head.getLong(0) == 0)

    // unknown version is loud and names the valid range
    val latest = graft.meta.MetaLog.latestVersion(dir)
    val e1 = intercept[Exception](spark.sql(
      s"SELECT count(*) FROM es6.default.tt VERSION AS OF ${latest + 100}").collect())
    assert(e1.getMessage.contains("unknown version") &&
      e1.getMessage.contains(s"0..$latest"), e1.getMessage)
    // a snapshot is read-only: Spark's own grammar refuses INSERT with a
    // time-travel clause (the fallback rule carries a belt-and-braces guard
    // for any API path that would hand AppendData a pinned table)
    val e2 = intercept[Exception](spark.sql(
      s"INSERT INTO es6.default.tt VERSION AS OF $v1 " +
        "SELECT cast('x' AS BINARY) AS payload"))
    assert(e2.getMessage.toLowerCase.contains("syntax error") ||
      e2.getMessage.toLowerCase.contains("time-travel"), e2.getMessage)

    // ALTER TABLE numeric-property parse failures carry name + expected type
    val e3 = intercept[Exception](spark.sql(
      "ALTER TABLE es6.default.tt SET TBLPROPERTIES('replica'='abc')"))
    assert(e3.getMessage.contains("replica") && e3.getMessage.contains("INT"),
      e3.getMessage)
  }

  test("V2 catalog plugin: writeStream.toTable lands on the epoch-fenced exactly-once sink") {
    val root = tmpDir("es-cat-wstream-")
    spark.conf.set("spark.sql.catalog.es5", classOf[graft.sql.EsCatalogPlugin].getName)
    spark.conf.set("spark.sql.catalog.es5.root", root)
    val cat = new graft.eslog.EsCatalog(root)
    cat.createStream("src")
    cat.createStream("dst")
    val srcDir = cat.streamDir("src")
    graft.eslog.EsLog.open(srcDir, 1L)
    import spark.implicits._
    graft.eslog.EsLog.append(spark, srcDir,
      (0 until 80).map(i => Tuple1(s"w$i")).toDF("payload"), 1L)

    val ckpt = tmpDir("es-cat-wstream-ckpt-")
    def drain(): Unit = {
      val q = spark.readStream.table("es5.default.src")
        .select(col("payload"), col("properties"), col("base_timestamp"))
        .writeStream
        // Spark's V1-fallback toTable requires the writer's format to match
        // the table's provider (writeToV1Table rejects the session default
        // 'parquet' loudly — no silent wrong-sink path exists)
        .format("eslog")
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .toTable("es5.default.dst")
      assert(q.awaitTermination(300000))
    }
    drain()
    val dstDir = cat.streamDir("dst")
    assert(graft.meta.MetaLog.load(dstDir).nextOffset == 80L,
      "first drain must land all 80 rows through the commit protocol")
    // restart on the SAME checkpoint: replayed batches are metadata no-ops
    // (the sink's idempotent-retry semantics) — exactly-once, not at-least-once
    drain()
    assert(graft.meta.MetaLog.load(dstDir).nextOffset == 80L,
      "restart with the same checkpoint must not duplicate rows")
    // the landed bytes read back by catalog name
    assert(spark.sql("SELECT count(*) FROM es5.default.dst")
      .collect().head.getLong(0) == 80L)
  }
}
