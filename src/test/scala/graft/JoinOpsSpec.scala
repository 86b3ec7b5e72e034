package graft

import org.apache.spark.sql.functions._

import graft.operators.{AsOfJoin, RangeJoin, Sketch}

/** As-of join, range join, and sketch semantics on hand-built corpora where
  * the expected answers are computable by eye, plus the merge laws that make
  * the sketches usable shard-wise at scale. */
class JoinOpsSpec extends SparkTestBase {
  import spark.implicits._

  // ---- as-of join ----

  private def asOfFixture = {
    val left = Seq(
      // (key, time, left id)
      (1L, 100L, 10L), // exact-tie with right at t=100
      (1L, 150L, 11L), // between rights -> latest at 100
      (1L, 99L, 12L),  // before any right with tolerance reach (matches t=50)
      (2L, 500L, 20L), // different key
      (3L, 10L, 30L)   // key with no rights at all
    ).toDF("k", "t", "lid")
    val right = Seq(
      // (key, time, right id, value)
      (1L, 50L, 1L, 0.5),
      (1L, 100L, 2L, 1.0),
      (1L, 100L, 3L, 2.0), // same time as id=2: max id wins
      (1L, 140L, 4L, 3.0),
      (2L, 400L, 5L, 4.0)
    ).toDF("k", "t", "rid", "v")
    (left, right)
  }

  test("asOf: latest at-or-before match, max-id tie-break, missing keys null") {
    val (left, right) = asOfFixture
    val out = AsOfJoin.asOf(left, right, "k", "t", "rid", Seq("v"))
      .orderBy("lid").collect()
    val byLid = out.map(r => r.getAs[Long]("lid") ->
      (Option(r.getAs[java.lang.Long]("matched_rid")), Option(r.getAs[java.lang.Long]("matched_t")))).toMap
    assert(byLid(10L) === ((Some(3L), Some(100L)))) // tie at 100: id 3 > 2
    assert(byLid(11L) === ((Some(4L), Some(140L))))
    assert(byLid(12L) === ((Some(1L), Some(50L))))
    assert(byLid(20L) === ((Some(5L), Some(400L))))
    assert(byLid(30L) === ((None, None)))
    // left row count preserved exactly
    assert(out.length === 5)
  }

  test("asOf: tolerance nulls out stale matches but keeps the row") {
    val (left, right) = asOfFixture
    val out = AsOfJoin.asOf(left, right, "k", "t", "rid", Seq("v"), tolerance = Some(20L))
    assert(out.count() === 5)
    val m = out.collect().map(r => r.getAs[Long]("lid") ->
      Option(r.getAs[java.lang.Long]("matched_rid"))).toMap
    assert(m(10L) === Some(3L))  // distance 0 <= 20
    assert(m(11L) === Some(4L))  // distance 10 <= 20
    assert(m(12L) === None)      // distance 49 > 20
    assert(m(20L) === None)      // distance 100 > 20
  }

  test("asOf plan: one keyed shuffle + window, no join operator at all") {
    val (left, right) = asOfFixture
    val p = AsOfJoin.asOf(left, right, "k", "t", "rid", Seq("v"))
      .queryExecution.executedPlan.toString
    assert(!p.contains("Join"), p)
    assert(p.contains("Window"), p)
  }

  test("streamingEnrich == batch asOf on the offset axis, across awkward chunk sizes") {
    import graft.operators.{AsOfJoin, Enriched, EnrichEvent}
    Fixtures.tune(spark)
    // eslog stream of interleaved probe/dimension rows, offsets = event ids
    val ev = eventsDf
      .where(col("event_type").isin("view", "click"))
    val dir = tmpDir("enrich-")
    graft.eslog.EsLog.create(dir)
    graft.eslog.EsLog.open(dir, 1L)
    graft.eslog.EsLog.append(spark, dir, ev.select(
        col("event_id"),
        col("props").cast("binary").as("payload"),
        map(lit("user_id"), col("user_id").cast("string"),
          lit("event_type"), col("event_type")).as("properties"),
        expr("ts div 1000000").as("base_timestamp")),
      1L, sortKey = Some("event_id"), numPartitions = 4)

    // batch expectation: asOf on the offset axis (offsets are unique and the
    // sides are disjoint, so <= and < coincide). The filtered append relabels
    // offsets contiguously in event_id order — mirror that relabeling here.
    val base = ev.withColumn("offset",
        row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy("event_id")).cast("long") - 1)
      .select(col("user_id"), col("offset"),
        col("event_type"), expr("ts div 1000000").as("t"))
    val views = base.where(col("event_type") === "view").select("user_id", "offset", "t")
    val clicks = base.where(col("event_type") === "click")
      .select(col("user_id"), col("offset"), col("offset").as("rid"), col("t").as("rt"))
    val expect = AsOfJoin.asOf(views, clicks, "user_id", "offset", "rid", Seq("rt"))
      .select(col("user_id"), col("offset"), col("t"),
        col("matched_rid").as("matched_offset"), col("matched_rt").as("matched_t"))
      .as[Enriched].collect().toSet

    // streaming, twice with different (awkward) chunk sizes
    def run(perTrigger: Long, qname: String): Set[Enriched] = {
      val ds = spark.readStream.format("eslog")
        .option("maxOffsetsPerTrigger", perTrigger.toString)
        .load(dir)
        .select(col("properties")("user_id").cast("long").as("user_id"),
          col("base_offset").as("offset"),
          (col("properties")("event_type") === "click").as("is_right"),
          col("base_timestamp").as("t"))
        .as[EnrichEvent]
      val q = AsOfJoin.streamingEnrich(ds).toDF()
        .writeStream.format("memory").queryName(qname)
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination(120000)
      spark.table(qname).as[Enriched].collect().toSet
    }
    val a = run(7L, "enrich_a")
    val b = run(173L, "enrich_b")
    assert(a === expect)
    assert(b === expect)
  }

  // ---- range join ----

  test("pointInInterval matches the naive non-equi join, including edges") {
    val points = Seq((1L, -7L), (1L, 0L), (1L, 5L), (1L, 10L), (1L, 11L), (2L, 5L))
      .toDF("k", "x")
    val intervals = Seq(
      (1L, 100L, 0L, 10L),   // [0,10]
      (1L, 101L, -10L, -5L), // negative range
      (1L, 102L, 7L, 3L),    // inverted: matches nothing
      (2L, 103L, 4L, 6L)
    ).toDF("k", "iid", "lo", "hi")
    val got = RangeJoin.pointInInterval(points, "x", intervals, "lo", "hi",
        bucketWidth = 4L, keyCols = Seq("k"))
      .select("iid", "x").as[(Long, Long)].collect().toSet
    val want = Set((100L, 0L), (100L, 5L), (100L, 10L), (101L, -7L), (103L, 5L))
    assert(got === want)
  }

  test("pointInInterval emits each match exactly once (no bucket dupes)") {
    // interval spanning many buckets; width far smaller than the interval
    val points = (0L until 50L).map(x => (1L, x)).toDF("k", "x")
    val intervals = Seq((1L, 1L, 5L, 45L)).toDF("k", "iid", "lo", "hi")
    val out = RangeJoin.pointInInterval(points, "x", intervals, "lo", "hi",
      bucketWidth = 3L, keyCols = Seq("k"))
    assert(out.count() === 41) // 5..45 inclusive, once each
  }

  test("range join plan is an equi-join, never BroadcastNestedLoopJoin") {
    val points = Seq((1L, 1L)).toDF("k", "x")
    val intervals = Seq((1L, 1L, 0L, 10L)).toDF("k", "iid", "lo", "hi")
    val p = RangeJoin.pointInInterval(points, "x", intervals, "lo", "hi", 4L, Seq("k"))
      .queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("intervalOverlap matches the naive non-equi join, duplicate-free") {
    // spans chosen so some pairs share MANY buckets (the dedup trick's target)
    val a = Seq((1L, 100L, 0L, 50L), (1L, 101L, 60L, 61L), (1L, 102L, 90L, 80L), (2L, 103L, 0L, 10L))
      .toDF("k", "aid", "alo", "ahi")
    val b = Seq((1L, 200L, 40L, 70L), (1L, 201L, -5L, 0L), (1L, 202L, 55L, 58L), (2L, 203L, 11L, 20L))
      .toDF("k", "bid", "blo", "bhi")
    val got = RangeJoin.intervalOverlap(a, "alo", "ahi", b, "blo", "bhi",
        bucketWidth = 7L, keyCols = Seq("k"))
      .select("aid", "bid").as[(Long, Long)].collect().toList
    // naive: (100,200) overlap [40,50]; (100,201) touch at 0; (101,200) inside
    val want = Set((100L, 200L), (100L, 201L), (101L, 200L))
    assert(got.toSet === want)
    assert(got.length === want.size, s"duplicates emitted: $got") // exactly once each
  }

  test("quantilesDisc picks exact order statistics; histogram floors negatives") {
    import graft.operators.Stats
    val data = (1L to 100L).map(v => ("a", v)).toDF("g", "v")
    val q = Stats.quantilesDisc(data, Seq("g"), "v", Seq(0, 500, 1000))
      .select("permille", "q_value").as[(Long, Long)].collect().toMap
    // ranks over 1..100: p0 -> rank 0 = 1; p500 -> rank 49 = 50; p1000 -> rank 99 = 100
    assert(q === Map(0L -> 1L, 500L -> 50L, 1000L -> 100L))

    val h = Stats.histogram(Seq(("a", -1L), ("a", 0L), ("a", 49L), ("a", 50L), ("a", -50L))
        .toDF("g", "v"), Seq("g"), "v", width = 50L)
      .select("bucket", "n").as[(Long, Long)].collect().toMap
    // -1 floors to bucket -1 (not 0); -50 to bucket -1
    assert(h === Map(-1L -> 2L, 0L -> 2L, 1L -> 1L))
  }

  test("histogram merge law; sketch quantiles within width below the exact") {
    import graft.operators.Stats
    val rnd = new scala.util.Random(41)
    val data = (0 until 4000).map { i =>
      (if (i % 3 == 0) "a" else "b", i.toLong, rnd.nextLong(2000) - 500)
    }.toDF("g", "id", "v")
    val width = 50L
    // merge law: histogram of the union == bucket-wise sum of shard histograms
    val whole = Stats.histogram(data, Seq("g"), "v", width)
    val merged = Stats.histogramMerge(Seq(
      Stats.histogram(data.where(col("id") % 2 === 0), Seq("g"), "v", width),
      Stats.histogram(data.where(col("id") % 2 =!= 0), Seq("g"), "v", width)), Seq("g"))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("g", "bucket", "n", "bucket_lo")
        .as[(String, Long, Long, Long)].collect().toSet
    assert(rows(whole) === rows(merged))
    // accuracy pin: q_lo <= exact discrete quantile < q_lo + width, per
    // (group, permille) — the sketch never overshoots and lands in-bucket
    val permille = Seq(0, 250, 500, 750, 1000)
    val approx = Stats.quantilesFromHistogram(merged, Seq("g"), permille)
      .select("g", "permille", "q_lo").as[(String, Long, Long)].collect()
      .map { case (g, p, q) => (g, p) -> q }.toMap
    val exactQ = Stats.quantilesDisc(data.select("g", "v"), Seq("g"), "v", permille)
      .select("g", "permille", "q_value").as[(String, Long, Long)].collect()
      .map { case (g, p, q) => (g, p) -> q }.toMap
    assert(approx.keySet === exactQ.keySet)
    approx.foreach { case (k, qLo) =>
      val ex = exactQ(k)
      assert(qLo <= ex && ex < qLo + width, s"$k: q_lo=$qLo exact=$ex")
    }
  }

  test("sample quantiles: twin equality, order-independence, exact below k") {
    import graft.operators.Stats
    import graft.functions.Portable
    import org.apache.spark.sql.expressions.Window
    val rnd = new scala.util.Random(43)
    val data = (0 until 3000).map { i =>
      (if (i % 4 == 0) "a" else "b", s"row-$i", rnd.nextLong(1000000) - 300000)
    }.toDF("g", "rk", "v")
    val permille = Seq(0, 250, 500, 900, 1000)
    val k = 128
    def asMap(df: org.apache.spark.sql.DataFrame) =
      df.select("g", "permille", "q_value").as[(String, Long, Long)]
        .collect().map { case (g, p, q) => (g, p) -> q }.toMap
    val agg = asMap(Stats.quantilesSample(data, Seq("g"), col("rk"), col("v"),
      k, permille))
    // declarative twin: bottom-k (h, v) pairs via a window, then the same
    // integer rank rule (quantilesDisc) over the sampled values
    val sample = data
      .select(col("g"), Portable.hash60(col("rk")).as("h"), col("v"))
      .distinct()
      .withColumn("hr", row_number().over(Window.partitionBy("g").orderBy("h", "v")))
      .where(col("hr") <= k)
    val twin = asMap(Stats.quantilesDisc(sample.select("g", "v"), Seq("g"), "v", permille))
    assert(agg === twin, "aggregate must equal the declarative bottom-k twin")
    // order-independence: partitioning and input order cannot move the sample
    val shuffled = asMap(Stats.quantilesSample(
      data.orderBy(col("v").desc).repartition(13), Seq("g"), col("rk"), col("v"),
      k, permille))
    assert(shuffled === agg)
    // below k the sample IS the input: sample quantiles == exact quantiles
    val small = (0 until 80).map(i => ("s", s"r$i", rnd.nextLong(500))).toDF("g", "rk", "v")
    val exact = asMap(Stats.quantilesDisc(small.select("g", "v"), Seq("g"), "v", permille))
    assert(asMap(Stats.quantilesSample(small, Seq("g"), col("rk"), col("v"),
      k, permille)) === exact)
  }

  // ---- sketches ----

  test("KMV: exact below k, estimate within 1/sqrt(k-2) bounds above k") {
    val small = (0 until 40).map(i => ("a", s"v$i")).toDF("g", "v")
    val exact = Sketch.kmvDistinct(small, Seq("g"), col("v"), k = 64).collect().head
    assert(exact.getAs[Long]("n_kept") === 40L)
    assert(exact.getAs[Long]("n_distinct_est") === 40L)

    val big = (0 until 20000).map(i => ("a", s"v${i % 5000}")).toDF("g", "v")
    val est = Sketch.kmvDistinct(big, Seq("g"), col("v"), k = 256)
      .collect().head.getAs[Long]("n_distinct_est")
    assert(math.abs(est - 5000.0) / 5000.0 < 0.2, s"est=$est for true 5000")
  }

  test("KMV merge law: k-min of unioned sketches == sketch of the union") {
    val a = (0 until 3000).map(i => ("g", s"x$i")).toDF("g", "v")
    val b = (1500 until 4500).map(i => ("g", s"x$i")).toDF("g", "v")
    val whole = Sketch.kmvDistinct(a.union(b), Seq("g"), col("v"), k = 128).collect().head
    // merge = union the two sketches' kept hashes, re-take the k smallest
    val ka = Sketch.kmvKeptHashes(a, Seq("g"), col("v"), k = 128)
    val kb = Sketch.kmvKeptHashes(b, Seq("g"), col("v"), k = 128)
    val merged = Sketch.kmvFromKept(ka.union(kb), Seq("g"), k = 128).collect().head
    assert(merged.getAs[Long]("kth_hash") === whole.getAs[Long]("kth_hash"))
    assert(merged.getAs[Long]("n_distinct_est") === whole.getAs[Long]("n_distinct_est"))
  }

  test("KmvAgg: bit-identical to the window formulation, ObjectHashAggregate plan") {
    val data = (0 until 30000).map(i => (s"g${i % 7}", s"v${(i * 31) % 4000}")).toDF("g", "v")
    val viaAgg = Sketch.kmvDistinctAgg(data, Seq("g"), col("v"), k = 64)
    val viaWindow = Sketch.kmvDistinct(data, Seq("g"), col("v"), k = 64)
    val a = viaAgg.orderBy("g").collect().map(_.toSeq).toSeq
    val w = viaWindow.orderBy("g").collect().map(_.toSeq).toSeq
    assert(a === w)
    // bounded-state partial aggregation, not a window sort
    val p = viaAgg.queryExecution.executedPlan.toString
    assert(p.contains("ObjectHashAggregate"), p)
    assert(!p.contains("Window"), p)
  }

  test("kmvKeptHashesAgg: identical kept-hash rows to the window twin, no Window in plan") {
    val data = (0 until 30000).map(i => (s"g${i % 7}", s"v${(i * 31) % 4000}")).toDF("g", "v")
    val viaAgg = Sketch.kmvKeptHashesAgg(data, Seq("g"), col("v"), k = 64)
    val viaWindow = Sketch.kmvKeptHashes(data, Seq("g"), col("v"), k = 64)
    val a = viaAgg.orderBy("g", "_h").collect().map(_.toSeq).toSeq
    val w = viaWindow.orderBy("g", "_h").collect().map(_.toSeq).toSeq
    assert(a === w)
    val p = viaAgg.queryExecution.executedPlan.toString
    assert(p.contains("ObjectHashAggregate"), p)
    assert(!p.contains("Window"), p)
    // overlap estimates are then bit-identical whichever build path made
    // the sketches (the downstream estimator sees the same kept sets)
    val half1 = data.where(length(col("v")) % 2 === 0)
    val half2 = data.where(length(col("v")) % 2 === 1)
    val viaA = Sketch.kmvOverlap(
      Sketch.kmvKeptHashesAgg(half1, Seq("g"), col("v"), 64),
      Sketch.kmvKeptHashesAgg(half2, Seq("g"), col("v"), 64), Seq("g"), 64)
      .orderBy("g").collect().map(_.toSeq).toSeq
    val viaW = Sketch.kmvOverlap(
      Sketch.kmvKeptHashes(half1, Seq("g"), col("v"), 64),
      Sketch.kmvKeptHashes(half2, Seq("g"), col("v"), 64), Seq("g"), 64)
      .orderBy("g").collect().map(_.toSeq).toSeq
    assert(viaA === viaW)
  }

  test("sampleKPerGroup (TopKAgg): equals the window twin; seeds independent") {
    import graft.operators.Sampling
    val data = (0 until 20000).map(i => (s"g${i % 5}", i.toLong)).toDF("g", "id")
    val viaAgg = Sampling.sampleKPerGroup(data, Seq("g"), "id", k = 50, seed = 7)
      .as[(String, Long)].collect().toSet
    val viaWin = Sampling.sampleKPerGroupViaWindow(data, Seq("g"), "id", k = 50, seed = 7)
      .as[(String, Long)].collect().toSet
    assert(viaAgg === viaWin)
    assert(viaAgg.size === 250)
    // a different seed draws a (near-certainly) different sample
    val other = Sampling.sampleKPerGroup(data, Seq("g"), "id", k = 50, seed = 8)
      .as[(String, Long)].collect().toSet
    assert(other !== viaAgg)
    // bounded-state plan, not a window sort
    val p = Sampling.sampleKPerGroup(data, Seq("g"), "id", k = 50, seed = 7)
      .queryExecution.executedPlan.toString
    assert(p.contains("ObjectHashAggregate"), p)
    assert(!p.contains("Window"), p)
  }

  test("TopKAgg merge survives duplicates below the running max (regression)") {
    // two partitions that share small pairs: the ascending-merge early exit
    // must not stop on a duplicate that is smaller than the current max
    val data = ((0 until 100) ++ (0 until 100)).map(i => ("g", i.toLong)).toDF("g", "id")
      .repartition(7)
    val got = graft.operators.Sampling.sampleKPerGroup(data, Seq("g"), "id", k = 10, seed = 1)
      .as[(String, Long)].collect().toSet
    val want = graft.operators.Sampling
      .sampleKPerGroupViaWindow(data.distinct(), Seq("g"), "id", k = 10, seed = 1)
      .as[(String, Long)].collect().toSet
    assert(got === want)
  }

  test("CMS: never underestimates, exact on unique-slot corpora; shards merge by sum") {
    val docs = (0 until 1000).map(i => s"tok${i % 7}").toDF("v")
    val sk = Sketch.cmsSketch(docs, col("v"))
    val cand = docs.groupBy("v").agg(count(lit(1)).as("true_cnt"))
    val est = Sketch.cmsEstimate(cand, col("v"), sk)
      .select("v", "true_cnt", "est_cnt").as[(String, Long, Long)].collect()
    assert(est.length === 7)
    est.foreach { case (v, t, e) => assert(e >= t, s"$v: est $e < true $t") }

    // shard-wise build: cell-wise sum of shard sketches == whole-corpus sketch
    val (s1, s2) = (docs.where(expr("substr(v, 4) < '4'")), docs.where(expr("substr(v, 4) >= '4'")))
    val mergedCells = Sketch.cmsMerge(Seq(
      Sketch.cmsSketch(s1, col("v")), Sketch.cmsSketch(s2, col("v"))))
    val whole = sk.select("d", "slot", "cnt").as[(Int, Long, Long)].collect().toSet
    val merged = mergedCells.select("d", "slot", "cnt").as[(Int, Long, Long)].collect().toSet
    assert(merged === whole)

    // counts-weighted build (r18): sketching pre-aggregated (value, cnt)
    // rows — slot family once per DISTINCT value — is cell-for-cell equal
    // to sketching the raw occurrences
    val viaCounts = Sketch.cmsSketchFromCounts(cand, col("v"), col("true_cnt"))
      .select("d", "slot", "cnt").as[(Int, Long, Long)].collect().toSet
    assert(viaCounts === whole)
  }

  test("Bloom: no false negatives, absent stays absent at sane m, shards merge by union") {
    val corpus = (0 until 500).map(i => s"key$i").toDF("v")
    val m = 1 << 20; val k = 5
    // merge law: union-distinct of shard sketches == whole-corpus sketch
    val whole = Sketch.bloomSketch(corpus, col("v"), m, k)
    val merged = Sketch.bloomMerge(Seq(
      Sketch.bloomSketch(corpus.where(expr("substr(v, 4) < '25'")), col("v"), m, k),
      Sketch.bloomSketch(corpus.where(expr("substr(v, 4) >= '25'")), col("v"), m, k)))
    assert(merged.as[Long].collect().toSet === whole.as[Long].collect().toSet)
    // sketch is bounded: at most n_distinct * k slots
    assert(whole.count() <= 500L * k)
    // membership: every present key true (never a false negative); at
    // n*k/m ~ 0.0024 the fabricated absents stay false (deterministic —
    // the hash family is fixed, so this can never flake)
    val cands = ((0 until 500 by 50).map(i => s"key$i") ++
      (0 until 5).map(i => s"nope$i")).toDF("v")
    val got = Sketch.bloomProbe(cands, col("v"), whole, m, k)
      .as[(String, Boolean)].collect().toMap
    (0 until 500 by 50).foreach(i => assert(got(s"key$i"), s"false negative on key$i"))
    (0 until 5).foreach(i => assert(!got(s"nope$i"), s"false positive on nope$i"))
    // duplicate candidate rows must not manufacture a false negative: the
    // probe guarantee is per-row, whatever multiset the caller hands it
    val dup = Sketch.bloomProbe(
      (Seq.fill(3)("key0") ++ Seq.fill(2)("nope0")).toDF("v"), col("v"), whole, m, k)
      .as[(String, Boolean)].collect().toMap
    assert(dup("key0") && !dup("nope0"), s"duplicate-candidate probe broke: $dup")
  }

  test("KMV overlap: exact below k, coincidence estimator near truth above it") {
    // sub-k sets: the sketches ARE the sets, every figure exact
    val a0 = (0 until 40).map(i => ("g", s"s$i")).toDF("g", "v")
    val b0 = (30 until 60).map(i => ("g", s"s$i")).toDF("g", "v") // 10 shared, union 60
    val ex = Sketch.kmvOverlap(
      Sketch.kmvKeptHashes(a0, Seq("g"), col("v"), 64),
      Sketch.kmvKeptHashes(b0, Seq("g"), col("v"), 64), Seq("g"), 64).collect().head
    assert(ex.getAs[Long]("n_kept") === 60L)
    assert(ex.getAs[Long]("n_both") === 10L)
    assert(ex.getAs[Long]("n_union_est") === 60L)
    assert(ex.getAs[Long]("jaccard_permille") === 1000L * 10 / 60)
    assert(ex.getAs[Long]("n_inter_est") === 10L)

    // large overlapping sets: true jaccard 1500/4500 = 1/3
    val a = (0 until 3000).map(i => ("g", s"x$i")).toDF("g", "v")
    val b = (1500 until 4500).map(i => ("g", s"x$i")).toDF("g", "v")
    val k = 256
    val est = Sketch.kmvOverlap(
      Sketch.kmvKeptHashes(a, Seq("g"), col("v"), k),
      Sketch.kmvKeptHashes(b, Seq("g"), col("v"), k), Seq("g"), k).collect().head
    val jac = est.getAs[Long]("jaccard_permille")
    // 3-sigma binomial band around 333 at k draws
    val sd = math.sqrt((1.0 / 3) * (2.0 / 3) / k) * 1000
    assert(math.abs(jac - 333.0) < 3 * sd, s"jaccard_permille=$jac")
    val u = est.getAs[Long]("n_union_est")
    assert(math.abs(u - 4500.0) / 4500.0 < 0.2, s"n_union_est=$u")
    val i = est.getAs[Long]("n_inter_est")
    assert(math.abs(i - 1500.0) / 1500.0 < 0.35, s"n_inter_est=$i")
  }

  test("HLL: registers bounded, merge law by per-bucket max, estimator accuracy") {
    val p = 10; val m = 1 << p
    val data = (0 until 60000).map(i => ("a", s"v${(i * 131) % 20000}")).toDF("g", "v")
    val whole = Sketch.hllSketch(data, Seq("g"), col("v"), p)
    // sparse registers: at most m rows per group
    assert(whole.count() <= m.toLong)
    // merge law: per-bucket max of shard sketches == sketch of the union
    // (shards OVERLAP — max must win over any sum-like merge)
    val s1 = Sketch.hllSketch(data.where(expr("substr(v, 2) < '12000'")), Seq("g"), col("v"), p)
    val s2 = Sketch.hllSketch(data.where(expr("substr(v, 2) >= '08000'")), Seq("g"), col("v"), p)
    val merged = Sketch.hllMerge(Seq(s1, s2), Seq("g"))
    assert(merged.select("g", "bucket", "rho").as[(String, Long, Long)].collect().toSet ===
      whole.select("g", "bucket", "rho").as[(String, Long, Long)].collect().toSet)
    // estimator: within the 3-sigma band of HLL's 1.04/sqrt(m) relative error
    val est = Sketch.hllEstimate(whole, Seq("g"), p)
      .collect().head.getAs[Double]("n_distinct_est")
    val tol = 3 * 1.04 / math.sqrt(m.toDouble)
    assert(math.abs(est - 20000.0) / 20000.0 < tol, s"est=$est for true 20000 (tol=$tol)")
    // plan: one hash aggregate with map-side partials, never a window
    val plan = whole.queryExecution.executedPlan.toString
    assert(plan.contains("HashAggregate") && !plan.contains("Window"), plan)
  }

  test("HllAgg: bit-identical to the declarative sketch, ObjectHashAggregate plan") {
    val data = (0 until 30000).map(i => (s"g${i % 7}", s"v${(i * 31) % 4000}")).toDF("g", "v")
    val viaAgg = Sketch.hllSketchAgg(data, Seq("g"), col("v"), p = 8)
    val viaRows = Sketch.hllSketch(data, Seq("g"), col("v"), p = 8)
    val a = viaAgg.select("g", "bucket", "rho").as[(String, Long, Long)].collect().toSet
    val r = viaRows.select("g", "bucket", "rho").as[(String, Long, Long)].collect().toSet
    assert(a === r)
    // one register array per group through the shuffle, not a window sort
    val plan = viaAgg.queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), plan)
    assert(!plan.contains("Window"), plan)

    // nulls sketch nothing on BOTH paths; a group column named 'col' is fine
    // (posexplode's default output names must not collide); out-of-contract
    // hashes (negative longs) reduce to their low 60 bits instead of crashing
    val withNulls = (Seq(("a", "x"), ("a", null), ("b", null)): Seq[(String, String)])
      .toDF("col", "v")
    val an = Sketch.hllSketchAgg(withNulls, Seq("col"), col("v"), p = 4)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val rn = Sketch.hllSketch(withNulls, Seq("col"), col("v"), p = 4)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(an === rn && an.map(_._1) === Set("a")) // all-null group sketches nothing
    import org.apache.spark.sql.graftshim.{GraftShims, HllAgg}
    val wild = spark.range(100).select(
      GraftShims.column(HllAgg(GraftShims.expr(expr("xxhash64(id)")), 6)
        .toAggregateExpression()).as("regs"))
    assert(wild.collect().head.getSeq[Int](0).size == 64) // no AIOOBE on full-width hashes
  }

  test("HLL small range: linear counting is near-exact; rho bit-length edge cases") {
    val p = 10; val m = 1 << p
    val small = (0 until 300).map(i => ("g", s"u$i")).toDF("g", "v")
    val sk = Sketch.hllSketch(small, Seq("g"), col("v"), p)
    val est = Sketch.hllEstimate(sk, Seq("g"), p)
      .collect().head.getAs[Double]("n_distinct_est")
    // V = m - 300 at most (no bucket collision assumption: allow slack)
    assert(math.abs(est - 300.0) / 300.0 < 0.1, s"linear-counting est=$est for true 300")
    // rho derivation is pure integer arithmetic: recompute from the JVM twin
    // of the hash and compare — pins the bin()/length bit-length trick
    import graft.functions.Portable
    val w = 60 - p
    val got = Sketch.hllSketch(small, Seq("g"), col("v"), p)
      .select("bucket", "rho").as[(Long, Long)].collect().toMap
    val expect = (0 until 300).map { i =>
      val h = Portable.md5Long(s"u$i")
      val bucket = h >>> w // p top bits of the 60-bit hash
      val suffix = h & ((1L << w) - 1)
      val rho = if (suffix == 0) w + 1
      else w + 1 - (64 - java.lang.Long.numberOfLeadingZeros(suffix))
      (bucket, rho.toLong)
    }.groupBy(_._1).map { case (b, rs) => (b, rs.map(_._2).max) }
    assert(got === expect)
  }
}
