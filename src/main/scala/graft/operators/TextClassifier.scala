package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Portable

/** Learned document classifier over hashed token features — the
  * fastText/DCLM shape of quality and language filtering: train a small
  * linear model on a labeled slice, then score the whole corpus with one
  * cheap distributed pass.
  *
  * Reference analog: the heuristic text filters (see TextOps) are the
  * reference's static quality gates; production training-data pipelines
  * (CCNet, DCLM) put a LEARNED classifier behind the same interface. The
  * engine-level contract here mirrors `Similarity.kmeansCentroids`
  * (components/object-storage offload keeps model-free; classification is a
  * pipeline operator, not an engine primitive):
  *
  *  - TRAINING is driver-side over a BOUNDED deterministic sample
  *    (`orderBy(id).limit(sampleN)`, fixed-order full-batch gradient
  *    descent) — at 100 TB you train on a sample regardless; what must
  *    scale is scoring, not fitting.
  *  - SCORING is one distributed pass: explode tokens, hash to a bucket,
  *    broadcast-join the F-row weight table, sum — a codegen'd equi-join +
  *    partial aggregation, no UDF, no shuffle wider than the groupBy(id).
  *  - The model is quantized to integer MICROS and the score is a pure
  *    BIGINT dot product: `score_micro = Σ_tok w[bucket(tok)] + n·bias`.
  *    Integer sums are associative, so the result is order-independent
  *    (reproducible under any partitioning) and bit-reproducible by the
  *    SQL oracle — the same trick the sketch families use.
  */
object TextClassifier {

  /** Quantized linear model: `wMicro(b)` = weight of hash bucket `b` in
    * micro-units (1e-6), plus an intercept. The quantized form IS the
    * model — training doubles are an implementation detail. */
  final case class LinearModel(wMicro: Array[Long], biasMicro: Long) {
    def nFeatures: Int = wMicro.length
  }

  /** Token -> feature bucket, engine-portable: first 60 bits of md5, mod F.
    * Non-negative in both engines (hash60 is a 60-bit value; F > 0). */
  def bucket(tok: Column, nFeatures: Int): Column =
    Portable.hash60(tok) % nFeatures

  /** DuckDB-SQL of [[bucket]]. */
  def bucketSql(tokExpr: String, nFeatures: Int): String =
    s"(${Portable.hash60Sql(tokExpr)} % $nFeatures)"

  // JVM twin of the bucket expression, used only at training time —
  // delegates to the ONE md5-to-long primitive so it can never drift from
  // the distributed `bucket` expression.
  private def bucketJvm(tok: String, nFeatures: Int): Int =
    (Portable.md5Long(tok) % nFeatures).toInt

  /** Fit a logistic-regression model on a bounded deterministic sample.
    *
    * Features of a doc are its per-bucket token counts divided by its token
    * count (length-normalized — folded back into integer scoring by
    * multiplying the margin through by n, which preserves sign). Training
    * is plain full-batch gradient descent in a fixed order: same input =>
    * same model, no RNG anywhere.
    *
    * @param labelCol boolean column: the positive class.
    */
  def trainLogReg(docs: DataFrame, idCol: String, textCol: String,
                  labelCol: Column, nFeatures: Int = 256,
                  sampleN: Int = 512, epochs: Int = 4000,
                  lr: Double = 8.0, l2: Double = 1e-5): LinearModel = {
    val rows = docs
      .select(col(idCol).as("id"), col(textCol).as("t"), labelCol.as("y"))
      .orderBy("id").limit(sampleN)
      .collect()
    require(rows.nonEmpty, "empty training sample")
    // sparse normalized features per doc, built once
    val feats: Array[(Array[Int], Array[Double], Double)] = rows.map { r =>
      val toks = r.getString(1).split(" ", -1)
      val m = scala.collection.mutable.LinkedHashMap.empty[Int, Int]
      toks.foreach { t =>
        val b = bucketJvm(t, nFeatures)
        m.update(b, m.getOrElse(b, 0) + 1)
      }
      val n = toks.length.toDouble
      (m.keys.toArray, m.values.map(_ / n).toArray,
        if (r.getBoolean(2)) 1.0 else 0.0)
    }
    val w = new Array[Double](nFeatures)
    var b = 0.0
    val m = feats.length.toDouble
    for (_ <- 0 until epochs) {
      val gw = new Array[Double](nFeatures)
      var gb = 0.0
      feats.foreach { case (idx, x, y) =>
        var z = b
        var i = 0
        while (i < idx.length) { z += w(idx(i)) * x(i); i += 1 }
        val p = 1.0 / (1.0 + math.exp(-z))
        val err = y - p
        i = 0
        while (i < idx.length) { gw(idx(i)) += err * x(i); i += 1 }
        gb += err
      }
      var j = 0
      while (j < nFeatures) {
        w(j) += lr * (gw(j) / m - l2 * w(j)); j += 1
      }
      b += lr * (gb / m - l2 * b)
    }
    LinearModel(w.map(v => math.rint(v * 1e6).toLong),
      math.rint(b * 1e6).toLong)
  }

  /** Score every document with the quantized model — the distributed pass.
    *
    * Emits `(id, n_tokens, score_micro, pred)` where
    * `score_micro = Σ_tok wMicro(bucket(tok)) + n_tokens · biasMicro`
    * (the length-normalized margin scaled by `n·1e6` — same sign) and
    * `pred = score_micro >= 0`.
    *
    * Plan shape: one generate (explode), a broadcast equi-join against the
    * F-row weight table, and a partial-aggregated groupBy on the id — the
    * whole per-token pipeline stays in whole-stage codegen. 100 TB: cost is
    * O(total tokens), the weight table is O(F) broadcast, and the only
    * shuffle is the id-keyed aggregation.
    */
  def scoreLinear(docs: DataFrame, idCol: String, textCol: String,
                  model: LinearModel): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    val weights = broadcast(
      model.wMicro.zipWithIndex
        .map { case (wm, i) => (i.toLong, wm) }.toSeq
        .toDF("_b", "_wm"))
    docs
      .select(col(idCol), explode(Portable.words(col(textCol))).as("_tok"))
      // coalesce marks the bucket non-nullable (it never IS null: split
      // yields non-null tokens and md5 of a non-null string is non-null;
      // were it ever null, -1 matches no weight row exactly as a null
      // drops from the inner join). Without it the join's inferred
      // IsNotNull(_b) pushed BELOW this projection as a filter on the md5
      // EXPRESSION — every token paid the digest twice, once in the filter
      // and once here (r18, §1.2 step 2; plan-pinned in plans/r18/).
      .withColumn("_b",
        coalesce(bucket(col("_tok"), model.nFeatures).cast("long"), lit(-1L)))
      .join(weights, "_b")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"), sum(col("_wm")).as("_sw"))
      .select(col(idCol), col("n_tokens"),
        (col("_sw") + col("n_tokens") * model.biasMicro).as("score_micro"))
      .withColumn("pred", col("score_micro") >= 0L)
  }

  /** Per-ROW twin of [[scoreLinear]]: the weight table rides the plan as a
    * literal array and the token sum is a higher-order `aggregate` over the
    * split — zero joins, zero shuffles, one projection. That makes it legal
    * inside a STREAMING micro-batch (an id-keyed groupBy would be a
    * stateful streaming aggregation; this is stateless) and bit-equal to
    * the join form (unit-pinned — integer math again). Tradeoff: the HOF
    * lambda evaluates outside whole-stage codegen, so on wide batch scans
    * the codegen'd explode+broadcast-join form can still win; both are
    * exact, pick by context. */
  def scoreLinearExpr(docs: DataFrame, idCol: String, textCol: String,
                      model: LinearModel): DataFrame = {
    val w = typedlit(model.wMicro.toSeq)
    val toks = Portable.words(col(textCol))
    val sw = aggregate(toks, lit(0L),
      (acc, t) => acc + element_at(w, (bucket(t, model.nFeatures) + 1L).cast("int")))
    docs.select(col(idCol),
        size(toks).cast("long").as("n_tokens"),
        (sw + size(toks).cast("long") * model.biasMicro).as("score_micro"))
      .withColumn("pred", col("score_micro") >= 0L)
  }

  /** [[scoreLinear]] then keep only predicted-positive docs — the DCLM-style
    * "classifier gate" as a filter: original columns survive, scores ride
    * along. Same plan plus one broadcast-able semi-join by id. */
  def filterByModel(docs: DataFrame, idCol: String, textCol: String,
                    model: LinearModel): DataFrame =
    docs.join(
      scoreLinear(docs, idCol, textCol, model)
        .where(col("pred")).select(col(idCol), col("score_micro")),
      Seq(idCol))
}
