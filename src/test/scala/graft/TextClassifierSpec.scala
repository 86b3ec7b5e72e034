package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper

import graft.operators.TextClassifier

class TextClassifierSpec extends SparkTestBase with AdaptiveSparkPlanHelper {

  private lazy val docs = Fixtures.documents(spark, "/root/testdata/sf0.001")

  test("training is deterministic: same sample, same quantized model") {
    val m1 = TextClassifier.trainLogReg(docs, "doc_id", "text",
      col("lang") === "en", nFeatures = 128, sampleN = 200, epochs = 100)
    val m2 = TextClassifier.trainLogReg(docs, "doc_id", "text",
      col("lang") === "en", nFeatures = 128, sampleN = 200, epochs = 100)
    assert(m1.wMicro.toSeq == m2.wMicro.toSeq && m1.biasMicro == m2.biasMicro)
  }

  // The sf corpus's lang label is deliberately content-free (all langs share
  // one 31-token vocabulary at near-identical frequencies), so learnability
  // is proven on a deterministic two-distribution corpus instead: class 1
  // leans on one half of the vocabulary, class 0 on the other, with heavy
  // shared noise.
  private def separableDocs(n: Int) = {
    import spark.implicits._
    val vocabA = Array("alpha", "beta", "gamma", "delta")
    val vocabB = Array("omega", "sigma", "kappa", "lambda")
    val shared = Array("the", "a", "of", "and", "data", "table")
    val rnd = new scala.util.Random(42)
    (0 until n).map { i =>
      val y = i % 2 == 0
      val lean = if (y) vocabA else vocabB
      val toks = (0 until 40).map { _ =>
        val r = rnd.nextDouble()
        if (r < 0.6) shared(rnd.nextInt(shared.length))
        else if (r < 0.9) lean(rnd.nextInt(lean.length))
        else (if (y) vocabB else vocabA)(rnd.nextInt(4)) // label noise
      }
      (i.toLong, toks.mkString(" "), y)
    }.toDF("doc_id", "text", "y")
  }

  test("held-out accuracy: train on even ids, >=95% on odd ids (separable corpus)") {
    val all = separableDocs(400).cache()
    val train = all.where(col("doc_id") % 4 < 2)
    val test = all.where(col("doc_id") % 4 >= 2)
    val m = TextClassifier.trainLogReg(train, "doc_id", "text", col("y"),
      nFeatures = 64)
    val scored = TextClassifier.scoreLinear(test, "doc_id", "text", m)
      .join(test.select("doc_id", "y"), "doc_id")
    val n = scored.count()
    val right = scored.where(col("pred") === col("y")).count()
    info(s"held-out accuracy: $right/$n")
    assert(right.toDouble / n >= 0.95, s"accuracy ${right.toDouble / n}")
    all.unpersist()
  }

  test("scored margin equals a JVM recomputation of the integer dot product") {
    val m = TextClassifier.trainLogReg(docs, "doc_id", "text",
      col("lang") === "en", nFeatures = 64, sampleN = 100, epochs = 50)
    val got = TextClassifier.scoreLinear(docs.where(col("doc_id") < 20),
        "doc_id", "text", m)
      .select("doc_id", "n_tokens", "score_micro")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // independent re-derivation of bucket+sum (mirrors Portable.hash60)
    def bucket(tok: String): Int = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(tok.getBytes("UTF-8")).take(8)
        .map(b => f"$b%02x").mkString.take(15)
      (java.lang.Long.parseLong(hex, 16) % m.nFeatures).toInt
    }
    val want = docs.where(col("doc_id") < 20).select("doc_id", "text").collect()
      .map { r =>
        val toks = r.getString(1).split(" ", -1)
        val s = toks.map(t => m.wMicro(bucket(t))).sum + toks.length * m.biasMicro
        r.getLong(0) -> ((toks.length.toLong, s))
      }.toMap
    assert(got == want)
  }

  test("scoreLinearExpr (per-row, streaming-safe) == scoreLinear (join form) bit-for-bit") {
    val m = TextClassifier.trainLogReg(docs, "doc_id", "text",
      col("lang") === "en", nFeatures = 256)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_id", "n_tokens", "score_micro", "pred").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3))).toSet
    val a = rows(TextClassifier.scoreLinear(docs, "doc_id", "text", m))
    val b = rows(TextClassifier.scoreLinearExpr(docs, "doc_id", "text", m))
    assert(a == b && a.size == 500)
  }

  test("filterByModel keeps exactly the predicted-positive docs") {
    val m = TextClassifier.trainLogReg(docs, "doc_id", "text",
      col("lang") === "en", nFeatures = 256)
    val pos = TextClassifier.scoreLinear(docs, "doc_id", "text", m)
      .where(col("pred")).select("doc_id")
    val kept = TextClassifier.filterByModel(docs, "doc_id", "text", m)
    assert(kept.select("doc_id").collect().map(_.getLong(0)).toSet ==
      pos.collect().map(_.getLong(0)).toSet)
    assert(kept.columns.contains("text") && kept.columns.contains("score_micro"))
  }

  test("scoring plan: broadcast join on the weight table, no shuffle beyond the id agg") {
    val m = TextClassifier.trainLogReg(docs, "doc_id", "text",
      col("lang") === "en", nFeatures = 256)
    val df = TextClassifier.scoreLinear(docs, "doc_id", "text", m)
    df.collect()
    val plan = df.queryExecution.executedPlan
    def nodes(p: SparkPlan): Seq[SparkPlan] = collectWithSubqueries(p) { case n => n }
    val names = nodes(plan).map(_.nodeName)
    assert(names.exists(_.contains("BroadcastHashJoin")),
      s"expected broadcast weight join in:\n${names.mkString("\n")}")
    val shuffles = names.count(_.contains("Exchange")) -
      names.count(_.contains("BroadcastExchange"))
    assert(shuffles <= 1, s"expected <=1 data shuffle, got:\n${names.mkString("\n")}")
  }
}
