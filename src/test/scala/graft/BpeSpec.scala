package graft

import org.apache.spark.sql.functions._

import graft.operators.Bpe

class BpeSpec extends SparkTestBase {

  // Independent reference implementation with the documented semantics:
  // argmax (count DESC, pair ASC), one Java-replace sweep per rule.
  private def refLearn(words: Map[String, Long], numMerges: Int,
                       minCount: Long = 2L): Seq[(String, String)] = {
    var repr: Map[String, Long] = words.map { case (w, n) =>
      (" " + w.toSeq.mkString(" ") + " ", n)
    }
    val out = scala.collection.mutable.ArrayBuffer[(String, String)]()
    var go = true
    while (go && out.size < numMerges) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      repr.foreach { case (r, n) =>
        val syms = r.trim.split(" ")
        syms.sliding(2).foreach {
          case Array(a, b) => counts((a, b)) = counts.getOrElse((a, b), 0L) + n
          case _ =>
        }
      }
      val best = counts.toSeq
        .sortBy { case ((a, b), c) => (-c, a, b) }.headOption
      best match {
        case Some(((a, b), c)) if c >= minCount =>
          out += ((a, b))
          repr = repr.map { case (r, n) => (r.replace(s" $a $b ", s" $a$b "), n) }
        case _ => go = false
      }
    }
    out.toSeq
  }

  private def refEncode(word: String, merges: Seq[(String, String)]): Seq[String] = {
    var r = " " + word.toSeq.mkString(" ") + " "
    merges.foreach { case (a, b) => r = r.replace(s" $a $b ", s" $a$b ") }
    r.trim.split(" ").toSeq
  }

  private lazy val docs = Fixtures.documents(spark, "/root/testdata/sf0.001")

  test("learn matches the reference implementation on the corpus") {
    val got = Bpe.learn(docs, "doc_id", "text", numMerges = 20)
    val words = docs.select(explode(split(col("text"), " ")).as("w"))
      .where(col("w") =!= "").groupBy("w").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val want = refLearn(words, 20)
    assert(got == want, s"\ngot:  $got\nwant: $want")
    assert(got.size == 20)
  }

  test("encode: Spark expression == reference sweep, incl. the repeated-run boundary case") {
    import spark.implicits._
    val merges = Seq(("a", "a"), ("aa", "b"), ("c", "c"))
    val words = Seq("aaaaa", "aab", "aabaab", "cccc", "abc", "x")
    val df = words.zipWithIndex.map { case (w, i) => (i.toLong, w) }.toDF("id", "w")
    val got = df.select(col("id"), Bpe.encodeExpr(col("w"), merges).as("t"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    words.zipWithIndex.foreach { case (w, i) =>
      assert(got(i.toLong) == refEncode(w, merges),
        s"word '$w': ${got(i.toLong)} vs ${refEncode(w, merges)}")
    }
    // the boundary case exercised: 5 a's -> [aa, a, aa] under sweep semantics
    assert(refEncode("aaaaa", merges) == Seq("aa", "a", "aa"))
  }

  test("learned tokens reconstruct every word losslessly; training is deterministic") {
    val m1 = Bpe.learn(docs, "doc_id", "text", numMerges = 40)
    val m2 = Bpe.learn(docs, "doc_id", "text", numMerges = 40)
    assert(m1 == m2)
    val bad = docs.select(explode(split(col("text"), " ")).as("w"))
      .where(col("w") =!= "").distinct()
      .select(col("w"), Bpe.decodeWord(Bpe.encodeExpr(col("w"), m1)).as("back"))
      .where(col("w") =!= col("back"))
    assert(bad.count() == 0)
  }

  test("encodeIds: dense ids by frequency, id-decoded sequences reconstruct the doc") {
    val merges = Bpe.learn(docs, "doc_id", "text", numMerges = 20)
    val ids = Bpe.tokenIds(docs, "doc_id", "text", merges)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // dense 0..V-1, rank order = (freq desc, token asc)
    assert(ids.values.toSeq.sorted == (0L until ids.size).toSeq)
    val back = ids.map(_.swap)
    val seqs = Bpe.encodeIds(docs, "doc_id", "text", merges)
      .collect().groupBy(_.getLong(0))
      .map { case (id, rs) =>
        id -> rs.sortBy(_.getLong(1)).map(r => back(r.getLong(2))).mkString("")
      }
    val want = docs.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ").filter(_.nonEmpty).mkString(""))
      .toMap
    assert(seqs == want, "id-decoded concatenation must equal the space-stripped doc")
  }

  test("encode emits word-major positions; frequencies agree with encode") {
    val merges = Bpe.learn(docs, "doc_id", "text", numMerges = 20)
    val enc = Bpe.encode(docs.limit(50), "doc_id", "text", merges)
    // positions are dense per doc
    val holes = enc.groupBy("doc_id")
      .agg(count(lit(1)).as("n"), max("pos").as("mx"), min("pos").as("mn"))
      .where(col("mn") =!= 0 || col("mx") =!= col("n") - 1)
    assert(holes.count() == 0)
    val viaEncode = Bpe.encode(docs, "doc_id", "text", merges)
      .groupBy("token").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val viaFreq = Bpe.tokenFrequencies(docs, "doc_id", "text", merges)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(viaEncode == viaFreq)
  }
}
