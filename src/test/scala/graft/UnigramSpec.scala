package graft

import org.apache.spark.sql.functions._

import graft.operators.Unigram

class UnigramSpec extends SparkTestBase {

  private def corpus(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("learn: lossless segmentation, alphabet coverage, vocab bound, determinism") {
    val docs = corpus(
      (0L, "international internet interface face book facebook inter national"),
      (1L, "the internet the interface the face the facebook"),
      (2L, "inter inter inter net net face face national"))
    val m = Unigram.learn(docs, "doc_id", "text", vocabSize = 30, iters = 3)
    // every trained word reconstructs exactly from its pieces
    m.wordPieces.foreach { case (w, ps) =>
      assert(ps.mkString("") == w, s"$w segmented lossily: $ps")
      assert(ps.forall(p => m.pieceIds.contains(p)),
        s"$w uses a piece outside the final vocabulary: $ps")
    }
    // the alphabet is never pruned
    val alphabet = m.wordPieces.map(_._1).flatMap(_.map(_.toString)).toSet
    alphabet.foreach(c => assert(m.pieceIds.contains(c), s"alphabet char '$c' pruned"))
    // vocab lands at most vocabSize + alphabet
    assert(m.pieces.size <= 30 + alphabet.size)
    // frequent substrings survive as multi-char pieces (the point of unigram)
    assert(m.pieces.exists(_._1.length > 1), m.pieces.toString)
    // bit-deterministic
    val m2 = Unigram.learn(docs, "doc_id", "text", vocabSize = 30, iters = 3)
    assert(m.pieces == m2.pieces && m.wordPieces == m2.wordPieces)
  }

  test("viterbi picks the maximum-likelihood split (vs exhaustive enumeration)") {
    val docs = corpus((0L, ("ab " * 50 + "abc " * 3 + "c " * 10).trim))
    val m = Unigram.learn(docs, "doc_id", "text", vocabSize = 8, iters = 2,
      maxPieceLen = 3)
    val lp = {
      val total = m.pieces.map(_._2).sum.toDouble
      m.pieces.map { case (p, n) =>
        p -> (StrictMath.log(n.toDouble) - StrictMath.log(total)) }.toMap
    }
    // exhaustive best score over all segmentations of "abc"
    def allSegs(w: String): Seq[Seq[String]] =
      if (w.isEmpty) Seq(Seq.empty)
      else (1 to w.length).flatMap { k =>
        val (h, t) = w.splitAt(k)
        if (lp.contains(h)) allSegs(t).map(h +: _) else Seq.empty
      }
    val bestScore = allSegs("abc").map(_.map(lp).sum).max
    val got = m.segmentation("abc").map(lp).sum
    assert(math.abs(got - bestScore) < 1e-12,
      s"viterbi ${m.segmentation("abc")} score $got != exhaustive best $bestScore")
  }

  test("encode: composite (wi, pj) order, OOV word char-fallback, OOV piece drop") {
    import spark.implicits._
    val docs = corpus((0L, "facebook inter"), (1L, "inter zzq"))
    val train = corpus((0L, "facebook inter face book inter face book"))
    val m = Unigram.learn(train, "doc_id", "text", vocabSize = 12, iters = 2)
    val enc = Unigram.encode(docs, "doc_id", "text", m)
      .orderBy("doc_id", "wi", "pj")
      .as[(Long, Long, Long, String)].collect()
    // reconstruction: concatenating pieces in (wi, pj) order re-yields the text
    val byDoc = enc.groupBy(_._1).view.map { case (d, rows) =>
      d -> rows.sortBy(r => (r._2, r._3)).groupBy(_._2).toSeq.sortBy(_._1)
        .map(_._2.sortBy(_._3).map(_._4).mkString("")).mkString(" ")
    }.toMap
    assert(byDoc(0L) == "facebook inter")
    assert(byDoc(1L) == "inter zzq") // 'zzq' untrained: per-char fallback
    val zzq = enc.filter(r => r._1 == 1L && r._2 == 1L).map(_._4)
    assert(zzq.sameElements(Array("z", "z", "q")))
    // encodeIds: 'z'/'q' were never trained => no ids => dropped (holes, no
    // renumbering); trained pieces keep their positions
    val ids = Unigram.encodeIds(docs, "doc_id", "text", m)
      .as[(Long, Long, Long, Long)].collect()
    assert(!ids.exists(r => r._1 == 1L && r._2 == 1L), "untrained chars must drop")
    assert(ids.count(_._1 == 0L) > 0)
    // the encode plan is shuffle-free (broadcast join + generates only)
    val plan = Unigram.encode(docs, "doc_id", "text", m)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange") || plan.contains("BroadcastExchange"),
      s"encode must not shuffle:\n$plan")
    assert(!plan.contains("ShuffleExchange"), plan)
  }

  test("artifact tables round-trip through parquet; table-driven encode equals model encode") {
    import spark.implicits._
    val train = corpus((0L, "alpha beta alphabet bet a ab"), (1L, "beta beta alpha"))
    val m = Unigram.learn(train, "doc_id", "text", vocabSize = 16, iters = 2)
    val dir = tmpDir("unigram-artifact-")
    Unigram.segTable(spark, m).write.parquet(s"$dir/seg")
    Unigram.idTable(spark, m).write.parquet(s"$dir/ids")
    val seg2 = spark.read.parquet(s"$dir/seg")
    val a = Unigram.encodeWithTables(train, "doc_id", "text", seg2)
      .as[(Long, Long, Long, String)].collect().toSet
    val b = Unigram.encode(train, "doc_id", "text", m)
      .as[(Long, Long, Long, String)].collect().toSet
    assert(a == b)
    val ids2 = spark.read.parquet(s"$dir/ids")
      .as[(String, Long)].collect().toMap
    assert(ids2 == m.pieceIds)
  }
}
