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

  // byte-level reference twin: symbols are uppercase hex pairs of the
  // word's UTF-8 bytes; merge loop/encode semantics identical
  private def hexSyms(w: String): Seq[String] =
    w.getBytes(java.nio.charset.StandardCharsets.UTF_8).toSeq
      .map(b => f"${b & 0xff}%02X")
  private def refLearnBytes(words: Map[String, Long], numMerges: Int,
                            minCount: Long = 2L): Seq[(String, String)] = {
    var repr: Map[String, Long] = words.map { case (w, n) =>
      (hexSyms(w).mkString(" ", " ", " "), n)
    }
    val out = scala.collection.mutable.ArrayBuffer[(String, String)]()
    var go = true
    while (go && out.size < numMerges) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      repr.foreach { case (r, n) =>
        r.trim.split(" ").sliding(2).foreach {
          case Array(a, b) => counts((a, b)) = counts.getOrElse((a, b), 0L) + n
          case _ =>
        }
      }
      counts.toSeq.sortBy { case ((a, b), c) => (-c, a, b) }.headOption match {
        case Some(((a, b), c)) if c >= minCount =>
          out += ((a, b))
          repr = repr.map { case (r, n) => (r.replace(s" $a $b ", s" $a$b "), n) }
        case _ => go = false
      }
    }
    out.toSeq
  }
  private def refEncodeBytes(word: String, merges: Seq[(String, String)]): Seq[String] = {
    var r = hexSyms(word).mkString(" ", " ", " ")
    merges.foreach { case (a, b) => r = r.replace(s" $a $b ", s" $a$b ") }
    r.trim.split(" ").toSeq
  }

  test("byte-level learn matches the reference implementation; encode matches the sweep") {
    val got = Bpe.learnBytes(docs, "doc_id", "text", numMerges = 20)
    val words = docs.select(explode(split(col("text"), " ")).as("w"))
      .where(col("w") =!= "").groupBy("w").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val want = refLearnBytes(words, 20)
    assert(got == want, s"\ngot:  $got\nwant: $want")
    import spark.implicits._
    val sample = words.keys.toSeq.sorted.take(40) ++ Seq("héllo", "日本", "x")
    val df = sample.zipWithIndex.map { case (w, i) => (i.toLong, w) }.toDF("id", "w")
    val enc = df.select(col("id"), Bpe.encodeBytesExpr(col("w"), got).as("t"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    sample.zipWithIndex.foreach { case (w, i) =>
      assert(enc(i.toLong) == refEncodeBytes(w, got),
        s"word '$w': ${enc(i.toLong)} vs ${refEncodeBytes(w, got)}")
    }
  }

  test("byte alphabet: no OOV — unseen unicode words encode and decode losslessly") {
    import spark.implicits._
    val merges = Bpe.learnBytes(docs, "doc_id", "text", numMerges = 40)
    // none of these appear in the training corpus; the char alphabet would
    // surface novel symbols, the byte alphabet covers them by construction
    val unseen = Seq("héllo", "naïve", "日本語のテキスト", "🚀🚀", "Ω≈ç√", "mixedé日x")
    val df = unseen.zipWithIndex.map { case (w, i) => (i.toLong, w) }.toDF("id", "w")
    val back = df.select(col("id"), col("w"),
        Bpe.decodeBytesWord(Bpe.encodeBytesExpr(col("w"), merges)).as("back"))
      .where(col("w") =!= col("back"))
    assert(back.count() == 0, "byte-level reconstruction must be lossless on unseen words")
    // every emitted token is even-length hex (whole bytes)
    val toks = df.select(explode(Bpe.encodeBytesExpr(col("w"), merges)).as("t"))
      .collect().map(_.getString(0))
    assert(toks.nonEmpty && toks.forall(t => t.length % 2 == 0 &&
      t.forall(c => c.isDigit || ('A' to 'F').contains(c))), toks.mkString(","))
  }

  test("byte-level encodeIds: dense ids, id-decoded sequences reconstruct every doc") {
    val merges = Bpe.learnBytes(docs, "doc_id", "text", numMerges = 20)
    val ids = Bpe.tokenIdsBytes(docs, "doc_id", "text", merges)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(ids.values.toSeq.sorted == (0L until ids.size).toSeq)
    val back = ids.map(_.swap)
    def unhexStr(h: String): String = new String(
      h.grouped(2).map(p => Integer.parseInt(p, 16).toByte).toArray, "UTF-8")
    val seqs = Bpe.encodeIdsBytes(docs, "doc_id", "text", merges)
      .collect().groupBy(_.getLong(0))
      .map { case (id, rs) =>
        id -> unhexStr(rs.sortBy(_.getLong(1)).map(r => back(r.getLong(2))).mkString(""))
      }
    val want = docs.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ").filter(_.nonEmpty).mkString(""))
      .toMap
    assert(seqs == want, "id-decoded hex concatenation must rebuild the space-stripped doc")
  }

  test("byte-level corpus reconstruction + determinism over the full corpus") {
    val m1 = Bpe.learnBytes(docs, "doc_id", "text", numMerges = 40)
    val m2 = Bpe.learnBytes(docs, "doc_id", "text", numMerges = 40)
    assert(m1 == m2)
    val bad = docs.select(explode(split(col("text"), " ")).as("w"))
      .where(col("w") =!= "").distinct()
      .select(col("w"), Bpe.decodeBytesWord(Bpe.encodeBytesExpr(col("w"), m1)).as("back"))
      .where(col("w") =!= col("back"))
    assert(bad.count() == 0)
    // frequency view agrees with per-doc encode (the registry row's shape)
    val viaEncode = Bpe.encodeBytes(docs, "doc_id", "text", m1)
      .groupBy("token").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val viaFreq = Bpe.tokenFrequenciesBytes(docs, "doc_id", "text", m1)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(viaEncode == viaFreq)
  }
}
