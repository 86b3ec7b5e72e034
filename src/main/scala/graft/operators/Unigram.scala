package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Unigram-LM subword tokenizer — the SentencePiece algorithm family,
  * completing the subword pair next to [[Bpe]] (the two algorithms real
  * tokenizers ship). Where BPE grows a vocabulary bottom-up by merging, the
  * unigram model starts from a large seed of candidate pieces and PRUNES:
  * pieces get unigram log-probabilities, words segment by Viterbi
  * (maximum-likelihood split), piece frequencies are recounted from the
  * segmentations, and the lowest-value pieces are dropped until the target
  * vocabulary size — an EM loop.
  *
  * Scale shape (the [[Bpe.learn]] word-count-first discipline taken one
  * step further): the corpus is touched ONCE — collapsed to the top
  * `maxWords` distinct words by count — and the whole EM loop runs
  * DRIVER-SIDE over that bounded table (the same bounded-artifact contract
  * as [[Similarity.kmeansCentroids]] and [[TextClassifier]]: the artifact
  * derives from a deterministic bounded sample; distributed work stays in
  * Spark). Encoding is then a pure map + ONE broadcast join against the
  * word→segmentation table — no shuffle, legal inside a streaming
  * micro-batch; words outside the trained table fall back to per-character
  * pieces (single characters are never pruned, so coverage is total over
  * the trained alphabet).
  *
  * Determinism contract: seed scores and recounts are exact integer sums;
  * log-probabilities use `StrictMath.log` (bit-reproducible across JVMs);
  * Viterbi scans split points high-to-low and accepts only STRICT
  * improvements, so ties resolve identically everywhere; every prune keeps
  * the top pieces by (frequency DESC, piece ASC). Two `learn` calls on the
  * same data return identical models.
  */
object Unigram {

  /** The learned artifact: ranked pieces with their final integer
    * frequencies, and the trained words' Viterbi segmentations. Both halves
    * are plain data — persist as tables, broadcast at encode time. */
  final case class UnigramModel(pieces: Seq[(String, Long)],
                                wordPieces: Seq[(String, Seq[String])]) {
    /** Dense ids in (frequency DESC, piece ASC) rank order. */
    lazy val pieceIds: Map[String, Long] =
      pieces.sortBy { case (p, n) => (-n, p) }.zipWithIndex
        .map { case ((p, _), i) => p -> i.toLong }.toMap
    lazy val segmentation: Map[String, Seq[String]] = wordPieces.toMap
  }

  /** Viterbi best split of `w` under `lp` (piece → log-prob). Pieces up to
    * `maxLen` chars; `lp` must contain every single character of `w`. */
  private def viterbi(w: String, lp: collection.Map[String, Double],
                      maxLen: Int): Seq[String] = {
    val n = w.length
    val best = Array.fill(n + 1)(Double.NegativeInfinity)
    val back = new Array[Int](n + 1)
    best(0) = 0.0
    var j = 1
    while (j <= n) {
      var i = math.max(0, j - maxLen)
      while (i < j) {
        if (best(i) > Double.NegativeInfinity) {
          lp.get(w.substring(i, j)) match {
            case Some(p) =>
              val s = best(i) + p
              // strict improvement only: ties keep the LOWEST split i
              if (s > best(j)) { best(j) = s; back(j) = i }
            case None => ()
          }
        }
        i += 1
      }
      j += 1
    }
    require(best(n) > Double.NegativeInfinity,
      s"word '$w' not segmentable — alphabet piece missing (bug: chars are never pruned)")
    val out = scala.collection.mutable.ArrayBuffer[String]()
    var k = n
    while (k > 0) { out += w.substring(back(k), k); k = back(k) }
    out.reverse.toSeq
  }

  private def logProbs(freq: collection.Map[String, Long]): Map[String, Double] = {
    val total = freq.values.sum.toDouble
    freq.iterator.map { case (p, n) => p -> (StrictMath.log(n.toDouble) - StrictMath.log(total)) }.toMap
  }

  /** Learn a `vocabSize`-piece unigram model.
    *
    * @param maxWords    bound on the driver-side word table: top distinct
    *                    words by (count DESC, word ASC). The one knob that
    *                    makes the EM loop corpus-size-independent.
    * @param maxPieceLen longest candidate piece, in characters.
    * @param iters       EM rounds (each: Viterbi re-segmentation + recount
    *                    + prune toward `vocabSize`). */
  def learn(docs: DataFrame, idCol: String, textCol: String,
            vocabSize: Int, maxWords: Int = 65536, maxPieceLen: Int = 8,
            iters: Int = 3, seedSize: Int = 0): UnigramModel = {
    require(vocabSize >= 1 && maxPieceLen >= 1 && iters >= 1)
    // the ONE corpus pass: bounded word table
    val words: Array[(String, Long)] = docs
      .select(explode(graft.functions.Portable.words(col(textCol))).as("w"))
      .where(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("w").asc).limit(maxWords)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    require(words.nonEmpty, "empty corpus")

    // seed: every substring up to maxPieceLen, scored by weighted occurrence
    val seed = scala.collection.mutable.HashMap[String, Long]()
    words.foreach { case (w, n) =>
      var i = 0
      while (i < w.length) {
        var j = i + 1
        while (j <= math.min(w.length, i + maxPieceLen)) {
          val s = w.substring(i, j)
          seed(s) = seed.getOrElse(s, 0L) + n
          j += 1
        }
        i += 1
      }
    }
    val alphabet: Set[String] = words.flatMap(_._1.map(_.toString)).toSet
    val seedCap = if (seedSize > 0) seedSize else math.max(vocabSize * 4, vocabSize + 256)
    def prune(freq: collection.Map[String, Long], cap: Int): Map[String, Long] = {
      val kept = freq.toSeq.sortBy { case (p, n) => (-n, p) }.take(cap).toMap
      // the alphabet is never pruned — total coverage of trained text
      kept ++ alphabet.iterator.map(c => c -> freq.getOrElse(c, 1L))
    }
    var freq: Map[String, Long] = prune(seed, seedCap)

    // EM: segment under current probs, recount, shrink toward vocabSize
    var it = 0
    while (it < iters) {
      val lp = logProbs(freq)
      val recount = scala.collection.mutable.HashMap[String, Long]()
      words.foreach { case (w, n) =>
        viterbi(w, lp, maxPieceLen).foreach { p =>
          recount(p) = recount.getOrElse(p, 0L) + n
        }
      }
      // geometric shrink: land exactly on vocabSize in the final round
      val cap =
        if (it == iters - 1) vocabSize
        else math.max(vocabSize, (freq.size * 3) / 4)
      freq = prune(recount, cap)
      it += 1
    }
    val lpFinal = logProbs(freq)
    UnigramModel(
      pieces = freq.toSeq.sortBy { case (p, n) => (-n, p) },
      wordPieces = words.toSeq.map { case (w, _) =>
        w -> viterbi(w, lpFinal, maxPieceLen)
      })
  }

  /** The word→segmentation table as a DataFrame (broadcast side of
    * [[encode]]; persist it next to [[idTable]] as the tokenizer
    * artifact). */
  def segTable(spark: SparkSession, model: UnigramModel): DataFrame = {
    import spark.implicits._
    model.wordPieces.toDF("w", "pieces")
  }

  /** (piece, piece_id) in (frequency DESC, piece ASC) rank order. */
  def idTable(spark: SparkSession, model: UnigramModel): DataFrame = {
    import spark.implicits._
    model.pieceIds.toSeq.sortBy(_._2).toDF("piece", "piece_id")
  }

  /** Encode every document against persisted artifact TABLES — the
    * deployment shape (and streaming-legal: one generate, one broadcast
    * join, one generate — NO shuffle, no window).
    *
    * Output `(id, wi, pj, piece)`: `wi` = 0-based index of the word among
    * the doc's non-empty words, `pj` = 0-based piece index inside the word
    * — the composite (wi, pj) IS the document order. Positions are
    * per-word by construction (never a doc-wide renumbering pass), which
    * is what keeps the plan shuffle-free; a trainer consuming flat
    * sequences orders by (wi, pj). Words absent from the segmentation
    * table fall back to per-character pieces (the alphabet is never
    * pruned, so trained characters always resolve to ids). */
  def encodeWithTables(docs: DataFrame, idCol: String, textCol: String,
                       seg: DataFrame): DataFrame =
    docs
      .select(col(idCol),
        posexplode(expr(s"filter(split($textCol, ' ', -1), w -> w != '')"))
          .as(Seq("wi", "w")))
      .join(broadcast(seg.select(col("w"), col("pieces"))), Seq("w"), "left")
      .select(col(idCol), col("wi").cast("long").as("wi"),
        posexplode(coalesce(col("pieces"), split(col("w"), "", 0)))
          .as(Seq("pj", "piece")))
      .select(col(idCol), col("wi"), col("pj").cast("long").as("pj"), col("piece"))

  def encode(docs: DataFrame, idCol: String, textCol: String,
             model: UnigramModel): DataFrame =
    encodeWithTables(docs, idCol, textCol,
      segTable(docs.sparkSession, model))

  /** [[encode]] + the dense piece-id join: `(id, wi, pj, piece_id)` — the
    * corpus a trainer consumes. Pieces without an id (characters never seen
    * in training) are DROPPED, the [[TextOps.applyVocab]] OOV rule;
    * positions are assigned before the join, so drops leave holes rather
    * than renumbering. */
  def encodeIds(docs: DataFrame, idCol: String, textCol: String,
                model: UnigramModel): DataFrame = {
    val spark = docs.sparkSession
    encodeWithTables(docs, idCol, textCol, segTable(spark, model))
      .join(broadcast(idTable(spark, model)), Seq("piece"))
      .select(col(idCol), col("wi"), col("pj"), col("piece_id"))
  }
}
