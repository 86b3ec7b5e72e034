package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer — learned on the cluster, applied as pure
  * codegen. The missing piece between [[TextOps.buildVocab]] (whole-word
  * vocabulary) and a trainable LLM pipeline: subword units.
  *
  * Shape (the industrial one, cf. the word-count-first design of public BPE
  * trainers): the corpus collapses ONCE to a `(word, n)` table — bounded by
  * the vocabulary, not the corpus — which is collected, and the merge loop
  * runs in-process over it: per iteration, one weighted pair count and one
  * literal `replace` sweep over at most `maxWords` strings. At 100 TB the
  * corpus is touched exactly once (the word count); the merge rounds cost
  * driver CPU over the bounded table, zero further jobs.
  *
  * Encoding is a chain of literal `replace` calls over the space-joined
  * character representation — one codegen'd expression, no UDF, no shuffle;
  * the merge list broadcasts inside the plan as string literals, and the
  * SQL oracle replays the identical REPLACE chain.
  *
  * Determinism contract: pair selection is argmax by (count DESC, pair
  * lexicographic ASC) over exact integer counts; merge application is ONE
  * left-to-right non-overlapping `replace` sweep per rule per round —
  * Java/Spark (`UTF8String.replace`) and DuckDB (`replace`) share these
  * semantics including the resume-after-replacement boundary case
  * (unit-pinned on 'a a a a a'). Words must not contain the space
  * separator (they come from a space-split); empty words are dropped.
  */
object Bpe {

  /** The spaced char representation a merge sweep rewrites:
    * `"word"` -> `" w o r d "` (sentinel spaces so every symbol boundary,
    * including the edges, matches `" x y "`). */
  private def spacedChars(word: Column): Column =
    concat(lit(" "), concat_ws(" ", split(word, "", 0)), lit(" "))

  /** UTF-8 byte order (Spark's binary string ordering) — the merge
    * tie-break must match what the distributed `orderBy(col.asc)` used, not
    * Java's UTF-16 code-unit order (they diverge above the BMP). */
  private def utf8Less(a: String, b: String): Boolean = {
    val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val n = math.min(x.length, y.length)
    var i = 0
    while (i < n) {
      val c = (x(i) & 0xff) - (y(i) & 0xff)
      if (c != 0) return c < 0
      i += 1
    }
    x.length < y.length
  }

  /** Learn `numMerges` merge rules from the corpus.
    *
    * ONE Spark job total: the corpus collapses to the `(word, n)` table
    * (bounded by the vocabulary, not the corpus — `maxWords` caps it by
    * frequency as a guard, the [[Unigram.learn]] bounded-artifact
    * contract), which is collected once; the merge loop then runs entirely
    * driver-side over those strings. Earlier revisions ran the loop as one
    * Spark aggregation per merge — same exact counts, but numMerges
    * scheduler round-trips made training the priciest registry query; the
    * in-process loop computes the identical argmax (exact integer pair
    * counts; ties by UTF-8-byte pair order, matching Spark's binary string
    * sort) and applies the identical left-to-right `String.replace` sweep
    * (`UTF8String.replace` and DuckDB `replace` share its
    * resume-after-replacement semantics, unit-pinned on 'a a a a a'), so
    * the learned merges are bit-identical to the distributed loop's.
    *
    * `maxWords` only engages above its bound (default 1M distinct words ≈
    * tens of MB collected): past it, merges are learned on the
    * highest-frequency vocabulary slice — the standard trainer practice,
    * and the tail it drops holds singleton-grade counts that cannot win an
    * argmax whose winners sit orders of magnitude higher.
    *
    * @return merges in application order (highest-count first).
    */
  def learn(docs: DataFrame, idCol: String, textCol: String,
            numMerges: Int, minPairCount: Long = 2L,
            maxWords: Int = 1000000): Seq[(String, String)] =
    // the same spaced representation spacedChars builds plan-side:
    // " w o r d " — split("") chunks to code points exactly as Spark's
    // split(col, "", 0) does (both ride Java's regex engine)
    learnWith(docs, textCol, numMerges, minPairCount, maxWords, "merges")(
      w => " " + w.split("").mkString(" ") + " ")

  /** The shared learn skeleton: ONE corpus pass collecting the
    * frequency-capped word table (with the truncation probe), then the
    * driver-side [[mergeLoop]] over `spaced(word)` representations — the
    * char-alphabet [[learn]] and byte-alphabet [[learnBytes]] differ ONLY
    * in `spaced` (and the probe's wording via `what`), so a future fix to
    * the pass or the probe cannot drift between them. */
  private def learnWith(docs: DataFrame, textCol: String, numMerges: Int,
                        minPairCount: Long, maxWords: Int, what: String)
                       (spaced: String => String): Seq[(String, String)] = {
    // corpus -> (word, n): the only pass over the full data. One row past
    // the cap is fetched purely as a TRUNCATION PROBE: when it comes back,
    // the vocabulary exceeded maxWords and the merges are being learned on
    // the highest-frequency slice — say so out loud instead of silently
    // (the caller may want a bigger cap for a byte-exact artifact).
    val rows0 = docs
      .select(explode(graft.functions.Portable.words(col(textCol))).as("w"))
      .where(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("w").asc)
      .limit(maxWords + 1)
      .collect()
    if (rows0.length > maxWords)
      System.err.println(s"[bpe] corpus has more than $maxWords distinct words — " +
        s"$what are learned on the top-" + maxWords + " frequency slice " +
        "(raise maxWords for a full-vocabulary artifact)")
    val rows = rows0.take(maxWords)
    val repr = new Array[String](rows.length)
    val weight = new Array[Long](rows.length)
    var wi = 0
    while (wi < rows.length) {
      repr(wi) = spaced(rows(wi).getString(0))
      weight(wi) = rows(wi).getLong(1)
      wi += 1
    }
    mergeLoop(repr, weight, numMerges, minPairCount)
  }

  /** The driver-side merge loop over spaced symbol representations — shared
    * by the char-alphabet [[learn]] and byte-alphabet [[learnBytes]] (the
    * algorithm is symbol-agnostic: count adjacent pairs weighted by word
    * frequency, argmax by (count DESC, pair UTF-8 ASC), one left-to-right
    * replace sweep per merge). MUTATES `repr` in place. */
  private def mergeLoop(repr: Array[String], weight: Array[Long],
                        numMerges: Int, minPairCount: Long): Seq[(String, String)] = {
    val merges = scala.collection.mutable.ArrayBuffer[(String, String)]()
    var continue = true
    while (continue && merges.size < numMerges) {
      // adjacent symbol pairs of the current representation, weighted by n
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      var wi = 0
      while (wi < repr.length) {
        val syms = repr(wi).trim.split(" ")
        var i = 0
        while (i < syms.length - 1) {
          val k = (syms(i), syms(i + 1))
          counts.update(k, counts.getOrElse(k, 0L) + weight(wi))
          i += 1
        }
        wi += 1
      }
      // argmax by (count DESC, pair UTF-8 ASC) — a linear scan, not a sort
      var bestPair: (String, String) = null
      var bestCnt = Long.MinValue
      counts.foreach { case (p, c) =>
        if (bestPair == null || c > bestCnt ||
          (c == bestCnt && (utf8Less(p._1, bestPair._1) ||
            (p._1 == bestPair._1 && utf8Less(p._2, bestPair._2))))) {
          bestPair = p; bestCnt = c
        }
      }
      if (bestPair == null || bestCnt < minPairCount) continue = false
      else {
        val (x, y) = bestPair
        merges += ((x, y))
        val pat = s" $x $y "
        val rep = s" $x$y "
        var wi2 = 0
        while (wi2 < repr.length) {
          if (repr(wi2).contains(pat)) repr(wi2) = repr(wi2).replace(pat, rep)
          wi2 += 1
        }
      }
    }
    merges.toSeq
  }

  /** The encode expression for one word column: spaced chars, then the merge
    * sweeps in learned order — a single codegen'd literal-replace chain. */
  def encodeExpr(word: Column, merges: Seq[(String, String)]): Column = {
    val swept = merges.foldLeft(spacedChars(word)) { case (r, (x, y)) =>
      call_function("replace", r, lit(s" $x $y "), lit(s" $x$y "))
    }
    split(trim(swept), " ", 0)
  }

  // ---- byte-level alphabet (the GPT-2 family): symbols are UTF-8 BYTES
  //      rendered as fixed-width uppercase hex pairs, so the alphabet is
  //      exactly 256 symbols and NO word is ever out-of-vocabulary — a word
  //      whose characters never appeared at learn time still encodes (to
  //      its byte symbols), where the char alphabet would surface unseen
  //      code points as novel symbols. Merges may cross multi-byte
  //      character boundaries (byte-level merges do); decoding re-parses
  //      hex to bytes, so reconstruction is lossless regardless. Same
  //      merge loop, same replace-chain encode, same SQL-replayable
  //      machinery — hex text is byte-identical across engines. ----

  /** One byte as its fixed-width uppercase hex symbol. */
  private def hexByte(b: Byte): String = f"${b & 0xff}%02X"

  /** The spaced byte representation a merge sweep rewrites:
    * `"ab"` -> `" 61 62 "` (hex pairs; sentinel spaces like
    * [[spacedChars]]). Plan-side twin of the driver-side construction in
    * [[learnBytes]]: `hex` of the UTF-8 bytes, split every two chars. */
  private def spacedBytes(word: Column): Column =
    concat(lit(" "),
      regexp_replace(upper(hex(word.cast("binary"))), "(..)", "$1 "))

  /** [[learn]] over the byte alphabet: identical word-count pass and merge
    * loop; only the initial representation differs (hex byte symbols).
    * The 256-symbol alphabet means zero OOV by construction. */
  def learnBytes(docs: DataFrame, idCol: String, textCol: String,
                 numMerges: Int, minPairCount: Long = 2L,
                 maxWords: Int = 1000000): Seq[(String, String)] =
    learnWith(docs, textCol, numMerges, minPairCount, maxWords, "byte merges")(
      w => w.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        .map(hexByte).mkString(" ", " ", " "))

  /** Byte-level encode expression: spaced hex bytes, then the merge chain —
    * one codegen'd literal-replace chain, like [[encodeExpr]]. */
  def encodeBytesExpr(word: Column, merges: Seq[(String, String)]): Column = {
    val swept = merges.foldLeft(spacedBytes(word)) { case (r, (x, y)) =>
      call_function("replace", r, lit(s" $x $y "), lit(s" $x$y "))
    }
    split(trim(swept), " ", 0)
  }

  /** Byte-level [[encode]]: `(id, pos, token)` with hex-string tokens;
    * same flatten-then-one-posexplode shape — no window, no shuffle,
    * streaming-legal. */
  def encodeBytes(docs: DataFrame, idCol: String, textCol: String,
                  merges: Seq[(String, String)]): DataFrame =
    docs
      .select(col(idCol),
        posexplode(flatten(transform(
          expr(s"filter(split($textCol, ' ', -1), w -> w != '')"),
          w => encodeBytesExpr(w, merges)))).as(Seq("pos", "token")))
      .select(col(idCol), col("pos").cast("long").as("pos"), col("token"))

  /** Corpus token frequencies under byte-level merges — the oracle-checked
    * query shape ([[tokenFrequencies]] twin). */
  def tokenFrequenciesBytes(docs: DataFrame, idCol: String, textCol: String,
                            merges: Seq[(String, String)]): DataFrame =
    docs
      .select(explode(graft.functions.Portable.words(col(textCol))).as("w"))
      .where(col("w") =!= "")
      .select(explode(encodeBytesExpr(col("w"), merges)).as("token"))
      .groupBy("token").agg(count(lit(1)).as("n"))

  /** Decode a word's byte-level tokens: concatenate the hex, parse back to
    * bytes, decode UTF-8 — lossless even when merges crossed multi-byte
    * character boundaries (the hex stream is the byte stream). */
  def decodeBytesWord(tokens: Column): Column =
    decode(unhex(concat_ws("", tokens)), "UTF-8")

  /** Frequency-ranked token-id table over the byte-level vocabulary —
    * [[tokenIds]]'s twin on [[tokenFrequenciesBytes]]. The byte alphabet
    * plus merges bound the vocab at 256 + numMerges, so `maxVocab` is a
    * guard, not a working limit. */
  def tokenIdsBytes(docs: DataFrame, idCol: String, textCol: String,
                    merges: Seq[(String, String)], maxVocab: Int = 65536): DataFrame = {
    val top = tokenFrequenciesBytes(docs, idCol, textCol, merges)
      .orderBy(col("n").desc, col("token").asc).limit(maxVocab)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("n").desc, col("token").asc)
    top.withColumn("token_id", (row_number().over(w) - 1).cast("long"))
      .select("token", "token_id")
  }

  /** The byte-level pretraining capstone — [[encodeIds]] on the no-OOV
    * alphabet: per-doc `(id, pos, token_id)` sequences, word-major
    * positions straight from the flattened array order, ids by a broadcast
    * join. Because the alphabet covers every byte, NO token can miss the
    * id table (unseen-at-learn-time words still fully encode) — the
    * hole-instead-of-renumber caveat [[encodeIds]] documents cannot arise
    * below `maxVocab`. */
  def encodeIdsBytes(docs: DataFrame, idCol: String, textCol: String,
                     merges: Seq[(String, String)], maxVocab: Int = 65536): DataFrame =
    encodeBytes(docs, idCol, textCol, merges)
      .join(broadcast(tokenIdsBytes(docs, idCol, textCol, merges, maxVocab)
        .select(col("token"), col("token_id"))), Seq("token"))
      .select(col(idCol), col("pos"), col("token_id"))

  /** Encode every document: `(id, pos, token)` rows — token positions are
    * word-major (whole-doc token order), empty words dropped. The per-word
    * token arrays FLATTEN before the single posexplode, so positions come
    * straight from array order: one generate + one codegen'd replace chain,
    * no window, NO SHUFFLE AT ALL — which also makes it legal inside a
    * streaming micro-batch. */
  def encode(docs: DataFrame, idCol: String, textCol: String,
             merges: Seq[(String, String)]): DataFrame =
    docs
      .select(col(idCol),
        posexplode(flatten(transform(
          expr(s"filter(split($textCol, ' ', -1), w -> w != '')"),
          w => encodeExpr(w, merges)))).as(Seq("pos", "token")))
      .select(col(idCol), col("pos").cast("long").as("pos"), col("token"))

  /** Corpus token frequencies under the learned merges — the compact
    * whole-corpus view (and the oracle-checked query shape). */
  def tokenFrequencies(docs: DataFrame, idCol: String, textCol: String,
                       merges: Seq[(String, String)]): DataFrame =
    docs
      .select(explode(graft.functions.Portable.words(col(textCol))).as("w"))
      .where(col("w") =!= "")
      .select(explode(encodeExpr(col("w"), merges)).as("token"))
      .groupBy("token").agg(count(lit(1)).as("n"))

  /** Decode = concatenate a word's tokens (the representation is lossless
    * within a word; document reconstruction re-joins with spaces). */
  def decodeWord(tokens: Column): Column = concat_ws("", tokens)

  /** Frequency-ranked token-id table for the learned subword vocabulary:
    * top-`maxVocab` tokens by (count DESC, token ASC), dense 0-based ids —
    * the subword sibling of `TextOps.rankVocab` (same driver-bounded
    * window-after-limit shape; a BPE vocab is chars+merges, so `maxVocab`
    * is a guard, not a working limit). */
  def tokenIds(docs: DataFrame, idCol: String, textCol: String,
               merges: Seq[(String, String)], maxVocab: Int = 65536): DataFrame = {
    val top = tokenFrequencies(docs, idCol, textCol, merges)
      .orderBy(col("n").desc, col("token").asc).limit(maxVocab)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("n").desc, col("token").asc)
    top.withColumn("token_id", (row_number().over(w) - 1).cast("long"))
      .select("token", "token_id")
  }

  /** The pretraining-data capstone: corpus -> per-doc token-ID sequences.
    * `(id, pos, token_id)` with `pos` the whole-doc subword position
    * (word-major, straight from the flattened array order — [[encode]] is
    * window- and shuffle-free; positions are assigned BEFORE the id join,
    * so a hypothetical over-`maxVocab` OOV drop leaves holes rather than
    * renumbering). Plan: the map-only encode chain + a broadcast id join —
    * no corpus-sized shuffle at all. */
  def encodeIds(docs: DataFrame, idCol: String, textCol: String,
                merges: Seq[(String, String)], maxVocab: Int = 65536): DataFrame =
    encodeWithIds(docs, idCol, textCol, merges,
      tokenIds(docs, idCol, textCol, merges, maxVocab))

  /** [[encodeIds]] against a PRE-BUILT id table — the deployment shape:
    * merges and ids are the persisted tokenizer artifact, and encoding is a
    * pure map + broadcast join, so it runs unchanged inside a streaming
    * micro-batch (tokenize the crawl as it arrives). */
  def encodeWithIds(docs: DataFrame, idCol: String, textCol: String,
                    merges: Seq[(String, String)], ids: DataFrame): DataFrame =
    encode(docs, idCol, textCol, merges)
      .join(broadcast(ids.select(col("token"), col("token_id"))), Seq("token"))
      .select(col(idCol), col("pos"), col("token_id"))
}
