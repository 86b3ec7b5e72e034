package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer — learned on the cluster, applied as pure
  * codegen. The missing piece between [[TextOps.buildVocab]] (whole-word
  * vocabulary) and a trainable LLM pipeline: subword units.
  *
  * Shape (the industrial one, cf. the word-count-first design of public BPE
  * trainers): the corpus collapses ONCE to a `(word, n)` table — bounded by
  * the vocabulary, not the corpus — and the merge loop iterates over that
  * table only: per iteration, one weighted pair-count aggregation and one
  * literal `replace` sweep. At 100 TB the corpus is touched exactly once
  * (the word count); 40 merge rounds then cost 40 small jobs over millions
  * of distinct words, not the corpus.
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

  /** Learn `numMerges` merge rules from the corpus.
    *
    * @return merges in application order (highest-count first).
    */
  def learn(docs: DataFrame, idCol: String, textCol: String,
            numMerges: Int, minPairCount: Long = 2L): Seq[(String, String)] = {
    // corpus -> (word, n): the only pass over the full data
    val words = docs
      .select(explode(graft.functions.Portable.words(col(textCol))).as("w"))
      .where(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("n"))
    // localCheckpoint (not persist): each round derives the next
    // representation from the last, and without lineage TRUNCATION the plan
    // tree doubles per round — 40 rounds of chained replace turned planning
    // itself into the bottleneck. The word table is tiny relative to the
    // corpus; executor-local blocks are the right durability tradeoff here
    // (a lost executor restarts the cheap merge loop, not the corpus scan).
    var repr = words.select(spacedChars(col("w")).as("r"), col("n"))
      .localCheckpoint()
    val merges = scala.collection.mutable.ArrayBuffer[(String, String)]()
    var lastCheckpoint = repr
    var sinceCheckpoint = 0
    var continue = true
    while (continue && merges.size < numMerges) {
      // adjacent symbol pairs of the current representation, weighted by n
      val best = repr
        .select(split(trim(col("r")), " ", 0).as("a"), col("n"))
        // slice keeps the index list empty for single-symbol words (a bare
        // sequence(0, size-2) would emit [0,-1] there and trip ANSI bounds)
        .select(explode(expr(
          "transform(slice(sequence(0, size(a)), 1, greatest(size(a) - 1, 0)), " +
            "i -> struct(a[i] AS x, a[i+1] AS y))"))
          .as("p"), col("n"))
        .groupBy(col("p.x"), col("p.y")).agg(sum("n").as("cnt"))
        .orderBy(col("cnt").desc, col("x").asc, col("y").asc)
        .limit(1).collect()
      if (best.isEmpty || best.head.getLong(2) < minPairCount) continue = false
      else {
        val (x, y) = (best.head.getString(0), best.head.getString(1))
        merges += ((x, y))
        // chain up to 8 sweeps per checkpoint: truncation keeps planning
        // O(1) per round, but materializing EVERY round doubled the loop's
        // job count — a depth-8 replace chain is still trivially plannable
        val chained = repr.select(
          call_function("replace", col("r"), lit(s" $x $y "), lit(s" $x$y ")).as("r"),
          col("n"))
        sinceCheckpoint += 1
        if (sinceCheckpoint >= 8) {
          repr = chained.localCheckpoint()
          lastCheckpoint.unpersist()
          lastCheckpoint = repr
          sinceCheckpoint = 0
        } else repr = chained
      }
    }
    lastCheckpoint.unpersist()
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
