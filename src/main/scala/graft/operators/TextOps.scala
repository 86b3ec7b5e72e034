package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Portable

/** Text analysis operators for training-data pipelines: token statistics,
  * quality scoring, language identification, document fingerprinting.
  *
  * Everything is built from codegen'd built-in functions (split / regexp /
  * aggregate) — no UDFs — so the whole stage fuses into one pass over the
  * text column and column pruning reaches the Parquet scan.
  */
object TextOps {

  /** Per-language marker stopwords for the stopword-voting language-ID —
    * standard public function-word lists, CULLED to be unambiguous across
    * the five languages: a form shared between two of them ("in", "was",
    * "es", "que", "de", "la", "a", ...) would vote for both, so only forms
    * unique to one list ship (pinned by TextOpsSpec's disjointness test and
    * its ≥95% accuracy floor on a labeled real-language fixture). */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("und", "der", "das", "die", "den", "dem", "ist", "nicht",
      "mit", "ein", "eine", "auch", "für", "von", "zu", "werden", "sind",
      "aber", "wie", "nach", "bei", "aus", "wird", "oder", "durch"),
    "en" -> Seq("the", "and", "of", "to", "is", "that", "it", "for", "with",
      "as", "they", "at", "be", "this", "have", "from", "his", "her", "are",
      "not", "you", "which", "their", "would", "been"),
    "es" -> Seq("y", "los", "las", "el", "está", "pero", "más", "por",
      "para", "con", "una", "del", "al", "muy", "sin", "sobre", "cuando",
      "también", "años", "dos", "entre", "hasta", "desde", "porque", "ya"),
    "fr" -> Seq("et", "les", "dans", "est", "qui", "pas", "avec", "pour",
      "nous", "vous", "être", "cette", "mais", "aussi", "leur", "sont",
      "fait", "comme", "tout", "ses", "plus", "même", "bien", "où", "ces"),
    "zh" -> Seq("的", "是", "了", "在", "有", "我", "他", "这", "中", "大",
      "为", "上", "个", "国", "说", "们", "和", "不", "就", "人"))

  /** Per-language marker CHARACTER CLASSES — the character-distribution half
    * of the language-ID signal (the reference of the mechanism: CLD-style
    * script detection). One regex character class per language, counted over
    * the raw text, so space-free scripts (zh) and short texts with few
    * function words still identify. Classes are pairwise disjoint like the
    * word lists (é lands in neither es nor fr — both use it heavily; ü is
    * German-only here, culled from es). Patterns use only plain classes and
    * `\x{...}` code points — identical semantics in Java regex (Spark) and
    * RE2 (DuckDB). Empty = no character signal (en: ASCII is everyone's
    * substrate, so it gets none). */
  val langCharClasses: Seq[(String, String)] = Seq(
    "de" -> "[äöüßÄÖÜ]",
    "en" -> "",
    "es" -> "[ñ¿¡ÑáíóúÁÍÓÚ]",
    "fr" -> "[èêçàùûîôœëÈÊÇÀÙ]",
    "zh" -> "[\\x{4e00}-\\x{9fff}]")

  /** Total token characters: for a single-char-separator split this is
    * exactly `length(text) - (n_tokens - 1)` (the separators partition the
    * string), so no higher-order fold over the token array is needed — the
    * HOF lambda runs interpreted and its Janino/JIT compile once dominated
    * the quality-gate queries' first run. Exact for any content, including
    * empty tokens from repeated separators. */
  private def tokenChars(textCol: String, nTok: Column): Column =
    length(col(textCol)).cast("long") - nTok + 1L

  /** Token statistics: counts, distinct counts, average token length. */
  def tokenStats(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = Portable.words(col(textCol))
    val nTok = size(toks).cast("long")
    docs.select(
      col(idCol),
      length(col(textCol)).cast("long").as("n_chars"),
      nTok.as("n_tokens"),
      size(array_distinct(toks)).cast("long").as("n_distinct"),
      (tokenChars(textCol, nTok) / nTok).as("avg_token_len"))
  }

  /** Quality-score features: length, lexical diversity, digit/punct/stopword
    * ratios — the usual cheap filters before expensive pipeline stages. */
  def qualityScore(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = Portable.words(col(textCol))
    val nTok = size(toks).cast("long")
    val stop = langMarkers.flatMap(_._2)
    docs.select(
      col(idCol),
      nTok.as("n_tokens"),
      (size(array_distinct(toks)).cast("double") / nTok).as("lexical_diversity"),
      (size(filter(toks, t => t.isin(stop.map(x => x: Any): _*))).cast("double") / nTok)
        .as("stopword_ratio"),
      (size(regexp_extract_all(col(textCol), lit("[0-9]"), lit(0))).cast("double")
        / length(col(textCol))).as("digit_ratio"),
      (size(regexp_extract_all(col(textCol), lit("[.!?,;:]"), lit(0))).cast("double")
        / length(col(textCol))).as("punct_ratio"))
  }

  /** Language ID via marker-stopword voting PLUS a character-class signal:
    * `score(lang) = marker-token occurrences + marker-character occurrences`
    * ([[langMarkers]] + [[langCharClasses]]); prediction = argmax,
    * alphabetical tie-break. The two signals cover each other's blind spots
    * — function words identify space-separated text, character classes
    * identify space-free scripts (zh) and short texts — and both are plain
    * codegen'd counting, engine-portable to the SQL oracle. Accuracy is
    * pinned ≥95% on a labeled REAL-language fixture in TextOpsSpec (the
    * synthetic corpus's text is language-blind; the oracle row there checks
    * the mechanism, the fixture checks the signal). */
  def languageId(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = Portable.words(col(textCol))
    val classes = langCharClasses.toMap
    val scored = docs.select(
      (col(idCol) +: langMarkers.map { case (lang, markers) =>
        val words =
          size(filter(toks, t => t.isin(markers.map(x => x: Any): _*))).cast("long")
        val cls = classes.getOrElse(lang, "")
        val chars =
          if (cls.isEmpty) lit(0L)
          else size(regexp_extract_all(col(textCol), lit(cls), lit(0))).cast("long")
        (words + chars).as(s"s_$lang")
      }): _*)
    // argmax with alphabetical tie-break: first lang whose score >= all others
    val langs = langMarkers.map(_._1)
    val pred = langs.foldRight(lit(langs.last): Column) { (lang, rest) =>
      val ge = langs.filter(_ != lang).map(o => col(s"s_$lang") >= col(s"s_$o")).reduce(_ && _)
      when(ge, lit(lang)).otherwise(rest)
    }
    scored.select(col(idCol) +: pred.as("lang_pred") +: langs.map(l => col(s"s_$l")): _*)
  }

  /** The one canonicalization chain behind [[fingerprint]], [[normalize]] and
    * [[tfidfTopTerms]]: lowercase, replace non-alphanumeric runs with
    * `replacement` (`""` = delete, `" "` = word-boundary-preserving),
    * optionally fold digits to `0`, collapse space runs, trim. The two
    * parameters are the ONLY deliberate differences between the callers —
    * keep divergence here, not in per-caller regex copies. ASCII-safe
    * patterns: identical output under Java regex and the SQL oracles. */
  private def canonical(c: Column, replacement: String,
                        foldDigits: Boolean): Column = {
    val stripped = regexp_replace(lower(c), "[^a-z0-9 ]+", replacement)
    val folded = if (foldDigits) regexp_replace(stripped, "[0-9]", "0") else stripped
    trim(regexp_replace(folded, " +", " "))
  }

  /** Document fingerprints: md5 of whitespace/punctuation-normalized text
    * (robust to formatting noise) + a 60-bit content hash for compact joins. */
  def fingerprint(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val norm = canonical(col(textCol), "", foldDigits = false)
    docs.select(
      col(idCol),
      md5(norm.cast("binary")).as("fp_md5"),
      Portable.hash60(norm).as("fp60"))
  }

  /** Token counting with a BPE-ish regex segmentation: word pieces, number
    * runs, and single non-alphanumeric marks counted separately (an estimator
    * for LLM token budgets). */
  def tokenCounts(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(
      col(idCol),
      size(regexp_extract_all(col(textCol), lit("[a-zA-Z]+"), lit(0))).cast("long").as("n_words"),
      size(regexp_extract_all(col(textCol), lit("[0-9]+"), lit(0))).cast("long").as("n_numbers"),
      size(regexp_extract_all(col(textCol), lit("[^a-zA-Z0-9 ]"), lit(0))).cast("long").as("n_marks"),
      (size(regexp_extract_all(col(textCol), lit("[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]"), lit(0)))
        ).cast("long").as("n_bpe_ish"))

  /** Vocabulary building — the frequency-ranked token table a tokenizer
    * trainer (or an id-encoding export) starts from: whitespace tokens
    * counted corpus-wide, ranked by (occurrences desc, term asc), the top
    * `maxSize` assigned dense ids `0..maxSize-1` in rank order. Emits
    * `(term, n_occ, n_docs, token_id)` — all-integer, deterministic.
    *
    * Plan at corpus scale: explode → ONE hash aggregate with map-side
    * combine (shuffle carries distinct terms); the doc frequency rides the
    * same aggregate as a count-distinct. The rank is a top-`maxSize`
    * (`TakeOrderedAndProject`, never a corpus-wide sort), and the id window
    * runs over the LIMITED result — `maxSize` rows, driver-bounded, which
    * the registry plan sweep recognizes as bounded input. */
  def buildVocab(docs: DataFrame, idCol: String, textCol: String,
                 maxSize: Int, minCount: Long = 1L): DataFrame =
    rankVocab(vocabStats(docs, idCol, textCol), maxSize, minCount)

  /** The UNBOUNDED per-term statistics under [[buildVocab]]: `(term, n_occ,
    * n_docs)` for every corpus token — the mergeable form. Shard stats built
    * over doc-disjoint shards merge by [[vocabStatsMerge]] (occurrences sum;
    * doc frequencies sum BECAUSE the doc sets are disjoint), and ranking the
    * merged stats equals building on the union (law unit-pinned). Persist
    * shard stats — NOT ranked shard vocabs: a top-`maxSize` cut before the
    * merge would lose tail counts that the merged ranking needs. */
  def vocabStats(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    OpUtil.rebalance(docs)
      .select(col(idCol).as("doc"), explode(split(col(textCol), " ")).as("term"))
      .where(col("term") =!= "")
      .groupBy("term")
      .agg(count(lit(1)).as("n_occ"), count_distinct(col("doc")).as("n_docs"))

  /** Merge doc-disjoint shard [[vocabStats]]: per-term sums. */
  def vocabStatsMerge(shards: Seq[DataFrame]): DataFrame = {
    require(shards.nonEmpty, "need at least one shard")
    shards.reduce(_.unionByName(_)).groupBy("term")
      .agg(sum("n_occ").as("n_occ"), sum("n_docs").as("n_docs"))
  }

  /** Rank [[vocabStats]] into the final vocab: top-`maxSize` by
    * (occurrences desc, term asc) with dense rank-order ids. */
  def rankVocab(stats: DataFrame, maxSize: Int, minCount: Long = 1L): DataFrame = {
    require(maxSize > 0, "maxSize must be positive")
    val top = stats.where(col("n_occ") >= minCount)
      .orderBy(col("n_occ").desc, col("term").asc).limit(maxSize)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("n_occ").desc, col("term").asc)
    top.withColumn("token_id", (row_number().over(w) - 1).cast("long"))
  }

  /** Encode documents against a [[buildVocab]] table: every in-vocabulary
    * token occurrence becomes `(idCol, pos, token_id)` with `pos` the
    * 0-based token position in the raw whitespace split (empty tokens hold
    * their position but emit nothing; out-of-vocabulary tokens are dropped
    * — add an explicit UNK row to the vocab to keep them). The vocab is
    * `maxSize` rows, so the join broadcasts; the explode is a pure map
    * stage — no corpus shuffle at any size. */
  def applyVocab(docs: DataFrame, vocab: DataFrame, idCol: String,
                 textCol: String): DataFrame =
    OpUtil.rebalance(docs)
      .select(col(idCol), posexplode(split(col(textCol), " ")).as(Seq("pos", "term")))
      .where(col("term") =!= "")
      .join(broadcast(vocab.select(col("term"), col("token_id"))), Seq("term"))
      .select(col(idCol), col("pos").cast("long").as("pos"), col("token_id"))

  /** Redaction patterns, ordered (URLs before emails before bare numbers so
    * a URL's digits aren't re-tagged). RE2-safe character classes only —
    * identical semantics in Java regex and the SQL oracle's engine. */
  val redactions: Seq[(String, String)] = Seq(
    "https?://[^ ]+" -> "<URL>",
    "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z][A-Za-z]+" -> "<EMAIL>",
    "[0-9]+" -> "<NUM>")

  /** CCNet-style text normalization for dedup / fingerprint keys: lowercase,
    * strip runs of non-alphanumerics to a single space, optionally fold
    * every digit to `0` (CCNet's digit normalization — "page 17" and
    * "page 42" hash identically), collapse space runs, trim. The canonical
    * form feeds [[Dedup.exact]] / [[fingerprint]] / shingle hashing so
    * casing and punctuation differences stop defeating exact dedup.
    *
    * One codegen'd projection — no shuffle, no UDF. Patterns are
    * ASCII-safe, so an independent SQL engine reproduces the output
    * byte-for-byte (accent folding needs ICU collation and is deliberately
    * out of scope; non-ASCII characters strip to a space like any other
    * non-alphanumeric). Emits `(idCol, text_norm)`. */
  def normalize(docs: DataFrame, idCol: String, textCol: String,
                foldDigits: Boolean = true): DataFrame =
    docs.select(col(idCol),
      canonical(col(textCol), " ", foldDigits).as("text_norm"))

  /** PII-style scrubbing: URLs, email addresses and digit runs replaced with
    * typed placeholder tokens — the standard cheap redaction pass before
    * training-data export. One codegen'd projection, no UDFs. */
  def redact(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val scrubbed = redactions.foldLeft(col(textCol)) {
      case (c, (pat, repl)) => regexp_replace(c, pat, repl)
    }
    docs.select(col(idCol), scrubbed.as("text_redacted"))
  }

  /** Context-length capping: keep the first `maxTokens` whitespace tokens —
    * the usual truncation step before tokenizer/packing stages. */
  def truncateTokens(docs: DataFrame, idCol: String, textCol: String,
                     maxTokens: Int): DataFrame = {
    val toks = Portable.words(col(textCol))
    docs.select(col(idCol),
      array_join(slice(toks, 1, maxTokens), " ").as("text_truncated"),
      least(size(toks), lit(maxTokens)).cast("long").as("n_tokens_kept"))
  }

  /** Sliding-window chunking: split each document into `chunkSize`-token
    * chunks overlapping by `overlap` tokens (stride = chunkSize − overlap) —
    * the standard long-document windowing before tokenization, the
    * truncation-free alternative to [[truncateTokens]]. Chunk `i` covers
    * tokens `[i·stride, i·stride + chunkSize)`; the final chunk is short
    * rather than padded, every token is covered, and chunk count is
    * `1 + ceil(max(n − chunkSize, 0) / stride)` — integer arithmetic, so any
    * SQL engine reproduces the split bit-for-bit. One generate (explode of a
    * computed sequence), no shuffle: chunking a 100 TB corpus is a pure
    * map stage. */
  def chunkTokens(docs: DataFrame, idCol: String, textCol: String,
                  chunkSize: Int, overlap: Int = 0): DataFrame = {
    require(chunkSize > 0 && overlap >= 0 && overlap < chunkSize,
      "need 0 <= overlap < chunkSize")
    val stride = (chunkSize - overlap).toLong
    docs
      .withColumn("_toks", Portable.words(col(textCol)))
      .withColumn("_n", size(col("_toks")).cast("long"))
      .withColumn("_c", lit(1L) + call_function("div",
        greatest(col("_n") - chunkSize, lit(0L)) + (stride - 1), lit(stride)))
      .withColumn("chunk_id", explode(sequence(lit(0L), col("_c") - 1)))
      .withColumn("n_tokens",
        least(col("_n") - col("chunk_id") * stride, lit(chunkSize.toLong)))
      .withColumn("chunk", array_join(slice(col("_toks"),
        (col("chunk_id") * stride + 1).cast("int"), lit(chunkSize)), " "))
      .select(col(idCol), col("chunk_id"), col("n_tokens"), col("chunk"))
  }

  /** Repetition signals — the Gopher/C4-style quality rules that catch
    * boilerplate and degenerate generations: the share of the single most
    * frequent word n-gram among all n-gram occurrences (`top_ngram_frac`)
    * and the fraction of occurrences that repeat an already-seen n-gram
    * (`dup_ngram_frac`). Both 0.0 for docs with fewer than n words.
    *
    * Plan shape at corpus scale: explode n-grams, one hash aggregate on
    * (doc, gram) with map-side combine, one per-doc rollup — shuffles carry
    * per-doc-distinct grams, never raw occurrences; no window over the whole
    * corpus, no driver-side work. */
  /** Web-curation domain signals: the host of every URL occurrence, exploded
    * to (id, domain) rows. Feed [[domainStats]] (or a blocklist anti-join /
    * per-domain cap) — the standard provenance step of web-corpus curation. */
  def urlDomains(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    OpUtil.rebalance(docs).select(col(idCol),
      explode(regexp_extract_all(col(textCol), lit("https?://([^/ ]+)"), lit(1)))
        .as("domain"))

  /** Per-domain rollup over [[urlDomains]]: distinct documents and total URL
    * occurrences per host — one hash aggregate with map-side combine. */
  def domainStats(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    urlDomains(docs, idCol, textCol).groupBy("domain")
      .agg(count_distinct(col(idCol)).as("n_docs"), count(lit(1)).as("n_urls"))

  /** Composite C4/Gopher-style quality gate — the cheap document filters a
    * curation pipeline runs before any expensive stage, folded into ONE
    * codegen'd pass over the text column (no shuffle, no join). Each document
    * either passes (`keep = true`, `drop_reason` NULL) or carries the FIRST
    * failed rule's name — the audit trail that lets drop rates be monitored
    * per source/language downstream.
    *
    * Rule shapes follow the published heuristics (Gopher quality table / C4
    * §2.2): token-count bounds, mean-token-length bounds, digit-character
    * ratio cap, stopword-ratio floor, lexical-diversity (distinct/total
    * tokens) floor. Thresholds are parameters. */
  def qualityFilter(docs: DataFrame, idCol: String, textCol: String,
                    minTokens: Int = 50, maxTokens: Int = 100000,
                    minAvgTokenLen: Double = 3.0, maxAvgTokenLen: Double = 10.0,
                    maxDigitRatio: Double = 0.2,
                    minStopwordRatio: Double = 0.0,
                    minLexicalDiversity: Double = 0.0): DataFrame = {
    val toks = Portable.words(col(textCol))
    val nTok = size(toks).cast("long")
    val avgLen = tokenChars(textCol, nTok).cast("double") / nTok
    val stop = langMarkers.flatMap(_._2)
    val stopRatio = size(filter(toks, t => t.isin(stop.map(x => x: Any): _*)))
      .cast("double") / nTok
    val digitRatio = size(regexp_extract_all(col(textCol), lit("[0-9]"), lit(0)))
      .cast("double") / length(col(textCol))
    val lexDiv = size(array_distinct(toks)).cast("double") / nTok
    val reason = when(nTok < minTokens, "too_short")
      .when(nTok > maxTokens, "too_long")
      .when(avgLen < minAvgTokenLen, "short_tokens")
      .when(avgLen > maxAvgTokenLen, "long_tokens")
      .when(digitRatio > maxDigitRatio, "digit_heavy")
      .when(stopRatio < minStopwordRatio, "no_stopwords")
      .when(lexDiv < minLexicalDiversity, "repetitive")
      .otherwise(lit(null).cast("string"))
    docs.select(col(idCol), reason.as("drop_reason"), reason.isNull.as("keep"))
  }

  /** TF-IDF top-`k` terms per document — keyword extraction for corpus
    * exploration and topic-balanced sampling. Terms come from the same
    * normalization as [[fingerprint]] (lower, strip non-alnum, collapse
    * spaces); idf = ln((N+1)/(df+1)) with N = distinct documents.
    *
    * Engine portability: floats never reach the output. Ranking uses the idf
    * scaled to a 6-decimal integer (`round(ln(..)*1e6)`), so the
    * (score desc, term asc) order — and therefore the emitted integer rank —
    * is reproducible bit-for-bit by an independent SQL engine; emitted
    * columns are the id, term, integer tf/df and the rank.
    *
    * Plan shape at corpus scale: explode → one (doc, term) hash aggregate
    * with map-side combine; df is an aggregate OF the tf aggregate (shuffles
    * carry doc-distinct terms, never raw occurrences); N rides a broadcast
    * scalar; the final window partitions by document. No corpus-wide window,
    * no driver-side data. */
  def tfidfTopTerms(docs: DataFrame, idCol: String, textCol: String,
                    k: Int = 5): DataFrame = {
    require(k > 0, "k must be positive")
    val norm = canonical(col(textCol), "", foldDigits = false)
    val toks = OpUtil.rebalance(docs)
      .select(col(idCol), explode(Portable.words(norm)).as("term"))
      .where(col("term") =!= "")
    // tf feeds BOTH the df aggregate and the score join — materialize it once
    // (cross-subtree exchange reuse doesn't cover the two consumers)
    val tf = OpUtil.shared(
      toks.groupBy(col(idCol), col("term")).agg(count(lit(1)).as("tf")))
    val dfT = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val nDocs = docs.agg(count_distinct(col(idCol)).as("n_docs"))
    val idf6 = round(log((col("n_docs") + lit(1)).cast("double") /
      (col("df") + lit(1)).cast("double")) * lit(1000000d)).cast("long")
    val scored = tf.join(dfT, "term").crossJoin(broadcast(nDocs))
      .withColumn("score", col("tf") * idf6)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol)).orderBy(col("score").desc, col("term").asc)
    scored.withColumn("term_rank", row_number().over(w).cast("long"))
      .where(col("term_rank") <= k)
      .select(col(idCol), col("term"), col("tf"), col("df"), col("term_rank"))
  }

  /** Corpus-estimated bigram language-model score — the CCNet/KenLM-style
    * perplexity filter: documents whose word transitions are improbable
    * UNDER THE CORPUS'S OWN STATISTICS (garbled text, wrong-language
    * fragments, boilerplate) score high and get dropped/bucketed. The model
    * is the corpus itself: P(w2|w1) = count(w1 w2) / count(w1 ·), so the
    * operator needs no external artifact.
    *
    * Output per document: `n_bigrams` and `nll_scaled` = −Σ occurrences ·
    * round(ln P · 1e6) — the total negative log-likelihood as a scaled
    * integer (the [[tfidfTopTerms]] float-free portability design; divide by
    * 1e6·n_bigrams for cross-entropy in nats). Documents with fewer than two
    * words score (0, 0).
    *
    * Plan shape: one explode → (doc, gram) hash aggregate, materialized once
    * and reused by the corpus bigram rollup, whose unigram context totals
    * are a further rollup OF that rollup — shuffles carry doc-distinct grams,
    * then vocabulary-sized tables; joins are equi-joins on gram/context. */
  def lmScore(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val grams = OpUtil.explodedWordShingles(docs, idCol, textCol, 2)
    val occ = OpUtil.shared(grams.groupBy("doc", "g").agg(count(lit(1)).as("c")))
    val big = occ.groupBy("g").agg(sum("c").as("bc"))
    val uni = big.select(substring_index(col("g"), " ", 1).as("w"), col("bc"))
      .groupBy("w").agg(sum("bc").as("uc"))
    val scored = occ.join(big, "g")
      .withColumn("w", substring_index(col("g"), " ", 1))
      .join(uni, "w")
      .withColumn("t", col("c") *
        round(log(col("bc").cast("double") / col("uc").cast("double")) * lit(1000000d))
          .cast("long"))
      .groupBy("doc").agg(sum("c").as("n_bigrams"), (-sum(col("t"))).as("nll_scaled"))
    docs.select(col(idCol))
      .join(scored.withColumnRenamed("doc", idCol), Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("nll_scaled"), lit(0L)).as("nll_scaled"))
  }

  /** Corpus bigram statistics as a PERSISTABLE artifact — the language-model
    * role for [[lmScoreWith]] (what CCNet ships as a KenLM binary): one row
    * per distinct bigram with its integer micro-nat conditional
    * log-probability `t = round(ln(count(bigram) / count(context)) * 1e6)`.
    * Rollups match [[lmScore]]'s exactly, so scoring with this artifact
    * reproduces the in-corpus scores bit-for-bit (unit-pinned). Write it
    * with `stats.write.parquet(...)` and score tomorrow's crawl against
    * today's model. */
  def lmStats(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val grams = OpUtil.explodedWordShingles(docs, idCol, textCol, 2)
    val big = OpUtil.shared(grams.groupBy("g").agg(count(lit(1)).as("bc")))
    val uni = big.select(substring_index(col("g"), " ", 1).as("w"), col("bc"))
      .groupBy("w").agg(sum("bc").as("uc"))
    big.withColumn("w", substring_index(col("g"), " ", 1))
      .join(uni, "w")
      .select(col("g"),
        round(log(col("bc").cast("double") / col("uc").cast("double")) * lit(1000000d))
          .cast("long").as("t"))
  }

  /** [[lmScore]] against a PRE-BUILT [[lmStats]] artifact — the deployment
    * and STREAMING shape (CCNet's score-at-ingest): one stream-safe explode
    * ([[OpUtil.explodedShinglesFromTokens]] — no rebalance probe), one
    * stream-static equi-join on the gram, and a per-doc sum — the only
    * stateful operator in a micro-batch. Two contract differences from the
    * in-corpus form, both inherent to scoring with a fixed artifact: docs
    * with no bigram emit NO row (a stream cannot left-join work that never
    * arrives), and grams absent from the artifact drop (the
    * [[applyVocab]]-style OOV rule; an artifact built on the same corpus
    * drops nothing — equality with [[lmScore]]'s nonzero rows is
    * unit-pinned). */
  def lmScoreWith(docs: DataFrame, idCol: String, textCol: String,
                  stats: DataFrame): DataFrame = {
    val grams = OpUtil.explodedShinglesFromTokens(
      docs.select(col(idCol).as("doc"), split(col(textCol), " ").as("toks")), 2)
    grams.join(stats.select(col("g"), col("t")), Seq("g"))
      .groupBy("doc")
      .agg(count(lit(1)).as("n_bigrams"), (-sum(col("t"))).as("nll_scaled"))
      .withColumnRenamed("doc", idCol)
  }

  /** CCNet-style quality bucketing: per-SOURCE head/middle/tail terciles of
    * the [[lmScore]] bigram negative-log-likelihood — the
    * perplexity-bucketing step CCNet runs with a KenLM model, re-expressed
    * on the in-corpus bigram LM. Per doc: `mean_nll` = integer micro-nats
    * per bigram (`nll_scaled div n_bigrams`; docs with no bigram get
    * Long.MaxValue, landing in `tail`); per source: the exact discrete
    * tercile thresholds ([[Stats.quantilesDisc]] at permille 333/667 —
    * order STATISTICS, so ties in `mean_nll` cannot make the thresholds
    * engine-dependent); label = `head` (≤ q333), `middle` (≤ q667), else
    * `tail`. All-integer, bit-reproducible by the SQL oracle.
    *
    * Plan shape: [[lmScore]]'s rollups + one per-source quantile window
    * over the DOC-count-sized score table (not the corpus) + a broadcast
    * threshold join — the corpus is touched only by lmScore's one explode. */
  def lmBuckets(docs: DataFrame, idCol: String, textCol: String,
                srcCol: String): DataFrame = {
    val withSrc = lmScoredWithSource(docs, idCol, textCol, srcCol)
    withSrc.join(broadcast(lmBucketThresholdsOf(withSrc, srcCol)), Seq(srcCol))
      .withColumn("bucket", lmBucketLabel)
      .select(col(idCol), col(srcCol), col("mean_nll"), col("bucket"))
  }

  /** Per-doc `mean_nll` with its source label — the scored form both
    * [[lmBuckets]] and the threshold computation consume. */
  private def lmScoredWithSource(docs: DataFrame, idCol: String,
                                 textCol: String, srcCol: String): DataFrame =
    lmScore(docs, idCol, textCol)
      .join(docs.select(col(idCol), col(srcCol)), Seq(idCol))
      .withColumn("mean_nll",
        when(col("n_bigrams") > 0,
          call_function("div", col("nll_scaled"), col("n_bigrams")))
          .otherwise(lit(Long.MaxValue)))

  private def lmBucketThresholdsOf(scored: DataFrame, srcCol: String): DataFrame =
    Stats.quantilesDisc(scored, Seq(srcCol), "mean_nll", Seq(333, 667))
      .groupBy(srcCol).agg(
        max(when(col("permille") === 333, col("q_value"))).as("_q333"),
        max(when(col("permille") === 667, col("q_value"))).as("_q667"))

  private def lmBucketLabel: Column =
    when(col("mean_nll") <= col("_q333"), lit("head"))
      .when(col("mean_nll") <= col("_q667"), lit("middle"))
      .otherwise(lit("tail"))

  /** The per-source tercile thresholds as a PERSISTABLE artifact
    * `(source, _q333, _q667)` — with [[lmStats]], everything
    * [[lmBucketsWith]] needs to bucket a live stream at ingest. */
  def lmBucketThresholds(docs: DataFrame, idCol: String, textCol: String,
                         srcCol: String): DataFrame =
    lmBucketThresholdsOf(lmScoredWithSource(docs, idCol, textCol, srcCol), srcCol)

  /** Bucket-at-ingest against PRE-BUILT artifacts — [[lmBuckets]]'s
    * deployment/streaming shape (CCNet assigns head/middle/tail as data
    * arrives, against yesterday's model + thresholds): score with
    * [[lmScoreWith]] (stream-safe), label the source via a broadcast
    * dimension join, bucket via the broadcast threshold join. Stateless
    * beyond the per-doc score aggregate. Docs with no scored bigram emit
    * no row (the [[lmScoreWith]] contract); sources absent from the
    * threshold artifact drop (inner join — score them in batch first). */
  def lmBucketsWith(docs: DataFrame, idCol: String, textCol: String,
                    sourceOf: DataFrame, stats: DataFrame,
                    thresholds: DataFrame): DataFrame = {
    require(sourceOf.columns.length == 2,
      s"sourceOf must be a two-column (id, source) dimension: ${sourceOf.columns.mkString(",")}")
    val srcCol = sourceOf.columns(1)
    lmScoreWith(docs, idCol, textCol, stats)
      .withColumn("mean_nll",
        call_function("div", col("nll_scaled"), col("n_bigrams")))
      .join(broadcast(sourceOf.toDF(idCol, srcCol)), Seq(idCol))
      .join(broadcast(thresholds), Seq(srcCol))
      .withColumn("bucket", lmBucketLabel)
      .select(col(idCol), col(srcCol), col("mean_nll"), col("bucket"))
  }

  def repetition(docs: DataFrame, idCol: String, textCol: String, n: Int = 2): DataFrame = {
    val grams = OpUtil.explodedWordShingles(docs, idCol, textCol, n)
    val agg = grams.groupBy("doc", "g").agg(count(lit(1)).as("c"))
      .groupBy("doc").agg(
        sum("c").as("total"), max("c").as("topc"), count(lit(1)).as("uniq"))
    docs.select(col(idCol))
      .join(agg.withColumnRenamed("doc", idCol), Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("topc").cast("double") / col("total"), lit(0.0)).as("top_ngram_frac"),
        coalesce((col("total") - col("uniq")).cast("double") / col("total"), lit(0.0))
          .as("dup_ngram_frac"))
  }
}
