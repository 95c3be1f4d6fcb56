package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Text-analysis extension operators (LLM-data pipeline tier, beyond
  * the declared §2.9 H set): language-ID scoring, quality scoring,
  * BPE-ish token estimation, rolling-hash fingerprinting.
  *
  * q_text_langid / q_text_quality are pure SQL-expressible → oracled.
  * q_text_fingerprint depends on Spark's xxhash64 → rows-only.
  */
object TextAnalysis {

  /** Stopword evidence sets for the n-gram-free language-ID heuristic.
    * (On the synthetic 31-token vocabulary these mostly score 0 — the
    * operator's *shape* is what matters: per-language evidence ratios
    * and an argmax, all codegen'd expressions.) */
  private val stop = Map(
    "en" -> Seq("the", "and", "of", "to", "a"),
    "de" -> Seq("der", "die", "und", "das", "ist"),
    "es" -> Seq("el", "la", "de", "y", "que"),
    "fr" -> Seq("le", "la", "et", "les", "des"))

  private def toks: Column = split(col("text"), " ")

  /** Fraction of tokens that are stopwords of `lang`. */
  private def evidence(lang: String): Column =
    (size(filter(toks, t => t.isInCollection(stop(lang)))).cast("double")
      / size(toks))

  def langIdScores(docs: DataFrame): DataFrame =
    docs.select(col("doc_id") +: col("lang").as("tagged_lang") +:
      stop.keys.toSeq.sorted.map(l => evidence(l).as(s"score_$l")): _*)

  /** Quality score: length / punctuation-ratio / stopword-ratio /
    * mean-token-length components, combined into [0,1].
    *
    * Empty/whitespace-only text yields NaN (0/0 punctuation ratio),
    * and Spark orders NaN GREATER than every double — so a plain
    * `quality >= t` filter PASSES exactly the zero-content docs it
    * should reject. Gate with `&& !isnan(col("quality"))` (see
    * TrainingDataPipelineDemo). Semantics kept NaN-transparent here
    * because the oracle-graded key computes the same expressions. */
  def qualityScore(docs: DataFrame): DataFrame = {
    val nTok = size(toks).cast("double")
    val nChars = length(col("text")).cast("double")
    val punct = (nChars - length(translate(col("text"), ".,;:!?", ""))).cast("double")
    val lenScore = least(nChars / 400.0, lit(1.0))
    // EMPTY-DOC semantics, declared on BOTH engines (adversarial-tier
    // find, r10): an empty text has punct_ratio 0 by definition — the
    // unguarded x/0 throws under Spark ANSI but yields NULL in DuckDB,
    // so the guard is both a crash fix and a cross-engine alignment.
    // nTok is never 0 (split("", " ") = [""]), so meanTok needs none.
    val punctRatio = when(nChars === 0.0, 0.0).otherwise(punct / nChars)
    val meanTok = (nChars - (nTok - 1)) / nTok
    docs.select(col("doc_id"), lenScore.as("len_score"),
      punctRatio.as("punct_ratio"), meanTok.as("mean_tok_len"),
      ((lenScore + (lit(1.0) - punctRatio)) / 2.0).as("quality"))
  }

  /** BPE-ish token-count estimate: whitespace words + ceil(word_len/4)
    * sub-word pieces (the standard ~4-chars-per-token heuristic),
    * computed as a higher-order fold — no UDF. */
  /** The ONE BPE-ish token-count expression [[tokenEstimate]] and
    * [[packSequences]] share — tuning the chars-per-token heuristic
    * here moves both (and must move their DuckDB twins together).
    * Backed by the codegen'd one-pass [[graft.expressions.BpeTokenCount]]
    * (value-identical to the HOF `aggregate(transform(...))` form —
    * equality property-tested in TextExpressionsSpec; the HOF twin
    * below stays as the executable spec of the semantics). */
  private def tokEstimate: Column =
    graft.expressions.TextExpressions.bpe_token_count(col("text"))

  /** The declarative HOF formulation of [[tokEstimate]] — interpreted
    * lambda per token, array materialized per row; kept as the
    * reference semantics the native expression is tested against. */
  private[graft] def tokEstimateHof: Column =
    aggregate(transform(toks, t => ceil(length(t).cast("double") / 4.0).cast("long")),
      lit(0L), (acc, x) => acc + x)

  def tokenEstimate(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      size(toks).cast("long").as("n_words"),
      tokEstimate.as("n_bpe_est"))

  // ---- deterministic BPE (r17, VERDICT r16 #3) ---------------------
  /** Byte-pair-encoding merge learning over a CLOSED word vocabulary,
    * fully deterministic: each word weighs 1, every adjacent symbol
    * pair is counted per occurrence, the most frequent pair merges
    * each round with a frequency-then-lexical tie-break (total order —
    * no hash iteration order leaks into the table), left-to-right
    * non-overlapping replacement. Stops early once no adjacent pair
    * remains (every word fully merged). Driver-side by design: real
    * tokenizers train once offline; the QUERY path only ever sees the
    * frozen table (below). */
  private[graft] def bpeMerges(words: Seq[String],
                               numMerges: Int): Seq[(String, String)] = {
    var seqs: Seq[Vector[String]] = words.map(_.map(_.toString).toVector)
    val merges = Seq.newBuilder[(String, String)]
    var k = 0
    var done = false
    while (k < numMerges && !done) {
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Int]
      seqs.foreach { s =>
        var i = 0
        while (i + 1 < s.length) {
          val p = (s(i), s(i + 1))
          counts.update(p, counts.getOrElse(p, 0) + 1)
          i += 1
        }
      }
      if (counts.isEmpty) done = true
      else {
        val best = counts.toSeq.minBy { case ((a, b), c) => (-c, a, b) }._1
        merges += best
        seqs = seqs.map { s =>
          val out = Vector.newBuilder[String]
          var i = 0
          while (i < s.length) {
            if (i + 1 < s.length && s(i) == best._1 && s(i + 1) == best._2) {
              out += s(i) + s(i + 1); i += 2
            } else { out += s(i); i += 1 }
          }
          out.result()
        }
        k += 1
      }
    }
    merges.result()
  }

  /** The subword unit inventory a merge table induces: every single
    * character seen in training plus every merge result. */
  private[graft] def bpeUnits(words: Seq[String], numMerges: Int): Set[String] =
    words.flatMap(_.map(_.toString)).toSet ++
      bpeMerges(words, numMerges).map { case (a, b) => a + b }

  /** Greedy longest-match tokenization of one word against a unit
    * inventory (the WordPiece-style application the frozen table
    * supports without replaying merge order). Total: a character
    * outside every unit becomes its own token, so segmentation never
    * fails and the concatenation is always the word. */
  private[graft] def bpeGreedy(word: String, units: Set[String]): Seq[String] = {
    val maxLen = if (units.isEmpty) 1 else units.map(_.length).max
    val out = Seq.newBuilder[String]
    var i = 0
    while (i < word.length) {
      var l = math.min(maxLen, word.length - i)
      while (l > 1 && !units.contains(word.substring(i, i + l))) l -= 1
      out += word.substring(i, i + l)
      i += l
    }
    out.result()
  }

  /** REAL subword token counts (vs [[tokenEstimate]]'s length/4
    * heuristic): learn `numMerges` BPE merges over `vocab` driver-side,
    * tokenize each vocab word ONCE by greedy longest-match, and inline
    * the frozen (word → token count) table as a MAP literal — the
    * query path is a pure projection (map lookup + higher-order sum),
    * zero join, zero shuffle, fully codegen'd. A word outside the
    * vocabulary falls back to one token per character (the BPE
    * worst case), so the count is total on arbitrary text. At 100 TB
    * this is the right shape for a frozen tokenizer: the table is
    * O(vocab) bytes in the plan, never a broadcast or a shuffle. */
  def bpeTokens(docs: DataFrame, vocab: Seq[String],
                numMerges: Int = 40): DataFrame =
    docs.select(col("doc_id"),
      size(toks).cast("long").as("n_words"),
      bpeCountOf(vocab, numMerges).as("n_tok_bpe"))

  /** The frozen greedy-BPE document token-count EXPRESSION over
    * `vocab` — the map-literal lookup + higher-order sum that
    * [[bpeTokens]] and the BPE-budgeted packer share (still a pure
    * codegen'd projection; extracting it lets [[packSequences]] budget
    * on REAL tokenizer counts instead of the length/4 estimate). */
  private[graft] def bpeCountOf(vocab: Seq[String],
                                numMerges: Int = 40): Column = {
    val units = bpeUnits(vocab, numMerges)
    val table = vocab.distinct.sorted.map(w => w -> bpeGreedy(w, units).length)
    val m = map(table.flatMap { case (w, n) =>
      Seq(lit(w), lit(n.toLong)) }: _*)
    aggregate(toks, lit(0L), (acc, w) =>
      acc + coalesce(element_at(m, w), length(w).cast("long")))
  }

  /** COLLOCATION extraction (r17) — top bigrams by PMI, the corpus-
    * analysis staple (phrase mining, tokenizer-merge candidates).
    * PMI = log(p(xy)/(p(x)p(y))) ranks identically to the EXACT
    * integer score (c_xy·10⁹) div (c_x·c_y) — the corpus-constant
    * N²/M factor and the log (monotone) drop out of the ORDER — so
    * both the ranking and the graded score live in exact long
    * arithmetic, no transcendentals, no rounding grid (the log's
    * libm portability problem engineered out rather than rounded
    * away). Scale shape: one explode over adjacent pairs (a pure
    * projection), two hash aggregations (bigram, unigram), two joins
    * against the unigram counts — vocabulary-sized, so Catalyst
    * broadcasts them — and a TakeOrdered top-k, never a global sort.
    * `minCount` drops hapax noise (PMI's classic failure mode). */
  def collocations(docs: DataFrame, minCount: Long = 5L,
                   k: Int = 100): DataFrame = {
    val tk = toks
    // token array materialized into its own projection FIRST (the
    // Dedup.shingleCol rule): transform() lambdas are interpreted, so
    // an inline split() re-evaluates once per ELEMENT — O(tokens²) per
    // doc (r17 optimization-round find: the bigram explode was ~2.5 s
    // of q_text_colloc's 3.3 s at sf0.1). A bound column reference is
    // a cheap per-element read.
    val bg = docs.filter(col("text").isNotNull && size(tk) >= 2)
      .select(tk.as("tks"))
      .select(explode(transform(sequence(lit(1), size(col("tks")) - 1),
        i => struct(element_at(col("tks"), i).as("w1"),
          element_at(col("tks"), i + 1).as("w2")))).as("b"))
      .groupBy(col("b.w1").as("w1"), col("b.w2").as("w2"))
      .agg(count(lit(1)).as("cxy"))
      .filter(col("cxy") >= minCount)
    val uni = docs.filter(col("text").isNotNull)
      .select(explode(tk).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
    bg.join(uni.select(col("w").as("w1"), col("c").as("cx")), "w1")
      .join(uni.select(col("w").as("w2"), col("c").as("cy")), "w2")
      .withColumn("score",
        expr("(cxy * CAST(1000000000 AS BIGINT)) DIV (cx * cy)"))
      .select(col("w1"), col("w2"), col("cxy"), col("score"))
      .orderBy(col("score").desc, col("w1"), col("w2"))
      .limit(k)
  }

  // ---- bigram-LM fluency / perplexity filtering (r17) --------------
  /** Language-model FLUENCY scoring — the perplexity-filter step of a
    * training-data pipeline (CCNet-style: score every document under a
    * bigram LM learned from the corpus, filter the low-fluency tail).
    * The LM is add-one smoothed: p(w2|w1) = (c_xy+1)/(h_x+V) with
    * h_x = Σ_w c(x,w) (the history count) and V the distinct
    * vocabulary size. The GRADED statistic is the exact-integer mean
    * smoothed conditional probability — per bigram
    * `sq = (1e9·(c_xy+1)) div (h_x+V)`, per doc `score_sum = Σ sq`
    * and `fluency_q = score_sum div n_bigrams` — pure long
    * arithmetic, no transcendentals, no rounding grid. Textbook
    * perplexity exponentiates the mean LOG of the same conditionals;
    * grading that cross-engine would reintroduce the libm boundary
    * class ADVICE.md documents, so [[perplexity]] derives the
    * exp-NLL form from the SAME counts for users (law-tested in
    * LmFluencySpec, not hash-graded) and the rank statistic stays
    * exact. Overflow audit: sq ≤ 1e9 (c_xy+1 ≤ h_x+V always), so
    * score_sum ≤ 1e9·words/doc ≪ 2^63; the product
    * (c_xy+1)·1e9 ≤ (corpus bigrams)·1e9 needs c_xy ≤ 9.2e9 — three
    * orders above the decade-2 corpus.
    *
    * Scale shape: one adjacent-pair explode feeds BOTH the LM
    * aggregation and the scoring join (two corpus scans, the colloc
    * trade); the LM tables are vocabulary²-bounded so AQE broadcasts
    * them on real corpora, and when a web-scale vocabulary outgrows
    * broadcast the join degrades to a plain shuffle on the pair key —
    * never a funnel. V enters as a 1-row cross join (scalar
    * subquery), not a collect; one final groupBy(doc_id). Every doc
    * survives: <2 tokens or NULL text → n_bigrams 0, fluency NULL. */
  def lmFluency(docs: DataFrame): DataFrame = {
    val scored = pairScores(docs)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("sq")).as("score_sum"))
    docs.select(col("doc_id")).join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("score_sum"), lit(0L)).as("score_sum"),
        expr("score_sum DIV n_bigrams").as("fluency_q"))
  }

  /** Textbook bigram perplexity over the SAME add-one-smoothed counts
    * as [[lmFluency]]: PP(doc) = exp(-mean ln p(w2|w1)). Double-valued
    * (libm logs — see lmFluency's scaladoc for why the graded key is
    * the exact twin instead); NULL for docs with no bigram. */
  def perplexity(docs: DataFrame): DataFrame = {
    val scored = pairScores(docs)
      .withColumn("lp", log((col("cxy") + 1).cast("double") /
        (col("hx") + col("v")).cast("double")))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"), avg(col("lp")).as("mlp"))
    docs.select(col("doc_id")).join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        exp(-col("mlp")).as("ppl"))
  }

  /** Shared LM scoring core: per-document adjacent pairs joined to the
    * corpus bigram counts (cxy), history counts (hx) and vocabulary
    * size (v), plus the exact-integer smoothed score `sq`. Inner
    * joins are total by construction — the LM is aggregated FROM the
    * same pair set it scores. */
  private def pairScores(docs: DataFrame): DataFrame = {
    val tk = toks
    // tokenize ONCE per row before the transform lambda (the
    // Dedup.shingleCol / collocations rule — an inline split() inside
    // the interpreted lambda re-runs per element, O(tokens²) per doc)
    val pairsDoc = docs.filter(col("text").isNotNull && size(tk) >= 2)
      .select(col("doc_id"), tk.as("tks"))
      .select(col("doc_id"), explode(transform(sequence(lit(1), size(col("tks")) - 1),
        i => struct(element_at(col("tks"), i).as("w1"),
          element_at(col("tks"), i + 1).as("w2")))).as("b"))
      .select(col("doc_id"), col("b.w1").as("w1"), col("b.w2").as("w2"))
    val bg = pairsDoc.groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).as("cxy"))
    val hist = bg.groupBy(col("w1")).agg(sum(col("cxy")).as("hx"))
    val vocab = docs.filter(col("text").isNotNull)
      .select(explode(tk).as("w"))
      .agg(count_distinct(col("w")).as("v"))
    // attach the per-prefix totals and the vocab scalar to the
    // VOCAB-BOUNDED pair table first, then join the corpus-sized
    // bigram stream ONCE (r17 optimization round, guide §2.3/2.4: the
    // previous chain joined pairsDoc → bg → hist → vocab, dragging
    // every corpus bigram through three join stages; sq is a pure
    // function of (cxy, hx, v), so it reduces on the small side).
    // Inner equi-join reorder — identical rows, identical sq values.
    val scoredBg = bg.join(hist, Seq("w1"))
      .crossJoin(vocab)
      .withColumn("sq",
        expr("((cxy + 1) * CAST(1000000000 AS BIGINT)) DIV (hx + v)"))
    // merge-hinted: left to size estimates the planner broadcast the
    // CORPUS-SIDED bigram stream here (the explode defeats its stats —
    // guide §3.1), which is an executor OOM at crawl scale; the
    // distinct-bigram table is itself corpus-heavy-tailed, so neither
    // side may broadcast. One sort-merge shuffle of the stream, ever.
    pairsDoc.join(scoredBg.hint("merge"), Seq("w1", "w2"))
  }

  // ---- exact substring-span dedup (r17) ----------------------------
  /** EXACT SUBSTRING deduplication — the span-level companion to
    * whole-doc dedup (the "deduplicating training data" method: find
    * every k-token span that occurs more than once ANYWHERE in the
    * corpus, merge per-document overlaps, emit the spans a pipeline
    * would cut). One row per maximal duplicated span:
    * `(doc_id, span_start, span_end, n_shingles)` with 1-based
    * inclusive token indices — a token is covered iff some duplicated
    * k-shingle contains it, so two shingle hits merge iff
    * `next.pos ≤ prev_end + 1` (overlapping or adjacent).
    *
    * Scale shape: shingle explode is a pure projection; ONE hash
    * aggregation over shingles finds the duplicated set (partial+final
    * combine — the hottest shingle's count never funnels rows); a
    * semi-join marks positions (AQE broadcasts the duplicated set when
    * small, plain shuffle join on the shingle key otherwise); the
    * island merge windows ONLY the marked positions per doc — bounded
    * by doc length, never corpus. The graded key joins on the shingle
    * STRING (cross-engine exact); a 100 TB run would key the
    * aggregation and semi-join on xxhash64(shingle) instead — 8-byte
    * shuffle, same plan, the [[hashShingles]] trade. */
  def duplicateSpans(docs: DataFrame, k: Int = 8): DataFrame = {
    require(k >= 2, s"shingle width must be >= 2, got $k")
    val tk = toks
    // tokenize ONCE per row before the transform lambda (the
    // Dedup.shingleCol / collocations rule — an inline split() inside
    // the interpreted lambda re-runs per slice, O(tokens²) per doc)
    val pos = docs.filter(col("text").isNotNull && size(tk) >= k)
      .select(col("doc_id"), tk.as("tks"))
      .select(col("doc_id"), explode(transform(
        sequence(lit(1), size(col("tks")) - (k - 1)),
        i => struct(i.cast("long").as("pos"),
          concat_ws(" ", slice(col("tks"), i, lit(k))).as("sh")))).as("p"))
      .select(col("doc_id"), col("p.pos").as("pos"), col("p.sh").as("sh"))
    // ONE shuffle: corpus-occurrence counts as a whole-partition
    // window over the shingle key (r17 bench find: the groupBy +
    // semi-join form evaluated the explode subtree twice — two full
    // shingle scans and shuffles for the same marked set)
    val wSh = org.apache.spark.sql.expressions.Window.partitionBy(col("sh"))
    val marked = pos.withColumn("__c", count(lit(1)).over(wSh))
      .filter(col("__c") > 1)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("pos"))
    val prevEnd = max(col("pos") + (k - 1)).over(
      w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1))
    marked
      .withColumn("flag",
        when(prevEnd.isNull || col("pos") > prevEnd + 1, 1L).otherwise(0L))
      .withColumn("island", sum(col("flag")).over(
        w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
      .groupBy(col("doc_id"), col("island"))
      .agg(min(col("pos")).as("span_start"),
        (max(col("pos")) + (k - 1)).as("span_end"),
        count(lit(1)).as("n_shingles"))
      .select(col("doc_id"), col("span_start"), col("span_end"),
        col("n_shingles"))
  }

  /** Rolling-hash document fingerprint: xxhash64 over 8-token windows,
    * keep the k smallest (winnowing) — the classic content-defined
    * fingerprint for containment detection. Spark-hash-based. Runs the
    * codegen'd one-pass [[graft.expressions.WinnowFingerprint]]
    * (measured 30× the HOF form's per-row cost at sf0.1×20);
    * value-equality with [[fingerprintsHof]] is property-tested in
    * TextExpressionsSpec. */
  def fingerprints(docs: DataFrame, window: Int = 8, keep: Int = 4): DataFrame =
    docs.select(col("doc_id"),
      graft.expressions.TextExpressions
        .winnow_fingerprint(col("text"), window, keep).as("fingerprint"))

  /** The declarative HOF formulation of [[fingerprints]] — kept as the
    * reference semantics the native expression is tested against. */
  private[graft] def fingerprintsHof(docs: DataFrame, window: Int = 8,
                                     keep: Int = 4): DataFrame =
    fingerprintsBy(docs, window, keep,
      w => xxhash64(w))

  /** [[fingerprints]] keyed on the engines' shared md5 digest
    * ([[Profiling.rowDigest]]) instead of xxhash64 — winnowing is
    * deterministic GIVEN the hash, so this twin is DuckDB-expressible
    * end to end (the r5 dedup-twin move applied to fingerprinting;
    * md5-per-window is the documented gradeability cost, xxhash64
    * stays the production key). */
  def fingerprintsMd5(docs: DataFrame, window: Int = 8, keep: Int = 4): DataFrame =
    fingerprintsBy(docs, window, keep,
      w => graft.ops.Profiling.rowDigest(w))

  /** Shared winnowing shape: hash every `window`-token sliding window
    * with `hashFn`, sort, keep the `keep` smallest. Pure projection —
    * no shuffle, no UDF; the window strings never leave the row.
    *
    * NULL text → NULL fingerprint (r11 NULL-tier find): Spark's
    * `greatest` SKIPS null args, so `greatest(size(NULL) - w, 0)` was
    * 0 and a NULL doc fingerprinted as [hash("")] while the oracle's
    * null-propagating pipeline (and [[WinnowFingerprint]]'s
    * nullSafeEval) yielded NULL. The `when` guard keeps the upper
    * bound NULL for NULL input, which nulls the whole chain
    * (sequence → transform → array_sort → slice). Guarded on the TEXT
    * column, not size(toks).isNotNull: under legacy
    * spark.sql.ansi/sizeOfNull configs size(NULL) is -1, not NULL,
    * which would silently resurrect the bug (r11 review find). */
  private def fingerprintsBy(docs: DataFrame, window: Int, keep: Int,
                             hashFn: Column => Column): DataFrame =
    // tokenize ONCE per row before the transform lambda (the
    // Dedup.shingleCol rule — an inline split() inside the interpreted
    // lambda re-runs per window, O(tokens²) per doc). `text` rides
    // along so the NULL guard below keeps its exact documented form.
    docs.select(col("doc_id"), col("text"), toks.as("tks"))
      .select(col("doc_id"),
        slice(array_sort(transform(
          sequence(lit(0), when(col("text").isNotNull,
            greatest(size(col("tks")) - window, lit(0)))),
          i => hashFn(concat_ws(" ", slice(col("tks"), i + 1, lit(window)))))),
          1, keep).as("fingerprint"))

  /** Greedy contiguous sequence packing — the training-batch
    * construction step of an LLM data pipeline: assign documents, in
    * deterministic (lang, doc_id) order, to fixed token-budget training
    * sequences by integer-dividing the EXCLUSIVE running token total by
    * the budget. A doc that crosses a boundary stays in the sequence it
    * started in (the standard overflow-tolerant contiguous packer), and
    * a doc larger than the whole budget advances the index past the
    * ids it covers — sequence ids may legitimately skip, but never
    * interleave.
    *
    * Scale shape: ONE shuffle on the pack key + the in-partition sort
    * the running sum needs — no join, no driver state. `lang` stands in
    * for the pack key here; a production pipeline packs per bounded
    * output shard (e.g. `hash(doc_id) % n_shards`), which is the same
    * plan with a finer key and keeps every partition's sort bounded by
    * shard size, not corpus size.
    *
    * Determinism precondition: doc_id is UNIQUE per pack key (the
    * corpus primary key). A duplicate id ties the window sort and the
    * ROWS-frame running sum over ties is partition-layout-dependent —
    * the duplicates could swap sequences between runs. Dedup first
    * (the pipeline does) or add a tiebreak column. */
  def packSequences(docs: DataFrame, capacity: Long = 512L,
                    packKey: String = "lang",
                    tokCol: Column = tokEstimate): DataFrame = {
    require(capacity > 0, s"capacity must be positive, got $capacity")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(packKey)).orderBy(col("doc_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    docs.select(col("doc_id"), col(packKey), tokCol.as("tok"))
      .withColumn("cum_before", coalesce(sum(col("tok")).over(w), lit(0L)))
      .withColumn("seq_id", expr(s"cum_before DIV $capacity"))
  }

  /** The production form of [[packSequences]]: derive a bounded shard
    * key from a stable hash of doc_id and pack per shard, so no single
    * pack-key partition ever sorts more than ~1/nShards of the corpus
    * (the hot-key caveat of packing per lang: one dominant language
    * funnels its whole corpus through ONE sort task). Shard assignment
    * uses the same cross-engine md5 digest as [[hashSplit]], so a
    * re-run packs identically on any cluster size. */
  def packSequencesSharded(docs: DataFrame, capacity: Long = 512L,
                           nShards: Int = 1024): DataFrame = {
    require(nShards > 0, s"nShards must be positive, got $nShards")
    packSequences(
      docs.withColumn("shard",
        pmod(Profiling.rowDigest(col("doc_id").cast("string")), lit(nShards.toLong))),
      capacity, packKey = "shard")
  }

  /** Deterministic train/validation/test split by a stable content-free
    * hash of the document id — the md5 digest the graded dedup and
    * fingerprint twins already share with the oracle: bucket = digest %
    * 100, < trainPct → train, < trainPct+valPct → validation, else
    * test. Pure projection: no shuffle, no RNG — the assignment is
    * stable under re-runs, retries, appends and repartitioning, which
    * is the property a reproducible-pipeline split needs (a
    * rand()-based split re-deals on every retry and leaks validation
    * docs into training across runs). */
  def hashSplit(docs: DataFrame, trainPct: Int = 90, valPct: Int = 5): DataFrame = {
    require(trainPct > 0 && valPct >= 0 && trainPct + valPct <= 100,
      s"split percentages must partition [0,100), got train=$trainPct val=$valPct")
    docs
      .withColumn("bucket",
        pmod(Profiling.rowDigest(col("doc_id").cast("string")), lit(100L)))
      .withColumn("split",
        when(col("bucket") < trainPct, "train")
          .when(col("bucket") < trainPct + valPct, "validation")
          .otherwise("test"))
  }

  /** CCNet-style boilerplate-line removal, the library operator behind
    * q_text_boilerplate: split `text` on newlines, compute each line's
    * distinct-document frequency, drop lines with df > n·num/den
    * (integer comparison — no FP), reassemble the survivors in
    * position order. Returns (doc_id, n_kept, text); docs whose every
    * line dropped vanish (an empty document has no place in a corpus);
    * callers keeping other columns join them back on doc_id.
    *
    * Scale shape: line-df is a partial+final aggregation on line
    * strings; the hot set is bounded by (avg lines/doc)·den/num rows
    * (Σ df ≤ total line occurrences), routed through
    * [[Dedup.antiJoinHot]]'s gated broadcast; reassembly is one
    * groupBy(doc) position-ordered collect. */
  def removeBoilerplateLines(docs: DataFrame, num: Long = 1L,
                             den: Long = 5L): DataFrame = {
    require(num > 0 && den > 0 && num < den,
      s"threshold num/den must be a proper fraction, got $num/$den")
    val lined = docs.select(col("doc_id"),
      posexplode(split(col("text"), "\n")).as(Seq("pos", "line")))
    val n = docs.agg(count(lit(1)).as("n_docs"))
    val hot = lined.groupBy(col("line"))
      .agg(countDistinct(col("doc_id")).as("ldf"))
      .crossJoin(broadcast(n))
      .filter(col("ldf") * den > col("n_docs") * num)
      .select(col("line"))
    val kept = Dedup.antiJoinHot(lined, hot, Seq("line"))
    kept.groupBy(col("doc_id"))
      .agg(count(lit(1)).cast("long").as("n_kept"),
        concat_ws("\n", transform(
          array_sort(collect_list(struct(col("pos"), col("line")))),
          x => x.getField("line"))).as("text"))
  }

  /** GRADED PII patterns — written to mean the same thing in Java
    * regex (Spark) and RE2 (DuckDB): character classes, bounded
    * repetition and `\b` only; no alternation (leftmost-first vs
    * leftmost-longest never differs), no backreferences/lookaround
    * (RE2 lacks them). PhonePat is deliberately narrowed to the
    * planted `555-XXXX` form the graded keys and their oracles share —
    * real-corpus runs should pass [[GeneralPhonePat]] (or their own
    * patterns) instead; it only needs to be valid Java regex. */
  val EmailPat = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhonePat = "\\b555-[0-9]{4}\\b"
  val Ipv4Pat  = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"

  /** Real-world phone shape (optional country code, 3-3-4 groups with
    * separators, optional parens): matches '(415) 867-5309',
    * '+1-212-555-0100', '1-212-555-0100', '415.867.5309' — each
    * redacted WHOLE, never leaving a leading digit outside the mask.
    * The `(?<![0-9])` lookbehind stops a 3-3-4 SUFFIX of a longer
    * digit run from matching (an ID like '20240415.867.5309' is not a
    * phone and must not half-redact). A bare (plus-less) country code
    * is consumed only when joined by '-' or '.', so a space-separated
    * preceding number ('ext 123 415-867-5309') is never swallowed —
    * only the phone itself is masked. Spark-side library use only —
    * NOT in the graded keys, whose oracle requires the exact
    * cross-engine subset above (lookbehind does not exist in RE2). */
  val GeneralPhonePat =
    "(?<![0-9])(\\+[0-9]{1,3}[-. ]?|[0-9]{1,3}[-.])?\\(?[0-9]{3}\\)?[-. ][0-9]{3}[-. ][0-9]{4}\\b"

  /** Per-doc PII hit counts (email / phone / dotted-quad IP). All
    * codegen'd `RegExpCount` expressions — one scan, no UDF. */
  def piiCounts(docs: DataFrame,
                emailPat: String = EmailPat,
                phonePat: String = PhonePat,
                ipPat: String = Ipv4Pat): DataFrame =
    docs.select(col("doc_id"), col("lang"),
      regexp_count(col("text"), lit(emailPat)).cast("long").as("n_email"),
      regexp_count(col("text"), lit(phonePat)).cast("long").as("n_phone"),
      regexp_count(col("text"), lit(ipPat)).cast("long").as("n_ip"))

  /** Redact in a fixed order: emails first (their local parts contain
    * digits that the later numeric patterns must never see), then IPs
    * (dotted quads contain phone-free digit runs), then phones. The
    * oracle nests its `regexp_replace(..., 'g')` calls in the same
    * order, so the redacted string is byte-identical across engines. */
  def redactedText(text: Column,
                   emailPat: String = EmailPat,
                   phonePat: String = PhonePat,
                   ipPat: String = Ipv4Pat): Column =
    regexp_replace(regexp_replace(regexp_replace(text,
      emailPat, "<EMAIL>"), ipPat, "<IP>"), phonePat, "<PHONE>")

  def redactPii(docs: DataFrame,
                emailPat: String = EmailPat,
                phonePat: String = PhonePat,
                ipPat: String = Ipv4Pat): DataFrame =
    docs.withColumn("text",
      redactedText(col("text"), emailPat, phonePat, ipPat))

  /** The synthetic corpus contains no PII, so the graded keys plant it
    * deterministically (doc_id-keyed suffixes, same literal CASE in the
    * oracle SQL — the q_dedup_exact precedent): detection and redaction
    * then have guaranteed non-empty hits at EVERY scale factor, instead
    * of a vacuous 0=0 oracle match. Fixture untouched. */
  private[graft] def plantPii(docs: DataFrame): DataFrame = {
    val id = col("doc_id")
    docs.withColumn("text",
      when(id % 7 === 0,
        concat(col("text"), lit(" contact user"), id.cast("string"),
          lit("@mail.example.com or admin"), (id % 97).cast("string"),
          lit("@corp.example.org asap")))
        .when(id % 7 === 3,
          concat(col("text"), lit(" call 555-"),
            lpad((id % 10000).cast("string"), 4, "0"),
            lit(" from 10."), (id % 256).cast("string"), lit(".0."),
            ((id * 7) % 256).cast("string")))
        .otherwise(col("text")))
  }

  /** The synthetic corpus' closed vocabulary (TESTDATA.md documents
    * generator — stable across tiers), shared by the graded BPE key
    * and its oracle CASE. The OP takes any vocab; only the KEY pins
    * this one. */
  private[graft] val BpeCorpusVocab: Seq[String] = Seq(
    "a", "agg", "batch", "big", "column", "customer", "data", "dup",
    "fast", "filter", "group", "hash", "join", "key", "line", "merge",
    "order", "part", "query", "row", "scan", "slow", "small", "sort",
    "spark", "stream", "table", "the", "value", "vector", "window")

  /** The frozen (word → BPE token count) table at 40 merges, rendered
    * once and shared verbatim by both engines (the swCaseSql/spatial-
    * weighted precedent for driver-computed constants). */
  private lazy val bpeCountsSql: String = {
    val units = bpeUnits(BpeCorpusVocab, 40)
    "CASE " + BpeCorpusVocab.map(w =>
      s"WHEN t = '$w' THEN CAST(${bpeGreedy(w, units).length} AS BIGINT)")
      .mkString(" ") + " ELSE CAST(length(t) AS BIGINT) END"
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_text_langid" -> { (s, dir) =>
      langIdScores(Tables.documents(s, dir)).orderBy(col("doc_id"))
    },
    "q_text_quality" -> { (s, dir) =>
      qualityScore(Tables.documents(s, dir)).orderBy(col("doc_id"))
    },
    "q_text_tokens_est" -> { (s, dir) =>
      tokenEstimate(Tables.documents(s, dir)).orderBy(col("doc_id"))
    },
    // REAL BPE token counts (r17): 40 deterministic merges learned
    // driver-side over the corpus' closed 31-word vocabulary, applied
    // as a frozen (word → count) MAP literal — the SAME integer table
    // is rendered into the oracle's CASE, so the grade is exact by
    // construction and covers the learned segmentation itself.
    // Off-vocabulary words (fuzz tiers) fall back to per-character
    // counts in both engines.
    "q_text_bpe" -> { (s, dir) =>
      bpeTokens(Tables.documents(s, dir), BpeCorpusVocab).orderBy(col("doc_id"))
    },
    // Collocations: top-100 bigrams by the exact integer PMI-monotone
    // score — ranking AND score in pure long arithmetic (see
    // collocations' scaladoc for why no log and no rounding appear).
    "q_text_colloc" -> { (s, dir) =>
      collocations(Tables.documents(s, dir))
    },
    // Bigram-LM fluency (perplexity filtering's exact twin): every doc
    // scored under the corpus add-one bigram LM in pure long
    // arithmetic — see lmFluency's scaladoc for why the graded
    // statistic is the transcendental-free mean conditional
    // probability and textbook perplexity stays a law-tested API.
    "q_text_lm_fluency" -> { (s, dir) =>
      lmFluency(Tables.documents(s, dir)).orderBy(col("doc_id"))
    },
    // Exact substring-span dedup: every maximal per-doc span covered
    // by corpus-repeated 8-token shingles — the spans a pipeline cuts.
    // Zero rows on an all-unique corpus (the sparse-tier family law).
    "q_dedup_substring" -> { (s, dir) =>
      duplicateSpans(Tables.documents(s, dir))
        .orderBy(col("doc_id"), col("span_start"))
    },
    // Redaction-style scrub — the PII-removal shape of a training-data
    // pipeline (here the stand-in sensitive term is the vocab token
    // "dup"): count hits, replace whole-word matches, re-collapse
    // whitespace. All codegen'd regex expressions; \b and ' +' mean the
    // same thing in Java regex and RE2, so the cleaned string is
    // byte-identical across engines.
    "q_text_clean" -> { (s, dir) =>
      scrub(Tables.documents(s, dir), "dup", "<T>").orderBy(col("doc_id"))
    },
    // Sequence packing, summarized per packed sequence: doc count,
    // token total and the contiguous [first_doc, last_doc] range —
    // enough to pin the whole assignment (PackSplitSpec additionally
    // law-checks the boundary arithmetic).
    "q_pack_sequences" -> { (s, dir) =>
      packSequences(Tables.documents(s, dir))
        .groupBy(col("lang"), col("seq_id"))
        .agg(count(lit(1)).cast("long").as("n_docs"),
          sum(col("tok")).cast("long").as("sum_tok"),
          min(col("doc_id")).as("first_doc"),
          max(col("doc_id")).as("last_doc"))
        .orderBy(col("lang"), col("seq_id"))
    },
    // The PRODUCTION packer, graded end-to-end: shard by the md5 doc_id
    // digest (DuckDB-reproducible, same idiom as q_sample_split), pack
    // per shard, summarize per (shard, seq_id). 32 shards at this SF
    // gives every shard a multi-doc, multi-sequence packing, so the
    // hash pins the shard assignment AND the per-shard boundary
    // arithmetic — the sharded form can no longer drift from the graded
    // per-lang form (r9 verdict task 4).
    // Packing BUDGETED ON THE REAL TOKENIZER (r17, the VERDICT r16 #3
    // tail): the same exclusive-running-sum boundary arithmetic as
    // q_pack_sequences, but the budget consumes the frozen greedy-BPE
    // counts (q_text_bpe's exact table) instead of the length/4
    // estimate — the counts a training pipeline actually packs on.
    // Capacity 128 keeps multi-sequence packings at every tier under
    // the smaller real counts.
    "q_pack_bpe" -> { (s, dir) =>
      packSequences(Tables.documents(s, dir), capacity = 128L,
          tokCol = bpeCountOf(BpeCorpusVocab))
        .groupBy(col("lang"), col("seq_id"))
        .agg(count(lit(1)).cast("long").as("n_docs"),
          sum(col("tok")).cast("long").as("sum_tok"),
          min(col("doc_id")).as("first_doc"),
          max(col("doc_id")).as("last_doc"))
        .orderBy(col("lang"), col("seq_id"))
    },
    "q_pack_sharded" -> { (s, dir) =>
      packSequencesSharded(Tables.documents(s, dir), nShards = 32)
        .groupBy(col("shard"), col("seq_id"))
        .agg(count(lit(1)).cast("long").as("n_docs"),
          sum(col("tok")).cast("long").as("sum_tok"),
          min(col("doc_id")).as("first_doc"),
          max(col("doc_id")).as("last_doc"))
        .orderBy(col("shard"), col("seq_id"))
    },
    // Hash split, summarized per (split, lang): the per-cell counts +
    // char totals pin every doc's assignment through the group hash.
    "q_sample_split" -> { (s, dir) =>
      hashSplit(Tables.documents(s, dir))
        .groupBy(col("split"), col("lang"))
        .agg(count(lit(1)).cast("long").as("n_docs"),
          sum(col("n_chars")).cast("long").as("sum_chars"),
          min(col("doc_id")).as("min_doc"),
          max(col("doc_id")).as("max_doc"))
        .orderBy(col("split"), col("lang"))
    },
    // rows-only (xxhash64-based)
    "q_text_fingerprint" -> { (s, dir) =>
      fingerprints(Tables.documents(s, dir))
        .select(col("doc_id"), element_at(col("fingerprint"), 1).as("min_fp"))
        .orderBy(col("doc_id"))
    },
    // The GRADED winnowing twin (r6): identical sliding-window →
    // sort → keep-4 pipeline, hash = the shared md5 digest, so the
    // full fingerprint (not just row counts) hash-matches DuckDB.
    "q_text_fingerprint_md5" -> { (s, dir) =>
      fingerprintsMd5(Tables.documents(s, dir))
        .select(col("doc_id"),
          element_at(col("fingerprint"), 1).as("min_fp"),
          // concat_ws never returns NULL (a NULL array joins to "") but
          // the oracle's array_to_string(NULL) is NULL — guard so a
          // NULL-text doc's fp4 stays NULL on both engines (r11)
          when(col("fingerprint").isNotNull,
            concat_ws(",", transform(col("fingerprint"),
              x => x.cast("string")))).as("fp4"))
        .orderBy(col("doc_id"))
    },
    // PII detection: per-language doc/hit counts over the planted
    // corpus — one scan, three codegen'd regexp_count columns, one
    // partial+final aggregation (no window, no join).
    "q_text_pii" -> { (s, dir) =>
      piiCounts(plantPii(Tables.documents(s, dir)))
        .groupBy(col("lang"))
        .agg(count(lit(1)).cast("long").as("n_docs"),
          count_if(col("n_email") > 0).cast("long").as("docs_email"),
          sum(col("n_email")).cast("long").as("n_emails"),
          count_if(col("n_phone") > 0).cast("long").as("docs_phone"),
          sum(col("n_phone")).cast("long").as("n_phones"),
          sum(col("n_ip")).cast("long").as("n_ips"))
        .orderBy(col("lang"))
    },
    // URL-canonicalization dedup (r5) — the CommonCrawl-scale staple:
    // the same page is re-crawled as www./non-www, default-port,
    // trailing-slash and utm-tagged variants, and exact text dedup
    // misses them all. URLs are PLANTED deterministically off doc_id
    // (the corpus has none — the q_text_pii precedent, mirrored
    // literally in the oracle): ids 4g..4g+3 are four variants of page
    // g, except ids ≡ 0 (mod 5) which get a unique path (true
    // singletons the HAVING bar must drop — the filter is never
    // vacuous). Canonicalize with a fixed regexp_replace chain
    // (fragment → trailing utm → www. → :80 → trailing slash; every
    // pattern in the Java-regex/RE2 common subset), then one
    // hash-partitioned groupBy(canon) — at crawl scale exactly the
    // q_dedup_exact shuffle shape, with the canonical key ~60 bytes
    // instead of the document. Groups keep min(doc_id) as canonical.
    "q_dedup_url" -> { (s, dir) =>
      val g = expr("doc_id DIV 4").cast("string")
      val id = col("doc_id").cast("string")
      val m = col("doc_id") % 4
      val raw = when(col("doc_id") % 5 === 0,
          concat(lit("http://site"), g, lit(".com/only"), id))
        .when(m === 0, concat(lit("http://site"), g, lit(".com/p"), g))
        .when(m === 1, concat(lit("http://www.site"), g, lit(".com/p"), g))
        .when(m === 2, concat(lit("http://site"), g, lit(".com:80/p"), g, lit("/")))
        .otherwise(concat(lit("http://site"), g, lit(".com/p"), g,
          lit("?utm_source=feed")))
      // Every pattern matches AT MOST ONCE BY CONSTRUCTION: the two
      // tail patterns are $-anchored, and the www./port patterns are
      // ^-anchored to the scheme+authority — necessary because Spark's
      // regexp_replace is replace-ALL while DuckDB's default is
      // replace-FIRST, so an unanchored '://www.' or ':80/' recurring
      // later in the PATH would canonicalize differently per engine.
      val canon =
        regexp_replace(
          regexp_replace(
            regexp_replace(
              regexp_replace(
                regexp_replace(lower(raw), "#.*$", ""),
                "\\?utm_[a-z_]+=[a-z]*$", ""),
              "^([a-z]+)://www\\.", "$1://"),
            "^([a-z]+://[^/]*):80/", "$1/"),
          "/$", "")
      Tables.documents(s, dir)
        .select(col("doc_id"), canon.as("canon"))
        .groupBy(col("canon"))
        .agg(count(lit(1)).cast("long").as("n_dups"),
          min(col("doc_id")).as("canonical_id"))
        .where(col("n_dups") > 1)
        .orderBy(col("canon"))
    },
    // Boilerplate-line removal (r6) — the CCNet-style crawl-cleaning
    // staple the text family lacked: split docs into lines, count each
    // line's document frequency, drop lines appearing in >20% of the
    // corpus (nav bars, cookie banners, footers), reassemble the rest
    // in position order. Lines are PLANTED deterministically (the
    // corpus is single-line; q_dedup_url precedent, mirrored literally
    // in the oracle): a header ALL docs share (must be removed), the
    // doc's own text (df 1 — kept), a footer shared by doc_id%7
    // (df ≈ n/7 < n/5 — kept, proving the bar is not remove-everything).
    // Scale shape: line-df is a partial+final aggregation on ~60-byte
    // keys; the hot set is PROVABLY ≤ 15 rows (Σ df over lines ≤ 3n
    // total occurrences, so at most 15 lines can each exceed n/5) —
    // the broadcast anti-join is mathematically bounded, not hoped;
    // reassembly is one groupBy(doc) collect in position order. The
    // integer threshold (5·df > n) avoids any FP comparison.
    "q_text_boilerplate" -> { (s, dir) =>
      val raw = concat(lit("header common boilerplate notice"), lit("\n"),
        col("text"), lit("\n"),
        lit("footer site"), (col("doc_id") % 7).cast("string"))
      removeBoilerplateLines(Tables.documents(s, dir).withColumn("text", raw))
        .select(col("doc_id"), col("n_kept"),
          (lit(3L) - col("n_kept")).as("n_removed"),
          md5(col("text")).as("clean_md5"))
        .orderBy(col("doc_id"))
    },
    // PII redaction: rows that had any hit, with the redacted text
    // verified by md5 — a byte-exact cross-engine check of the full
    // three-stage replacement, not just the counts. One scan: counts
    // and redaction are sibling scalar expressions over the same row.
    "q_text_redact" -> { (s, dir) =>
      val nPii = (regexp_count(col("text"), lit(EmailPat)) +
        regexp_count(col("text"), lit(PhonePat)) +
        regexp_count(col("text"), lit(Ipv4Pat))).cast("long")
      val red = redactedText(col("text"))
      plantPii(Tables.documents(s, dir))
        .select(col("doc_id"), nPii.as("n_pii"), md5(red).as("red_md5"),
          length(red).cast("long").as("red_len"))
        .where(col("n_pii") > 0)
        .orderBy(col("doc_id"))
    }
  )

  /** Whole-word redaction: replace every `\b term \b` match with
    * `mask`, collapse any doubled whitespace the removal left, and
    * report the hit count per doc. The term is regex-quoted and the
    * mask replacement-quoted, so metacharacter inputs ("C++", "$1")
    * redact literally instead of crashing or group-referencing. */
  def scrub(docs: org.apache.spark.sql.DataFrame, term: String,
            mask: String): org.apache.spark.sql.DataFrame = {
    val pat = "\\b" + java.util.regex.Pattern.quote(term) + "\\b"
    val rep = java.util.regex.Matcher.quoteReplacement(mask)
    docs.select(col("doc_id"),
      size(regexp_extract_all(col("text"), lit(pat), lit(0))).cast("long").as("n_hits"),
      trim(regexp_replace(regexp_replace(col("text"), pat, rep), " +", " "))
        .as("clean"))
  }

  private def evidenceSql(lang: String): String = {
    val set = stop(lang).map(w => s"'$w'").mkString(", ")
    s"CAST(len(list_filter(string_split(text, ' '), t -> t IN ($set))) AS DOUBLE) / len(string_split(text, ' '))"
  }

  val oracle: Map[String, String] = Map(
    "q_dedup_url" ->
      """WITH raw AS (
        |  SELECT doc_id,
        |    CASE
        |      WHEN doc_id % 5 = 0 THEN 'http://site' || g || '.com/only' || CAST(doc_id AS VARCHAR)
        |      WHEN doc_id % 4 = 0 THEN 'http://site' || g || '.com/p' || g
        |      WHEN doc_id % 4 = 1 THEN 'http://www.site' || g || '.com/p' || g
        |      WHEN doc_id % 4 = 2 THEN 'http://site' || g || '.com:80/p' || g || '/'
        |      ELSE 'http://site' || g || '.com/p' || g || '?utm_source=feed'
        |    END AS url
        |  FROM (SELECT doc_id, CAST(doc_id // 4 AS VARCHAR) AS g FROM documents) s),
        |c AS (
        |  SELECT doc_id,
        |    regexp_replace(
        |      regexp_replace(
        |        regexp_replace(
        |          regexp_replace(
        |            regexp_replace(lower(url), '#.*$', ''),
        |            '\?utm_[a-z_]+=[a-z]*$', ''),
        |          '^([a-z]+)://www\.', '\1://'),
        |        '^([a-z]+://[^/]*):80/', '\1/'),
        |      '/$', '') AS canon
        |  FROM raw)
        |SELECT canon, CAST(COUNT(*) AS BIGINT) AS n_dups, MIN(doc_id) AS canonical_id
        |FROM c
        |GROUP BY canon
        |HAVING COUNT(*) > 1
        |ORDER BY canon""".stripMargin,

    "q_text_langid" ->
      s"""SELECT doc_id, lang AS tagged_lang,
         |  ${evidenceSql("de")} AS score_de,
         |  ${evidenceSql("en")} AS score_en,
         |  ${evidenceSql("es")} AS score_es,
         |  ${evidenceSql("fr")} AS score_fr
         |FROM documents
         |ORDER BY doc_id""".stripMargin,

    // empty-doc guard mirrors qualityScore: punct_ratio 0 by definition
    // (DuckDB's 0.0/0.0 is NULL, Spark ANSI's is an error — neither is
    // the declared semantics)
    "q_text_quality" ->
      """SELECT doc_id,
        |  LEAST(CAST(length(text) AS DOUBLE) / 400.0, 1.0) AS len_score,
        |  CASE WHEN length(text) = 0 THEN 0.0
        |    ELSE CAST(length(text) - length(translate(text, '.,;:!?', '')) AS DOUBLE)
        |      / length(text) END AS punct_ratio,
        |  (CAST(length(text) AS DOUBLE) - (len(string_split(text, ' ')) - 1))
        |    / len(string_split(text, ' ')) AS mean_tok_len,
        |  (LEAST(CAST(length(text) AS DOUBLE) / 400.0, 1.0)
        |    + (1.0 - CASE WHEN length(text) = 0 THEN 0.0
        |        ELSE CAST(length(text) - length(translate(text, '.,;:!?', '')) AS DOUBLE)
        |          / length(text) END)) / 2.0 AS quality
        |FROM documents
        |ORDER BY doc_id""".stripMargin,

    "q_text_tokens_est" ->
      """SELECT doc_id,
        |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
        |  CAST(list_sum(list_transform(string_split(text, ' '),
        |    t -> CAST(ceil(CAST(length(t) AS DOUBLE) / 4.0) AS BIGINT))) AS BIGINT) AS n_bpe_est
        |FROM documents
        |ORDER BY doc_id""".stripMargin,

    "q_text_bpe" ->
      s"""SELECT doc_id,
         |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
         |  CAST(list_sum(list_transform(string_split(text, ' '),
         |    t -> $bpeCountsSql)) AS BIGINT) AS n_tok_bpe
         |FROM documents
         |ORDER BY doc_id""".stripMargin,

    // adjacent-pair explode + two count joins + the exact integer
    // PMI-monotone score; // is DuckDB's integer floor-div = Spark's
    // DIV on the nonnegative counts
    "q_text_colloc" ->
      """WITH tk AS (
        |  SELECT string_split(text, ' ') AS w FROM documents
        |  WHERE text IS NOT NULL),
        |pairs AS (
        |  SELECT unnest(list_transform(range(1, len(w)), i ->
        |    struct_pack(w1 := w[i], w2 := w[i + 1]))) AS s
        |  FROM tk WHERE len(w) >= 2),
        |big AS (
        |  SELECT s.w1 AS w1, s.w2 AS w2, CAST(COUNT(*) AS BIGINT) AS cxy
        |  FROM pairs GROUP BY 1, 2 HAVING COUNT(*) >= 5),
        |uni AS (
        |  SELECT u AS w, CAST(COUNT(*) AS BIGINT) AS c
        |  FROM (SELECT unnest(w) AS u FROM tk) GROUP BY 1)
        |SELECT w1, w2, cxy,
        |  CAST((cxy * 1000000000) // (ux.c * uy.c) AS BIGINT) AS score
        |FROM big JOIN uni ux ON big.w1 = ux.w
        |         JOIN uni uy ON big.w2 = uy.w
        |ORDER BY score DESC, w1, w2
        |LIMIT 100""".stripMargin,

    // the same pair explode as colloc feeding the LM aggregation AND
    // the scoring join; // is DuckDB's floor-div = Spark's DIV on the
    // nonnegative counts, and every SUM is CAST back from HUGEINT
    // (§2.8 rule 4). NULL fluency_q for bigram-less docs on both
    // sides (NULL // and NULL DIV propagate).
    "q_text_lm_fluency" ->
      """WITH tk AS (
        |  SELECT doc_id, string_split(text, ' ') AS w FROM documents
        |  WHERE text IS NOT NULL),
        |pd AS (
        |  SELECT doc_id, s.w1 AS w1, s.w2 AS w2 FROM (
        |    SELECT doc_id, unnest(list_transform(range(1, len(w)), i ->
        |      struct_pack(w1 := w[i], w2 := w[i + 1]))) AS s
        |    FROM tk WHERE len(w) >= 2)),
        |big AS (
        |  SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS cxy
        |  FROM pd GROUP BY 1, 2),
        |hist AS (
        |  SELECT w1, CAST(SUM(cxy) AS BIGINT) AS hx FROM big GROUP BY 1),
        |voc AS (
        |  SELECT CAST(COUNT(DISTINCT u) AS BIGINT) AS v
        |  FROM (SELECT unnest(w) AS u FROM tk)),
        |sc AS (
        |  SELECT pd.doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
        |    CAST(SUM(((cxy + 1) * 1000000000) // (hx + v)) AS BIGINT)
        |      AS score_sum
        |  FROM pd JOIN big USING (w1, w2) JOIN hist USING (w1)
        |       CROSS JOIN voc
        |  GROUP BY 1)
        |SELECT d.doc_id,
        |  COALESCE(sc.n_bigrams, CAST(0 AS BIGINT)) AS n_bigrams,
        |  COALESCE(sc.score_sum, CAST(0 AS BIGINT)) AS score_sum,
        |  CAST(sc.score_sum // sc.n_bigrams AS BIGINT) AS fluency_q
        |FROM documents d LEFT JOIN sc ON d.doc_id = sc.doc_id
        |ORDER BY d.doc_id""".stripMargin,

    // shingle explode → corpus-repeated set → per-doc island merge;
    // the window frames mirror Spark's rowsBetween exactly and every
    // windowed SUM/COUNT output is CAST back from HUGEINT (§2.8
    // rule 4). 1-based inclusive token indices on both sides.
    "q_dedup_substring" ->
      """WITH tk AS (
        |  SELECT doc_id, string_split(text, ' ') AS w FROM documents
        |  WHERE text IS NOT NULL),
        |ps AS (
        |  SELECT doc_id, CAST(i AS BIGINT) AS pos,
        |    list_aggregate(w[i:i+7], 'string_agg', ' ') AS sh
        |  FROM (SELECT doc_id, w, unnest(range(1, len(w) - 6)) AS i
        |        FROM tk WHERE len(w) >= 8)),
        |dup AS (SELECT sh FROM ps GROUP BY sh HAVING COUNT(*) > 1),
        |mk AS (SELECT doc_id, pos FROM ps
        |       WHERE sh IN (SELECT sh FROM dup)),
        |fl AS (
        |  SELECT doc_id, pos,
        |    CASE WHEN MAX(pos + 7) OVER (PARTITION BY doc_id
        |        ORDER BY pos ROWS BETWEEN UNBOUNDED PRECEDING
        |        AND 1 PRECEDING) IS NULL
        |      OR pos > MAX(pos + 7) OVER (PARTITION BY doc_id
        |        ORDER BY pos ROWS BETWEEN UNBOUNDED PRECEDING
        |        AND 1 PRECEDING) + 1
        |    THEN 1 ELSE 0 END AS flag
        |  FROM mk),
        |isl AS (
        |  SELECT doc_id, pos,
        |    SUM(flag) OVER (PARTITION BY doc_id ORDER BY pos
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS island
        |  FROM fl)
        |SELECT doc_id, CAST(MIN(pos) AS BIGINT) AS span_start,
        |  CAST(MAX(pos) + 7 AS BIGINT) AS span_end,
        |  CAST(COUNT(*) AS BIGINT) AS n_shingles
        |FROM isl GROUP BY doc_id, island
        |ORDER BY doc_id, span_start""".stripMargin,

    // exclusive running sum // capacity — DuckDB's window ROWS frame and
    // integer // match Spark's rowsBetween(unboundedPreceding, -1) + DIV.
    // CAST back to BIGINT: DuckDB's window SUM(BIGINT) widens to HUGEINT and
    // // preserves it, while Spark emits BIGINT (§2.8 rule 4 — every output
    // column, including derived ones, needs an explicit CAST on both sides).
    "q_pack_sequences" ->
      """WITH t AS (
        |  SELECT doc_id, lang,
        |    list_sum(list_transform(string_split(text, ' '),
        |      x -> CAST(ceil(CAST(length(x) AS DOUBLE) / 4.0) AS BIGINT))) AS tok
        |  FROM documents),
        |p AS (
        |  SELECT doc_id, lang, tok,
        |    CAST(COALESCE(SUM(tok) OVER (PARTITION BY lang ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) // 512
        |      AS BIGINT) AS seq_id
        |  FROM t)
        |SELECT lang, seq_id, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(tok) AS BIGINT) AS sum_tok,
        |  MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
        |FROM p GROUP BY lang, seq_id ORDER BY lang, seq_id""".stripMargin,

    // the BPE-budgeted packer: q_text_bpe's frozen count table inside
    // q_pack_sequences' boundary arithmetic (seq_id CAST per §2.8
    // rule 4 — window SUM widens to HUGEINT)
    "q_pack_bpe" ->
      s"""WITH d AS (
         |  SELECT doc_id, lang,
         |    list_sum(list_transform(string_split(text, ' '),
         |      t -> $bpeCountsSql)) AS tok
         |  FROM documents),
         |p AS (
         |  SELECT doc_id, lang, tok,
         |    CAST(COALESCE(SUM(tok) OVER (PARTITION BY lang ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) // 128
         |      AS BIGINT) AS seq_id
         |  FROM d)
         |SELECT lang, seq_id, CAST(COUNT(*) AS BIGINT) AS n_docs,
         |  CAST(SUM(tok) AS BIGINT) AS sum_tok,
         |  MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
         |FROM p GROUP BY lang, seq_id ORDER BY lang, seq_id""".stripMargin,

    // the sharded packer: q_sample_split's md5 shard digest composed
    // with q_pack_sequences' exclusive-running-sum boundary arithmetic
    // (seq_id CAST per §2.8 rule 4 — window SUM widens to HUGEINT)
    "q_pack_sharded" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT)
        |      % 32 AS shard,
        |    list_sum(list_transform(string_split(text, ' '),
        |      x -> CAST(ceil(CAST(length(x) AS DOUBLE) / 4.0) AS BIGINT))) AS tok
        |  FROM documents),
        |p AS (
        |  SELECT doc_id, shard, tok,
        |    CAST(COALESCE(SUM(tok) OVER (PARTITION BY shard ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) // 512
        |      AS BIGINT) AS seq_id
        |  FROM t)
        |SELECT shard, seq_id, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(tok) AS BIGINT) AS sum_tok,
        |  MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
        |FROM p GROUP BY shard, seq_id ORDER BY shard, seq_id""".stripMargin,

    // same 60-bit md5 digest idiom as the fingerprint/dedup twins
    "q_sample_split" ->
      """WITH b AS (
        |  SELECT doc_id, lang, n_chars,
        |    CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT)
        |      % 100 AS bucket
        |  FROM documents),
        |s AS (
        |  SELECT *, CASE WHEN bucket < 90 THEN 'train'
        |                 WHEN bucket < 95 THEN 'validation'
        |                 ELSE 'test' END AS split
        |  FROM b)
        |SELECT split, lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
        |  MIN(doc_id) AS min_doc, MAX(doc_id) AS max_doc
        |FROM s GROUP BY split, lang ORDER BY split, lang""".stripMargin,

    "q_text_clean" ->
      """SELECT doc_id,
        |  CAST(len(regexp_extract_all(text, '\bdup\b')) AS BIGINT) AS n_hits,
        |  trim(regexp_replace(regexp_replace(text, '\bdup\b', '<T>', 'g'),
        |    ' +', ' ', 'g')) AS clean
        |FROM documents
        |ORDER BY doc_id""".stripMargin,
    // q_text_fingerprint: rows-only (xxhash64 not reproducible in DuckDB)

    // the md5 winnowing twin: same windows (1-based inclusive list
    // slice tk[i:i+7] == Spark's slice(toks, i+1, 8), both clamped on
    // short docs), same 60-bit digest, same sort-and-keep-4
    "q_text_fingerprint_md5" ->
      """WITH t AS (
        |  SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
        |fp AS (
        |  SELECT doc_id,
        |    list_sort(list_transform(
        |      generate_series(1, greatest(len(tk) - 7, 1)),
        |      i -> CAST('0x' || substr(md5(array_to_string(tk[i:i+7], ' ')), 1, 15)
        |           AS BIGINT)))[1:4] AS fps
        |  FROM t)
        |SELECT doc_id, fps[1] AS min_fp,
        |  array_to_string(list_transform(fps, x -> CAST(x AS VARCHAR)), ',') AS fp4
        |FROM fp
        |ORDER BY doc_id""".stripMargin,

    // same planted lines; NOT IN for the anti-join (the hot set is
    // NULL-free by construction), string_agg in position order; pos is
    // 1-based here vs 0-based posexplode — order-only, never output
    "q_text_boilerplate" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    'header common boilerplate notice' || chr(10) || text || chr(10) ||
        |    'footer site' || CAST(doc_id % 7 AS VARCHAR) AS raw
        |  FROM documents),
        |lined AS (
        |  SELECT doc_id, pos, line FROM (
        |    SELECT doc_id, unnest(string_split(raw, chr(10))) AS line,
        |           generate_subscripts(string_split(raw, chr(10)), 1) AS pos
        |    FROM d) u),
        |n AS (SELECT COUNT(*) AS n_docs FROM documents),
        |hot AS (
        |  SELECT line FROM lined CROSS JOIN n
        |  GROUP BY line, n_docs
        |  HAVING COUNT(DISTINCT doc_id) * 5 > n_docs),
        |kept AS (
        |  SELECT * FROM lined WHERE line NOT IN (SELECT line FROM hot))
        |SELECT doc_id,
        |  CAST(COUNT(*) AS BIGINT) AS n_kept,
        |  CAST(3 - COUNT(*) AS BIGINT) AS n_removed,
        |  md5(string_agg(line, chr(10) ORDER BY pos)) AS clean_md5
        |FROM kept
        |GROUP BY doc_id
        |ORDER BY doc_id""".stripMargin,

    "q_text_pii" ->
      s"""WITH planted AS ($plantedSql),
         |c AS (SELECT doc_id, lang,
         |  CAST(len(regexp_extract_all(text, '$EmailPat')) AS BIGINT) AS n_email,
         |  CAST(len(regexp_extract_all(text, '$PhonePat')) AS BIGINT) AS n_phone,
         |  CAST(len(regexp_extract_all(text, '$Ipv4Pat')) AS BIGINT) AS n_ip
         |FROM planted)
         |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(count(*) FILTER (WHERE n_email > 0) AS BIGINT) AS docs_email,
         |  CAST(sum(n_email) AS BIGINT) AS n_emails,
         |  CAST(count(*) FILTER (WHERE n_phone > 0) AS BIGINT) AS docs_phone,
         |  CAST(sum(n_phone) AS BIGINT) AS n_phones,
         |  CAST(sum(n_ip) AS BIGINT) AS n_ips
         |FROM c GROUP BY lang ORDER BY lang""".stripMargin,

    "q_text_redact" ->
      s"""WITH planted AS ($plantedSql),
         |r AS (SELECT doc_id,
         |  CAST(len(regexp_extract_all(text, '$EmailPat'))
         |     + len(regexp_extract_all(text, '$PhonePat'))
         |     + len(regexp_extract_all(text, '$Ipv4Pat')) AS BIGINT) AS n_pii,
         |  regexp_replace(regexp_replace(regexp_replace(text,
         |    '$EmailPat', '<EMAIL>', 'g'),
         |    '$Ipv4Pat', '<IP>', 'g'),
         |    '$PhonePat', '<PHONE>', 'g') AS red
         |FROM planted)
         |SELECT doc_id, n_pii, md5(red) AS red_md5,
         |  CAST(length(red) AS BIGINT) AS red_len
         |FROM r WHERE n_pii > 0 ORDER BY doc_id""".stripMargin
  )

  /** The oracle-side twin of [[plantPii]] — byte-identical suffixes. */
  private def plantedSql: String =
    """SELECT doc_id, lang,
      |  CASE WHEN doc_id % 7 = 0 THEN text || ' contact user' ||
      |         CAST(doc_id AS VARCHAR) || '@mail.example.com or admin' ||
      |         CAST(doc_id % 97 AS VARCHAR) || '@corp.example.org asap'
      |       WHEN doc_id % 7 = 3 THEN text || ' call 555-' ||
      |         lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ||
      |         ' from 10.' || CAST(doc_id % 256 AS VARCHAR) || '.0.' ||
      |         CAST((doc_id * 7) % 256 AS VARCHAR)
      |       ELSE text END AS text
      |FROM documents""".stripMargin
}
