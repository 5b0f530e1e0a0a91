package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for a large-scale training-data pipeline, over the
  * `documents` table (builder prompt: language-ID, quality scoring, token
  * counting, fingerprinting). Everything here is pure codegen'd Column
  * expressions — no UDFs — so the whole stage fuses into one codegen span and
  * the DuckDB oracle can replicate each formula exactly.
  *
  * These generalize the reference's string surface (SURVEY.md §2.7 — regex
  * normalize/extract at nambu_merge_pv_data.py:16-31, pv_test/init_db.py:75-96)
  * from plant names to document corpora.
  */
object TextOps {

  /** Spread a CPU-bound per-row stage (shingling, signature hashing) across
    * all cores when the source would provide fewer splits than the cluster's
    * parallelism — a small parquet file arrives as ONE split, which
    * serializes the expensive map work onto one core no matter how wide the
    * cluster is. The decision reads the OPTIMIZED-plan size estimate only
    * (scan relation stats — no physical planning, no job, and no `df.rdd`,
    * which under AQE plans the subtree a second time and can diverge from the
    * plan actually executed): fewer than `parallelism` max-partition-bytes
    * splits would come out of the scan ⇒ repartition. At real corpus scale
    * input splits ≫ cores, the estimate exceeds the cutoff and this is a
    * no-op (no shuffle added). */
  def spreadForCpu(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val par = spark.sparkContext.defaultParallelism
    val maxPartBytes = org.apache.spark.network.util.JavaUtils.byteStringAsBytes(
      spark.conf.get("spark.sql.files.maxPartitionBytes", "128MB"))
    val estBytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    // UNKNOWN stats (RDD-backed frames report the defaultSizeInBytes
    // sentinel, exactly Long.MaxValue) must spread, not skip — treating
    // "unknown" as "huge" would reintroduce the single-core serialization
    // this helper prevents. Estimates ABOVE the sentinel are real (BigInt
    // join-product estimates): genuinely huge inputs stay untouched.
    val unknown = estBytes == BigInt(Long.MaxValue)
    if (unknown || estBytes < BigInt(par) * maxPartBytes)
      df.repartition(par)
    else df
  }

  /** Whitespace tokens (single-space corpus → plain split). */
  def tokens(text: Column): Column = split(text, " ")

  def tokenCount(text: Column): Column = size(tokens(text)).cast("long")

  /** Wordish-token count via regex (the BPE-ish second tokenizer). */
  def wordTokenCount(text: Column): Column =
    regexp_count(text, lit("[a-z0-9]+")).cast("long")

  /** Crude byte-per-token BPE estimate (≈4 chars/token heuristic). */
  def bpeTokenEstimate(text: Column): Column =
    ceil(length(text) / 4.0).cast("long")

  /** Occurrences of an exact token (not substring) in the text. */
  def tokenOccurrences(text: Column, token: String): Column =
    size(filter(tokens(text), t => t === lit(token))).cast("long")

  /** Per-group marker-token occurrence counts in ONE tokenize pass — the
    * fused kernel behind [[stopwordRatio]]/[[qualityScore]]/[[langId]] (the
    * per-marker HOF route re-splits the text G×M times, interpreted; see
    * [[graft.engine.expressions.MarkerCounts]]). Returns array<long>, one
    * count per group, 1-indexed via `element_at`. */
  def markerCounts(text: Column, groups: Seq[Seq[String]]): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(expressions.MarkerCounts(
      ColumnBridge.expression(text), groups))
  }

  /** Mean token length for single-space-joined text:
    * (chars - separators) / tokens. */
  def meanTokenLength(text: Column): Column = {
    val n = size(tokens(text))
    round((length(text) - (n - lit(1))).cast("double") / n, 6)
  }

  /** Stopword ratio: occurrences of any marker token / token count. */
  def stopwordRatio(text: Column, stopwords: Seq[String]): Column = {
    val hits = element_at(markerCounts(text, Seq(stopwords)), 1)
    round(hits.cast("double") / tokenCount(text), 6)
  }

  /** Language marker lists — deterministic scoring vocab, shared with the
    * oracle. (The testdata's `lang` column is a synthetic label over one
    * common vocabulary, so language-ID here is a formula, not a model.) */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "en" -> Seq("the", "a", "of", "and", "is"),
    "es" -> Seq("el", "los", "las", "y", "es"),
    "fr" -> Seq("le", "les", "et", "est", "du"))

  /** N-gram-heuristic language ID: marker-token occurrence score per
    * language; argmax with deterministic lexicographic tie-break; "und" when
    * no marker hits. */
  def langId(text: Column): Column = {
    // ONE fused tokenize+count pass shared by all four scores (Catalyst CSE
    // collapses the identical deterministic markerCounts subtrees)
    val counts = markerCounts(text, langMarkers.map(_._2))
    val scores = langMarkers.zipWithIndex.map { case ((lang, _), i) =>
      lang -> element_at(counts, i + 1)
    }
    // CASE cascade: lang i wins when its score is positive and >= every later
    // score — equivalent to argmax with earliest (lexicographic) tie-break,
    // and mirrors the oracle's CASE chain 1:1.
    scores.zipWithIndex.foldRight(lit("und")) {
      case (((lang, s), i), elseCol) =>
        val wins = scores.drop(i + 1)
          .map { case (_, s2) => s >= s2 }
          .foldLeft(s > 0)(_ && _)
        when(wins, lang).otherwise(elseCol)
    }
  }

  /** Quality score in integer milli-points [0, 1000]: clamped blend of
    * length, stopword density and token shape. ALL-INTEGER arithmetic
    * (floor divisions) — float blends of rounded ratios systematically land
    * on rounding boundaries (e.g. ratio×1.5 → exact 7th-digit-5) where
    * engines disagree by 1 ulp; integers are bit-exact everywhere. */
  def qualityScore(text: Column, stopwords: Seq[String]): Column = {
    val nTok = size(tokens(text)).cast("long")
    val nChars = length(text).cast("long")
    val hits = element_at(markerCounts(text, Seq(stopwords)), 1)
    // exact integer division: strip the remainder first, then the double
    // division is exact (multiples of b below 2^53)
    def intDiv(a: Column, b: Column): Column =
      ((a - pmod(a, b)) / b).cast("long")
    // mean token length ×nTok == nChars - (nTok - 1) for single-space text
    val meanDevX50 = abs(nChars - (nTok - lit(1)) - lit(5) * nTok) * lit(50)
    val raw = lit(200L) + least(nChars, lit(500L)) +
      intDiv(hits * lit(1500), nTok) - intDiv(meanDevX50, nTok)
    least(lit(1000L), greatest(lit(0L), raw))
  }

  /** Exact content fingerprint (md5 — identical in DuckDB). */
  def fingerprint(text: Column): Column = md5(text)

  /** Strip HTML-ish markup: drop tags, decode the common entities, collapse
    * whitespace — the text-extraction pass every web-corpus pipeline runs
    * before quality filtering. Entity decode order matters: `&amp;` decodes
    * LAST so double-escaped text un-escapes exactly one level
    * (`&amp;lt;` → `&lt;`, never `<`). Pure codegen'd regexp chain — one
    * per-row pass, no UDF, replicated verbatim in the oracle. */
  def stripMarkup(text: Column): Column = {
    val noTags = regexp_replace(text, "<[^>]*>", " ")
    val decoded = Seq(
      "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")
      .foldLeft(noTags) { case (c, (ent, rep)) => regexp_replace(c, ent, rep) }
    trim(regexp_replace(decoded, " +", " "))
  }

  /** URL normalization (the canonical form web-corpus dedup and domain
    * statistics key on): lowercase scheme and host, strip default ports
    * (:80/:443), drop the fragment and `utm_*` tracking params. Pure
    * regexp chain — Spark's regexp_replace replaces ALL occurrences, so the
    * oracle mirrors every replace with the 'g' flag. */
  def normalizeUrl(url: Column): Column = {
    val scheme = lower(regexp_extract(url, "^([a-zA-Z][a-zA-Z0-9+.-]*)://", 1))
    val host = regexp_extract(url, "^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]+)", 1)
    val hostNorm = lower(regexp_replace(host, ":(443|80)$", ""))
    val rest = regexp_replace(url, "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]+", "")
    val noFrag = regexp_replace(rest, "#.*", "")
    // leading run first: `?(utm_…&)+` collapses ANY number of consecutive
    // leading utm params in one match (a single `\?utm_…&` replace would
    // leave the second of two adjacent leading params behind — no rescan)
    val noUtm = regexp_replace(
      regexp_replace(
        regexp_replace(noFrag, "\\?(utm_[^&#]*&)+", "?"),
        "&utm_[^&#]*", ""),
      "\\?utm_[^&#]*$", "")
    concat(scheme, lit("://"), hostNorm, noUtm)
  }

  /** Registrable domain as the last two dot-labels of a host (the
    * public-suffix-list-free approximation — good for .com/.org/.io;
    * two-level ccTLDs like .co.uk need the PSL, out of scope offline). */
  def registrableDomain(host: Column): Column =
    regexp_extract(host, "([^.]+\\.[^.]+)$", 1)

  /** Gopher-style document quality rules (Rae et al. 2021 appendix A),
    * ALL-INTEGER comparisons so every flag is bit-exact cross-engine:
    *  - `len_ok`        minTokens <= n_tokens <= maxTokens
    *  - `mean_len_ok`   mean token length in [3, 10] — compared as
    *                    3·n ≤ Σlen ≤ 10·n (Σ token lengths = chars − (n−1)
    *                    for single-space text; no division)
    *  - `alpha_ok`      ≥ 80% of tokens contain a letter (5·alpha ≥ 4·n)
    *  - `symbol_ok`     ≤ 10% symbol tokens (`#`/`...`) (10·sym ≤ n)
    *  - `stop_ok`       ≥ 2 stopword occurrences (one fused MarkerCounts)
    * `keep` is the conjunction. One codegen'd per-row pass, corpus-linear;
    * [[spreadForCpu]] guards the few-splits small-file case. */
  def gopherFilter(docs: DataFrame, id: Column, text: Column,
                   stopwords: Seq[String],
                   minTokens: Long = 50L, maxTokens: Long = 100000L): DataFrame = {
    val toks = tokens(text)
    val nTok = size(toks).cast("long")
    val sumTokLen = length(text).cast("long") - (nTok - lit(1L))
    val nAlpha = size(filter(toks, t => t.rlike("[a-z]"))).cast("long")
    val nSym = size(filter(toks, t => t === "#" || t === "...")).cast("long")
    val hits = element_at(markerCounts(text, Seq(stopwords)), 1)
    val lenOk = nTok >= minTokens && nTok <= maxTokens
    val meanLenOk = lit(3L) * nTok <= sumTokLen && sumTokLen <= lit(10L) * nTok
    val alphaOk = lit(5L) * nAlpha >= lit(4L) * nTok
    val symbolOk = lit(10L) * nSym <= nTok
    val stopOk = hits >= lit(2L)
    spreadForCpu(docs).select(id.as("doc_id"), nTok.as("n_tokens"),
      lenOk.as("len_ok"), meanLenOk.as("mean_len_ok"), alphaOk.as("alpha_ok"),
      symbolOk.as("symbol_ok"), stopOk.as("stop_ok"),
      (lenOk && meanLenOk && alphaOk && symbolOk && stopOk).as("keep"))
  }

  /** Winnowing fingerprints (the MOSS scheme): polynomial rolling hash over
    * character k-grams, then the minimum hash per sliding window of w —
    * guarantees any shared substring of length >= k + w - 1 yields a shared
    * fingerprint, with density ~ 2/(w+1). Pure per-row kernel → typed
    * flatMap; deterministic across JVMs (fixed base/modulus, no RNG).
    * Output: (doc_id, fp) distinct. */
  def winnowFingerprints(docs: DataFrame, id: Column, text: Column,
                         k: Int = 8, w: Int = 4): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    // MEASURED NON-CHANGE (r14): spreading the flatMap across cores +
    // sharing one fp-keyed exchange regressed q_winnow_pairs 1.33→1.42 s
    // (BenchFocus steady) — the rolling-hash kernel is cheap per char, so
    // the text shuffle and per-task deserialization the spread adds cost
    // more than the ~0.3 s single-task funnel it removes (FunnelScan r14:
    // 0.29 s/1t, 34% of stage wall). Same class as the r13 simhash spread
    // counter-example; revisit only if the kernel's per-row cost grows.
    docs.select(id.cast("long").as("doc_id"), text.cast("string").as("t"))
      .as[(Long, String)]
      .flatMap { case (docId, t) =>
        winnow(t, k, w).map(fp => (docId, fp))
      }
      .toDF("doc_id", "fp")
      .distinct()
  }

  /** Rolling-hash winnowing kernel (driver-free; runs inside tasks). */
  private[graft] def winnow(text: String, k: Int, w: Int): Array[Long] = {
    val n = text.length
    if (n < k) return Array.empty
    val B = 257L
    val M = 1000000007L // products stay < 2^63 with 31-bit values
    var powK = 1L
    var i = 0
    while (i < k - 1) { powK = powK * B % M; i += 1 }
    val m = n - k + 1
    val hs = new Array[Long](m)
    var h = 0L
    i = 0
    while (i < k) { h = (h * B + text.charAt(i)) % M; i += 1 }
    hs(0) = h
    i = 1
    while (i < m) {
      h = ((h - text.charAt(i - 1) * powK % M + M * B) % M * B +
        text.charAt(i + k - 1)) % M
      hs(i) = h
      i += 1
    }
    if (m <= w) return Array(hs.min)
    val out = scala.collection.mutable.LinkedHashSet.empty[Long]
    i = 0
    while (i + w <= m) {
      var best = hs(i)
      var j = i + 1
      while (j < i + w) { if (hs(j) <= best) best = hs(j); j += 1 }
      out += best
      i += 1
    }
    out.toArray
  }

  /** Content-defined chunking (the rolling-hash cut rule of LBFS/rsync-style
    * dedup): a chunk boundary falls AFTER position p when the k-char window
    * ending at p satisfies `hash & (2^maskBits − 1) == mask` — so boundaries
    * depend only on LOCAL content and re-synchronize after an insertion,
    * unlike fixed-size chunking where one shifted byte invalidates every
    * later chunk. minLen/maxLen bound chunk sizes (expected ≈ 2^maskBits
    * chars between cuts). Pure per-row kernel (same deterministic polynomial
    * hash as [[winnow]] — no RNG, identical across JVMs); corpus-linear,
    * embarrassingly parallel. Output: (doc_id, chunk_ix, start, len, fp)
    * with fp a 64-bit content hash of the chunk — join fps across docs for
    * sub-document exact dedup. */
  def cdcChunks(docs: DataFrame, id: Column, text: Column,
                k: Int = 16, maskBits: Int = 6,
                minLen: Int = 32, maxLen: Int = 256): DataFrame = {
    require(k >= 1 && maskBits >= 1 && minLen >= 1 && maxLen >= minLen,
      s"bad cdc params: k=$k maskBits=$maskBits min=$minLen max=$maxLen")
    val spark = docs.sparkSession
    import spark.implicits._
    spreadForCpu(docs)
      .select(id.cast("long").as("doc_id"), text.cast("string").as("t"))
      .as[(Long, String)]
      .flatMap { case (docId, t) =>
        cdcChunkKernel(t, k, maskBits, minLen, maxLen).map {
          case (ix, start, len, fp) => (docId, ix, start, len, fp)
        }
      }
      .toDF("doc_id", "chunk_ix", "start", "len", "fp")
  }

  /** CDC kernel (driver-free; runs inside tasks): returns
    * (chunk_ix, start, len, content fp) covering the text exactly. */
  private[graft] def cdcChunkKernel(t: String, k: Int, maskBits: Int,
                                    minLen: Int, maxLen: Int)
      : Seq[(Int, Int, Int, Long)] = {
    val n = t.length
    if (n == 0) return Seq.empty
    val B = 257L
    val M = 1000000007L
    val mask = (1L << maskBits) - 1L
    val m = n - k + 1
    // window hashes, same recurrence as [[winnow]]
    val hs = new Array[Long](math.max(m, 0))
    if (m > 0) {
      var powK = 1L
      var i = 0
      while (i < k - 1) { powK = powK * B % M; i += 1 }
      var h = 0L
      i = 0
      while (i < k) { h = (h * B + t.charAt(i)) % M; i += 1 }
      hs(0) = h
      i = 1
      while (i < m) {
        h = ((h - t.charAt(i - 1) * powK % M + M * B) % M * B +
          t.charAt(i + k - 1)) % M
        hs(i) = h
        i += 1
      }
    }
    def chunkFp(start: Int, len: Int): Long = {
      var h = 0L
      var i = start
      while (i < start + len) { h = (h * B + t.charAt(i)) % M; i += 1 }
      h * 131071L + len // length-salted so "aa"+"a" != "a"+"aa"
    }
    val out = Seq.newBuilder[(Int, Int, Int, Long)]
    var start = 0
    var ix = 0
    while (start < n) {
      val hardEnd = math.min(start + maxLen, n) // exclusive cut bound
      var cut = hardEnd
      var p = start + minLen - 1 // candidate cut AFTER char p
      var found = false
      while (!found && p < hardEnd - 1) {
        val wIx = p - k + 1
        if (wIx >= 0 && wIx < m && (hs(wIx) & mask) == mask) {
          cut = p + 1
          found = true
        }
        p += 1
      }
      val len = cut - start
      out += ((ix, start, len, chunkFp(start, len)))
      start = cut
      ix += 1
    }
    out.result()
  }

  /** Distinct n-word shingles of the text as an array column (no explode —
    * narrow, usable for per-doc set sizes without a shuffle). The unit for
    * near-dup detection. Native codegen'd kernel: the HOF formulation
    * (`array_distinct(transform(filter(sequence(...)), concat_ws(...)))`)
    * evaluates interpreted AND re-splits the text n times per window
    * position inside the lambda — see
    * [[graft.engine.expressions.ShingleStrings]]; output is bit-identical
    * (TextPrepSpec pins the parity). */
  def shingleArray(text: Column, n: Int = 3): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(graft.engine.expressions.ShingleStrings(
      ColumnBridge.expression(tokens(text)), n, dedup = true))
  }

  def shingles(df: DataFrame, id: Column, text: Column, n: Int = 3): DataFrame =
    df.select(id.as("doc_id"), explode(shingleArray(text, n)).as("shingle"))

  /** All n-word grams, NOT deduped — the totals side of repetition ratios
    * (same native kernel as [[shingleArray]], dedup off). */
  private def ngramArray(text: Column, n: Int): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(graft.engine.expressions.ShingleStrings(
      ColumnBridge.expression(tokens(text)), n, dedup = false))
  }

  /** Repetition-based quality filters in the style of the Gopher corpus
    * rules (Rae et al. 2021, "Scaling Language Models: Methods, Analysis &
    * Insights from Training Gopher", appendix A — fraction-of-duplicate-
    * n-grams and top-token dominance): per doc,
    *  - `n_tokens`
    *  - `top_token_frac` — most-frequent-token count / n_tokens, computed as
    *    the max run length over the SORTED token array (a pure HOF fold —
    *    no explode, no shuffle)
    *  - `dup_bigram_frac` / `dup_trigram_frac` — 1 − distinct/total n-grams
    * High values mark boilerplate, keyword spam and template text. One
    * codegen'd per-row pass; corpus-linear, embarrassingly parallel. */
  def repetitionStats(docs: DataFrame, id: Column, text: Column): DataFrame = {
    val toks = tokens(text)
    val nTok = size(toks)
    // max token multiplicity as max run length over the SORTED array,
    // break-position arithmetic (run starts → diffs → max): each HOF step is
    // an int compare / subtract — no struct allocation per element (a
    // struct-fold formulation measured 18.6 s on sf0.1 single-split; this
    // one 1.7 s steady-state spread across cores)
    val s = sort_array(toks)
    val starts = filter(sequence(lit(1), nTok),
      i => i === 1 || element_at(s, i) =!= element_at(s, i - 1))
    val maxRun = array_max(zip_with(
      starts,
      concat(slice(starts, lit(2), size(starts)), array(nTok + 1)),
      (a, b) => b - a))
    def dupFrac(n: Int): Column = {
      val g = ngramArray(text, n)
      val tot = size(g)
      when(tot <= 0, lit(0.0)).otherwise(
        round(lit(1.0) - size(array_distinct(g)).cast("double") / tot, 6))
    }
    // the whole stage is a CPU-bound per-row pass — spread it across cores
    // when the source arrives as fewer splits than the cluster's parallelism
    spreadForCpu(docs).select(id.as("doc_id"),
      nTok.cast("long").as("n_tokens"),
      when(nTok <= 0, lit(0.0)).otherwise(
        round(maxRun.cast("double") / nTok, 6)).as("top_token_frac"),
      dupFrac(2).as("dup_bigram_frac"),
      dupFrac(3).as("dup_trigram_frac"))
  }

  /** BPE tokenizer training (Sennrich et al. 2016, "Neural Machine
    * Translation of Rare Words with Subword Units"): the corpus-scale step
    * is ONE word-count aggregation; merge selection then iterates over the
    * word-frequency table, which is MODEL-scale BY CONSTRUCTION (like the
    * IVF centroid matrix it lives on the driver — vocab entries, not corpus
    * rows): the driver table is bounded to the `maxWords` most frequent
    * words (ties → lexicographically smaller word) meeting `minCount`.
    * Distinct-word count over a web corpus grows with the corpus (hundreds
    * of millions at 100 TB) — the uncapped collect was a driver OOM; the
    * frequency cut is also standard BPE practice (rare words contribute
    * noise pairs, Sennrich §3). The cap runs as TakeOrderedAndProject: a
    * per-partition top-N heap feeding a driver merge — no global sort, the
    * driver holds exactly min(vocab, maxWords) rows.
    * Deterministic: pair-frequency ties break to the lexicographically
    * smaller pair. Returns merges in rank order (best first). */
  def bpeTrain(docs: DataFrame, text: Column, numMerges: Int,
               minCount: Long = 1L,
               maxWords: Int = 1000000): Seq[(String, String)] = {
    require(minCount >= 1, s"minCount must be >= 1: $minCount")
    require(maxWords >= 1, s"maxWords must be >= 1: $maxWords")
    val words = docs.select(explode(tokens(text)).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
      .filter(col("c") >= minCount)
      .orderBy(col("c").desc, col("w").asc)
      .limit(maxWords)
      .collect().map(r => r.getString(0) -> r.getLong(1))
    bpeTrainFromCounts(words, numMerges)
  }

  /** Driver-side merge loop over the (model-scale) word-frequency table —
    * pure, unit-testable without Spark. */
  private[graft] def bpeTrainFromCounts(words: Array[(String, Long)],
                                        numMerges: Int): Seq[(String, String)] = {
    var vocab = words.filter(_._1.nonEmpty)
      .map { case (w, c) => (w.map(_.toString).toVector, c) }
    val merges = Seq.newBuilder[(String, String)]
    var done = false
    var iter = 0
    while (iter < numMerges && !done) {
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      vocab.foreach { case (syms, c) =>
        var i = 0
        while (i < syms.length - 1) {
          val p = (syms(i), syms(i + 1))
          counts.update(p, counts.getOrElse(p, 0L) + c)
          i += 1
        }
      }
      if (counts.isEmpty) done = true
      else {
        val best = counts.toSeq.minBy { case ((a, b), c) => (-c, a, b) }._1
        merges += best
        vocab = vocab.map { case (syms, c) => (mergePair(syms, best), c) }
        iter += 1
      }
    }
    merges.result()
  }

  private def mergePair(syms: Vector[String],
                        p: (String, String)): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i < syms.length - 1 && syms(i) == p._1 && syms(i + 1) == p._2) {
        out += (p._1 + p._2); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.result()
  }

  /** Greedy BPE segmentation of one word: repeatedly apply the
    * lowest-ranked applicable merge — the standard inference algorithm;
    * pure per-word kernel (runs inside tasks, merges ship once per task in
    * the closure). */
  private[graft] def bpeSegmentWord(word: String,
                                    rank: Map[(String, String), Int]): Vector[String] = {
    var syms = word.map(_.toString).toVector
    var continue = syms.length > 1
    while (continue) {
      var bestRank = Int.MaxValue
      var bestPair: (String, String) = null
      var i = 0
      while (i < syms.length - 1) {
        val r = rank.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
        if (r < bestRank) { bestRank = r; bestPair = (syms(i), syms(i + 1)) }
        i += 1
      }
      if (bestPair == null) continue = false
      else syms = mergePair(syms, bestPair)
      if (syms.length < 2) continue = false
    }
    syms
  }

  /** Segment every document with a trained merge list: per-doc token →
    * subword pieces, summarized as sortable scalars (n_tokens, n_pieces,
    * pieces_per_token). Corpus-linear typed kernel (same shape as the
    * winnowing kernel); the merge table is model-scale and rides the task
    * closure. */
  def bpeSegmentStats(docs: DataFrame, id: Column, text: Column,
                      merges: Seq[(String, String)]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val rank = merges.zipWithIndex.toMap
    spreadForCpu(docs)
      .select(id.cast("long").as("doc_id"), text.cast("string").as("t"))
      .as[(Long, String)]
      .map { case (docId, t) =>
        val toks = t.split(" ")
        var pieces = 0L
        toks.foreach { w => pieces += bpeSegmentWord(w, rank).length }
        val ppt = BigDecimal(pieces.toDouble / math.max(toks.length, 1))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        (docId, toks.length.toLong, pieces, ppt)
      }
      .toDF("doc_id", "n_tokens", "n_pieces", "pieces_per_token")
  }

  /** Top-k corpus vocabulary by token frequency — the input to tokenizer/BPE
    * training and stopword induction. One shuffle (map-side partial counts);
    * the top-k compiles to TakeOrderedAndProject (per-partition heap, no
    * global sort). Deterministic under count ties via the token tiebreak.
    * Output: (token, n), highest-count first. */
  def vocabulary(docs: DataFrame, text: Column, k: Int = 1000): DataFrame =
    docs.select(explode(tokens(text)).as("token"))
      .groupBy(col("token"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token").asc)
      .limit(k)

  /** Hashing-trick featurization (Weinberger et al. 2009): tokens map to a
    * FIXED k-slot space via a hash, so featurizing needs no vocabulary
    * pass, no driver state, and no join — the standard way to feed text
    * into linear models ([[graft.engine.Classifier]]) at corpus scale.
    * One explode + one (doc, slot) partial-agg shuffle; collisions are the
    * accepted trade (they only blur features, never lose documents). The
    * slot hash is the repo's cross-engine md5 convention
    * (`conv(substr(md5(tok),1,8))` == DuckDB `('0x'||substr)::UBIGINT`),
    * so the whole featurization is oracle-replayable.
    * Output: (doc_id, slot, cnt) — the sparse long form; pivot to dense
    * only at model width, never corpus-wide. */
  def hashFeatures(docs: DataFrame, id: Column, text: Column,
                   k: Int = 64): DataFrame = {
    require(k >= 2, s"slot count must be >= 2: $k")
    docs.select(id.as("doc_id"), explode(tokens(text)).as("term"))
      .select(col("doc_id"),
        pmod(conv(substring(md5(col("term")), 1, 8), 16, 10).cast("long"),
          lit(k.toLong)).as("slot"))
      .groupBy("doc_id", "slot").agg(count(lit(1)).as("cnt"))
  }

  /** Zipf coverage curve of the top-`k` vocabulary: for each rank r, the
    * cumulative fraction of ALL corpus tokens explained by ranks 1..r —
    * the tokenizer-sizing signal (how large a vocab covers 95% of the
    * stream). Fractions are integer micro-units via floor over an exact
    * double division (both operands < 2^53 — exactly rounded, identical
    * across engines). The running sum's ordering domain is the ALREADY
    * top-k-limited vocab — k rows, model-scale, so the single-partition
    * window is k-bounded, never corpus-bounded; corpus mass arrives
    * pre-aggregated (one global count riding a broadcast).
    * Output: (rnk, token, n, cum_frac_micro). */
  def vocabCoverage(docs: DataFrame, text: Column, k: Int = 1000): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("n").desc, col("token").asc)
    val tot = docs.select(explode(tokens(text)).as("t"))
      .agg(count(lit(1)).as("total"))
    vocabulary(docs, text, k).crossJoin(broadcast(tot))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .withColumn("cum_frac_micro",
        floor(sum(col("n")).over(w) * lit(1000000L) / col("total"))
          .cast("long"))
      .select(col("rnk"), col("token"), col("n"), col("cum_frac_micro"))
  }

  /** TF-IDF top-`k` terms per document — the classic keyword/topic signal
    * for corpus curation and document routing. tf = in-doc term count;
    * idf = ln(N/df) over the corpus, quantized per TERM to integer
    * micro-nats BEFORE the tf multiply (the verify gate's transcendental
    * discipline: a cross-engine 1-ulp `ln` difference cannot move an
    * integer score). Two shuffles (tf group, df group) + one term join
    * (broadcast at small vocab, shuffle at corpus scale); N rides along
    * as a broadcast 1-row aggregate, never a driver-side count. The
    * per-doc top-k window partitions by doc_id — partitions are bounded
    * by a document's distinct terms, so unlike a per-QUERY rerank there
    * is no single-task hotspot at corpus scale; the total order
    * (score desc, term asc) makes ranks deterministic.
    * Output: (doc_id, term, score_micro, rn). */
  def tfidfTopTerms(docs: DataFrame, id: Column, text: Column,
                    k: Int = 5): DataFrame = {
    val toks = docs.select(id.as("doc_id"), explode(tokens(text)).as("term"))
    val tf = toks.groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val docFreq = toks.select(col("doc_id"), col("term")).distinct()
      .groupBy(col("term")).agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n"))
    val idf = docFreq.crossJoin(broadcast(n))
      .select(col("term"),
        floor(log(col("n").cast("double") / col("df")) * 1e6)
          .cast("long").as("idf_micro"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id"))
      .orderBy(col("score_micro").desc, col("term").asc)
    tf.join(idf, "term")
      .select(col("doc_id"), col("term"),
        (col("tf") * col("idf_micro")).as("score_micro"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= k)
  }

  /** CCNet-style unigram-LM quality score: train token log-probabilities on
    * the corpus itself (ONE aggregate + a broadcast 1-row totals frame;
    * Laplace-smoothed), then score each document by its mean token negative
    * log-likelihood — low-perplexity ≈ fluent/common text, high ≈ noise and
    * gibberish (the filtering signal of CCNet, Wenzek et al. 2020, with the
    * KenLM stage approximated by the corpus unigram model). Per-token NLL is
    * quantized to integer MICRO-NATS before the per-doc average, so the
    * cross-engine 1-ulp `ln` difference can never move an aggregate (the
    * float-boundary discipline of the verify gate). Two shuffles total
    * (vocab count, doc rollup); the token→NLL join is a broadcast at small
    * vocab and a plain shuffle join at corpus scale.
    * Output: (doc_id, n_tokens, mean_nll_micro). */
  def lmQualityScore(docs: DataFrame, id: Column, text: Column,
                     alpha: Double = 1.0): DataFrame = {
    val toks = docs.select(id.as("doc_id"), explode(tokens(text)).as("tok"))
    val vocab = toks.groupBy(col("tok")).agg(count(lit(1)).as("c"))
    val totals = vocab.agg(sum(col("c")).as("total"), count(lit(1)).as("vsz"))
    val probs = vocab.crossJoin(broadcast(totals))
      .select(col("tok"),
        round(-log((col("c") + alpha) /
          (col("total") + lit(alpha) * col("vsz"))) * 1e6)
          .cast("long").as("nll"))
    toks.join(probs, "tok")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        round(avg(col("nll")), 2).as("mean_nll_micro"))
  }

  /** Trained bigram-LM quality scoring — the CCNet discriminator shape one
    * order above [[lmQualityScore]]: add-one-smoothed P(w2|w1) with the
    * history's bigram-position count as denominator mass, each bigram's NLL
    * quantized to integer micro-nats BEFORE any aggregation (the
    * cross-engine ln policy), mean per doc. Corpus-scale shape: two count
    * aggregations build the model (shuffles carry (string, long) rows), one
    * hash join attaches NLLs to the doc bigram stream, one groupBy(doc)
    * rolls up — the micro-nat sums are exact integers, so the mean is
    * order-free. Output: (doc_id, n_bigrams, mean_nll_micro); docs with
    * fewer than 2 tokens have no bigrams and drop (none in this corpus). */
  def bigramLmScore(docs: DataFrame, id: Column, text: Column,
                    alpha: Double = 1.0): DataFrame = {
    require(alpha > 0, s"alpha must be positive: $alpha")
    val base = spreadForCpu(docs).select(id.as("doc_id"), text.as("_x"))
    val pairs = base.select(col("doc_id"),
      explode(ngramArray(col("_x"), 2)).as("bg"))
    val bgCounts = pairs.groupBy(col("bg")).agg(count(lit(1)).as("c2"))
    // history counts FOLD FROM the bigram counts instead of re-exploding
    // the corpus: every bigram occurrence contributes exactly 1 to its
    // first token's history count, so c1(w1) = Σ c2(bg) over bg starting
    // with w1 — bit-identical (exact integer counts; tokens cannot
    // contain the split delimiter). r13: the former direct groupBy ran a
    // second full ngram pass over the corpus and shuffled corpus-token-
    // sized rows; this aggregates the vocabulary²-sized count table
    // (guide §2.3 — aggregate before you shuffle).
    val histCounts = bgCounts
      .groupBy(substring_index(col("bg"), " ", 1).as("w1"))
      .agg(sum(col("c2")).as("c1"))
    // vocabulary ALSO folds from the bigram table (r14; VERDICT r13 #10):
    // every token of a doc with >= 2 tokens is the first or last token of
    // some bigram (tokens cannot contain the split delimiter), so
    // distinct(w1) ∪ distinct(w2) over the count table covers all of them;
    // only docs with < 2 tokens can contribute tokens outside it — counted
    // from the filtered short-doc sliver (tokenize+size per doc, explode
    // only on survivors; none exist in this corpus but exactness must not
    // depend on that). Bit-identical vocabulary for ANY input; the last
    // corpus-token-sized explode+distinct pass is gone (guide §2.3), the
    // distinct now aggregates vocabulary²-sized rows.
    val bgToks = bgCounts
      .select(substring_index(col("bg"), " ", 1).as("tok"))
      .unionByName(bgCounts
        .select(substring_index(col("bg"), " ", -1).as("tok")))
    val shortToks = base.filter(size(tokens(col("_x"))) < 2)
      .select(explode(tokens(col("_x"))).as("tok"))
    val vocabSize = bgToks.unionByName(shortToks)
      .agg(countDistinct(col("tok")).as("vsz"))
    val nll = bgCounts
      .join(histCounts, substring_index(col("bg"), " ", 1) === col("w1"))
      .crossJoin(broadcast(vocabSize))
      .select(col("bg"),
        round(-log((col("c2") + alpha) /
          (col("c1") + lit(alpha) * col("vsz"))) * 1e6)
          .cast("long").as("nll"))
    pairs.join(nll, "bg")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        round(avg(col("nll")), 2).as("mean_nll_micro"))
  }

  /** Collocation extraction: the top-`k` bigrams by corpus count with their
    * PMI (pointwise mutual information, ln p(ab)/(p(a)p(b))) — the phrase
    * mining / tokenizer-merge-candidate signal ("new york" scores high,
    * "of the" near zero). Corpus-scale shape: bigram and unigram count
    * tables are vocabulary-sized (the only shuffles carry (string, long)
    * rows), totals reduce from those tables, the two unigram joins are
    * AQE-sized, and the top-k compiles to TakeOrderedAndProject. The PMI
    * ratio is ONE fixed-shape expression over exact integer counts —
    * micro-nat quantized like every transcendental here, so it is
    * oracle-checkable. Output: (bg, n, pmi_micro), highest count first,
    * bigram tie-break. */
  def collocations(docs: DataFrame, text: Column, minCount: Long = 5L,
                   k: Int = 500): DataFrame = {
    require(minCount >= 1 && k >= 1, s"bad params ($minCount, $k)")
    val base = spreadForCpu(docs).select(text.as("_x"))
    val pairs = base.select(explode(ngramArray(col("_x"), 2)).as("bg"))
    val bgAll = pairs.groupBy(col("bg")).agg(count(lit(1)).as("n"))
    val uni = base.select(explode(tokens(col("_x"))).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("c"))
    val totals = bgAll.agg(sum(col("n")).as("nbi"))
      .crossJoin(uni.agg(sum(col("c")).as("nuni")))
    bgAll.filter(col("n") >= minCount)
      .join(uni.select(col("tok").as("_w1"), col("c").as("c1")),
        substring_index(col("bg"), " ", 1) === col("_w1"))
      .join(uni.select(col("tok").as("_w2"), col("c").as("c2")),
        substring_index(col("bg"), " ", -1) === col("_w2"))
      .crossJoin(broadcast(totals))
      .select(col("bg"), col("n"),
        round(log((col("n").cast("double") * col("nuni") * col("nuni")) /
          (col("nbi").cast("double") * col("c1") * col("c2"))) * 1e6)
          .cast("long").as("pmi_micro"))
      .orderBy(col("n").desc, col("bg").asc)
      .limit(k)
  }

  /** Inverted index (search-index build): `(term, doc_id, pos, df)`
    * postings with 0-based token positions, restricted to terms whose
    * document frequency lies in `[minDf, maxDf]` — the selectivity band a
    * search index actually serves (ubiquitous terms are stopword noise;
    * near-unique terms bloat the index for no recall). One explode builds
    * the posting stream; the df table reduces to the (bounded) qualifying
    * vocabulary, so the postings⋈df join broadcasts under AQE and the
    * corpus-token-sized posting stream itself never shuffles. At 100 TB
    * sink the result `partitionBy` on a term-hash prefix for serving.
    * Uniqueness of (term, doc_id, pos) is inherited from the input ids. */
  def invertedIndex(docs: DataFrame, id: Column, text: Column,
                    minDf: Long, maxDf: Long): DataFrame = {
    require(minDf >= 1 && maxDf >= minDf, s"bad df band [$minDf, $maxDf]")
    val posts = spreadForCpu(docs).select(id.as("doc_id"),
        posexplode(tokens(text)).as(Seq("pos", "term")))
      .select(col("term"), col("doc_id"), col("pos").cast("long").as("pos"))
    val dfs = posts.select(col("term"), col("doc_id")).distinct()
      .groupBy(col("term")).agg(count(lit(1)).as("df"))
      .filter(col("df") >= minDf && col("df") <= maxDf)
    posts.join(dfs, "term")
  }

  /** Greedy sequence packing for pretraining batches: concatenate documents
    * per group in a deterministic total order and split the token stream
    * into fixed-budget training sequences — a document belongs to the
    * sequence where its FIRST token lands (`seq_ix`), at `seq_offset`
    * tokens in. All integer arithmetic (cross-engine exact); one shuffle
    * (the window's hash partitioning on the group). `order` must be a total
    * order within each group — same contract as every order-sensitive
    * operator here (never row order). At 100 TB the group key (source,
    * shard, …) bounds each window partition; packing is within-group
    * sequential by definition, across groups embarrassingly parallel.
    * Output: (doc_id, grp, n_tokens, seq_ix, seq_offset). */
  def packSequences(docs: DataFrame, id: Column, order: Column, group: Column,
                    text: Column, budgetTokens: Int): DataFrame = {
    require(budgetTokens > 0, s"budgetTokens must be positive: $budgetTokens")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("grp")).orderBy(col("_ord"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    docs.select(id.as("doc_id"), group.as("grp"), order.as("_ord"),
        tokenCount(text).as("n_tokens"))
      .withColumn("_cum", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .select(col("doc_id"), col("grp"), col("n_tokens"),
        floor(col("_cum") / budgetTokens).cast("long").as("seq_ix"),
        pmod(col("_cum"), lit(budgetTokens.toLong)).as("seq_offset"))
  }

  /** PII scrubbing: emails, URLs and long digit runs (phone numbers, account
    * ids) replaced by typed placeholder tokens — the standard pre-training
    * redaction pass. Patterns are deliberately RE2-compatible (no
    * backrefs/lookarounds) so the same regexes run in Spark (Java regex) and
    * RE2-based engines identically; order matters — emails before URLs
    * (an email's domain must not half-match as a URL), digits last so
    * placeholder text is never re-scanned. Pure `regexp_replace` chain:
    * codegen'd, map-side, no UDF. */
  def redactPii(text: Column): Column = {
    val email = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"
    val url = "https?://[^ ]+"
    val num = "[0-9]{7,}"
    regexp_replace(
      regexp_replace(
        regexp_replace(text, email, "<EMAIL>"),
        url, "<URL>"),
      num, "<NUM>")
  }

  /** Split documents into fixed-size token windows with overlap — the
    * context-length chunking step of a training/RAG pipeline. Chunk i covers
    * tokens [i·stride, i·stride + size) with stride = size − overlap; the
    * final window may be shorter (never empty), and a doc shorter than
    * `size` yields exactly one chunk. `sequence`+`slice` stay inside
    * codegen; the explode is the only row multiplier, so the op is
    * corpus-linear with output ≈ input × size/stride.
    * Output: (doc_id, chunk_ix, chunk_text, n_tokens). */
  def chunkDocs(docs: DataFrame, id: Column, text: Column, chunkSize: Int = 64,
                overlap: Int = 16): DataFrame = {
    require(chunkSize > 0 && overlap >= 0 && overlap < chunkSize,
      s"need 0 <= overlap < chunkSize, got overlap=$overlap size=$chunkSize")
    val stride = chunkSize - overlap
    val toks = tokens(text)
    val n = size(toks)
    // starts 0, stride, 2·stride, … < n (sequence is inclusive and safe
    // here: n >= 1 because split("") = [""] — no reversal hazard)
    val starts = sequence(lit(0), n - 1, lit(stride))
    docs.select(id.as("doc_id"), explode(transform(starts, s =>
        struct((s / stride).cast("long").as("chunk_ix"),
          concat_ws(" ", slice(toks, s + 1, lit(chunkSize))).as("chunk_text"),
          least(lit(chunkSize), n - s).cast("long").as("n_tokens"))))
        .as("c"))
      .select(col("doc_id"), col("c.chunk_ix"), col("c.chunk_text"),
        col("c.n_tokens"))
  }
}
