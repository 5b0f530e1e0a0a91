package graft

import graft.engine.TextOps
import org.apache.spark.sql.functions._

class TextPrepSpec extends SparkSpec {
  import spark.implicits._

  test("hashFeatures: counts conserve tokens, slots stable per term, " +
    "k-bounded") {
    import graft.engine.TextOps
    val docs = Seq((1L, "a b a c"), (2L, "a d"), (3L, "")).toDF("id", "t")
    val out = TextOps.hashFeatures(docs, col("id"), col("t"), 16)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // token conservation: doc1 has 4 tokens, doc2 has 2, doc3 has 1
    // (split("") yields one empty token — same in DuckDB string_split)
    out.filter(_._1 == 1L).map(_._3).sum shouldBe 4L
    out.filter(_._1 == 2L).map(_._3).sum shouldBe 2L
    out.filter(_._1 == 3L).map(_._3).sum shouldBe 1L
    all(out.map(_._2)) should (be >= 0L and be < 16L)
    // the same term hashes to the same slot in every doc: "a" appears in
    // doc1 (count 2 among its slots) and doc2 — their slot sets intersect
    val slotsOfA = out.filter(t => t._1 == 1L && t._3 == 2L).map(_._2).toSet
    slotsOfA should have size 1 // "a" is doc1's only repeated token
    out.filter(_._1 == 2L).map(_._2).toSet should contain(slotsOfA.head)
  }

  test("stripMarkup: tags dropped, entities decoded exactly one level, " +
    "whitespace collapsed") {
    val df = Seq((1L,
      "<div class='x'>a &amp;lt; b</div>  <br/>&quot;q&quot; &nbsp; end"))
      .toDF("id", "t")
    val out = df.select(TextOps.stripMarkup(col("t"))).head.getString(0)
    out shouldBe "a &lt; b \"q\" end"
  }

  test("normalizeUrl + registrableDomain: scheme/host lowered, default " +
    "port, fragment and utm params stripped, others kept") {
    val df = Seq(
      (1L, "HTTPS://WWW.Sub.Host3.COM:443/p/9?utm_source=x&q=9#frag"),
      (2L, "http://EXAMPLE.org:80/a/b?keep=1&utm_medium=m"),
      (3L, "https://plain.io/x?a=1&b=2"),
      // consecutive leading utm params (the ADVICE r4 shape): a single
      // non-rescanning `\?utm_…&` replace left the second one behind
      (4L, "https://plain.io/x?utm_a=1&utm_b=2&c=3"),
      (5L, "https://plain.io/x?utm_a=1&utm_b=2")
    ).toDF("id", "url")
    val out = df.select(col("id"),
        graft.engine.TextOps.normalizeUrl(col("url")).as("u"))
      .withColumn("dom", graft.engine.TextOps.registrableDomain(
        regexp_extract(col("u"), "^[a-z]+://([^/?#]+)", 1)))
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getString(2))))
      .toMap
    out(1L) shouldBe (("https://www.sub.host3.com/p/9?q=9", "host3.com"))
    out(2L) shouldBe (("http://example.org/a/b?keep=1", "example.org"))
    out(3L) shouldBe (("https://plain.io/x?a=1&b=2", "plain.io"))
    out(4L) shouldBe (("https://plain.io/x?c=3", "plain.io"))
    out(5L) shouldBe (("https://plain.io/x", "plain.io"))
  }

  test("gopherFilter: each rule fires on its targeted fixture") {
    val en = TextOps.langMarkers.toMap.apply("en")
    val good = Seq.fill(12)("the cat ran and hid").mkString(" ") // 60 toks
    val docs = Seq(
      (1L, good),                                   // all rules pass
      (2L, "the and cat"),                          // too short
      (3L, Seq.fill(50)("the cat").mkString(" ") +
        (" #" * 20)),                               // 20/120 symbols > 10%
      (4L, Seq.fill(30)("cat dog").mkString(" ")),  // zero stopword hits
      (5L, Seq.fill(60)("the " + "a" * 25).mkString(" ")), // mean len > 10
      (6L, ("1 " * 59) + "the")                     // alpha frac < 80%
    ).toDF("doc_id", "text")
    val out = TextOps.gopherFilter(docs, col("doc_id"), col("text"), en)
      .collect().map(r => r.getLong(0) -> r).toMap
    out(1L).getBoolean(7) shouldBe true // keep
    out(1L).getBoolean(3) shouldBe true // mean_len_ok at the 3.0 boundary
    out(2L).getBoolean(2) shouldBe false // len_ok
    out(3L).getBoolean(5) shouldBe false // symbol_ok
    out(4L).getBoolean(6) shouldBe false // stop_ok
    out(5L).getBoolean(3) shouldBe false // mean_len_ok
    out(6L).getBoolean(4) shouldBe false // alpha_ok
    Seq(2L, 3L, 4L, 5L, 6L).foreach(i => out(i).getBoolean(7) shouldBe false)
  }

  test("redactPii: emails, URLs, digit runs → typed placeholders") {
    val out = Seq(
      "mail bob.smith+x@corp.example.co for details",
      "see https://a.io/p?q=1 and http://b.c/d now",
      "card 12345678 ok but zip 12345 stays",
      "clean text with no pii at all"
    ).toDF("text").select(TextOps.redactPii(col("text")).as("t"))
      .collect().map(_.getString(0))
    out(0) shouldBe "mail <EMAIL> for details"
    out(1) shouldBe "see <URL> and <URL> now"
    out(2) shouldBe "card <NUM> ok but zip 12345 stays" // 5 digits < 7 kept
    out(3) shouldBe "clean text with no pii at all"
  }

  test("redactPii: email replaced before its domain can half-match a URL") {
    Seq("ping a@ex.com https://ex.com/x 99999990")
      .toDF("text").select(TextOps.redactPii(col("text")).as("t"))
      .head().getString(0) shouldBe "ping <EMAIL> <URL> <NUM>"
  }

  test("chunkDocs: windows, overlap, ragged tail, short doc") {
    val docs = Seq(
      (1L, "t1 t2 t3 t4 t5 t6 t7 t8 t9 t10"), // 10 tokens
      (2L, "a b")                              // shorter than one chunk
    ).toDF("doc_id", "text")
    val out = TextOps.chunkDocs(docs, col("doc_id"), col("text"),
        chunkSize = 4, overlap = 1) // stride 3 → starts 0,3,6,9
      .orderBy("doc_id", "chunk_ix").collect()
    val d1 = out.filter(_.getLong(0) == 1L)
    d1.map(_.getLong(1)) shouldBe Array(0L, 1L, 2L, 3L)
    d1.map(_.getString(2)) shouldBe Array(
      "t1 t2 t3 t4", "t4 t5 t6 t7", "t7 t8 t9 t10", "t10")
    d1.map(_.getLong(3)) shouldBe Array(4L, 4L, 4L, 1L)
    // consecutive chunks overlap by exactly `overlap` tokens
    d1.sliding(2).foreach { case Array(a, b) =>
      a.getString(2).split(" ").takeRight(1).toSeq shouldBe
        b.getString(2).split(" ").take(1).toSeq
    }
    val d2 = out.filter(_.getLong(0) == 2L)
    d2.map(_.getString(2)) shouldBe Array("a b")
    d2.map(_.getLong(3)) shouldBe Array(2L)
  }

  test("vocabulary: counts with deterministic tie-break at the k boundary") {
    val docs = Seq("b b b a c", "c a", "d").toDF("text")
    val out = TextOps.vocabulary(docs, col("text"), k = 3).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    // a and c tie at 2 → both precede d (count 1) via the token tiebreak
    out shouldBe Array(("b", 3L), ("a", 2L), ("c", 2L))
  }

  test("redactPii is idempotent on real documents (placeholders never re-match)") {
    val docs = graft.engine.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(concat(col("text"), lit(" x@y.io https://z.a 123456789"))
        .as("text"))
    val once = docs.select(TextOps.redactPii(col("text")).as("t"))
    val twice = once.select(TextOps.redactPii(col("t")).as("t"))
    once.collect().map(_.getString(0)).toSeq shouldBe
      twice.collect().map(_.getString(0)).toSeq
  }

  test("chunkDocs covers every token of every real document") {
    val docs = graft.engine.Tables.documents(spark, "/root/testdata/sf0.001")
    val reconstructed = TextOps.chunkDocs(docs, col("doc_id"), col("text"),
        chunkSize = 16, overlap = 0)
      .groupBy("doc_id")
      .agg(concat_ws(" ", array_sort(collect_list(
        struct(col("chunk_ix"), col("chunk_text"))))
        .getField("chunk_text")).as("r"))
    // zero-overlap chunks concatenated in chunk_ix order == original text
    val joined = docs.select(col("doc_id"), col("text"))
      .join(reconstructed, "doc_id")
    joined.filter(col("text") =!= col("r")).count() shouldBe 0
  }

  test("chunkDocs: zero overlap partitions the token stream exactly") {
    val docs = Seq((1L, (1 to 9).map("w" + _).mkString(" ")))
      .toDF("doc_id", "text")
    val out = TextOps.chunkDocs(docs, col("doc_id"), col("text"),
        chunkSize = 3, overlap = 0)
      .orderBy("chunk_ix").collect()
    out.flatMap(_.getString(2).split(" ")) shouldBe
      (1 to 9).map("w" + _).toArray // lossless, no duplication
  }

  test("bpeTrain: the classic low/lower example, deterministic ties") {
    // words: low ×2, lower ×1 → pairs (l,o)=3 (o,w)=3 (w,e)=1 (e,r)=1;
    // the 3-3 tie breaks lexicographically to (l,o)
    val counts = Array(("low", 2L), ("lower", 1L))
    val merges = TextOps.bpeTrainFromCounts(counts, 10)
    merges shouldBe Seq(("l", "o"), ("lo", "w"), ("e", "r"), ("low", "er"))
    // merge list is exhausted after 4 — no spurious extra merges
    // greedy segmentation with the trained table
    val rank = merges.zipWithIndex.toMap
    TextOps.bpeSegmentWord("low", rank) shouldBe Vector("low")
    TextOps.bpeSegmentWord("lower", rank) shouldBe Vector("lower")
    TextOps.bpeSegmentWord("lowest", rank) shouldBe
      Vector("low", "e", "s", "t")
    TextOps.bpeSegmentWord("x", rank) shouldBe Vector("x")
  }

  test("q_bpe_segment_fixed merge table: hand-computed segmentations, " +
    "cascade builds 'scan' whole, rank re-selection exact") {
    // the SparkEntry fixed table, re-declared locally (fixed-model twin)
    val merges = Seq(("a", "n"), ("s", "c"), ("sc", "an"), ("e", "r"),
      ("o", "r"), ("t", "h"), ("r", "o"), ("l", "l"))
    val rank = merges.zipWithIndex.toMap
    // cascade: (a,n) rank0 → (s,c) rank1 → (sc,an) rank2 fuse the word
    TextOps.bpeSegmentWord("scan", rank) shouldBe Vector("scan")
    // rank order matters: (e,r) r3 beats (o,r) r4, then (o,r) applies
    TextOps.bpeSegmentWord("order", rank) shouldBe Vector("or", "d", "er")
    TextOps.bpeSegmentWord("row", rank) shouldBe Vector("ro", "w")
    TextOps.bpeSegmentWord("group", rank) shouldBe Vector("g", "ro", "u", "p")
    TextOps.bpeSegmentWord("the", rank) shouldBe Vector("th", "e")
    TextOps.bpeSegmentWord("small", rank) shouldBe Vector("s", "m", "a", "ll")
    TextOps.bpeSegmentWord("sort", rank) shouldBe Vector("s", "or", "t")
    TextOps.bpeSegmentWord("a", rank) shouldBe Vector("a")
    // per-doc stats over the same kernel (what q_bpe_segment_fixed emits)
    val docs = Seq((1L, "scan order row")).toDF("doc_id", "text")
    val out = TextOps.bpeSegmentStats(docs, col("doc_id"), col("text"),
      merges).collect().head
    (out.getLong(1), out.getLong(2)) shouldBe ((3L, 6L)) // 1 + 3 + 2
  }

  test("bpeTrain: bounded driver table — generous caps leave merges " +
    "unchanged, minCount prunes singleton noise words") {
    val docs = Seq((1L, "low low lower"), (2L, "low newest"), (3L, "qzjx"))
      .toDF("doc_id", "text")
    val default = TextOps.bpeTrain(docs, col("text"), 10)
    // the cap only binds when vocab > maxWords: identical merges under the
    // default 1M cap vs an effectively-unbounded one (VERDICT r4 #3 done-
    // condition: q_bpe_segment rows unchanged)
    TextOps.bpeTrain(docs, col("text"), 10,
      minCount = 1L, maxWords = Int.MaxValue) shouldBe default
    // minCount = 2 drops the singleton words (lower, newest, qzjx): only
    // "low" ×3 remains → merges come from "low" alone
    TextOps.bpeTrain(docs, col("text"), 10, minCount = 2L) shouldBe
      Seq(("l", "o"), ("lo", "w"))
    // maxWords = 1 keeps only the most frequent word ("low" ×3)
    TextOps.bpeTrain(docs, col("text"), 10, maxWords = 1) shouldBe
      Seq(("l", "o"), ("lo", "w"))
  }

  test("bpeSegmentStats: training words compress to single pieces; " +
    "unseen vocabulary stays near character level") {
    val docs = Seq((1L, "low low lower"), (2L, "qzjx")).toDF("doc_id", "text")
    val merges = TextOps.bpeTrainFromCounts(
      Array(("low", 2L), ("lower", 1L)), 10)
    val out = TextOps.bpeSegmentStats(docs, col("doc_id"), col("text"), merges)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    out(1L) shouldBe ((3L, 3L, 1.0))   // every training word → one piece
    out(2L) shouldBe ((1L, 4L, 4.0))   // no merges apply → characters
  }

  test("tfidfTopTerms: hand-computed scores, corpus-wide terms score zero, " +
    "deterministic tie-break") {
    val docs = Seq(
      (1L, "apple banana apple"),
      (2L, "banana cherry"),
      (3L, "banana banana durian")
    ).toDF("doc_id", "text")
    val out = TextOps.tfidfTopTerms(docs, col("doc_id"), col("text"), 2)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3))).toSet
    val ln3 = math.floor(math.log(3.0) * 1e6).toLong // 1098612
    // banana is in every doc → idf 0 → score 0, but still ranked (term asc
    // breaks ties at score 0); doc-unique terms get tf·ln(3) micro-nats
    out shouldBe Set(
      (1L, "apple", 2 * ln3, 1L), (1L, "banana", 0L, 2L),
      (2L, "cherry", ln3, 1L), (2L, "banana", 0L, 2L),
      (3L, "durian", ln3, 1L), (3L, "banana", 0L, 2L))
  }

  test("vocabCoverage: hand-computed Zipf curve, k caps ranks, " +
    "last rank covers <= 1") {
    val docs = Seq((1L, "a a a b b c")).toDF("doc_id", "text")
    val out = TextOps.vocabCoverage(docs, col("text"), 2)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3)))
    // total 6 tokens: a covers 3/6, a+b covers 5/6; c cut by k=2
    out shouldBe Array((1L, "a", 3L, 500000L), (2L, "b", 2L, 833333L))
  }

  test("lmQualityScore: rare-token docs score higher NLL; common-token " +
    "docs lower; smoothing bounds") {
    val docs = Seq(
      (1L, "the the the the"),   // most common token, repeated
      (2L, "the cat sat here"),  // mixed
      (3L, "zyx qwv jkl pqr")    // singletons — maximum surprisal
    ) ++ (4L to 23L).map(i => (i, "the and of to")) // make those tokens common
    val df = docs.toDF("doc_id", "text")
    val out = TextOps.lmQualityScore(df, col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    out(1) should be < out(2)
    out(2) should be < out(3)
    // every NLL is positive and below the singleton ceiling -ln(smoothed min)
    out.values.foreach { v => v should be > 0.0 }
  }

  test("bigramLmScore: hand-computed smoothed NLLs; common-bigram doc " +
    "scores below rare-bigram doc") {
    val docs = Seq((1L, "a b a b"), (2L, "a b x y")).toDF("doc_id", "text")
    val out = TextOps.bigramLmScore(docs, col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2))))
      .toMap
    // corpus: bigrams "a b"×3, "b a"×1, "b x"×1, "x y"×1; histories a·=3,
    // b·=2, x·=1; V=4
    def nll(c2: Long, c1: Long): Long =
      math.round(-math.log((c2 + 1.0) / (c1 + 1.0 * 4)) * 1e6)
    val ab = nll(3, 3); val ba = nll(1, 2); val bx = nll(1, 2)
    val xy = nll(1, 1)
    def m2(xs: Seq[Long]): Double =
      BigDecimal(xs.sum.toDouble / xs.size)
        .setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble
    out(1L) shouldBe ((3L, m2(Seq(ab, ba, ab))))
    out(2L) shouldBe ((3L, m2(Seq(ab, bx, xy))))
    out(1L)._2 should be < out(2L)._2
  }

  test("bigramLmScore: a 1-token doc has no bigrams (drops) but its token " +
    "STILL counts in the vocabulary (the r14 fold's exactness guard)") {
    // "z" appears in no bigram — the folded vocab must include it via the
    // short-doc sliver, or V silently reads 4 instead of 5
    val docs = Seq((1L, "a b a b"), (2L, "a b x y"), (3L, "z"))
      .toDF("doc_id", "text")
    val out = TextOps.bigramLmScore(docs, col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2))))
      .toMap
    out.contains(3L) shouldBe false // no bigrams → drops, as declared
    def nll(c2: Long, c1: Long): Long =
      math.round(-math.log((c2 + 1.0) / (c1 + 1.0 * 5)) * 1e6) // V = 5
    val ab = nll(3, 3); val ba = nll(1, 2); val bx = nll(1, 2)
    val xy = nll(1, 1)
    def m2(xs: Seq[Long]): Double =
      BigDecimal(xs.sum.toDouble / xs.size)
        .setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble
    out(1L) shouldBe ((3L, m2(Seq(ab, ba, ab))))
    out(2L) shouldBe ((3L, m2(Seq(ab, bx, xy))))
  }

  test("cdcChunks: exact coverage, size bounds, determinism, and " +
    "boundary re-sync after an insertion (the CDC dedup property)") {
    // deterministic pseudo-random text (LCG), no RNG objects
    def lcgText(n: Int, seed: Long): String = {
      val sb = new StringBuilder
      var x = seed
      var i = 0
      while (i < n) {
        x = (x * 6364136223846793005L + 1442695040888963407L)
        sb.append(('a' + ((x >>> 33) % 26)).toChar)
        i += 1
      }
      sb.toString
    }
    val base = lcgText(3000, 42L)
    val shifted = lcgText(137, 7L) + base // insertion at the front
    val chunks = graft.engine.TextOps.cdcChunkKernel(base, 16, 6, 32, 256)
    // coverage: chunks tile [0, n) in order
    chunks.head._2 shouldBe 0
    chunks.sliding(2).foreach { case Seq(a, b) =>
      b._2 shouldBe a._2 + a._3
    }
    chunks.last._2 + chunks.last._3 shouldBe base.length
    // bounds: every chunk but the tail within [minLen, maxLen]
    chunks.init.foreach { c =>
      c._3 should be >= 32
      c._3 should be <= 256
    }
    chunks.last._3 should be <= 256
    // determinism
    graft.engine.TextOps.cdcChunkKernel(base, 16, 6, 32, 256) shouldBe chunks
    // shift re-sync: most of base's chunk fingerprints survive the
    // 137-char front insertion (fixed-size chunking would share none)
    val fps = chunks.map(_._4).toSet
    val fps2 = graft.engine.TextOps
      .cdcChunkKernel(shifted, 16, 6, 32, 256).map(_._4).toSet
    val shared = fps.intersect(fps2).size.toDouble / fps.size
    shared should be >= 0.6
  }

  test("packSequences: greedy packing laws on a hand fixture") {
    val docs = Seq(
      (1L, "g1", (1 to 5).map(i => s"t$i").mkString(" ")),   // 5 tokens
      (2L, "g1", (1 to 4).map(i => s"u$i").mkString(" ")),   // 4 tokens
      (3L, "g1", (1 to 3).map(i => s"v$i").mkString(" ")),   // 3 tokens
      (4L, "g2", "a b")
    ).toDF("doc_id", "src", "text")
    val out = TextOps.packSequences(docs, col("doc_id"), col("doc_id"),
        col("src"), col("text"), budgetTokens = 8)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    // g1 stream: doc1 starts at 0 (seq 0), doc2 at 5 (seq 0, offset 5 —
    // straddles into seq 1), doc3 at 9 (seq 1, offset 1); g2 independent
    out(0) shouldBe ((1L, "g1", 5L, 0L, 0L))
    out(1) shouldBe ((2L, "g1", 4L, 0L, 5L))
    out(2) shouldBe ((3L, "g1", 3L, 1L, 1L))
    out(3) shouldBe ((4L, "g2", 2L, 0L, 0L))
    // law: within a group, offset/seq_ix are the running token count
    // (cum = seq_ix * budget + seq_offset is non-decreasing in order)
    val cums = out.filter(_._2 == "g1").map(t => t._4 * 8 + t._5)
    cums shouldBe cums.sorted
    cums shouldBe Array(0L, 5L, 9L)
  }

  test("repetitionStats: hand-computed Gopher-rule fractions") {
    val docs = Seq(
      (1L, "a a a b"),       // top=a×3/4; bigrams [a a, a a, a b]; tris ×2
      (2L, "x"),             // single token: no n-grams → fracs 0
      (3L, "u v w x"),       // all distinct → every frac is 0 except top 1/4
      (4L, "s s s s")        // pure repetition → everything saturated
    ).toDF("doc_id", "text")
    val out = TextOps.repetitionStats(docs, col("doc_id"), col("text"))
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4)))
    out(0) shouldBe ((1L, 4L, 0.75, 0.333333, 0.0))
    out(1) shouldBe ((2L, 1L, 1.0, 0.0, 0.0))
    out(2) shouldBe ((3L, 4L, 0.25, 0.0, 0.0))
    out(3) shouldBe ((4L, 4L, 1.0, 0.666667, 0.5))
  }
  test("collocations: hand-computed PMI, minCount cut, count-then-bigram order") {
    val docs = Seq((1L, "a b a b c"), (2L, "a b x")).toDF("doc_id", "text")
    val got = TextOps.collocations(docs, col("text"), minCount = 2L, k = 10)
      .as[(String, Long, Long)].collect()
    // bigrams: "a b"×3, "b a"×1, "b c"×1, "b x"×1 → only "a b" survives;
    // N_bi = 6, unigrams a:3 b:3 c:1 x:1 → N_uni = 8;
    // pmi = ln(3·8·8 / (6·3·3)) = ln(32/9) = 1.2685113… → 1268511 µnats
    got shouldBe Array(("a b", 3L, 1268511L))
  }

  test("collocations: independent tokens score ~0, attracted pairs positive, repelled negative") {
    // "x y" always adjacent (attraction); "p"/"q" never adjacent (repulsion
    // → filtered by minCount anyway); mixed corpus for a near-zero pair
    val docs = (1 to 50).map(i => (i.toLong, "x y m " + (if (i % 2 == 0) "m n" else "n m")))
      .toDF("doc_id", "text")
    val got = TextOps.collocations(docs, col("text"), minCount = 5L, k = 100)
      .as[(String, Long, Long)].collect().map(r => r._1 -> r._3).toMap
    got("x y") should be > 0L
    // "m n" and "n m" each occur in half the docs next to ubiquitous m/n →
    // their PMI sits well below the perfectly-attracted "x y"
    got("m n") should be < got("x y")
  }

  test("invertedIndex: positions 0-based, df band keeps mid-frequency terms only") {
    val docs = Seq((1L, "a b a"), (2L, "a c"), (3L, "c c d"))
      .toDF("doc_id", "text")
    val got = TextOps.invertedIndex(docs, col("doc_id"), col("text"),
        minDf = 2L, maxDf = 2L)
      .select("term", "doc_id", "pos", "df")
      .as[(String, Long, Long, Long)].collect().sortBy(r => (r._1, r._2, r._3))
    // a: df 2 (docs 1,2) kept; b: df 1 dropped; c: df 2 kept (3 postings —
    // df counts DOCS, not occurrences); d: df 1 dropped
    got shouldBe Array(
      ("a", 1L, 0L, 2L), ("a", 1L, 2L, 2L), ("a", 2L, 0L, 2L),
      ("c", 2L, 1L, 2L), ("c", 3L, 0L, 2L), ("c", 3L, 1L, 2L))
  }
}
