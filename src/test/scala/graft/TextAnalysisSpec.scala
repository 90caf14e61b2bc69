package graft

import org.apache.spark.sql.functions.{col, concat, count, explode, lit, size, slice, sum, transform, zip_with}

import graft.functions.TextHash
import graft.operators.TextAnalysis

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("token counts: whitespace and BPE-ish") {
    val docs = Seq((1L, "hello world 42 x!"), (2L, "  padded   text  ")).toDF("doc_id", "text")
    val out = TextAnalysis.tokenCounts(docs).collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out(1L) === ((4L, 5L))) // ws: hello|world|42|x!  bpe: hello|world|42|x|!
    assert(out(2L)._1 === 2L)
  }

  test("polynomial fingerprint matches a hand-computed fold") {
    def ref(s: String): Long = s.foldLeft(0L)((acc, c) => (acc * 31 + c.toLong) % 1000000007L)
    val docs = Seq((1L, "abc"), (2L, "spark")).toDF("doc_id", "text")
    val out = docs.select(col("doc_id"), TextHash.polyHash(col("text")).as("h"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(1L) === ref("abc"))
    assert(out(2L) === ref("spark"))
  }

  test("quality scores: ratios and guardrails") {
    val docs = Seq(
      (1L, "the cat sat on the mat with the hat dog"), // 10 tokens, 3x 'the'
      (2L, "one two") // < 5 tokens → score 0
    ).toDF("doc_id", "text")
    val rows = TextAnalysis.qualityScores(docs).collect().map(r => r.getLong(0) -> r).toMap
    assert(rows(1L).getAs[Long]("n_tokens") === 10L)
    assert(rows(1L).getAs[Double]("stopword_ratio") === 0.3)
    assert(rows(2L).getAs[Double]("quality_score") === 0.0)
  }

  test("quality filter drops each language's bottom percentile only") {
    // Per lang: one sub-5-token doc scores 0.0 and sits at percentile 0 —
    // exactly the row a 10% gate must drop; everything else survives.
    def good(i: Long) = s"the quick brown fox of doc $i walks to the river and back"
    val docs = (Seq((1L, "tiny doc", "en"), (2L, "winzig", "de")) ++
      (10L until 16L).map(i => (i, good(i), "en")) ++
      (20L until 26L).map(i => (i, good(i), "de"))).toDF("doc_id", "text", "lang")
    val out = TextAnalysis.qualityFilter(docs, minPercentile = 0.1)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(3)))
    val kept = out.map(_._1).toSet
    assert(!kept.contains(1L) && !kept.contains(2L)) // pctl 0.0 < 0.1 in each lang
    assert(kept === (10L until 16L).toSet ++ (20L until 26L).toSet)
    assert(out.forall(_._3 >= 0.1))
  }

  test("winnow: rolling-hash fingerprints equal the direct O(len·k) formulation") {
    // Direct reference: polyHash every k-gram from scratch, slide a window
    // of w, keep minima, dedup — the formulation the rolling hash replaces
    // and the DuckDB oracle still replays.
    def ref(text: String, k: Int, w: Int): Set[Long] = {
      def ph(s: String): Long = s.foldLeft(0L)((acc, c) => (acc * 31 + c.toLong) % 1000000007L)
      val hs = text.sliding(k).filter(_.length == k).map(ph).toVector
      if (hs.isEmpty) Set.empty
      else if (hs.length < w) hs.toSet
      else hs.sliding(w).map(_.min).toSet
    }
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog",
      "aaaaaaaaaaaa",        // all-equal hashes exercise deque tie handling
      "abcdefgh",            // exactly a couple of windows
      "abcd",                // len < k → no k-grams → no rows
      "abcdef",              // k-grams but fewer than w → distinct path
      "abab" * 10)           // periodic: duplicate minima across windows
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val got = TextAnalysis.winnow(docs).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    texts.zipWithIndex.foreach { case (t, i) =>
      assert(got.getOrElse(i.toLong, Set.empty) === ref(t, 5, 4), s"text #$i")
    }
  }

  test("repetition metrics: dup token fraction and top-bigram share") {
    val docs = Seq(
      (1L, "a a a b"),          // tokens a:3 b:1 → dup 3/4; bigrams "a a"×2, "a b" → top 2/3
      (2L, "x y z"),            // no repeats → dup 0; each bigram once → top 1/2
      (3L, "solo")              // single token → no bigrams → top 0/1
    ).toDF("doc_id", "text")
    val out = TextAnalysis.repetition(docs).collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getAs[Long]("n_tokens") === 4L)
    assert(out(1L).getAs[Double]("dup_token_frac") === 0.75)
    assert(out(1L).getAs[Double]("top_bigram_frac") === 0.6666667)
    assert(out(2L).getAs[Double]("dup_token_frac") === 0.0)
    assert(out(2L).getAs[Double]("top_bigram_frac") === 0.5)
    assert(out(3L).getAs[Double]("top_bigram_frac") === 0.0)
  }

  test("pii scrub counts and redacts emails and phones") {
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    val docs = Seq(
      (1L, "mail bob.smith+x@example.co.uk or call 415-555-0199 today"),
      (2L, "no pii here at all")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.piiScrub(docs).collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getAs[Long]("n_emails") === 1L)
    assert(out(1L).getAs[Long]("n_phones") === 1L)
    assert(out(1L).getAs[String]("redacted_md5") ===
      md5hex("mail <EMAIL> or call <PHONE> today"))
    assert(out(2L).getAs[Long]("n_emails") === 0L)
    assert(out(2L).getAs[String]("redacted_md5") === md5hex("no pii here at all"))
  }

  test("tfidf: rare terms outrank common ones; quantized idf is exact") {
    val docs = Seq(
      (1L, "alpha alpha beta common"),  // alpha: tf 2 df 1; beta: tf 1 df 2; common df 3
      (2L, "beta gamma common"),
      (3L, "delta common")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.tfidfTopTerms(docs, k = 2).collect()
      .groupBy(_.getLong(0)).view
      .mapValues(_.sortBy(_.getLong(4)).map(r => (r.getString(1), r.getLong(3))).toSeq)
      .toMap
    val q = 1048576L // 2^20
    // doc 1: alpha = 2·(3·q div 1) = 6q; beta = 1·(3·q div 2); common = 1·(3·q div 3)
    assert(out(1L) === Seq(("alpha", 6L * q), ("beta", 3L * q / 2)))
    // doc 3: delta (df 1) = 3q beats common (df 3) = q
    assert(out(3L) === Seq(("delta", 3L * q), ("common", q)))
  }

  test("langid picks the language with the most marker hits") {
    val docs = Seq(
      (1L, "the house of a king is big", "xx"),
      (2L, "und der die das haus", "xx"),
      (3L, "zz yy ww", "xx")
    ).toDF("doc_id", "text", "lang")
    val out = TextAnalysis.langId(docs).collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(out(1L) === "en")
    assert(out(2L) === "de")
    assert(out(3L) === "unknown")
  }

  test("bm25: hand-computed quantized scores; docs without query terms drop") {
    val docs = Seq(
      (0L, "a a a b"),             // tf(a)=3, dl=4
      (1L, "a b c d e f g h"),     // tf(a)=1, dl=8
      (2L, "x y z w")              // no 'a' → no row
    ).toDF("doc_id", "text")
    // N=3, Σdl=16; top-1 term is 'a' (count 4), df=2 → idfq = 3·16384 div 2 = 24576.
    // d0: (24576·3·220·16) div (100·3·16 + 30·16 + 90·4·3) = 259522560 div 6360 = 40805
    // d1: (24576·1·220·16) div (100·1·16 + 30·16 + 90·8·3) =  86507520 div 4240 = 20402
    val out = TextAnalysis.bm25(docs, kTerms = 1, topK = 10).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSeq === Seq((0L, 40805L), (1L, 20402L)))
  }

  test("bpePairs counts adjacent char pairs within tokens, single chars drop") {
    val docs = Seq((1L, "abc ab x")).toDF("doc_id", "text")
    val out = TextAnalysis.bpePairs(docs).collect().map(r => r.getString(0) -> r.getLong(1))
    assert(out.toSeq === Seq("ab" -> 2L, "bc" -> 1L)) // 'x' has no pair
  }

  test("lmScore: quantized conditional probabilities, short docs drop") {
    val docs = Seq(
      (1L, "x y x z"), // bigrams (x,y),(y,x),(x,z)
      (2L, "x y"),     // (x,y)
      (3L, "solo")     // no bigrams → no row
    ).toDF("doc_id", "text")
    // ctx: x=3, y=1; bg: (x,y)=2, (y,x)=1, (x,z)=1
    // p(x,y) = 2·2^20 div 3 = 699050; p(x,z) = 2^20 div 3 = 349525; p(y,x) = 2^20
    val out = TextAnalysis.lmScore(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out.keySet === Set(1L, 2L))
    assert(out(1L)._1 === 3L && out(1L)._2 === (699050L + 1048576L + 349525L))
    assert(out(2L)._1 === 1L && out(2L)._2 === 699050L)
    assert(math.abs(out(1L)._3 - 0.6666663) < 1e-7)
  }

  test("Misra-Gries buffer: candidate set always contains every true heavy hitter") {
    import graft.functions.MisraGriesAgg
    // Adversarial stream: a heavy token (freq 40 of N=100 > 100/4) buried in
    // 60 near-distinct light tokens, at capacity 3, streamed in the worst
    // order (light tokens first, forcing constant decrements).
    val light = (0 until 60).map(i => s"light${i % 30}") // 30 tokens ×2 each
    val stream = light ++ Seq.fill(40)("HEAVY")
    val buf = new MisraGriesAgg.Buf(3)
    stream.foreach(t => buf.add(t, 1L))
    assert(buf.counts.contains("HEAVY"), s"survivors: ${buf.counts}")
    assert(buf.counts.size <= 3)
    // Merge path: split the stream across 4 'partitions' in rotated orders,
    // merge pairwise — guarantee must survive the Agarwal merge too.
    val parts = stream.grouped(25).toSeq.zipWithIndex.map { case (p, i) =>
      val b = new MisraGriesAgg.Buf(3)
      (p.drop(i) ++ p.take(i)).foreach(t => b.add(t, 1L))
      b
    }
    val merged = parts.reduce { (a, b) =>
      b.counts.foreach { case (t, c) => a.addNoDecrement(t, c) }
      a.shrinkToCapacity(); a
    }
    assert(merged.counts.contains("HEAVY"), s"merged survivors: ${merged.counts}")
    assert(merged.counts.size <= 3)
  }

  test("heavyHitters: exact threshold answer, invariant to repartitioning") {
    import org.apache.spark.sql.functions._
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
    val out = TextAnalysis.heavyHitters(docs, capacity = 30)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // ground truth: full exact count, same threshold
    val toks = docs.select(explode(TextAnalysis.tokens(col("text"))).as("token"))
    val n = toks.count()
    val truth = toks.groupBy("token").agg(count(lit(1)).as("freq"))
      .filter(col("freq") * 31 > n)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out === truth)
    assert(truth.nonEmpty, "fixture must actually have heavy hitters")
    val repart = TextAnalysis.heavyHitters(docs.repartition(7), capacity = 30)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(repart === truth, "sketch nondeterminism must stay output-invisible")
  }

  test("tokenDrift: hand-computed integer numerators and TVD; vocabulary is the union") {
    val ref = Seq((0L, "a a b"), (2L, "a c")).toDF("doc_id", "text") // a:3 b:1 c:1, N=5
    val cur = Seq((1L, "a b b b")).toDF("doc_id", "text") // a:1 b:3, N=4
    val out = TextAnalysis.tokenDrift(ref, cur, topK = 10).collect()
    val byTok = out.map(r =>
      r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // drift = |n_ref·4 − n_cur·5|
    assert(byTok("a") === ((3L, 1L, 7L)))
    assert(byTok("b") === ((1L, 3L, 11L)))
    assert(byTok("c") === ((1L, 0L, 4L))) // only in ref — union vocab
    // TVD = (7+11+4) / (2·5·4) = 0.55 on every row
    assert(out.forall(r => r.getDouble(4) === 0.55))
    // ranking is (drift DESC, token): b, a, c
    assert(out.map(_.getString(0)).toSeq === Seq("b", "a", "c"))
  }

  test("invertedIndex: postings numerically sorted, df cap drops stopwords, bounded lists") {
    val docs = Seq(
      (2L, "x y"), (10L, "x z"), (9L, "x y z"), (1L, "w w x")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.invertedIndex(docs, maxDf = 3, topK = 10)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getString(2)))).toMap
    assert(!out.contains("x"), "df=4 > cap must drop")
    assert(out("y") === ((2L, "2,9"))) // numeric sort: 2 < 9 < 10
    assert(out("z") === ((2L, "9,10")))
    assert(out("w") === ((1L, "1"))) // distinct (doc, token): w counted once
  }

  test("bpeTrain: adopts top pairs globally and merges greedily left-to-right") {
    // words: "aaa"×2 (from doc 1), "bc"×3 (doc 2).
    // round 1: pairs (a,a) n=2·2=4 beats (b,c) n=3 → merge (a,a).
    //   GREEDY left-to-right: a a a → (aa) a, NOT a (aa) — so round 3's
    //   surviving pair must be (aa, a), never (a, aa).
    // round 2: (b,c) n=3 beats (aa,a) n=2. round 3: (aa,a) n=2.
    val docs = Seq((1L, "aaa aaa"), (2L, "bc bc bc")).toDF("doc_id", "text")
    val merges = TextAnalysis.bpeTrain(docs, rounds = 3).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
      .sortBy(_._1)
    assert(merges === Seq(
      (1L, "a", "a", 4L),
      (2L, "b", "c", 3L),
      (3L, "aa", "a", 2L)))
  }

  test("bpe: exhausted rounds (no pairs left) reach a fixed point, not an empty table") {
    // "ab"×2: round 1 merges (a,b) → every word is one symbol; rounds 2-3
    // have NO pairs. The 0-row top would crossJoin-empty the word table;
    // the no-op fallback must keep the fixed point instead.
    val docs = Seq((1L, "ab ab")).toDF("doc_id", "text")
    val merges = TextAnalysis.bpeTrain(docs, rounds = 3).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    assert(merges === Seq((1L, "a", "b", 2L))) // sentinel rounds filtered out
    val vocab = TextAnalysis.bpeEncode(docs, rounds = 3).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(vocab === Map("ab" -> 2L)) // fixed point survives the dead rounds
    // degenerate from round 1: all words single chars, merges empty
    val singles = Seq((1L, "a b a")).toDF("doc_id", "text")
    assert(TextAnalysis.bpeTrain(singles, rounds = 2).count() === 0L)
    val v2 = TextAnalysis.bpeEncode(singles, rounds = 2).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(v2 === Map("a" -> 2L, "b" -> 1L))
  }

  test("bpeApply: per-doc token counts under the trained merges, closed-form") {
    // merges after 3 rounds: (a,a), (b,c), (aa,a) — "aaa" → 1 symbol,
    // "bc" → 1 symbol. At rounds=1 only (a,a) applied: "aaa" → "aa"+"a".
    val docs = Seq((1L, "aaa aaa"), (2L, "bc bc bc")).toDF("doc_id", "text")
    val r3 = TextAnalysis.bpeApply(docs, rounds = 3).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(r3 === Map(1L -> ((2L, 2L)), 2L -> ((3L, 3L))))
    val r1 = TextAnalysis.bpeApply(docs, rounds = 1).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(r1 === Map(1L -> ((2L, 4L)), 2L -> ((3L, 6L))))
  }

  test("bpeTrain at N>=10 merges: loop driver agglutinates to the fixed point") {
    // One 12-char word ×2: every round's pairs tie at n=2, so the
    // (n DESC, a ASC, b ASC) order adopts the prefix pair each time —
    // 11 deterministic merges, then exhaustion (round 12 emits nothing).
    val docs = Seq((1L, "abcdefghijkl abcdefghijkl")).toDF("doc_id", "text")
    val merges = TextAnalysis.bpeTrain(docs, rounds = 12).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSeq.sortBy(_._1)
    val word = "abcdefghijkl"
    val expected = (1 to 11).map(r =>
      (r.toLong, word.take(r), word.charAt(r).toString, 2L))
    assert(merges === expected)
    val vocab = TextAnalysis.bpeEncode(docs, rounds = 12).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(vocab === Map(word -> 2L))
  }

  test("groupedHeavyHitters ≡ per-group brute force, invariant to partitioning") {
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
    def key(r: org.apache.spark.sql.Row) = (r.getString(0), r.getString(1), r.getLong(2))
    val grouped = TextAnalysis.groupedHeavyHitters(docs, "lang").collect().map(key).toSet
    // brute force: exact counts per (lang, token), threshold n_lang/31
    val toks = docs.select(col("lang"),
      explode(TextAnalysis.tokens(col("text"))).as("token"))
    val n = toks.groupBy("lang").agg(count(lit(1)).as("nn"))
    val brute = toks.groupBy("lang", "token").agg(count(lit(1)).as("freq"))
      .join(n, Seq("lang"))
      .filter(col("freq") * 31 > col("nn"))
      .select(col("lang"), col("token"), col("freq"))
      .collect().map(key).toSet
    assert(grouped === brute)
    assert(grouped.nonEmpty, "vacuous heavy-hitter fixture")
    // MG buffers merge across partitions in arbitrary order; the exact
    // verify pass must make partitioning output-invisible.
    val scattered = TextAnalysis.groupedHeavyHitters(docs.repartition(13), "lang")
      .collect().map(key).toSet
    assert(scattered === brute)
  }

  test("classifyQuality: codegen expression equals the explode-pipeline formulation") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "  padded   text with   runs  "),
      (3L, "single"),
      (4L, "a b a b a"), // repeated features vote repeatedly
      (5L, "")
    ).toDF("doc_id", "text")
    val fast = TextAnalysis.classifyQuality(docs)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap

    // Reference: explode unigrams + bigrams as DataFrame ops, hash with the
    // column-level sampleKey, weight, re-aggregate — the shuffle-heavy twin.
    val t = TextAnalysis.tokens(col("text"))
    val uni = docs.select(col("doc_id"),
      explode(transform(t, tok => concat(lit("u:"), tok))).as("f"))
    val bi = docs.select(col("doc_id"), t.as("t"))
      .filter(size(col("t")) >= 2)
      .select(col("doc_id"), explode(
        zip_with(slice(col("t"), lit(1), size(col("t")) - 1),
          slice(col("t"), lit(2), size(col("t")) - 1),
          (a, b) => concat(lit("b:"), a, lit(" "), b))).as("f"))
    val slow = uni.unionAll(bi)
      .select(col("doc_id"),
        ((TextHash.sampleKey(col("f")) % 4096) * 2654435761L % 2001L - 1000L).as("w"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_feats"), sum(col("w")).as("score_scaled"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap

    assert(fast.keySet === slow.keySet)
    for ((id, (n, s, label)) <- fast) {
      assert((n, s) === slow(id), s"doc $id")
      assert(label === (if (s > 0) 1L else 0L))
    }
    // 9 ws tokens -> 9 unigrams + 8 bigrams
    assert(fast(1L)._1 === 17L)
    // empty text tokenizes to one empty token -> 1 unigram, 0 bigrams
    assert(fast(5L)._1 === 1L)
  }

  test("count-min estimates dominate exact counts and audit the exact top-k") {
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
    val out = TextAnalysis.countMinEstimates(docs, topK = 10).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.length === 10)
    out.foreach { case (tok, exact, cms, over) =>
      assert(cms >= exact, s"CMS underestimated '$tok'") // the one-sided guarantee
      assert(over === cms - exact)
    }
    // audited set = the exact top-10 under (n DESC, token)
    val top = docs.select(explode(TextAnalysis.tokens(col("text"))).as("t"))
      .groupBy("t").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("t")).limit(10)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out.map(_._1).toSet === top.keySet)
    out.foreach { case (tok, exact, _, _) => assert(exact === top(tok)) }
  }

  test("perceptron round 1 equals the closed-form first update") {
    // w0 = 0 ⇒ every doc is misclassified in round 1 ⇒ w1_f = Σ_docs y·x_f.
    val docs = Seq(
      (1L, "en", "hello hello world"),
      (2L, "en", "hello again"),
      (3L, "fr", "bonjour monde"),
      (4L, "de", "hallo welt welt")
    ).toDF("doc_id", "lang", "text")
    val w = TextAnalysis.perceptronTrain(docs, nFeatures = 64, rounds = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expected = docs
      .select(
        org.apache.spark.sql.functions.when(col("lang") === "en", 1L).otherwise(-1L).as("y"),
        explode(TextAnalysis.tokens(col("text"))).as("tok"))
      .select(col("y"), (TextHash.sampleKey(col("tok")) % 64).as("f"))
      .groupBy("f").agg(sum(col("y")).as("w"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(w === expected)
  }

  test("perceptron separates a separable corpus and is stable once converged") {
    val docs = Seq(
      (1L, "en", "hello world good day"),
      (2L, "en", "hello there good morning"),
      (3L, "fr", "bonjour le monde"),
      (4L, "fr", "bonjour bonne nuit"),
      (5L, "de", "hallo guten tag")
    ).toDF("doc_id", "lang", "text")
    val w3 = TextAnalysis.perceptronTrain(docs, nFeatures = 64, rounds = 3)
    // Score every doc with the learned weights: separable data must be
    // fully classified (y·s > 0) by round 3.
    val feats = docs
      .select(col("doc_id"),
        org.apache.spark.sql.functions.when(col("lang") === "en", 1L).otherwise(-1L).as("y"),
        explode(TextAnalysis.tokens(col("text"))).as("tok"))
      .select(col("doc_id"), col("y"), (TextHash.sampleKey(col("tok")) % 64).as("f"))
      .groupBy("doc_id", "y", "f").agg(count(lit(1)).as("x"))
    val scored = feats.join(w3, Seq("f"))
      .groupBy("doc_id", "y").agg(sum(col("w") * col("x")).as("s"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(scored.length === 5)
    scored.foreach { case (id, y, s) => assert(y * s > 0L, s"doc $id not separated (y=$y s=$s)") }
    // Converged weights are a fixed point: another round changes nothing.
    val w4 = TextAnalysis.perceptronTrain(docs, nFeatures = 64, rounds = 4)
    assert(w3.except(w4).isEmpty && w4.except(w3).isEmpty)
  }

  test("collocations: bound pair outranks frequent-but-independent pair, closed-form PMI") {
    // "new york" always co-occurs (bound); "the cat"/"the dog" make "the"
    // promiscuous, so its pairs score low despite high frequency.
    val docs = (
      (1 to 6).map(i => (i.toLong, "new york")) ++
      (7 to 12).map(i => (i.toLong, "the cat")) ++
      (13 to 18).map(i => (i.toLong, "the dog"))
    ).toDF("doc_id", "text")
    val out = TextAnalysis.collocations(docs, minCount = 5, topK = 10)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    // N = 18 bigrams; ("new","york"): n_bg=6, n_left(new)=6, n_right(york)=6
    //   → pmi = (6·18·2^20) div 36 = 3·2^20
    // ("the","cat"): n_bg=6, n_left(the)=12, n_right(cat)=6
    //   → pmi = (6·18·2^20) div 72 = 1.5·2^20
    assert(out.head === ("new", "york", 6L, 3L * 1048576L))
    assert(out.map(p => (p._1, p._2)).toSeq ===
      Seq(("new", "york"), ("the", "cat"), ("the", "dog")))
    assert(out(1)._4 === 3L * 1048576L / 2L)
  }

  test("nfc expression composes decomposed sequences; already-NFC text passes through") {
    val df = Seq(
      ("é",      "é"), // e + combining acute → é
      ("Å",      "Å"), // A + ring → Å
      ("plain ascii",  "plain ascii"),
      ("édejà", "édejà") // already composed: identity
    ).toDF("raw", "expected")
    val out = df.select(
      graft.functions.GraftColumns.nfc(col("raw")).as("nfc"), col("expected"))
      .collect()
    out.foreach(r => assert(r.getString(0) === r.getString(1)))
    // compatibility forms must NOT fold (NFC, not NFKC): ① stays ①
    val keep = Seq(Tuple1("①")).toDF("raw")
      .select(graft.functions.GraftColumns.nfc(col("raw"))).head().getString(0)
    assert(keep === "①")
  }

  test("vocab coverage: closed-form covered counts and oov rate") {
    // counts: a=10, b=5, c=1 → total 16; rank order a, b, c
    val docs = Seq(
      (1L, "a a a a a a a a a a"),
      (2L, "b b b b b c")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.vocabCoverage(docs, sizes = Seq(1L, 2L, 10L))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .sortBy(_._1)
    assert(out === Array(
      (1L, 1L, 10L, 16L, 6L * 10000L / 16L), // top-1 = "a"
      (2L, 2L, 15L, 16L, 1L * 10000L / 16L), // + "b"
      (10L, 3L, 16L, 16L, 0L))) // whole vocab: size clamps at |V|
  }

  test("compression ratio separates boilerplate from varied text, deterministically") {
    val docs = Seq(
      (1L, "spam spam spam spam spam spam spam spam spam spam spam spam spam spam"),
      (2L, "the quick brown fox jumps over a lazy dog while seven wizards vex him"),
      (3L, "")
    ).toDF("doc_id", "text")
    val run = () => TextAnalysis.compressionRatio(docs)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val out = run()
    // repetitive text compresses far better than varied text
    assert(out(1L)._3 < out(2L)._3)
    assert(out(1L)._3 < 5000L) // boilerplate: under half its raw size
    assert(out(2L)._3 > 7000L) // varied short prose: deflate barely helps
    // empty doc: defined, zero ratio
    assert(out(3L) === ((0L, out(3L)._2, 0L)))
    // deterministic across runs (and partitionings)
    assert(run() === out)
    val repart = TextAnalysis.compressionRatio(docs.repartition(3))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(repart === out)
  }

  test("greedySegCount: longest-match-first, UNK advances one char") {
    import graft.functions.GraftColumns
    val df = Seq(
      ("abcab", Seq("ab", "abc", "c", "a", "b")), // [abc][ab] = 2
      ("cab", Seq("ab", "abc", "c", "a", "b")),   // [c][ab]  = 2, not [c][a][b]
      ("xay", Seq("a")))                          // UNK x, [a], UNK y = 3
      .toDF("w", "p")
    val out = df.select(col("w"), GraftColumns.greedySegCount(col("w"), col("p")))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out === Map("abcab" -> 2L, "cab" -> 2L, "xay" -> 3L))
  }

  test("wordpieceEncode: frequent words ride whole, rare words spell out") {
    // "alpha" appears 3x (top piece); "zq" once (not top-1, spells out)
    val docs = Seq(
      (1L, "alpha alpha"), (2L, "alpha zq")).toDF("doc_id", "text")
    val out = TextAnalysis.wordpieceEncode(docs, topPieces = 1)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out(1L) === ((2L, 2L)), "two whole-piece words")
    assert(out(2L) === ((2L, 3L)), "alpha=1 token, zq=2 chars")
  }

  test("gopherRules: each rule fires independently on a planted violator") {
    val fifty = Seq.fill(48)("foxtrot").mkString(" ") // 48 alphabetic filler words
    val docs = Seq(
      (1L, s"the a $fifty"),            // 50 words, both stops → all pass
      (2L, "the a short doc"),          // word count fails
      (3L, s"the the $fifty"),          // only one DISTINCT stop word
      (4L, s"the a x9! x8# $fifty 1 2 3 4 5 6")) // >10% symbol words
      .toDF("doc_id", "text")
    val out = graft.operators.TextAnalysis.gopherRules(docs, minWords = 50)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7), r.getLong(8))).toMap
    assert(out(1L) === ((1L, 1L, 1L, 1L, 1L)))
    assert(out(2L)._1 === 0L && out(2L)._5 === 0L)
    assert(out(3L)._3 === 0L, "duplicate stop word is ONE distinct")
    assert(out(4L)._4 === 0L, "8 of 58 words carry symbols > 10%")
  }

  test("collocations min-count screens hapax pairs") {
    val docs = Seq((1L, "rare pair"), (2L, "common token common token common token common token common token"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.collocations(docs, minCount = 2, topK = 10)
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(!out.contains(("rare", "pair")))
    assert(out.nonEmpty)
  }
}
