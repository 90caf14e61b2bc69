package graft

import org.apache.spark.sql.functions.col

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
}
