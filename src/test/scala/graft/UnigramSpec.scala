package graft

import org.apache.spark.sql.functions._
import graft.ext.Unigram

/** Unigram-LM (SentencePiece-style) tokenizer: seed, hard-EM, Viterbi
  * segmentation (VERDICT r13 #8). */
class UnigramSpec extends SparkTestBase {
  import spark.implicits._

  private def wordsDF(ws: (String, Long)*) = ws.toDF("w", "freq")

  test("seedCounts: every substring <= maxLen, freq-weighted") {
    val sc = Unigram.seedCounts(wordsDF("abab" -> 2L), 3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // substrings of abab (len<=3): a(x2) b(x2) ab(x2) ba aba bab, each x freq 2
    assert(sc === Map("a" -> 4L, "b" -> 4L, "ab" -> 4L, "ba" -> 2L,
      "aba" -> 2L, "bab" -> 2L))
  }

  test("segment: picks the higher-probability path, exact DP") {
    // vocab scores chosen so 'ab'+'ab' beats any char path on 'abab'
    val vocab = Seq(Unigram.Piece("a", 0, -3000000L),
      Unigram.Piece("b", 0, -3000000L), Unigram.Piece("ab", 0, -2000000L))
    val seg = Unigram.segment(wordsDF("abab" -> 1L), vocab, 4)
      .select("pieces").head.getSeq[String](0)
    assert(seg === Seq("ab", "ab"))
  }

  test("segment tie-break: equal score prefers the SHORTER final piece (max j)") {
    // lp6(xy) == lp6(x)+lp6(y): paths tie; pinned convention takes j=1
    val vocab = Seq(Unigram.Piece("x", 0, -1000000L),
      Unigram.Piece("y", 0, -1000000L), Unigram.Piece("xy", 0, -2000000L))
    val seg = Unigram.segment(wordsDF("xy" -> 1L), vocab, 4)
      .select("pieces").head.getSeq[String](0)
    assert(seg === Seq("x", "y"))
  }

  test("emTrain: roundtrip law — concat(pieces) == word for every word") {
    val words = Unigram.wordFreq(
      Seq("the cat sat on the mat", "the bat and the cat").toDF("text"),
      "text")
    val vocab = Unigram.emTrain(words, maxLen = 4, topK = 10, iters = 2)
    // single chars never pruned
    val chars = vocab.filter(_.piece.length == 1).map(_.piece).toSet
    assert(Set("t", "h", "e", "c", "a", "s", "o", "n", "m", "b", "d")
      .subsetOf(chars))
    val seg = Unigram.segment(words, vocab, 4)
    val bad = seg.filter(array_join(col("pieces"), "") =!= col("w")).count()
    assert(bad === 0L, "roundtrip must hold for every word")
    // counts on the final vocab are the LAST E-step's — total piece mass
    // must equal the corpus' best-path piece count
    val total = Unigram.viterbiCounts(words, vocab, 4)
      .agg(sum("n")).head.getLong(0)
    assert(total > 0L)
  }

  test("emTrain prunes zero-count multi-char pieces, keeps chars") {
    val words = wordsDF("aaaa" -> 10L)
    val vocab = Unigram.emTrain(words, maxLen = 3, topK = 5, iters = 2)
    // 'aaa'+'a' or 'aa'+'aa' wins; the losers among multi-char seeds
    // (whichever path EM settles on) must be gone, 'a' must remain
    assert(vocab.exists(_.piece == "a"))
    assert(vocab.filter(_.piece.length > 1).forall(_.n > 0))
  }

  test("SQL mirror generator emits balanced unroll (smoke)") {
    val sql = Unigram.viterbiCntSql("t", "words", "v0", 4)
    assert(sql.contains(s"tdp${Unigram.SqlUnrollBound} AS"))
    assert(sql.contains(s"tbt${Unigram.SqlUnrollBound} AS"))
    assert(sql.contains("error('unigram oracle: word exceeds unroll bound"))
    // no list_reduce anywhere: DuckDB 1.0 misaligns rows in vectorized
    // full-table plans (see Unigram scaladoc)
    assert(!sql.contains("list_reduce"))
  }
}
