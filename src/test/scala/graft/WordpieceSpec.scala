package graft

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.WordpieceEncode
import graft.queries.TextQueries

/** q132: WordPiece greedy longest-match segmentation — expression-level
  * semantics, the BPE-vs-WordPiece divergence fixture, and corpus
  * invariants. */
class WordpieceSpec extends SparkSuite {
  import spark.implicits._

  private def enc(vocab: Seq[String], word: String): Seq[String] = {
    val t = WordpieceEncode.compile(vocab)
    val out = WordpieceEncode.encode(UTF8String.fromString(word), t)
    (0 until out.numElements()).map(i => out.getUTF8String(i).toString)
  }

  test("greedy longest-match-first semantics") {
    val v = Seq("a", "b", "ab", "abc")
    assert(enc(v, "abab") == Seq("ab", "ab"))
    assert(enc(v, "abc") == Seq("abc"))
    assert(enc(v, "abcab") == Seq("abc", "ab"))
    assert(enc(v, "ba") == Seq("b", "a"))
    assert(enc(v, "") == Seq.empty)
  }

  test("any unmatched position makes the WHOLE word [UNK] (WordPiece rule)") {
    val v = Seq("a", "b", "ab")
    // 'd' is unseen: failure mid-word discards the matched prefix
    assert(enc(v, "abd") == Seq(WordpieceEncode.Unk))
    assert(enc(v, "d") == Seq(WordpieceEncode.Unk))
  }

  test("code-point semantics: multi-byte pieces match by character") {
    val v = Seq("é", "t", "té", "e")
    assert(enc(v, "tété") == Seq("té", "té"))
    assert(enc(v, "été") == Seq("é", "té"))
  }

  test("greedy longest-match DIVERGES from BPE merge-order replay") {
    // corpus tuned so merge 1 = (b,c) and merge 2 = (a,b): BPE replays
    // "abc" by merge ORDER — (b,c) fires first → a + bc, and (a,b) can
    // then never fire. WordPiece ignores merge order and takes the
    // LONGEST vocabulary prefix → ab + c. Same learned vocabulary
    // {a,b,c,bc,ab}, same piece count, different segmentation — the
    // inference-rule divergence this operator adds over q127.
    val docs = Seq((1L, "bc bc bc bc abc"), (2L, "ab ab ab ab bc"))
      .toDF("doc_id", "text")
    val merges = TextQueries.bpeMergesCore(spark, docs, 2).collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    assert(merges == Seq(("b", "c"), ("a", "b")), s"fixture premise: $merges")
    val vocab = Seq("a", "b", "c") ++ merges.map { case (l, r) => l + r }
    assert(enc(vocab, "abc") == Seq("ab", "c"),
      "WordPiece takes the longest prefix, ignoring merge order")
    // both segmentations are 2 pieces, so the per-doc COUNTS agree while
    // the pieces differ — pin that the count surfaces match:
    val bpe = TextQueries.bpeEncodeCore(spark, docs, 2).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    val wp = TextQueries.wordpieceCore(spark, docs, 2).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(bpe(1L) == wp(1L) && bpe(2L) == wp(2L))
  }

  test("q132 corpus invariants: full coverage, counts bounded by chars") {
    val out = TextQueries.wordpieceCore(spark,
      Tables.documents(spark, sf0001), 5).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (nw, np, nu) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(nu == 0L, "training-corpus chars are all in the vocabulary")
      assert(np >= nw, "every word is at least one piece")
    }
  }

  test("SQL surface: wordpiece_encode callable from spark.sql text") {
    val got = spark.sql(
      """SELECT wordpiece_encode('abcab', array('a','b','c','ab','abc'))""")
      .collect().head.getSeq[String](0)
    assert(got == Seq("abc", "ab"))
  }
}
