package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.functions.Zlib

/** Property-based pins (SURVEY.md §5.4). The scalatest/scalacheck bridge
  * isn't in the offline cache, so properties sample Gen directly with a
  * fixed seed (deterministic, 30 cases each). */
class PropertySpec extends SparkSuite {
  import spark.implicits._

  private def forAll[A](gen: Gen[A], n: Int = 30)(body: A => Unit): Unit = {
    var seed = Seed(42L)
    var i = 0
    while (i < n) {
      gen.apply(Gen.Parameters.default, seed).foreach { a => body(a); i += 1 }
      seed = seed.next
    }
  }

  private def forAll2[A, B](ga: Gen[A], gb: Gen[B])(body: (A, B) => Unit): Unit =
    forAll(Gen.zip(ga, gb))(p => body(p._1, p._2))

  private val asciiStr = Gen.listOf(Gen.choose(32.toChar, 126.toChar)).map(_.mkString)

  test("P4 marshal: undeclared keys never survive from_json; absent declared keys → null") {
    val schema = "a BIGINT, b STRING"
    forAll2(Gen.choose(Long.MinValue, Long.MaxValue), asciiStr.suchThat(!_.contains("\\"))) {
      (a: Long, junk: String) =>
        // undeclared key "z" projected away; declared "b" absent → null
        val json = s"""{"a": $a, "z": ${"\"" + junk.replace("\"", "") + "\""}}"""
        val row = Seq(json).toDF("j")
          .select(from_json($"j", org.apache.spark.sql.types.StructType.fromDDL(schema)).as("s"))
          .select($"s.a", $"s.b").head()
        assert(row.getLong(0) == a)
        assert(row.isNullAt(1))
    }
  }

  test("P5 sha2 matches JDK MessageDigest on arbitrary ASCII strings") {
    forAll(asciiStr) { s =>
      val spark_ = Seq(s).toDF("x").select(sha2($"x", 256)).as[String].head()
      val jdk = java.security.MessageDigest.getInstance("SHA-256")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      assert(spark_ == jdk)
    }
  }

  test("P6 zlib roundtrip on arbitrary byte arrays") {
    forAll(Gen.listOf(Gen.choose(Byte.MinValue, Byte.MaxValue)).map(_.toArray)) { bytes =>
        assert(java.util.Arrays.equals(Zlib.decompress(Zlib.compress(bytes)), bytes))
    }
  }

  test("Exact.dsum is partitioning-invariant (order-independent)") {
    forAll2(Gen.listOfN(50, Gen.choose(-1e6, 1e6)), Gen.choose(1, 8)) {
      (xs: List[Double], nPart: Int) =>
        if (xs.nonEmpty) {
          val df1 = xs.toDF("x").repartition(1)
          val dfN = xs.toDF("x").repartition(nPart)
          val s1 = df1.agg(graft.functions.Exact.dsum($"x")).as[Double].head()
          val sN = dfN.agg(graft.functions.Exact.dsum($"x")).as[Double].head()
          assert(s1 == sN) // bitwise equal regardless of partitioning
        }
    }
  }

  test("iterated PageRank (q72) is bitwise partitioning-invariant") {
    // the q72 determinism contract: integer-picounit contribution sums +
    // fixed-order IEEE rank arithmetic ⇒ identical doubles at ANY
    // parallelism. Run the whole query under two shuffle widths.
    def run(parts: String): Map[Long, Double] = {
      val old = spark.conf.get("spark.sql.shuffle.partitions")
      spark.conf.set("spark.sql.shuffle.partitions", parts)
      try graft.queries.GraphQueries.q72PagerankIters(spark, sf0001)
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      finally spark.conf.set("spark.sql.shuffle.partitions", old)
    }
    val a = run("2")
    val b = run("7")
    assert(a.keySet === b.keySet)
    a.foreach { case (k, v) =>
      assert(java.lang.Double.doubleToLongBits(v) ===
        java.lang.Double.doubleToLongBits(b(k)), s"node $k")
    }
  }

  test("wordpiece_encode: greedy reference re-derivation on random vocab/word pairs") {
    import graft.functions.WordpieceEncode
    import org.apache.spark.unsafe.types.UTF8String
    // reference: straightforward greedy longest-prefix over a Scala Set
    def ref(vocab: Seq[String], word: String): Seq[String] = {
      val vs = vocab.toSet
      val maxLen = vocab.map(_.length).max
      val out = Seq.newBuilder[String]
      var pos = 0
      while (pos < word.length) {
        val l = (math.min(maxLen, word.length - pos) to 1 by -1)
          .find(l => vs.contains(word.substring(pos, pos + l)))
        l match {
          case None => return Seq(WordpieceEncode.Unk)
          case Some(n) => out += word.substring(pos, pos + n); pos += n
        }
      }
      out.result()
    }
    val piece = Gen.choose(1, 3).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf('a', 'b', 'c')).map(_.mkString))
    val gen = Gen.zip(
      Gen.nonEmptyListOf(piece).map(_.distinct),
      Gen.listOf(Gen.oneOf('a', 'b', 'c', 'd')).map(_.mkString))
    forAll(gen, n = 60) { case (vocab, word) =>
      val t = WordpieceEncode.compile(vocab)
      val got = WordpieceEncode.encode(UTF8String.fromString(word), t)
      val gotSeq = (0 until got.numElements()).map(i => got.getUTF8String(i).toString)
      assert(gotSeq == ref(vocab, word), s"vocab=$vocab word='$word'")
    }
  }

  test("q128 binEncode: every packed bit equals its midpoint comparison") {
    import graft.queries.SimilarityQueries
    val emb = Tables.embeddings(spark, sf0001)
      .select($"vec_id", $"embedding")
    val stats = SimilarityQueries.sq8Stats(emb)
    val statRow = stats.collect().head
    val lo = statRow.getSeq[Double](0)
    val hi = statRow.getSeq[Double](1)
    val vecs = emb.collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    SimilarityQueries.binEncode(emb, stats).collect().foreach { r =>
      val v = vecs(r.getLong(0))
      val (w0, w1) = (r.getLong(1), r.getLong(2))
      (0 until SimilarityQueries.EmbDim).foreach { d =>
        val bit = if (d < 32) (w0 >> d) & 1L else (w1 >> (d - 32)) & 1L
        val expect = if (v(d).toDouble > (lo(d) + hi(d)) / 2.0) 1L else 0L
        assert(bit == expect, s"vec ${r.getLong(0)} dim $d")
      }
    }
  }

  test("K1 dual write: latest and dated artifact are byte-identical for arbitrary content") {
    forAll(Gen.listOfN(5, asciiStr.suchThat(s => s.nonEmpty && !s.contains("\\"))), n = 10) { keys =>
        val df = keys.distinct.sorted.zipWithIndex.toDF("guid", "n")
        val dir = tmpDir("prop_artifact")
        val (latest, dated) = graft.io.JsonArtifact.writeKeyedObject(
          df, "guid", dir, "p.json", java.time.LocalDate.parse("2024-06-01"))
        assert(java.util.Arrays.equals(
          graft.io.JsonArtifact.readBzip2(latest, df),
          graft.io.JsonArtifact.readBzip2(dated, df)))
    }
  }
}
