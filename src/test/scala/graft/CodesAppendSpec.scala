package graft

import org.apache.spark.sql.functions._

import graft.jobs.CodesIngest
import graft.queries.SimilarityQueries

/** Incremental ANN-index maintenance: streamed appends to the bucketed
  * codes table encode with the FROZEN stats/codebook, land in the right
  * buckets, re-deliver idempotently, and stay searchable. */
class CodesAppendSpec extends SparkSuite {
  import spark.implicits._

  test("incremental codes ingest: streamed appends match the frozen-stats encode") {
    val emb = Tables.embeddings(spark, sf0001).select($"vec_id", $"embedding")
    val prefix = "inc_append_spec"
    // base corpus = the first 400 vectors (the base MUST contain the
    // codebook seed rows vec_id < PqK — the documented ingest contract);
    // the last 100 arrive later, and their values can fall OUTSIDE the
    // frozen per-dim [lo, hi]
    val (codesT, _) = CodesIngest.ingestFrame(spark,
      emb.where($"vec_id" < 400), prefix)
    assert(spark.table(codesT).count() == 400)

    // two drop files → two micro-batches (maxFilesPerTrigger = 1)
    val dir = tmpDir("codes_drop")
    emb.where($"vec_id" >= 400 && $"vec_id" < 450).coalesce(1)
      .write.mode("append").parquet(s"$dir/in")
    emb.where($"vec_id" >= 450).coalesce(1)
      .write.mode("append").parquet(s"$dir/in")
    CodesIngest.appendStreamBounded(spark, s"$dir/in", prefix, s"$dir/ckpt")

    val table = spark.table(codesT)
    assert(table.count() == 500)
    assert(table.select($"vec_id").distinct().count() == 500)

    // frozen-encoder contract: stored words equal a full encode against
    // the STORED stats (not stats retrained on the grown corpus)
    val stats = spark.table(CodesIngest.statsTable(prefix))
    val expected = SimilarityQueries.binEncode(emb, stats)
    val stored = table.select($"vec_id", $"w0", $"w1")
    assert(stored.exceptAll(expected).isEmpty && expected.exceptAll(stored).isEmpty)

    // drifted values clamp into the code domain (FAISS SQ behavior)
    val Seq(lo, hi) = table.select(explode($"codes").as("c"))
      .agg(min($"c"), max($"c")).collect().head.toSeq.map(_.asInstanceOf[Long])
    assert(lo >= 0L && hi <= SimilarityQueries.Sq8Levels.toLong, s"codes out of range: $lo..$hi")

    // re-delivery with the same checkpoint and no new files is a no-op
    CodesIngest.appendStreamBounded(spark, s"$dir/in", prefix, s"$dir/ckpt")
    assert(spark.table(codesT).count() == 500)

    // the search face runs over the incrementally-built table and equals
    // an in-plan search under the same frozen words
    val viaTable = SimilarityQueries.binSearch(spark, stored, emb,
      SimilarityQueries.BinOverFetch)
    val inPlan = SimilarityQueries.binSearch(spark, expected, emb,
      SimilarityQueries.BinOverFetch)
    assert(viaTable.exceptAll(inPlan).isEmpty && inPlan.exceptAll(viaTable).isEmpty)
  }

  test("deleteVecs: takedown == frozen re-encode without the vectors (codes " +
      "are row-independent, so delete is a pure row filter); the search " +
      "face serves the survivors; replayed delete and compact are no-ops " +
      "on values") {
    val emb = Tables.embeddings(spark, sf0001).select($"vec_id", $"embedding")
    val prefix = "inc_del_spec"
    val (codesT, _) = CodesIngest.ingestFrame(spark, emb, prefix)
    val before = spark.table(codesT).localCheckpoint(true)
    val isGone = $"vec_id" % 5 === 0
    val ids = emb.where(isGone).select($"vec_id")

    CodesIngest.deleteVecs(spark, ids, prefix)
    val expected = before.where(!isGone)
    val stored = spark.table(codesT)
    assert(stored.exceptAll(expected).isEmpty && expected.exceptAll(stored).isEmpty,
      "delete must equal the frozen encode without the vectors")

    // replay + compact: value no-ops; search face sees only survivors
    CodesIngest.deleteVecs(spark, ids, prefix)
    CodesIngest.compact(spark, prefix)
    val stored2 = spark.table(codesT)
    assert(stored2.exceptAll(expected).isEmpty && expected.exceptAll(stored2).isEmpty)
    val hits = SimilarityQueries.binSearch(spark,
      spark.table(codesT).select($"vec_id", $"w0", $"w1"),
      emb.where(!isGone), SimilarityQueries.BinOverFetch)
    assert(!hits.isEmpty, "survivor search must return rows")
    assert(hits.where(($"query_id" % 5 === 0) ||
      ($"neighbor_id" % 5 === 0)).isEmpty,
      "no deleted vector may surface in search")
  }

  test("appendBatch fails fast on CONFLICTING intra-batch payloads — a " +
      "duplicated vec_id carrying two distinct embeddings cannot be " +
      "silently max-merged (ADVICE r14)") {
    val emb = Tables.embeddings(spark, sf0001).select($"vec_id", $"embedding")
    val prefix = "inc_conflict_spec"
    val (codesT, _) = CodesIngest.ingestFrame(spark,
      emb.where($"vec_id" < 400), prefix)
    val before = spark.table(codesT).count()
    val dirty = Seq(
      (990001L, Seq.fill(64)(0.1f)),
      (990001L, Seq.fill(64)(0.9f))).toDF("vec_id", "embedding")
    val e = intercept[IllegalArgumentException] {
      CodesIngest.appendBatch(spark, dirty, prefix)
    }
    assert(e.getMessage.contains("conflicting intra-batch payloads"), e.getMessage)
    assert(spark.table(codesT).count() == before, "no partial append on refusal")
    // the SAME payload repeated is the benign dirty-export case: merged once
    val benign = Seq(
      (990002L, Seq.fill(64)(0.5f)),
      (990002L, Seq.fill(64)(0.5f))).toDF("vec_id", "embedding")
    CodesIngest.appendBatch(spark, benign, prefix)
    assert(spark.table(codesT).where($"vec_id" === 990002L).count() == 1)
  }
}
