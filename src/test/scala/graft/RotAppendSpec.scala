package graft

import org.apache.spark.sql.functions._

import graft.io.Bucketing
import graft.jobs.RotIngest
import graft.queries.SimilarityQueries

/** Incremental maintenance of the LEARNED-rotation ANN index (VERDICT
  * r13 item 3): appends encode against the STORED basis/range/codebook
  * (nothing re-learned), re-deliver idempotently, clamp drift, and stay
  * searchable — CodesAppendSpec's frozen-encoder contract on the q155
  * tier. */
class RotAppendSpec extends SparkSuite {
  import spark.implicits._

  test("rot-tier appendBatch: frozen-model encode == full encode from the " +
      "stored model, redelivery a no-op, drift clamped, search unchanged") {
    val emb = Tables.embeddings(spark, sf0001)
      .select($"vec_id", $"embedding").localCheckpoint(true)
    val total = emb.count()
    val prefix = "rot_append_spec"
    Seq("_codes", "_codebook", "_model", "_stats")
      .foreach(sfx => Bucketing.dropManaged(spark, s"$prefix$sfx"))
    // base = first 400 vectors (contains the PqK codebook seed rows);
    // the rest arrive later and can rotate OUTSIDE the frozen global
    // range (the drift-clamp path)
    val (codesT, cbT) = RotIngest.ingestFrame(spark,
      emb.where($"vec_id" < 400), prefix)
    assert(spark.table(codesT).count() == 400)

    // the batch carries an intra-batch duplicate row (dirty export):
    // exactly one copy of each vec_id may land
    val batch = emb.where($"vec_id" >= 400)
    RotIngest.appendBatch(spark,
      batch.unionByName(batch.orderBy($"vec_id").limit(1)), prefix)
    assert(spark.table(codesT).count() == total)
    assert(spark.table(codesT).select($"vec_id").distinct().count() == total)

    // frozen-model contract: the merged table equals one full encode of
    // the grown corpus against the STORED model + stats + codebook
    val model = RotIngest.readModelPrefix(spark, prefix)
    val rotated = SimilarityQueries.pcaRotate(spark, emb, model)
    val stats = spark.table(s"${prefix}_stats").select($"glo", $"ghi")
    val codes = SimilarityQueries.sq8EncodeGlobal(rotated, stats)
      .select($"vec_id", transform($"codes", c =>
        least(greatest(c, lit(0L)), lit(SimilarityQueries.Sq8Levels.toLong)))
        .as("codes"))
    val pq = SimilarityQueries.pqEncodeCodes(spark,
      SimilarityQueries.subcodeView(spark, codes), spark.table(cbT))
    val expected = codes.join(pq, Seq("vec_id"))
      .select($"vec_id", $"codes", $"pq")
    val stored = spark.table(codesT)
    assert(stored.exceptAll(expected).isEmpty && expected.exceptAll(stored).isEmpty,
      "append must equal the frozen full encode row-for-row")

    // drift clamps into the code domain
    val Seq(lo, hi) = stored.select(explode($"codes").as("c"))
      .agg(min($"c"), max($"c")).collect().head.toSeq.map(_.asInstanceOf[Long])
    assert(lo >= 0L && hi <= SimilarityQueries.Sq8Levels.toLong,
      s"codes out of range: $lo..$hi")

    // at-least-once redelivery appends nothing (vec_id anti-join)
    RotIngest.appendBatch(spark, emb.where($"vec_id" >= 400), prefix)
    assert(spark.table(codesT).count() == total, "replay must be a no-op")

    // the streaming face re-delivers the same rows as drop files: the
    // anti-join absorbs them (and a fresh checkpoint replays cleanly)
    val drop = tmpDir("rot_drop")
    emb.where($"vec_id" >= 400 && $"vec_id" < 450).coalesce(1)
      .write.mode("append").parquet(s"$drop/in")
    emb.where($"vec_id" >= 450).coalesce(1)
      .write.mode("append").parquet(s"$drop/in")
    RotIngest.appendStreamBounded(spark, s"$drop/in", prefix, s"$drop/ckpt")
    assert(spark.table(codesT).count() == total,
      "streamed redelivery of applied rows must append nothing")

    // the q155 search face over the incrementally-built table equals
    // the same scan over the frozen full encode
    val viaTable = SimilarityQueries.pqCodesScan(spark, stored, spark.table(cbT))
    val inPlan = SimilarityQueries.pqCodesScan(spark, expected, spark.table(cbT))
    assert(viaTable.exceptAll(inPlan).isEmpty && inPlan.exceptAll(viaTable).isEmpty)

    Seq("_codes", "_codebook", "_model", "_stats")
      .foreach(sfx => Bucketing.dropManaged(spark, s"$prefix$sfx"))
  }

  test("rot-tier deleteVecs: takedown == the frozen encode without the " +
      "vectors (row filter on the stored table); replayed delete and " +
      "compact are value no-ops; the ADC scan serves only survivors") {
    val emb = Tables.embeddings(spark, sf0001)
      .select($"vec_id", $"embedding").localCheckpoint(true)
    val prefix = "rot_del_spec"
    Seq("_codes", "_codebook", "_model", "_stats")
      .foreach(sfx => Bucketing.dropManaged(spark, s"$prefix$sfx"))
    val (codesT, cbT) = RotIngest.ingestFrame(spark, emb, prefix)
    val before = spark.table(codesT).localCheckpoint(true)
    val isGone = $"vec_id" % 5 === 3
    RotIngest.deleteVecs(spark, emb.where(isGone).select($"vec_id"), prefix)
    val expected = before.where(!isGone)
    val stored = spark.table(codesT)
    assert(stored.exceptAll(expected).isEmpty && expected.exceptAll(stored).isEmpty,
      "delete must equal the frozen encode without the vectors")
    RotIngest.deleteVecs(spark, emb.where(isGone).select($"vec_id"), prefix)
    RotIngest.compact(spark, prefix)
    val stored2 = spark.table(codesT)
    assert(stored2.exceptAll(expected).isEmpty && expected.exceptAll(stored2).isEmpty)
    val hits = SimilarityQueries.pqCodesScan(spark, stored2, spark.table(cbT))
    assert(!hits.isEmpty)
    assert(hits.where(($"query_id" % 5 === 3) || ($"neighbor_id" % 5 === 3)).isEmpty,
      "no deleted vector may surface in the ADC scan")
    Seq("_codes", "_codebook", "_model", "_stats")
      .foreach(sfx => Bucketing.dropManaged(spark, s"$prefix$sfx"))
  }
}
