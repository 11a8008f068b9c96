package graft

import java.time.LocalDate

import org.apache.spark.sql.functions._

import graft.jobs.CorpusExport
import graft.queries.ComposeQueries

/** End-to-end export job: verdicts → deterministic shuffle → shard
  * write → manifest artifact. */
class CorpusExportSpec extends SparkSuite {
  import spark.implicits._

  private val asOf = LocalDate.parse("2026-08-14")

  test("export writes exactly the q100 keep set, ordered and checksummed") {
    val out = tmpDir("corpus_export")
    val manifest = CorpusExport.run(spark, sf0001, out, asOf).collect()

    val kept = ComposeQueries.q100PipelineVerdict(spark, sf0001)
      .where($"keep").select($"doc_id").as[Long].collect().toSet
    val shards = spark.read.parquet(s"$out/shards")
    val written = shards.select($"doc_id").as[Long].collect()
    assert(written.toSet == kept, "shards must hold exactly the survivors")
    assert(written.length == kept.size, "no duplicate rows across shards")

    // manifest counts and order checksums must match the written data
    val byShard = shards.groupBy($"shard")
      .agg(count(lit(1)).as("n"), sum($"doc_id" * $"rank").as("ck"))
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(manifest.length == byShard.size)
    manifest.foreach { r =>
      val (n, ck) = byShard(r.getAs[Long]("shard").toInt)
      assert(r.getAs[Long]("n_docs") == n)
      assert(r.getAs[Long]("order_checksum") == ck)
    }

    // the global rank is a permutation of 1..n_kept (the PrefixSumPlan
    // stitch produced a true global order, not per-partition ranks)
    val ranks = shards.select($"rank").as[Long].collect().sorted
    assert(ranks.toSeq == (1L to kept.size.toLong))

    // in-file order IS the training order: ranks are ascending within
    // every shard file
    val files = shards.select(input_file_name().as("f"), $"rank")
      .collect().groupBy(_.getString(0))
    files.foreach { case (f, rows) =>
      val rs = rows.map(_.getLong(1)).toSeq
      assert(rs == rs.sorted, s"ranks must ascend within $f")
    }
  }

  test("export is deterministic: two runs publish identical manifest bytes") {
    val (o1, o2) = (tmpDir("ce_a"), tmpDir("ce_b"))
    val m1 = CorpusExport.run(spark, sf0001, o1, asOf)
    val b1 = graft.io.JsonArtifact.readBzip2(s"$o1/corpus_manifest.json.bz2", m1)
    val m2 = CorpusExport.run(spark, sf0001, o2, asOf)
    val b2 = graft.io.JsonArtifact.readBzip2(s"$o2/corpus_manifest.json.bz2", m2)
    assert(java.util.Arrays.equals(b1, b2))
  }
}
