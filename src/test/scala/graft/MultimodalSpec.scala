package graft

import org.apache.spark.sql.functions._

import graft.operators.Multimodal

class MultimodalSpec extends SparkSuite {
  import spark.implicits._

  test("media table schema: binary payload + typed metadata struct") {
    val media = Multimodal.toMediaTable(Tables.documents(spark, sf0001))
    val f = media.schema("payload")
    assert(f.dataType == org.apache.spark.sql.types.BinaryType)
    val meta = media.schema("meta").dataType.asInstanceOf[org.apache.spark.sql.types.StructType]
    assert(meta.fieldNames.toSeq == Seq("media_type", "source", "declared_len"))
  }

  test("feature extraction is 1:1, deterministic, and prunes the payload") {
    val docs = Tables.documents(spark, sf0001)
    val feats = Multimodal.mediaFeatures(spark, docs)
    assert(feats.count() == docs.count())
    assert(!feats.columns.contains("payload"))
    // deterministic across runs and partitionings
    val a = feats.orderBy("media_id").collect()
    val b = Multimodal.mediaFeatures(spark, docs.repartition(7)).orderBy("media_id").collect()
    assert(a.sameElements(b))
    // n_bytes equals the UTF-8 byte length of the text
    val one = docs.where($"doc_id" === 0).select($"text").as[String].head()
    val f0 = feats.where($"media_id" === 0).head()
    assert(f0.getAs[Long]("n_bytes") == one.getBytes("UTF-8").length.toLong)
    assert(Set("png", "jpg").contains(f0.getAs[String]("format")))
  }

  test("decode stub is partition-local (no shuffle in the plan)") {
    val media = Multimodal.toMediaTable(Tables.documents(spark, sf0001))
    val plan = Multimodal.extractFeatures(spark, media)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
  }
}
