package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.streaming.OutputMode
import org.apache.spark.sql.types.StructType

/** Shared bounded test driver for the stateful streaming faces: read a
  * drop-dir glob with an explicit schema, run the face's transform,
  * drive to completion into a memory sink, and ALWAYS stop the query —
  * a poisoned batch must not leak a live query holding the checkpoint
  * (the stop-in-finally convention every face shared by copy-paste
  * before this helper; review r15). */
private[streaming] object BoundedDrive {

  def run(spark: SparkSession, glob: String, queryName: String,
      schema: StructType, maxFilesPerTrigger: Option[Int])(
      toVerdicts: DataFrame => Dataset[_]): DataFrame = {
    val reader = spark.readStream.schema(schema)
    val stream = maxFilesPerTrigger
      .fold(reader)(n => reader.option("maxFilesPerTrigger", n))
      .parquet(glob)
    val q = toVerdicts(stream)
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName(queryName).start()
    try q.processAllAvailable()
    finally q.stop()
    spark.table(queryName)
  }
}
