package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructType}

/** Distributed exclusive prefix sum (scan) of a long column in a global
  * key order.
  *
  * The declarative spelling — `sum(v).over(Window.orderBy(key))` with no
  * partition key — is CORRECT but collapses the entire dataset into one
  * window task: a single-threaded bottleneck that cannot survive a 100 TB
  * input (Spark even warns "No Partition Defined for Window operation").
  * The scalable shape is the classic two-pass scan:
  *
  *   1. range-repartition by the key and sort within partitions — the
  *      same machinery a global `orderBy` uses, so partition i holds keys
  *      strictly below partition i+1;
  *   2. one tiny job reduces each partition to its value total
  *      (numPartitions longs to the driver — KB-sized at any data scale);
  *   3. `scanLeft` the totals into exclusive per-partition offsets,
  *      broadcast them, and add a per-partition running sum map-side.
  *
  * The sorted frame is localCheckpoint'ed so passes 2 and 3 share one
  * materialization of the range shuffle instead of re-sorting.
  *
  * The running sum itself is genuine per-partition imperative logic, so
  * this is one of the rare places an RDD `mapPartitionsWithIndex` is the
  * right tool (a Catalyst window cannot express "carry state seeded by
  * another job's result").
  */
object PrefixSum {

  /** Appends `outCol` = exclusive running sum of `valueCol` (a non-null
    * long) in ascending `orderCol` order. Row order of the result is the
    * global `orderCol` order. */
  def exclusiveScan(
      df: DataFrame,
      orderCol: String,
      valueCol: String,
      outCol: String,
      numPartitions: Int = 32): DataFrame = {
    val spark = df.sparkSession
    val sorted = df
      .repartitionByRange(numPartitions, col(orderCol))
      .sortWithinPartitions(orderCol)
      .localCheckpoint()
    val valIdx = sorted.schema.fieldIndex(valueCol)

    // pass 1: per-partition totals (tiny — numPartitions longs)
    val totals = sorted.rdd
      .mapPartitionsWithIndex { (pid, it) =>
        var s = 0L
        it.foreach(r => s += r.getLong(valIdx))
        Iterator((pid, s))
      }
      .collect()
      .sortBy(_._1)
      .map(_._2)

    // exclusive offsets: offset(i) = sum of totals of partitions < i
    val offsets = totals.scanLeft(0L)(_ + _)
    val bc = spark.sparkContext.broadcast(offsets)

    // pass 2: map-side running sum seeded by the partition offset
    val outRows = sorted.rdd.mapPartitionsWithIndex { (pid, it) =>
      var run = bc.value(pid)
      it.map { r =>
        val off = run
        run += r.getLong(valIdx)
        Row.fromSeq(r.toSeq :+ off)
      }
    }
    val outSchema = StructType(
      sorted.schema.fields :+
        org.apache.spark.sql.types.StructField(outCol, LongType, nullable = false))
    spark.createDataFrame(outRows, outSchema)
  }
}
