package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** CDC MERGE / upsert: fold a change stream into a base snapshot
  * (the composite of the two patterns the engine already has — q50
  * latest-per-key compaction + the KV sink's anti-join delete — as ONE
  * operator, the way a warehouse MERGE statement would run it).
  *
  * Semantics per key:
  *  - the LATEST change (by `versionCols`, descending) wins;
  *  - latest op == `deleteOp` → the key is dropped (even if in base);
  *  - any other op → upsert: change payload columns overwrite the base's
  *    same-named columns; base-only columns pass through (null for keys
  *    that are new in the change stream — inserts);
  *  - keys with no change pass through unchanged.
  *
  * Scale design: ONE window (WindowGroupLimit keeps a row per key per
  * partition before the shuffle) + ONE full-outer join on the key. The
  * change stream is usually a small fraction of the snapshot — a
  * broadcast hint on `changes` turns the join map-side; with both sides
  * bucketed on the key (io.Bucketing) it is zero-exchange.
  */
object ApplyChanges {

  /** @param base       current snapshot
    * @param changes    change rows: key columns + `opCol` + version
    *                   columns + payload columns (same-named payload
    *                   columns overwrite base's)
    * @param keyCols    join/merge key column names (present in both)
    * @param versionCols change-ordering columns (latest = max) —
    *                   ties broken by their order in the seq
    * @param opCol      change-operation column in `changes`
    * @param deleteOp   `opCol` value that deletes the key */
  def apply(base: DataFrame, changes: DataFrame, keyCols: Seq[String],
      versionCols: Seq[Column], opCol: String, deleteOp: String): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(versionCols.map(_.desc): _*)
    val latest = changes
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1)
      .drop("__rn")

    // prefix non-key change columns so the joined frame is unambiguous
    val payloadCols = latest.columns.filterNot(keyCols.contains)
    val renamed = payloadCols.foldLeft(latest)((df, c) => df.withColumnRenamed(c, s"__c_$c"))

    val joined = base.join(renamed, keyCols, "full_outer")
      .where(col(s"__c_$opCol").isNull || col(s"__c_$opCol") =!= deleteOp)

    val merged = base.columns.filterNot(keyCols.contains).map { c =>
      if (payloadCols.contains(c)) coalesce(col(s"__c_$c"), col(c)).as(c)
      else col(c)
    }
    // inserts carry change-only payload columns too (minus op/version
    // bookkeeping is the caller's choice: they pick the final projection)
    val changeOnly = payloadCols.filterNot(base.columns.contains)
      .filterNot(_ == opCol).map(c => col(s"__c_$c").as(c))
    joined.select(keyCols.map(col) ++ merged ++ changeOnly: _*)
  }
}
