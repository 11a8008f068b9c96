package graft.io

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets
import java.time.LocalDate
import java.time.format.DateTimeFormatter

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.DataFrame

import org.apache.commons.compress.compressors.bzip2.{BZip2CompressorInputStream, BZip2CompressorOutputStream}

/** K1 — dual-versioned compressed JSON artifact publish
  * (taar_utils.py:32-63: serialize → utf8 → bz2 → upload twice, once as
  * `{fname}.bz2` "latest" and once as the dated snapshot
  * `{fname}.{YYYYMMDD}.bz2`).
  *
  * Artifacts are SMALL by contract (whitelists, rankings — the outputs of
  * heavy distributed reductions), so a driver-side collect at the sink is
  * the correct scale design: everything before this point stays
  * distributed; the artifact itself is KBs.
  *
  * Determinism: rows are serialized in the order of the incoming
  * DataFrame (callers sort), and both copies are written from the SAME
  * byte array, so latest == snapshot byte-for-byte.
  */
object JsonArtifact {

  private val DateFmt = DateTimeFormatter.ofPattern("yyyyMMdd")

  /** Row-count ceiling for the driver-side collect, overridable via
    * `graft.artifact.maxRows`. The "artifacts are small" contract is
    * ASSERTED, not assumed: an oversized frame fails with a contract
    * error naming the artifact instead of silently OOMing the driver.
    * The guard costs nothing extra — `take(max + 1)` is the same scan
    * the collect would run, stopped one row past the ceiling. */
  val DefaultMaxRows = 1000000

  private def maxRows(df: DataFrame): Int =
    df.sparkSession.conf.getOption("graft.artifact.maxRows")
      .map(_.toInt).getOrElse(DefaultMaxRows)

  private def guarded[T](rows: Array[T], max: Int, fname: String): Array[T] = {
    require(rows.length <= max,
      s"artifact '$fname' exceeds the small-artifact contract: more than " +
        s"$max rows (graft.artifact.maxRows); artifacts are driver-collected " +
        "outputs of distributed reductions and must stay KB-scale")
    rows
  }

  /** Serialize each row as a JSON object (one per line, jsonl). */
  def writeRows(df: DataFrame, prefix: String, fname: String, asOf: LocalDate): (String, String) = {
    val max = maxRows(df)
    val body = guarded(df.toJSON.take(max + 1), max, fname).mkString("\n")
    writeBytes(df, body.getBytes(StandardCharsets.UTF_8), prefix, fname, asOf)
  }

  /** Serialize a keyed collection as ONE JSON object {key: record, ...}
    * (the amodump / whitelist artifact shape, taar_amodump.py:304-307).
    * Key order = incoming row order (callers sort by key for determinism). */
  def writeKeyedObject(df: DataFrame, keyCol: String, prefix: String, fname: String,
      asOf: LocalDate): (String, String) = {
    import org.apache.spark.sql.functions.{col, struct, to_json}
    // ONE action: key and record come from the same row, so a
    // nondeterministic recompute between two collects can't mis-zip them.
    val max = maxRows(df)
    val kj = guarded(
      df.select(col(keyCol).cast("string"),
          to_json(struct(df.columns.map(col): _*)))
        .take(max + 1), max, fname)
      .map(r => (r.getString(0), r.getString(1)))
    val body = kj
      .map { case (k, r) => "\"" + k.replace("\\", "\\\\").replace("\"", "\\\"") + "\": " + r }
      .mkString("{", ", ", "}")
    writeBytes(df, body.getBytes(StandardCharsets.UTF_8), prefix, fname, asOf)
  }

  private def writeBytes(df: DataFrame, bytes: Array[Byte], prefix: String,
      fname: String, asOf: LocalDate): (String, String) = {
    val compressed = bzip2(bytes)
    val fs = FileSystem.get(new java.net.URI(prefix),
      df.sparkSession.sparkContext.hadoopConfiguration)
    val latest = s"$prefix/$fname.bz2"
    val dated  = s"$prefix/$fname.${asOf.format(DateFmt)}.bz2"
    for (p <- Seq(latest, dated)) {
      val out = fs.create(new Path(p), true)
      try out.write(compressed) finally out.close()
    }
    (latest, dated)
  }

  def bzip2(bytes: Array[Byte]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val bz = new BZip2CompressorOutputStream(bos)
    try bz.write(bytes) finally bz.close()
    bos.toByteArray
  }

  def readBzip2(path: String, df: DataFrame): Array[Byte] = {
    val fs = FileSystem.get(new java.net.URI(path),
      df.sparkSession.sparkContext.hadoopConfiguration)
    val in = new BZip2CompressorInputStream(fs.open(new Path(path)))
    try in.readAllBytes() finally in.close()
  }
}
