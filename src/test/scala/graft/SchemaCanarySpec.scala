package graft

/** Testdata schema-drift canary. The driver regenerates /root/testdata
  * between rounds and has already changed physical types once (round 9:
  * events.ts TIMESTAMP(NANOS) → µs-TIMESTAMP_NTZ), which surfaced as ten
  * confusing downstream failures. This spec pins every table's RAW
  * parquet schema — with the known-good alternates for time columns — so
  * the next drift fails HERE first, naming the exact table and column.
  *
  * On failure: widen the matching loader in `Tables` (and
  * `EventStream.readEvents` for events) the way the ts shim does, then
  * update the alternate list here.
  */
class SchemaCanarySpec extends SparkSuite {

  /** expected column → acceptable physical types (simpleString). Time
    * columns accept every shape the driver has shipped; loaders must
    * normalize all of them. */
  private val expected: Map[String, Seq[(String, Set[String])]] = Map(
    "region" -> Seq("r_regionkey" -> Set("int"), "r_name" -> Set("string")),
    "nation" -> Seq("n_nationkey" -> Set("int"), "n_name" -> Set("string"),
      "n_regionkey" -> Set("int")),
    "customer" -> Seq("c_custkey" -> Set("bigint"), "c_name" -> Set("string"),
      "c_nationkey" -> Set("int"), "c_acctbal" -> Set("double"),
      "c_mktsegment" -> Set("string")),
    "supplier" -> Seq("s_suppkey" -> Set("bigint"), "s_name" -> Set("string"),
      "s_nationkey" -> Set("int"), "s_acctbal" -> Set("double")),
    "part" -> Seq("p_partkey" -> Set("bigint"), "p_name" -> Set("string"),
      "p_brand" -> Set("string"), "p_type" -> Set("string"),
      "p_size" -> Set("int"), "p_retailprice" -> Set("double")),
    "orders" -> Seq("o_orderkey" -> Set("bigint"), "o_custkey" -> Set("bigint"),
      "o_orderstatus" -> Set("string"), "o_totalprice" -> Set("double"),
      "o_orderdate" -> Set("timestamp_ntz", "timestamp", "date"),
      "o_orderpriority" -> Set("string")),
    "lineitem" -> Seq("l_orderkey" -> Set("bigint"), "l_partkey" -> Set("bigint"),
      "l_suppkey" -> Set("bigint"), "l_linenumber" -> Set("int"),
      "l_quantity" -> Set("double"), "l_extendedprice" -> Set("double"),
      "l_discount" -> Set("double"), "l_tax" -> Set("double"),
      "l_returnflag" -> Set("string"), "l_linestatus" -> Set("string"),
      "l_shipdate" -> Set("timestamp_ntz", "timestamp", "date")),
    "events" -> Seq("event_id" -> Set("bigint"),
      // nanos-as-long / µs-NTZ / zoned µs — all shipped or plausible
      "ts" -> Set("bigint", "timestamp_ntz", "timestamp"),
      "user_id" -> Set("bigint"), "event_type" -> Set("string"),
      "value" -> Set("double"), "props" -> Set("string")),
    "documents" -> Seq("doc_id" -> Set("bigint"), "text" -> Set("string"),
      "lang" -> Set("string"), "source" -> Set("string"),
      "n_chars" -> Set("bigint")),
    "embeddings" -> Seq("vec_id" -> Set("bigint"),
      "embedding" -> Set("array<float>"), "label" -> Set("int")))

  test("raw testdata schemas match the pinned shapes (drift fails HERE, by name)") {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val drifts = Tables.names.flatMap { t =>
      val actual = Tables.table(spark, sf0001, t).schema
        .map(f => f.name -> f.dataType.simpleString)
      val exp = expected(t)
      val missing = exp.map(_._1).filterNot(actual.map(_._1).contains)
        .map(c => s"$t.$c MISSING (driver dropped/renamed the column)")
      val extra = actual.map(_._1).filterNot(exp.map(_._1).contains)
        .map(c => s"$t.$c NEW (extend the pinned schema + any consumer)")
      val changed = actual.flatMap { case (c, dt) =>
        exp.find(_._1 == c).collect {
          case (_, ok) if !ok.contains(dt) =>
            s"$t.$c now $dt (accepted: ${ok.mkString("/")}) — widen the " +
              "Tables loader like the events ts shim, then update this spec"
        }
      }
      missing ++ extra ++ changed
    }
    assert(drifts.isEmpty,
      "TESTDATA SCHEMA DRIFT detected:\n  " + drifts.mkString("\n  "))
  }

  test("normalized events always presents a session-zoned timestamp ts") {
    val dt = Tables.events(spark, sf0001).schema("ts").dataType
    assert(dt == org.apache.spark.sql.types.TimestampType,
      s"Tables.events must normalize every physical shape to timestamp, got $dt")
  }
}
