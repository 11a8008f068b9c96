package graft

/** Every registered query runs at sf0.001 and most return rows; every
  * oracle key refers to a real query. The value-level check is the DuckDB
  * oracle compare (tools/check_oracle.py, driven by graft.Verify). */
class QueriesSmokeSpec extends SparkSuite {

  // legitimately empty at tiny scale: q06 (every customer has orders at
  // sf0.001 is false — it has rows at some SFs); keep only structurally
  // possibly-empty results here.
  private val mayBeEmpty = Set("q06_anti_join", "q26_minhash_pairs", "q31_embedding_neardup")

  test("oracleSql keys ⊆ queries keys") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  test("entry() returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name runs at sf0.001") {
      val df = fn(spark, sf0001)
      val n = df.count()
      if (!mayBeEmpty(name)) assert(n > 0, s"$name returned 0 rows")
      assert(df.columns.nonEmpty)
    }
  }
}
