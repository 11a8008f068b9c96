package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables

/** Graph analytics over relational co-occurrence graphs.
  *
  * The graph here is the part co-purchase graph: an undirected edge links
  * two parts that appear in the same order (the classic market-basket
  * projection of the order–part bipartite graph). Connected components
  * live in [[graft.operators.ConnectedComponents]]; this module holds the
  * oracle-checked iterative-numeric side (PageRank).
  */
object GraphQueries {

  type Q = (SparkSession, String) => DataFrame

  /** Damping factor, standard Brin–Page value. */
  val Damping = "0.85"
  val Teleport = "0.15"

  /** Contribution quantization scale: 1/deg is rounded to DECIMAL(18,12)
    * so the neighbor sum is EXACT decimal addition — order-independent
    * across any partitioning, and identical in DuckDB (both engines
    * quantize the same IEEE double; sums of decimals carry no float
    * rounding at all). */
  private val ContribDec = DecimalType(18, 12)

  /** q66: one PageRank iteration from the uniform start (r₀ = 1) over the
    * part co-purchase graph: r₁(v) = 0.15 + 0.85 · Σ_{u∈N(v)} 1/deg(u).
    *
    * Scale design: the edge list is built once from a per-order self-join
    * (bounded: ≤ a few dozen parts per order → ≤ ~10² pairs per order, no
    * quadratic blowup), degrees and neighbor sums are each ONE shuffle on
    * the node key with map-side partial aggregation, and the arithmetic
    * is exact decimal so the result is bit-stable at any cluster size.
    * Further iterations would repeat the same single-shuffle join+agg
    * with the ranks frame checkpointed per round (the CC pattern). */
  def q66PagerankStep(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val li = Tables.lineitem(s, dir)
      .select($"l_orderkey", $"l_partkey").distinct()
    val pairs = li.as("a")
      .join(li.as("b"),
        col("a.l_orderkey") === col("b.l_orderkey") &&
          col("a.l_partkey") < col("b.l_partkey"))
      .select(col("a.l_partkey").as("u"), col("b.l_partkey").as("v"))
      .distinct()
    // undirected: mirror once, then every per-node stat is one groupBy
    val edges = pairs.union(pairs.select($"v".as("u"), $"u".as("v")))
    val deg = edges.groupBy($"u").agg(count(lit(1)).as("deg"))
    val contrib = deg.select($"u",
      (lit(1.0) / $"deg").cast(ContribDec).as("c"))
    edges
      .join(contrib, Seq("u"))
      .groupBy($"v".as("part"))
      .agg(sum($"c").as("nbr_sum"))
      .select(col("part").as("l_partkey"),
        (expr(s"CAST($Teleport AS DECIMAL(18,12))") +
          expr(s"CAST($Damping AS DECIMAL(3,2))") * col("nbr_sum"))
          .cast("double").as("rank"))
      .orderBy($"l_partkey")
  }

  /** The decimal→double cast routes through VARCHAR on the DuckDB side:
    * DuckDB's direct decimal→double cast is not correctly rounded (1 ulp
    * off at ~15 significant digits), while strtod — like Spark's
    * BigDecimal.doubleValue — is. */
  val q66Sql: String =
    s"""WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
       |pairs AS (
       |  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
       |  FROM li a JOIN li b
       |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
       |edges AS (SELECT u, v FROM pairs UNION ALL SELECT v, u FROM pairs),
       |deg AS (SELECT u, COUNT(*) AS deg FROM edges GROUP BY u),
       |contrib AS (SELECT u, CAST(1.0e0 / deg AS DECIMAL(18,12)) AS c FROM deg)
       |SELECT e.v AS l_partkey,
       |  CAST(CAST(CAST('$Teleport' AS DECIMAL(18,12)) +
       |            CAST('$Damping' AS DECIMAL(3,2)) * SUM(c.c)
       |       AS VARCHAR) AS DOUBLE) AS rank
       |FROM edges e JOIN contrib c ON c.u = e.u
       |GROUP BY e.v
       |ORDER BY l_partkey""".stripMargin

  val queries: Map[String, Q] = Map(
    "q66_pagerank_step" -> (q66PagerankStep _),
  )

  val oracleSql: Map[String, String] = Map(
    "q66_pagerank_step" -> q66Sql,
  )
}
