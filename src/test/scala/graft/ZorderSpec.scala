package graft

import org.apache.spark.sql.functions._

import graft.functions.Zorder

/** The Morton key must interleave exactly, and a Z-clustered layout must
  * turn a 2-D box predicate into partition pruning. */
class ZorderSpec extends SparkSuite {
  import spark.implicits._

  test("column expression matches the reference interleave") {
    val pts = for (x <- 0L until 32L; y <- 0L until 32L) yield (x, y)
    val got = pts.toDF("x", "y")
      .select($"x", $"y", Zorder.key($"x", $"y", 5).as("z"))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    pts.foreach { case (x, y) =>
      assert(got((x, y)) === Zorder.reference(x, y, 5), s"($x,$y)")
    }
    // spot invariants: z(0,0)=0, z(1,0)=1, z(0,1)=2, z(max,max)=2^10-1
    assert(got((0L, 0L)) === 0L)
    assert(got((1L, 0L)) === 1L)
    assert(got((0L, 1L)) === 2L)
    assert(got((31L, 31L)) === 1023L)
  }

  test("a quadrant box touches exactly a quarter of the z-cells") {
    // 4-bit grid, cells = top 4 of 8 z bits → 16 cells; the (x<8, y<8)
    // quadrant must land in exactly 4 of them — the locality property
    // that makes a z-clustered layout prunable by 2-D boxes
    val df = (for (x <- 0L until 16L; y <- 0L until 16L) yield (x, y))
      .toDF("x", "y")
      .select($"x", $"y", (Zorder.key($"x", $"y", 4) / lit(16L)).cast("long").as("cell"))
    val boxCells = df.where($"x" < 8 && $"y" < 8)
      .select($"cell").distinct().collect().map(_.getLong(0)).toSet
    assert(boxCells.size === 4, s"quadrant cells: $boxCells")
    // contrast: clustering by x alone scatters the SAME box over 8 of 16
    // single-dimension cells (x stripe of the grid)
    val xCells = df.where($"x" < 8 && $"y" < 8)
      .select((($"x" * 16 + $"y") / lit(16L)).cast("long")).distinct().count()
    assert(xCells === 8L)
  }

  test("z-clustered partitioned write prunes under a box predicate") {
    val dir = tmpDir("zorder_layout")
    val src = spark.read.parquet(s"$sf0001/lineitem.parquet")
      .select($"l_orderkey", $"l_quantity",
        pmod($"l_partkey", lit(16L)).as("x"), pmod($"l_suppkey", lit(16L)).as("y"))
      .withColumn("z_cell", (Zorder.key($"x", $"y", 4) / lit(16L)).cast("long"))
    src.write.partitionBy("z_cell").parquet(s"$dir/t")
    val table = spark.read.parquet(s"$dir/t")
    // the quadrant's 4 candidate cells, computed from the curve itself
    val cells = (for (x <- 0L until 8L; y <- 0L until 8L)
      yield Zorder.reference(x, y, 4) / 16L).toSet
    assert(cells.size === 4)
    val pruned = table.where($"z_cell".isin(cells.toSeq: _*) && $"x" < 8 && $"y" < 8)
    // partition pruning is visible in the scan: only 4 of 16 dirs read
    val scan = pruned.queryExecution.executedPlan.toString()
    assert(scan.contains("PartitionFilters"), scan)
    val filesRead = pruned.queryExecution.executedPlan.collectLeaves()
      .collect { case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.selectedPartitions.partitionCount }.sum
    assert(filesRead === 4, s"expected 4 partitions read, got $filesRead")
    // and the pruned read returns exactly the unpruned box rows
    val want = src.where($"x" < 8 && $"y" < 8).count()
    assert(pruned.count() === want)
  }
}
