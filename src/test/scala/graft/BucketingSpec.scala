package graft

import org.apache.spark.sql.functions._

import graft.io.Bucketing

class BucketingSpec extends SparkSuite {
  import spark.implicits._

  test("bucketed co-located join has no shuffle; unbucketed join does") {
    val li = Tables.lineitem(spark, sf0001)
    val o = Tables.orders(spark, sf0001)
    for (t <- Seq("li_b", "o_b")) {
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(s"spark-warehouse/$t")
      if (loc.exists()) {
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
        }
        rm(loc)
      }
    }
    Bucketing.writeBucketed(li, "li_b", "l_orderkey", 4)
    Bucketing.writeBucketed(o, "o_b", "o_orderkey", 4)

    // bucketed join: zero exchanges (bucket layout satisfies the join's
    // distribution requirement on both sides)
    assert(countShuffles(
      Bucketing.cotableJoin(spark, "li_b", "o_b", "l_orderkey", "o_orderkey")) == 0)

    // control: same join on raw parquet shuffles both sides
    withSQLConf("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      assert(countShuffles(li.join(o, li("l_orderkey") === o("o_orderkey"))) == 2)
    }

    // values identical
    assert(Bucketing.cotableJoin(spark, "li_b", "o_b", "l_orderkey", "o_orderkey").count() ==
      li.join(o, li("l_orderkey") === o("o_orderkey")).count())

    // bucketed group-by on the bucket key also avoids the exchange
    assert(countShuffles(
      spark.table("li_b").groupBy($"l_orderkey").agg(sum($"l_quantity"))) == 0)
  }
}
