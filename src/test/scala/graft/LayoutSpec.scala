package graft

import graft.operators.Layout
import org.apache.spark.sql.functions._

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("saltedJoin matches plain join results on skewed keys") {
    // one hot key owns 90% of the left side
    val left = (1 to 1000).map(i => (if (i <= 900) 1 else i, s"v$i")).toDF("k", "lv")
    val right = (1 to 100).map(i => (i, s"r$i")).toDF("k", "rv")
    val plain = left.join(right, "k").select("k", "lv", "rv").collect().toSet
    val salted = Layout.saltedJoin(left, right, "k").select("k", "lv", "rv").collect().toSet
    assert(salted == plain)
    assert(salted.count(_.getInt(0) == 1) == 900)
  }

  test("bucketed tables join without a shuffle") {
    val warehouse = java.nio.file.Files.createTempDirectory("graft-wh")
    val a = (1 to 500).map(i => (i.toLong, s"a$i")).toDF("id", "av")
    val b = (1 to 500).map(i => (i.toLong, s"b$i")).toDF("id", "bv")
    Layout.writeBucketed(a, "bucketed_a", "id", 4)
    Layout.writeBucketed(b, "bucketed_b", "id", 4)
    try {
      val joined = Layout.bucketedJoin(spark, "bucketed_a", "bucketed_b", "id")
      assert(!Layout.hasShuffle(joined), "bucketed join should not shuffle")
      assert(joined.count() == 500)
      // contrast: the same join on plain frames shuffles (or broadcasts —
      // force SMJ off broadcast to observe the exchange)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try assert(Layout.hasShuffle(a.join(b, "id")))
      finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    } finally {
      spark.sql("DROP TABLE IF EXISTS bucketed_a")
      spark.sql("DROP TABLE IF EXISTS bucketed_b")
    }
  }
}
