package graft

import graft.catalog.Catalog
import graft.query._
import org.apache.spark.sql.functions._

/** View-catalog semantics pinned by the reference:
  * lazy replay, self-shadowing redefinition, rename clobber
  * (firepit/sqlitestorage.py:192-218, sqlstorage.py:795-822). */
class CatalogSpec extends SparkSpec {

  test("resolve falls back to base parquet table") {
    val c = new Catalog(spark, sfDir)
    assert(c.resolve("region").count() == 5)
  }

  test("views shadow base tables and replay lazily") {
    val c = new Catalog(spark, sfDir)
    c.register("r2", GQuery.table("region", Filter(Seq(Comparison("r_regionkey", "<", RLit(2))))))
    assert(c.resolve("r2").count() == 2)
  }

  test("redefine closes over the previous definition (self-shadowing)") {
    val c = new Catalog(spark, sfDir)
    c.register("v", GQuery.table("region", Filter(Seq(Comparison("r_regionkey", "<", RLit(4))))))
    c.redefine("v")(df => df.filter(col("r_regionkey") >= 2))
    assert(c.resolve("v").select("r_regionkey").collect().map(_.getInt(0)).sorted.toSeq == Seq(2, 3))
  }

  test("redefine on an unregistered name replays the base table (no recursion)") {
    val c = new Catalog(spark, sfDir)
    c.redefine("region")(df => df.filter(col("r_regionkey") < 1))
    assert(c.resolve("region").count() == 1)
  }

  test("dependent views see upstream redefinition") {
    val c = new Catalog(spark, sfDir)
    c.register("a", GQuery.table("region"))
    c.register("b", GQuery.table("a", Filter(Seq(Comparison("r_regionkey", "<", RLit(3))))))
    assert(c.resolve("b").count() == 3)
    c.redefine("a")(df => df.filter(col("r_regionkey") > 0))
    assert(c.resolve("b").count() == 2)
  }

  test("rename clobbers target and preserves definition") {
    val c = new Catalog(spark, sfDir)
    c.register("x", GQuery.table("region", Filter(Seq(Comparison("r_regionkey", "<", RLit(2))))))
    c.register("y", GQuery.table("region"))
    c.renameView("x", "y")
    assert(!c.contains("x"))
    assert(c.resolve("y").count() == 2)
  }

  test("invalid view names raise InvalidViewname") {
    val c = new Catalog(spark, sfDir)
    intercept[graft.api.InvalidViewname] {
      c.register("bad name; drop", GQuery.table("region"))
    }
  }

  test("appdata round-trips") {
    val c = new Catalog(spark, sfDir)
    c.register("v", GQuery.table("region"))
    c.setAppData("v", """{"k":1}""")
    assert(c.getAppData("v").contains("""{"k":1}"""))
  }
}
