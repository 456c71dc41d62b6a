package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph analytics over edge frames — the reference graph a STIX corpus
  * carries (`__reflist` rows + scalar `*_ref` columns) is a directed graph
  * over SCO ids, and ranking its nodes is the classic "which
  * address/process is structurally central in this hunt" signal.
  */
object Graph {

  /** Damped PageRank, fixed iteration count. Simplified standard form: no
    * dangling-mass redistribution (sink-leaked mass just contracts the
    * total — ranking order is unaffected for the hub-detection use), and
    * ranks round to 9dp per iteration so the iterate is cross-engine
    * reproducible (the kmeansCentroids rationale: unrounded partial-sum
    * noise would compound across iterations).
    *
    * Scale shape per iteration: one (edge ⋈ outdeg ⋈ rank) join keyed on
    * src, one contribution sum keyed on dst — both hash-partitioned on node
    * ids, rank state is nodes-sized (≪ edges). The loop builds a linear
    * lazy DAG; at cluster scale checkpoint `ranks` every few iterations,
    * exactly as the k-means scaladoc prescribes for iterative plans. */
  def pageRank(
      edges: DataFrame,
      iters: Int = 3,
      damping: Double = 0.85,
      srcCol: String = "src",
      dstCol: String = "dst"): DataFrame = {
    val e = edges
      .select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .where(col("src").isNotNull && col("dst").isNotNull)
      .distinct()
    val nodes = e.select(col("src").as("id")).union(e.select(col("dst").as("id"))).distinct()
    val nn = broadcast(nodes.agg(count(lit(1)).as("n")))
    val outdeg = e.groupBy("src").agg(count(lit(1)).as("outdeg"))
    var ranks = nodes.crossJoin(nn).select(col("id"), round(lit(1.0) / col("n"), 9).as("rank"))
    (1 to iters).foreach { _ =>
      val contribs = e
        .join(outdeg, "src")
        .join(ranks.select(col("id").as("src"), col("rank")), "src")
        .select(col("dst").as("id"), (col("rank") / col("outdeg")).as("c"))
        .groupBy("id")
        .agg(sum(col("c")).as("s"))
      ranks = nodes
        .crossJoin(nn)
        .join(contribs, Seq("id"), "left_outer")
        .select(
          col("id"),
          round(
            lit(1.0 - damping) / col("n") + lit(damping) * coalesce(col("s"), lit(0.0)),
            9).as("rank"))
    }
    ranks.select(col("id"), round(col("rank"), 6).as("rank"))
  }
}
