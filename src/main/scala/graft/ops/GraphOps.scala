package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components — the clustering step of a near-dup
  * dedup pipeline (candidate pairs → duplicate clusters → one canonical doc
  * per cluster). The reference has no graph ops; this is part of the
  * training-pipeline extension surface (BASELINE.json north star).
  *
  * Hash-min label propagation: every node starts labeled with its own id and
  * repeatedly takes the min label over itself and its neighbors, so each
  * iteration is one shuffle-join + partial-aggregated `groupBy(min)` and the
  * label set converges to min(component) in diameter(component) rounds.
  * Near-dup clusters are shallow (a handful of mutually-similar docs), so
  * rounds stay low at any data size; for adversarial high-diameter graphs
  * swap the body for the large-star/small-star alternation (Kiveris et al.,
  * "Connected Components in MapReduce and Beyond", SoCC'14), which converges
  * in O(log²) rounds with the same per-round shape.
  *
  * Each round materializes through `localCheckpoint` — iterative self-joins
  * otherwise stack lineage and replan the whole history every round (on a
  * real cluster use `checkpoint` to a reliable store so recomputation after
  * executor loss doesn't cascade).
  */
object GraphOps {

  /** @param nodes one column `id` (long), every vertex
    * @param edges columns `src`, `dst` (long), one row per undirected edge
    * @return frame (id, root): root = min node id in the component */
  def connectedComponents(nodes: DataFrame, edges: DataFrame,
                          maxIter: Int = 25): DataFrame = {
    val sym = edges.select(col("src"), col("dst"))
      .union(edges.select(col("dst").as("src"), col("src").as("dst")))
      .persist()
    try {
      var labels = nodes.select(col("id"), col("id").as("root")).localCheckpoint()
      var converged = false
      var it = 0
      while (!converged && it < maxIter) {
        val nbrMin = sym.join(labels, sym("dst") === labels("id"))
          .groupBy(col("src")).agg(min(col("root")).as("nroot"))
        val next = labels.join(nbrMin, labels("id") === nbrMin("src"), "left")
          .select(labels("id"),
            least(col("root"), coalesce(col("nroot"), col("root"))).as("root"))
          .localCheckpoint()
        // labels only ever decrease: any difference means another round
        converged = next.join(labels.withColumnRenamed("root", "prev"), "id")
          .filter(col("root") =!= col("prev")).isEmpty
        labels = next
        it += 1
      }
      labels
    } finally sym.unpersist(blocking = false)
  }
}
