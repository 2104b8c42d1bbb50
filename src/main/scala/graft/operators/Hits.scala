package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** HITS (Kleinberg 1999) hubs-and-authorities in exact fixed-point
  * integer arithmetic, for a FIXED number of rounds.
  *
  * Each round: authority(i) = Σ over in-edges j→i of hub(j), then hubs
  * from the fresh authorities symmetrically; each side renormalizes to
  * an L1 mass of `scale` by integer floor division — so every score is
  * a deterministic integer, reduction order cannot perturb it, and the
  * DuckDB oracle unrolls the rounds and matches bit-for-bit (the
  * PageRank discipline applied to the TWO-SIDED propagation: PageRank
  * pushes one value along out-edges; HITS alternates two values across
  * edge directions, the mutual-reinforcement structure).
  *
  * Scale: the edge list is repartitioned on its join keys once and
  * persisted/materialized (the PageRank/LabelProp cache discipline);
  * each round costs two hash-aggregate exchanges (the authority sum on
  * dst, the hub sum on src) plus two SCALAR normalization aggregates
  * (broadcast one-row joins, no data shuffle). Score rows are two
  * longs per node.
  */
object Hits {

  /** @return (node, hub, auth) after `rounds` full (auth, hub) updates,
    *         plus a release handle for the pinned edge cache
    */
  def runWithRelease(edges: DataFrame, srcCol: String, dstCol: String,
                     rounds: Int, scale: Long = 1000000000L)
      : (DataFrame, () => Unit) = {
    require(rounds >= 1, s"need rounds >= 1, got $rounds")
    val e = edges.select(col(srcCol).cast("long").as("src"),
        col(dstCol).cast("long").as("dst"))
      .distinct()
      .repartition(col("src"))
      .persist()
    e.count()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()

    def normalize(raw: DataFrame, valCol: String): DataFrame = {
      // divide by the QUANTIZED total (tot div scale) rather than
      // multiplying raw * scale first — the multiply overflows Long
      // when raw sums span the whole edge set; the guard keeps tiny
      // fixtures (tot < scale) away from division by zero. Same
      // expression, verbatim, in the oracle.
      val total = raw.agg(sum(col(valCol)).as("__tot"))
      raw.crossJoin(broadcast(total))
        .select(col("node"),
          expr(s"$valCol div greatest(__tot div $scale, 1)").as(valCol))
    }
    // keep every node alive on both sides (zero-degree nodes score 0)
    def full(scores: DataFrame, valCol: String): DataFrame =
      nodes.join(scores, Seq("node"), "left_outer")
        .select(col("node"), coalesce(col(valCol), lit(0L)).as(valCol))

    var hub = nodes.select(col("node"), lit(scale).as("hub"))
    var auth = nodes.select(col("node"), lit(0L).as("auth"))
    for (_ <- 1 to rounds) {
      auth = full(normalize(
        e.join(hub, col("src") === col("node"))
          .groupBy(col("dst")).agg(sum(col("hub")).as("auth"))
          .withColumnRenamed("dst", "node"), "auth"), "auth")
      hub = full(normalize(
        e.join(auth, col("dst") === col("node"))
          .groupBy(col("src")).agg(sum(col("auth")).as("hub"))
          .withColumnRenamed("src", "node"), "hub"), "hub")
    }
    val out = hub.join(auth, Seq("node"))
      .select(col("node"), col("hub"), col("auth"))
    (out, () => { e.unpersist(); () })
  }

  def run(edges: DataFrame, srcCol: String, dstCol: String, rounds: Int,
          scale: Long = 1000000000L): DataFrame =
    runWithRelease(edges, srcCol, dstCol, rounds, scale)._1
}
