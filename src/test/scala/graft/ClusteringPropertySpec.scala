package graft

import scala.util.Random

import org.apache.spark.sql.Row

import graft.operators.Clustering
import graft.schemas.Schemas

/** Property test (SURVEY §5.2): for randomly planted geometries, the
  * engine's incremental partition must equal a brute-force single-linkage
  * oracle (union-find over all pairwise distances ≤ ε) computed in-test —
  * across multiple micro-batch splits of the same data.
  */
class ClusteringPropertySpec extends SparkSpec {
  import spark.implicits._

  private val dim = 16
  private val eps = 0.10

  private def emptyPool =
    spark.createDataFrame(spark.sparkContext.emptyRDD[Row], Schemas.pool)

  private def randomUnit(rnd: Random): Array[Double] = {
    val v = Array.fill(dim)(rnd.nextGaussian())
    val n = math.sqrt(v.map(x => x * x).sum)
    v.map(_ / n)
  }

  private def jitter(base: Array[Double], rnd: Random, scale: Double): Array[Float] = {
    val v = base.map(x => x + rnd.nextGaussian() * scale)
    val n = math.sqrt(v.map(x => x * x).sum)
    v.map(x => (x / n).toFloat)
  }

  /** Brute-force single-linkage over FLOAT vectors with the engine's
    * incremental semantics: distances are evaluated against the evolving
    * POOL (centroid-collapsed per batch), exactly like
    * `process_records.py:344-354` — so the oracle replays batches too,
    * but with plain in-memory union-find instead of DataFrames.
    */
  private def oracle(batches: Seq[Seq[(String, Array[Float])]]): Set[Set[String]] = {
    // pool entry: (members, centroid as double array)
    var pool = Vector.empty[(Vector[String], Array[Double])]
    for (batch <- batches) {
      val entries = pool ++ batch.map { case (id, v) =>
        (Vector(id), v.map(_.toDouble))
      }
      val nOld = pool.size
      val parent = Array.tabulate(entries.size)(identity)
      def find(i: Int): Int = if (parent(i) == i) i else { parent(i) = find(parent(i)); parent(i) }
      def union(i: Int, j: Int): Unit = { val (a, b) = (find(i), find(j)); if (a != b) parent(math.max(a, b)) = math.min(a, b) }
      for {
        i <- nOld until entries.size // new × (pool ∪ new), like the engine
        j <- 0 until entries.size
        if i != j
      } {
        val d = 1.0 - entries(i)._2.zip(entries(j)._2).map { case (x, y) => x * y }.sum
        if (math.min(math.max(d, 0.0), 1.0) <= eps) union(i, j)
      }
      pool = entries.indices.groupBy(find).toVector.sortBy(_._1).map { case (_, idxs) =>
        val members = idxs.sorted.flatMap(entries(_)._1).toVector
        val centroid = idxs.map(entries(_)._2)
          .reduce((a, b) => a.zip(b).map(t => t._1 + t._2))
          .map(_ / idxs.size)
        (members, centroid)
      }
    }
    pool.map(_._1.toSet).toSet
  }

  test("engine partition equals the in-test single-linkage oracle over random seeds") {
    for (seed <- Seq(7, 21, 99)) {
      val rnd = new Random(seed)
      val centers = Seq.fill(4)(randomUnit(rnd))
      val points = for {
        (c, g) <- centers.zipWithIndex
        i <- 0 until (3 + rnd.nextInt(4))
      } yield (f"s${seed}g${g}i$i", jitter(c, rnd, 0.015))

      // 3 micro-batches, round-robin split
      val batches = points.zipWithIndex.groupBy(_._2 % 3).toSeq.sortBy(_._1)
        .map(_._2.map(_._1))

      var pool = emptyPool
      for (b <- batches)
        pool = Clustering.step(pool, vecBatch(b: _*)).pool
      val got = pool.select("article_ids").as[Seq[String]].collect()
        .map(_.toSet).toSet

      assert(got == oracle(batches), s"partition mismatch at seed $seed")
    }
  }
}
