package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A/B: the V2 connector's VECTORIZED (columnar) read path vs the
  * record-API row path (VERDICT r13 #2 acceptance probe) — the same
  * snapshot table, the same bins, the only difference is the decoder.
  * Three shapes at the bench SF:
  *
  *   - full-width table scan (every column materialized through noop) —
  *     the worst case for a row materializer;
  *   - 2-column projected aggregate — the pruned-scan case;
  *   - embedding-array scan — the nested-type case.
  *
  * Parity digests first (the speedup must be of the SAME answer), then
  * N warm draws each, sentinel bracketed.
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  *     sbt -batch "Test/runMain graft.V2ReadProbe 4"
  */
object V2ReadProbe {
  def main(args: Array[String]): Unit = {
    val draws = args.headOption.map(_.toInt).getOrElse(4)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftExtensions.register(spark)

    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def sentinel(): Double = timed {
      var x = 88172645463325252L; var acc = 0L; var i = 0
      while (i < 400000000) {
        x ^= x << 13; x ^= x >>> 7; x ^= x << 17; acc += x; i += 1
      }
      if (acc == 42L) System.err.println("sentinel: improbable accumulator")
    }

    println(f"[v2readprobe] sentinel_start=${sentinel()}%.2f s sf=$sfDir " +
      s"cpus=$cpus draws=$draws")

    val tl = SparkHygiene.scratchDir("v2read_lineitem")
    graft.sources.Snapshots.commit(spark, tl, Tables.lineitem(spark, sfDir))
    val te = SparkHygiene.scratchDir("v2read_embeddings")
    graft.sources.Snapshots.commit(spark, te,
      spark.read.parquet(s"$sfDir/embeddings.parquet"))

    def load(t: String, vectorized: Boolean): DataFrame =
      spark.read.format("graft_snapshots").option("path", t)
        .option("vectorizedReader", vectorized.toString).load()

    // parity before speed: same digests on both paths
    def digest(df: DataFrame): Long =
      df.agg(expr(s"bit_xor(xxhash64(${df.columns.mkString(",")}))").as("h"))
        .head().getLong(0)
    val fullParity = digest(load(tl, true)) == digest(load(tl, false))
    val projParity =
      load(tl, true).agg(sum(col("l_quantity").cast("decimal(18,2)")))
        .head().getDecimal(0) ==
      load(tl, false).agg(sum(col("l_quantity").cast("decimal(18,2)")))
        .head().getDecimal(0)
    val embParity =
      load(te, true).select(expr("bit_xor(xxhash64(vec_id, embedding))"))
        .head().getLong(0) ==
      load(te, false).select(expr("bit_xor(xxhash64(vec_id, embedding))"))
        .head().getLong(0)
    println(s"[v2readprobe] parity full=$fullParity proj=$projParity " +
      s"emb=$embParity")

    val shapes: Seq[(String, Boolean => DataFrame)] = Seq(
      "full_scan" -> (v => load(tl, v)),
      "proj_agg" -> (v => load(tl, v)
        .groupBy(col("l_returnflag"))
        .agg(sum(col("l_quantity").cast("decimal(18,2)")).as("q"))),
      "embedding_scan" -> (v => load(te, v)))

    shapes.foreach { case (label, form) =>
      Seq(true, false).foreach { vectorized =>
        // one unmeasured priming draw, then the measured draws
        form(vectorized).write.format("noop").mode("overwrite").save()
        SparkHygiene.dropAllPersisted(spark)
        val secs = (1 to draws).map { _ =>
          val s = timed {
            form(vectorized).write.format("noop").mode("overwrite").save()
          }
          SparkHygiene.dropAllPersisted(spark)
          s
        }
        val tag = if (vectorized) "vectorized" else "row"
        println(s"[v2readprobe] $label $tag draws_sec=" +
          secs.map(s => f"$s%.2f").mkString("[", ",", "]"))
      }
    }
    println(f"[v2readprobe] sentinel_end=${sentinel()}%.2f s")
    spark.stop()
  }
}
