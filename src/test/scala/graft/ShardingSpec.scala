package graft

import org.apache.spark.sql.functions._

import graft.operators.Sharding

/** Shard-shuffle semantics: a reproducible permutation (every row
  * exactly once, dense 1..n positions per shard), roughly uniform shard
  * sizes from the md5 key, and the 100 TB plan property — one hash
  * exchange on the shard id, never a global sort's range exchange.
  */
class ShardingSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("every row lands exactly once with dense per-shard positions; " +
    "layout is deterministic and seed-sensitive") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val n = docs.count()
    val out = Sharding.shuffleShards(docs, "doc_id", nShards = 8).persist()
    assert(out.count() == n)
    assert(out.select(col("doc_id")).distinct().count() == n, "a permutation")
    // dense 1..size positions per shard
    val bad = out.groupBy(col("shard"))
      .agg(count(lit(1)).as("sz"), max(col("pos")).as("mx"), min(col("pos")).as("mn"))
      .filter(col("mx") =!= col("sz") || col("mn") =!= 1).count()
    assert(bad == 0, "positions must be dense 1..size within each shard")
    // md5 balance: no shard more than 2x the mean on the fixture
    val sizes = out.groupBy(col("shard")).count()
      .select(col("count")).collect().map(_.getLong(0))
    assert(sizes.length == 8 && sizes.max <= 2 * (n / 8),
      s"shard skew beyond md5-uniform expectation: ${sizes.mkString(",")}")
    val again = Sharding.shuffleShards(docs, "doc_id", nShards = 8)
    assert(out.exceptAll(again).isEmpty && again.exceptAll(out).isEmpty,
      "layout must be deterministic")
    val reseeded = Sharding.shuffleShards(docs, "doc_id", nShards = 8, seed = "other")
    assert(out.exceptAll(reseeded).count() > 0,
      "a different seed must produce a different permutation")
    out.unpersist()
  }

  test("plan is one hash exchange on shard + local sort — no range " +
    "exchange (global sort) anywhere") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val df = Sharding.shuffleShards(docs, "doc_id", nShards = 8)
    df.collect() // finalize AQE
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("hashpartitioning(__shard"),
      s"expected the shard hash exchange:\n$p")
    assert(!p.toLowerCase.contains("rangepartitioning"),
      s"global sort exchange in the shard plan:\n$p")
  }
}
