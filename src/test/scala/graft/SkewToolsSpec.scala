package graft

import org.apache.spark.sql.functions._

import graft.operators.SkewTools

class SkewToolsSpec extends SparkSpec {
  import spark.implicits._

  test("saltedJoin equals the plain join on a 90%-hot-key distribution") {
    // 9000 rows on key 1, a tail on keys 2..100
    val facts = spark.range(10000).select(
      when(col("id") < 9000, 1L).otherwise(col("id") % 99 + 2).as("k"),
      col("id").as("v"))
    val dim = spark.range(101).select(col("id").as("k"),
      concat(lit("dim"), col("id")).as("name"))
    val plain = facts.join(dim, "k").select("k", "v", "name")
      .as[(Long, Long, String)].collect().toSet
    val salted = SkewTools.saltedJoin(facts, dim, "k", salts = 8)
      .select("k", "v", "name").as[(Long, Long, String)].collect().toSet
    assert(salted == plain)
    assert(plain.size == 10000)
  }

  test("the salt actually spreads the hot key across partitions") {
    val facts = spark.range(4000).select(lit(1L).as("k"), col("id").as("v"))
    val dim = Seq((1L, "one")).toDF("k", "name")
    val salted = SkewTools.saltedJoin(facts, dim, "k", salts = 8)
    // distinct salts observed on the hot key — recompute the same way
    val nSalts = facts
      .withColumn("__salt", pmod(xxhash64(struct(col("k"), col("v"))), lit(8)))
      .select("__salt").distinct().count()
    assert(nSalts == 8)
    assert(salted.count() == 4000)
  }

  test("salted plan joins on (key, salt) — no cartesian fallback") {
    val facts = spark.range(100).select((col("id") % 3).as("k"), col("id").as("v"))
    val dim = Seq((0L, "a"), (1L, "b"), (2L, "c")).toDF("k", "name")
    val plan = SkewTools.saltedJoin(facts, dim, "k", salts = 4)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"))
  }
}
