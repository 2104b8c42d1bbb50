package graft

import org.apache.spark.sql.SparkSession

class ExtensionsSpec extends SparkSpec {

  test("SQL surface exposes the native vector expressions") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      """SELECT
        |  vector_dot(array(1.0F, 2.0F), array(3.0F, 4.0F)) AS d,
        |  vector_norm_sq(array(3.0F, 4.0F)) AS n,
        |  unit_cosine_distance(array(1.0F, 0.0F), array(0.0F, 1.0F)) AS c
        |""".stripMargin).head()
    assert(r.getDouble(0) == 11.0)
    assert(r.getDouble(1) == 25.0)
    assert(r.getDouble(2) == 1.0)
  }

  test("SQL surface exposes nfc_normalize and z_interleave") {
    GraftExtensions.register(spark)
    // registration-level check (NfcNormalizeSpec covers the
    // decomposition depth); note Spark SQL's chr() wraps mod 256, so
    // composing test input with chr(769) would silently corrupt it
    val r = spark.sql(
      s"""SELECT
         |  nfc_normalize('José') AS n,
         |  z_interleave(3L, 5L) AS z
         |""".stripMargin).head()
    assert(r.getString(0) == "José")
    // 3 = 0b011 on even bits, 5 = 0b101 on odd bits -> 0b100111 = 39
    assert(r.getLong(1) == 39L)
  }

  test("withExtensions wires the functions at session construction") {
    val prevDefault = SparkSession.getDefaultSession
    val prevActive = SparkSession.getActiveSession
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    try {
      val s2 = SparkSession.builder()
        .master("local[2]")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      val d = s2.sql("SELECT vector_dot(array(1.0F), array(5.0F)) AS d").head().getDouble(0)
      assert(d == 5.0)
    } finally {
      prevDefault.foreach(SparkSession.setDefaultSession)
      prevActive.foreach(SparkSession.setActiveSession)
    }
  }
}
