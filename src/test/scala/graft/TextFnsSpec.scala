package graft

import org.apache.spark.sql.functions._

import graft.functions.TextFns

class TextFnsSpec extends SparkSpec {
  import spark.implicits._

  private def one(c: org.apache.spark.sql.Column, input: String): String =
    Seq(input).toDF("s").select(c.as("r")).head().getString(0)

  test("P2 cleanText: &quot; unescape then strip outside [:a-zA-Z0-9\\s\"'-]") {
    val col0 = TextFns.cleanText(col("s"))
    assert(one(col0, "He said &quot;hi&quot;!") == "He said \"hi\"")
    assert(one(col0, "José, café & 1:2 — ok") == "Jos caf  1:2  ok")
    assert(one(col0, "keep-hyphen 'quote'") == "keep-hyphen 'quote'")
  }

  test("P3 removeTags: strips markup and unescapes entities") {
    val c = TextFns.removeTags(col("s"))
    assert(one(c, "<p>a &amp; b</p><br/>") == "a & b")
    assert(one(c, "x &lt;tag&gt; &quot;q&quot; &#39;s&apos;") == "x <tag> \"q\" 's'")
  }

  test("token counts: whitespace and subword-regex") {
    val df = Seq("hello world  again", "a-b c3d!").toDF("s")
      .select(
        TextFns.tokenCountWs(col("s")).as("ws"),
        TextFns.tokenCountRegex(col("s")).as("sub"))
    val rows = df.collect().map(r => (r.getInt(0), r.getInt(1)))
    assert(rows(0) == ((3, 3)))
    // a,-,b,c,3,d,! → 7 subword tokens; 2 ws tokens
    assert(rows(1) == ((2, 7)))
  }

  test("fingerprint is case/whitespace-insensitive, distinct for distinct text") {
    val df = Seq("Hello  World", "  hello world ", "other").toDF("s")
      .select(TextFns.fingerprint(col("s")).as("fp"))
    val fps = df.collect().map(_.getString(0))
    assert(fps(0) == fps(1))
    assert(fps(0) != fps(2))
  }

  test("langId picks marker-argmax with fixed tie order, und when no hits") {
    val c = TextFns.langId(col("s"))
    assert(one(c, "the cat and the dog is that with") == "en")
    assert(one(c, "der hund und die katze ist nicht ein") == "de")
    assert(one(c, "le chat et la maison est une que") == "fr")
    assert(one(c, "el gato es una casa por como los") == "es")
    assert(one(c, "xyzzy plugh qwerty") == "und")
  }

  test("qualityScore stays in [0,1] and rewards clean english text") {
    val df = Seq(
      "The quick brown fox jumps over the lazy dog and runs to the forest " * 8,
      "@@@@ #### $$$$ %%%%").toDF("s")
      .select(TextFns.qualityScore(col("s")).as("q"))
    val qs = df.collect().map(_.getDouble(0))
    assert(qs.forall(q => q >= 0.0 && q <= 1.0))
    assert(qs(0) > qs(1))
  }

  test("shingles: char 3-grams and word 2-grams are distinct sets") {
    val ch = Seq("abcab").toDF("s")
      .select(TextFns.charShingles(col("s"), 3).as("r")).head().getSeq[String](0)
    assert(ch == Seq("abc", "bca", "cab"))
    val w = Seq("a b a b").toDF("s")
      .select(TextFns.wordShingles(col("s"), 2).as("r")).head().getSeq[String](0)
    assert(w == Seq("a b", "b a"))
  }

  test("P5 extractEntities keeps names at/above threshold, renders prefix") {
    val df = spark.sql(
      """SELECT array(named_struct('name', 'Apple', 'relevance', 0.9D),
        |             named_struct('name', 'Pear', 'relevance', 0.5D)) AS ents""".stripMargin)
      .select(TextFns.extractEntities(col("ents"), "name", 0.8, "Organizations").as("r"))
    assert(df.head().getString(0) == "Organizations: Apple")
  }

  test("training-curation signals: repetition, mean word length, symbols, redact") {
    val rep = TextFns.repetitionRatio(col("s"), 2)
    // "a b a b a b": bigrams = [a b, b a, a b, b a, a b] → 2 distinct / 5
    val r = Seq("a b a b a b").toDF("s").select(rep.as("r")).head().getDouble(0)
    assert(math.abs(r - 0.6) < 1e-9)
    assert(one(TextFns.redact(col("s")),
      "mail bob@x.co and see https://a.b/c?d=1 now") == "mail <EMAIL> and see <URL> now")
    val mw = Seq("ab abcd").toDF("s")
      .select(TextFns.meanWordLength(col("s"))).head().getDouble(0)
    assert(mw == 3.0)
    val sym = Seq("ab$%").toDF("s")
      .select(TextFns.symbolRatio(col("s"))).head().getDouble(0)
    assert(sym == 0.5)
  }

  test("P6 concatForEmbedding joins with newlines, skips nulls") {
    val df = Seq(("t", null: String, "b")).toDF("a", "b", "c")
      .select(TextFns.concatForEmbedding(col("a"), col("b"), col("c")).as("r"))
    assert(df.head().getString(0) == "t\nb")
  }

  test("TokenSimHash matches the portable per-bit SQL formulation") {
    val docs = Seq((1L, "alpha beta gamma alpha"), (2L, "x")).toDF("doc_id", "text")
    val native = docs
      .withColumn("__toks", split(lower(trim(col("text"))), "\\s+"))
      .select(col("doc_id"), TextFns.simHash(col("__toks"), 32).as("sim"))
    val toks = docs.select(col("doc_id"),
      explode(split(lower(trim(col("text"))), "\\s+")).as("t"))
      .withColumn("h", md5(col("t")))
    val bitSums = (0 until 32).map(j => sum(expr(
      s"((instr('0123456789abcdef', substring(h, ${j / 4 + 1}, 1)) - 1) " +
        s"div ${1 << (j % 4)}) % 2 * 2 - 1")).as(s"s$j"))
    val sim = (0 until 32).map(j =>
      when(col(s"s$j") > 0, lit(1L << j)).otherwise(lit(0L))).reduce(_ + _)
    val sql = toks.groupBy(col("doc_id")).agg(bitSums.head, bitSums.tail: _*)
      .select(col("doc_id"), sim.as("sim"))
    assert(native.orderBy("doc_id").collect().toSeq ==
      sql.orderBy("doc_id").collect().toSeq)
  }

  test("MinHashShingles matches explode + seeded-md5 min aggregation") {
    val docs = Seq((1L, "a b c d e"), (2L, "one two")).toDF("doc_id", "text")
    val native = docs
      .withColumn("__toks", TextFns.repetitionTokens(col("text")))
      .select(col("doc_id"), TextFns.minHashShingles(col("__toks"), 3, 4).as("mhs"))
    val sh = docs
      .withColumn("__toks", TextFns.repetitionTokens(col("text")))
      .select(col("doc_id"),
        explode(TextFns.wordShinglesTokens(col("__toks"), 3)).as("sh"))
    val sigCols = (0 until 4).map(i =>
      min(md5(concat(lit(i.toString), lit(":"), col("sh")))).as(s"mh$i"))
    val sql = sh.groupBy(col("doc_id")).agg(sigCols.head, sigCols.tail: _*)
      .select(col("doc_id"),
        array((0 until 4).map(i => col(s"mh$i")): _*).as("mhs"))
    assert(native.orderBy("doc_id").collect().map(_.getSeq[String](1)).toSeq ==
      sql.orderBy("doc_id").collect().map(_.getSeq[String](1)).toSeq)
  }
}
