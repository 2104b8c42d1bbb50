package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{TextFns, VectorFns}
import graft.operators.{Summarize, TemporalJoins}

object TextQueries {

  private def stopList: String = OracleSqlParts.stopList

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // token counting (whitespace + BPE-ish subword regex)
    "t1_token_stats" -> ((s, dir) =>
      Tables.documents(s, dir).select(
        col("doc_id"),
        TextFns.tokenCountWs(col("text")).cast("long").as("n_ws"),
        TextFns.tokenCountRegex(col("text")).cast("long").as("n_sub"))
        .orderBy(col("doc_id"))),

    // Unicode NFC canonicalization (functions/NfcNormalizeExpr — a
    // native codegen Expression; Spark has no built-in): step zero of
    // a web-corpus pipeline, because decomposed accents make the same
    // glyph a DIFFERENT string to every fingerprint/shingle/tokenizer
    // downstream. The corpus is ASCII, so decomposed/composed pairs
    // are injected (the p2 convention); `changed` pins that the
    // transform fires exactly where it should. DuckDB's nfc_normalize
    // implements the same Unicode algorithm — the oracle row checks
    // canonical-composition agreement codepoint-for-codepoint.
    "t27_nfc_normalize" -> ((s, dir) => {
      import s.implicits._
      val extras = Seq(
        (-5L, "s\u0323\u0307 dots"), // s + dot-below + dot-above -> composed
        (-4L, "\u1e69 s-dot"),        // already composed
        (-3L, "A\u030a ring"),        // A + combining ring -> composed
        (-2L, "Jos\u00e9 caf\u00e9"),  // already NFC
        (-1L, "Jose\u0301 cafe\u0301") // decomposed acute accents
      ).toDF("doc_id", "text")
      Tables.documents(s, dir).select(col("doc_id"), col("text"))
        .unionByName(extras)
        .select(col("doc_id"),
          graft.functions.NfcNormalizeExpr(col("text")).as("norm"),
          (col("text") =!= graft.functions.NfcNormalizeExpr(col("text")))
            .as("changed"))
        .orderBy(col("doc_id"))
    }),

    // Count-min-sketch heavy hitters (operators/CmsSketch): token
    // frequency screening at sketch cost — the d×256 counter matrix is
    // a RELATIONAL aggregate (partial aggregation collapses each map
    // partition to ≤ d·256 cells before the exchange, so the token
    // stream never shuffles; merge is the aggregate's own sum). The
    // report probes the top-30 exact tokens against the sketch and
    // pins the CMS guarantee per row: est_n ≥ exact_n always (`over`
    // — collisions only inflate). md5-derived cells replay exactly in
    // the oracle, which rebuilds sketch AND estimates from scratch.
    "t28_cms_heavy" -> ((s, dir) => {
      val toks = Tables.documents(s, dir)
        .select(explode(split(lower(trim(col("text"))), "\\s+")).as("tok"))
        .filter(length(col("tok")) > 0)
      val cells = graft.operators.CmsSketch.build(toks, "tok", d = 4)
      val top = toks.groupBy(col("tok")).agg(count(lit(1)).as("exact_n"))
        .orderBy(col("exact_n").desc, col("tok")).limit(30)
      graft.operators.CmsSketch.estimate(top, cells, "tok", d = 4)
        .join(broadcast(top), "tok")
        .select(col("tok"), col("exact_n"), col("est_n"),
          (col("est_n") >= col("exact_n")).as("over"))
        .orderBy(col("exact_n").desc, col("tok"))
    }),

    // THE COMPOSED CURATION PIPELINE — the training-data flagship: NFC
    // normalize → tokenize → length gate → quality gate → exact dedup
    // (keep-first) → decontaminate against the eval set → deterministic
    // shard assignment, all as ONE dataflow. Every stage reuses the
    // unit-operator formulation its own oracle row already proves
    // (t27/t1/t2/d1/d7/t14 conventions), and the DuckDB oracle replays
    // the ENTIRE chain — the composition is verified end-to-end, not
    // just stage-by-stage. Plan shape at 100 TB: normalize/tokenize/
    // gates fuse into the scan projection (zero exchanges), the dedup
    // pays one fingerprint exchange, decontamination explodes shingles
    // map-side against the BROADCAST eval-set shingles (the corpus
    // never shuffles for it, d7's shape), and the shard key is pure
    // md5 arithmetic — four exchanges end to end (fingerprint window,
    // contaminated-id distinct, the tiny eval-shingle distinct, the
    // report sort), and document text crosses only the fingerprint
    // one. Contamination is computed from the RAW corpus, not the
    // survivors: the result is identical (anti join against a superset
    // of contaminated ids) and it keeps the dedup subtree from being
    // planned twice — PlanSpec pins the exchange census.
    "t29_curation_pipeline" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val norm = docs.select(col("doc_id"), col("lang"),
        graft.functions.NfcNormalizeExpr(col("text")).as("norm"))
      val gated = norm
        .withColumn("__toks", TextFns.lowerTokens(col("norm")))
        .withColumn("n_toks", size(col("__toks")).cast("long"))
        .filter(col("n_toks") >= 20 && col("n_toks") <= 1000)
        .withColumn("quality",
          TextFns.qualityScoreTokens(col("norm"), col("__toks")))
        .filter(col("quality") > 0.5)
      val w = Window.partitionBy(col("fp")).orderBy(col("doc_id"))
      val deduped = gated
        .withColumn("fp", TextFns.fingerprint(col("norm")))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
      // d7 convention: doc_id % 50 == 0 is the held-out eval set; its
      // docs never enter the corpus, and any candidate sharing a
      // 5-gram shingle with it is dropped (5, not d7's 3: short grams
      // over-fire on templated text — measured 98% false contamination
      // at sf0.1 with 3-grams vs the realistic ~3% at 5; production
      // decontamination uses 8-13-gram overlap for the same reason)
      // MATERIALIZE the token array before shingling (the TextFns
      // contract, same as d7): feeding wordShingles the raw expression
      // re-evaluates the regexp split once per gram reference —
      // measured 15.7 s vs 0.8 s for this stage at sf0.1
      val shSrc = norm.withColumn("__rtoks",
        TextFns.repetitionTokens(col("norm")))
      val evalSh = shSrc.filter(col("doc_id") % 50 === 0)
        .select(explode(TextFns.wordShinglesTokens(col("__rtoks"), 5)).as("sh"))
        .distinct()
      val contaminated = shSrc.filter(col("doc_id") % 50 =!= 0)
        .select(col("doc_id"),
          explode(TextFns.wordShinglesTokens(col("__rtoks"), 5)).as("sh"))
        .join(broadcast(evalSh), "sh")
        .select(col("doc_id")).distinct()
      deduped.filter(col("doc_id") % 50 =!= 0)
        .join(contaminated, Seq("doc_id"), "left_anti")
        .select(col("doc_id"), col("lang"), col("n_toks"), col("quality"),
          (conv(substring(md5(concat(lit("shard:"),
              col("doc_id").cast("string"))), 1, 15), 16, 10)
            .cast("long") % 8).as("shard"))
        .orderBy(col("doc_id"))
    }),

    // Data-quality CONSTRAINT AUDIT (the Deequ/dbt-test shape): every
    // ingestion gate a production pipeline runs before accepting a
    // corpus drop — row count, key uniqueness, completeness, domain
    // bounds — computed in ONE aggregation pass (a naive audit runs
    // one scan per constraint; this is one scan + one single-row
    // exchange, plus countDistinct's expand), then melted into one row
    // per constraint with its pass verdict. The report IS the gate: a
    // scheduler keys the load/no-load decision off `ok`.
    "t31_constraint_audit" -> ((s, dir) => {
      val a = Tables.documents(s, dir).agg(
        count(lit(1)).as("n_rows"),
        countDistinct(col("doc_id")).as("n_ids"),
        count(when(col("text").isNull ||
          length(trim(col("text"))) === 0, 1)).as("n_empty_text"),
        count(when(col("lang").isNull, 1)).as("n_null_lang"),
        count(when(col("source").isNull, 1)).as("n_null_source"),
        min(length(col("text"))).cast("long").as("min_len"),
        max(length(col("text"))).cast("long").as("max_len"))
      def c(name: String, value: org.apache.spark.sql.Column,
            ok: org.apache.spark.sql.Column) =
        struct(lit(name).as("check_name"), value.cast("long").as("value"),
          ok.as("ok"))
      a.select(explode(array(
          c("row_count_positive", col("n_rows"), col("n_rows") > 0),
          c("doc_id_unique", col("n_ids"), col("n_ids") === col("n_rows")),
          c("text_nonempty", col("n_empty_text"), col("n_empty_text") === 0),
          c("lang_complete", col("n_null_lang"), col("n_null_lang") === 0),
          c("source_complete", col("n_null_source"), col("n_null_source") === 0),
          c("min_len_bound", col("min_len"), col("min_len") >= 1),
          c("max_len_bound", col("max_len"), col("max_len") <= 5000))).as("r"))
        .select(col("r.check_name").as("check_name"), col("r.value").as("value"),
          col("r.ok").as("ok"))
        .orderBy(col("check_name"))
    }),

    // Per-group feature normalization — the z-score every
    // feature-engineering pass ships (normalize a numeric column within
    // its language group). PORTABLE BY CONSTRUCTION: mean and variance
    // come from exact integer sums (n, Σx, Σx² in bigint — n_chars ≤
    // ~10³ keeps Σx² far inside long range), combined in a fixed
    // double-arithmetic order (each op exactly rounded → bit-identical
    // on both engines), never from stddev_samp whose streaming update
    // order is engine-internal. One groupBy(lang) aggregate (tiny —
    // #languages rows) broadcast back onto the scan: one exchange of
    // the aggregate only, the corpus never shuffles.
    "t26_group_zscore" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val stats = docs.groupBy(col("lang")).agg(
        count(lit(1)).as("n"),
        sum(col("n_chars")).as("sx"),
        sum(col("n_chars") * col("n_chars")).as("sxx"))
      docs.join(broadcast(stats), "lang")
        .select(col("doc_id"), col("lang"), col("n_chars"),
          round(
            (col("n_chars").cast("double") -
              col("sx").cast("double") / col("n").cast("double")) /
            sqrt((col("sxx").cast("double") -
              col("sx").cast("double") * col("sx").cast("double") /
                col("n").cast("double")) /
              (col("n").cast("double") - lit(1.0))), 6).as("zscore"))
        .orderBy(col("doc_id"))
    }),

    // quality scoring (length/alpha/stopword blend)
    "t2_quality" -> ((s, dir) =>
      Tables.documents(s, dir)
        .withColumn("__toks", TextFns.lowerTokens(col("text")))
        .select(
          col("doc_id"),
          TextFns.qualityScoreTokens(col("text"), col("__toks")).as("quality"))
        .orderBy(col("doc_id"))),

    // per-source quality cap (domain rebalancing): keep each source's
    // top-10 documents by quality — the CC-pipeline curation step that
    // stops boilerplate-heavy hosts dominating a corpus. One hash
    // shuffle on the source key + one window pass; the rank orders by
    // the ROUNDED score with a doc_id tie-break (portable-ranking
    // convention, file header). Catalyst plans the rank<=cap filter as
    // a map-side WindowGroupLimit BELOW the exchange (PlanSpec-pinned),
    // so each input partition ships at most cap rows per source — a hot
    // host cannot flood a shuffle partition at 100 TB.
    "t17_source_cap" -> ((s, dir) => {
      val byQuality = Window.partitionBy(col("source"))
        .orderBy(col("quality").desc, col("doc_id").asc)
      Tables.documents(s, dir)
        .withColumn("__toks", TextFns.lowerTokens(col("text")))
        .select(col("doc_id"), col("source"),
          TextFns.qualityScoreTokens(col("text"), col("__toks")).as("quality"))
        .withColumn("rank_in_source", row_number().over(byQuality).cast("long"))
        .filter(col("rank_in_source") <= 10)
        .orderBy(col("doc_id"))
    }),

    // language-ID heuristic
    "t3_lang_id" -> ((s, dir) =>
      Tables.documents(s, dir)
        .withColumn("__toks", TextFns.lowerTokens(col("text")))
        .select(
          col("doc_id"),
          TextFns.langIdTokens(col("__toks")).as("lang_guess"))
        .orderBy(col("doc_id"))),

    // P3 HTML strip + entity unescape round-trip (documents carry no
    // markup, so the query injects tags/entities deterministically)
    "p3_remove_tags" -> ((s, dir) =>
      Tables.documents(s, dir).select(
        col("doc_id"),
        TextFns.removeTags(
          concat(lit("<p>"), col("text"), lit("</p> &amp; <br/>"))).as("stripped"))
        .orderBy(col("doc_id"))),

    // P6 concat-for-embedding
    "p6_concat" -> ((s, dir) =>
      Tables.documents(s, dir).select(
        col("doc_id"),
        TextFns.concatForEmbedding(col("lang"), col("source"), col("text")).as("joined"))
        .orderBy(col("doc_id"))),

    // P5 relevance-threshold entity extraction over constructed
    // array<struct{name, relevance}> input
    "p5_entities" -> ((s, dir) =>
      Tables.documents(s, dir).select(
        col("doc_id"),
        TextFns.extractEntities(
          array(
            struct(col("source").as("name"), lit(null).cast("string").as("long_name"),
              (col("n_chars") / lit(500.0)).as("relevance")),
            struct(col("lang").as("name"), lit(null).cast("string").as("long_name"),
              lit(0.9).as("relevance"))),
          "name", 0.8, "Entities").as("entities"))
        .orderBy(col("doc_id"))),

    // P12 LLM-output tag extraction with the raw-text fallback branch
    // exercised on every 7th doc
    "p12_parse_tags" -> ((s, dir) => {
      val d = Tables.documents(s, dir)
      val llm = when(col("doc_id") % 7 === 0, substring(col("text"), 1, 50))
        .otherwise(concat(
          lit("<title>"), substring(col("text"), 1, 30), lit("</title><summary>"),
          substring(col("text"), 1, 120), lit("</summary>")))
      d.select(
        col("doc_id"),
        when(llm.rlike("(?s)<title>.*?</title>"),
          regexp_extract(llm, "(?s)<title>(.*?)</title>", 1))
          .otherwise(lit("<Title>")).as("description"),
        when(llm.rlike("(?s)<summary>.*?</summary>"),
          regexp_extract(llm, "(?s)<summary>(.*?)</summary>", 1))
          .otherwise(llm).as("generated_summary"))
        .orderBy(col("doc_id"))
    }),

    // S3 + P10: base64 envelope decode → JSON parse with malformed-skip
    // (every 13th record is truncated mid-object and must drop out)
    "p10_base64_json" -> ((s, dir) => {
      val js = concat(lit("{\"id\":"), col("doc_id"), lit(",\"title\":\""),
        substring(col("text"), 1, 20), lit("\"}"))
      val corrupted = when(col("doc_id") % 13 === 0, substring(js, 1, 10)).otherwise(js)
      val env = Tables.documents(s, dir)
        .select(base64(corrupted.cast("binary")).as("env"))
      val decoded = env.select(graft.operators.Ingest.decodeBase64(col("env")).as("js"))
      graft.operators.Ingest.parseJson(decoded, "js",
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("title", org.apache.spark.sql.types.StringType))))
        .select(col("id"), col("title")).orderBy(col("id"))
    }),

    // CSV ROUND-TRIP — source-format breadth beyond parquet: write the
    // corpus (plus injected rows carrying the CSV-hostile characters —
    // embedded quotes, commas, NEWLINES — the testdata itself lacks)
    // through Spark's CSV writer, read it back with an explicit schema
    // + multiLine + escape, and the result must equal the logical
    // input row-for-row (the oracle pins the VALUES, so writer and
    // reader must agree on quoting/escaping exactly). multiLine is the
    // cost to know: a quoted-newline CSV cannot split inside records,
    // so files parse whole — at 100 TB you keep newline-free encodings
    // (or JSONL/parquet) precisely to keep scans splittable.
    "p16_csv_roundtrip" -> ((s, dir) => {
      import s.implicits._
      val hostile = Seq(
        (-3L, "comma, \"quoted\", and\nnewline mix", "zz"),
        (-2L, "line one\nline two\nline three", "yy"),
        (-1L, "plain, with commas, only", "xx")
      ).toDF("doc_id", "text", "lang")
      val src = Tables.documents(s, dir)
        .select(col("doc_id"), col("text"), col("lang"))
        .unionByName(hostile)
      val out = SparkHygiene.scratchDir("p16_csv")
      src.write.mode("overwrite").option("header", "true")
        .option("escape", "\"").csv(out)
      s.read.option("header", "true").option("escape", "\"")
        .option("multiLine", "true")
        .schema("doc_id LONG, text STRING, lang STRING")
        .csv(out)
        .orderBy(col("doc_id"))
    }),

    // JSONL ROUND-TRIP — the text-format sibling of p16 with the
    // OPPOSITE splittability trade: JSON escapes newlines inside
    // strings (\n), so the file stays one-record-per-line and scans
    // split freely — which is why JSONL is the interchange format of
    // training-data pipelines. Same hostile rows plus non-ASCII; the
    // read uses the pinned schema (no inference pass over 100 TB).
    "p17_jsonl_roundtrip" -> ((s, dir) => {
      import s.implicits._
      val hostile = Seq(
        (-3L, "quotes \" and \\ backslash", "zz"),
        (-2L, "line one\nline two", "yy"),
        (-1L, "José «café» — ünïcode", "xx")
      ).toDF("doc_id", "text", "lang")
      val src = Tables.documents(s, dir)
        .select(col("doc_id"), col("text"), col("lang"))
        .unionByName(hostile)
      val out = SparkHygiene.scratchDir("p17_jsonl")
      src.write.mode("overwrite").json(out)
      s.read.schema("doc_id LONG, text STRING, lang STRING").json(out)
        .orderBy(col("doc_id"))
    }),

    // ORC ROUND-TRIP — the third interchange format (p16 CSV, p17
    // JSONL): the OTHER columnar container a lake migration meets.
    // Binary-safe by design (no quoting/escaping layer at all — the
    // hostile control/quote/unicode payloads pass through untouched),
    // splittable by stripe, and its min/max stripe statistics serve
    // predicate pushdown exactly like parquet's row groups. Pinned
    // schema on read; oracle = the logical input.
    "p18_orc_roundtrip" -> ((s, dir) => {
      import s.implicits._
      val hostile = Seq(
        (-3L, "nul-adjacent  control and \"quotes\"", "zz"),
        (-2L, "line one\nline two\ttab", "yy"),
        (-1L, "José «café» — ünïcode", "xx")
      ).toDF("doc_id", "text", "lang")
      val src = Tables.documents(s, dir)
        .select(col("doc_id"), col("text"), col("lang"))
        .unionByName(hostile)
      val out = SparkHygiene.scratchDir("p18_orc")
      src.write.mode("overwrite").orc(out)
      s.read.schema("doc_id LONG, text STRING, lang STRING").orc(out)
        .orderBy(col("doc_id"))
    }),

    // PARTITIONED WRITE + PARTITION-PRUNED READ — the directory-layout
    // contract every 100 TB lake relies on: write documents
    // hive-partitioned by lang, read back with a lang predicate, and
    // the scan must LIST only the two matching directories (
    // PartitionFilters, pinned in PlanSpec) — no file of any other
    // language is opened. The partition column round-trips through the
    // directory name, not the file bytes.
    "p19_partition_prune" -> ((s, dir) => {
      val out = SparkHygiene.scratchDir("p19_part")
      Tables.documents(s, dir)
        .select(col("doc_id"), col("text"), col("lang"))
        .write.mode("overwrite").partitionBy("lang").parquet(out)
      s.read.parquet(out)
        .filter(col("lang").isin("en", "de"))
        .select(col("doc_id"), col("lang"), length(col("text")).as("text_len"))
        .orderBy(col("doc_id"))
    }),

    // SMALL-FILE COMPACTION — the lake-maintenance rewrite every
    // long-running ingest needs: 64 tiny files (the streaming-sink
    // debris pattern) folded into byte-budgeted, range-clustered files
    // by operators/Compaction. The oracle pins that the rewrite is
    // logically invisible; CompactionSpec pins the physical contract
    // (file count from the byte budget, disjoint per-file key ranges).
    "p20_compaction" -> ((s, dir) => {
      val in = SparkHygiene.scratchDir("p20_in")
      val out = SparkHygiene.scratchDir("p20_out")
      Tables.documents(s, dir)
        .select(col("doc_id"), col("text"), col("lang"))
        .repartition(64).write.mode("overwrite").parquet(in)
      graft.operators.Compaction.compact(s, in, out,
        sortCol = "doc_id", targetBytes = 4L << 20)
      s.read.parquet(out)
        .select(col("doc_id"), col("lang"), length(col("text")).as("text_len"))
        .orderBy(col("doc_id"))
    }),

    // MANIFEST-PRUNED READ — the footer-stats scan planner over the
    // compacted, range-clustered layout: a key-range read lists the
    // manifest (driver-side, footer-only), plans ONLY the files whose
    // min/max can match, and applies the residual filter. The oracle
    // pins that file-level pruning is logically invisible; ManifestSpec
    // pins the physical contract (1 file planned for a point read).
    "p21_manifest_read" -> ((s, dir) => {
      val in = SparkHygiene.scratchDir("p21_in")
      val out = SparkHygiene.scratchDir("p21_out")
      Tables.documents(s, dir)
        .select(col("doc_id"), col("text"), col("lang"))
        .repartition(32).write.mode("overwrite").parquet(in)
      graft.operators.Compaction.compact(s, in, out,
        sortCol = "doc_id", targetBytes = 64L << 10)
      graft.sources.Manifest.prunedRead(s, out, "doc_id", 100L, 149L)
        .select(col("doc_id"), col("lang"), length(col("text")).as("text_len"))
        .orderBy(col("doc_id"))
    }),

    // BLOOM-MANIFEST PRUNED READ — file skipping where min/max stats
    // are structurally dead: the table is HASH-distributed on doc_id
    // (the ingest-order / bucketed layout), so every file spans ~the
    // full key range and p21's range manifest prunes nothing — but a
    // per-file Bloom bitset (built distributed, one OR-aggregate;
    // driver holds only files × 4 KB of bitset) prunes a point-set
    // lookup to ~the keys' home files. The oracle pins that bloom
    // pruning is logically invisible (false positives add files, never
    // rows); ManifestSpec pins the physical contract (zero false
    // negatives, candidates ≪ files, absent keys prune ~everything).
    "p22_bloom_prune" -> ((s, dir) => {
      val in = SparkHygiene.scratchDir("p22_in")
      Tables.documents(s, dir)
        .select(col("doc_id"), col("text"), col("lang"))
        .repartition(16, col("doc_id"))
        .write.mode("overwrite").parquet(in)
      graft.sources.Manifest.bloomPrunedRead(s, in, "doc_id",
          keys = Seq(3L, 57L, 111L, 222L, 444L))
        .select(col("doc_id"), col("lang"), length(col("text")).as("text_len"))
        .orderBy(col("doc_id"))
    }),

    // SNAPSHOT TIME TRAVEL (sources/Snapshots) — the versioning layer
    // that makes "the table" a manifest, not a directory listing: two
    // append commits build versions 1 and 2; the query reads VERSION 1
    // after version 2 exists, and must see exactly the v1 rows (the
    // reproducible-read property training-data lineage depends on).
    // SnapshotsSpec pins the file-level contract (v1 read plans only
    // v1 directories; a pinned historical read is immune to later
    // commits). The oracle is the v1 predicate on the raw table.
    "p23_time_travel" -> ((s, dir) => {
      val t = SparkHygiene.scratchDir("p23_tbl")
      val docs = Tables.documents(s, dir)
        .select(col("doc_id"), col("text"), col("lang"))
      graft.sources.Snapshots.commit(s, t, docs.filter(col("doc_id") < 250))
      graft.sources.Snapshots.commit(s, t, docs.filter(col("doc_id") >= 250))
      graft.sources.Snapshots.read(s, t, Some(1))
        .select(col("doc_id"), col("lang"), length(col("text")).as("text_len"))
        .orderBy(col("doc_id"))
    }),

    // COPY-ON-WRITE ROW ERASURE (operators/DeleteRows) — the GDPR
    // DELETE over a snapshot table: v1 commits the corpus
    // range-clustered on doc_id (8 files with disjoint id ranges), the
    // erase of one contiguous id band footer-prunes to the files that
    // can contain it, rewrites ONLY those minus the targets, and
    // publishes the rest BY REFERENCE as v2 (one manifest write). The
    // query reads the LATEST version — erasure must be logically
    // invisible (the oracle filters the raw table), while
    // DeleteRowsSpec pins the surgery contract: untouched files are
    // referenced verbatim (never rewritten), only range-overlapping
    // files rewrite, v1 still time-travels to the pre-erasure rows,
    // and a no-overlap erase commits nothing.
    "p24_gdpr_erase" -> ((s, dir) => {
      val t = SparkHygiene.scratchDir("p24_tbl")
      val docs = Tables.documents(s, dir)
        .select(col("doc_id"), col("text"), col("lang"))
      graft.sources.Snapshots.commit(s, t,
        docs.repartitionByRange(8, col("doc_id")))
      graft.operators.DeleteRows.deleteRange(s, t, "doc_id",
        lo = 100L, hi = 299L)
      graft.sources.Snapshots.read(s, t)
        .select(col("doc_id"), col("lang"), length(col("text")).as("text_len"))
        .orderBy(col("doc_id"))
    }),

    // SNAPSHOT RESTORE — the undo button time travel implies (Delta
    // `RESTORE TABLE`): v1 commits the corpus, v2 is a (bad) erase of
    // a third of it, restore(1) republishes v1's manifest verbatim as
    // v3 — zero data movement, the bad v2 stays time-travelable, and
    // the table's LATEST read equals the original corpus again. The
    // oracle is the raw table: a correct restore is logically
    // invisible. SnapshotsSpec pins the zero-copy contract (v3's
    // manifest is byte-identical to v1's) and the preserved history.
    "p26_restore" -> ((s, dir) => {
      val t = SparkHygiene.scratchDir("p26_tbl")
      val docs = Tables.documents(s, dir)
        .select(col("doc_id"), col("text"), col("lang"))
      graft.sources.Snapshots.commit(s, t,
        docs.repartitionByRange(8, col("doc_id")))
      graft.operators.DeleteRows.deleteRange(s, t, "doc_id",
        lo = 0L, hi = 166L)
      graft.sources.Snapshots.restore(s, t, 1)
      graft.sources.Snapshots.read(s, t)
        .select(col("doc_id"), col("lang"), length(col("text")).as("text_len"))
        .orderBy(col("doc_id"))
    }),

    // CHANGE DATA FEED (operators/ChangeFeed) — Delta's table_changes
    // between ANY two versions, derived from the manifest log: v1
    // commits the corpus, v2 erases a band (copy-on-write), v3 appends
    // new docs; changes(v1 → v3) reads ONLY the manifest diff (the
    // touched originals, their rewrites, the appended dir — never the
    // untouched files: immutable + referenced ⇒ unchanged), cancels
    // COW survivors by full-row hash, and emits the exact delete +
    // insert set. The oracle replays the diff from the raw table;
    // ChangeFeedSpec pins the update pre/post pairing and the
    // unchanged-file fast path (inputFiles ⊆ manifest diff).
    "p27_change_feed" -> ((s, dir) => {
      val t = SparkHygiene.scratchDir("p27_tbl")
      val docs = Tables.documents(s, dir)
        .select(col("doc_id"), col("text"), col("lang"))
      graft.sources.Snapshots.commit(s, t,
        docs.repartitionByRange(8, col("doc_id")))
      graft.operators.DeleteRows.deleteRange(s, t, "doc_id",
        lo = 100L, hi = 299L)
      graft.sources.Snapshots.commit(s, t,
        docs.filter(col("doc_id") < 50)
          .select((col("doc_id") + 10000).as("doc_id"),
            col("text"), col("lang")))
      graft.operators.ChangeFeed.changes(s, t, 1, 3, "doc_id")
        .select(col("doc_id"), col("lang"),
          length(col("text")).as("text_len"),
          col("_change_type").as("change_type"))
        .orderBy(col("change_type"), col("doc_id"))
    }),

    // SQL TABLE-VALUED FUNCTIONS (GraftExtensions.tableFunctions) —
    // p27's change feed and p23's time travel, addressable from PURE
    // SQL: `table_changes(dir, from, to, key)` plans the manifest-diff
    // change feed as a relation, `snapshot_at(dir, v)` pins a version
    // (here as a scalar subquery counting v1 — the pre-erase state —
    // next to each change row). Same table evolution as p27 (commit,
    // COW erase, append), so the oracle replays the diff raw and
    // cross-joins the v1 count.
    "p32_sql_table_changes" -> ((s, dir) => {
      val t = SparkHygiene.scratchDir("p32_tbl")
      val docs = Tables.documents(s, dir)
        .select(col("doc_id"), col("text"), col("lang"))
      graft.sources.Snapshots.commit(s, t,
        docs.repartitionByRange(8, col("doc_id")))
      graft.operators.DeleteRows.deleteRange(s, t, "doc_id",
        lo = 100L, hi = 299L)
      graft.sources.Snapshots.commit(s, t,
        docs.filter(col("doc_id") < 50)
          .select((col("doc_id") + 10000).as("doc_id"),
            col("text"), col("lang")))
      s.sql(
        s"""SELECT doc_id, lang, length(text) AS text_len,
           |  _change_type AS change_type,
           |  (SELECT count(*) FROM snapshot_at('$t', 1)) AS v1_rows
           |FROM table_changes('$t', 1, 3, 'doc_id')
           |ORDER BY change_type, doc_id""".stripMargin)
    }),

    // SQL `DELETE FROM` (SupportsDelete on the V2 table → the p24/p25
    // copy-on-write surgery): a range conjunct and an IN list deleted
    // in two statements through pure SQL; footer stats prune the
    // range-clustered files the range cannot touch, survivors rewrite,
    // untouched files republish by reference, v1 still time-travels
    // (SnapshotCatalogSpec pins the surgery, NULL-predicate row
    // retention, no-op commits, and pinned-version refusal). The oracle
    // filters the raw table — SQL deletion must equal predicate
    // negation.
    "p33_sql_delete" -> ((s, dir) => {
      s.conf.set("spark.sql.catalog.graft_spj",
        classOf[graft.sources.v2.SnapshotCatalog].getName)
      val t = SparkHygiene.scratchDir("p33_tbl")
      val docs = Tables.documents(s, dir)
        .select(col("doc_id"), col("text"), col("lang"))
      graft.sources.Snapshots.commit(s, t,
        docs.repartitionByRange(8, col("doc_id")))
      s.sql(s"DELETE FROM graft_spj.snap.`$t` WHERE doc_id >= 300 AND doc_id < 400")
      s.sql(s"DELETE FROM graft_spj.snap.`$t` WHERE doc_id IN (3, 57, 111)")
      s.table(s"graft_spj.snap.`$t`")
        .select(col("doc_id"), col("lang"), length(col("text")).as("text_len"))
        .orderBy(col("doc_id"))
    }),

    // SQL INSERT OVERWRITE (SupportsTruncate on the V2 write builder) —
    // the REPLACE commit: the new manifest lists only the overwrite's
    // files, the pre-overwrite version still time-travels, vacuum
    // reclaims after retention (SnapshotWriteSpec pins replace +
    // history + the empty-overwrite schema-only version). The oracle is
    // the overwrite SELECT replayed raw.
    "p34_sql_overwrite" -> ((s, dir) => {
      s.conf.set("spark.sql.catalog.graft_spj",
        classOf[graft.sources.v2.SnapshotCatalog].getName)
      val t = SparkHygiene.scratchDir("p34_tbl")
      val docs = Tables.documents(s, dir)
        .select(col("doc_id"), col("text"), col("lang"))
      graft.sources.Snapshots.commit(s, t, docs.filter(col("doc_id") < 200))
      docs.createOrReplaceTempView("p34_docs")
      s.sql(s"INSERT OVERWRITE graft_spj.snap.`$t` " +
        "SELECT doc_id, text, lang FROM p34_docs " +
        "WHERE doc_id BETWEEN 200 AND 399")
      s.table(s"graft_spj.snap.`$t`")
        .select(col("doc_id"), col("lang"), length(col("text")).as("text_len"))
        .orderBy(col("doc_id"))
    }),

    // SQL `UPDATE` (SupportsRowLevelOperations → group-based
    // copy-on-write, sources/v2/SnapshotRowLevel.scala): Spark rewrites
    // the statement into ONE scan of the footer-overlapping files
    // feeding a replace-groups write — matching rows re-emit with the
    // assignments applied, NON-matching rows of touched files copy
    // through, untouched files republish by reference, and the commit
    // swaps exactly the scanned files (SnapshotRowLevelSpec pins all
    // four properties + optimistic-concurrency refusal). The oracle is
    // the update as a CASE projection over the raw table.
    "p35_sql_update" -> ((s, dir) => {
      s.conf.set("spark.sql.catalog.graft_spj",
        classOf[graft.sources.v2.SnapshotCatalog].getName)
      val t = SparkHygiene.scratchDir("p35_tbl")
      val docs = Tables.documents(s, dir)
        .select(col("doc_id"), col("text"), col("lang"))
      graft.sources.Snapshots.commit(s, t,
        docs.repartitionByRange(8, col("doc_id")))
      s.sql(s"UPDATE graft_spj.snap.`$t` " +
        "SET lang = concat(lang, '-r'), text = substring(text, 1, 40) " +
        "WHERE doc_id >= 200 AND doc_id < 300")
      s.table(s"graft_spj.snap.`$t`")
        .select(col("doc_id"), col("lang"), length(col("text")).as("text_len"))
        .orderBy(col("doc_id"))
    }),

    // SQL `MERGE INTO` (same row-level machinery, command=MERGE):
    // matched-delete, matched-update, and not-matched-insert arms in
    // one statement — the upsert j16 expresses through the engine API,
    // now as pure SQL DML with the same manifest-commit atomicity and
    // time-travel. MERGE's affected groups come from the JOIN (no
    // static predicate), so pruning is RUNTIME: the matching-rows
    // subquery hands `_file IN (...)` back to the row-level scan and
    // only files actually holding matched keys rewrite — O(matching
    // files) at 100 TB, with the no-match case degrading to a no-op.
    // The oracle composes delete-filter, update-case, and insert-union
    // over the raw table.
    "p36_sql_merge" -> ((s, dir) => {
      s.conf.set("spark.sql.catalog.graft_spj",
        classOf[graft.sources.v2.SnapshotCatalog].getName)
      val t = SparkHygiene.scratchDir("p36_tbl")
      val docs = Tables.documents(s, dir)
        .select(col("doc_id"), col("text"), col("lang"))
      graft.sources.Snapshots.commit(s, t,
        docs.filter(col("doc_id") < 400).repartitionByRange(8, col("doc_id")))
      docs.filter(col("doc_id").between(300, 499))
        .createOrReplaceTempView("p36_src")
      s.sql(
        s"""MERGE INTO graft_spj.snap.`$t` tgt
           |USING p36_src src ON tgt.doc_id = src.doc_id
           |WHEN MATCHED AND src.doc_id < 320 THEN DELETE
           |WHEN MATCHED THEN UPDATE SET lang = 'dup'
           |WHEN NOT MATCHED THEN INSERT (doc_id, text, lang)
           |  VALUES (src.doc_id, src.text, src.lang)""".stripMargin)
      s.table(s"graft_spj.snap.`$t`")
        .select(col("doc_id"), col("lang"), length(col("text")).as("text_len"))
        .orderBy(col("doc_id"))
    }),

    // SCHEMA EVOLUTION (sources/Snapshots.scala `#schema=` manifest
    // header): a later commit ADDS a column; the current version reads
    // the union schema with pre-evolution files serving null (no
    // rewrite of old data), SQL UPDATE then backfills part of the gap
    // copy-on-write, and v1 still time-travels with its original
    // columns (SchemaEvolutionSpec pins the narrower-history and
    // restore-schema properties). The oracle is the union + backfill
    // as one CASE projection over the raw table.
    "p37_schema_evolution" -> ((s, dir) => {
      s.conf.set("spark.sql.catalog.graft_spj",
        classOf[graft.sources.v2.SnapshotCatalog].getName)
      val t = SparkHygiene.scratchDir("p37_tbl")
      val docs = Tables.documents(s, dir)
        .select(col("doc_id"), col("text"), col("lang"))
      graft.sources.Snapshots.commit(s, t,
        docs.filter(col("doc_id") < 300).repartitionByRange(4, col("doc_id")))
      graft.sources.Snapshots.commit(s, t,
        docs.filter(col("doc_id").between(300, 499))
          .withColumn("score", (col("doc_id") * 7).cast("long")))
      s.sql(s"UPDATE graft_spj.snap.`$t` SET score = -1 " +
        "WHERE score IS NULL AND doc_id < 100")
      s.table(s"graft_spj.snap.`$t`")
        .select(col("doc_id"), col("lang"), col("score"))
        .orderBy(col("doc_id"))
    }),

    // SQL DDL + HISTORY surface: `ALTER TABLE … ADD COLUMNS` is a
    // pure-metadata commit (entries republished by reference under a
    // widened #schema header — zero data movement), `INSERT INTO` then
    // lands rows carrying the new column, and `snapshot_history(dir)`
    // exposes the version log (version, n_entries, n_columns) from
    // manifests alone — no data files opened. The oracle is the
    // expected history as literals: v1 bootstrap (1 entry, 3 cols),
    // v2 ALTER (same entry, 4 cols), v3 insert (+2 files, 4 cols).
    "p38_sql_history" -> ((s, dir) => {
      s.conf.set("spark.sql.catalog.graft_spj",
        classOf[graft.sources.v2.SnapshotCatalog].getName)
      val t = SparkHygiene.scratchDir("p38_tbl")
      val docs = Tables.documents(s, dir)
        .select(col("doc_id"), col("text"), col("lang"))
      graft.sources.Snapshots.commit(s, t, docs.filter(col("doc_id") < 300))
      s.sql(s"ALTER TABLE graft_spj.snap.`$t` ADD COLUMNS (score BIGINT)")
      docs.createOrReplaceTempView("p38_docs")
      s.sql(s"INSERT INTO graft_spj.snap.`$t` " +
        "SELECT /*+ REPARTITION(2) */ doc_id, text, lang, " +
        "CAST(doc_id * 3 AS BIGINT) FROM p38_docs " +
        "WHERE doc_id BETWEEN 300 AND 399")
      s.sql(s"SELECT * FROM snapshot_history('$t') ORDER BY version")
    }),

    // DATASOURCE V2 READ (sources/v2/SnapshotsDataSource) — the
    // standard `spark.read.format(...)` front door over snapshot
    // tables: version resolution happens INSIDE the plan
    // (`versionAsOf` pins v1 after v2 exists — the reproducible-read
    // property, now addressable from the public read API and from SQL
    // `USING graft_snapshots`), the pushed doc_id filter skips
    // non-overlapping files at plan time via footer stats (v1 is
    // range-clustered into 4 files; SnapshotsV2Spec pins the
    // kept/skipped counts), and Spark re-applies the filter on rows so
    // the skip is a superset bound, never a semantics change. The
    // oracle replays the v1 predicate + filter on the raw table.
    "p28_v2_read" -> ((s, dir) => {
      val t = SparkHygiene.scratchDir("p28_tbl")
      val docs = Tables.documents(s, dir)
        .select(col("doc_id"), col("text"), col("lang"))
      graft.sources.Snapshots.commit(s, t,
        docs.filter(col("doc_id") < 250).repartitionByRange(4, col("doc_id")))
      graft.sources.Snapshots.commit(s, t, docs.filter(col("doc_id") >= 250))
      s.read.format("graft_snapshots").option("path", t)
        .option("versionAsOf", 1).load()
        .filter(col("doc_id") >= 100L)
        .select(col("doc_id"), col("lang"), length(col("text")).as("text_len"))
        .orderBy(col("doc_id"))
    }),

    // V2 BATCH WRITE — `df.write.format("graft_snapshots")` appends as
    // a manifest COMMIT: every task writes its own file into a
    // writer-unique staging dir and reports it in its commit message;
    // the driver publishes previous-entries + exactly-the-committed
    // files, so speculative/retried task leftovers are never referenced
    // (no output committer — the manifest IS the committer;
    // SnapshotWriteSpec pins zombie-sweep, empty-append no-op, epoch
    // idempotency). The oracle is the raw table: bootstrap commit +
    // connector append must equal it.
    "p30_v2_write" -> ((s, dir) => {
      val t = SparkHygiene.scratchDir("p30_tbl")
      val docs = Tables.documents(s, dir)
        .select(col("doc_id"), col("text"), col("lang"))
      graft.sources.Snapshots.commit(s, t, docs.filter(col("doc_id") < 200))
      docs.filter(col("doc_id") >= 200)
        .write.format("graft_snapshots").option("path", t)
        .mode("append").save()
      s.read.format("graft_snapshots").option("path", t).load()
        .select(col("doc_id"), col("lang"), length(col("text")).as("text_len"))
        .orderBy(col("doc_id"))
    }),

    // V2 RUNTIME FILTERING (DPP over the connector) — the fact side is
    // a snapshot table range-clustered on doc_id; the dim side's
    // selective key range is known only after ITS filter runs, so no
    // static pushdown can prune the fact scan. SnapshotScan implements
    // SupportsRuntimeFiltering: Catalyst wires the dim's join keys back
    // as a runtime IN-set, and the scan re-plans its partitions against
    // footer [min,max] before any task launches (SnapshotsV2Spec pins
    // the 1-kept/7-skipped census and join-semantics invariance). At
    // 100 TB this is the star-join fact scan collapsing to the dim
    // selection's key range with zero hand-written predicates. The
    // oracle replays the join on the raw table.
    "p31_v2_runtime_filter" -> ((s, dir) => {
      val t = SparkHygiene.scratchDir("p31_tbl")
      val docs = Tables.documents(s, dir)
        .select(col("doc_id"), col("text"), col("lang"))
      graft.sources.Snapshots.commit(s, t,
        docs.repartitionByRange(8, col("doc_id")))
      val dim = Tables.documents(s, dir)
        .filter(col("doc_id") >= 100L && col("doc_id") < 150L)
        .select(col("doc_id").as("k"))
      s.read.format("graft_snapshots").option("path", t).load()
        .join(dim, col("doc_id") === col("k"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n"), sum(col("doc_id")).as("id_sum"),
          sum(length(col("text")).cast("long")).as("len_sum"))
        .orderBy(col("lang"))
    }),

    // OPTIMIZE ZORDER (operators/Optimize) — multi-dimensional
    // re-clustering as a maintenance COMMIT: v1 is range-clustered on
    // user_id only (the 1-D layout whose second access path is a full
    // scan), the optimize rewrites it Morton-interleaved on
    // (user_id, event_id) and publishes atomically as v2, and the
    // two-dimensional read below goes through the V2 connector, whose
    // footer-stats skip now prunes on BOTH predicates (OptimizeSpec
    // pins the kept/skipped counts per dimension and that v1 still
    // time-travels). The oracle filters the raw table — re-layout must
    // be logically invisible.
    "p29_zorder_optimize" -> ((s, dir) => {
      val t = SparkHygiene.scratchDir("p29_tbl")
      val ev = Tables.events(s, dir)
        .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
      graft.sources.Snapshots.commit(s, t,
        ev.repartitionByRange(8, col("user_id")))
      graft.operators.Optimize.zorder(s, t, "user_id", "event_id",
        targetBytes = 64L << 10)
      s.read.format("graft_snapshots").option("path", t).load()
        .filter(col("user_id") < 100L && col("event_id") < 1000L)
        .select(col("event_id"), col("user_id"), col("event_type"))
        .orderBy(col("event_id"))
    }),

    // KEY-LIST GDPR ERASURE (VERDICT r12 #5) — the real right-to-be-
    // forgotten request: "erase THESE users", non-contiguous keys that
    // footer [min,max] ranges cannot prune on a hash-distributed table
    // (every file's range spans everything). DeleteRows.deleteKeys
    // prunes with the p22 BLOOM manifest instead: only might-contain
    // files rewrite, everything else is republished by reference, and
    // v1 still time-travels to the pre-erasure rows (DeleteRowsSpec
    // pins the file-surgery contract). The oracle filters the raw
    // table — erasure must be logically invisible.
    "p25_gdpr_erase_keys" -> ((s, dir) => {
      val t = SparkHygiene.scratchDir("p25_tbl")
      val docs = Tables.documents(s, dir)
        .select(col("doc_id"), col("text"), col("lang"))
      graft.sources.Snapshots.commit(s, t,
        docs.repartition(8, col("doc_id")))
      graft.operators.DeleteRows.deleteKeys(s, t, "doc_id",
        keys = Seq(3L, 57L, 111L, 222L, 444L))
      graft.sources.Snapshots.read(s, t)
        .select(col("doc_id"), col("lang"), length(col("text")).as("text_len"))
        .orderBy(col("doc_id"))
    }),

    // DELETION-VECTOR (merge-on-read) ERASURE (VERDICT r13 #3) — the
    // narrow-delete counterpart of p25: the same GDPR key list, but the
    // commit rewrites ZERO data files. Two erase waves record (file →
    // suppressed row positions) sidecars in the manifest (#dv= header);
    // the second wave MERGES into the first's positions. The read goes
    // through the V2 connector, whose row readers skip the suppressed
    // ordinals (the scan drops to the row path — position skipping is
    // row-level); v1 still time-travels to the pre-erasure rows and
    // compaction reconciles to a DV-free layout (DeletionVectorSpec
    // pins the zero-rewrite, merge, time-travel, and reconcile
    // contracts). The oracle filters the raw table — erasure must be
    // logically invisible regardless of which mechanism served it.
    "p39_dv_delete" -> ((s, dir) => {
      val t = SparkHygiene.scratchDir("p39_tbl")
      val docs = Tables.documents(s, dir)
        .select(col("doc_id"), col("text"), col("lang"))
      graft.sources.Snapshots.commit(s, t,
        docs.repartition(8, col("doc_id")))
      graft.operators.DeleteRows.deleteKeysWithVectors(s, t, "doc_id",
        keys = Seq(3L, 57L))
      graft.operators.DeleteRows.deleteKeysWithVectors(s, t, "doc_id",
        keys = Seq(111L, 222L, 444L))
      s.read.format("graft_snapshots").option("path", t).load()
        .select(col("doc_id"), col("lang"), length(col("text")).as("text_len"))
        .orderBy(col("doc_id"))
    }),

    // MERGE WITH SCHEMA EVOLUTION (VERDICT r13 #5) — a MERGE whose
    // source carries a column the target lacks: the WITH SCHEMA
    // EVOLUTION clause drives Spark's analyzer to ALTER the target
    // first (our catalog's ADD COLUMNS — a zero-data-movement metadata
    // commit), then the group-based row-level MERGE runs under the
    // widened schema. Untouched pre-evolution files are republished by
    // reference and serve the new column as null
    // (SchemaEvolutionSpec pins that); matched rows gain scores,
    // not-matched source rows insert whole. The oracle replays the
    // merge as a projection + union over the raw table.
    "p40_merge_evolve" -> ((s, dir) => {
      val t = SparkHygiene.scratchDir("p40_tbl")
      val docs = Tables.documents(s, dir)
        .select(col("doc_id"), col("text"), col("lang"))
      graft.sources.Snapshots.commit(s, t,
        docs.repartitionByRange(4, col("doc_id")))
      val cat = "graft_p40"
      s.conf.set(s"spark.sql.catalog.$cat",
        classOf[graft.sources.v2.SnapshotCatalog].getName)
      docs.filter(col("doc_id") % 5 === 0)
        .withColumn("score", col("doc_id") * 2)
        .unionByName(docs.filter(col("doc_id") % 3 === 0)
          .withColumn("doc_id", col("doc_id") + 1000000L)
          .withColumn("score", col("doc_id") * 2))
        .createOrReplaceTempView("p40_src")
      s.sql(
        s"""MERGE WITH SCHEMA EVOLUTION INTO $cat.snap.`$t` tgt
           |USING p40_src src ON tgt.doc_id = src.doc_id
           |WHEN MATCHED THEN UPDATE SET score = src.score
           |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
      s.table(s"$cat.snap.`$t`")
        .select(col("doc_id"), col("lang"),
          length(col("text")).as("text_len"), col("score"))
        .orderBy(col("doc_id"))
    }),

    // MERGE-ON-READ UPDATE via deletion vectors — the DV delete's twin:
    // the matching rows' OLD positions join the `#dv=` suppression map
    // and the UPDATED rows append as one small directory, so zero
    // existing files rewrite (DeletionVectorSpec pins the file
    // accounting, provenance, and time travel). The oracle replays the
    // update as a CASE projection — merge-on-read must be logically
    // invisible.
    "p43_dv_update" -> ((s, dir) => {
      val t = SparkHygiene.scratchDir("p43_tbl")
      val docs = Tables.documents(s, dir)
        .select(col("doc_id"), col("text"), col("lang"))
      graft.sources.Snapshots.commit(s, t,
        docs.repartitionByRange(8, col("doc_id")))
      graft.operators.UpdateRows.updateWhereWithVectors(s, t,
        col("doc_id") % 50 === 0, Map("lang" -> lit("xx")))
      s.read.format("graft_snapshots").option("path", t).load()
        .select(col("doc_id"), col("lang"), length(col("text")).as("text_len"))
        .orderBy(col("doc_id"))
    }),

    // COLUMN RENAME via COLUMN-ID MAPPING (VERDICT r13 #6, the Iceberg
    // approach): every commit stamps stable `parquet.field.id`s into
    // the header AND the data files, so `ALTER TABLE … RENAME COLUMN`
    // is a zero-data-movement metadata commit — readers resolve old
    // files' bytes BY ID under the new name (ids are never reused, so
    // a dropped-then-re-added name can't resurrect old bytes;
    // SchemaEvolutionSpec pins rename/drop/resurrection/legacy-refusal).
    // The oracle aliases the raw column — the rename must be invisible
    // to the data.
    "p42_rename" -> ((s, dir) => {
      val t = SparkHygiene.scratchDir("p42_tbl")
      val docs = Tables.documents(s, dir)
        .select(col("doc_id"), col("text"), col("lang"))
      graft.sources.Snapshots.commit(s, t,
        docs.repartitionByRange(4, col("doc_id")))
      val cat = "graft_p42"
      s.conf.set(s"spark.sql.catalog.$cat",
        classOf[graft.sources.v2.SnapshotCatalog].getName)
      s.sql(s"ALTER TABLE $cat.snap.`$t` RENAME COLUMN lang TO language")
      s.table(s"$cat.snap.`$t`")
        .select(col("doc_id"), col("language"),
          length(col("text")).as("text_len"))
        .orderBy(col("doc_id"))
    }),

    // STRING FOOTER PRUNING (VERDICT r13 #7) — real curation predicates
    // are `lang = 'en'` / `source = '…'`, not long ranges: the corpus
    // commits range-clustered on (lang, doc_id) so each file's footer
    // carries a tight binary [min, max] for the lang column, and the V2
    // scan's pushed string filter drops non-overlapping files from the
    // PLAN (parquet may truncate binary bounds — truncation keeps them
    // valid supersets, so skipping stays sound; SnapshotsV2Spec pins
    // the skipped-file count and the string-keyed runtime-filter path).
    // The oracle is the raw predicate — pruning must be invisible.
    "p41_string_prune" -> ((s, dir) => {
      val t = SparkHygiene.scratchDir("p41_tbl")
      val docs = Tables.documents(s, dir)
        .select(col("doc_id"), col("text"), col("lang"))
      graft.sources.Snapshots.commit(s, t,
        docs.repartitionByRange(6, col("lang"), col("doc_id")))
      s.read.format("graft_snapshots").option("path", t).load()
        .filter(col("lang") === "en")
        .select(col("doc_id"), col("lang"), length(col("text")).as("text_len"))
        .orderBy(col("doc_id"))
    }),

    // SQL `CALL` MAINTENANCE (Spark 4 ProcedureCatalog,
    // sources/v2/SnapshotProcedures.scala) — the full merge-on-read
    // lifecycle driven from SQL alone: `CALL system.delete_keys`
    // records deletion vectors (ZERO files rewrite), `CALL
    // system.compact` reconciles them away into a range-clustered
    // DV-free layout (restoring the vectorized read path), `CALL
    // system.vacuum` reclaims the superseded history
    // (SnapshotProcedureSpec pins the file accounting, named-arg
    // defaults, restore, and the unknown-procedure refusal). The
    // oracle filters the raw table — three maintenance statements must
    // be logically invisible beyond the erasure itself.
    "p44_sql_call" -> ((s, dir) => {
      val cat = "graft_p44"
      s.conf.set(s"spark.sql.catalog.$cat",
        classOf[graft.sources.v2.SnapshotCatalog].getName)
      val t = SparkHygiene.scratchDir("p44_tbl")
      val docs = Tables.documents(s, dir)
        .select(col("doc_id"), col("text"), col("lang"))
      graft.sources.Snapshots.commit(s, t,
        docs.repartition(8, col("doc_id")))
      s.sql(s"CALL $cat.system.delete_keys('$t', 'doc_id', '5, 77, 303')")
      s.sql(s"CALL $cat.system.compact(table => '$t', " +
        "sort_col => 'doc_id')")
      s.sql(s"CALL $cat.system.vacuum(table => '$t', keep => 1)")
      s.table(s"$cat.snap.`$t`")
        .select(col("doc_id"), col("lang"), length(col("text")).as("text_len"))
        .orderBy(col("doc_id"))
    }),

    // INCREMENTAL OPTIMIZE (`CALL system.compact_small`,
    // operators/Optimize.compactSmall) — the maintenance shape that
    // scales: a streaming/append table accumulates small files; the
    // nightly run bin-packs ONLY those (big files republish by
    // reference, file-granular entries), costing O(bytes since last
    // run), never O(table). Deletion vectors on the packed files APPLY
    // in the rewrite; DVs on kept files carry forward
    // (SnapshotProcedureSpec pins the split + DV accounting + no-op
    // convergence). The oracle is the union of the append history
    // minus the erased keys — three maintenance-shaped commits and the
    // pack must be logically invisible.
    "p46_compact_small" -> ((s, dir) => {
      val cat = "graft_p46"
      s.conf.set(s"spark.sql.catalog.$cat",
        classOf[graft.sources.v2.SnapshotCatalog].getName)
      val t = SparkHygiene.scratchDir("p46_tbl")
      val docs = Tables.documents(s, dir)
        .select(col("doc_id"), col("text"), col("lang"))
      // one bulk commit + four small append commits (the streaming tax)
      graft.sources.Snapshots.commit(s, t,
        docs.filter(col("doc_id") < 300).coalesce(2))
      (0 until 4).foreach { k =>
        graft.sources.Snapshots.commit(s, t,
          docs.filter(col("doc_id") >= 300 + k * 25 &&
            col("doc_id") < 325 + k * 25).coalesce(1))
      }
      s.sql(s"CALL $cat.system.delete_keys('$t', 'doc_id', '9, 309')")
      s.sql(s"CALL $cat.system.compact_small(table => '$t', " +
        "target_bytes => 262144)")
      s.table(s"$cat.snap.`$t`")
        .select(col("doc_id"), col("lang"), length(col("text")).as("text_len"))
        .orderBy(col("doc_id"))
    }),

    // MERGE-ON-READ SQL DELETE (`dmlMode 'merge-on-read'` — the Delta
    // enableDeletionVectors table-property shape): the SAME `DELETE
    // FROM` statement that normally drives copy-on-write surgery
    // instead records a `#dv=` sidecar — zero data files move, the V2
    // row readers skip the suppressed positions, and `CALL
    // system.compact` reconciles (SnapshotProcedureSpec pins the
    // zero-rewrite routing and the copy-on-write default). The oracle
    // is predicate negation — the routing choice must be invisible.
    "p45_mor_sql_delete" -> ((s, dir) => {
      val t = SparkHygiene.scratchDir("p45_tbl")
      val docs = Tables.documents(s, dir)
        .select(col("doc_id"), col("text"), col("lang"))
      graft.sources.Snapshots.commit(s, t,
        docs.repartitionByRange(8, col("doc_id")))
      val tab = s"p45_mor_${math.abs(t.hashCode)}"
      s.sql(s"CREATE TABLE $tab (doc_id BIGINT, text STRING, " +
        s"lang STRING) USING graft_snapshots OPTIONS (path '$t', " +
        "dmlMode 'merge-on-read')")
      try {
        s.sql(s"DELETE FROM $tab " +
          "WHERE doc_id IN (7, 107, 207) OR doc_id >= 5800")
        s.table(tab)
          .select(col("doc_id"), col("lang"),
            length(col("text")).as("text_len"))
          .orderBy(col("doc_id"))
          // materialize before the DROP TABLE below unregisters the name
          .localCheckpoint(true)
      } finally s.sql(s"DROP TABLE $tab")
    }),

    // MERGE-ON-READ SQL UPDATE (delta-based row-level ops,
    // sources/v2/SnapshotDeltaRowLevel.scala): under `dmlMode
    // 'merge-on-read'` the same UPDATE statement that normally drives
    // file-granular copy-on-write instead writes POSITION DELTAS — the
    // matched rows' (_file, _pos) row ids join the `#dv=` sidecar and
    // the updated rows append as one small file, ZERO existing files
    // rewrite (DeltaDmlSpec pins the accounting, supersession, and the
    // copy-on-write default). The oracle is a CASE projection — the
    // storage strategy must be invisible.
    "p48_mor_sql_update" -> ((s, dir) => {
      val t = SparkHygiene.scratchDir("p48_tbl")
      val docs = Tables.documents(s, dir)
        .select(col("doc_id"), col("text"), col("lang"))
      graft.sources.Snapshots.commit(s, t,
        docs.repartitionByRange(8, col("doc_id")))
      val tab = s"p48_mor_${math.abs(t.hashCode)}"
      s.sql(s"CREATE TABLE $tab (doc_id BIGINT, text STRING, " +
        s"lang STRING) USING graft_snapshots OPTIONS (path '$t', " +
        "dmlMode 'merge-on-read')")
      try {
        s.sql(s"UPDATE $tab SET lang = upper(lang) " +
          "WHERE doc_id >= 100 AND doc_id < 300")
        s.table(tab)
          .select(col("doc_id"), col("lang"),
            length(col("text")).as("text_len"))
          .orderBy(col("doc_id"))
          .localCheckpoint(true)
      } finally s.sql(s"DROP TABLE $tab")
    }),

    // MERGE-ON-READ SQL MERGE: the j16 upsert as zero-rewrite DML —
    // matched rows update by position delta, unmatched source rows
    // append; one CAS'd manifest version carries suppressions + inserts
    // together. The oracle replays the upsert relationally.
    "p49_mor_sql_merge" -> ((s, dir) => {
      val t = SparkHygiene.scratchDir("p49_tbl")
      val docs = Tables.documents(s, dir)
        .select(col("doc_id"), col("text"), col("lang"))
      graft.sources.Snapshots.commit(s, t,
        docs.filter(col("doc_id") < 400).repartitionByRange(8, col("doc_id")))
      val tab = s"p49_mor_${math.abs(t.hashCode)}"
      s.sql(s"CREATE TABLE $tab (doc_id BIGINT, text STRING, " +
        s"lang STRING) USING graft_snapshots OPTIONS (path '$t', " +
        "dmlMode 'merge-on-read')")
      try {
        docs.filter(col("doc_id") >= 300 && col("doc_id") < 500)
          .withColumn("lang", lit("xx"))
          .createOrReplaceTempView("p49_src")
        s.sql(s"""MERGE INTO $tab t USING p49_src s
          ON t.doc_id = s.doc_id
          WHEN MATCHED THEN UPDATE SET lang = s.lang
          WHEN NOT MATCHED THEN INSERT (doc_id, text, lang)
            VALUES (s.doc_id, s.text, s.lang)""")
        s.table(tab)
          .select(col("doc_id"), col("lang"),
            length(col("text")).as("text_len"))
          .orderBy(col("doc_id"))
          .localCheckpoint(true)
      } finally s.sql(s"DROP TABLE $tab")
    }),

    // SHALLOW CLONE (sources/Snapshots.cloneTable): a new table whose
    // v1 REFERENCES the source's files — zero bytes move, O(manifest)
    // cost, independently writable. The classic hazard (source VACUUM
    // strands the clone) is closed structurally: the clone auto-pins
    // the source version with a clone-<id> tag. The query clones, then
    // lets the source MOVE ON destructively (erase + compact + vacuum
    // keep=1) — the clone must still read the ORIGINAL content, which
    // only the pin kept alive (CloneSpec pins the release path).
    "p51_shallow_clone" -> ((s, dir) => {
      val cat = "graft_p51"
      s.conf.set(s"spark.sql.catalog.$cat",
        classOf[graft.sources.v2.SnapshotCatalog].getName)
      val src = SparkHygiene.scratchDir("p51_src")
      val dst = SparkHygiene.scratchDir("p51_dst") + "/t"
      val docs = Tables.documents(s, dir)
        .select(col("doc_id"), col("text"), col("lang"))
      graft.sources.Snapshots.commit(s, src,
        docs.repartitionByRange(8, col("doc_id")))
      s.sql(s"CALL $cat.system.clone('$src', '$dst')")
      s.sql(s"CALL $cat.system.delete_keys('$src', 'doc_id', '1, 2, 3')")
      s.sql(s"CALL $cat.system.compact(table => '$src', " +
        "sort_col => 'doc_id')")
      s.sql(s"CALL $cat.system.vacuum(table => '$src', keep => 1)")
      s.table(s"$cat.snap.`$dst`")
        .select(col("doc_id"), col("lang"),
          length(col("text")).as("text_len"))
        .orderBy(col("doc_id"))
    }),

    // TAGS (immutable named versions, sources/Snapshots.createTag):
    // the training-data-lineage primitive — a run tags the snapshot it
    // read, the pin SURVIVES retention (vacuum keeps pinned manifests
    // + files + DV sidecars), and `VERSION AS OF 'name'` reproduces
    // the input forever. The query drives the whole lifecycle: tag v1,
    // append, compact (retiring v1's files from the current manifest),
    // vacuum keep=1 — then reads the tag; the oracle is v1's content,
    // which only the pin kept alive (TagSpec pins the release path).
    "p50_tag_travel" -> ((s, dir) => {
      val cat = "graft_p50"
      s.conf.set(s"spark.sql.catalog.$cat",
        classOf[graft.sources.v2.SnapshotCatalog].getName)
      val t = SparkHygiene.scratchDir("p50_tbl")
      val docs = Tables.documents(s, dir)
        .select(col("doc_id"), col("text"), col("lang"))
      graft.sources.Snapshots.commit(s, t, docs.filter(col("doc_id") < 400))
      s.sql(s"CALL $cat.system.create_tag('$t', 'training_run_17')")
      graft.sources.Snapshots.commit(s, t,
        docs.filter(col("doc_id") >= 400 && col("doc_id") < 500))
      s.sql(s"CALL $cat.system.compact(table => '$t', sort_col => 'doc_id')")
      s.sql(s"CALL $cat.system.vacuum(table => '$t', keep => 1)")
      s.sql(s"SELECT doc_id, lang, length(text) AS text_len " +
          s"FROM $cat.snap.`$t` VERSION AS OF 'training_run_17' " +
          "ORDER BY doc_id")
    }),

    // ATOMIC REPLACE-WHERE (`df.writeTo(t).overwrite(cond)` — the
    // daily-partition-reload): ONE manifest version deletes the rows
    // the condition matches AND inserts the recomputed slice — no
    // reader can observe the delete without the insert, and a re-run
    // replaces the same slice idempotently. Footer stats prune the
    // delete-half to the files the condition can touch (range-clustered
    // here, so the untouched 6-of-8 files republish by reference —
    // O(slice), never O(table)); the V2 predicate arrives through the
    // STRICT converter only (a condition the filter vocabulary cannot
    // express exactly refuses at analysis instead of replacing the
    // wrong slice — SnapshotWriteSpec pins both). The oracle rebuilds
    // the end state from the raw table: the reload must be exactly a
    // slice-wise CASE.
    "p47_replace_where" -> ((s, dir) => {
      val cat = "graft_p47"
      s.conf.set(s"spark.sql.catalog.$cat",
        classOf[graft.sources.v2.SnapshotCatalog].getName)
      val t = SparkHygiene.scratchDir("p47_tbl")
      val docs = Tables.documents(s, dir)
        .select(col("doc_id"), col("text"), col("lang"))
      graft.sources.Snapshots.commit(s, t,
        docs.repartitionByRange(8, col("doc_id")))
      // the recomputed slice: [100, 300) reloads with corrected lang
      docs.filter(col("doc_id") >= 100 && col("doc_id") < 300)
        .withColumn("lang", upper(col("lang")))
        .writeTo(s"$cat.snap.`$t`")
        .overwrite(col("doc_id") >= 100 && col("doc_id") < 300)
      s.table(s"$cat.snap.`$t`")
        .select(col("doc_id"), col("lang"),
          length(col("text")).as("text_len"))
        .orderBy(col("doc_id"))
    }),

    // token-distribution entropy (training-data quality signal: gibberish
    // and boilerplate sit at the entropy extremes). H = log2(N) − Σ c·log2(c)/N
    // over unigram counts — exact and one aggregation chain.
    "t9_entropy" -> ((s, dir) => {
      val toks = Tables.documents(s, dir)
        .withColumn("__toks", TextFns.repetitionTokens(col("text")))
        .select(col("doc_id"), explode(col("__toks")).as("t"))
      toks.groupBy(col("doc_id"), col("t")).agg(count(lit(1)).as("c"))
        .groupBy(col("doc_id"))
        // c·log2(c) summed in decimal: order-independent (portable-agg
        // convention, Catalogs header)
        .agg(sum(col("c")).as("n"),
          sum((col("c") * log2(col("c"))).cast("decimal(38,18)"))
            .cast("double").as("s"))
        .select(col("doc_id"),
          round(log2(col("n")) - col("s") / col("n"), 6).as("entropy"))
        .orderBy(col("doc_id"))
    }),

    // P13 ISO parse w/ Z-strip + P14 render, round-tripped from events.ts
    "p13_dates" -> ((s, dir) => {
      val iso = concat(date_format(col("ts"), "yyyy-MM-dd'T'HH:mm:ss"), lit("Z"))
      Tables.events(s, dir).select(
        col("event_id"),
        date_format(to_timestamp(regexp_replace(iso, "Z$", "")),
          "yyyy-MM-dd HH:mm:ss").as("rendered"))
        .orderBy(col("event_id"))
    }),

    // corpus vocabulary build: top-500 tokens by total occurrences with
    // document frequency — the tokenizer-training / vocab-prep pass.
    // Map-side partial aggregation + one shuffle on the token; the
    // top-k cut is a TakeOrdered (no global sort materialization), with
    // a total order (n desc, token asc) so the boundary is engine-stable.
    "t10_vocab" -> ((s, dir) =>
      Tables.documents(s, dir)
        .withColumn("__toks", TextFns.repetitionTokens(col("text")))
        .select(col("doc_id"), explode(col("__toks")).as("t"))
        .groupBy(col("t"))
        .agg(count(lit(1)).as("n"), countDistinct(col("doc_id")).as("df"))
        .orderBy(col("n").desc, col("t").asc)
        .limit(500)),

    // per-language length-percentile trim (corpus curation: drop the
    // shortest and longest decile within each language). ntile is the
    // standard SQL distribution — deterministic under the (n, doc_id)
    // total order, one shuffle on lang; per-language partitions sort
    // independently, so skew is bounded by the hottest language, which
    // is the honest cost of a per-language quantile.
    "t11_length_filter" -> ((s, dir) => {
      val w = Window.partitionBy(col("lang"))
        .orderBy(col("n").asc, col("doc_id").asc)
      Tables.documents(s, dir)
        .select(col("doc_id"), col("lang"),
          size(TextFns.repetitionTokens(col("text"))).cast("long").as("n"))
        .withColumn("decile", ntile(10).over(w))
        .filter(col("decile").between(2, 9))
        .orderBy(col("doc_id"))
    }),

    // t18: per-language corpus length profile with EXACT percentiles
    // (median / p90 of whitespace-token counts). Complements t11: ntile
    // answers the per-doc "which decile am I in" form; `percentile` is
    // the exact aggregate form for a BOUNDED group count (languages).
    // Spark's partial aggregation keeps one (lang → value buffer) per
    // task — never a global sort — and at 100 TB the group cardinality
    // (languages), not the row count, bounds reduce-side state. Linear
    // interpolation semantics match DuckDB's quantile_cont; the inputs
    // are exact int64 token counts, so both engines interpolate the
    // same two integers (round(4) absorbs the final-division ulp).
    "t18_percentiles" -> ((s, dir) =>
      Tables.documents(s, dir)
        .select(col("lang"),
          size(TextFns.repetitionTokens(col("text"))).cast("long").as("n"))
        .groupBy(col("lang"))
        .agg(
          count(lit(1)).as("n_docs"),
          min(col("n")).as("min_toks"),
          round(percentile(col("n"), lit(0.5)), 4).as("p50_toks"),
          round(percentile(col("n"), lit(0.9)), 4).as("p90_toks"),
          max(col("n")).as("max_toks"))
        .orderBy(col("lang"))))

  val oracleSql: Map[String, String] = Map(
    "t27_nfc_normalize" ->
      """WITH c AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL SELECT -5, 's' || chr(803) || chr(775) || ' dots'
        |  UNION ALL SELECT -4, chr(7785) || ' s-dot'
        |  UNION ALL SELECT -3, 'A' || chr(778) || ' ring'
        |  UNION ALL SELECT -2, 'Jos' || chr(233) || ' caf' || chr(233)
        |  UNION ALL SELECT -1, 'Jose' || chr(769) || ' cafe' || chr(769))
        |SELECT doc_id, nfc_normalize(text) AS norm,
        |       text <> nfc_normalize(text) AS changed
        |FROM c ORDER BY doc_id""".stripMargin,
    "t29_curation_pipeline" -> {
      // 60-bit md5 shard hash, t19's digit-sum idiom
      val shardH = (1 to 15).map(i =>
        s"(strpos('0123456789abcdef', substr(md5('shard:' || doc_id::VARCHAR), $i, 1)) - 1) * ${1L << (4 * (15 - i))}")
        .mkString(" + ")
      s"""WITH nrm AS (SELECT doc_id, lang, nfc_normalize(text) AS norm
         |  FROM documents),
         |tk AS (SELECT doc_id, lang, norm,
         |  regexp_split_to_array(lower(trim(norm)), '\\s+') AS toks FROM nrm),
         |lg AS (SELECT *, len(toks) AS n_toks FROM tk
         |       WHERE len(toks) BETWEEN 20 AND 1000),
         |q AS (SELECT *, ${OracleSqlParts.qualitySql("norm", "toks")} AS quality
         |      FROM lg),
         |qq AS (SELECT * FROM q WHERE quality > 0.5),
         |f AS (SELECT *, md5(regexp_replace(lower(trim(norm)), '\\s+', ' ', 'g')) AS fp
         |      FROM qq),
         |k AS (SELECT *, row_number() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
         |      FROM f),
         |d AS (SELECT doc_id, lang, n_toks, quality FROM k WHERE rn = 1),
         |ntok AS (SELECT doc_id, regexp_split_to_array(
         |    regexp_replace(lower(trim(norm)), '\\s+', ' ', 'g'), ' ') AS rtoks
         |  FROM nrm),
         |idx AS (SELECT doc_id, rtoks,
         |  unnest(generate_series(1, greatest(len(rtoks)-5, 0)+1)) AS i FROM ntok),
         |sh AS (SELECT DISTINCT doc_id, array_to_string(rtoks[i:i+4], ' ') AS sh
         |       FROM idx),
         |ev AS (SELECT DISTINCT sh FROM sh WHERE doc_id % 50 = 0),
         |contam AS (SELECT DISTINCT s.doc_id FROM sh s JOIN ev USING (sh)
         |           WHERE s.doc_id % 50 <> 0)
         |SELECT doc_id, lang, n_toks, quality,
         |  CAST(($shardH) % 8 AS BIGINT) AS shard
         |FROM d
         |WHERE doc_id % 50 <> 0
         |  AND NOT EXISTS (SELECT 1 FROM contam c WHERE c.doc_id = d.doc_id)
         |ORDER BY doc_id""".stripMargin
    },
    "t31_constraint_audit" ->
      """WITH a AS (SELECT count(*) AS n_rows,
        |  count(DISTINCT doc_id) AS n_ids,
        |  count(*) FILTER (text IS NULL OR length(trim(text)) = 0) AS n_empty_text,
        |  count(*) FILTER (lang IS NULL) AS n_null_lang,
        |  count(*) FILTER (source IS NULL) AS n_null_source,
        |  min(length(text)) AS min_len,
        |  max(length(text)) AS max_len
        |  FROM documents)
        |SELECT * FROM (
        |  SELECT 'row_count_positive' AS check_name, n_rows AS value,
        |         n_rows > 0 AS ok FROM a
        |  UNION ALL SELECT 'doc_id_unique', n_ids, n_ids = n_rows FROM a
        |  UNION ALL SELECT 'text_nonempty', n_empty_text, n_empty_text = 0 FROM a
        |  UNION ALL SELECT 'lang_complete', n_null_lang, n_null_lang = 0 FROM a
        |  UNION ALL SELECT 'source_complete', n_null_source, n_null_source = 0 FROM a
        |  UNION ALL SELECT 'min_len_bound', min_len, min_len >= 1 FROM a
        |  UNION ALL SELECT 'max_len_bound', max_len, max_len <= 5000 FROM a)
        |ORDER BY check_name""".stripMargin,
    "t28_cms_heavy" -> {
      // first two md5 hex digits as an exact 8-bit cell, same strpos
      // digit idiom as t19's 60-bit hash
      def cell(j: Int) =
        s"(strpos('0123456789abcdef', substr(md5('cms$j:' || tok), 1, 1)) - 1) * 16 + " +
          s"(strpos('0123456789abcdef', substr(md5('cms$j:' || tok), 2, 1)) - 1)"
      s"""WITH toks AS (
         |  SELECT unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS tok
         |  FROM documents),
         |tks AS (SELECT tok FROM toks WHERE len(tok) > 0),
         |cells AS (SELECT row, cell, count(*) AS cnt FROM (
         |    ${(0 until 4).map(j => s"SELECT $j AS row, (${cell(j)}) AS cell FROM tks").mkString(" UNION ALL ")}
         |  ) GROUP BY row, cell),
         |top AS (SELECT tok, count(*) AS exact_n FROM tks GROUP BY tok
         |        ORDER BY exact_n DESC, tok LIMIT 30),
         |pc AS (${(0 until 4).map(j => s"SELECT tok, $j AS row, (${cell(j)}) AS cell FROM top").mkString(" UNION ALL ")}),
         |est AS (SELECT pc.tok, min(coalesce(cells.cnt, 0)) AS est_n
         |        FROM pc LEFT JOIN cells USING (row, cell) GROUP BY pc.tok)
         |SELECT top.tok, exact_n, est_n, est_n >= exact_n AS over
         |FROM top JOIN est ON est.tok = top.tok
         |ORDER BY exact_n DESC, top.tok""".stripMargin
    },
    "t26_group_zscore" ->
      """WITH st AS (SELECT lang, count(*) AS n, sum(n_chars) AS sx,
        |  sum(n_chars * n_chars) AS sxx FROM documents GROUP BY lang)
        |SELECT doc_id, d.lang, n_chars,
        |  round((CAST(n_chars AS DOUBLE) - CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
        |    / sqrt((CAST(sxx AS DOUBLE) -
        |        CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
        |      / (CAST(n AS DOUBLE) - 1.0)), 6) AS zscore
        |FROM documents d JOIN st ON d.lang = st.lang
        |ORDER BY doc_id""".stripMargin,
    "t1_token_stats" ->
      """SELECT doc_id,
        |  len(regexp_split_to_array(trim(text), '\s+')) AS n_ws,
        |  len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS n_sub
        |FROM documents ORDER BY doc_id""".stripMargin,
    "t2_quality" ->
      s"""WITH t AS (SELECT doc_id, text,
         |  regexp_split_to_array(lower(trim(text)), '\\s+') AS toks FROM documents)
         |SELECT doc_id, ${OracleSqlParts.qualitySql("text", "toks")} AS quality
         |FROM t ORDER BY doc_id""".stripMargin,
    "t17_source_cap" ->
      s"""WITH t AS (SELECT doc_id, source, text,
         |  regexp_split_to_array(lower(trim(text)), '\\s+') AS toks FROM documents),
         |q AS (SELECT doc_id, source,
         |  ${OracleSqlParts.qualitySql("text", "toks")} AS quality FROM t),
         |r AS (SELECT doc_id, source, quality,
         |  row_number() OVER (PARTITION BY source
         |                     ORDER BY quality DESC, doc_id) AS rank_in_source
         |  FROM q)
         |SELECT doc_id, source, quality, rank_in_source FROM r
         |WHERE rank_in_source <= 10 ORDER BY doc_id""".stripMargin,
    "t3_lang_id" -> {
      val markers = TextFns.langMarkers.map { case (lang, ws) =>
        lang -> ws.map(w => s"'$w'").mkString(", ")
      }
      val scoreCols = markers.map { case (lang, ws) =>
        s"  len(list_filter(toks, x -> x IN ($ws))) AS s_$lang"
      }.mkString(",\n")
      val langs = markers.map(_._1)
      val gr = langs.map(l => s"s_$l").mkString("greatest(", ", ", ")")
      val cases = langs.map(l =>
        s"  WHEN s_$l = $gr AND s_$l > 0 THEN '$l'").mkString("\n")
      s"""WITH t AS (SELECT doc_id,
         |  regexp_split_to_array(lower(trim(text)), '\\s+') AS toks FROM documents),
         |s AS (SELECT doc_id,
         |$scoreCols
         |FROM t)
         |SELECT doc_id, CASE
         |$cases
         |  ELSE 'und' END AS lang_guess
         |FROM s ORDER BY doc_id""".stripMargin
    },
    "p3_remove_tags" ->
      """SELECT doc_id,
        |  regexp_replace(replace(replace(replace(replace(
        |    regexp_replace('<p>' || text || '</p> &amp; <br/>', '<[^>]*>', '', 'g'),
        |    '&amp;', '&'), '&lt;', '<'), '&gt;', '>'), '&quot;', '"'),
        |    '&#39;|&apos;', '''', 'g') AS stripped
        |FROM documents ORDER BY doc_id""".stripMargin,
    "p6_concat" ->
      """SELECT doc_id, concat_ws(chr(10), lang, source, text) AS joined
        |FROM documents ORDER BY doc_id""".stripMargin,
    "p5_entities" ->
      """SELECT doc_id, 'Entities: ' || array_to_string(list_transform(list_filter(
        |    [{'name': source, 'relevance': n_chars/500.0},
        |     {'name': lang, 'relevance': 0.9}],
        |    x -> x.relevance >= 0.8), x -> x.name), ', ') AS entities
        |FROM documents ORDER BY doc_id""".stripMargin,
    // round-trip identity: the oracle is the logical INPUT
    "p16_csv_roundtrip" ->
      """SELECT doc_id, text, lang FROM documents
        |UNION ALL SELECT -3, 'comma, "quoted", and' || chr(10) || 'newline mix', 'zz'
        |UNION ALL SELECT -2, 'line one' || chr(10) || 'line two' || chr(10) || 'line three', 'yy'
        |UNION ALL SELECT -1, 'plain, with commas, only', 'xx'
        |ORDER BY doc_id""".stripMargin,
    "p17_jsonl_roundtrip" ->
      """SELECT doc_id, text, lang FROM documents
        |UNION ALL SELECT -3, 'quotes " and \ backslash', 'zz'
        |UNION ALL SELECT -2, 'line one' || chr(10) || 'line two', 'yy'
        |UNION ALL SELECT -1, 'José «café» — ünïcode', 'xx'
        |ORDER BY doc_id""".stripMargin,
    "p18_orc_roundtrip" ->
      """SELECT doc_id, text, lang FROM documents
        |UNION ALL SELECT -3, 'nul-adjacent ' || chr(1) || ' control and "quotes"', 'zz'
        |UNION ALL SELECT -2, 'line one' || chr(10) || 'line two' || chr(9) || 'tab', 'yy'
        |UNION ALL SELECT -1, 'José «café» — ünïcode', 'xx'
        |ORDER BY doc_id""".stripMargin,
    "p19_partition_prune" ->
      """SELECT doc_id, lang, length(text) AS text_len FROM documents
        |WHERE lang IN ('en', 'de')
        |ORDER BY doc_id""".stripMargin,
    "p20_compaction" ->
      """SELECT doc_id, lang, length(text) AS text_len FROM documents
        |ORDER BY doc_id""".stripMargin,
    "p21_manifest_read" ->
      """SELECT doc_id, lang, length(text) AS text_len FROM documents
        |WHERE doc_id BETWEEN 100 AND 149
        |ORDER BY doc_id""".stripMargin,
    "p22_bloom_prune" ->
      """SELECT doc_id, lang, length(text) AS text_len FROM documents
        |WHERE doc_id IN (3, 57, 111, 222, 444)
        |ORDER BY doc_id""".stripMargin,
    "p23_time_travel" ->
      """SELECT doc_id, lang, length(text) AS text_len FROM documents
        |WHERE doc_id < 250
        |ORDER BY doc_id""".stripMargin,
    // erasure must be logically invisible: latest version ≡ the raw
    // table minus the erased band
    "p24_gdpr_erase" ->
      """SELECT doc_id, lang, length(text) AS text_len FROM documents
        |WHERE doc_id NOT BETWEEN 100 AND 299
        |ORDER BY doc_id""".stripMargin,
    "p25_gdpr_erase_keys" ->
      """SELECT doc_id, lang, length(text) AS text_len FROM documents
        |WHERE doc_id NOT IN (3, 57, 111, 222, 444)
        |ORDER BY doc_id""".stripMargin,
    // merge-on-read erasure is logically invisible too: same answer as
    // the copy-on-write key erase, zero files rewritten
    "p39_dv_delete" ->
      """SELECT doc_id, lang, length(text) AS text_len FROM documents
        |WHERE doc_id NOT IN (3, 57, 111, 222, 444)
        |ORDER BY doc_id""".stripMargin,
    // the evolving merge replayed raw: existing docs (scored where the
    // source matched) plus the inserted shifted docs
    "p40_merge_evolve" ->
      """SELECT doc_id, lang, length(text) AS text_len,
        |       CASE WHEN doc_id % 5 = 0 THEN doc_id * 2 END AS score
        |FROM documents
        |UNION ALL
        |SELECT doc_id + 1000000, lang, length(text),
        |       (doc_id + 1000000) * 2
        |FROM documents WHERE doc_id % 3 = 0
        |ORDER BY doc_id""".stripMargin,
    // merge-on-read update is invisible: the CASE projection
    "p43_dv_update" ->
      """SELECT doc_id,
        |       CASE WHEN doc_id % 50 = 0 THEN 'xx' ELSE lang END AS lang,
        |       length(text) AS text_len
        |FROM documents
        |ORDER BY doc_id""".stripMargin,
    // a rename is invisible to the data: the raw column, aliased
    "p42_rename" ->
      """SELECT doc_id, lang AS language, length(text) AS text_len
        |FROM documents
        |ORDER BY doc_id""".stripMargin,
    // three CALL maintenance statements must be logically invisible
    // beyond the erasure itself
    "p44_sql_call" ->
      """SELECT doc_id, lang, length(text) AS text_len FROM documents
        |WHERE doc_id NOT IN (5, 77, 303)
        |ORDER BY doc_id""".stripMargin,
    // append history minus the erased keys; the pack is invisible
    "p46_compact_small" ->
      """SELECT doc_id, lang, length(text) AS text_len FROM documents
        |WHERE doc_id < 400 AND doc_id NOT IN (9, 309)
        |ORDER BY doc_id""".stripMargin,
    // the clone still serves the ORIGINAL content after the source's
    // destructive history
    "p51_shallow_clone" ->
      """SELECT doc_id, lang, length(text) AS text_len FROM documents
        |ORDER BY doc_id""".stripMargin,
    // the tag pins v1 through append + compact + vacuum
    "p50_tag_travel" ->
      """SELECT doc_id, lang, length(text) AS text_len FROM documents
        |WHERE doc_id < 400
        |ORDER BY doc_id""".stripMargin,
    // merge-on-read UPDATE ≡ a CASE projection
    "p48_mor_sql_update" ->
      """SELECT doc_id,
        |  CASE WHEN doc_id >= 100 AND doc_id < 300 THEN upper(lang)
        |       ELSE lang END AS lang,
        |  length(text) AS text_len
        |FROM documents
        |ORDER BY doc_id""".stripMargin,
    // merge-on-read MERGE ≡ the upsert replayed relationally:
    // target = docs < 400, source = docs in [300, 500) with lang 'xx'
    "p49_mor_sql_merge" ->
      """SELECT doc_id,
        |  CASE WHEN doc_id >= 300 THEN 'xx' ELSE lang END AS lang,
        |  length(text) AS text_len
        |FROM documents
        |WHERE doc_id < 500
        |ORDER BY doc_id""".stripMargin,
    // replace-where ≡ a slice-wise CASE over the raw table
    "p47_replace_where" ->
      """SELECT doc_id,
        |  CASE WHEN doc_id >= 100 AND doc_id < 300 THEN upper(lang)
        |       ELSE lang END AS lang,
        |  length(text) AS text_len
        |FROM documents
        |ORDER BY doc_id""".stripMargin,
    // merge-on-read SQL DELETE ≡ predicate negation
    "p45_mor_sql_delete" ->
      """SELECT doc_id, lang, length(text) AS text_len FROM documents
        |WHERE NOT (doc_id IN (7, 107, 207) OR doc_id >= 5800)
        |ORDER BY doc_id""".stripMargin,
    // string-footer pruning is invisible: the raw predicate's answer
    "p41_string_prune" ->
      """SELECT doc_id, lang, length(text) AS text_len FROM documents
        |WHERE lang = 'en'
        |ORDER BY doc_id""".stripMargin,
    // restore is logically invisible: latest ≡ the raw table
    "p26_restore" ->
      """SELECT doc_id, lang, length(text) AS text_len FROM documents
        |ORDER BY doc_id""".stripMargin,
    // the v1 → v3 diff replayed from the raw table
    "p27_change_feed" ->
      """SELECT * FROM (
        |  SELECT doc_id, lang, length(text) AS text_len,
        |         'delete' AS change_type
        |  FROM documents WHERE doc_id BETWEEN 100 AND 299
        |  UNION ALL
        |  SELECT doc_id + 10000, lang, length(text), 'insert'
        |  FROM documents WHERE doc_id < 50)
        |ORDER BY change_type, doc_id""".stripMargin,
    // the overwrite SELECT replayed raw
    "p34_sql_overwrite" ->
      """SELECT doc_id, lang, length(text) AS text_len FROM documents
        |WHERE doc_id BETWEEN 200 AND 399
        |ORDER BY doc_id""".stripMargin,
    // the update as a CASE projection over the raw table
    "p35_sql_update" ->
      """SELECT doc_id,
        |  CASE WHEN doc_id >= 200 AND doc_id < 300
        |       THEN lang || '-r' ELSE lang END AS lang,
        |  CASE WHEN doc_id >= 200 AND doc_id < 300
        |       THEN length(substring(text, 1, 40)) ELSE length(text)
        |       END AS text_len
        |FROM documents ORDER BY doc_id""".stripMargin,
    // delete-filter + update-case + insert-union over the raw table
    "p36_sql_merge" ->
      """SELECT doc_id,
        |  CASE WHEN doc_id BETWEEN 320 AND 399 THEN 'dup' ELSE lang END
        |    AS lang,
        |  length(text) AS text_len
        |FROM documents
        |WHERE doc_id < 500 AND doc_id NOT BETWEEN 300 AND 319
        |ORDER BY doc_id""".stripMargin,
    // union-read + partial backfill as one CASE projection
    "p37_schema_evolution" ->
      """SELECT doc_id, lang,
        |  CASE WHEN doc_id < 100 THEN CAST(-1 AS BIGINT)
        |       WHEN doc_id BETWEEN 300 AND 499
        |       THEN CAST(doc_id * 7 AS BIGINT) END AS score
        |FROM documents WHERE doc_id < 500
        |ORDER BY doc_id""".stripMargin,
    // the expected version log as literals
    "p38_sql_history" ->
      """SELECT * FROM (VALUES (1, 1, 3), (2, 1, 4), (3, 3, 4))
        |  AS t(version, n_entries, n_columns)
        |ORDER BY version""".stripMargin,
    // SQL deletion ≡ predicate negation on the raw table
    "p33_sql_delete" ->
      """SELECT doc_id, lang, length(text) AS text_len FROM documents
        |WHERE NOT (doc_id >= 300 AND doc_id < 400)
        |  AND doc_id NOT IN (3, 57, 111)
        |ORDER BY doc_id""".stripMargin,
    // the v1 → v3 diff replayed raw, with the v1 row count alongside
    "p32_sql_table_changes" ->
      """SELECT c.*, (SELECT count(*) FROM documents) AS v1_rows FROM (
        |  SELECT doc_id, lang, length(text) AS text_len,
        |         'delete' AS change_type
        |  FROM documents WHERE doc_id BETWEEN 100 AND 299
        |  UNION ALL
        |  SELECT doc_id + 10000, lang, length(text), 'insert'
        |  FROM documents WHERE doc_id < 50) c
        |ORDER BY change_type, doc_id""".stripMargin,
    // the pinned v1 (doc_id < 250) + the pushed filter, replayed raw
    "p28_v2_read" ->
      """SELECT doc_id, lang, length(text) AS text_len FROM documents
        |WHERE doc_id >= 100 AND doc_id < 250
        |ORDER BY doc_id""".stripMargin,
    // bootstrap + connector append ≡ the raw table
    "p30_v2_write" ->
      """SELECT doc_id, lang, length(text) AS text_len FROM documents
        |ORDER BY doc_id""".stripMargin,
    // runtime pruning is logically invisible: the raw join, replayed
    "p31_v2_runtime_filter" ->
      """SELECT d.lang, count(*) AS n,
        |  CAST(sum(d.doc_id) AS BIGINT) AS id_sum,
        |  CAST(sum(length(d.text)) AS BIGINT) AS len_sum
        |FROM documents d
        |JOIN (SELECT doc_id AS k FROM documents
        |      WHERE doc_id >= 100 AND doc_id < 150) dim
        |  ON d.doc_id = dim.k
        |GROUP BY d.lang ORDER BY d.lang""".stripMargin,
    // re-layout is logically invisible: the raw two-dim filter
    "p29_zorder_optimize" ->
      """SELECT event_id, user_id, event_type FROM events
        |WHERE user_id < 100 AND event_id < 1000
        |ORDER BY event_id""".stripMargin,
    "p12_parse_tags" ->
      """WITH t AS (SELECT doc_id,
        |  CASE WHEN doc_id % 7 = 0 THEN substr(text, 1, 50)
        |       ELSE '<title>' || substr(text, 1, 30) || '</title><summary>' ||
        |            substr(text, 1, 120) || '</summary>' END AS llm
        |FROM documents)
        |SELECT doc_id,
        |  CASE WHEN regexp_matches(llm, '(?s)<title>.*?</title>')
        |       THEN regexp_extract(llm, '(?s)<title>(.*?)</title>', 1)
        |       ELSE '<Title>' END AS description,
        |  CASE WHEN regexp_matches(llm, '(?s)<summary>.*?</summary>')
        |       THEN regexp_extract(llm, '(?s)<summary>(.*?)</summary>', 1)
        |       ELSE llm END AS generated_summary
        |FROM t ORDER BY doc_id""".stripMargin,
    "p10_base64_json" ->
      """WITH j AS (SELECT doc_id,
        |  '{"id":' || doc_id || ',"title":"' || substr(text, 1, 20) || '"}' AS js
        |  FROM documents),
        |c AS (SELECT CASE WHEN doc_id % 13 = 0 THEN substr(js, 1, 10) ELSE js END AS js
        |      FROM j),
        |env AS (SELECT to_base64(encode(js)) AS env FROM c),
        |dec AS (SELECT decode(from_base64(env)) AS js FROM env)
        |SELECT json_extract(js, '$.id')::BIGINT AS id,
        |       json_extract_string(js, '$.title') AS title
        |FROM dec WHERE try_cast(js AS JSON) IS NOT NULL ORDER BY id""".stripMargin,
    "t9_entropy" ->
      """WITH toks AS (SELECT doc_id,
        |  unnest(regexp_split_to_array(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ')) AS t
        |  FROM documents),
        |tf AS (SELECT doc_id, t, count(*) AS c FROM toks GROUP BY 1, 2),
        |agg AS (SELECT doc_id, sum(c) AS n,
        |        CAST(sum(CAST(c * log2(c) AS DECIMAL(38,18))) AS DOUBLE) AS s
        |        FROM tf GROUP BY doc_id)
        |SELECT doc_id, round(log2(n) - s/n, 6) AS entropy
        |FROM agg ORDER BY doc_id""".stripMargin,
    "p13_dates" ->
      """WITH t AS (SELECT event_id,
        |  strftime(ts, '%Y-%m-%dT%H:%M:%S') || 'Z' AS iso FROM events)
        |SELECT event_id,
        |  strftime(strptime(regexp_replace(iso, 'Z$', ''), '%Y-%m-%dT%H:%M:%S'),
        |           '%Y-%m-%d %H:%M:%S') AS rendered
        |FROM t ORDER BY event_id""".stripMargin,
    "t10_vocab" ->
      """WITH toks AS (SELECT doc_id,
        |  unnest(regexp_split_to_array(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ')) AS t
        |  FROM documents)
        |SELECT t, count(*) AS n, count(DISTINCT doc_id) AS df
        |FROM toks GROUP BY t ORDER BY n DESC, t LIMIT 500""".stripMargin,
    "t11_length_filter" ->
      """WITH toks AS (SELECT doc_id, lang,
        |  len(regexp_split_to_array(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ')) AS n
        |  FROM documents),
        |r AS (SELECT doc_id, lang, n,
        |  ntile(10) OVER (PARTITION BY lang ORDER BY n, doc_id) AS decile FROM toks)
        |SELECT doc_id, lang, n, decile FROM r
        |WHERE decile BETWEEN 2 AND 9 ORDER BY doc_id""".stripMargin,
    "t18_percentiles" ->
      """WITH toks AS (SELECT lang,
        |  len(regexp_split_to_array(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ')) AS n
        |  FROM documents)
        |SELECT lang, count(*) AS n_docs, min(n) AS min_toks,
        |  round(quantile_cont(n, 0.5), 4) AS p50_toks,
        |  round(quantile_cont(n, 0.9), 4) AS p90_toks,
        |  max(n) AS max_toks
        |FROM toks GROUP BY lang ORDER BY lang""".stripMargin)
}
