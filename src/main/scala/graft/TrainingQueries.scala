package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{TextFns, VectorFns}
import graft.operators.{Summarize, TemporalJoins}

/** Training-corpus curation operators: the Gopher-style quality rules,
  * repetition/boilerplate detection, PII scrubbing, sequence packing,
  * and stratified sampling a pretraining data pipeline runs at corpus
  * scale. Every one is codegen'd built-ins and oracle-checked.
  */
object TrainingQueries {

  import org.apache.spark.sql.Column

  private def stopList: String = OracleSqlParts.stopList

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // repetition ratio over word bigrams (boilerplate signal); tokens
    // materialized once per row in their own projection
    "t4_repetition" -> ((s, dir) =>
      Tables.documents(s, dir)
        .withColumn("__toks", TextFns.repetitionTokens(col("text")))
        .select(
          col("doc_id"),
          TextFns.repetitionRatioTokens(col("__toks"), 2).as("rep2"))
        .orderBy(col("doc_id"))),

    // Gopher-style quality rule set with the pass verdict
    "t5_gopher" -> ((s, dir) => {
      val toks = split(trim(col("text")), "\\s+")
      val nWords = size(toks).cast("long")
      val hasStop = size(filter(split(lower(trim(col("text"))), "\\s+"),
        t => t.isin(TextFns.stopwordsEn: _*))) > 0
      Tables.documents(s, dir).select(
        col("doc_id"),
        nWords.as("n_words"),
        TextFns.meanWordLength(col("text")).as("mean_wl"),
        TextFns.symbolRatio(col("text")).as("symbol_ratio"),
        hasStop.as("has_stopword"),
        (nWords.between(5, 100000) &&
          TextFns.meanWordLength(col("text")).between(2.0, 12.0) &&
          TextFns.symbolRatio(col("text")) < 0.1 && hasStop).as("passes"))
        .orderBy(col("doc_id"))
    }),

    // PII/URL scrub (emails + links injected deterministically)
    "t6_redact" -> ((s, dir) =>
      Tables.documents(s, dir).select(
        col("doc_id"),
        TextFns.redact(concat(
          lit("Contact bob@example.com or https://ex.org/a?b=1 end "),
          col("text"))).as("redacted"))
        .orderBy(col("doc_id"))),

    // greedy sequence packing: cumulative token count → 2048-token bins.
    // Distributed two-level prefix sum: the per-document running total
    // comes from a PARTITIONED window within id-range chunks plus a
    // chunk offset computed from per-chunk totals — the only ordered
    // global pass runs over #chunks rows (1/1000th of the corpus), not
    // the corpus itself. (Recurse levels at extreme scale; a single
    // global `Window.orderBy` would drag every row through one
    // partition.) Results identical to the naive global cumsum.
    "t7_pack_bins" -> ((s, dir) => {
      val base = Tables.documents(s, dir)
        .select(col("doc_id"),
          TextFns.tokenCountWs(col("text")).cast("long").as("n_tok"))
        .withColumn("chunk", floor(col("doc_id") / 1000).cast("long"))
      val chunkW = Window.orderBy(col("chunk"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val offsets = base.groupBy(col("chunk")).agg(sum(col("n_tok")).as("ctot"))
        .withColumn("coffset", sum(col("ctot")).over(chunkW) - col("ctot"))
        .select(col("chunk"), col("coffset"))
      val inW = Window.partitionBy(col("chunk")).orderBy(col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      base.join(broadcast(offsets), "chunk")
        .withColumn("cum", sum(col("n_tok")).over(inW) + col("coffset"))
        .withColumn("bin", floor((col("cum") - col("n_tok")) / 2048).cast("long"))
        .select(col("doc_id"), col("n_tok"), col("bin"))
        .orderBy(col("doc_id"))
    }),

    // unigram log-likelihood quality proxy (the KenLM-perplexity slot in
    // a CCNet-style pipeline, with the corpus's own unigram distribution
    // standing in for the LM): score = mean log p(token). Two shuffles
    // (token freq + doc regroup); the frequency table is corpus-wide
    // state a real deployment would broadcast from a vocab build (t10).
    "t13_freq_quality" -> ((s, dir) => {
      val tok = Tables.documents(s, dir).select(col("doc_id"), explode(
        split(regexp_replace(lower(trim(col("text"))), "\\s+", " "), " ")).as("t"))
      val freq = tok.groupBy(col("t")).agg(count(lit(1)).as("n"))
      val total = freq.agg(sum(col("n")).as("tot"))
      tok.join(freq, "t").crossJoin(broadcast(total))
        .groupBy(col("doc_id"))
        // portable mean of log-probs: decimal sum / count (see header)
        .agg(round(sum(log(col("n") / col("tot")).cast("decimal(38,18)"))
          .cast("double") / count(lit(1)), 6).as("log_p"))
        .orderBy(col("doc_id"))
    }),

    // Bigram LM scoring — one rung up from t13's unigram fill of the
    // KenLM-perplexity slot: per-doc mean log P(w2|w1) under corpus
    // bigram counts with add-0.5 smoothing (V = distinct continuations).
    // Plan: bigram explode is map-side (zip_with over the token array,
    // no re-tokenize); two count shuffles over the bigram/prefix vocab;
    // the per-doc join is hash-partitioned on bounded-cardinality keys.
    "t12_bigram_lm" -> ((s, dir) => {
      val toks = Tables.documents(s, dir).select(col("doc_id"),
        TextFns.repetitionTokens(col("text")).as("t"))
      // native single-pass bigram expression — the zip_with/slice HOF
      // chain it replaces evaluated interpreted (HOFs are eval-only)
      // and materialized two sliced array copies per row, which is what
      // a cold/loaded box amplified in BENCH_r08 (t12 46 s official vs
      // 1.75 s warm isolated)
      val pairs = TextFns.tokenBigrams(col("t"))
      val big = toks.filter(size(col("t")) >= 2)
        .select(col("doc_id"), explode(pairs).as("bg"))
        .select(col("doc_id"), col("bg.w1").as("w1"), col("bg.w2").as("w2"))
      val bc = big.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c"))
      // prefix counts and vocab size derive from the (much smaller)
      // bigram-count table, not from re-exploding the corpus: pre(w1) =
      // Σ_w2 c(w1,w2) and |V| = |distinct w2 in bc| are identities, and
      // deriving them here cuts the tokenize+explode passes from 4 to 2
      // (bc build + the final per-doc join probe)
      val pc = bc.groupBy(col("w1")).agg(sum(col("c")).as("pre"))
      val vocab = bc.agg(countDistinct(col("w2")).as("v"))
      big.join(bc, Seq("w1", "w2")).join(pc, Seq("w1"))
        .crossJoin(broadcast(vocab))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_bigrams"),
          // portable mean of log-probs: decimal sum / count (see header)
          round(sum(log((col("c") + 0.5) / (col("pre") + col("v") * 0.5))
            .cast("decimal(38,18)")).cast("double") / count(lit(1)), 6)
            .as("log_p"))
        .orderBy(col("doc_id"))
    }),

    // stratified sampling: portable md5-derived bucket, per-language
    // rate. Accept is the EXACT integer cross-multiply
    // bucket/256 < rate/100 (a modulo fold `bucket % 100 < rate` is
    // biased: low residues occur 3/256, high ones 2/256, so rate 50
    // would actually keep 58.6%).
    "t8_sample" -> ((s, dir) => {
      val bucket = conv(substring(md5(col("doc_id").cast("string")), 1, 2), 16, 10)
        .cast("long")
      val rate = when(col("lang") === "en", 50L)
        .when(col("lang") === "de", 30L).otherwise(10L)
      Tables.documents(s, dir)
        .filter(bucket * lit(100L) < rate * lit(256L))
        .select(col("doc_id"), col("lang"))
        .orderBy(col("doc_id"))
    }),

    // Per-GROUP exact-quota sample — completes the sampling family
    // (t8: rate per language; t22: exact global N; this: exactly
    // min(N, |group|) per language, uniform within the group): rank on
    // the seeded md5 key within each language, keep rank ≤ N. Catalyst
    // plans the rank filter as a map-side WindowGroupLimit BELOW the
    // lang exchange (the t17 shape), so each input partition ships at
    // most N rows per language — a hot language cannot flood a shuffle
    // partition, and the full corpus never sorts.
    "t23_group_sample" -> ((s, dir) => {
      val w = Window.partitionBy(col("lang")).orderBy(col("rk"), col("doc_id"))
      Tables.documents(s, dir)
        .select(col("doc_id"), col("lang"),
          md5(concat(lit("g7:"), col("doc_id").cast("string"))).as("rk"))
        .withColumn("rank", row_number().over(w).cast("long"))
        .filter(col("rank") <= 40)
        .select(col("doc_id"), col("lang"), col("rank"))
        .orderBy(col("doc_id"))
    }),

    // Context-window CHUNKING with overlap — the LLM pre-tokenization
    // split (max 128 tokens per chunk, 16-token overlap, stride 112):
    // every over-long document becomes ⌈(n−16)/112⌉ chunks, each
    // carrying its index and exact token count; chunks whose tokens
    // are fully covered by the previous window are not emitted. Pure
    // MAP-SIDE work — one scan, a per-row transform+explode, ZERO
    // exchanges before the presentation sort (PlanSpec pin) — so at
    // 100 TB it streams through the scan stage at IO speed and
    // composes with t7/t14's packing/sharding without adding a
    // shuffle of its own.
    "t25_seq_chunk" -> ((s, dir) => {
      val win = 128
      val step = 112
      val nChunk = greatest(
        ceil((col("__n") - lit(16)) / lit(step.toDouble)).cast("int"), lit(1))
      // the test corpus is short-doc; 4× self-concatenation makes the
      // multi-chunk path non-vacuous (docs up to ~4× max length)
      Tables.documents(s, dir)
        .select(col("doc_id"),
          concat_ws(" ", col("text"), col("text"), col("text"), col("text"))
            .as("text"))
        .withColumn("__toks", split(trim(col("text")), "\\s+"))
        .withColumn("__n", size(col("__toks")))
        .select(col("doc_id"), posexplode(
          transform(sequence(lit(0), nChunk - 1), i => struct(
            array_join(slice(col("__toks"), i * step + 1, lit(win)), " ").as("chunk"),
            least(col("__n") - i * step, lit(win)).cast("long").as("n_tokens")))))
        .select(col("doc_id"), col("pos").cast("long").as("chunk_idx"),
          col("col.chunk").as("chunk"), col("col.n_tokens").as("n_tokens"))
        .orderBy(col("doc_id"), col("chunk_idx"))
    }),

    // Within-document consecutive-repetition removal — the complement
    // of d17's cross-document strip (and the transform behind t4's
    // repetition SCORE): a run of identical consecutive segments
    // collapses to its first occurrence, reassembled in order. PURE
    // per-document work, computed per document (optimization r15, guide
    // §2.4 — the t16 winnowing-fusion discipline applied to the next
    // explode-heavy text path): the former dataflow exploded one row
    // per 5-token segment, paid a corpus-wide doc_id exchange + window
    // sort for lag(), and a regroup aggregation — all to compare each
    // array element with its predecessor. The fused form keeps the
    // segment array in-row and drops consecutive duplicates with an
    // indexed filter; ZERO exchanges before the presentation sort,
    // identical rows (the lag/filter/regroup replica is spec-pinned in
    // RepeatStripSpec and the oracle replays the old dataflow in SQL).
    "t24_repeat_strip" -> ((s, dir) => {
      // plant a 3×-repeated 5-token phrase at the FRONT of every 7th doc
      // (prepended so the repeats align to the fixed 5-token segment
      // grid; appending would split them across segment boundaries)
      val rp = "rp1 rp2 rp3 rp4 rp5"
      val corpus = Tables.documents(s, dir).select(col("doc_id"),
        when(col("doc_id") % 7 === 0,
          concat(lit(s"$rp $rp $rp "), col("text")))
          .otherwise(col("text")).as("text"))
      graft.operators.SegmentDedup
        .stripConsecutiveRepeats(corpus, "doc_id", "text", segLen = 5)
        .orderBy(col("doc_id"))
    }),

    // EXACT-budget deterministic sample — t8 samples at a RATE (output
    // size varies with the corpus); this draws exactly N docs, uniformly
    // and reproducibly, by ranking on a seeded md5 key. Plan: Catalyst
    // turns sort+limit into TakeOrderedAndProject — a per-partition
    // top-N heap merged at the driver (N rows per partition move, never
    // a global sort/range exchange). The "give me exactly 10M docs for
    // this ablation" op; re-running with the same seed reproduces the
    // set bit-for-bit on any engine or partitioning.
    "t22_exact_sample" -> ((s, dir) =>
      Tables.documents(s, dir)
        .select(col("doc_id"), col("lang"),
          md5(concat(lit("s42:"), col("doc_id").cast("string"))).as("rk"))
        .orderBy(col("rk"), col("doc_id"))
        .limit(120)
        .orderBy(col("doc_id"))),

    // STRATIFIED train/val/test split with EXACT per-stratum quotas —
    // the reproducible split every training run needs: within each
    // language, docs are ordered by a seeded md5 key (a pure function
    // of (seed, doc_id) — re-runs, cluster resizes, and the oracle all
    // produce the same assignment) and the 80/10/10 cut is taken on
    // row_number vs the stratum count, so quotas are exact integers,
    // never a Bernoulli approximation. ONE shuffle on lang + a
    // per-stratum window; skew is bounded by the hottest language —
    // the honest cost of per-stratum exactness (a quota-free split
    // would be t8's pure map-side filter).
    "t30_stratified_split" -> ((s, dir) => {
      val w = Window.partitionBy(col("lang"))
        .orderBy(col("rk"), col("doc_id"))
      Tables.documents(s, dir)
        .select(col("doc_id"), col("lang"),
          md5(concat(lit("split:"), col("doc_id").cast("string"))).as("rk"))
        .withColumn("rn", row_number().over(w))
        .withColumn("n", count(lit(1)).over(Window.partitionBy(col("lang"))))
        .select(col("doc_id"), col("lang"),
          when(col("rn") * 10 <= col("n") * 8, "train")
            .when(col("rn") * 10 <= col("n") * 9, "val")
            .otherwise("test").as("split"))
        .orderBy(col("doc_id"))
    }),

    // MERGEABLE histogram quantiles — the 100 TB percentile path next
    // to t18's exact form: per-(lang, bin) counts are a bounded,
    // associative sketch (state ≤ max_tokens/16 bins per group however
    // many documents flow through — partial-aggregated map-side, one
    // shuffle), and the p50/p90 read-off is the first bin whose
    // cumulative count crosses the quantile, reported as the bin's
    // inclusive upper edge. All-integer, so the estimate is
    // deterministic and the oracle replays it exactly; error is
    // bounded by the bin width by construction.
    "t32_hist_quantile" -> ((s, dir) => {
      val binW = 16L
      val cumW = Window.partitionBy(col("lang")).orderBy(col("bin"))
      Tables.documents(s, dir)
        .select(col("lang"),
          size(TextFns.repetitionTokens(col("text"))).cast("long").as("n"))
        .groupBy(col("lang"), expr(s"n div $binW").as("bin"))
        .agg(count(lit(1)).as("c"))
        .withColumn("cum", sum(col("c")).over(cumW))
        .withColumn("total",
          sum(col("c")).over(Window.partitionBy(col("lang"))))
        .groupBy(col("lang"))
        .agg(max(col("total")).as("n_docs"),
          (min(when(col("cum") * 2 >= col("total"), col("bin")))
            * binW + (binW - 1)).as("p50_est"),
          (min(when(col("cum") * 10 >= col("total") * 9, col("bin")))
            * binW + (binW - 1)).as("p90_est"))
        .orderBy(col("lang"))
    }),

    // deterministic global shuffle + fixed shard layout (the training
    // last mile): shard and in-shard order both derive from one portable
    // md5 key, so the permutation is a pure function of (seed, id) —
    // reproducible across runs/cluster sizes and replayable by the
    // oracle. ONE hash shuffle + per-shard local sort; never a global
    // sort/range exchange (ShardingSpec pins the plan).
    "t14_shard_shuffle" -> ((s, dir) =>
      graft.operators.Sharding.shuffleShards(
        Tables.documents(s, dir), "doc_id", nShards = 8)
        .orderBy(col("shard"), col("pos"))),

    // temperature-scaled domain mixing (the multilingual up-sampling /
    // mixture-weights shape, cf. XLM-R exponentiated smoothing): keep
    // probability per language p_d ∝ n_d^(α−1) with α = 0.5, normalized
    // so the rarest language keeps everything — accept rate
    // r_d = floor(10000·sqrt(n_min/n_d)) per 10000.
    // PORTABLE: IEEE-754 requires /, sqrt and * to be exactly rounded,
    // so both engines compute the identical double before floor.
    // Accept is the EXACT integer cross-multiply bucket/65536 <
    // rate/10000 over the full 16-bit md5 bucket — a `% 10000` fold of
    // the bucket is modulo-biased (low residues 7/65536, high 6/65536,
    // distorting mid-rate languages by up to ~7% relative), and ONE
    // conv() call per row beats four digit extractions.
    // Plan: one tiny count shuffle on lang + a broadcast join back —
    // the corpus never shuffles; accept is a map-side bucket filter
    // (same idiom as t8).
    "t15_mixing" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val counts = docs.groupBy(col("lang")).agg(count(lit(1)).as("n_d"))
      val rates = counts.crossJoin(broadcast(counts.agg(min(col("n_d")).as("n_min"))))
        .select(col("lang"),
          floor(sqrt(col("n_min").cast("double") / col("n_d").cast("double")) * 10000)
            .cast("long").as("rate"))
      val bucket = conv(
        substring(md5(concat(lit("mix:"), col("doc_id").cast("string"))), 1, 4), 16, 10)
        .cast("long")
      docs.join(broadcast(rates), Seq("lang"))
        .filter(bucket * lit(10000L) < col("rate") * lit(65536L))
        .select(col("doc_id"), col("lang"), col("rate"))
        .orderBy(col("doc_id"))
    }),

    // WEIGHTED priority sampling — fixed-size-per-stratum sampling
    // with inclusion biased by an integer weight (the loss-weighted /
    // quality-weighted mixing step t8/t15's uniform samplers can't
    // express). Priority-sampling shape (Duffield-Lund-Thorup: rank by
    // weight / uniform) with the uniform QUANTIZED to a 28-bit hash
    // and the rank computed as the exact integer quotient
    // (weight · 2^34) div h — deterministic, shuffle-free to evaluate,
    // reproducible bit-for-bit on any engine (no float ordering), and
    // a pure function of (seed, doc_id, weight) so re-runs and
    // retries sample identically. Ties (equal quotients) break by
    // (h, doc_id) — a total order. One exchange on lang; the top-20
    // cut rides the same window.
    "t33_weighted_sample" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("lang"))
        .orderBy(col("pri").desc, col("__h").asc, col("doc_id").asc)
      Tables.documents(s, dir)
        .withColumn("weight", least(length(col("text")), lit(4000)).cast("long"))
        .withColumn("__h", conv(substring(
            md5(concat(lit("ws:"), col("doc_id").cast("string"))), 1, 7),
          16, 10).cast("long") + lit(1L))
        .withColumn("pri",
          expr("(weight * CAST(17179869184 AS BIGINT)) div __h"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 20)
        .select(col("lang"), col("doc_id"), col("weight"), col("pri"),
          col("rn").cast("long").as("rn"))
        .orderBy(col("lang"), col("rn"))
    }),

    // winnowing document fingerprints (Schleimer et al., the MOSS
    // local fingerprint): k=8 char-gram 28-bit md5 hashes, window w=4,
    // min per window with rightmost tie-break. See operators/Winnowing
    // for the portable argmin encoding and the one-exchange plan.
    "t16_fingerprint" -> ((s, dir) =>
      graft.operators.Winnowing.fingerprints(
        Tables.documents(s, dir), "doc_id", "text", k = 8, w = 4)
        .orderBy(col("doc_id"), col("pos"), col("fp"))),

    // Order-independent per-shard table digest — the anti-entropy /
    // replica-verification primitive: at 100 TB you prove two copies of
    // a table identical by comparing k digest rows, not by moving data.
    // Each row hashes to a 60-bit md5 value; a shard's digest is the SUM
    // of its row hashes mod 2^61 — addition is commutative, so the
    // digest is independent of row order, partitioning, and merge
    // schedule, and one misplaced/corrupted/missing row changes it.
    // Exact decimal(38,0) summation (no long overflow: 1e12 rows ×
    // 2^60 ≈ 1.2e30 < 1e38), mod folded to BIGINT for the output. One
    // map-side hash + one tiny shuffle on the shard key.
    "t20_table_digest" -> ((s, dir) => {
      // Nullable fields go through coalesce(<field>, NUL) so both
      // engines build the IDENTICAL digest string: Spark's concat_ws
      // SKIPS null arguments while DuckDB's || PROPAGATES null (nulling
      // the whole hash), and a skipped field would also let distinct
      // rows ("a", NULL) vs (NULL, "a") collide. NUL can't appear in
      // real lang/source values, so the sentinel is collision-free.
      def nn(c: org.apache.spark.sql.Column) = coalesce(c, lit("\u0000"))
      val h = conv(substring(md5(concat_ws("|", lit("dig:"),
          col("doc_id").cast("string"), nn(md5(col("text"))),
          nn(col("lang")), nn(col("source")))), 1, 15), 16, 10).cast("long")
      val shard = (conv(substring(md5(concat(lit("dig-shard:"),
          col("doc_id").cast("string"))), 1, 2), 16, 10) % 4).cast("int")
      Tables.documents(s, dir)
        .select(shard.as("shard"), h.as("__h"))
        .groupBy(col("shard"))
        .agg(
          count(lit(1)).as("n_rows"),
          pmod(sum(col("__h").cast("decimal(38,0)")),
            lit(2305843009213693952L).cast("decimal(38,0)"))
            .cast("long").as("digest"))
        .orderBy(col("shard"))
    }),

    // Contamination SCORE — the graded form of d7's boolean verdict:
    // per training doc, the FRACTION of its 3-gram shingles present in
    // the held-out eval set (0 for clean docs — they stay in the
    // output, unlike d7's hits-only rows), so downstream picks the
    // drop threshold instead of inheriting any-overlap-drops. Same
    // broadcast eval-set plan as d7: corpus-side shingles probe the
    // broadcast map-side, one groupBy(doc) shuffle; the score is an
    // exact int ratio (single exactly-rounded division — portable).
    "t21_contamination" -> ((s, dir) => {
      val sh = Tables.documents(s, dir)
        .withColumn("__toks", TextFns.repetitionTokens(col("text")))
        .select(col("doc_id"),
          explode(TextFns.wordShinglesTokens(col("__toks"), 3)).as("sh"))
      val evalSh = sh.filter(col("doc_id") % 50 === 0)
        .select(col("sh")).distinct()
        .withColumn("__hit", lit(1))
      sh.filter(col("doc_id") % 50 =!= 0)
        .join(broadcast(evalSh), Seq("sh"), "left_outer")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_shingles"),
          sum(coalesce(col("__hit"), lit(0))).cast("long").as("n_hits"))
        .select(col("doc_id"), col("n_shingles"), col("n_hits"),
          round(col("n_hits").cast("double") / col("n_shingles"), 6)
            .as("contamination"))
        .orderBy(col("doc_id"))
    }),

    // KMV distinct-count sketch (functions/KmvSketch): distinct users per
    // event type estimated from the 32 smallest md5-derived 60-bit hashes
    // — bounded-state approximate COUNT(DISTINCT), the 100 TB substitute
    // for a full distinct shuffle. PORTABLE where HyperLogLog is not:
    // the DuckDB oracle replays the identical sketch (same md5 hash, a
    // row_number window) and the estimate arithmetic is exact-double
    // ((k−1)·2^60 has 5 significant bits; long→double cast and / are
    // exactly rounded on both engines). n ≥ k at every SF here, so the
    // estimator branch is the one under oracle test; the n < k exact
    // branch is spec-covered (KmvSketchSpec).
    "t19_kmv_distinct" -> ((s, dir) => {
      val k = 32
      val h = conv(substring(
          md5(concat(lit("kmv:"), col("user_id").cast("string"))), 1, 15), 16, 10)
        .cast("long")
      Tables.events(s, dir)
        .select(col("event_type"), h.as("__h"))
        .groupBy(col("event_type"))
        .agg(graft.functions.KmvSketch(col("__h"), k).as("__mins"))
        .select(
          col("event_type"),
          size(col("__mins")).cast("long").as("n_sketch"),
          when(size(col("__mins")) < k, size(col("__mins")).cast("double"))
            .otherwise(round(
              lit((k - 1).toDouble * 1152921504606846976.0) /
                element_at(col("__mins"), k).cast("double"), 4))
            .as("est_distinct"))
        .orderBy(col("event_type"))
    }),

    // Approx distinct per TIME WINDOW — t19's KMV sketch keyed by
    // event-time day instead of category (the dashboard "daily active
    // users" query at sketch cost): state is k=32 longs per day
    // regardless of traffic, merged map-side, so the user ids
    // themselves never shuffle; the estimate branch is exercised
    // (≈148 distinct users/day ≫ k). Same exact-replay portability as
    // t19 — the oracle rebuilds the sketch and the estimate
    // bit-identically.
    "w14_daily_distinct" -> ((s, dir) => {
      val k = 32
      val h = conv(substring(
          md5(concat(lit("kmv:"), col("user_id").cast("string"))), 1, 15), 16, 10)
        .cast("long")
      Tables.events(s, dir)
        .select(date_format(to_date(col("ts")), "yyyy-MM-dd").as("day"), h.as("__h"))
        .groupBy(col("day"))
        .agg(graft.functions.KmvSketch(col("__h"), k).as("__mins"))
        .select(
          col("day"),
          size(col("__mins")).cast("long").as("n_sketch"),
          when(size(col("__mins")) < k, size(col("__mins")).cast("double"))
            .otherwise(round(
              lit((k - 1).toDouble * 1152921504606846976.0) /
                element_at(col("__mins"), k).cast("double"), 4))
            .as("est_users"))
        .orderBy(col("day"))
    }),

    // THE BRIEF-SHAPED TRAINING-RELEASE PIPELINE (VERDICT r11 #5) —
    // the one query a training-data user actually ships, end to end:
    // exact dedup (keep-first) → decontaminate against the held-out
    // eval set → Gopher quality gate → temperature mixing → 2048-token
    // sequence packing → deterministic sharding, reported as the SHARD
    // MANIFEST (docs / tokens / bins / membership digest per shard).
    // Every stage reuses the unit-operator formulation its own oracle
    // row proves (d1/t29, t21/d7, t5, t15, t7, t14/t29, t20), and the
    // DuckDB oracle replays the WHOLE chain — one hash-green row
    // verifies the composition, and the t20-style id digest makes the
    // manifest sensitive to any single membership change anywhere up
    // the chain. Plan shape at 100 TB: the dedup pays one fingerprint
    // exchange; decontamination explodes shingles MAP-SIDE against the
    // broadcast eval shingles (the corpus never shuffles for it);
    // quality is a scan-fused filter; mixing is a tiny lang-count
    // aggregate broadcast back (corpus stays map-side); packing is
    // t7's two-level prefix sum (the ordered pass runs over #chunks
    // rows, never the corpus); the manifest pays the one shard
    // exchange it must. PlanSpec pins the exchange census.
    "t34_training_manifest" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      // 1. exact dedup, keep-first per normalized-text fingerprint
      val fpW = Window.partitionBy(col("fp")).orderBy(col("doc_id"))
      val dedup = docs
        .withColumn("fp", TextFns.fingerprint(col("text")))
        .withColumn("rn", row_number().over(fpW))
        .filter(col("rn") === 1)
        .select(col("doc_id"), col("lang"), col("text"))
      // 2. decontaminate: drop any candidate sharing a 5-gram shingle
      // with the eval set (doc_id % 50 == 0 — the d7/t29 convention).
      // Contaminated ids come from the RAW corpus — identical result
      // (anti join against a superset of the survivors' contaminated
      // ids) and the dedup subtree is not planned twice (t29)
      val shSrc = docs.withColumn("__rtoks",
        TextFns.repetitionTokens(col("text")))
      val evalSh = shSrc.filter(col("doc_id") % 50 === 0)
        .select(explode(TextFns.wordShinglesTokens(col("__rtoks"), 5)).as("sh"))
        .distinct()
      val contaminated = shSrc.filter(col("doc_id") % 50 =!= 0)
        .select(col("doc_id"),
          explode(TextFns.wordShinglesTokens(col("__rtoks"), 5)).as("sh"))
        .join(broadcast(evalSh), "sh")
        .select(col("doc_id")).distinct()
      val clean = dedup.filter(col("doc_id") % 50 =!= 0)
        .join(contaminated, Seq("doc_id"), "left_anti")
      // 3. quality gate — t5's Gopher pass verdict, verbatim
      val toksQ = split(trim(col("text")), "\\s+")
      val nWords = size(toksQ).cast("long")
      val hasStop = size(filter(split(lower(trim(col("text"))), "\\s+"),
        t => t.isin(TextFns.stopwordsEn: _*))) > 0
      val gated = clean.filter(
        nWords.between(5, 100000) &&
          TextFns.meanWordLength(col("text")).between(2.0, 12.0) &&
          TextFns.symbolRatio(col("text")) < 0.1 && hasStop)
      // The SURVIVOR MANIFEST — (doc_id, lang, n_tok), three scalars
      // per surviving doc — is materialized ONCE here (eager
      // localCheckpoint; at 100 TB this is the persisted inter-stage
      // table every release pipeline writes anyway). Four downstream
      // consumers read it (language counts, the mixing join, the
      // chunk-offset aggregate, the packed join): without the
      // materialization each consumer re-plans the whole
      // dedup+decontaminate+quality subtree — measured 30 exchanges vs
      // the pinned census, i.e. the dedup of a 100 TB corpus running
      // SIX times
      val survivors = gated.select(col("doc_id"), col("lang"),
          TextFns.tokenCountWs(col("text")).cast("long").as("n_tok"))
        .localCheckpoint(true)
      // 4. temperature mixing (t15, α = 0.5) with rates computed over
      // the SURVIVING corpus — the realistic order: mixture weights
      // reflect what is actually left after cleaning
      val counts = survivors.groupBy(col("lang")).agg(count(lit(1)).as("n_d"))
      val rates = counts
        .crossJoin(broadcast(counts.agg(min(col("n_d")).as("n_min"))))
        .select(col("lang"),
          floor(sqrt(col("n_min").cast("double") / col("n_d").cast("double"))
            * 10000).cast("long").as("rate"))
      val bucket = conv(substring(
          md5(concat(lit("mix:"), col("doc_id").cast("string"))), 1, 4), 16, 10)
        .cast("long")
      val mixed = survivors.join(broadcast(rates), Seq("lang"))
        .filter(bucket * lit(10000L) < col("rate") * lit(65536L))
      // 5. sequence packing (t7's two-level distributed prefix sum)
      val base = mixed.select(col("doc_id"), col("n_tok"))
        .withColumn("chunk", floor(col("doc_id") / 1000).cast("long"))
      val chunkW = Window.orderBy(col("chunk"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val offsets = base.groupBy(col("chunk")).agg(sum(col("n_tok")).as("ctot"))
        .withColumn("coffset", sum(col("ctot")).over(chunkW) - col("ctot"))
        .select(col("chunk"), col("coffset"))
      val inW = Window.partitionBy(col("chunk")).orderBy(col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val packed = base.join(broadcast(offsets), "chunk")
        .withColumn("cum", sum(col("n_tok")).over(inW) + col("coffset"))
        .withColumn("bin", floor((col("cum") - col("n_tok")) / 2048).cast("long"))
      // 6. shard (t29's 60-bit md5 key) + 7. manifest with the t20
      // order-independent membership digest
      val shard = (conv(substring(md5(concat(lit("shard:"),
          col("doc_id").cast("string"))), 1, 15), 16, 10)
        .cast("long") % 8).as("shard")
      val rowH = conv(substring(md5(concat(lit("tm:"),
          col("doc_id").cast("string"))), 1, 15), 16, 10).cast("long")
      packed.select(shard, col("doc_id"), col("n_tok"), col("bin"),
          rowH.as("__h"))
        .groupBy(col("shard"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tok")).as("n_tokens"),
          countDistinct(col("bin")).as("n_bins"),
          pmod(sum(col("__h").cast("decimal(38,0)")),
            lit(2305843009213693952L).cast("decimal(38,0)"))
            .cast("long").as("id_digest"))
        .orderBy(col("shard"))
    }))

  val oracleSql: Map[String, String] = Map(
    "t34_training_manifest" -> {
      // digit-sum md5 hash fragments — the proven t15/t29/t20 idioms
      val mixHx = (1 to 4).map(i =>
        s"(strpos('0123456789abcdef', substr(md5('mix:' || doc_id::VARCHAR), $i, 1)) - 1) * ${math.pow(16, 4 - i).toLong}")
        .mkString(" + ")
      val shardH = (1 to 15).map(i =>
        s"(strpos('0123456789abcdef', substr(md5('shard:' || doc_id::VARCHAR), $i, 1)) - 1) * ${1L << (4 * (15 - i))}")
        .mkString(" + ")
      val rowH = (1 to 15).map(i =>
        s"(strpos('0123456789abcdef', substr(md5('tm:' || doc_id::VARCHAR), $i, 1)) - 1) * ${1L << (4 * (15 - i))}")
        .mkString(" + ")
      s"""WITH ded AS (SELECT doc_id, lang, text FROM (
         |    SELECT doc_id, lang, text, row_number() OVER (
         |      PARTITION BY md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'))
         |      ORDER BY doc_id) AS rn
         |    FROM documents) WHERE rn = 1),
         |ntok AS (SELECT doc_id, regexp_split_to_array(
         |    regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS rtoks
         |  FROM documents),
         |idx AS (SELECT doc_id, rtoks,
         |  unnest(generate_series(1, greatest(len(rtoks)-5, 0)+1)) AS i FROM ntok),
         |sh AS (SELECT DISTINCT doc_id, array_to_string(rtoks[i:i+4], ' ') AS sh
         |       FROM idx),
         |ev AS (SELECT DISTINCT sh FROM sh WHERE doc_id % 50 = 0),
         |contam AS (SELECT DISTINCT s.doc_id FROM sh s JOIN ev USING (sh)
         |           WHERE s.doc_id % 50 <> 0),
         |cln AS (SELECT d.* FROM ded d WHERE d.doc_id % 50 <> 0
         |        AND NOT EXISTS (SELECT 1 FROM contam c WHERE c.doc_id = d.doc_id)),
         |g AS (SELECT doc_id, lang, text FROM (
         |    SELECT *,
         |      len(regexp_split_to_array(trim(text), '\\s+'))::BIGINT AS n_words,
         |      round(length(regexp_replace(trim(text), '\\s+', '', 'g'))*1.0
         |            / len(regexp_split_to_array(trim(text), '\\s+')), 6) AS mean_wl,
         |      round((length(text) - length(regexp_replace(text, '[^A-Za-z0-9\\s]', '', 'g')))*1.0
         |            / length(text), 6) AS symbol_ratio,
         |      len(list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'),
         |          x -> x IN ($stopList))) > 0 AS has_stopword
         |    FROM cln)
         |  WHERE n_words BETWEEN 5 AND 100000 AND mean_wl BETWEEN 2.0 AND 12.0
         |    AND symbol_ratio < 0.1 AND has_stopword),
         |c AS (SELECT lang, count(*)::BIGINT AS n_d FROM g GROUP BY lang),
         |mn AS (SELECT min(n_d) AS n_min FROM c),
         |r AS (SELECT lang, CAST(floor(sqrt(n_min::DOUBLE / n_d::DOUBLE) * 10000) AS BIGINT) AS rate
         |      FROM c CROSS JOIN mn),
         |mx AS (SELECT g.doc_id, g.text FROM g JOIN r USING (lang)
         |       WHERE ($mixHx) * 10000 < r.rate * 65536),
         |tk AS (SELECT doc_id,
         |    len(regexp_split_to_array(trim(text), '\\s+'))::BIGINT AS n_tok
         |  FROM mx),
         |cumt AS (SELECT doc_id, n_tok,
         |    sum(n_tok) OVER (ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
         |  FROM tk),
         |pk AS (SELECT doc_id, n_tok,
         |    CAST(floor((cum - n_tok) / 2048) AS BIGINT) AS bin FROM cumt),
         |fin AS (SELECT CAST(($shardH) % 8 AS BIGINT) AS shard,
         |    doc_id, n_tok, bin, ($rowH) AS h FROM pk)
         |SELECT shard, count(*) AS n_docs,
         |  sum(n_tok)::BIGINT AS n_tokens,
         |  count(DISTINCT bin) AS n_bins,
         |  CAST(sum(h) % 2305843009213693952 AS BIGINT) AS id_digest
         |FROM fin GROUP BY shard ORDER BY shard""".stripMargin
    },
    "t4_repetition" ->
      """WITH norm AS (SELECT doc_id,
        |  regexp_split_to_array(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS toks
        |  FROM documents),
        |idx AS (SELECT doc_id, toks,
        |  unnest(generate_series(1, greatest(len(toks)-2, 0)+1)) AS i FROM norm),
        |g AS (SELECT doc_id, array_to_string(toks[i:i+1], ' ') AS g FROM idx)
        |SELECT doc_id, round(1.0 - count(DISTINCT g)*1.0/count(g), 6) AS rep2
        |FROM g GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "t5_gopher" ->
      s"""WITH t AS (SELECT doc_id, text,
         |  len(regexp_split_to_array(trim(text), '\\s+'))::BIGINT AS n_words,
         |  round(length(regexp_replace(trim(text), '\\s+', '', 'g'))*1.0
         |        / len(regexp_split_to_array(trim(text), '\\s+')), 6) AS mean_wl,
         |  round((length(text) - length(regexp_replace(text, '[^A-Za-z0-9\\s]', '', 'g')))*1.0
         |        / length(text), 6) AS symbol_ratio,
         |  len(list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'),
         |      x -> x IN ($stopList))) > 0 AS has_stopword
         |FROM documents)
         |SELECT doc_id, n_words, mean_wl, symbol_ratio, has_stopword,
         |  (n_words BETWEEN 5 AND 100000 AND mean_wl BETWEEN 2.0 AND 12.0
         |   AND symbol_ratio < 0.1 AND has_stopword) AS passes
         |FROM t ORDER BY doc_id""".stripMargin,
    "t6_redact" ->
      """SELECT doc_id,
        |  regexp_replace(regexp_replace(
        |    'Contact bob@example.com or https://ex.org/a?b=1 end ' || text,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |    'https?://[^\s]+', '<URL>', 'g') AS redacted
        |FROM documents ORDER BY doc_id""".stripMargin,
    "t7_pack_bins" ->
      """WITH t AS (SELECT doc_id,
        |  len(regexp_split_to_array(trim(text), '\s+'))::BIGINT AS n_tok
        |FROM documents),
        |c AS (SELECT doc_id, n_tok,
        |  sum(n_tok) OVER (ORDER BY doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |FROM t)
        |SELECT doc_id, n_tok, CAST(floor((cum - n_tok) / 2048) AS BIGINT) AS bin
        |FROM c ORDER BY doc_id""".stripMargin,
    "t8_sample" ->
      """WITH t AS (SELECT doc_id, lang,
        |  (strpos('0123456789abcdef', substr(md5(doc_id::VARCHAR), 1, 1)) - 1) * 16 +
        |  (strpos('0123456789abcdef', substr(md5(doc_id::VARCHAR), 2, 1)) - 1) AS bucket,
        |  CASE WHEN lang = 'en' THEN 50 WHEN lang = 'de' THEN 30 ELSE 10 END AS rate
        |FROM documents)
        |SELECT doc_id, lang FROM t WHERE bucket * 100 < rate * 256 ORDER BY doc_id""".stripMargin,
    "t23_group_sample" ->
      """SELECT doc_id, lang, rank FROM (
        |  SELECT doc_id, lang, row_number() OVER (
        |    PARTITION BY lang
        |    ORDER BY md5('g7:' || doc_id::VARCHAR), doc_id) AS rank
        |  FROM documents)
        |WHERE rank <= 40 ORDER BY doc_id""".stripMargin,
    "t25_seq_chunk" ->
      """WITH corpus AS (SELECT doc_id,
        |  text || ' ' || text || ' ' || text || ' ' || text AS text
        |  FROM documents),
        |toks AS (SELECT doc_id,
        |  regexp_split_to_array(trim(text), '\s+') AS tk FROM corpus),
        |idx AS (SELECT doc_id, tk,
        |  unnest(generate_series(0,
        |    greatest(ceil((len(tk) - 16) / 112.0)::INT, 1) - 1)) AS i FROM toks)
        |SELECT doc_id, i AS chunk_idx,
        |  array_to_string(tk[i*112+1 : i*112+128], ' ') AS chunk,
        |  least(len(tk) - i*112, 128) AS n_tokens
        |FROM idx ORDER BY doc_id, chunk_idx""".stripMargin,
    "t24_repeat_strip" ->
      """WITH corpus AS (SELECT doc_id,
        |  CASE WHEN doc_id % 7 = 0
        |    THEN 'rp1 rp2 rp3 rp4 rp5 rp1 rp2 rp3 rp4 rp5 rp1 rp2 rp3 rp4 rp5 ' || text
        |    ELSE text END AS text
        |  FROM documents),
        |toks AS (SELECT doc_id,
        |  regexp_split_to_array(trim(text), '\s+') AS tk FROM corpus),
        |idx AS (SELECT doc_id, tk,
        |  unnest(generate_series(0,
        |    greatest(ceil(len(tk) / 5.0)::INT - 1, 0))) AS i FROM toks),
        |pseg AS (SELECT doc_id, i,
        |  array_to_string(tk[i*5+1 : i*5+5], ' ') AS seg FROM idx),
        |mk AS (SELECT doc_id, i, seg,
        |  lag(seg) OVER (PARTITION BY doc_id ORDER BY i) AS prev FROM pseg)
        |SELECT doc_id,
        |  string_agg(seg, ' ' ORDER BY i) AS cleaned,
        |  count(*) AS n_kept
        |FROM mk WHERE prev IS NULL OR seg <> prev
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "t22_exact_sample" ->
      """SELECT doc_id, lang, rk FROM (
        |  SELECT doc_id, lang, md5('s42:' || doc_id::VARCHAR) AS rk
        |  FROM documents ORDER BY rk, doc_id LIMIT 120)
        |ORDER BY doc_id""".stripMargin,
    "t30_stratified_split" ->
      """WITH k AS (SELECT doc_id, lang,
        |  md5('split:' || doc_id::VARCHAR) AS rk FROM documents),
        |r AS (SELECT doc_id, lang,
        |  row_number() OVER (PARTITION BY lang ORDER BY rk, doc_id) AS rn,
        |  count(*) OVER (PARTITION BY lang) AS n FROM k)
        |SELECT doc_id, lang,
        |  CASE WHEN rn * 10 <= n * 8 THEN 'train'
        |       WHEN rn * 10 <= n * 9 THEN 'val'
        |       ELSE 'test' END AS split
        |FROM r ORDER BY doc_id""".stripMargin,
    "t32_hist_quantile" ->
      """WITH toks AS (SELECT lang,
        |  len(regexp_split_to_array(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' '))::BIGINT AS n
        |  FROM documents),
        |h AS (SELECT lang, n // 16 AS bin, count(*) AS c FROM toks GROUP BY 1, 2),
        |cw AS (SELECT lang, bin, c,
        |  CAST(sum(c) OVER (PARTITION BY lang ORDER BY bin) AS BIGINT) AS cum,
        |  CAST(sum(c) OVER (PARTITION BY lang) AS BIGINT) AS total FROM h)
        |SELECT lang, max(total) AS n_docs,
        |  min(CASE WHEN cum * 2 >= total THEN bin END) * 16 + 15 AS p50_est,
        |  min(CASE WHEN cum * 10 >= total * 9 THEN bin END) * 16 + 15 AS p90_est
        |FROM cw GROUP BY lang ORDER BY lang""".stripMargin,
    "t33_weighted_sample" -> {
      // 28-bit uint from the first 7 md5 hex digits (digit-sum idiom),
      // +1 so the quotient divisor is never zero; 2^34 = 17179869184
      val hx = (1 to 7).map(i =>
        s"(strpos('0123456789abcdef', substr(md5('ws:' || doc_id::VARCHAR), $i, 1)) - 1) * ${1L << (4 * (7 - i))}")
        .mkString(" + ")
      s"""WITH b AS (SELECT lang, doc_id,
         |  least(length(text), 4000)::BIGINT AS weight,
         |  ($hx) + 1 AS h FROM documents),
         |p AS (SELECT lang, doc_id, weight, h,
         |  CAST((weight * 17179869184) // h AS BIGINT) AS pri FROM b),
         |r AS (SELECT lang, doc_id, weight, pri,
         |  row_number() OVER (PARTITION BY lang
         |                     ORDER BY pri DESC, h ASC, doc_id ASC) AS rn
         |  FROM p)
         |SELECT lang, doc_id, weight, pri, rn FROM r
         |WHERE rn <= 20 ORDER BY lang, rn""".stripMargin
    },
    "t14_shard_shuffle" -> {
      // u32 of the first 8 hex chars — same digit-sum idiom as s4
      val u32 = (1 to 8).map(i =>
        s"(strpos('0123456789abcdef', substr(h, $i, 1)) - 1) * ${math.pow(16, 8 - i).toLong}")
        .mkString(" + ")
      s"""WITH k AS (SELECT doc_id, md5('shard:' || doc_id) AS h FROM documents),
         |s AS (SELECT doc_id, h, CAST(($u32) % 8 AS INT) AS shard FROM k)
         |SELECT doc_id, shard,
         |  row_number() OVER (PARTITION BY shard ORDER BY h, doc_id) AS pos
         |FROM s ORDER BY shard, pos""".stripMargin
    },
    "t15_mixing" -> {
      val hx = (1 to 4).map(i =>
        s"(strpos('0123456789abcdef', substr(md5('mix:' || doc_id::VARCHAR), $i, 1)) - 1) * ${math.pow(16, 4 - i).toLong}")
        .mkString(" + ")
      s"""WITH c AS (SELECT lang, count(*)::BIGINT AS n_d FROM documents GROUP BY lang),
         |m AS (SELECT min(n_d) AS n_min FROM c),
         |r AS (SELECT lang, CAST(floor(sqrt(n_min::DOUBLE / n_d::DOUBLE) * 10000) AS BIGINT) AS rate
         |      FROM c CROSS JOIN m),
         |b AS (SELECT doc_id, lang, ($hx) AS bucket FROM documents)
         |SELECT b.doc_id, b.lang, r.rate FROM b JOIN r USING (lang)
         |WHERE b.bucket * 10000 < r.rate * 65536 ORDER BY b.doc_id""".stripMargin
    },
    "t16_fingerprint" ->
      s"""WITH ${OracleSqlParts.winnowingCtes("documents", k = 8, w = 4)},
         |s AS (SELECT doc_id, pos AS wend,
         |        4294967295 - (vmin % 4294967296) AS pos,
         |        vmin // 4294967296 AS fp
         |      FROM m WHERE pos >= 4),
         |d AS (SELECT doc_id, pos, fp,
         |        lag(pos) OVER (PARTITION BY doc_id ORDER BY wend) AS prev
         |      FROM s)
         |SELECT doc_id, pos, fp FROM d WHERE prev IS NULL OR pos <> prev
         |ORDER BY doc_id, pos, fp""".stripMargin,
    "t21_contamination" ->
      """WITH norm AS (SELECT doc_id,
        |  regexp_split_to_array(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS toks
        |  FROM documents),
        |idx AS (SELECT doc_id, toks,
        |  unnest(generate_series(1, greatest(len(toks)-3, 0)+1)) AS i FROM norm),
        |sh AS (SELECT DISTINCT doc_id, array_to_string(toks[i:i+2], ' ') AS sh FROM idx),
        |ev AS (SELECT DISTINCT sh FROM sh WHERE doc_id % 50 = 0)
        |SELECT s.doc_id, count(*) AS n_shingles,
        |  sum(CASE WHEN ev.sh IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS n_hits,
        |  round(sum(CASE WHEN ev.sh IS NOT NULL THEN 1 ELSE 0 END) * 1.0
        |        / count(*), 6) AS contamination
        |FROM sh s LEFT JOIN ev ON s.sh = ev.sh
        |WHERE s.doc_id % 50 <> 0
        |GROUP BY s.doc_id ORDER BY s.doc_id""".stripMargin,
    "t20_table_digest" -> {
      val rowH = (1 to 15).map(i =>
        s"(strpos('0123456789abcdef', substr(hx, $i, 1)) - 1) * ${1L << (4 * (15 - i))}")
        .mkString(" + ")
      val shardH =
        "(strpos('0123456789abcdef', substr(md5('dig-shard:' || doc_id::VARCHAR), 1, 1)) - 1) * 16 + " +
        "(strpos('0123456789abcdef', substr(md5('dig-shard:' || doc_id::VARCHAR), 2, 1)) - 1)"
      s"""WITH r AS (SELECT
         |    CAST(($shardH) % 4 AS INT) AS shard,
         |    md5('dig:' || '|' || doc_id::VARCHAR || '|' || coalesce(md5(text), chr(0)) || '|' || coalesce(lang, chr(0)) || '|' || coalesce(source, chr(0))) AS hx
         |  FROM documents),
         |h AS (SELECT shard, ($rowH) AS h FROM r)
         |SELECT shard, count(*) AS n_rows,
         |  CAST(sum(h) % 2305843009213693952 AS BIGINT) AS digest
         |FROM h GROUP BY shard ORDER BY shard""".stripMargin
    },
    "w14_daily_distinct" -> {
      val hx = (1 to 15).map(i =>
        s"(strpos('0123456789abcdef', substr(md5('kmv:' || user_id::VARCHAR), $i, 1)) - 1) * ${1L << (4 * (15 - i))}")
        .mkString(" + ")
      s"""WITH h AS (SELECT DISTINCT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
         |             ($hx) AS h FROM events),
         |r AS (SELECT day, h,
         |        row_number() OVER (PARTITION BY day ORDER BY h) AS rn
         |      FROM h),
         |s AS (SELECT day, count(*) AS n_sketch,
         |        max(CASE WHEN rn = 32 THEN h END) AS hk
         |      FROM r WHERE rn <= 32 GROUP BY day)
         |SELECT day, n_sketch,
         |  CASE WHEN n_sketch < 32 THEN n_sketch::DOUBLE
         |       ELSE round(31.0 * 1152921504606846976 / hk::DOUBLE, 4) END
         |    AS est_users
         |FROM s ORDER BY day""".stripMargin
    },
    "t19_kmv_distinct" -> {
      // 60-bit uint from the first 15 md5 hex digits — same digit-sum
      // idiom as t14/t15 (powers of 16 up to 16^14 = 2^56, all exact)
      val hx = (1 to 15).map(i =>
        s"(strpos('0123456789abcdef', substr(md5('kmv:' || user_id::VARCHAR), $i, 1)) - 1) * ${1L << (4 * (15 - i))}")
        .mkString(" + ")
      s"""WITH h AS (SELECT DISTINCT event_type, ($hx) AS h FROM events),
         |r AS (SELECT event_type, h,
         |        row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
         |      FROM h),
         |s AS (SELECT event_type, count(*) AS n_sketch,
         |        max(CASE WHEN rn = 32 THEN h END) AS hk
         |      FROM r WHERE rn <= 32 GROUP BY event_type)
         |SELECT event_type, n_sketch,
         |  CASE WHEN n_sketch < 32 THEN n_sketch::DOUBLE
         |       ELSE round(31.0 * 1152921504606846976 / hk::DOUBLE, 4) END
         |    AS est_distinct
         |FROM s ORDER BY event_type""".stripMargin
    },
    "t12_bigram_lm" ->
      """WITH toks AS (SELECT doc_id,
        |  regexp_split_to_array(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS t
        |  FROM documents),
        |big AS (SELECT doc_id, t[i] AS w1, t[i+1] AS w2
        |        FROM (SELECT doc_id, t, unnest(generate_series(1, len(t)-1)) AS i
        |              FROM toks WHERE len(t) >= 2)),
        |bc AS (SELECT w1, w2, count(*) AS c FROM big GROUP BY w1, w2),
        |pc AS (SELECT w1, count(*) AS pre FROM big GROUP BY w1),
        |v AS (SELECT count(DISTINCT w2) AS v FROM big)
        |SELECT doc_id, count(*) AS n_bigrams,
        |  round(CAST(sum(CAST(ln((c + 0.5) / (pre + 0.5 * v)) AS DECIMAL(38,18))) AS DOUBLE)
        |        / count(*), 6) AS log_p
        |FROM big JOIN bc USING (w1, w2) JOIN pc USING (w1) CROSS JOIN v
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "t13_freq_quality" ->
      """WITH toks AS (SELECT doc_id,
        |  unnest(regexp_split_to_array(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ')) AS t
        |  FROM documents),
        |freq AS (SELECT t, count(*) AS n FROM toks GROUP BY t),
        |tot AS (SELECT sum(n) AS tot FROM freq)
        |SELECT doc_id,
        |  round(CAST(sum(CAST(ln(n * 1.0 / tot) AS DECIMAL(38,18))) AS DOUBLE)
        |        / count(*), 6) AS log_p
        |FROM toks JOIN freq USING (t) CROSS JOIN tot
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin)
}
