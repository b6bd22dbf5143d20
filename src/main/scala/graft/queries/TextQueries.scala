package graft.queries

import graft.{QueryPack, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Text-analysis operators for training-data pipelines (SURVEY.md §7.4
 * M5 / llmops): token counting (whitespace + regex tokenizers), quality
 * scoring (length / punctuation / stopword ratios), language-ID
 * (stopword n-gram heuristic), and document fingerprinting (normalized
 * md5 + min-hash-of-shingles content fingerprint).
 *
 * Scale notes: every query is a narrow per-row projection (codegen'd
 * higher-order array functions, no UDFs) followed by at most one
 * aggregate — at 100 TB these scan-transform pipelines are
 * embarrassingly parallel and shuffle only final per-group aggregates.
 */
object TextQueries extends QueryPack {

  /** Words of the normalized document text, as a column expression. */
  private def words: org.apache.spark.sql.Column = split(trim(lower(col("text"))), " ")

  private val stopList = Seq("the", "a", "of", "and", "to", "in", "is", "on")
  private val stopSql = stopList.map(w => s"'$w'").mkString("(", ", ", ")")

  /** BPE working set: distinct words with corpus frequency, each held
   * as a space-delimited symbol string (" a b c " — initially one
   * symbol per character). Single-symbol words carry no pairs and are
   * dropped up front. */
  private def bpeWords(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")
      .select(explode(split(trim(lower(col("text"))), " ")).as("word"))
      .filter(length(col("word")) >= 2)
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))
      .withColumn("padded",
        concat(lit(" "), regexp_replace(col("word"), "(.)", "$1 ")))

  /** DuckDB twin of [[bpeWords]]+[[bpePairCounts]] (CTEs `wp`, `pc`). */
  private val bpePcCte = """
      wf AS (
        SELECT word, CAST(count(*) AS BIGINT) AS freq
        FROM (SELECT unnest(string_split(trim(lower(text)), ' ')) AS word
              FROM documents)
        WHERE length(word) >= 2 GROUP BY word),
      wp AS (SELECT word, freq,
                    ' ' || regexp_replace(word, '(.)', '\1 ', 'g') AS padded
             FROM wf),
      syms1 AS (SELECT freq, string_split(trim(padded), ' ') AS syms FROM wp),
      pc AS (
        SELECT syms[i] AS a, syms[i+1] AS b, CAST(sum(freq) AS BIGINT) AS cnt
        FROM syms1, unnest(generate_series(1, len(syms) - 1)) AS g(i)
        WHERE len(syms) >= 2 GROUP BY a, b)"""

  /** Adjacent-symbol pair counts over the working set, weighted by
   * word frequency. */
  private def bpePairCounts(wordsDf: DataFrame): DataFrame =
    wordsDf
      .select(col("freq"), split(trim(col("padded")), " ").as("syms"))
      .filter(size(col("syms")) >= 2)
      .select(col("freq"), explode(expr(
        "transform(sequence(1, size(syms) - 1), " +
        "i -> struct(element_at(syms, i) AS a, element_at(syms, i + 1) AS b))")).as("p"))
      .groupBy(col("p.a").as("a"), col("p.b").as("b"))
      .agg(sum(col("freq")).as("cnt"))

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Deterministic train/val split (llmops): 90/10 assignment as a
    // pure function of doc_id — stable across runs, engines, and
    // partitionings (no RNG/seed plumbing).
    "text_train_val_split" -> ((s, dir) => {
      graft.operators.Sampling.trainValSplit(
          Tables.load(s, dir, "documents"), "doc_id", trainPct = 90)
        .select(col("doc_id"), col("lang"), col("split"))
        .orderBy(col("doc_id"))
    }),

    // DSIR importance weights (Xie et al. 2023, "Data Selection for
    // Language Models via Importance Resampling"): score each raw
    // document by the hashed-feature log-likelihood ratio between a
    // target corpus (here lang='en') and the raw corpus. Tokens hash
    // into 64 buckets via exact integer arithmetic; each bucket's
    // add-one-smoothed log ratio ln((ct+1)/(T+64) / ((cr+1)/(R+64)))
    // is floor-quantized to a 1e-6 grid (ONE ln of one exact rational
    // per bucket, so both engines log the identical double), and the
    // per-doc score is the exact integer sum n_b * q_b. Scale: the
    // bucket table is 64 rows (broadcast); two shuffles total (bucket
    // agg + per-doc agg) regardless of corpus size.
    "text_dsir_weights" -> ((s, dir) => {
      val feats = Tables.load(s, dir, "documents")
        .select(col("doc_id"), col("lang"),
          explode(split(trim(lower(col("text"))), "\\s+")).as("w"))
        .filter(col("w").rlike("^[a-z0-9]+$"))
        .select(col("doc_id"), col("lang"),
          ((ascii(substring(col("w"), 1, 1)) * 31 + length(col("w")) * 7
            + ascii(substring(col("w"), -1, 1))) % 64).as("b"))
      val bc = feats.groupBy("b").agg(
        sum(when(col("lang") === "en", 1L).otherwise(0L)).as("ct"),
        count(lit(1)).as("cr"))
      val tot = bc.agg(sum("ct").as("t"), sum("cr").as("r"))
      val q = bc.crossJoin(broadcast(tot)).select(col("b"),
        floor(lit(1e6) * log(
          ((col("ct") + 1) * (col("r") + 64)).cast("double") /
          ((col("cr") + 1) * (col("t") + 64)).cast("double"))).cast("long").as("qb"))
      feats.groupBy("doc_id", "b").agg(count(lit(1)).as("n"))
        .join(broadcast(q), "b")
        .groupBy("doc_id")
        .agg(sum(col("n") * col("qb")).as("dsir_score"), sum("n").as("n_toks"))
        .orderBy("doc_id")
    }),

    // END-TO-END TRAINING-DATA PIPELINE (capstone composition): the
    // full selection DAG a corpus build runs, as ONE Spark DAG —
    // normalize → language/quality gate → exact dedup (keep lowest
    // id) → exact decontamination (drop the held-out benchmark slice
    // doc_id % 50 == 0 AND any training doc sharing its content hash)
    // → per-language budget by deterministic hash order (DoReMi-style
    // quotas) → 256-token sequence packing within each language.
    // Scale: the only shuffles are the dedup hash, the contamination
    // hash anti-join, and the per-language rank/pack windows — every
    // stage is the gated single-op's plan, composed.
    "text_e2e_training_pipeline" -> ((s, dir) => {
      val stopArr = array(stopList.map(lit): _*)
      import org.apache.spark.sql.expressions.Window
      val docs = Tables.load(s, dir, "documents")
        .withColumn("__norm", trim(lower(col("text"))))
        .withColumn("__w", split(col("__norm"), " "))
        .withColumn("n_words", size(col("__w")).cast("bigint"))
        .withColumn("en_ratio",
          round(size(filter(col("__w"), w => array_contains(stopArr, w))).cast("double") /
            size(col("__w")), 4))
        .withColumn("content_md5", md5(col("__norm")))
      val kept = docs.filter(col("en_ratio") >= 0.1 && col("n_words") >= 20)
      val wd = Window.partitionBy(col("content_md5")).orderBy(col("doc_id"))
      val deduped = kept.withColumn("rn", row_number().over(wd))
        .filter(col("rn") === 1).drop("rn")
      val bench = docs.filter(col("doc_id") % 50 === 0)
        .select(col("content_md5")).distinct()
      val train = deduped.filter(col("doc_id") % 50 =!= 0)
        .join(bench, Seq("content_md5"), "left_anti")
      val mixed = graft.operators.Sampling.mixDomains(
        train.select(col("doc_id"), col("lang"), col("n_words")),
        "lang", "doc_id",
        Map("en" -> 60, "de" -> 30, "es" -> 30, "fr" -> 15, "zh" -> 15))
      val wp = Window.partitionBy(col("lang")).orderBy(col("rk"))
        .rowsBetween(Window.unboundedPreceding, -1)
      mixed.withColumn("cb", coalesce(sum(col("n_words")).over(wp), lit(0L)))
        .select(col("lang"), col("rk"), col("doc_id"), col("n_words"),
          expr("cb div 256").as("start_seq"))
        .orderBy(col("lang"), col("rk"))
    }),

    // DISTRIBUTED LINEAR-PROBE TRAINING STEP: one exact least-squares
    // gradient over 64-bucket hashed text features (the supervised
    // sibling of sim_kmeans_round's Lloyd step — together they are the
    // two training loops a data pipeline runs in-engine: clustering
    // and quality-probe fitting). Labels are lang='en'; weights are a
    // deterministic integer LCG; margins and the gradient
    // grad_b = Σ_d n_db·(w·x_d − y_d·1000) stay INTEGER end-to-end, so
    // the update is bit-identical in any engine. Scale: the weight
    // vector broadcasts (64 rows); everything else is equi-join/agg —
    // per-doc margins one shuffle, per-bucket gradient one more.
    "text_linear_probe_grad" -> ((s, dir) => {
      val feats = Tables.load(s, dir, "documents")
        .select(col("doc_id"), col("lang"),
          explode(split(trim(lower(col("text"))), "\\s+")).as("w"))
        .filter(col("w").rlike("^[a-z0-9]+$"))
        .select(col("doc_id"), col("lang"),
          ((ascii(substring(col("w"), 1, 1)) * 31 + length(col("w")) * 7
            + ascii(substring(col("w"), -1, 1))) % 64).as("b"))
        .groupBy(col("doc_id"), col("lang"), col("b"))
        .agg(count(lit(1)).as("n"))
      val wts = s.range(0, 64).select(col("id").cast("int").as("b"),
        (expr("(1103515245 * (id + 1) + 12345) div 65536") % 19 - 9).as("wt"))
      val margins = feats.join(broadcast(wts), "b")
        .groupBy(col("doc_id"), col("lang"))
        .agg(sum(col("n") * col("wt")).as("m"))
        .select(col("doc_id"),
          (col("m") - when(col("lang") === "en", 1000L).otherwise(0L)).as("resid"))
      feats.join(margins, "doc_id")
        .groupBy(col("b"))
        .agg(sum(col("n") * col("resid")).as("grad"))
        .join(broadcast(wts), "b")
        .select(col("b"), col("wt"), col("grad"))
        .orderBy(col("b"))
    }),

    // Static domain mixing (DoReMi-style fixed mixture weights): sample
    // the corpus down to per-language quotas (en 80 / de 40 / es 40 /
    // fr 20 / zh 20 of a 200-doc budget) by deterministic hash order.
    "text_mix_domains" -> ((s, dir) => {
      graft.operators.Sampling.mixDomains(
          Tables.load(s, dir, "documents"), "lang", "doc_id",
          Map("en" -> 80, "de" -> 40, "es" -> 40, "fr" -> 20, "zh" -> 20))
        .select(col("lang"), col("rk"), col("doc_id"))
        .orderBy(col("lang"), col("rk"))
    }),

    // TOKEN-BUDGET SHARDS (the training-shard writer: contiguous
    // output shards of ~10k tokens each in deterministic hash order —
    // C4/Pile-style fixed-size shard files): a doc joins the shard
    // where its running-token START offset lands. The global cumsum is
    // two-phase distributed (hash-range buckets, bucket totals
    // broadcast) — no single-partition pass, unlike the naive global
    // window the oracle can afford.
    "text_token_budget_shards" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
        .select(col("doc_id"), size(words).cast("bigint").as("n_tokens"))
      graft.operators.Sampling.tokenBudgetShards(docs, "doc_id", "n_tokens",
          budget = 10000L)
        .select(col("doc_id"), col("n_tokens"), col("start_tok"), col("shard_id"))
        .orderBy(col("start_tok"))
    }),

    // TEMPERATURE-SCALED DOMAIN MIXING (the multilingual sampling rule
    // at T = 2: quota_l ∝ sqrt(n_l)): static proportional mixing
    // drowns tail languages; the sqrt tempers head dominance while
    // keeping quotas data-derived rather than hand-tuned like
    // text_mix_domains'. The only float op is the IEEE-correctly-
    // rounded sqrt, so both engines compute identical integer quotas.
    "text_temperature_mix" -> ((s, dir) =>
      graft.operators.Sampling.temperatureMix(
          Tables.load(s, dir, "documents"), "lang", "doc_id", total = 100)
        .select(col("lang"), col("rk"), col("doc_id"))
        .orderBy(col("lang"), col("rk"))),

    // PER-DOMAIN ADAPTIVE QUALITY FLOOR (FineWeb-style: one global
    // threshold over-prunes clean sources and under-prunes noisy ones,
    // so the cut adapts to each source's own score distribution):
    // drop the bottom DECILE of each source by token-count score —
    // exactly rank > floor(n/10), rank and n per source, pure
    // integers. One shuffle on source; the rank is the same
    // per-stratum sort every sampler here pays.
    "text_domain_quality_floor" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val score = size(expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)"))
        .cast("bigint")
      val bySc = Window.partitionBy(col("source")).orderBy(col("score"), col("doc_id"))
      Tables.load(s, dir, "documents")
        .select(col("source"), col("doc_id"), score.as("score"))
        .withColumn("__rn", row_number().over(bySc))
        .withColumn("__n", count(lit(1)).over(Window.partitionBy(col("source"))))
        .filter(col("__rn") > expr("__n div 10"))
        .select(col("source"), col("doc_id"), col("score"))
        .orderBy(col("source"), col("doc_id"))
    }),

    // Deterministic stratified sample: 20 docs per language, chosen by
    // hash order — a reproducible per-stratum subsample.
    "text_stratified_sample" -> ((s, dir) => {
      graft.operators.Sampling.stratifiedSample(
          Tables.load(s, dir, "documents"), "lang", "doc_id", k = 20)
        .select(col("lang"), col("doc_id"))
        .orderBy(col("lang"), col("doc_id"))
    }),

    // BENCHMARK DECONTAMINATION (llmops): flag training documents whose
    // distinct word 5-grams overlap a held-out "benchmark" set (doc_id %
    // 50 == 0 stands in for the eval corpus) by >= 10%. The benchmark
    // gram set is orders of magnitude smaller than the corpus, so
    // Catalyst broadcasts it into the probe — one shuffle for the
    // per-doc distinct, zero for the membership test. The 10% threshold
    // compares as 10*hits >= grams: pure integers, engine-exact.
    "text_contamination_ratio" -> ((s, dir) => {
      val grams = Tables.load(s, dir, "documents")
        .select(col("doc_id"), split(trim(col("text")), " ").as("w"))
        .filter(size(col("w")) >= 5)
        .select(col("doc_id"), explode(expr(
          "transform(sequence(0, size(w) - 5), i -> concat_ws(' ', slice(w, i + 1, 5)))"))
          .as("g"))
        .distinct()
      val bench = grams.filter(col("doc_id") % 50 === 0).select(col("g")).distinct()
      grams.filter(col("doc_id") % 50 =!= 0)
        .join(broadcast(bench.withColumn("__hit", lit(1))), Seq("g"), "left")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_grams"),
          sum(coalesce(col("__hit"), lit(0))).cast("bigint").as("n_hit"))
        .withColumn("contaminated", lit(10) * col("n_hit") >= col("n_grams"))
        .orderBy(col("doc_id"))
    }),

    // CHUNK-LEVEL DEDUP (llmops; the C4/RefinedWeb "line-level" pass):
    // documents split into consecutive 10-word chunks; chunks whose
    // text occurs in more than 5 DISTINCT documents are boilerplate and
    // drop from every document; surviving chunks reassemble in
    // position order. Two shuffles (chunk doc-frequency, per-doc
    // reassembly) — the df frame is chunk-vocabulary-sized, broadcast
    // into the keep filter.
    "text_chunk_dedup" -> ((s, dir) => {
      val chunks = Tables.load(s, dir, "documents")
        .select(col("doc_id"), split(trim(col("text")), " ").as("w"))
        .select(col("doc_id"), posexplode(expr(
          "transform(sequence(0, cast(ceil(size(w) / 10.0) as int) - 1), " +
          "c -> concat_ws(' ', slice(w, c * 10 + 1, 10)))")))
        .withColumnRenamed("pos", "chunk_pos").withColumnRenamed("col", "chunk")
      val hot = chunks.groupBy(col("chunk"))
        .agg(countDistinct(col("doc_id")).as("df"))
        .filter(col("df") > 5)
        .select(col("chunk"))
      val kept = chunks.join(broadcast(hot.withColumn("__hot", lit(1))),
          Seq("chunk"), "left")
        .filter(col("__hot").isNull)
      chunks.groupBy(col("doc_id")).agg(count(lit(1)).as("n_chunks"))
        .join(
          kept.groupBy(col("doc_id"))
            .agg(count(lit(1)).as("n_kept"),
              array_join(expr("transform(sort_array(collect_list(struct(chunk_pos, chunk))), x -> x.chunk)"),
                " ").as("clean_text")),
          Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_chunks"),
          coalesce(col("n_kept"), lit(0L)).as("n_kept"),
          coalesce(col("clean_text"), lit("")).as("clean_text"))
        .orderBy(col("doc_id"))
    }),

    // KEEP-ONE span dedup (C4's actual rule — "we removed all but one
    // of any span occurring more than once", vs text_chunk_dedup's
    // remove-everywhere-hot): per duplicated chunk the canonical
    // occurrence is the (doc_id, chunk_pos) min; every other
    // occurrence is dropped and docs reassemble in position order.
    // The winner table is one min_by aggregate over the chunk key —
    // chunk-vocabulary-sized, a plain equi-join back (NOT broadcast:
    // at 100 TB the winner table scales with the corpus), and the
    // reassembly groupBy. Every shuffle is an equi-key exchange.
    "text_span_dedup_keep_one" -> ((s, dir) => {
      val chunks = Tables.load(s, dir, "documents")
        .select(col("doc_id"), split(trim(col("text")), " ").as("w"))
        .select(col("doc_id"), posexplode(expr(
          "transform(sequence(0, cast(ceil(size(w) / 10.0) as int) - 1), " +
          "c -> concat_ws(' ', slice(w, c * 10 + 1, 10)))")))
        .withColumnRenamed("pos", "chunk_pos").withColumnRenamed("col", "chunk")
      val winner = chunks.groupBy(col("chunk")).agg(
        min(struct(col("doc_id"), col("chunk_pos"))).as("win"))
      val kept = chunks.join(winner, Seq("chunk"))
        .filter(col("doc_id") === col("win.doc_id") &&
          col("chunk_pos") === col("win.chunk_pos"))
      chunks.groupBy(col("doc_id")).agg(count(lit(1)).as("n_chunks"))
        .join(
          kept.groupBy(col("doc_id"))
            .agg(count(lit(1)).as("n_kept"),
              array_join(expr("transform(sort_array(collect_list(struct(chunk_pos, chunk))), x -> x.chunk)"),
                " ").as("clean_text")),
          Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_chunks"),
          coalesce(col("n_kept"), lit(0L)).as("n_kept"),
          coalesce(col("clean_text"), lit("")).as("clean_text"))
        .orderBy(col("doc_id"))
    }),

    // Token counting: whitespace tokens vs regex word tokens vs uniques.
    "text_token_count" -> ((s, dir) => {
      Tables.load(s, dir, "documents")
        .select(col("doc_id"),
          size(words).cast("bigint").as("n_ws_tokens"),
          size(expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)")).cast("bigint").as("n_re_tokens"),
          size(array_distinct(words)).cast("bigint").as("n_unique"))
        .orderBy(col("doc_id"))
    }),

    // TF-IDF top terms per document (keyword extraction for corpus
    // curation): tokenize → term frequencies → document frequencies →
    // integer-grid idf → top-3 per doc. The idf is the INTEGER
    // floor(n_docs * 1000 / df) — monotone in the real idf, and the
    // per-doc ranking is then fully integer-deterministic across
    // engines (a libm ln() could flip ties at rounding boundaries).
    // Scale: tokens shuffle once per aggregate; the df frame is
    // vocabulary-sized (<< corpus); the rn<=3 filter plans as
    // WindowGroupLimit, never materializing the full per-doc sort.
    "text_tfidf_top_terms" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val docs = Tables.load(s, dir, "documents")
      val toks = docs.select(col("doc_id"),
          explode(expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)")).as("term"))
        .filter(length(col("term")) > 2)
      val tf = toks.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      val dfreq = toks.groupBy("term").agg(countDistinct("doc_id").as("df"))
      val scored = tf.join(dfreq, "term")
        .crossJoin(broadcast(docs.agg(count(lit(1)).as("n_docs"))))
        .withColumn("score",
          (col("tf") * floor(col("n_docs") * lit(1000.0) / col("df"))).cast("long"))
      val w = Window.partitionBy("doc_id").orderBy(col("score").desc, col("term"))
      scored.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("doc_id"), col("term"), col("score"), col("rn").cast("int").as("rn"))
        .orderBy(col("doc_id"), col("rn"))
    }),

    // Quality scoring: length stats, stopword ratio, mean word length.
    "text_quality_score" -> ((s, dir) => {
      val stopArr = array(stopList.map(lit): _*)
      Tables.load(s, dir, "documents")
        .select(col("doc_id"), col("n_chars"),
          length(trim(col("text"))).cast("bigint").as("text_len"),
          size(words).cast("bigint").as("n_words"),
          round(
            size(filter(words, w => array_contains(stopArr, w))).cast("double") /
              size(words), 4).as("stopword_ratio"),
          round((length(trim(col("text"))).cast("double") - (size(words) - 1).cast("double")) /
              size(words), 4).as("mean_word_len"))
        .withColumn("quality",
          round(least(col("stopword_ratio") * 2 + col("n_words") / lit(100.0), lit(1.0)), 4))
        .orderBy(col("doc_id"))
    }),

    // Language-ID heuristic: English-stopword hit ratio over word 1-grams.
    "text_lang_id" -> ((s, dir) => {
      val stopArr = array(stopList.map(lit): _*)
      Tables.load(s, dir, "documents")
        .select(col("doc_id"), col("lang").as("declared_lang"),
          round(size(filter(words, w => array_contains(stopArr, w))).cast("double") /
            size(words), 4).as("en_ratio"))
        .withColumn("pred_lang", when(col("en_ratio") >= 0.1, "en").otherwise("unknown"))
        .orderBy(col("doc_id"))
    }),

    // Fingerprinting: whole-content md5 + min-hash over word 3-grams
    // (the winnowing-style content fingerprint used for near-dup keys).
    "text_fingerprint" -> ((s, dir) => {
      // the words array is materialized ONCE per row before the lambda:
      // splitting inside `transform` re-splits per shingle index, turning
      // an O(words) fingerprint into O(words^2) string work
      Tables.load(s, dir, "documents")
        .withColumn("__norm", trim(lower(col("text"))))
        .withColumn("__w", split(col("__norm"), " "))
        .select(col("doc_id"),
          md5(col("__norm")).as("content_md5"),
          expr("""
            array_min(transform(
              sequence(1, greatest(size(__w) - 2, 1)),
              i -> md5(concat_ws(' ', slice(__w, i, 3)))))
          """).as("min_shingle_hash"))
        .orderBy(col("doc_id"))
    }),

    // End-to-end corpus cleaning pipeline — the composed shape a
    // training-data run executes: language-ID filter → quality floor →
    // exact dedup (keep lowest doc_id per content hash) → per-source
    // rollup. One DAG: two narrow projections, one window dedup, one
    // aggregate; at 100 TB the only shuffles are the dedup hash and
    // the final rollup.
    "text_clean_pipeline" -> ((s, dir) => {
      val stopArr = array(stopList.map(lit): _*)
      import org.apache.spark.sql.expressions.Window
      val scored = Tables.load(s, dir, "documents")
        .withColumn("__norm", trim(lower(col("text"))))
        .withColumn("__w", split(col("__norm"), " "))
        .withColumn("n_words", size(col("__w")).cast("bigint"))
        .withColumn("en_ratio",
          round(size(filter(col("__w"), w => array_contains(stopArr, w))).cast("double") /
            size(col("__w")), 4))
        .filter(col("en_ratio") >= 0.1 && col("n_words") >= 20)
        .withColumn("content_md5", md5(col("__norm")))
      val w = Window.partitionBy(col("content_md5")).orderBy(col("doc_id"))
      scored.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .groupBy(col("lang"), col("source"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_words")).as("total_words"))
        .orderBy(col("lang"), col("source"))
    }),

    // Character-trigram language ID (the n-gram-profile technique —
    // SURVEY M5 "language-ID (n-gram heuristic)"): per-language top-20
    // trigram profiles built FROM the corpus itself (deterministic),
    // each document classified by profile-hit count over its distinct
    // trigrams. Scale: profiles are tiny (langs × 20 → broadcast);
    // the trigram explode is embarrassingly parallel, two shuffles
    // total (profile counts, per-doc scores).
    "text_lang_id_ngram" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val docs = Tables.load(s, dir, "documents")
        .select(col("doc_id"), col("lang"), lower(trim(col("text"))).as("t"))
      // the exploded trigram frame feeds BOTH the profile build and the
      // per-doc scoring; deliberately NOT persisted — measured at sf0.1,
      // materializing ~10M tiny rows costs more than recomputing the
      // explode from cached parquet pages (4.8s persisted vs 3.9s not)
      val tri = docs.select(col("doc_id"), col("lang"),
        explode(expr(
          "transform(sequence(1, greatest(length(t) - 2, 1)), i -> substring(t, i, 3))")).as("g"))
      val prof = tri.groupBy(col("lang"), col("g")).agg(count(lit(1)).as("c"))
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("lang")).orderBy(col("c").desc, col("g"))))
        .filter(col("rn") <= 20)
        .select(col("lang").as("plang"), col("g"))
      // r15 optimization note: joining the RAW occurrence stream against
      // the broadcast profile first and distinct-counting after was
      // measured SLOWER (7.0 s vs 3.9 s at sf0.1) — profile grams are by
      // construction the most frequent ones, so the join multiplies the
      // occurrence stream instead of thinning it; distinct-first stays.
      val docTris = tri.select(col("doc_id"), col("g")).distinct()
      val scores = docTris.join(broadcast(prof), Seq("g"))
        .groupBy(col("doc_id"), col("plang")).agg(count(lit(1)).as("hits"))
      val best = scores.withColumn("rn", row_number().over(
          Window.partitionBy(col("doc_id")).orderBy(col("hits").desc, col("plang"))))
        .filter(col("rn") === 1)
        .select(col("doc_id"), col("plang").as("best_lang"), col("hits"))
      docs.select(col("doc_id"), col("lang").as("declared_lang"))
        .join(best, Seq("doc_id"))
        .orderBy(col("doc_id"))
    }),

    // Repetition scoring — the distinct-token-ratio quality filter
    // (boilerplate / spam detector in training-data pipelines): unique
    // tokens per mille of total, integer-exact so both engines agree
    // bit-for-bit; `is_repetitive` is the filter verdict.
    "text_repetition_score" -> ((s, dir) => {
      Tables.load(s, dir, "documents")
        .withColumn("__t", filter(split(lower(trim(col("text"))), " "), w => w =!= ""))
        .select(col("doc_id"),
          size(col("__t")).cast("bigint").as("n_tokens"),
          expr("cast((size(array_distinct(__t)) * cast(1000 as bigint)) div size(__t) as bigint)")
            .as("distinct_permille"))
        .withColumn("is_repetitive", col("distinct_permille") < 250)
        .orderBy(col("doc_id"))
    }),

    // PII scrubbing — regex redaction of emails and phone-shaped
    // tokens (documents are synthetic, so deterministic contact
    // strings are appended per doc, then redacted): emits per-doc
    // match counts and the md5 of the redacted text, proving both
    // engines produced byte-identical scrubbed output.
    "text_pii_redact" -> ((s, dir) => {
      val emailRe = "[a-z0-9]+@[a-z][a-z.]+[a-z]"
      val phoneRe = "\\+1-555-[0-9]{4}"
      Tables.load(s, dir, "documents")
        .withColumn("__aug",
          concat(col("text"), lit(" contact user"), col("doc_id"),
            lit("@mail.example or +1-555-"),
            lpad((col("doc_id") % 10000).cast("string"), 4, "0")))
        .select(col("doc_id"),
          size(expr(s"regexp_extract_all(__aug, '$emailRe', 0)")).cast("bigint").as("n_emails"),
          size(expr(s"regexp_extract_all(__aug, '${phoneRe.replace("\\", "\\\\")}', 0)"))
            .cast("bigint").as("n_phones"),
          md5(regexp_replace(regexp_replace(col("__aug"), lit(emailRe), lit("<EMAIL>")),
            lit(phoneRe), lit("<PHONE>"))).as("redacted_md5"))
        .orderBy(col("doc_id"))
    }),

    // Benchmark decontamination (llmops): flag training documents
    // sharing any 3-gram word shingle with a held-out benchmark slice
    // (doc_id % 97 == 0 stands in for the eval set). The benchmark
    // shingle set is distinct-aggregated (tiny — ~1% of docs) and
    // BROADCAST into the train-side probe, so the train shingles never
    // shuffle; the only shuffle is the final per-doc hit count. At
    // 100 TB the eval set stays constant-size, so this shape holds.
    "text_decontaminate" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      val w = docs.select(col("doc_id"), words.as("ws")).filter(size(col("ws")) >= 3)
      val sh = w.select(col("doc_id"), explode(expr(
        "transform(sequence(1, size(ws) - 2), i -> concat_ws(' ', slice(ws, i, 3)))")).as("sh"))
      val bench = sh.filter(col("doc_id") % 97 === 0).select(col("sh")).distinct()
      sh.filter(col("doc_id") % 97 =!= 0)
        .join(broadcast(bench), "sh")
        .groupBy(col("doc_id"))
        .agg(countDistinct(col("sh")).as("n_hits"))
        .orderBy(col("doc_id"))
    }),

    // SEQUENCE PACKING (llmops, concat-and-chunk): documents are
    // concatenated in doc_id order WITHIN EACH SOURCE SHARD and cut
    // into fixed 256-token training sequences; each doc reports the
    // sequence span it lands in. Per-shard packing keeps the running
    // sum a partitioned window (one shuffle on source) — a single
    // global order would serialize at 100 TB, per-shard is how real
    // pipelines pack. Pure integer cumsum: engine-exact.
    // Deterministic training-order shuffle: every pretraining run
    // shuffles its corpus, and a SEEDED integer hash order makes the
    // permutation reproducible and resumable (no RNG state). The key
    // is a multiplicative hash mod a 33-bit prime — exact BIGINT
    // arithmetic in both engines — and the position comes from the
    // two-phase distributed index (range sort + count-then-offset),
    // not a single-partition window.
    "text_seeded_shuffle" -> ((s, dir) => {
      val keyed = Tables.load(s, dir, "documents")
        .select(col("doc_id"),
          (((col("doc_id") + lit(42L)) * lit(2654435761L)) % lit(4294967311L))
            .as("shuffle_key"))
      graft.operators.DataSetUtils
        .zipWithIndexOrdered(keyed, col("shuffle_key"), col("doc_id"))
        .select(col("idx").as("pos"), col("doc_id"), col("shuffle_key"))
        .orderBy(col("pos"))
    }),

    // Unigram log-probability scoring (the CCNet/C4-style LM quality
    // signal, reduced to its distributable core): corpus unigram
    // frequencies → per-token floor(1e6·ln(cnt/N)) on the integer
    // grid (the DSIR/adamic-adar ln-quantization convention) →
    // per-document mean token log-prob. One token aggregate, a
    // broadcast 1-row total, one doc aggregate — no driver loops.
    "text_unigram_logprob" -> ((s, dir) => {
      val toks = Tables.load(s, dir, "documents")
        .select(col("doc_id"),
          explode(split(trim(lower(col("text"))), " ")).as("tok"))
      val freq = toks.groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
      val total = freq.agg(sum(col("cnt")).as("n_corpus"))
      val q = freq.crossJoin(broadcast(total))
        .select(col("tok"),
          floor(lit(1e6) * log(col("cnt").cast("double") / col("n_corpus")))
            .cast("long").as("lp_q"))
      toks.join(q, Seq("tok"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_toks"), sum(col("lp_q")).as("sum_lp_q"))
        .filter(col("n_toks") >= 5)
        .select(col("doc_id"), col("n_toks"), col("sum_lp_q"))
        .orderBy(col("doc_id"))
    }),

    // Bigram LM log-probability (the unigram signal one order up —
    // CCNet's KenLM perplexity filter reduced to a distributable
    // bigram model trained on the corpus itself): per-token lead()
    // forms ordered bigrams, corpus counts give P(w2|w1)=c12/c1, and
    // the per-doc sum of floor(1e6·ln(c12/c1)) on the integer grid is
    // the fit score (every doc bigram is in the model, so no
    // smoothing term is needed). All shuffles are equi-keys and the
    // model tables are vocabulary-sized — the per-doc window is the
    // only row-scale exchange, the same shape at 100 TB.
    "text_bigram_logprob" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val toks = Tables.load(s, dir, "documents")
        .select(col("doc_id"),
          posexplode(split(trim(lower(col("text"))), " ")).as(Seq("pos", "w1")))
      val big = toks
        .withColumn("w2",
          lead(col("w1"), 1).over(Window.partitionBy("doc_id").orderBy("pos")))
        .filter(col("w2").isNotNull)
        .select(col("doc_id"), col("w1"), col("w2"))
      val c12 = big.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c12"))
      val c1 = c12.groupBy(col("w1")).agg(sum(col("c12")).as("c1"))
      val lp = c12.join(c1, Seq("w1"))
        .select(col("w1"), col("w2"),
          floor(lit(1e6) * log(col("c12").cast("double") / col("c1")))
            .cast("long").as("lp_q"))
      big.join(lp, Seq("w1", "w2"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_bigrams"), sum(col("lp_q")).as("sum_lp_q"))
        .filter(col("n_bigrams") >= 5)
        .orderBy(col("doc_id"))
    }),

    // Distributed BPE trainer round (Sennrich et al. 2016, the
    // tokenizer-training inner loop at corpus scale): pair statistics
    // are computed over the DISTINCT-WORD table weighted by corpus
    // frequency — after the one word-count shuffle, per-round cost is
    // vocabulary-sized, independent of corpus size (the trick that
    // makes BPE training feasible at 100 TB). Words are held as
    // space-delimited symbol strings (" a b c "); a merge is a single
    // left-to-right non-overlapping replace of " a b " with " ab "
    // (in a chain run like "aaa" the shared delimiter is consumed, so
    // alternate pairs merge — deterministic and identical in Spark and
    // DuckDB, pinned by OperatorSpec).
    "text_bpe_pair_counts" -> ((s, dir) => {
      bpePairCounts(bpeWords(s, dir))
        .orderBy(col("cnt").desc, col("a"), col("b")).limit(20)
    }),

    // One full merge round: argmax pair from the round-1 statistics,
    // merge applied to every word, pairs recounted. The chosen merge
    // rides along as constant columns; output is the post-merge top-10.
    "text_bpe_merge_round" -> ((s, dir) => {
      val words = bpeWords(s, dir)
      val best = bpePairCounts(words)
        .orderBy(col("cnt").desc, col("a"), col("b")).limit(1)
        .select(col("a").as("merge_a"), col("b").as("merge_b"))
      val merged = words.crossJoin(broadcast(best))
        .withColumn("padded", expr(
          "replace(padded, concat(' ', merge_a, ' ', merge_b, ' '), " +
          "concat(' ', merge_a, merge_b, ' '))"))
      bpePairCounts(merged)
        .join(broadcast(best))
        .select(col("merge_a"), col("merge_b"), col("a"), col("b"), col("cnt"))
        .orderBy(col("cnt").desc, col("a"), col("b")).limit(10)
    }),

    // CHARACTER-ENTROPY quality signal (the CCNet/C4-family gibberish
    // and boilerplate detector: natural text sits in a mid-entropy
    // band — repeated-char spam scores low, uniform noise high). Per
    // doc H = (1/N)·Σ n_c·(ln N − ln n_c) on the 1e-6 integer ln grid
    // (same quantization as text_unigram_logprob), so the per-doc
    // reduction is exact integer arithmetic. Two shuffles: the
    // (doc, char) count and the per-doc roll-up.
    "text_char_entropy" -> ((s, dir) => {
      val chars = Tables.load(s, dir, "documents")
        .select(col("doc_id"), explode(split(trim(lower(col("text"))), "")).as("ch"))
        .filter(col("ch") =!= "")
      val counts = chars.groupBy(col("doc_id"), col("ch")).agg(count(lit(1)).as("nc"))
      val tot = counts.groupBy(col("doc_id")).agg(sum(col("nc")).as("n"))
      counts.join(tot, Seq("doc_id"))
        .select(col("doc_id"), col("n"),
          (col("nc") * (floor(lit(1e6) * log(col("n").cast("double"))).cast("long")
            - floor(lit(1e6) * log(col("nc").cast("double"))).cast("long"))).as("term"))
        .groupBy(col("doc_id"))
        .agg(max(col("n")).as("n_chars"), expr("sum(term) div max(n)").as("ent_x1e6"))
        .orderBy(col("doc_id"))
    }),

    // Three CHAINED merge rounds (the trainer loop itself): each round
    // recounts pairs on the post-merge corpus, takes the argmax, and
    // applies it — so later merges can consume earlier merge products
    // ("t h"→"th", then "th e"→"the"). Output: the 15 most frequent
    // words with their final segmentations. Per round the plan is one
    // pair-count shuffle + a broadcast of the 1-row argmax — the
    // vocabulary-sized iteration a distributed BPE trainer runs.
    "text_bpe_encode" -> ((s, dir) => {
      val merged3 = (1 to 3).foldLeft(bpeWords(s, dir)) { (w, _) =>
        val best = bpePairCounts(w)
          .orderBy(col("cnt").desc, col("a"), col("b")).limit(1)
          .select(col("a").as("ma"), col("b").as("mb"))
        w.crossJoin(broadcast(best))
          .withColumn("padded", expr(
            "replace(padded, concat(' ', ma, ' ', mb, ' '), concat(' ', ma, mb, ' '))"))
          .drop("ma", "mb")
      }
      merged3
        .select(col("word"), col("freq"), trim(col("padded")).as("seg"))
        .withColumn("n_sym", size(split(col("seg"), " ")).cast("bigint"))
        .orderBy(col("freq").desc, col("word")).limit(15)
    }),

    "text_pack_sequences" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val docs = Tables.load(s, dir, "documents")
        .select(col("doc_id"), col("source"), size(words).cast("bigint").as("n_tokens"))
      val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      docs.withColumn("cb", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
        .select(col("doc_id"), col("source"), col("n_tokens"),
          expr("cb div 256").as("start_seq"),
          expr("(cb + n_tokens - 1) div 256").as("end_seq"))
        .orderBy(col("source"), col("doc_id"))
    }),

    // GOPHER-STYLE QUALITY RULES (llmops; Rae et al. 2021 §A1.1 repetition
    // & quality filters, public): word-count bounds [50, 100k], mean
    // word length in [3, 10] chars (×100 fixed-point), and >= 2 stopword
    // hits. All vectorized built-ins; the mean-word-length compare is
    // integer (chars·100 div words) so the keep bit is engine-exact.
    "text_gopher_quality" -> ((s, dir) => {
      Tables.load(s, dir, "documents")
        .select(col("doc_id"),
          size(words).cast("bigint").as("n_words"),
          length(translate(trim(lower(col("text"))), " ", "")).cast("bigint").as("wchars"),
          expr(s"CAST(size(filter(split(trim(lower(text)), ' '), w -> w IN $stopSql)) AS BIGINT)")
            .as("stop_hits"))
        .select(col("doc_id"), col("n_words"),
          expr("(wchars * 100) div n_words").as("mwl_x100"), col("stop_hits"),
          (col("n_words").between(50, 100000) &&
            expr("(wchars * 100) div n_words").between(300, 1000) &&
            col("stop_hits") >= 2).as("keep"))
        .orderBy(col("doc_id"))
    }),

    // URL CANONICALIZATION + DEDUP (llmops crawl curation): messy URL
    // variants (scheme/host case, www., :443, utm_* params, fragments,
    // trailing slash) canonicalize to one form; keep-first per
    // canonical URL with a variant count. The URL is derived
    // deterministically from (source, doc_id) so both engines see the
    // identical messy input. One hash shuffle on the canonical key.
    "text_url_canonical" -> ((s, dir) => {
      val raw = Tables.load(s, dir, "documents").select(col("doc_id"), concat(
        when(col("doc_id") % 2 === 0, lit("https")).otherwise(lit("HTTPS")),
        lit("://"),
        when(col("doc_id") % 3 === 0, lit("www.")).otherwise(lit("")),
        when(col("doc_id") % 2 === 0, col("source")).otherwise(upper(col("source"))),
        lit(".example.com"),
        when(col("doc_id") % 5 === 0, lit(":443")).otherwise(lit("")),
        lit("/docs/"), (col("doc_id") % 40).cast("string"),
        when(col("doc_id") % 7 === 0, lit("/")).otherwise(lit("")),
        when(col("doc_id") % 4 === 0,
            concat(lit("?utm_source=feed&id="), (col("doc_id") % 2).cast("string")))
          .otherwise(concat(lit("?id="), (col("doc_id") % 2).cast("string"))),
        when(col("doc_id") % 3 === 0, lit("#sec0")).otherwise(lit(""))).as("url"))
      val schemeHost = regexp_extract(col("u"), "^[^/]*//[^/?#]*", 0)
      val canon = raw
        .withColumn("u", regexp_replace(col("url"), "#.*", ""))
        .withColumn("u", concat(lower(schemeHost),
          expr("substring(u, length(regexp_extract(u, '^[^/]*//[^/?#]*', 0)) + 1)")))
        .withColumn("u", regexp_replace(col("u"), ":443/", "/"))
        .withColumn("u", regexp_replace(col("u"), "://www\\.", "://"))
        .withColumn("u", regexp_replace(col("u"), "[?&]utm_[^&]*", ""))
        .withColumn("u", regexp_replace(col("u"), "^([^?]*)&", "$1?"))
        .withColumn("u", regexp_replace(col("u"), "/\\?", "?"))
      canon.groupBy(col("u").as("canonical_url"))
        .agg(min(col("doc_id")).as("first_doc"), count(lit(1)).as("n_variants"))
        .orderBy(col("canonical_url"))
    }),

    // Corpus stats rollup: per (lang, source) aggregate quality profile.
    "text_corpus_stats" -> ((s, dir) => {
      Tables.load(s, dir, "documents")
        .groupBy(col("lang"), col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(size(words)).cast("bigint").as("total_words"),
          round(avg(length(trim(col("text")))), 4).as("avg_len"))
        .orderBy(col("lang"), col("source"))
    })
  )

  override def oracle: Map[String, String] = Map(
    "text_train_val_split" -> """
      SELECT doc_id, lang,
             CASE WHEN ((doc_id % 1000003) * 2654435761 % 1000000007 + 1000000007) % 1000000007 % 100 < 90
                  THEN 'train' ELSE 'val' END AS split
      FROM documents ORDER BY doc_id""",
    "text_e2e_training_pipeline" -> s"""
      WITH t AS (
        SELECT doc_id, lang, trim(lower(text)) AS norm,
               string_split(trim(lower(text)), ' ') AS w
        FROM documents),
      scored AS (
        SELECT doc_id, lang, md5(norm) AS content_md5,
               CAST(len(w) AS BIGINT) AS n_words,
               round(CAST(len(list_filter(w, x -> x IN $stopSql)) AS DOUBLE) / len(w), 4) AS en_ratio
        FROM t),
      kept AS (SELECT * FROM scored WHERE en_ratio >= 0.1 AND n_words >= 20),
      dedup AS (
        SELECT *, row_number() OVER (PARTITION BY content_md5 ORDER BY doc_id) AS rn
        FROM kept),
      bench AS (SELECT DISTINCT content_md5 FROM scored WHERE doc_id % 50 = 0),
      train AS (
        SELECT d.* FROM dedup d
        WHERE d.rn = 1 AND d.doc_id % 50 <> 0
          AND NOT EXISTS (SELECT 1 FROM bench b WHERE b.content_md5 = d.content_md5)),
      mixed AS (
        SELECT lang, doc_id, n_words,
               CAST(row_number() OVER (PARTITION BY lang
                 ORDER BY ((doc_id % 1000003) * 2654435761) % 1000000007, doc_id) AS INT) AS rk
        FROM train),
      q AS (SELECT * FROM mixed
            WHERE rk <= CASE lang WHEN 'en' THEN 60 WHEN 'de' THEN 30 WHEN 'es' THEN 30
                                  WHEN 'fr' THEN 15 WHEN 'zh' THEN 15 ELSE 0 END),
      packed AS (
        SELECT lang, rk, doc_id, n_words,
               CAST(coalesce(sum(n_words) OVER (PARTITION BY lang ORDER BY rk
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cb
        FROM q)
      SELECT lang, rk, doc_id, n_words, cb // 256 AS start_seq
      FROM packed ORDER BY lang, rk""",
    "text_linear_probe_grad" -> """
      WITH feats AS (
        SELECT doc_id, lang, b, CAST(count(*) AS BIGINT) AS n FROM (
          SELECT doc_id, lang,
                 (ascii(substr(w, 1, 1)) * 31 + length(w) * 7 + ascii(substr(w, -1, 1))) % 64 AS b
          FROM (
            SELECT doc_id, lang, unnest(string_split_regex(trim(lower(text)), '\s+')) AS w
            FROM documents)
          WHERE regexp_full_match(w, '[a-z0-9]+'))
        GROUP BY doc_id, lang, b),
      wts AS (SELECT b, ((1103515245 * (b + 1) + 12345) // 65536) % 19 - 9 AS wt
              FROM generate_series(0, 63) AS t(b)),
      margins AS (
        SELECT f.doc_id,
               CAST(sum(f.n * w.wt) AS BIGINT)
                 - CASE WHEN f.lang = 'en' THEN 1000 ELSE 0 END AS resid
        FROM feats f JOIN wts w ON f.b = w.b
        GROUP BY f.doc_id, f.lang),
      grads AS (
        SELECT f.b, CAST(sum(f.n * m.resid) AS BIGINT) AS grad
        FROM feats f JOIN margins m ON f.doc_id = m.doc_id
        GROUP BY f.b)
      SELECT CAST(g.b AS INT) AS b, CAST(w.wt AS BIGINT) AS wt, g.grad
      FROM grads g JOIN wts w ON g.b = w.b ORDER BY g.b""",
    "text_dsir_weights" -> """
      WITH feats AS (
        SELECT doc_id, lang,
               (ascii(substr(w, 1, 1)) * 31 + length(w) * 7 + ascii(substr(w, -1, 1))) % 64 AS b
        FROM (
          SELECT doc_id, lang, unnest(string_split_regex(trim(lower(text)), '\s+')) AS w
          FROM documents)
        WHERE regexp_full_match(w, '[a-z0-9]+')),
      bc AS (
        SELECT b,
               CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS ct,
               CAST(count(*) AS BIGINT) AS cr
        FROM feats GROUP BY b),
      tot AS (SELECT CAST(sum(ct) AS BIGINT) AS t, CAST(sum(cr) AS BIGINT) AS r FROM bc),
      q AS (
        SELECT b,
               CAST(floor(1000000.0 * ln(
                 CAST((ct + 1) * (r + 64) AS DOUBLE) /
                 CAST((cr + 1) * (t + 64) AS DOUBLE))) AS BIGINT) AS qb
        FROM bc, tot),
      db AS (SELECT doc_id, b, CAST(count(*) AS BIGINT) AS n FROM feats GROUP BY 1, 2)
      SELECT doc_id,
             CAST(sum(n * qb) AS BIGINT) AS dsir_score,
             CAST(sum(n) AS BIGINT) AS n_toks
      FROM db JOIN q USING (b)
      GROUP BY doc_id ORDER BY doc_id""",
    "text_token_budget_shards" -> """
      WITH w AS (
        SELECT doc_id,
               CAST(len(string_split(trim(lower(text)), ' ')) AS BIGINT) AS n_tokens,
               ((doc_id % 1000003) * 2654435761) % 1000000007 AS h
        FROM documents),
      c AS (
        SELECT doc_id, n_tokens,
               CAST(sum(n_tokens) OVER (ORDER BY h, doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens
                 AS BIGINT) AS start_tok
        FROM w)
      SELECT doc_id, n_tokens, start_tok,
             CAST(start_tok // 10000 AS BIGINT) AS shard_id
      FROM c ORDER BY start_tok""",
    "text_temperature_mix" -> """
      WITH c AS (SELECT lang, count(*) AS n FROM documents GROUP BY lang),
      w AS (SELECT lang,
                   CAST(floor(1000000 * sqrt(CAST(n AS DOUBLE))) AS BIGINT) AS w
            FROM c),
      q AS (SELECT lang,
                   CAST((100 * w) // (SELECT CAST(sum(w) AS BIGINT) FROM w) AS INT) AS quota
            FROM w),
      ranked AS (
        SELECT lang, doc_id,
               CAST(row_number() OVER (
                 PARTITION BY lang
                 ORDER BY ((doc_id % 1000003) * 2654435761) % 1000000007, doc_id) AS INT) AS rk
        FROM documents)
      SELECT r.lang AS lang, r.rk, r.doc_id
      FROM ranked r JOIN q ON r.lang = q.lang
      WHERE r.rk <= q.quota
      ORDER BY r.lang, r.rk""",
    "text_domain_quality_floor" -> """
      WITH scored AS (
        SELECT source, doc_id,
               CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+', 0)) AS BIGINT) AS score
        FROM documents),
      ranked AS (
        SELECT source, doc_id, score,
               row_number() OVER (PARTITION BY source ORDER BY score, doc_id) AS rn,
               count(*) OVER (PARTITION BY source) AS n
        FROM scored)
      SELECT source, doc_id, score FROM ranked WHERE rn > n // 10
      ORDER BY source, doc_id""",
    "text_mix_domains" -> """
      WITH ranked AS (
        SELECT lang, doc_id,
               CAST(row_number() OVER (
                 PARTITION BY lang
                 ORDER BY ((doc_id % 1000003) * 2654435761) % 1000000007, doc_id) AS INT) AS rk
        FROM documents)
      SELECT lang, rk, doc_id FROM ranked
      WHERE rk <= CASE lang WHEN 'en' THEN 80 WHEN 'de' THEN 40 WHEN 'es' THEN 40
                            WHEN 'fr' THEN 20 WHEN 'zh' THEN 20 ELSE 0 END
      ORDER BY lang, rk""",
    "text_stratified_sample" -> """
      SELECT lang, doc_id FROM (
        SELECT lang, doc_id, row_number() OVER (PARTITION BY lang
          ORDER BY ((doc_id % 1000003) * 2654435761 % 1000000007 + 1000000007) % 1000000007, doc_id) AS rn
        FROM documents)
      WHERE rn <= 20 ORDER BY lang, doc_id""",
    "text_decontaminate" -> """
      WITH w AS (
        SELECT doc_id, string_split(trim(lower(text)), ' ') AS ws
        FROM documents WHERE len(string_split(trim(lower(text)), ' ')) >= 3),
      sh AS (
        SELECT doc_id, array_to_string(ws[i:i+2], ' ') AS sh
        FROM w, unnest(range(1, len(ws) - 1)) AS t(i)),
      bench AS (
        SELECT DISTINCT sh FROM sh WHERE doc_id % 97 = 0)
      SELECT s.doc_id, CAST(count(DISTINCT s.sh) AS BIGINT) AS n_hits
      FROM sh s JOIN bench b ON s.sh = b.sh
      WHERE s.doc_id % 97 <> 0
      GROUP BY s.doc_id ORDER BY s.doc_id""",
    "text_contamination_ratio" -> """
      WITH words AS (
        SELECT doc_id, string_split(trim(text), ' ') AS w FROM documents),
      grams AS (
        SELECT DISTINCT doc_id, array_to_string(w[i:i+4], ' ') AS g
        FROM words, unnest(generate_series(1, greatest(len(w) - 4, 0))) AS t(i)
        WHERE len(w) >= 5),
      bench AS (SELECT DISTINCT g FROM grams WHERE doc_id % 50 = 0)
      SELECT d.doc_id, CAST(count(*) AS BIGINT) AS n_grams,
             CAST(sum(CASE WHEN b.g IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hit,
             (10 * sum(CASE WHEN b.g IS NOT NULL THEN 1 ELSE 0 END) >= count(*)) AS contaminated
      FROM grams d LEFT JOIN bench b ON d.g = b.g
      WHERE d.doc_id % 50 <> 0
      GROUP BY d.doc_id
      ORDER BY d.doc_id""",
    "text_chunk_dedup" -> """
      WITH words AS (
        SELECT doc_id, string_split(trim(text), ' ') AS w FROM documents),
      chunks AS (
        SELECT doc_id, c AS chunk_pos,
               array_to_string(w[c * 10 + 1 : c * 10 + 10], ' ') AS chunk
        FROM words, unnest(generate_series(0, CAST(ceil(len(w) / 10.0) AS INT) - 1)) AS t(c)),
      hot AS (
        SELECT chunk FROM chunks GROUP BY chunk HAVING count(DISTINCT doc_id) > 5),
      kept AS (
        SELECT c.doc_id, c.chunk_pos, c.chunk
        FROM chunks c LEFT JOIN hot h ON c.chunk = h.chunk
        WHERE h.chunk IS NULL)
      SELECT a.doc_id, CAST(a.n_chunks AS BIGINT) AS n_chunks,
             CAST(coalesce(k.n_kept, 0) AS BIGINT) AS n_kept,
             coalesce(k.clean_text, '') AS clean_text
      FROM (SELECT doc_id, count(*) AS n_chunks FROM chunks GROUP BY doc_id) a
      LEFT JOIN (
        SELECT doc_id, count(*) AS n_kept,
               string_agg(chunk, ' ' ORDER BY chunk_pos) AS clean_text
        FROM kept GROUP BY doc_id) k ON a.doc_id = k.doc_id
      ORDER BY a.doc_id""",
    "text_span_dedup_keep_one" -> """
      WITH words AS (
        SELECT doc_id, string_split(trim(text), ' ') AS w FROM documents),
      chunks AS (
        SELECT doc_id, c AS chunk_pos,
               array_to_string(w[c * 10 + 1 : c * 10 + 10], ' ') AS chunk
        FROM words, unnest(generate_series(0, CAST(ceil(len(w) / 10.0) AS INT) - 1)) AS t(c)),
      winner AS (
        SELECT chunk, min(struct_pack(doc_id := doc_id, chunk_pos := chunk_pos)) AS win
        FROM chunks GROUP BY chunk),
      kept AS (
        SELECT c.doc_id, c.chunk_pos, c.chunk
        FROM chunks c JOIN winner v ON c.chunk = v.chunk
        WHERE c.doc_id = v.win.doc_id AND c.chunk_pos = v.win.chunk_pos)
      SELECT a.doc_id, CAST(a.n_chunks AS BIGINT) AS n_chunks,
             CAST(coalesce(k.n_kept, 0) AS BIGINT) AS n_kept,
             coalesce(k.clean_text, '') AS clean_text
      FROM (SELECT doc_id, count(*) AS n_chunks FROM chunks GROUP BY doc_id) a
      LEFT JOIN (
        SELECT doc_id, count(*) AS n_kept,
               string_agg(chunk, ' ' ORDER BY chunk_pos) AS clean_text
        FROM kept GROUP BY doc_id) k ON a.doc_id = k.doc_id
      ORDER BY a.doc_id""",
    "text_token_count" -> """
      SELECT doc_id,
             CAST(len(string_split(trim(lower(text)), ' ')) AS BIGINT) AS n_ws_tokens,
             CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+', 0)) AS BIGINT) AS n_re_tokens,
             CAST(len(list_distinct(string_split(trim(lower(text)), ' '))) AS BIGINT) AS n_unique
      FROM documents ORDER BY doc_id""",
    "text_tfidf_top_terms" -> """
      WITH toks AS (
        SELECT doc_id, t.term
        FROM documents, UNNEST(regexp_extract_all(lower(text), '[a-z0-9]+', 0)) AS t(term)
        WHERE length(t.term) > 2),
      tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
      dfreq AS (SELECT term, count(DISTINCT doc_id) AS df FROM toks GROUP BY 1),
      n AS (SELECT count(*) AS n_docs FROM documents),
      scored AS (
        SELECT tf.doc_id, tf.term,
               CAST(tf.tf * floor((SELECT n_docs FROM n) * 1000.0 / dfreq.df) AS BIGINT) AS score
        FROM tf JOIN dfreq USING (term)),
      ranked AS (
        SELECT doc_id, term, score,
               row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, term) AS rn
        FROM scored)
      SELECT doc_id, term, score, CAST(rn AS INT) AS rn
      FROM ranked WHERE rn <= 3 ORDER BY doc_id, rn""",
    "text_quality_score" -> s"""
      WITH t AS (
        SELECT doc_id, n_chars,
               CAST(length(trim(text)) AS BIGINT) AS text_len,
               string_split(trim(lower(text)), ' ') AS w
        FROM documents)
      SELECT doc_id, n_chars, text_len,
             CAST(len(w) AS BIGINT) AS n_words,
             round(CAST(len(list_filter(w, x -> x IN $stopSql)) AS DOUBLE) / len(w), 4) AS stopword_ratio,
             round((CAST(text_len AS DOUBLE) - (len(w) - 1)) / len(w), 4) AS mean_word_len,
             round(least(round(CAST(len(list_filter(w, x -> x IN $stopSql)) AS DOUBLE) / len(w), 4) * 2
                         + len(w) / 100.0, 1.0), 4) AS quality
      FROM t ORDER BY doc_id""",
    "text_lang_id" -> s"""
      WITH t AS (
        SELECT doc_id, lang AS declared_lang,
               round(CAST(len(list_filter(string_split(trim(lower(text)), ' '),
                                          x -> x IN $stopSql)) AS DOUBLE)
                     / len(string_split(trim(lower(text)), ' ')), 4) AS en_ratio
        FROM documents)
      SELECT doc_id, declared_lang, en_ratio,
             CASE WHEN en_ratio >= 0.1 THEN 'en' ELSE 'unknown' END AS pred_lang
      FROM t ORDER BY doc_id""",
    "text_seeded_shuffle" -> """
      SELECT row_number() OVER (ORDER BY shuffle_key, doc_id) - 1 AS pos,
             doc_id, shuffle_key
      FROM (SELECT doc_id,
                   ((doc_id + 42) * 2654435761) % 4294967311 AS shuffle_key
            FROM documents)
      ORDER BY pos""",
    "text_unigram_logprob" -> """
      WITH toks AS (
        SELECT doc_id, unnest(string_split(trim(lower(text)), ' ')) AS tok
        FROM documents),
      freq AS (SELECT tok, CAST(count(*) AS BIGINT) AS cnt FROM toks GROUP BY tok),
      total AS (SELECT CAST(sum(cnt) AS BIGINT) AS n_corpus FROM freq),
      q AS (SELECT tok,
                   CAST(floor(1e6 * ln(CAST(cnt AS DOUBLE) / n_corpus)) AS BIGINT) AS lp_q
            FROM freq, total)
      SELECT t.doc_id, CAST(count(*) AS BIGINT) AS n_toks,
             CAST(sum(q.lp_q) AS BIGINT) AS sum_lp_q
      FROM toks t JOIN q USING (tok)
      GROUP BY t.doc_id
      HAVING count(*) >= 5
      ORDER BY doc_id""",
    "text_bigram_logprob" -> """
      WITH toks AS (
        SELECT doc_id,
               unnest(string_split(trim(lower(text)), ' ')) AS w1,
               unnest(range(1, len(string_split(trim(lower(text)), ' ')) + 1)) AS pos
        FROM documents),
      big AS (
        SELECT doc_id, w1,
               lead(w1) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
        FROM toks),
      bigf AS (SELECT doc_id, w1, w2 FROM big WHERE w2 IS NOT NULL),
      cnt12 AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c12
                FROM bigf GROUP BY w1, w2),
      cnt1 AS (SELECT w1, CAST(sum(c12) AS BIGINT) AS c1 FROM cnt12 GROUP BY w1),
      lp AS (SELECT cnt12.w1, cnt12.w2,
                    CAST(floor(1e6 * ln(CAST(c12 AS DOUBLE) / c1)) AS BIGINT) AS lp_q
             FROM cnt12 JOIN cnt1 ON cnt12.w1 = cnt1.w1)
      SELECT b.doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
             CAST(sum(lp.lp_q) AS BIGINT) AS sum_lp_q
      FROM bigf b JOIN lp ON b.w1 = lp.w1 AND b.w2 = lp.w2
      GROUP BY b.doc_id
      HAVING count(*) >= 5
      ORDER BY doc_id""",
    "text_bpe_pair_counts" -> s"""
      WITH $bpePcCte
      SELECT a, b, cnt FROM pc ORDER BY cnt DESC, a, b LIMIT 20""",
    "text_bpe_merge_round" -> s"""
      WITH $bpePcCte,
      best AS (SELECT a AS merge_a, b AS merge_b
               FROM pc ORDER BY cnt DESC, a, b LIMIT 1),
      merged AS (
        SELECT freq, replace(padded,
                 ' ' || merge_a || ' ' || merge_b || ' ',
                 ' ' || merge_a || merge_b || ' ') AS padded
        FROM wp, best),
      syms2 AS (SELECT freq, string_split(trim(padded), ' ') AS syms FROM merged),
      pc2 AS (
        SELECT syms[i] AS a, syms[i+1] AS b, CAST(sum(freq) AS BIGINT) AS cnt
        FROM syms2, unnest(generate_series(1, len(syms) - 1)) AS g(i)
        WHERE len(syms) >= 2 GROUP BY a, b)
      SELECT merge_a, merge_b, a, b, cnt
      FROM pc2, best ORDER BY cnt DESC, a, b LIMIT 10""",
    "text_char_entropy" -> """
      WITH ch AS (
        SELECT doc_id, unnest(string_split(trim(lower(text)), '')) AS ch
        FROM documents),
      chf AS (SELECT doc_id, ch FROM ch WHERE ch <> ''),
      cnt AS (SELECT doc_id, ch, CAST(count(*) AS BIGINT) AS nc
              FROM chf GROUP BY doc_id, ch),
      tot AS (SELECT doc_id, CAST(sum(nc) AS BIGINT) AS n FROM cnt GROUP BY doc_id),
      terms AS (SELECT c.doc_id, t.n,
                       nc * (CAST(floor(1e6 * ln(CAST(n AS DOUBLE))) AS BIGINT)
                             - CAST(floor(1e6 * ln(CAST(nc AS DOUBLE))) AS BIGINT)) AS term
                FROM cnt c JOIN tot t ON c.doc_id = t.doc_id)
      SELECT doc_id, max(n) AS n_chars,
             CAST(sum(term) // max(n) AS BIGINT) AS ent_x1e6
      FROM terms GROUP BY doc_id ORDER BY doc_id""",
    "text_bpe_encode" -> s"""
      WITH $bpePcCte,
      b1 AS (SELECT a AS ma, b AS mb FROM pc ORDER BY cnt DESC, a, b LIMIT 1),
      w1 AS (SELECT word, freq,
                    replace(padded, ' ' || ma || ' ' || mb || ' ',
                            ' ' || ma || mb || ' ') AS padded
             FROM wp, b1),
      s2 AS (SELECT freq, string_split(trim(padded), ' ') AS syms FROM w1),
      pc2 AS (SELECT syms[i] AS a, syms[i+1] AS b, CAST(sum(freq) AS BIGINT) AS cnt
              FROM s2, unnest(generate_series(1, len(syms) - 1)) AS g(i)
              WHERE len(syms) >= 2 GROUP BY a, b),
      b2 AS (SELECT a AS ma, b AS mb FROM pc2 ORDER BY cnt DESC, a, b LIMIT 1),
      w2 AS (SELECT word, freq,
                    replace(padded, ' ' || ma || ' ' || mb || ' ',
                            ' ' || ma || mb || ' ') AS padded
             FROM w1, b2),
      s3 AS (SELECT freq, string_split(trim(padded), ' ') AS syms FROM w2),
      pc3 AS (SELECT syms[i] AS a, syms[i+1] AS b, CAST(sum(freq) AS BIGINT) AS cnt
              FROM s3, unnest(generate_series(1, len(syms) - 1)) AS g(i)
              WHERE len(syms) >= 2 GROUP BY a, b),
      b3 AS (SELECT a AS ma, b AS mb FROM pc3 ORDER BY cnt DESC, a, b LIMIT 1),
      w3 AS (SELECT word, freq,
                    replace(padded, ' ' || ma || ' ' || mb || ' ',
                            ' ' || ma || mb || ' ') AS padded
             FROM w2, b3)
      SELECT word, freq, trim(padded) AS seg,
             CAST(len(string_split(trim(padded), ' ')) AS BIGINT) AS n_sym
      FROM w3 ORDER BY freq DESC, word LIMIT 15""",
    "text_fingerprint" -> """
      WITH t AS (
        SELECT doc_id, trim(lower(text)) AS norm,
               string_split(trim(lower(text)), ' ') AS w
        FROM documents)
      SELECT doc_id, md5(norm) AS content_md5,
             list_min(list_transform(generate_series(1, greatest(len(w) - 2, 1)),
                                     i -> md5(array_to_string(w[i:i+2], ' ')))) AS min_shingle_hash
      FROM t ORDER BY doc_id""",
    "text_clean_pipeline" -> s"""
      WITH t AS (
        SELECT doc_id, lang, source, trim(lower(text)) AS norm,
               string_split(trim(lower(text)), ' ') AS w
        FROM documents),
      scored AS (
        SELECT doc_id, lang, source, norm,
               CAST(len(w) AS BIGINT) AS n_words,
               round(CAST(len(list_filter(w, x -> x IN $stopSql)) AS DOUBLE) / len(w), 4) AS en_ratio
        FROM t),
      kept AS (
        SELECT *, md5(norm) AS content_md5
        FROM scored WHERE en_ratio >= 0.1 AND n_words >= 20),
      dedup AS (
        SELECT *, row_number() OVER (PARTITION BY content_md5 ORDER BY doc_id) AS rn
        FROM kept)
      SELECT lang, source, count(*) AS n_docs,
             CAST(sum(n_words) AS BIGINT) AS total_words
      FROM dedup WHERE rn = 1
      GROUP BY lang, source ORDER BY lang, source""",
    "text_lang_id_ngram" -> """
      WITH docs AS (SELECT doc_id, lang, lower(trim(text)) AS t FROM documents),
      tri AS (
        SELECT doc_id, lang,
               unnest(list_transform(generate_series(1, greatest(length(t) - 2, 1)),
                                     i -> t[i:i+2])) AS g
        FROM docs),
      prof0 AS (SELECT lang, g, count(*) AS c FROM tri GROUP BY 1, 2),
      prof AS (
        SELECT lang AS plang, g FROM (
          SELECT lang, g, row_number() OVER (PARTITION BY lang ORDER BY c DESC, g) AS rn
          FROM prof0) WHERE rn <= 20),
      dt AS (SELECT DISTINCT doc_id, g FROM tri),
      scores AS (
        SELECT dt.doc_id, p.plang, count(*) AS hits
        FROM dt JOIN prof p USING (g) GROUP BY 1, 2),
      best AS (
        SELECT doc_id, plang AS best_lang, hits FROM (
          SELECT doc_id, plang, hits,
                 row_number() OVER (PARTITION BY doc_id ORDER BY hits DESC, plang) AS rn
          FROM scores) WHERE rn = 1)
      SELECT d.doc_id, d.lang AS declared_lang, b.best_lang, b.hits
      FROM docs d JOIN best b USING (doc_id)
      ORDER BY d.doc_id""",
    "text_repetition_score" -> """
      WITH t AS (
        SELECT doc_id,
               list_filter(string_split(lower(trim(text)), ' '), x -> x <> '') AS w
        FROM documents)
      SELECT doc_id, CAST(len(w) AS BIGINT) AS n_tokens,
             CAST(len(list_distinct(w)) * 1000 // len(w) AS BIGINT) AS distinct_permille,
             (len(list_distinct(w)) * 1000 // len(w)) < 250 AS is_repetitive
      FROM t ORDER BY doc_id""",
    "text_pii_redact" -> """
      WITH t AS (
        SELECT doc_id,
               text || ' contact user' || doc_id || '@mail.example or +1-555-' ||
                 lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS aug
        FROM documents)
      SELECT doc_id,
             CAST(len(regexp_extract_all(aug, '[a-z0-9]+@[a-z][a-z.]+[a-z]')) AS BIGINT) AS n_emails,
             CAST(len(regexp_extract_all(aug, '\+1-555-[0-9]{4}')) AS BIGINT) AS n_phones,
             md5(regexp_replace(regexp_replace(aug, '[a-z0-9]+@[a-z][a-z.]+[a-z]', '<EMAIL>', 'g'),
                 '\+1-555-[0-9]{4}', '<PHONE>', 'g')) AS redacted_md5
      FROM t ORDER BY doc_id""",
    "text_pack_sequences" -> """
      WITH d AS (
        SELECT doc_id, source,
               CAST(len(string_split(trim(lower(text)), ' ')) AS BIGINT) AS n_tokens
        FROM documents),
      c AS (
        SELECT doc_id, source, n_tokens,
               CAST(coalesce(sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cb
        FROM d)
      SELECT doc_id, source, n_tokens,
             cb // 256 AS start_seq,
             (cb + n_tokens - 1) // 256 AS end_seq
      FROM c ORDER BY source, doc_id""",
    "text_gopher_quality" -> s"""
      WITH d AS (
        SELECT doc_id,
               CAST(len(string_split(trim(lower(text)), ' ')) AS BIGINT) AS n_words,
               CAST(length(translate(trim(lower(text)), ' ', '')) AS BIGINT) AS wchars,
               CAST(len(list_filter(string_split(trim(lower(text)), ' '),
                 w -> w IN $stopSql)) AS BIGINT) AS stop_hits
        FROM documents)
      SELECT doc_id, n_words, (wchars * 100) // n_words AS mwl_x100, stop_hits,
             (n_words BETWEEN 50 AND 100000)
               AND ((wchars * 100) // n_words BETWEEN 300 AND 1000)
               AND (stop_hits >= 2) AS keep
      FROM d ORDER BY doc_id""",
    "text_url_canonical" -> """
      WITH raw AS (
        SELECT doc_id,
          (CASE WHEN doc_id % 2 = 0 THEN 'https' ELSE 'HTTPS' END) || '://'
          || (CASE WHEN doc_id % 3 = 0 THEN 'www.' ELSE '' END)
          || (CASE WHEN doc_id % 2 = 0 THEN source ELSE upper(source) END)
          || '.example.com'
          || (CASE WHEN doc_id % 5 = 0 THEN ':443' ELSE '' END)
          || '/docs/' || CAST(doc_id % 40 AS VARCHAR)
          || (CASE WHEN doc_id % 7 = 0 THEN '/' ELSE '' END)
          || (CASE WHEN doc_id % 4 = 0
                THEN '?utm_source=feed&id=' || CAST(doc_id % 2 AS VARCHAR)
                ELSE '?id=' || CAST(doc_id % 2 AS VARCHAR) END)
          || (CASE WHEN doc_id % 3 = 0 THEN '#sec0' ELSE '' END) AS url
        FROM documents),
      c1 AS (SELECT doc_id, regexp_replace(url, '#.*', '') AS u FROM raw),
      c2 AS (SELECT doc_id,
               lower(regexp_extract(u, '^[^/]*//[^/?#]*'))
                 || substring(u, length(regexp_extract(u, '^[^/]*//[^/?#]*')) + 1) AS u
             FROM c1),
      c3 AS (SELECT doc_id, regexp_replace(u, ':443/', '/') AS u FROM c2),
      c4 AS (SELECT doc_id, regexp_replace(u, '://www\.', '://') AS u FROM c3),
      c5 AS (SELECT doc_id, regexp_replace(u, '[?&]utm_[^&]*', '', 'g') AS u FROM c4),
      c6 AS (SELECT doc_id, regexp_replace(u, '^([^?]*)&', '\1?') AS u FROM c5),
      c7 AS (SELECT doc_id, regexp_replace(u, '/\?', '?') AS u FROM c6)
      SELECT u AS canonical_url, min(doc_id) AS first_doc, count(*) AS n_variants
      FROM c7 GROUP BY u ORDER BY u""",
    "text_corpus_stats" -> """
      SELECT lang, source, count(*) AS n_docs,
             CAST(sum(len(string_split(trim(lower(text)), ' '))) AS BIGINT) AS total_words,
             round(avg(length(trim(text))), 4) AS avg_len
      FROM documents GROUP BY lang, source ORDER BY lang, source"""
  )
}
