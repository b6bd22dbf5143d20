package graft.queries

import graft.{QueryPack, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Similarity search over the embeddings table (SURVEY.md §7.4 M5 /
 * llmops): brute-force cosine top-k as the exactness baseline, an
 * IVF-style partition-restricted top-k as the scale path (the `label`
 * column plays the role of the precomputed coarse-quantizer
 * assignment), and blocked near-duplicate pair mining.
 *
 * Determinism across engines: dot products and squared norms are folded
 * in EXACT integer arithmetic (floats floored to a 1e-7 grid —
 * order-independent, identical in any engine), and the only
 * floating-point ops are a fixed scalar sequence (int→double, sqrt,
 * multiply, divide — all IEEE-correctly-rounded), so scores and
 * rankings are bit-identical vs the DuckDB oracle.
 *
 * Scale notes: the query set is broadcast (small side), candidates
 * stream map-side — brute force is one broadcast-nested-loop with no
 * candidate-side shuffle. The IVF variant turns that into an equi-join
 * on the cluster id, i.e. only same-cell pairs are scored; at 100 TB
 * the cell id would come from a trained coarse quantizer, the plan
 * shape is identical. Pair mining is blocked by label so pairwise work
 * is bounded per block.
 */
object SimilarityQueries extends QueryPack {

  /** Exact integer dot product over PRE-quantized BIGINT vectors —
   * exact and order-independent under any parallelism. */
  private def decDot(a: String, b: String): Column = expr(
    s"""aggregate(zip_with($a, $b, (x, y) -> x * y),
          CAST(0 AS BIGINT), (acc, v) -> acc + v)""")

  /** Quantize each embedding ONCE per row: floats floored to a 1e-7
   * integer grid (floor is IEEE-identical in every engine — unlike
   * decimal-cast tie rounding, which is HALF_UP in Spark but HALF_EVEN
   * in DuckDB). Doing this before the join/cross removes 2×dim
   * cast+floor ops from EVERY scored pair — the pairwise stage then
   * runs integer-only. */
  private def withNorm(df: DataFrame): DataFrame =
    df.withColumn("qe",
        expr("transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 10000000.0D) AS BIGINT))"))
      .withColumn("nrm", decDot("qe", "qe"))

  /** Quantized-embedding frame shared by every sim_* gate — computed
   * once per session (see [[graft.FrameCache]]); the per-element
   * quantize + self-dot runs once, not once per query. */
  private def quantized(s: SparkSession, dir: String): DataFrame =
    graft.FrameCache.cached(s, s"qembed:$dir")(
      withNorm(Tables.load(s, dir, "embeddings")).drop("embedding"))

  /** cos = dot / (sqrt(na) * sqrt(nb)) with the exact same op sequence
   * as the oracle SQL. */
  private val cosine: Column =
    col("dot").cast("double") /
      (sqrt(col("qn").cast("double")) * sqrt(col("cn").cast("double")))

  /** PQ decomposition: every vector's 4 quantized 16-dim subspaces,
   * plus the codebook (the seed vectors' subspaces, vec_id < 4). */
  private def pqSubspaces(s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val subs = quantized(s, dir).select(col("vec_id"), col("label"),
      posexplode(expr("transform(sequence(0, 3), m -> slice(qe, m * 16 + 1, 16))"))
        .as(Seq("m", "sub")))
    val seeds = subs.filter(col("vec_id") < 4)
      .select(col("m").as("sm"), col("vec_id").as("k"), col("sub").as("cent"))
    (subs, seeds)
  }

  /** Per-(vector, subspace) PQ code: nearest codeword by exact integer
   * squared-L2, ties to the smaller codeword id. */
  private def pqAssign(cand: DataFrame, seeds: DataFrame): DataFrame = {
    val d2 = expr(
      """aggregate(zip_with(sub, cent, (x, y) -> (x - y) * (x - y)),
           CAST(0 AS BIGINT), (acc, v) -> acc + v)""")
    val w = Window.partitionBy(col("vec_id"), col("m")).orderBy(col("d2"), col("k"))
    cand.join(broadcast(seeds), col("m") === col("sm"))
      .select(col("vec_id"), col("label"), col("m"), col("k"), d2.as("d2"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .drop("rn")
  }

  /** One exact-integer Lloyd assignment: every point joined to the
   * (small, broadcast) centroid frame, nearest by nrm + cn − 2·dot,
   * ties to the smaller cid. Output: one row per point with its cid
   * and squared distance. */
  private def lloydAssign(pts: DataFrame, cent: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("vec_id")).orderBy(col("dist"), col("cid"))
    pts.crossJoin(broadcast(cent))
      .withColumn("dist", col("nrm") + col("cn") - lit(2L) * decDot("cv", "qe"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .drop("rn", "cv", "cn")
  }

  /** Recompute centroids from an assignment, exactly: per-(cell, dim)
   * component sums divided by the member count on a POSITIVE-shifted
   * integer grid — `(sum + n·SHIFT) div n − SHIFT` is floor division
   * on a positive numerator, identical in Spark (`div` truncates) and
   * DuckDB (`//` floors), where a raw `div` on a negative sum would
   * diverge (truncate vs floor). SHIFT = 1e7 bounds every quantized
   * component (|x| < 1e7 on the grid for |x| < 1.0 floats). */
  private def lloydUpdate(assigned: DataFrame): DataFrame =
    assigned
      .select(col("cid"), posexplode(col("qe")).as(Seq("d", "v")))
      .groupBy(col("cid"), col("d"))
      .agg(expr("(sum(v) + count(1) * 10000000L) div count(1) - 10000000L").as("m"))
      .groupBy(col("cid"))
      .agg(expr("transform(array_sort(collect_list(struct(d, m))), x -> x.m)").as("cv"),
           expr("sum(m * m)").as("cn"))

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Brute-force cosine top-5 per query (queries broadcast).
    "sim_cosine_topk" -> ((s, dir) => {
      val e = quantized(s, dir)
      val q = e.filter(col("vec_id") < 10)
        .select(col("vec_id").as("q_id"), col("qe").as("qv"), col("nrm").as("qn"))
      val c = e.filter(col("vec_id") >= 10)
        .select(col("vec_id"), col("qe"), col("nrm").as("cn"))
      val scored = c.crossJoin(broadcast(q))
        .withColumn("dot", decDot("qv", "qe"))
        .withColumn("cos", cosine)
      val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("vec_id"))
      scored.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 5)
        .select(col("q_id"), col("vec_id"), col("rn"), round(col("cos"), 6).as("cosine"))
        .orderBy(col("q_id"), col("rn"))
    }),

    // IVF-style: only candidates in the query's coarse cell (label).
    "sim_ivf_topk" -> ((s, dir) => {
      val e = quantized(s, dir)
      val q = e.filter(col("vec_id") < 10)
        .select(col("vec_id").as("q_id"), col("label"),
                col("qe").as("qv"), col("nrm").as("qn"))
      val c = e.filter(col("vec_id") >= 10)
        .select(col("vec_id"), col("label"), col("qe"), col("nrm").as("cn"))
      val scored = c.join(broadcast(q), Seq("label"))
        .withColumn("dot", decDot("qv", "qe"))
        .withColumn("cos", cosine)
      val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("vec_id"))
      scored.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("q_id"), col("label"), col("vec_id"), col("rn"),
                round(col("cos"), 6).as("cosine"))
        .orderBy(col("q_id"), col("rn"))
    }),

    // K-MEANS TRAINING ROUND (the IVF coarse quantizer's Lloyd step):
    // seeds = vectors 0..7, every other vector assigned to its nearest
    // centroid by exact integer squared-L2 (nrm + cn − 2·dot, ties →
    // smaller cid), then per-cell member count, total inertia, and the
    // component sums the mean recompute divides (sums, not means — an
    // integer div would floor vs truncate differently across engines
    // on negative sums). One broadcast of 8 centroids, one shuffle on
    // the assignment key: the exact plan a 100-TB IVF build runs per
    // iteration.
    // PRODUCT QUANTIZATION encode (Jégou et al. 2011 — the PQ half of
    // IVF-PQ): 64-dim vectors split into M=4 16-dim subspaces, each
    // assigned to the nearest of K=4 codewords by exact integer
    // squared-L2 (ties → smaller codeword). The codebook is the seed
    // vectors' subspaces (vec_id < 4) — a deterministic stand-in for a
    // trained codebook (one k-means training round is gated
    // separately). Scale: the codebook broadcasts (M*K tiny rows);
    // encoding is one broadcast join + per-(vector, subspace) argmin —
    // candidates never shuffle, and each vector compresses 64 floats
    // to M small codes.
    "sim_pq_encode" -> ((s, dir) => {
      val (subs, seeds) = pqSubspaces(s, dir)
      pqAssign(subs.filter(col("vec_id") >= 4), seeds)
        .groupBy(col("vec_id")).agg(
          max(when(col("m") === 0, col("k"))).cast("int").as("c0"),
          max(when(col("m") === 1, col("k"))).cast("int").as("c1"),
          max(when(col("m") === 2, col("k"))).cast("int").as("c2"),
          max(when(col("m") === 3, col("k"))).cast("int").as("c3"),
          sum(col("d2")).as("err"))
        .orderBy(col("vec_id"))
    }),

    // PQ ASYMMETRIC-DISTANCE top-k (ADC): the query stays full
    // precision; per (query, subspace, codeword) partial distances
    // form a tiny lookup table (4 queries x 4 x 4 = 64 rows,
    // broadcast), and each candidate's distance is the SUM OF M TABLE
    // LOOKUPS keyed by its codes — no per-pair vector arithmetic at
    // all, the property that makes PQ scan billions of codes cheaply.
    "sim_pq_adc_topk" -> ((s, dir) => {
      val (subs, seeds) = pqSubspaces(s, dir)
      val codes = pqAssign(subs.filter(col("vec_id") >= 8), seeds)
      val lut = subs.filter(col("vec_id") >= 4 && col("vec_id") < 8)
        .select(col("vec_id").as("q_id"), col("m").as("qm"), col("sub").as("qsub"))
        .join(broadcast(seeds), col("qm") === col("sm"))
        .select(col("q_id"), col("qm").as("m"), col("k"), expr(
          """aggregate(zip_with(qsub, cent, (x, y) -> (x - y) * (x - y)),
               CAST(0 AS BIGINT), (acc, v) -> acc + v)""").as("pdist"))
      val w = Window.partitionBy(col("q_id")).orderBy(col("adc"), col("vec_id"))
      codes.join(broadcast(lut), Seq("m", "k"))
        .groupBy(col("q_id"), col("vec_id")).agg(sum(col("pdist")).as("adc"))
        .withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
        .select(col("q_id"), col("vec_id"), col("rn"), col("adc"))
        .orderBy(col("q_id"), col("rn"))
    }),

    "sim_kmeans_round" -> ((s, dir) => {
      val e = quantized(s, dir)
      val cent = e.filter(col("vec_id") < 8)
        .select(col("vec_id").as("cid"), col("qe").as("cv"), col("nrm").as("cn"))
      val pts = e.filter(col("vec_id") >= 8)
        .select(col("vec_id"), col("qe"), col("nrm"))
      val scored = pts.crossJoin(broadcast(cent))
        .withColumn("dist", col("nrm") + col("cn") - lit(2L) * decDot("cv", "qe"))
      val w = Window.partitionBy(col("vec_id")).orderBy(col("dist"), col("cid"))
      scored.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .groupBy(col("cid"))
        // inertia accumulates at a 1e6-coarser grid: per-point dist is
        // ~1e14-grid integers, and summing them raw would approach
        // BIGINT range at ~50k members/cell (the 100x headroom rule)
        .agg(count(lit(1)).as("n_members"),
          sum(expr("dist div 1000000")).as("inertia_q"),
          sum(expr("element_at(qe, 1)")).as("c1_sum"),
          sum(expr("element_at(qe, 2)")).as("c2_sum"),
          sum(expr("element_at(qe, 3)")).as("c3_sum"),
          sum(expr("element_at(qe, 4)")).as("c4_sum"))
        .orderBy(col("cid"))
    }),

    // IVF-PQ (Jégou et al. 2011, the combined layout every
    // billion-scale ANN service runs): candidates are restricted to
    // the query's coarse cell (IVF — the `label` equi-join), and
    // within the cell they are scored by PQ asymmetric distance (ADC
    // — sum of M broadcast-table lookups keyed by the candidate's
    // codes). Neither stage touches a candidate-side vector at query
    // time: the scan reads (cell, 4 codes) per candidate — the
    // memory/IO footprint that makes 100 TB of vectors searchable.
    "sim_ivfpq_topk" -> ((s, dir) => {
      val (subs, seeds) = pqSubspaces(s, dir)
      val codes = pqAssign(subs.filter(col("vec_id") >= 8), seeds)
      val lut = subs.filter(col("vec_id") >= 4 && col("vec_id") < 8)
        .select(col("vec_id").as("q_id"), col("label"),
                col("m").as("qm"), col("sub").as("qsub"))
        .join(broadcast(seeds), col("qm") === col("sm"))
        .select(col("q_id"), col("label"), col("qm").as("m"), col("k"), expr(
          """aggregate(zip_with(qsub, cent, (x, y) -> (x - y) * (x - y)),
               CAST(0 AS BIGINT), (acc, v) -> acc + v)""").as("pdist"))
      val w = Window.partitionBy(col("q_id")).orderBy(col("adc"), col("vec_id"))
      codes.join(broadcast(lut), Seq("label", "m", "k"))
        .groupBy(col("q_id"), col("label"), col("vec_id")).agg(sum(col("pdist")).as("adc"))
        .withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
        .select(col("q_id"), col("label"), col("vec_id"), col("rn"), col("adc"))
        .orderBy(col("q_id"), col("rn"))
    }),

    // K-MEANS CONVERGENCE (two exact Lloyd iterations): round-1
    // assignment to the seed centroids, EXACT integer centroid
    // recompute (positive-shifted floor division — see lloydUpdate),
    // round-2 re-assignment to the recomputed centroids, and the
    // convergence signal (n_moved = points whose cell changed). The
    // per-iteration plan is the 100-TB IVF-build loop: one broadcast
    // of k centroids, one shuffle on the assignment key, one
    // per-(cell, dim) aggregate — nothing grows with k × n.
    "sim_kmeans_iterate" -> ((s, dir) => {
      val e = quantized(s, dir)
      val cent0 = e.filter(col("vec_id") < 8)
        .select(col("vec_id").as("cid"), col("qe").as("cv"), col("nrm").as("cn"))
      val pts = e.filter(col("vec_id") >= 8)
        .select(col("vec_id"), col("qe"), col("nrm"))
      val a1 = lloydAssign(pts, cent0)
      val cent1 = lloydUpdate(a1)
      val a2 = lloydAssign(
        a1.select(col("vec_id"), col("qe"), col("nrm"), col("cid").as("cid1")), cent1)
      a2.groupBy(col("cid"))
        .agg(count(lit(1)).as("n_members"),
             sum(expr("dist div 1000000")).as("inertia_q"),
             sum(when(col("cid1") =!= col("cid"), 1L).otherwise(0L)).as("n_moved"))
        .orderBy(col("cid"))
    }),

    // SEMANTIC DEDUP (SemDeDup, Abbas et al. 2023): cluster the
    // corpus with k-means, mine near-duplicate STAR edges WITHIN each
    // learned cell (banded random-hyperplane LSH buckets → bucket-min
    // star → exact cosine verify — never all-pairs, never a clique),
    // connect the verified edges into duplicate groups,
    // and keep ONE representative per group — the member FARTHEST
    // from its cell centroid (the paper's low-centroid-similarity
    // rule; ties → smaller vec_id). Differs from
    // dedup_embedding_cosine in both blocking (learned cells, not a
    // given label) and the keeper rule (centroid distance, not min
    // id). Scale: assignment is one broadcast + shuffle, candidate
    // generation is the (cell, band, sig) equi-join, group detection
    // is bounded label-prop rounds.
    "dedup_semantic" -> ((s, dir) => {
      val e = quantized(s, dir)
      val cent0 = e.filter(col("vec_id") < 8)
        .select(col("vec_id").as("cid"), col("qe").as("cv"), col("nrm").as("cn"))
      val pts = e.filter(col("vec_id") >= 8)
        .select(col("vec_id"), col("qe"), col("nrm"))
      val a1 = graft.FrameCache.cached(s, s"semcells:$dir")(
        lloydAssign(pts, cent0).withColumnRenamed("cid", "cell"))
      // width follows per-cell occupancy (8 learned cells)
      val bits = sigBits(pts.count() / 8L)
      // Slim banded signatures materialized ONCE per session: the frame
      // feeds BOTH the bucket-min aggregate and the candidate probe, and
      // bandSigCol is the most expensive expression in the query (bits ×
      // dim integer ops per row per band) — without caching it computes
      // twice. Projected to (vec_id, cell, band, sig) so the cached
      // blocks carry no 64-dim vectors.
      val banded = graft.FrameCache.cached(s, s"sembanded:$dir")(a1
        .withColumn("band", explode(expr("sequence(0, 5)")))
        .withColumn("sig", bandSigCol(bits))
        .select(col("vec_id"), col("cell"), col("band"), col("sig")))
      // STAR edges per (cell, band, sig) bucket — the same move
      // dedup_embedding_cosine made after the r14 sf10 sweep: all-pairs
      // within a bucket is quadratic in TRUE dup-cluster size (clusters
      // grow with the corpus by design and collide at any signature
      // width; this gate's all-pairs form spilled >75 GB at 200k
      // vectors), while the bucket-min star keeps the bucket-level
      // connectivity the label-prop cascade needs at k−1 edges. Pairs
      // dedup as slim ids; vectors re-join AFTER the dedup.
      val mins = banded.groupBy(col("cell"), col("band"), col("sig"))
        .agg(min(col("vec_id")).as("id_a"))
      val cand = banded.select(col("cell"), col("band"), col("sig"), col("vec_id"))
        .join(mins, Seq("cell", "band", "sig"))
        .filter(col("vec_id") > col("id_a"))
        .select(col("id_a"), col("vec_id").as("id_b"))
        .dropDuplicates("id_a", "id_b")
      val v = quantized(s, dir)
      val va = v.select(col("vec_id").as("id_a"), col("qe").as("qv"), col("nrm").as("qn"))
      val vb = v.select(col("vec_id").as("id_b"), col("qe"), col("nrm").as("cn"))
      val edges = cand.join(va, Seq("id_a")).join(vb, Seq("id_b"))
        .withColumn("dot", decDot("qv", "qe"))
        .withColumn("cos", cosine)
        .filter(col("cos") >= 0.3)
        .select(col("id_a").as("src"), col("id_b").as("dst"))
      val grp = graft.graph.Pregel.minLabelPropagation(
          a1.select(col("vec_id").as("id")), edges, rounds = 4)
        .select(col("id").as("vec_id"), col("label").as("grp"))
      val w = Window.partitionBy(col("grp")).orderBy(col("dist").desc, col("vec_id"))
      a1.select(col("vec_id"), col("cell"), col("dist"))
        .join(grp, Seq("vec_id"))
        .withColumn("keep", when(row_number().over(w) === 1, 1).otherwise(0))
        .select(col("vec_id"), col("cell"), col("grp"), col("keep"))
        .orderBy(col("vec_id"))
    }),

    // IVF RECALL@3: how many of the EXACT top-3 the cell-restricted
    // IVF search recovers per query — the standard ANN quality metric,
    // exact-integer overlap counts (recall = n_overlap / 3).
    "sim_ivf_recall" -> ((s, dir) => {
      val e = quantized(s, dir)
      val q = e.filter(col("vec_id") < 10)
        .select(col("vec_id").as("q_id"), col("label"),
          col("qe").as("qv"), col("nrm").as("qn"))
      val c = e.filter(col("vec_id") >= 10)
        .select(col("vec_id"), col("label"), col("qe"), col("nrm").as("cn"))
      val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("vec_id"))
      def top3(scored: DataFrame): DataFrame = scored
        .withColumn("cos", cosine)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("q_id"), col("vec_id"))
      val exact = top3(c.crossJoin(broadcast(q.drop("label")))
        .withColumn("dot", decDot("qv", "qe")))
      val ivf = top3(c.join(broadcast(q), Seq("label"))
        .withColumn("dot", decDot("qv", "qe")))
        .withColumn("hit", lit(1L))
      exact.join(ivf, Seq("q_id", "vec_id"), "left")
        .groupBy(col("q_id"))
        .agg(sum(coalesce(col("hit"), lit(0L))).as("n_overlap"))
        .orderBy(col("q_id"))
    }),

    // Int8 symmetric quantization (the in-memory compression tier
    // between full precision and PQ: 8× smaller than the i64 grid,
    // dot products in 16-bit multiplies): per-vector scale m =
    // max|component|, codes floor(x·127/m) via positive-shifted floor
    // division (Spark div truncates, DuckDB // floors — they agree
    // only on non-negative numerators). Top-k under int8 scores; the
    // companion recall gate MEASURES the quantization loss against the
    // exact ranking, like sim_ivf_recall does for cell restriction.
    "sim_int8_topk" -> ((s, dir) => {
      val e = int8(quantized(s, dir))
      val q = e.filter(col("vec_id") < 10)
        .select(col("vec_id").as("q_id"), col("c8").as("qv8"), col("n8").as("qn"))
      val c = e.filter(col("vec_id") >= 10)
        .select(col("vec_id"), col("c8"), col("n8").as("cn"))
      val scored = c.crossJoin(broadcast(q))
        .withColumn("dot", decDot("qv8", "c8"))
        .withColumn("cos", cosine)
      val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("vec_id"))
      scored.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 5)
        .select(col("q_id"), col("vec_id"), col("rn"), round(col("cos"), 6).as("cosine8"))
        .orderBy(col("q_id"), col("rn"))
    }),

    "sim_int8_recall" -> ((s, dir) => {
      val full = quantized(s, dir)
      val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("vec_id"))
      def top5(scored: DataFrame): DataFrame = scored
        .withColumn("cos", cosine)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 5)
        .select(col("q_id"), col("vec_id"))
      val exact = top5(full.filter(col("vec_id") >= 10)
        .select(col("vec_id"), col("qe"), col("nrm").as("cn"))
        .crossJoin(broadcast(full.filter(col("vec_id") < 10)
          .select(col("vec_id").as("q_id"), col("qe").as("qv"), col("nrm").as("qn"))))
        .withColumn("dot", decDot("qv", "qe")))
      val e8 = int8(full)
      val approx = top5(e8.filter(col("vec_id") >= 10)
        .select(col("vec_id"), col("c8"), col("n8").as("cn"))
        .crossJoin(broadcast(e8.filter(col("vec_id") < 10)
          .select(col("vec_id").as("q_id"), col("c8").as("qv8"), col("n8").as("qn"))))
        .withColumn("dot", decDot("qv8", "c8")))
        .withColumn("hit", lit(1L))
      exact.join(approx, Seq("q_id", "vec_id"), "left")
        .groupBy(col("q_id"))
        .agg(sum(coalesce(col("hit"), lit(0L))).as("n_overlap"))
        .orderBy(col("q_id"))
    }),

    // BINARY (1-bit) QUANTIZATION top-k: each 64-dim vector collapses
    // to ONE BIGINT of sign bits (32× smaller than float32, 8× smaller
    // than int8), and each candidate pair costs exactly one xor + one
    // popcount — the cheapest possible first-stage scan, the binary
    // tier every modern embedding store (and MRL §6 of Kusupati et
    // al.) offers below int8. Hamming distance approximates angular
    // distance for mean-centered vectors; ties break on vec_id.
    "sim_hamming_topk" -> ((s, dir) => {
      val e = signPacked(quantized(s, dir))
      val q = e.filter(col("vec_id") < 10)
        .select(col("vec_id").as("q_id"), col("sgn").as("qs"))
      val c = e.filter(col("vec_id") >= 10).select(col("vec_id"), col("sgn"))
      val w = Window.partitionBy(col("q_id")).orderBy(col("hamming"), col("vec_id"))
      c.crossJoin(broadcast(q))
        .withColumn("hamming", expr("bit_count(qs ^ sgn)"))
        .withColumn("rn", row_number().over(w)).filter(col("rn") <= 5)
        .select(col("q_id"), col("vec_id"), col("rn"), col("hamming"))
        .orderBy(col("q_id"), col("rn"))
    }),

    // Binary-scan + exact-rerank funnel (the production two-stage):
    // stage 1 scans ONLY (vec_id, 8-byte sign word) — no vector is
    // touched — and keeps 20 candidates per query by Hamming; stage 2
    // fetches full vectors for those 20 (an equi-join back to the
    // store) and reranks by exact cosine. At 100 TB the stage-1 scan
    // reads 8 bytes/vector and stage-2 touches 20 rows/query.
    "sim_hamming_rerank" -> ((s, dir) => {
      val e = signPacked(quantized(s, dir))
      val qBits = e.filter(col("vec_id") < 10)
        .select(col("vec_id").as("q_id"), col("sgn").as("qs"))
      val cBits = e.filter(col("vec_id") >= 10).select(col("vec_id"), col("sgn"))
      val w1 = Window.partitionBy(col("q_id")).orderBy(col("hamming"), col("vec_id"))
      val short = cBits.crossJoin(broadcast(qBits))
        .withColumn("hamming", expr("bit_count(qs ^ sgn)"))
        .withColumn("rn1", row_number().over(w1)).filter(col("rn1") <= 20)
        .select(col("q_id"), col("vec_id"), col("hamming"))
      val cVec = e.filter(col("vec_id") >= 10)
        .select(col("vec_id"), col("qe"), col("nrm").as("cn"))
      val qVec = e.filter(col("vec_id") < 10)
        .select(col("vec_id").as("q_id"), col("qe").as("qv"), col("nrm").as("qn"))
      val w2 = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("vec_id"))
      short.join(cVec, Seq("vec_id"))
        .join(broadcast(qVec), Seq("q_id"))
        .withColumn("dot", decDot("qv", "qe"))
        .withColumn("cos", cosine)
        .withColumn("rn", row_number().over(w2)).filter(col("rn") <= 5)
        .select(col("q_id"), col("vec_id"), col("rn"),
                round(col("cos"), 6).as("cosine"), col("hamming"))
        .orderBy(col("q_id"), col("rn"))
    }),

    // MATRYOSHKA funnel retrieval (MRL, Kusupati et al. 2022 §4.1
    // "adaptive retrieval"): MRL-trained embeddings are usable at any
    // PREFIX length, so stage 1 ranks by the first 16 of 64 dims (4×
    // less IO — a column-pruned scan of the prefix), keeps 20
    // candidates per query, and stage 2 reranks only those by the
    // full-dim exact cosine. Zero-norm prefixes drop (no direction).
    "sim_mrl_funnel" -> ((s, dir) => {
      mrlFunnelTop5(s, dir)
        .select(col("q_id"), col("vec_id"), col("rn"), round(col("cos"), 6).as("cosine"))
        .orderBy(col("q_id"), col("rn"))
    }),

    // MRL funnel RECALL@5 vs the exact full-dim top-5 — the metric
    // that justifies the prefix length / candidate budget choice
    // (same contract as sim_ivf_recall / sim_int8_recall).
    "sim_mrl_recall" -> ((s, dir) => {
      val full = quantized(s, dir)
      val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("vec_id"))
      val exact = full.filter(col("vec_id") >= 10)
        .select(col("vec_id"), col("qe"), col("nrm").as("cn"))
        .crossJoin(broadcast(full.filter(col("vec_id") < 10)
          .select(col("vec_id").as("q_id"), col("qe").as("qv"), col("nrm").as("qn"))))
        .withColumn("dot", decDot("qv", "qe"))
        .withColumn("cos", cosine)
        .withColumn("rn", row_number().over(w)).filter(col("rn") <= 5)
        .select(col("q_id"), col("vec_id"))
      val approx = mrlFunnelTop5(s, dir)
        .select(col("q_id"), col("vec_id")).withColumn("hit", lit(1L))
      exact.join(approx, Seq("q_id", "vec_id"), "left")
        .groupBy(col("q_id"))
        .agg(sum(coalesce(col("hit"), lit(0L))).as("n_overlap"))
        .orderBy(col("q_id"))
    }),

    // LSH-bucketed ANN: 4 random-hyperplane sign bits → 16 buckets;
    // only same-signature candidates are scored (the other scale path
    // next to IVF — at 100 TB this is band-join LSH with trained
    // planes; here planes are DETERMINISTIC pseudo-random ±1
    // coefficients from an integer LCG, so both engines compute
    // bit-identical signatures).
    "sim_lsh_topk" -> ((s, dir) => {
      val e = quantized(s, dir)
        .withColumn("bucket", expr("""
          aggregate(sequence(0, 3), CAST(0 AS BIGINT), (acc, p) ->
            acc + CASE WHEN aggregate(sequence(1, size(qe)), CAST(0 AS BIGINT),
                         (s2, d) -> s2 + element_at(qe, d) *
                           (CASE WHEN ((CAST(1103515245 AS BIGINT) * (CAST(p AS BIGINT) * 1000 + d)
                                        + 12345) div 65536) % 2 = 0
                                 THEN 1 ELSE -1 END)) >= 0
                       THEN CAST(shiftleft(1, p) AS BIGINT) ELSE CAST(0 AS BIGINT) END)"""))
      val q = e.filter(col("vec_id") < 10)
        .select(col("vec_id").as("q_id"), col("bucket"),
                col("qe").as("qv"), col("nrm").as("qn"))
      val c = e.filter(col("vec_id") >= 10)
        .select(col("vec_id"), col("bucket"), col("qe"), col("nrm").as("cn"))
      val scored = c.join(broadcast(q), Seq("bucket"))
        .withColumn("dot", decDot("qv", "qe"))
        .withColumn("cos", cosine)
      val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("vec_id"))
      scored.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("q_id"), col("bucket"), col("vec_id"), col("rn"),
                round(col("cos"), 6).as("cosine"))
        .orderBy(col("q_id"), col("rn"))
    }),

    // Near-dup pair mining through BANDED LSH candidates (the same
    // plan shape as dedup_minhash_lsh): 6 bands × 8 hyperplane sign
    // bits; a pair is a candidate iff some band's signatures collide
    // (OR-of-bands), then exact cosine >= 0.3 verifies. The banding is
    // part of the CONTRACT (standard LSH recall trade-off — tuned for
    // NEAR-dups: ~0.87 recall at cos 0.9, ~1.0 for exact copies;
    // low-similarity pairs are deliberately not mined), and the oracle
    // replicates the deterministic LCG hyperplanes bit-for-bit.
    // Scale: candidate generation is an equi-join on (label, band,
    // sig) — signature WIDTH is what keeps it linear: 8 bits → 256
    // buckets per (label, band) bounds occupancy so candidates grow
    // ~n, not n²/2^bits (the r13 sf1 run caught the original 3-bit
    // form scaling ~32× for 10× vectors; width should grow with
    // log2(n) at production scale). Pair dedup is one shuffle on the
    // pair id.
    "sim_neardup_pairs" -> ((s, dir) =>
      bandedNearDupPairs(s, dir)
        .select(col("label"), col("id_a"), col("id_b"), round(col("cos"), 6).as("cosine"))
        .orderBy(col("label"), col("id_a"), col("id_b"))),

    // Embedding-cosine near-dup DEDUP (the cluster-and-keep cascade
    // over banded candidates — same shape as dedup_lsh_clusters):
    // STAR edges per signature bucket → exact-cosine verification →
    // 4 fixed min-label-propagation rounds → each vector mapped to
    // its cluster's canonical keeper (min vec_id).
    //
    // Star edges, not all-pairs: a TRUE duplicate cluster shares its
    // signatures in every band, so all-pairs candidate emission is
    // quadratic in cluster size no matter how wide the signature —
    // and dup clusters GROW with corpus scale by design (the r14 sf10
    // sweep measured the all-pairs form spilling >70 GB from one
    // ~100k-member cluster; no width ladder can fix a clique).
    // Connecting every bucket member to the bucket MINIMUM yields the
    // same bucket-level connectivity with k−1 edges instead of
    // k(k−1)/2. Post-verification the star can differ from the
    // verified clique only for borderline-cosine members (the bucket
    // min fails the threshold where some other member would pass) —
    // the standard trade every representative-based dedup pipeline
    // makes; the oracle computes the identical star.
    "dedup_embedding_cosine" -> ((s, dir) => {
      val edges = bandedStarEdges(s, dir)
        .select(col("id_a").as("src"), col("id_b").as("dst"))
      val vertices = Tables.load(s, dir, "embeddings")
        .select(col("vec_id").as("id"))
      graft.graph.Pregel.minLabelPropagation(vertices, edges, rounds = 4)
        .select(col("id").as("vec_id"), col("label").as("canonical"))
        .orderBy(col("vec_id"))
    })
  )

  /** Per-(row, band) 3-bit random-hyperplane signature: hyperplane
   * coefficients are deterministic ±1 draws from an integer LCG, so
   * both engines compute bit-identical signatures. Shared by the
   * near-dup pair miners (label-blocked and learned-cell-blocked). */
  /** The 48 deterministic ±1 hyperplanes (6 bands × 8 sign bits × 64
   * dims) hoisted into ONE literal array: signature evaluation becomes
   * a lookup-multiply per element instead of per-element LCG
   * arithmetic (the DuckDB oracle keeps the inline LCG — bit-identical
   * by construction, same formula, same truncating division). */
  private lazy val planesLit: Column = typedLit(
    (0 until 96).map { bp => // 6 bands × up to 16 sign bits
      (1 to 64).map { d =>
        val v = (1103515245L * (bp.toLong * 1000L + d) + 12345L) / 65536L
        if (v % 2 == 0) 1L else -1L
      }.toArray
    }.toArray)
  private lazy val pow2Lit: Column =
    typedLit((0 until 16).map(p => 1L << p).toArray)

  /** Signature WIDTH as a function of block occupancy — the r13 sf1
   * lesson made executable (bits must grow ~log2(n) or candidate
   * pairs grow ~n²/2^bits; the r14 sf10 sweep caught the 8-bit form
   * spilling ~n²/5120 candidate pairs at 200k vectors): 8 bits up to
   * 2048 rows per block, +1 bit per doubling, capped at 16. A pure
   * integer ladder — NOT ceil(log2(...)) — so Spark and the DuckDB
   * oracle compute the identical width with no float-rounding edge.
   * Recall trade (standard LSH): exact/near-exact duplicate clusters
   * (cos ≈ 1) collide at any width; mid-similarity recall at a given
   * band count decreases as bits grow — the production dial is more
   * bands, which block count keeps at 6 here. */
  private[queries] def sigBits(rowsPerBlock: Long): Int =
    8 + Seq(2048L, 4096L, 8192L, 16384L, 32768L, 65536L,
      131072L, 262144L).count(rowsPerBlock > _)

  /** The same ladder as SQL, over a one-row relation aliased `params`
   * with column `npl` (rows per block). */
  private def sigBitsSql(nplSql: String): String = s"""
      params AS (
        SELECT 8 + CAST(npl > 2048 AS INT) + CAST(npl > 4096 AS INT)
                 + CAST(npl > 8192 AS INT) + CAST(npl > 16384 AS INT)
                 + CAST(npl > 32768 AS INT) + CAST(npl > 65536 AS INT)
                 + CAST(npl > 131072 AS INT) + CAST(npl > 262144 AS INT) AS bits
        FROM ($nplSql) n0)"""

  /** Per-(row, band) 8-bit random-hyperplane signature over the
   * literal planes (expects columns `band` and `qe`). The hoisted
   * literal covers dims 1..64 (the fixture contract); dims beyond it
   * fall back to the SAME inline LCG the literal was built from — the
   * DuckDB oracle computes that form for every dim, so a wider
   * embedding fixture stays bit-identical instead of silently scoring
   * out-of-literal bits as 0 (or, under ANSI, crashing on the
   * out-of-bounds element_at). */
  private def bandSigCol(bits: Int): Column =
    aggregate(sequence(lit(0), lit(bits - 1)), lit(0L), (acc, p) => {
      val plane = element_at(planesLit, col("band").cast("int") * lit(bits) + p + lit(1))
      val bp = col("band").cast("long") * lit(bits.toLong) + p.cast("long")
      val dot = aggregate(sequence(lit(1), size(col("qe"))), lit(0L),
        (s2, d) => {
          // LCG value is positive, so `div 65536` == shiftright 16
          val lcg = shiftright(
            lit(1103515245L) * (bp * lit(1000L) + d.cast("long")) + lit(12345L), 16)
          val coef = coalesce(try_element_at(plane, d),
            when(pmod(lcg, lit(2L)) === 0L, lit(1L)).otherwise(lit(-1L)))
          s2 + element_at(col("qe"), d) * coef
        })
      acc + when(dot >= 0, element_at(pow2Lit, p + lit(1))).otherwise(lit(0L))
    })

  /** Banded near-dup candidate pairs with exact verified cosine: the
   * shared core of `sim_neardup_pairs` and `dedup_embedding_cosine`. */
  private def bandedNearDupPairs(s: SparkSession, dir: String): DataFrame = {
    // signature width follows block occupancy (see sigBits) — computed
    // from the data so the DuckDB oracle derives the identical width
    val r0 = Tables.load(s, dir, "embeddings")
      .agg(count(lit(1)), countDistinct(col("label"))).head()
    val bits = sigBits(r0.getLong(0) / math.max(r0.getLong(1), 1L))
    // the banded-signature frame is itself session-cached: it feeds
    // BOTH sides of the candidate join, and both sim_neardup_pairs and
    // dedup_embedding_cosine consume the same pairs
    val e = graft.FrameCache.cached(s, s"banded:$dir")(quantized(s, dir)
      .withColumn("band", explode(expr("sequence(0, 5)")))
      .withColumn("sig", bandSigCol(bits)))
    // The candidate join and pair dedup carry IDS ONLY: true dup
    // clusters collide in EVERY band (no signature width separates
    // cos≈1 copies), so the pre-dedup pair stream is quadratic in
    // cluster size — at sf10 carrying both 64-dim vectors through that
    // shuffle spilled past the machine's disk. Slim pairs make the
    // shuffle ~24 bytes/row; vectors re-join by id AFTER the dedup, so
    // wide rows are output-proportional.
    val a = e.select(col("label"), col("band"), col("sig"), col("vec_id").as("id_a"))
    val b = e.select(col("label"), col("band"), col("sig"), col("vec_id").as("id_b"))
    val cand = a.join(b, Seq("label", "band", "sig"))
      .filter(col("id_a") < col("id_b"))
      .select(col("label"), col("id_a"), col("id_b"))
      .dropDuplicates("id_a", "id_b")
    val v = quantized(s, dir)
    val va = v.select(col("vec_id").as("id_a"), col("qe").as("qv"), col("nrm").as("qn"))
    val vb = v.select(col("vec_id").as("id_b"), col("qe"), col("nrm").as("cn"))
    cand.join(va, Seq("id_a")).join(vb, Seq("id_b"))
      .withColumn("dot", decDot("qv", "qe"))
      .withColumn("cos", cosine)
      .filter(col("cos") >= 0.3)
  }

  /** Verified STAR candidate edges per signature bucket: each
   * (label, band, sig) bucket contributes (bucket-min, member) pairs
   * — k−1 edges where the all-pairs form emits k(k−1)/2 — deduped
   * across bands, then exact-cosine verified at the same 0.3
   * threshold as [[bandedNearDupPairs]]. Linear in bucket occupancy,
   * so TRUE dup clusters (whose members collide in every band at any
   * signature width) scale with corpus growth instead of its square. */
  private def bandedStarEdges(s: SparkSession, dir: String): DataFrame = {
    val r0 = Tables.load(s, dir, "embeddings")
      .agg(count(lit(1)), countDistinct(col("label"))).head()
    val bits = sigBits(r0.getLong(0) / math.max(r0.getLong(1), 1L))
    val e = graft.FrameCache.cached(s, s"banded:$dir")(quantized(s, dir)
      .withColumn("band", explode(expr("sequence(0, 5)")))
      .withColumn("sig", bandSigCol(bits)))
    val mins = e.groupBy(col("label"), col("band"), col("sig"))
      .agg(min(col("vec_id")).as("id_a"))
    val cand = e.join(mins, Seq("label", "band", "sig"))
      .filter(col("vec_id") > col("id_a"))
      .select(col("id_a"), col("vec_id").as("id_b"))
      .dropDuplicates("id_a", "id_b")
    val v = quantized(s, dir)
    val a = v.select(col("vec_id").as("id_a"), col("qe").as("qv"), col("nrm").as("qn"))
    val b = v.select(col("vec_id").as("id_b"), col("qe"), col("nrm").as("cn"))
    cand.join(a, Seq("id_a")).join(b, Seq("id_b"))
      .withColumn("dot", decDot("qv", "qe"))
      .withColumn("cos", cosine)
      .filter(col("cos") >= 0.3)
  }

  /** Sign-bit packing: bit d of `sgn` is set iff component d ≥ 0 on
   * the 1e-7 grid — 64 dims collapse to ONE BIGINT via bitwise OR (no
   * additive overflow at bit 63). The pack runs once per row; every
   * pairwise Hamming after it is `bit_count(a ^ b)`. */
  private def signPacked(df: DataFrame): DataFrame =
    df.withColumn("sgn", expr(
      """aggregate(sequence(0, 63), CAST(0 AS BIGINT), (acc, d) ->
           acc | CASE WHEN element_at(qe, d + 1) >= 0
                      THEN shiftleft(CAST(1 AS BIGINT), d)
                      ELSE CAST(0 AS BIGINT) END)"""))

  /** Shared MRL funnel core: prefix-16 cosine shortlist of 20 per
   * query (stage 1 carries only ids + prefix), exact full-dim rerank
   * of the shortlist via join-back (stage 2). Returns the top-5 with
   * `cos` unrounded — consumed by sim_mrl_funnel and sim_mrl_recall. */
  private def mrlFunnelTop5(s: SparkSession, dir: String): DataFrame = {
    val e = quantized(s, dir)
      .withColumn("p16", expr("slice(qe, 1, 16)"))
      .withColumn("n16", decDot("p16", "p16"))
      .filter(col("n16") > 0)
    val q1 = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("p16").as("qp"), col("n16").as("q16"))
    val c1 = e.filter(col("vec_id") >= 10).select(col("vec_id"), col("p16"), col("n16"))
    val w1 = Window.partitionBy(col("q_id")).orderBy(col("cos16").desc, col("vec_id"))
    val short = c1.crossJoin(broadcast(q1))
      .withColumn("dot16", decDot("qp", "p16"))
      .withColumn("cos16", col("dot16").cast("double") /
        (sqrt(col("q16").cast("double")) * sqrt(col("n16").cast("double"))))
      .withColumn("rn1", row_number().over(w1)).filter(col("rn1") <= 20)
      .select(col("q_id"), col("vec_id"))
    val cVec = quantized(s, dir).select(col("vec_id"), col("qe"), col("nrm").as("cn"))
    val qVec = quantized(s, dir)
      .select(col("vec_id").as("q_id"), col("qe").as("qv"), col("nrm").as("qn"))
    val w2 = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("vec_id"))
    short.join(cVec, Seq("vec_id"))
      .join(broadcast(qVec), Seq("q_id"))
      .withColumn("dot", decDot("qv", "qe"))
      .withColumn("cos", cosine)
      .withColumn("rn", row_number().over(w2)).filter(col("rn") <= 5)
  }

  /** Int8 symmetric per-vector quantization from the 1e-7 grid:
   * scale m = max|qe_j| (exact BIGINT), code_j = floor(qe_j·127/m) via
   * positive-shifted floor division (numerator qe_j·127 + m·127 ≥ 0,
   * where Spark's truncating `div` equals DuckDB's flooring `//`).
   * Zero vectors (m = 0) drop — they have no cosine. */
  private def int8(df: DataFrame): DataFrame = df
    .withColumn("m", expr(
      "aggregate(qe, CAST(0 AS BIGINT), (acc, x) -> greatest(acc, abs(x)))"))
    .filter(col("m") > 0)
    .withColumn("c8", expr("transform(qe, x -> (x * 127 + m * 127) div m - 127)"))
    .withColumn("n8", decDot("c8", "c8"))

  private val int8Cte = """
    i0 AS (SELECT vec_id, label, qe, list_max([abs(x) for x in qe]) AS m
           FROM e WHERE list_max([abs(x) for x in qe]) > 0),
    i8 AS (SELECT vec_id, label,
             [(x * 127 + m * 127) // m - 127 for x in qe] AS c8
           FROM i0),
    i AS (SELECT vec_id, label, c8, list_sum([x * x for x in c8]) AS n8
          FROM i8)"""

  private val normCte = """
    e0 AS (SELECT vec_id, label,
             [CAST(floor(CAST(x AS DOUBLE) * 10000000.0) AS BIGINT)
              for x in embedding] AS qe
           FROM embeddings),
    e AS (SELECT vec_id, label, qe,
            list_sum([x * x for x in qe]) AS nrm
          FROM e0)"""

  private def dotSql(a: String, b: String) =
    s"""list_sum([$a[i] * $b[i] for i in generate_series(1, len($a))])"""

  override def oracle: Map[String, String] = Map(
    "sim_cosine_topk" -> s"""
      WITH $normCte,
      q AS (SELECT vec_id AS q_id, qe AS qv, nrm AS qn FROM e WHERE vec_id < 10),
      c AS (SELECT vec_id, qe, nrm AS cn FROM e WHERE vec_id >= 10),
      p AS (SELECT q_id, vec_id, ${dotSql("qv", "qe")} AS dot, qn, cn FROM q, c),
      s AS (SELECT q_id, vec_id,
                   CAST(dot AS DOUBLE) / (sqrt(CAST(qn AS DOUBLE)) * sqrt(CAST(cn AS DOUBLE))) AS cos
            FROM p),
      r AS (SELECT q_id, vec_id, cos,
                   row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id) AS rn
            FROM s)
      SELECT q_id, vec_id, rn, round(cos, 6) AS cosine
      FROM r WHERE rn <= 5 ORDER BY q_id, rn""",
    "sim_ivf_topk" -> s"""
      WITH $normCte,
      q AS (SELECT vec_id AS q_id, label, qe AS qv, nrm AS qn FROM e WHERE vec_id < 10),
      c AS (SELECT vec_id, label, qe, nrm AS cn FROM e WHERE vec_id >= 10),
      p AS (SELECT q_id, q.label AS label, vec_id, ${dotSql("qv", "qe")} AS dot, qn, cn
            FROM q JOIN c ON q.label = c.label),
      s AS (SELECT q_id, label, vec_id,
                   CAST(dot AS DOUBLE) / (sqrt(CAST(qn AS DOUBLE)) * sqrt(CAST(cn AS DOUBLE))) AS cos
            FROM p),
      r AS (SELECT q_id, label, vec_id, cos,
                   row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id) AS rn
            FROM s)
      SELECT q_id, label, vec_id, rn, round(cos, 6) AS cosine
      FROM r WHERE rn <= 3 ORDER BY q_id, rn""",
    "sim_pq_encode" -> s"""
      WITH $normCte,
      subs AS (SELECT vec_id, m, qe[m * 16 + 1 : m * 16 + 16] AS sub
               FROM e, (SELECT unnest([0, 1, 2, 3]) AS m)),
      dist AS (SELECT c.vec_id, c.m, s.vec_id AS k,
                      list_sum([(c.sub[i] - s.sub[i]) * (c.sub[i] - s.sub[i])
                                for i in generate_series(1, 16)]) AS d2
               FROM subs c JOIN subs s ON s.m = c.m AND s.vec_id < 4
               WHERE c.vec_id >= 4),
      codes AS (SELECT *, row_number() OVER (PARTITION BY vec_id, m ORDER BY d2, k) AS rn
                FROM dist)
      SELECT vec_id,
             CAST(max(CASE WHEN m = 0 THEN k END) AS INT) AS c0,
             CAST(max(CASE WHEN m = 1 THEN k END) AS INT) AS c1,
             CAST(max(CASE WHEN m = 2 THEN k END) AS INT) AS c2,
             CAST(max(CASE WHEN m = 3 THEN k END) AS INT) AS c3,
             CAST(sum(d2) AS BIGINT) AS err
      FROM codes WHERE rn = 1 GROUP BY vec_id ORDER BY vec_id""",
    "sim_pq_adc_topk" -> s"""
      WITH $normCte,
      subs AS (SELECT vec_id, m, qe[m * 16 + 1 : m * 16 + 16] AS sub
               FROM e, (SELECT unnest([0, 1, 2, 3]) AS m)),
      dist AS (SELECT c.vec_id, c.m, s.vec_id AS k,
                      list_sum([(c.sub[i] - s.sub[i]) * (c.sub[i] - s.sub[i])
                                for i in generate_series(1, 16)]) AS d2
               FROM subs c JOIN subs s ON s.m = c.m AND s.vec_id < 4
               WHERE c.vec_id >= 8),
      codes AS (SELECT vec_id, m, k, d2,
                       row_number() OVER (PARTITION BY vec_id, m ORDER BY d2, k) AS rn
                FROM dist),
      lut AS (SELECT q.vec_id AS q_id, q.m, s.vec_id AS k,
                     list_sum([(q.sub[i] - s.sub[i]) * (q.sub[i] - s.sub[i])
                               for i in generate_series(1, 16)]) AS pdist
              FROM subs q JOIN subs s ON s.m = q.m AND s.vec_id < 4
              WHERE q.vec_id >= 4 AND q.vec_id < 8),
      adc AS (SELECT l.q_id, c.vec_id, CAST(sum(l.pdist) AS BIGINT) AS adc
              FROM codes c JOIN lut l ON l.m = c.m AND l.k = c.k
              WHERE c.rn = 1
              GROUP BY l.q_id, c.vec_id),
      r AS (SELECT q_id, vec_id, adc,
                   row_number() OVER (PARTITION BY q_id ORDER BY adc, vec_id) AS rn
            FROM adc)
      SELECT q_id, vec_id, CAST(rn AS INT) AS rn, adc
      FROM r WHERE rn <= 3 ORDER BY q_id, rn""",
    "sim_kmeans_round" -> s"""
      WITH $normCte,
      cent AS (SELECT vec_id AS cid, qe AS cv, nrm AS cn FROM e WHERE vec_id < 8),
      pts AS (SELECT vec_id, qe, nrm FROM e WHERE vec_id >= 8),
      p AS (SELECT pts.vec_id, cid, qe,
                   CAST(pts.nrm + cn - 2 * ${dotSql("cv", "qe")} AS BIGINT) AS dist
            FROM pts, cent),
      a AS (SELECT vec_id, cid, dist, qe,
                   row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
            FROM p)
      SELECT cid, count(*) AS n_members,
             CAST(sum(dist // 1000000) AS BIGINT) AS inertia_q,
             CAST(sum(qe[1]) AS BIGINT) AS c1_sum,
             CAST(sum(qe[2]) AS BIGINT) AS c2_sum,
             CAST(sum(qe[3]) AS BIGINT) AS c3_sum,
             CAST(sum(qe[4]) AS BIGINT) AS c4_sum
      FROM a WHERE rn = 1 GROUP BY cid ORDER BY cid""",
    "sim_ivf_recall" -> s"""
      WITH $normCte,
      q AS (SELECT vec_id AS q_id, label, qe AS qv, nrm AS qn FROM e WHERE vec_id < 10),
      c AS (SELECT vec_id, label, qe, nrm AS cn FROM e WHERE vec_id >= 10),
      px AS (SELECT q_id, vec_id, ${dotSql("qv", "qe")} AS dot, qn, cn FROM q, c),
      sx AS (SELECT q_id, vec_id,
                    CAST(dot AS DOUBLE) / (sqrt(CAST(qn AS DOUBLE)) * sqrt(CAST(cn AS DOUBLE))) AS cos
             FROM px),
      rx AS (SELECT q_id, vec_id,
                    row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id) AS rn
             FROM sx),
      tx AS (SELECT q_id, vec_id FROM rx WHERE rn <= 3),
      pi AS (SELECT q_id, vec_id, ${dotSql("qv", "qe")} AS dot, qn, cn
             FROM q JOIN c ON q.label = c.label),
      si AS (SELECT q_id, vec_id,
                    CAST(dot AS DOUBLE) / (sqrt(CAST(qn AS DOUBLE)) * sqrt(CAST(cn AS DOUBLE))) AS cos
             FROM pi),
      ri AS (SELECT q_id, vec_id,
                    row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id) AS rn
             FROM si),
      ti AS (SELECT q_id, vec_id FROM ri WHERE rn <= 3)
      SELECT tx.q_id,
             CAST(sum(CASE WHEN ti.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_overlap
      FROM tx LEFT JOIN ti ON tx.q_id = ti.q_id AND tx.vec_id = ti.vec_id
      GROUP BY tx.q_id ORDER BY tx.q_id""",
    "sim_int8_topk" -> s"""
      WITH $normCte,
      $int8Cte,
      q AS (SELECT vec_id AS q_id, c8 AS qv8, n8 AS qn FROM i WHERE vec_id < 10),
      c AS (SELECT vec_id, c8, n8 AS cn FROM i WHERE vec_id >= 10),
      p AS (SELECT q_id, vec_id, ${dotSql("qv8", "c8")} AS dot, qn, cn FROM q, c),
      s AS (SELECT q_id, vec_id,
                   CAST(dot AS DOUBLE) / (sqrt(CAST(qn AS DOUBLE)) * sqrt(CAST(cn AS DOUBLE))) AS cos
            FROM p),
      r AS (SELECT q_id, vec_id, cos,
                   row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id) AS rn
            FROM s)
      SELECT q_id, vec_id, rn, round(cos, 6) AS cosine8
      FROM r WHERE rn <= 5 ORDER BY q_id, rn""",
    "sim_int8_recall" -> s"""
      WITH $normCte,
      $int8Cte,
      q AS (SELECT vec_id AS q_id, qe AS qv, nrm AS qn FROM e WHERE vec_id < 10),
      c AS (SELECT vec_id, qe, nrm AS cn FROM e WHERE vec_id >= 10),
      px AS (SELECT q_id, vec_id, ${dotSql("qv", "qe")} AS dot, qn, cn FROM q, c),
      sx AS (SELECT q_id, vec_id,
                    CAST(dot AS DOUBLE) / (sqrt(CAST(qn AS DOUBLE)) * sqrt(CAST(cn AS DOUBLE))) AS cos
             FROM px),
      rx AS (SELECT q_id, vec_id,
                    row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id) AS rn
             FROM sx),
      tx AS (SELECT q_id, vec_id FROM rx WHERE rn <= 5),
      q8 AS (SELECT vec_id AS q_id, c8 AS qv8, n8 AS qn FROM i WHERE vec_id < 10),
      c8s AS (SELECT vec_id, c8, n8 AS cn FROM i WHERE vec_id >= 10),
      pi AS (SELECT q_id, vec_id, ${dotSql("qv8", "c8")} AS dot, qn, cn FROM q8, c8s),
      si AS (SELECT q_id, vec_id,
                    CAST(dot AS DOUBLE) / (sqrt(CAST(qn AS DOUBLE)) * sqrt(CAST(cn AS DOUBLE))) AS cos
             FROM pi),
      ri AS (SELECT q_id, vec_id,
                    row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id) AS rn
             FROM si),
      ti AS (SELECT q_id, vec_id FROM ri WHERE rn <= 5)
      SELECT tx.q_id,
             CAST(sum(CASE WHEN ti.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_overlap
      FROM tx LEFT JOIN ti ON tx.q_id = ti.q_id AND tx.vec_id = ti.vec_id
      GROUP BY tx.q_id ORDER BY tx.q_id""",
    "sim_hamming_topk" -> s"""
      WITH $normCte,
      q AS (SELECT vec_id AS q_id, qe FROM e WHERE vec_id < 10),
      c AS (SELECT vec_id, qe FROM e WHERE vec_id >= 10),
      p AS (SELECT q_id, c.vec_id,
              list_sum([CASE WHEN (q.qe[i] >= 0) <> (c.qe[i] >= 0) THEN 1 ELSE 0 END
                        for i in generate_series(1, 64)]) AS hamming
            FROM q, c),
      r AS (SELECT q_id, vec_id, hamming,
                   row_number() OVER (PARTITION BY q_id ORDER BY hamming, vec_id) AS rn
            FROM p)
      SELECT q_id, vec_id, rn, CAST(hamming AS INT) AS hamming
      FROM r WHERE rn <= 5 ORDER BY q_id, rn""",
    "sim_hamming_rerank" -> s"""
      WITH $normCte,
      q AS (SELECT vec_id AS q_id, qe FROM e WHERE vec_id < 10),
      c AS (SELECT vec_id, qe FROM e WHERE vec_id >= 10),
      p AS (SELECT q_id, c.vec_id,
              list_sum([CASE WHEN (q.qe[i] >= 0) <> (c.qe[i] >= 0) THEN 1 ELSE 0 END
                        for i in generate_series(1, 64)]) AS hamming
            FROM q, c),
      s1 AS (SELECT q_id, vec_id, hamming,
                    row_number() OVER (PARTITION BY q_id ORDER BY hamming, vec_id) AS rn1
             FROM p),
      cand AS (SELECT q_id, vec_id, hamming FROM s1 WHERE rn1 <= 20),
      p2 AS (SELECT cand.q_id, cand.vec_id, cand.hamming,
                    ${dotSql("a.qe", "b.qe")} AS dot, a.nrm AS qn, b.nrm AS cn
             FROM cand JOIN e a ON a.vec_id = cand.q_id
                       JOIN e b ON b.vec_id = cand.vec_id),
      s2 AS (SELECT q_id, vec_id, hamming,
                    CAST(dot AS DOUBLE) / (sqrt(CAST(qn AS DOUBLE)) * sqrt(CAST(cn AS DOUBLE))) AS cos
             FROM p2),
      r AS (SELECT q_id, vec_id, hamming, cos,
                   row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id) AS rn
            FROM s2)
      SELECT q_id, vec_id, rn, round(cos, 6) AS cosine, CAST(hamming AS INT) AS hamming
      FROM r WHERE rn <= 5 ORDER BY q_id, rn""",
    "sim_mrl_funnel" -> s"""
      WITH $normCte,
      pe AS (SELECT vec_id, qe, nrm, qe[1:16] AS p16,
                    list_sum([x * x for x in qe[1:16]]) AS n16
             FROM e),
      pf AS (SELECT * FROM pe WHERE n16 > 0),
      q AS (SELECT vec_id AS q_id, p16 AS qp, n16 AS q16 FROM pf WHERE vec_id < 10),
      c AS (SELECT vec_id, p16, n16 FROM pf WHERE vec_id >= 10),
      p1 AS (SELECT q_id, vec_id, ${dotSql("qp", "p16")} AS dot16, q16, n16 FROM q, c),
      s1 AS (SELECT q_id, vec_id,
                    CAST(dot16 AS DOUBLE) / (sqrt(CAST(q16 AS DOUBLE)) * sqrt(CAST(n16 AS DOUBLE))) AS cos16
             FROM p1),
      r1 AS (SELECT q_id, vec_id,
                    row_number() OVER (PARTITION BY q_id ORDER BY cos16 DESC, vec_id) AS rn1
             FROM s1),
      cand AS (SELECT q_id, vec_id FROM r1 WHERE rn1 <= 20),
      p2 AS (SELECT cand.q_id, cand.vec_id,
                    ${dotSql("a.qe", "b.qe")} AS dot, a.nrm AS qn, b.nrm AS cn
             FROM cand JOIN e a ON a.vec_id = cand.q_id
                       JOIN e b ON b.vec_id = cand.vec_id),
      s2 AS (SELECT q_id, vec_id,
                    CAST(dot AS DOUBLE) / (sqrt(CAST(qn AS DOUBLE)) * sqrt(CAST(cn AS DOUBLE))) AS cos
             FROM p2),
      r2 AS (SELECT q_id, vec_id, cos,
                    row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id) AS rn
             FROM s2)
      SELECT q_id, vec_id, rn, round(cos, 6) AS cosine
      FROM r2 WHERE rn <= 5 ORDER BY q_id, rn""",
    "sim_mrl_recall" -> s"""
      WITH $normCte,
      qx AS (SELECT vec_id AS q_id, qe AS qv, nrm AS qn FROM e WHERE vec_id < 10),
      cx AS (SELECT vec_id, qe, nrm AS cn FROM e WHERE vec_id >= 10),
      px AS (SELECT q_id, vec_id, ${dotSql("qv", "qe")} AS dot, qn, cn FROM qx, cx),
      sx AS (SELECT q_id, vec_id,
                    CAST(dot AS DOUBLE) / (sqrt(CAST(qn AS DOUBLE)) * sqrt(CAST(cn AS DOUBLE))) AS cos
             FROM px),
      rx AS (SELECT q_id, vec_id,
                    row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id) AS rn
             FROM sx),
      tx AS (SELECT q_id, vec_id FROM rx WHERE rn <= 5),
      pe AS (SELECT vec_id, qe, nrm, qe[1:16] AS p16,
                    list_sum([x * x for x in qe[1:16]]) AS n16
             FROM e),
      pf AS (SELECT * FROM pe WHERE n16 > 0),
      q AS (SELECT vec_id AS q_id, p16 AS qp, n16 AS q16 FROM pf WHERE vec_id < 10),
      c AS (SELECT vec_id, p16, n16 FROM pf WHERE vec_id >= 10),
      p1 AS (SELECT q_id, vec_id, ${dotSql("qp", "p16")} AS dot16, q16, n16 FROM q, c),
      s1 AS (SELECT q_id, vec_id,
                    CAST(dot16 AS DOUBLE) / (sqrt(CAST(q16 AS DOUBLE)) * sqrt(CAST(n16 AS DOUBLE))) AS cos16
             FROM p1),
      r1 AS (SELECT q_id, vec_id,
                    row_number() OVER (PARTITION BY q_id ORDER BY cos16 DESC, vec_id) AS rn1
             FROM s1),
      cand AS (SELECT q_id, vec_id FROM r1 WHERE rn1 <= 20),
      p2 AS (SELECT cand.q_id, cand.vec_id,
                    ${dotSql("a.qe", "b.qe")} AS dot, a.nrm AS qn, b.nrm AS cn
             FROM cand JOIN e a ON a.vec_id = cand.q_id
                       JOIN e b ON b.vec_id = cand.vec_id),
      s2 AS (SELECT q_id, vec_id,
                    CAST(dot AS DOUBLE) / (sqrt(CAST(qn AS DOUBLE)) * sqrt(CAST(cn AS DOUBLE))) AS cos
             FROM p2),
      r2 AS (SELECT q_id, vec_id,
                    row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id) AS rn
             FROM s2),
      ti AS (SELECT q_id, vec_id FROM r2 WHERE rn <= 5)
      SELECT tx.q_id,
             CAST(sum(CASE WHEN ti.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_overlap
      FROM tx LEFT JOIN ti ON tx.q_id = ti.q_id AND tx.vec_id = ti.vec_id
      GROUP BY tx.q_id ORDER BY tx.q_id""",
    "sim_lsh_topk" -> s"""
      WITH $normCte,
      eb AS (SELECT vec_id, qe, nrm,
               list_sum([CASE WHEN list_sum([qe[d] *
                   (CASE WHEN ((1103515245 * (p * 1000 + d) + 12345) // 65536) % 2 = 0
                         THEN 1 ELSE -1 END)
                   for d in generate_series(1, len(qe))]) >= 0
                 THEN (1 << p) ELSE 0 END
                 for p in generate_series(0, 3)]) AS bucket
             FROM e),
      q AS (SELECT vec_id AS q_id, bucket, qe AS qv, nrm AS qn FROM eb WHERE vec_id < 10),
      c AS (SELECT vec_id, bucket, qe, nrm AS cn FROM eb WHERE vec_id >= 10),
      p AS (SELECT q_id, q.bucket AS bucket, vec_id, ${dotSql("qv", "qe")} AS dot, qn, cn
            FROM q JOIN c ON q.bucket = c.bucket),
      s AS (SELECT q_id, bucket, vec_id,
                   CAST(dot AS DOUBLE) / (sqrt(CAST(qn AS DOUBLE)) * sqrt(CAST(cn AS DOUBLE))) AS cos
            FROM p),
      r AS (SELECT q_id, bucket, vec_id, cos,
                   row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id) AS rn
            FROM s)
      SELECT q_id, CAST(bucket AS BIGINT) AS bucket, vec_id, rn, round(cos, 6) AS cosine
      FROM r WHERE rn <= 3 ORDER BY q_id, rn""",
    "sim_ivfpq_topk" -> s"""
      WITH $normCte,
      subs AS (SELECT vec_id, label, m, qe[m * 16 + 1 : m * 16 + 16] AS sub
               FROM e, (SELECT unnest([0, 1, 2, 3]) AS m)),
      dist AS (SELECT c.vec_id, c.label, c.m, s.vec_id AS k,
                      list_sum([(c.sub[i] - s.sub[i]) * (c.sub[i] - s.sub[i])
                                for i in generate_series(1, 16)]) AS d2
               FROM subs c JOIN subs s ON s.m = c.m AND s.vec_id < 4
               WHERE c.vec_id >= 8),
      codes AS (SELECT vec_id, label, m, k, d2,
                       row_number() OVER (PARTITION BY vec_id, m ORDER BY d2, k) AS rn
                FROM dist),
      lut AS (SELECT q.vec_id AS q_id, q.label, q.m, s.vec_id AS k,
                     list_sum([(q.sub[i] - s.sub[i]) * (q.sub[i] - s.sub[i])
                               for i in generate_series(1, 16)]) AS pdist
              FROM subs q JOIN subs s ON s.m = q.m AND s.vec_id < 4
              WHERE q.vec_id >= 4 AND q.vec_id < 8),
      adc AS (SELECT l.q_id, c.label, c.vec_id, CAST(sum(l.pdist) AS BIGINT) AS adc
              FROM codes c JOIN lut l ON l.label = c.label AND l.m = c.m AND l.k = c.k
              WHERE c.rn = 1
              GROUP BY l.q_id, c.label, c.vec_id),
      r AS (SELECT q_id, label, vec_id, adc,
                   row_number() OVER (PARTITION BY q_id ORDER BY adc, vec_id) AS rn
            FROM adc)
      SELECT q_id, label, vec_id, CAST(rn AS INT) AS rn, adc
      FROM r WHERE rn <= 3 ORDER BY q_id, rn""",
    "sim_kmeans_iterate" -> s"""
      WITH $normCte,
      cent0 AS (SELECT vec_id AS cid, qe AS cv, nrm AS cn FROM e WHERE vec_id < 8),
      pts AS (SELECT vec_id, qe, nrm FROM e WHERE vec_id >= 8),
      d1 AS (SELECT p.vec_id, p.qe, p.nrm, c.cid,
                    p.nrm + c.cn - 2 * ${dotSql("c.cv", "p.qe")} AS dist
             FROM pts p, cent0 c),
      a1 AS (SELECT vec_id, qe, nrm, cid, dist,
                    row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
             FROM d1),
      m1 AS (SELECT cid, d,
                    (sum(qe[d]) + count(*) * 10000000) // count(*) - 10000000 AS m
             FROM a1, generate_series(1, 64) AS t(d)
             WHERE rn = 1
             GROUP BY cid, d),
      cent1 AS (SELECT cid, list(m ORDER BY d) AS cv, sum(m * m) AS cn
                FROM m1 GROUP BY cid),
      d2 AS (SELECT a.vec_id, a.cid AS cid1, c.cid,
                    a.nrm + c.cn - 2 * ${dotSql("c.cv", "a.qe")} AS dist
             FROM (SELECT * FROM a1 WHERE rn = 1) a, cent1 c),
      a2 AS (SELECT vec_id, cid1, cid, dist,
                    row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn2
             FROM d2)
      SELECT cid, CAST(count(*) AS BIGINT) AS n_members,
             CAST(sum(dist // 1000000) AS BIGINT) AS inertia_q,
             CAST(sum(CASE WHEN cid1 <> cid THEN 1 ELSE 0 END) AS BIGINT) AS n_moved
      FROM a2 WHERE rn2 = 1 GROUP BY cid ORDER BY cid""",
    "dedup_semantic" -> s"""
      WITH $normCte,
      cent0 AS (SELECT vec_id AS cid, qe AS cv, nrm AS cn FROM e WHERE vec_id < 8),
      pts AS (SELECT vec_id, qe, nrm FROM e WHERE vec_id >= 8),
      d1 AS (SELECT p.vec_id, p.qe, p.nrm, c.cid,
                    p.nrm + c.cn - 2 * ${dotSql("c.cv", "p.qe")} AS dist
             FROM pts p, cent0 c),
      a1 AS (SELECT vec_id, qe, nrm, cid AS cell, dist,
                    row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
             FROM d1),
      ac AS (SELECT vec_id, qe, nrm, cell, dist FROM a1 WHERE rn = 1),
      ${sigBitsSql("SELECT count(*) // 8 AS npl FROM e WHERE vec_id >= 8")},
      eb AS MATERIALIZED (SELECT vec_id, cell, qe, nrm, band,
               list_sum([CASE WHEN list_sum([qe[d] *
                   (CASE WHEN ((1103515245 * ((band * bits + p) * 1000 + d) + 12345) // 65536) % 2 = 0
                         THEN 1 ELSE -1 END)
                   for d in generate_series(1, len(qe))]) >= 0
                 THEN (1 << p) ELSE 0 END
                 for p in generate_series(0, bits - 1)]) AS sig
             FROM ac, params, generate_series(0, 5) AS t(band)),
      bm AS (SELECT cell, band, sig, min(vec_id) AS id_a
             FROM eb GROUP BY cell, band, sig),
      cand AS (SELECT DISTINCT bm.id_a, eb.vec_id AS id_b
               FROM eb JOIN bm ON eb.cell = bm.cell AND eb.band = bm.band
                 AND eb.sig = bm.sig
               WHERE eb.vec_id > bm.id_a),
      p AS (SELECT c.id_a, c.id_b, ${dotSql("a.qe", "b.qe")} AS dot,
              a.nrm AS qn, b.nrm AS cn
            FROM cand c JOIN e a ON a.vec_id = c.id_a JOIN e b ON b.vec_id = c.id_b),
      pr AS (SELECT id_a, id_b FROM p
             WHERE CAST(dot AS DOUBLE) / (sqrt(CAST(qn AS DOUBLE)) * sqrt(CAST(cn AS DOUBLE))) >= 0.3),
      edges AS (SELECT id_a AS src, id_b AS dst FROM pr
                UNION SELECT id_b, id_a FROM pr),
      l0 AS (SELECT vec_id AS id, vec_id AS lbl FROM ac),
      l1 AS (SELECT l.id, least(l.lbl, coalesce(m.nl, l.lbl)) AS lbl
             FROM l0 l LEFT JOIN (SELECT e2.dst AS id, min(x.lbl) AS nl
                                  FROM edges e2 JOIN l0 x ON e2.src = x.id
                                  GROUP BY e2.dst) m ON l.id = m.id),
      l2 AS (SELECT l.id, least(l.lbl, coalesce(m.nl, l.lbl)) AS lbl
             FROM l1 l LEFT JOIN (SELECT e2.dst AS id, min(x.lbl) AS nl
                                  FROM edges e2 JOIN l1 x ON e2.src = x.id
                                  GROUP BY e2.dst) m ON l.id = m.id),
      l3 AS (SELECT l.id, least(l.lbl, coalesce(m.nl, l.lbl)) AS lbl
             FROM l2 l LEFT JOIN (SELECT e2.dst AS id, min(x.lbl) AS nl
                                  FROM edges e2 JOIN l2 x ON e2.src = x.id
                                  GROUP BY e2.dst) m ON l.id = m.id),
      l4 AS (SELECT l.id, least(l.lbl, coalesce(m.nl, l.lbl)) AS lbl
             FROM l3 l LEFT JOIN (SELECT e2.dst AS id, min(x.lbl) AS nl
                                  FROM edges e2 JOIN l3 x ON e2.src = x.id
                                  GROUP BY e2.dst) m ON l.id = m.id),
      k AS (SELECT ac.vec_id, ac.cell, l4.lbl AS grp, ac.dist,
                   row_number() OVER (PARTITION BY l4.lbl ORDER BY ac.dist DESC, ac.vec_id) AS krn
            FROM ac JOIN l4 ON l4.id = ac.vec_id)
      SELECT vec_id, cell, grp, CAST(CASE WHEN krn = 1 THEN 1 ELSE 0 END AS INT) AS keep
      FROM k ORDER BY vec_id""",
    "dedup_embedding_cosine" -> s"""
      WITH $normCte,
      ${sigBitsSql("SELECT count(*) // count(DISTINCT label) AS npl FROM embeddings")},
      eb AS MATERIALIZED (SELECT vec_id, label, qe, nrm, band,
               list_sum([CASE WHEN list_sum([qe[d] *
                   (CASE WHEN ((1103515245 * ((band * bits + p) * 1000 + d) + 12345) // 65536) % 2 = 0
                         THEN 1 ELSE -1 END)
                   for d in generate_series(1, len(qe))]) >= 0
                 THEN (1 << p) ELSE 0 END
                 for p in generate_series(0, bits - 1)]) AS sig
             FROM e, params, generate_series(0, 5) AS t(band)),
      bm AS (SELECT label, band, sig, min(vec_id) AS id_a
             FROM eb GROUP BY label, band, sig),
      cand AS (SELECT DISTINCT bm.id_a, eb.vec_id AS id_b
               FROM eb JOIN bm ON eb.label = bm.label AND eb.band = bm.band
                 AND eb.sig = bm.sig
               WHERE eb.vec_id > bm.id_a),
      p AS (SELECT c.id_a, c.id_b, ${dotSql("a.qe", "b.qe")} AS dot,
              a.nrm AS qn, b.nrm AS cn
            FROM cand c JOIN e a ON a.vec_id = c.id_a JOIN e b ON b.vec_id = c.id_b),
      pr AS (SELECT id_a, id_b FROM p
             WHERE CAST(dot AS DOUBLE) / (sqrt(CAST(qn AS DOUBLE)) * sqrt(CAST(cn AS DOUBLE))) >= 0.3),
      edges AS (SELECT id_a AS src, id_b AS dst FROM pr
                UNION SELECT id_b, id_a FROM pr),
      v AS (SELECT vec_id AS id FROM embeddings),
      l0 AS (SELECT id, id AS lbl FROM v),
      l1 AS (SELECT l.id, least(l.lbl, coalesce(m.nl, l.lbl)) AS lbl
             FROM l0 l LEFT JOIN (SELECT e2.dst AS id, min(x.lbl) AS nl
                                  FROM edges e2 JOIN l0 x ON e2.src = x.id
                                  GROUP BY e2.dst) m ON l.id = m.id),
      l2 AS (SELECT l.id, least(l.lbl, coalesce(m.nl, l.lbl)) AS lbl
             FROM l1 l LEFT JOIN (SELECT e2.dst AS id, min(x.lbl) AS nl
                                  FROM edges e2 JOIN l1 x ON e2.src = x.id
                                  GROUP BY e2.dst) m ON l.id = m.id),
      l3 AS (SELECT l.id, least(l.lbl, coalesce(m.nl, l.lbl)) AS lbl
             FROM l2 l LEFT JOIN (SELECT e2.dst AS id, min(x.lbl) AS nl
                                  FROM edges e2 JOIN l2 x ON e2.src = x.id
                                  GROUP BY e2.dst) m ON l.id = m.id),
      l4 AS (SELECT l.id, least(l.lbl, coalesce(m.nl, l.lbl)) AS lbl
             FROM l3 l LEFT JOIN (SELECT e2.dst AS id, min(x.lbl) AS nl
                                  FROM edges e2 JOIN l3 x ON e2.src = x.id
                                  GROUP BY e2.dst) m ON l.id = m.id)
      SELECT id AS vec_id, lbl AS canonical FROM l4 ORDER BY vec_id""",
    "sim_neardup_pairs" -> s"""
      WITH $normCte,
      ${sigBitsSql("SELECT count(*) // count(DISTINCT label) AS npl FROM embeddings")},
      eb AS (SELECT vec_id, label, qe, nrm, band,
               list_sum([CASE WHEN list_sum([qe[d] *
                   (CASE WHEN ((1103515245 * ((band * bits + p) * 1000 + d) + 12345) // 65536) % 2 = 0
                         THEN 1 ELSE -1 END)
                   for d in generate_series(1, len(qe))]) >= 0
                 THEN (1 << p) ELSE 0 END
                 for p in generate_series(0, bits - 1)]) AS sig
             FROM e, params, generate_series(0, 5) AS t(band)),
      cand AS (SELECT DISTINCT a.label AS label, a.vec_id AS id_a, b.vec_id AS id_b
               FROM eb a JOIN eb b ON a.label = b.label AND a.band = b.band
                 AND a.sig = b.sig AND a.vec_id < b.vec_id),
      p AS (SELECT c.label, c.id_a, c.id_b,
              ${dotSql("a.qe", "b.qe")} AS dot,
              a.nrm AS qn, b.nrm AS cn
            FROM cand c JOIN e a ON a.vec_id = c.id_a JOIN e b ON b.vec_id = c.id_b),
      s AS (SELECT label, id_a, id_b,
                   CAST(dot AS DOUBLE) / (sqrt(CAST(qn AS DOUBLE)) * sqrt(CAST(cn AS DOUBLE))) AS cos
            FROM p)
      SELECT label, id_a, id_b, round(cos, 6) AS cosine
      FROM s WHERE cos >= 0.3 ORDER BY label, id_a, id_b"""
  )
}
