package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination for training corpora: flag corpus
  * documents that share word n-grams with an evaluation/benchmark set
  * (the standard overlap check run before LLM training — published as
  * 13-gram dedup in public model reports; the reference crawler has no
  * counterpart, this is the training-data extension of the pipeline).
  *
  * Scale notes (100 TB corpus): the benchmark side is an eval set —
  * megabytes, not terabytes, by contract — so its distinct-gram table
  * carries an explicit broadcast hint and the corpus side stays
  * map-only (tokenize → shingle → explode) until the per-doc
  * aggregation, which shuffles HIT rows only (corpus rows with no
  * benchmark overlap die in the join). Without the hint, size
  * estimation is free to build the EXPLODED CORPUS side instead
  * (observed at sf0.1: BuildLeft on the corpus grams) — harmless on a
  * laptop, an OOM at 100 TB. The hint pins the build side to the one
  * input that does not grow with the corpus.
  *
  * Adaptive on the [[Dedup.noVerbatimDups]] probe, like the dedup
  * family: a replicated crawl corpus shingles every copy of a text for
  * the same answer, so when verbatim duplicates exist the corpus
  * collapses to one representative per content digest BEFORE
  * shingling (fixed-width-only HashAggregate; representative text via
  * a join-back on digest + id = rep), overlap is computed once per
  * DISTINCT text, and the per-digest result expands back to every
  * member through a broadcast join — identical output by construction
  * (identical texts have identical overlap), spec-pinned. On a unique
  * corpus the collapse is pure overhead and the direct path runs.
  *
  * Shingling is the native one-pass
  * [[graft.functions.DistinctShinglesExpr]] with [[Dedup.words]]'
  * single-space split semantics, so the DuckDB oracle reproduces every
  * gram byte-for-byte.
  */
object Decontaminate {

  /** Per-corpus-doc n-gram overlap against `bench`:
    * (doc_id, n_hits, n_shingles, contamination, first_match) with
    * contamination = n_hits / n_shingles over DISTINCT k-word shingles
    * and first_match = the smallest benchmark id owning a shared gram.
    * Docs shorter than k words have no shingles and never appear. */
  def ngramHits(corpus: DataFrame, bench: DataFrame, idCol: String,
                textCol: String, k: Int,
                corpusNoDups: Option[Boolean] = None,
                benchNoDups: Option[Boolean] = None): DataFrame = {
    // corpusNoDups / benchNoDups: optional PRECOMPUTED duplication-
    // probe answers (see [[Dedup.nearDupComponents]]'s `noDups`) —
    // composite pipelines fuse the probe scans into one pass; routing
    // and output are unchanged.
    val bg = benchGrams(bench, idCol, textCol, k, benchNoDups)
    if (corpusNoDups.getOrElse(Dedup.noVerbatimDups(corpus, textCol, textCol)))
      directHits(corpus, bg, idCol, textCol, k)
    else collapsedHits(corpus, bg, idCol, textCol, k)
  }

  /** [[ngramHits]] for the regime where the eval-gram table has grown
    * past broadcast-hash-relation size (a full benchmark-suite gram
    * table at ~50 bytes/key is tens of GB as a hash relation — not
    * shippable to every executor): build a Bloom filter over the eval
    * grams (`2^log2Bits` BITS total — 128 KiB at the default — riding
    * into the probe task as a codegen reference object), prefilter the
    * exploded corpus grams MAP-ONLY, and confirm the survivors with an
    * exact sort-merge join. Zero false negatives means the output is
    * hash-identical to [[ngramHits]]' direct path by construction; the
    * bloom only changes which bytes reach the exchange — at a typical
    * sub-percent contamination rate, ~all of the corpus-gram shuffle
    * (the dominant cost: O(corpus tokens) rows) disappears before it
    * ships. The `merge` hint pins the confirm join to sort-merge so the
    * plan under test IS the at-scale plan (without it, AQE broadcasts
    * the toy-scale eval table and the prefilter demonstrates nothing).
    *
    * The filter build is deterministic regardless of partitioning:
    * set-bit union is commutative, so the bit pattern depends only on
    * the key set. Build cost is one pass over the (small) eval side;
    * the distinct set-bit collect is bounded by the filter size `m`,
    * the same bounded-driver-set contract as the k-means centroid
    * matrix.
    *
    * Mirrors Spark's own `InjectRuntimeFilter` bloom (public source,
    * `spark/sql/catalyst/optimizer/InjectRuntimeFilter.scala`) as an
    * explicit operator: the optimizer rule only fires on selective
    * equi-joins it can cost, while a decontamination pipeline KNOWS the
    * corpus side dwarfs the eval side and wants the filter
    * unconditionally. */
  def ngramHitsBloom(corpus: DataFrame, bench: DataFrame, idCol: String,
                     textCol: String, k: Int, log2Bits: Int = 20,
                     numHash: Int = 5): DataFrame = {
    import graft.functions.BloomFunctions
    val bg = benchGrams(bench, idCol, textCol, k)
    val setPositions = bg
      .select(explode(BloomFunctions
        .bloomPositions(col("g"), numHash, log2Bits)).as("p"))
      .distinct()
      .collect() // bounded by 2^log2Bits — the filter's own bit count
      .map(_.getInt(0))
    val bits = graft.functions.BloomOps.buildBits(setPositions, log2Bits)
    def prefiltered(grams: DataFrame) = grams
      .where(BloomFunctions.bloomContains(col("g"), bits, numHash, log2Bits))
    // ADAPTIVE like ngramHits: on a replicated corpus, shingling every
    // copy feeds the (pinned sort-merge) confirm join a gram stream
    // that scales with COPIES — the collapse prices it by DISTINCT
    // texts and expands per-digest hits back to members, bit-identical
    // (measured 30 → ~2 s at a 100×-replicated sf10). The bloom
    // prefilter applies to the rep gram stream the same way.
    if (Dedup.noVerbatimDups(corpus, textCol, textCol)) {
      // widened scan (r17): same starved-scan repair as [[directHits]]
      val grams = prefiltered(docGrams(
        withGs(graft.plans.InputWidth.widen(
          corpus.select(col(idCol).cast("long").as("doc_id"),
            col(textCol))), textCol, k), "doc_id"))
      grams.join(bg.hint("merge"), "g")
        .groupBy("doc_id", "n_shingles")
        .agg(count(lit(1)).as("n_hits"), min("bench_id").as("first_match"))
        .select(col("doc_id"), col("n_hits"), col("n_shingles"),
          (col("n_hits").cast("double") / col("n_shingles").cast("double"))
            .as("contamination"),
          col("first_match"))
    } else {
      val members = corpus.select(col(idCol).cast("long").as("doc_id"),
        md5(col(textCol)).as("digest"))
      val repIds = members.groupBy("digest").agg(min("doc_id").as("rep"))
      val repRows = corpus
        .select(col(idCol).cast("long").as("m_id"), col(textCol))
        .join(repIds.withColumnRenamed("digest", "r_digest"),
          col("m_id") === col("rep"))
        .select(col("r_digest").as("digest"), col(textCol))
      val hitsByDigest = prefiltered(
          docGrams(withGs(repRows, textCol, k), "digest"))
        .join(bg.hint("merge"), "g")
        .groupBy("digest", "n_shingles")
        .agg(count(lit(1)).as("n_hits"), min("bench_id").as("first_match"))
      members.join(hitsByDigest, "digest")
        .select(col("doc_id"), col("n_hits"), col("n_shingles"),
          (col("n_hits").cast("double") / col("n_shingles").cast("double"))
            .as("contamination"),
          col("first_match"))
    }
  }

  /** (g, bench_id = min owning benchmark id) per distinct eval-set
    * gram. Small by contract — callers broadcast it. */
  /** (gram → min benchmark id) table. ADAPTIVE on verbatim-duplicate
    * eval mass: a replicated benchmark table (the gen_scale shape —
    * same texts, shifted ids) otherwise explodes one gram row per
    * COPY into the group-by exchange (measured at sf1000: the q53
    * bench side is ~3.8 M rows of ~5 k distinct texts — a tens-of-GB
    * gram shuffle that spilled the suite to 26.7× for 10× data), so
    * with duplicates present the bench collapses to one representative
    * per content digest BEFORE shingling and grams are priced by
    * DISTINCT texts. Identical output by construction: every doc
    * containing gram g belongs to a digest whose representative also
    * contains g, and that digest's bench_id is the min member id — so
    * min over reps = min over all members, gram by gram. On a
    * dup-free benchmark the collapse is pure overhead and the direct
    * explode runs. */
  private def benchGrams(bench: DataFrame, idCol: String, textCol: String,
                         k: Int,
                         noDups: Option[Boolean] = None): DataFrame = {
    val perDoc =
      if (noDups.getOrElse(Dedup.noVerbatimDups(bench, textCol, textCol)))
        bench.select(col(idCol).cast("long").as("bench_id"), col(textCol))
      else {
        val mins = bench
          .select(col(idCol).cast("long").as("doc_id"), md5(col(textCol)).as("digest"))
          .groupBy("digest").agg(min("doc_id").as("bench_id"))
        bench.select(col(idCol).cast("long").as("doc_id"), col(textCol))
          .join(mins, col("doc_id") === col("bench_id"))
          .select(col("bench_id"), col(textCol))
      }
    perDoc.select(
        explode_outer(graft.functions.TextHashExpressions
          .distinctShingles(col(textCol), k)).as("g"),
        col("bench_id"))
      .groupBy("g").agg(min("bench_id").as("bench_id"))
  }

  /** Contamination ATTRIBUTION: for each corpus doc sharing at least
    * `minShared` distinct k-grams with some eval doc, report WHICH
    * eval doc leaked (argmax shared grams, ties to the lowest eval
    * id) and how many eval docs it touches — the audit report a
    * decontamination pipeline ships alongside its drop list: "dirty"
    * is actionable, "contains eval item 1403" is auditable.
    *
    * Scale: eval grams broadcast PINNED (eval sets are megabytes by
    * contract — the q53 argument; the corpus side must never be the
    * build side), the corpus side is one map-only shingle pass, and
    * only HIT rows reach the two aggregations. The per-doc argmax is
    * a single hash-aggregable BIGINT max: (shared, eval_id) packs as
    * `shared · 2^32 + (2^32−1 − eval_id)` — numeric order = (shared
    * DESC, eval_id ASC) lexicographic order — because max(struct)
    * falls back to SortAggregate (the q15 packing argument).
    * Precondition (caller contract, like pagerank's scale): eval ids
    * in [0, 2^32) and shared < 2^31 — shared is bounded by per-doc
    * distinct grams, so any realistic document qualifies. */
  def attribution(corpus: DataFrame, bench: DataFrame, idCol: String,
                  textCol: String, k: Int, minShared: Long = 2L): DataFrame = {
    // Attribution is over distinct eval ITEMS: verbatim-duplicate eval
    // docs collapse to one canonical (min-id) item BEFORE shingling,
    // so the broadcast prices by distinct eval texts — a replicated
    // eval table (the gen_scale shape: same texts, shifted ids) would
    // otherwise grow the (gram, eval_id) broadcast linearly with the
    // replication factor and OOM exactly when the data gets big
    // (observed at sf10). Reporting the min-id copy is also the right
    // CONTRACT: two identical eval items are one leak, not two.
    val bg = bench
      .select(col(idCol).cast("long").as("eval_id"), col(textCol).as("btext"))
      .groupBy("btext").agg(min("eval_id").as("eval_id"))
      .select(
        explode_outer(graft.functions.TextHashExpressions
          .distinctShingles(col("btext"), k)).as("g"),
        col("eval_id"))
      .where(col("g").isNotNull)
    // Corpus side is ADAPTIVE like q53 (collapsedHits): identical
    // texts share their gram set, so on a replicated corpus the
    // shingle pass, the broadcast join, and both aggregations run
    // once per DISTINCT text and the per-digest report expands back
    // to members — bit-identical per member (spec-pinned), shuffle
    // mass priced by distinct texts (57 → a few seconds at a
    // 100×-replicated sf10 shape).
    if (Dedup.mostlyUnique(corpus, textCol, textCol)) {
      val cg = withGs(graft.plans.InputWidth.widen(
          corpus.select(col(idCol), col(textCol))), textCol, k)
        .select(col(idCol).cast("long").as("doc_id"),
          explode_outer(col("gs")).as("g"))
      attributionReport(cg.join(broadcast(bg), "g"), "doc_id", minShared)
    } else {
      val agg = corpus
        .select(md5(col(textCol)).as("digest"), col(idCol).as("m_id"))
        .groupBy("digest")
        .agg(min(col("m_id")).as("rep"))
      val reps = corpus
        .select(md5(col(textCol)).as("digest"), col(idCol).as("rep"),
          col(textCol).as("rtext"))
        .join(agg, Seq("digest", "rep"))
      val cg = withGs(reps, "rtext", k)
        .select(col("digest"), explode_outer(col("gs")).as("g"))
      val perDigest = attributionReport(cg.join(broadcast(bg), "g"),
        "digest", minShared)
      val members = corpus.select(md5(col(textCol)).as("digest"),
        col(idCol).cast("long").as("doc_id"))
      perDigest.join(members, "digest")
        .select(col("doc_id"), col("n_evals"), col("top_shared"), col("top_eval"))
    }
  }

  /** The shared (hit-rows → per-key report) tail of [[attribution]]:
    * (key, eval_id) shared-gram counts, minShared floor, then the
    * packed-BIGINT argmax per key. */
  private def attributionReport(hits: DataFrame, keyCol: String,
                                minShared: Long): DataFrame = {
    // The packing requires 0 <= eval_id < 2^32 and shared < 2^31 —
    // enforced, not just documented: a violating row raises instead of
    // silently corrupting top_shared/top_eval via sign overflow or
    // eval-id wraparound. The CaseWhen keeps the assert off the happy
    // path (branches evaluate lazily in codegen).
    val packOk = col("eval_id").between(0L, 4294967295L) &&
      col("shared") < lit(2147483648L)
    val packed = when(packOk,
        col("shared") * lit(4294967296L) + (lit(4294967295L) - col("eval_id")))
      .otherwise(expr("CAST(assert_true(false, concat('attribution pack overflow: " +
        "needs 0 <= eval_id < 2^32 and shared < 2^31, got eval_id=', " +
        "CAST(eval_id AS STRING), ' shared=', CAST(shared AS STRING))) AS BIGINT)"))
    hits
      .groupBy(col(keyCol), col("eval_id"))
      .agg(count(lit(1)).as("shared"))
      .where(col("shared") >= minShared)
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_evals"),
        max(packed).as("pk"))
      .selectExpr(keyCol, "n_evals",
        "pk div 4294967296 AS top_shared",
        "4294967295 - pk % 4294967296 AS top_eval")
  }

  /** (doc_id, n_shingles, g) per distinct gram of each doc of `df`,
    * with `idExpr` naming the id column to carry.
    *
    * explode_OUTER on purpose: a plain explode triggers Catalyst's
    * InferFiltersFromGenerate, which pushes `size(shingles)>0 AND
    * isnotnull(shingles)` into the scan — TWO extra full shingle
    * evaluations per doc (measured 3× the pipeline's map cost at
    * sf10). outer emits one null-gram row for shingle-less docs
    * instead, and the inner join on `g` drops it — same output, one
    * expression evaluation per doc. */
  private def docGrams(df: DataFrame, idName: String): DataFrame =
    df.select(col(idName),
      size(col("gs")).as("n_shingles"), explode_outer(col("gs")).as("g"))

  private def withGs(df: DataFrame, textCol: String, k: Int): DataFrame =
    df.withColumn("gs", graft.functions.TextHashExpressions
      .distinctShingles(col(textCol), k))

  /** Embedding-space decontamination: flag corpus vectors whose cosine
    * against ANY eval-set vector reaches `minCos` — the semantic
    * companion to [[ngramHits]]' verbatim n-gram check (published eval
    * hygiene uses both: paraphrased benchmark leakage survives 13-gram
    * dedup but not an embedding sweep). Output per contaminated corpus
    * vector: (vec_id, n_evals = #eval vectors at/above threshold,
    * first_eval = smallest such eval id, max_cos), ordered by vec_id.
    *
    * Scale shape: the eval side is megabytes by contract — normalized
    * once and BROADCAST (pinned, the q53 argument), so the corpus side
    * is a single map-only pass (normalize → dot against each resident
    * eval vector) and only HIT rows reach the per-vector aggregation,
    * which partial-aggregates map-side (a corpus vector's eval matches
    * all originate in the same input row). Threshold membership and
    * `max_cos` are reproducible across engines: both sides fold the
    * dot product left-to-right in double precision
    * ([[Similarity.normalized]]'s contract), and IEEE ops are
    * deterministic given identical operation order.
    *
    * Contract: `corpus` and `eval` are id-disjoint frames (an eval
    * vector passed in the corpus simply matches itself at cos 1). */
  def embedHits(corpus: DataFrame, eval: DataFrame, idCol: String,
                vecCol: String, minCos: Double): DataFrame = {
    val e = Similarity.normalized(eval, idCol, vecCol, "eval_id", "ev")
    def hitsFor(c: DataFrame, keyName: String): DataFrame =
      c.crossJoin(broadcast(e))
        .select(col(keyName), col("eval_id"),
          Similarity.dotD(col("cv"), col("ev")).as("cos"))
        .where(col("cos") >= minCos)
        .groupBy(keyName)
        .agg(count(lit(1)).as("n_evals"), min("eval_id").as("first_eval"),
          max("cos").as("max_cos"))
    // ADAPTIVE on a duplicate-vector probe (the dedup-family shape —
    // duplicate documents carry duplicate embeddings): identical
    // vectors have identical eval sweeps, so with duplicates present
    // the corpus collapses to one representative per distinct VECTOR
    // (the vector is the GROUP KEY — map-side partials collapse
    // replicas before the exchange) and per-rep results expand back
    // to members through a join on the vector. Bit-identical by
    // construction. The exact-dup probe uses xxhash64 over the raw
    // array — a collision only mis-routes to the (always-correct)
    // collapsed path.
    val probe = corpus.agg(count(lit(1)),
      count_distinct(xxhash64(col(vecCol)))).first()
    if (probe.getLong(0) == probe.getLong(1)) {
      hitsFor(Similarity.normalized(corpus, idCol, vecCol, "vec_id", "cv"),
        "vec_id").orderBy("vec_id")
    } else {
      val members = corpus.select(col(idCol).cast("long").as("vec_id"),
        col(vecCol).as("__v"))
      val reps = members.groupBy("__v").agg(min("vec_id").as("rep"))
      val repHits = hitsFor(
        Similarity.normalized(reps, "rep", "__v", "rep_id", "cv"), "rep_id")
      members.join(reps, "__v")
        .join(repHits, col("rep") === col("rep_id"))
        .select(col("vec_id"), col("n_evals"), col("first_eval"),
          col("max_cos"))
        .orderBy("vec_id")
    }
  }

  /** Cross-corpus n-gram novelty: for each `df` document, how much of
    * its DISTINCT k-gram content is UNSEEN in the reference corpus —
    * the "new information" signal of an incremental crawl (a re-crawl
    * that is 95% boilerplate-overlapping with the last snapshot is
    * priced here, doc by doc). Output: top `topK` most-novel docs as
    * (doc_id, n_shingles, n_novel, novelty_ppm), ranked by the
    * INTEGER novelty (parts-per-million — float fractions would make
    * top-k membership engine-fragile), ties on doc_id.
    *
    * Scale shape: both sides shingle map-only (native distinct-shingle
    * pass, explode_outer); the reference collapses to its DISTINCT
    * gram set (fixed-width after hashing? no — grams themselves, but
    * one row per distinct gram via partial-agg'd distinct) and the
    * novelty join is a LEFT ANTI — corpus-sized both sides, so the
    * strategy is AQE's call with skew handling, the q55 argument. The
    * per-doc aggregate partial-aggregates map-side; top-k is
    * TakeOrderedAndProject. */
  def ngramNovelty(df: DataFrame, ref: DataFrame, idCol: String,
                   textCol: String, k: Int, topK: Int): DataFrame = {
    // Each side collapses independently (adaptive per-side probes):
    // the reference's distinct gram set and a doc's novelty are both
    // functions of the TEXT, so shingling replicas is pure waste.
    val refRows =
      if (Dedup.noVerbatimDups(ref, textCol, textCol))
        // widened scan (r17): the reference side is corpus-sized too,
        // and its shingle pass is the same CPU-dense starved scan
        graft.plans.InputWidth.widen(ref.select(col(textCol)))
      else repTexts(ref, idCol, textCol).select(col(textCol))
    val refGrams = refRows
      .select(explode_outer(graft.functions.TextHashExpressions
        .distinctShingles(col(textCol), k)).as("g"))
      .where(col("g").isNotNull).distinct()
    if (Dedup.noVerbatimDups(df, textCol, textCol)) {
      // widened scan (r17): same starved-scan repair as [[directHits]]
      val grams = docGrams(
        withGs(graft.plans.InputWidth.widen(
          df.select(col(idCol).cast("long").as("doc_id"), col(textCol))),
          textCol, k), "doc_id")
        .where(col("g").isNotNull)
      noveltyRank(grams, refGrams, "doc_id", topK)
    } else {
      val members = df.select(col(idCol).cast("long").as("doc_id"),
        md5(col(textCol)).as("digest"))
      val grams = docGrams(
        withGs(repTexts(df, idCol, textCol), textCol, k), "digest")
        .where(col("g").isNotNull)
      val byDigest = noveltyStats(grams, refGrams, "digest")
      members.join(byDigest, "digest")
        .select(col("doc_id"), col("n_shingles"), col("n_novel"),
          col("novelty_ppm"))
        .orderBy(col("novelty_ppm").desc, col("doc_id"))
        .limit(topK)
    }
  }

  /** One (digest, text) row per distinct text of `df` — the standard
    * fixed-width collapse + join-back on id = rep. */
  private def repTexts(df: DataFrame, idCol: String,
                       textCol: String): DataFrame = {
    val repIds = df
      .select(md5(col(textCol)).as("digest"), col(idCol).cast("long").as("m_id"))
      .groupBy("digest").agg(min("m_id").as("rep"))
    df.select(col(idCol).cast("long").as("m_id"), col(textCol))
      .join(repIds.withColumnRenamed("digest", "r_digest"),
        col("m_id") === col("rep"))
      .select(col("r_digest").as("digest"), col(textCol))
  }

  private def noveltyStats(grams: DataFrame, refGrams: DataFrame,
                           keyName: String): DataFrame = {
    val novel = grams.join(refGrams, Seq("g"), "left_anti")
      .groupBy(keyName).agg(count(lit(1)).as("n_novel"))
    grams.select(keyName, "n_shingles").distinct()
      .join(novel, Seq(keyName), "left")
      .select(col(keyName), col("n_shingles"),
        coalesce(col("n_novel"), lit(0L)).as("n_novel"))
      .withColumn("novelty_ppm",
        expr("n_novel * 1000000 div n_shingles"))
  }

  private def noveltyRank(grams: DataFrame, refGrams: DataFrame,
                          keyName: String, topK: Int): DataFrame =
    noveltyStats(grams, refGrams, keyName)
      .orderBy(col("novelty_ppm").desc, col(keyName))
      .limit(topK)

  /** Doc-level pipeline: one shingle pass per corpus ROW. The scan is
    * WIDENED (r17, the [[attribution]] pattern): shingling is
    * CPU-dense per row, and a compact single-row-group corpus pins it
    * to one task (measured 0.8 s serial inside q90 at sf0.1 while 31
    * cores idle); [[graft.plans.InputWidth]] repartitions only when
    * the physical input cannot feed every core — a no-op at cluster
    * scale. */
  private[graft] def directHits(corpus: DataFrame, bg: DataFrame,
                                    idCol: String, textCol: String,
                                    k: Int): DataFrame = {
    val grams = docGrams(
      withGs(graft.plans.InputWidth.widen(
        corpus.select(col(idCol).cast("long").as("doc_id"),
          col(textCol))), textCol, k), "doc_id")
    grams.join(broadcast(bg), "g")
      .groupBy("doc_id", "n_shingles")
      .agg(count(lit(1)).as("n_hits"), min("bench_id").as("first_match"))
      .select(col("doc_id"), col("n_hits"), col("n_shingles"),
        (col("n_hits").cast("double") / col("n_shingles").cast("double"))
          .as("contamination"),
        col("first_match"))
  }

  /** Corpus-internal duplicated-span statistics (the span-level signal
    * published as the motivation for dedup-before-training): for every
    * corpus document, the fraction of its DISTINCT k-word shingles that
    * occur in at least `minDf` corpus documents, where document
    * frequency counts member docs — verbatim copies included, each copy
    * is a real training-set occurrence. Output: (doc_id, n_shingles,
    * n_dup, dup_fraction); docs shorter than k words have no shingles
    * and never appear.
    *
    * Scale shape (100 TB): exactly ONE full-size exchange — the raw
    * gram table (O(corpus tokens) rows) shuffled by gram into the df
    * join. The other two exchanges are compacted by partial map-side
    * aggregation before they ship: the df aggregate sends at most one
    * row per (gram × input partition) — a boilerplate gram in millions
    * of docs crosses the wire as P partials, not millions of rows —
    * and the per-doc aggregate after the join sends at most one row
    * per (doc × partition). NO broadcast hint anywhere: unlike the
    * eval-set table in [[ngramHits]], the df table is corpus-sized by
    * construction, so the join is AQE's call — broadcast at toy scale,
    * sort-merge at real scale, where a join (unlike the equivalent
    * count-over-window formulation, which cannot split a partition)
    * lets AQE's skew-join split the mega-gram partitions. Why a join
    * and not a window: same single full-size exchange either way, but
    * the window pins every row of a boilerplate gram into one sorted
    * partition with no skew remedy. Null-gram rows from shingle-less
    * docs need no filter (no InferFiltersFromGenerate re-evaluation):
    * the inner equi-join on the gram drops them. Adaptive like the
    * rest of the family ([[Dedup.noVerbatimDups]]): on a replicated
    * corpus the digest collapse prices shingling and the gram shuffle
    * by DISTINCT texts and recovers df exactly as the member-weight
    * sum (identical texts have identical distinct-gram sets); on a
    * unique corpus the direct path skips the collapse's two extra
    * corpus passes. */
  def dupSpanStats(corpus: DataFrame, idCol: String, textCol: String,
                   k: Int, minDf: Long = 2L): DataFrame =
    if (Dedup.noVerbatimDups(corpus, textCol, textCol))
      dupSpansDirect(corpus, idCol, textCol, k, minDf)
    else dupSpansCollapsed(corpus, idCol, textCol, k, minDf)

  /** Doc-level duplicated-span pipeline: one shingle pass per corpus
    * row, one gram exchange reused by the df aggregate and the join. */
  private[graft] def dupSpansDirect(corpus: DataFrame, idCol: String,
                                    textCol: String, k: Int,
                                    minDf: Long): DataFrame = {
    // widened scan (r17): same starved-scan repair as [[directHits]]
    val grams = docGrams(
      withGs(graft.plans.InputWidth.widen(
        corpus.select(col(idCol).cast("long").as("doc_id"),
          col(textCol))), textCol, k), "doc_id")
    val dfTab = grams.groupBy("g").agg(count(lit(1)).as("df"))
    grams.join(dfTab, "g")
      .groupBy("doc_id", "n_shingles")
      .agg(sum(when(col("df") >= minDf, 1L).otherwise(0L)).as("n_dup"))
      .select(col("doc_id"), col("n_shingles"), col("n_dup"),
        (col("n_dup").cast("double") / col("n_shingles").cast("double"))
          .as("dup_fraction"))
  }

  /** Digest-collapsed duplicated-span pipeline: shingling and the gram
    * shuffle run once per DISTINCT text; df is the member-weight sum,
    * bit-identical to the doc-level count because identical texts have
    * identical distinct-gram sets. Fixed-width-only collapse aggregate
    * (min id + count → HashAggregate); representative text via the
    * join-back on digest + id = rep. */
  private[graft] def dupSpansCollapsed(corpus: DataFrame, idCol: String,
                                       textCol: String, k: Int,
                                       minDf: Long): DataFrame = {
    val members = corpus.select(col(idCol).cast("long").as("doc_id"),
      md5(col(textCol)).as("digest"))
    val reps = members.groupBy("digest")
      .agg(min("doc_id").as("rep"), count(lit(1)).as("weight"))
    val joined = corpus
      .select(col(idCol).cast("long").as("m_id"), col(textCol))
      .join(reps.withColumnRenamed("digest", "r_digest"),
        col("m_id") === col("rep"))
      .select(col("r_digest").as("digest"), col("weight"), col(textCol))
    // starved-scan repair (r17): see [[collapsedHits]]
    val repRows =
      if (graft.plans.InputWidth.isNarrow(corpus)) {
        val w = corpus.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
        joined.repartition(w)
      } else joined
    val grams = withGs(repRows, textCol, k)
      .select(col("digest"), col("weight"),
        size(col("gs")).as("n_shingles"), explode_outer(col("gs")).as("g"))
    val dfTab = grams.groupBy("g").agg(sum("weight").as("df"))
    val byDigest = grams.join(dfTab, "g")
      .groupBy("digest", "n_shingles")
      .agg(sum(when(col("df") >= minDf, 1L).otherwise(0L)).as("n_dup"))
    members.join(byDigest, "digest")
      .select(col("doc_id"), col("n_shingles"), col("n_dup"),
        (col("n_dup").cast("double") / col("n_shingles").cast("double"))
          .as("dup_fraction"))
  }

  /** Digest-collapsed pipeline: one shingle pass per DISTINCT text,
    * result expanded back to every member. The collapse aggregate
    * carries fixed-width columns only (min id) — partial/final
    * HashAggregate, no corpus Sort — and the representative's text
    * arrives via the join-back on (digest, id = rep). */
  private[graft] def collapsedHits(corpus: DataFrame, bg: DataFrame,
                                       idCol: String, textCol: String,
                                       k: Int): DataFrame = {
    val members = corpus.select(col(idCol).cast("long").as("doc_id"),
      md5(col(textCol)).as("digest"))
    val repIds = members.groupBy("digest").agg(min("doc_id").as("rep"))
    val joined = corpus
      .select(col(idCol).cast("long").as("m_id"), col(textCol))
      .join(repIds.withColumnRenamed("digest", "r_digest"),
        col("m_id") === col("rep"))
      .select(col("r_digest").as("digest"), col(textCol))
    // starved-scan repair (r17, the digestReps pattern): never widen
    // the corpus-streaming join-back side; when the SCAN is narrow,
    // repartition the (rep-sized) joined frame so the CPU-dense
    // shingle pass runs at full width above it.
    val repRows =
      if (graft.plans.InputWidth.isNarrow(corpus)) {
        val w = corpus.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
        joined.repartition(w)
      } else joined
    val hitsByDigest = docGrams(withGs(repRows, textCol, k), "digest")
      .join(broadcast(bg), "g")
      .groupBy("digest", "n_shingles")
      .agg(count(lit(1)).as("n_hits"), min("bench_id").as("first_match"))
    members.join(hitsByDigest, "digest")
      .select(col("doc_id"), col("n_hits"), col("n_shingles"),
        (col("n_hits").cast("double") / col("n_shingles").cast("double"))
          .as("contamination"),
        col("first_match"))
  }
}
