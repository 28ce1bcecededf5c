package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for large-scale training-data pipelines:
  * exact (hash-groupBy), MinHash (+ LSH banding), SimHash, n-gram
  * Jaccard. All pure column algebra — no UDFs — so every stage stays in
  * whole-stage codegen and scales by adding partitions.
  *
  * Scale notes (100 TB): exact dedup = one shuffle on the digest;
  * MinHash signatures = one explode + one groupBy per doc (shuffle on
  * doc id, combiner-friendly `min` aggregates); LSH candidate pairs =
  * self-join on (band, bucket), with a bucket-size cap that drops
  * degenerate buckets (N boilerplate docs would otherwise emit N²/2
  * pairs — those dups are exact-dedup's job anyway); Jaccard's
  * shared-token join prunes high-document-frequency tokens in-operator,
  * so a stop-word in 10⁴ docs can never fan out to 10⁸ join rows; the
  * verify step (exact Jaccard on candidates) touches only candidate
  * pairs, never the full cross product.
  *
  * The hash family is md5-based (`min(md5(seed || ':' || shingle))`
  * interpreted as a 32-bit int) so results are engine-portable — the
  * DuckDB oracles reproduce them bit-for-bit.
  */
object Dedup {

  /** Exact dedup: keep the smallest id per content digest
    * (the reference's dedup-by-signature idea, `MD5SignatureParseFilter
    * .java:48`, applied set-wide). One shuffle. */
  // deliberately NOT widened (see InputWidth): md5 is ~as cheap per
  // row as the repartition it would buy, and the groupBy right after
  // re-parallelizes everything downstream anyway — measured 1.5 s ->
  // 2.1 s at sf10 WITH widening, the one site where it lost
  def exactDedup(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(md5(col(textCol)).as("digest"), col(idCol))
      .groupBy("digest")
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_dups"))

  /** Cross-corpus exact dedup: rows of `df` whose content digest does
    * NOT appear in `ref` — "drop what the last training run already
    * saw", the batch face of the [[graft.index.DigestLedger]] contract
    * (there the reference set is the cross-batch ledger; here it is
    * any corpus-shaped frame). The reference side collapses to its
    * DISTINCT digest set (fixed-width, map-side partials) before the
    * LEFT ANTI join, so the join's build input prices by distinct
    * reference texts; strategy is AQE's call — broadcast when the
    * digest set is small, shuffled-hash/sort-merge when it is
    * genuinely corpus-sized. Output keeps `df`'s columns. */
  def crossDedup(df: DataFrame, ref: DataFrame, textCol: String): DataFrame =
    df.join(
      ref.select(md5(col(textCol)).as("__ref_digest")).distinct(),
      md5(df(textCol)) === col("__ref_digest"), "left_anti")

  /** Words of a text column: single-space split, empty tokens dropped.
    * Deliberately NOT a whitespace-class split — `split(text, ' ')` has
    * the exact same semantics in Spark and DuckDB, which keeps every
    * hash oracle bit-portable; normalize newlines/tabs upstream (the
    * parse stage's text extractor emits space-joined text). */
  def words(textCol: Column): Column =
    filter(split(textCol, " "), w => w =!= "")

  /** k-word shingles; empty array when the doc is shorter than k.
    * (Spark's `sequence(1, 0)` counts DOWN, so the guard is load-bearing.) */
  def shingles(wordsCol: Column, k: Int): Column = {
    val idxs = sequence(lit(1), size(wordsCol) - (k - 1))
    val mk = transform(idxs, i =>
      concat_ws(" ", (0 until k).map(o => element_at(wordsCol, i + o)): _*))
    when(size(wordsCol) >= k, mk).otherwise(array())
  }

  /** Portable 32-bit hash of a string under a seed: first 8 hex chars of
    * md5("seed:value") as a long. Matches DuckDB's
    * `CAST('0x' || substring(md5(seed || ':' || s), 1, 8) AS BIGINT)`. */
  def seededHash(seed: Int, s: Column): Column =
    conv(substring(md5(concat(lit(s"$seed:"), s)), 1, 8), 16, 10).cast("long")

  /** k-th 32-bit chunk (0-based) of ONE md5 — 4 independent hash values
    * for the price of a single digest (an md5's 128 bits split 4×32).
    * Halves the dominant cost of MinHash vs. per-seed digests. */
  def md5Chunk(md5Hex: Column, k: Int): Column =
    conv(substring(md5Hex, 1 + 8 * k, 8), 16, 10).cast("long")

  /** k-th 8-hex-char chunk as a STRING. Fixed-length lowercase hex sorts
    * lexicographically exactly as its numeric value, so `min` can
    * aggregate the string and the hex→long conversion runs once per
    * GROUP instead of once per row. */
  def md5ChunkStr(md5Hex: Column, k: Int): Column =
    substring(md5Hex, 1 + 8 * k, 8)

  def hexToLong(c: Column): Column = conv(c, 16, 10).cast("long")

  /** MinHash signatures over k-word shingles: one row per doc with
    * `numHashes` ≤ 4 minimum-hash columns `h1..hN`, all derived from one
    * md5 per shingle. Computed in a single codegen'd pass per document
    * ([[graft.functions.MinhashChunksExpr]]) — no explode, no shuffle:
    * at 100 TB the signature stage is a pure map over the corpus.
    *
    * Deliberately NOT digest-collapsed (the q22 trick): measured at
    * sf1000 (50 M docs, 10 000 verbatim copies per text — the collapse's
    * best case), a signature-per-distinct-text route with broadcast
    * join-back ran 60.1 s vs 32.4 s for this direct map. The arithmetic
    * says why: one md5 per shingle means the direct pass hashes
    * ~k×corpus bytes total, and the collapse's probe + digest + join-back
    * passes hash the SAME corpus bytes ~3× in md5 form before saving
    * anything — linear either way, with the collapse adding a shuffle
    * and two joins. q22's collapse pays off because enumeration there
    * is QUADRATIC in multiplicity; signature generation is not. */
  def minhashSignatures(df: DataFrame, idCol: String, textCol: String,
                        numHashes: Int = 4, shingleK: Int = 3): DataFrame = {
    require(numHashes <= 4, "one md5 yields 4 chunks")
    graft.plans.InputWidth.widen(df).select(col(idCol),
        graft.functions.TextHashExpressions.minhashSig(col(textCol), shingleK, numHashes).as("sig"))
      .where(col("sig").isNotNull)
      .select(col(idCol) +:
        (1 to numHashes).map(i => col("sig").getItem(i - 1).as(s"h$i")): _*)
  }

  /** Connected components over candidate pairs — the clustering stage
    * between pair generation ([[lshCandidatePairs]] / [[jaccardPairs]])
    * and canonical-document selection: every near-dup cluster keeps one
    * representative (its min id).
    *
    * Iterative min-label propagation WITH POINTER JUMPING, run to
    * convergence: each round, every node takes the min label among (a)
    * itself, (b) its neighbors, and (c) the label OF its current label
    * (Shiloach–Vishkin shortcutting: if x points to c and c points to
    * c2, x can point straight to c2). Branches (a)+(b) alone converge
    * in O(diameter) rounds; (c) halves the remaining pointer distance
    * every round, so a path-shaped component of diameter d finishes in
    * O(log d) — on real near-dup graphs (a few long chains over mostly
    * star/clique clusters) that cuts the round count roughly in half,
    * and each round is 2 shuffles at 100 TB. All three branches are
    * monotone non-increasing and can never go below the component min
    * (labels only travel along edges or existing pointers), and a
    * round that changes nothing is a true fixed point: stability under
    * (b) forces the label constant across every edge, stability under
    * (c) forces that constant to label itself, and the component min m
    * always keeps comp(m)=m — so the fixed point is exactly
    * "every node labeled with its component's min id", same as plain
    * propagation and the transitive-closure oracle. `min` is
    * commutative / order-independent, so labels are deterministic and
    * engine-exact. `maxIterations` is a safety CAP (the loop WARNs
    * when it trips), not a round count. The label side is |V| rows
    * against |E| edges — the same iteration shape as
    * [[LinkGraph.pagerank]].
    *
    * Cost per round is ONE action: the previous label rides through
    * the min-aggregation as a carried column, so the round's single
    * `filter(changed).count()` both materializes the new label
    * checkpoint and decides convergence — no second fixed-point join.
    * Each round's |V|-row checkpoint is freed as soon as the next one
    * lands ([[Iterate.checkpoint]]).
    */
  def connectedComponents(pairs: DataFrame, aCol: String = "a", bCol: String = "b",
                          maxIterations: Int = 20,
                          localSolveMaxEdges: Long = 2000000L): DataFrame = {
    val und = symmetrized(pairs, aCol, bCol)
    und.cache()
    // Small-graph fast path: the pair graph of a dedup pipeline is
    // edges-per-CLUSTER sparse — after LSH banding + digest collapse it
    // is routinely thousands of edges even when the corpus is 10⁸ docs
    // — and each distributed round costs a fixed multi-stage job. When
    // the (symmetrized, distinct) edge list fits on the driver, solve
    // the EXACT same fixed point locally with union-find + min-label
    // (identical output by definition: both compute "every node labeled
    // with its component's min id") and skip the loop entirely. The
    // count() that decides this materializes the cache the first round
    // would have paid for anyway. Gated on integral node ids so the
    // min is taken under the same ordering Spark's `min` uses; any
    // other type (or a big graph) takes the distributed loop.
    val integral = und.schema("x").dataType match {
      case org.apache.spark.sql.types.LongType |
           org.apache.spark.sql.types.IntegerType |
           org.apache.spark.sql.types.ShortType => true
      case _ => false
    }
    if (integral && und.count() <= localSolveMaxEdges) {
      val nodeType = und.schema("x").dataType
      val edges = und.select(col("x").cast("long"), col("y").cast("long")).collect()
      val parent = new java.util.HashMap[Long, Long]()
      def find(x0: Long): Long = {
        var x = x0
        while (parent.get(x) != x) {
          val g = parent.get(parent.get(x))
          parent.put(x, g)
          x = g
        }
        x
      }
      edges.foreach { r =>
        val a = r.getLong(0); val b = r.getLong(1)
        parent.putIfAbsent(a, a); parent.putIfAbsent(b, b)
        val ra = find(a); val rb = find(b)
        if (ra != rb) parent.put(math.max(ra, rb), math.min(ra, rb))
      }
      val out = new scala.collection.mutable.ArrayBuffer[(Long, Long)](parent.size)
      parent.keySet().forEach { n => out += ((n, find(n))) }
      und.unpersist()
      val spark = pairs.sparkSession
      import spark.implicits._
      return out.toSeq.toDF("node", "comp")
        .select(col("node").cast(nodeType).as("node"),
          col("comp").cast(nodeType).as("comp"))
    }
    val nodes = und.select(col("x").as("node")).distinct()
    var labels = nodes.withColumn("comp", col("node"))
    var prevHandle: Option[org.apache.spark.rdd.RDD[org.apache.spark.sql.catalyst.InternalRow]] = None
    var converged = false
    var round = 0
    while (!converged && round < maxIterations) {
      round += 1
      val (next, handle) = Iterate.checkpoint(ccRound(und, labels))
      // the ONE action of the round: a DataFrame aggregate over the
      // checkpointed frame — its first action materializes every
      // partition of the checkpoint AND counts label changes, all on
      // columnar UnsafeRow blocks (no boxed-Row filter)
      val nChanged = next.where(!(col("comp") <=> col("prev"))).count()
      converged = nChanged == 0L
      prevHandle.foreach(_.unpersist(false))
      prevHandle = Some(handle)
      labels = next.select("node", "comp")
    }
    if (!converged)
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"connectedComponents exited at the maxIterations=$maxIterations cap " +
          "WITHOUT converging: components with diameter above the cap are " +
          "under-merged (and will not match an exact transitive closure)")
    und.unpersist()
    // the final round's checkpoint backs the RETURNED labels — freeable
    // only after the caller consumes them ([[CheckpointRegistry]])
    prevHandle.foreach(CheckpointRegistry.retain)
    labels
  }

  /** Symmetrize candidate pairs in ONE pass: the input is typically an
    * expensive generator (MinHash window + self-join), and the
    * union-of-two-selects formulation would evaluate it twice before
    * the cache can help; explode(array(struct)) emits both directions
    * from a single evaluation. The result is pre-partitioned AND
    * pre-sorted on the per-round join key: the cached plan's
    * outputPartitioning/outputOrdering survive the InMemoryTableScan,
    * so every round's edge⋈label join reuses them — zero exchange and
    * zero sort on the (big) edge side per round; only the |V|-row
    * label side moves. */
  private def symmetrized(pairs: DataFrame, aCol: String, bCol: String): DataFrame =
    pairs
      .select(explode(array(
        struct(col(aCol).as("x"), col(bCol).as("y")),
        struct(col(bCol).as("x"), col(aCol).as("y")))).as("e"))
      .select(col("e.x").as("x"), col("e.y").as("y"))
      .distinct()
      .repartition(col("y"))
      .sortWithinPartitions("y")

  /** One label-propagation round, pre-checkpoint: min over (a) the
    * node's own label — which also carries `prev` for the convergence
    * count, (b) neighbor labels via the edge join, (c) the label of
    * the current label (pointer jump). One union + one min-aggregation
    * = ONE shuffle beyond the joins. Shared between the loop and
    * [[ccRoundPlan]] so the dumped explain can never drift from the
    * shipped iteration. */
  private def ccRound(und: DataFrame, labels: DataFrame): DataFrame = {
    val compType = labels.schema("comp").dataType
    val self = labels.select(col("node"), col("comp"),
      col("comp").as("prev"))
    val viaNbr = und
      .join(labels.withColumnRenamed("node", "y")
                  .withColumnRenamed("comp", "ycomp"), "y")
      .select(col("x").as("node"), col("ycomp").as("comp"),
        lit(null).cast(compType).as("prev"))
    val viaPtr = labels
      .join(labels.select(col("node").as("comp"), col("comp").as("comp2")),
        Seq("comp"))
      .select(col("node"), col("comp2").as("comp"),
        lit(null).cast(compType).as("prev"))
    self.union(viaNbr).union(viaPtr)
      .groupBy("node")
      .agg(min(col("comp")).as("comp"), max(col("prev")).as("prev"))
  }

  /** Round-1's pre-checkpoint frame for plan inspection (ExplainDump):
    * the real loop materializes exactly this shape every round. */
  private[graft] def ccRoundPlan(pairs: DataFrame, aCol: String = "a",
                                 bCol: String = "b"): DataFrame = {
    val und = symmetrized(pairs, aCol, bCol)
    val labels = und.select(col("x").as("node")).distinct()
      .withColumn("comp", col("node"))
    ccRound(und, labels)
  }

  /** Exact verbatim-duplication probe: true when every worded
    * (group, text) is unique, i.e. the digest collapse has nothing to
    * collapse. ONE column-pruned scan (md5 + count-distinct with
    * map-side partials) whose single-row result picks the pipeline
    * CLASS for the pair generators below — the collapse's join-back /
    * expansion machinery is pure overhead on a unique corpus, and a
    * 2×2-banded LSH over a ×100-replicated corpus without the collapse
    * pays ×10⁴ in pair mass, so the right plan is data-dependent in a
    * way AQE cannot re-plan (it prunes branches, it cannot restructure
    * the operator). Sampling is NOT a substitute: a 1% sample of a
    * ×100-replicated corpus looks mostly unique (expected one copy per
    * text), which would mis-route exactly the corpus that needs the
    * collapse — hence exact counts. Null groups (never produced by the
    * crawl tables) conservatively read as duplication: the collapsed
    * path is correct for any input, just slower when unique. */
  private[analytics] def noVerbatimDups(df: DataFrame, textCol: String,
                                        groupCol: String): Boolean = {
    // xxhash64, not md5: an order of magnitude cheaper per byte, and a
    // collision can only UNDERCOUNT distincts, i.e. mis-route to the
    // collapsed path — which is correct on any input, just slower on a
    // unique corpus. The fast path can never be taken wrongly.
    val r = df.where(trim(col(textCol)) =!= "")
      .agg(count(lit(1)),
        count_distinct(xxhash64(col(groupCol), col(textCol))))
      .first()
    r.getLong(0) == r.getLong(1)
  }

  /** Duplication-RATIO probe: true when at least `threshold` of the
    * worded (group, text) rows are distinct. For operators whose
    * direct and collapsed pipelines are bit-identical AND whose
    * collapse costs a fixed overhead (join-back + member expansion)
    * rather than averting a quadratic blowup — postings,
    * collocations, attribution — a NEARLY-unique corpus should take
    * the direct path: 8 duplicate texts in 5 000 don't pay for two
    * extra joins (measured: q80 2.2 → 6.0 s mis-routed). The PAIR
    * generators keep the exact [[noVerbatimDups]] probe: there a few
    * hundred copies of one text is a ×10⁴ pair blowup, so any
    * duplication at all justifies the collapse. Same one-scan
    * xxhash64 count-distinct; same conservative direction (a
    * collision undercounts distincts and can only mis-route toward
    * the collapsed path, which is correct on any input). */
  private[graft] def mostlyUnique(df: DataFrame, textCol: String,
                                  groupCol: String,
                                  threshold: Double = 0.95): Boolean = {
    val r = df.where(trim(col(textCol)) =!= "")
      .agg(count(lit(1)),
        count_distinct(xxhash64(col(groupCol), col(textCol))))
      .first()
    r.getLong(0) == 0L || r.getLong(1).toDouble >= threshold * r.getLong(0)
  }

  /** LSH candidate pairs from unigram MinHash, banded 2×2 (band A =
    * (h1,h2), band B = (h3,h4)); docs sharing either band within the
    * same `groupCol` become candidates. Returns distinct (a, b) pairs,
    * a < b. The group restriction + banding bound the TYPICAL join
    * fan-out; `maxBucket` bounds the WORST case: a bucket holding more
    * than `maxBucket` docs (boilerplate/empty-text degenerate mass) is
    * dropped before the self-join, capping any bucket's output at
    * maxBucket²/2 pairs instead of N²/2. Near-dups lost that way are
    * verbatim-duplicate clusters, which [[exactDedup]] already catches.
    * The cap's window count partitions on the same (group, bucket) key
    * as the join, so it rides the join's own exchange — no extra
    * shuffle.
    *
    * Adaptive ([[noVerbatimDups]]): on a corpus with no verbatim
    * duplicates the direct doc-level pipeline runs ([[lshPairsDirect]]
    * — collapse and expansion are identities there, so skipping them
    * is bit-identical and saves two corpus passes plus two joins);
    * with duplicates present the digest-collapsed pipeline runs
    * ([[lshPairsCollapsed]]) and prices pair mass by DISTINCT texts. */
  def lshCandidatePairs(df: DataFrame, idCol: String, textCol: String,
                        groupCol: String, maxBucket: Int = 1024): DataFrame =
    if (noVerbatimDups(df, textCol, groupCol))
      lshPairsDirect(df, idCol, textCol, groupCol, maxBucket)
    else lshPairsCollapsed(df, idCol, textCol, groupCol, maxBucket)

  /** Doc-level LSH pair generation for corpora WITHOUT verbatim
    * duplicates: per-doc signature (map-only over the widened scan),
    * band explode, bucket cap by row count (= weight sum when all
    * weights are 1), self-join. Both join sides share one plan, so
    * ReuseExchange evaluates the signature + window side once. */
  private[graft] def lshPairsDirect(df: DataFrame, idCol: String, textCol: String,
                                    groupCol: String, maxBucket: Int): DataFrame = {
    val sig = graft.functions.TextHashExpressions
      .minhashSig(col(textCol), 1, 4, distinct = true)
    val keyed = graft.plans.InputWidth.widen(df.where(trim(col(textCol)) =!= ""))
      .select(col(groupCol), col(idCol).as("i"), sig.as("sig"))
      .select(col(groupCol), col("i"),
        concat_ws("_", lit("A"), col("sig").getItem(0), col("sig").getItem(1)).as("bkA"),
        concat_ws("_", lit("B"), col("sig").getItem(2), col("sig").getItem(3)).as("bkB"))
    val bands = keyed
      .select(col(groupCol), col("i"), explode(array(col("bkA"), col("bkB"))).as("bk"))
      .withColumn("bkn",
        count(lit(1)).over(Window.partitionBy(col(groupCol), col("bk"))))
      .where(col("bkn") <= maxBucket).drop("bkn")
    bands.as("l").join(bands.as("r"), Seq(groupCol, "bk"))
      .where(col("l.i") < col("r.i"))
      .select(col(groupCol), col("l.i").as("a"), col("r.i").as("b"))
      .distinct()
  }

  /** Digest-collapsed LSH pair generation (see [[lshCandidatePairs]]):
    * signature / banding / self-join run over one representative per
    * (group, md5(text)) ([[digestReps]]), with the bucket cap applied
    * to member-weight sums (= the per-doc count the uncollapsed
    * formulation sees), then digest-level pairs expand back to member
    * pairs and weight ≥ 2 groups surviving the cap emit their verbatim
    * cliques — the doc-level pair set is bit-identical (members share
    * their representative's signature, so the doc graph is exactly the
    * rep graph with each rep blown up into a clique). The self-join
    * keeps the SAME plan on both sides, renamed after the join, so
    * ReuseExchange evaluates the collapse + window side once
    * (PlanSpec-pinned). */
  private[graft] def lshPairsCollapsed(df: DataFrame, idCol: String, textCol: String,
                                       groupCol: String, maxBucket: Int): DataFrame = {
    val bands = repBands(digestReps(df, idCol, textCol, groupCol), groupCol, maxBucket)
    val crossRep = bands.as("l").join(bands.as("r"), Seq(groupCol, "bk"))
      .where(col("l.rep") < col("r.rep"))
      .select(col(groupCol), col("l.digest").as("da"), col("r.digest").as("db"))
      .distinct()
    // expansion: the second corpus pass computes md5 only (column
    // pruning drops the text); cross and self sets are disjoint by
    // construction, so the union needs no dedup
    val members = df.select(col(groupCol), md5(col(textCol)).as("digest"), col(idCol))
    val ma = members.select(col(groupCol), col("digest").as("da"), col(idCol).as("ia"))
    val mb = members.select(col(groupCol), col("digest").as("db"), col(idCol).as("ib"))
    val crossOut = crossRep.join(ma, Seq(groupCol, "da")).join(mb, Seq(groupCol, "db"))
      .select(col(groupCol), least(col("ia"), col("ib")).as("a"),
        greatest(col("ia"), col("ib")).as("b"))
    val selfOut = bands.select(col(groupCol), col("digest"), col("weight")).distinct()
      .where(col("weight") >= 2)
      .select(col(groupCol), col("digest"))
      .join(ma.withColumnRenamed("da", "digest"), Seq(groupCol, "digest"))
      .join(mb.withColumnRenamed("db", "digest"), Seq(groupCol, "digest"))
      .where(col("ia") < col("ib"))
      .select(col(groupCol), col("ia").as("a"), col("ib").as("b"))
    crossOut.unionByName(selfOut)
  }

  /** Per-group LSH candidate-pair COUNTS, computed WITHOUT enumerating
    * the pairs — `lshCandidatePairs(df, …).groupBy(group).count()`
    * done in weight arithmetic over the digest-collapsed band graph:
    * cross-digest mass is Σ wa·wb over the distinct capped digest
    * pairs, verbatim-clique mass is Σ w·(w−1)/2 over cap-surviving
    * digests with weight ≥ 2. Both formulations count the identical
    * pair set ([[lshPairsCollapsed]]'s bit-exactness argument: members
    * inherit their representative's bands, so the doc-pair set is the
    * digest-pair set with each digest blown into its clique) — but the
    * enumeration is QUADRATIC in verbatim multiplicity while the
    * arithmetic is linear in distinct texts. Measured at sf1000 (50 M
    * docs, 10 000 verbatim copies per text): the enumeration face
    * streamed ~2.5·10¹¹ clique rows through the count — 229 s, 21.8×
    * the sf100 time for 10× the data — where this face prices the
    * same answer by the ~5 000 distinct digests. Use the enumeration
    * entry point only when a consumer needs the pairs themselves. */
  def lshCandidatePairCounts(df: DataFrame, idCol: String, textCol: String,
                             groupCol: String, maxBucket: Int = 1024): DataFrame = {
    // Adaptive, mirroring [[lshCandidatePairs]]: on a no-verbatim-dup
    // corpus every weight is 1, so the collapse join-back and rep
    // expansion are identity overhead — count the direct pairs instead
    // (bounded there: no verbatim multiplicity to square).
    if (noVerbatimDups(df, textCol, groupCol))
      return lshPairsDirect(df, idCol, textCol, groupCol, maxBucket)
        .groupBy(col(groupCol)).agg(count(lit(1)).as("n_pairs"))
    val bands = repBands(digestReps(df, idCol, textCol, groupCol), groupCol, maxBucket)
    // same digest-pair dedup as the enumeration path (a pair colliding
    // in both bands must count once); weights ride along — they are
    // functionally dependent on the digest, so the distinct set is the
    // distinct (group, da, db) set
    val crossRep = bands.as("l").join(bands.as("r"), Seq(groupCol, "bk"))
      .where(col("l.rep") < col("r.rep"))
      .select(col(groupCol), col("l.digest").as("da"), col("r.digest").as("db"),
        col("l.weight").as("wa"), col("r.weight").as("wb"))
      .distinct()
    val crossCnt = crossRep.groupBy(col(groupCol))
      .agg(sum(col("wa") * col("wb")).as("n"))
    val selfCnt = bands.select(col(groupCol), col("digest"), col("weight")).distinct()
      .where(col("weight") >= 2)
      .groupBy(col(groupCol))
      // w·(w−1) is even so `div` (LONG integer division) is exact AND
      // the column stays LongType end-to-end. Spark's `/` would be
      // double division — exact only below 2^53, and it silently
      // widens the union with crossCnt's long to double.
      .agg(sum(expr("weight * (weight - 1) div 2")).as("n"))
    crossCnt.unionByName(selfCnt)
      .groupBy(col(groupCol))
      .agg(sum(col("n")).cast("long").as("n_pairs"))
  }

  /** Verbatim-duplicate collapse — the digest pre-pass of the near-dup
    * pipeline: one row per (group, md5(text)) with the group's smallest
    * id as representative, its member count as `weight`, and the two
    * LSH band keys. The collapse aggregates FIXED-WIDTH columns only
    * (min id + count) so Catalyst plans a partial/final HashAggregate —
    * a string in the agg buffer (e.g. min(text)) is not
    * UnsafeRow-mutable and would demote the whole pre-pass to
    * Sort + SortAggregate, a full per-partition sort of the corpus
    * carrying the document text (measured: 2× q22 at small scale).
    * The representative's text is fetched by a second corpus pass
    * joined back on (group, digest, id == rep) — AQE broadcasts the
    * digest table when small, making the join-back a map-only stage —
    * and the MinHash signature (the expensive per-row work) is
    * computed AFTER that join, so it still runs once per DISTINCT
    * text (when the scan is starved — single row group — the JOINED
    * rep-sized frame is repartitioned so the signature runs at full
    * width; see inline note). Wordless texts are dropped by a CHEAP
    * scan-level
    * pre-filter, trim(text) != '' — exactly the unigram signature's
    * null condition (members share it, so pre-filtering equals the
    * per-doc sig-is-null filter) — NOT by filtering on the signature
    * itself: `where(sig.isNotNull)` would be predicate-pushed through
    * the join-back into the corpus scan and re-evaluate the signature
    * on every row, the precise cost the collapse exists to avoid. */
  private[graft] def digestReps(df: DataFrame, idCol: String, textCol: String,
                                groupCol: String): DataFrame = {
    val worded = df.where(trim(col(textCol)) =!= "")
    val agg = worded
      .select(col(groupCol), md5(col(textCol)).as("digest"), col(idCol).as("m_id"))
      .groupBy(col(groupCol), col("digest"))
      .agg(min(col("m_id")).as("rep"), count(lit(1)).as("weight"))
    val sig = graft.functions.TextHashExpressions
      .minhashSig(col("rtext"), 1, 4, distinct = true)
    // the join-back STREAMS the corpus (id, text) — never widen that
    // side: a round-robin repartition there shuffles the full corpus
    // text (measured +2.5 s on q22 at 100× scale). When the scan is
    // starved (single row group), repartition the JOINED frame
    // instead: one row per distinct text, so the shuffle is the rep
    // set, and the signature still runs at full width above it.
    val joined = worded
      .select(col(groupCol), md5(col(textCol)).as("digest"),
        col(idCol).as("rep"), col(textCol).as("rtext"))
      .join(agg, Seq(groupCol, "digest", "rep"))
    val sigIn =
      if (graft.plans.InputWidth.isNarrow(df)) {
        val w = df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
        joined.repartition(w)
      } else joined
    sigIn
      .select(col(groupCol), col("digest"), col("rep"), col("weight"),
        sig.as("sig"))
      .select(col(groupCol), col("digest"), col("rep"), col("weight"),
        concat_ws("_", lit("A"), col("sig").getItem(0), col("sig").getItem(1)).as("bkA"),
        concat_ws("_", lit("B"), col("sig").getItem(2), col("sig").getItem(3)).as("bkB"))
  }

  /** Band-tagged bucket rows over digest representatives, capped on the
    * SUM OF MEMBER WEIGHTS per (group, bucket) — i.e. the number of
    * ORIGINAL documents in the bucket, so the cap decision is
    * bit-identical to running [[lshCandidatePairs]]'s per-doc count cap
    * over the uncollapsed corpus (every member of a digest group lands
    * in exactly the buckets its representative lands in). The weight
    * window partitions on the same (group, bk) key as the downstream
    * self-join, so it rides the join's exchange. */
  private[graft] def repBands(reps: DataFrame, groupCol: String,
                              maxBucket: Int): DataFrame =
    reps.select(col(groupCol), col("digest"), col("rep"), col("weight"),
        explode(array(col("bkA"), col("bkB"))).as("bk"))
      .withColumn("bkn",
        sum(col("weight")).over(Window.partitionBy(col(groupCol), col("bk"))))
      .where(col("bkn") <= maxBucket).drop("bkn")

  /** Representative-level candidate pairs (plan-inspection entry: the
    * full digest-collapse → band → self-join pipeline, un-cached). */
  private[graft] def repPairs(df: DataFrame, idCol: String, textCol: String,
                              groupCol: String, maxBucket: Int = 1024): DataFrame = {
    val bands = repBands(digestReps(df, idCol, textCol, groupCol), groupCol, maxBucket)
    bands.as("l").join(bands.as("r"), Seq(groupCol, "bk"))
      .where(col("l.rep") < col("r.rep"))
      .select(col("l.rep").as("a"), col("r.rep").as("b"))
      .distinct()
  }

  /** Near-dup components over the WHOLE corpus. Adaptive like
    * [[lshCandidatePairs]]: a unique corpus ([[noVerbatimDups]])
    * clusters doc-level pairs directly; otherwise the verbatim
    * duplicates are collapsed out of the expensive middle: digest
    * pre-pass ([[digestReps]]) → LSH banding + self-join over
    * REPRESENTATIVES only → [[connectedComponents]] on the rep graph →
    * labels expanded back to every member through the digest→component
    * map.
    *
    * Produces bit-identical output to running lshCandidatePairs +
    * connectedComponents over the uncollapsed corpus (the exact
    * transitive-closure oracle), because:
    *  - members of a digest group share their representative's
    *    signature, so the doc-level pair graph is exactly the rep-level
    *    graph with each rep blown up into a verbatim clique — expansion
    *    preserves components, and the rep (= group min id) preserves
    *    the min-label component ids;
    *  - the bucket cap counts original docs via the weight sum
    *    ([[repBands]]), so the same buckets drop;
    *  - a weight ≥ 2 group surviving in ≥ 1 bucket is a component even
    *    when its rep has no external pair (its members pair with EACH
    *    OTHER in the uncollapsed graph) — emitted as an internal
    *    clique; a fully-capped-out or singleton rep with no pairs
    *    produces no output rows, same as the uncollapsed pipeline.
    *
    * Scale: pair mass and CC edge mass now price by DISTINCT texts —
    * a ×100-replicated corpus generates ×10⁴ fewer candidate pairs —
    * while the per-doc work stays a map-only pass feeding a
    * combiner-collapsed shuffle of tiny columns. The expansion join is
    * |docs|⋈|component digests| on (group, digest), AQE-broadcastable
    * when the component map is small. */
  def nearDupComponents(df: DataFrame, idCol: String, textCol: String,
                        groupCol: String, maxBucket: Int = 1024,
                        maxIterations: Int = 20,
                        noDups: Option[Boolean] = None): DataFrame =
    // `noDups`: optional PRECOMPUTED [[noVerbatimDups]](df, textCol,
    // groupCol) answer — composite pipelines (q90) that run several
    // adaptive operators over the same corpus can fuse the probe scans
    // into one pass (guide §2.4) and hand each operator its answer;
    // routing (and therefore output, both paths being bit-identical)
    // is unchanged, only the redundant probe scan disappears.
    if (noDups.getOrElse(noVerbatimDups(df, textCol, groupCol))) {
      // no verbatim duplicates: the rep graph IS the doc graph and the
      // expansion join is an identity — cluster doc-level pairs
      // directly and skip the collapse, the digest→component map, and
      // the member re-join entirely
      val pairs = lshPairsDirect(df, idCol, textCol, groupCol, maxBucket)
      connectedComponents(pairs, "a", "b", maxIterations)
    } else nearDupCollapsed(df, idCol, textCol, groupCol, maxBucket, maxIterations)

  private[graft] def nearDupCollapsed(df: DataFrame, idCol: String, textCol: String,
                                      groupCol: String, maxBucket: Int,
                                      maxIterations: Int): DataFrame = {
    val reps = digestReps(df, idCol, textCol, groupCol)
    reps.cache()
    val bands = repBands(reps, groupCol, maxBucket)
    val pairs = bands.as("l").join(bands.as("r"), Seq(groupCol, "bk"))
      .where(col("l.rep") < col("r.rep"))
      .select(col("l.rep").as("a"), col("r.rep").as("b"))
      .distinct()
    val ccLabels = connectedComponents(pairs, "a", "b", maxIterations)
    // verbatim cliques: weight ≥ 2 groups that survived the cap in at
    // least one bucket but whose rep found no cross-digest pair
    val internal = bands.select(col("rep"), col("weight")).distinct()
      .where(col("weight") >= 2)
      .join(ccLabels.select(col("node").as("rep")), Seq("rep"), "left_anti")
      .select(col("rep").as("node"), col("rep").as("comp"))
    val digestComp = reps
      .join(ccLabels.union(internal), reps("rep") === col("node"))
      .select(col(groupCol), col("digest"), col("comp"))
    // materialize the (small) digest→component map through a checkpoint
    // so `reps` can be freed before the caller's final action; the
    // checkpoint backs the returned frame, like the CC labels' own
    // final-round checkpoint — retained so the caller can free both
    // once the result is consumed ([[CheckpointRegistry]])
    val (dc, dcHandle) = Iterate.checkpoint(digestComp)
    dc.count()
    CheckpointRegistry.retain(dcHandle)
    reps.unpersist()
    df.select(col(groupCol), md5(col(textCol)).as("digest"), col(idCol))
      .join(dc, Seq(groupCol, "digest"))
      .select(col(idCol).as("node"), col("comp"))
  }

  /** 16-bit SimHash over distinct words: per-bit ±1 contributions
    * summed, bit set when the sum is positive. Single codegen'd pass
    * per document ([[graft.functions.SimHash16Expr]]) — the
    * explode-per-(word,bit) relational formulation is kept as the
    * DuckDB oracle; this computes the same hash without the 16×|words|
    * row blowup or any shuffle. */
  def simhash16(df: DataFrame, idCol: String, textCol: String): DataFrame =
    graft.plans.InputWidth.widen(df).select(col(idCol),
        graft.functions.TextHashExpressions.simhash16(col(textCol)).as("simhash"))
      .where(col("simhash").isNotNull)

  /** Exact n-gram (here unigram-set) Jaccard similarity for pairs within
    * a group, over a pre-filtered subset. Adaptive like
    * [[lshCandidatePairs]]: a unique corpus runs the doc-level
    * pipeline ([[jaccardDirect]]); otherwise a digest pre-pass
    * (verbatim
    * duplicates collapse to one representative, results expand back to
    * member pairs — bit-identical output, see inline notes), then
    * shared-word self-join → intersection counts; per-digest set sizes
    * attached BEFORE the join (AQE-broadcastable), enabling a
    * size-ratio prefilter at the join itself.
    *
    * Skew defenses, in evaluation order:
    *  - a token appearing in `d` docs fans the self-join out to d²/2
    *    rows, so tokens with document frequency above `maxDf` are
    *    pruned from the JOIN inputs in-operator (the per-doc set sizes
    *    — the Jaccard denominator — still count every token, so
    *    surviving pairs keep their exact Jaccard... minus intersection
    *    mass carried ONLY by ubiquitous tokens, and a pair sharing
    *    nothing but stop-words sits far below any useful `minJaccard`
    *    anyway). The df window partitions on the join key (group, w),
    *    reusing the join's exchange.
    *  - size-ratio prefilter: jaccard ≤ min(|A|,|B|)/max(|A|,|B|)
    *    (the intersection is at most the smaller set, the union at
    *    least the larger), so a pair with size ratio below `minJaccard`
    *    is dropped AT the self-join, before it ever reaches the
    *    intersection groupBy. The comparison uses the same
    *    least/greatest DIVISION the final filter uses — division
    *    rounding is monotone, so ratio ≥ jaccard as exact rationals
    *    implies the same ordering of the rounded doubles and the
    *    prefilter can never drop a pair the exact filter would keep
    *    (a `sz_small >= j * sz_big` product form CAN, when jaccard
    *    lands exactly on the threshold).
    * Carrying the true sizes through the groupBy keys also removes the
    * two post-aggregation size joins the previous formulation needed. */
  def jaccardPairs(df: DataFrame, idCol: String, textCol: String,
                   groupCol: String, minJaccard: Double,
                   maxDf: Int = 1024): DataFrame =
    if (noVerbatimDups(df, textCol, groupCol))
      jaccardDirect(df, idCol, textCol, groupCol, minJaccard, maxDf)
    else jaccardCollapsed(df, idCol, textCol, groupCol, minJaccard, maxDf)

  /** Doc-level exact-Jaccard pipeline for corpora WITHOUT verbatim
    * duplicates: tokenize per doc, document-frequency prune (plain row
    * count = the weighted df when all weights are 1), set sizes joined
    * before the self-join for the size-ratio prefilter, intersection
    * groupBy carrying the true sizes. Same skew defenses and the same
    * division-form prefilter as the collapsed pipeline; no same-digest
    * branch (there are no duplicate pairs to emit). */
  private[graft] def jaccardDirect(df: DataFrame, idCol: String, textCol: String,
                                   groupCol: String, minJaccard: Double,
                                   maxDf: Int): DataFrame = {
    val tok = graft.plans.InputWidth.widen(df)
      .select(col(groupCol), col(idCol).as("i"),
        explode(array_distinct(words(col(textCol)))).as("w"))
    val sizes = tok.groupBy(col(groupCol), col("i")).agg(count(lit(1)).as("sz"))
    val pruned = tok
      .withColumn("df", count(lit(1)).over(Window.partitionBy(col(groupCol), col("w"))))
      .where(col("df") <= maxDf).drop("df")
      .join(sizes, Seq(groupCol, "i"))
    pruned.as("l").join(pruned.as("r"), Seq(groupCol, "w"))
      .where(col("l.i") < col("r.i") &&
        least(col("l.sz"), col("r.sz")).cast("double") /
          greatest(col("l.sz"), col("r.sz")).cast("double") >= minJaccard)
      .select(col(groupCol), col("l.i").as("a"), col("r.i").as("b"),
        col("l.sz").as("sza"), col("r.sz").as("szb"))
      .groupBy(col(groupCol), col("a"), col("b"), col("sza"), col("szb"))
      .agg(count(lit(1)).as("inter"))
      .withColumn("jaccard",
        col("inter").cast("double") / (col("sza") + col("szb") - col("inter")).cast("double"))
      .where(col("jaccard") >= minJaccard)
      .select(col(groupCol), col("a"), col("b"), col("jaccard"))
  }

  private[graft] def jaccardCollapsed(df: DataFrame, idCol: String, textCol: String,
                                      groupCol: String, minJaccard: Double,
                                      maxDf: Int): DataFrame = {
    // digest collapse (same move as [[nearDupComponents]], same
    // hash-aggregable shape as [[digestReps]]): verbatim duplicates
    // share their token set, so tokenize / df-window / self-join /
    // intersection-count all run over one representative per
    // (group, md5(text)) and the results expand back to member pairs
    // afterward. The aggregate carries fixed-width columns only
    // (HashAggregate, no corpus sort); the representative's text
    // arrives via the join-back on (group, digest, id == rep), and
    // tokenization — the expensive per-row work — runs after it, once
    // per DISTINCT text, at widened scan parallelism.
    val agg = df
      .select(col(groupCol), md5(col(textCol)).as("digest"), col(idCol).as("m_id"))
      .groupBy(col(groupCol), col("digest"))
      .agg(min(col("m_id")).as("rep"), count(lit(1)).as("weight"))
    // stream the corpus un-widened, repartition the rep-sized joined
    // frame only when the scan is starved (same note as [[digestReps]])
    val joined = df
      .select(col(groupCol), md5(col(textCol)).as("digest"),
        col(idCol).as("rep"), col(textCol).as("rtext"))
      .join(agg, Seq(groupCol, "digest", "rep"))
    val reps =
      (if (graft.plans.InputWidth.isNarrow(df)) {
        val w = df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
        joined.repartition(w)
      } else joined)
        .select(col(groupCol), col("digest"), col("weight"), col("rtext"))
    val tok = reps.select(col(groupCol), col("digest"), col("weight"),
      explode(array_distinct(words(col("rtext")))).as("w"))
    val sizes = tok.groupBy(col(groupCol), col("digest")).agg(count(lit(1)).as("sz"))
    // weighted document frequency: sum of member counts = the df the
    // uncollapsed pipeline would see, so the SAME tokens are pruned.
    // No broadcast hint on `sizes`: one row per distinct (group, text)
    // approaches corpus cardinality on a mostly-unique corpus, so the
    // join strategy is AQE's call (broadcast when it measures small).
    val pruned = tok
      .withColumn("df", sum(col("weight")).over(Window.partitionBy(col(groupCol), col("w"))))
      .where(col("df") <= maxDf).drop("df")
      .join(sizes, Seq(groupCol, "digest"))
    // cross-digest pairs: one exact jaccard per digest pair — shared
    // by every member pair across the two groups. Rename AFTER the
    // self-join so both children stay canonically identical and
    // ReuseExchange runs the tokenize + df-window side once.
    val crossRep = pruned.as("l").join(pruned.as("r"), Seq(groupCol, "w"))
      .where(col("l.digest") < col("r.digest") &&
        least(col("l.sz"), col("r.sz")).cast("double") /
          greatest(col("l.sz"), col("r.sz")).cast("double") >= minJaccard)
      .select(col(groupCol), col("l.digest").as("da"), col("r.digest").as("db"),
        col("l.sz").as("sza"), col("r.sz").as("szb"))
      .groupBy(col(groupCol), col("da"), col("db"), col("sza"), col("szb"))
      .agg(count(lit(1)).as("inter"))
      .withColumn("jaccard",
        col("inter").cast("double") / (col("sza") + col("szb") - col("inter")).cast("double"))
      .where(col("jaccard") >= minJaccard)
      .select(col(groupCol), col("da"), col("db"), col("jaccard"))
    // same-digest pairs: identical token sets, but the REPORTED
    // jaccard under df-pruning is s/(2k − s) (intersection counts only
    // the s surviving tokens, the denominator all k) — exactly what
    // the uncollapsed pipeline emits for a duplicate pair; a group
    // whose every token was pruned shares no surviving token and
    // produces no pair at all
    val selfRep = pruned.groupBy(col(groupCol), col("digest"))
      .agg(count(lit(1)).as("s"), min(col("sz")).as("szs"))
      .join(reps.select(col(groupCol), col("digest"), col("weight")),
        Seq(groupCol, "digest"))
      .where(col("weight") >= 2)
      .withColumn("jaccard", col("s").cast("double") /
        (lit(2) * col("szs") - col("s")).cast("double"))
      .where(col("jaccard") >= minJaccard)
      .select(col(groupCol), col("digest"), col("jaccard"))
    // expand digest-level pairs to member pairs (second corpus pass
    // computes md5 only — column pruning drops the text)
    val members = df.select(col(groupCol), md5(col(textCol)).as("digest"), col(idCol))
    val ma = members.select(col(groupCol), col("digest").as("da"), col(idCol).as("ia"))
    val mb = members.select(col(groupCol), col("digest").as("db"), col(idCol).as("ib"))
    val crossOut = crossRep.join(ma, Seq(groupCol, "da")).join(mb, Seq(groupCol, "db"))
      .select(col(groupCol), least(col("ia"), col("ib")).as("a"),
        greatest(col("ia"), col("ib")).as("b"), col("jaccard"))
    val selfOut = selfRep
      .join(ma.withColumnRenamed("da", "digest"), Seq(groupCol, "digest"))
      .join(mb.withColumnRenamed("db", "digest"), Seq(groupCol, "digest"))
      .where(col("ia") < col("ib"))
      .select(col(groupCol), col("ia").as("a"), col("ib").as("b"), col("jaccard"))
    crossOut.unionByName(selfOut)
  }

  /** Overlap-coefficient (containment) pairs: |A∩B| / min(|A|,|B|) —
    * the near-dup signal Jaccard structurally misses when a SHORT
    * document is quoted inside a LONG one (the union dilutes jaccard
    * toward 0 as the big doc grows; the overlap coefficient of a full
    * quote stays 1.0 regardless). The training-data use is exactly
    * that asymmetry: catching excerpts, boilerplate-wrapped reposts,
    * and doc-inside-doc containment that [[jaccardPairs]] scores low.
    *
    * Same unigram-set machinery and adaptive digest collapse as
    * [[jaccardPairs]], with one deliberate difference: the size-ratio
    * join prefilter is UNSOUND here — a small set fully contained in a
    * big one scores 1.0 at ANY size ratio — so the self-join keeps
    * every shared-word pair and the skew defenses are the df-prune
    * (`maxDf`) and the group key alone. Same df-prune caveat as
    * jaccard: intersection mass carried only by ubiquitous tokens is
    * dropped while the min-size denominator still counts every token,
    * so a pair sharing nothing but stop-words sits below any useful
    * threshold rather than at a spurious 1.0. */
  def containmentPairs(df: DataFrame, idCol: String, textCol: String,
                       groupCol: String, minOverlap: Double,
                       maxDf: Int = 1024): DataFrame =
    if (noVerbatimDups(df, textCol, groupCol))
      containmentDirect(df, idCol, textCol, groupCol, minOverlap, maxDf)
    else containmentCollapsed(df, idCol, textCol, groupCol, minOverlap, maxDf)

  /** Doc-level overlap pipeline for corpora without verbatim
    * duplicates — [[jaccardDirect]] minus the (unsound here) ratio
    * prefilter, with the overlap-coefficient formula at the end. */
  private[graft] def containmentDirect(df: DataFrame, idCol: String,
                                       textCol: String, groupCol: String,
                                       minOverlap: Double,
                                       maxDf: Int): DataFrame = {
    val tok = graft.plans.InputWidth.widen(df)
      .select(col(groupCol), col(idCol).as("i"),
        explode(array_distinct(words(col(textCol)))).as("w"))
    val sizes = tok.groupBy(col(groupCol), col("i")).agg(count(lit(1)).as("sz"))
    val pruned = tok
      .withColumn("df", count(lit(1)).over(Window.partitionBy(col(groupCol), col("w"))))
      .where(col("df") <= maxDf).drop("df")
      .join(sizes, Seq(groupCol, "i"))
    pruned.as("l").join(pruned.as("r"), Seq(groupCol, "w"))
      .where(col("l.i") < col("r.i"))
      .select(col(groupCol), col("l.i").as("a"), col("r.i").as("b"),
        col("l.sz").as("sza"), col("r.sz").as("szb"))
      .groupBy(col(groupCol), col("a"), col("b"), col("sza"), col("szb"))
      .agg(count(lit(1)).as("inter"))
      .withColumn("overlap",
        col("inter").cast("double") / least(col("sza"), col("szb")).cast("double"))
      .where(col("overlap") >= minOverlap)
      .select(col(groupCol), col("a"), col("b"), col("overlap"))
  }

  /** Digest-collapsed overlap pipeline — [[jaccardCollapsed]] with the
    * overlap formula. Same-digest pairs under df-pruning score
    * s / k (s surviving shared tokens over the true set size k =
    * min(|A|,|A|)), which is exactly what the uncollapsed pipeline
    * emits for a verbatim pair — and a pair whose every token was
    * pruned emits nothing on either path. */
  private[graft] def containmentCollapsed(df: DataFrame, idCol: String,
                                          textCol: String, groupCol: String,
                                          minOverlap: Double,
                                          maxDf: Int): DataFrame = {
    val agg = df
      .select(col(groupCol), md5(col(textCol)).as("digest"), col(idCol).as("m_id"))
      .groupBy(col(groupCol), col("digest"))
      .agg(min(col("m_id")).as("rep"), count(lit(1)).as("weight"))
    val joined = df
      .select(col(groupCol), md5(col(textCol)).as("digest"),
        col(idCol).as("rep"), col(textCol).as("rtext"))
      .join(agg, Seq(groupCol, "digest", "rep"))
    val reps =
      (if (graft.plans.InputWidth.isNarrow(df)) {
        val w = df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
        joined.repartition(w)
      } else joined)
        .select(col(groupCol), col("digest"), col("weight"), col("rtext"))
    val tok = reps.select(col(groupCol), col("digest"), col("weight"),
      explode(array_distinct(words(col("rtext")))).as("w"))
    val sizes = tok.groupBy(col(groupCol), col("digest")).agg(count(lit(1)).as("sz"))
    val pruned = tok
      .withColumn("df", sum(col("weight")).over(Window.partitionBy(col(groupCol), col("w"))))
      .where(col("df") <= maxDf).drop("df")
      .join(sizes, Seq(groupCol, "digest"))
    val crossRep = pruned.as("l").join(pruned.as("r"), Seq(groupCol, "w"))
      .where(col("l.digest") < col("r.digest"))
      .select(col(groupCol), col("l.digest").as("da"), col("r.digest").as("db"),
        col("l.sz").as("sza"), col("r.sz").as("szb"))
      .groupBy(col(groupCol), col("da"), col("db"), col("sza"), col("szb"))
      .agg(count(lit(1)).as("inter"))
      .withColumn("overlap",
        col("inter").cast("double") / least(col("sza"), col("szb")).cast("double"))
      .where(col("overlap") >= minOverlap)
      .select(col(groupCol), col("da"), col("db"), col("overlap"))
    val selfRep = pruned.groupBy(col(groupCol), col("digest"))
      .agg(count(lit(1)).as("s"), min(col("sz")).as("szs"))
      .join(reps.select(col(groupCol), col("digest"), col("weight")),
        Seq(groupCol, "digest"))
      .where(col("weight") >= 2)
      .withColumn("overlap", col("s").cast("double") / col("szs").cast("double"))
      .where(col("overlap") >= minOverlap)
      .select(col(groupCol), col("digest"), col("overlap"))
    val members = df.select(col(groupCol), md5(col(textCol)).as("digest"), col(idCol))
    val ma = members.select(col(groupCol), col("digest").as("da"), col(idCol).as("ia"))
    val mb = members.select(col(groupCol), col("digest").as("db"), col(idCol).as("ib"))
    val crossOut = crossRep.join(ma, Seq(groupCol, "da")).join(mb, Seq(groupCol, "db"))
      .select(col(groupCol), least(col("ia"), col("ib")).as("a"),
        greatest(col("ia"), col("ib")).as("b"), col("overlap"))
    val selfOut = selfRep
      .join(ma.withColumnRenamed("da", "digest"), Seq(groupCol, "digest"))
      .join(mb.withColumnRenamed("db", "digest"), Seq(groupCol, "digest"))
      .where(col("ia") < col("ib"))
      .select(col(groupCol), col("ia").as("a"), col("ib").as("b"), col("overlap"))
    crossOut.unionByName(selfOut)
  }
}
