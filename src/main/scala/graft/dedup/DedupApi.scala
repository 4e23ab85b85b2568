package graft.dedup

import graft.Portable
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** User-facing parameterized dedup API (the library surface a
  * pipeline imports; the `Dedup` QueryDefs are thin instantiations).
  * All pipelines are relational plans: signature build is map-side,
  * the only shuffle keys are the bucket/block keys, candidate pairs
  * form exclusively inside buckets with `idA < idB`.
  */
object DedupApi {
  import Portable._

  /** Exact dedup: one surviving (min-id) row id per normalized-text
    * hash. `keep` joins back to the input for the surviving rows. */
  def exactGroups(df: DataFrame, id: String, text: String): DataFrame =
    df.groupBy(md5(normText(col(text))).as("h"))
      .agg(min(col(id)).as("keep_id"), count(lit(1)).as("n_copies"))

  def exactKeep(df: DataFrame, id: String, text: String): DataFrame =
    df.join(exactGroups(df, id, text).select(col("keep_id").as(id)), Seq(id), "left_semi")

  /** Word-shingle sets per row (distinct k-shingles of the
    * whitespace-normalized text); rows with < k tokens drop out. */
  def shingles(df: DataFrame, id: String, text: String, k: Int = 3): DataFrame =
    df.select(col(id), split(normText(col(text)), " ").as("toks"))
      .filter(size(col("toks")) >= k)
      .select(col(id), wordShingles(col("toks"), k).as("sh"))

  /** Exploded LSH band keys: numHashes minhash signatures split into
    * `bands` bands. One row per (id, band). */
  def minhashBands(sh: DataFrame, id: String,
      numHashes: Int = NumHashes, bands: Int = Bands): DataFrame = {
    val rows = numHashes / bands
    val sig = sh.select(col(id), shingleHashes(col("sh")).as("hs"))
      .select(col(id) +: (0 until numHashes).map(j => minhashOfHashes(col("hs"), j).as(s"m$j")): _*)
    val bandStructs = (0 until bands).map { b =>
      struct(lit(b).as("band_idx"),
        concat_ws("_", (0 until rows).map(r => col(s"m${b * rows + r}")): _*).as("band_key"))
    }
    sig.select(col(id), explode(array(bandStructs: _*)).as("band"))
      .select(col(id), col("band.band_idx").as("band_idx"), col("band.band_key").as("band_key"))
  }

  /** MinHash+LSH near-dup pairs with exact Jaccard verification.
    * Shingle sets and band keys are persisted (memory-and-disk): both
    * feed multiple joins, and recomputing them means re-hashing the
    * corpus 3×. At 100 TB the same role is played by checkpointing
    * the signature table to the lake between stages.
    *
    * `maxBucketSize > 0` drops band buckets larger than the cap before
    * the self-join — the guard against quadratic pair explosion on
    * pathological buckets (boilerplate-heavy corpora): a bucket of m
    * docs contributes m²/2 candidates, so one megabucket can dominate
    * the whole job. Dropping a bucket loses its candidates unless the
    * pair also co-occurs in a surviving bucket of one of the other
    * `bands-1` bands — likely for ordinary near-dups, not guaranteed
    * for pairs whose shared boilerplate lands them in oversized
    * buckets in every band. */
  def minhashPairs(df: DataFrame, id: String, text: String,
      threshold: Double = 0.6, k: Int = 3,
      numHashes: Int = NumHashes, bands: Int = Bands,
      maxBucketSize: Int = 0): DataFrame = {
    val sh = shingles(df, id, text, k).persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val bndAll = minhashBands(sh, id, numHashes, bands).persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val bnd =
      if (maxBucketSize <= 0) bndAll
      else {
        // broadcast the drop list, not the keep list: oversized buckets
        // are rare by design, while buckets <= cap are nearly all of them
        val oversized = bndAll.groupBy(col("band_idx"), col("band_key"))
          .agg(count(lit(1)).as("__bsz"))
          .filter(col("__bsz") > maxBucketSize)
          .select(col("band_idx").as("f_idx"), col("band_key").as("f_key"))
        bndAll.join(broadcast(oversized),
            col("band_idx") === col("f_idx") && col("band_key") === col("f_key"), "left_anti")
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      }
    val cand = bnd.as("a").join(bnd.as("b"),
        col("a.band_idx") === col("b.band_idx") &&
        col("a.band_key") === col("b.band_key") &&
        col(s"a.$id") < col(s"b.$id"))
      .select(col(s"a.$id").as("doc_a"), col(s"b.$id").as("doc_b"))
      .distinct()
    cand
      .join(sh.hint("shuffle_hash").as("s1"), col("doc_a") === col(s"s1.$id"))
      .join(sh.hint("shuffle_hash").as("s2"), col("doc_b") === col(s"s2.$id"))
      .select(col("doc_a"), col("doc_b"),
        size(array_intersect(col("s1.sh"), col("s2.sh"))).as("inter"),
        size(col("s1.sh")).as("la"), size(col("s2.sh")).as("lb"))
      .withColumn("jac", col("inter").cast(DoubleType) / (col("la") + col("lb") - col("inter")))
      .filter(col("jac") >= threshold)
      .select(col("doc_a"), col("doc_b"), round(col("jac"), 6).as("jaccard"))
  }

  /** Character-n-gram Jaccard near-dup pairs via prefix filtering
    * (Chaudhuri et al. SSJoin ICDE'06; Bayardo, Ma & Srikant
    * "Scaling Up All Pairs Similarity Search", WWW'07), inside the
    * caller's `block` column. Grams are globally ordered rarest-first
    * (document frequency, then gram); each doc keys only its first
    * |g| - ceil(t·|g|) + 1 grams. Lossless: for J(A,B) ≥ t the
    * smallest-ordered shared gram c has at most |A| - ceil(t·|A|)
    * non-shared grams of A before it (A's preceding grams are all in
    * A\B, and |A∩B| ≥ t·|A∪B| ≥ ceil(t·|A|)), so c sits in BOTH
    * prefixes and the pair collides on it. Two further lossless
    * prunes (epsilon-slack on every float comparison so rounding can
    * never drop an exact-boundary pair): the length filter
    * (min/max gram count ≥ t) and PPJoin's positional filter (Xiao,
    * Wang, Lin & Yu, WWW'08) — a collision at prefix positions
    * (pa, pb) survives only if 1 + min(|A|-pa, |B|-pb), the best
    * possible overlap from the common suffix, reaches the required
    * overlap ceil(t/(1+t)·(|A|+|B|)); for a true pair its
    * smallest-ordered shared gram always passes (everything shared
    * sits at or after it on both sides). On a shared-vocabulary
    * corpus this prunes the large population of pairs that share one
    * mid-prefix gram and nothing else. */
  def ngramJaccardPairs(df: DataFrame, id: String, text: String, block: String,
      n: Int = 5, threshold: Double = 0.7): DataFrame = {
    require(threshold > 0 && threshold < 1, s"threshold must be in (0,1), got $threshold")
    val g = df.select(col(id), col(block), normText(col(text)).as("s"))
      .filter(length(col("s")) >= n)
      .select(col(id), col(block),
        expr(s"array_distinct(transform(sequence(1, length(s) - ${n - 1}), i -> substring(s, i, $n)))").as("gr"))
      .withColumn("la", size(col("gr")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val grams = g.select(col(id), col(block), col("la"), explode(col("gr")).as("gram"))
    val gdf = grams.groupBy(col(block), col("gram")).agg(count(lit(1)).as("gdf"))
    val pre = grams.join(gdf, Seq(block, "gram"))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col(id))
          .orderBy(col("gdf"), col("gram"))))
      .filter(col("rn") <= col("la") - ceil(col("la") * threshold) + 1)
      .select(col(id), col(block), col("la"), col("gram"), col("rn"))
    val requiredOverlap =
      ceil((col("a.la") + col("b.la")) * (threshold / (1 + threshold)) - 1e-6)
    val cand = pre.as("a").join(pre.as("b"),
        col(s"a.$block") === col(s"b.$block") && col("a.gram") === col("b.gram") &&
        col(s"a.$id") < col(s"b.$id") &&
        col("a.la") >= col("b.la") * threshold - 1e-6 &&
        col("b.la") >= col("a.la") * threshold - 1e-6 &&
        lit(1) + least(col("a.la") - col("a.rn"), col("b.la") - col("b.rn")) >= requiredOverlap)
      .select(col(s"a.$id").as("doc_a"), col(s"b.$id").as("doc_b"))
      .distinct()
    // shuffle-hash verify joins: the gram-array side is hash-built per
    // partition instead of sort-merged — sorting wide array rows was
    // 6x the cost of the whole verify at sf0.1
    cand
      .join(g.select(col(id), col("gr")).hint("shuffle_hash").as("s1"), col("doc_a") === col(s"s1.$id"))
      .join(g.select(col(id), col("gr")).hint("shuffle_hash").as("s2"), col("doc_b") === col(s"s2.$id"))
      .select(col("doc_a"), col("doc_b"),
        size(array_intersect(col("s1.gr"), col("s2.gr"))).as("inter"),
        size(col("s1.gr")).as("la"), size(col("s2.gr")).as("lb2"))
      .withColumn("jac", col("inter").cast(DoubleType) / (col("la") + col("lb2") - col("inter")))
      .filter(col("jac") >= threshold)
      .select(col("doc_a"), col("doc_b"), round(col("jac"), 6).as("jaccard"))
  }

  /** Connected components over a near-dup pair graph: every node gets
    * the minimum doc id of its component (the canonical "cluster then
    * keep one" dedup endgame). Iterative min-label propagation — each
    * round is one join + aggregate, state is one (node, label) row per
    * doc, so the loop is a bounded number of narrow shuffles, never a
    * driver-side union-find. Each round is `localCheckpoint`ed:
    * without lineage truncation the nested union+join plan grows
    * exponentially and planning itself OOMs after ~10 rounds (on a
    * cluster, point `spark.checkpoint` at reliable storage instead).
    * Converges in ≤ graph-diameter rounds; if `maxIters` is exceeded
    * this THROWS rather than return silently wrong labels. */
  def nearDupClusters(allIds: DataFrame, id: String, pairs: DataFrame,
      maxIters: Int = 20): DataFrame = {
    val edges = pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .union(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
      .localCheckpoint(true)
    var labels = allIds.select(col(id).as("node"), col(id).as("cluster")).localCheckpoint(true)
    var converged = false
    var i = 0
    while (!converged && i < maxIters) {
      val viaNeighbor = edges.join(labels, col("src") === col("node"))
        .select(col("dst").as("node"), col("cluster"))
      val next = labels.union(viaNeighbor)
        .groupBy(col("node")).agg(min(col("cluster")).as("cluster"))
        .localCheckpoint(true)
      val changed = next.join(labels.withColumnRenamed("cluster", "old"), Seq("node"))
        .filter(col("cluster") =!= col("old")).limit(1).count()
      labels = next
      converged = changed == 0
      i += 1
    }
    if (!converged) throw new IllegalStateException(
      s"nearDupClusters did not converge within $maxIters rounds " +
        "(component diameter exceeds the bound); raise maxIters")
    labels
  }

  /** Append a 60-bit SimHash signature column (per-bit majority of
    * distinct token hashes, Charikar 2002). Pure per-row expression
    * work — usable identically in batch plans and streaming stages.
    * 60 bits = the full portable md5-prefix hash width; a wider
    * fingerprint is what makes banded candidate generation
    * sub-quadratic (with 32 bits the blocks are too narrow for
    * selective keys — see simhashPairs). */
  def withSimhash(df: DataFrame, text: String, out: String = "simhash"): DataFrame = {
    val h60SparkSql = "CAST(conv(substring(md5(t),1,15),16,10) AS BIGINT)"
    df.withColumn("__toks", split(normText(col(text)), " "))
      .withColumn("__hs", expr(s"transform(array_distinct(__toks), t -> $h60SparkSql)"))
      .withColumn(out, expr(
        s"""aggregate(sequence(0, ${SimhashBits - 1}), CAST(0 AS BIGINT), (acc, i) ->
           acc + IF(2 * size(filter(__hs, h -> (shiftright(h, i) & 1) = 1)) > size(__hs),
                    shiftleft(CAST(1 AS BIGINT), i), CAST(0 AS BIGINT)))"""))
      .drop("__toks", "__hs")
  }

  /** (id, simhash) signature table — see [[withSimhash]]. */
  def simhashSignatures(df: DataFrame, id: String, text: String): DataFrame =
    withSimhash(df.select(col(id), col(text)), text).select(col(id), col("simhash"))

  /** Block decomposition of the 60-bit fingerprint for banded pair
    * generation (Manku, Jain & Das Sarma, WWW 2007 "Detecting
    * Near-Duplicates for Web Crawling"): 8 blocks (4×8 + 4×7 bits).
    * A pair within Hamming distance 6 differs in ≤ 6 blocks, so ≥ 2
    * blocks match exactly — it collides in at least one of the
    * C(8,2)=28 two-block combo tables. Random collisions per combo are
    * 2^-(14..16), so candidate volume is ~28/2^15 ≈ 0.09% of all pairs
    * (vs ~40% for single 4-bit bands on a 32-bit fingerprint). */
  val SimhashBits = 60
  private val BlockOffsets = Vector(0, 8, 16, 24, 32, 39, 46, 53)
  private val BlockWidths  = Vector(8, 8, 8, 8, 7, 7, 7, 7)
  private val BlockCombos: Seq[(Int, Int)] =
    for { i <- 0 until 8; j <- (i + 1) until 8 } yield (i, j)

  /** SimHash pairs within Hamming distance. `banded=true` (the scale
    * path, and exact for maxHamming ≤ 6 by the pigeonhole argument
    * above) follows Manku et al.'s full recipe: fingerprints are
    * deduplicated first, the combo tables band and verify *distinct*
    * signatures only, and the surviving signature pairs expand to id
    * pairs through the signature→id mapping; identical-signature
    * groups contribute their intra-group pairs (hamming 0) directly.
    * On duplicate-dense corpora this removes the 28× repeated
    * collisions that identical fingerprints would otherwise generate
    * in every combo table. `banded=false` is the quadratic reference
    * scan; banding is only valid for maxHamming ≤ 6 (the two-block
    * pigeonhole bound), so larger distances fall back to the exact
    * quadratic scan regardless of `banded`. All paths return
    * identical rows. */
  def simhashPairs(df: DataFrame, id: String, text: String,
      maxHamming: Int = 6, banded: Boolean = true): DataFrame = {
    val useBanded = banded && maxHamming <= 6
    if (banded && !useBanded)
      System.err.println(s"[graft] simhashPairs: maxHamming=$maxHamming exceeds the " +
        "two-block pigeonhole bound (6); falling back to the EXACT QUADRATIC scan — " +
        "do not run this shape on a large corpus")
    val sim = simhashSignatures(df, id, text)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    if (!useBanded)
      sim.as("a").join(sim.as("b"), col(s"a.$id") < col(s"b.$id"))
        .select(col(s"a.$id").as("doc_a"), col(s"b.$id").as("doc_b"),
          expr("bit_count(a.simhash ^ b.simhash)").as("hamming"))
        .filter(col("hamming") <= maxHamming)
    else {
      val sigs = sim.select(col("simhash")).distinct()
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val comboStructs = BlockCombos.zipWithIndex.map { case ((i, j), c) =>
        val vi = s"(shiftright(simhash, ${BlockOffsets(i)}) & ${(1 << BlockWidths(i)) - 1})"
        val vj = s"(shiftright(simhash, ${BlockOffsets(j)}) & ${(1 << BlockWidths(j)) - 1})"
        expr(s"named_struct('c', $c, 'k', $vi * 256 + $vj)")
      }
      val keys = sigs.select(col("simhash"), explode(array(comboStructs: _*)).as("ck"))
        .select(col("simhash"), col("ck.c").as("c"), col("ck.k").as("k"))
      val sigPairs = keys.as("a").join(keys.as("b"),
          col("a.c") === col("b.c") && col("a.k") === col("b.k") &&
          col("a.simhash") < col("b.simhash"))
        .select(col("a.simhash").as("sig_a"), col("b.simhash").as("sig_b"))
        .distinct()
        .withColumn("hamming", expr("bit_count(sig_a ^ sig_b)"))
        .filter(col("hamming") <= maxHamming)
      val cross = sigPairs
        .join(sim.hint("shuffle_hash").as("s1"), col("sig_a") === col("s1.simhash"))
        .join(sim.hint("shuffle_hash").as("s2"), col("sig_b") === col("s2.simhash"))
        .select(least(col(s"s1.$id"), col(s"s2.$id")).as("doc_a"),
          greatest(col(s"s1.$id"), col(s"s2.$id")).as("doc_b"), col("hamming"))
      val intra = sim.as("s1").join(sim.as("s2"),
          col("s1.simhash") === col("s2.simhash") && col(s"s1.$id") < col(s"s2.$id"))
        .select(col(s"s1.$id").as("doc_a"), col(s"s2.$id").as("doc_b"),
          lit(0).as("hamming"))
      cross.union(intra)
    }
  }

  private def normVecs(df: DataFrame, id: String, vec: String): DataFrame =
    df.select(col(id), expr(s"transform($vec, x -> CAST(x AS DOUBLE))").as("v"))
      .withColumn("nrm", expr("sqrt(aggregate(transform(v, x -> x * x), CAST(0 AS DOUBLE), (a, b) -> a + b))"))

  /** Exact cosine near-dup pairs over a float-array embedding column
    * (deterministic left-to-right double fold). All-pairs — the
    * small-n reference scan; [[cosinePairsLsh]] is the scale path. */
  def cosinePairs(df: DataFrame, id: String, vec: String, threshold: Double): DataFrame = {
    val n = normVecs(df, id, vec)
    n.as("a").join(n.as("b"), col(s"a.$id") < col(s"b.$id"))
      .select(col(s"a.$id").as("id_a"), col(s"b.$id").as("id_b"),
        expr("""aggregate(zip_with(a.v, b.v, (x, y) -> x * y), CAST(0 AS DOUBLE), (acc, p) -> acc + p)
             / (a.nrm * b.nrm)""").as("c"))
      .filter(col("c") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("c"), 6).as("cos"))
  }

  /** Cosine near-dup pairs with hyperplane-LSH candidate blocking
    * (Charikar 2002): candidates form only inside same-bucket cells of
    * the [[graft.similarity.Similarity]] multi-table sign-code index
    * (the one ann_lsh uses), then an exact cosine re-verify applies
    * the threshold. Sub-quadratic — the only shuffle keys are
    * (table, bucket) — but recall is probabilistic: a qualifying pair
    * colliding in none of the tables is missed, which is why the
    * oracle (and any downstream contract) must mirror the same
    * deterministic blocking rather than the all-pairs scan. */
  def cosinePairsLsh(df: DataFrame, id: String, vec: String, threshold: Double): DataFrame = {
    import graft.similarity.Similarity
    val n = normVecs(df, id, vec)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val tb = n.select(col(id), explode(array((0 until Similarity.NumTables).map(t =>
        struct(lit(t).as("t"), expr(Similarity.bucketExprSparkFor(t)).as("bk"))): _*)).as("tb"))
      .select(col(id), col("tb.t").as("t"), col("tb.bk").as("bk"))
    val cand = tb.as("a").join(tb.as("b"),
        col("a.t") === col("b.t") && col("a.bk") === col("b.bk") && col(s"a.$id") < col(s"b.$id"))
      .select(col(s"a.$id").as("id_a"), col(s"b.$id").as("id_b"))
      .distinct()
    cand
      .join(n.hint("shuffle_hash").as("x"), col("id_a") === col(s"x.$id"))
      .join(n.hint("shuffle_hash").as("y"), col("id_b") === col(s"y.$id"))
      .select(col("id_a"), col("id_b"),
        expr("""aggregate(zip_with(x.v, y.v, (p, q) -> p * q), CAST(0 AS DOUBLE), (acc, t) -> acc + t)
             / (x.nrm * y.nrm)""").as("c"))
      .filter(col("c") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("c"), 6).as("cos"))
  }
}
