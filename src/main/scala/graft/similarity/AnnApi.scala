package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** User-facing parameterized ANN API (the `Similarity` QueryDefs are
  * thin instantiations). All variants share one contract: `probeIds`
  * is a one-column DataFrame of probe ids (semi-joined against the
  * corpus — unambiguous under self-joins, and the realistic shape: a
  * probe set arrives as its own table); output is `(id_p, rk, id_c,
  * cos)` — top-`k` per probe, exact cosine re-rank, deterministic
  * (left-to-right double folds, ties broken by candidate id).
  *
  * Scale shape: probes are small (broadcast semi-join); brute never
  * shuffles the corpus; LSH/IVF shuffle once into (table, bucket) /
  * cell and bound candidates per probe.
  */
object AnnApi {
  private val dot = "graft_dot(a.v, b.v)"

  /** Normalized view: (id [, passthrough], v double[], nrm). */
  def normalized(df: DataFrame, id: String, vec: String, passthrough: Seq[String] = Nil): DataFrame = {
    graft.functions.Dot.ensure(df.sparkSession)
    df.select((col(id) +: passthrough.map(col)) :+
        expr(s"transform($vec, x -> CAST(x AS DOUBLE))").as("v"): _*)
      .withColumn("nrm", expr("sqrt(graft_dot(v, v))"))
  }

  private def rerank(pairs: DataFrame, id: String, k: Int): DataFrame =
    pairs
      .select(col(s"a.$id").as("id_p"), col(s"b.$id").as("id_c"),
        expr(s"$dot / (a.nrm * b.nrm)").as("c"))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("id_p")).orderBy(col("c").desc, col("id_c"))))
      .filter(col("rk") <= k)
      .select(col("id_p"), col("rk"), col("id_c"), round(col("c"), 6).as("cos"))
      .orderBy(col("id_p"), col("rk"))

  /** Exact top-k neighbors for every probe id. */
  def bruteTopK(corpus: DataFrame, id: String, vec: String,
      probeIds: DataFrame, k: Int = 5): DataFrame = {
    val n = normalized(corpus, id, vec)
    val probes = n.join(probeIds, Seq(id), "left_semi")
    rerank(probes.as("a").join(n.as("b"), col(s"a.$id") =!= col(s"b.$id")), id, k)
  }

  /** Multi-table random-hyperplane LSH top-k: candidates = union of
    * same-bucket rows over `Similarity.NumTables` sign-code tables. */
  def lshTopK(corpus: DataFrame, id: String, vec: String,
      probeIds: DataFrame, k: Int = 5)(implicit scope: graft.CacheScope = graft.CacheScope.untracked): DataFrame = {
    val n = normalized(corpus, id, vec)
      .transform(scope.persist)
    val tables = (0 until Similarity.NumTables).map(t =>
      struct(lit(t).as("t"), expr(Similarity.bucketExprSparkFor(t)).as("bk")))
    val tb = n.withColumn("tbl", explode(array(tables: _*)))
      .select(col(id), col("tbl.t").as("t"), col("tbl.bk").as("bk"))
      .transform(scope.persist)
    val tbProbes = tb.join(probeIds, Seq(id), "left_semi")
    val cand = tbProbes.as("ca").join(tb.as("cb"),
        col("ca.t") === col("cb.t") && col("ca.bk") === col("cb.bk") &&
        col(s"ca.$id") =!= col(s"cb.$id"))
      .select(col(s"ca.$id").as("pid"), col(s"cb.$id").as("cid"))
      .distinct()
    val pairs = cand
      .join(n.as("a"), col(s"a.$id") === col("pid"))
      .join(n.as("b"), col(s"b.$id") === col("cid"))
    rerank(pairs, id, k)
  }

  /** Deterministic Lloyd k-means cell assignment for IVF: fixed
    * iteration count, `id % kCells` init over a deterministic
    * training sample (`id % trainMod == 0` — the standard
    * train-quantizer-on-a-sample IVF recipe), decimal-exact centroid
    * means, cosine argmax assignment with cell-id tie-break. The
    * final iteration assigns the whole corpus. Every step is
    * merge-order-free (decimal centroid sums; dot products are
    * left-to-right folds over index-ordered centroid arrays), so the
    * whole index build is reproducible and DuckDB-oracle-verifiable
    * (the oracle unrolls the same iterations as CTEs).
    *
    * Scale shape per iteration: one NATIVE vector-sum centroid
    * aggregate over the sample ([[graft.functions.VecSumDec]] — one
    * dim-length buffer per partition per cell; the corpus is never
    * posexploded to corpus×dim rows), then a broadcast of kCells
    * centroid *arrays* joined against the corpus with codegen'd
    * `zip_with`/`aggregate` folds and a hash-aggregate argmax — the
    * corpus is never shuffled for assignment. */
  def kmeansCells(corpus: DataFrame, id: String, vec: String,
      kCells: Int = 8, iters: Int = 2, trainMod: Int = 1)(implicit scope: graft.CacheScope = graft.CacheScope.untracked): DataFrame = {
    require(iters >= 1 && kCells >= 1 && trainMod >= 1)
    graft.functions.VecSumDec.ensure(corpus.sparkSession)
    val n = normalized(corpus, id, vec)
      .transform(scope.persist)
    val train = if (trainMod == 1) n else n.filter(pmod(col(id), lit(trainMod)) === 0)
    var assign = train.select(col(id), pmod(col(id), lit(kCells)).cast("bigint").as("cell"))
    for (it <- 1 to iters) {
      // per-position decimal sum + count from ONE aggregate ≡ the
      // per-(cell, i) decimal mean of the posexplode formulation,
      // bit-for-bit — including null/ragged vectors, since the count
      // is per POSITION, not per row
      val centArr = train.select(col(id), col("v")).as("p")
        .join(assign.as("a"), col(s"p.$id") === col(s"a.$id"))
        .groupBy(col("a.cell"))
        .agg(call_function("graft_vecsum_dec", col("p.v")).as("sv"))
        .select(col("cell"), expr("zip_with(sv.sum, sv.cnt, (x, c) -> CAST(x AS DOUBLE) / c)").as("cm"))
        .withColumn("cn",
          expr("sqrt(graft_dot(cm, cm))"))
      val target = if (it == iters) n else train
      assign = target.crossJoin(broadcast(centArr))
        .select(col(id), col("cell"),
          (expr("graft_dot(v, cm)") / (col("nrm") * col("cn"))).as("c"))
        // hash-aggregate argmax: max of (c, -cell) = best cosine,
        // smallest cell on ties — no window sort over the corpus
        .groupBy(col(id))
        .agg(max(struct(col("c"), (-col("cell")).as("negc"))).as("m"))
        .select(col(id), (-col("m.negc")).as("cell"))
    }
    assign
  }

  /** IVF-style top-k: coarse cells from `cell` (a cluster label),
    * probes search their `nProbeCells` nearest cell centroids
    * (decimal-exact centroid build), exact re-rank inside.
    *
    * Scale shape: centroids come from ONE native vector-sum aggregate
    * ([[graft.functions.VecSumDec]] — a dim-length buffer per
    * partition per cell, no corpus×dim posexplode), probe→centroid
    * dots are decimal `zip_with` folds against the broadcast centroid
    * arrays (order-free ≡ the per-dimension join+sum), and only the
    * probed cells' rows enter the re-rank join. */
  def ivfTopK(corpus: DataFrame, id: String, vec: String, cell: String,
      probeIds: DataFrame, k: Int = 5, nProbeCells: Int = 2)(implicit scope: graft.CacheScope = graft.CacheScope.untracked): DataFrame = {
    graft.functions.VecSumDec.ensure(corpus.sparkSession)
    val n = normalized(corpus, id, vec, passthrough = Seq(cell))
      .transform(scope.persist)
    // centroid MEANS are decimal-exact (merge-order-free across
    // partitions); norms and probe dots over the resulting index-
    // ordered arrays are left-to-right double folds — per-row, fixed
    // order, so deterministic without decimal (≡ oracle list_reduce)
    val centArr = n.groupBy(col(cell))
      .agg(call_function("graft_vecsum_dec", col("v")).as("sv"))
      .select(col(cell), expr("zip_with(sv.sum, sv.cnt, (x, c) -> CAST(x AS DOUBLE) / c)").as("cm"))
      .withColumn("cn",
        expr("sqrt(graft_dot(cm, cm))"))
    val topCells = n.join(probeIds, Seq(id), "left_semi")
      .select(col(id).as("id_p"), col("v"), col("nrm"))
      .crossJoin(broadcast(centArr.select(col(cell).as("cl"), col("cm"), col("cn"))))
      .select(col("id_p"), col("cl"), col("nrm"), col("cn"), expr(
        "graft_dot(v, cm)").as("dt"))
      .withColumn("crk", row_number().over(
        Window.partitionBy(col("id_p"))
          .orderBy((col("dt") / (col("nrm") * col("cn"))).desc, col("cl"))))
      .filter(col("crk") <= nProbeCells)
      .select(col("id_p").as("pid"), col("cl").as("probe_cell"))
    val pairs = topCells
      .join(n.as("a"), col(s"a.$id") === col("pid"))
      .join(n.as("b"), col(s"b.$cell") === col("probe_cell") && col(s"b.$id") =!= col(s"a.$id"))
    rerank(pairs, id, k)
  }
}
