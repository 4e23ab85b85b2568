package graft.dedup

import graft.{Portable, QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Deduplication suite (SURVEY.md §2.3): exact, MinHash+LSH, SimHash,
  * n-gram Jaccard, embedding-cosine near-dup.
  *
  * Scale design: every candidate-generation step is a relational plan
  * (map-side signature build → one shuffle into buckets → within-bucket
  * self-join), so AQE/Catalyst handle skew and pushdown. Candidate
  * pairs only ever form inside a bucket with `doc_a < doc_b`; nothing
  * is ever collected to the driver. At 100 TB the bucket join is the
  * only O(pairs) stage and its size is controlled by the banding
  * parameters (b·r trade-off per Broder/LSH theory).
  */
object Dedup {
  import Portable._

  // ----------------------------------------------------------- exact
  /** Exact dedup on normalized text: hash → groupBy → keep min id.
    * One shuffle on the 128-bit content hash; no sort of the corpus. */
  val exact = QueryDef(
    "dedup_exact",
    Some(s"""SELECT md5(${normTextSql("text")}) AS h, min(doc_id) AS keep_id, count(*) AS n_copies
      FROM documents GROUP BY h ORDER BY keep_id"""),
    (s, d) => Tables.documents(s, d)
      .groupBy(md5(normText(col("text"))).as("h"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
      .orderBy(col("keep_id")))

  // ------------------------------------------------- minhash helpers
  private def shingleDf(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"), split(normText(col("text")), " ").as("toks"))
      .filter(size(col("toks")) >= 3)
      .select(col("doc_id"), wordShingles(col("toks")).as("sh"))

  private def bandsDf(s: SparkSession, d: String): DataFrame = {
    val sig = shingleDf(s, d)
      .select(col("doc_id"), shingleHashes(col("sh")).as("hs"))
      .select(col("doc_id") +: (0 until NumHashes).map(j => minhashOfHashes(col("hs"), j).as(s"m$j")): _*)
    val bandStructs = (0 until Bands).map { b =>
      struct(lit(b).as("band_idx"),
        concat_ws("_", (0 until RowsPerBand).map(r => col(s"m${b * RowsPerBand + r}")): _*).as("band_key"))
    }
    sig.select(col("doc_id"), explode(array(bandStructs: _*)).as("band"))
      .select(col("doc_id"), col("band.band_idx").as("band_idx"), col("band.band_key").as("band_key"))
  }

  private def shSqlCte: String =
    s"""norm AS (SELECT doc_id, string_split(${normTextSql("text")}, ' ') AS toks FROM documents),
       shx AS (SELECT doc_id, ${wordShinglesSql("toks")} AS sh FROM norm WHERE len(toks) >= 3)"""

  private def bandsSqlCte: String = {
    val ms = (0 until NumHashes).map(j => s"${minhashSql("sh", j)} AS m$j").mkString(", ")
    val bandSelects = (0 until Bands).map { b =>
      val key = (0 until RowsPerBand).map(r => s"m${b * RowsPerBand + r}").mkString(", ")
      s"SELECT doc_id, $b AS band_idx, concat_ws('_', $key) AS band_key FROM sig"
    }.mkString(" UNION ALL ")
    s"""$shSqlCte,
       sig AS (SELECT doc_id, $ms FROM shx),
       bands AS ($bandSelects)"""
  }

  // ------------------------------------------------------ signatures
  /** Exploded LSH band keys per document — the shuffle key of the
    * dedup pipeline, surfaced for verification. */
  val minhashSignatures = QueryDef(
    "dedup_minhash_signatures",
    Some(s"""WITH $bandsSqlCte
      SELECT doc_id, band_idx, band_key FROM bands ORDER BY doc_id, band_idx"""),
    (s, d) => bandsDf(s, d).orderBy(col("doc_id"), col("band_idx")))

  // ------------------------------------------------------------- lsh
  /** MinHash+LSH near-dup pairs: k=16 signatures, 4 bands × 4 rows,
    * band-bucket join for candidates, exact Jaccard verify ≥ 0.6. */
  val minhashLsh = QueryDef(
    "dedup_minhash_lsh",
    Some(s"""WITH $bandsSqlCte,
      cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM bands a JOIN bands b
        ON a.band_idx = b.band_idx AND a.band_key = b.band_key AND a.doc_id < b.doc_id),
      pairs AS (SELECT c.doc_a, c.doc_b,
          len(list_filter(s1.sh, x -> list_contains(s2.sh, x))) AS inter,
          len(s1.sh) AS la, len(s2.sh) AS lb
        FROM cand c JOIN shx s1 ON s1.doc_id = c.doc_a JOIN shx s2 ON s2.doc_id = c.doc_b)
      SELECT doc_a, doc_b, round(CAST(inter AS DOUBLE) / (la + lb - inter), 6) AS jaccard
      FROM pairs WHERE CAST(inter AS DOUBLE) / (la + lb - inter) >= 0.6
      ORDER BY doc_a, doc_b"""),
    (s, d) => {
      val bands = bandsDf(s, d)
      val cand = bands.as("a").join(bands.as("b"),
          col("a.band_idx") === col("b.band_idx") &&
          col("a.band_key") === col("b.band_key") &&
          col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        .distinct()
      val sh = shingleDf(s, d)
      cand
        .join(sh.as("s1"), col("doc_a") === col("s1.doc_id"))
        .join(sh.as("s2"), col("doc_b") === col("s2.doc_id"))
        .select(col("doc_a"), col("doc_b"),
          size(array_intersect(col("s1.sh"), col("s2.sh"))).as("inter"),
          size(col("s1.sh")).as("la"), size(col("s2.sh")).as("lb"))
        .withColumn("jac", col("inter").cast(DoubleType) / (col("la") + col("lb") - col("inter")))
        .filter(col("jac") >= 0.6)
        .select(col("doc_a"), col("doc_b"), round(col("jac"), 6).as("jaccard"))
        .orderBy(col("doc_a"), col("doc_b"))
    })

  // --------------------------------------------------------- simhash
  private val h60SparkSql = "CAST(conv(substring(md5(t),1,15),16,10) AS BIGINT)"

  private def simhashDf(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"), split(normText(col("text")), " ").as("toks0"))
      .select(col("doc_id"),
        expr(s"transform(array_distinct(toks0), t -> $h60SparkSql)").as("hs"))
      .select(col("doc_id"),
        expr("""aggregate(sequence(0, 31), CAST(0 AS BIGINT), (acc, i) ->
            acc + IF(2 * size(filter(hs, h -> (shiftright(h, i) & 1) = 1)) > size(hs),
                     shiftleft(CAST(1 AS BIGINT), i), CAST(0 AS BIGINT)))""").as("simhash"))

  private val simhashSqlCte: String =
    s"""tok AS (SELECT doc_id, list_distinct(string_split(${normTextSql("text")}, ' ')) AS t FROM documents),
       hsx AS (SELECT doc_id, list_transform(t, s -> ${h60Sql("s")}) AS hs FROM tok),
       sim AS (SELECT doc_id, CAST(list_sum(list_transform(range(0, 32), i ->
           CASE WHEN 2 * len(list_filter(hs, h -> ((h >> i) & 1) = 1)) > len(hs)
                THEN (CAST(1 AS BIGINT) << i) ELSE CAST(0 AS BIGINT) END)) AS BIGINT) AS simhash
         FROM hsx)"""

  /** 32-bit SimHash signature per document (per-bit token majority,
    * Charikar 2002). Map-side only — zero shuffle. */
  val simhash = QueryDef(
    "dedup_simhash",
    Some(s"""WITH $simhashSqlCte
      SELECT doc_id, simhash FROM sim ORDER BY doc_id"""),
    (s, d) => simhashDf(s, d).orderBy(col("doc_id")))

  /** SimHash near-dup pairs with Hamming distance ≤ 6. Exact pair scan
    * here (verify scale); at 100 TB the same signature column feeds a
    * pigeonhole band join (split 32 bits into 4 bands; dups agree on
    * ≥1 band) exactly like the minhash bucket path. */
  val simhashPairs = QueryDef(
    "dedup_simhash_pairs",
    Some(s"""WITH $simhashSqlCte
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        bit_count(xor(a.simhash, b.simhash)) AS hamming
      FROM sim a JOIN sim b ON a.doc_id < b.doc_id
      WHERE bit_count(xor(a.simhash, b.simhash)) <= 6
      ORDER BY doc_a, doc_b"""),
    (s, d) => {
      val sim = simhashDf(s, d)
      sim.as("a").join(sim.as("b"), col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
          expr("bit_count(a.simhash ^ b.simhash)").as("hamming"))
        .filter(col("hamming") <= 6)
        .orderBy(col("doc_a"), col("doc_b"))
    })

  // --------------------------------------------- n-gram Jaccard dedup
  /** Character-5-gram Jaccard near-dup, blocked by `source` (the
    * classic blocking-key strategy: pairs only form within a block).
    * At 100 TB the block key bounds the quadratic term per bucket. */
  val ngramJaccard = QueryDef(
    "dedup_ngram_jaccard",
    Some(s"""WITH g AS (SELECT doc_id, source,
        list_distinct(list_transform(range(1, length(s) - 3), i -> substr(s, i, 5))) AS gr
        FROM (SELECT doc_id, source, ${normTextSql("text")} AS s FROM documents)
        WHERE length(s) >= 5)
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        round(CAST(len(list_filter(a.gr, x -> list_contains(b.gr, x))) AS DOUBLE)
          / (len(a.gr) + len(b.gr) - len(list_filter(a.gr, x -> list_contains(b.gr, x)))), 6) AS jaccard
      FROM g a JOIN g b ON a.source = b.source AND a.doc_id < b.doc_id
      WHERE CAST(len(list_filter(a.gr, x -> list_contains(b.gr, x))) AS DOUBLE)
          / (len(a.gr) + len(b.gr) - len(list_filter(a.gr, x -> list_contains(b.gr, x)))) >= 0.3
      ORDER BY doc_a, doc_b"""),
    (s, d) => {
      val g = Tables.documents(s, d)
        .select(col("doc_id"), col("source"), normText(col("text")).as("s"))
        .filter(length(col("s")) >= 5)
        .select(col("doc_id"), col("source"),
          expr("array_distinct(transform(sequence(1, length(s) - 4), i -> substring(s, i, 5)))").as("gr"))
      g.as("a").join(g.as("b"),
          col("a.source") === col("b.source") && col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
          size(array_intersect(col("a.gr"), col("b.gr"))).as("inter"),
          size(col("a.gr")).as("la"), size(col("b.gr")).as("lb"))
        .withColumn("jac", col("inter").cast(DoubleType) / (col("la") + col("lb") - col("inter")))
        .filter(col("jac") >= 0.3)
        .select(col("doc_a"), col("doc_b"), round(col("jac"), 6).as("jaccard"))
        .orderBy(col("doc_a"), col("doc_b"))
    })

  // ------------------------------------------- embedding near-dup
  /** Exact embedding-cosine near-dup pairs (cos ≥ 0.4). Both sides
    * fold products left-to-right in double, so values agree exactly.
    * Exact quadratic scan at verify scale; `ann_lsh` is the banded
    * scale path for the same signal. */
  val embedCosine = QueryDef(
    "dedup_embed_cosine",
    Some("""WITH v AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
      n AS (SELECT vec_id, v, sqrt(list_reduce(list_transform(v, x -> x * x), (a, b) -> a + b)) AS nrm FROM v)
      SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        round(list_reduce(list_transform(range(1, len(a.v) + 1), i -> a.v[i] * b.v[i]), (x, y) -> x + y)
          / (a.nrm * b.nrm), 6) AS cos
      FROM n a JOIN n b ON a.vec_id < b.vec_id
      WHERE list_reduce(list_transform(range(1, len(a.v) + 1), i -> a.v[i] * b.v[i]), (x, y) -> x + y)
          / (a.nrm * b.nrm) >= 0.4
      ORDER BY id_a, id_b"""),
    (s, d) => {
      val n = Tables.embeddings(s, d)
        .select(col("vec_id"), expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))
        .withColumn("nrm", expr("sqrt(aggregate(transform(v, x -> x * x), CAST(0 AS DOUBLE), (a, b) -> a + b))"))
      n.as("a").join(n.as("b"), col("a.vec_id") < col("b.vec_id"))
        .select(col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b"),
          expr("""aggregate(zip_with(a.v, b.v, (x, y) -> x * y), CAST(0 AS DOUBLE), (acc, p) -> acc + p)
               / (a.nrm * b.nrm)""").as("c"))
        .filter(col("c") >= 0.4)
        .select(col("id_a"), col("id_b"), round(col("c"), 6).as("cos"))
        .orderBy(col("id_a"), col("id_b"))
    })

  val defs: Seq[QueryDef] = Seq(exact, minhashSignatures, minhashLsh,
    simhash, simhashPairs, ngramJaccard, embedCosine)
}
