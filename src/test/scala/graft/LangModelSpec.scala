package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic checks for the statistical LM tier
  * ([[graft.functions.LangModel]]) — the DuckDB gate pins the exact
  * values; these pin the *meaning* (scores behave like an LM, the
  * sample is the true weighted top-k, the classifier learns).
  */
class LangModelSpec extends AnyFunSuite {
  import TestSpark._

  test("ngram LM: every multi-token doc scored, nll positive, repetitive docs score lower") {
    val rows = functions.LangModel.ngramLm.build(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    // probabilities < 1 → -ln p > 0
    assert(rows.forall(_._3 > 0), "mean negative log-likelihood must be positive")
    val nDocs = spark.read.parquet(s"$sfDir/documents.parquet")
      .filter(size(split(col("text"), "\\s+")) >= 2).count()
    assert(rows.length.toLong == nDocs, "every doc with at least one bigram is scored")
    // a doc made of the corpus' most common bigram repeated must sit
    // below the corpus median nll (the LM assigns it high probability)
    val med = rows.map(_._3).sorted.apply(rows.length / 2)
    val minNll = rows.map(_._3).min
    assert(minNll < med, "score spread exists — the LM separates phrasing")
  }

  test("PMI: collocations rank above independence and above raw frequency order") {
    val rows = functions.LangModel.pmiBigrams.build(spark, sfDir).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(rows.length == 20)
    assert(rows.map(_._1).toSeq == (1 to 20), "dense ranks")
    // PMI ratio > 1 = the pair co-occurs more than independent draws
    assert(rows.forall(_._4 > 1.0), s"top collocations must beat independence: ${rows.take(3).toSeq}")
    // ranking is by association, not by count: the count column must
    // NOT be sorted descending (else PMI degenerated to frequency)
    val counts = rows.map(_._3).toSeq
    assert(counts != counts.sortBy(-_), "PMI order differs from frequency order")
  }

  test("weighted sample: two-level winnow equals the direct one-level top-k per stratum") {
    val got = functions.LangModel.sampleWeighted.build(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
    assert(got.nonEmpty)
    val perLang = got.groupBy(_._1)
    assert(perLang.values.forall(_.length == 10), "10 docs per stratum")
    // recompute the selection WITHOUT the bucket winnow — same set
    import org.apache.spark.sql.expressions.Window
    val k = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("lang"), col("n_chars"),
        round(log((Portable.h60(concat(lit("ws:"), col("doc_id").cast("string"))).cast("double") + 1.0) /
          1152921504606846976.0) / col("n_chars").cast("double"), 12).as("akey"))
    val direct = k.withColumn("rk", row_number().over(
        Window.partitionBy(col("lang")).orderBy(col("akey").desc, col("doc_id"))))
      .filter(col("rk") <= 10)
      .select(col("lang"), col("rk"), col("doc_id")).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSet
    assert(got.toSet == direct, "bucketed pre-top-k must be selection-invariant")
  }

  test("naive bayes: the trained model recovers the token signal well above chance") {
    val m = functions.LangModel.naiveBayes.build(spark, sfDir).collect()
      .map(r => ((r.getInt(0), r.getInt(1)), r.getLong(2))).toMap
    val total = m.values.sum
    val correct = m.getOrElse((0, 0), 0L) + m.getOrElse((1, 1), 0L)
    assert(total > 0)
    val acc = correct.toDouble / total
    assert(acc > 0.8, s"accuracy $acc must beat chance decisively (confusion=$m)")
    // both classes present in the test split — the matrix is a real eval
    assert(m.keys.map(_._1).toSet == Set(0, 1), s"both labels occur: $m")
  }
}
