package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-11 fixtures: the ADVICE regressions (case-insensitive tracker
  * stripping, scheme-less URL pass-through) plus this round's operators. */
class Round11Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("url canonicalization strips UPPERCASE tracker spellings; surviving params keep their case") {
    import spark.implicits._
    val urls = Seq(
      1L -> "http://ex.com/p?UTM_SOURCE=x&b=2",
      2L -> "http://ex.com/p?utm_source=y&b=2",
      3L -> "http://ex.com/p?REF=tw&Gclid=g&FBCLID=f&b=2",
      // 'B=2' is a DIFFERENT param than 'b=2': value case survives
      4L -> "http://ex.com/p?B=2",
      // 'reformat' is NOT 'ref' — prefix must not over-match
      5L -> "http://ex.com/p?reformat=1&b=2")
    val out = functions.UrlCanon.withCanonicalUrl(urls.toDF("doc_id", "url"), "url")
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(Set(1L, 2L, 3L).map(out) == Set("http://ex.com/p?b=2"), out.toString)
    assert(out(4L) == "http://ex.com/p?B=2", out(4L))
    assert(out(5L) == "http://ex.com/p?b=2&reformat=1", out(5L))
  }

  test("scheme-less URLs canonicalize to NULL and never merge unless byte-identical") {
    import spark.implicits._
    val df = Seq(
      (1L, "s", "Foo/x"),              // relative, case-sensitive path
      (2L, "s", "foo/x"),              // distinct from 1
      (3L, "s", "foo/x"),              // byte-identical to 2 → merges with 2
      (4L, "s", "http://foo/x")        // absolute → canonicalizes normally
    ).toDF("doc_id", "source", "url")
    val canon = functions.UrlCanon.withCanonicalUrl(df, "url")
      .collect().map(r => r.getLong(0) -> Option(r.getString(3))).toMap
    assert(canon(1L).isEmpty && canon(2L).isEmpty && canon(3L).isEmpty, canon.toString)
    assert(canon(4L).contains("http://foo/x"), canon.toString)
    val st = functions.UrlCanon.urlDedupStats(df, "doc_id", "url", "source")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // only doc 3 (byte-dup of 2) is removable; 1 vs 2 stay distinct
    assert(st.toSeq == Seq(("s", 4L, 1L)), st.toSeq.toString)
  }
}
