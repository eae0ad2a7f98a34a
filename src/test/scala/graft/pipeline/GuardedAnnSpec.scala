package graft.pipeline

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Executable gate for the guarded ANN fallback: when the counted
  * anchor set exceeds `maxBruteAnchors`, [[Similarity.annTopK]] /
  * [[Similarity.knnLabel]] / [[Similarity.contrastivePairs]] swap the
  * broadcast-brute scorer for IVF probe candidate generation (nProbe
  * nearest lists of the 1/37 coarse quantizer, exact rescoring).
  *
  * This spec forces the fallback (maxBruteAnchors = 0) on the driver
  * testdata and asserts the guarded output EQUALS the brute output
  * row-for-row — the measured coverage bound on this corpus is probe
  * rank 14, so the nProbe = 16 default carries headroom. If the
  * testdata ever drifts past it, this gate fails loudly rather than
  * letting the fallback silently change query results.
  */
class GuardedAnnSpec extends SparkSpec {

  val dir = "/root/testdata/sf0.01"
  lazy val embs = spark.read.parquet(s"$dir/embeddings.parquet")

  test("guarded annTopK over the anchor bound == bruteTopK (driver testdata)") {
    val pred = col("vec_id") % 50 === 0
    val brute = Similarity.bruteTopK(embs, pred, k = 5)
      .orderBy("qid", "rank").collect().toSeq
    val guarded = Similarity.annTopK(embs, pred, k = 5, maxBruteAnchors = 0L)
      .orderBy("qid", "rank").collect().toSeq
    assert(brute.nonEmpty)
    assert(guarded == brute)
  }

  test("guarded knnLabel over the anchor bound == brute knnLabel") {
    val pred = col("vec_id") % 50 === 0
    val brute = Similarity.knnLabel(embs, pred, k = 5)
      .orderBy("qid").collect().toSeq
    val guarded = Similarity.knnLabel(embs, pred, k = 5, maxBruteAnchors = 0L)
      .orderBy("qid").collect().toSeq
    assert(brute.nonEmpty)
    assert(guarded == brute)
  }

  test("guarded contrastivePairs over the anchor bound == brute mining") {
    val pred = col("vec_id") % 25 === 0
    val brute = Similarity.contrastivePairs(embs, pred)
      .orderBy("qid", "kind", "rank").collect().toSeq
    val guarded = Similarity.contrastivePairs(embs, pred, maxBruteAnchors = 0L)
      .orderBy("qid", "kind", "rank").collect().toSeq
    assert(brute.nonEmpty)
    assert(guarded == brute)
  }
}
