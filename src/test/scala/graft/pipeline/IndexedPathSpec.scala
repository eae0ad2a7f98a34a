package graft.pipeline

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.catalog.Catalog

/** Executable gate for the PERSISTENT pipeline indexes (r17): the
  * stored-index paths must return byte-identical rows to their
  * recompute originals — parquet roundtrips longs and IEEE doubles
  * exactly, and the probe/score math is shared code, so any
  * divergence is a wiring bug this spec catches before the oracle
  * gate does.
  */
class IndexedPathSpec extends SparkSpec {

  val dir = "/root/testdata/sf0.001"
  val uri = s"${System.getProperty("java.io.tmpdir")}/graft_test_catalog"
  lazy val docs = spark.read.parquet(s"$dir/documents.parquet")
  lazy val embs = spark.read.parquet(s"$dir/embeddings.parquet")

  test("incrementalDedupIndexed over a stored signature table == recompute") {
    val deltaPred = col("doc_id") % 4 === 0
    val recompute = Dedup.incrementalDedup(docs, deltaPred)
      .orderBy("doc_id").collect().toSeq
    Dedup.writeSignatureIndex(uri, "sig_idx_spec", docs.where(!deltaPred))
    assert(Catalog.tableExists(uri, "sig_idx_spec"))
    val indexed = Dedup.incrementalDedupIndexed(
      docs.where(deltaPred), uri, "sig_idx_spec")
      .orderBy("doc_id").collect().toSeq
    assert(recompute.nonEmpty)
    assert(indexed == recompute)
    // the gate reports at least one genuine near-dup hit at this SF
    assert(recompute.exists(_.getLong(1) > 0))
  }

  test("ivfTopKIndexed over stored centroid/list tables == ivfTopK") {
    val queryPred = col("vec_id") % 50 === 0
    val centroidPred = col("vec_id") % 37 === 0
    val recompute = Similarity.ivfTopK(embs, queryPred, centroidPred)
      .orderBy("qid", "rank").collect().toSeq
    Similarity.writeIvfIndex(uri, "ivf_idx_spec", embs, centroidPred)
    assert(Catalog.tableExists(uri, "ivf_idx_spec_centroids") &&
      Catalog.tableExists(uri, "ivf_idx_spec_lists"))
    val indexed = Similarity.ivfTopKIndexed(
      embs.where(queryPred), uri, "ivf_idx_spec")
      .orderBy("qid", "rank").collect().toSeq
    assert(recompute.nonEmpty)
    assert(indexed == recompute)
  }

  test("semDedupGateIndexed: delta vectors gate against the stored index; " +
       "a MemoryStream run equals the batch run micro-batch by micro-batch") {
    import spark.implicits._
    val deltaPred = col("vec_id") % 50 === 0
    Similarity.writeIvfIndex(uri, "ivf_gate_spec",
      embs.where(!deltaPred), col("vec_id") % 37 === 0)
    val delta = embs.where(deltaPred)
    val batch = Similarity.semDedupGateIndexed(delta, uri, "ivf_gate_spec")
      .as[(Long, Long, Long)].collect().toSet
    assert(batch.nonEmpty)
    // contract sanity: every delta vector reports exactly once; clean
    // docs carry (0, -1); any match id is a BASE id
    assert(batch.size == delta.count())
    assert(batch.forall { case (_, n, m) => (n == 0) == (m == -1L) })
    assert(batch.forall { case (_, _, m) => m == -1L || m % 50 != 0 })
    // streaming twin: two micro-batches, Update mode — one final row
    // per vector in its own batch (the incrementalDedupStream harness)
    implicit val sqlCtx = spark.sqlContext
    val rows = delta.select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])].collect().toSeq
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Array[Float])]
    val q = Similarity.semDedupGateIndexed(
        mem.toDF().toDF("vec_id", "embedding"), uri, "ivf_gate_spec")
      .writeStream.format("memory").queryName("sem_gate")
      .outputMode("update")
      .start()
    try {
      mem.addData(rows.take(rows.length / 2))
      q.processAllAvailable()
      mem.addData(rows.drop(rows.length / 2))
      q.processAllAvailable()
      val got = spark.table("sem_gate").as[(Long, Long, Long)].collect().toSet
      assert(got == batch)
    } finally q.stop()
  }

  test("readTable on a missing table fails loudly") {
    intercept[IllegalArgumentException] {
      Catalog.readTable(spark, uri, "no_such_table")
    }
  }
}
