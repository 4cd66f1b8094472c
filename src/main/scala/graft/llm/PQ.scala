package graft.llm

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product quantization (Jégou et al., "Product Quantization for
  * Nearest Neighbor Search", TPAMI 2011) — THE large-corpus vector
  * compression: split each d-dim vector into [[SubSpaces]] contiguous
  * subvectors, train an independent small codebook per subspace (the
  * deterministic [[Kmeans]] recipe on the slice), and store each
  * vector as [[SubSpaces]] small integer codes. With m=4 × K=8 the
  * demo stores 4 × 3 bits; production uses m=8..64 × K=256 (one byte
  * per subspace — a 64-dim float32 vector compresses 256→64 bytes at
  * m=64, or 256→8 bytes at m=8).
  *
  * Determinism: training is the shared Lloyd chain (exact decimal
  * means, lowest-id seeds); code assignment is plain-L2
  * argmin ‖x_s − c‖² = nrm_s − 2·x_s·c + cnrm via the sequential
  * [[Similarity.dot]] folds with a centroid-id tiebreak — no division,
  * no NaN edge even for zero subvectors, so the DuckDB oracle emits
  * bit-identical codes.
  *
  * Scale (100 TB): training runs on the corpus ONCE per subspace
  * (broadcast-K scoring scans, K×subdim mean shuffles); encoding is a
  * broadcast-codebook projection — each vector meets m×K bounded
  * centroids, never another vector. The codes table is the compressed
  * corpus: downstream ANN scans codes + codebooks, not raw floats.
  */
object PQ {

  val SubSpaces = 4
  val SubDim = 16 // embeddings are 64-dim

  private def sliceEmb(s: Int, subDim: Int = SubDim): Column =
    slice(col("embedding"), s * subDim + 1, subDim)

  /** Per-subspace codebooks: (subspace, centroid_id, centroid) —
    * [[Kmeans.centroidVectors]] trained on each contiguous slice.
    * `subSpaces`/`subDim` default to the 64-dim raw layout; the OPQ
    * path trains the SAME machinery over the 16-dim PCA projection at
    * 4×4 — equal code budget (4 codes × 3 bits) either way. */
  def codebooks(embeddingsRaw: DataFrame,
                subSpaces: Int = SubSpaces, subDim: Int = SubDim): DataFrame = {
    // no repartition here: Kmeans.centroidVectors repartitions its own
    // input, and a second outer repartition survives through the slice
    // Project as a redundant full-width shuffle per subspace branch
    (0 until subSpaces).map { s =>
      Kmeans.centroidVectors(
        embeddingsRaw.select(col("vec_id"), sliceEmb(s, subDim).as("embedding")))
        .select(lit(s).as("subspace"), col("centroid_id"), col("centroid"))
    }.reduce(_ union _)
  }

  /** L2 code assignment of every vector's subvectors against
    * `codebooks`: (vec_id, subspace, code). Total: every vector gets a
    * code in every subspace (zero-norm subvectors included — L2 argmin
    * needs no norm guard). */
  def codes(embeddingsRaw: DataFrame, codebooks: DataFrame,
            subSpaces: Int = SubSpaces, subDim: Int = SubDim): DataFrame = {
    val embeddings = embeddingsRaw.repartition(col("vec_id"))
    val subVecs = embeddings.select(col("vec_id"),
      posexplode(array((0 until subSpaces).map(sliceEmb(_, subDim)): _*))
        .as(Seq("subspace", "sub")))
    val cents = codebooks.select(col("subspace"), col("centroid_id"),
      col("centroid"),
      Similarity.dot(col("centroid"), col("centroid")).as("cnrm"))
    subVecs
      .join(broadcast(cents), Seq("subspace"))
      .select(col("vec_id"), col("subspace"), col("centroid_id"),
        (Similarity.dot(col("sub"), col("sub"))
          - lit(2.0) * Similarity.dot(col("sub"), col("centroid"))
          + col("cnrm")).as("d2"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("vec_id"), col("subspace"))
          .orderBy(col("d2").asc_nulls_last, col("centroid_id"))))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("subspace"), col("centroid_id").as("code"))
  }

  /** The PQ-reconstructed corpus: each vector is the concatenation of
    * its subspaces' codeword centroids, shaped like the raw table so
    * the shared ANN machinery runs on it unchanged. Pass a
    * materialized `books` table so the Lloyd training chain executes
    * once, not once per consumer. */
  def reconstructed(embeddingsRaw: DataFrame, books: DataFrame,
                    subSpaces: Int = SubSpaces,
                    subDim: Int = SubDim): DataFrame =
    codes(embeddingsRaw, books, subSpaces, subDim)
      .join(broadcast(books.select(col("subspace"),
        col("centroid_id").as("code"), col("centroid"))),
        Seq("subspace", "code"))
      .groupBy(col("vec_id"))
      .agg(array_sort(collect_list(struct(col("subspace"), col("centroid"))))
        .as("parts"))
      .select(col("vec_id"),
        flatten(transform(col("parts"), p => p.getField("centroid")))
          .as("embedding"))

  /** Cosine top-k over the PQ-reconstructed corpus (symmetric variant
    * — queries reconstructed too; the asymmetric-distance refinement
    * would score raw queries against the same reconstruction). */
  def annPqTopK(embeddingsRaw: DataFrame, books: DataFrame): DataFrame =
    Similarity.annCosineTopK(reconstructed(embeddingsRaw, books))

  /** ADC search (the production PQ query path): FULL-PRECISION query
    * vectors ranked against the compressed (reconstructed) corpus —
    * asymmetric distance loses half the quantization noise of the
    * symmetric form because only one side is approximated. */
  def annPqAdcTopK(embeddingsRaw: DataFrame, books: DataFrame): DataFrame =
    Similarity.annCosineTopKAsym(
      reconstructed(embeddingsRaw, books), embeddingsRaw)

  /** Coarse assignment of every (nonzero) vector to its nearest
    * centroid, with the centroid vector attached: (vec_id, embedding,
    * centroid_id, centroid). The cosine ranking + centroid_id tiebreak
    * is the shared [[Similarity.centroidRanked]] recipe, so assignment
    * here is bit-identical to the IVF probe's. */
  private def coarseAssigned(embeddingsRaw: DataFrame, coarse: DataFrame): DataFrame = {
    val withNorm = embeddingsRaw.select(col("vec_id"), col("embedding"),
        Similarity.dot(col("embedding"), col("embedding")).as("nrm"))
      .filter(col("nrm") > 0)
    Similarity.centroidRanked(withNorm, coarse).filter(col("rn") === 1)
      .select(col("vec_id"), col("embedding"), col("centroid_id"))
      .join(broadcast(coarse.select(col("centroid_id"), col("centroid"))),
        Seq("centroid_id"))
  }

  /** RESIDUAL vectors r = v − c(v): what real IVFPQ quantizes —
    * residuals from the coarse centroid are much smaller in magnitude
    * than raw vectors, so the same code budget spends its resolution
    * on the part the coarse quantizer didn't explain. Element
    * arithmetic is float→double subtract→float, mirrored exactly by
    * the oracle's list_transform. Shaped like the raw table so the
    * whole PQ training/encoding chain runs on it unchanged. */
  def residualTable(embeddingsRaw: DataFrame, coarse: DataFrame): DataFrame =
    coarseAssigned(embeddingsRaw, coarse).select(col("vec_id"),
      zip_with(col("embedding"), col("centroid"),
        (v, c) => (v.cast("double") - c.cast("double")).cast("float"))
        .as("embedding"))

  /** Per-subspace codebooks trained on the RESIDUALS. */
  def residualCodebooks(embeddingsRaw: DataFrame, coarse: DataFrame): DataFrame =
    codebooks(residualTable(embeddingsRaw, coarse))

  /** The residual-encoded reconstruction v̂ = c(v) + dequant(codes(r)):
    * the PQ chain reconstructs the residual, then the coarse centroid
    * is added back element-wise. Pass Mat'd `coarse`/`booksR` so both
    * trained halves build once. */
  def residualReconstructed(embeddingsRaw: DataFrame, coarse: DataFrame,
                            booksR: DataFrame): DataFrame = {
    val assigned = coarseAssigned(embeddingsRaw, coarse)
    val res = assigned.select(col("vec_id"),
      zip_with(col("embedding"), col("centroid"),
        (v, c) => (v.cast("double") - c.cast("double")).cast("float"))
        .as("embedding"))
    reconstructed(res, booksR)
      .withColumnRenamed("embedding", "r_hat")
      .join(assigned.select(col("vec_id"), col("centroid")), Seq("vec_id"))
      .select(col("vec_id"),
        zip_with(col("r_hat"), col("centroid"),
          (r, c) => (r.cast("double") + c.cast("double")).cast("float"))
          .as("embedding"))
  }

  /** Candidates the ADC stage hands to the exact re-rank — 4× the
    * final k, the standard refinement ratio. */
  val RerankCandidates: Int = 4 * Similarity.TopK

  /** ADC + EXACT RE-RANK — the standard two-stage vector-store search
    * (FAISS's IndexRefineFlat shape): the compressed scan proposes
    * [[RerankCandidates]] candidates per query cheaply, then ONLY those
    * candidates are re-scored against the full-precision corpus and the
    * true top-k of the re-scored set is returned. Recall is bounded by
    * the candidate stage only (a true neighbor ADC ranks below C is
    * still lost) — strictly ≥ pure-ADC top-k, which additionally
    * mis-orders within the top k.
    *
    * Scale (100 TB): stage 1 scans codes, never raw floats; stage 2
    * touches |queries|·C full-precision rows fetched by id — the
    * candidate list is broadcast, so the re-rank is a corpus-side
    * semi-join plus a bounded-heap top-k, never a second corpus scan
    * ranking. */
  def annPqRerankTopK(embeddingsRaw: DataFrame, books: DataFrame): DataFrame =
    rerankFromReconstructed(reconstructed(embeddingsRaw, books), embeddingsRaw)

  /** The re-rank over an ALREADY-built reconstruction — pass the Mat'd
    * compressed corpus so the search scans the index artifact instead
    * of re-deriving it (the deployment shape; [[annPqRerankTopK]]
    * builds inline for specs). */
  def rerankFromReconstructed(rec: DataFrame, embeddingsRaw: DataFrame): DataFrame = {
    val cand = Similarity.annCosineTopKAsym(rec, embeddingsRaw, RerankCandidates)
      .select(col("query_id"), col("neighbor_id"))
    val base = embeddingsRaw.select(col("vec_id"), col("embedding"),
        Similarity.dot(col("embedding"), col("embedding")).as("nrm"))
      .filter(col("nrm") > 0)
    val queries = base.filter(col("vec_id") < Similarity.NQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"),
        col("nrm").as("q_nrm"))
    base
      .join(broadcast(cand), col("vec_id") === col("neighbor_id"))
      .join(broadcast(queries), Seq("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        (Similarity.dot(col("embedding"), col("q_emb"))
          / (sqrt(col("nrm")) * sqrt(col("q_nrm")))).as("cosine"))
      .groupBy(col("query_id"))
      .agg(graft.expressions.TopKAggregate
        .top_k(col("cosine"), col("neighbor_id"), Similarity.TopK).as("tk"))
      .select(col("query_id"), posexplode(col("tk")))
      .select(col("query_id"), col("col.payload").as("neighbor_id"),
        (col("pos") + 1).cast("int").as("rank"), col("col.score").as("cosine"))
  }
}
