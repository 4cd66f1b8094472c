package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.expressions.TextExprs.md5_prefix60
import graft.expressions.TopKAggregate.top_k

/** Feature-hashed document embeddings + hybrid lexical/semantic
  * retrieval with reciprocal-rank fusion — the production search
  * stack (BM25 list ⊕ vector list → RRF) over the documents table,
  * with the "embedding model" replaced by the classic scalable
  * fallback: the hashing trick (Weinberger et al.'s feature hashing —
  * each term hashes to one of [[Dim]] buckets with a hash-derived
  * ±1 sign, so the vector is a signed token-count projection). Both
  * sides are exact-integer until one final cosine/logistic boundary,
  * so the whole stack is deterministic and oracle-mirrorable.
  *
  * Scale design (100 TB):
  *  - the embedding is ONE explode + groupBy over tokens — linear,
  *    no vocabulary table, no model weights (that's the point of
  *    hashing);
  *  - the query set is [[querySel]]-bounded and every per-query
  *    artifact (terms, vectors) broadcasts;
  *  - lexical tf rows are semi-joined to the ≤3·|Q| query terms
  *    BEFORE the shuffle, so shuffled state is |Q|-bounded per doc;
  *  - semantic scoring is the ann_cosine pattern — broadcast query
  *    vectors against the corpus, top-k through the bounded-heap
  *    aggregate (partial heaps cross the exchange, not scored rows);
  *  - fusion joins two ≤(|Q|·k)-row rank lists — driver-free and
  *    tiny.
  *
  * Determinism: bucket sums and dot products are exact Long
  * arithmetic (order-free); per-(query,candidate) BM25 adds its ≤3
  * term scores in FIXED rank order (the bm25 literal-pivot trick,
  * keyed by the query's tf-idf rank instead of a literal term list);
  * cosine is one IEEE division of exact-integer-derived doubles; RRF
  * adds its two 1/(60+rank) terms in fixed order; every rank breaks
  * ties by doc_id. */
object HashEmbed {

  /** Hashed-embedding dimensionality. 16 keeps the differential
    * corpus readable; production would use 2^18+ — nothing below
    * depends on the constant. */
  val Dim = 16
  /** Per-list depth fed into fusion, and the fused output depth. */
  val TopK = 10
  val HybridTopK = 5
  /** The RRF smoothing constant from the Cormack/Clarke/Buettcher
    * paper — 1/(RrfC + rank). */
  val RrfC = 60

  /** Query-id ceiling: production retrieval serves a workload bounded
    * by the serving layer, not by corpus size — an unbounded
    * `doc_id % 29` selector would grow |Q| with the corpus and turn
    * the broadcast-queries × corpus scan quadratic (the 1×-vs-8×
    * scale probe measured exactly that: 19.5× at 8× data). The bound
    * pins |Q| (covers every doc at the driver's SFs, so gated results
    * are unchanged) the same way the ANN family's `vec_id < 10` does. */
  val QueryIdBound = 100000L

  private def querySel(c: org.apache.spark.sql.Column) =
    c % 29 === 3 && c < QueryIdBound

  /** Feature-hashed embedding, LONG format (doc_id, bucket, n_terms,
    * v): bucket = md5_60(term) mod Dim, sign = bit 4 of the hash,
    * v = Σ sign over the doc's token occurrences. Long format is the
    * gated contract (scalar columns diff cleanly); [[vectors]] folds
    * it to arrays for the cosine path. */
  def hashedEmbeddings(documents: DataFrame): DataFrame = {
    val toks = documents
      .select(col("doc_id"), explode(Dedup.words(col("text"))).as("term"))
      .repartition(col("doc_id"))
    toks
      .select(col("doc_id"),
        pmod(md5_prefix60(col("term")), lit(Dim.toLong)).cast("int").as("bucket"),
        when(pmod(shiftright(md5_prefix60(col("term")), 4), lit(2L)) === 0, 1L)
          .otherwise(-1L).as("sgn"))
      .groupBy("doc_id", "bucket")
      .agg(count(lit(1)).as("n_terms"), sum(col("sgn")).as("v"))
  }

  /** (doc_id, vec: array[Dim] of long, norm_sq) from the long table;
    * zero-norm docs (all signs cancelled) are dropped — they have no
    * cosine direction, mirrored by the oracle's nrm > 0 filter. */
  private def vectors(emb: DataFrame): DataFrame =
    emb
      .groupBy("doc_id")
      .agg(map_from_entries(collect_list(struct(col("bucket"), col("v")))).as("m"))
      .select(col("doc_id"),
        transform(sequence(lit(0), lit(Dim - 1)),
          i => coalesce(element_at(col("m"), i.cast("int")), lit(0L))).as("vec"))
      .withColumn("norm_sq",
        aggregate(col("vec"), lit(0L), (acc, x) => acc + x * x))
      .filter(col("norm_sq") > 0)

  /** Hybrid search: for each query doc (doc_id % 29 = 3), fuse a
    * BM25 list over the query's top-3 tf-idf terms with a cosine
    * list over the hashed embeddings via reciprocal-rank fusion
    * score = Σ 1/(60+rank). Output: HybridTopK fused results per
    * query with both source ranks (null where a list missed). */
  def hybridSearch(documents: DataFrame): DataFrame =
    hybridSearch(documents, hashedEmbeddings(documents),
      Relevance.tfidfTopTerms(documents))

  /** [[hybridSearch]] over PRECOMPUTED inputs — callers with Mat
    * barriers for the hashed-embedding long table and the tf-idf top
    * terms (both are read by their own queries too) pass them here so
    * the corpus is tokenized once per session, not once per consumer. */
  def hybridSearch(documents: DataFrame, emb: DataFrame,
                   topTerms: DataFrame): DataFrame = {
    import graft.llm.Relevance.{K1, B}
    // query terms: the query docs' top-3 tf-idf terms, keyed by RANK
    // (unique per query) so per-candidate scores can add in fixed
    // rank order
    val qt = topTerms
      .filter(querySel(col("doc_id")))
      .select(col("doc_id").as("query_doc_id"), col("term"), col("rank"))
    // ---- lexical list: BM25 over the dynamic query terms ----
    val docs = documents
      .select(col("doc_id"), Dedup.words(col("text")).as("w"))
      .select(col("doc_id"), col("w"), size(col("w")).cast("long").as("dl"))
      .repartition(col("doc_id"))
    val corpus = docs.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("total_len"))
    val terms = qt.select("term").distinct()
    val tf = docs
      .select(col("doc_id"), col("dl"), explode(col("w")).as("term"))
      .join(broadcast(terms), Seq("term"))
      .groupBy("doc_id", "dl", "term")
      .agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val scored = tf.join(broadcast(dfreq), Seq("term")).crossJoin(broadcast(corpus))
      .withColumn("idf",
        log((col("n_docs") - col("df") + 0.5) / (col("df") + 0.5) + 1.0)
          .cast(org.apache.spark.sql.types.DecimalType(18, 9)).cast("double"))
      .withColumn("avgdl",
        col("total_len").cast("double") / col("n_docs").cast("double"))
      .withColumn("s",
        col("idf") * col("tf") * (K1 + 1) /
          (col("tf") + lit(K1) * (lit(1.0 - B) + lit(B) * col("dl").cast("double") / col("avgdl"))))
      .join(broadcast(qt), Seq("term"))
      .filter(col("doc_id") =!= col("query_doc_id"))
    val perRank = (1 to Relevance.TfidfTopK).map(r =>
      max(when(col("rank") === r, col("s"))).as(s"s_r$r"))
    val lexScore = scored.groupBy("query_doc_id", "doc_id")
      .agg(perRank.head, perRank.tail: _*)
      // fixed left-to-right addition in rank order — both engines fold
      // identically (the bm25 literal-pivot device)
      .withColumn("lex_score",
        (1 to Relevance.TfidfTopK)
          .map(r => coalesce(col(s"s_r$r"), lit(0.0))).reduceLeft(_ + _))
    val lexTop = lexScore.groupBy("query_doc_id")
      .agg(top_k(col("lex_score"), col("doc_id"), TopK).as("tk"))
      .select(col("query_doc_id"), posexplode(col("tk")))
      .select(col("query_doc_id"), col("col.payload").as("doc_id"),
        (col("pos") + 1).cast("int").as("lex_rank"))
    // ---- semantic list: cosine over the hashed embeddings ----
    val vecs = vectors(emb)
    val qv = vecs.filter(querySel(col("doc_id")))
      .select(col("doc_id").as("query_doc_id"), col("vec").as("qvec"),
        col("norm_sq").as("qn"))
    val cos = vecs.crossJoin(broadcast(qv))
      .filter(col("doc_id") =!= col("query_doc_id"))
      .withColumn("dot",
        aggregate(zip_with(col("vec"), col("qvec"), (a, b) => a * b),
          lit(0L), (acc, x) => acc + x))
      .withColumn("cos",
        col("dot").cast("double") /
          (sqrt(col("norm_sq").cast("double")) * sqrt(col("qn").cast("double"))))
    val semTop = cos.groupBy("query_doc_id")
      .agg(top_k(col("cos"), col("doc_id"), TopK).as("tk"))
      .select(col("query_doc_id"), posexplode(col("tk")))
      .select(col("query_doc_id"), col("col.payload").as("doc_id"),
        (col("pos") + 1).cast("int").as("sem_rank"))
    // ---- reciprocal-rank fusion over the two ≤(|Q|·k)-row lists ----
    val fused = lexTop.join(semTop, Seq("query_doc_id", "doc_id"), "full_outer")
      .withColumn("rrf_score",
        coalesce(lit(1.0) / (lit(RrfC) + col("lex_rank")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(RrfC) + col("sem_rank")), lit(0.0)))
    // final rank: a window is fine here BY CONSTRUCTION — ≤ 2·TopK
    // candidates per query survive fusion
    fused
      .withColumn("rank", row_number().over(
        Window.partitionBy("query_doc_id")
          .orderBy(col("rrf_score").desc, col("doc_id").asc)).cast("int"))
      .filter(col("rank") <= HybridTopK)
      .select("query_doc_id", "rank", "doc_id", "lex_rank", "sem_rank", "rrf_score")
  }
}
