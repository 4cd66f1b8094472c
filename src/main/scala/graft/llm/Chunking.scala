package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Context-window chunking — split each document into fixed-size word
  * windows, the step that turns variable-length documents into
  * training-context-sized pieces (and RAG corpora into indexable
  * passages).
  *
  * Chunk boundaries are a pure function of the document's own token
  * positions (no cross-document state): doc k's chunk i is words
  * [i·W, (i+1)·W). So the operator is embarrassingly parallel — a
  * projection + generator per row, no shuffle, no window function —
  * and chunk identity `(doc_id, chunk_idx)` is stable under corpus
  * growth and repartitioning. The final chunk keeps its natural short
  * length (truncation vs padding is the trainer's decision, not the
  * pipeline's).
  *
  * At 100 TB this is the shape that matters: chunking must not be a
  * `Window(partitionBy doc)` (needless shuffle of the full corpus) —
  * it is `explode(transform(sequence(...)))` over the in-row token
  * array, fully pipelined inside the scan's stage.
  */
object Chunking {

  /** Words per chunk for the registered query (small enough that the
    * driver's ~50-400-word documents produce real multi-chunk output). */
  val ChunkWords = 32

  /** (doc_id, chunk_idx, n_words_chunk, chunk_text) — one row per
    * W-word window; documents with no words produce no chunks. */
  def chunks(documents: DataFrame, w: Int = ChunkWords): DataFrame = {
    require(w > 0, "chunk width must be positive")
    val words = Dedup.words(col("text"))
    // last chunk index = (n-1) div W for n >= 1; the division is a
    // double but n << 2^52, so truncation ≡ integer division exactly
    val lastIdx = ((size(words) - lit(1)).cast("double") / lit(w.toDouble)).cast("long")
    // chunk word count is pure arithmetic on the slice bounds —
    // re-tokenizing chunk_text would run a second regex pass over
    // every byte of the corpus for a number already known
    val gen = when(size(words) >= 1,
      transform(sequence(lit(0L), lastIdx),
        i => struct(
          i.as("chunk_idx"),
          least(lit(w.toLong), size(words).cast("long") - i * w).as("n_words_chunk"),
          concat_ws(" ", slice(words, (i * w + 1).cast("int"), lit(w))).as("chunk_text"))))
      .otherwise(array().cast(
        "array<struct<chunk_idx:bigint,n_words_chunk:bigint,chunk_text:string>>"))
    documents
      .select(col("doc_id"), explode(gen).as("c"))
      .select(
        col("doc_id"),
        col("c.chunk_idx").as("chunk_idx"),
        col("c.n_words_chunk").as("n_words_chunk"),
        col("c.chunk_text").as("chunk_text"))
  }

  /** A chunk is boilerplate when its text recurs in at least
    * [[BoilerplateMinDocs]] DISTINCT documents — within-doc repeats
    * alone don't qualify (those are [[Repetition]]'s territory). */
  val BoilerplateMinDocs = 2

  /** CHUNK-level boilerplate share — the paragraph-granularity dedup
    * signal of CCNet-style curation (Wenzek et al. 2020 dedupe CC at
    * the paragraph hash level): per document, how many of its chunks
    * are verbatim shared with OTHER documents (headers, footers,
    * license blocks, navigation — content whole-document dedup never
    * sees because the surrounding text differs). Share = one IEEE
    * division of exact integer counts.
    *
    * Scale: the duplicated-chunk set is a chunk-text-keyed aggregate
    * with map-side combine (production keys by a 64/128-bit chunk
    * hash; text equality and hash equality agree up to collisions the
    * oracle would surface) and is VOCABULARY-bounded — only texts
    * seen ≥ twice survive the HAVING, so the join back is a semi-join
    * against a small set, never doc×doc, never a second corpus
    * scan. */
  def boilerplateShare(chunks: DataFrame,
                       minDocs: Int = BoilerplateMinDocs): DataFrame = {
    val dup = chunks.groupBy(col("chunk_text"))
      .agg(countDistinct(col("doc_id")).as("n_docs"))
      .filter(col("n_docs") >= minDocs)
      .select(col("chunk_text"), lit(1).as("is_dup"))
    chunks.join(dup, Seq("chunk_text"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_chunks"),
        count(col("is_dup")).as("n_boilerplate"))
      .select(col("doc_id"), col("n_chunks"), col("n_boilerplate"),
        (col("n_boilerplate").cast("double") / col("n_chunks").cast("double"))
          .as("boilerplate_share"))
  }
}
