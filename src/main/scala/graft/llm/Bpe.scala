package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed BPE (byte-pair-encoding) vocabulary training — the
  * tokenizer-construction step of a training-data pipeline, as a Spark
  * plan (Sennrich et al., "Neural Machine Translation of Rare Words
  * with Subword Units": repeatedly merge the most frequent adjacent
  * symbol pair).
  *
  * Scale design (100 TB): the classic trick — train on the WORD
  * FREQUENCY TABLE, not the corpus. One corpus pass builds
  * (word, freq); every subsequent iteration is vocabulary-bounded:
  * pair counting is one map-side-combined aggregation over distinct
  * words weighted by freq, the argmax pair is a K=1 TakeOrdered
  * broadcast back, and the merge application rewrites the (bounded)
  * word table. [[MergeCount]] iterations = that many vocab-sized
  * passes; corpus size only ever enters through the first aggregation.
  * Each iteration's word table is eagerly localCheckpoint'd (the
  * [[Clusters]] recipe) — both consumers of round k (pair counts and
  * the rewrite) read the materialized table, keeping the plan LINEAR
  * in rounds instead of 2^k — and round k-1's checkpoint is freed as
  * soon as round k's materializes (graft.plans.Checkpoints), so a
  * long-lived session pins one word table, not MergeCount of them.
  *
  * Representation: a word's segmentation is its symbols joined by a
  * single space (symbols are substrings of \s+-split words, so they
  * can never contain a space themselves — the separator is safe, and
  * "last symbol equals a" is exactly "acc = a OR acc ends with ' a'").
  * The merge application is the greedy left-to-right non-overlapping
  * fold: append `b` directly (no separator) when the accumulated
  * string's last symbol is `a` and the next symbol is `b`, else append
  * ` x`. Both engines run this IDENTICAL fold (Spark `aggregate`,
  * DuckDB `list_reduce`, first element as initial accumulator), making
  * the whole K-round training differentially testable.
  *
  * Determinism: pair counts are exact longs; the argmax is totalized
  * by (count desc, pair asc); the fold is sequential left-to-right on
  * both engines. No floats anywhere.
  */
object Bpe {

  /** Merge iterations — enough to exercise multi-round dynamics
    * (including merged symbols joining later pairs) while keeping the
    * generated oracle SQL bounded. */
  val MergeCount = 6

  /** Sentinel "pair" row keeping an exhausted pair table from
    * collapsing the crossJoin to empty mid-pipeline. Safety does NOT
    * rest on the NUL text (a pathological document could contain NUL;
    * the whitespace split does not strip it): the sentinel carries
    * cnt = -1, so it can never win the (cnt desc, pair asc) argmax
    * against a real pair (cnt >= 1). Two consumers, two guards
    * (ADVICE r7 — they are NOT the same): the merge-table output
    * filters `cnt >= 0`, so sentinel rounds emit no merge row; the
    * words-rewrite path has NO cnt guard — the sentinel's symbols DO
    * reach applyMerge — and is safe only because the sentinel wins
    * solely when the pair table is EMPTY, i.e. no word has >= 2
    * symbols left, which makes the rewrite a no-op regardless of what
    * (a, b) carry. A sentinel text that could match real symbols would
    * still be safe for that reason, but keep it unmatchable anyway.
    * The DuckDB oracle's sentinel differs textually ("   " in
    * LlmSql.bpeCtes) -- equivalent: only its cnt = -1 matters. */
  private val Sentinel = "\u0000 \u0000"

  /** (word, freq) over the corpus — the one corpus-sized pass. */
  def wordFreqs(documents: DataFrame): DataFrame =
    documents
      .select(explode(Dedup.words(col("text"))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("freq"))

  /** Initial segmentation: one symbol per character. */
  private def charSyms(word: Column): Column =
    concat_ws(" ", transform(sequence(lit(1), length(word)),
      i => word.substr(i, lit(1))))

  /** Adjacent symbol pairs of one segmentation, as "a b" strings. */
  private def pairsOf(syms: Column): Column = {
    val s = split(syms, " ")
    when(size(s) >= 2,
      transform(sequence(lit(1), size(s) - 1),
        i => concat_ws(" ", element_at(s, i), element_at(s, i + 1))))
      .otherwise(array().cast("array<string>"))
  }

  /** One greedy left-to-right merge application of pair (a, b). */
  private def applyMerge(syms: Column, a: Column, b: Column): Column = {
    val s = split(syms, " ")
    aggregate(slice(s, lit(2), size(s) - 1), element_at(s, 1),
      (acc, x) => when((acc === a || acc.endsWith(concat(lit(" "), a))) && x === b,
        concat(acc, b)).otherwise(concat(acc, lit(" "), x)))
  }

  /** Run [[MergeCount]] BPE iterations over the corpus word-frequency
    * table. Returns (merges, segmentation):
    *  - merges: (merge_rank, left, right, merged, pair_freq) — the
    *    learned vocabulary, one row per iteration;
    *  - segmentation: (word, freq, n_pieces, pieces) — every distinct
    *    word under the final merge table. */
  def train(documents: DataFrame): (DataFrame, DataFrame) = {
    val (merges, seg, _) = trainRetained(documents)
    (merges, seg)
  }

  /** [[train]] plus the checkpoint handles the returned plans lean on
    * (the final word table and the K 1-row merge picks) — the unigram
    * trainRetained contract (ADVICE r15): intermediate rounds free
    * inline, these stay pinned until every consumer materializes, and
    * a memoizing caller frees them through this list afterwards
    * (measured to matter: the scale probe's fresh-alias passes
    * accumulate one retained word-table block set per alias). */
  def trainRetained(documents: DataFrame)
      : (DataFrame, DataFrame, Seq[DataFrame]) = {
    val spark = documents.sparkSession
    import spark.implicits._
    val sentinel = Seq((Sentinel, -1L)).toDF("pair", "cnt")
    var words = wordFreqs(documents)
      .select(col("word"), col("freq"), charSyms(col("word")).as("syms"))
      .localCheckpoint(true)
    val merges = Vector.newBuilder[DataFrame]
    val retained = Vector.newBuilder[DataFrame]
    for (k <- 1 to MergeCount) {
      val prevWords = words
      val counts = words
        .select(col("freq"), explode(pairsOf(col("syms"))).as("pair"))
        .groupBy("pair").agg(sum(col("freq")).as("cnt"))
      // the 1-row argmax is checkpointed too (eager, trivial): it
      // decouples the merge table AND the next word table from round
      // k-1's word checkpoint, which can then be freed below instead
      // of staying pinned for the session (VERDICT r6 #3)
      val top1 = counts
        .unionByName(sentinel) // never outranks a real pair
        .orderBy(col("cnt").desc, col("pair").asc).limit(1)
        .select(
          split(col("pair"), " ").getItem(0).as("a"),
          split(col("pair"), " ").getItem(1).as("b"),
          col("cnt"))
        .localCheckpoint(true)
      words = words.crossJoin(broadcast(top1))
        .select(col("word"), col("freq"),
          applyMerge(col("syms"), col("a"), col("b")).as("syms"))
        .localCheckpoint(true)
      // round k's words + top1 are materialized: nothing reads round
      // k-1's word table anymore
      graft.plans.Checkpoints.free(prevWords)
      retained += top1
      merges += top1.filter(col("cnt") >= 0)
        .select(lit(k).as("merge_rank"), col("a").as("left_sym"), col("b").as("right_sym"),
          concat(col("a"), col("b")).as("merged"), col("cnt").as("pair_freq"))
    }
    val mergesDf = merges.result().reduce(_ unionByName _)
    val seg = words.select(col("word"), col("freq"),
      size(split(col("syms"), " ")).cast("long").as("n_pieces"),
      col("syms").as("pieces"))
    (mergesDf, seg, retained.result() :+ words)
  }

  /** The id-assigned vocabulary: every distinct PIECE of the final
    * segmentation with its total corpus occurrence count and a dense
    * piece id in (count desc, piece asc) order — the lookup table a
    * serializer needs to emit integer token streams. Ranking runs
    * through the two-phase [[graft.operators.Ranks.globalRank]]: the
    * piece vocabulary grows with the corpus, so a single-partition
    * global window is exactly the scale bug the operator exists to
    * avoid. (globalRank ranks LARGEST metric first with an ascending
    * key tiebreak — matching the vocabulary convention directly.) */
  def vocabIds(segmentation: DataFrame): DataFrame = {
    val pieces = segmentation
      .select(col("freq"), explode(split(col("pieces"), " ")).as("piece"))
      .groupBy("piece").agg(sum(col("freq")).as("n_occurrences"))
    pieces.join(
        graft.operators.Ranks.globalRank(pieces, "piece",
          col("n_occurrences"), "piece_id"),
        Seq("piece"))
      .select(col("piece"), col("piece_id").cast("long").as("piece_id"),
        col("n_occurrences"))
  }

  /** Apply the trained tokenizer to the corpus: per-document TRUE BPE
    * token count via a join against the (vocabulary-sized, broadcast-
    * able) segmentation table — the number every token-budget decision
    * (packing, chunking, billing) actually needs, next to text_stats'
    * chars/4 estimate. Scale: explode is linear in corpus tokens, the
    * segmentation side is the vocabulary; nothing re-runs training. */
  def tokenCounts(documents: DataFrame, segmentation: DataFrame): DataFrame =
    documents
      .select(col("doc_id"), explode(Dedup.words(col("text"))).as("word"))
      .repartition(col("doc_id"))
      .join(broadcast(segmentation.select(col("word"), col("n_pieces"))), Seq("word"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_words"), sum(col("n_pieces")).as("n_bpe_tokens"))

  /** TOKENIZER FERTILITY by language — BPE pieces per whitespace word,
    * the number every multilingual token-budget and batch-size plan
    * is built on (a language at fertility 3 costs 3× the context of
    * one at 1.2, and a tokenizer trained lopsidedly shows it here).
    * One |langs|-row rollup over [[tokenCounts]]; the ratio is a
    * single double division of exact long sums. */
  def fertilityByLang(documents: DataFrame,
                      tokenCounts: DataFrame): DataFrame =
    documents.select(col("doc_id"), col("lang"))
      .join(tokenCounts, Seq("doc_id"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_words").as("total_words"),
        sum("n_bpe_tokens").as("total_bpe_tokens"))
      .select(col("lang"), col("n_docs"),
        col("total_words").cast("long").as("total_words"),
        col("total_bpe_tokens").cast("long").as("total_bpe_tokens"),
        (col("total_bpe_tokens").cast("double")
          / col("total_words").cast("double")).as("fertility"))
}
