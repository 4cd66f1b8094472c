package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Distributed unigram-LM tokenizer training (Kudo 2018, the
  * SentencePiece unigram model) — [[Bpe]]'s sibling: where BPE greedily
  * MERGES the most frequent pair, the unigram model starts from an
  * over-complete substring vocabulary and lets EM re-weight it, so the
  * final segmentation is the per-word Viterbi optimum under learned
  * piece likelihoods rather than a frozen merge order.
  *
  * Scale design (100 TB): the [[Bpe]] trick verbatim — train on the
  * WORD FREQUENCY TABLE, not the corpus. One corpus pass builds
  * (word, freq); everything after is vocabulary-bounded: the seed
  * substring enumeration is Σ|word|·[[MaxPieceLen]] rows over DISTINCT
  * words, each EM round is one Viterbi map over that table (piece
  * costs ride along as a broadcast MAP column) plus one keyed count
  * aggregate, and the prune is the two-phase
  * [[graft.operators.Ranks.globalRank]]. Corpus size only ever enters
  * through the first aggregation.
  *
  * EM here is the HARD variant (Viterbi counts, not forward-backward
  * posteriors): the E-step segments every word once under the current
  * costs, the M-step re-estimates counts from those segmentations over
  * the FIXED seed domain (unused pieces keep cnt = 0 — Laplace
  * smoothing below keeps them priced, and single-character pieces are
  * never pruned, so every word stays segmentable at every stage).
  * [[EmRounds]] fixed iterations, unrolled — the DuckDB oracle mirrors
  * each round as its own CTE block, making the whole training loop
  * differentially testable (the Bpe discipline).
  *
  * Determinism: piece costs are QUANTIZED NANONATS — cost(p) =
  * round₉(−ln((cnt+1)/(total+n))) · 10⁹ as int64 — the
  * [[Relevance]] quantized-ln recipe (the decimal(18,9) cast absorbs
  * libm's last-ulp ln differences; everything downstream is exact
  * integer arithmetic). Viterbi's DP is then a pure int64
  * shortest-path: ties broken by the built segmentation string
  * ascending, identical in both engines, so the training fixpoint is
  * bit-for-bit differentially testable end to end.
  */
object Unigram {

  /** Longest candidate piece (seed substrings and DP lookback). */
  val MaxPieceLen = 4

  /** Fixed EM iterations (unrolled in the oracle, like Bpe's merges). */
  val EmRounds = 3

  /** Prune target: keep this many pieces by final count (plus every
    * single character, the coverage floor). */
  val VocabTarget = 60

  private val NanoNats = 1000000000L

  /** Every substring occurrence of length 1..[[MaxPieceLen]]
    * (duplicates kept — each occurrence is evidence). */
  private def substrPieces(word: Column): Column =
    flatten(transform(sequence(lit(1), length(word)), i =>
      transform(
        sequence(lit(1), least(lit(MaxPieceLen), length(word) - i + 1)),
        k => word.substr(i, k))))

  /** Seed model: freq-weighted substring occurrence counts — the
    * over-complete initial vocabulary EM starts from. */
  def seedCounts(words: DataFrame): DataFrame =
    words.select(col("freq"), explode(substrPieces(col("word"))).as("piece"))
      .groupBy("piece").agg(sum(col("freq")).as("cnt"))

  /** Quantized-nanonat costs from a (piece, cnt) model: cost =
    * round₉(−ln((cnt+1)/(total+n))) · 10⁹. The +1/+n Laplace floor
    * keeps zero-count pieces priced (finitely expensive, never free).
    * The 10⁹ multiplier goes through a narrow decimal cast — the
    * decimal×long silent-rescale trap documented in the verify
    * gotchas. */
  def costs(model: DataFrame): DataFrame = {
    val stats = model.agg(sum(col("cnt")).as("total"), count(lit(1)).as("n"))
    model.crossJoin(broadcast(stats))
      .select(col("piece"), col("cnt"),
        (-log((col("cnt") + 1).cast("double")
            / (col("total") + col("n")).cast("double")))
          .cast(DecimalType(18, 9))
          .multiply(lit(NanoNats).cast(DecimalType(10, 0)))
          .cast("long").as("cost"))
  }

  /** Per-word Viterbi segmentation under broadcast piece costs: one
    * `aggregate` fold over character positions; the accumulator is the
    * DP table (array of (best cost, best segmentation) per prefix).
    * At each position the ≤[[MaxPieceLen]] candidate extensions are
    * built, invalid ones (piece not in vocab / unreachable prefix)
    * filtered, and the array_sort-minimum taken — (cost, seg) struct
    * ordering IS the tiebreak, shared verbatim by the DuckDB mirror.
    * O(|word|·L) integer ops per word; the cost map is one broadcast
    * row (vocabulary-bounded). */
  def viterbi(words: DataFrame, costsDf: DataFrame): DataFrame = {
    val m = costsDf.agg(
      map_from_entries(collect_list(struct(col("piece"), col("cost"))))
        .as("m"))
    val L = MaxPieceLen
    words.crossJoin(broadcast(m))
      .withColumn("acc", expr(
        s"""aggregate(sequence(1, length(word)),
              array(named_struct('c', cast(0 as bigint), 'seg', '')),
              (acc, i) -> concat(acc, array(element_at(array_sort(filter(
                transform(sequence(1, least($L, i)), k -> named_struct(
                  'c', element_at(acc, i - k + 1).c
                       + element_at(m, substring(word, i - k + 1, k)),
                  'seg', if(element_at(acc, i - k + 1).seg = '',
                            substring(word, i - k + 1, k),
                            concat(element_at(acc, i - k + 1).seg, ' ',
                                   substring(word, i - k + 1, k))))),
                x -> isnotnull(x.c))), 1))))"""))
      .select(col("word"), col("freq"),
        expr("element_at(acc, length(word) + 1).seg").as("pieces"))
      .withColumn("n_pieces", size(split(col("pieces"), " ")).cast("long"))
  }

  /** One EM round: E-step = Viterbi under the previous model's costs;
    * M-step = freq-weighted piece counts from those segmentations,
    * re-anchored on the fixed seed domain (absent → 0). */
  private def emRound(words: DataFrame, domain: DataFrame,
                      prevModel: DataFrame): DataFrame = {
    val counts = viterbi(words, costs(prevModel))
      .select(col("freq"), explode(split(col("pieces"), " ")).as("piece"))
      .groupBy("piece").agg(sum(col("freq")).as("cnt"))
    domain.join(counts, Seq("piece"), "left")
      .select(col("piece"), coalesce(col("cnt"), lit(0L)).as("cnt"))
  }

  /** Train: seed → [[EmRounds]] EM iterations → prune to
    * [[VocabTarget]] (∪ single chars) → final Viterbi under the pruned
    * model. Returns (vocab, segmentation):
    *  - vocab: (piece, piece_id, n_occurrences, cost_q9) — the
    *    serializer artifact (dense ids in count-desc order, the
    *    quantized-nanonat cost the scorer loads);
    *  - segmentation: (word, freq, n_pieces, pieces) — every distinct
    *    word under the final model.
    * Per-round localCheckpoints keep the plan linear in rounds (the
    * Bpe recipe); the seed stays pinned — its domain anchors every
    * round's M-step. */
  def train(documents: DataFrame): (DataFrame, DataFrame) = {
    val (vocab, seg, _) = trainRetained(documents)
    (vocab, seg)
  }

  /** [[train]] plus the checkpoint handles the returned plans lean on
    * (words, seed, final EM model) — intermediate EM rounds are freed
    * inline, but these three stay pinned until every consumer has
    * materialized. A long-lived app iterating many data dirs frees
    * them through this handle list once both outputs are served
    * (ADVICE r15: the memoizing caller leaked them for the app's
    * lifetime). */
  def trainRetained(documents: DataFrame)
      : (DataFrame, DataFrame, Seq[DataFrame]) = {
    val words = Bpe.wordFreqs(documents).localCheckpoint(true)
    val seed = seedCounts(words).localCheckpoint(true)
    val domain = seed.select("piece")
    var model = seed
    for (_ <- 1 to EmRounds) {
      val prev = model
      model = emRound(words, domain, model).localCheckpoint(true)
      if (prev ne seed) graft.plans.Checkpoints.free(prev)
    }
    val kept = model
      .join(graft.operators.Ranks.globalRank(model, "piece", col("cnt"), "r"),
        Seq("piece"))
      .filter(col("r") <= VocabTarget || length(col("piece")) === 1)
      .select("piece", "cnt")
    val finalCosts = costs(kept)
    val seg = viterbi(words, finalCosts)
      .select(col("word"), col("freq"), col("n_pieces"), col("pieces"))
    val vocab = finalCosts
      .join(graft.operators.Ranks.globalRank(kept, "piece", col("cnt"),
        "piece_id"), Seq("piece"))
      .select(col("piece"), col("piece_id").cast("long").as("piece_id"),
        col("cnt").as("n_occurrences"), col("cost").as("cost_q9"))
    (vocab, seg, Seq(words, seed, model))
  }

  /** The BPE-vs-unigram shoot-out row pair: corpus-weighted fertility
    * (pieces per word instance) from each tokenizer's segmentation
    * table — the number that decides which tokenizer a token-budgeted
    * pipeline ships. Exact long totals, one output division. */
  def fertilityCompare(bpeSeg: DataFrame, uniSeg: DataFrame): DataFrame = {
    def one(name: String, seg: DataFrame): DataFrame =
      seg.agg(sum(col("freq")).as("tw"),
          sum(col("freq") * col("n_pieces")).as("tp"))
        .select(lit(name).as("tokenizer"),
          col("tw").cast("long").as("total_words"),
          col("tp").cast("long").as("total_pieces"),
          (col("tp").cast("double") / col("tw").cast("double"))
            .as("fertility"))
    one("bpe", bpeSeg).unionByName(one("unigram", uniSeg))
  }
}
