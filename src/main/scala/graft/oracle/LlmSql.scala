package graft.oracle

import graft.llm.{Dedup, Similarity, TextStats}

/** DuckDB oracles for the LLM-pipeline operators (mirror graft.llm.*).
  * All hash/band/bit lists are generated from the SAME constants as the
  * Spark side, and every floating-point fold is the same sequential
  * index-order reduction, so results are bit-identical.
  */
object LlmSql {

  /** Shared 60-bit md5 hash (mirror of Dedup.hex60). */
  private def hex60(x: String): String =
    s"cast(('0x' || substr(md5($x),1,15)) as bigint)"

  /** Words + 3-shingles CTEs (mirror Dedup.words / Dedup.shingles).
    * The whitespace class is written out (Dedup.WsClass) rather than
    * \s: Java \s and RE2 \s disagree on \x0B. */
  val textCtes: String =
    """doc_words as (
      |  select doc_id, text, n_chars,
      |    list_filter(string_split_regex(trim(text), '[ \t\n\r\f]+'), x -> x != '') as w
      |  from documents
      |),
      |doc_shingles as (
      |  select doc_id,
      |    unnest(case when len(w) >= 3
      |      then list_transform(generate_series(1, len(w) - 2),
      |             i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])
      |      else [] end) as sh
      |  from doc_words
      |)""".stripMargin

  val dedupExactQ: String =
    """select md5(text) as text_hash, count(*) as n_copies,
      |  min(doc_id) as canonical_doc_id
      |from documents group by 1""".stripMargin

  private val mhAggs = (0 until Dedup.MinhashBands)
    .map(b => s"min(${hex60(s"'$b|' || sh")}) as mh$b").mkString(",\n    ")
  private val mhSigs =
    s"""mh_sigs as (
       |  select doc_id,
       |    $mhAggs
       |  from doc_shingles group by 1
       |)""".stripMargin

  val minhashSignaturesQ: String =
    s"with $textCtes, $mhSigs select * from mh_sigs"

  // b×r banding (mirror Dedup.minhashPairs): 8 bands × 2 rows, bucket
  // key = hex60 of "mh2b|mh2b+1", buckets capped at MinhashBucketCap.
  private val mhBands = (0 until Dedup.MinhashPairBands)
    .map(b => s"select doc_id, $b as band, " +
      s"${hex60(s"cast(mh${2 * b} as varchar) || '|' || cast(mh${2 * b + 1} as varchar)")} as v from mh_sigs")
    .mkString("\nunion all\n")

  val minhashPairsQ: String =
    s"""with $textCtes, $mhSigs,
       |mh_bands as ($mhBands),
       |mh_ok as (select band, v from mh_bands group by 1, 2
       |          having count(*) <= ${Dedup.MinhashBucketCap}),
       |mh_capped as (select mb.* from mh_bands mb join mh_ok using (band, v))
       |select a.doc_id as doc_a, b.doc_id as doc_b, count(*) as n_shared_bands
       |from mh_capped a join mh_capped b
       |  on a.band = b.band and a.v = b.v and a.doc_id < b.doc_id
       |group by 1, 2""".stripMargin

  /** Mirror Dedup.editDistancePairs: the SAME minhash band-candidate
    * chain, verified by DuckDB's levenshtein (identical unit-cost DP
    * — exact integer, bit-identical; the length pre-bound is implied
    * by the distance filter and kept for shape parity). */
  val editDistancePairsQ: String =
    s"""select c.doc_a, c.doc_b, c.n_shared_bands,
       |  length(a.text) as len_a, length(b.text) as len_b,
       |  levenshtein(a.text, b.text) as edit_distance
       |from ($minhashPairsQ) c
       |join documents a on a.doc_id = c.doc_a
       |join documents b on b.doc_id = c.doc_b
       |where abs(length(a.text) - length(b.text)) <= ${Dedup.EditMaxDist}
       |  and levenshtein(a.text, b.text) <= ${Dedup.EditMaxDist}""".stripMargin

  private val shSums = (0 until Dedup.SimhashBits)
    .map(j => s"sum(case when (h >> $j) & 1 = 1 then 1 else -1 end) as s$j")
    .mkString(",\n    ")
  private val shSig = (0 until Dedup.SimhashBits)
    .map(j => s"(case when s$j > 0 then cast(${1L << j} as bigint) else cast(0 as bigint) end)")
    .mkString(" + ")

  val simhashSignaturesQ: String =
    s"""with $textCtes,
       |sim_words as (select doc_id, unnest(w) as word from doc_words),
       |sim_hashes as (select doc_id, ${hex60("word")} as h from sim_words),
       |sim_sums as (
       |  select doc_id,
       |    $shSums
       |  from sim_hashes group by 1
       |)
       |select doc_id, $shSig as simhash from sim_sums""".stripMargin

  // mirror Dedup.simhashPairs: 4 8-bit signature slices, capped
  // buckets, OR-probed candidates, exact Hamming via bit_count(xor).
  private val shBands = (0 until Dedup.SimhashPairBands)
    .map(b => s"select doc_id, simhash, $b as band, (simhash >> ${b * 8}) & 255 as v from sim_sig")
    .mkString("\nunion all\n")

  val simhashPairsQ: String =
    s"""with $textCtes,
       |sim_words as (select doc_id, unnest(w) as word from doc_words),
       |sim_hashes as (select doc_id, ${hex60("word")} as h from sim_words),
       |sim_sums as (
       |  select doc_id,
       |    $shSums
       |  from sim_hashes group by 1
       |),
       |sim_sig as (select doc_id, $shSig as simhash from sim_sums),
       |sh_bands as ($shBands),
       |sh_ok as (select band, v from sh_bands group by 1, 2
       |          having count(*) <= ${Dedup.SimhashBucketCap}),
       |sh_capped as (select sb.* from sh_bands sb join sh_ok using (band, v)),
       |sh_cand as (
       |  select distinct a.doc_id as doc_a, b.doc_id as doc_b,
       |    a.simhash as simhash_a, b.simhash as simhash_b
       |  from sh_capped a join sh_capped b
       |    on a.band = b.band and a.v = b.v and a.doc_id < b.doc_id
       |)
       |select doc_a, doc_b, simhash_a, simhash_b, hamming from (
       |  select *, cast(bit_count(xor(simhash_a, simhash_b)) as bigint) as hamming
       |  from sh_cand
       |) t where hamming <= ${Dedup.SimhashMaxHamming}""".stripMargin

  /** Mirror Dedup.substringDedup: positional shingles (paired unnests
    * zip), cross-doc duplicate keys, covered-position removal, ordered
    * rebuild. */
  val substringDedupQ: String =
    s"""with $textCtes,
       |sdd_ps as (
       |  select doc_id,
       |    unnest(generate_series(1, len(w) - 2)) as pos,
       |    unnest(list_transform(generate_series(1, len(w) - 2),
       |      i -> ${hex60("w[i] || ' ' || w[i+1] || ' ' || w[i+2]")})) as shk
       |  from doc_words where len(w) >= 3
       |),
       |sdd_dup as (select shk from sdd_ps group by 1 having count(distinct doc_id) > 1),
       |sdd_cov as (
       |  select distinct doc_id, cp from (
       |    select p.doc_id, unnest([p.pos, p.pos + 1, p.pos + 2]) as cp
       |    from sdd_ps p join sdd_dup using (shk)
       |  ) t
       |),
       |sdd_tok as (
       |  select doc_id, unnest(generate_series(1, len(w))) as pos, unnest(w) as tok
       |  from doc_words
       |),
       |sdd_kept as (
       |  select t.doc_id, count(*) as n_kept,
       |    string_agg(t.tok, ' ' order by t.pos) as cleaned_text
       |  from sdd_tok t
       |  where not exists (
       |    select 1 from sdd_cov c where c.doc_id = t.doc_id and c.cp = t.pos)
       |  group by 1
       |)
       |select dw.doc_id,
       |  cast(len(dw.w) as bigint) as n_tokens,
       |  cast(coalesce(k.n_kept, 0) as bigint) as n_kept,
       |  case when len(dw.w) > 0
       |    then cast(len(dw.w) - coalesce(k.n_kept, 0) as double)
       |      / cast(len(dw.w) as double)
       |    else 0.0 end as removed_frac,
       |  coalesce(k.cleaned_text, '') as cleaned_text
       |from doc_words dw left join sdd_kept k using (doc_id)""".stripMargin

  /** Mirror Dedup.sharedNgramStats over the same distinct shingle-key
    * construction. */
  val docSharedNgramsQ: String =
    s"""with $textCtes,
       |sng_sh as (select distinct doc_id, ${hex60("sh")} as shk from doc_shingles),
       |sng_df as (select shk, count(*) as sdf from sng_sh group by 1)
       |select doc_id,
       |  count(*) as n_shingles,
       |  count(case when sdf > 1 then 1 end) as n_shared,
       |  cast(count(case when sdf > 1 then 1 end) as double)
       |    / cast(count(*) as double) as shared_frac
       |from sng_sh join sng_df using (shk)
       |group by 1""".stripMargin

  val ngramJaccardPairsQ: String =
    s"""with $textCtes,
       |doc_sh as (select distinct doc_id, ${hex60("sh")} as shk from doc_shingles),
       |sh_sizes as (select doc_id, count(*) as n_sh from doc_sh group by 1),
       |rare_sh as (select shk from doc_sh group by shk
       |            having count(distinct doc_id) <= ${Dedup.JaccardDocFreqCap}),
       |blocked as (select d.doc_id, d.shk from doc_sh d join rare_sh using (shk)),
       |pairs0 as (
       |  select a.doc_id as doc_a, b.doc_id as doc_b, count(*) as n_shared
       |  from blocked a join blocked b on a.shk = b.shk and a.doc_id < b.doc_id
       |  group by 1, 2
       |  having count(*) >= ${Dedup.JaccardMinIntersection}
       |)
       |select doc_a, doc_b, n_shared, sa.n_sh as size_a, sb.n_sh as size_b,
       |  cast(n_shared as double) / cast(sa.n_sh + sb.n_sh - n_shared as double) as jaccard_est
       |from pairs0
       |join sh_sizes sa on pairs0.doc_a = sa.doc_id
       |join sh_sizes sb on pairs0.doc_b = sb.doc_id""".stripMargin

  /** Mirror Dedup.ngramContainmentPairs: the Jaccard pair stats
    * re-projected to the two directional containment ratios, filtered
    * on the larger one at the shared floor. */
  val ngramContainmentPairsQ: String =
    s"""select doc_a, doc_b, n_shared, size_a, size_b,
       |  cast(n_shared as double) / cast(size_a as double) as containment_a,
       |  cast(n_shared as double) / cast(size_b as double) as containment_b
       |from ($ngramJaccardPairsQ) t
       |where greatest(cast(n_shared as double) / cast(size_a as double),
       |               cast(n_shared as double) / cast(size_b as double))
       |      >= ${Dedup.ContainmentMin}""".stripMargin

  /** Mirror Dedup.lshRecallStats(ngram_jaccard_pairs, minhash_pairs):
    * the two pair queries as subqueries (both engines filter the truth
    * side at the SAME shared threshold), one summary row with
    * zero-guarded recall/precision. */
  val dedupLshRecallQ: String =
    s"""with truth as (
       |  select doc_a, doc_b from ($ngramJaccardPairsQ) t
       |  where jaccard_est >= ${Dedup.LshRecallThreshold}
       |),
       |cand as (select doc_a, doc_b from ($minhashPairsQ) m),
       |joined as (
       |  select case when c.doc_a is not null then 1 end as hit
       |  from truth t left join cand c
       |    on t.doc_a = c.doc_a and t.doc_b = c.doc_b
       |),
       |counts as (select count(*) as n_truth, count(hit) as n_hits from joined),
       |cc as (select count(*) as n_candidates from cand)
       |select n_truth, n_candidates, n_hits,
       |  case when n_truth > 0
       |    then cast(n_hits as double) / cast(n_truth as double)
       |    else cast(1.0 as double) end as recall,
       |  case when n_candidates > 0
       |    then cast(n_hits as double) / cast(n_candidates as double)
       |    else cast(1.0 as double) end as precision
       |from counts, cc""".stripMargin

  /** Sequential index-order dot product (mirror Similarity.dot). */
  private def dotSql(a: String, b: String): String =
    s"list_reduce(list_transform(generate_series(1, len($a)), i -> ($a[i]::double) * ($b[i]::double)), (acc, x) -> acc + x)"

  /** Brute-force cosine top-k with a possibly DIFFERENT query relation
    * (mirror Similarity.annCosineTopKAsym — PQ's ADC search); the
    * symmetric [[annCosineTopKOver]] is the corpus == queries case.
    * Shared by the raw, dequantized-int8, and PQ oracles so the search
    * arithmetic exists exactly once. */
  /** Just the scored-candidates CTEs (emb_norms / emb_ok /
    * ann_queries / ann_scored) — the asym search arithmetic without
    * the final top-k cut, so rerankers (MMR) can keep ranking the
    * same scores. */
  def annCosineScoredOver(corpusRel: String, queryRel: String): String =
    s"""emb_norms as (
       |  select vec_id, embedding, ${dotSql("embedding", "embedding")} as nrm
       |  from $corpusRel
       |),
       |emb_ok as (select * from emb_norms where nrm > 0),
       |ann_queries as (
       |  select vec_id as query_id, embedding as q_emb, nrm as q_nrm
       |  from (
       |    select vec_id, embedding, ${dotSql("embedding", "embedding")} as nrm
       |    from $queryRel
       |  ) t where nrm > 0 and vec_id < ${Similarity.NQueries}
       |),
       |ann_scored as (
       |  select q.query_id, e.vec_id as neighbor_id,
       |    ${dotSql("e.embedding", "q.q_emb")} / (sqrt(e.nrm) * sqrt(q.q_nrm)) as cosine
       |  from emb_ok e cross join ann_queries q
       |  where e.vec_id != q.query_id
       |)""".stripMargin

  def annCosineTopKAsymOver(corpusRel: String, queryRel: String): String =
    s"""${annCosineScoredOver(corpusRel, queryRel)}
       |select query_id, neighbor_id, rank, cosine from (
       |  select *, row_number() over (
       |    partition by query_id order by cosine desc nulls last, neighbor_id) as rank
       |  from ann_scored
       |) t where rank <= ${Similarity.TopK}""".stripMargin

  def annCosineTopKOver(rel: String): String = annCosineTopKAsymOver(rel, rel)

  val annCosineTopKQ: String = s"with ${annCosineTopKOver("embeddings")}"

  /** Mirror Similarity.mmrRerank: top-[[Similarity.MmrCandidates]]
    * candidates from the shared scored CTEs, within-group pairwise
    * cosines via the same list_reduce fold, then the greedy selection
    * unrolled [[Similarity.MmrK]] steps — each step anti-joins the
    * selected set, scores `(rel − max sim-to-selected) * 0.5`, and
    * picks by (score desc, neighbor_id). Every iterate is
    * `materialized` (the non-materialized form re-inlines the prior
    * selection exponentially — the k-core lesson). */
  private def mmrSelectQ(prelude: String, embOkRel: String): String = {
    val k = Similarity.MmrK
    val steps = (2 to k).map { i =>
      s"""score$i as materialized (
         |  select c.query_id, c.neighbor_id, c.rel,
         |    (c.rel - max(s.sim)) * 0.5 as mmr
         |  from mmr_cand c
         |  join mmr_sim s on s.query_id = c.query_id and s.ai = c.neighbor_id
         |  join sel${i - 1} p on p.query_id = s.query_id and p.neighbor_id = s.bi
         |  where not exists (select 1 from sel${i - 1} q
         |    where q.query_id = c.query_id and q.neighbor_id = c.neighbor_id)
         |  group by 1, 2, 3
         |),
         |pick$i as materialized (
         |  select query_id, neighbor_id, rel, $i as rank, mmr as mmr_score
         |  from (
         |    select *, row_number() over (partition by query_id
         |      order by mmr desc nulls last, neighbor_id) as rn from score$i
         |  ) t where rn = 1
         |),
         |sel$i as materialized (
         |  select * from sel${i - 1}
         |  union all
         |  select query_id, neighbor_id, rel, rank, mmr_score from pick$i
         |)""".stripMargin
    }.mkString(",\n")
    s"""with $prelude,
       |mmr_vec as materialized (
       |  select c.query_id, c.neighbor_id, c.rel, e.embedding, e.nrm
       |  from mmr_cand c join $embOkRel e on e.vec_id = c.neighbor_id
       |),
       |mmr_sim as materialized (
       |  select a.query_id, a.neighbor_id as ai, b.neighbor_id as bi,
       |    ${dotSql("a.embedding", "b.embedding")} / (sqrt(a.nrm) * sqrt(b.nrm)) as sim
       |  from mmr_vec a join mmr_vec b
       |    on a.query_id = b.query_id and a.neighbor_id != b.neighbor_id
       |),
       |sel1 as materialized (
       |  select query_id, neighbor_id, rel, 1 as rank, (rel - 0.0) * 0.5 as mmr_score
       |  from (
       |    select *, row_number() over (partition by query_id
       |      order by rel desc nulls last, neighbor_id) as rn from mmr_cand
       |  ) t where rn = 1
       |),
       |$steps
       |select query_id, cast(rank as int) as rank, neighbor_id,
       |  rel as relevance, mmr_score
       |from sel$k""".stripMargin
  }

  /** The exact-fed MMR candidate prelude: brute-force cosine top-N
    * from the shared scored CTEs (the recall baseline's arm). */
  private def mmrExactPrelude: String =
    s"""${annCosineScoredOver("embeddings", "embeddings")},
       |mmr_cand as materialized (
       |  select query_id, neighbor_id, cosine as rel from (
       |    select *, row_number() over (partition by query_id
       |      order by cosine desc nulls last, neighbor_id) as rnk
       |    from ann_scored
       |  ) t where rnk <= ${Similarity.MmrCandidates}
       |)""".stripMargin

  /** The INDEX-FED candidate prelude (mirror Models.mmrRerank): the
    * kmeans-IVF probe chain cut at rank ≤ MmrCandidates — the same
    * ivf_cand arithmetic the ann_ivf_kmeans_topk oracle gates, only
    * the cut depth differs. lazy: kmCtes initializes later in this
    * object (vals initialize in file order). */
  private lazy val mmrIndexPrelude: String =
    s"""$kmCtes,
       |${ivfProbeCtes(s"km_cent${graft.llm.Kmeans.Iters}")},
       |mmr_cand as materialized (
       |  select query_id, neighbor_id, cosine as rel from (
       |    select *, row_number() over (partition by query_id
       |      order by cosine desc nulls last, neighbor_id) as rnk
       |    from ivf_cand
       |  ) t where rnk <= ${Similarity.MmrCandidates}
       |)""".stripMargin

  /** Mirror Models.mmrRerank — the SERVED pipeline: greedy MMR over
    * index-probed candidates. */
  lazy val mmrRerankQ: String = mmrSelectQ(mmrIndexPrelude, "ivf_emb_ok")

  /** Mirror Models.mmrRecall: per-query selection recall of the
    * index-fed MMR against the exact-fed MMR — each arm is the full
    * MMR pipeline in its own subquery scope (independent WITH chains,
    * no CTE-name collision by construction). */
  lazy val mmrRecallQ: String =
    s"""select e.query_id,
       |  count(a.neighbor_id) as n_hits,
       |  cast(count(a.neighbor_id) as double) / cast(count(*) as double) as recall
       |from (select query_id, neighbor_id
       |      from (${mmrSelectQ(mmrExactPrelude, "emb_ok")}) t) e
       |left join (select query_id, neighbor_id from ($mmrRerankQ) t) a
       |  on e.query_id = a.query_id and e.neighbor_id = a.neighbor_id
       |group by 1""".stripMargin

  /** Mirror Similarity.annFilteredTopK: the asym search with the
    * per-query label predicate applied BEFORE the top-k rank. */
  val annFilteredTopKQ: String =
    s"""with embf_norms as (
       |  select vec_id, label, embedding, ${dotSql("embedding", "embedding")} as nrm
       |  from embeddings
       |),
       |embf_ok as (select * from embf_norms where nrm > 0),
       |annf_queries as (
       |  select vec_id as query_id, label as q_label, embedding as q_emb, nrm as q_nrm
       |  from embf_norms where nrm > 0 and vec_id < ${Similarity.NQueries}
       |),
       |annf_scored as (
       |  select q.query_id, e.vec_id as neighbor_id,
       |    ${dotSql("e.embedding", "q.q_emb")} / (sqrt(e.nrm) * sqrt(q.q_nrm)) as cosine
       |  from embf_ok e cross join annf_queries q
       |  where e.vec_id != q.query_id and e.label = q.q_label
       |)
       |select query_id, neighbor_id, rank, cosine from (
       |  select *, row_number() over (
       |    partition by query_id order by cosine desc nulls last, neighbor_id) as rank
       |  from annf_scored
       |) t where rank <= ${Similarity.TopK}""".stripMargin

  /** Mirror Similarity.annHardNegatives: the filtered search with the
    * label predicate INVERTED (wrong-label top cosines), same
    * (cosine desc, neighbor_id) total order, label carried through. */
  val annHardNegativesQ: String =
    s"""with hneg_norms as (
       |  select vec_id, label, embedding, ${dotSql("embedding", "embedding")} as nrm
       |  from embeddings
       |),
       |hneg_ok as (select * from hneg_norms where nrm > 0),
       |hneg_queries as (
       |  select vec_id as query_id, label as q_label, embedding as q_emb, nrm as q_nrm
       |  from hneg_norms where nrm > 0 and vec_id < ${Similarity.NQueries}
       |),
       |hneg_scored as (
       |  select q.query_id, e.vec_id as neighbor_id, e.label as neg_label,
       |    ${dotSql("e.embedding", "q.q_emb")} / (sqrt(e.nrm) * sqrt(q.q_nrm)) as cosine
       |  from hneg_ok e cross join hneg_queries q
       |  where e.vec_id != q.query_id and e.label != q.q_label
       |)
       |select query_id, neighbor_id, neg_label, rank, cosine from (
       |  select *, row_number() over (
       |    partition by query_id order by cosine desc nulls last, neighbor_id) as rank
       |  from hneg_scored
       |) t where rank <= ${Similarity.TopK}""".stripMargin

  /** Mirror Similarity.annMatryoshkaRecall: one union arm per MRL
    * prefix dim — the asym search over `embedding[1:d]` for both
    * corpus and queries, recalled against the full-dim exact top-k. */
  val annMatryoshkaRecallQ: String =
    Similarity.MrlDims.map { dim =>
      val truncQ =
        s"""with mrl_t as (
           |  select vec_id, embedding[1:$dim] as embedding from embeddings
           |),
           |${annCosineTopKAsymOver("mrl_t", "mrl_t")}""".stripMargin
      s"select $dim as mrl_dim, t.* from (\n${annRecallOver(truncQ)}\n) t"
    }.mkString("\nunion all\n")

  /** Mirror Quantize: max-abs scale, explicit half-up floor codes.
    * Shared CTE prefix for the quantization table and the dequantized
    * ANN oracle. */
  val quantCtes: String =
    s"""sq_scale as (
       |  select vec_id, embedding,
       |    cast(list_max(list_transform(embedding, x -> abs(x))) as double) as scale
       |  from embeddings
       |),
       |sq_q as (
       |  select vec_id, scale,
       |    list_transform(generate_series(1, len(embedding)),
       |      i -> cast(floor(embedding[i]::double * ${graft.llm.Quantize.QMax} / scale + 0.5) as int)) as qvec
       |  from sq_scale where scale > 0
       |)""".stripMargin

  // Exploded to one row per code (vec_id, pos, q, scale): the harness
  // sorts+hashes scalar columns only, so the array stays CTE-internal.
  // DuckDB's unnest is 1-based via generate_series; pos is 0-based to
  // match Spark's posexplode.
  val embeddingQuantizationQ: String =
    s"""with $quantCtes,
       |sq_pos as (
       |  select vec_id, scale, qvec,
       |    unnest(generate_series(1, len(qvec))) as i
       |  from sq_q
       |)
       |select vec_id, scale, i - 1 as pos, qvec[i] as q from sq_pos""".stripMargin

  /** Mirror Quantize.embeddingCorr: the same half-up-floor micro-unit
    * quantization, all moments exact int64 (DuckDB's checked bigint
    * multiply errors loudly on overflow where Spark would wrap — the
    * spec asserts the headroom), the same 4-op IEEE tree for r. The
    * pair products come from the position self-join; Spark builds
    * them row-locally — both reduce to identical (i, j, Σxy). */
  val embeddingCorrQ: String = {
    val q = graft.llm.Quantize.CorrQuant
    s"""with ec_q as (
       |  select vec_id, list_transform(embedding,
       |    x -> cast(floor(cast(x as double) * $q + 0.5) as bigint)) as q
       |  from embeddings
       |),
       |ec_x as materialized (
       |  select vec_id, i1 - 1 as i, q[i1] as qv from (
       |    select vec_id, q,
       |      cast(unnest(generate_series(1, len(q))) as int) as i1
       |    from ec_q) t
       |),
       |ec_d as (
       |  select i, cast(count(*) as bigint) as n, cast(sum(qv) as bigint) as s,
       |    cast(sum(qv * qv) as bigint) as ss
       |  from ec_x group by 1
       |),
       |ec_p as (
       |  select a.i as i, b.i as j, cast(sum(a.qv * b.qv) as bigint) as s_xy
       |  from ec_x a join ec_x b on a.vec_id = b.vec_id and a.i <= b.i
       |  group by 1, 2
       |)
       |select p.i as dim_i, p.j as dim_j, dx.n,
       |  dx.s as s_x, dy.s as s_y, dx.ss as s_xx, dy.ss as s_yy, p.s_xy,
       |  -- correlation terms in doubles (same widening as the engine:
       |  -- bigint n·Σxy overflows past ~3e9·maxq — the scale probe's
       |  -- finding); every cast/multiply/subtract correctly rounded
       |  case when (cast(dx.n as double) * cast(dx.ss as double)
       |             - cast(dx.s as double) * cast(dx.s as double)) > 0
       |        and (cast(dy.n as double) * cast(dy.ss as double)
       |             - cast(dy.s as double) * cast(dy.s as double)) > 0
       |    then (cast(dx.n as double) * cast(p.s_xy as double)
       |          - cast(dx.s as double) * cast(dy.s as double))
       |      / (sqrt(cast(dx.n as double) * cast(dx.ss as double)
       |              - cast(dx.s as double) * cast(dx.s as double))
       |         * sqrt(cast(dy.n as double) * cast(dy.ss as double)
       |                - cast(dy.s as double) * cast(dy.s as double)))
       |  end as pearson_r
       |from ec_p p join ec_d dx on p.i = dx.i join ec_d dy on p.j = dy.i""".stripMargin
  }

  /** Mirror Quantize.embeddingPca: the same quantized power
    * iteration, unrolled — hugeint stands in for Spark's
    * decimal(38,0) exact accumulators (identical digits through the
    * string-cast double route), every float op in the same order. */
  val embeddingPcaQ: String = {
    import graft.llm.Quantize.{CorrQuant, PcaDim, PcaRounds}
    val q = CorrQuant
    val q3 = CorrQuant * CorrQuant * CorrQuant // Scala double, E-notation
    val d = PcaDim
    val v0 = math.floor(CorrQuant / math.sqrt(PcaDim.toDouble) + 0.5).toLong
    val rounds = (1 to PcaRounds).map { r =>
      val p = r - 1
      s"""pca_s$r as materialized (
         |  select q, list_reduce(list_transform(generate_series(1, $d),
         |    j -> q[j] * v[j]), (a, x) -> a + x) as s
         |  from pca_q cross join pca_v$p
         |),
         |pca_a$r as materialized (
         |  select i1 as j,
         |    sum(cast(q[i1] as hugeint) * cast(s as hugeint)) as a
         |  from (select q, s, cast(unnest(generate_series(1, $d)) as int) as i1
         |        from pca_s$r) t
         |  group by 1
         |),
         |pca_w$r as materialized (
         |  select list_transform(generate_series(1, $d), j ->
         |      cast(bs.n as double) * cast(cast(aa.al[j] as varchar) as double)
         |      - cast(bs.b[j] as double)
         |        * cast(cast(sb.sb as varchar) as double)) as w,
         |    bs.n, bs.trace_q
         |  from (select list(a order by j) as al from pca_a$r) aa
         |  cross join pca_base bs
         |  cross join (
         |    select list_reduce(list_transform(generate_series(1, $d),
         |        j -> cast(b[j] as hugeint) * cast(v[j] as hugeint)),
         |      (a, x) -> a + x) as sb
         |    from pca_base cross join pca_v$p) sb
         |),
         |pca_n$r as materialized (
         |  select w, n, trace_q,
         |    sqrt(list_reduce(list_transform(w, x -> x * x),
         |      (a, x) -> a + x)) as norm_w,
         |    case when list_reduce(w, (a, x) ->
         |        case when abs(x) > abs(a) then x else a end) < 0
         |      then cast(-1 as double) else cast(1 as double) end as sgn
         |  from pca_w$r
         |),
         |pca_v$r as materialized (
         |  select list_transform(generate_series(1, $d), j ->
         |    cast(floor(sgn * w[j] / norm_w * $q + 0.5) as bigint)) as v
         |  from pca_n$r
         |)""".stripMargin
    }.mkString(",\n")
    s"""with pca_q as materialized (
       |  select list_transform(embedding,
       |    x -> cast(floor(cast(x as double) * $q + 0.5) as bigint)) as q
       |  from embeddings
       |),
       |pca_d as materialized (
       |  select i1 as i, cast(count(*) as bigint) as n,
       |    cast(sum(q[i1]) as bigint) as s,
       |    sum(cast(q[i1] as hugeint) * cast(q[i1] as hugeint)) as ss
       |  from (select q, cast(unnest(generate_series(1, $d)) as int) as i1
       |        from pca_q) t
       |  group by 1
       |),
       |pca_base as materialized (
       |  select (select max(n) from pca_d) as n,
       |    (select list(s order by i) from pca_d) as b,
       |    (select list_reduce(list(
       |        cast((select max(n) from pca_d) as double)
       |          * cast(cast(ss as varchar) as double)
       |        - cast(s as double) * cast(s as double) order by i),
       |      (a, x) -> a + x) from pca_d) as trace_q
       |),
       |pca_v0 as (select [${Seq.fill(d)(v0).mkString(", ")}] as v),
       |$rounds
       |select j - 1 as dim,
       |  sgn * w[j] / norm_w as loading,
       |  cast(floor(sgn * w[j] / norm_w * $q + 0.5) as bigint) as loading_q,
       |  norm_w / (cast(n as double) * cast(n as double) * $q3) as eigenvalue,
       |  norm_w / ($q * trace_q) as explained_share
       |from pca_n$PcaRounds
       |cross join (select cast(unnest(generate_series(1, $d)) as int) as j)""".stripMargin
  }

  /** Mirror Quantize.embeddingPcaTopK: the exact moment matrix (the
    * embeddingCorr sums, full-matrix mirrored from the upper
    * triangle), then per component an unrolled quantized power
    * iteration on the D-row matrix table and the Rayleigh-quotient
    * deflation — every fold index-ascending, every double expression
    * the same fixed tree as the engine's. */
  private val opqPcaCtes: String = {
    import graft.llm.Quantize.{CorrQuant, PcaDim, PcaRounds, PcaTopK}
    val q = CorrQuant
    val q2 = CorrQuant * CorrQuant
    val d = PcaDim
    val R = PcaRounds
    val v0 = math.floor(CorrQuant / math.sqrt(PcaDim.toDouble) + 0.5).toLong
    val matVec =
      s"""list_reduce(list_transform(generate_series(1, $d),
         |        j -> marr[j] * cast(v[j] as double)), (a, x) -> a + x)"""
        .stripMargin
    val comps = (0 until PcaTopK).map { c =>
      val rounds = (1 to R).map { r =>
        s"""opq_c${c}_w$r as materialized (
           |  select list(wi order by i) as w from (
           |    select i, $matVec as wi
           |    from opq_m$c cross join opq_c${c}_v${r - 1}) t
           |),
           |opq_c${c}_n$r as materialized (
           |  select w,
           |    sqrt(list_reduce(list_transform(w, x -> x * x),
           |      (a, x) -> a + x)) as norm_w,
           |    case when list_reduce(w, (a, x) ->
           |        case when abs(x) > abs(a) then x else a end) < 0
           |      then cast(-1 as double) else cast(1 as double) end as sgn
           |  from opq_c${c}_w$r
           |),
           |opq_c${c}_v$r as materialized (
           |  select list_transform(generate_series(1, $d), j ->
           |    cast(floor(sgn * w[j] / norm_w * $q + 0.5) as bigint)) as v
           |  from opq_c${c}_n$r
           |)""".stripMargin
      }.mkString(",\n")
      val defl =
        s"""opq_c${c}_u as materialized (
           |  select list(ui order by i) as u from (
           |    select i, $matVec as ui
           |    from opq_m$c cross join opq_c${c}_v$R) t
           |),
           |opq_c${c}_d as materialized (
           |  select v, vmv, s2, vmv / cast(s2 as double) as lam from (
           |    select vv.v as v,
           |      list_reduce(list_transform(generate_series(1, $d),
           |        j -> uu.u[j] * cast(vv.v[j] as double)),
           |        (a, x) -> a + x) as vmv,
           |      list_reduce(list_transform(vv.v, y -> y * y),
           |        (a, x) -> a + x) as s2
           |    from opq_c${c}_u uu cross join opq_c${c}_v$R vv) t
           |)""".stripMargin
      val nextM =
        if (c == PcaTopK - 1) ""
        else
          s""",
             |opq_m${c + 1} as materialized (
             |  select i, list_transform(generate_series(1, $d), j ->
             |      marr[j] - lam * cast(v[i + 1] as double)
             |                  * cast(v[j] as double)
             |                  / cast(s2 as double)) as marr
             |  from opq_m$c cross join opq_c${c}_d
             |)""".stripMargin
      s"""opq_c${c}_v0 as (select [${Seq.fill(d)(v0).mkString(", ")}] as v),
         |$rounds,
         |$defl$nextM""".stripMargin
    }.mkString(",\n")
    val arms = (0 until PcaTopK).map { c =>
      s"""select $c as component, j - 1 as dim,
         |  sgn * w[j] / norm_w as loading,
         |  cast(floor(sgn * w[j] / norm_w * $q + 0.5) as bigint) as loading_q,
         |  lam / (cast(n as double) * cast(n as double) * $q2) as eigenvalue,
         |  lam / trace_m as explained_share
         |from opq_c${c}_n$R cross join opq_c${c}_d cross join opq_tr
         |cross join (select cast(unnest(generate_series(1, $d)) as int) as j)"""
        .stripMargin
    }.mkString("\nunion all\n")
    s"""opq_q as (
       |  select vec_id, list_transform(embedding,
       |    x -> cast(floor(cast(x as double) * $q + 0.5) as bigint)) as q
       |  from embeddings
       |),
       |opq_x as materialized (
       |  select vec_id, i1 - 1 as i, q[i1] as qv from (
       |    select vec_id, q,
       |      cast(unnest(generate_series(1, len(q))) as int) as i1
       |    from opq_q) t
       |),
       |opq_d as materialized (
       |  select i, cast(count(*) as bigint) as n, cast(sum(qv) as bigint) as s
       |  from opq_x group by 1
       |),
       |opq_p as (
       |  select a.i as i, b.i as j, cast(sum(a.qv * b.qv) as bigint) as s_xy
       |  from opq_x a join opq_x b on a.vec_id = b.vec_id and a.i <= b.i
       |  group by 1, 2
       |),
       |opq_m0 as materialized (
       |  select i, list(m order by j) as marr from (
       |    select p.i as i, p.j as j,
       |      cast(dx.n as double) * cast(p.s_xy as double)
       |        - cast(dx.s as double) * cast(dy.s as double) as m
       |    from opq_p p join opq_d dx on p.i = dx.i join opq_d dy on p.j = dy.i
       |    union all
       |    select p.j, p.i,
       |      cast(dx.n as double) * cast(p.s_xy as double)
       |        - cast(dx.s as double) * cast(dy.s as double)
       |    from opq_p p join opq_d dx on p.i = dx.i join opq_d dy on p.j = dy.i
       |    where p.i <> p.j
       |  ) t group by 1
       |),
       |opq_tr as materialized (
       |  select (select max(n) from opq_d) as n,
       |    (select list_reduce(list(mii order by i), (a, x) -> a + x) from
       |      (select i, marr[i + 1] as mii from opq_m0) t) as trace_m
       |),
       |$comps,
       |opq_pca as (
       |$arms
       |)""".stripMargin
  }

  val embeddingPcaTopKQ: String =
    s"""with $opqPcaCtes
       |select component, dim, loading, loading_q, eigenvalue,
       |  explained_share
       |from opq_pca""".stripMargin

  /** PCA projection + the parameterized PQ chain over it (mirror
    * Models.annOpqTopK): the rotated corpus at PcaTopK dims, the SAME
    * unrolled-Lloyd codebooks per 4-dim subspace, codes,
    * reconstruction, and the shared symmetric cosine top-k. */
  private def pqCtesGen(pfx: String, src: String, subSpaces: Int,
                        subDim: Int): String = {
    import graft.llm.Kmeans
    val subs = (0 until subSpaces).map { s =>
      val lo = s * subDim + 1
      val hi = (s + 1) * subDim
      s"""$pfx${s}_sub as materialized (
         |  select vec_id, list_slice(embedding, $lo, $hi) as embedding from $src
         |),
         |${kmCtesOver(s"$pfx$s", s"$pfx${s}_sub")}""".stripMargin
    }.mkString(",\n")
    val fins = (0 until subSpaces).map { s =>
      s"""$pfx${s}_fin as materialized (
         |  select vec_id, centroid_id as code from (
         |    select e.vec_id, c.centroid_id,
         |      row_number() over (partition by e.vec_id order by
         |        (${dotSql("e.embedding", "e.embedding")}
         |          - 2.0 * ${dotSql("e.embedding", "c.centroid")}
         |          + ${dotSql("c.centroid", "c.centroid")}) asc nulls last,
         |        c.centroid_id) as rn
         |    from $pfx${s}_sub e cross join $pfx${s}_cent${Kmeans.Iters} c
         |  ) t where rn = 1
         |)""".stripMargin
    }.mkString(",\n")
    val codesUnion = (0 until subSpaces)
      .map(s => s"select vec_id, $s as subspace, code from $pfx${s}_fin")
      .mkString(" union all ")
    val centsUnion = (0 until subSpaces)
      .map(s => s"select $s as subspace, centroid_id, centroid from $pfx${s}_cent${Kmeans.Iters}")
      .mkString(" union all ")
    s"""$subs,
       |$fins,
       |${pfx}_codes as ($codesUnion),
       |${pfx}_cents as ($centsUnion),
       |${pfx}_rec as (
       |  select j.vec_id, flatten(list(c.centroid order by c.subspace)) as embedding
       |  from ${pfx}_codes j
       |  join ${pfx}_cents c on j.subspace = c.subspace and j.code = c.centroid_id
       |  group by j.vec_id
       |)""".stripMargin
  }

  private val opqProjCtes: String = {
    import graft.llm.Quantize.{CorrQuant, PcaDim}
    s"""opq_rot as materialized (
       |  select list(lv order by component) as rot from (
       |    select component, list(loading_q order by dim) as lv
       |    from opq_pca group by 1) t
       |),
       |opq_proj as materialized (
       |  select vec_id, list_transform(rot, lv ->
       |    cast(list_reduce(list_transform(generate_series(1, $PcaDim),
       |        i -> cast(lv[i] as double) * cast(embedding[i] as double)),
       |      (a, x) -> a + x) / $CorrQuant as float)) as embedding
       |  from embeddings cross join opq_rot
       |)""".stripMargin
  }

  val annOpqTopKQ: String = {
    import graft.llm.{PQ, Quantize}
    s"""with $opqPcaCtes,
       |$opqProjCtes,
       |${pqCtesGen("oq", "opq_proj", PQ.SubSpaces, Quantize.PcaTopK / PQ.SubSpaces)},
       |${annCosineTopKOver("oq_rec")}""".stripMargin
  }

  val annSq8TopKQ: String =
    s"""with $quantCtes,
       |sq_rec as (
       |  select vec_id,
       |    list_transform(qvec, q -> cast(q::double * scale / ${graft.llm.Quantize.QMax} as float)) as embedding
       |  from sq_q
       |),
       |${annCosineTopKOver("sq_rec")}""".stripMargin

  private def projSql(k: Int): String =
    s"list_reduce(list_transform(generate_series(1, len(embedding)), " +
      s"i -> (case when (i * 2654435761 + ${k.toLong * 40503L}) % 97 < 48 then -1.0 else 1.0 end) * (embedding[i]::double)), (a, x) -> a + x)"

  private val lshProjs = (0 until Similarity.LshBits)
    .map(k => s"${projSql(k)} as p$k").mkString(",\n    ")
  private val lshBucket = (0 until Similarity.LshBits)
    .map(k => s"(case when p$k > 0 then cast(${1L << k} as bigint) else cast(0 as bigint) end)")
    .mkString(" + ")

  val annLshBucketsQ: String =
    s"""with lsh_proj as (
       |  select vec_id,
       |    $lshProjs
       |  from embeddings
       |),
       |lsh_buckets as (select vec_id, $lshBucket as bucket from lsh_proj)
       |select vec_id, bucket, count(*) over (partition by bucket) as bucket_size
       |from lsh_buckets""".stripMargin

  /** The IVF probe chain (mirror Similarity.ivfProbe), independent of
    * the coarse quantizer: `centName` is any CTE yielding (centroid_id,
    * centroid). Shared by the label-mean and kmeans-trained oracles so
    * the probe arithmetic exists exactly once. */
  /** `scoreRel`: when set, candidates are scored against this
    * relation's vectors (matched by vec_id) instead of the assignment
    * corpus — the IVF+PQ oracle passes `pq_rec` (mirror of
    * Similarity.ivfProbe's scoringCorpus). */
  private def ivfProbeCtes(centName: String, scoreRel: Option[String] = None): String = {
    val scoreCte = scoreRel.fold("") { r =>
      s"""ivf_score as (
         |  select vec_id, embedding, ${dotSql("embedding", "embedding")} as nrm
         |  from $r
         |),
         |""".stripMargin
    }
    val candCte = scoreRel match {
      case None =>
        s"""ivf_cand as (
           |  select q.query_id, a.vec_id as neighbor_id, a.centroid_id,
           |    ${dotSql("a.embedding", "q.q_emb")} / (sqrt(a.nrm) * sqrt(q.q_nrm)) as cosine
           |  from ivf_assign a
           |  join ivf_probe p on a.centroid_id = p.q_centroid
           |  join ivf_q q on p.query_id = q.query_id and a.vec_id != q.query_id
           |)""".stripMargin
      case Some(_) =>
        s"""ivf_cand as (
           |  select q.query_id, a.vec_id as neighbor_id, a.centroid_id,
           |    ${dotSql("s.embedding", "q.q_emb")} / (sqrt(s.nrm) * sqrt(q.q_nrm)) as cosine
           |  from ivf_assign a
           |  join ivf_score s on s.vec_id = a.vec_id and s.nrm > 0
           |  join ivf_probe p on a.centroid_id = p.q_centroid
           |  join ivf_q q on p.query_id = q.query_id and a.vec_id != q.query_id
           |)""".stripMargin
    }
    s"""ivf_cent_n as (
       |  select centroid_id, centroid, ${dotSql("centroid", "centroid")} as cnrm from $centName
       |),
       |ivf_emb as (
       |  select vec_id, embedding, ${dotSql("embedding", "embedding")} as nrm
       |  from embeddings
       |),
       |ivf_emb_ok as (select * from ivf_emb where nrm > 0),
       |ivf_assign0 as (
       |  select e.vec_id, e.embedding, e.nrm, c.centroid_id,
       |    ${dotSql("e.embedding", "c.centroid")} / (sqrt(e.nrm) * sqrt(c.cnrm)) as sim
       |  from ivf_emb_ok e cross join ivf_cent_n c
       |),
       |ivf_ranked as (
       |  select *, row_number() over (
       |    partition by vec_id order by sim desc nulls last, centroid_id) as rn
       |  from ivf_assign0
       |),
       |ivf_assign as (
       |  select vec_id, embedding, nrm, centroid_id from ivf_ranked where rn = 1
       |),
       |ivf_probe as (
       |  select vec_id as query_id, centroid_id as q_centroid
       |  from ivf_ranked
       |  where vec_id < ${Similarity.NQueries} and rn <= ${Similarity.IvfNProbe}
       |),
       |ivf_q as (
       |  select vec_id as query_id, embedding as q_emb, nrm as q_nrm
       |  from ivf_assign where vec_id < ${Similarity.NQueries}
       |),
       |$scoreCte$candCte""".stripMargin
  }

  private val ivfSelect: String =
    s"""select query_id, neighbor_id, centroid_id, rank, cosine from (
       |  select *, row_number() over (
       |    partition by query_id order by cosine desc nulls last, neighbor_id) as rank
       |  from ivf_cand
       |) t where rank <= ${Similarity.TopK}""".stripMargin

  /** IVF oracle (mirror Similarity.annIvfTopK): exact-mean centroids,
    * nearest-centroid assignment, bucket-local multi-probe (queries
    * search their top-IvfNProbe centroids' lists). Paired unnests in
    * one select zip positionally in DuckDB, giving (idx, component)
    * rows like Spark's posexplode. */
  val annIvfTopKQ: String =
    s"""with ivf_comp as (
       |  select label,
       |    unnest(generate_series(0, len(embedding) - 1)) as idx,
       |    unnest(list_transform(generate_series(1, len(embedding)), j -> embedding[j]::double)) as v
       |  from embeddings
       |),
       |ivf_cent0 as (
       |  select label as centroid_id, idx,
       |    cast(cast(sum(cast(v as decimal(27,12))) as varchar) as double) / cast(count(*) as double) as c
       |  from ivf_comp group by 1, 2
       |),
       |ivf_cent as (
       |  select centroid_id, list(cast(c as float) order by idx) as centroid
       |  from ivf_cent0 group by 1
       |),
       |${ivfProbeCtes("ivf_cent")}
       |$ivfSelect""".stripMargin

  // mirror Similarity.embeddingDedupPairs: 4 bands × 8 hyperplane bits,
  // per-band bucket cap, OR-probed candidates de-duplicated, exact
  // cosine at the threshold.
  private val ndNProj = Similarity.NearDupBands * Similarity.NearDupBandBits

  private def ndBandSql(b: Int): String =
    (0 until Similarity.NearDupBandBits).map { j =>
      val k = b * Similarity.NearDupBandBits + j
      s"(case when p$k > 0 then cast(${1L << j} as bigint) else cast(0 as bigint) end)"
    }.mkString(" + ")

  private val ndBands = (0 until Similarity.NearDupBands)
    .map(b => s"select vec_id, $b as band, ${ndBandSql(b)} as bkt from nd_proj where nrm > 0")
    .mkString("\nunion all\n")

  val embeddingDedupPairsQ: String =
    s"""with nd_proj as (
       |  select vec_id, embedding, ${dotSql("embedding", "embedding")} as nrm,
       |    ${(0 until ndNProj).map(k => s"${projSql(k)} as p$k").mkString(",\n    ")}
       |  from embeddings
       |),
       |nd_base as (select vec_id, embedding, nrm from nd_proj where nrm > 0),
       |nd_bands as ($ndBands),
       |nd_ok as (select band, bkt from nd_bands group by 1, 2
       |          having count(*) <= ${Similarity.NearDupBucketCap}),
       |nd_capped as (select nb.* from nd_bands nb join nd_ok using (band, bkt)),
       |nd_cand as (
       |  select distinct x.vec_id as vec_a, y.vec_id as vec_b
       |  from nd_capped x join nd_capped y
       |    on x.band = y.band and x.bkt = y.bkt and x.vec_id < y.vec_id
       |)
       |select vec_a, vec_b, cosine from (
       |  select c.vec_a, c.vec_b,
       |    ${dotSql("a.embedding", "b.embedding")} / (sqrt(a.nrm) * sqrt(b.nrm)) as cosine
       |  from nd_cand c
       |  join nd_base a on c.vec_a = a.vec_id
       |  join nd_base b on c.vec_b = b.vec_id
       |) t where cosine >= ${Similarity.NearDupCosine}""".stripMargin

  private def hits(vals: Seq[String]): String =
    s"len(list_filter(w, x -> x in (${vals.map(v => s"'$v'").mkString(", ")})))"

  /** Shared HRW fan-out: every (doc, shard) weight under K shards,
    * argmax by (h desc, shard) — mirror operators/Sharding. */
  private def hrwAssign(k: Int, name: String): String =
    s"""${name}_f as (
       |  select doc_id, s.shard,
       |    ${hex60(s"cast(doc_id as varchar) || ':' || cast(s.shard as varchar)")} as h
       |  from documents
       |  cross join (select unnest(generate_series(0, ${k - 1})) as shard) s
       |),
       |$name as (
       |  select doc_id, shard from (
       |    select doc_id, shard,
       |      row_number() over (partition by doc_id order by h desc, shard) as rn
       |    from ${name}_f) t
       |  where rn = 1
       |)""".stripMargin

  /** Mirror Sharding.shardRouting: exact per-shard loads + the two
    * single-division ratios. */
  val shardRoutingQ: String = {
    import graft.operators.Sharding.NumShards
    s"""with ${hrwAssign(NumShards, "sh_a")},
       |sh_t as (select count(*) as total_docs from sh_a),
       |sh_g as (
       |  select shard, count(*) as n_docs, max(total_docs) as total_docs
       |  from sh_a cross join sh_t group by shard
       |)
       |select shard, n_docs, total_docs,
       |  cast(n_docs as double) / cast(total_docs as double) as share,
       |  cast(n_docs * $NumShards as double) / cast(total_docs as double) as skew
       |from sh_g""".stripMargin
  }

  /** Mirror Sharding.shardStability: both assignments side by side,
    * the same exact moved/on-removed counts and the boolean verdict. */
  val shardStabilityQ: String = {
    import graft.operators.Sharding.NumShards
    s"""with ${hrwAssign(NumShards, "sh_full")},
       |${hrwAssign(NumShards - 1, "sh_red")},
       |sh_j as (
       |  select f.doc_id, f.shard, r.shard as shard_reduced
       |  from sh_full f join sh_red r on f.doc_id = r.doc_id
       |),
       |sh_s as (
       |  select count(*) as n_total,
       |    count(case when shard = ${NumShards - 1} then 1 end) as n_on_removed,
       |    count(case when shard <> shard_reduced then 1 end) as n_moved,
       |    count(case when shard <> shard_reduced
       |      and shard <> ${NumShards - 1} then 1 end) as n_moved_unnecessarily
       |  from sh_j
       |)
       |select n_total, n_on_removed, n_moved, n_moved_unnecessarily,
       |  n_moved = n_on_removed and n_moved_unnecessarily = 0 as minimal_motion
       |from sh_s""".stripMargin
  }

  /** Mirror TextStats.readability: same tokenization, same clamped
    * regex counts, exact-int syllable fold, the identical
    * left-associative literal-coefficient chains (dlit-pinned). */
  val readabilityQ: String = {
    val c = (v: Double) => Sql.dlit(v)
    s"""with $textCtes,
       |rd1 as (
       |  select doc_id, text, w, cast(len(w) as bigint) as n_words
       |  from doc_words where len(w) > 0
       |),
       |rd2 as (
       |  select doc_id, n_words,
       |    greatest(cast(1 as bigint),
       |      cast(len(regexp_extract_all(text, '[.!?]+')) as bigint)) as n_sentences,
       |    list_reduce(list_prepend(cast(0 as bigint),
       |      list_transform(w, x -> greatest(cast(1 as bigint),
       |        cast(len(regexp_extract_all(x, '[aeiouyAEIOUY]+')) as bigint)))),
       |      (acc, y) -> acc + y) as n_syllables
       |  from rd1
       |),
       |rd3 as (
       |  select doc_id, n_words, n_sentences, n_syllables,
       |    cast(n_words as double) / cast(n_sentences as double) as words_per_sentence,
       |    cast(n_syllables as double) / cast(n_words as double) as syllables_per_word
       |  from rd2
       |)
       |select doc_id, n_words, n_sentences, n_syllables,
       |  words_per_sentence, syllables_per_word,
       |  ${c(206.835)} - ${c(1.015)} * words_per_sentence
       |    - ${c(84.6)} * syllables_per_word as flesch,
       |  ${c(0.39)} * words_per_sentence + ${c(11.8)} * syllables_per_word
       |    - ${c(15.59)} as fk_grade
       |from rd3""".stripMargin
  }

  val textStatsQ: String = {
    val stop = hits(TextStats.Stopwords)
    val p = TextStats.FingerprintMod
    s"""with $textCtes,
       |ts1 as (
       |  select doc_id, text, n_chars, w,
       |    len(w) as n_words,
       |    $stop as stop_hits,
       |    len(text) - len(regexp_replace(text, '[0-9]', '', 'g')) as digit_count,
       |    len(text) - len(regexp_replace(text, '[.,;:!?]', '', 'g')) as punct_count,
       |    ${hits(Seq("the", "and", "of"))} as en_hits,
       |    ${hits(Seq("le", "la", "et"))} as fr_hits,
       |    ${hits(Seq("der", "und", "die"))} as de_hits,
       |    ${hits(Seq("el", "los", "y"))} as es_hits
       |  from doc_words
       |),
       |ts2 as (
       |  select doc_id, text, n_chars, w, n_words,
       |    case when n_words > 0 then cast(stop_hits as double) / cast(n_words as double) else 0.0 end as stopword_ratio,
       |    case when len(text) > 0 then cast(digit_count as double) / cast(len(text) as double) else 0.0 end as digit_ratio,
       |    case when len(text) > 0 then cast(punct_count as double) / cast(len(text) as double) else 0.0 end as punct_ratio,
       |    case when en_hits >= fr_hits and en_hits >= de_hits and en_hits >= es_hits and en_hits > 0 then 'en'
       |         when fr_hits >= de_hits and fr_hits >= es_hits and fr_hits > 0 then 'fr'
       |         when de_hits >= es_hits and de_hits > 0 then 'de'
       |         when es_hits > 0 then 'es'
       |         else 'other' end as predicted_lang
       |  from ts1
       |)
       |select doc_id,
       |  cast(n_words as bigint) as n_words,
       |  ${TextStats.nTokensEstSql("n_chars")} as n_tokens_est,
       |  cast(len(regexp_extract_all(text, '${TextStats.BpeTokenRegex}')) as bigint) as n_tokens_bpe,
       |  case when n_words > 0 then cast(len(array_to_string(w, '')) as double) / cast(n_words as double) else 0.0 end as avg_word_len,
       |  stopword_ratio, digit_ratio, punct_ratio,
       |  0.3 * least(1.0, cast(n_words as double) / 100.0) + 0.4 * stopword_ratio + 0.3 * (1.0 - digit_ratio) as quality_score,
       |  predicted_lang,
       |  case when n_words > 0
       |    then list_reduce(list_transform(w, x -> ${hex60("x")} % $p), (acc, h) -> (acc * 31 + h) % $p)
       |    else cast(0 as bigint) end as fingerprint
       |from ts2""".stripMargin
  }

  /** Mirror TextStats.gopherRules: same whitespace tokens, same line
    * split (non-empty after trim), every rule the identical
    * cross-multiplied integer comparison — no float crosses the gate. */
  val gopherRulesQ: String = {
    val stop = hits(TextStats.Stopwords)
    s"""with $textCtes,
       |gl as (
       |  select doc_id,
       |    cast(len(w) as bigint) as n_words,
       |    cast(len(array_to_string(w, '')) as bigint) as n_word_chars,
       |    cast(len(regexp_extract_all(text, '#|\\.\\.\\.')) as bigint) as n_symbols,
       |    list_filter(string_split(text, chr(10)), x -> trim(x) != '') as ls,
       |    cast(len(list_filter(w, x -> regexp_matches(x, '[A-Za-z]'))) as bigint) as n_alpha_words,
       |    cast($stop as bigint) as n_stop_hits
       |  from doc_words
       |),
       |g2 as (
       |  select doc_id, n_words, n_word_chars, n_symbols,
       |    cast(len(ls) as bigint) as n_lines,
       |    cast(len(list_filter(ls, x -> starts_with(trim(x), '- ')
       |      or starts_with(trim(x), '* ')
       |      or starts_with(trim(x), '•'))) as bigint) as n_bullet_lines,
       |    cast(len(list_filter(ls, x -> ends_with(trim(x), '...')
       |      or ends_with(trim(x), '…'))) as bigint) as n_ellipsis_lines,
       |    n_alpha_words, n_stop_hits
       |  from gl
       |)
       |select doc_id, n_words, n_word_chars, n_symbols, n_lines,
       |  n_bullet_lines, n_ellipsis_lines, n_alpha_words, n_stop_hits,
       |  (n_words >= ${TextStats.GopherMinWords} and n_words <= ${TextStats.GopherMaxWords}) as r_word_count,
       |  (n_word_chars >= 3 * n_words and n_word_chars <= 10 * n_words) as r_word_len,
       |  (n_symbols * 10 < n_words) as r_symbol_ratio,
       |  (n_bullet_lines * 10 < n_lines * 9) as r_bullet_lines,
       |  (n_ellipsis_lines * 10 < n_lines * 3) as r_ellipsis_lines,
       |  (n_alpha_words * 10 > n_words * 8) as r_alpha_words,
       |  (n_stop_hits >= 2) as r_stopwords,
       |  ((n_words >= ${TextStats.GopherMinWords} and n_words <= ${TextStats.GopherMaxWords})
       |    and (n_word_chars >= 3 * n_words and n_word_chars <= 10 * n_words)
       |    and (n_symbols * 10 < n_words)
       |    and (n_bullet_lines * 10 < n_lines * 9)
       |    and (n_ellipsis_lines * 10 < n_lines * 3)
       |    and (n_alpha_words * 10 > n_words * 8)
       |    and (n_stop_hits >= 2)) as keep
       |from g2""".stripMargin
  }

  /** Mirror TextStats.collocationLift: same bigram/unigram integer
    * counts, the identical fully-IEEE lift chain (two multiplications,
    * one division, one half-away round — no ln), same
    * (lift desc, w1, w2) top-K order. */
  val collocationLiftQ: String =
    s"""with $textCtes,
       |cuni as materialized (
       |  select term, cast(count(*) as bigint) as c
       |  from (select unnest(w) as term from doc_words) t group by 1
       |),
       |ctot as (select cast(sum(c) as bigint) as n_tokens from cuni),
       |cbi as (
       |  select unnest(generate_series(1, len(w) - 1)) as i, w
       |  from doc_words where len(w) >= 2
       |),
       |cbc as (
       |  select w[i] as w1, w[i+1] as w2, cast(count(*) as bigint) as c_xy
       |  from cbi group by 1, 2 having count(*) >= ${TextStats.CollocMinCount}
       |)
       |select w1, w2, c_xy, x.c as c_x, y.c as c_y,
       |  cast(round(cast(c_xy as double) * cast(n_tokens as double) * 1000000.0
       |    / (cast(x.c as double) * cast(y.c as double))) as bigint) as lift_micro
       |from cbc join cuni x on cbc.w1 = x.term
       |join cuni y on cbc.w2 = y.term, ctot
       |order by lift_micro desc, w1, w2
       |limit ${TextStats.CollocTopK}""".stripMargin

  /** Mirror Winnow: the same 0-based k-gram positions and
    * md5-prefix60 hashes, the same window explosion (each position
    * into every start covering it, starts 0..max(n−Window,0)), the
    * same min(hash)-then-min(pos) winner, deduplicated. Iterate CTEs
    * referenced twice are `as materialized`. */
  private val winnowCtes: String = {
    import graft.llm.Winnow.{Window => W}
    s"""wkg as materialized (
       |  select doc_id, i - 1 as pos,
       |    ${hex60("w[i] || ' ' || w[i+1] || ' ' || w[i+2]")} as h
       |  from (select doc_id, w, unnest(generate_series(1, len(w) - 2)) as i
       |        from doc_words where len(w) >= 3) t
       |),
       |wn as (select doc_id, max(pos) as max_pos from wkg group by 1),
       |wrows as materialized (
       |  select k.doc_id, k.pos, k.h,
       |    unnest(generate_series(
       |      greatest(k.pos - ${W - 1}, 0),
       |      least(k.pos, greatest(n.max_pos - ${W - 1}, 0)))) as s
       |  from wkg k join wn n using (doc_id)
       |),
       |wmin as materialized (select doc_id, s, min(h) as m from wrows group by 1, 2),
       |wsel as (
       |  select r.doc_id, m.s, min(r.pos) as pos, min(m.m) as fp
       |  from wrows r join wmin m on r.doc_id = m.doc_id and r.s = m.s and r.h = m.m
       |  group by 1, 2
       |),
       |wfps as (select distinct doc_id, pos, fp from wsel)""".stripMargin
  }

  val winnowFingerprintsQ: String =
    s"""with $textCtes,
       |$winnowCtes
       |select doc_id, pos, fp from wfps""".stripMargin

  /** Mirror Winnow.sharedDocs: the same fingerprint-keyed bucket join
    * with the same cap and the same pair threshold. */
  val winnowSharedDocsQ: String = {
    import graft.llm.Winnow.{BucketCap, MinShared}
    s"""with $textCtes,
       |$winnowCtes,
       |wby as materialized (select distinct doc_id, fp from wfps),
       |wok as (select fp from wby group by 1 having count(*) <= $BucketCap),
       |wcap as materialized (select wby.* from wby join wok using (fp))
       |select a.doc_id as doc_a, b.doc_id as doc_b,
       |  cast(count(*) as bigint) as n_shared_fps
       |from wcap a join wcap b on a.fp = b.fp and a.doc_id < b.doc_id
       |group by 1, 2 having count(*) >= $MinShared""".stripMargin
  }

  /** Mirror Models.winnowRecall: winnowing candidates priced against
    * the exact containment truth pairs — the dedupLshRecall shape. */
  val winnowRecallQ: String =
    s"""with truth as (
       |  select doc_a, doc_b from ($ngramContainmentPairsQ) t
       |),
       |cand as (select doc_a, doc_b from ($winnowSharedDocsQ) w),
       |joined as (
       |  select case when c.doc_a is not null then 1 end as hit
       |  from truth t left join cand c
       |    on t.doc_a = c.doc_a and t.doc_b = c.doc_b
       |),
       |counts as (select count(*) as n_truth, count(hit) as n_hits from joined),
       |cc as (select count(*) as n_candidates from cand)
       |select n_truth, n_candidates, n_hits,
       |  case when n_truth > 0
       |    then cast(n_hits as double) / cast(n_truth as double)
       |    else cast(1.0 as double) end as recall,
       |  case when n_candidates > 0
       |    then cast(n_hits as double) / cast(n_candidates as double)
       |    else cast(1.0 as double) end as precision
       |from counts, cc""".stripMargin

  /** Mirror Dedup.batchNovelty: the same per-doc DISTINCT shingles,
    * the same standing/new doc_id%5 split, raw shingle-string
    * equality on both sides. */
  val batchNoveltyQ: String =
    s"""with $textCtes,
       |bn_d as (select distinct doc_id, sh from doc_shingles),
       |bn_standing as (select distinct sh from bn_d where doc_id % 5 != 0)
       |select n.doc_id, count(*) as n_shingles,
       |  count(case when s.sh is null then 1 end) as n_novel,
       |  cast(count(case when s.sh is null then 1 end) as double)
       |    / cast(count(*) as double) as novelty
       |from (select * from bn_d where doc_id % 5 = 0) n
       |left join bn_standing s on n.sh = s.sh
       |group by 1""".stripMargin

  /** Mirror Selection.mooreLewis: the same two Laplace-smoothed
    * unigram LMs (in-domain = one source slice, general = the whole
    * corpus), each term's nll the identical quantized-ln recipe, the
    * selection predicate on EXACT decimal sums, one final IEEE
    * division for the reported score. */
  val mooreLewisQ: String = {
    import graft.llm.Selection.InDomainSource
    s"""with $textCtes,
       |ml_tf as materialized (
       |  select doc_id, term, cast(count(*) as bigint) as tf
       |  from (select doc_id, unnest(w) as term from doc_words) t group by 1, 2
       |),
       |ml_in as materialized (
       |  select term, cast(sum(tf) as bigint) as c_in
       |  from ml_tf join (select doc_id from documents
       |                   where source = '$InDomainSource') ids using (doc_id)
       |  group by 1
       |),
       |ml_gen as materialized (
       |  select term, cast(sum(tf) as bigint) as c_gen from ml_tf group by 1
       |),
       |ml_stats as (
       |  select (select cast(coalesce(sum(c_in), 0) as bigint) from ml_in) as t_in,
       |         (select count(*) from ml_in) as v_in,
       |         (select cast(sum(c_gen) as bigint) from ml_gen) as t_gen,
       |         (select count(*) from ml_gen) as v_gen
       |),
       |ml_nll as (
       |  select f.doc_id, f.tf,
       |    cast(ln(cast(t_in + v_in + 1 as double)
       |        / cast(coalesce(i.c_in, 0) + 1 as double)) as decimal(18,9)) as nll_in,
       |    cast(ln(cast(t_gen + v_gen + 1 as double)
       |        / cast(g.c_gen + 1 as double)) as decimal(18,9)) as nll_gen
       |  from ml_tf f join ml_gen g using (term)
       |  left join ml_in i using (term) cross join ml_stats
       |)
       |select doc_id, cast(sum(tf) as bigint) as n_tokens,
       |  cast(cast(sum(nll_in * tf) - sum(nll_gen * tf) as varchar) as double)
       |    / cast(cast(sum(tf) as bigint) as double) as ce_diff,
       |  sum(nll_in * tf) < sum(nll_gen * tf) as selected
       |from ml_nll group by 1""".stripMargin
  }

  /** Mirror Selection.dsirWeights: the same hashed unigram+bigram
    * feature buckets (md5-prefix60 mod B), the same +1/B-smoothed
    * target/raw bucket models, each bucket's log-ratio ONE ln of an
    * exact-integer ratio quantized to decimal(18,9), keep on the
    * exact decimal sum. */
  val dsirWeightsQ: String = {
    import graft.llm.Selection.{DsirBuckets, InDomainSource}
    s"""with $textCtes,
       |ds_feats as (
       |  select doc_id, unnest(list_concat(w,
       |    case when len(w) >= 2
       |      then list_transform(generate_series(1, len(w) - 1),
       |             i -> w[i] || ' ' || w[i+1])
       |      else [] end)) as feat
       |  from doc_words
       |),
       |ds_fc as materialized (
       |  select doc_id, ${hex60("feat")} % $DsirBuckets as bkt,
       |    cast(count(*) as bigint) as c
       |  from ds_feats group by 1, 2
       |),
       |ds_tgt as materialized (
       |  select bkt, cast(sum(c) as bigint) as c_tgt
       |  from ds_fc join (select doc_id from documents
       |                   where source = '$InDomainSource') ids using (doc_id)
       |  group by 1
       |),
       |ds_raw as materialized (
       |  select bkt, cast(sum(c) as bigint) as c_raw from ds_fc group by 1
       |),
       |ds_stats as (
       |  select (select cast(coalesce(sum(c_tgt), 0) as bigint) from ds_tgt) as t_tgt,
       |         (select cast(sum(c_raw) as bigint) from ds_raw) as t_raw
       |),
       |ds_model as (
       |  select bkt,
       |    cast(ln(cast((coalesce(c_tgt, 0) + 1) * (t_raw + $DsirBuckets) as double)
       |        / cast((c_raw + 1) * (t_tgt + $DsirBuckets) as double))
       |      as decimal(18,9)) as lr
       |  from ds_raw left join ds_tgt using (bkt) cross join ds_stats
       |)
       |select doc_id, cast(sum(c) as bigint) as n_feats,
       |  cast(cast(sum(lr * c) as varchar) as double) as log_weight,
       |  sum(lr * c) > 0 as keep
       |from ds_fc join ds_model using (bkt) group by 1""".stripMargin
  }

  /** Connected-components oracle (mirror graft.llm.Clusters): the SAME
    * edge union (strong MinHash pairs + SimHash pairs, deduplicated)
    * and the SAME MaxIters unrolled min-label propagation rounds, so
    * both engines stop at the identical bounded fixpoint. Composes the
    * already-gated pair oracles verbatim as derived tables.
    *
    * Every iteration CTE is `AS MATERIALIZED`: each round references
    * its predecessor twice (union + neighbor join, then the pointer
    * jump's self-join), and DuckDB's default CTE INLINING would copy
    * the whole upstream 2^rounds times — the exact blowup the Spark
    * side prevents with per-round localCheckpoint. (Un-hinted, the
    * inlined tree re-opened documents.parquet past the fd limit.) */
  /** The 8 unrolled rounds over ANY (doc_a, doc_b) edge SQL — shared
    * by the text near-dup clusters and the embedding near-dup clusters
    * so the propagation arithmetic exists exactly once. */
  private def ccOverEdges(edgesSql: String): String = {
    import graft.llm.Clusters
    val rounds = (1 to Clusters.MaxIters).map { i =>
      s"""cl_m$i as materialized (
         |  select doc_id, min(lbl) as lbl from (
         |    select doc_id, lbl from cl_l${i - 1}
         |    union all
         |    select u.src as doc_id, p.lbl from cl_und u join cl_l${i - 1} p on u.dst = p.doc_id
         |  ) t group by 1
         |),
         |cl_l$i as materialized (
         |  select a.doc_id, b.lbl from cl_m$i a join cl_m$i b on a.lbl = b.doc_id
         |)""".stripMargin
    }.mkString(",\n")
    s"""with cl_edges as materialized (
       |$edgesSql
       |),
       |cl_und as materialized (
       |  select doc_a as src, doc_b as dst from cl_edges
       |  union all
       |  select doc_b as src, doc_a as dst from cl_edges
       |),
       |cl_l0 as materialized (select distinct src as doc_id, src as lbl from cl_und),
       |$rounds
       |select doc_id, lbl as cluster_id,
       |  count(*) over (partition by lbl) as cluster_size
       |from cl_l${Clusters.MaxIters}""".stripMargin
  }

  val dedupClustersQ: String = {
    import graft.llm.Curation
    ccOverEdges(
      s"""  select doc_a, doc_b from ($minhashPairsQ) t
         |  where n_shared_bands >= ${Curation.NearDupDropBands}
         |  union
         |  select doc_a, doc_b from ($simhashPairsQ) t""".stripMargin)
  }

  /** Mirror Models.embeddingDedupClusters: the SAME unrolled rounds
    * over the embedding near-dup pair edges. */
  val embeddingDedupClustersQ: String =
    s"""select doc_id as vec_id, cluster_id, cluster_size from (
       |${ccOverEdges(s"  select vec_a as doc_a, vec_b as doc_b from ($embeddingDedupPairsQ) t")}
       |) t""".stripMargin

  /** Corpus-curation oracle (mirror graft.llm.Curation.curate): composes
    * the already-gated query strings verbatim as derived tables — zero
    * formula duplication, so the pipeline oracle cannot drift from its
    * component oracles. (Declared after its components: object vals
    * initialize in order.) */
  val corpusCurationQ: String = {
    import graft.llm.Curation._
    s"""with cq as (select doc_id, quality_score from ($textStatsQ) t),
       |cclust as (select doc_id, cluster_id from ($dedupClustersQ) t),
       |ccanon as (select text_hash, canonical_doc_id from ($dedupExactQ) t),
       |cdocs as (select doc_id, md5(text) as text_hash from documents),
       |cnear as (select doc_id from cclust where doc_id != cluster_id)
       |select d.doc_id, q.quality_score,
       |  case when q.quality_score < $MinQuality then 'low_quality'
       |       when d.doc_id != c.canonical_doc_id then 'exact_duplicate'
       |       when n.doc_id is not null then 'near_duplicate'
       |       else 'kept' end as status
       |from cdocs d
       |join cq q using (doc_id)
       |join ccanon c on d.text_hash = c.text_hash
       |left join cnear n on d.doc_id = n.doc_id""".stripMargin
  }

  /** Mirror Curation.curationReport: the verdict subquery joined to
    * sources, per-(source, status) counts, share as one double
    * division against the per-source window total. */
  val curationReportQ: String =
    s"""select source, status, count(*) as n_docs,
       |  cast(count(*) as double)
       |    / cast(sum(count(*)) over (partition by source) as double) as share
       |from documents join ($corpusCurationQ) t using (doc_id)
       |group by 1, 2""".stripMargin

  /** Mirror Relevance.bm25: same Okapi formula, same FIXED-order
    * per-term addition (coalesced conditional maxes, never an
    * unordered double sum). */
  val bm25Q: String = {
    import graft.llm.Relevance._
    val terms = QueryTerms.map(t => s"'$t'").mkString(", ")
    val perTerm = QueryTerms.map(t =>
      s"coalesce(max(case when term = '$t' then s end), 0.0) as s_$t").mkString(",\n  ")
    val total = QueryTerms.map(t => s"s_$t").mkString(" + ")
    s"""with $textCtes,
       |bm_dl as (select doc_id, cast(len(w) as bigint) as dl from doc_words),
       |bm_corpus as (select count(*) as n_docs, sum(dl) as total_len from bm_dl),
       |bm_tf as (
       |  select doc_id, dl, w as term, count(*) as tf from (
       |    select doc_id, dl, unnest(w) as w
       |    from doc_words join bm_dl using (doc_id)
       |  ) t where w in ($terms) group by 1, 2, 3
       |),
       |bm_df as (select term, count(*) as df from bm_tf group by 1),
       |bm_scored as (
       |  select doc_id, term,
       |    cast(cast(ln((n_docs - df + 0.5) / (df + 0.5) + 1.0) as decimal(18,9)) as double)
       |      * tf * ($K1 + 1) /
       |      (tf + $K1 * (1.0 - $B + $B * cast(dl as double)
       |        / (cast(total_len as double) / cast(n_docs as double)))) as s
       |  from bm_tf join bm_df using (term) cross join bm_corpus
       |),
       |bm_pivot as (
       |  select doc_id,
       |  $perTerm
       |  from bm_scored group by 1
       |)
       |select doc_id, s_${QueryTerms.head}${QueryTerms.tail.map(t => s", s_$t").mkString},
       |  $total as bm25_score
       |from bm_pivot""".stripMargin
  }

  /** The unrolled-Lloyd CTE chain (mirror Kmeans.centroidVectors):
    * same seeds (lowest vec_ids), same Iters unrolled steps, same
    * exact-decimal-mean / float presentation per iteration as the IVF
    * recipe. Iteration CTEs are materialized (each is referenced by
    * the next round). Final centroids: `km_cent${Iters}`. */
  /** The chain over ANY (vec_id, embedding) relation with a CTE-name
    * prefix — shared by the full-vector kmeans oracles and the
    * per-subspace PQ codebook oracles. Final centroids:
    * `${p}_cent${Iters}`. */
  private def kmCtesOver(p: String, srcRel: String): String = {
    import graft.llm.Kmeans.{K, Iters}
    val rounds = (1 to Iters).map { i =>
      s"""${p}_centn${i - 1} as materialized (
         |  select centroid_id, centroid, ${dotSql("centroid", "centroid")} as cnrm
         |  from ${p}_cent${i - 1}
         |),
         |${p}_assign$i as materialized (
         |  select vec_id, embedding, centroid_id from (
         |    select e.vec_id, e.embedding, c.centroid_id,
         |      row_number() over (partition by e.vec_id order by
         |        ${dotSql("e.embedding", "c.centroid")} / (sqrt(e.nrm) * sqrt(c.cnrm))
         |          desc nulls last, c.centroid_id) as rn
         |    from ${p}_emb e cross join ${p}_centn${i - 1} c
         |  ) t where rn = 1
         |),
         |${p}_mean$i as materialized (
         |  select centroid_id,
         |    unnest(generate_series(0, len(embedding) - 1)) as idx,
         |    unnest(list_transform(generate_series(1, len(embedding)), j -> embedding[j]::double)) as v
         |  from ${p}_assign$i
         |),
         |${p}_moved$i as materialized (
         |  select centroid_id, list(cast(c as float) order by idx) as centroid from (
         |    select centroid_id, idx,
         |      cast(cast(sum(cast(v as decimal(27,12))) as varchar) as double)
         |        / cast(count(*) as double) as c
         |    from ${p}_mean$i group by 1, 2
         |  ) t group by 1
         |),
         |${p}_cent$i as materialized (
         |  select centroid_id, centroid from ${p}_moved$i
         |  union all
         |  select c.centroid_id, c.centroid from ${p}_cent${i - 1} c
         |  where c.centroid_id not in (select centroid_id from ${p}_moved$i)
         |)""".stripMargin
    }.mkString(",\n")
    s"""${p}_emb as materialized (
       |  select vec_id, embedding, ${dotSql("embedding", "embedding")} as nrm
       |  from $srcRel
       |  where ${dotSql("embedding", "embedding")} > 0
       |),
       |${p}_cent0 as materialized (
       |  select vec_id as centroid_id, embedding as centroid from ${p}_emb where vec_id < $K
       |),
       |$rounds""".stripMargin
  }

  private val kmCtes: String = kmCtesOver("km", "embeddings")

  val kmeansCentroidsQ: String =
    s"""with $kmCtes
       |select centroid_id,
       |  cast(unnest(generate_series(0, len(centroid) - 1)) as int) as idx,
       |  unnest(list_transform(generate_series(1, len(centroid)), j -> centroid[j]::double)) as component
       |from km_cent${graft.llm.Kmeans.Iters}""".stripMargin

  /** Mirror Similarity.annIvfKmeansTopK: the SAME probe chain as the
    * label-mean IVF oracle, quantized by the SAME unrolled-Lloyd
    * centroids as the kmeans oracle — pure composition, zero new
    * arithmetic. */
  val annIvfKmeansTopKQ: String =
    s"""with $kmCtes,
       |${ivfProbeCtes(s"km_cent${graft.llm.Kmeans.Iters}")}
       |$ivfSelect""".stripMargin

  /** Mirror Similarity.diversitySample: the kmeans assignment chain's
    * `ivf_assign`, quota'd per cluster by the salted-hash order. */
  val diversitySampleQ: String = {
    import graft.llm.Similarity.DiversityQuota
    s"""with $kmCtes,
       |${ivfProbeCtes(s"km_cent${graft.llm.Kmeans.Iters}")}
       |, div_pick as (
       |  select vec_id, centroid_id,
       |    cast(row_number() over (partition by centroid_id
       |      order by ${hex60("'div|' || cast(vec_id as varchar)")}, vec_id) as int) as pick
       |  from ivf_assign
       |)
       |select vec_id, centroid_id, pick from div_pick
       |where pick <= $DiversityQuota""".stripMargin
  }

  /** Mirror Similarity.semDedupPrune: the same unrolled-Lloyd
    * centroids (kmCtes) and rn=1 cosine assignment, the same
    * vec_id-ordered per-cluster cap, the same within-cluster pairwise
    * cosine threshold and smaller-id-survives rule. */
  val semdedupPruneQ: String = {
    import graft.llm.Similarity.{SemDedupClusterCap, SemDedupCosine}
    s"""with $kmCtes,
       |sd_emb as (
       |  select vec_id, embedding, ${dotSql("embedding", "embedding")} as nrm
       |  from embeddings
       |),
       |sd_ok as (select * from sd_emb where nrm > 0),
       |sd_cent as (
       |  select centroid_id, centroid, ${dotSql("centroid", "centroid")} as cnrm
       |  from km_cent${graft.llm.Kmeans.Iters}
       |),
       |sd_assign0 as (
       |  select e.vec_id, e.embedding, e.nrm, c.centroid_id,
       |    ${dotSql("e.embedding", "c.centroid")} / (sqrt(e.nrm) * sqrt(c.cnrm)) as sim
       |  from sd_ok e cross join sd_cent c
       |),
       |sd_assign as (
       |  select vec_id, embedding, nrm, centroid_id from (
       |    select *, row_number() over (
       |      partition by vec_id order by sim desc nulls last, centroid_id) as rn
       |    from sd_assign0
       |  ) t where rn = 1
       |),
       |sd_member as materialized (
       |  select *, row_number() over (
       |    partition by centroid_id order by vec_id) as mrk
       |  from sd_assign
       |),
       |sd_kept as materialized (
       |  select vec_id, embedding, nrm, centroid_id from sd_member
       |  where mrk <= $SemDedupClusterCap
       |),
       |sd_dups as (
       |  select b.vec_id, min(a.vec_id) as dup_of,
       |    cast(count(*) as bigint) as n_dups
       |  from sd_kept a join sd_kept b
       |    on a.centroid_id = b.centroid_id and a.vec_id < b.vec_id
       |  where ${dotSql("a.embedding", "b.embedding")}
       |    / (sqrt(a.nrm) * sqrt(b.nrm)) >= $SemDedupCosine
       |  group by 1
       |)
       |select m.vec_id, m.centroid_id,
       |  m.mrk <= $SemDedupClusterCap as in_scope,
       |  d.dup_of, coalesce(d.n_dups, 0) as n_dups,
       |  d.dup_of is null as keep
       |from sd_member m left join sd_dups d using (vec_id)""".stripMargin
  }

  /** Mirror PQ: per-subspace slices, the SAME unrolled-Lloyd chain per
    * subspace (kmCtesOver), then plain-L2 code assignment of every
    * subvector against its final codebook. */
  private val pqCtes: String = {
    import graft.llm.{Kmeans, PQ}
    val subs = (0 until PQ.SubSpaces).map { s =>
      val lo = s * PQ.SubDim + 1
      val hi = (s + 1) * PQ.SubDim
      s"""pq${s}_sub as materialized (
         |  select vec_id, list_slice(embedding, $lo, $hi) as embedding from embeddings
         |),
         |${kmCtesOver(s"pq$s", s"pq${s}_sub")}""".stripMargin
    }.mkString(",\n")
    val fins = (0 until PQ.SubSpaces).map { s =>
      s"""pq${s}_fin as materialized (
         |  select vec_id, centroid_id as code from (
         |    select e.vec_id, c.centroid_id,
         |      row_number() over (partition by e.vec_id order by
         |        (${dotSql("e.embedding", "e.embedding")}
         |          - 2.0 * ${dotSql("e.embedding", "c.centroid")}
         |          + ${dotSql("c.centroid", "c.centroid")}) asc nulls last,
         |        c.centroid_id) as rn
         |    from pq${s}_sub e cross join pq${s}_cent${Kmeans.Iters} c
         |  ) t where rn = 1
         |)""".stripMargin
    }.mkString(",\n")
    s"$subs,\n$fins"
  }

  val pqCodesQ: String = {
    import graft.llm.PQ
    val union = (0 until PQ.SubSpaces)
      .map(s => s"select vec_id, $s as subspace, code from pq${s}_fin")
      .mkString("\nunion all\n")
    s"with $pqCtes\n$union"
  }

  /** pqCtes + the reconstruction CTEs (`pq_rec`: the compressed corpus
    * as float vectors) — shared by the symmetric and ADC PQ oracles. */
  private val pqRecCtes: String = {
    import graft.llm.{Kmeans, PQ}
    val codesUnion = (0 until PQ.SubSpaces)
      .map(s => s"select vec_id, $s as subspace, code from pq${s}_fin")
      .mkString(" union all ")
    val centsUnion = (0 until PQ.SubSpaces)
      .map(s => s"select $s as subspace, centroid_id, centroid from pq${s}_cent${Kmeans.Iters}")
      .mkString(" union all ")
    s"""$pqCtes,
       |pq_codes as ($codesUnion),
       |pq_cents as ($centsUnion),
       |pq_rec as (
       |  select j.vec_id, flatten(list(c.centroid order by c.subspace)) as embedding
       |  from pq_codes j
       |  join pq_cents c on j.subspace = c.subspace and j.code = c.centroid_id
       |  group by j.vec_id
       |)""".stripMargin
  }

  val annPqTopKQ: String =
    s"""with $pqRecCtes,
       |${annCosineTopKOver("pq_rec")}""".stripMargin

  /** ADC: full-precision queries, compressed corpus. */
  val annPqAdcTopKQ: String =
    s"""with $pqRecCtes,
       |${annCosineTopKAsymOver("pq_rec", "embeddings")}""".stripMargin

  /** Mirror PQ.annPqRerankTopK: ADC top-C candidates (same scored set
    * as the ADC oracle, ranked to RerankCandidates), exact-rescored
    * against the raw corpus, final top-k with the same (cosine desc,
    * neighbor_id) total order. */
  val annPqRerankTopKQ: String = {
    import graft.llm.{PQ, Similarity}
    s"""with $pqRecCtes,
       |rr_rec as (
       |  select vec_id, embedding, ${dotSql("embedding", "embedding")} as nrm
       |  from pq_rec
       |),
       |rr_raw as (
       |  select vec_id, embedding, ${dotSql("embedding", "embedding")} as nrm
       |  from embeddings
       |),
       |rr_q as (
       |  select vec_id as query_id, embedding as q_emb, nrm as q_nrm
       |  from rr_raw where nrm > 0 and vec_id < ${Similarity.NQueries}
       |),
       |rr_cand as (
       |  select query_id, neighbor_id from (
       |    select q.query_id, e.vec_id as neighbor_id,
       |      row_number() over (partition by q.query_id order by
       |        ${dotSql("e.embedding", "q.q_emb")} / (sqrt(e.nrm) * sqrt(q.q_nrm))
       |          desc nulls last, e.vec_id) as rn
       |    from (select * from rr_rec where nrm > 0) e cross join rr_q q
       |    where e.vec_id != q.query_id
       |  ) t where rn <= ${PQ.RerankCandidates}
       |),
       |rr_exact as (
       |  select c.query_id, c.neighbor_id,
       |    ${dotSql("n.embedding", "q.q_emb")} / (sqrt(n.nrm) * sqrt(q.q_nrm)) as cosine
       |  from rr_cand c
       |  join (select * from rr_raw where nrm > 0) n on n.vec_id = c.neighbor_id
       |  join rr_q q on q.query_id = c.query_id
       |)
       |select query_id, neighbor_id, rank, cosine from (
       |  select *, row_number() over (
       |    partition by query_id order by cosine desc nulls last, neighbor_id) as rank
       |  from rr_exact
       |) t where rank <= ${Similarity.TopK}""".stripMargin
  }

  /** Mirror Similarity.annIvfPqTopK (the IVF+PQ composition): kmeans
    * coarse quantizer + full-precision assignment/queries, in-list
    * scoring against the PQ-reconstructed corpus — pure composition of
    * the kmeans, PQ-reconstruction, and probe CTE families. */
  val annIvfPqTopKQ: String =
    s"""with $kmCtes,
       |$pqRecCtes,
       |${ivfProbeCtes(s"km_cent${graft.llm.Kmeans.Iters}", Some("pq_rec"))}
       |$ivfSelect""".stripMargin

  /** Mirror PQ.residualReconstructed: coarse-assign every nonzero
    * vector against the kmeans centroids (the centroidRanked recipe —
    * cosine desc, centroid_id tiebreak), subtract the centroid
    * element-wise (float→double→float), train the SAME unrolled-Lloyd
    * chain per subspace ON THE RESIDUALS, assign codes, reconstruct
    * the residual from codewords, and add the coarse centroid back.
    * `rpq_rec` is the residual-encoded corpus. Requires kmCtes in
    * scope. */
  private val rpqCtes: String = {
    import graft.llm.{Kmeans, PQ}
    val subs = (0 until PQ.SubSpaces).map { s =>
      val lo = s * PQ.SubDim + 1
      val hi = (s + 1) * PQ.SubDim
      s"""rpq${s}_sub as materialized (
         |  select vec_id, list_slice(embedding, $lo, $hi) as embedding from rpq_res
         |),
         |${kmCtesOver(s"rpq$s", s"rpq${s}_sub")}""".stripMargin
    }.mkString(",\n")
    val fins = (0 until PQ.SubSpaces).map { s =>
      s"""rpq${s}_fin as materialized (
         |  select vec_id, centroid_id as code from (
         |    select e.vec_id, c.centroid_id,
         |      row_number() over (partition by e.vec_id order by
         |        (${dotSql("e.embedding", "e.embedding")}
         |          - 2.0 * ${dotSql("e.embedding", "c.centroid")}
         |          + ${dotSql("c.centroid", "c.centroid")}) asc nulls last,
         |        c.centroid_id) as rn
         |    from rpq${s}_sub e cross join rpq${s}_cent${Kmeans.Iters} c
         |  ) t where rn = 1
         |)""".stripMargin
    }.mkString(",\n")
    val codesUnion = (0 until PQ.SubSpaces)
      .map(s => s"select vec_id, $s as subspace, code from rpq${s}_fin")
      .mkString(" union all ")
    val centsUnion = (0 until PQ.SubSpaces)
      .map(s => s"select $s as subspace, centroid_id, centroid from rpq${s}_cent${Kmeans.Iters}")
      .mkString(" union all ")
    s"""rpq_emb as materialized (
       |  select vec_id, embedding, ${dotSql("embedding", "embedding")} as nrm
       |  from embeddings where ${dotSql("embedding", "embedding")} > 0
       |),
       |rpq_centn as materialized (
       |  select centroid_id, centroid, ${dotSql("centroid", "centroid")} as cnrm
       |  from km_cent${Kmeans.Iters}
       |),
       |rpq_assign as materialized (
       |  select vec_id, embedding, centroid_id, centroid from (
       |    select e.vec_id, e.embedding, c.centroid_id, c.centroid,
       |      row_number() over (partition by e.vec_id order by
       |        ${dotSql("e.embedding", "c.centroid")} / (sqrt(e.nrm) * sqrt(c.cnrm))
       |          desc nulls last, c.centroid_id) as rn
       |    from rpq_emb e cross join rpq_centn c
       |  ) t where rn = 1
       |),
       |rpq_res as materialized (
       |  select vec_id,
       |    list_transform(generate_series(1, len(embedding)),
       |      i -> cast(cast(embedding[i] as double) - cast(centroid[i] as double) as float)) as embedding
       |  from rpq_assign
       |),
       |$subs,
       |$fins,
       |rpq_codes as ($codesUnion),
       |rpq_cents as ($centsUnion),
       |rpq_rec0 as (
       |  select j.vec_id, flatten(list(c.centroid order by c.subspace)) as embedding
       |  from rpq_codes j
       |  join rpq_cents c on j.subspace = c.subspace and j.code = c.centroid_id
       |  group by j.vec_id
       |),
       |rpq_rec as (
       |  select r.vec_id,
       |    list_transform(generate_series(1, len(r.embedding)),
       |      i -> cast(cast(r.embedding[i] as double) + cast(a.centroid[i] as double) as float)) as embedding
       |  from rpq_rec0 r join rpq_assign a using (vec_id)
       |)""".stripMargin
  }

  /** Mirror Similarity.annIvfPqTopK over the RESIDUAL encoding (true
    * IndexIVFPQ): same probe, lists scored against rpq_rec. */
  val annIvfPqResidualTopKQ: String =
    s"""with $kmCtes,
       |$rpqCtes,
       |${ivfProbeCtes(s"km_cent${graft.llm.Kmeans.Iters}", Some("rpq_rec"))}
       |$ivfSelect""".stripMargin

  /** Mirror Similarity.annRecall: recall of `approxQ` against the
    * exact top-k — pure composition, zero new arithmetic. `methodCol`
    * optionally prefixes a method label column. */
  private def annRecallOver(approxQ: String, methodCol: String = ""): String =
    s"""select $methodCol e.query_id,
       |  count(a.neighbor_id) as n_hits,
       |  cast(count(a.neighbor_id) as double) / cast(count(*) as double) as recall
       |from (select query_id, neighbor_id from ($annCosineTopKQ) t) e
       |left join (select query_id, neighbor_id from ($approxQ) t) a
       |  on e.query_id = a.query_id and e.neighbor_id = a.neighbor_id
       |group by ${if (methodCol.isEmpty) "1" else "1, 2"}""".stripMargin

  val annRecallQ: String = annRecallOver(annIvfKmeansTopKQ)

  /** Mirror Models.annRecallByMethod: every approximate index's recall
    * vs the exact top-k, one method per union arm. */
  val annRecallByMethodQ: String =
    Seq(
      "ivf" -> annIvfTopKQ,
      "ivf_kmeans" -> annIvfKmeansTopKQ,
      "sq8" -> annSq8TopKQ,
      "pq" -> annPqTopKQ,
      "pq_adc" -> annPqAdcTopKQ,
      "pq_rerank" -> annPqRerankTopKQ,
      "ivfpq" -> annIvfPqTopKQ,
      "ivfpq_residual" -> annIvfPqResidualTopKQ,
      "opq" -> annOpqTopKQ)
      .map { case (m, q) => annRecallOver(q, s"'$m' as method,") }
      .mkString("\nunion all\n")

  /** Mirror Profile.profileApprox over documents: the same UNION melt
    * (every column cast to varchar), the same null/row counters, and
    * the same integer HLL pipeline as the hll_user_counts oracle
    * (md5-60 hash of 'hll|'||value, low-P-bit register, leading-1 via
    * binary string length, exact scaled harmonic sum), grouped by
    * column_name. */
  val documentsProfileQ: String = {
    import graft.operators.Sketches.{HllAlpha, HllM, HllP, HllW}
    val w1 = HllW + 1
    val arms = graft.Models.DocumentsProfileCols.map(c =>
      s"select '$c' as column_name, cast($c as varchar) as value from documents")
      .mkString("\n  union all ")
    s"""with v as (
       |  $arms
       |),
       |counts as (
       |  select column_name, count(*) as n_rows,
       |    count(*) - count(value) as n_nulls
       |  from v group by 1
       |),
       |h as (
       |  select column_name,
       |    cast(('0x' || substr(md5('hll|' || value),1,15)) as bigint) as h
       |  from v where value is not null
       |),
       |r as (select column_name, h % $HllM as reg, h >> $HllP as w from h),
       |rr as (
       |  select column_name, reg,
       |    case when w = 0 then $w1 else $w1 - length(bin(w)) end as rho
       |  from r
       |),
       |mj as (select column_name, reg, max(rho) as m_j from rr group by 1, 2),
       |s as (
       |  select column_name,
       |    sum(cast(1 as bigint) << ($w1 - m_j)) as ssum,
       |    count(*) as nreg
       |  from mj group by 1
       |),
       |e as (
       |  select column_name,
       |    cast(ssum + ($HllM - nreg) * (cast(1 as bigint) << $w1) as double) as scaled,
       |    $HllM - nreg as zeros
       |  from s
       |),
       |est as (
       |  select column_name, zeros,
       |    ($HllAlpha::double * $HllM * $HllM) * cast(cast(1 as bigint) << $w1 as double)
       |      / scaled as raw
       |  from e
       |)
       |select c.column_name, c.n_rows, c.n_nulls,
       |  coalesce(case when zeros > 0 and raw <= ${2.5 * HllM}
       |    then cast(cast(ln($HllM::double / cast(zeros as double)) * $HllM::double
       |           as decimal(18,9)) as double)
       |    else raw end, 0.0) as n_distinct_est
       |from counts c left join est using (column_name)""".stripMargin
  }

  /** Mirror GlobalIndex.epochShuffle: the oracle IS the naive global
    * row_number the operator decomposes into bucket ranks + offsets. */
  val epochShuffleQ: String = {
    import graft.operators.GlobalIndex
    s"""with es as (
       |  select doc_id,
       |    ${hex60(s"'${GlobalIndex.EpochSaltPrefix}0|' || cast(doc_id as varchar)")} as h
       |  from documents
       |)
       |select doc_id,
       |  row_number() over (order by h, doc_id) - 1 as shuffle_pos
       |from es""".stripMargin
  }

  /** Mirror Relevance.tfidfTopTerms: integer tf/df/N, quantized-ln
    * idf, one double multiply, term-tiebroken ranking. */
  val tfidfTopTermsQ: String = {
    import graft.llm.Relevance.TfidfTopK
    s"""with $textCtes,
       |tw as (select doc_id, unnest(w) as term from doc_words),
       |ttf as (select doc_id, term, count(*) as tf from tw group by 1, 2),
       |tdf as (select term, count(*) as df from ttf group by 1),
       |tnd as (select count(*) as n_docs from documents),
       |tscored as (
       |  select ttf.doc_id, ttf.term, ttf.tf,
       |    cast(ttf.tf as double) *
       |      cast(cast(ln(cast(n_docs as double) / cast(df as double))
       |        as decimal(18,9)) as double) as score
       |  from ttf join tdf using (term) cross join tnd
       |)
       |select doc_id, term, tf, score, rank from (
       |  select *, row_number() over (
       |    partition by doc_id order by score desc, term) as rank
       |  from tscored
       |) t where rank <= $TfidfTopK""".stripMargin
  }

  /** Mirror Relevance.unigramSurprisal: quantized −ln p per term,
    * exact decimal per-doc sum, string→double presentation, one IEEE
    * division. */
  val unigramSurprisalQ: String =
    s"""with $textCtes,
       |us_tf as (
       |  select doc_id, term, count(*) as tf from (
       |    select doc_id, unnest(w) as term from doc_words
       |  ) t group by 1, 2
       |),
       |us_cnt as (select term, cast(sum(tf) as bigint) as cnt from us_tf group by 1),
       |us_total as (select cast(sum(cnt) as bigint) as corpus_tokens from us_cnt),
       |us_nll as (
       |  select doc_id, tf,
       |    cast(ln(cast(corpus_tokens as double) / cast(cnt as double))
       |      as decimal(18,9)) as nll
       |  from us_tf join us_cnt using (term) cross join us_total
       |)
       |select doc_id,
       |  cast(sum(tf) as bigint) as n_tokens,
       |  cast(cast(sum(nll * tf) as varchar) as double)
       |    / cast(cast(sum(tf) as bigint) as double) as avg_nll
       |from us_nll group by 1""".stripMargin

  /** Mirror TextStats.vocabGrowth: ascending ntile(10) deciles of
    * doc_id (the engine's exactBuckets on −doc_id), first-seen bucket
    * per term, per-decile mass + new terms, 10-row cumulative sum. */
  val vocabGrowthQ: String =
    s"""with $textCtes,
       |vg_b as (
       |  select doc_id, cast(ntile(10) over (order by doc_id) as int) as bucket
       |  from documents
       |),
       |vg_t as (
       |  select t.doc_id, term, bucket
       |  from (select doc_id, unnest(w) as term from doc_words) t
       |  join vg_b using (doc_id)
       |),
       |vg_new as (
       |  select first_bucket as bucket, count(*) as new_terms from (
       |    select term, min(bucket) as first_bucket from vg_t group by 1
       |  ) t group by 1
       |),
       |vg_doc as (
       |  select bucket, count(distinct doc_id) as n_docs,
       |    count(*) as n_tokens
       |  from vg_t group by 1
       |)
       |select d.bucket, n_docs, n_tokens,
       |  coalesce(new_terms, 0) as new_terms,
       |  cast(sum(coalesce(new_terms, 0)) over (order by d.bucket
       |    rows between unbounded preceding and current row) as bigint) as cum_terms
       |from vg_doc d left join vg_new n on d.bucket = n.bucket""".stripMargin

  /** Mirror Relevance.heldoutSurprisal: the Laplace-smoothed unigram
    * model from TRAIN-split counts only, scoring VALIDATION docs —
    * same salted split buckets, quantized ln, exact decimal sums,
    * string→double presentation, one IEEE division. */
  val heldoutSurprisalQ: String = {
    import graft.llm.Splits.{Salt, TrainPct, ValidationPct}
    val b = s"${hex60(s"'$Salt' || cast(doc_id as varchar)")} % 100"
    s"""with $textCtes,
       |ho_split as (select doc_id, $b as b from documents),
       |ho_tf as (
       |  select doc_id, term, count(*) as tf from (
       |    select doc_id, unnest(w) as term from doc_words
       |  ) t group by 1, 2
       |),
       |ho_cnt as (
       |  select term, cast(sum(tf) as bigint) as cnt
       |  from ho_tf join ho_split using (doc_id)
       |  where b < $TrainPct group by 1
       |),
       |ho_stats as (select cast(sum(cnt) as bigint) as tt,
       |                    count(*) as tv from ho_cnt),
       |ho_nll as (
       |  select f.doc_id, f.tf, c.cnt,
       |    cast(ln(cast(tt + tv + 1 as double)
       |        / cast(coalesce(cnt, 0) + 1 as double))
       |      as decimal(18,9)) as nll
       |  from ho_tf f join ho_split s using (doc_id)
       |  left join ho_cnt c using (term) cross join ho_stats
       |  where s.b >= $TrainPct and s.b < ${TrainPct + ValidationPct}
       |)
       |select doc_id,
       |  cast(sum(tf) as bigint) as n_tokens,
       |  cast(sum(case when cnt is null then tf else 0 end) as bigint) as oov_tokens,
       |  cast(cast(sum(nll * tf) as varchar) as double)
       |    / cast(cast(sum(tf) as bigint) as double) as avg_nll
       |from ho_nll group by 1""".stripMargin
  }

  /** Mirror Models.curriculumBins: the unigram-surprisal oracle as a
    * derived table, the SAME equi-width histogram-quantile machinery
    * as OpsSql.histQuantilesQ (generated from the same HistBins
    * constant, every literal cast to double), quartile thresholds
    * pivoted to one row, the same `<=`-lower-band assignment. */
  val curriculumBinsQ: String = {
    import graft.operators.Sketches.HistBins
    import graft.llm.Curriculum.Quartiles
    val lastBin = HistBins - 1
    val qVals = Quartiles.map(q => s"(cast($q as double))").mkString(", ")
    val thCols = Seq("t25", "t50", "t75").zip(Quartiles).map { case (n, q) =>
      s"max(case when q = cast($q as double) then est end) as $n"
    }.mkString(", ")
    s"""with cb_surp as (
       |  select doc_id, avg_nll from ($unigramSurprisalQ) t
       |),
       |cb_stats as (
       |  select min(avg_nll) as vmin, max(avg_nll) as vmax, count(avg_nll) as n
       |  from cb_surp
       |),
       |cb_st as (select *, (vmax - vmin) / cast($HistBins as double) as width from cb_stats),
       |cb_b as (
       |  select s.avg_nll,
       |    case when width = 0 then 0
       |      else least($lastBin, cast(floor((avg_nll - vmin) / width) as bigint))
       |    end as bin
       |  from cb_surp s cross join cb_st
       |),
       |cb_bins as (select bin, count(*) as cnt from cb_b group by 1),
       |cb_cum as (
       |  select bin, cnt, sum(cnt) over (order by bin) as cum from cb_bins
       |),
       |cb_q(q) as (values $qVals),
       |cb_j as (
       |  select q, st.n, st.vmin, st.width, c.bin, c.cnt,
       |    cast(c.cum - c.cnt as bigint) as cum_before,
       |    greatest(1, cast(ceil(q * cast(st.n as double)) as bigint)) as target
       |  from cb_cum c cross join cb_st st cross join cb_q
       |),
       |cb_est as (
       |  select q,
       |    case when width = 0 then vmin
       |      else vmin + width * (cast(bin as double)
       |        + cast(target - cum_before as double) / cast(cnt as double))
       |    end as est
       |  from cb_j
       |  where cum_before < target and cum_before + cnt >= target
       |),
       |cb_th as (select $thCols from cb_est)
       |select s.doc_id, s.avg_nll,
       |  case when s.avg_nll <= t25 then 'easy'
       |       when s.avg_nll <= t50 then 'medium'
       |       when s.avg_nll <= t75 then 'hard'
       |       else 'expert' end as band
       |from cb_surp s cross join cb_th""".stripMargin
  }

  /** Mirror Dedup.normalizedDedup: the same lowercase / strip /
    * collapse normalization (DuckDB regexp_replace needs the 'g' flag
    * — Spark's replaces all matches by default; the whitespace class
    * is written out because Java \s and RE2 \s disagree on \x0B). */
  val normalizedDedupQ: String =
    """select md5(trim(regexp_replace(regexp_replace(lower(text),
      |    '[^a-z0-9 \t\n\r\f]', '', 'g'), '[ \t\n\r\f]+', ' ', 'g'))) as norm_hash,
      |  count(*) as n_copies,
      |  min(doc_id) as canonical_doc_id,
      |  count(distinct md5(text)) as n_raw_variants
      |from documents group by 1""".stripMargin

  /** Mirror TextStats.langConfusion: labeled lang × predicted lang
    * over the gated text-stats subquery. */
  val langConfusionQ: String =
    s"""select d.lang, t.predicted_lang, count(*) as n_docs
       |from documents d
       |join (select doc_id, predicted_lang from ($textStatsQ) s) t using (doc_id)
       |group by 1, 2""".stripMargin

  /** Mirror Splits.leakageAudit: per-(cluster, split) member counts
    * from the SAME gated cluster and split subqueries, pair counts as
    * Σ nₐ·n_b — identical arithmetic, no pair join. (A `def`: it
    * composes datasetSplitsQ, which initializes LATER in this object —
    * a val here would capture null.) */
  def splitLeakageQ: String = {
    import graft.llm.Splits.SplitNames
    val cnts = SplitNames.map(sp =>
      s"count(case when split = '$sp' then 1 end) as n_$sp").mkString(",\n    ")
    val rows = SplitNames.combinations(2).toSeq.map { case Seq(a, b) =>
      s"""select '$a' as split_a, '$b' as split_b,
         |  cast(coalesce(sum(n_$a * n_$b), 0) as bigint) as n_leaky_pairs,
         |  cast(count(case when n_$a > 0 and n_$b > 0 then 1 end) as bigint) as n_clusters
         |from lk_counts""".stripMargin
    }.mkString("\nunion all\n")
    s"""with lk_cl as (
       |  select doc_id, cluster_id from ($dedupClustersQ) t
       |),
       |lk_sp as (
       |  select doc_id, split from ($datasetSplitsQ) t
       |),
       |lk_counts as (
       |  select cluster_id,
       |    $cnts
       |  from lk_cl join lk_sp using (doc_id)
       |  group by 1
       |)
       |$rows""".stripMargin
  }

  /** Mirror Models.sourceDupMatrix: per-(cluster, source) counts from
    * the gated cluster subquery × documents, pairwise via the bounded
    * cluster self-join, Σ nₐ·n_b. (A `def`: initialization-order
    * safety, like splitLeakageQ.) */
  def sourceDupMatrixQ: String =
    s"""with sdm_cl as (
       |  select doc_id, cluster_id from ($dedupClustersQ) t
       |),
       |sdm_cnt as (
       |  select cluster_id, d.source as g, count(*) as n
       |  from sdm_cl join documents d using (doc_id)
       |  group by 1, 2
       |)
       |select a.g as source_a, b.g as source_b,
       |  cast(sum(a.n * b.n) as bigint) as n_dup_pairs,
       |  count(*) as n_clusters
       |from sdm_cnt a join sdm_cnt b
       |  on a.cluster_id = b.cluster_id and a.g < b.g
       |group by 1, 2""".stripMargin

  /** Mirror Splits.assign: salted 60-bit md5 bucket mod 100. DuckDB's
    * % on non-negative bigints equals Spark's pmod here. */
  val datasetSplitsQ: String = {
    import graft.llm.Splits._
    val b = s"${hex60(s"'$Salt' || cast(doc_id as varchar)")} % 100"
    s"""select doc_id, $b as bucket,
       |  case when $b < $TrainPct then 'train'
       |       when $b < ${TrainPct + ValidationPct} then 'validation'
       |       else 'test' end as split
       |from documents""".stripMargin
  }

  /** Mirror Multimodal.mediaResized. IMAGE rows go through a real JDK
    * PNG decode → nearest-neighbor resize → PNG re-encode → decode
    * round trip on the Spark side; VIDEO rows (r11) through a real
    * animated-GIF decode → poster-frame (frame 0) resize → GIF
    * re-encode → decode round trip. Both thumbnails share the SAME
    * predicted raster: width 64+b0, vertical stripes b2/b4 (frame 0's
    * levels ARE b2/b4), decoder source mapping src_x = x·W // 64 —
    * all 64 thumbnail rows are identical because the stripes are
    * vertical, so the raster hex is repeat(row_hex, 64). Audio rows:
    * real WAV decode → stride-downsample → re-encode round trip. */
  val mediaResizedQ: String = {
    import graft.llm.Multimodal.{ThumbW, ThumbH}
    s"""with m as (
       |  select doc_id, md5(text) as dg, doc_id % 3 as mt from documents
       |),
       |img as (
       |  -- video frames are dim-capped (64+b0%64, see synthesizeGif);
       |  -- images use the full 64+b0
       |  select doc_id, mt,
       |    64 + case when mt = 2 then cast(('0x' || substr(dg, 1, 2)) as int) % 64
       |              else cast(('0x' || substr(dg, 1, 2)) as int) end as w,
       |    substr(dg, 5, 2) as even_hex, substr(dg, 9, 2) as odd_hex
       |  from m where mt in (0, 2)
       |),
       |rowhex as (
       |  select doc_id, mt,
       |    string_agg(case when (x * w // $ThumbW) % 2 = 0
       |                    then even_hex else odd_hex end, '' order by x) as rh
       |  from img cross join (select unnest(generate_series(0, ${ThumbW - 1})) as x) xs
       |  group by doc_id, mt, w, even_hex, odd_hex
       |),
       |aud as (
       |  select doc_id, 256 + 4 * cast(('0x' || substr(dg, 3, 2)) as int) as n,
       |    substr(dg, 5, 2) as even_hex, substr(dg, 9, 2) as odd_hex
       |  from m where mt = 1
       |),
       |-- the WAV downsample keeps sample i·n/64 (floor) of the
       |-- square wave, so the round-tripped hex is parity-of-src-index
       |audhex as (
       |  select doc_id,
       |    string_agg(case when (i * n // $ThumbW) % 2 = 0
       |                    then even_hex else odd_hex end, '' order by i) as ah
       |  from aud cross join (select unnest(generate_series(0, ${ThumbW - 1})) as i) ii
       |  group by doc_id, n, even_hex, odd_hex
       |)
       |select doc_id, case when mt = 0 then 'image' else 'video' end as media_type,
       |  $ThumbW as width, $ThumbH as height,
       |  md5(repeat(rh, $ThumbH)) as content_hash
       |from rowhex
       |union all
       |select doc_id, 'audio' as media_type,
       |  $ThumbW as width, 1 as height,
       |  md5(ah) as content_hash
       |from audhex""".stripMargin
  }

  /** Shared CTEs for the aHash oracle (mirror Multimodal.aHashImage):
    * the Spark side average-pools a REALLY-DECODED raster; the oracle
    * predicts each pooled cell from the stripe generator — cell sum
    * = rows × (evens·b2 + odds·b4) over the cell's column range, bit
    * by the same division-free cross-multiply, bits packed into the
    * same unsigned 32-bit halves. */
  private def mediaAHashCtes: String = {
    s"""ahp as (
       |  select doc_id,
       |    64 + cast(('0x' || substr(md5(text), 1, 2)) as int) as w,
       |    64 + cast(('0x' || substr(md5(text), 3, 2)) as int) as h,
       |    cast(('0x' || substr(md5(text), 5, 2)) as int) as b2,
       |    cast(('0x' || substr(md5(text), 9, 2)) as int) as b4
       |  from documents where doc_id % 3 = 0
       |),
       |ah_cell as (
       |  select doc_id, w, h, b2, b4, cy, cx,
       |    cx * w // 8 as x0, (cx + 1) * w // 8 as x1,
       |    cy * h // 8 as y0, (cy + 1) * h // 8 as y1
       |  from ahp
       |  cross join (select unnest(generate_series(0, 7)) as cy) ys
       |  cross join (select unnest(generate_series(0, 7)) as cx) xs
       |),
       |ah_bit as (
       |  select doc_id, cast(cy * 8 + cx as int) as k,
       |    case when
       |      cast(y1 - y0 as bigint)
       |        * (((x1+1)//2 - (x0+1)//2) * b2
       |           + ((x1-x0) - ((x1+1)//2 - (x0+1)//2)) * b4)
       |        * (cast(w as bigint) * h)
       |      > cast(h as bigint) * (((w+1)//2) * b2 + (w - (w+1)//2) * b4)
       |        * (cast(x1 - x0 as bigint) * (y1 - y0))
       |    then 1 else 0 end as bit
       |  from ah_cell
       |),
       |ah_sig as (
       |  select doc_id,
       |    cast(sum(case when k >= 32
       |      then bit * (cast(1 as bigint) << (k - 32)) else 0 end) as bigint) as h_hi,
       |    cast(sum(case when k < 32
       |      then bit * (cast(1 as bigint) << k) else 0 end) as bigint) as h_lo
       |  from ah_bit group by 1
       |)""".stripMargin
  }

  /** Mirror Multimodal.mediaAHash: the signature table. */
  val mediaAHashQ: String =
    s"""with $mediaAHashCtes
       |select doc_id,
       |  lpad(lower(hex(h_hi)), 8, '0') || lpad(lower(hex(h_lo)), 8, '0') as ahash,
       |  h_hi, h_lo
       |from ah_sig""".stripMargin

  /** Mirror Multimodal.aHashPairs: 16-bit band buckets, overfull
    * buckets skipped at the cap, exact Hamming on survivors. */
  val mediaAHashPairsQ: String = {
    import graft.llm.Multimodal.{AHashBucketCap, AHashMaxHamming}
    s"""with $mediaAHashCtes,
       |ah_band as (
       |  select doc_id, h_hi, h_lo, 0 as band, h_lo & 65535 as v from ah_sig
       |  union all
       |  select doc_id, h_hi, h_lo, 1, (h_lo >> 16) & 65535 from ah_sig
       |  union all
       |  select doc_id, h_hi, h_lo, 2, h_hi & 65535 from ah_sig
       |  union all
       |  select doc_id, h_hi, h_lo, 3, (h_hi >> 16) & 65535 from ah_sig
       |),
       |ah_ok as (select band, v from ah_band group by 1, 2
       |          having count(*) <= $AHashBucketCap),
       |ah_cap as materialized (
       |  select b.* from ah_band b join ah_ok using (band, v)
       |),
       |ah_pairs as (
       |  select distinct a.doc_id as doc_a, b.doc_id as doc_b,
       |    a.h_hi as hi_a, a.h_lo as lo_a, b.h_hi as hi_b, b.h_lo as lo_b
       |  from ah_cap a join ah_cap b
       |    on a.band = b.band and a.v = b.v and a.doc_id < b.doc_id
       |)
       |select doc_a, doc_b,
       |  lpad(lower(hex(hi_a)), 8, '0') || lpad(lower(hex(lo_a)), 8, '0') as ahash_a,
       |  lpad(lower(hex(hi_b)), 8, '0') || lpad(lower(hex(lo_b)), 8, '0') as ahash_b,
       |  cast(bit_count(xor(hi_a, hi_b)) + bit_count(xor(lo_a, lo_b)) as bigint) as hamming
       |from ah_pairs
       |where bit_count(xor(hi_a, hi_b)) + bit_count(xor(lo_a, lo_b))
       |      <= $AHashMaxHamming""".stripMargin
  }

  /** Mirror Multimodal.mediaFrames (REAL since r11): the Spark side
    * decodes the animated GIF and fingerprints each sampled frame's
    * recovered raster via an 8×8 nearest-neighbor grid. The oracle
    * predicts that grid from the generator parameters: frame f's
    * stripe levels are (b2+17f)%256 / (b4+17f)%256, grid cell (x,y)
    * samples source column x·w//8 whose parity picks the level, and
    * all 8 grid rows are identical (vertical stripes) — so the hex
    * dump is repeat(row8, 8). n_frames = 1 + hi(b3) is what the GIF
    * reader must count back; timestamps are exact floor division. */
  val mediaFramesQ: String = {
    import graft.llm.Multimodal.{FrameSampleMax, FrameGridN, FrameLevelStep}
    s"""with mm as (
       |  select doc_id, n_chars * 10 as duration_ms,
       |    64 + cast(('0x' || substr(md5(text), 1, 2)) as int) % 64 as w,
       |    cast(('0x' || substr(md5(text), 5, 2)) as int) as b2,
       |    cast(('0x' || substr(md5(text), 9, 2)) as int) as b4,
       |    1 + cast(('0x' || substr(md5(text), 7, 1)) as int) as n_frames
       |  from documents where doc_id % 3 = 2
       |),
       |mf as (
       |  select doc_id, duration_ms, w, b2, b4, n_frames,
       |    unnest(generate_series(0, n_frames - 1,
       |      cast((n_frames + $FrameSampleMax - 1) // $FrameSampleMax as int))) as frame_idx
       |  from mm
       |),
       |grid as (
       |  select doc_id, duration_ms, n_frames, frame_idx,
       |    string_agg(lpad(lower(hex(
       |      case when (x * w // $FrameGridN) % 2 = 0
       |           then (b2 + $FrameLevelStep * frame_idx) % 256
       |           else (b4 + $FrameLevelStep * frame_idx) % 256 end)), 2, '0'),
       |      '' order by x) as row8
       |  from mf cross join (select unnest(generate_series(0, ${FrameGridN - 1})) as x) xs
       |  group by doc_id, duration_ms, n_frames, frame_idx
       |)
       |select doc_id, cast(frame_idx as int) as frame_idx,
       |  cast(duration_ms * frame_idx // n_frames as bigint) as frame_ts_ms,
       |  md5(repeat(row8, $FrameGridN)) as frame_hash
       |from grid""".stripMargin
  }

  /** Mirror Multimodal.mediaFeatures. IMAGE rows are decoded by a real
    * `ImageIO.read` on the Spark side; the oracle predicts what the
    * decoder must recover from the synthesized PNG: dimensions
    * (64+b0)×(64+b1), brightness = exact mean of the striped raster
    * (⌈w/2⌉ even columns at b2, ⌊w/2⌋ odd columns at b4 — the same
    * integer sum then the same two double divisions), and the feature
    * hash packed from decoded (w−64, h−64, stripe levels). AUDIO rows
    * are decoded by a real `javax.sound.sampled` WAV read; the oracle
    * predicts the decoded sample rate (8000+100·b0 → width), frame
    * count (256+4·b1 → height), mean amplitude of the b2/b4 square
    * wave, and the rate/length/level feature-hash pack. VIDEO rows
    * (r11) are decoded by a real animated-GIF read: the oracle
    * predicts the reader's frame count (1+hi(b3)), frame-0 stripe
    * levels (b2/b4 → the image-style feature-hash pack), and the
    * mean over ALL frames, where frame f's levels walk
    * (b2+17f)%256 / (b4+17f)%256 — summed per doc over an unnested
    * frame series exactly as the Spark side sums decoded rasters. */
  val mediaFeaturesQ: String = {
    import graft.llm.Multimodal.FrameLevelStep
    s"""with m as (
      |  select doc_id, md5(text) as dg, doc_id % 3 as mt from documents
      |),
      |p as (
      |  select doc_id, mt,
      |    cast(('0x' || substr(dg, 1, 2)) as int) as b0,
      |    cast(('0x' || substr(dg, 3, 2)) as int) as b1,
      |    cast(('0x' || substr(dg, 5, 2)) as int) as b2,
      |    cast(('0x' || substr(dg, 7, 1)) as int) as b3hi,
      |    cast(('0x' || substr(dg, 9, 2)) as int) as b4
      |  from m
      |),
      |-- image: w×h striped raster; audio: REAL WAV round trip — rate
      |-- 8000+100·b0, n = 256+4·b1 samples alternating b2/b4; video:
      |-- REAL animated-GIF round trip — 1+b3hi striped frames
      |q as (
      |  select *, 64 + b0 as w, 64 + b1 as h,
      |    64 + b0 % 64 as vw, 64 + b1 % 64 as vh,
      |    8000 + 100 * b0 as rate, 256 + 4 * b1 as n
      |  from p
      |),
      |-- per-video pixel sum over every frame's raster (video frames
      |-- are dim-capped at 64+b%64 — see synthesizeGif)
      |vb as (
      |  select doc_id,
      |    sum(((vw + 1) // 2 * ((b2 + $FrameLevelStep * f) % 256)
      |       + vw // 2 * ((b4 + $FrameLevelStep * f) % 256)) * vh) as vsum
      |  from q cross join (select unnest(generate_series(0, 15)) as f) fs
      |  where mt = 2 and f <= b3hi
      |  group by doc_id
      |)
      |select doc_id,
      |  case when mt = 0 then 'image'
      |       when mt = 1 then 'audio'
      |       else 'video' end as media_type,
      |  cast(case when mt = 1 then rate when mt = 2 then vw else w end as int) as width,
      |  cast(case when mt = 1 then n when mt = 2 then vh else h end as int) as height,
      |  case when mt = 0
      |    then cast(((w + 1) // 2 * b2 + w // 2 * b4) * h as double)
      |         / (w * h) / 255.0
      |  when mt = 1
      |    then cast((n + 1) // 2 * b2 + n // 2 * b4 as double) / n / 255.0
      |  else cast(vsum as double) / (cast(1 + b3hi as bigint) * vw * vh) / 255.0
      |  end as brightness,
      |  cast(case when mt = 2 then 1 + b3hi else 1 end as int) as n_frames,
      |  cast(case when mt = 1
      |    then cast(b0 as bigint) * 16777216
      |         + cast(b1 as bigint) * 65536 + b2 * 256 + b4
      |  when mt = 2
      |    then cast(vw - 64 as bigint) * 16777216
      |         + cast(vh - 64 as bigint) * 65536 + b2 * 256 + b4
      |  else cast(w - 64 as bigint) * 16777216
      |       + cast(h - 64 as bigint) * 65536 + b2 * 256 + b4
      |  end as bigint) as feature_hash
      |from q left join vb using (doc_id)""".stripMargin
  }

  /** Mirror TextStats.topDocsPerLang: the bounded-heap top_k aggregate
    * is row-equal to the row_number window with the SAME total order
    * (score desc, doc_id asc) by construction — the oracle gates
    * exactly that equivalence over the shared text-stats formulas. */
  val topDocsPerLangQ: String =
    s"""with tds as (
       |  select predicted_lang, doc_id, quality_score from ($textStatsQ) t
       |),
       |ranked as (
       |  select predicted_lang, doc_id, quality_score,
       |    row_number() over (partition by predicted_lang
       |                       order by quality_score desc, doc_id) as rn
       |  from tds
       |)
       |select predicted_lang, cast(rn as int) as rank, doc_id, quality_score
       |from ranked where rn <= ${graft.llm.TextStats.TopDocsK}""".stripMargin

  /** Mirror Models.dedupIncrementalPairs: the incremental band join is
    * EXACTLY the full-recompute pair set restricted to pairs touching
    * a new (doc_id % 5 = 0) document — the oracle gates that
    * equivalence (IncrementalDedupSpec proves it structurally). */
  val dedupIncrementalPairsQ: String =
    s"""select doc_a, doc_b, n_shared_bands from ($minhashPairsQ) t
       |where doc_a % 5 = 0 or doc_b % 5 = 0""".stripMargin

  /** Mirror Packing.packSequences over relation `rel` (needs source,
    * doc_id, n_chars): the same salted pack bucket, the same (source,
    * bucket, doc_id-ordered) window cumsum, `//` for Spark's `div`
    * (both LONG integer division). */
  def packSequencesOver(rel: String): String = {
    import graft.llm.Packing.{PackBudget, PackBuckets, PackSalt}
    s"""with pk as (
       |  select source, doc_id,
       |    cast(('0x' || substr(md5('$PackSalt' || cast(doc_id as varchar)), 1, 15)) as bigint) % $PackBuckets as bucket,
       |    ${graft.llm.TextStats.nTokensEstSql("n_chars")} as n_tokens
       |  from $rel
       |),
       |c as (
       |  select source, bucket, doc_id, n_tokens,
       |    -- DuckDB sums bigint to HUGEINT; Spark's sum stays long
       |    cast(sum(n_tokens) over (partition by source, bucket order by doc_id
       |                        rows between unbounded preceding and current row) as bigint) as cum_tokens
       |  from pk
       |)
       |select source, bucket, doc_id, n_tokens,
       |  (cum_tokens - n_tokens) // $PackBudget as seq_index,
       |  (cum_tokens - n_tokens) % $PackBudget as offset_in_seq
       |from c""".stripMargin
  }

  val packSequencesQ: String = packSequencesOver("documents")

  /** Mirror Packing.lengthBucketedBatches: the same power-of-two
    * ladder (bigint-cast labels — Spark's are long), the same salted
    * sub-bucket, the same longest-first row_number batching, and the
    * efficiency ratio as one double division of exact integer sums. */
  val lengthBucketedBatchesQ: String = {
    import graft.llm.Packing.{BatchSize, LenSalt, LenSubBuckets}
    s"""with lb as (
       |  select doc_id,
       |    ${graft.llm.TextStats.nTokensEstSql("n_chars")} as n_tokens,
       |    ${hex60(s"'$LenSalt' || cast(doc_id as varchar)")} % $LenSubBuckets as sub
       |  from documents
       |),
       |lb2 as (
       |  select doc_id, n_tokens, sub,
       |    cast(case when n_tokens <= 64 then 64 when n_tokens <= 128 then 128
       |      when n_tokens <= 256 then 256 when n_tokens <= 512 then 512
       |      when n_tokens <= 1024 then 1024 else 4096 end as bigint) as len_bucket
       |  from lb
       |),
       |r as (
       |  select len_bucket, sub, n_tokens,
       |    row_number() over (partition by len_bucket, sub
       |      order by n_tokens desc, doc_id) as rn
       |  from lb2
       |)
       |select len_bucket, sub, (rn - 1) // $BatchSize as batch_idx,
       |  count(*) as n_docs, max(n_tokens) as max_tokens,
       |  cast(sum(n_tokens) as bigint) as sum_tokens,
       |  cast(sum(n_tokens) as double) / (count(*) * max(n_tokens)) as pad_efficiency
       |from r group by 1, 2, 3""".stripMargin
  }

  /** Mirror Models.trainingCorpus — the end-to-end composition: the
    * curation verdicts, the split assignment, and the packing window
    * are the SAME subqueries as their standalone oracles, so the
    * pipeline cannot drift from its gated components. */
  val trainingCorpusQ: String = {
    s"""with tc_kept as (
       |  select doc_id from ($corpusCurationQ) t where status = 'kept'
       |),
       |tc_train as (
       |  select doc_id from ($datasetSplitsQ) t where split = 'train'
       |),
       |tc_base as (
       |  select d.source, d.doc_id, d.n_chars from documents d
       |  join tc_kept using (doc_id)
       |  join tc_train using (doc_id)
       |)
       |select * from (${packSequencesOver("tc_base")}) t""".stripMargin
  }

  /** Mirror sources.Corpus.roundtripAudit FROM THE PARQUET SIDE: the
    * per-source md5-fold checksum over (doc_id|lang|text) only matches
    * if the JSONL write→read roundtrip preserved every value
    * byte-identically, and the `__quarantine__` literal only matches
    * if exactly the injected corrupt lines (and no clean rows) were
    * quarantined. */
  val jsonlIngestAuditQ: String = {
    import graft.sources.Corpus.{ChecksumMod, CorruptLines}
    s"""select source, count(*) as n_docs,
       |  cast(sum(n_chars) as bigint) as sum_chars,
       |  cast(sum(${hex60("cast(doc_id as varchar) || '|' || lang || '|' || text")}
       |    % $ChecksumMod) as bigint) as checksum
       |from documents group by 1
       |union all
       |select '__quarantine__', cast(${CorruptLines.size} as bigint), 0, 0""".stripMargin
  }

  /** Mirror Models.corpusDatasheet: one-row rollup composed from the
    * same gated component oracles. */
  val corpusDatasheetQ: String =
    s"""with dsh_ts as (
       |  select count(*) as n_docs,
       |    cast(sum(n_tokens_est) as bigint) as total_tokens_est
       |  from ($textStatsQ) t
       |),
       |dsh_cur as (
       |  select
       |    count(case when status = 'kept' then 1 end) as n_kept,
       |    count(case when status = 'low_quality' then 1 end) as n_low_quality,
       |    count(case when status = 'exact_duplicate' then 1 end) as n_exact_duplicate,
       |    count(case when status = 'near_duplicate' then 1 end) as n_near_duplicate
       |  from ($corpusCurationQ) t
       |),
       |dsh_sp as (
       |  select
       |    count(case when split = 'train' then 1 end) as n_train,
       |    count(case when split = 'validation' then 1 end) as n_validation,
       |    count(case when split = 'test' then 1 end) as n_test
       |  from ($datasetSplitsQ) t
       |)
       |select n_docs, total_tokens_est, n_kept, n_low_quality,
       |  n_exact_duplicate, n_near_duplicate, n_train, n_validation, n_test,
       |  case when n_docs > 0
       |    then cast(n_kept as double) / cast(n_docs as double)
       |    else 0.0 end as kept_frac
       |from dsh_ts cross join dsh_cur cross join dsh_sp""".stripMargin

  /** Mirror Packing.shardStats over the training corpus: the SAME
    * salted-hash shard key on the composed pack output. */
  val trainingShardsQ: String = {
    import graft.llm.Packing
    val key = "'" + Packing.ShardSalt +
      "' || source || '|' || cast(bucket as varchar) || '|' || cast(seq_index as varchar)"
    s"""with ts_packed as (select * from ($trainingCorpusQ) t),
       |ts_sharded as (
       |  select *, ${hex60(key)} % ${Packing.NShards} as shard from ts_packed
       |)
       |select shard,
       |  count(distinct (source, bucket, seq_index)) as n_seqs,
       |  count(*) as n_docs,
       |  cast(sum(n_tokens) as bigint) as n_tokens
       |from ts_sharded group by 1""".stripMargin
  }

  /** Mirror Splits.weightedSample: the SAME md5-60 uniform, the SAME
    * ln(u)/w Efraimidis–Spirakis priority (double arithmetic is
    * identical on both engines; the +1.0 rides in double on both), the
    * SAME (priority desc, doc_id) total order. */
  val weightedSampleQ: String = {
    import graft.llm.Splits.{WeightedK, WeightedSalt}
    s"""with pr as (
       |  select source, doc_id, n_chars,
       |    ln((cast(cast(('0x' || substr(md5('$WeightedSalt' || cast(doc_id as varchar)), 1, 15)) as bigint) as double) + 1.0)
       |        / 1152921504606846976.0)
       |      / cast(greatest(n_chars, 1) as double) as priority
       |  from documents
       |),
       |r as (
       |  select source, doc_id, n_chars,
       |    row_number() over (partition by source order by priority desc, doc_id) as rn
       |  from pr
       |)
       |select source, cast(rn as int) as rank, doc_id, n_chars
       |from r where rn <= $WeightedK""".stripMargin
  }

  /** Mirror Models.nameMatchClusters: the blocked levenshtein edges
    * (same chain as OpsSql.fuzzyNameMatchQ) closed through the SAME
    * unrolled connected-components rounds — min-label over VARCHAR is
    * the lexicographic minimum on both engines (ASCII names, binary
    * collation). */
  val nameMatchClustersQ: String = {
    import graft.operators.Fuzzy.{BlockCap, ClusterMaxDist}
    val edges =
      s"""  select doc_a, doc_b from (
         |    with fz_names as (
         |      select distinct p_name as name from part where p_name is not null
         |    ),
         |    fz_blocked as (
         |      select name, regexp_extract(name, '(\\S+)$$', 1) as block from fz_names
         |    ),
         |    fz_ok as (
         |      select block from fz_blocked group by 1
         |      having count(*) <= $BlockCap and count(*) >= 2
         |    ),
         |    fz_capped as (select b.* from fz_blocked b join fz_ok using (block))
         |    select a.name as doc_a, b.name as doc_b
         |    from fz_capped a join fz_capped b
         |      on a.block = b.block and a.name < b.name
         |    where levenshtein(a.name, b.name) <= $ClusterMaxDist
         |  ) t""".stripMargin
    s"""select doc_id as name, cluster_id, cluster_size from (
       |${ccOverEdges(edges)}
       |) t""".stripMargin
  }

  /** Mirror Relevance.bigramSurprisal: the same "prev cur" bigram key
    * (words are \s+-split, so split_part on the single space recovers
    * the context exactly as Spark's substring_index does), the same
    * quantized-ln + exact decimal tf-weighted sum recipe as the
    * unigram oracle. Documents under 2 tokens produce no bigrams and
    * drop out on both engines. */
  /** Mirror Relevance.kneserNeyBigrams: the same exact-integer count
    * tables and the same explicitly-parenthesized IEEE tree
    * (c−D)/ctx + ((D·nf)/ctx)·(np/B). DuckDB's bigint sums narrow
    * back from hugeint. */
  val kneserNeyBigramsQ: String = {
    val d = graft.llm.Relevance.KnDiscount
    s"""with $textCtes,
       |kn_bg as (
       |  select unnest(case when len(w) >= 2
       |      then list_transform(generate_series(1, len(w) - 1),
       |             i -> w[i] || ' ' || w[i+1])
       |      else [] end) as bg
       |  from doc_words
       |),
       |kn_cnt as (
       |  select bg, split_part(bg, ' ', 1) as pv, split_part(bg, ' ', 2) as cur,
       |    cast(count(*) as bigint) as big_cnt
       |  from kn_bg group by 1
       |),
       |kn_ctx as (
       |  select pv, cast(sum(big_cnt) as bigint) as ctx_cnt,
       |    cast(count(*) as bigint) as n_follow
       |  from kn_cnt group by 1
       |),
       |kn_cont as (
       |  select cur, cast(count(*) as bigint) as n_prec from kn_cnt group by 1
       |),
       |kn_types as (select cast(count(*) as bigint) as n_bigram_types from kn_cnt)
       |select pv as prev_term, cur as cur_term,
       |  big_cnt, ctx_cnt, n_follow, n_prec, n_bigram_types,
       |  (cast(big_cnt as double) - $d) / cast(ctx_cnt as double)
       |    + (($d * cast(n_follow as double)) / cast(ctx_cnt as double))
       |      * (cast(n_prec as double) / cast(n_bigram_types as double)) as p_kn
       |from kn_cnt join kn_ctx using (pv) join kn_cont using (cur)
       |cross join kn_types""".stripMargin
  }

  val bigramSurprisalQ: String =
    s"""with $textCtes,
       |bg_rows as (
       |  select doc_id,
       |    unnest(case when len(w) >= 2
       |      then list_transform(generate_series(1, len(w) - 1),
       |             i -> w[i] || ' ' || w[i+1])
       |      else [] end) as bg
       |  from doc_words
       |),
       |bg_tf as (select doc_id, bg, count(*) as tf from bg_rows group by 1, 2),
       |bg_cnt as (select bg, cast(sum(tf) as bigint) as big_cnt from bg_tf group by 1),
       |bg_ctx as (
       |  select split_part(bg, ' ', 1) as pv, cast(sum(big_cnt) as bigint) as ctx_cnt
       |  from bg_cnt group by 1
       |),
       |bg_nll as (
       |  select doc_id, tf,
       |    cast(ln(cast(ctx_cnt as double) / cast(big_cnt as double))
       |      as decimal(18,9)) as nll
       |  from bg_tf join bg_cnt using (bg)
       |  join bg_ctx on split_part(bg, ' ', 1) = pv
       |)
       |select doc_id,
       |  cast(sum(tf) as bigint) as n_bigrams,
       |  cast(cast(sum(nll * tf) as varchar) as double)
       |    / cast(cast(sum(tf) as bigint) as double) as avg_bigram_nll
       |from bg_nll group by 1""".stripMargin

  /** Mirror llm.Bpe.train: the K merge iterations unrolled as a CTE
    * chain generated from the SAME MergeCount, with the SAME greedy
    * left-to-right fold (DuckDB `list_reduce` with first-element
    * initial accumulator ≡ Spark `aggregate(slice(s,2,…), s[1], …)`),
    * and the same (count desc, pair asc) argmax total order. The
    * exhaustion sentinel TEXT differs from the Spark side ("   "
    * here, NUL-space-NUL in Bpe.Sentinel) — deliberately equivalent:
    * both carry cnt = -1, which can never win the argmax against a
    * real pair (cnt >= 1) and is filtered by cnt >= 0 before any
    * symbol comparison, so the sentinel text never reaches output. */
  private val bpeCtes: String = {
    val iters = (1 to graft.llm.Bpe.MergeCount).map { k =>
      val p = k - 1
      s"""bpe_p$k as (
         |  select pair, cast(sum(freq) as bigint) as cnt from (
         |    select freq, unnest(case when len(s) >= 2
         |      then list_transform(generate_series(1, len(s) - 1),
         |             i -> s[i] || ' ' || s[i+1])
         |      else [] end) as pair
         |    from (select freq, string_split(syms, ' ') as s from bpe_w$p) t
         |  ) t group by 1
         |),
         |bpe_t$k as (
         |  select split_part(pair, ' ', 1) as a, split_part(pair, ' ', 2) as b, cnt
         |  from (select * from bpe_p$k
         |        union all select '   ', cast(-1 as bigint))
         |  order by cnt desc, pair asc limit 1
         |),
         |bpe_w$k as (
         |  select word, freq,
         |    list_reduce(string_split(syms, ' '),
         |      (acc, x) -> case when (acc = a or ends_with(acc, ' ' || a)) and x = b
         |                  then acc || x else acc || ' ' || x end) as syms
         |  from bpe_w$p cross join bpe_t$k
         |)""".stripMargin
    }.mkString(",\n")
    s"""bpe_wf as (
       |  select word, cast(count(*) as bigint) as freq from (
       |    select unnest(w) as word from doc_words
       |  ) t group by 1
       |),
       |bpe_w0 as (
       |  select word, freq,
       |    array_to_string(list_transform(generate_series(1, length(word)),
       |      i -> word[i]), ' ') as syms
       |  from bpe_wf
       |),
       |$iters""".stripMargin
  }

  val bpeMergesQ: String = {
    val rows = (1 to graft.llm.Bpe.MergeCount).map { k =>
      s"select $k as merge_rank, a as left_sym, b as right_sym, a || b as merged, " +
        s"cnt as pair_freq from bpe_t$k where cnt >= 0"
    }.mkString("\nunion all\n")
    s"with $textCtes,\n$bpeCtes\n$rows"
  }

  val bpeSegmentationQ: String =
    s"""with $textCtes,
       |$bpeCtes
       |select word, freq, cast(len(string_split(syms, ' ')) as bigint) as n_pieces,
       |  syms as pieces
       |from bpe_w${graft.llm.Bpe.MergeCount}""".stripMargin

  /** Mirror Bpe.vocabIds: piece occurrence totals from the final
    * segmentation, dense ids in (count desc, piece asc) order — the
    * two-phase globalRank is byte-identical to this global window. */
  val bpeVocabIdsQ: String =
    s"""with $textCtes,
       |$bpeCtes,
       |bpe_vocab as (
       |  select piece, cast(sum(freq) as bigint) as n_occurrences from (
       |    select freq, unnest(string_split(syms, ' ')) as piece
       |    from bpe_w${graft.llm.Bpe.MergeCount}
       |  ) t group by 1
       |)
       |select piece,
       |  cast(row_number() over (order by n_occurrences desc, piece asc) as bigint) as piece_id,
       |  n_occurrences
       |from bpe_vocab""".stripMargin

  /** Mirror Bpe.tokenCounts: per-occurrence join of corpus words to
    * the final segmentation's piece counts. */
  val bpeTokenCountsQ: String =
    s"""with $textCtes,
       |$bpeCtes,
       |btc_words as (select doc_id, unnest(w) as word from doc_words),
       |btc_seg as (
       |  select word, cast(len(string_split(syms, ' ')) as bigint) as n_pieces
       |  from bpe_w${graft.llm.Bpe.MergeCount}
       |)
       |select doc_id, cast(count(*) as bigint) as n_words,
       |  cast(sum(n_pieces) as bigint) as n_bpe_tokens
       |from btc_words join btc_seg using (word)
       |group by 1""".stripMargin

  /** Mirror Bpe.fertilityByLang: the token-counts subquery rolled up
    * per language, fertility as one double division of exact sums. */
  val bpeFertilityQ: String =
    s"""select lang, count(*) as n_docs,
       |  cast(sum(n_words) as bigint) as total_words,
       |  cast(sum(n_bpe_tokens) as bigint) as total_bpe_tokens,
       |  cast(sum(n_bpe_tokens) as double) / cast(sum(n_words) as double) as fertility
       |from ($bpeTokenCountsQ) t join documents using (doc_id)
       |group by 1""".stripMargin

  /** Mirror TextStats.vocabCoverage: the same (count desc, term asc)
    * deterministic top-K vocabulary cut, the same left-join OOV count,
    * one double division at the boundary. */
  val vocabCoverageQ: String = {
    import graft.llm.TextStats.VocabK
    s"""with $textCtes,
       |vc_toks as (select doc_id, unnest(w) as term from doc_words),
       |vc_cnt as (select term, cast(count(*) as bigint) as cnt from vc_toks group by 1),
       |vc_vocab as (
       |  select term, 1 as in_vocab from vc_cnt
       |  order by cnt desc, term asc limit $VocabK
       |)
       |select t.doc_id,
       |  cast(count(*) as bigint) as n_tokens,
       |  cast(count(case when v.in_vocab is null then 1 end) as bigint) as n_oov,
       |  cast(count(case when v.in_vocab is null then 1 end) as double)
       |    / cast(count(*) as double) as oov_frac
       |from vc_toks t left join vc_vocab v on t.term = v.term
       |group by 1""".stripMargin
  }

  /** Mirror HashEmbed.hashedEmbeddings: bucket = md5-60(term) mod Dim,
    * sign from hash bit 4, exact integer sums per (doc, bucket). */
  val hashedEmbeddingsQ: String = {
    import graft.llm.HashEmbed.Dim
    s"""with $textCtes,
       |he_tok as (select doc_id, unnest(w) as term from doc_words),
       |he_b as (
       |  select doc_id, (${hex60("term")}) % $Dim as bucket,
       |    case when ((${hex60("term")}) >> 4) % 2 = 0 then 1 else -1 end as sgn
       |  from he_tok
       |)
       |select doc_id, cast(bucket as int) as bucket,
       |  count(*) as n_terms, cast(sum(sgn) as bigint) as v
       |from he_b group by 1, 2""".stripMargin
  }

  /** Shared hybrid CTE chain, parameterized by the query-id bound:
    * the BM25 arm re-uses the gated tf-idf query verbatim for
    * query-term selection and adds its ≤3 per-candidate term scores in
    * FIXED rank order (the bm25 literal-pivot device keyed by tf-idf
    * rank); the sparse hashed vectors (hv/hnrm) and per-pair exact
    * integer dots (hdot — absent pairs coalesce to 0, identical to
    * the engine's dense zip_with fold where absent buckets hold 0)
    * feed both the exact and the index-served semantic arms. */
  private def hybridSharedCtes(bound: Long): String = {
    import graft.llm.HashEmbed.Dim
    import graft.llm.Relevance.{K1, B, TfidfTopK}
    val lexSum = (1 to TfidfTopK)
      .map(r => s"coalesce(max(case when rank = $r then s end), 0.0)")
      .mkString("\n    + ")
    s"""hq as (select doc_id as query_doc_id, term, rank
       |       from ($tfidfTopTermsQ) t
       |       where doc_id % 29 = 3 and doc_id < $bound),
       |hdl as (select doc_id, cast(len(w) as bigint) as dl from doc_words),
       |hcorp as (select count(*) as n_docs, sum(dl) as total_len from hdl),
       |htf as (
       |  select doc_id, dl, w as term, count(*) as tf from (
       |    select doc_id, dl, unnest(w) as w
       |    from doc_words join hdl using (doc_id)
       |  ) t where w in (select term from hq) group by 1, 2, 3
       |),
       |hdf as (select term, count(*) as df from htf group by 1),
       |hsc as (
       |  select doc_id, term,
       |    cast(cast(ln((n_docs - df + 0.5) / (df + 0.5) + 1.0) as decimal(18,9)) as double)
       |      * tf * ($K1 + 1) /
       |      (tf + $K1 * (1.0 - $B + $B * cast(dl as double)
       |        / (cast(total_len as double) / cast(n_docs as double)))) as s
       |  from htf join hdf using (term) cross join hcorp
       |),
       |hscr as (
       |  select *, row_number() over (partition by term
       |                               order by s desc, doc_id) as impact_rank
       |  from hsc
       |),
       |hlex_ix as (
       |  select query_doc_id, doc_id,
       |    $lexSum as lex_score
       |  from hscr join hq using (term)
       |  where doc_id != query_doc_id
       |    and impact_rank <= ${graft.llm.HashEmbed.ImpactCap}
       |  group by 1, 2
       |),
       |hlextop_ix as (
       |  select query_doc_id, doc_id, cast(rn as int) as lex_rank from (
       |    select query_doc_id, doc_id,
       |      row_number() over (partition by query_doc_id
       |                         order by lex_score desc, doc_id) as rn
       |    from hlex_ix) t where rn <= ${graft.llm.HashEmbed.TopK}
       |),
       |hlex_ex as (
       |  select query_doc_id, doc_id,
       |    $lexSum as lex_score
       |  from hsc join hq using (term)
       |  where doc_id != query_doc_id
       |  group by 1, 2
       |),
       |hlextop_ex as (
       |  select query_doc_id, doc_id, cast(rn as int) as lex_rank from (
       |    select query_doc_id, doc_id,
       |      row_number() over (partition by query_doc_id
       |                         order by lex_score desc, doc_id) as rn
       |    from hlex_ex) t where rn <= ${graft.llm.HashEmbed.TopK}
       |),
       |hv as (
       |  select doc_id, (${hex60("term")}) % $Dim as bucket,
       |    sum(case when ((${hex60("term")}) >> 4) % 2 = 0 then 1 else -1 end) as v
       |  from (select doc_id, unnest(w) as term from doc_words) t
       |  group by 1, 2
       |),
       |hnrm as (select doc_id, sum(v * v) as nrm from hv group by 1
       |         having sum(v * v) > 0),
       |hdot as (
       |  select a.doc_id as query_doc_id, b.doc_id as doc_id,
       |    sum(a.v * b.v) as dot
       |  from hv a join hv b on a.bucket = b.bucket
       |  where a.doc_id % 29 = 3 and a.doc_id < $bound and b.doc_id != a.doc_id
       |  group by 1, 2
       |)""".stripMargin
  }

  /** The index-served semantic arm (mirror HashEmbed.semBandTable +
    * the band-probe): 1-based hyperplane signs from the
    * SignedProjection modular formula at position bucket+1, band
    * buckets as bit-packed sign tests, candidates = distinct pairs
    * colliding in ≥1 band, exact cosine over the candidates only. */
  private def hybridIndexedCtes(bound: Long, statsFilter: String = ""): String = {
    import graft.llm.HashEmbed.{SemBands, SemBandBits, TopK}
    val nProj = SemBands * SemBandBits
    def signedSum(k: Int, v: String) =
      s"sum(case when ((bucket + 1) * 2654435761 + ${k.toLong * 40503L}) % 97 < 48" +
        s" then -$v else $v end)"
    val rawProjs = (0 until nProj).map(k => s"${signedSum(k, "v")} as r$k")
      .mkString(",\n    ")
    val sumProjs = (0 until nProj).map(k => s"${signedSum(k, "s")} as q$k")
      .mkString(",\n    ")
    // centered p_k = n·p_k(vec) − p_k(S) — mirror HashEmbed.proj
    val centered = (0 until nProj).map(k => s"n * r$k - q$k as p$k")
      .mkString(",\n    ")
    val bandSel = (0 until SemBands).map { b =>
      val bits = (0 until SemBandBits)
        .map(j => s"(case when p${b * SemBandBits + j} > 0 then ${1L << j} else 0 end)")
        .mkString(" + ")
      s"select doc_id, $b as band, $bits as bkt from hproj"
    }.mkString("\nunion all\n")
    s"""hvsum as (
       |  select bucket, sum(v) as s from hv join hnrm using (doc_id) $statsFilter
       |  group by 1
       |),
       |hn as (select count(*) as n from hnrm $statsFilter),
       |hps as (
       |  select
       |    $sumProjs
       |  from hvsum
       |),
       |hraw as (
       |  select doc_id,
       |    $rawProjs
       |  from hv join hnrm using (doc_id)
       |  group by 1
       |),
       |hproj as materialized (
       |  select doc_id,
       |    $centered
       |  from hraw cross join hn cross join hps
       |),
       |hband as materialized (
       |$bandSel
       |),
       |hqp as (
       |  select doc_id, band, bkt from hband
       |  where doc_id % 29 = 3 and doc_id < $bound
       |${if (!graft.llm.HashEmbed.SemProbeHamming1) "" else
        (0 until SemBandBits).map(j =>
          s"""  union all
             |  select doc_id, band, xor(bkt, ${1L << j}) as bkt from hband
             |  where doc_id % 29 = 3 and doc_id < $bound""".stripMargin)
          .mkString("\n", "\n", "")}
       |),
       |hcand as (
       |  select distinct q.doc_id as query_doc_id, c.doc_id as doc_id
       |  from hqp q join hband c on q.band = c.band and q.bkt = c.bkt
       |  where c.doc_id != q.doc_id
       |),
       |hsem_ix as (
       |  select hc.query_doc_id, hc.doc_id,
       |    cast(coalesce(dot, 0) as double)
       |      / (sqrt(cast(c.nrm as double)) * sqrt(cast(q.nrm as double))) as cos
       |  from hcand hc
       |  join hnrm q on q.doc_id = hc.query_doc_id
       |  join hnrm c on c.doc_id = hc.doc_id
       |  left join hdot d on d.query_doc_id = hc.query_doc_id and d.doc_id = hc.doc_id
       |),
       |hsemtop_ix as (
       |  select query_doc_id, doc_id, cast(rn as int) as sem_rank from (
       |    select query_doc_id, doc_id,
       |      row_number() over (partition by query_doc_id
       |                         order by cos desc, doc_id) as rn
       |    from hsem_ix) t where rn <= $TopK
       |)""".stripMargin
  }

  /** The exact full-scan semantic arm (the r11 serving plan, retained
    * as the recall harness's ground truth). */
  private def hybridExactCtes(bound: Long): String = {
    import graft.llm.HashEmbed.TopK
    s"""hsem_ex as (
       |  select q.doc_id as query_doc_id, c.doc_id,
       |    cast(coalesce(dot, 0) as double)
       |      / (sqrt(cast(c.nrm as double)) * sqrt(cast(q.nrm as double))) as cos
       |  from hnrm q join hnrm c on c.doc_id != q.doc_id
       |  left join hdot d on d.query_doc_id = q.doc_id and d.doc_id = c.doc_id
       |  where q.doc_id % 29 = 3 and q.doc_id < $bound
       |),
       |hsemtop_ex as (
       |  select query_doc_id, doc_id, cast(rn as int) as sem_rank from (
       |    select query_doc_id, doc_id,
       |      row_number() over (partition by query_doc_id
       |                         order by cos desc, doc_id) as rn
       |    from hsem_ex) t where rn <= $TopK
       |)""".stripMargin
  }

  /** RRF fusion + final bounded re-rank over a (hlextop, hsemtop_*)
    * pair, as a CTE body. */
  private def hybridFusedSelect(lextop: String, semtop: String): String = {
    import graft.llm.HashEmbed.{HybridTopK, RrfC}
    s"""select query_doc_id, cast(rank as int) as rank, doc_id,
       |  lex_rank, sem_rank, rrf_score from (
       |  select *, row_number() over (partition by query_doc_id
       |    order by rrf_score desc, doc_id) as rank
       |  from (
       |    select coalesce(l.query_doc_id, s.query_doc_id) as query_doc_id,
       |      coalesce(l.doc_id, s.doc_id) as doc_id, l.lex_rank, s.sem_rank,
       |      coalesce(cast(1 as double) / ($RrfC + l.lex_rank), 0.0)
       |        + coalesce(cast(1 as double) / ($RrfC + s.sem_rank), 0.0) as rrf_score
       |    from $lextop l full outer join $semtop s
       |      on l.query_doc_id = s.query_doc_id and l.doc_id = s.doc_id
       |  ) f) t where rank <= $HybridTopK""".stripMargin
  }

  /** Mirror HashEmbed.hybridSearch (INDEX-SERVED): both rank lists
    * tie-break by doc_id; RRF adds its two 1/(60+rank) terms in fixed
    * order. */
  val hybridSearchQ: String = {
    val bound = graft.llm.HashEmbed.QueryIdBound
    s"""with $textCtes,
       |${hybridSharedCtes(bound)},
       |${hybridIndexedCtes(bound)}
       |${hybridFusedSelect("hlextop_ix", "hsemtop_ix")}""".stripMargin
  }

  /** Mirror Models.streamHybridIndex: identical to [[hybridSearchQ]]
    * except the band-centering stats come from the STANDING corpus
    * only (doc_id % 5 != 0) — the pinned quantizer the streaming
    * maintenance loop applies to later-arriving vectors. Everything
    * else (postings df, corpus stats, impact cap) is current-corpus,
    * exactly as the serving read recomputes it. */
  val streamHybridSearchQ: String = {
    val bound = graft.llm.HashEmbed.QueryIdBound
    s"""with $textCtes,
       |${hybridSharedCtes(bound)},
       |${hybridIndexedCtes(bound, "where doc_id % 5 != 0")}
       |${hybridFusedSelect("hlextop_ix", "hsemtop_ix")}""".stripMargin
  }

  /** Mirror Models.hybridRecall: fused-RRF recall of the index-served
    * plan against the exact full-scan baseline, per query, over the
    * bounded recall sample — the shared lexical arm appears once, the
    * two semantic arms differ exactly by the band-candidate
    * restriction. */
  val hybridRecallQ: String = {
    val bound = graft.llm.HashEmbed.RecallQueryBound
    s"""with $textCtes,
       |${hybridSharedCtes(bound)},
       |${hybridIndexedCtes(bound)},
       |${hybridExactCtes(bound)},
       |hfin_ix as (
       |${hybridFusedSelect("hlextop_ix", "hsemtop_ix")}
       |),
       |hfin_ex as (
       |${hybridFusedSelect("hlextop_ex", "hsemtop_ex")}
       |)
       |select e.query_doc_id, count(i.doc_id) as n_hits,
       |  count(*) as n_exact,
       |  cast(count(i.doc_id) as double) / cast(count(*) as double) as recall
       |from hfin_ex e left join hfin_ix i
       |  on i.query_doc_id = e.query_doc_id and i.doc_id = e.doc_id
       |group by 1""".stripMargin
  }

  /** Mirror Prf.prfSearch: pseudo-relevance-feedback expanded BM25.
    * Round 1 = the capped lexical serving list (feedback prefix);
    * expansion terms = feedback docs' tf-idf keywords minus the
    * original query terms, ranked by min(lex_rank·4 + t_rank) then
    * term; round 2 adds base scores at ranks 1..3 and 0.5-weighted
    * expansion scores at ranks 4..6 in FIXED left-to-right order (the
    * 0.5 multiply is a power of two — exact on both engines). The
    * scoring-term universe is the tf-idf keyword vocabulary (original
    * AND expansion terms are both drawn from it). */
  val prfSearchQ: String = {
    import graft.llm.HashEmbed.{QueryIdBound, ImpactCap, TopK}
    import graft.llm.Relevance.{K1, B, TfidfTopK}
    import graft.llm.Prf.{FbDocs, ExpTerms}
    val baseSum = (1 to TfidfTopK)
      .map(r => s"coalesce(max(case when rank = $r then s end), 0.0)")
    val expSum = (TfidfTopK + 1 to TfidfTopK + ExpTerms)
      .map(r => s"0.5 * coalesce(max(case when rank = $r then s end), 0.0)")
    val r2Sum = (baseSum ++ expSum).mkString("\n    + ")
    val r1Sum = baseSum.mkString("\n    + ")
    s"""with $textCtes,
       |tt as materialized ($tfidfTopTermsQ),
       |pq as (select doc_id as query_doc_id, term, rank from tt
       |       where doc_id % 29 = 3 and doc_id < $QueryIdBound),
       |pdl as (select doc_id, cast(len(w) as bigint) as dl from doc_words),
       |pcorp as (select count(*) as n_docs, sum(dl) as total_len from pdl),
       |ptf as (
       |  select doc_id, dl, w as term, count(*) as tf from (
       |    select doc_id, dl, unnest(w) as w
       |    from doc_words join pdl using (doc_id)
       |  ) t where w in (select distinct term from tt) group by 1, 2, 3
       |),
       |pdf as (select term, count(*) as df from ptf group by 1),
       |psc as (
       |  select doc_id, term,
       |    cast(cast(ln((n_docs - df + 0.5) / (df + 0.5) + 1.0) as decimal(18,9)) as double)
       |      * tf * ($K1 + 1) /
       |      (tf + $K1 * (1.0 - $B + $B * cast(dl as double)
       |        / (cast(total_len as double) / cast(n_docs as double)))) as s
       |  from ptf join pdf using (term) cross join pcorp
       |),
       |pserved as materialized (
       |  select term, doc_id, s from (
       |    select *, row_number() over (partition by term
       |                                 order by s desc, doc_id) as impact_rank
       |    from psc) t
       |  where impact_rank <= $ImpactCap
       |),
       |pr1 as (
       |  select query_doc_id, doc_id,
       |    $r1Sum as lex_score
       |  from pserved join pq using (term)
       |  where doc_id != query_doc_id
       |  group by 1, 2
       |),
       |pr1top as (
       |  select query_doc_id, doc_id, rn as lex_rank from (
       |    select query_doc_id, doc_id,
       |      row_number() over (partition by query_doc_id
       |                         order by lex_score desc, doc_id) as rn
       |    from pr1) t where rn <= $FbDocs
       |),
       |pcand as (
       |  select f.query_doc_id, t.term,
       |    min(f.lex_rank * ${TfidfTopK + 1} + t.rank) as ord
       |  from pr1top f join tt t on t.doc_id = f.doc_id
       |  where not exists (select 1 from pq q
       |                    where q.query_doc_id = f.query_doc_id
       |                      and q.term = t.term)
       |  group by 1, 2
       |),
       |pexp as (
       |  select query_doc_id, term, e_rank + $TfidfTopK as rank from (
       |    select *, row_number() over (partition by query_doc_id
       |                                 order by ord, term) as e_rank
       |    from pcand) t where e_rank <= $ExpTerms
       |),
       |pnexp as (select query_doc_id, cast(count(*) as bigint) as n_exp_terms
       |          from pexp group by 1),
       |pq2 as (
       |  select query_doc_id, term, rank from pq
       |  union all
       |  select query_doc_id, term, rank from pexp
       |),
       |pr2 as (
       |  select query_doc_id, doc_id,
       |    $r2Sum as prf_score
       |  from pserved join pq2 using (term)
       |  where doc_id != query_doc_id
       |  group by 1, 2
       |)
       |select r.query_doc_id, cast(rn as int) as rank, r.doc_id, r.prf_score,
       |  coalesce(n.n_exp_terms, 0) as n_exp_terms
       |from (select *, row_number() over (partition by query_doc_id
       |        order by prf_score desc, doc_id) as rn
       |      from pr2) r
       |left join pnexp n using (query_doc_id)
       |where rn <= $TopK""".stripMargin
  }

  /** Mirror HashEmbed.hybridRankMetrics: the hybridRecall CTE chain,
    * then a rank-pivot of hit flags, DCG as the FIXED-ORDER sum of
    * the shared 9-dp discount literals (identical doubles by
    * construction — both engines parse the same decimal string), the
    * ideal-DCG literal ladder by n_rel, and one IEEE division each
    * for MRR / nDCG. */
  val hybridRankMetricsQ: String = {
    import graft.llm.HashEmbed.{RecallQueryBound, HybridTopK, NdcgDiscounts, NdcgIdeal}
    val bound = RecallQueryBound
    val pivot = (1 to HybridTopK).map(r =>
      s"max(case when i.rank = $r then (case when e.doc_id is not null then 1 else 0 end) end) as h_r$r")
      .mkString(",\n    ")
    val nhits = (1 to HybridTopK).map(r => s"coalesce(h_r$r, 0)").mkString(" + ")
    val firstHit = "case " +
      (1 to HybridTopK).map(r => s"when h_r$r = 1 then $r").mkString(" ") + " end"
    // cast every literal: DuckDB types a bare decimal-point literal as
    // DECIMAL, which would make dcg an exact decimal sum instead of
    // the engine's IEEE double fold (1-ulp ndcg drift, found by the
    // gate)
    val dcg = (1 to HybridTopK).map(r =>
      s"(case when h_r$r = 1 then cast(${NdcgDiscounts(r - 1)} as double) " +
        "else cast(0.0 as double) end)")
      .mkString("\n    + ")
    val idcg = "case " +
      (HybridTopK to 1 by -1)
        .map(r => s"when n_rel >= $r then cast(${NdcgIdeal(r - 1)} as double)")
        .mkString(" ") + " else cast(0.0 as double) end"
    s"""with $textCtes,
       |${hybridSharedCtes(bound)},
       |${hybridIndexedCtes(bound)},
       |${hybridExactCtes(bound)},
       |hfin_ix as (
       |${hybridFusedSelect("hlextop_ix", "hsemtop_ix")}
       |),
       |hfin_ex as (
       |${hybridFusedSelect("hlextop_ex", "hsemtop_ex")}
       |),
       |hm_rel as (select query_doc_id, cast(count(*) as bigint) as n_rel
       |           from hfin_ex group by 1),
       |hm_hits as (
       |  select i.query_doc_id,
       |    $pivot
       |  from hfin_ix i left join hfin_ex e
       |    on e.query_doc_id = i.query_doc_id and e.doc_id = i.doc_id
       |  group by 1
       |),
       |hm as (
       |  select r.query_doc_id, r.n_rel,
       |    cast($nhits as bigint) as n_hits,
       |    cast($firstHit as int) as first_hit_rank,
       |    $dcg as dcg,
       |    $idcg as idcg
       |  from hm_rel r left join hm_hits h using (query_doc_id)
       |)
       |select query_doc_id, n_rel, n_hits, first_hit_rank,
       |  coalesce(1.0 / cast(first_hit_rank as double), 0.0) as mrr,
       |  dcg, dcg / idcg as ndcg
       |from hm""".stripMargin
  }

  /** Shared CTE chain for the perceptron quality model (mirror
    * QualityModel.trainedWeights): features = the gated hashed
    * embeddings plus a bias dimension, labels = the gated text-stats
    * quality rule, then [[graft.llm.QualityModel.Rounds]] unrolled
    * full-batch rounds of margin → error → integer gradient → weight
    * update (the kmeans/BPE/PageRank unrolled-training recipe — all
    * exact integer arithmetic). Final weights: `qm_w<Rounds>`. */
  private def qmCtes: String = {
    import graft.llm.QualityModel.{Rounds, BiasDim}
    import graft.llm.Curation.MinQuality
    val rounds = (1 to Rounds).map { t =>
      s"""qm_m$t as materialized (
         |  select doc_id, sum(v * weight) as m
         |  from qm_x join qm_w${t - 1} on bucket = dim group by 1
         |),
         |qm_e$t as materialized (
         |  select doc_id, y - (case when m > 0 then 1 else 0 end) as e
         |  from qm_y join qm_m$t using (doc_id)
         |),
         |qm_g$t as materialized (
         |  select bucket as dim, sum(v * e) as g
         |  from qm_x join qm_e$t using (doc_id) group by 1
         |),
         |qm_w$t as materialized (
         |  select dim, weight + coalesce(g, 0) as weight
         |  from qm_w${t - 1} left join qm_g$t using (dim)
         |)""".stripMargin
    }.mkString(",\n")
    s"""qm_x as materialized (
       |  select doc_id, cast(bucket as bigint) as bucket, v
       |  from ($hashedEmbeddingsQ) t
       |  union all
       |  select doc_id, $BiasDim as bucket, cast(1 as bigint) as v from documents
       |),
       |qm_y as materialized (
       |  select doc_id,
       |    case when quality_score >= $MinQuality then 1 else 0 end as y
       |  from ($textStatsQ) t
       |),
       |qm_w0 as (
       |  select cast(unnest(generate_series(0, $BiasDim)) as bigint) as dim,
       |    cast(0 as bigint) as weight
       |),
       |$rounds""".stripMargin
  }

  /** Mirror QualityModel.trainedWeights: the full trajectory, one row
    * per (round, dim). */
  val qualityWeightsQ: String = {
    import graft.llm.QualityModel.Rounds
    val sel = (1 to Rounds).map(t =>
      s"""select $t as round, cast(dim as int) as dim,
         |  cast(weight as bigint) as weight from qm_w$t""".stripMargin)
      .mkString("\nunion all\n")
    s"with $qmCtes\n$sel"
  }

  /** Mirror QualityModel.predictions: final-round weights score every
    * doc — exact integer margin, hard threshold, weak label. */
  /** Mirror Selection.qualityPareto: the 2-D skyline sort-sweep —
    * collapse to distinct token lengths, prefix-max the margins, pull
    * back the docs sitting exactly on frontier points. Margins and
    * token counts are exact integers; DuckDB's hugeint sums narrow
    * back to bigint as in [[qualityPredictionsQ]]. */
  val qualityParetoQ: String = {
    import graft.llm.QualityModel.Rounds
    s"""with $textCtes,
       |$qmCtes,
       |qp_m as (
       |  select doc_id, cast(sum(v * weight) as bigint) as margin
       |  from qm_x join qm_w$Rounds on bucket = dim group by 1
       |),
       |qp_d as (
       |  select w.doc_id, cast(len(w.w) as bigint) as n_tokens, m.margin
       |  from doc_words w join qp_m m using (doc_id)
       |),
       |qp_t as (
       |  select n_tokens, max(margin) as m
       |  from qp_d group by 1
       |),
       |qp_f as (
       |  select n_tokens, m from (
       |    select n_tokens, m,
       |      max(m) over (order by n_tokens
       |                   rows between unbounded preceding and 1 preceding)
       |        as prev
       |    from qp_t) t
       |  where prev is null or m > prev
       |)
       |select d.doc_id, d.n_tokens, d.margin
       |from qp_d d join qp_f f
       |  on d.n_tokens = f.n_tokens and d.margin = f.m""".stripMargin
  }

  val qualityPredictionsQ: String = {
    import graft.llm.QualityModel.Rounds
    s"""with $qmCtes,
       |qm_fm as (
       |  select doc_id, sum(v * weight) as margin
       |  from qm_x join qm_w$Rounds on bucket = dim group by 1
       |)
       |select doc_id, cast(y as int) as label,
       |  cast(margin as bigint) as margin,
       |  cast(case when margin > 0 then 1 else 0 end as int) as predicted
       |from qm_y join qm_fm using (doc_id)""".stripMargin
  }

  /** Mirror the STREAMING quality scorer
    * (Streams.qualityScoreStreamOnce): train on the full corpus (the
    * unrolled qm CTEs), then score only the new-docs stream slice
    * (doc_id % 5 = 0) — margins depend on each doc's own features
    * plus the weights, so the batch twin is a WHERE clause. */
  val qualityStreamScoresQ: String = {
    import graft.llm.QualityModel.Rounds
    s"""with $qmCtes,
       |qm_fm as (
       |  select doc_id, sum(v * weight) as margin
       |  from qm_x join qm_w$Rounds on bucket = dim group by 1
       |)
       |select doc_id, cast(margin as bigint) as margin,
       |  cast(case when margin > 0 then 1 else 0 end as int) as predicted
       |from qm_fm where doc_id % 5 = 0""".stripMargin
  }

  /** Mirror QualityModel.evaluation: confusion counts plus exact-
    * arithmetic Mann-Whitney AUC — per-distinct-margin group stats,
    * `before` = docs strictly below, twice the positive rank sum as
    * the integer Σ np·(2·before + n + 1), and every ratio a single
    * double division of exact bigints (DuckDB's hugeint sums cast
    * back before the divisions, like the PageRank mirror). */
  val qualityEvalQ: String = {
    import graft.llm.QualityModel.Rounds
    s"""with $qmCtes,
       |qm_fm as (
       |  select doc_id, sum(v * weight) as margin
       |  from qm_x join qm_w$Rounds on bucket = dim group by 1
       |),
       |qp as (
       |  select y as label, cast(margin as bigint) as margin,
       |    case when margin > 0 then 1 else 0 end as predicted
       |  from qm_y join qm_fm using (doc_id)
       |),
       |ms as (
       |  select margin, count(*) as n, cast(sum(label) as bigint) as np
       |  from qp group by 1
       |),
       |cum as (
       |  select np, n, coalesce(sum(n) over (
       |    order by margin rows between unbounded preceding and 1 preceding),
       |    0) as before_n
       |  from ms
       |),
       |rs as (
       |  select cast(sum(np * (2 * before_n + n + 1)) as bigint)
       |    as pos_rank_sum_2 from cum
       |),
       |conf as (
       |  select count(*) as n_docs,
       |    cast(sum(label) as bigint) as n_pos,
       |    cast(sum(1 - label) as bigint) as n_neg,
       |    cast(sum(case when label = 1 and predicted = 1 then 1 else 0 end) as bigint) as tp,
       |    cast(sum(case when label = 0 and predicted = 1 then 1 else 0 end) as bigint) as fp,
       |    cast(sum(case when label = 1 and predicted = 0 then 1 else 0 end) as bigint) as fn,
       |    cast(sum(case when label = 0 and predicted = 0 then 1 else 0 end) as bigint) as tn
       |  from qp
       |)
       |select n_docs, n_pos, n_neg, tp, fp, fn, tn,
       |  cast(tp + tn as double) / n_docs as accuracy,
       |  cast(tp as double) / (tp + fp) as "precision",
       |  cast(tp as double) / (tp + fn) as recall,
       |  cast(2 * tp as double) / (2 * tp + fp + fn) as f1,
       |  cast(pos_rank_sum_2 - n_pos * (n_pos + 1) as double)
       |    / cast(2 * n_pos * n_neg as double) as auc
       |from conf, rs""".stripMargin
  }

  /** Mirror QualityModel.calibration: ntile(10) over (margin desc,
    * doc_id) — byte-identical to the engine's two-phase exactBuckets
    * decile — then per-bucket counts with single-double-division
    * ratios of exact integer sums. */
  val qualityCalibrationQ: String = {
    import graft.llm.QualityModel.Rounds
    s"""with $qmCtes,
       |qm_fm as (
       |  select doc_id, sum(v * weight) as margin
       |  from qm_x join qm_w$Rounds on bucket = dim group by 1
       |),
       |pred as (
       |  select doc_id, cast(y as bigint) as label,
       |    cast(margin as bigint) as margin
       |  from qm_y join qm_fm using (doc_id)
       |),
       |bkt as (
       |  select label, margin,
       |    cast(ntile(10) over (order by margin desc, doc_id) as int) as bucket
       |  from pred
       |)
       |select bucket, count(*) as n_docs, cast(sum(label) as bigint) as n_pos,
       |  cast(sum(label) as double) / count(*) as pos_rate,
       |  cast(sum(margin) as double) / count(*) as avg_margin
       |from bkt group by 1""".stripMargin
  }

  /** Mirror QualityModel.conformal: label-directed nonconformity
    * scores on the %4==1 calibration split, q̂ as the
    * ⌈(n+1)(1−α)⌉-th smallest via a cumulative count over distinct
    * integer scores, coverage/set-size on the %4==2 holdout. */
  val qualityConformalQ: String = {
    import graft.llm.QualityModel.{ConformalAlphas, Rounds}
    val arms = ConformalAlphas.map { alpha =>
      val oma = Sql.dlit(1.0 - alpha)
      val a = Sql.dlit(alpha)
      s"""select $a as alpha, n_cal, qhat, n_test, n_covered,
         |  cast(n_covered as double) / cast(n_test as double) as coverage,
         |  cast(sz as double) / cast(n_test as double) as avg_set_size,
         |  n_empty, n_full
         |from (
         |  select
         |    (select n_cal from cf_n) as n_cal,
         |    q.qhat,
         |    cast(count(*) as bigint) as n_test,
         |    cast(count(case when (case when label = 1
         |        then (q.qhat is null or -margin <= q.qhat)
         |        else (q.qhat is null or margin <= q.qhat) end)
         |      then 1 end) as bigint) as n_covered,
         |    cast(sum((case when q.qhat is null or margin <= q.qhat
         |             then 1 else 0 end)
         |           + (case when q.qhat is null or -margin <= q.qhat
         |             then 1 else 0 end))
         |      as bigint) as sz,
         |    cast(count(case when q.qhat is not null
         |        and margin > q.qhat and -margin > q.qhat
         |      then 1 end) as bigint) as n_empty,
         |    cast(count(case when q.qhat is null
         |        or (margin <= q.qhat and -margin <= q.qhat)
         |      then 1 end) as bigint) as n_full
         |  from cf_test cross join (
         |    select min(s) as qhat from cf_cum
         |    where cum >= cast(ceil(((select n_cal from cf_n) + 1) * $oma)
         |      as bigint)) q
         |  group by 1, 2
         |)""".stripMargin
    }.mkString("\nunion all\n")
    s"""with $qmCtes,
       |qm_fm as (
       |  select doc_id, sum(v * weight) as margin
       |  from qm_x join qm_w$Rounds on bucket = dim group by 1
       |),
       |cf_pred as (
       |  select doc_id, cast(y as int) as label,
       |    cast(margin as bigint) as margin
       |  from qm_y join qm_fm using (doc_id)
       |),
       |cf_cal as (
       |  select case when label = 1 then -margin else margin end as s
       |  from cf_pred
       |  where ${hex60("'conf|' || cast(doc_id as varchar)")} % 4 = 1
       |),
       |cf_n as (select cast(count(*) as bigint) as n_cal from cf_cal),
       |cf_cum as (
       |  select s, sum(n) over (order by s) as cum from (
       |    select s, count(*) as n from cf_cal group by 1) t
       |),
       |cf_test as (
       |  select label, margin from cf_pred
       |  where ${hex60("'conf|' || cast(doc_id as varchar)")} % 4 = 2)
       |$arms""".stripMargin
  }

  /** Mirror Splits.neymanAllocation: exact decimal moments per lang
    * stratum, the stddevFromSums string-cast double contract,
    * lang-ordered float folds for the cross-strata totals, and
    * largest-remainder integerization (remainder desc, lang asc). */
  val neymanAllocationQ: String = {
    import graft.llm.Splits.NeymanBudget
    s"""with ney_s as (
       |  select lang, cast(count(*) as bigint) as n_pop,
       |    sum(cast(n_chars as decimal(19,0))) as sx,
       |    sum(cast(n_chars as decimal(19,0))
       |        * cast(n_chars as decimal(19,0))) as sx2
       |  from documents group by 1
       |),
       |ney_sd as (
       |  select lang, n_pop,
       |    case when n_pop > 1 then sqrt(
       |      (cast(cast(sx2 as varchar) as double)
       |        - cast(cast(sx as varchar) as double)
       |          * cast(cast(sx as varchar) as double) / cast(n_pop as double))
       |      / (cast(n_pop as double) - 1.0)) else 0.0 end as sd
       |  from ney_s
       |),
       |ney_x as (
       |  select lang, n_pop, sd,
       |    cast(n_pop as double) * sd as nh_sh,
       |    cast(n_pop as double) * sd * sd as nh_sh2
       |  from ney_sd
       |),
       |ney_t as (
       |  select cast(sum(n_pop) as bigint) as n_total,
       |    list_reduce(list(nh_sh order by lang), (a, b) -> a + b) as t_nhsh,
       |    list_reduce(list(nh_sh2 order by lang), (a, b) -> a + b) as t_nhsh2
       |  from ney_x
       |),
       |ney_e as (
       |  select x.*, t.n_total, t.t_nhsh, t.t_nhsh2,
       |    cast($NeymanBudget as double) * x.nh_sh / t.t_nhsh as exact_ney,
       |    cast($NeymanBudget as double) * cast(x.n_pop as double)
       |      / cast(t.n_total as double) as exact_prop
       |  from ney_x x cross join ney_t t
       |),
       |ney_r as (
       |  select *,
       |    cast(floor(exact_ney) as bigint) as base_ney,
       |    cast(floor(exact_prop) as bigint) as base_prop
       |  from ney_e
       |),
       |ney_a as (
       |  select *,
       |    row_number() over
       |      (order by exact_ney - base_ney desc, lang asc) as r_ney,
       |    $NeymanBudget - cast(sum(base_ney) over () as bigint) as left_ney,
       |    row_number() over
       |      (order by exact_prop - base_prop desc, lang asc) as r_prop,
       |    $NeymanBudget - cast(sum(base_prop) over () as bigint) as left_prop
       |  from ney_r
       |)
       |select lang, n_pop, sd as sd_chars,
       |  cast(base_prop + case when r_prop <= left_prop then 1 else 0 end
       |    as bigint) as n_prop,
       |  cast(base_ney + case when r_ney <= left_ney then 1 else 0 end
       |    as bigint) as n_neyman,
       |  t_nhsh / cast(n_total as double) * t_nhsh / cast(n_total as double)
       |    / cast($NeymanBudget as double) as v_neyman,
       |  t_nhsh2 / cast(n_total as double)
       |    / cast($NeymanBudget as double) as v_prop
       |from ney_a""".stripMargin
  }

  // ---- unigram-LM tokenizer (llm.Unigram) ----

  /** Quantized-nanonat cost + broadcast-map CTEs for one model table
    * (mirror Unigram.costs: Laplace +1/+n, decimal(18,9) ln quantize,
    * narrow-decimal 10⁹ multiply; the (19,9) widen forces int128 —
    * DuckDB's width-≤18 decimal multiply overflows int64). Every CTE
    * here is MATERIALIZED: the recursive Viterbi joins its map per
    * step, and without the hint DuckDB re-inlines the whole upstream
    * EM chain on every recursion step — measured exponential (minutes
    * at 31 words) vs 0.5 s materialized; this is also the oracle-side
    * analogue of the engine's per-round localCheckpoint. */
  private def uniCostCtes(p: String, modelCte: String): String =
    s"""${p}_st as materialized (
       |  select cast(sum(cnt) as bigint) as total,
       |    cast(count(*) as bigint) as n
       |  from $modelCte
       |),
       |${p}_cost as materialized (
       |  select piece, cnt,
       |    cast(cast(cast(-ln(cast(cnt + 1 as double)
       |        / cast((select total from ${p}_st) + (select n from ${p}_st)
       |               as double)) as decimal(18,9)) as decimal(19,9))
       |      * cast(1000000000 as decimal(10,0)) as bigint) as cost
       |  from $modelCte
       |),
       |${p}_map as materialized (
       |  select map(list(piece order by piece), list(cost order by piece)) as m
       |  from ${p}_cost
       |)""".stripMargin

  /** Per-word Viterbi as a recursive CTE over character positions —
    * the same DP table, candidate filter, and (cost, seg) struct-sort
    * tiebreak as Unigram.viterbi's array fold; map subscript returns
    * a LIST here, hence the [1] / len() idioms. The inner recursive
    * CTE name MUST be unique per block: DuckDB 1.0 cross-contaminates
    * sibling nested recursive CTEs that share a name (probed — four
    * blocks all named `rec` made round 2 segment 'batch' as 'b atch'
    * against its own cost table; unique names restore the DP). */
  private def uniViterbiCte(p: String): String = {
    val L = graft.llm.Unigram.MaxPieceLen
    val piece = "substr(word, pos + 2 - k, k)"
    s"""${p}_vit as (
       |  with recursive ${p}_rec as (
       |    select word, freq, 0 as pos,
       |      [{'c': cast(0 as bigint), 'seg': ''}] as acc
       |    from uni_w
       |    union all
       |    select word, freq, pos + 1,
       |      list_append(acc, (list_sort([
       |        {'c': acc[pos + 2 - k].c + (m[$piece])[1],
       |         'seg': case when acc[pos + 2 - k].seg = '' then $piece
       |                else acc[pos + 2 - k].seg || ' ' || $piece end}
       |        for k in generate_series(1, least($L, pos + 1))
       |        if len(m[$piece]) > 0 and acc[pos + 2 - k].c is not null
       |      ]))[1])
       |    from ${p}_rec, ${p}_map where pos < length(word))
       |  select word, freq, acc[length(word) + 1].seg as pieces
       |  from ${p}_rec where pos = length(word)
       |)""".stripMargin
  }

  /** M-step counts re-anchored on the fixed seed domain. */
  private def uniCountCte(out: String, vitCte: String): String =
    s"""$out as materialized (
       |  select s.piece, cast(coalesce(c.cnt, 0) as bigint) as cnt
       |  from (select piece from uni_seed) s
       |  left join (
       |    select piece, cast(sum(freq) as bigint) as cnt from (
       |      select freq, unnest(string_split(pieces, ' ')) as piece
       |      from $vitCte) t
       |    group by 1) c using (piece)
       |)""".stripMargin

  /** The full unrolled training pipeline: seed → EmRounds EM blocks →
    * rank-prune (∪ single chars) → final cost/Viterbi. */
  private val unigramCtes: String = {
    import graft.llm.Unigram.{EmRounds, VocabTarget}
    val rounds = (1 to EmRounds).map { r =>
      val modelCte = if (r == 1) "uni_seed" else s"u${r - 1}_cnt"
      s"""${uniCostCtes(s"u$r", modelCte)},
         |${uniViterbiCte(s"u$r")},
         |${uniCountCte(s"u${r}_cnt", s"u${r}_vit")}""".stripMargin
    }.mkString(",\n")
    s"""uni_w as (
       |  select word, cast(count(*) as bigint) as freq from (
       |    select unnest(w) as word from doc_words
       |  ) t group by 1
       |),
       |uni_seed as (
       |  select piece, cast(sum(freq) as bigint) as cnt from (
       |    select freq,
       |      unnest(flatten(list_transform(generate_series(1, length(word)),
       |        i -> list_transform(
       |          generate_series(1, least(${graft.llm.Unigram.MaxPieceLen},
       |                                   length(word) - i + 1)),
       |          k -> substr(word, i, k))))) as piece
       |    from uni_w
       |  ) t group by 1
       |),
       |$rounds,
       |uni_rank as (
       |  select piece, cnt,
       |    row_number() over (order by cnt desc, piece asc) as r
       |  from u${EmRounds}_cnt
       |),
       |uni_keep as (
       |  select piece, cnt from uni_rank
       |  where r <= $VocabTarget or length(piece) = 1
       |),
       |${uniCostCtes("uf", "uni_keep")},
       |${uniViterbiCte("uf")}""".stripMargin
  }

  /** Mirror Models.unigramVocab: dense ids in (count desc, piece asc)
    * order over the pruned model — byte-identical to the two-phase
    * globalRank. */
  val unigramVocabQ: String =
    s"""with $textCtes,
       |$unigramCtes
       |select piece,
       |  cast(row_number() over (order by cnt desc, piece asc) as bigint)
       |    as piece_id,
       |  cnt as n_occurrences, cost as cost_q9
       |from uf_cost""".stripMargin

  /** Mirror Models.unigramSegmentation: final Viterbi under the
    * pruned model. */
  val unigramSegmentationQ: String =
    s"""with $textCtes,
       |$unigramCtes
       |select word, freq,
       |  cast(len(string_split(pieces, ' ')) as bigint) as n_pieces,
       |  pieces
       |from uf_vit""".stripMargin

  /** Mirror Unigram.fertilityCompare: both tokenizers' corpus-weighted
    * pieces-per-word from their segmentation tables. */
  val tokenizerFertilityCompareQ: String =
    s"""with $textCtes,
       |$bpeCtes,
       |$unigramCtes
       |select 'bpe' as tokenizer,
       |  cast(sum(freq) as bigint) as total_words,
       |  cast(sum(freq * len(string_split(syms, ' '))) as bigint)
       |    as total_pieces,
       |  cast(sum(freq * len(string_split(syms, ' '))) as double)
       |    / cast(sum(freq) as double) as fertility
       |from bpe_w${graft.llm.Bpe.MergeCount}
       |union all
       |select 'unigram',
       |  cast(sum(freq) as bigint),
       |  cast(sum(freq * len(string_split(pieces, ' '))) as bigint),
       |  cast(sum(freq * len(string_split(pieces, ' '))) as double)
       |    / cast(sum(freq) as double)
       |from uf_vit""".stripMargin
}
