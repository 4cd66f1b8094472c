package graft.oracle

import graft.llm.{Decontam, Mixture, Redaction}
import graft.operators.Sketches

/** DuckDB oracles for the round-6 curation operators (mirror
  * graft.llm.{Redaction,Decontam,Repetition,Mixture} and
  * Sketches.cmsHeavyHitters). Patterns, salts, thresholds and target
  * shares are generated from the SAME Scala constants as the Spark
  * side; regexes are lookahead-free (Java regex ≡ RE2 on this subset)
  * and embedded verbatim (DuckDB single-quoted strings do not process
  * backslashes). All arithmetic that decides a row's fate is integer.
  */
object CurateSql {

  private def hex60(x: String): String =
    s"cast(('0x' || substr(md5($x),1,15)) as bigint)"

  /** Same words/3-shingles CTEs as LlmSql.textCtes (kept in sync with
    * Dedup.words/shingles). */
  private val textCtes: String = LlmSql.textCtes

  val piiRedactionQ: String = {
    val pats = Redaction.PiiPatterns :+
      ("TERM" -> Redaction.blocklistPattern(Redaction.QueryBlocklist))
    // mirror the Spark fold exactly: pattern i's count runs on the
    // text with patterns 1..i-1 already replaced, then replaces
    var cur = "text"
    val counts = pats.map { case (l, re) =>
      val c = s"cast(len(regexp_extract_all($cur, '$re')) as bigint) as n_${l.toLowerCase}"
      cur = s"regexp_replace($cur, '$re', '[$l]', 'g')"
      c
    }.mkString(",\n  ")
    s"""select doc_id,
       |  $counts,
       |  $cur as redacted_text
       |from documents""".stripMargin
  }

  /** Mirror Redaction.piiRedactionShapes: the same doc_id-derived PII
    * fixture (bigint || varchar renders identically in both engines),
    * then the same ordered count/replace fold over PiiPatterns. */
  val piiRedactionShapesQ: String = {
    val fixture =
      "'contact user' || doc_id || '@mail' || (doc_id % 10) || " +
        "'.example.com or 10.' || (doc_id % 256) || '.' || ((doc_id * 7) % 256) || " +
        "'.' || (doc_id % 100) || " +
        "' ssn ' || (doc_id % 900 + 100) || '-' || (doc_id % 90 + 10) || " +
        "'-' || (doc_id % 9000 + 1000) || " +
        "' call +1 555 ' || (doc_id % 900 + 100) || '-' || (doc_id % 9000 + 1000) || " +
        "' :: ' || substr(text, 1, 40)"
    var cur = "text"
    val counts = Redaction.PiiPatterns.map { case (l, re) =>
      val c = s"cast(len(regexp_extract_all($cur, '$re')) as bigint) as n_${l.toLowerCase}"
      cur = s"regexp_replace($cur, '$re', '[$l]', 'g')"
      c
    }.mkString(",\n  ")
    s"""with shaped as (select doc_id, $fixture as text from documents)
       |select doc_id,
       |  $counts,
       |  $cur as redacted_text
       |from shaped""".stripMargin
  }

  val decontaminationQ: String =
    s"""with $textCtes,
       |doc_sh as (select distinct doc_id, ${hex60("sh")} as shk from doc_shingles),
       |bench as (select distinct shk from doc_sh where doc_id % ${Decontam.BenchmarkMod} = 0),
       |hits as (
       |  select doc_id, count(*) as n
       |  from doc_sh join bench using (shk)
       |  where doc_id % ${Decontam.BenchmarkMod} != 0
       |  group by 1
       |)
       |select d.doc_id,
       |  cast(coalesce(h.n, 0) as bigint) as n_benchmark_hits,
       |  coalesce(h.n, 0) >= ${Decontam.MinHits} as contaminated
       |from documents d left join hits h using (doc_id)
       |where d.doc_id % ${Decontam.BenchmarkMod} != 0""".stripMargin

  val docRepetitionQ: String =
    s"""with $textCtes,
       |per_gram as (select doc_id, ${hex60("sh")} as shk, count(*) as c
       |             from doc_shingles group by 1, 2),
       |per_doc as (
       |  select doc_id, cast(sum(c) as bigint) as n_grams,
       |    count(*) as n_distinct, max(c) as max_repeat
       |  from per_gram group by 1
       |)
       |select d.doc_id,
       |  coalesce(n_grams, 0) as n_grams,
       |  coalesce(n_distinct, 0) as n_distinct,
       |  coalesce(max_repeat, 0) as max_repeat,
       |  case when n_grams is not null
       |    then cast(1 as double) - cast(n_distinct as double) / cast(n_grams as double)
       |    else cast(0 as double) end as dup_ratio
       |from documents d left join per_doc using (doc_id)""".stripMargin

  val domainMixtureQ: String = {
    val bps = Mixture.QueryTargetBp.toSeq.sortBy(_._1)
      .map { case (l, bp) => s"('$l', $bp)" }.mkString(", ")
    s"""with counts as (select lang, count(*) as n from documents group by 1),
       |tot as (select cast(sum(n) as bigint) as total from counts),
       |bp(lang, bp) as (values $bps),
       |keep as (
       |  select c.lang,
       |    cast(least(10000, (bp * total) // n) as bigint) as keep_bp
       |  from counts c cross join tot join bp using (lang)
       |)
       |select d.doc_id, d.lang,
       |  ${hex60(s"'${Mixture.MixSalt}' || cast(doc_id as varchar)")} % 10000 as mix_bucket,
       |  keep_bp
       |from documents d join keep using (lang)
       |where ${hex60(s"'${Mixture.MixSalt}' || cast(doc_id as varchar)")} % 10000 < keep_bp""".stripMargin
  }

  /** Mirror Mixture.temperatureRebalance (T=2): the same exact-integer
    * derivation — isqrt weights with the ±1 boundary correction,
    * integer-division shares and keep thresholds — so keep decisions
    * cannot drift at bucket boundaries between engines. */
  val mixtureTemperatureQ: String = {
    val b = hex60(s"'${Mixture.TempSalt}' || cast(doc_id as varchar)") + " % 10000"
    s"""with counts as (select lang, count(*) as n from documents group by 1),
       |w as (
       |  select lang, n,
       |    case when s0*s0 > n then s0-1
       |         when (s0+1)*(s0+1) <= n then s0+1 else s0 end as w
       |  from (select lang, n,
       |          cast(floor(sqrt(cast(n as double))) as bigint) as s0
       |        from counts)
       |),
       |tot as (select cast(sum(w) as bigint) as wtot,
       |               cast(sum(n) as bigint) as total from w),
       |keep as (
       |  select w.lang,
       |    (10000 * w) // wtot as target_bp,
       |    least(10000, (((10000 * w) // wtot) * total) // n) as keep_bp
       |  from w cross join tot
       |)
       |select d.doc_id, d.lang, target_bp, $b as mix_bucket, keep_bp
       |from documents d join keep using (lang)
       |where $b < keep_bp""".stripMargin
  }

  /** Mirror Mixture.unimaxAllocation over documents.lang: the same
    * closed-form water-fill — caps ascending, monotone capped-prefix
    * predicate, integer water line, reported leftover. Window sums of
    * bigint go HUGEINT in DuckDB; they stay internal (compared, never
    * emitted). */
  val unimaxAllocationQ: String = {
    import graft.llm.Mixture.{UnimaxBudgetDen, UnimaxBudgetNum, UnimaxMaxEpochs}
    s"""with ucounts as (
       |  select lang, cast(sum(n_chars) as bigint) as n_chars,
       |    cast(sum(n_chars) * $UnimaxMaxEpochs as bigint) as cap_chars
       |  from documents group by 1
       |),
       |utot as (select cast(sum(n_chars) as bigint) as total,
       |                count(*) as nlang from ucounts),
       |uranked as (
       |  select lang, n_chars, cap_chars,
       |    row_number() over (order by cap_chars, lang) as i,
       |    sum(cap_chars) over (order by cap_chars, lang
       |      rows between unbounded preceding and current row) as prefix
       |  from ucounts
       |),
       |uflag as (
       |  select r.lang, r.n_chars, r.cap_chars, t.nlang,
       |    (t.total * $UnimaxBudgetNum) // $UnimaxBudgetDen as budget,
       |    cap_chars * (t.nlang - i + 1) + (prefix - cap_chars)
       |      <= (t.total * $UnimaxBudgetNum) // $UnimaxBudgetDen as capped
       |  from uranked r cross join utot t
       |),
       |uk as (select count(case when capped then 1 end) as k,
       |  cast(coalesce(sum(case when capped then cap_chars end), 0) as bigint) as pk
       |  from uflag)
       |select lang, n_chars, cap_chars,
       |  case when capped then cap_chars
       |    else least(cap_chars, (budget - pk) // greatest(nlang - k, 1)) end
       |    as allocated_chars,
       |  capped as is_capped,
       |  budget as budget_chars,
       |  case when nlang > k then (budget - pk) % (nlang - k)
       |    else budget - pk end as leftover_chars,
       |  (case when capped then cap_chars
       |    else least(cap_chars, (budget - pk) // greatest(nlang - k, 1)) end
       |    * 10000) // n_chars as epochs_bp
       |from uflag cross join uk""".stripMargin
  }

  val docChunksQ: String = {
    val w = graft.llm.Chunking.ChunkWords
    s"""with $textCtes,
       |ch as (
       |  select doc_id,
       |    unnest(case when len(w) >= 1
       |      then list_transform(generate_series(0, (len(w) - 1) // $w),
       |             i -> struct_pack(chunk_idx := cast(i as bigint),
       |                    n_words_chunk := cast(least($w, len(w) - i*$w) as bigint),
       |                    chunk_text := array_to_string(list_slice(w, i*$w + 1, i*$w + $w), ' ')))
       |      else [] end) as c
       |  from doc_words
       |)
       |select doc_id, c.chunk_idx as chunk_idx,
       |  c.n_words_chunk as n_words_chunk,
       |  c.chunk_text as chunk_text
       |from ch""".stripMargin
  }

  /** Mirror Chunking.boilerplateShare: the same chunk CTE, the
    * distinct-doc HAVING cut, and the left-join counting — share is
    * one double division of exact integer counts. */
  val chunkBoilerplateQ: String = {
    val m = graft.llm.Chunking.BoilerplateMinDocs
    s"""with chq as materialized (select * from ($docChunksQ) x),
       |dup as (
       |  select chunk_text from chq group by 1
       |  having count(distinct doc_id) >= $m
       |)
       |select chq.doc_id, count(*) as n_chunks,
       |  count(d.chunk_text) as n_boilerplate,
       |  cast(count(d.chunk_text) as double) / cast(count(*) as double)
       |    as boilerplate_share
       |from chq left join dup d on chq.chunk_text = d.chunk_text
       |group by 1""".stripMargin
  }

  val cmsHeavyHittersQ: String = {
    import Sketches.{CmsD, CmsSalt, CmsWidth}
    val rows = (0 until CmsD).map(r => s"($r)").mkString(", ")
    def h(term: String) =
      s"${hex60(s"'$CmsSalt' || cast(r as varchar) || '|' || $term")} % $CmsWidth"
    s"""with $textCtes,
       |tokens as (select unnest(w) as term from doc_words),
       |rr(r) as (values $rows),
       |counters as (
       |  select r, ${h("term")} as bkt, count(*) as cnt
       |  from tokens cross join rr group by 1, 2
       |),
       |exact as (select term, count(*) as n_exact from tokens group by 1),
       |probes as (
       |  select term, n_exact, r, ${h("term")} as bkt
       |  from exact cross join rr
       |)
       |select term, n_exact, min(cnt) as cms_estimate
       |from probes join counters using (r, bkt)
       |group by 1, 2
       |having min(cnt) >= ${Sketches.CmsHeavyThreshold}""".stripMargin
  }
}
