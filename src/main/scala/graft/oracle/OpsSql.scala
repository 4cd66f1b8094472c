package graft.oracle

import graft.marts.EventMarts
import graft.operators.Sketches

/** DuckDB oracles for the custom-operator event queries (mirror
  * graft.marts.EventMarts). Same recipes as the rest of the oracle
  * layer: integer/decimal arithmetic wherever Spark uses it, the same
  * window orderings with the same tiebreaks, constants generated from
  * the SAME Scala values as the Spark side.
  */
object OpsSql {

  /** Mirror EventMarts.eventsAsofPurchase — the same union + keyed
    * window + last_value(ignore nulls) formulation, with the same
    * (t, side, tiebreak) total order, rather than DuckDB's native
    * ASOF JOIN whose equal-time tie rule is unspecified.
    *
    * The purchase payload travels as ONE struct through a single
    * last_value window — mirroring the Spark operator's atomic
    * struct payload (AsOfJoin). Two independent per-field windows
    * would backfill a null field of the latest purchase from an
    * OLDER purchase row — composite-row fabrication the operator
    * (and AsOfJoinSpec's atomicity test) deliberately prevents
    * (ADVICE r5). */
  val eventsAsofPurchaseQ: String =
    """with r as (
      |  select user_id, ts as t, 0 as side, event_id as tb,
      |    struct_pack(v := value, t := ts) as p,
      |    cast(null as bigint) as l_event_id, cast(null as timestamp) as l_ts,
      |    cast(null as varchar) as l_type, cast(null as double) as l_value
      |  from events where event_type = 'purchase'
      |),
      |l as (
      |  select user_id, ts as t, 1 as side, 9223372036854775807 as tb,
      |    cast(null as struct(v double, t timestamp)) as p,
      |    event_id as l_event_id, ts as l_ts, event_type as l_type, value as l_value
      |  from events where event_type != 'purchase'
      |),
      |u as (select * from r union all select * from l),
      |w as (
      |  select *, last_value(p ignore nulls) over win as pl
      |  from u
      |  window win as (partition by user_id order by t, side, tb
      |                 rows between unbounded preceding and current row)
      |)
      |select l_event_id as event_id, user_id, l_ts as ts, l_type as event_type,
      |  l_value as value, pl.v as purchase_value, pl.t as purchase_ts
      |from w where side = 1""".stripMargin

  /** Mirror EventMarts.eventsAsofNextPurchase — the forward direction
    * as the SAME growing-frame last_value pass over time REVERSED
    * (the Spark operator's O(rows) formulation): order (t desc, side,
    * tb desc), rights before lefts at equal time (">=" inclusion),
    * smallest tiebreak last ("earliest" wins). Same atomic
    * single-struct payload. */
  val eventsAsofNextPurchaseQ: String =
    """with r as (
      |  select user_id, ts as t, 0 as side, event_id as tb,
      |    struct_pack(v := value, t := ts) as p,
      |    cast(null as bigint) as l_event_id, cast(null as timestamp) as l_ts,
      |    cast(null as varchar) as l_type, cast(null as double) as l_value
      |  from events where event_type = 'purchase'
      |),
      |l as (
      |  select user_id, ts as t, 1 as side, cast(null as bigint) as tb,
      |    cast(null as struct(v double, t timestamp)) as p,
      |    event_id as l_event_id, ts as l_ts, event_type as l_type, value as l_value
      |  from events where event_type != 'purchase'
      |),
      |u as (select * from r union all select * from l),
      |w as (
      |  select *, last_value(p ignore nulls) over win as pl
      |  from u
      |  window win as (partition by user_id
      |                 order by t desc, side, tb desc nulls last
      |                 rows between unbounded preceding and current row)
      |)
      |select l_event_id as event_id, user_id, l_ts as ts, l_type as event_type,
      |  l_value as value, pl.v as next_purchase_value, pl.t as next_purchase_ts
      |from w where side = 1""".stripMargin

  /** Mirror EventMarts.valueBandStats: the bucketing is a pure
    * equi-join rewrite, so the oracle is the plain interval join. */
  val valueBandStatsQ: String = {
    val bands = EventMarts.ValueBands
      .map { case (b, lo, hi) => s"('$b', $lo, $hi)" }.mkString(", ")
    s"""with bands(band, lo, hi) as (values $bands),
       |j as (
       |  select b.band, e.user_id, e.value
       |  from events e join bands b on e.value >= b.lo and e.value < b.hi
       |)
       |select band, count(*) as n_events, count(distinct user_id) as n_users,
       |  cast(sum(cast(value as decimal(18,6))) as double) as total_value
       |from j group by 1""".stripMargin
  }

  /** Mirror EventMarts.stratifiedEvents: the same salted md5-60 bucket
    * and per-stratum keep percentages (unlisted strata keep 100%). */
  val stratifiedEventsQ: String = {
    val arms = EventMarts.SampleFractions
      .map { case (s, p) => s"when '$s' then $p" }.mkString(" ")
    s"""with b as (
       |  select event_id, event_type, user_id,
       |    cast(('0x' || substr(md5('${graft.llm.Splits.SampleSalt}' ||
       |      cast(event_id as varchar)),1,15)) as bigint) % 100 as sample_bucket
       |  from events
       |)
       |select event_id, event_type, user_id, sample_bucket from b
       |where sample_bucket < case event_type $arms else 100 end""".stripMargin
  }

  /** Mirror EventMarts.skewSaltedEnrich: the salted join is row-equal
    * to the plain equi-join by construction, so the oracle IS the
    * plain join — gating exactly that equivalence. */
  val skewSaltedEnrichQ: String =
    """with dim as (
      |  select event_type, count(*) as type_events,
      |    cast(sum(cast(value as decimal(18,6))) as double) as type_value
      |  from events group by 1
      |)
      |select e.event_type, e.event_id, e.user_id, d.type_events, d.type_value
      |from events e join dim d using (event_type)""".stripMargin

  /** Mirror EventMarts.eventPropsStats: json_extract_string + bigint
    * cast ≡ Spark's from_json int field; explicit bigint cast on the
    * sum (DuckDB sums to HUGEINT), count-not-sum for the conditional. */
  val eventPropsStatsQ: String =
    """select event_type, count(*) as n_events,
      |  cast(sum(cast(json_extract_string(props, '$.k') as bigint)) as bigint) as sum_k,
      |  count(case when cast(json_extract_string(props, '$.k') as bigint) > 50
      |        then 1 end) as n_over_50,
      |  cast(cast(sum(cast(json_extract_string(props, '$.k') as bigint)) as bigint) as double)
      |    / cast(count(*) as double) as avg_k
      |from events group by 1""".stripMargin

  /** Mirror EventMarts.sessionWindowAgg: the lag-based session
    * assignment (strict-gap convention; no exact-boundary gaps exist
    * in the data), session_end = last event + gap. */
  val sessionWindowAggQ: String =
    """with ev as (
      |  select user_id, event_id, ts, value,
      |    case when lag(ts) over (partition by user_id order by ts, event_id) is null
      |           or ts > lag(ts) over (partition by user_id order by ts, event_id) + interval 30 minute
      |         then 1 else 0 end as is_new
      |  from events
      |),
      |ev2 as (
      |  select *, sum(is_new) over (
      |    partition by user_id order by ts, event_id
      |    rows between unbounded preceding and current row) as session_seq
      |  from ev
      |)
      |select user_id, min(ts) as session_start,
      |  max(ts) + interval 30 minute as session_end,
      |  count(*) as n_events,
      |  cast(sum(cast(value as decimal(18,6))) as double) as total_value
      |from ev2 group by user_id, session_seq""".stripMargin

  /** Mirror EventMarts.valuePercentiles: DuckDB's quantile_cont is the
    * same interpolated exact percentile; both outputs run through the
    * decimal(18,9) quantization to absorb interpolation-association
    * ulp differences. */
  val valuePercentilesQ: String =
    """select event_type, count(*) as n_events,
      |  cast(cast(quantile_cont(value, 0.5) as decimal(18,9)) as double) as p50,
      |  cast(cast(quantile_cont(value, 0.9) as decimal(18,9)) as double) as p90,
      |  cast(cast(quantile_cont(value, 0.99) as decimal(18,9)) as double) as p99
      |from events group by 1""".stripMargin

  /** Mirror operators.Funnel over events: the same per-stage
    * min-after-previous chain (strict `>`, µs timestamps both
    * engines), counts as exact longs, ratios as single double
    * divisions. Stage CTEs are generated from the SAME Stages list. */
  val eventFunnelQ: String = {
    val stages = graft.operators.Funnel.Stages
    val stageCtes = stages.zipWithIndex.map { case (s, i) =>
      if (i == 0)
        s"s0 as (select user_id, min(ts) as t from events where event_type = '$s' group by 1)"
      else
        s"s$i as (select e.user_id, min(e.ts) as t from events e " +
          s"join s${i - 1} p on e.user_id = p.user_id and e.ts > p.t " +
          s"where e.event_type = '$s' group by 1)"
    }.mkString(",\n")
    val countRows = stages.zipWithIndex.map { case (s, i) =>
      s"select '$s' as stage, cast($i as bigint) as stage_idx, count(*) as n from s$i"
    }.mkString("\nunion all\n")
    s"""with $stageCtes,
       |c as (
       |$countRows
       |)
       |select c.stage, c.stage_idx, cast(c.n as bigint) as n_users,
       |  case when c.stage_idx = 0 then cast(1 as double)
       |       else cast(c.n as double) / cast(p.n as double) end as conv_from_prev,
       |  cast(c.n as double) / cast(f.n as double) as conv_from_first
       |from c
       |left join c p on p.stage_idx = c.stage_idx - 1
       |cross join (select n from c where stage_idx = 0) f(n)""".stripMargin
  }

  /** Mirror Sketches.histogramQuantiles over events/value by
    * event_type: same two-pass equi-width histogram, same integer
    * target rank, same IEEE interpolation expression shape (all
    * +,−,×,÷ — no libm), with every DuckDB numeric literal cast to
    * double (bare decimals are DECIMAL there). */
  val histQuantilesQ: String = {
    import Sketches.{HistBins, HistQs}
    val qVals = HistQs.map(q => s"(cast($q as double))").mkString(", ")
    val lastBin = HistBins - 1
    s"""with ev as (select event_type, value from events where value is not null),
       |stats as (
       |  select event_type, min(value) as vmin, max(value) as vmax,
       |    count(value) as n
       |  from ev group by 1
       |),
       |st as (select *, (vmax - vmin) / cast($HistBins as double) as width from stats),
       |b as (
       |  select e.event_type,
       |    case when width = 0 then 0
       |      else least($lastBin, cast(floor((value - vmin) / width) as bigint))
       |    end as bin
       |  from ev e join st using (event_type)
       |),
       |bins as (select event_type, bin, count(*) as cnt from b group by 1, 2),
       |cum as (
       |  select event_type, bin, cnt,
       |    sum(cnt) over (partition by event_type order by bin) as cum
       |  from bins
       |),
       |qq(q) as (values $qVals),
       |j as (
       |  select c.event_type, q, st.n, st.vmin, st.width, c.bin, c.cnt,
       |    cast(c.cum - c.cnt as bigint) as cum_before,
       |    greatest(1, cast(ceil(q * cast(st.n as double)) as bigint)) as target
       |  from cum c join st using (event_type) cross join qq
       |)
       |select event_type, q, n,
       |  case when width = 0 then vmin
       |    else vmin + width * (cast(bin as double)
       |      + cast(target - cum_before as double) / cast(cnt as double))
       |  end as est
       |from j
       |where cum_before < target and cum_before + cnt >= target""".stripMargin
  }

  /** Mirror Stats.featureDriftPsi: earliest-vs-latest-month PSI per
    * event_type, reference-pinned bin edges, Laplace smoothing,
    * exact-integer bin-share rationals (ONE division each), ln
    * quantized through decimal(18,9), terms summed in the decimal
    * domain — generated from the same bin count and threshold. */
  val featureDriftPsiQ: String = {
    import graft.operators.Stats.{PsiBins, PsiThreshold}
    val lastBin = PsiBins - 1
    val spineVals = (0 until PsiBins).map(b => s"($b)").mkString(", ")
    s"""with ev as (
       |  select event_type, value, date_trunc('month', ts) as m
       |  from events where value is not null
       |),
       |bounds as (select min(m) as ref_m, max(m) as cur_m from ev),
       |sided as (
       |  select event_type, value,
       |    case when m = ref_m then 'ref' when m = cur_m then 'cur' end as side
       |  from ev cross join bounds
       |  where m = ref_m or m = cur_m
       |),
       |rstats as (
       |  select event_type, min(value) as vmin, max(value) as vmax,
       |    (max(value) - min(value)) / cast($PsiBins as double) as width
       |  from sided where side = 'ref' group by 1
       |),
       |cnts as (
       |  select s.event_type,
       |    case when width = 0 then 0
       |      else least($lastBin, greatest(0,
       |        cast(floor((value - vmin) / width) as bigint))) end as bin,
       |    count(case when side = 'ref' then 1 end) as cr,
       |    count(case when side = 'cur' then 1 end) as cc
       |  from sided s join rstats using (event_type)
       |  group by 1, 2
       |),
       |spine as (
       |  select event_type, bin
       |  from rstats, (values $spineVals) as bs(bin)
       |),
       |full_b as (
       |  select s.event_type, s.bin,
       |    coalesce(cr, 0) as cr, coalesce(cc, 0) as cc
       |  from spine s left join cnts using (event_type, bin)
       |),
       |tot as (
       |  select event_type, cast(sum(cr) as bigint) as nr,
       |    cast(sum(cc) as bigint) as nc
       |  from full_b group by 1
       |),
       |terms as (
       |  select f.event_type, nr, nc,
       |    cast(round((cast((cr+1)*(nc+$PsiBins) - (cc+1)*(nr+$PsiBins) as double)
       |        / cast((nr+$PsiBins)*(nc+$PsiBins) as double)) * 1e9) as bigint)
       |      * cast(round(ln(cast((cr+1)*(nc+$PsiBins) as double)
       |          / cast((cc+1)*(nr+$PsiBins) as double)) * 1e6) as bigint) as term_i
       |  from full_b f join tot using (event_type)
       |)
       |select event_type, max(nr) as n_ref, max(nc) as n_cur,
       |  cast(cast(sum(term_i) as bigint) as double) / 1e15 as psi,
       |  cast(cast(sum(term_i) as bigint) as double) / 1e15
       |    > cast($PsiThreshold as double) as drift_flag
       |from terms group by 1""".stripMargin
  }

  /** Mirror Sketches.hllDistinct over events/user_id: identical
    * integer pipeline (md5-60 hash, low-P-bit register, leading-1 via
    * binary string length, exact scaled harmonic sum in integers), one
    * final double division, ln quantized through decimal(18,9). */
  val hllUserCountsQ: String = {
    import Sketches.{HllM, HllP, HllW, HllAlpha}
    val w1 = HllW + 1
    s"""with h as (
       |  select event_type,
       |    cast(('0x' || substr(md5('hll|' || cast(user_id as varchar)),1,15)) as bigint) as h
       |  from events
       |),
       |r as (select event_type, h % $HllM as reg, h >> $HllP as w from h),
       |rr as (
       |  select event_type, reg,
       |    case when w = 0 then $w1 else $w1 - length(bin(w)) end as rho
       |  from r
       |),
       |mj as (select event_type, reg, max(rho) as m_j from rr group by 1, 2),
       |s as (
       |  select event_type,
       |    sum(cast(1 as bigint) << ($w1 - m_j)) as ssum,
       |    count(*) as nreg
       |  from mj group by 1
       |),
       |e as (
       |  select event_type,
       |    cast(ssum + ($HllM - nreg) * (cast(1 as bigint) << $w1) as double) as scaled,
       |    $HllM - nreg as zeros
       |  from s
       |),
       |est as (
       |  select event_type, zeros,
       |    ($HllAlpha::double * $HllM * $HllM) * cast(cast(1 as bigint) << $w1 as double)
       |      / scaled as raw
       |  from e
       |),
       |ex as (
       |  select event_type, count(distinct 'hll|' || cast(user_id as varchar)) as n_exact
       |  from events group by 1
       |)
       |select ex.event_type, ex.n_exact,
       |  case when zeros > 0 and raw <= ${2.5 * HllM}
       |    then cast(cast(ln($HllM::double / cast(zeros as double)) * $HllM::double
       |           as decimal(18,9)) as double)
       |    else raw end as hll_estimate
       |from ex join est using (event_type)""".stripMargin
  }

  /** Mirror Funnel.funnelLatency: the same per-stage min-after-prev
    * CTE chain, per-transition epoch-microsecond deltas, quantized
    * interpolated percentiles. */
  val funnelLatencyQ: String = {
    val stages = graft.operators.Funnel.Stages
    val stageCtes = stages.zipWithIndex.map { case (s, i) =>
      if (i == 0)
        s"s0 as (select user_id, min(ts) as t from events where event_type = '$s' group by 1)"
      else
        s"s$i as (select e.user_id, min(e.ts) as t from events e " +
          s"join s${i - 1} p on e.user_id = p.user_id and e.ts > p.t " +
          s"where e.event_type = '$s' group by 1)"
    }.mkString(",\n")
    def pq(p: Double, name: String) =
      s"cast(cast(quantile_cont(d, $p) / 1000000.0 as decimal(18,9)) as double) as $name"
    val arms = (1 until stages.size).map { i =>
      s"""select '${stages(i - 1)}' as from_stage, '${stages(i)}' as to_stage,
         |  cast($i as bigint) as stage_idx, count(*) as n_users,
         |  ${pq(0.5, "p50_seconds")}, ${pq(0.9, "p90_seconds")}, ${pq(0.99, "p99_seconds")}
         |from (select epoch_us(c.t) - epoch_us(p.t) as d
         |      from s$i c join s${i - 1} p using (user_id)) t""".stripMargin
    }.mkString("\nunion all\n")
    s"with $stageCtes\n$arms"
  }

  /** Mirror operators/Stats.keySkewProfile over events.user_id: the
    * same per-key counts, exact long totals, quantized interpolated
    * percentiles, and max/mean as one double division. */
  val eventKeySkewQ: String =
    """with c as (select user_id, count(*) as c from events group by 1)
      |select count(*) as n_keys, cast(sum(c) as bigint) as n_rows,
      |  min(c) as min_count, max(c) as max_count,
      |  cast(cast(quantile_cont(c, 0.5) as decimal(18,9)) as double) as p50_count,
      |  cast(cast(quantile_cont(c, 0.9) as decimal(18,9)) as double) as p90_count,
      |  cast(cast(quantile_cont(c, 0.99) as decimal(18,9)) as double) as p99_count,
      |  cast(max(c) * count(*) as double) / cast(sum(c) as double) as skew_ratio
      |from c""".stripMargin

  /** Mirror Streams.hllSketchStreamOnce: per-DAY sketches built
    * directly from the whole events table — the streaming path's
    * merged per-batch registers must equal this bit-for-bit (max is
    * associative/commutative, so batch split points cannot matter). */
  val streamHllUsersQ: String = {
    import Sketches.{HllAlpha, HllM, HllP, HllW}
    val w1 = HllW + 1
    s"""with h as (
       |  select cast(ts as date) as day,
       |    cast(('0x' || substr(md5('hll|' || cast(user_id as varchar)),1,15)) as bigint) as h
       |  from events
       |),
       |r as (select day, h % $HllM as reg, h >> $HllP as w from h),
       |mj as (
       |  select day, reg,
       |    max(case when w = 0 then $w1 else $w1 - length(bin(w)) end) as m_j
       |  from r group by 1, 2
       |),
       |s as (
       |  select day, sum(cast(1 as bigint) << ($w1 - m_j)) as ssum,
       |    count(*) as nreg
       |  from mj group by 1
       |),
       |est as (
       |  select day, $HllM - nreg as zeros,
       |    ($HllAlpha::double * $HllM * $HllM) * cast(cast(1 as bigint) << $w1 as double)
       |      / cast(ssum + ($HllM - nreg) * (cast(1 as bigint) << $w1) as double) as raw
       |  from s
       |)
       |select day,
       |  case when zeros > 0 and raw <= ${2.5 * HllM}
       |    then cast(cast(ln($HllM::double / cast(zeros as double)) * $HllM::double
       |           as decimal(18,9)) as double)
       |    else raw end as hll_estimate
       |from est""".stripMargin
  }

  /** Mirror EventMarts.hllOverlapUsers: inclusion-exclusion over three
    * HLLs built by the same integer pipeline as [[hllUserCountsQ]] —
    * est(A), est(B), and est(A∪B) from the register-wise max across
    * both types — plus the exact both-types user count. */
  val hllOverlapUsersQ: String = {
    import Sketches.{HllAlpha, HllM, HllP, HllW}
    import graft.marts.EventMarts.{HllOverlapA, HllOverlapB}
    val w1 = HllW + 1
    def estCtes(p: String, filter: String): String =
      s"""${p}_h as (
         |  select cast(('0x' || substr(md5('hll|' || cast(user_id as varchar)),1,15)) as bigint) as h
         |  from events where $filter
         |),
         |${p}_r as (select h % $HllM as reg, h >> $HllP as w from ${p}_h),
         |${p}_mj as (
         |  select reg, max(case when w = 0 then $w1 else $w1 - length(bin(w)) end) as m_j
         |  from ${p}_r group by 1
         |),
         |${p}_s as (
         |  select sum(cast(1 as bigint) << ($w1 - m_j)) as ssum, count(*) as nreg
         |  from ${p}_mj
         |),
         |${p}_est as (
         |  select case when zeros > 0 and raw <= ${2.5 * HllM}
         |    then cast(cast(ln($HllM::double / cast(zeros as double)) * $HllM::double
         |           as decimal(18,9)) as double)
         |    else raw end as est
         |  from (
         |    select $HllM - nreg as zeros,
         |      ($HllAlpha::double * $HllM * $HllM) * cast(cast(1 as bigint) << $w1 as double)
         |        / cast(ssum + ($HllM - nreg) * (cast(1 as bigint) << $w1) as double) as raw
         |    from ${p}_s
         |  ) t
         |)""".stripMargin
    s"""with ${estCtes("ha", s"event_type = '$HllOverlapA'")},
       |${estCtes("hb", s"event_type = '$HllOverlapB'")},
       |${estCtes("hu", s"event_type in ('$HllOverlapA', '$HllOverlapB')")},
       |ex as (
       |  select count(*) as n_exact_overlap from (
       |    select user_id from events
       |    where event_type in ('$HllOverlapA', '$HllOverlapB')
       |    group by user_id having count(distinct event_type) = 2
       |  ) t
       |)
       |select ex.n_exact_overlap, ha_est.est as est_a, hb_est.est as est_b,
       |  hu_est.est as est_union,
       |  ha_est.est + hb_est.est - hu_est.est as est_overlap
       |from ex cross join ha_est cross join hb_est cross join hu_est""".stripMargin
  }

  /** Mirror EventMarts.hllMergedUsers: max is associative, so the
    * register-wise merge of per-type sketches equals the directly-built
    * global sketch — the oracle builds the global sketch (same integer
    * pipeline as [[hllUserCountsQ]], no group key) and thereby gates
    * exactly that merge equivalence. */
  val hllMergedUsersQ: String = {
    import Sketches.{HllM, HllP, HllW, HllAlpha}
    val w1 = HllW + 1
    s"""with h as (
       |  select cast(('0x' || substr(md5('hll|' || cast(user_id as varchar)),1,15)) as bigint) as h
       |  from events
       |),
       |r as (select h % $HllM as reg, h >> $HllP as w from h),
       |rr as (
       |  select reg, case when w = 0 then $w1 else $w1 - length(bin(w)) end as rho
       |  from r
       |),
       |mj as (select reg, max(rho) as m_j from rr group by 1),
       |s as (
       |  select sum(cast(1 as bigint) << ($w1 - m_j)) as ssum, count(*) as nreg
       |  from mj
       |),
       |e as (
       |  select cast(ssum + ($HllM - nreg) * (cast(1 as bigint) << $w1) as double) as scaled,
       |    $HllM - nreg as zeros
       |  from s
       |),
       |est as (
       |  select zeros,
       |    ($HllAlpha::double * $HllM * $HllM) * cast(cast(1 as bigint) << $w1 as double)
       |      / scaled as raw
       |  from e
       |),
       |ex as (
       |  select count(distinct event_type) as n_sketches,
       |    count(distinct 'hll|' || cast(user_id as varchar)) as n_exact
       |  from events
       |)
       |select ex.n_sketches, ex.n_exact,
       |  case when zeros > 0 and raw <= ${2.5 * HllM}
       |    then cast(cast(ln($HllM::double / cast(zeros as double)) * $HllM::double
       |           as decimal(18,9)) as double)
       |    else raw end as hll_estimate
       |from ex cross join est""".stripMargin
  }

  /** Mirror EventMarts.hllRangeUsers: merging the stored daily
    * registers over a day range ≡ the directly-built sketch over the
    * range-filtered events (max associativity again) — the oracle
    * builds the direct range sketch. */
  val hllRangeUsersQ: String = {
    import Sketches.{HllM, HllP, HllW, HllAlpha}
    import graft.marts.EventMarts.{HllRangeStart, HllRangeEnd}
    val w1 = HllW + 1
    val range = s"cast(ts as date) between DATE '$HllRangeStart' and DATE '$HllRangeEnd'"
    s"""with h as (
       |  select cast(('0x' || substr(md5('hll|' || cast(user_id as varchar)),1,15)) as bigint) as h
       |  from events where $range
       |),
       |r as (select h % $HllM as reg, h >> $HllP as w from h),
       |rr as (
       |  select reg, case when w = 0 then $w1 else $w1 - length(bin(w)) end as rho
       |  from r
       |),
       |mj as (select reg, max(rho) as m_j from rr group by 1),
       |s as (
       |  select sum(cast(1 as bigint) << ($w1 - m_j)) as ssum, count(*) as nreg
       |  from mj
       |),
       |e as (
       |  select cast(ssum + ($HllM - nreg) * (cast(1 as bigint) << $w1) as double) as scaled,
       |    $HllM - nreg as zeros
       |  from s
       |),
       |est as (
       |  select zeros,
       |    ($HllAlpha::double * $HllM * $HllM) * cast(cast(1 as bigint) << $w1 as double)
       |      / scaled as raw
       |  from e
       |),
       |ex as (
       |  select count(distinct cast(ts as date)) as n_days,
       |    count(distinct 'hll|' || cast(user_id as varchar)) as n_exact
       |  from events where $range
       |)
       |select ex.n_days, ex.n_exact,
       |  case when zeros > 0 and raw <= ${2.5 * HllM}
       |    then cast(cast(ln($HllM::double / cast(zeros as double)) * $HllM::double
       |           as decimal(18,9)) as double)
       |    else raw end as hll_estimate
       |from ex cross join est""".stripMargin
  }

  /** Mirror EventMarts.bloomPrunedStats: the Bloom-pruned exact join
    * is row-equal to the plain equi-join by construction (no false
    * negatives; the exact join removes false positives) — the oracle
    * IS the plain join, gating exactly that equivalence. */
  val bloomPrunedStatsQ: String =
    """with p as (
      |  select distinct user_id from events where event_type = 'purchase'
      |)
      |select e.event_type, count(*) as n_events,
      |  count(distinct e.user_id) as n_users,
      |  cast(sum(cast(e.value as decimal(18,6))) as double) as total_value
      |from events e join p using (user_id)
      |group by 1""".stripMargin

  /** Mirror operators.Fuzzy.nearestNameMatch over distinct product
    * names: the same last-token blocking, the same [2, BlockCap] block
    * filter, DuckDB's levenshtein (the same standard unit-cost edit
    * distance as Spark's), the same (distance, match_name) argmin
    * tiebreak. Blocked semantics on BOTH sides — a cross-block pair is
    * never a candidate by design. */
  val fuzzyNameMatchQ: String = {
    import graft.operators.Fuzzy.BlockCap
    s"""with fz_names as (
       |  select distinct p_name as name from part where p_name is not null
       |),
       |fz_blocked as (
       |  select name, regexp_extract(name, '(\\S+)$$', 1) as block from fz_names
       |),
       |fz_ok as (
       |  select block from fz_blocked group by 1
       |  having count(*) <= $BlockCap and count(*) >= 2
       |),
       |fz_capped as (select b.* from fz_blocked b join fz_ok using (block)),
       |fz_pairs as (
       |  select a.name, a.block, b.name as match_name,
       |    cast(levenshtein(a.name, b.name) as bigint) as distance
       |  from fz_capped a join fz_capped b
       |    on a.block = b.block and a.name != b.name
       |),
       |fz_rank as (
       |  select *, row_number() over (
       |    partition by name order by distance asc, match_name asc) as rn
       |  from fz_pairs
       |)
       |select name, block, match_name, distance from fz_rank where rn = 1""".stripMargin
  }

  /** Mirror EventMarts.zorderKeys: the SAME Morton mask ladder in
    * DuckDB integer arithmetic (graft.expressions.ZOrder.zorderSql). */
  val zorderKeysQ: String = {
    import graft.expressions.ZOrder
    s"""with zb as (
       |  select event_id,
       |    cast(floor(least(greatest(value, 0.0), 65535.0)) as bigint) as value_bucket,
       |    cast(date_diff('day', DATE '1970-01-01', cast(ts as date)) as bigint) as day_bucket
       |  from events
       |)
       |select event_id, value_bucket, day_bucket,
       |  ${ZOrder.zorderSql("value_bucket", "day_bucket")} as zkey
       |from zb""".stripMargin
  }

  /** Mirror EventMarts.zorderZonemaps: the same zkey derivation, then
    * ntile([[graft.marts.EventMarts.ZonemapFiles]]) over (zkey desc,
    * event_id) — byte-identical to the engine's two-phase exactBuckets
    * file cut — and per-file min/max on both dimensions. */
  val zorderZonemapsQ: String = {
    import graft.marts.EventMarts.ZonemapFiles
    s"""with zk as ($zorderKeysQ),
       |f as (
       |  select *, cast(ntile($ZonemapFiles)
       |    over (order by zkey desc, event_id) as int) as file_id
       |  from zk
       |)
       |select file_id, count(*) as n_rows,
       |  min(value_bucket) as min_value_bucket,
       |  max(value_bucket) as max_value_bucket,
       |  min(day_bucket) as min_day_bucket,
       |  max(day_bucket) as max_day_bucket,
       |  min(zkey) as min_zkey, max(zkey) as max_zkey
       |from f group by 1""".stripMargin
  }

  /** Shared bucket CTE for both layout curves (mirror zorderKeys /
    * hilbertKeys bucketing — identical on purpose). */
  private val layoutBucketsCte: String =
    """zb as (
      |  select event_id,
      |    cast(floor(least(greatest(value, 0.0), 65535.0)) as bigint) as value_bucket,
      |    cast(date_diff('day', DATE '1970-01-01', cast(ts as date)) as bigint) as day_bucket
      |  from events
      |)""".stripMargin

  /** Hilbert key chain: seed + the 16 mirrored state-machine steps
    * ([[graft.expressions.Hilbert.sqlSteps]]) + the final projection,
    * as a CTE block ending in `hk`. */
  private val hilbertChain: String = {
    val steps = graft.expressions.Hilbert.sqlSteps("h0",
      Seq("event_id", "value_bucket", "day_bucket"))
    s"""h0 as (
       |  select event_id, value_bucket, day_bucket,
       |    value_bucket as x, day_bucket as y, cast(0 as bigint) as d
       |  from zb
       |),
       |$steps,
       |hk as (
       |  select event_id, value_bucket, day_bucket, d as hkey from hout15
       |)""".stripMargin
  }

  /** Mirror EventMarts.hilbertKeys: the identical 16-level integer
    * state machine, unrolled as chained CTEs. */
  val hilbertKeysQ: String =
    s"""with $layoutBucketsCte,
       |$hilbertChain
       |select event_id, value_bucket, day_bucket, hkey from hk""".stripMargin

  /** Mirror EventMarts.hilbertZonemaps: ntile over (hkey desc,
    * event_id) = the engine's two-phase exactBuckets cut, per-file
    * min/max on both dimensions (the zorderZonemaps shape). */
  val hilbertZonemapsQ: String = {
    import graft.marts.EventMarts.ZonemapFiles
    s"""with $layoutBucketsCte,
       |$hilbertChain,
       |hf as (
       |  select *, cast(ntile($ZonemapFiles)
       |    over (order by hkey desc, event_id) as int) as file_id
       |  from hk
       |)
       |select file_id, count(*) as n_rows,
       |  min(value_bucket) as min_value_bucket,
       |  max(value_bucket) as max_value_bucket,
       |  min(day_bucket) as min_day_bucket,
       |  max(day_bucket) as max_day_bucket,
       |  min(hkey) as min_hkey, max(hkey) as max_hkey
       |from hf group by 1""".stripMargin
  }

  /** Mirror EventMarts.layoutLocality: both zonemap catalogs rebuilt
    * over the SHARED bucket CTE, the same twelve integer-percent
    * boxes, exact interval-intersection counts, left-joined with a
    * zero default for fully-pruned boxes. */
  val layoutLocalityQ: String = {
    import graft.marts.EventMarts.{ZonemapFiles, LayoutBoxPositions, LayoutBoxWidthPct}
    import graft.expressions.ZOrder
    val gridRows = (for {
      (kind, ki) <- Seq("day", "value", "both").zipWithIndex
      (p, pi) <- LayoutBoxPositions.zipWithIndex
    } yield s"(${ki * LayoutBoxPositions.size + pi + 1}, '$kind', $p)").mkString(", ")
    s"""with $layoutBucketsCte,
       |$hilbertChain,
       |zkeys as (
       |  select event_id, value_bucket, day_bucket,
       |    ${ZOrder.zorderSql("value_bucket", "day_bucket")} as zkey
       |  from zb
       |),
       |zzm as (
       |  select file_id,
       |    min(value_bucket) as min_value_bucket, max(value_bucket) as max_value_bucket,
       |    min(day_bucket) as min_day_bucket, max(day_bucket) as max_day_bucket
       |  from (select *, cast(ntile($ZonemapFiles)
       |          over (order by zkey desc, event_id) as int) as file_id from zkeys)
       |  group by 1
       |),
       |hzm as (
       |  select file_id,
       |    min(value_bucket) as min_value_bucket, max(value_bucket) as max_value_bucket,
       |    min(day_bucket) as min_day_bucket, max(day_bucket) as max_day_bucket
       |  from (select *, cast(ntile($ZonemapFiles)
       |          over (order by hkey desc, event_id) as int) as file_id from hk)
       |  group by 1
       |),
       |bounds as (
       |  select min(day_bucket) as dmin, max(day_bucket) as dmax,
       |    min(value_bucket) as vmin, max(value_bucket) as vmax
       |  from zb
       |),
       |grid (box_id, kind, pos_pct) as (values $gridRows),
       |boxes as (
       |  select box_id, kind,
       |    case when kind in ('day', 'both')
       |      then dmin + ((dmax - dmin + 1) * pos_pct) // 100 end as day_lo,
       |    case when kind in ('day', 'both')
       |      then dmin + ((dmax - dmin + 1) * (pos_pct + $LayoutBoxWidthPct)) // 100 end as day_hi,
       |    case when kind in ('value', 'both')
       |      then vmin + ((vmax - vmin + 1) * pos_pct) // 100 end as value_lo,
       |    case when kind in ('value', 'both')
       |      then vmin + ((vmax - vmin + 1) * (pos_pct + $LayoutBoxWidthPct)) // 100 end as value_hi
       |  from grid cross join bounds
       |),
       |zhits as (
       |  select box_id, count(*) as zorder_files
       |  from boxes join zzm on
       |    (day_lo is null or (max_day_bucket >= day_lo and min_day_bucket <= day_hi))
       |    and (value_lo is null or (max_value_bucket >= value_lo and min_value_bucket <= value_hi))
       |  group by 1
       |),
       |hhits as (
       |  select box_id, count(*) as hilbert_files
       |  from boxes join hzm on
       |    (day_lo is null or (max_day_bucket >= day_lo and min_day_bucket <= day_hi))
       |    and (value_lo is null or (max_value_bucket >= value_lo and min_value_bucket <= value_hi))
       |  group by 1
       |)
       |select box_id, kind, day_lo, day_hi, value_lo, value_hi,
       |  coalesce(zorder_files, 0) as zorder_files,
       |  coalesce(hilbert_files, 0) as hilbert_files,
       |  $ZonemapFiles as n_files
       |from boxes
       |left join zhits using (box_id)
       |left join hhits using (box_id)""".stripMargin
  }

  /** Shared co-purchase edge CTEs (mirror operators/Graph
    * .coOccurrenceEdges over stg_order_items): distinct (order,
    * product) rows, then the strictly-ordered within-group self-join. */
  private val copurchaseCtes: String =
    s"""${Sql.stagingCtes},
       |gi as (select distinct order_id as g, product_id as i from stg_order_items),
       |edges as (
       |  select distinct a.i as src, b.i as dst
       |  from gi a join gi b on a.g = b.g and a.i < b.i
       |)""".stripMargin

  val copurchaseEdgesQ: String =
    s"$copurchaseCtes select src, dst from edges"

  /** Mirror Graph.triangleCounts over strongCoOccurrenceEdges: the
    * weight-thresholded edge set, the same ordered (a<b<c) wedge
    * join meeting each triangle once, per-node counts via the
    * three-corner union. */
  val copurchaseTrianglesQ: String = {
    val k = graft.Models.CoPurchaseMinWeight
    s"""${Sql.stagingCtes},
       |gi as (select distinct order_id as g, product_id as i from stg_order_items),
       |se as (
       |  select a.i as src, b.i as dst
       |  from gi a join gi b on a.g = b.g and a.i < b.i
       |  group by 1, 2 having count(*) >= $k
       |),
       |tri as (
       |  select e1.src as a, e1.dst as b, e2.dst as c
       |  from se e1 join se e2 on e1.dst = e2.src
       |  join se e3 on e3.src = e1.src and e3.dst = e2.dst
       |)
       |select node, count(*) as n_triangles from (
       |  select a as node from tri union all
       |  select b as node from tri union all
       |  select c as node from tri
       |) u group by 1""".stripMargin
  }

  /** Mirror Graph.triangleCountsCapped over the RAW co-purchase
    * graph: undirected degrees, hubs above the cap, the hub-free kept
    * subgraph, the ordered wedge join on it (id-oriented here —
    * triangle sets are orientation-invariant), per-node hub-neighbor
    * counts, and the NULL-for-hubs / 0-backfill output contract. */
  private val cappedTriCtes: String = {
    val cap = graft.Models.TriangleHubCap
    s"""$copurchaseCtes,
       |tc_deg as materialized (
       |  select node, cast(count(*) as bigint) as degree from (
       |    select src as node from edges union all
       |    select dst as node from edges) u group by 1
       |),
       |tc_hub as materialized (select node from tc_deg where degree > $cap),
       |tc_kept as materialized (
       |  select src, dst from edges
       |  where src not in (select node from tc_hub)
       |    and dst not in (select node from tc_hub)
       |),
       |tc_tri as (
       |  select e1.src as a, e1.dst as b, e2.dst as c
       |  from tc_kept e1 join tc_kept e2 on e1.dst = e2.src
       |  join tc_kept e3 on e3.src = e1.src and e3.dst = e2.dst
       |),
       |tc_cnt as (
       |  select node, cast(count(*) as bigint) as n_triangles from (
       |    select a as node from tc_tri union all
       |    select b as node from tc_tri union all
       |    select c as node from tc_tri
       |  ) u group by 1
       |),
       |tc_hn as (
       |  select node, cast(count(*) as bigint) as n_hub_neighbors from (
       |    select src as node, dst as nbr from edges union all
       |    select dst as node, src as nbr from edges
       |  ) u where nbr in (select node from tc_hub) group by 1
       |)""".stripMargin
  }

  val copurchaseTrianglesCappedQ: String = {
    val cap = graft.Models.TriangleHubCap
    s"""$cappedTriCtes
       |select d.node, d.degree, d.degree > $cap as is_hub,
       |  case when d.degree > $cap then null
       |       else coalesce(t.n_triangles, 0) end as n_triangles,
       |  coalesce(h.n_hub_neighbors, 0) as n_hub_neighbors
       |from tc_deg d
       |left join tc_cnt t on d.node = t.node
       |left join tc_hn h on d.node = h.node""".stripMargin
  }

  /** Mirror Graph.clusteringCoefficientsCapped: the capped-triangle
    * CTEs plus kept_degree = degree − hub-neighbors and the 2T/(k(k−1))
    * coefficient against the KEPT degree; hubs NULL-flagged. */
  val copurchaseClusteringCappedQ: String = {
    val cap = graft.Models.TriangleHubCap
    s"""$cappedTriCtes
       |select d.node, d.degree, d.degree > $cap as is_hub,
       |  case when d.degree > $cap then null
       |       else coalesce(t.n_triangles, 0) end as n_triangles,
       |  coalesce(h.n_hub_neighbors, 0) as n_hub_neighbors,
       |  d.degree - coalesce(h.n_hub_neighbors, 0) as kept_degree,
       |  case when d.degree > $cap then null
       |       when d.degree - coalesce(h.n_hub_neighbors, 0) >= 2 then
       |         cast(coalesce(t.n_triangles, 0) * 2 as double)
       |           / cast((d.degree - coalesce(h.n_hub_neighbors, 0))
       |                  * (d.degree - coalesce(h.n_hub_neighbors, 0) - 1)
       |               as double)
       |       else 0.0 end as clustering_coeff
       |from tc_deg d
       |left join tc_cnt t on d.node = t.node
       |left join tc_hn h on d.node = h.node""".stripMargin
  }

  /** Shared SQL for a DOULION sampled-triangle count table over an
    * edge CTE: the deterministic md5-60 edge-keep filter against a
    * one-row (keep_num, keep_den) params CTE the caller supplies, the
    * id-oriented wedge join on the sample, per-node counts, and the
    * fixed double unbiasing chain (n·den³/num³ — multiplies in
    * doubles, mirroring the operator's overflow-safe tree). */
  private def sampledTriCtes(p: String, edgesName: String): String =
    s"""${p}kept as materialized (
       |  select src, dst from $edgesName cross join ${p}prm
       |  where cast(('0x' || substr(md5(concat('tri|',
       |          cast(src as varchar), '|',
       |          cast(dst as varchar))),1,15)) as bigint)
       |        % keep_den < keep_num
       |),
       |${p}tri as (
       |  select e1.src as a, e1.dst as b, e2.dst as c
       |  from ${p}kept e1 join ${p}kept e2 on e1.dst = e2.src
       |  join ${p}kept e3 on e3.src = e1.src and e3.dst = e2.dst
       |),
       |${p}cnt as (
       |  select node, cast(count(*) as bigint) as n_triangles_sampled from (
       |    select a as node from ${p}tri union all
       |    select b as node from ${p}tri union all
       |    select c as node from ${p}tri
       |  ) u group by 1
       |)""".stripMargin

  /** Mirror Models.copurchaseTrianglesApprox: the budget-derived
    * keep_den (one exact integer aggregate), the sampled wedge join,
    * and the per-node unbiased estimates. */
  val copurchaseTrianglesApproxQ: String = {
    val b = graft.Models.TriangleEdgeBudget
    s"""$copurchaseCtes,
       |aprm as (
       |  select cast(1 as bigint) as keep_num,
       |    greatest((count(*) + ${b - 1}) // $b, 1) as keep_den
       |  from edges
       |),
       |${sampledTriCtes("a", "edges")}
       |select node, n_triangles_sampled, keep_num, keep_den,
       |  cast(n_triangles_sampled as double)
       |    * cast(keep_den as double) * cast(keep_den as double)
       |    * cast(keep_den as double)
       |    / (cast(keep_num as double) * cast(keep_num as double)
       |       * cast(keep_num as double)) as n_triangles_est
       |from acnt cross join aprm""".stripMargin
  }

  /** Mirror Models.copurchaseClusteringApprox: the budget-derived
    * DOULION sampled-triangle estimates joined onto EXACT full-graph
    * degrees, ĉ(v) = (est · 2.0) / (d(d−1)) with the same fixed double
    * chain as the triangle estimate itself. */
  val copurchaseClusteringApproxQ: String = {
    val b = graft.Models.TriangleEdgeBudget
    s"""$copurchaseCtes,
       |aprm as (
       |  select cast(1 as bigint) as keep_num,
       |    greatest((count(*) + ${b - 1}) // $b, 1) as keep_den
       |  from edges
       |),
       |${sampledTriCtes("a", "edges")},
       |cc_deg as (
       |  select node, cast(count(*) as bigint) as degree from (
       |    select src as node from edges union all
       |    select dst as node from edges) u group by 1
       |),
       |cc_est as (
       |  select node, n_triangles_sampled,
       |    cast(n_triangles_sampled as double)
       |      * cast(keep_den as double) * cast(keep_den as double)
       |      * cast(keep_den as double)
       |      / (cast(keep_num as double) * cast(keep_num as double)
       |         * cast(keep_num as double)) as n_triangles_est
       |  from acnt cross join aprm
       |)
       |select d.node, d.degree,
       |  coalesce(e.n_triangles_sampled, 0) as n_triangles_sampled,
       |  coalesce(e.n_triangles_est, 0.0) as n_triangles_est,
       |  case when d.degree >= 2 then
       |    coalesce(e.n_triangles_est, 0.0) * 2.0
       |      / cast(d.degree * (d.degree - 1) as double)
       |  else 0.0 end as clustering_coeff_est
       |from cc_deg d
       |left join cc_est e on d.node = e.node""".stripMargin
  }

  /** Mirror Models.trianglesApproxError: exact and fixed-p sampled
    * triangle counts on the SAME strong graph, global per-node-count
    * totals (exact integers), one scaling expression, the shared
    * explicit floor for err_ppm. */
  val trianglesApproxErrorQ: String = {
    val k = graft.Models.CoPurchaseMinWeight
    val num = graft.Models.TriangleSampleNum
    val den = graft.Models.TriangleSampleDen
    val den3 = den * den * den
    val num3 = num * num * num
    val ppm = graft.Models.ErrPpmScale
    s"""${Sql.stagingCtes},
       |gi as (select distinct order_id as g, product_id as i from stg_order_items),
       |se as materialized (
       |  select a.i as src, b.i as dst
       |  from gi a join gi b on a.g = b.g and a.i < b.i
       |  group by 1, 2 having count(*) >= $k
       |),
       |etri as (
       |  select e1.src as a, e1.dst as b, e2.dst as c
       |  from se e1 join se e2 on e1.dst = e2.src
       |  join se e3 on e3.src = e1.src and e3.dst = e2.dst
       |),
       |ecnt as (
       |  select node, cast(count(*) as bigint) as n_triangles from (
       |    select a as node from etri union all
       |    select b as node from etri union all
       |    select c as node from etri
       |  ) u group by 1
       |),
       |sprm as (select cast($num as bigint) as keep_num,
       |                cast($den as bigint) as keep_den),
       |${sampledTriCtes("s", "se")},
       |ex as (
       |  select cast(count(*) as bigint) as n_nodes_exact,
       |    cast(coalesce(sum(n_triangles), 0) as bigint) as tri3_exact
       |  from ecnt
       |),
       |sm as (
       |  select cast(count(*) as bigint) as n_nodes_sampled,
       |    cast(coalesce(sum(n_triangles_sampled), 0) as bigint)
       |      as tri3_sampled
       |  from scnt
       |)
       |select n_nodes_exact, n_nodes_sampled, tri3_exact, tri3_sampled,
       |  cast(tri3_sampled * $den3 as double) / ${num3}.0 as tri3_est,
       |  case when tri3_exact > 0 then
       |    cast(floor(abs(cast(tri3_sampled * $den3 as double) / ${num3}.0
       |        - cast(tri3_exact as double))
       |      / cast(tri3_exact as double) * $ppm.0) as bigint) end as err_ppm
       |from ex cross join sm""".stripMargin
  }

  /** Mirror Graph.linkPredictions over the strong-edge graph: the
    * same symmetrized wedge join for common-neighbor counts, the
    * existing-edge anti-join, exact integer degrees, jaccard as ONE
    * division, and the identical (common desc, a, b) top-K cut. */
  val copurchaseLinkPredictionsQ: String = {
    val minW = graft.Models.CoPurchaseMinWeight
    val k = graft.Models.LinkPredTopK
    s"""${Sql.stagingCtes},
       |gi as (select distinct order_id as g, product_id as i from stg_order_items),
       |se as materialized (
       |  select a.i as src, b.i as dst
       |  from gi a join gi b on a.g = b.g and a.i < b.i
       |  group by 1, 2 having count(*) >= $minW
       |),
       |adj as materialized (
       |  select src, dst from se union all select dst, src from se
       |),
       |cn as (
       |  select x.dst as node_a, y.dst as node_b, count(*) as common_neighbors
       |  from adj x join adj y on x.src = y.src and x.dst < y.dst
       |  group by 1, 2
       |),
       |deg as materialized (
       |  select node, count(*) as degree from (
       |    select src as node from se union all
       |    select dst as node from se) u group by 1
       |)
       |select cn.node_a, cn.node_b, cn.common_neighbors,
       |  da.degree as deg_a, db.degree as deg_b,
       |  cast(cn.common_neighbors as double)
       |    / cast(da.degree + db.degree - cn.common_neighbors as double) as jaccard
       |from cn
       |left join (select src as node_a, dst as node_b, 1 as is_edge from se) e
       |  on cn.node_a = e.node_a and cn.node_b = e.node_b
       |join deg da on cn.node_a = da.node
       |join deg db on cn.node_b = db.node
       |where e.is_edge is null
       |order by cn.common_neighbors desc, cn.node_a, cn.node_b
       |limit $k""".stripMargin
  }

  /** Mirror Graph.kCore over the strong-edge graph: the IDENTICAL
    * bounded unroll (degrees → keep ≥ k → edge restriction, ×
    * KCoreRounds), final degrees, and the same converged flag (min
    * over `deg >= k`, 1 on an empty core). */
  val copurchaseKcoreQ: String = {
    val k = graft.Models.KCoreK
    val minW = graft.Models.CoPurchaseMinWeight
    val rounds = (1 to graft.Models.KCoreRounds).map { r =>
      s"""dg$r as (
         |  select node, count(*) as deg from (
         |    select src as node from kc${r - 1} union all
         |    select dst as node from kc${r - 1}) u group by 1
         |),
         |kp$r as (select node from dg$r where deg >= $k),
         |kc$r as materialized (
         |  select e.src, e.dst from kc${r - 1} e
         |  join kp$r a on e.src = a.node
         |  join kp$r b on e.dst = b.node
         |)""".stripMargin
    }.mkString(",\n")
    val last = s"kc${graft.Models.KCoreRounds}"
    s"""${Sql.stagingCtes},
       |gi as (select distinct order_id as g, product_id as i from stg_order_items),
       |kc0 as materialized (
       |  select a.i as src, b.i as dst
       |  from gi a join gi b on a.g = b.g and a.i < b.i
       |  group by 1, 2 having count(*) >= $minW
       |),
       |$rounds,
       |dgf as materialized (
       |  select node, count(*) as deg from (
       |    select src as node from $last union all
       |    select dst as node from $last) u group by 1
       |),
       |cv as (
       |  select coalesce(min(case when deg >= $k then 1 else 0 end), 1) as c
       |  from dgf
       |)
       |select node, cast(deg as bigint) as core_degree, c = 1 as converged
       |from dgf cross join cv""".stripMargin
  }

  /** Mirror Graph.clusteringCoefficients over the same strong-edge
    * graph: undirected degree from both edge endpoints, triangles
    * from the ordered wedge join, one double division of exact
    * integers (2T / d(d-1)), degree-1 nodes 0. */
  val copurchaseClusteringQ: String = {
    val k = graft.Models.CoPurchaseMinWeight
    s"""${Sql.stagingCtes},
       |gi as (select distinct order_id as g, product_id as i from stg_order_items),
       |se as (
       |  select a.i as src, b.i as dst
       |  from gi a join gi b on a.g = b.g and a.i < b.i
       |  group by 1, 2 having count(*) >= $k
       |),
       |tri as (
       |  select e1.src as a, e1.dst as b, e2.dst as c
       |  from se e1 join se e2 on e1.dst = e2.src
       |  join se e3 on e3.src = e1.src and e3.dst = e2.dst
       |),
       |tcount as (
       |  select node, count(*) as n_triangles from (
       |    select a as node from tri union all
       |    select b as node from tri union all
       |    select c as node from tri
       |  ) u group by 1
       |),
       |deg as (
       |  select node, count(*) as degree from (
       |    select src as node from se union all select dst as node from se
       |  ) d group by 1
       |)
       |select deg.node, deg.degree,
       |  coalesce(tcount.n_triangles, 0) as n_triangles,
       |  case when deg.degree >= 2
       |    then cast(coalesce(tcount.n_triangles, 0) * 2 as double)
       |         / cast(deg.degree * (deg.degree - 1) as double)
       |    else cast(0.0 as double) end as clustering_coeff
       |from deg left join tcount on deg.node = tcount.node""".stripMargin
  }

  /** Mirror Graph.pageRank: the fixed-point integer rounds UNROLLED.
    * Same constants (scale 1e9, damping 85/100), same integer floor
    * divisions; DuckDB's BIGINT sum widens to HUGEINT, so every
    * neighbor sum is cast back before the damping arithmetic. */
  val copurchasePagerankQ: String = {
    import graft.operators.Graph.{PageRankScale, PageRankDampingPct}
    val base = 15L * PageRankScale / 100L
    val rounds = (1 to graft.Models.PageRankRounds).map { k =>
      s"""r$k as (
         |  select d.node, d.degree,
         |    $base + ($PageRankDampingPct * coalesce(cast(s.in_sum as bigint), 0)) // 100 as rank_scaled
         |  from deg d left join (
         |    select sym.dst as node, sum(r.rank_scaled // r.degree) as in_sum
         |    from r${k - 1} r join sym on r.node = sym.src group by 1
         |  ) s on d.node = s.node
         |)""".stripMargin
    }.mkString(",\n")
    s"""$copurchaseCtes,
       |sym as (select src, dst from edges union all select dst as src, src as dst from edges),
       |deg as (select src as node, count(*) as degree from sym group by 1),
       |r0 as (select node, degree, $PageRankScale as rank_scaled from deg),
       |$rounds
       |select node, rank_scaled,
       |  cast(rank_scaled as double) / cast($PageRankScale as double) as rank
       |from r${graft.Models.PageRankRounds}""".stripMargin
  }

  /** Per-source global HLL-estimate chain (mirror
    * Sketches.hllEstimateByGroup with empty groupCols — the same
    * proven arithmetic as [[hllMergedUsersQ]]), prefixed so the
    * forget audit can run it over BOTH the raw and the scrubbed
    * fact. Final CTE `<pfx>est(est)`. */
  private def faHllCtes(pfx: String, src: String): String = {
    import graft.operators.Sketches.{HllM, HllP, HllW, HllAlpha}
    val w1 = HllW + 1
    s"""${pfx}h as (
       |  select cast(('0x' || substr(md5('hll|' || cast(user_id as varchar)),1,15)) as bigint) as h
       |  from $src
       |),
       |${pfx}mj as (
       |  select h % $HllM as reg,
       |    max(case when (h >> $HllP) = 0 then $w1
       |        else $w1 - length(bin(h >> $HllP)) end) as m_j
       |  from ${pfx}h group by 1
       |),
       |${pfx}s as (
       |  select sum(cast(1 as bigint) << ($w1 - m_j)) as ssum, count(*) as nreg
       |  from ${pfx}mj
       |),
       |${pfx}e as (
       |  select cast(ssum + ($HllM - nreg) * (cast(1 as bigint) << $w1) as double) as scaled,
       |    $HllM - nreg as zeros
       |  from ${pfx}s
       |),
       |${pfx}est as (
       |  select case when zeros > 0 and
       |      ($HllAlpha::double * $HllM * $HllM) * cast(cast(1 as bigint) << $w1 as double)
       |        / scaled <= ${2.5 * HllM}
       |    then cast(cast(ln($HllM::double / cast(zeros as double)) * $HllM::double
       |           as decimal(18,9)) as double)
       |    else ($HllAlpha::double * $HllM * $HllM) * cast(cast(1 as bigint) << $w1 as double)
       |      / scaled end as est
       |  from ${pfx}e
       |)""".stripMargin
  }

  /** Mirror Forget.forgetAudit: raw-fact scrub, the sessionizer-mart
    * rebuild (session count = Σ is_new — the lag-gap definition of
    * Sessions.sessionize), and the distinct-user story with the HLL
    * estimates rebuilt over both corpora. */
  val forgetAuditQ: String = {
    import graft.operators.Forget.{ForgetMod, ForgetRes}
    def sessionCount(src: String, extra: String = "") =
      s"""select count(*) as c from (
         |    select user_id,
         |      case when lag(ts) over (partition by user_id order by ts, event_id) is null
         |        or ts > lag(ts) over (partition by user_id order by ts, event_id)
         |           + interval 30 minute
         |      then 1 else 0 end as is_new
         |    from $src) t
         |  where is_new = 1$extra""".stripMargin
    s"""with fa_scrub as (
       |  select * from events where not (user_id % $ForgetMod = $ForgetRes)
       |),
       |fa_sn_b as (
       |  ${sessionCount("events")}
       |),
       |fa_sn_a as (
       |  ${sessionCount("fa_scrub")}
       |),
       |fa_sn_r as (
       |  ${sessionCount("fa_scrub", s" and user_id % $ForgetMod = $ForgetRes")}
       |),
       |${faHllCtes("fab_", "events")},
       |${faHllCtes("faa_", "fa_scrub")}
       |select 'events' as stage,
       |  (select count(*) from events) as rows_before,
       |  (select count(*) from fa_scrub) as rows_after,
       |  (select count(*) from events) - (select count(*) from fa_scrub) as removed,
       |  (select count(case when user_id % $ForgetMod = $ForgetRes then 1 end)
       |   from fa_scrub) as residual_refs,
       |  cast(null as double) as est_before, cast(null as double) as est_after
       |union all
       |select 'sessions',
       |  (select c from fa_sn_b), (select c from fa_sn_a),
       |  (select c from fa_sn_b) - (select c from fa_sn_a),
       |  (select c from fa_sn_r),
       |  cast(null as double), cast(null as double)
       |union all
       |select 'distinct_users',
       |  (select count(distinct user_id) from events),
       |  (select count(distinct user_id) from fa_scrub),
       |  (select count(distinct user_id) from events)
       |    - (select count(distinct user_id) from fa_scrub),
       |  (select count(distinct case when user_id % $ForgetMod = $ForgetRes
       |     then user_id end) from fa_scrub),
       |  (select est from fab_est), (select est from faa_est)""".stripMargin
  }

  /** Mirror Graph.personalizedPageRank: the same unrolled integer
    * rounds as [[copurchasePagerankQ]], with the teleport term gated
    * to the node % 13 = 1 seed set and the rank state starting at
    * scale on seeds, 0 elsewhere. */
  val copurchasePprQ: String = {
    import graft.operators.Graph.{PageRankScale, PageRankDampingPct, PprSeedMod}
    val teleport = 15L * PageRankScale / 100L
    val rounds = (1 to graft.Models.PageRankRounds).map { k =>
      s"""pr$k as (
         |  select d.node, d.degree,
         |    (case when d.node % $PprSeedMod = 1 then $teleport else 0 end)
         |    + ($PageRankDampingPct * coalesce(cast(s.in_sum as bigint), 0)) // 100 as rank_scaled
         |  from deg d left join (
         |    select sym.dst as node, sum(r.rank_scaled // r.degree) as in_sum
         |    from pr${k - 1} r join sym on r.node = sym.src group by 1
         |  ) s on d.node = s.node
         |)""".stripMargin
    }.mkString(",\n")
    s"""$copurchaseCtes,
       |sym as (select src, dst from edges union all select dst as src, src as dst from edges),
       |deg as (select src as node, count(*) as degree from sym group by 1),
       |pr0 as (
       |  select node, degree,
       |    case when node % $PprSeedMod = 1 then $PageRankScale else 0 end as rank_scaled
       |  from deg
       |),
       |$rounds
       |select node, node % $PprSeedMod = 1 as is_seed, rank_scaled,
       |  cast(rank_scaled as double) / cast($PageRankScale as double) as rank
       |from pr${graft.Models.PageRankRounds}""".stripMargin
  }

  /** Mirror Graph.pageRankDirected over the low→high-directed
    * co-purchase edges: the same unrolled fixed-point rounds as
    * [[copurchasePagerankQ]] plus the dangling-mass term — each round
    * cross-joins the previous round's dangling rank total and the node
    * count, adding `D div N` to every node's in-sum before damping.
    * DuckDB's bigint sums widen to hugeint, so every sum is cast back
    * before the integer floor divisions. */
  val copurchasePagerankDirectedQ: String = {
    import graft.operators.Graph.{PageRankDampingPct, PageRankScale}
    val base = 15L * PageRankScale / 100L
    val rounds = (1 to graft.Models.PageRankRounds).map { k =>
      s"""pd$k as (
         |  select b.node, b.out_degree,
         |    $base + ($PageRankDampingPct * (coalesce(cast(s.in_sum as bigint), 0)
         |      + cast(d.d_total as bigint) // nn.n_nodes)) // 100 as rank_scaled
         |  from pbase b
         |  left join (
         |    select de.dst as node, sum(r.rank_scaled // r.out_degree) as in_sum
         |    from pd${k - 1} r join de on r.node = de.src
         |    where r.out_degree > 0
         |    group by 1
         |  ) s on b.node = s.node
         |  cross join (
         |    select coalesce(sum(rank_scaled), 0) as d_total
         |    from pd${k - 1} where out_degree = 0
         |  ) d
         |  cross join nn
         |)""".stripMargin
    }.mkString(",\n")
    s"""$copurchaseCtes,
       |de as (select src, dst from edges),
       |pnodes as (
       |  select distinct node from (
       |    select src as node from de union all select dst as node from de
       |  ) u
       |),
       |pbase as (
       |  select n.node, coalesce(o.out_degree, 0) as out_degree
       |  from pnodes n left join (
       |    select src as node, count(*) as out_degree from de group by 1
       |  ) o on n.node = o.node
       |),
       |nn as (select count(*) as n_nodes from pnodes),
       |pd0 as (select node, out_degree, $PageRankScale as rank_scaled from pbase),
       |$rounds
       |select node, out_degree, rank_scaled,
       |  cast(rank_scaled as double) / cast($PageRankScale as double) as rank
       |from pd${graft.Models.PageRankRounds}""".stripMargin
  }

  /** Mirror Graph.bfsDistances: the k min-relaxation rounds UNROLLED
    * as CTEs (same round count via Models.BfsMaxHops, same integer-min
    * semantics — partition-order independence on the Spark side is
    * what makes the unrolled form bit-identical). Source = smallest
    * connected product id, exactly Models.productCopurchaseDistances'
    * min(src) over the edge table. */
  val copurchaseDistancesQ: String = {
    val k = graft.Models.BfsMaxHops
    val rounds = (1 to k).map { h =>
      s"""d$h as (
         |  select node, min(dist) as dist from (
         |    select node, dist from d${h - 1}
         |    union all
         |    select s.dst as node, $h as dist
         |    from d${h - 1} p join sym s on p.node = s.src
         |  ) u group by 1
         |)""".stripMargin
    }.mkString(",\n")
    s"""$copurchaseCtes,
       |sym as (select src, dst from edges union all select dst as src, src as dst from edges),
       |d0 as (select min(src) as node, 0 as dist from edges),
       |$rounds
       |select node, dist from d$k""".stripMargin
  }

  /** Mirror Models.copurchaseCloseness: the same strong-edge graph,
    * the same bounded-round all-pairs BFS unrolled per hop (root
    * carried through), the same exact-int per-node rollup and the
    * exact-rational harmonic numerator — doubles only in the two
    * output divisions. */
  val copurchaseClosenessQ: String = {
    val k = graft.Models.CoPurchaseMinWeight
    val h = graft.Models.BfsMaxHops
    require(h == 4, "harmonic_x12 is specialized to BfsMaxHops == 4")
    val rounds = (1 to h).map { r =>
      s"""ap$r as (
         |  select root, node, min(dist) as dist from (
         |    select root, node, dist from ap${r - 1}
         |    union all
         |    select p.root, s.dst as node, $r as dist
         |    from ap${r - 1} p join sym s on p.node = s.src
         |  ) u group by 1, 2
         |)""".stripMargin
    }.mkString(",\n")
    s"""${Sql.stagingCtes},
       |gi as (select distinct order_id as g, product_id as i from stg_order_items),
       |se as (
       |  select a.i as src, b.i as dst
       |  from gi a join gi b on a.g = b.g and a.i < b.i
       |  group by 1, 2 having count(*) >= $k
       |),
       |sym as (select src, dst from se union all select dst as src, src as dst from se),
       |ap0 as (select node as root, node, 0 as dist
       |        from (select distinct src as node from sym) n),
       |$rounds,
       |cl as (
       |  select root as node,
       |    count(*) as reach_n,
       |    cast(sum(cast(dist as bigint)) as bigint) as dist_sum,
       |    count(case when dist = 1 then 1 end) as d1_n,
       |    count(case when dist = 2 then 1 end) as d2_n,
       |    count(case when dist = 3 then 1 end) as d3_n,
       |    count(case when dist = 4 then 1 end) as d4_n
       |  from ap$h where dist > 0 group by 1
       |)
       |select node, reach_n, dist_sum, d1_n, d2_n, d3_n, d4_n,
       |  cast(reach_n as double) / cast(dist_sum as double) as closeness,
       |  12 * d1_n + 6 * d2_n + 4 * d3_n + 3 * d4_n as harmonic_x12,
       |  cast(12 * d1_n + 6 * d2_n + 4 * d3_n + 3 * d4_n as double) / 12.0
       |    as harmonic
       |from cl""".stripMargin
  }

  /** HYPERBALL mirror CTE chain over a symmetrized edge CTE: the
    * identical deterministic HLL register pipeline ([[hllUserCountsQ]]'s
    * integer arithmetic — md5-60 hash of 'hb|'||node, low-P-bit
    * register, leading-1 via binary string length), one register-max
    * relaxation round per hop (each iterate `as materialized` — it is
    * referenced by both the next round and its estimate CTE), then
    * per-hop estimates with the exact scaled harmonic sum, one double
    * division, and the quantized-ln linear-counting branch. */
  private def hyperBallCtes(symName: String, p: String, hops: Int): String = {
    import graft.operators.Sketches.{HllM, HllP, HllW, HllAlpha}
    val w1 = HllW + 1
    val init =
      s"""${p}n as (select distinct src as node from $symName),
         |${p}h as (
         |  select node,
         |    cast(('0x' || substr(md5('hb|' || cast(node as varchar)),1,15)) as bigint) as h
         |  from ${p}n
         |),
         |${p}st0 as (
         |  select node, h % $HllM as reg,
         |    case when (h >> $HllP) = 0 then $w1
         |         else $w1 - length(bin(h >> $HllP)) end as mj
         |  from ${p}h
         |)""".stripMargin
    val rounds = (1 to hops).map { r =>
      s"""${p}st$r as materialized (
         |  select node, reg, max(mj) as mj from (
         |    select node, reg, mj from ${p}st${r - 1}
         |    union all
         |    select s.dst as node, q.reg, q.mj
         |    from ${p}st${r - 1} q join $symName s on q.node = s.src
         |  ) u group by 1, 2
         |)""".stripMargin
    }
    val ests = (0 to hops).map { t =>
      s"""${p}e$t as (
         |  select node, sum(cast(1 as bigint) << ($w1 - mj)) as ssum, count(*) as nreg
         |  from ${p}st$t group by 1
         |),
         |${p}v$t as (
         |  select node,
         |    case when ($HllM - nreg) > 0 and raw <= ${2.5 * HllM}
         |      then cast(cast(ln($HllM::double / cast($HllM - nreg as double)) * $HllM::double
         |             as decimal(18,9)) as double)
         |      else raw end as est
         |  from (
         |    select node, nreg,
         |      ($HllAlpha::double * $HllM * $HllM) * cast(cast(1 as bigint) << $w1 as double)
         |        / cast(ssum + ($HllM - nreg) * (cast(1 as bigint) << $w1) as double) as raw
         |    from ${p}e$t) r
         |)""".stripMargin
    }
    ((init +: rounds) ++ ests).mkString(",\n")
  }

  /** Pivot + derived-centrality CTEs over [[hyperBallCtes]] output —
    * mirrors Models.hyperBallCentrality's fixed double expression
    * trees (clamped deltas, reach/Σdist, Σ dᵢ/i) verbatim. */
  private def hyperBallCentralityCtes(p: String): String =
    s"""hbp as (
       |  select n.node, v0.est as est_h0, v1.est as est_h1, v2.est as est_h2,
       |    v3.est as est_h3, v4.est as est_h4
       |  from ${p}n n
       |  join ${p}v0 v0 using (node) join ${p}v1 v1 using (node)
       |  join ${p}v2 v2 using (node) join ${p}v3 v3 using (node)
       |  join ${p}v4 v4 using (node)
       |),
       |hbd as (
       |  select node, est_h0, est_h1, est_h2, est_h3, est_h4,
       |    greatest(est_h1 - est_h0, 0.0) as d1_est,
       |    greatest(est_h2 - est_h1, 0.0) as d2_est,
       |    greatest(est_h3 - est_h2, 0.0) as d3_est,
       |    greatest(est_h4 - est_h3, 0.0) as d4_est
       |  from hbp
       |),
       |hbc as (
       |  select node, est_h0, est_h1, est_h2, est_h3, est_h4,
       |    d1_est, d2_est, d3_est, d4_est,
       |    d1_est + d2_est + d3_est + d4_est as reach_approx,
       |    d1_est + 2.0 * d2_est + 3.0 * d3_est + 4.0 * d4_est as dist_sum_approx
       |  from hbd
       |),
       |hbf as (
       |  select node, est_h0, est_h1, est_h2, est_h3, est_h4,
       |    d1_est, d2_est, d3_est, d4_est, reach_approx, dist_sum_approx,
       |    case when dist_sum_approx > 0.0
       |      then reach_approx / dist_sum_approx end as closeness_approx,
       |    d1_est + d2_est / 2.0 + d3_est / 3.0 + d4_est / 4.0 as harmonic_approx
       |  from hbc
       |)""".stripMargin

  /** Mirror Models.copurchaseClosenessApprox: HyperBall on the RAW
    * co-purchase graph (the one the exact all-pairs operator
    * measurably cannot serve), full register-relaxation mirror. */
  val copurchaseClosenessApproxQ: String = {
    require(graft.Models.BfsMaxHops == 4, "mirror specialized to 4 hops")
    s"""$copurchaseCtes,
       |rsym as (select src, dst from edges
       |         union all select dst as src, src as dst from edges),
       |${hyperBallCtes("rsym", "r", 4)},
       |${hyperBallCentralityCtes("r")}
       |select node, est_h0, est_h1, est_h2, est_h3, est_h4,
       |  d1_est, d2_est, d3_est, d4_est, reach_approx, dist_sum_approx,
       |  closeness_approx, harmonic_approx
       |from hbf""".stripMargin
  }

  /** Mirror Models.copurchaseDistanceDistribution: the full HyperBall
    * register relaxation unrolled to the HARD CAP, the same monotone
    * (row count, Σ mj) fixpoint detection (exact integer pairs, lag
    * over the round index), hops filtered to the measured fixpoint
    * depth, micro-unit mass sums, and the interpolated effective
    * diameter / average distance with the identical fixed double
    * trees. */
  val copurchaseDistanceDistributionQ: String = {
    val cap = graft.Models.HyperBallHardCap
    val snaps = (0 to cap).map { r =>
      s"""select $r as r,
         |  (select cast(count(*) as bigint) from rst$r) as cnt,
         |  (select cast(coalesce(sum(mj), 0) as bigint) from rst$r) as sm"""
        .stripMargin
    }.mkString("\nunion all\n")
    val allHops = (0 to cap).map(t =>
      s"select $t as hop, node, est from rv$t").mkString("\nunion all\n")
    s"""$copurchaseCtes,
       |rsym as (select src, dst from edges
       |         union all select dst as src, src as dst from edges),
       |${hyperBallCtes("rsym", "r", cap)},
       |rsn as (
       |$snaps
       |),
       |rchg as (
       |  select r, cnt, sm,
       |    lag(cnt) over (order by r) as pcnt,
       |    lag(sm) over (order by r) as psm
       |  from rsn
       |),
       |rfx as (
       |  select min(case when cnt = pcnt and sm = psm then r end) is not null
       |           as converged,
       |         coalesce(min(case when cnt = pcnt and sm = psm then r end),
       |           ${cap + 1}) as tstar
       |  from rchg
       |),
       |rall as (
       |$allHops
       |),
       |rmass as (
       |  select hop, cast(count(*) as bigint) as n_nodes,
       |    cast(sum(cast(floor(est * 1000000.0 + 0.5) as bigint)) as bigint)
       |      as mass_q6
       |  from rall cross join rfx where hop < tstar group by 1
       |),
       |rdel as (
       |  select hop, n_nodes, mass_q6,
       |    lag(mass_q6) over (order by hop) as prev_q6,
       |    case when hop >= 1
       |      then mass_q6 - lag(mass_q6) over (order by hop) end as delta_q6
       |  from rmass
       |),
       |rtot as (
       |  select max(hop) as n_hops_converged,
       |    max(mass_q6) as mt_q6,
       |    max(case when hop = 0 then mass_q6 end) as m0_q6,
       |    cast(coalesce(sum(hop * delta_q6), 0) as bigint) as wsum_q6
       |  from rdel
       |),
       |rt90 as (
       |  select hop as t90, mass_q6 as t90_q6, prev_q6 as t90_prev_q6
       |  from rdel cross join rtot
       |  where mass_q6 * 10 >= mt_q6 * 9
       |  order by hop limit 1
       |),
       |rsum as (
       |  select n_hops_converged,
       |    (select converged from rfx) as converged,
       |    case when t90 = 0 then 0.0 else
       |      cast(t90 - 1 as double)
       |      + (0.9 * cast(mt_q6 as double) - cast(t90_prev_q6 as double))
       |        / (cast(t90_q6 as double) - cast(t90_prev_q6 as double)) end
       |      as effective_diameter_90,
       |    case when mt_q6 > m0_q6 then
       |      cast(wsum_q6 as double) / cast(mt_q6 - m0_q6 as double) end
       |      as avg_distance,
       |    mt_q6
       |  from rtot cross join rt90
       |)
       |select d.hop, d.n_nodes, d.mass_q6,
       |  cast(d.mass_q6 as double) / 1000000.0 as ball_mass,
       |  d.delta_q6,
       |  cast(d.mass_q6 as double) / cast(s.mt_q6 as double) as cum_fraction,
       |  s.n_hops_converged, s.converged, s.effective_diameter_90,
       |  s.avg_distance
       |from rdel d cross join rsum s""".stripMargin
  }

  /** Mirror Models.closenessApproxError: HyperBall AND the exact
    * all-pairs BFS on the same strong graph, per-node floor'd ppm
    * error integers (Spark's double→long cast truncates, DuckDB's
    * rounds — floor is the shared exact step), integer sum/max
    * summary (sum cast from DuckDB's HUGEINT back to bigint), one
    * division per mean. */
  val closenessApproxErrorQ: String = {
    val k = graft.Models.CoPurchaseMinWeight
    val ppm = graft.Models.ErrPpmScale
    require(graft.Models.BfsMaxHops == 4, "mirror specialized to 4 hops")
    val rounds = (1 to 4).map { r =>
      s"""ap$r as (
         |  select root, node, min(dist) as dist from (
         |    select root, node, dist from ap${r - 1}
         |    union all
         |    select q.root, s.dst as node, $r as dist
         |    from ap${r - 1} q join ssym s on q.node = s.src
         |  ) u group by 1, 2
         |)""".stripMargin
    }.mkString(",\n")
    s"""${Sql.stagingCtes},
       |gi as (select distinct order_id as g, product_id as i from stg_order_items),
       |se as (
       |  select a.i as src, b.i as dst
       |  from gi a join gi b on a.g = b.g and a.i < b.i
       |  group by 1, 2 having count(*) >= $k
       |),
       |ssym as (select src, dst from se union all select dst as src, src as dst from se),
       |${hyperBallCtes("ssym", "s", 4)},
       |${hyperBallCentralityCtes("s")},
       |ap0 as (select node as root, node, 0 as dist
       |        from (select distinct src as node from ssym) n),
       |$rounds,
       |cl as (
       |  select root as node,
       |    count(*) as reach_n,
       |    count(case when dist = 1 then 1 end) as d1_n,
       |    count(case when dist = 2 then 1 end) as d2_n,
       |    count(case when dist = 3 then 1 end) as d3_n,
       |    count(case when dist = 4 then 1 end) as d4_n
       |  from ap4 where dist > 0 group by 1
       |),
       |clf as (
       |  select node, reach_n,
       |    cast(12 * d1_n + 6 * d2_n + 4 * d3_n + 3 * d4_n as double) / 12.0
       |      as harmonic
       |  from cl
       |),
       |err as (
       |  select c.node,
       |    cast(floor(abs(f.reach_approx - cast(c.reach_n as double))
       |      / cast(c.reach_n as double) * $ppm.0) as bigint) as reach_err_ppm,
       |    cast(floor(abs(f.harmonic_approx - c.harmonic)
       |      / c.harmonic * $ppm.0) as bigint) as harmonic_err_ppm
       |  from clf c join hbf f using (node)
       |)
       |select count(*) as n_nodes,
       |  cast(sum(reach_err_ppm) as bigint) as reach_err_ppm_sum,
       |  max(reach_err_ppm) as reach_err_ppm_max,
       |  cast(cast(sum(reach_err_ppm) as bigint) as double)
       |    / cast(count(*) as double) as reach_err_ppm_mean,
       |  cast(sum(harmonic_err_ppm) as bigint) as harmonic_err_ppm_sum,
       |  max(harmonic_err_ppm) as harmonic_err_ppm_max,
       |  cast(cast(sum(harmonic_err_ppm) as bigint) as double)
       |    / cast(count(*) as double) as harmonic_err_ppm_mean
       |from err""".stripMargin
  }

  /** Mirror Graph.widestPaths over the weighted strong-edge graph:
    * the SAME max-min relaxation unrolled Models.BottleneckRounds
    * times from the same min-src source, the same one-extra-round
    * fixpoint probe for the `converged` flag, the same sentinel→NULL
    * boundary. Each round references its predecessor twice, so every
    * iterate is `as materialized` (the k-core fd-blowup lesson). */
  val copurchaseBottleneckQ: String = {
    val inf = graft.operators.Graph.WidestInf
    val r = graft.Models.BottleneckRounds
    def relax(prev: String): String =
      s"""  select node, max(cap) as cap from (
         |    select node, cap from $prev
         |    union all
         |    select s.dst as node, least(p.cap, s.weight) as cap
         |    from $prev p join wsym s on p.node = s.src
         |  ) u group by 1""".stripMargin
    val rounds = (1 to r).map { h =>
      s"""wb$h as materialized (
         |${relax(s"wb${h - 1}")}
         |)""".stripMargin
    }.mkString(",\n")
    s"""${Sql.stagingCtes},
       |gi as (select distinct order_id as g, product_id as i from stg_order_items),
       |wse as materialized (
       |  select a.i as src, b.i as dst, cast(count(*) as bigint) as weight
       |  from gi a join gi b on a.g = b.g and a.i < b.i
       |  group by 1, 2 having count(*) >= ${graft.Models.CoPurchaseMinWeight}
       |),
       |wsym as materialized (
       |  select src, dst, weight from wse
       |  union all
       |  select dst as src, src as dst, weight from wse
       |),
       |wb0 as (
       |  select node, cast($inf as bigint) as cap from (
       |    select node, count(*) as degree from (
       |      select src as node from wse union all select dst as node from wse
       |    ) d group by 1 order by degree desc, node limit 1
       |  ) h
       |),
       |$rounds,
       |wbx as (
       |${relax(s"wb$r")}
       |),
       |wchg as (
       |  select count(*) as n from wbx e left join wb$r c on e.node = c.node
       |  where c.node is null or e.cap != c.cap
       |)
       |select node,
       |  case when cap = $inf then null else cap end as bottleneck,
       |  (select n from wchg) = 0 as converged
       |from wb$r""".stripMargin
  }

  /** Mirror Graph.labelPropagationWithSizes over the strong-edge
    * affinity graph: Models.LpaRounds synchronous rounds UNROLLED —
    * per round, neighbor-label counts then the deterministic pick
    * (count desc, label asc) via row_number — plus the final
    * community-size join. Same thresholded edge set as the triangle
    * queries. */
  val copurchaseCommunitiesQ: String = {
    val rounds = (1 to graft.Models.LpaRounds).map { t =>
      s"""lpc$t as (
         |  select s.dst as node, l.label, count(*) as n
         |  from lp${t - 1} l join lsym s on l.node = s.src
         |  group by 1, 2
         |),
         |lp$t as (
         |  select node, label from (
         |    select node, label,
         |      row_number() over (partition by node order by n desc, label) as rn
         |    from lpc$t) t where rn = 1
         |)""".stripMargin
    }.mkString(",\n")
    val last = s"lp${graft.Models.LpaRounds}"
    s"""${Sql.stagingCtes},
       |gi as (select distinct order_id as g, product_id as i from stg_order_items),
       |se as (
       |  select a.i as src, b.i as dst
       |  from gi a join gi b on a.g = b.g and a.i < b.i
       |  group by 1, 2 having count(*) >= ${graft.Models.CoPurchaseMinWeight}
       |),
       |lsym as (select src, dst from se union all select dst as src, src as dst from se),
       |lp0 as (
       |  select node, node as label from (select distinct src as node from lsym) n
       |),
       |$rounds
       |select l.node, l.label as community, cs.community_size
       |from $last l join (
       |  select label, count(*) as community_size from $last group by 1
       |) cs on l.label = cs.label""".stripMargin
  }

  /** Mirror EventMarts.locfHourly: the same hour spine from the whole
    * table's ts bounds, the same sparse high-value hourly decimal
    * sums, the same `last_value ignore nulls` carry over the
    * per-type hour order, the same decimal→varchar→double boundary. */
  val eventsLocfHourlyQ: String =
    s"""with lb as (
       |  select date_trunc('hour', min(ts)) as h0,
       |         date_trunc('hour', max(ts)) as h1
       |  from events
       |),
       |lsp as (select unnest(generate_series(h0, h1, interval 1 hour)) as hour from lb),
       |lty as (select distinct event_type from events),
       |lh as (
       |  select event_type, date_trunc('hour', ts) as hour,
       |    cast(count(*) as bigint) as n_events,
       |    sum(cast(value as decimal(18,6))) as v
       |  from events
       |  where value >= ${graft.marts.EventMarts.LocfValueMin}
       |  group by 1, 2
       |)
       |select t.event_type, s.hour,
       |  coalesce(h.n_events, 0) as n_events,
       |  h.v is null as is_gap,
       |  cast(cast(last_value(h.v ignore nulls) over (
       |    partition by t.event_type order by s.hour
       |    rows between unbounded preceding and current row) as varchar) as double)
       |    as value_locf
       |from lsp s cross join lty t
       |left join lh h on h.event_type = t.event_type and h.hour = s.hour""".stripMargin

  /** Mirror AnalyticsMarts.lineitemCube: the same grouping sets, the
    * same exact double→decimal(12,2) input cast (integral TPC-H
    * quantities), the same grouping() flags. */
  /** Mirror Sketches.joinSizeEstimate over lineitem ⋈ lineitem on
    * l_partkey: the same d salted md5-60 hash rows × w counters on
    * both sides, per-row inner product, min-over-rows estimate, with
    * the exact Σ c² join size riding along. */
  val joinSizeEstimateQ: String = {
    import graft.operators.Sketches.{CmsD, CmsSalt, CmsWidth}
    val rows = (0 until CmsD).map(r => s"($r)").mkString(", ")
    val h = s"cast(('0x' || substr(md5('$CmsSalt' || cast(r as varchar) || '|' || k),1,15)) as bigint) % $CmsWidth"
    s"""with keys as (select cast(l_partkey as varchar) as k from lineitem),
       |rr(r) as (values $rows),
       |counters as materialized (
       |  select r, $h as bkt, count(*) as cnt
       |  from keys cross join rr group by 1, 2
       |),
       |est as (
       |  select min(row_est) as est_pairs from (
       |    select a.r, cast(sum(a.cnt * b.cnt) as bigint) as row_est
       |    from counters a join counters b on a.r = b.r and a.bkt = b.bkt
       |    group by 1) x
       |),
       |kc as materialized (select k, count(*) as c from keys group by 1),
       |ex as (
       |  select cast(coalesce(sum(a.c * b.c), 0) as bigint) as true_pairs,
       |    count(*) as n_shared_keys
       |  from kc a join kc b on a.k = b.k
       |)
       |select n_shared_keys, true_pairs, est_pairs,
       |  case when true_pairs > 0
       |    then cast(est_pairs - true_pairs as double) / cast(true_pairs as double)
       |    else cast(0.0 as double) end as rel_err
       |from ex cross join est""".stripMargin
  }

  val lineitemCubeQ: String =
    """select l_returnflag, l_linestatus,
      |  cast(sum(cast(l_quantity as decimal(12,2))) as decimal(18,2)) as sum_qty,
      |  cast(count(*) as bigint) as n_items,
      |  cast(grouping(l_returnflag) as bigint) as g_returnflag,
      |  cast(grouping(l_linestatus) as bigint) as g_linestatus
      |from lineitem
      |group by cube(l_returnflag, l_linestatus)""".stripMargin

  /** Mirror EventMarts.eventSeqSupport: the same greedy-earliest
    * subsequence extensions (min-ts per prefix, strict > chaining),
    * per-pattern user counts, one support division. */
  val eventSeqSupportQ: String =
    s"""with seq_e as (select user_id, event_type, ts from events),
       |seq_tot as (
       |  select cast(count(distinct user_id) as bigint) as n_total from seq_e
       |),
       |seq_f1 as (
       |  select user_id, event_type as t1, min(ts) as ts1
       |  from seq_e group by 1, 2
       |),
       |seq_f2 as materialized (
       |  select f.user_id, f.t1, e.event_type as t2, min(e.ts) as ts2
       |  from seq_f1 f join seq_e e
       |    on e.user_id = f.user_id and e.ts > f.ts1
       |  group by 1, 2, 3
       |),
       |seq_f3 as (
       |  select f.user_id, f.t1, f.t2, e.event_type as t3
       |  from seq_f2 f join seq_e e
       |    on e.user_id = f.user_id and e.ts > f.ts2
       |  group by 1, 2, 3, 4
       |),
       |seq_p as (
       |  select 2 as pattern_len, t1, t2, cast(null as varchar) as t3,
       |    cast(count(*) as bigint) as n_users
       |  from seq_f2 group by t1, t2
       |  union all
       |  select 3, t1, t2, t3, cast(count(*) as bigint)
       |  from seq_f3 group by t1, t2, t3
       |)
       |select pattern_len, t1, t2, t3, n_users,
       |  cast(n_users as double) / cast(n_total as double) as support
       |from seq_p cross join seq_tot""".stripMargin

  /** Mirror EventMarts.eventMarkov: the (ts, event_id)-ordered lead
    * pairing, the dense row-normalized matrix with the uniform
    * dangling row, and the unrolled k-step π folds over the
    * (prev asc, next asc) list-of-lists — the identical index-ordered
    * reduction trees. */
  val eventMarkovQ: String = {
    val k = graft.marts.EventMarts.MarkovSteps
    val steps = (1 to k).map { r =>
      s"""mk_p$r as (
         |  select pm, n, list_transform(generate_series(1, n), j ->
         |    list_reduce(list_transform(generate_series(1, n),
         |      i -> pi[i] * pm[i][j]), (a, x) -> a + x)) as pi
         |  from mk_p${r - 1}
         |)""".stripMargin
    }.mkString(",\n")
    s"""with mk_s as (
       |  select event_type, lead(event_type) over (
       |    partition by user_id order by ts, event_id) as next_type
       |  from events
       |),
       |mk_t as (
       |  select event_type as prev_type, next_type,
       |    cast(count(*) as bigint) as n_trans
       |  from mk_s where next_type is not null group by 1, 2
       |),
       |mk_ty as (select distinct event_type as t from events),
       |mk_rt as (
       |  select prev_type, cast(sum(n_trans) as bigint) as n_from
       |  from mk_t group by 1
       |),
       |mk_n as (select cast(count(*) as bigint) as n_types from mk_ty),
       |mk_d as materialized (
       |  select a.t as prev_type, b.t as next_type,
       |    coalesce(t.n_trans, 0) as n_trans,
       |    coalesce(r.n_from, 0) as n_from,
       |    case when r.n_from is null then 1.0 / cast(n.n_types as double)
       |         else cast(coalesce(t.n_trans, 0) as double)
       |              / cast(r.n_from as double) end as p
       |  from mk_ty a cross join mk_ty b
       |  left join mk_t t on t.prev_type = a.t and t.next_type = b.t
       |  left join mk_rt r on r.prev_type = a.t
       |  cross join mk_n n
       |),
       |mk_m as (
       |  select list(pr order by prev_type) as pm, cast(count(*) as int) as n
       |  from (
       |    select prev_type, list(p order by next_type) as pr
       |    from mk_d group by 1) t
       |),
       |mk_p0 as (
       |  select pm, n, list_transform(generate_series(1, n),
       |    j -> 1.0 / cast(n as double)) as pi
       |  from mk_m
       |),
       |$steps,
       |mk_pr as (
       |  select ty.t as next_type, pi[ty.j] as pi_k
       |  from (select t, cast(row_number() over (order by t) as int) as j
       |        from mk_ty) ty
       |  cross join mk_p$k
       |)
       |select d.prev_type, d.next_type, d.n_trans, d.n_from, d.p,
       |  $k as n_steps, r.pi_k
       |from mk_d d join mk_pr r using (next_type)""".stripMargin
  }
}
