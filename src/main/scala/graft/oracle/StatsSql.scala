package graft.oracle

import graft.marts.StatsMarts

/** DuckDB mirrors of the round-14 statistics/DQ family
  * ([[graft.marts.StatsMarts]]). Same determinism discipline as
  * [[Sql]]: exact int64 cents/counts everywhere, doubles only as the
  * final single divisions (or ordered left folds where a total of
  * doubles is unavoidable — never an engine-ordered SUM). */
object StatsSql {

  private val ctes = Sql.stagingCtes

  /** Double literal pinned to a DuckDB DOUBLE parse — see [[Sql.dlit]]
    * (the benford_digits ULP lesson lives there). */
  private def dlit(v: Double): String = Sql.dlit(v)

  /** Mirror StatsMarts.custCentsRanked: ascending-cents global rank,
    * customer_id tiebreak (Ranks orders by negated cents desc). */
  private val giniBase: String =
    """gini_c as (
      |  select customer_id,
      |    cast(sum(cast(order_total * 100 as bigint)) as bigint) as cents
      |  from stg_orders group by customer_id
      |),
      |gini_r as (
      |  select customer_id, cents,
      |    cast(row_number() over (order by cents, customer_id) as int) as rnk
      |  from gini_c
      |)""".stripMargin

  /** Mirror StatsMarts.revenueGini: the rank-formula Gini with exact
    * int64 numerator/denominator and ONE output division. DuckDB sums
    * bigint into HUGEINT — narrowed back (values fit int64;
    * StatsMartsSpec asserts the headroom). */
  val revenueGiniQ: String =
    s"""$ctes,
       |$giniBase,
       |gini_a as (
       |  select count(*) as n_customers,
       |    cast(sum(cents) as bigint) as total_cents,
       |    cast(sum(cast(rnk as bigint) * cents) as bigint) as rank_weighted
       |  from gini_r
       |)
       |select n_customers, total_cents,
       |  cast(2 * rank_weighted - (n_customers + 1) * total_cents as double)
       |    / cast(n_customers * total_cents as double) as gini
       |from gini_a""".stripMargin

  /** Mirror StatsMarts.lorenzDeciles: exact integer decile buckets
    * over the tie-broken rank, 10-row cumulative in exact int64. */
  val lorenzDecilesQ: String =
    s"""$ctes,
       |$giniBase,
       |lor_t as (select count(*) as n, cast(sum(cents) as bigint) as s from gini_c),
       |lor_d as (
       |  select cast(((rnk - 1) * 10) // n as int) + 1 as decile,
       |    count(*) as n_customers, cast(sum(cents) as bigint) as cents,
       |    max(s) as s
       |  from gini_r cross join lor_t group by 1
       |),
       |lor_c as (
       |  select decile, n_customers, cents, s,
       |    cast(sum(cents) over (order by decile
       |      rows between unbounded preceding and current row) as bigint) as cum_cents
       |  from lor_d
       |)
       |select decile, n_customers, cents, cum_cents,
       |  cast(cents as double) / cast(s as double) as share,
       |  cast(cum_cents as double) / cast(s as double) as cum_share
       |from lor_c""".stripMargin

  /** case expression mapping first digit → Benford literal (the SAME
    * shortest-round-trip double literals the Spark side embeds). */
  private val benfordCase: String =
    "case digit " +
      (1 to 9).map(d => s"when $d then ${dlit(StatsMarts.BenfordP(d))}").mkString(" ") +
      " end"

  /** Benford CTE chain from a cents-producing select body (shared by
    * the orders audit, the events audit, and the streaming monitor —
    * the stream gates against the same oracle, so a lost batch fails
    * the hash). */
  def benfordBaseFrom(centsSelect: String): String =
    s"""ben_c as (
       |  select cents from ($centsSelect) src where cents > 0
       |),
       |ben_d as (
       |  select cast(substring(cast(cents as varchar), 1, 1) as int) as digit
       |  from ben_c
       |),
       |ben_t as (select count(*) as n from ben_d),
       |ben_s as (select cast(range as int) as digit from range(1, 10)),
       |ben_g0 as (
       |  select digit, count(*) as n_obs from ben_d group by digit
       |),
       |ben_g as (
       |  select s.digit, coalesce(g.n_obs, 0) as n_obs, t.n
       |  from ben_s s left join ben_g0 g on g.digit = s.digit
       |  cross join ben_t t
       |),
       |ben_p as (
       |  select digit, n_obs, n,
       |    cast(n_obs as double) / cast(n as double) as share,
       |    $benfordCase as benford_p,
       |    cast(n as double) * ($benfordCase) as expected_n
       |  from ben_g
       |),
       |ben_x as (
       |  select digit, n_obs, n, share, benford_p, expected_n,
       |    ((cast(n_obs as double) - expected_n)
       |      * (cast(n_obs as double) - expected_n)) / expected_n as chi2_term
       |  from ben_p
       |)""".stripMargin

  /** Mirror StatsMarts.eventBenford: explicit floor (DuckDB's
    * double→bigint cast rounds; Spark's truncates — floor is the
    * shared exact step), then the same digit chain. */
  val eventBenfordQ: String =
    s"""with ${benfordBaseFrom(
      "select cast(floor(value * 100) as bigint) as cents from events")}
       |select digit, n_obs, n, share, benford_p, expected_n, chi2_term
       |from ben_x""".stripMargin

  private val benfordBase: String =
    s"""ben_c as (
       |  select cast(order_total * 100 as bigint) as cents from stg_orders
       |  where cast(order_total * 100 as bigint) > 0
       |),
       |ben_d as (
       |  select cast(substring(cast(cents as varchar), 1, 1) as int) as digit
       |  from ben_c
       |),
       |ben_t as (select count(*) as n from ben_d),
       |ben_s as (select cast(range as int) as digit from range(1, 10)),
       |ben_g0 as (
       |  select digit, count(*) as n_obs from ben_d group by digit
       |),
       |ben_g as (
       |  select s.digit, coalesce(g.n_obs, 0) as n_obs, t.n
       |  from ben_s s left join ben_g0 g on g.digit = s.digit
       |  cross join ben_t t
       |),
       |ben_p as (
       |  select digit, n_obs, n,
       |    cast(n_obs as double) / cast(n as double) as share,
       |    $benfordCase as benford_p,
       |    cast(n as double) * ($benfordCase) as expected_n
       |  from ben_g
       |),
       |ben_x as (
       |  select digit, n_obs, n, share, benford_p, expected_n,
       |    ((cast(n_obs as double) - expected_n)
       |      * (cast(n_obs as double) - expected_n)) / expected_n as chi2_term
       |  from ben_p
       |)""".stripMargin

  /** Mirror StatsMarts.benfordDigits: exact string first-digit, exact
    * counts, the identical three-op χ²-term chain. */
  val benfordDigitsQ: String =
    s"""$ctes,
       |$benfordBase
       |select digit, n_obs, n, share, benford_p, expected_n, chi2_term
       |from ben_x""".stripMargin

  /** Mirror StatsMarts.benfordSummary: χ² and MAD totals as ORDERED
    * LEFT FOLDS over the digit-sorted 9-row list (list_reduce with a
    * prepended 0.0 = Spark's aggregate with 0.0 init) — never an
    * engine-ordered double SUM. */
  val benfordSummaryQ: String =
    s"""$ctes,
       |$benfordBase,
       |ben_v as (
       |  select digit, n, chi2_term,
       |    case when share >= benford_p then share - benford_p
       |         else benford_p - share end as abs_dev
       |  from ben_x
       |),
       |ben_f as (
       |  select max(n) as n,
       |    list_reduce(list_prepend(cast(0.0 as double),
       |      list(chi2_term order by digit)), (acc, x) -> acc + x) as chi2,
       |    list_reduce(list_prepend(cast(0.0 as double),
       |      list(abs_dev order by digit)), (acc, x) -> acc + x) as mad_sum
       |  from ben_v
       |)
       |select n, chi2, mad_sum / 9.0 as mad, 8 as df,
       |  chi2 > ${dlit(StatsMarts.BenfordChi2Crit05)} as reject_05
       |from ben_f""".stripMargin

  /** Mirror StatsMarts.ksWeekendDrift: exact-integer ECDF gap
    * |cum_a·n_b − cum_b·n_a| maximized over the pooled cents grid,
    * minimal-cents argmax, one output division + the literal-coef
    * critical value. DuckDB dayofweek: Sunday=0, Saturday=6 (Spark:
    * 1 and 7 — each engine speaks its own calendar dialect, the
    * PREDICATE is what the contract pins). */
  val ksWeekendDriftQ: String =
    s"""$ctes,
       |ks_b as (
       |  select cast(order_total * 100 as bigint) as cents,
       |    dayofweek(ordered_at) in (0, 6) as is_weekend
       |  from stg_orders
       |),
       |ks_v as (
       |  select cents,
       |    count(case when not is_weekend then 1 end) as n_wd,
       |    count(case when is_weekend then 1 end) as n_we
       |  from ks_b group by cents
       |),
       |ks_c as (
       |  select cents, n_wd, n_we,
       |    cast(sum(n_wd) over w as bigint) as cum_n_wd,
       |    cast(sum(n_we) over w as bigint) as cum_n_we
       |  from ks_v
       |  window w as (order by cents
       |               rows between unbounded preceding and current row)
       |),
       |ks_t as (
       |  select cast(sum(n_wd) as bigint) as t_wd,
       |    cast(sum(n_we) as bigint) as t_we
       |  from ks_v
       |),
       |ks_d as (
       |  select cents, t_wd, t_we,
       |    abs(cum_n_wd * t_we - cum_n_we * t_wd) as diff_num
       |  from ks_c cross join ks_t
       |),
       |ks_m as (select max(diff_num) as ks_num from ks_d),
       |ks_f as (
       |  select max(t_wd) as n_weekday, max(t_we) as n_weekend,
       |    max(ks_num) as ks_num, min(cents) as ks_at_cents
       |  from ks_d join ks_m on diff_num = ks_num
       |)
       |select n_weekday, n_weekend, ks_num, ks_at_cents,
       |  case when n_weekday > 0 and n_weekend > 0 then cast(ks_num as double)
       |    / cast(n_weekday * n_weekend as double) end as ks_stat,
       |  case when n_weekday > 0 and n_weekend > 0 then
       |    ${dlit(StatsMarts.KsCoef05)} * sqrt(cast(n_weekday + n_weekend as double)
       |      / cast(n_weekday * n_weekend as double)) end as crit_05,
       |  coalesce(case when n_weekday > 0 and n_weekend > 0 then
       |    cast(ks_num as double) / cast(n_weekday * n_weekend as double)
       |      > ${dlit(StatsMarts.KsCoef05)} * sqrt(cast(n_weekday + n_weekend as double)
       |        / cast(n_weekday * n_weekend as double)) end, false) as reject_05
       |from ks_f""".stripMargin

  /** Mirror StatsMarts.customerSurvivalKm: same churn/censor split at
    * the pinned run date, same at-risk prefix arithmetic, and the
    * IDENTICAL int64 recursion S_k = (S_{k−1}·(n−d)) div n — Spark
    * folds a sorted array, DuckDB walks a recursive CTE; exactness
    * makes the mechanisms equivalent. */
  val customerSurvivalKmQ: String = {
    import StatsMarts.{ChurnHorizonDays, KmScale}
    s"""$ctes,
       |km_c as (
       |  select customer_id, min(ordered_at) as first_at,
       |    max(ordered_at) as last_at
       |  from stg_orders group by customer_id
       |),
       |km_o as (
       |  select
       |    case when (${Sql.runDate} - last_at) > $ChurnHorizonDays
       |         then (last_at - first_at)
       |         else (${Sql.runDate} - first_at) end as t_days,
       |    (${Sql.runDate} - last_at) > $ChurnHorizonDays as churned
       |  from km_c
       |),
       |km_t as (
       |  select t_days,
       |    count(case when churned then 1 end) as d_events,
       |    count(case when not churned then 1 end) as c_censored
       |  from km_o group by t_days
       |),
       |km_n as (
       |  select cast(sum(d_events) + sum(c_censored) as bigint) as n_total
       |  from km_t
       |),
       |km_r as (
       |  select t_days, d_events, c_censored,
       |    n_total
       |      - (cast(sum(d_events) over w as bigint) - d_events)
       |      - (cast(sum(c_censored) over w as bigint) - c_censored) as n_risk
       |  from km_t cross join km_n
       |  window w as (order by t_days
       |               rows between unbounded preceding and current row)
       |),
       |km_i as (
       |  select row_number() over (order by t_days) as i,
       |    t_days, n_risk, d_events, c_censored
       |  from km_r
       |),
       |km_s as (
       |  with recursive rec as (
       |    select i, t_days, n_risk, d_events, c_censored,
       |      (cast($KmScale as bigint) * (n_risk - d_events)) // n_risk as s_scaled
       |    from km_i where i = 1
       |    union all
       |    select k.i, k.t_days, k.n_risk, k.d_events, k.c_censored,
       |      (r.s_scaled * (k.n_risk - k.d_events)) // k.n_risk
       |    from rec r join km_i k on k.i = r.i + 1)
       |  select * from rec
       |)
       |select t_days, n_risk, d_events, c_censored,
       |  cast(s_scaled as bigint) as s_scaled,
       |  cast(s_scaled as double) / cast($KmScale as double) as survival
       |from km_s""".stripMargin
  }

  /** Mirror StatsMarts.basketRules: exact pair/item/order counts over
    * the size-capped kept baskets, single-division ratios, exact-int
    * lift operands, and the truncation accounting (global capped-order
    * count, per-product capped membership). */
  val basketRulesQ: String =
    s"""$ctes,
       |bk_i0 as (select distinct order_id, product_id from stg_order_items),
       |bk_big as (
       |  select order_id from bk_i0
       |  group by order_id having count(*) > ${StatsMarts.BasketSizeCap}
       |),
       |bk_i as (
       |  select * from bk_i0
       |  where order_id not in (select order_id from bk_big)
       |),
       |bk_n as (select count(distinct order_id) as n_orders from bk_i),
       |bk_nc as (
       |  select cast(count(*) as bigint) as n_capped_orders from bk_big
       |),
       |bk_cn as (
       |  select product_id, cast(count(*) as bigint) as capped_n
       |  from bk_i0 where order_id in (select order_id from bk_big)
       |  group by 1
       |),
       |bk_s as (select product_id, count(*) as supp from bk_i group by product_id),
       |bk_p as (
       |  select a.product_id as product_a, b.product_id as product_b,
       |    count(*) as pair_n
       |  from bk_i a
       |  join bk_i b on a.order_id = b.order_id
       |    and a.product_id < b.product_id
       |  group by 1, 2
       |  having count(*) >= ${StatsMarts.BasketMinPairs}
       |)
       |select product_a, product_b, pair_n,
       |  sa.supp as a_n, sb.supp as b_n, n_orders,
       |  cast(pair_n as double) / cast(n_orders as double) as support,
       |  cast(pair_n as double) / cast(sa.supp as double) as conf_a_to_b,
       |  cast(pair_n as double) / cast(sb.supp as double) as conf_b_to_a,
       |  cast(pair_n * n_orders as double)
       |    / cast(sa.supp * sb.supp as double) as lift,
       |  n_capped_orders,
       |  coalesce(ca.capped_n, 0) as a_capped_n,
       |  coalesce(cb.capped_n, 0) as b_capped_n
       |from bk_p
       |join bk_s sa on sa.product_id = product_a
       |join bk_s sb on sb.product_id = product_b
       |left join bk_cn ca on ca.product_id = product_a
       |left join bk_cn cb on cb.product_id = product_b
       |cross join bk_n
       |cross join bk_nc""".stripMargin

  /** Shared contingency CTE chain for the segment × priority test. */
  private val chi2Base: String =
    """cx_j as (
      |  select o.customer_id, o.order_priority, c.market_segment
      |  from stg_orders o
      |  join stg_customers c on o.customer_id = c.customer_id
      |),
      |cx_c as (
      |  select market_segment, order_priority, count(*) as n_obs
      |  from cx_j group by 1, 2
      |),
      |cx_r as (
      |  select market_segment, cast(sum(n_obs) as bigint) as row_n
      |  from cx_c group by 1
      |),
      |cx_k as (
      |  select order_priority, cast(sum(n_obs) as bigint) as col_n
      |  from cx_c group by 1
      |),
      |cx_t as (select cast(sum(n_obs) as bigint) as n from cx_c),
      |cx_e as (
      |  select c.market_segment, c.order_priority, c.n_obs, r.row_n, k.col_n, n,
      |    cast(r.row_n * k.col_n as double) / cast(n as double) as expected_n
      |  from cx_c c
      |  join cx_r r on c.market_segment = r.market_segment
      |  join cx_k k on c.order_priority = k.order_priority
      |  cross join cx_t
      |),
      |cx_x as (
      |  select market_segment, order_priority, n_obs, row_n, col_n, n, expected_n,
      |    ((cast(n_obs as double) - expected_n)
      |      * (cast(n_obs as double) - expected_n)) / expected_n as chi2_term
      |  from cx_e
      |)""".stripMargin

  /** Mirror StatsMarts.segmentPriorityChi2: exact contingency counts,
    * one-division expected cells, the identical χ²-term chain. */
  val segmentPriorityChi2Q: String =
    s"""$ctes,
       |$chi2Base
       |select market_segment, order_priority, n_obs, row_n, col_n, n,
       |  expected_n, chi2_term
       |from cx_x""".stripMargin

  /** Mirror StatsMarts.segmentPriorityVerdict: the ordered-fold χ²
    * total over the (segment, priority)-sorted 25-cell list. */
  val segmentPriorityVerdictQ: String =
    s"""$ctes,
       |$chi2Base,
       |cx_f as (
       |  select max(n) as n, count(*) as n_cells,
       |    list_reduce(list_prepend(cast(0.0 as double),
       |      list(chi2_term order by market_segment, order_priority)),
       |      (acc, x) -> acc + x) as chi2
       |  from cx_x
       |)
       |select n, n_cells, chi2, 16 as df,
       |  chi2 > ${dlit(StatsMarts.Chi2Crit05Df16)} as reject_05
       |from cx_f""".stripMargin

  /** Mirror StatsMarts.productTrendOls: the same five exact-int64
    * sufficient statistics (price at scale-4 integer units — the
    * decimal is exact there, so no truncate-vs-round cast hazard),
    * exact num/den, the two output IEEE ops. */
  val productTrendOlsQ: String =
    s"""$ctes,
       |ols_m as (
       |  select oi.product_id,
       |    cast((year(o.ordered_at) - 1992) * 12 + month(o.ordered_at) as bigint) as x,
       |    cast(sum(cast(oi.discounted_price * 10000 as bigint)) as bigint) as y
       |  from stg_order_items oi
       |  join stg_orders o on oi.order_id = o.order_id
       |  group by 1, 2
       |),
       |ols_s as (
       |  select product_id, count(*) as n_months,
       |    cast(sum(x) as bigint) as sx, cast(sum(y) as bigint) as sy,
       |    cast(sum(x * x) as bigint) as sxx, cast(sum(x * y) as bigint) as sxy
       |  from ols_m group by 1
       |),
       |ols_f as (
       |  select product_id, n_months,
       |    n_months * sxy - sx * sy as num,
       |    n_months * sxx - sx * sx as den,
       |    sx, sy
       |  from ols_s where n_months >= 2
       |)
       |select product_id, n_months, num, den,
       |  cast(num as double) / cast(den as double) as slope,
       |  (cast(sy as double) - (cast(num as double) / cast(den as double))
       |    * cast(sx as double)) / cast(n_months as double) as intercept
       |from ols_f where den <> 0""".stripMargin

  /** Shared quintile CTE for one migration period (mirror
    * StatsMarts.quintiled — ascending-cents rank, customer tiebreak). */
  private def migQ(name: String, pred: String): String =
    s"""${name}_c as (
       |  select customer_id,
       |    cast(sum(cast(order_total * 100 as bigint)) as bigint) as cents
       |  from stg_orders where $pred group by customer_id
       |),
       |${name}_r as (
       |  select customer_id,
       |    cast(row_number() over (order by cents, customer_id) as int) as rnk
       |  from ${name}_c
       |),
       |${name}_n as (select count(*) as n from ${name}_r),
       |$name as (
       |  select customer_id, cast(((rnk - 1) * 5) // n as int) + 1 as q
       |  from ${name}_r cross join ${name}_n
       |)""".stripMargin

  /** Mirror StatsMarts.customerMigration: per-period two-phase-rank
    * quintiles, full-outer keyed join with 0 = absent, exact counts,
    * one-division row shares. */
  val customerMigrationQ: String = {
    import StatsMarts.MigrationSplitDate
    s"""$ctes,
       |${migQ("mig_b", s"ordered_at <= DATE '$MigrationSplitDate'")},
       |${migQ("mig_a", s"ordered_at > DATE '$MigrationSplitDate'")},
       |mig_j as (
       |  select coalesce(b.q, 0) as q_before, coalesce(a.q, 0) as q_after
       |  from mig_b b full outer join mig_a a on b.customer_id = a.customer_id
       |),
       |mig_c as (
       |  select q_before, q_after, count(*) as n_customers
       |  from mig_j group by 1, 2
       |),
       |mig_r as (
       |  select q_before, cast(sum(n_customers) as bigint) as row_n
       |  from mig_c group by 1
       |)
       |select c.q_before, c.q_after, c.n_customers, r.row_n,
       |  cast(c.n_customers as double) / cast(r.row_n as double) as row_share
       |from mig_c c join mig_r r on c.q_before = r.q_before""".stripMargin
  }

  /** Mirror StatsMarts.orderGapStats: per-customer lag with the same
    * (ordered_at, order_id) tiebreak, integer-division week buckets,
    * one-division shares. */
  val orderGapStatsQ: String = {
    import StatsMarts.GapBucketDays
    s"""$ctes,
       |gap_b as (
       |  select customer_id, order_id, ordered_at,
       |    lag(ordered_at) over (partition by customer_id
       |      order by ordered_at, order_id) as prev
       |  from stg_orders
       |),
       |gap_g as (
       |  select (ordered_at - prev) as gap_days
       |  from gap_b where prev is not null
       |),
       |gap_t as (select count(*) as n_total from gap_g),
       |gap_h as (
       |  select cast(gap_days // $GapBucketDays as int) as gap_weeks,
       |    count(*) as n_gaps,
       |    min(gap_days) as min_gap_days, max(gap_days) as max_gap_days,
       |    max(n_total) as n_total
       |  from gap_g cross join gap_t group by 1
       |)
       |select gap_weeks, n_gaps, min_gap_days, max_gap_days, n_total,
       |  cast(n_gaps as double) / cast(n_total as double) as share
       |from gap_h""".stripMargin
  }

  /** Mirror StatsMarts.jwNamePairs: the same distinct-name
    * dictionary with row counts, the same exploded length-band
    * equi-join, DuckDB's jaro_winkler_similarity as the reference
    * implementation StringSim is bit-pinned to (probed: 0.7 boost
    * threshold, textbook operation order). */
  val jwNamePairsQ: String = {
    import StatsMarts.JwLenBand
    s"""$ctes,
       |jw_n as (
       |  select product_name, count(*) as n_rows,
       |    cast(length(product_name) as int) as len
       |  from stg_products group by product_name
       |),
       |jw_a as (
       |  select product_name, n_rows, len,
       |    unnest(generate_series(len - $JwLenBand, len + $JwLenBand)) as band
       |  from jw_n
       |)
       |select a.product_name as name_a, b.product_name as name_b,
       |  a.n_rows as n_rows_a, b.n_rows as n_rows_b,
       |  jaro_winkler_similarity(a.product_name, b.product_name) as jw
       |from jw_a a
       |join jw_n b on a.band = b.len and a.product_name < b.product_name
       |where jaro_winkler_similarity(a.product_name, b.product_name)
       |  >= ${dlit(StatsMarts.JwThreshold)}""".stripMargin
  }

  /** Mirror StatsMarts.jwRecall: exact all-pairs JW over the distinct
    * name dictionary as the truth set, the banded pairs as
    * candidates, one recall/precision summary row. */
  val jwRecallQ: String = {
    import StatsMarts.JwLenBand
    val theta = dlit(StatsMarts.JwThreshold)
    s"""$ctes,
       |jwr_n as (select distinct product_name from stg_products),
       |jwr_t as (
       |  select a.product_name as name_a, b.product_name as name_b
       |  from jwr_n a join jwr_n b on a.product_name < b.product_name
       |  where jaro_winkler_similarity(a.product_name, b.product_name)
       |    >= $theta
       |),
       |jwr_l as (
       |  select product_name, cast(length(product_name) as int) as len
       |  from jwr_n
       |),
       |jwr_b as (
       |  select product_name, len,
       |    unnest(generate_series(len - $JwLenBand, len + $JwLenBand)) as band
       |  from jwr_l
       |),
       |jwr_c as (
       |  select a.product_name as name_a, b.product_name as name_b
       |  from jwr_b a
       |  join jwr_l b on a.band = b.len and a.product_name < b.product_name
       |  where jaro_winkler_similarity(a.product_name, b.product_name)
       |    >= $theta
       |),
       |jwr_j as (
       |  select count(*) as n_truth,
       |    count(case when c.name_a is not null then 1 end) as n_hits
       |  from jwr_t t
       |  left join jwr_c c on t.name_a = c.name_a and t.name_b = c.name_b
       |),
       |jwr_k as (select count(*) as n_candidates from jwr_c)
       |select n_truth, n_candidates, n_hits,
       |  case when n_truth > 0
       |    then cast(n_hits as double) / cast(n_truth as double)
       |    else 1.0 end as recall,
       |  case when n_candidates > 0
       |    then cast(n_hits as double) / cast(n_candidates as double)
       |    else 1.0 end as precision
       |from jwr_j cross join jwr_k""".stripMargin
  }

  /** Mirror StatsMarts.eventTypeXcorr: the same daily-volume
    * collapse, lag expansion, exact decimal moments (decimal(19,0)
    * operand casts force int128 — the width-18 int64 multiply trap),
    * the identical string-cast Pearson double tree, and the
    * (|r| desc nulls-last, lag asc) peak pick. */
  val eventTypeXcorrQ: String = {
    val maxLag = StatsMarts.XCorrMaxLag
    s"""with xc_d as (
       |  select event_type, cast(ts as date) as d,
       |    cast(count(*) as bigint) as v
       |  from events group by 1, 2
       |),
       |xc_l as (
       |  select cast(unnest(generate_series(-$maxLag, $maxLag)) as int) as lag
       |),
       |xc_j as (
       |  select a.event_type as x_type, b.event_type as y_type, l.lag,
       |    a.v as x, b.v as y
       |  from xc_d a cross join xc_l l
       |  join xc_d b on b.d = a.d + l.lag and b.event_type <> a.event_type
       |),
       |xc_s as (
       |  select x_type, y_type, lag, cast(count(*) as bigint) as n_days,
       |    cast(sum(x) as bigint) as sx, cast(sum(y) as bigint) as sy,
       |    sum(cast(x as decimal(19,0)) * cast(x as decimal(19,0))) as sxx,
       |    sum(cast(y as decimal(19,0)) * cast(y as decimal(19,0))) as syy,
       |    sum(cast(x as decimal(19,0)) * cast(y as decimal(19,0))) as sxy
       |  from xc_j group by 1, 2, 3
       |),
       |xc_r as (
       |  select x_type, y_type, lag, n_days, sx, sy,
       |    case when (cast(n_days as double)
       |          * cast(cast(sxx as varchar) as double)
       |          - cast(sx as double) * cast(sx as double)) > 0
       |      and (cast(n_days as double)
       |          * cast(cast(syy as varchar) as double)
       |          - cast(sy as double) * cast(sy as double)) > 0
       |    then (cast(n_days as double)
       |          * cast(cast(sxy as varchar) as double)
       |          - cast(sx as double) * cast(sy as double))
       |      / (sqrt(cast(n_days as double)
       |            * cast(cast(sxx as varchar) as double)
       |            - cast(sx as double) * cast(sx as double))
       |         * sqrt(cast(n_days as double)
       |            * cast(cast(syy as varchar) as double)
       |            - cast(sy as double) * cast(sy as double)))
       |    end as pearson_r
       |  from xc_s
       |)
       |select x_type, y_type, lag, n_days, sx as sum_x, sy as sum_y,
       |  pearson_r,
       |  row_number() over (partition by x_type, y_type
       |    order by abs(pearson_r) desc nulls last, lag asc) = 1 as is_peak
       |from xc_r""".stripMargin
  }
}
