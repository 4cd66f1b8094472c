package graft.staging

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.functions.Funcs._

/** Staging layer: the reference's 7 staging views (SURVEY.md §2.2 P1) —
  * pure rename/derive projections, one function per model, mapped onto the
  * driver's TPC-H-ish tables. Like dbt `view` materializations
  * (`dbt_project.yml:33-34`), these stay lazy: Catalyst inlines them into
  * downstream plans, so pushdown/pruning cross the model boundary for free.
  *
  * Semantic mapping (reference model ← testdata table):
  *   stg_customers   ← customer      (reference `stg_customers.sql:11-19`)
  *   stg_orders      ← orders        (reference `stg_orders.sql:11-29`)
  *   stg_order_items ← lineitem      (reference `stg_order_items.sql:11-18`)
  *   stg_products    ← part          (reference `stg_products.sql:11-30`)
  *   stg_locations   ← nation⟕region (reference `stg_locations.sql:11-25`)
  *   stg_supplies    ← supplier      (reference `stg_supplies.sql:11-27`)
  */
object Staging {

  /** P1 pure rename projection (reference `stg_customers.sql:11-19`). */
  def stgCustomers(customer: DataFrame): DataFrame =
    customer.select(
      col("c_custkey").as("customer_id"),
      col("c_name").as("customer_name"),
      col("c_nationkey").as("location_id"),
      money(col("c_acctbal")).as("account_balance"),
      col("c_mktsegment").as("market_segment"))

  /** Rename + day-truncation + money cast (reference `stg_orders.sql:11-29`,
    * F2 `date_trunc('day')`, F1 money). */
  def stgOrders(orders: DataFrame): DataFrame =
    orders.select(
      col("o_orderkey").as("order_id"),
      col("o_custkey").as("customer_id"),
      toDay(col("o_orderdate")).as("ordered_at"),
      money(col("o_totalprice")).as("order_total"),
      // order_total = subtotal + tax (invariant mirrored from reference
      // `stg_orders.yml:4-7`); tax synthesized at a fixed 4% of total.
      // total*0.04 (not total/1.04): a k/100 × 4/100 product is provably
      // never an odd multiple of 0.005, so double→decimal rounding can't
      // diverge between engines (Spark HALF_UP vs DuckDB half-even).
      (money(col("o_totalprice")) - money(col("o_totalprice") * lit(0.04)))
        .cast(DecimalType(18, 2)).as("subtotal"),
      money(col("o_totalprice") * lit(0.04)).as("tax_paid"),
      col("o_orderstatus").as("order_status"),
      col("o_orderpriority").as("order_priority"))

  /** Order items with F8 surrogate key (reference `stg_order_items.sql:11-18`,
    * `stg_supplies.sql:14` for the key pattern). */
  def stgOrderItems(lineitem: DataFrame): DataFrame =
    lineitem.select(
      // the synthetic lineitem duplicates (orderkey, linenumber) pairs;
      // widen the surrogate to the minimal combination that is unique
      // at every SF and whose parts stringify identically on both
      // engines (ints + ISO date — no doubles in the digest).
      surrogateKey(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
        col("l_suppkey"), toDay(col("l_shipdate"))).as("order_item_id"),
      col("l_orderkey").as("order_id"),
      col("l_linenumber").as("line_number"),
      col("l_partkey").as("product_id"),
      col("l_suppkey").as("supplier_id"),
      col("l_quantity").cast(DecimalType(12, 2)).as("quantity"),
      money(col("l_extendedprice")).as("extended_price"),
      // net of discount in EXACT decimal arithmetic (scale 4): decimal(18,2)
      // × decimal rate never rounds, so the oracle can't diverge.
      money4(money(col("l_extendedprice")) *
        (lit(1) - col("l_discount").cast(DecimalType(3, 2)))).as("discounted_price"),
      col("l_discount").as("discount_rate"),
      col("l_tax").as("tax_rate"),
      (col("l_returnflag") === lit("R")).as("is_returned"),
      col("l_returnflag").as("return_flag"),
      col("l_linestatus").as("line_status"),
      toDay(col("l_shipdate")).as("shipped_at"))

  /** Products with F12 null-safe boolean flags (reference
    * `stg_products.sql:11-30`: `coalesce(type = 'jaffle', false)`). */
  def stgProducts(part: DataFrame): DataFrame =
    part.select(
      col("p_partkey").as("product_id"),
      col("p_name").as("product_name"),
      col("p_type").as("product_type"),
      col("p_brand").as("brand"),
      col("p_size").as("product_size"),
      money(col("p_retailprice")).as("product_price"),
      // prefix match: TPC-H types are "PROMO BURNISHED COPPER" etc. —
      // exact equality never fired, degenerating every downstream
      // promo/economy boolean (analog of reference is_food/is_drink,
      // `stg_products.sql:26-28`).
      coalesce(col("p_type").startsWith("PROMO"), lit(false)).as("is_promo_item"),
      coalesce(col("p_type").startsWith("ECONOMY"), lit(false)).as("is_economy_item"))

  /** Locations = nation ⟕ region (broadcast: 25×5 rows at any SF), with a
    * derived tax_rate and opened_at (reference `stg_locations.sql:11-25`). */
  def stgLocations(nation: DataFrame, region: DataFrame): DataFrame =
    nation
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"), "left")
      .select(
        col("n_nationkey").as("location_id"),
        col("n_name").as("location_name"),
        col("r_name").as("region_name"),
        // deterministic synthetic tax rate in [0.04, 0.08] like the
        // reference's raw_stores.tax_rate (`seeds/jaffle-data/raw_stores.csv`)
        ((col("n_nationkey") % 5).cast("double") / lit(100.0) + lit(0.04)).as("tax_rate"),
        date_add(to_date(lit("1995-01-01")), col("n_nationkey") * 30).as("opened_at"))

  /** Supplies with F8 surrogate uuid (reference `stg_supplies.sql:11-27`).
    *
    * Grain = (supplier × cost component), two rows per supplier —
    * mirroring the reference's per-supply-cost-row grain
    * (`stg_supplies.yml:3-6`: raw_supplies has multiple cost rows per
    * product). This preserves the N:M fan-out (J14) and the
    * sum-ALL-rows grain trap (reference unit test `order_items.yml:37-41`)
    * that a 1-row-per-supplier mapping would lose.
    *
    * Cost split uses exact decimal fractions (0.75/0.25 at scale 4):
    * no rounding step exists, so Spark(HALF_UP)/DuckDB(half-even) can't
    * diverge, and the per-supplier rollup sums back to the base cost
    * exactly.
    */
  def stgSupplies(supplier: DataFrame): DataFrame = {
    val base = supplier.select(
      col("s_suppkey").as("supply_id"),
      col("s_name").as("supply_name"),
      col("s_nationkey").as("location_id"),
      money(abs(col("s_acctbal"))).as("base_cost"))
    val components = Seq(("materials", "0.75", 0), ("freight", "0.25", 1))
    components.map { case (comp, frac, flip) =>
      base.select(
        surrogateKey(col("supply_id"), lit(comp)).as("supply_uuid"),
        col("supply_id"),
        col("supply_name"),
        lit(comp).as("supply_component"),
        col("location_id"),
        (col("base_cost") * lit(new java.math.BigDecimal(frac)))
          .cast(DecimalType(18, 4)).as("supply_cost"),
        ((col("supply_id") + lit(flip)) % 2 === 1).as("is_perishable_supply"))
    }.reduce(_ unionAll _)
  }
}
