package graft

import java.sql.{Date, Timestamp}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.marts.CoreMarts
import graft.staging.Staging
import graft.testing.Fixtures

/** The reference's three unit tests, rebuilt on mock fixtures with
  * partial rows (unspecified columns → NULL), exactly like dbt unit
  * test mocks (SURVEY §5.2; reference `orders.yml:35-52`,
  * `order_items.yml:14-41`, `stg_locations.yml:11-43`).
  */
class UnitFixtureSpec extends SparkSpec {

  private val orderItemsSchema = StructType(Seq(
    StructField("order_item_id", StringType), StructField("order_id", LongType),
    StructField("product_id", LongType), StructField("supplier_id", LongType),
    StructField("ordered_at", DateType), StructField("product_name", StringType),
    StructField("product_type", StringType), StructField("is_promo_item", BooleanType),
    StructField("is_economy_item", BooleanType), StructField("product_price", DecimalType(18, 2)),
    StructField("quantity", DecimalType(12, 2)), StructField("extended_price", DecimalType(18, 2)),
    StructField("discounted_price", DecimalType(18, 4)), StructField("is_returned", BooleanType),
    StructField("return_flag", StringType), StructField("line_status", StringType),
    StructField("shipped_at", DateType), StructField("supply_cost", DecimalType(18, 2)),
    StructField("gross_margin", DecimalType(18, 4))))

  private val stgOrdersSchema = StructType(Seq(
    StructField("order_id", LongType), StructField("customer_id", LongType),
    StructField("ordered_at", DateType), StructField("order_total", DecimalType(18, 2)),
    StructField("subtotal", DecimalType(18, 2)), StructField("tax_paid", DecimalType(18, 2)),
    StructField("order_status", StringType), StructField("order_priority", StringType)))

  test("unit: orders conditional counts + boolean flags (ref orders.yml:35-52)") {
    val items = Fixtures.rows(spark, orderItemsSchema, Seq(
      Map("order_item_id" -> "a", "order_id" -> 1L, "is_promo_item" -> true, "is_returned" -> false),
      Map("order_item_id" -> "b", "order_id" -> 1L, "is_promo_item" -> false, "is_returned" -> true),
      Map("order_item_id" -> "c", "order_id" -> 2L, "is_promo_item" -> false, "is_returned" -> false)))
    val stg = Fixtures.rows(spark, stgOrdersSchema, Seq(
      Map("order_id" -> 1L, "customer_id" -> 10L, "ordered_at" -> Date.valueOf("2001-01-01")),
      Map("order_id" -> 2L, "customer_id" -> 10L, "ordered_at" -> Date.valueOf("2001-01-02"))))
    val out = CoreMarts.orders(stg, items)
      .select("order_id", "count_order_items", "count_promo_items",
        "count_returned_items", "is_promo_order", "has_returned_item", "customer_order_number")
      .orderBy("order_id").collect()
    assert(out(0).getLong(1) === 2 && out(0).getLong(2) === 1 && out(0).getLong(3) === 1)
    assert(out(0).getBoolean(4) && out(0).getBoolean(5))
    assert(out(1).getLong(1) === 1 && out(1).getLong(2) === 0 && !out(1).getBoolean(4))
    // W1 sequence: same customer, ordered_at ascending
    assert(out(0).getInt(6) === 1 && out(1).getInt(6) === 2)
  }

  test("unit: supply costs sum over ALL component rows (ref order_items.yml:37-41 — 3.50+5.00=8.50)") {
    val suppliesSchema = StructType(Seq(
      StructField("supply_uuid", StringType), StructField("supply_id", LongType),
      StructField("supply_name", StringType), StructField("supply_component", StringType),
      StructField("location_id", IntegerType), StructField("supply_cost", DecimalType(18, 4)),
      StructField("is_perishable_supply", BooleanType)))
    val itemsSchema = StructType(Seq(
      StructField("order_item_id", StringType), StructField("order_id", LongType),
      StructField("line_number", IntegerType), StructField("product_id", LongType),
      StructField("supplier_id", LongType), StructField("quantity", DecimalType(12, 2)),
      StructField("extended_price", DecimalType(18, 2)),
      StructField("discounted_price", DecimalType(18, 4)),
      StructField("discount_rate", DoubleType), StructField("tax_rate", DoubleType),
      StructField("is_returned", BooleanType), StructField("return_flag", StringType),
      StructField("line_status", StringType), StructField("shipped_at", DateType)))
    val productsSchema = StructType(Seq(
      StructField("product_id", LongType), StructField("product_name", StringType),
      StructField("product_type", StringType), StructField("brand", StringType),
      StructField("product_size", IntegerType), StructField("product_price", DecimalType(18, 2)),
      StructField("is_promo_item", BooleanType), StructField("is_economy_item", BooleanType)))

    val supplies = Fixtures.rows(spark, suppliesSchema, Seq(
      Map("supply_uuid" -> "u1", "supply_id" -> 2L, "supply_component" -> "materials",
        "supply_cost" -> new java.math.BigDecimal("3.5000")),
      Map("supply_uuid" -> "u2", "supply_id" -> 2L, "supply_component" -> "freight",
        "supply_cost" -> new java.math.BigDecimal("5.0000"))))
    val items = Fixtures.rows(spark, itemsSchema, Seq(
      Map("order_item_id" -> "i1", "order_id" -> 1L, "product_id" -> 7L, "supplier_id" -> 2L)))
    val stg = Fixtures.rows(spark, stgOrdersSchema, Seq(Map("order_id" -> 1L)))
    val products = Fixtures.rows(spark, productsSchema, Seq(Map("product_id" -> 7L)))

    val out = CoreMarts.orderItems(items, stg, products, supplies)
      .select("supply_cost").head.getDecimal(0)
    assert(out.compareTo(new java.math.BigDecimal("8.50")) === 0)
  }

  test("unit: opened_at derives deterministically from nation key (ref stg_locations.yml:11-43 analog)") {
    val nationSchema = StructType(Seq(
      StructField("n_nationkey", IntegerType), StructField("n_name", StringType),
      StructField("n_regionkey", IntegerType)))
    val regionSchema = StructType(Seq(
      StructField("r_regionkey", IntegerType), StructField("r_name", StringType)))
    val nation = Fixtures.rows(spark, nationSchema, Seq(
      Map("n_nationkey" -> 0, "n_name" -> "A", "n_regionkey" -> 1),
      Map("n_nationkey" -> 3, "n_name" -> "B")))  // region omitted → NULL
    val region = Fixtures.rows(spark, regionSchema, Seq(
      Map("r_regionkey" -> 1, "r_name" -> "R1")))
    val out = Staging.stgLocations(nation, region).orderBy("location_id").collect()
    assert(out(0).getDate(4) === Date.valueOf("1995-01-01"))
    assert(out(1).getDate(4) === Date.valueOf("1995-04-01"))  // +90 days
    assert(out(0).getString(2) === "R1")
    assert(out(1).isNullAt(2))  // left join preserves unmatched nation
  }

  test("S2: seed CSV loader applies the explicit schema") {
    val dir = java.nio.file.Files.createTempDirectory("seeds").toFile
    val f = new java.io.File(dir, "raw_stores.csv")
    java.nio.file.Files.writeString(f.toPath, "id,name,region_id\n1,Downtown,4\n2,Uptown,\n")
    val df = graft.sources.Seeds.load(spark, f.getAbsolutePath, "raw_stores")
    assert(df.schema.fields.map(_.dataType).toSeq ===
      Seq(IntegerType, StringType, IntegerType))
    assert(df.count() === 2)
    assert(df.filter(col("region_id").isNull).count() === 1)
  }
}
