package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.staging.Staging
import graft.marts.CoreMarts

/** Model DAG wiring: each reference model as a (spark, sfDir) => DataFrame.
  * dbt's ref()/source() DAG (SURVEY.md §3.1) is plain function composition
  * here — everything stays lazy, so Catalyst sees one plan per output and
  * pushes filters/pruning across model boundaries like dbt view inlining.
  */
object Models {
  def stgCustomers(s: SparkSession, d: String): DataFrame =
    Staging.stgCustomers(Tables.customer(s, d))
  def stgOrders(s: SparkSession, d: String): DataFrame =
    Staging.stgOrders(Tables.orders(s, d))
  def stgOrderItems(s: SparkSession, d: String): DataFrame =
    Staging.stgOrderItems(Tables.lineitem(s, d))
  def stgProducts(s: SparkSession, d: String): DataFrame =
    Staging.stgProducts(Tables.part(s, d))
  def stgLocations(s: SparkSession, d: String): DataFrame =
    Staging.stgLocations(Tables.nation(s, d), Tables.region(s, d))
  def stgSupplies(s: SparkSession, d: String): DataFrame =
    Staging.stgSupplies(Tables.supplier(s, d))

  def orderItems(s: SparkSession, d: String): DataFrame =
    CoreMarts.orderItems(stgOrderItems(s, d), stgOrders(s, d),
      stgProducts(s, d), stgSupplies(s, d))
  def orders(s: SparkSession, d: String): DataFrame =
    CoreMarts.orders(stgOrders(s, d), orderItems(s, d))
  def customers(s: SparkSession, d: String): DataFrame =
    CoreMarts.customers(stgCustomers(s, d), orders(s, d))
}
