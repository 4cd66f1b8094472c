package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Blocked edit-distance fuzzy matching — the entity-resolution
  * primitive (catalog dedup, name reconciliation) Spark has no native
  * operator for.
  *
  * A naive fuzzy self-join is `a JOIN b ON levenshtein(a, b) <= d`:
  * Catalyst can only plan that as a nested-loop cross product —
  * O(n²) distance evaluations, a scale killer on any real entity
  * catalog. Standard blocking restores an equi-join (the same move as
  * the LSH dedup families in [[graft.llm.Dedup]]):
  *
  *   1. each name gets a deterministic BLOCK key (here: its last
  *      whitespace token — for catalog names like "red widget" the
  *      head noun, so variants of the same entity collide);
  *   2. blocks larger than [[BlockCap]] are dropped entirely (the
  *      LSH-family cap rule: a degenerate block would reintroduce the
  *      quadratic blow-up, and a block that big is a stopword-like
  *      key carrying no entity signal anyway);
  *   3. the self-join runs per block — candidates are
  *      O(Σ block²) ≤ O(n · cap), linear in the catalog — and the
  *      exact Levenshtein filter runs only inside blocks.
  *
  * Semantics are therefore BLOCKED nearest-neighbor (documented, and
  * mirrored exactly by the oracle): a cross-block pair is by design
  * never a candidate. Output is one row per name that has at least one
  * block-mate: its nearest other name by (edit distance, name) — the
  * deterministic argmin via a per-block window, bounded by the cap, so
  * no window partition ever exceeds [[BlockCap]] rows regardless of
  * catalog size.
  */
object Fuzzy {

  /** Max block size joined; larger blocks are dropped (see above). */
  val BlockCap = 256

  /** Block key: the last whitespace-delimited token of the name. */
  def blockKey(name: Column): Column = regexp_extract(name, "(\\S+)$", 1)

  /** Edit-distance threshold under which two names are "the same
    * entity" for [[graft.llm.Clusters]]-based resolution. */
  val ClusterMaxDist = 4

  /** Distinct names with their block keys, blocks outside [2, cap]
    * dropped (see object doc). */
  private def cappedNames(df: DataFrame, nameCol: String, cap: Int): DataFrame = {
    val names = df.select(col(nameCol).as("name")).filter(col("name").isNotNull)
      .distinct()
      .withColumn("block", blockKey(col("name")))
    val ok = names.groupBy("block").agg(count(lit(1)).as("n"))
      .filter(col("n") <= cap && col("n") >= 2).select("block")
    names.join(ok, Seq("block"), "left_semi")
  }

  /** Nearest-name match per distinct value of `nameCol` (see object
    * doc). Output: (name, block, match_name, distance). */
  def nearestNameMatch(df: DataFrame, nameCol: String,
                       cap: Int = BlockCap): DataFrame = {
    val capped = cappedNames(df, nameCol, cap)
    val a = capped.as("a"); val b = capped.as("b")
    val pairs = a.join(b,
        col("a.block") === col("b.block") && col("a.name") =!= col("b.name"))
      .select(col("a.name").as("name"), col("a.block").as("block"),
        col("b.name").as("match_name"),
        levenshtein(col("a.name"), col("b.name")).cast("long").as("distance"))
    // per-name argmin: the window partition is a subset of one block
    // (≤ BlockCap rows) — bounded regardless of catalog size.
    pairs.withColumn("rn", row_number().over(
        Window.partitionBy("name").orderBy(col("distance").asc, col("match_name").asc)))
      .filter(col("rn") === 1)
      .select("name", "block", "match_name", "distance")
  }

  /** Undirected similar-name edges (name_a < name_b, same block,
    * levenshtein ≤ maxDist) — the input to transitive entity
    * resolution via [[graft.llm.Clusters.connectedComponents]] (the
    * same min-label machinery works on strings: labels propagate the
    * lexicographic minimum name, which becomes the cluster's canonical
    * form). */
  def similarPairs(df: DataFrame, nameCol: String,
                   maxDist: Int = ClusterMaxDist,
                   cap: Int = BlockCap): DataFrame = {
    val capped = cappedNames(df, nameCol, cap)
    val a = capped.as("a"); val b = capped.as("b")
    a.join(b, col("a.block") === col("b.block") && col("a.name") < col("b.name"))
      .filter(levenshtein(col("a.name"), col("b.name")) <= maxDist)
      .select(col("a.name").as("doc_a"), col("b.name").as("doc_b"))
  }
}
