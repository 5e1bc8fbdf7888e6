package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality auditing (the Deequ/Great-Expectations operator
  * family): constraint checks evaluated as ONE conditional-aggregation scan
  * per table — however many rules a table carries, it is read once and every
  * violation count comes out of the same codegen'd agg. Referential checks
  * are the exception (they need the parent side): each is one left-anti
  * join, broadcast when the parent's key projection is small.
  *
  * Scale posture: per-table rule packs keep the audit's cost at exactly one
  * scan per audited table regardless of rule count (the naive
  * one-query-per-rule layout scans N× and is the first thing a 100 TB audit
  * has to stop doing); FK checks shuffle only the two key projections, never
  * payload columns. Output is uniform `(check_name, n_checked, violations)`
  * so downstream alerting is schema-stable as rules evolve.
  */
object DataQuality {

  /** One named rule: a row VIOLATES when `predicate` is true. */
  final case class Rule(name: String, predicate: Column)

  /** Evaluate a pack of rules against one table in a single scan: every
    * rule becomes a conditional sum in the same aggregation, then the wide
    * one-row result unpivots to the uniform audit schema. */
  def auditTable(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "empty rule pack")
    val aggs = count(lit(1)).as("n_checked") +:
      rules.map(r => sum(when(r.predicate, 1L).otherwise(0L)).as(r.name))
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = rules.map(r => s"'${r.name}', ${r.name}").mkString(", ")
    wide.select(
        expr(s"stack(${rules.size}, $stackArgs) AS (check_name, violations)"),
        col("n_checked"))
      .select(col("check_name"), col("n_checked"), col("violations"))
  }

  /** Referential-integrity rule: count child rows whose key has no parent
    * (left-anti join on the two KEY projections only). */
  def fkOrphans(name: String, child: DataFrame, childKey: String,
                parent: DataFrame, parentKey: String): DataFrame = {
    val c = child.select(col(childKey).as("__k"))
    val p = parent.select(col(parentKey).as("__k")).distinct()
    c.join(p, Seq("__k"), "left_anti")
      .agg(count(lit(1)).as("violations"))
      .crossJoin(c.agg(count(lit(1)).as("n_checked")))
      .select(lit(name).as("check_name"), col("n_checked"), col("violations"))
  }

  /** Primary-key uniqueness: `count(*) − count(DISTINCT key)` extra rows. */
  def pkUnique(name: String, df: DataFrame, key: String): DataFrame =
    df.agg(count(lit(1)).as("n_checked"),
        (count(lit(1)) - countDistinct(col(key))).as("violations"))
      .select(lit(name).as("check_name"), col("n_checked"), col("violations"))

  /** Union any number of audit fragments into one report. */
  def report(parts: DataFrame*): DataFrame =
    parts.reduce(_ unionByName _)
}
