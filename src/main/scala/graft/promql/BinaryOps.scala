package graft.promql

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PromQL binary operations with vector matching (SURVEY.md §2.3 J3, §2.7 U3).
  *
  * The reference delegates to promql-engine; the storage layer only supplies a
  * series-hash label so engine-side joins work on projected label sets
  * (`schema/schema.go:18-22`). Spark-first: a vector-to-vector binary op is a
  * hash join on the matching labels. Catalyst (with AQE) picks broadcast vs
  * shuffled-hash vs sort-merge by size; `on(...)` grouping keys are the join
  * keys, so a pre-aggregated side arrives already partitioned by the key.
  *
  *  - one-to-one: inner join on match keys
  *  - group_left (many-to-one): left side joins a (deduplicated) right side
  *  - and / unless: left-semi / left-anti join on match keys
  *  - or: left ∪ (right anti-join left) on match keys
  */
object BinaryOps {

  /** Arithmetic/comparison op between two vectors, 1:1 matching `on(keys)`.
    * Both sides must be unique per key (PromQL errors otherwise; callers
    * pre-aggregate). */
  def binop(lhs: DataFrame, rhs: DataFrame, on: Seq[String],
            lValue: String = "value", rValue: String = "rvalue",
            resultName: String = "value")(op: (Column, Column) => Column): DataFrame = {
    val r = rhs.withColumnRenamed(lValue, rValue)
    lhs.join(r, on, "inner")
      .withColumn(resultName, op(col(lValue), col(rValue)))
      .drop(if (resultName == lValue) rValue else lValue, rValue)
  }

  /** many-to-one: every LHS row matches at most one RHS row (`group_left`).
    * RHS must be unique on the keys; extra RHS columns are carried over. */
  def groupLeft(lhs: DataFrame, rhs: DataFrame, on: Seq[String],
                lValue: String = "value", rValue: String = "rvalue",
                resultName: String = "value")(op: (Column, Column) => Column): DataFrame = {
    val r = rhs.withColumnRenamed(lValue, rValue)
    lhs.join(broadcast(r), on, "inner") // one-side pre-agg is small: broadcast
      .withColumn(resultName, op(col(lValue), col(rValue)))
      .drop(if (resultName == lValue) rValue else lValue, rValue)
  }

  /** `lhs and rhs`: keep LHS series whose match keys exist in RHS. */
  def and(lhs: DataFrame, rhs: DataFrame, on: Seq[String]): DataFrame =
    lhs.join(rhs.select(on.map(col): _*).distinct(), on, "left_semi")

  /** `lhs unless rhs`: keep LHS series whose match keys do NOT exist in RHS. */
  def unless(lhs: DataFrame, rhs: DataFrame, on: Seq[String]): DataFrame =
    lhs.join(rhs.select(on.map(col): _*).distinct(), on, "left_anti")

  /** `lhs or rhs`: all LHS plus RHS series with no LHS match. */
  def or(lhs: DataFrame, rhs: DataFrame, on: Seq[String]): DataFrame =
    lhs.unionByName(
      rhs.join(lhs.select(on.map(col): _*).distinct(), on, "left_anti"),
      allowMissingColumns = true)
}
