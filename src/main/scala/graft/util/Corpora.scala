package graft.util

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** ONE-scan derived corpora (r22, guide §2.4/§6).
  *
  * The fixture corpora plant derived copies of selected documents
  * (mutated/truncated/re-sent generations) and were spelled as a UNION
  * of per-branch re-scans of the source table — 2-4 full corpus scans
  * per cold execution at any scale. [[derived]] emits each row's
  * derived copies through one exploded conditional array instead, so
  * every consumer pays a single source scan. The output is the exact
  * multiset the union spelling produced (branch predicates and payload
  * derivations are the caller's, unchanged); only pre-shuffle row
  * ORDER differs — consumers aggregate/join or carry a total ORDER BY.
  */
object Corpora {

  /** `base` rows as (idName, payloadName) plus, per branch
    * (predicate, derivedId, derivedPayload), a conditional derived
    * copy — all from one scan. `payloadType` is the payload column's
    * Spark SQL type string (the empty per-branch array needs the
    * element type spelled; ids are bigint across the fixture corpora). */
  def derived(
      base: DataFrame, id: Column, payload: Column,
      branches: Seq[(Column, Column, Column)],
      idName: String, payloadName: String,
      payloadType: String = "string"): DataFrame = {
    val empty = array().cast(s"array<struct<id:bigint,p:$payloadType>>")
    base.select(explode(concat(
        (array(struct(id.as("id"), payload.as("p"))) +:
          branches.map { case (pred, i2, p2) =>
            when(pred, array(struct(i2.as("id"), p2.as("p"))))
              .otherwise(empty)
          }): _*)).as("r"))
      .select(col("r.id").as(idName), col("r.p").as(payloadName))
  }
}
