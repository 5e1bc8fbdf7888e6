package graft.cdc

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** CDC apply/materialization semantics (SURVEY.md §2.5 W1-W7): the
  * materialized state after replaying the fixture must equal what the SQL
  * workload leaves in TiDB. */
class CdcApplySpec extends SparkSpec {
  import spark.implicits._

  lazy val events = CanalJson.events(CanalJson.fixtureRaw(spark)).cache()
  lazy val state = CdcApply.materialize(events).cache()

  test("W2 latest-image-wins: product 1 shows the updated price") {
    val p1 = state.filter($"table" === "products" && $"pk" === "1")
      .select(element_at($"data", "price")).as[String].collect()
    assert(p1.toSeq === Seq("165.00"))
  }

  test("W5 tombstone: deleted product 3 absent from state") {
    assert(state.filter($"table" === "products" && $"pk" === "3").count() === 0)
  }

  test("W4 state transition: order 10 ends completed") {
    val o = state.filter($"table" === "orders" && $"pk" === "10")
      .select(element_at($"data", "status")).as[String].collect()
    assert(o.toSeq === Seq("completed"))
  }

  test("idempotent under at-least-once duplicate delivery") {
    // fixture contains the same UPDATE twice (offsets 4-dup); replaying the
    // whole log twice must give identical state
    val doubled = CdcApply.materialize(events.unionAll(events))
    val a = state.select($"table", $"pk", to_json($"data").as("d")).orderBy("table", "pk")
      .as[(String, String, String)].collect().toSeq
    val b = doubled.select($"table", $"pk", to_json($"data").as("d")).orderBy("table", "pk")
      .as[(String, String, String)].collect().toSeq
    assert(a === b)
  }

  test("out-of-order arrival: materialized state independent of input order") {
    // a real log consumer sees events in offset order per partition, but a
    // backfill/repartition can arrive in ANY order — materialize ranks by
    // (event time, offset), so arrival order must not matter. Scramble the
    // arrival order (hash sort + repartition) and require identical state.
    val scrambled = CdcApply.materialize(
      events.repartition(7).sortWithinPartitions(xxhash64($"offset", $"pos")))
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select($"table", $"pk", $"op", to_json($"data").as("d"))
        .orderBy("table", "pk").as[(String, String, String, String)]
        .collect().toSeq
    assert(canon(scrambled) === canon(state))
  }

  test("W4 transitions audit: pending→completed captured with old image") {
    val tr = CdcApply.transitions(events, "status")
      .select($"pk", $"old_status", $"new_status")
      .distinct().as[(String, String, String)].collect()
    assert(tr.toSeq === Seq(("10", "pending", "completed")))
  }

  test("users row intact with sha2 password (W3 replay)") {
    val u = state.filter($"table" === "users" && $"pk" === "1")
      .select(element_at($"data", "password")).as[String].head()
    assert(u.length === 64 && u.matches("[0-9a-f]+"))
  }

  test("W8 delta maintenance == recompute from materialized state") {
    val orders = events.filter($"table" === "orders")
    val maintained = CdcApply.maintainCounts(orders, "status")
      .as[(String, Long)].collect().toMap
    val recomputed = CdcApply.materialize(orders)
      .select(element_at($"data", "status")).as[String].collect()
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    assert(maintained === recomputed) // pending nets to 0; completed survives
    assert(maintained === Map("completed" -> 1L))
  }
}
