package graft

import graft.queries.TradeQueries

/** The registered salted aggregation must actually PLAN as the two-stage
  * shape that makes it worth having: an inner hash aggregate grouped on
  * (sec_code, _salt) — partial+final around the first exchange, at full
  * parallelism even when one sec_code dominates — then an outer hash
  * aggregate on sec_code alone over |keys|×buckets partials. Semantics
  * (salting is invisible) are pinned by the DuckDB oracle (plain GROUP
  * BY) and PropertySpec's equivalence law.
  */
class SaltPlanSpec extends SparkSuite {

  test("qx_salted_turnover plans as two-stage hash aggregation over _salt") {
    val df = TradeQueries.saltedTurnover(spark, "/root/testdata/sf0.001")
    val plan = df.queryExecution.executedPlan.toString
    // two stages × (partial + final) = at least 4 hash aggregates, and the
    // salt participates in the inner grouping
    assert("HashAggregate".r.findAllMatchIn(plan).size >= 4, plan.take(2000))
    assert(plan.contains("_salt"), plan.take(2000))
    // the outer aggregate's output carries no salt
    assert(!df.columns.contains("_salt"))
  }
}
