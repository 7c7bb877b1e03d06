package graft.ops

import graft.SparkSuite
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

class IntegritySpec extends AnyFunSuite with SparkSuite {

  private val d = "/root/testdata/sf0.001"
  import spark.implicits._

  test("scalarAudit detects dupes, nulls, and domain breaks it was asked about") {
    val df = Seq(
      (1L, Option(10L), 5.0),   // clean
      (1L, Option(11L), -1.0),  // dup id, negative value
      (2L, None, 2.0),          // null fk
      (3L, Option(12L), 0.0)    // zero fails the strict > 0 domain
    ).toDF("id", "fk", "v")
    val got = Integrity.scalarAudit(df, Seq(
      "pk" -> (count(lit(1)) - countDistinct(col("id"))),
      "nn_fk" -> count(when(col("fk").isNull, 1)),
      "dom_v_pos" -> count(when(!coalesce(col("v") > 0, lit(false)), 1))))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("pk" -> 1L, "nn_fk" -> 1L, "dom_v_pos" -> 2L))
  }

  test("fkOrphans counts unmatched non-null keys only") {
    val child = Seq(Option(1L), Option(2L), Option(9L), None).toDF("fk")
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val got = Integrity.fkOrphans("fk_t", child, "fk", parent, "pk").collect()
    assert(got.length == 1 && got(0).getString(0) == "fk_t" &&
      got(0).getLong(1) == 1L) // only 9 is an orphan; the NULL is absent, not orphaned
  }

  test("q139 over the snapshot: one row per check, only the lineitem composite pk fires") {
    val rows = Integrity.q139IntegrityAudit(spark, d).collect()
    assert(rows.length == 22)
    assert(rows.map(_.getString(0)).distinct.length == 22)
    val byId = rows.map(r => r.getString(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    // the synthetic generator reuses line numbers: the audit must SEE it
    assert(byId("pk_lineitem_orderkey_linenumber")._1 == 1401L)
    assert(!byId("pk_lineitem_orderkey_linenumber")._2)
    // every other constraint holds on the clean snapshot
    assert(byId.view.filterKeys(_ != "pk_lineitem_orderkey_linenumber")
      .values.forall { case (v, ok) => v == 0L && ok })
  }

  test("q139 plan: no cartesian anywhere; anti-joins carry the orphan checks") {
    val df = Integrity.q139IntegrityAudit(spark, d)
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
    assert(p.toLowerCase.contains("leftanti"), p.take(600))
  }
}
