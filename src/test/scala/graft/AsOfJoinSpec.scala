package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.AsOfJoin
import graft.sources.Tables

/** The custom Catalyst as-of join (plans/AsOfJoin.scala): physical
  * plan shape, agreement with the composable union+window form (q31),
  * left-outer null handling, and hand-checked edge cases.
  */
class AsOfJoinSpec extends AnyFunSuite {
  import TestSpark._

  test("hand-built example: latest at-or-before match per key, nulls otherwise") {
    import spark.implicits._
    val trades = Seq((1L, 10L, "t1"), (1L, 20L, "t2"), (2L, 15L, "t3"),
      (3L, 5L, "t4"))
      .toDF("sym", "t_us", "trade")
    val quotes = Seq((1L, 8L, 1.0), (1L, 10L, 2.0), (1L, 19L, 3.0),
      (2L, 30L, 9.0))
      .toDF("q_sym", "q_us", "px")
    val got = AsOfJoin.asofJoin(spark, trades, quotes,
        Seq("sym"), Seq("q_sym"), "t_us", "q_us")
      .select("trade", "px").collect()
      .map(r => r.getString(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      .toMap
    // t1: quote at exactly 10 wins over 8 (<= semantics, latest);
    // t2: 19 < 20 -> 3.0; t3: only quote is later -> null; t4: no
    // quotes for sym 3 -> null
    assert(got === Map("t1" -> Some(2.0), "t2" -> Some(3.0),
      "t3" -> None, "t4" -> None))
  }

  test("composite keys: both key columns must match") {
    import spark.implicits._
    val trades = Seq(("A", 1L, 10L, "t1"), ("A", 2L, 10L, "t2"),
      ("B", 1L, 10L, "t3"))
      .toDF("sym", "ex", "t_us", "trade")
    val quotes = Seq(("A", 1L, 5L, 1.0), ("A", 2L, 7L, 2.0),
      ("B", 2L, 3L, 9.0))
      .toDF("q_sym", "q_ex", "q_us", "px")
    val got = AsOfJoin.asofJoin(spark, trades, quotes,
        Seq("sym", "ex"), Seq("q_sym", "q_ex"), "t_us", "q_us")
      .select("trade", "px").collect()
      .map(r => r.getString(0) ->
        (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    // (B,1) must NOT match the (B,2) quote — composite equality
    assert(got === Map("t1" -> Some(1.0), "t2" -> Some(2.0), "t3" -> None))
  }

  test("inner join type and tolerance window") {
    import spark.implicits._
    val trades = Seq((1L, 100L, "t1"), (1L, 200L, "t2"), (2L, 50L, "t3"))
      .toDF("sym", "t_us", "trade")
    val quotes = Seq((1L, 95L, 1.0), (1L, 120L, 2.0))
      .toDF("q_sym", "q_us", "px")
    // inner: unmatched left rows are dropped entirely
    val inner = AsOfJoin.asofJoin(spark, trades, quotes,
        Seq("sym"), Seq("q_sym"), "t_us", "q_us", joinType = "inner")
      .select("trade", "px").collect().map(r => (r.getString(0), r.getDouble(1)))
    assert(inner.toSet === Set("t1" -> 1.0, "t2" -> 2.0))
    // tolerance 10: t1 matches (100-95=5); t2's latest quote is 80
    // away -> stale -> dropped under inner
    val tol = AsOfJoin.asofJoin(spark, trades, quotes,
        Seq("sym"), Seq("q_sym"), "t_us", "q_us",
        joinType = "inner", toleranceUs = 10L)
      .select("trade", "px").collect().map(r => (r.getString(0), r.getDouble(1)))
    assert(tol.toSet === Set("t1" -> 1.0))
    // tolerance + left outer: stale match nulls out instead
    val tolLeft = AsOfJoin.asofJoin(spark, trades, quotes,
        Seq("sym"), Seq("q_sym"), "t_us", "q_us", toleranceUs = 10L)
      .select("trade", "px").collect()
      .map(r => r.getString(0) ->
        (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(tolLeft === Map("t1" -> Some(1.0), "t2" -> None, "t3" -> None))
  }

  test("plans through AsOfJoinExec with co-partitioned sorted children") {
    val e = Tables.events(spark, sf)
    val p = e.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("p_us"))
    val s = e.filter(col("event_type") === "signup")
      .select(col("user_id").as("s_user"), unix_micros(col("ts")).as("signup_us"))
    val df = AsOfJoin.asofJoin(spark, p, s,
      Seq("user_id"), Seq("s_user"), "p_us", "signup_us",
      strategy = "merge")
    val plan = df.queryExecution.executedPlan.toString
    // SparkPlan.nodeName strips the Exec suffix in plan strings
    assert(plan.contains("AsOfJoin "), s"plan:\n$plan")
    // EnsureRequirements satisfied the declared requirements
    assert(plan.contains("Sort"), s"expected child sorts in:\n$plan")
    assert(plan.contains("Exchange hashpartitioning"),
      s"expected key co-partitioning in:\n$plan")
  }

  test("small right side auto-selects the broadcast form (no shuffle at all)") {
    val e = Tables.events(spark, sf)
    val p = e.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("p_us"))
    val s = e.filter(col("event_type") === "signup")
      .select(col("user_id").as("s_user"), unix_micros(col("ts")).as("signup_us"))
    val auto = AsOfJoin.asofJoin(spark, p, s,
      Seq("user_id"), Seq("s_user"), "p_us", "signup_us")
    val plan = auto.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastAsOfJoin"), s"plan:\n$plan")
    assert(!plan.contains("Exchange hashpartitioning"),
      s"broadcast form must not shuffle either side:\n$plan")
    // and it computes exactly what the merge form computes
    val merge = AsOfJoin.asofJoin(spark, p, s,
      Seq("user_id"), Seq("s_user"), "p_us", "signup_us",
      strategy = "merge")
    assert(auto.orderBy("event_id").collect().map(_.toSeq).toSeq ===
      merge.orderBy("event_id").collect().map(_.toSeq).toSeq)
  }

  test("left-only filters push through the custom node to the scan") {
    val e = Tables.events(spark, sf)
    val p = e.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("p_us"))
    val s = e.filter(col("event_type") === "signup")
      .select(col("user_id").as("s_user"), unix_micros(col("ts")).as("signup_us"))
    val joined = AsOfJoin.asofJoin(spark, p, s,
      Seq("user_id"), Seq("s_user"), "p_us", "signup_us")
    val filtered = joined.filter(col("event_id") < 100)
    val plan = filtered.queryExecution.executedPlan.toString
    // PushFilterThroughAsOfJoin moved the conjunct below the custom
    // node; Catalyst's stock rules then carried it into the scan
    assert(plan.contains("LessThan(event_id,100)"),
      s"expected the filter in PushedFilters:\n$plan")
    // and it is semantics-preserving: same rows as filtering the input
    val expected = AsOfJoin.asofJoin(spark, p.filter(col("event_id") < 100), s,
      Seq("user_id"), Seq("s_user"), "p_us", "signup_us")
      .orderBy("event_id").collect().map(_.toSeq).toSeq
    assert(filtered.orderBy("event_id").collect().map(_.toSeq).toSeq === expected)
  }

  test("custom exec agrees with the union+window composition (q31)") {
    val viaExec = SparkEntry.queries("q43_asof_custom_exec")(spark, sf)
      .collect().map(_.toSeq).toSeq
    val viaWindow = SparkEntry.queries("q31_asof_join")(spark, sf)
      .collect().map(_.toSeq).toSeq
    assert(viaExec === viaWindow)
  }

  test("randomized differential: exec equals an in-memory reference model") {
    import spark.implicits._
    val rnd = new scala.util.Random(421)
    for (trial <- 1 to 3) {
      // clustered keys + small timestamp range force heavy key reuse,
      // equal timestamps, and empty-key cases
      val trades = Seq.tabulate(300)(i =>
        (rnd.nextInt(12).toLong, rnd.nextInt(40).toLong, i.toLong))
      // px is a pure function of (sym, us): duplicate (key, ts) rows
      // carry identical payloads, so the exec's unspecified tie order
      // (distributed sorts are not stable) cannot affect the result
      val quotes = Seq.tabulate(200) { _ =>
        val sym = rnd.nextInt(15).toLong
        val us = rnd.nextInt(40).toLong
        (sym, us, sym * 1000.0 + us)
      }
      val tDf = trades.toDF("sym", "t_us", "tid")
      val qDf = quotes.toDF("q_sym", "q_us", "px")
      val got = AsOfJoin.asofJoin(spark, tDf.repartition(5), qDf.repartition(3),
          Seq("sym"), Seq("q_sym"), "t_us", "q_us")
        .select("tid", "px").collect()
        .map(r => r.getLong(0) ->
          (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
      // reference model: latest quote at-or-before the trade
      val byKey = quotes.groupBy(_._1)
      val expected = trades.map { case (sym, tUs, tid) =>
        tid -> byKey.getOrElse(sym, Seq.empty)
          .filter(_._2 <= tUs).sortBy(_._2).lastOption.map(_._3)
      }.toMap
      assert(got === expected, s"trial $trial")
    }
  }

  test("left outer: one output row per purchase, partition-invariant") {
    val e = Tables.events(spark, sf)
    val p = e.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("p_us"))
    val s = e.filter(col("event_type") === "signup")
      .select(col("user_id").as("s_user"), unix_micros(col("ts")).as("signup_us"))
    val out = AsOfJoin.asofJoin(spark, p, s,
      Seq("user_id"), Seq("s_user"), "p_us", "signup_us")
    assert(out.count() === p.count())
    // same result when the inputs arrive differently partitioned
    val out7 = AsOfJoin.asofJoin(spark, p.repartition(7), s.repartition(3),
      Seq("user_id"), Seq("s_user"), "p_us", "signup_us")
      .orderBy("event_id").collect().map(_.toSeq).toSeq
    assert(out.orderBy("event_id").collect().map(_.toSeq).toSeq === out7)
  }
}
