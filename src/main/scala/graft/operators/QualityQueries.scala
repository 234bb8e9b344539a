package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Data-quality audit operators — the validation layer a production
  * training-data pipeline runs before (and after) every ingest:
  * per-column completeness/cardinality profiling, referential-
  * integrity orphan detection, rule-based violation screening, and
  * primary-key uniqueness. The reference engine's users run these as
  * ad-hoc SQL; here they are first-class audited operators with exact
  * integer outputs (counts and basis points — no floats), so the
  * DuckDB oracles hash-compare bit-for-bit.
  *
  * Scale notes (100 TB):
  *  - a01 unpivots N rows × C columns into narrow (name, value)
  *    pairs — C·N rows but each ~tens of bytes, and the distinct
  *    count is Spark's standard two-phase partial-distinct aggregate
  *    (map-side dedup within a partition before the shuffle), so the
  *    shuffle carries distinct (col, value) pairs, not C·N rows.
  *  - a02's orphan checks are anti joins keyed on the FK, with the
  *    fact side pre-aggregated to (key, count) first — the exchange
  *    carries distinct FKs, not fact rows, and orphan rows come back
  *    as the count sum (exact). Fixed-size parents (nation)
  *    broadcast; SF-scaled parents shuffle on the key, which AQE
  *    converts to broadcast when a filtered parent fits. Measured
  *    (SCALE_r13): per-copy shuffle flat at 25x/100x. A bloom
  *    prefilter (q57's pattern) deliberately NOT wired: for an anti
  *    join it can only short-cut bloom-negative keys (definite
  *    orphans), which on a healthy corpus are ~none — it would
  *    shrink nothing exactly when the audit passes.
  *  - a03 is map-only: every rule is a conditional count folded into
  *    ONE aggregate per table (one scan each), emitted as rows via
  *    stack() after aggregation — adding a rule adds a column to a
  *    partial aggregate, not a pass over the data.
  *  - a04 is one partial-aggregated groupBy per table keyed on the
  *    declared PK; the dup-row count derives from (n_rows − n_keys)
  *    without a second scan of the grouped output.
  */
object QualityQueries {

  /** count(*) FILTER (WHERE cond) — Spark spelling. */
  private def nIf(cond: Column): Column = count(when(cond, 1))

  private def edge(name: String, child: DataFrame, fk: String,
      parent: DataFrame, pk: String, bcastParent: Boolean): DataFrame = {
    // no .distinct() on the parent keys: anti-join semantics are
    // dup-insensitive, and deduping a (declared) PK is a pure extra
    // exchange — a04 audits the declaration separately
    val keys = parent.select(pk)
    // the FACT side is pre-aggregated to (fk, count) BEFORE the anti
    // join (round 13, the a02 100 TB lever): the exchange then
    // carries each distinct FK once with a count instead of one row
    // per fact row (map-side combine collapses duplicates — ~4x for
    // lineitem→orders), and the anti join reuses the groupBy's
    // partitioning (same key), so no second child-side exchange.
    // Orphan ROWS = sum of counts over orphan KEYS — exact, the
    // oracle is unchanged. A bloom prefilter (q57's pattern) was
    // considered and documented instead of wired: for an ANTI join
    // it can only short-cut bloom-NEGATIVE keys (definite orphans),
    // which on a healthy corpus are ~none — it shrinks nothing
    // precisely when the audit passes; the key-level pre-aggregation
    // shrinks always.
    // Round 21: a one-scan form (groupBy over ALL FKs incl. the null
    // group, n_child = sum of group counts, both branches sharing the
    // exchange) was tried and MEASURED WORSE in the plan: Catalyst
    // pushes the anti join below the aggregate (PushDownLeftSemiAnti-
    // Join), so the two branches' subtrees differ and ReuseExchange
    // cannot merge them — the rewrite just added a full groupBy-fk
    // exchange on the count leg where the current form pays a
    // columnless count scan (plans/r21/a02_dq_referential_before.txt
    // vs the rejected variant). Left as is.
    val childKeys = child.filter(col(fk).isNotNull)
      .groupBy(col(fk)).agg(count(lit(1)).as("c"))
    val orphans = childKeys
      .join(if (bcastParent) broadcast(keys) else keys,
        col(fk) === col(pk), "left_anti")
    child.agg(count(lit(1)).as("n_child"))
      .crossJoin(orphans.agg(
        coalesce(sum("c"), lit(0L)).as("n_orphan")))
      .select(lit(name).as("edge"), col("n_child"), col("n_orphan"))
  }

  private def uniq(name: String, df: DataFrame,
      keys: Seq[String]): DataFrame = {
    // Round 21 (guide §1.2 — one pass, not two): n_rows derives from
    // the SAME per-key aggregate as n_keys/max_mult (sum of group
    // counts ≡ count(*) — exact), so each audited table is scanned
    // once instead of twice. coalesce keeps the 0-row-corpus row
    // identical to the old crossJoin form (sum over no groups is
    // NULL where count(*) was 0).
    val perKey = df.groupBy(keys.map(col): _*).agg(count(lit(1)).as("c"))
    perKey.agg(coalesce(sum("c"), lit(0L)).as("n_rows"),
        count(lit(1)).as("n_keys"), max(col("c")).as("max_mult"))
      .select(lit(name).as("table_name"), col("n_rows"), col("n_keys"),
        (col("n_rows") - col("n_keys")).as("n_dup_rows"), col("max_mult"))
  }

  val all: Seq[QueryDef] = Seq(

    // Per-column profile of `orders`: row count, null count, exact
    // distinct count, null rate in basis points. The unpivot casts
    // every value to string — injective for long/double/timestamp/
    // varchar, so distinct-over-strings == distinct-over-values, and
    // the counts are representation-independent (the oracle counts
    // native values).
    QueryDef(
      "a01_dq_profile",
      """SELECT col_name, n_rows, n_null, n_distinct,
        |       (n_null * 10000) // n_rows AS null_bp
        |FROM (
        |  SELECT 'o_custkey' AS col_name, count(*) AS n_rows,
        |         count(*) - count(o_custkey) AS n_null,
        |         count(DISTINCT o_custkey) AS n_distinct FROM orders
        |  UNION ALL
        |  SELECT 'o_orderdate', count(*), count(*) - count(o_orderdate),
        |         count(DISTINCT o_orderdate) FROM orders
        |  UNION ALL
        |  SELECT 'o_orderkey', count(*), count(*) - count(o_orderkey),
        |         count(DISTINCT o_orderkey) FROM orders
        |  UNION ALL
        |  SELECT 'o_orderpriority', count(*), count(*) - count(o_orderpriority),
        |         count(DISTINCT o_orderpriority) FROM orders
        |  UNION ALL
        |  SELECT 'o_orderstatus', count(*), count(*) - count(o_orderstatus),
        |         count(DISTINCT o_orderstatus) FROM orders
        |  UNION ALL
        |  SELECT 'o_totalprice', count(*), count(*) - count(o_totalprice),
        |         count(DISTINCT o_totalprice) FROM orders
        |) p ORDER BY col_name""".stripMargin) { (s, d) =>
      // ONE aggregate with 6 native-typed count(DISTINCT col)s —
      // Catalyst rewrites multi-distinct via Expand (6x rows, one
      // shuffle keyed by (group-id, value)), with every value kept in
      // its NATIVE type. The round-13 first cut stacked all columns
      // into one string `v` column first; casting 15M longs/decimals
      // to strings tripled the agg's memory and the hash map spilled
      // to sort at the 100x scale corpus (wall 25x->100x went 1.8 s
      // -> 69.7 s for 4x the data). Native-typed Expand keeps the
      // two-phase distinct in-memory: 69.7 -> ~8 s at 100x, per-copy
      // shuffle ~halved. Counts are identical (cast-to-string was
      // injective), so the oracle is unchanged.
      val cols = Seq("o_custkey", "o_orderdate", "o_orderkey",
        "o_orderpriority", "o_orderstatus", "o_totalprice")
      val aggs = Seq(count(lit(1)).as("n_rows")) ++
        cols.flatMap(c => Seq(count(col(c)).as(s"p_$c"),
          countDistinct(col(c)).as(s"d_$c")))
      val stackExpr = cols.map(c =>
        s"'$c', n_rows, n_rows - p_$c, d_$c").mkString(",\n")
      Tables.orders(s, d)
        .agg(aggs.head, aggs.tail: _*)
        .selectExpr(s"stack(${cols.size},\n$stackExpr\n) as " +
          "(col_name, n_rows, n_null, n_distinct)")
        .withColumn("null_bp", expr("n_null * 10000 div n_rows"))
        .orderBy("col_name")
    },

    // Referential-integrity audit: orphan counts across the schema's
    // FK edges. NOT-IN-with-null semantics avoided on purpose: a NULL
    // FK is a completeness problem (a01's job), not an orphan, so
    // orphans are counted over non-null FKs via anti join.
    QueryDef(
      "a02_dq_referential",
      """SELECT edge, n_child, n_orphan FROM (
        |  SELECT 'customer.c_nationkey->nation' AS edge,
        |         (SELECT count(*) FROM customer) AS n_child,
        |         (SELECT count(*) FROM customer c
        |          WHERE c_nationkey IS NOT NULL AND NOT EXISTS
        |            (SELECT 1 FROM nation n
        |             WHERE n.n_nationkey = c.c_nationkey)) AS n_orphan
        |  UNION ALL
        |  SELECT 'lineitem.l_orderkey->orders',
        |         (SELECT count(*) FROM lineitem),
        |         (SELECT count(*) FROM lineitem l
        |          WHERE l_orderkey IS NOT NULL AND NOT EXISTS
        |            (SELECT 1 FROM orders o
        |             WHERE o.o_orderkey = l.l_orderkey))
        |  UNION ALL
        |  SELECT 'lineitem.l_partkey->part',
        |         (SELECT count(*) FROM lineitem),
        |         (SELECT count(*) FROM lineitem l
        |          WHERE l_partkey IS NOT NULL AND NOT EXISTS
        |            (SELECT 1 FROM part p
        |             WHERE p.p_partkey = l.l_partkey))
        |  UNION ALL
        |  SELECT 'lineitem.l_suppkey->supplier',
        |         (SELECT count(*) FROM lineitem),
        |         (SELECT count(*) FROM lineitem l
        |          WHERE l_suppkey IS NOT NULL AND NOT EXISTS
        |            (SELECT 1 FROM supplier s
        |             WHERE s.s_suppkey = l.l_suppkey))
        |  UNION ALL
        |  SELECT 'orders.o_custkey->customer',
        |         (SELECT count(*) FROM orders),
        |         (SELECT count(*) FROM orders o
        |          WHERE o_custkey IS NOT NULL AND NOT EXISTS
        |            (SELECT 1 FROM customer c
        |             WHERE c.c_custkey = o.o_custkey))
        |) e ORDER BY edge""".stripMargin) { (s, d) =>
      edge("customer.c_nationkey->nation", Tables.customer(s, d),
          "c_nationkey", Tables.nation(s, d), "n_nationkey",
          bcastParent = true)
        .unionAll(edge("lineitem.l_orderkey->orders",
          Tables.lineitem(s, d), "l_orderkey",
          Tables.orders(s, d), "o_orderkey", bcastParent = false))
        .unionAll(edge("lineitem.l_partkey->part",
          Tables.lineitem(s, d), "l_partkey",
          Tables.part(s, d), "p_partkey", bcastParent = false))
        .unionAll(edge("lineitem.l_suppkey->supplier",
          Tables.lineitem(s, d), "l_suppkey",
          Tables.supplier(s, d), "s_suppkey", bcastParent = false))
        .unionAll(edge("orders.o_custkey->customer",
          Tables.orders(s, d), "o_custkey",
          Tables.customer(s, d), "c_custkey", bcastParent = false))
        .orderBy("edge")
    },

    // Rule screening: hard constraints (expected 0 violations on a
    // healthy corpus) plus review screens (expected > 0 — they gate
    // human triage, not ingestion). One aggregate per table; each
    // rule is a conditional count, so the whole audit is 3 scans.
    QueryDef(
      "a03_dq_rules",
      """SELECT rule, n_checked, n_violations,
        |       (n_violations * 10000) // n_checked AS viol_bp
        |FROM (
        |  SELECT 'customer/negative_acctbal_screen' AS rule,
        |         count(*) AS n_checked,
        |         count(*) FILTER (WHERE c_acctbal < 0) AS n_violations
        |  FROM customer
        |  UNION ALL
        |  SELECT 'lineitem/discount_range', count(*),
        |         count(*) FILTER (WHERE NOT (l_discount BETWEEN 0 AND 0.1))
        |  FROM lineitem
        |  UNION ALL
        |  SELECT 'lineitem/high_discount_screen', count(*),
        |         count(*) FILTER (WHERE l_discount > 0.08)
        |  FROM lineitem
        |  UNION ALL
        |  SELECT 'lineitem/quantity_range', count(*),
        |         count(*) FILTER (WHERE NOT (l_quantity BETWEEN 1 AND 50))
        |  FROM lineitem
        |  UNION ALL
        |  SELECT 'orders/future_date_screen', count(*),
        |         count(*) FILTER (WHERE o_orderdate > TIMESTAMP '2000-12-31 00:00:00')
        |  FROM orders
        |  UNION ALL
        |  SELECT 'orders/positive_total', count(*),
        |         count(*) FILTER (WHERE o_totalprice <= 0)
        |  FROM orders
        |) r ORDER BY rule""".stripMargin) { (s, d) =>
      val li = Tables.lineitem(s, d).agg(
        count(lit(1)).as("n"),
        nIf(!col("l_discount").between(0, 0.1)).as("v_disc"),
        nIf(col("l_discount") > 0.08).as("v_hidisc"),
        nIf(!col("l_quantity").between(1, 50)).as("v_qty"))
        .selectExpr(
          """stack(3,
            |  'lineitem/discount_range',      n, v_disc,
            |  'lineitem/high_discount_screen', n, v_hidisc,
            |  'lineitem/quantity_range',      n, v_qty
            |) as (rule, n_checked, n_violations)""".stripMargin)
      val ord = Tables.orders(s, d).agg(
        count(lit(1)).as("n"),
        nIf(col("o_orderdate") > lit("2000-12-31 00:00:00").cast("timestamp"))
          .as("v_late"),
        nIf(col("o_totalprice") <= 0).as("v_neg"))
        .selectExpr(
          """stack(2,
            |  'orders/future_date_screen', n, v_late,
            |  'orders/positive_total',     n, v_neg
            |) as (rule, n_checked, n_violations)""".stripMargin)
      val cust = Tables.customer(s, d).agg(
        count(lit(1)).as("n"),
        nIf(col("c_acctbal") < 0).as("v_neg"))
        .selectExpr(
          """stack(1,
            |  'customer/negative_acctbal_screen', n, v_neg
            |) as (rule, n_checked, n_violations)""".stripMargin)
      cust.unionAll(li).unionAll(ord)
        .withColumn("viol_bp", expr("n_violations * 10000 div n_checked"))
        .orderBy("rule")
    },

    // Primary-key uniqueness audit over every PK-bearing table: row
    // count, distinct-key count, duplicate-row count, and the worst
    // key's multiplicity (1 == clean; the max pinpoints whether dups
    // are a broad double-ingest or one hot key).
    QueryDef(
      "a04_dq_uniqueness",
      """SELECT table_name, n_rows, n_keys, n_rows - n_keys AS n_dup_rows,
        |       max_mult FROM (
        |  SELECT 'customer' AS table_name,
        |         (SELECT count(*) FROM customer) AS n_rows,
        |         (SELECT count(*) FROM (SELECT DISTINCT c_custkey FROM customer)) AS n_keys,
        |         (SELECT max(c) FROM (SELECT count(*) AS c FROM customer GROUP BY c_custkey)) AS max_mult
        |  UNION ALL
        |  SELECT 'documents',
        |         (SELECT count(*) FROM documents),
        |         (SELECT count(*) FROM (SELECT DISTINCT doc_id FROM documents)),
        |         (SELECT max(c) FROM (SELECT count(*) AS c FROM documents GROUP BY doc_id))
        |  UNION ALL
        |  SELECT 'embeddings',
        |         (SELECT count(*) FROM embeddings),
        |         (SELECT count(*) FROM (SELECT DISTINCT vec_id FROM embeddings)),
        |         (SELECT max(c) FROM (SELECT count(*) AS c FROM embeddings GROUP BY vec_id))
        |  UNION ALL
        |  SELECT 'events',
        |         (SELECT count(*) FROM events),
        |         (SELECT count(*) FROM (SELECT DISTINCT event_id FROM events)),
        |         (SELECT max(c) FROM (SELECT count(*) AS c FROM events GROUP BY event_id))
        |  UNION ALL
        |  SELECT 'lineitem',
        |         (SELECT count(*) FROM lineitem),
        |         (SELECT count(*) FROM (SELECT DISTINCT l_orderkey, l_linenumber FROM lineitem)),
        |         (SELECT max(c) FROM (SELECT count(*) AS c FROM lineitem GROUP BY l_orderkey, l_linenumber))
        |  UNION ALL
        |  SELECT 'orders',
        |         (SELECT count(*) FROM orders),
        |         (SELECT count(*) FROM (SELECT DISTINCT o_orderkey FROM orders)),
        |         (SELECT max(c) FROM (SELECT count(*) AS c FROM orders GROUP BY o_orderkey))
        |) u ORDER BY table_name""".stripMargin) { (s, d) =>
      uniq("customer", Tables.customer(s, d), Seq("c_custkey"))
        .unionAll(uniq("documents", Tables.documents(s, d), Seq("doc_id")))
        .unionAll(uniq("embeddings", Tables.embeddings(s, d), Seq("vec_id")))
        .unionAll(uniq("events", Tables.events(s, d), Seq("event_id")))
        .unionAll(uniq("lineitem", Tables.lineitem(s, d),
          Seq("l_orderkey", "l_linenumber")))
        .unionAll(uniq("orders", Tables.orders(s, d), Seq("o_orderkey")))
        .orderBy("table_name")
    }
  )
}
