package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType
import graft.Tables

/** Core relational operator surface: scans with pushed-down
  * filters/projections, hash & broadcast joins, semi/anti joins, exact
  * and distinct aggregation, window functions, top-k, unions, JSON
  * extraction.
  *
  * These re-express, Spark-first, the relational skeleton of the
  * reference dataflow (SURVEY.md §2.3/§2.7: projections #13-14,
  * predicates #16-17, explode+join assembly #21, hash aggregation #22,
  * export reshaping #33-38) over the driver testdata tables.
  *
  * Determinism rules used throughout the engine's oracle-checked
  * queries:
  *   - money math is done in DECIMAL (exact, order-independent) and
  *     only cast to double at the very end, so Spark and a
  *     decimal-faithful oracle produce bit-identical doubles;
  *   - every result has a total deterministic ORDER BY;
  *   - raw double columns are passed through untouched (same bits) or
  *     reduced via exact decimal, never via float summation.
  */
object Relational {

  /** Exact money type: values in testdata have ≤2 decimals and fit
    * comfortably in 12 integer digits; keeping precision low leaves
    * headroom for exact decimal multiplication chains (≤38 digits)
    * in both Spark and DuckDB. */
  private def dec(c: Column): Column = c.cast(DecimalType(12, 2))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // #1: full-scan aggregation with decimal-exact sums (TPC-H Q1 shape).
    // Map-side partial aggregation + 2-phase final agg; no raw-double sums.
    "q01_pricing_summary" -> { (s, d) =>
      import s.implicits._
      Tables.lineitem(s, d)
        .filter($"l_returnflag".isNotNull)
        .groupBy($"l_returnflag", $"l_linestatus")
        .agg(
          sum(dec($"l_quantity")).cast("double").as("sum_qty"),
          sum(dec($"l_extendedprice")).cast("double").as("sum_base_price"),
          sum(dec($"l_extendedprice") * (lit(1) - dec($"l_discount")))
            .cast("double").as("sum_disc_price"),
          sum(dec($"l_extendedprice") * (lit(1) - dec($"l_discount"))
            * (lit(1) + dec($"l_tax"))).cast("double").as("sum_charge"),
          count(lit(1)).as("count_order"))
        .orderBy($"l_returnflag", $"l_linestatus")
    },

    // #2: filter + projection — both must reach the parquet scan
    // (PushedFilters / ReadSchema pruning; verified in RelationalSpec).
    "q02_filter_project" -> { (s, d) =>
      import s.implicits._
      Tables.lineitem(s, d)
        .filter($"l_returnflag" === "R" && $"l_discount" > 0.05)
        .select($"l_orderkey", $"l_linenumber", $"l_quantity", $"l_discount")
        .orderBy($"l_orderkey", $"l_linenumber")
    },

    // #3: broadcast join (customer is tiny at any SF relative to orders).
    "q03_broadcast_join" -> { (s, d) =>
      import s.implicits._
      Tables.orders(s, d)
        .join(broadcast(Tables.customer(s, d)),
          $"o_custkey" === $"c_custkey")
        .groupBy($"c_mktsegment")
        .agg(count(lit(1)).as("n_orders"),
          sum(dec($"o_totalprice")).cast("double").as("revenue"))
        .orderBy($"c_mktsegment")
    },

    // #4: multi-way join lineitem⋈orders⋈customer⋈nation⋈region; the
    // two big tables shuffle-join on orderkey, dims broadcast.
    "q04_multi_join" -> { (s, d) =>
      import s.implicits._
      Tables.lineitem(s, d)
        .join(Tables.orders(s, d), $"l_orderkey" === $"o_orderkey")
        .join(broadcast(Tables.customer(s, d)), $"o_custkey" === $"c_custkey")
        .join(broadcast(Tables.nation(s, d)), $"c_nationkey" === $"n_nationkey")
        .join(broadcast(Tables.region(s, d)), $"n_regionkey" === $"r_regionkey")
        .groupBy($"r_name", $"n_name")
        .agg(sum(dec($"l_extendedprice") * (lit(1) - dec($"l_discount")))
          .cast("double").as("revenue"),
          count(lit(1)).as("n_rows"))
        .orderBy($"r_name", $"n_name")
    },

    // #5: top-k by aggregate with deterministic tie-break.
    "q05_topk_customers" -> { (s, d) =>
      import s.implicits._
      Tables.orders(s, d)
        .groupBy($"o_custkey")
        .agg(sum(dec($"o_totalprice")).cast("double").as("revenue"),
          count(lit(1)).as("n_orders"))
        .orderBy($"revenue".desc, $"o_custkey".asc)
        .limit(10)
    },

    // #6: semi join (EXISTS) — customers having at least one 'F' order.
    "q06_semi_join" -> { (s, d) =>
      import s.implicits._
      Tables.customer(s, d)
        .join(Tables.orders(s, d).filter($"o_orderstatus" === "F"),
          $"c_custkey" === $"o_custkey", "left_semi")
        .select($"c_custkey", $"c_name")
        .orderBy($"c_custkey")
    },

    // #7: anti join (NOT EXISTS) — customers with no orders at all.
    "q07_anti_join" -> { (s, d) =>
      import s.implicits._
      Tables.customer(s, d)
        .join(Tables.orders(s, d), $"c_custkey" === $"o_custkey", "left_anti")
        .select($"c_custkey", $"c_name")
        .orderBy($"c_custkey")
    },

    // #8: window ranking — top-3 customers by acctbal per segment.
    "q08_window_rank" -> { (s, d) =>
      import s.implicits._
      val w = Window.partitionBy($"c_mktsegment")
        .orderBy($"c_acctbal".desc, $"c_custkey".asc)
      Tables.customer(s, d)
        .withColumn("rnk", row_number().over(w))
        .filter($"rnk" <= 3)
        .select($"c_mktsegment", $"rnk", $"c_custkey", $"c_acctbal")
        .orderBy($"c_mktsegment", $"rnk")
    },

    // #9: distinct aggregation.
    "q09_distinct_agg" -> { (s, d) =>
      import s.implicits._
      Tables.lineitem(s, d)
        .groupBy($"l_returnflag")
        .agg(countDistinct($"l_partkey").as("n_parts"),
          countDistinct($"l_suppkey").as("n_supps"),
          count(lit(1)).as("n_rows"))
        .orderBy($"l_returnflag")
    },

    // #10: union of heterogeneous relations into a common shape
    // (the reference's tagged-union fan-in encoding, SURVEY.md §1.4).
    "q10_union_shape" -> { (s, d) =>
      import s.implicits._
      val c = Tables.customer(s, d).select(
        $"c_custkey".cast("long").as("key"), $"c_name".as("name"),
        $"c_acctbal".as("acctbal"), lit("customer").as("kind"))
      val p = Tables.supplier(s, d).select(
        $"s_suppkey".cast("long").as("key"), $"s_name".as("name"),
        $"s_acctbal".as("acctbal"), lit("supplier").as("kind"))
      c.unionByName(p).orderBy($"kind", $"key")
    },

    // #11: JSON extraction from a string column (reference #12
    // from_json parse; events.props is a JSON object {"k": int}).
    "q11_json_extract" -> { (s, d) =>
      import s.implicits._
      Tables.events(s, d)
        .withColumn("k", get_json_object($"props", "$.k").cast("long"))
        .groupBy($"event_type")
        .agg(count(lit(1)).as("n"),
          sum($"k").as("sum_k"),
          min($"k").as("min_k"),
          max($"k").as("max_k"))
        .orderBy($"event_type")
    },

    // #12: conditional aggregation (CASE WHEN inside agg).
    "q12_case_agg" -> { (s, d) =>
      import s.implicits._
      Tables.lineitem(s, d)
        .groupBy($"l_linestatus")
        .agg(
          sum(when($"l_discount" > 0.05, lit(1)).otherwise(lit(0))).as("n_disc"),
          sum(when($"l_tax" > 0.04, lit(1)).otherwise(lit(0))).as("n_taxed"),
          count(lit(1)).as("n_rows"))
        .orderBy($"l_linestatus")
    },

    // #13: ROLLUP with grouping indicators (explicit NULLS FIRST so
    // subtotal rows order identically in both engines).
    "q13_rollup" -> { (s, d) =>
      import s.implicits._
      Tables.lineitem(s, d)
        .rollup($"l_returnflag", $"l_linestatus")
        .agg(count(lit(1)).as("n_rows"),
          sum(dec($"l_quantity")).cast("double").as("sum_qty"),
          grouping($"l_returnflag").cast("int").as("g_flag"),
          grouping($"l_linestatus").cast("int").as("g_status"))
        .orderBy($"g_flag", $"g_status",
          $"l_returnflag".asc_nulls_first, $"l_linestatus".asc_nulls_first)
    },

    // CUBE — all 4 grouping combinations in one pass (Spark expands
    // to a single Expand + hash aggregate; no repeated scans).
    "q13b_cube" -> { (s, d) =>
      import s.implicits._
      Tables.lineitem(s, d)
        .cube($"l_returnflag", $"l_linestatus")
        .agg(count(lit(1)).as("n_rows"),
          sum(dec($"l_quantity")).cast("double").as("sum_qty"),
          grouping($"l_returnflag").cast("int").as("g_flag"),
          grouping($"l_linestatus").cast("int").as("g_status"))
        .orderBy($"g_flag", $"g_status",
          $"l_returnflag".asc_nulls_first, $"l_linestatus".asc_nulls_first)
    },

    // Explicit GROUPING SETS — the general form rollup/cube are sugar
    // for: an arbitrary set list ((flag, status), (flag), (status))
    // without the () grand total, which neither rollup nor cube can
    // express alone.
    "q13c_grouping_sets" -> { (s, d) =>
      import s.implicits._
      Tables.lineitem(s, d)
        .groupingSets(
          Seq(Seq($"l_returnflag", $"l_linestatus"),
            Seq($"l_returnflag"), Seq($"l_linestatus")),
          $"l_returnflag", $"l_linestatus")
        .agg(count(lit(1)).as("n_rows"),
          sum(dec($"l_quantity")).cast("double").as("sum_qty"),
          grouping($"l_returnflag").cast("int").as("g_flag"),
          grouping($"l_linestatus").cast("int").as("g_status"))
        .orderBy($"g_flag", $"g_status",
          $"l_returnflag".asc_nulls_first, $"l_linestatus".asc_nulls_first)
    },

    // #14: INTERSECT / EXCEPT (distinct set semantics).
    "q14_setops" -> { (s, d) =>
      import s.implicits._
      def custsWith(status: String) =
        Tables.orders(s, d).filter($"o_orderstatus" === status)
          .select($"o_custkey".as("custkey"))
      val both = custsWith("F").intersect(custsWith("O"))
        .withColumn("tag", lit("both"))
      val fOnly = custsWith("F").except(custsWith("O"))
        .withColumn("tag", lit("f_only"))
      both.unionByName(fOnly)
        .select($"tag", $"custkey")
        .orderBy($"tag", $"custkey")
    },

    // #15: the reference's scalar-function surface in one projection
    // (SURVEY.md §2.8: split/substring/trim/replace/length/
    // format_string/concat_ws/date_format/casts).
    "q15_scalar_suite" -> { (s, d) =>
      import s.implicits._
      Tables.part(s, d)
        .select(
          $"p_partkey",
          split($"p_name", " ").getItem(0).as("first_word"),
          upper($"p_type").as("type_upper"),
          substring($"p_brand", 7, 10).cast("int").as("brand_num"),
          replace($"p_name", lit(" "), lit("_")).as("snake_name"),
          length($"p_name").as("name_len"),
          format_string("%.2f", $"p_retailprice").as("price_str"),
          concat_ws("|", $"p_brand", $"p_type", trim(lit(" x "))).as("joined"))
        .orderBy($"p_partkey")
    },

    // #20f: full outer join (completes the join-type surface: inner,
    // left, semi, anti, cross, full).
    "q20f_full_outer" -> { (s, d) =>
      import s.implicits._
      val custAgg = Tables.orders(s, d)
        .groupBy($"o_custkey").agg(count(lit(1)).as("n_orders"))
      val supp = Tables.supplier(s, d)
        .select($"s_suppkey".as("key"), $"s_name")
      custAgg.select($"o_custkey".as("key"), $"n_orders")
        .join(supp, Seq("key"), "full_outer")
        .select($"key", $"n_orders", $"s_name")
        .orderBy($"key".asc_nulls_first, $"n_orders".asc_nulls_first,
          $"s_name".asc_nulls_first)
    },

    // #17: the engine's full SQL dialect (the reference has none —
    // SURVEY §0): correlated scalar subquery over registered views.
    "q17_sql_correlated" -> { (s, d) =>
      Tables.customer(s, d).createOrReplaceTempView("v_customer")
      Tables.orders(s, d).createOrReplaceTempView("v_orders")
      s.sql(
        """SELECT c_custkey, c_name,
          |  (SELECT max(o_totalprice) FROM v_orders o
          |   WHERE o.o_custkey = c.c_custkey) AS max_order
          |FROM v_customer c
          |WHERE (SELECT count(*) FROM v_orders o
          |       WHERE o.o_custkey = c.c_custkey) >= 3
          |ORDER BY c_custkey""".stripMargin)
    },

    // #18: manual pivot (CASE aggregation — identical SQL shape in
    // both engines, no dialect-specific PIVOT syntax).
    "q18_pivot" -> { (s, d) =>
      import s.implicits._
      Tables.orders(s, d)
        .groupBy($"o_orderpriority")
        .agg(
          sum(when($"o_orderstatus" === "F", 1).otherwise(0)).as("n_f"),
          sum(when($"o_orderstatus" === "O", 1).otherwise(0)).as("n_o"),
          sum(when($"o_orderstatus" === "P", 1).otherwise(0)).as("n_p"))
        .orderBy($"o_orderpriority")
    },

    // #19: stratified deterministic sampling — different keep-rates
    // per stratum (lang), same md5-uniform trick as q16. At 100 TB
    // this is the down-sampling-by-source/language pass of a training
    // pipeline: map-only, no shuffle, reproducible.
    "q19_stratified_sample" -> { (s, d) =>
      import s.implicits._
      val h = expr(Tokens.mdByteExpr("doc_id"))
      val keep = when($"lang" === "en", lit(205))     // ~80%
        .when($"lang" === "de", lit(128))             // ~50%
        .when($"lang".isin("es", "fr"), lit(64))      // ~25%
        .otherwise(lit(26))                           // ~10%
      Tables.documents(s, d)
        .withColumn("h", h)
        .where($"h" < keep)
        .select($"doc_id", $"lang", $"source")
        .orderBy($"doc_id")
    },

    // #15b: the datetime scalar surface (ISO formatting per SURVEY
    // §2.8 plus extraction/truncation/arithmetic). dayofweek is
    // normalized to 1=Sunday in both engines.
    "q15b_datetime_suite" -> { (s, d) =>
      import s.implicits._
      Tables.orders(s, d)
        .select(
          $"o_orderkey",
          year($"o_orderdate").as("y"),
          month($"o_orderdate").as("m"),
          dayofmonth($"o_orderdate").as("dom"),
          dayofweek($"o_orderdate").as("dow"),
          date_trunc("month", $"o_orderdate").cast("date").as("month_start"),
          date_format($"o_orderdate", "yyyy-MM-dd").as("iso_day"),
          unix_seconds($"o_orderdate".cast("timestamp")).as("epoch_s"),
          add_months($"o_orderdate", 3).as("plus3m"))
        .orderBy($"o_orderkey")
    },

    // #15c: three-valued-logic / null-handling semantics (the engine
    // contract a SQL user relies on: count(*) vs count(col), aggregates
    // over nulls, coalesce/nullif, null-safe equality).
    "q15c_null_semantics" -> { (s, d) =>
      import s.implicits._
      Tables.documents(s, d)
        .withColumn("maybe", when($"doc_id" % 3 === 0, $"n_chars"))
        .groupBy($"lang")
        .agg(
          count(lit(1)).as("n_rows"),
          count($"maybe").as("n_nonnull"),
          sum($"maybe").as("sum_maybe"),
          min($"maybe").as("min_maybe"),
          sum(when($"maybe".isNull, 1).otherwise(0)).as("n_null"),
          sum(when($"maybe" <=> lit(null), 1).otherwise(0)).as("n_nullsafe_eq"),
          max(coalesce($"maybe", lit(-1))).as("max_coalesced"),
          count(nullif($"source", lit("src0"))).as("n_not_src0"))
        .orderBy($"lang")
    },

    // #19b: reproducible train/val/test split assignment (80/10/10 by
    // content-independent id hash — stable under corpus growth, the
    // split every training pipeline needs to be able to replay).
    "q19b_split_assign" -> { (s, d) =>
      import s.implicits._
      val h = expr(Tokens.mdByteExpr("doc_id"))
      Tables.documents(s, d)
        .withColumn("h", h)
        .withColumn("split",
          when($"h" < 204, "train").when($"h" < 230, "val").otherwise("test"))
        .select($"doc_id", $"lang", $"split")
        .orderBy($"doc_id")
    },

    // #16: deterministic hash-Bernoulli sampling (~10%: first md5 byte
    // < 26) — the engine's replacement for the reference's wall-clock
    // sampling filter (SURVEY.md §2 #15, documented divergence).
    "q16_sample_hash" -> { (s, d) =>
      import s.implicits._
      Tables.orders(s, d)
        .withColumn("h", expr(Tokens.mdByteExpr("o_orderkey")))
        .where($"h" < 26)
        .select($"o_orderkey", $"o_custkey", $"o_totalprice")
        .orderBy($"o_orderkey")
    },

    // WEIGHTED SAMPLE — Efraimidis–Spirakis A-ES, the
    // sample-proportional-to-size pass a curation pipeline runs when
    // "10k documents" should mean "10k documents weighted by length/
    // quality": doc i gets key -ln(u_i)/w_i (u_i a deterministic
    // md5 uniform, w_i = n_chars) and the k SMALLEST keys are the
    // weight-proportional sample — one-pass, merge-able (a k-smallest
    // union of per-partition k-smallests), which is what makes it the
    // distributed/streaming-safe formulation vs rejection sampling.
    // Plan: map-only key computation + TakeOrderedAndProject (per-
    // partition top-k, k-row gather — no global sort). Determinism:
    // u from the 48-bit hex fold (+0.5, /2^48 — exact doubles), ln
    // rounded to 6 and carried through DECIMAL(18,6) (the q82 libm-
    // parity idiom), division left raw IEEE on identical operands.
    "q105_weighted_sample" -> { (s, d) =>
      import s.implicits._
      Tables.documents(s, d)
        .withColumn("h", md5(concat(lit("q105:"), $"doc_id".cast("string"))))
        .withColumn("u",
          (expr(Tokens.hex48("h")).cast("double") + lit(0.5)) /
            lit(281474976710656.0))
        .withColumn("w", greatest($"n_chars", lit(1L)).cast("double"))
        .withColumn("key",
          round(-log($"u"), 6).cast("decimal(18,6)").cast("double") / $"w")
        .orderBy($"key".asc, $"doc_id".asc)
        .limit(100)
        .select($"doc_id", $"source", $"n_chars", $"key")
        .orderBy($"doc_id")
    },

    // PER-GROUP WEIGHTED RESERVOIR — q105's A-ES sample per SOURCE,
    // via a custom typed `Aggregator` ([[graft.functions
    // .ReservoirTopK]]): the engine's extension point for aggregates
    // the built-ins can't express. The bounded buffer is MERGEABLE,
    // so Spark plans it as ObjectHashAggregate with map-side partial
    // aggregation — each task reduces its slice to ≤ k entries per
    // source before the shuffle (a window-rank formulation would
    // shuffle every row to its group). Oracle = the window-rank SQL:
    // associative merges must reproduce the global rank exactly.
    "q106_grouped_reservoir" -> { (s, d) =>
      import s.implicits._
      val keyed = Tables.documents(s, d)
        .withColumn("h", md5(concat(lit("q106:"), $"doc_id".cast("string"))))
        .withColumn("u",
          (expr(Tokens.hex48("h")).cast("double") + lit(0.5)) /
            lit(281474976710656.0))
        .withColumn("w", greatest($"n_chars", lit(1L)).cast("double"))
        .withColumn("key",
          round(-log($"u"), 6).cast("decimal(18,6)").cast("double") / $"w")
        .select($"source", $"key", $"doc_id")
      keyed.as[(String, Double, Long)]
        .groupByKey(_._1)
        .mapValues(t => graft.functions.KeyedDoc(t._2, t._3))
        .agg(new graft.functions.ReservoirTopK(5).toColumn.name("sample"))
        .toDF("source", "sample")
        .select($"source", explode($"sample").as("kd"))
        .select($"source", $"kd.doc_id".as("doc_id"), $"kd.key".as("key"))
        .orderBy($"source", $"doc_id")
    },
  )

  def oracle: Map[String, String] = Map(
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS sum_disc_price,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2))) * (1 + CAST(l_tax AS DECIMAL(12,2)))) AS DOUBLE) AS sum_charge,
        |  count(*) AS count_order
        |FROM lineitem WHERE l_returnflag IS NOT NULL
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q02_filter_project" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_discount
        |FROM lineitem WHERE l_returnflag = 'R' AND l_discount > 0.05
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q03_broadcast_join" ->
      """SELECT c_mktsegment, count(*) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS revenue
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "q04_multi_join" ->
      """SELECT r_name, n_name,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue,
        |  count(*) AS n_rows
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin,
    "q05_topk_customers" ->
      """SELECT o_custkey,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS revenue,
        |  count(*) AS n_orders
        |FROM orders GROUP BY o_custkey
        |ORDER BY revenue DESC, o_custkey ASC LIMIT 10""".stripMargin,
    "q06_semi_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
        |ORDER BY c_custkey""".stripMargin,
    "q07_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,
    "q08_window_rank" ->
      """SELECT c_mktsegment, rnk, c_custkey, c_acctbal FROM (
        |  SELECT c_mktsegment, c_custkey, c_acctbal,
        |    row_number() OVER (PARTITION BY c_mktsegment
        |      ORDER BY c_acctbal DESC, c_custkey ASC) AS rnk
        |  FROM customer) t
        |WHERE rnk <= 3 ORDER BY c_mktsegment, rnk""".stripMargin,
    "q09_distinct_agg" ->
      """SELECT l_returnflag,
        |  count(DISTINCT l_partkey) AS n_parts,
        |  count(DISTINCT l_suppkey) AS n_supps,
        |  count(*) AS n_rows
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q10_union_shape" ->
      """SELECT * FROM (
        |  SELECT CAST(c_custkey AS BIGINT) AS key, c_name AS name,
        |    c_acctbal AS acctbal, 'customer' AS kind FROM customer
        |  UNION ALL
        |  SELECT CAST(s_suppkey AS BIGINT) AS key, s_name AS name,
        |    s_acctbal AS acctbal, 'supplier' AS kind FROM supplier)
        |ORDER BY kind, key""".stripMargin,
    // NOTE: DuckDB's sum() over integers returns HUGEINT, which pandas
    // renders as float64 ("3.0") while Spark writes BIGINT ("3") — a
    // value-representation hash mismatch. Every integer sum in oracle
    // SQL must be wrapped CAST(sum(...) AS BIGINT).
    "q11_json_extract" ->
      """SELECT event_type, count(*) AS n,
        |  CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        |  min(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
        |  max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q12_case_agg" ->
      """SELECT l_linestatus,
        |  CAST(sum(CASE WHEN l_discount > 0.05 THEN 1 ELSE 0 END) AS BIGINT) AS n_disc,
        |  CAST(sum(CASE WHEN l_tax > 0.04 THEN 1 ELSE 0 END) AS BIGINT) AS n_taxed,
        |  count(*) AS n_rows
        |FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin,
    "q13_rollup" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n_rows,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
        |  CAST(grouping(l_returnflag) AS INTEGER) AS g_flag,
        |  CAST(grouping(l_linestatus) AS INTEGER) AS g_status
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY g_flag, g_status,
        |  l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin,
    "q13b_cube" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n_rows,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
        |  CAST(grouping(l_returnflag) AS INTEGER) AS g_flag,
        |  CAST(grouping(l_linestatus) AS INTEGER) AS g_status
        |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
        |ORDER BY g_flag, g_status,
        |  l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin,
    "q13c_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n_rows,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
        |  CAST(grouping(l_returnflag) AS INTEGER) AS g_flag,
        |  CAST(grouping(l_linestatus) AS INTEGER) AS g_status
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
        |  (l_returnflag), (l_linestatus))
        |ORDER BY g_flag, g_status,
        |  l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin,
    "q14_setops" ->
      """SELECT 'both' AS tag, custkey FROM (
        |  SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
        |  INTERSECT
        |  SELECT o_custkey FROM orders WHERE o_orderstatus = 'O')
        |UNION ALL
        |SELECT 'f_only', custkey FROM (
        |  SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
        |  EXCEPT
        |  SELECT o_custkey FROM orders WHERE o_orderstatus = 'O')
        |ORDER BY tag, custkey""".stripMargin,
    "q15_scalar_suite" ->
      """SELECT p_partkey,
        |  string_split(p_name, ' ')[1] AS first_word,
        |  upper(p_type) AS type_upper,
        |  CAST(substring(p_brand, 7, 10) AS INTEGER) AS brand_num,
        |  replace(p_name, ' ', '_') AS snake_name,
        |  length(p_name) AS name_len,
        |  printf('%.2f', p_retailprice) AS price_str,
        |  concat_ws('|', p_brand, p_type, trim(' x ')) AS joined
        |FROM part ORDER BY p_partkey""".stripMargin,
    "q20f_full_outer" ->
      """SELECT COALESCE(c.key, s.s_suppkey) AS key, c.n_orders, s.s_name
        |FROM (SELECT o_custkey AS key, count(*) AS n_orders
        |      FROM orders GROUP BY o_custkey) c
        |FULL OUTER JOIN supplier s ON c.key = s.s_suppkey
        |ORDER BY key ASC NULLS FIRST, n_orders ASC NULLS FIRST,
        |  s_name ASC NULLS FIRST""".stripMargin,
    "q17_sql_correlated" ->
      """SELECT c_custkey, c_name,
        |  (SELECT max(o_totalprice) FROM orders o
        |   WHERE o.o_custkey = c.c_custkey) AS max_order
        |FROM customer c
        |WHERE (SELECT count(*) FROM orders o
        |       WHERE o.o_custkey = c.c_custkey) >= 3
        |ORDER BY c_custkey""".stripMargin,
    "q18_pivot" ->
      """SELECT o_orderpriority,
        |  CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_f,
        |  CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_o,
        |  CAST(sum(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_p
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q19_stratified_sample" ->
      s"""SELECT doc_id, lang, source FROM (
        |  SELECT *,
        |    ${Tokens.mdByteSql("doc_id")} AS h,
        |    CASE WHEN lang = 'en' THEN 205
        |         WHEN lang = 'de' THEN 128
        |         WHEN lang IN ('es', 'fr') THEN 64
        |         ELSE 26 END AS keep
        |  FROM documents)
        |WHERE h < keep ORDER BY doc_id""".stripMargin,
    "q15c_null_semantics" ->
      """WITH t AS (
        |  SELECT lang, source,
        |    CASE WHEN doc_id % 3 = 0 THEN n_chars END AS maybe
        |  FROM documents)
        |SELECT lang,
        |  count(*) AS n_rows,
        |  count(maybe) AS n_nonnull,
        |  CAST(sum(maybe) AS BIGINT) AS sum_maybe,
        |  min(maybe) AS min_maybe,
        |  CAST(sum(CASE WHEN maybe IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
        |  CAST(sum(CASE WHEN maybe IS NOT DISTINCT FROM NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nullsafe_eq,
        |  max(coalesce(maybe, -1)) AS max_coalesced,
        |  count(nullif(source, 'src0')) AS n_not_src0
        |FROM t GROUP BY lang ORDER BY lang""".stripMargin,
    "q15b_datetime_suite" ->
      """SELECT o_orderkey,
        |  CAST(year(o_orderdate) AS INTEGER) AS y,
        |  CAST(month(o_orderdate) AS INTEGER) AS m,
        |  CAST(day(o_orderdate) AS INTEGER) AS dom,
        |  CAST(date_part('dow', o_orderdate) + 1 AS INTEGER) AS dow,
        |  CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
        |  strftime(o_orderdate, '%Y-%m-%d') AS iso_day,
        |  CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s,
        |  CAST(o_orderdate + INTERVAL 3 MONTH AS DATE) AS plus3m
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "q19b_split_assign" ->
      s"""SELECT doc_id, lang,
        |  CASE WHEN h < 204 THEN 'train' WHEN h < 230 THEN 'val'
        |       ELSE 'test' END AS split
        |FROM (
        |  SELECT doc_id, lang,
        |    ${Tokens.mdByteSql("doc_id")} AS h
        |  FROM documents)
        |ORDER BY doc_id""".stripMargin,
    "q16_sample_hash" ->
      s"""SELECT o_orderkey, o_custkey, o_totalprice FROM (
        |  SELECT *,
        |    ${Tokens.mdByteSql("o_orderkey")} AS h
        |  FROM orders)
        |WHERE h < 26 ORDER BY o_orderkey""".stripMargin,
    "q105_weighted_sample" ->
      s"""SELECT doc_id, source, n_chars, key FROM (
        |  SELECT doc_id, source, n_chars,
        |    CAST(CAST(round(-ln(
        |        (CAST(${Tokens.hex48("h")} AS DOUBLE) + 0.5)
        |          / 281474976710656.0), 6) AS DECIMAL(18,6)) AS DOUBLE)
        |      / CAST(greatest(n_chars, 1) AS DOUBLE) AS key
        |  FROM (SELECT *,
        |      md5(concat('q105:', CAST(doc_id AS VARCHAR))) AS h
        |    FROM documents)
        |  ORDER BY key ASC, doc_id ASC LIMIT 100)
        |ORDER BY doc_id""".stripMargin,
    "q106_grouped_reservoir" ->
      s"""WITH m AS (
        |  SELECT doc_id, source,
        |    CAST(CAST(round(-ln(
        |        (CAST(${Tokens.hex48("h")} AS DOUBLE) + 0.5)
        |          / 281474976710656.0), 6) AS DECIMAL(18,6)) AS DOUBLE)
        |      / CAST(greatest(n_chars, 1) AS DOUBLE) AS key
        |  FROM (SELECT *,
        |      md5(concat('q106:', CAST(doc_id AS VARCHAR))) AS h
        |    FROM documents)),
        |r AS (SELECT *, row_number() OVER (
        |    PARTITION BY source ORDER BY key ASC, doc_id ASC) AS rk
        |  FROM m)
        |SELECT source, doc_id, key FROM r WHERE rk <= 5
        |ORDER BY source, doc_id""".stripMargin,
  )
}
