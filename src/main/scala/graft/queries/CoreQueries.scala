package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.exec.{Mor, ScanTaskSplit}
import graft.selection.{FileGroup, ListPacker, PlanningParams}

/** The DuckDB-oracle query set for SURVEY.md §2's t2-testable operators.
  *
  * MOR queries (ops 14/15/16/40) emulate the hidden columns
  * (`sys_hidden_file_path`/`pos`/`seq_num`) with deterministic arithmetic
  * over the TPC-H tables, so the *same* anti-join builders used by the real
  * compaction path ([[graft.exec.Mor]]) are checkable against ANSI SQL on
  * plain parquet. Planning ops (20/27/30) are driver-side math by design —
  * metadata-only in the reference too — exposed as deterministic
  * DataFrames with rows-only checks.
  *
  * Determinism rules for oracle parity (DuckDB vs Spark):
  * money sums use exact bigint cents (`round(x*100)::bigint`), averages
  * are rounded, timestamps are never output raw (formatted as strings),
  * and no query relies on result ordering or ties.
  */
object CoreQueries {

  private def tbl(s: SparkSession, dir: String, name: String): DataFrame = {
    // events.ts is normalized to epoch NANOS as a bigint whatever the file
    // stores: TIMESTAMP(NANOS) parquet needs the legacy flag to load at all
    // (already nanos), TIMESTAMP(MICROS) arrives as a timestamp column and is
    // converted (micros * 1000). Every downstream query and the streaming
    // pipeline share this one nano-long domain; the DuckDB oracle reads the
    // same files natively via epoch_ns()/epoch_us(), which agree with both
    // encodings (the session timezone is UTC, so NTZ wall-clock == instant).
    if (name == "events") s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = s.read.parquet(s"$dir/$name.parquet")
    if (name == "events") normalizeTsNanos(df) else df
  }

  /** See [[tbl]]: ts (timestamp of any precision, or already a nano long)
    * -> epoch-nanos bigint. */
  def normalizeTsNanos(df: DataFrame): DataFrame =
    df.schema.find(_.name == "ts").map(_.dataType) match {
      case Some(org.apache.spark.sql.types.TimestampType) |
           Some(org.apache.spark.sql.types.TimestampNTZType) =>
        df.withColumn("ts", unix_micros(col("ts").cast("timestamp")) * lit(1000L))
      case _ => df
    }

  /** exact integer cents for a money expression (see class doc). */
  private def cents(c: Column): Column = round(c * 100).cast("long")

  // ---- emulated hidden columns (identical arithmetic in the oracle SQL) --

  private def liWithHidden(s: SparkSession, dir: String): DataFrame =
    tbl(s, dir, "lineitem").select(
      col("l_orderkey"), col("l_linenumber"), col("l_suppkey"), col("l_partkey"),
      concat(lit("f"), (col("l_orderkey") % 7).cast("string")).as(Mor.FilePathCol),
      (col("l_orderkey") * 10 + col("l_linenumber")).as(Mor.PosCol),
      (lit(3) + col("l_orderkey") % 5).as(Mor.SeqNumCol))

  private val liHiddenSql =
    """SELECT l_orderkey, l_linenumber, l_suppkey, l_partkey,
      |  'f' || CAST(l_orderkey % 7 AS VARCHAR) AS file_path,
      |  l_orderkey * 10 + l_linenumber AS pos,
      |  3 + l_orderkey % 5 AS seq
      |FROM lineitem""".stripMargin

  // ------------------------------------------------------------ queries --

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // op 10/11/12: projection + filter, both pushed into the parquet scan
    "q10_projection" -> ((s, dir) =>
      tbl(s, dir, "lineitem")
        .filter(col("l_quantity") > 45)
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_quantity").cast("long").as("qty"), col("l_returnflag"))),

    // op 14: position-delete anti join on (file_path, pos)
    "q14_pos_anti_join" -> ((s, dir) => {
      val data = liWithHidden(s, dir)
      val dels = data.filter(col("l_partkey") % 13 === 0)
        .select(col(Mor.FilePathCol), col(Mor.PosCol))
      Mor.applyPositionDeletes(data, dels)
        .select(col("l_orderkey"), col("l_linenumber"))
    }),

    // op 15: equality-delete anti join with strict seq condition
    "q15_eq_anti_join_seq" -> ((s, dir) => {
      val data = tbl(s, dir, "orders").select(
        col("o_orderkey"), col("o_custkey"), (col("o_orderkey") % 5).as(Mor.SeqNumCol))
      val dels = tbl(s, dir, "orders").filter(col("o_orderkey") % 11 === 0)
        .select(col("o_custkey"), (col("o_orderkey") % 7).as("dseq"))
      Mor.applyEqualityDeletes(data, dels, Seq("o_custkey"), Mor.SeqNumCol, "dseq")
        .select(col("o_orderkey"))
    }),

    // op 16: chained deletes — pos join, then two equality groups
    "q16_chained_deletes" -> ((s, dir) => {
      val data = liWithHidden(s, dir)
      val pos = data.filter(col("l_partkey") % 13 === 0)
        .select(col(Mor.FilePathCol), col(Mor.PosCol))
      val eq1 = data.filter(col("l_orderkey") % 97 === 0)
        .select(col("l_partkey"), (col("l_orderkey") % 12).as("dseq"))
      val eq2 = data.filter(col("l_orderkey") % 53 === 0)
        .select(col("l_suppkey"), col("l_partkey"), (col("l_orderkey") % 11).as("dseq"))
      val afterPos = Mor.applyPositionDeletes(data, pos)
      val after1 = Mor.applyEqualityDeletes(afterPos, eq1, Seq("l_partkey"), Mor.SeqNumCol, "dseq")
      // second group uses a two-column equality key
      Mor.applyEqualityDeletes(after1, eq2, Seq("l_suppkey", "l_partkey"), Mor.SeqNumCol, "dseq")
        .select(col("l_orderkey"), col("l_linenumber"))
    }),

    // op 17: round-robin repartition preserves every row (aggregate proof)
    "q17_repartition_rows" -> ((s, dir) =>
      tbl(s, dir, "lineitem").repartition(32).agg(
        count(lit(1)).as("n_rows"),
        sum(col("l_quantity").cast("long")).as("sum_qty"),
        sum(cents(col("l_extendedprice"))).as("sum_price_cents"))),

    // op 18: sortWithinPartitions — content is preserved as a multiset
    // (per-partition ordering itself is asserted in SortSpec, not here)
    "q18_sort_within_partitions" -> ((s, dir) =>
      tbl(s, dir, "lineitem")
        .repartition(8, col("l_returnflag"))
        .sortWithinPartitions(col("l_shipdate").asc_nulls_first)
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_quantity").cast("long").as("qty"))),

    // op 40: MOR row-count validation — the validator's contract
    "q40_mor_rowcount" -> ((s, dir) => {
      val data = liWithHidden(s, dir)
      val pos = data.filter(col("l_partkey") % 13 === 0)
        .select(col(Mor.FilePathCol), col(Mor.PosCol))
      Mor.applyPositionDeletes(data, pos).agg(count(lit(1)).as("n_rows"))
    }),

    // headline: TPC-H Q1-style pricing summary (agg breadth: sum/avg/count)
    "q1_agg" -> ((s, dir) =>
      tbl(s, dir, "lineitem")
        .filter(col("l_shipdate") <= lit("1998-09-02"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity").cast("long")).as("sum_qty"),
          sum(cents(col("l_extendedprice"))).as("sum_base_cents"),
          sum(round(col("l_extendedprice") * (lit(1) - col("l_discount")) * 10000).cast("long"))
            .as("sum_disc_e4"),
          round(avg(col("l_quantity")), 4).as("avg_qty"),
          count(lit(1)).as("count_order"))),

    // headline: 3-way join + group (TPC-H Q3 shape), dimension broadcast
    "q3_join_agg" -> ((s, dir) => {
      val cust = tbl(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
      val ord = tbl(s, dir, "orders").filter(col("o_orderdate") < lit("1998-07-01"))
      val li = tbl(s, dir, "lineitem").filter(col("l_shipdate") > lit("1998-03-01"))
      li.join(broadcast(ord), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .groupBy(col("l_orderkey"), date_format(col("o_orderdate"), "yyyy-MM-dd").as("orderdate"))
        .agg(sum(round(col("l_extendedprice") * (lit(1) - col("l_discount")) * 10000).cast("long"))
          .as("revenue_e4"))
    }),

    // headline: 5-way star join -> revenue per nation (TPC-H Q5 shape)
    "q5_star_join" -> ((s, dir) => {
      val region = tbl(s, dir, "region").filter(col("r_name") === "ASIA")
      val nation = tbl(s, dir, "nation")
      val cust = tbl(s, dir, "customer")
      val ord = tbl(s, dir, "orders").filter(col("o_orderdate") < lit("1999-01-01"))
      val li = tbl(s, dir, "lineitem")
      val sup = tbl(s, dir, "supplier")
      li.join(broadcast(ord), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("n_name"))
        .agg(sum(round(col("l_extendedprice") * (lit(1) - col("l_discount")) * 10000).cast("long"))
          .as("revenue_e4"))
    }),

    // window functions: top-3 events per user by time
    "q_window_topk" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      tbl(s, dir, "events")
        .withColumn("rn", row_number().over(w).cast("long"))
        .filter(col("rn") <= 3)
        .select(col("user_id"), col("event_id"), col("rn"))
    }),

    // streaming-shaped tumbling-window aggregation in batch mode (the
    // exact same transform runs under readStream: see
    // graft.streaming.EventPipeline / StreamingSpec)
    "q_stream_window" -> ((s, dir) =>
      tbl(s, dir, "events")
        // integer div: ts is epoch *nanos* (~1.7e18), beyond double's exact
        // integer range — float division would corrupt bucket boundaries
        .groupBy(expr("ts div 300000000000").as("bucket"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(round(col("value") * 10000).cast("long")).as("value_e4"))),

    // semi-structured column: JSON property extraction + aggregate
    // (training pipelines carry metadata as JSON side-columns)
    "q_json_agg" -> ((s, dir) =>
      tbl(s, dir, "events")
        .groupBy(col("event_type"))
        .agg(sum(get_json_object(col("props"), "$.k").cast("long")).as("sum_k"),
          count(lit(1)).as("n"))),

    // TPC-H Q6 shape: tight filter + scalar aggregate (full pushdown)
    "q6_filter_agg" -> ((s, dir) =>
      tbl(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01") && col("l_shipdate") < lit("1998-01-01") &&
          col("l_discount") >= 0.03 && col("l_discount") <= 0.07 && col("l_quantity") < 24)
        .agg(sum(round(col("l_extendedprice") * col("l_discount") * 10000).cast("long"))
          .as("revenue_e4"), count(lit(1)).as("n"))),

    // left outer join: preserve dimension rows with no facts
    "q_outer_join" -> ((s, dir) => {
      val nation = tbl(s, dir, "nation")
      val cust = tbl(s, dir, "customer")
      nation.join(cust, nation("n_nationkey") === cust("c_nationkey"), "left")
        .groupBy(col("n_name"))
        .agg(count(col("c_custkey")).as("n_cust"))
    }),

    // left semi join (EXISTS)
    "q_semi_join" -> ((s, dir) => {
      val cust = tbl(s, dir, "customer")
      val ord = tbl(s, dir, "orders").filter(col("o_totalprice") > 200000)
      cust.join(ord, cust("c_custkey") === ord("o_custkey"), "left_semi")
        .select(col("c_custkey"))
    }),

    // distinct aggregation
    "q_distinct_agg" -> ((s, dir) =>
      tbl(s, dir, "orders").groupBy(col("o_orderstatus")).agg(
        countDistinct(col("o_custkey")).as("n_cust"),
        count(lit(1)).as("n_orders"))),

    // rollup: hierarchical aggregates with the null group keys coalesced
    // to a sentinel so both engines hash identically
    "q_rollup" -> ((s, dir) =>
      tbl(s, dir, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"), sum(col("l_quantity").cast("long")).as("sum_qty"))
        .select(coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
          coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
          col("n"), col("sum_qty"))),

    // pivot: wide per-source language counts (fixed column set so the
    // schema is static; empty combos filled with 0 to match FILTER counts)
    "q_pivot" -> ((s, dir) =>
      tbl(s, dir, "documents").groupBy(col("source"))
        .pivot("lang", Seq("en", "fr", "es", "de", "zh"))
        .agg(count(lit(1)))
        .na.fill(0)),

    // cube: all grouping-set combinations over (source, lang) with the
    // null group keys coalesced to a sentinel (like q_rollup)
    "q_cube" -> ((s, dir) =>
      tbl(s, dir, "documents")
        .cube(col("source"), col("lang"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("total_chars"))
        .select(coalesce(col("source"), lit("ALL")).as("src"),
          coalesce(col("lang"), lit("ALL")).as("lng"),
          col("n_docs"), col("total_chars"))),

    // batch sessionization: per-user 30-minute-gap sessions via lag +
    // running sum — both windows share the user_id partitioning (one
    // exchange), then a (user, session) aggregate. All time arithmetic
    // runs on MICROS (ts div 1000): Spark reads the ns-parquet column as
    // a nano bigint while DuckDB's TIMESTAMP truncates to micros, so
    // micro precision is the shared exact domain
    "q_sessionize" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("__ts_us"), col("event_id"))
      val gapUs = col("__ts_us") - lag(col("__ts_us"), 1).over(w)
      tbl(s, dir, "events")
        .select(col("user_id"), expr("ts div 1000").as("__ts_us"), col("event_id"))
        .withColumn("__new",
          when(gapUs.isNull || gapUs > 30L * 60 * 1000000L, 1L).otherwise(0L))
        .withColumn("session_idx", sum(col("__new")).over(w))
        .groupBy(col("user_id"), col("session_idx"))
        .agg(count(lit(1)).as("n_events"),
          min(col("__ts_us")).as("start_us"),
          max(col("__ts_us")).as("end_us"))
    }),

    // NATIVE session windows: Spark's built-in session_window (the same
    // operator Structured Streaming uses for streaming sessions) must
    // agree with the manual lag/running-sum sessionization — the oracle
    // replays the gap rule relationally. Boundary semantics: a session's
    // end is last_event + gap, and Spark MERGES when the next event's
    // start <= the current session end (UpdatingSessionsIterator), so an
    // event at EXACTLY gap distance CONTINUES the session — the oracle
    // splits only on strict gap > (same rule as q_sessionize's manual
    // form; SessionBoundarySpec pins the exact-boundary case)
    "q_session_window" -> ((s, dir) =>
      tbl(s, dir, "events")
        .withColumn("__t", expr("timestamp_micros(ts div 1000)"))
        .groupBy(col("user_id"), session_window(col("__t"), "30 minutes").as("sw"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("user_id"),
          unix_micros(col("sw.start")).as("start_us"),
          unix_micros(col("sw.end")).as("end_us"),
          col("n_events"))),

    // calendar rollup: daily event counts + value cents. The nano-long
    // ts becomes a real timestamp via timestamp_micros(ts div 1000);
    // date_format in the UTC session == DuckDB strftime over the same
    // stored wall-clock values
    "q_date_trunc" -> ((s, dir) =>
      tbl(s, dir, "events")
        .groupBy(date_format(expr("timestamp_micros(ts div 1000)"), "yyyy-MM-dd").as("day"))
        .agg(count(lit(1)).as("n"),
          sum(expr("cast(round(value * 100) as bigint)")).as("value_cents"))),

    // set operations: UNION ALL / INTERSECT / EXCEPT
    "q_setops" -> ((s, dir) => {
      val a = tbl(s, dir, "orders").filter(col("o_totalprice") > 150000).select(col("o_custkey"))
      val b = tbl(s, dir, "orders").filter(col("o_orderstatus") === "F").select(col("o_custkey"))
      val inter = a.intersect(b).withColumn("src", lit("both"))
      val onlyA = a.except(b).withColumn("src", lit("high_only"))
      inter.unionAll(onlyA)
    }),

    // as-of join: attach the latest prior purchase value to each click,
    // per user (graft.ops.AsOfJoin — one shuffle + window, no range blowup)
    "q_asof_join" -> ((s, dir) => {
      val ev = tbl(s, dir, "events")
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"), col("event_id"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("value"))
      graft.ops.AsOfJoin.backward(clicks, purchases, Seq("user_id"), "ts", Seq("value"))
        .select(col("user_id"), col("event_id"),
          round(coalesce(col("asof_value"), lit(-1.0)), 4).as("last_purchase"))
    }),

    // exact (interpolated) percentiles — both engines use the standard
    // linear-interpolation definition on sorted values
    "q_percentile" -> ((s, dir) =>
      tbl(s, dir, "lineitem").groupBy(col("l_returnflag")).agg(
        round(expr("percentile(l_quantity, 0.5)"), 4).as("p50"),
        round(expr("percentile(l_quantity, 0.9)"), 4).as("p90"),
        round(expr("percentile(l_extendedprice, 0.25)"), 4).as("price_p25"))),

    // string functions: LIKE, substring, concat, length, case mapping
    "q_string_funcs" -> ((s, dir) =>
      tbl(s, dir, "part")
        .filter(col("p_type").like("%ECO%") || col("p_name").like("%bolt%"))
        .select(col("p_partkey"),
          upper(substring(col("p_name"), 1, 8)).as("name8"),
          concat(col("p_brand"), lit("#"), col("p_type")).as("brand_type"),
          length(col("p_name")).cast("long").as("name_len"))),

    // funnel analysis: strictly-ordered view -> click -> purchase stages
    // per user (each stage's min ts must be at or after the prior stage's).
    // Stage frontiers are per-user aggregates (<= #users rows): small ->
    // AQE broadcasts them; past broadcast size the same plan shuffle-joins
    // on user_id (no forced hint = no driver OOM at 10^9 users). ts stays
    // in the exact integer nano domain
    "q_funnel" -> ((s, dir) => {
      val ev = tbl(s, dir, "events").select(col("user_id"), col("ts"), col("event_type"))
      val v = ev.filter(col("event_type") === "view")
        .groupBy("user_id").agg(min("ts").as("t1"))
      val c = ev.filter(col("event_type") === "click").join(v, "user_id")
        .filter(col("ts") >= col("t1"))
        .groupBy("user_id").agg(min("ts").as("t2"))
      val p = ev.filter(col("event_type") === "purchase").join(c, "user_id")
        .filter(col("ts") >= col("t2"))
        .groupBy("user_id").agg(min("ts").as("t3"))
      v.agg(count(lit(1)).as("n_users")).withColumn("stage", lit("1_view"))
        .unionAll(c.agg(count(lit(1)).as("n_users")).withColumn("stage", lit("2_click")))
        .unionAll(p.agg(count(lit(1)).as("n_users")).withColumn("stage", lit("3_purchase")))
        .select(col("stage"), col("n_users"))
    }),

    // cohort retention: users bucketed by first-activity day, activity
    // counted per (cohort, day offset). The per-user cohort map joins
    // un-hinted (AQE broadcasts while it is small); day arithmetic is
    // integer nano div (exact)
    "q_retention" -> ((s, dir) => {
      val ev = tbl(s, dir, "events")
        .select(col("user_id"), expr("ts div 86400000000000").as("day"))
      val first = ev.groupBy("user_id").agg(min("day").as("cohort_day"))
      ev.join(first, "user_id")
        .groupBy(col("cohort_day"), (col("day") - col("cohort_day")).as("day_offset"))
        .agg(countDistinct("user_id").as("n_users"))
    }),

    // time-series resample: per-user daily grid (sequence + explode fills
    // gaps) left-joined with the daily aggregate, zero-filled. The grid is
    // generated distributed (one row per user expands in place — no
    // driver-side loop), both sides share the user_id hash partitioning
    "q_resample" -> ((s, dir) => {
      val ev = tbl(s, dir, "events").select(col("user_id"),
        expr("ts div 86400000000000").as("day"), col("value"))
      val daily = ev.groupBy("user_id", "day").agg(count(lit(1)).as("n"),
        sum(cents(col("value"))).as("value_cents"))
      val grid = ev.groupBy("user_id").agg(min("day").as("d0"), max("day").as("d1"))
        .select(col("user_id"), explode(expr("sequence(d0, d1)")).as("day"))
      grid.join(daily, Seq("user_id", "day"), "left")
        .select(col("user_id"), col("day"),
          coalesce(col("n"), lit(0L)).as("n"),
          coalesce(col("value_cents"), lit(0L)).as("value_cents"))
    }),

    // window-function breadth: lag/lead/ntile/running sum over one shared
    // per-user ordering (a single exchange serves all four). The ordering
    // key (ts, event_id) is unique, so every output is deterministic
    "q_window_funcs" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val wRun = w.rowsBetween(
        org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
      tbl(s, dir, "events")
        .withColumn("cents", cents(col("value")))
        .select(col("user_id"), col("event_id"),
          coalesce(lag(col("cents"), 1).over(w), lit(-1L)).as("prev_cents"),
          coalesce(lead(col("cents"), 1).over(w), lit(-1L)).as("next_cents"),
          ntile(4).over(w).cast("long").as("quartile"),
          sum(col("cents")).over(wRun).as("run_cents"))
    }),

    // left anti join (NOT EXISTS): customers with no large order
    "q_anti_join" -> ((s, dir) => {
      val cust = tbl(s, dir, "customer")
      val big = tbl(s, dir, "orders").filter(col("o_totalprice") > 400000)
      cust.join(big, cust("c_custkey") === big("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
    }),

    // LOCF gap fill: the q_resample daily grid, but missing days carry
    // the last observed daily total forward (last(ignoreNulls) over the
    // same per-user ordering; days before the first observation stay -1).
    // One extra window over the grid — same single user-keyed exchange
    "q_locf" -> ((s, dir) => {
      val ev = tbl(s, dir, "events").select(col("user_id"),
        expr("ts div 86400000000000").as("day"), col("value"))
      val daily = ev.groupBy("user_id", "day")
        .agg(sum(cents(col("value"))).as("value_cents"))
      val grid = ev.groupBy("user_id").agg(min("day").as("d0"), max("day").as("d1"))
        .select(col("user_id"), explode(expr("sequence(d0, d1)")).as("day"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("day"))
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.currentRow)
      grid.join(daily, Seq("user_id", "day"), "left")
        .withColumn("filled_cents",
          coalesce(last(col("value_cents"), ignoreNulls = true).over(w), lit(-1L)))
        .select(col("user_id"), col("day"), col("filled_cents"))
    }),

    // first/last/nth value window breadth over one per-user ordering:
    // each user's first and latest event and the step count between them
    "q_first_last" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.unboundedFollowing)
      tbl(s, dir, "events")
        .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
        .withColumn("first_type", first(col("event_type")).over(w))
        .withColumn("last_type", last(col("event_type")).over(w))
        .withColumn("n_events", count(lit(1)).over(w))
        .groupBy("user_id", "first_type", "last_type", "n_events").agg(count(lit(1)).as("__x"))
        .select(col("user_id"), col("first_type"), col("last_type"), col("n_events"))
    }),

    // arg-max per group with a DETERMINISTIC tie rule: the top event per
    // type by (cents desc, event_id desc) via a rank window — the same
    // explicit ordering in both engines, where native max_by/arg_max
    // leave ties unspecified
    "q_argmax" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("event_type"))
        .orderBy(col("cents").desc, col("event_id").desc)
      tbl(s, dir, "events")
        .withColumn("cents", cents(col("value")))
        .withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1)
        .select(col("event_type"), col("event_id"), col("cents"))
    }),

    // trailing 7-day moving aggregate: RANGE frame over the integer day
    // key (not ROWS — gap days must still look back 7 calendar days).
    // Integer cent sums; day cardinality bounds the per-user window state
    "q_moving_sum" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("day"))
        .rangeBetween(-6, org.apache.spark.sql.expressions.Window.currentRow)
      tbl(s, dir, "events")
        .select(col("user_id"), expr("ts div 86400000000000").as("day"),
          cents(col("value")).as("__c"))
        .groupBy("user_id", "day").agg(sum(col("__c")).as("day_cents"))
        .withColumn("trail7_cents", sum(col("day_cents")).over(w))
        .withColumn("trail7_days", count(lit(1)).over(w))
    }),

    // z-score anomaly detection in EXACT integers: |x - mean| > 3 sigma
    // rewritten as (n*x - S)^2 > 9*(n*Q - S^2) with S = sum(cents),
    // Q = sum(cents^2) — no float mean/stddev anywhere, so no unordered
    // float aggregation can flip a boundary event. Per-type stats are 5
    // rows (AQE broadcasts); one scan + one tiny agg
    "q_anomaly" -> ((s, dir) => {
      val ev = tbl(s, dir, "events")
        .select(col("event_id"), col("event_type"), cents(col("value")).as("__c"))
      val stats = ev.groupBy("event_type").agg(
        sum(col("__c")).as("__S"),
        sum(col("__c") * col("__c")).as("__Q"),
        count(lit(1)).as("__n"))
      // the squared terms leave the long range around sf1 (n ~ 2e5 makes
      // n*Q ~ 2e18 and dev^2 up to ~4e18): DECIMAL(38,0) / HUGEINT keeps
      // both engines exact instead of Spark silently wrapping (t33's
      // pattern). The un-squared building blocks stay comfortably in long.
      val dev = (col("__n") * col("__c") - col("__S")).cast("decimal(38,0)")
      val nQ = col("__n").cast("decimal(38,0)") * col("__Q")
      val s2 = col("__S").cast("decimal(38,0)") * col("__S")
      ev.join(stats, "event_type")
        .filter(dev * dev > lit(9).cast("decimal(38,0)") * (nQ - s2))
        .select(col("event_type"), col("event_id"))
    }),

    // growth curve: users by first-activity HOUR, cumulative over the
    // calendar. The running sum's window carries hour-cardinality rows
    // (~hundreds), not events — safe single partition at any event volume
    "q_growth" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window.orderBy(col("hour"))
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.currentRow)
      tbl(s, dir, "events")
        .select(col("user_id"), expr("ts div 3600000000000").as("hour"))
        .groupBy("user_id").agg(min("hour").as("hour"))
        .groupBy("hour").agg(count(lit(1)).as("new_users"))
        .withColumn("cum_users", sum(col("new_users")).over(w))
    }),

    // correlated scalar subquery (orders above their customer's average),
    // decided in EXACT integer arithmetic: cents * n > sum_cents avoids
    // the unordered-float-average boundary class entirely
    "q_scalar_subquery" -> ((s, dir) => {
      val o = tbl(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderkey"), cents(col("o_totalprice")).as("__c"))
      val per = o.groupBy("o_custkey")
        .agg(sum(col("__c")).as("__s"), count(lit(1)).as("__n"))
      o.join(per, "o_custkey")
        .filter(col("__c") * col("__n") > col("__s"))
        .groupBy("o_custkey").agg(count(lit(1)).as("n_above"))
    }),

    // array aggregation: per-status sorted key prefix (collect_list is
    // order-free once sorted, so the array value is deterministic)
    // the array is emitted as a canonical comma-joined STRING: the
    // driver's pandas comparator cannot sort/hash a list-valued column
    // (lexsort on object arrays crashes), and the string form is
    // hash-identical across engines
    "q_array_agg" -> ((s, dir) =>
      tbl(s, dir, "orders").groupBy("o_orderstatus")
        .agg(concat_ws(",",
            slice(sort_array(collect_list(col("o_orderkey"))), 1, 3).cast("array<string>"))
          .as("first_keys"),
          count(lit(1)).as("n"))),

    // unpivot: wide per-source language counts melted back to rows
    // (the wide shape comes from the same FILTER-style counts q_pivot
    // checks; unpivot is the inverse reshape)
    "q_unpivot" -> ((s, dir) => {
      val wide = tbl(s, dir, "documents").groupBy(col("source"))
        .agg(count(when(col("lang") === "en", 1)).as("en"),
          count(when(col("lang") === "fr", 1)).as("fr"),
          count(when(col("lang") === "zh", 1)).as("zh"))
      wide.unpivot(Array(col("source")), Array(col("en"), col("fr"), col("zh")),
        "lang", "n_docs")
    }),

    // grouping sets: the two single-column rollups plus the grand total
    // in one pass (SQL form — the DataFrame API has rollup/cube only)
    "q_grouping_sets" -> ((s, dir) => {
      tbl(s, dir, "lineitem").createOrReplaceTempView("__li_gs")
      s.sql(
        """SELECT coalesce(l_returnflag, 'ALL') AS rf,
          |  coalesce(l_linestatus, 'ALL') AS ls,
          |  count(1) AS n, sum(cast(l_quantity as bigint)) AS sum_qty
          |FROM __li_gs
          |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())""".stripMargin)
    }),

    // op 20: deterministic LPT task split (planning math; rows-only check)
    "q20_task_split" -> ((s, dir) => {
      import s.implicits._
      val items = (0 until 64).map(i => (s"file_$i", ((i * 2654435761L) % 1000L) + 1L))
      val groups = ScanTaskSplit.splitNVecs(items, 8)(_._2)
      groups.zipWithIndex.flatMap { case (g, gi) =>
        g.map { case (f, w) => (f, w, gi) }
      }.toDF("file", "weight", "group_id").orderBy("file")
    }),

    // op 27: FFD bin packing (planning math; rows-only check)
    "q27_binpack" -> ((s, dir) => {
      import s.implicits._
      val items = (0 until 100).map(i => (s"f$i", ((i * 48271L) % 512L) + 1L))
      val bins = new ListPacker(1024L).pack(items)(_._2)
      bins.zipWithIndex.flatMap { case (bin, bi) =>
        bin.map { case (f, w) => (f, w, bi) }
      }.toDF("file", "weight", "bin_id").orderBy("file")
    }),

    // cost-optimized policy selection (CostBudget) replayed relationally:
    // 24 synthetic groups with deterministic file/delete counts and sizes,
    // greedily admitted by benefit-per-byte under a 20 MB rewrite budget —
    // greedy-WITH-SKIP (an overflowing group is skipped, later smaller
    // ones may still fit), the same recursive-CTE replay style as q27's
    // FFD. Output = the kept groups in planning order.
    "q_cost_budget" -> ((s, dir) => {
      import s.implicits._
      val fgs = (0 until 24).map { i =>
        val files = (i % 4) + 1
        val deletes = (i * 7) % 5
        val bytes = (((i * 48271L) % 997L) + 3L) * 12000L // divisible by 1..4
        val per = bytes / files
        graft.selection.FileGroup(
          dataFiles = (0 until files).map(k => graft.meta.FileEntry(
            path = f"/g$i%02d/f$k", length = per,
            content = graft.meta.FileContent.Data, recordCount = 1, sequenceNumber = 1)),
          positionDeleteFiles = (0 until deletes).map(k => graft.meta.FileEntry(
            path = f"/g$i%02d/d$k", length = 10L,
            content = graft.meta.FileContent.PositionDeletes, recordCount = 1, sequenceNumber = 1)),
          equalityDeleteFiles = Nil)
      }
      graft.selection.CostBudget(maxRewriteBytes = 20000000L).filterGroups(fgs)
        .map { g =>
          val id = g.dataFiles.head.path.substring(2, 4).toInt
          (id, g.dataFileCount, g.positionDeleteFiles.size, g.totalSize)
        }.toDF("group_id", "files", "deletes", "total_bytes").orderBy("group_id")
    }),

    // op 30: parallelism calculator outputs (planning math; rows-only)
    "q30_parallelism" -> ((s, dir) => {
      import s.implicits._
      val GB = 1024L * 1024 * 1024
      val cases = Seq(512L * 1024 * 1024, 2 * GB + 200 * 1024 * 1024, 10 * GB, 100 * GB)
      cases.map { in =>
        val t = GB
        val exp = FileGroup.expectedOutputFiles(in, t, FileGroup.minFileSize(t), FileGroup.maxFileSize(t))
        val split = FileGroup.inputSplitSize(in, t, FileGroup.minFileSize(t), FileGroup.maxFileSize(t))
        (in, exp, split)
      }.toDF("input_bytes", "expected_output_files", "input_split_size")
    })
  )

  // ------------------------------------------------------------- oracles --

  val oracles: Map[String, String] = Map(
    "q10_projection" ->
      """SELECT l_orderkey, l_linenumber, CAST(l_quantity AS BIGINT) AS qty, l_returnflag
        |FROM lineitem WHERE l_quantity > 45""".stripMargin,

    "q14_pos_anti_join" ->
      s"""WITH data AS ($liHiddenSql),
         |dels AS (SELECT file_path, pos FROM data WHERE l_partkey % 13 = 0)
         |SELECT l_orderkey, l_linenumber FROM data d
         |WHERE NOT EXISTS (SELECT 1 FROM dels e
         |  WHERE e.file_path = d.file_path AND e.pos = d.pos)""".stripMargin,

    "q15_eq_anti_join_seq" ->
      """WITH data AS (SELECT o_orderkey, o_custkey, o_orderkey % 5 AS seq FROM orders),
        |dels AS (SELECT o_custkey AS k, o_orderkey % 7 AS dseq FROM orders WHERE o_orderkey % 11 = 0)
        |SELECT o_orderkey FROM data d
        |WHERE NOT EXISTS (SELECT 1 FROM dels e WHERE e.k = d.o_custkey AND d.seq < e.dseq)""".stripMargin,

    "q16_chained_deletes" ->
      s"""WITH data AS ($liHiddenSql),
         |pos AS (SELECT file_path, pos FROM data WHERE l_partkey % 13 = 0),
         |eq1 AS (SELECT l_partkey AS k, l_orderkey % 12 AS dseq FROM data WHERE l_orderkey % 97 = 0),
         |eq2 AS (SELECT l_suppkey AS k1, l_partkey AS k2, l_orderkey % 11 AS dseq FROM data WHERE l_orderkey % 53 = 0)
         |SELECT l_orderkey, l_linenumber FROM data d
         |WHERE NOT EXISTS (SELECT 1 FROM pos p WHERE p.file_path = d.file_path AND p.pos = d.pos)
         |  AND NOT EXISTS (SELECT 1 FROM eq1 e WHERE e.k = d.l_partkey AND d.seq < e.dseq)
         |  AND NOT EXISTS (SELECT 1 FROM eq2 e WHERE e.k1 = d.l_suppkey AND e.k2 = d.l_partkey AND d.seq < e.dseq)""".stripMargin,

    "q17_repartition_rows" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
        |  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_price_cents
        |FROM lineitem""".stripMargin,

    "q18_sort_within_partitions" ->
      """SELECT l_orderkey, l_linenumber, CAST(l_quantity AS BIGINT) AS qty FROM lineitem""".stripMargin,

    "q40_mor_rowcount" ->
      s"""WITH data AS ($liHiddenSql),
         |dels AS (SELECT file_path, pos FROM data WHERE l_partkey % 13 = 0)
         |SELECT CAST(count(*) AS BIGINT) AS n_rows FROM data d
         |WHERE NOT EXISTS (SELECT 1 FROM dels e
         |  WHERE e.file_path = d.file_path AND e.pos = d.pos)""".stripMargin,

    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
        |  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_base_cents,
        |  CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) AS BIGINT) AS sum_disc_e4,
        |  round(avg(l_quantity), 4) AS avg_qty,
        |  CAST(count(*) AS BIGINT) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin,

    "q3_join_agg" ->
      """SELECT l_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
        |  CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) AS BIGINT) AS revenue_e4
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-07-01'
        |  AND l_shipdate > TIMESTAMP '1998-03-01'
        |GROUP BY l_orderkey, orderdate""".stripMargin,

    "q5_star_join" ->
      """SELECT n_name,
        |  CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) AS BIGINT) AS revenue_e4
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA' AND o_orderdate < TIMESTAMP '1999-01-01'
        |GROUP BY n_name""".stripMargin,

    "q_window_topk" ->
      """SELECT user_id, event_id, rn FROM (
        |  SELECT user_id, event_id,
        |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        |  FROM events) t WHERE rn <= 3""".stripMargin,

    "q_stream_window" ->
      """SELECT CAST(epoch_ns(ts) // 300000000000 AS BIGINT) AS bucket, event_type,
        |  CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CAST(round(value * 10000) AS BIGINT)) AS BIGINT) AS value_e4
        |FROM events GROUP BY 1, 2""".stripMargin,

    "q_json_agg" ->
      """SELECT event_type,
        |  CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        |  CAST(count(*) AS BIGINT) AS n
        |FROM events GROUP BY 1""".stripMargin,

    "q_asof_join" ->
      """WITH clicks AS (
        |  SELECT user_id, ts, event_id FROM events WHERE event_type = 'click'),
        |purchases AS (
        |  SELECT user_id, ts, value FROM events WHERE event_type = 'purchase')
        |SELECT c.user_id, c.event_id,
        |  round(coalesce(p.value, -1.0), 4) AS last_purchase
        |FROM clicks c
        |ASOF LEFT JOIN purchases p ON c.user_id = p.user_id AND c.ts >= p.ts""".stripMargin,

    "q_percentile" ->
      """SELECT l_returnflag,
        |  round(quantile_cont(l_quantity, 0.5), 4) AS p50,
        |  round(quantile_cont(l_quantity, 0.9), 4) AS p90,
        |  round(quantile_cont(l_extendedprice, 0.25), 4) AS price_p25
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,

    "q_string_funcs" ->
      """SELECT p_partkey,
        |  upper(substr(p_name, 1, 8)) AS name8,
        |  p_brand || '#' || p_type AS brand_type,
        |  CAST(len(p_name) AS BIGINT) AS name_len
        |FROM part
        |WHERE p_type LIKE '%ECO%' OR p_name LIKE '%bolt%'""".stripMargin,

    "q_rollup" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS rf, coalesce(l_linestatus, 'ALL') AS ls,
        |  CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)""".stripMargin,

    "q_pivot" ->
      """SELECT source,
        |  CAST(count(*) FILTER (WHERE lang = 'en') AS BIGINT) AS en,
        |  CAST(count(*) FILTER (WHERE lang = 'fr') AS BIGINT) AS fr,
        |  CAST(count(*) FILTER (WHERE lang = 'es') AS BIGINT) AS es,
        |  CAST(count(*) FILTER (WHERE lang = 'de') AS BIGINT) AS de,
        |  CAST(count(*) FILTER (WHERE lang = 'zh') AS BIGINT) AS zh
        |FROM documents GROUP BY source""".stripMargin,

    "q_cube" ->
      """SELECT coalesce(source, 'ALL') AS src, coalesce(lang, 'ALL') AS lng,
        |  CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS total_chars
        |FROM documents GROUP BY CUBE (source, lang)""".stripMargin,

    "q_sessionize" ->
      """WITH o AS (SELECT user_id, ts, event_id,
        |  epoch_us(ts) - lag(epoch_us(ts)) OVER
        |    (PARTITION BY user_id ORDER BY ts, event_id) AS gap
        |FROM events),
        |s AS (SELECT user_id, ts,
        |  sum(CASE WHEN gap IS NULL OR gap > 1800000000 THEN 1 ELSE 0 END)
        |    OVER (PARTITION BY user_id ORDER BY ts, event_id
        |          ROWS UNBOUNDED PRECEDING) AS sid
        |FROM o)
        |SELECT user_id, CAST(sid AS BIGINT) AS session_idx,
        |  CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(min(epoch_us(ts)) AS BIGINT) AS start_us,
        |  CAST(max(epoch_us(ts)) AS BIGINT) AS end_us
        |FROM s GROUP BY 1, 2""".stripMargin,

    "q_date_trunc" ->
      """SELECT strftime(ts, '%Y-%m-%d') AS day, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
        |FROM events GROUP BY 1""".stripMargin,

    "q_setops" ->
      """WITH a AS (SELECT o_custkey FROM orders WHERE o_totalprice > 150000),
        |b AS (SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')
        |SELECT o_custkey, 'both' AS src FROM (SELECT o_custkey FROM a INTERSECT SELECT o_custkey FROM b)
        |UNION ALL
        |SELECT o_custkey, 'high_only' AS src FROM (SELECT o_custkey FROM a EXCEPT SELECT o_custkey FROM b)""".stripMargin,

    "q6_filter_agg" ->
      """SELECT
        |  CAST(sum(CAST(round(l_extendedprice * l_discount * 10000) AS BIGINT)) AS BIGINT) AS revenue_e4,
        |  CAST(count(*) AS BIGINT) AS n
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
        |  AND l_discount >= 0.03 AND l_discount <= 0.07 AND l_quantity < 24""".stripMargin,

    "q_outer_join" ->
      """SELECT n_name, CAST(count(c_custkey) AS BIGINT) AS n_cust
        |FROM nation LEFT JOIN customer ON n_nationkey = c_nationkey
        |GROUP BY n_name""".stripMargin,

    "q_semi_join" ->
      """SELECT c_custkey FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o
        |  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 200000)""".stripMargin,

    "q_distinct_agg" ->
      """SELECT o_orderstatus,
        |  CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_cust,
        |  CAST(count(*) AS BIGINT) AS n_orders
        |FROM orders GROUP BY o_orderstatus""".stripMargin,

    "q_funnel" ->
      """WITH v AS (SELECT user_id, min(epoch_ns(ts)) AS t1 FROM events
        |  WHERE event_type = 'view' GROUP BY 1),
        |c AS (SELECT e.user_id, min(epoch_ns(e.ts)) AS t2 FROM events e
        |  JOIN v ON e.user_id = v.user_id
        |  WHERE e.event_type = 'click' AND epoch_ns(e.ts) >= v.t1 GROUP BY 1),
        |p AS (SELECT e.user_id, min(epoch_ns(e.ts)) AS t3 FROM events e
        |  JOIN c ON e.user_id = c.user_id
        |  WHERE e.event_type = 'purchase' AND epoch_ns(e.ts) >= c.t2 GROUP BY 1)
        |SELECT '1_view' AS stage, CAST(count(*) AS BIGINT) AS n_users FROM v
        |UNION ALL SELECT '2_click', CAST(count(*) AS BIGINT) FROM c
        |UNION ALL SELECT '3_purchase', CAST(count(*) AS BIGINT) FROM p""".stripMargin,

    "q_retention" ->
      """WITH e AS (SELECT user_id, epoch_ns(ts) // 86400000000000 AS day FROM events),
        |f AS (SELECT user_id, min(day) AS cohort_day FROM e GROUP BY 1)
        |SELECT CAST(f.cohort_day AS BIGINT) AS cohort_day,
        |  CAST(e.day - f.cohort_day AS BIGINT) AS day_offset,
        |  CAST(count(DISTINCT e.user_id) AS BIGINT) AS n_users
        |FROM e JOIN f ON e.user_id = f.user_id GROUP BY 1, 2""".stripMargin,

    "q_resample" ->
      """WITH e AS (SELECT user_id, epoch_ns(ts) // 86400000000000 AS day, value FROM events),
        |daily AS (SELECT user_id, day, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
        |  FROM e GROUP BY 1, 2),
        |span AS (SELECT user_id, min(day) AS d0, max(day) AS d1 FROM e GROUP BY 1),
        |grid AS (SELECT user_id, CAST(unnest(range(d0, d1 + 1)) AS BIGINT) AS day FROM span)
        |SELECT g.user_id, g.day,
        |  coalesce(d.n, 0) AS n, coalesce(d.value_cents, 0) AS value_cents
        |FROM grid g LEFT JOIN daily d ON g.user_id = d.user_id AND g.day = d.day""".stripMargin,

    "q_window_funcs" ->
      """WITH e AS (SELECT user_id, event_id, ts,
        |  CAST(round(value * 100) AS BIGINT) AS cents FROM events)
        |SELECT user_id, event_id,
        |  coalesce(lag(cents, 1) OVER w, -1) AS prev_cents,
        |  coalesce(lead(cents, 1) OVER w, -1) AS next_cents,
        |  CAST(ntile(4) OVER w AS BIGINT) AS quartile,
        |  CAST(sum(cents) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS run_cents
        |FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)""".stripMargin,

    "q_anti_join" ->
      """SELECT c_custkey, c_name FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o
        |  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)""".stripMargin,

    "q_first_last" ->
      """SELECT DISTINCT user_id,
        |  first_value(event_type) OVER w AS first_type,
        |  last_value(event_type) OVER w AS last_type,
        |  CAST(count(*) OVER w AS BIGINT) AS n_events
        |FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)""".stripMargin,

    "q_argmax" ->
      """WITH e AS (SELECT event_type, event_id,
        |  CAST(round(value * 100) AS BIGINT) AS cents FROM events)
        |SELECT event_type, event_id, cents FROM (
        |  SELECT event_type, event_id, cents,
        |    row_number() OVER (PARTITION BY event_type
        |      ORDER BY cents DESC, event_id DESC) AS rn
        |  FROM e) t WHERE rn = 1""".stripMargin,

    "q_moving_sum" ->
      """WITH d AS (SELECT user_id, epoch_ns(ts) // 86400000000000 AS day,
        |  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS day_cents
        |FROM events GROUP BY 1, 2)
        |SELECT CAST(user_id AS BIGINT) AS user_id, CAST(day AS BIGINT) AS day,
        |  day_cents,
        |  CAST(sum(day_cents) OVER w AS BIGINT) AS trail7_cents,
        |  CAST(count(*) OVER w AS BIGINT) AS trail7_days
        |FROM d WINDOW w AS (PARTITION BY user_id ORDER BY day
        |  RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)""".stripMargin,

    "q_anomaly" ->
      """WITH e AS (SELECT event_id, event_type,
        |  CAST(round(value * 100) AS BIGINT) AS c FROM events),
        |st AS (SELECT event_type, CAST(sum(c) AS BIGINT) AS s,
        |  CAST(sum(c * c) AS BIGINT) AS q, CAST(count(*) AS BIGINT) AS n
        |  FROM e GROUP BY 1)
        |SELECT e.event_type, e.event_id
        |FROM e JOIN st ON e.event_type = st.event_type
        |WHERE CAST(st.n * e.c - st.s AS HUGEINT) * (st.n * e.c - st.s) >
        |      9 * (CAST(st.n AS HUGEINT) * st.q - CAST(st.s AS HUGEINT) * st.s)""".stripMargin,

    "q_growth" ->
      """WITH f AS (SELECT user_id, min(epoch_ns(ts) // 3600000000000) AS hour
        |  FROM events GROUP BY 1),
        |d AS (SELECT hour, CAST(count(*) AS BIGINT) AS new_users FROM f GROUP BY 1)
        |SELECT CAST(hour AS BIGINT) AS hour, new_users,
        |  CAST(sum(new_users) OVER (ORDER BY hour ROWS UNBOUNDED PRECEDING) AS BIGINT)
        |    AS cum_users
        |FROM d""".stripMargin,

    "q_session_window" ->
      """WITH o AS (SELECT user_id, epoch_us(ts) AS us, event_id,
        |  epoch_us(ts) - lag(epoch_us(ts)) OVER
        |    (PARTITION BY user_id ORDER BY ts, event_id) AS gap
        |FROM events),
        |s AS (SELECT user_id, us,
        |  sum(CASE WHEN gap IS NULL OR gap > 1800000000 THEN 1 ELSE 0 END)
        |    OVER (PARTITION BY user_id ORDER BY us, event_id
        |          ROWS UNBOUNDED PRECEDING) AS sid
        |FROM o)
        |SELECT user_id,
        |  CAST(min(us) AS BIGINT) AS start_us,
        |  CAST(max(us) + 1800000000 AS BIGINT) AS end_us,
        |  CAST(count(*) AS BIGINT) AS n_events
        |FROM s GROUP BY user_id, sid""".stripMargin,

    "q_locf" ->
      """WITH e AS (SELECT user_id, epoch_ns(ts) // 86400000000000 AS day, value FROM events),
        |daily AS (SELECT user_id, day,
        |  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
        |  FROM e GROUP BY 1, 2),
        |span AS (SELECT user_id, min(day) AS d0, max(day) AS d1 FROM e GROUP BY 1),
        |grid AS (SELECT user_id, CAST(unnest(range(d0, d1 + 1)) AS BIGINT) AS day FROM span)
        |SELECT g.user_id, g.day,
        |  coalesce(last_value(d.value_cents IGNORE NULLS) OVER (
        |    PARTITION BY g.user_id ORDER BY g.day ROWS UNBOUNDED PRECEDING), -1)
        |    AS filled_cents
        |FROM grid g LEFT JOIN daily d ON g.user_id = d.user_id AND g.day = d.day""".stripMargin,

    "q_scalar_subquery" ->
      """WITH o AS (SELECT o_custkey, o_orderkey,
        |  CAST(round(o_totalprice * 100) AS BIGINT) AS c FROM orders),
        |per AS (SELECT o_custkey, CAST(sum(c) AS BIGINT) AS s,
        |  CAST(count(*) AS BIGINT) AS n FROM o GROUP BY 1)
        |SELECT o.o_custkey, CAST(count(*) AS BIGINT) AS n_above
        |FROM o JOIN per ON o.o_custkey = per.o_custkey
        |WHERE o.c * per.n > per.s GROUP BY 1""".stripMargin,

    "q_array_agg" ->
      """SELECT o_orderstatus,
        |  array_to_string(list_sort(list(o_orderkey))[1:3], ',') AS first_keys,
        |  CAST(count(*) AS BIGINT) AS n
        |FROM orders GROUP BY o_orderstatus""".stripMargin,

    "q_unpivot" ->
      """WITH wide AS (SELECT source,
        |  CAST(count(*) FILTER (WHERE lang = 'en') AS BIGINT) AS en,
        |  CAST(count(*) FILTER (WHERE lang = 'fr') AS BIGINT) AS fr,
        |  CAST(count(*) FILTER (WHERE lang = 'zh') AS BIGINT) AS zh
        |FROM documents GROUP BY source)
        |SELECT source, 'en' AS lang, en AS n_docs FROM wide
        |UNION ALL SELECT source, 'fr', fr FROM wide
        |UNION ALL SELECT source, 'zh', zh FROM wide""".stripMargin,

    "q_grouping_sets" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS rf,
        |  coalesce(l_linestatus, 'ALL') AS ls,
        |  CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())""".stripMargin,
    // q20/q27/q30 are driver-side planning math, but every one of them is
    // a deterministic integer fold — so the oracles REPLAY the algorithms
    // relationally: LPT as a recursive CTE carrying the 8 group weights
    // as a list (min-weight, lowest-index tie rule = list_position of
    // list_min), FFD lookback=1 as a recursive running fold (current bin
    // fill is the whole state), and the Iceberg parallelism formulas as
    // straight integer arithmetic. Full hash-match coverage, no
    // rows-only rows left.
    "q20_task_split" ->
      """WITH RECURSIVE items AS (
        |  SELECT i, 'file_' || CAST(i AS VARCHAR) AS file,
        |    ((i*2654435761) % 1000) + 1 AS w,
        |    row_number() OVER (ORDER BY ((i*2654435761) % 1000) + 1 DESC, i ASC) AS seq
        |  FROM range(0, 64) t(i)),
        |fold AS (
        |  SELECT 0::BIGINT AS seq, CAST(NULL AS VARCHAR) AS file,
        |    CAST(NULL AS BIGINT) AS w, CAST(NULL AS INT) AS group_id,
        |    [0,0,0,0,0,0,0,0]::BIGINT[] AS gw
        |  UNION ALL
        |  SELECT it.seq, it.file, it.w,
        |    CAST(list_position(f.gw, list_min(f.gw)) - 1 AS INT) AS group_id,
        |    list_transform(range(1, 9), j ->
        |      CASE WHEN j = list_position(f.gw, list_min(f.gw)) THEN f.gw[j] + it.w
        |           ELSE f.gw[j] END)
        |  FROM fold f JOIN items it ON it.seq = f.seq + 1)
        |SELECT file, CAST(w AS BIGINT) AS weight, group_id
        |FROM fold WHERE seq > 0 ORDER BY file""".stripMargin,

    "q27_binpack" ->
      """WITH RECURSIVE items AS (
        |  SELECT i, 'f' || CAST(i AS VARCHAR) AS file, ((i*48271) % 512) + 1 AS w,
        |    row_number() OVER (ORDER BY ((i*48271) % 512) + 1 DESC, i ASC) AS seq
        |  FROM range(0, 100) t(i)),
        |fold AS (
        |  SELECT seq, file, w, 0 AS bin_id, w AS fill FROM items WHERE seq = 1
        |  UNION ALL
        |  SELECT it.seq, it.file, it.w,
        |    CASE WHEN f.fill + it.w <= 1024 THEN f.bin_id ELSE f.bin_id + 1 END,
        |    CASE WHEN f.fill + it.w <= 1024 THEN f.fill + it.w ELSE it.w END
        |  FROM fold f JOIN items it ON it.seq = f.seq + 1)
        |SELECT file, CAST(w AS BIGINT) AS weight, CAST(bin_id AS INT) AS bin_id
        |FROM fold ORDER BY file""".stripMargin,

    "q_cost_budget" ->
      """WITH RECURSIVE g AS (
        |  SELECT i, (i % 4) + 1 AS files, (i * 7) % 5 AS deletes,
        |    (((i*48271) % 997) + 3) * 12000 AS total,
        |    '/g' || CASE WHEN i < 10 THEN '0' ELSE '' END || CAST(i AS VARCHAR) || '/f0' AS path
        |  FROM range(0, 24) t(i)),
        |ranked AS (
        |  SELECT *, row_number() OVER (
        |    ORDER BY (deletes * 4.0 + (files - 1) * 1.0) / total DESC,
        |             total ASC, path ASC) AS seq
        |  FROM g WHERE deletes * 4.0 + (files - 1) * 1.0 > 0),
        |fold AS (
        |  SELECT seq, i, files, deletes, total,
        |    CASE WHEN total <= 20000000 THEN total ELSE 0 END AS spent,
        |    total <= 20000000 AS kept
        |  FROM ranked WHERE seq = 1
        |  UNION ALL
        |  SELECT r.seq, r.i, r.files, r.deletes, r.total,
        |    CASE WHEN f.spent + r.total <= 20000000 THEN f.spent + r.total ELSE f.spent END,
        |    f.spent + r.total <= 20000000
        |  FROM fold f JOIN ranked r ON r.seq = f.seq + 1)
        |SELECT CAST(i AS INT) AS group_id, CAST(files AS INT) AS files,
        |  CAST(deletes AS INT) AS deletes, CAST(total AS BIGINT) AS total_bytes
        |FROM fold WHERE kept ORDER BY group_id""".stripMargin,

    "q30_parallelism" ->
      """WITH cases(input_bytes) AS (VALUES (536870912::BIGINT), (2357198848::BIGINT),
        |  (10737418240::BIGINT), (107374182400::BIGINT)),
        |c AS (SELECT input_bytes, 1073741824::BIGINT AS t FROM cases),
        |e AS (SELECT input_bytes, t, t*3//4 AS mn,
        |  t + greatest(0, t*9//5 - t)//2 AS writemax FROM c),
        |f AS (SELECT *,
        |  CASE WHEN input_bytes < t THEN 1
        |       WHEN (input_bytes % t) > mn THEN (input_bytes + t - 1) // t
        |       WHEN (input_bytes // (input_bytes // t)) <= least(t + t//10, writemax)
        |         THEN input_bytes // t
        |       ELSE (input_bytes + t - 1) // t END AS exp FROM e)
        |SELECT input_bytes, CAST(exp AS INT) AS expected_output_files,
        |  CAST(CASE WHEN (input_bytes // greatest(1, exp) + 5242880) < t THEN t
        |            ELSE least(input_bytes // greatest(1, exp) + 5242880, writemax)
        |       END AS BIGINT) AS input_split_size
        |FROM f ORDER BY input_bytes""".stripMargin
  )
}
