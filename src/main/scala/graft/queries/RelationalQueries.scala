package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Relational queries over the TPC-H-ish tables (SURVEY.md §2.7: set ops,
 * windows, date math, joins come from Catalyst built-ins — these entries
 * demonstrate that side of the engine plus the plans the bench exercises:
 * partial aggregation, broadcast-join stars, window top-n).
 */
object RelationalQueries {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    graft.sources.TableResolver.parquet(spark, s"$dir/$name.parquet")

  /** The events table's `ts` physical type has changed across test-data
    * generations: TIMESTAMP(NANOS) (no native Spark type — read as long via
    * the legacy conf) and TIMESTAMP(MICROS) (read as TIMESTAMP_NTZ under
    * parquet NTZ inference). Normalize both to one session-local TIMESTAMP
    * column; sessions run UTC, so the instant agrees with DuckDB's naive
    * reading of the same file. */
  private def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = t(spark, dir, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        // integral div: 2026-epoch nanos need 61 bits, beyond double's
        // 53-bit mantissa — float division can land one µs low
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _ => raw.withColumn("ts", col("ts").cast("timestamp"))
    }
  }

  /** Epoch-millisecond view of `ts`, tolerant of the same two generations.
    * Integral arithmetic only: nanos exceed double's 53-bit mantissa, so
    * float division could land one ms off on boundary values. */
  private def eventsMs(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = t(spark, dir, "events")
    val tsMs = raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => expr("ts div 1000000")
      case _ => expr("unix_micros(cast(ts as timestamp)) div 1000")
    }
    raw.withColumn("ts_ms", tsMs)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // TPC-H Q1 shape: map-side partial agg, one shuffle on the group keys
    "q1_agg" -> ((s, d) =>
      t(s, d, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          round(sum(col("l_quantity")), 4).as("sum_qty"),
          round(sum(col("l_extendedprice")), 4).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4).as("sum_disc_price"),
          round(avg(col("l_discount")), 6).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))),

    // star join: dims broadcast, single shuffle for the final group-by
    "join_region_revenue" -> ((s, d) => {
      val li = t(s, d, "lineitem")
      val o = t(s, d, "orders")
      val c = t(s, d, "customer")
      val n = t(s, d, "nation")
      val r = t(s, d, "region")
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy(col("r_name"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4).as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy(col("r_name"))
    }),

    // window top-n: per-user totals, top 10 by value
    "top_users_window" -> ((s, d) => {
      val agg = events(s, d)
        .groupBy(col("user_id"))
        .agg(round(sum(col("value")), 4).as("total_value"), count(lit(1)).as("n_events"))
      // global window is SAFE here: the rnk <= 10 filter is rank-like, so
      // InferWindowGroupLimit inserts a per-partition partial top-10 before
      // the single-partition sort — only ~10·nPartitions rows cross
      agg.withColumn("rnk",
        row_number().over(Window.orderBy(col("total_value").desc, col("user_id"))))
        .filter(col("rnk") <= 10)
        .select(col("user_id"), col("total_value"), col("n_events"), col("rnk"))
    }),

    // gap-based sessionization, batch form (the declarative twin of
    // streaming sessionize in graft.streaming): lag -> new-session flag ->
    // running session id -> per-session aggregate. Pure integer millisecond
    // math so the oracle compare is exact.
    "sessions_batch" -> ((s, d) => {
      val gapMs = 30L * 60 * 1000
      val ev = eventsMs(s, d).select(col("user_id"), col("ts_ms"), col("value"))
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts_ms"))
      ev.withColumn("new_sess",
          when(col("ts_ms") - lag(col("ts_ms"), 1).over(w) <= gapMs, 0).otherwise(1))
        .withColumn("sess_id", sum(col("new_sess")).over(
          w.rowsBetween(Window.unboundedPreceding, 0)))
        .groupBy(col("user_id"), col("sess_id"))
        .agg(min(col("ts_ms")).as("session_start"),
          max(col("ts_ms")).as("session_end"),
          count(lit(1)).as("n_events"),
          round(sum(col("value")), 4).as("sum_value"))
        .drop("sess_id")
        .orderBy(col("user_id"), col("session_start"))
    }),

    // The skew-proof salted join, verified by RESULT IDENTITY: revenue by
    // order priority through SkewJoin.saltedJoin(nSalts=8) must equal the
    // plain-join oracle byte-for-byte (each fact row carries exactly one
    // md5 salt; the dim side replicates 8x — the planned fix when one hot
    // key would otherwise pin a reducer; see SkewJoinSpec for the spread)
    "salted_join" -> ((s, d) => {
      val fact = t(s, d, "lineitem")
        .withColumn("__rid",
          concat_ws("#", col("l_orderkey"), col("l_linenumber")))
        .withColumnRenamed("l_orderkey", "okey")
      val dim = t(s, d, "orders")
        .select(col("o_orderkey").as("okey"), col("o_orderpriority"))
      graft.operators.SkewJoin.saltedJoin(fact, dim, "okey", "__rid", 8)
        .groupBy(col("o_orderpriority"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4)
          .as("revenue"),
          count(lit(1)).as("n_lines"))
        .orderBy(col("o_orderpriority"))
    }),

    // Z-order (Morton) layout key over (user_id, value) — the clustering
    // key an OPTIMIZE-style rewrite sorts 100 TB by so that file/row-group
    // min-max stats prune 2-D range predicates (Layout.zorderWrite /
    // prunedRead; locality + pruning asserted in LayoutSpec). Stats are one
    // broadcast row; the key itself is codegen'd bit arithmetic, replayed
    // bit-for-bit by the oracle.
    "zorder_key" -> ((s, d) =>
      graft.operators.Layout.zorderKey(
          events(s, d).select(col("event_id"), col("user_id"), col("value")),
          Seq("user_id", "value"), bits = 8)
        .select(col("event_id"), col("zkey"))
        .orderBy(col("zkey"), col("event_id"))
        .limit(200)),

    // time-bucketed streaming-style aggregation (batch form; the streaming
    // variant lives in graft.streaming)
    "events_hourly" -> ((s, d) =>
      events(s, d)
        .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 4).as("sum_value"))
        .orderBy(col("hour"), col("event_type"))),

    // hourly-volume anomaly detection: per event_type, z-score of each
    // hour's count against the type's own hourly distribution; mean/var
    // come from exact integer sums (Σn, Σn²), so the z arithmetic is
    // engine-replayable, and the per-type stats table is one broadcastable
    // row per type. Flags |z| >= 2 — the ops-monitoring pass over a feed.
    "events_anomaly" -> ((s, d) => {
      val hourly = events(s, d)
        .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
        .agg(count(lit(1)).as("n"))
      val stats = hourly.groupBy(col("event_type"))
        .agg(count(lit(1)).as("h"), sum(col("n")).as("sn"),
          sum(col("n") * col("n")).as("sn2"))
      hourly.join(broadcast(stats), Seq("event_type"))
        .select(col("event_type"), col("hour"), col("n"),
          round((col("n") - col("sn").cast("double") / col("h")) /
            sqrt((col("sn2").cast("double") - col("sn").cast("double") * col("sn") / col("h"))
              / (col("h") - 1)), 6).as("z"))
        .filter(abs(col("z")) >= lit(2.0))
        .orderBy(col("event_type"), col("hour"))
    }),

    // calendar gap-fill + trailing smoothing (the time-series resample every
    // feed-health dashboard needs): daily counts per type, re-gridded onto
    // the full min..max calendar (sequence+explode == generate_series) so
    // silent ingestion gaps surface as explicit zero rows, then a 7-day
    // trailing average. Aggregate-first: the grid and the window are over
    // nTypes × nDays rows (thousands at any corpus scale), never over events;
    // the per-type window partition is BOUNDED by calendar length.
    "events_gapfill" -> ((s, d) => {
      val ev = events(s, d)
      val daily = ev.groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("n"))
      val cal = ev.agg(min(to_date(col("ts"))).as("d0"),
          max(to_date(col("ts"))).as("d1"))
        .select(explode(sequence(col("d0"), col("d1"),
          expr("interval 1 day"))).as("day"))
      val grid = cal.crossJoin(ev.select(col("event_type")).distinct())
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("event_type")).orderBy(col("day"))
        .rowsBetween(-6, 0)
      grid.join(daily, Seq("event_type", "day"), "left")
        .select(col("event_type"), col("day"),
          coalesce(col("n"), lit(0L)).as("n_events"))
        .withColumn("avg_7d", round(avg(col("n_events")).over(w), 6))
        .withColumn("is_gap", (col("n_events") === 0).cast("long"))
        // midnight TIMESTAMP, not DATE: dtype parity in the pandas compare
        .select(col("event_type"), col("day").cast("timestamp").as("day"),
          col("n_events"), col("avg_7d"), col("is_gap"))
        .orderBy(col("event_type"), col("day"))
    }),

    // semi-structured props: JSON extraction inside the scan stage
    // (get_json_object is codegen'd) — the metadata-parsing pass every
    // event pipeline runs; one shuffle for the group-by
    "events_json_stats" -> ((s, d) => {
      val k = get_json_object(col("props"), "$.k").cast("int")
      // events() (not a bare read): parquet schema conversion fails on the
      // TIMESTAMP(NANOS) generation without the legacy conf, even though
      // this query never selects ts
      events(s, d)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), round(avg(k), 6).as("avg_k"),
          min(k).as("min_k"), max(k).as("max_k"))
        .orderBy(col("event_type"))
    }),

    // AS-OF JOIN (attribution): each purchase picks the latest click at or
    // before it for the same user — union + ordered carry-forward, ONE
    // shuffle, no range-join explosion (graft.operators.TimeSeries). Clicks
    // are pre-deduped per (user, ms) so the as-of choice is total; integer
    // millisecond timestamps keep both engines bit-identical.
    "asof_attribution" -> ((s, d) => {
      val ev = eventsMs(s, d).select(col("event_id"), col("user_id"),
        col("ts_ms"), col("event_type"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("purchase_id"), col("user_id"), col("ts_ms"))
      val clicks = ev.filter(col("event_type") === "click")
        .groupBy(col("user_id"), col("ts_ms"))
        .agg(max(col("event_id")).as("click_id"))
      graft.operators.TimeSeries.asofJoinBackward(purchases, clicks,
          Seq("user_id"), "ts_ms", Seq("click_id"), prefix = "prior_")
        .select(col("purchase_id"), col("user_id"), col("ts_ms"),
          col("prior_click_id"), col("prior_ts_ms"))
        .orderBy(col("purchase_id"))
    }),

    // ordered funnel: users who did view -> click -> purchase with strictly
    // increasing timestamps. Three per-user min-aggregations chained by
    // joins — each intermediate is one row per qualifying user (bounded by
    // the user count, not the event count), so every join is
    // AQE-broadcastable when users are few and degrades to a user_id
    // shuffle join when they are not. No window over the raw events.
    "funnel_steps" -> ((s, d) => {
      val ev = events(s, d).select(col("user_id"), col("event_type"), col("ts"))
      val v = ev.filter(col("event_type") === "view")
        .groupBy(col("user_id")).agg(min(col("ts")).as("t1"))
      val c = ev.filter(col("event_type") === "click")
        .join(v, Seq("user_id")).filter(col("ts") > col("t1"))
        .groupBy(col("user_id")).agg(min(col("ts")).as("t2"))
      val p = ev.filter(col("event_type") === "purchase")
        .join(c, Seq("user_id")).filter(col("ts") > col("t2"))
        .groupBy(col("user_id")).agg(min(col("ts")).as("t3"))
      v.agg(count(lit(1)).as("n_users")).select(lit("1_view").as("step"), col("n_users"))
        .unionAll(c.agg(count(lit(1)).as("n_users"))
          .select(lit("2_click").as("step"), col("n_users")))
        .unionAll(p.agg(count(lit(1)).as("n_users"))
          .select(lit("3_purchase").as("step"), col("n_users")))
        .orderBy(col("step"))
    }),

    // retention cohorts: first-seen day per user, then distinct active
    // users per (cohort_day, day_offset) for the first week. Two shuffles
    // (per-user min, then the cohort group-by) — the per-user table joins
    // back AQE-broadcast-or-shuffle exactly like funnel_steps.
    "retention_cohorts" -> ((s, d) => {
      val ev = events(s, d)
        .select(col("user_id"), to_date(col("ts")).as("day"))
      val first = ev.groupBy(col("user_id")).agg(min(col("day")).as("cohort_day"))
      ev.join(first, Seq("user_id"))
        .select(col("cohort_day"),
          datediff(col("day"), col("cohort_day")).cast("long").as("day_offset"),
          col("user_id"))
        .filter(col("day_offset") <= 7)
        .groupBy(col("cohort_day"), col("day_offset"))
        .agg(countDistinct(col("user_id")).as("n_users"))
        // midnight TIMESTAMP, not DATE: parquet DATE and DuckDB DATE land as
        // different dtypes in the driver's pandas compare
        .select(col("cohort_day").cast("timestamp").as("cohort_day"),
          col("day_offset"), col("n_users"))
        .orderBy(col("cohort_day"), col("day_offset"))
    }),

    // recency-weighted engagement: per-user sum of value·exp(-0.1·age_days),
    // aged back from the corpus max timestamp (deterministic, no wall
    // clock). One global max + one combined aggregation; contributions are
    // fixed-point quantized so the sum is partition-order independent.
    "time_decay_score" -> ((s, d) =>
      graft.operators.TimeSeries.timeDecayScores(events(s, d), "user_id",
          "ts", "value", lambdaPerDay = 0.1)
        .orderBy(col("decayed_score").desc, col("user_id"))
        .limit(50)),

    // TPC-H Q3 shape (unshipped-orders revenue): segment-filtered customers
    // broadcast into orders, date filters pushed to both parquet scans,
    // one shuffle for the per-order aggregation, TakeOrdered for the top-10
    "q3_shipping" -> ((s, d) => {
      val cut = lit("1998-06-01").cast("timestamp")
      val c = t(s, d, "customer").filter(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey"))
      val o = t(s, d, "orders").filter(col("o_orderdate") < cut)
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"))
      val l = t(s, d, "lineitem").filter(col("l_shipdate") > cut)
        .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4)
          .as("revenue"))
        .select(col("l_orderkey"), col("revenue"), col("o_orderdate"))
        .orderBy(col("revenue").desc, col("o_orderdate"), col("l_orderkey"))
        .limit(10)
    }),

    // per-type hourly volume trend: OLS slope of count over hour index,
    // from ALL-INTEGER sums (h, Σx, Σy, Σxy, Σx² with x = hours since the
    // type's first hour — bounded, so every product stays far from long
    // overflow) — exact in any engine, one tiny per-type table. The
    // "which event types are growing" detector next to events_anomaly.
    "events_trend" -> ((s, d) => {
      val hourly = events(s, d)
        .groupBy(col("event_type"),
          // `div`, not `/`: Spark's `/` on longs is double division
          expr("unix_micros(date_trunc('hour', ts)) div 3600000000").as("h"))
        .agg(count(lit(1)).as("n"))
      val base = hourly.groupBy(col("event_type")).agg(min(col("h")).as("h0"))
      hourly.join(base, "event_type")
        .select(col("event_type"), (col("h") - col("h0")).as("x"), col("n"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_hours"), sum(col("x")).as("__sx"),
          sum(col("n")).as("__sy"), sum(col("x") * col("n")).as("__sxy"),
          sum(col("x") * col("x")).as("__sx2"))
        .select(col("event_type"), col("n_hours"),
          // a single-hour type has zero x-variance: slope is undefined —
          // NULL, not a 0/0 NaN (NaN != NaN breaks any equality compare)
          when(col("n_hours") * col("__sx2") - col("__sx") * col("__sx") =!= 0L,
            round((col("n_hours") * col("__sxy") - col("__sx") * col("__sy"))
              .cast("double") /
              (col("n_hours") * col("__sx2") - col("__sx") * col("__sx"))
                .cast("double"), 6)).as("slope_per_hour"))
        .orderBy(col("event_type"))
    }),

    // TPC-H Q4 shape — the EXISTS flavor, algebraized: "ANY lineitem
    // shipped > 60 days after the order date" ⇔ "the order's MAX
    // l_shipdate does", so lineitem is first reduced to one (orderkey,
    // max_shipdate) row (map-side-combined — at 100 TB the fact table's
    // token stream never reaches the join; the semi-join form builds a
    // hash relation over EVERY lineitem row). The ≤1-row-per-key build
    // side keeps order multiplicity exactly, so the counts are identical
    // to the correlated semi join.
    "order_priority_late" -> ((s, d) => {
      val lastShip = t(s, d, "lineitem")
        .groupBy(col("l_orderkey"))
        .agg(max(col("l_shipdate")).as("__maxship"))
      t(s, d, "orders")
        .join(lastShip,
          col("o_orderkey") === col("l_orderkey") &&
            col("__maxship") > col("o_orderdate") + expr("INTERVAL 60 DAYS"),
          "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_orders"))
        .orderBy(col("o_orderpriority"))
    }),

    // the LEFT ANTI flavor (NOT EXISTS): customers with no order since
    // 2000, by segment — the churn audit; the date filter pushes into the
    // orders scan BEFORE the anti probe
    "customers_inactive" -> ((s, d) =>
      t(s, d, "customer")
        .join(t(s, d, "orders")
            .filter(col("o_orderdate") >= lit("2000-01-01").cast("timestamp")),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_customers"),
          round(sum(col("c_acctbal")), 4).as("total_acctbal"))
        .orderBy(col("c_mktsegment"))),

    // brand revenue rollup (completes the part-table surface): part is a
    // classic broadcast dim; one shuffle for the brand aggregation
    "brand_revenue" -> ((s, d) =>
      t(s, d, "lineitem")
        .join(broadcast(t(s, d, "part")),
          col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4)
          .as("revenue"), count(lit(1)).as("n_items"))
        .orderBy(col("p_brand"))),

    // revenue by supplier nation (completes the supplier-table surface):
    // two broadcast dims chained, one shuffle for the nation aggregation
    "supplier_nation_revenue" -> ((s, d) =>
      t(s, d, "lineitem")
        .join(broadcast(t(s, d, "supplier")),
          col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(t(s, d, "nation")),
          col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4)
          .as("revenue"),
          countDistinct(col("s_suppkey")).as("n_suppliers"))
        .orderBy(col("n_name"))),

    // month-over-month order growth: one month aggregation + a lag window
    // over the tiny month table; growth from exact integer counts
    "orders_monthly_growth" -> ((s, d) => {
      val m = t(s, d, "orders")
        .groupBy(date_trunc("month", col("o_orderdate")).as("month"))
        .agg(count(lit(1)).as("n_orders"))
      // global window is BOUNDED: one row per calendar month
      m.withColumn("__prev",
          lag(col("n_orders"), 1).over(Window.orderBy(col("month"))))
        .select(col("month"), col("n_orders"),
          round((col("n_orders") - col("__prev")).cast("double") /
            col("__prev"), 6).as("mom_growth"))
        .orderBy(col("month"))
    }),

    // per-type event-value percentiles (the exact shared-definition
    // percentile, as doc_len_percentiles): the latency/size-distribution
    // profile pass
    "events_value_percentiles" -> ((s, d) =>
      events(s, d).groupBy(col("event_type"))
        .agg(round(expr("percentile(value, 0.5)"), 6).as("p50"),
          round(expr("percentile(value, 0.9)"), 6).as("p90"),
          round(expr("percentile(value, 0.99)"), 6).as("p99"),
          round(max(col("value")), 6).as("max_value"))
        .orderBy(col("event_type"))),

    // hour-of-day seasonality profile per type: integer counts + exact
    // share-of-type division — the baseline the anomaly/trend monitors
    // normalize against
    "events_seasonality" -> ((s, d) => {
      val c = events(s, d)
        .groupBy(col("event_type"), hour(col("ts")).cast("long").as("hour_of_day"))
        .agg(count(lit(1)).as("n"))
      c.withColumn("share", round(col("n").cast("double") /
          sum(col("n")).over(Window.partitionBy(col("event_type"))), 6))
        .orderBy(col("event_type"), col("hour_of_day"))
    }),

    // RFM (recency/frequency/monetary) segmentation: per-user aggregates
    // off one events pass, then quintile scores by VALUE against exact
    // percentile thresholds — ONE tiny aggregate (12 doubles) broadcast
    // into a map-side bucket assignment. No global rank window at any user
    // count (a ntile/percent_rank over the user table is a single-partition
    // sort of every user — the scale-killer this shape avoids); ties share
    // a bucket by construction. At extreme user counts swap `percentile`
    // for `percentile_approx` — only the threshold aggregate changes.
    "user_rfm" -> ((s, d) => {
      val ev = events(s, d)
      val ref = ev.agg(max(unix_micros(col("ts"))).as("__ref"))
      val per = ev.groupBy(col("user_id"))
        .agg(max(unix_micros(col("ts"))).as("__last"),
          count(lit(1)).as("frequency"),
          round(sum(col("value")), 4).as("monetary"))
        .crossJoin(broadcast(ref))
        .select(col("user_id"),
          round((col("__ref") - col("__last")) / 8.64e10, 6).as("recency_days"),
          col("frequency"), col("monetary"))
      val thrCols =
        for (q <- Seq(20, 40, 60, 80); c <- Seq("recency_days", "frequency", "monetary"))
          yield round(expr(s"percentile($c, 0.$q)"), 6).as(s"__${c.head}$q")
      val thr = per.agg(thrCols.head, thrCols.tail: _*)
      // score 1 = best quintile: most recent (smallest recency), highest
      // frequency/monetary — same orientation as the former ntile ordering
      def asc(c: String, p: String) = lit(1) +
        (col(c) > col(s"__$p" + 20)).cast("int") +
        (col(c) > col(s"__$p" + 40)).cast("int") +
        (col(c) > col(s"__$p" + 60)).cast("int") +
        (col(c) > col(s"__$p" + 80)).cast("int")
      def desc(c: String, p: String) = lit(1) +
        (col(c) < col(s"__$p" + 80)).cast("int") +
        (col(c) < col(s"__$p" + 60)).cast("int") +
        (col(c) < col(s"__$p" + 40)).cast("int") +
        (col(c) < col(s"__$p" + 20)).cast("int")
      per.crossJoin(broadcast(thr))
        .select(col("user_id"), col("recency_days"), col("frequency"),
          col("monetary"),
          asc("recency_days", "r").cast("long").as("r_score"),
          desc("frequency", "f").cast("long").as("f_score"),
          desc("monetary", "m").cast("long").as("m_score"))
        .orderBy(col("user_id"))
    }),

    // per-user event-sequence transition matrix (the Markov view of the
    // funnel): one lag window per user, then a tiny (from, to) count table;
    // transition probabilities from exact integer counts
    "event_transitions" -> ((s, d) => {
      val ev = events(s, d).select(col("user_id"), col("event_type"),
        col("ts"), col("event_id"))
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      ev.withColumn("to_type", lead(col("event_type"), 1).over(w))
        .filter(col("to_type").isNotNull)
        .groupBy(col("event_type").as("from_type"), col("to_type"))
        .agg(count(lit(1)).as("cnt"))
        .withColumn("p", round(col("cnt").cast("double") /
          sum(col("cnt")).over(Window.partitionBy(col("from_type"))), 6))
        .orderBy(col("from_type"), col("to_type"))
    }),

    // blocked fuzzy record linkage over the part catalog (entity
    // resolution): distinct names → first-token block → within-block
    // self-join → banded-DP thresholded levenshtein. Pair volume is
    // sum(|block|²) over DISTINCT names, never all-pairs over rows; see
    // Dedup.fuzzyLinkage for the 100 TB plan notes
    "fuzzy_match_parts" -> ((s, d) =>
      graft.operators.Dedup.fuzzyLinkage(t(s, d, "part"), "p_partkey", "p_name",
        name => split(name, " ").getItem(0), maxDist = 3)
        .orderBy(col("name_a"), col("name_b"))),
  )

  val oracleSql: Map[String, String] = Map(
    "fuzzy_match_parts" ->
      """WITH names AS (SELECT p_name AS name, min(p_partkey) AS rep_id
        |               FROM part GROUP BY 1),
        |b AS (SELECT name, rep_id, split_part(name, ' ', 1) AS blk FROM names)
        |SELECT a.name AS name_a, c.name AS name_b,
        |       levenshtein(a.name, c.name) AS dist,
        |       a.rep_id AS id_a, c.rep_id AS id_b
        |FROM b a JOIN b c ON a.blk = c.blk AND a.rep_id < c.rep_id
        |WHERE levenshtein(a.name, c.name) <= 3
        |ORDER BY 1, 2""".stripMargin,
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 4) AS sum_qty,
        |  round(sum(l_extendedprice), 4) AS sum_base_price,
        |  round(sum(l_extendedprice * (1 - l_discount)), 4) AS sum_disc_price,
        |  round(avg(l_discount), 6) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "join_region_revenue" ->
      """SELECT r_name, round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue,
        |       count(*) AS n_items
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "top_users_window" ->
      """WITH agg AS (SELECT user_id, round(sum(value), 4) AS total_value,
        |                    count(*) AS n_events
        |             FROM events GROUP BY 1),
        |r AS (SELECT user_id, total_value, n_events,
        |        row_number() OVER (ORDER BY total_value DESC, user_id) AS rnk FROM agg)
        |SELECT user_id, total_value, n_events, rnk FROM r WHERE rnk <= 10""".stripMargin,
    "sessions_batch" ->
      """WITH e AS (SELECT user_id, CAST(epoch_ns(ts) // 1000000 AS BIGINT) AS ts_ms, value
        |           FROM events),
        |f AS (SELECT user_id, ts_ms, value,
        |        CASE WHEN ts_ms - lag(ts_ms) OVER (PARTITION BY user_id ORDER BY ts_ms) <= 1800000
        |             THEN 0 ELSE 1 END AS new_sess
        |      FROM e),
        |g AS (SELECT user_id, ts_ms, value,
        |        sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts_ms
        |                            ROWS UNBOUNDED PRECEDING) AS sess_id
        |      FROM f)
        |SELECT user_id, min(ts_ms) AS session_start, max(ts_ms) AS session_end,
        |       count(*) AS n_events, round(sum(value), 4) AS sum_value
        |FROM g GROUP BY user_id, sess_id
        |ORDER BY user_id, session_start""".stripMargin,

    // the salted join must be INVISIBLE in the result: plain join replay
    "salted_join" ->
      """SELECT o_orderpriority,
        |       round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue,
        |       count(*) AS n_lines
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // Morton replay: same quantization op order (u * 256 inside floor,
    // clamp to [0, 255]), then the 16 interleave terms generated from the
    // one bit-placement rule Layout.interleaveBits uses (bit b of dim i →
    // position b*2+i)
    "zorder_key" -> {
      val terms = (for { b <- 0 until 8; i <- 0 until 2 } yield
        s"(((q$i >> $b) & 1) << ${b * 2 + i})").mkString(" | ")
      s"""WITH st AS (SELECT CAST(min(user_id) AS DOUBLE) AS mn0,
         |              CAST(max(user_id) AS DOUBLE) AS mx0,
         |              min(value) AS mn1, max(value) AS mx1 FROM events),
         |q AS (SELECT event_id,
         |    CAST(least(greatest(floor((CAST(user_id AS DOUBLE) - mn0) / (mx0 - mn0) * 256.0), 0.0), 255.0) AS BIGINT) AS q0,
         |    CAST(least(greatest(floor((value - mn1) / (mx1 - mn1) * 256.0), 0.0), 255.0) AS BIGINT) AS q1
         |  FROM events CROSS JOIN st)
         |SELECT event_id, $terms AS zkey FROM q
         |ORDER BY zkey, event_id LIMIT 200""".stripMargin
    },

    "events_hourly" ->
      """SELECT date_trunc('hour', ts) AS hour, event_type,
        |       count(*) AS n, round(sum(value), 4) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "events_anomaly" ->
      """WITH h AS (SELECT date_trunc('hour', ts) AS hour, event_type, count(*) AS n
        |           FROM events GROUP BY 1, 2),
        |s AS (SELECT event_type, count(*) AS h, sum(n) AS sn, sum(n * n) AS sn2
        |      FROM h GROUP BY 1),
        |z AS (SELECT h.event_type, h.hour, h.n,
        |        round((h.n - CAST(sn AS DOUBLE) / s.h) /
        |          sqrt((CAST(sn2 AS DOUBLE) - CAST(sn AS DOUBLE) * sn / s.h)
        |            / (s.h - 1)), 6) AS z
        |      FROM h JOIN s USING (event_type))
        |SELECT event_type, hour, n, z FROM z WHERE abs(z) >= 2.0
        |ORDER BY event_type, hour""".stripMargin,

    "events_gapfill" ->
      """WITH b AS (SELECT min(CAST(ts AS DATE)) AS d0, max(CAST(ts AS DATE)) AS d1
        |           FROM events),
        |cal AS (SELECT unnest(generate_series(d0, d1, INTERVAL 1 DAY))::DATE AS day
        |        FROM b),
        |ty AS (SELECT DISTINCT event_type FROM events),
        |daily AS (SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n
        |          FROM events GROUP BY 1, 2),
        |g AS (SELECT ty.event_type, cal.day, coalesce(daily.n, 0) AS n_events
        |      FROM cal CROSS JOIN ty
        |      LEFT JOIN daily ON daily.event_type = ty.event_type
        |                     AND daily.day = cal.day)
        |SELECT event_type, CAST(day AS TIMESTAMP) AS day, n_events,
        |  round(avg(n_events) OVER (PARTITION BY event_type ORDER BY day
        |    ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 6) AS avg_7d,
        |  CAST(CASE WHEN n_events = 0 THEN 1 ELSE 0 END AS BIGINT) AS is_gap
        |FROM g ORDER BY event_type, day""".stripMargin,

    "events_json_stats" ->
      """SELECT event_type, count(*) AS n,
        |  round(avg(CAST(json_extract_string(props, '$.k') AS INT)), 6) AS avg_k,
        |  min(CAST(json_extract_string(props, '$.k') AS INT)) AS min_k,
        |  max(CAST(json_extract_string(props, '$.k') AS INT)) AS max_k
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,

    // DuckDB's native ASOF JOIN is the semantic spec for the Spark
    // union+carry-forward implementation
    "asof_attribution" ->
      """WITH e AS (SELECT event_id, user_id,
        |             CAST(epoch_ns(ts) // 1000000 AS BIGINT) AS ts_ms, event_type
        |           FROM events),
        |c AS (SELECT user_id, ts_ms, max(event_id) AS click_id
        |      FROM e WHERE event_type = 'click' GROUP BY 1, 2),
        |p AS (SELECT event_id AS purchase_id, user_id, ts_ms
        |      FROM e WHERE event_type = 'purchase')
        |SELECT p.purchase_id, p.user_id, p.ts_ms,
        |       c.click_id AS prior_click_id, c.ts_ms AS prior_ts_ms
        |FROM p ASOF LEFT JOIN c
        |  ON p.user_id = c.user_id AND p.ts_ms >= c.ts_ms
        |ORDER BY purchase_id""".stripMargin,

    "funnel_steps" ->
      """WITH v AS (SELECT user_id, min(ts) AS t1 FROM events
        |           WHERE event_type = 'view' GROUP BY 1),
        |c AS (SELECT e.user_id, min(ts) AS t2 FROM events e JOIN v USING (user_id)
        |      WHERE event_type = 'click' AND ts > t1 GROUP BY 1),
        |p AS (SELECT e.user_id, min(ts) AS t3 FROM events e JOIN c USING (user_id)
        |      WHERE event_type = 'purchase' AND ts > t2 GROUP BY 1)
        |SELECT '1_view' AS step, count(*) AS n_users FROM v
        |UNION ALL SELECT '2_click', count(*) FROM c
        |UNION ALL SELECT '3_purchase', count(*) FROM p
        |ORDER BY step""".stripMargin,

    "retention_cohorts" ->
      """WITH ev AS (SELECT user_id, CAST(ts AS DATE) AS day FROM events),
        |f AS (SELECT user_id, min(day) AS cohort_day FROM ev GROUP BY 1)
        |SELECT CAST(cohort_day AS TIMESTAMP) AS cohort_day,
        |       date_diff('day', cohort_day, day) AS day_offset,
        |       count(DISTINCT user_id) AS n_users
        |FROM ev JOIN f USING (user_id)
        |WHERE date_diff('day', cohort_day, day) <= 7
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // same fixed-point quantization rule (floor(x*2^20+0.5) per row, long
    // sum) so the aggregation is order-independent in both engines
    "time_decay_score" ->
      """WITH r AS (SELECT max(epoch_us(ts)) AS ref_us FROM events),
        |q AS (SELECT user_id,
        |    CAST(floor(value * exp(-0.1 * ((r.ref_us - epoch_us(ts)) / 86400000000.0))
        |         * 1048576.0 + 0.5) AS BIGINT) AS qv
        |  FROM events CROSS JOIN r)
        |SELECT user_id, count(*) AS n_events,
        |       round(CAST(sum(qv) AS DOUBLE) / 1048576.0, 6) AS decayed_score
        |FROM q GROUP BY 1 ORDER BY decayed_score DESC, user_id LIMIT 50""".stripMargin,

    "q3_shipping" ->
      """SELECT l_orderkey, round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue,
        |       o_orderdate
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-06-01'
        |  AND l_shipdate > TIMESTAMP '1998-06-01'
        |GROUP BY l_orderkey, o_orderdate
        |ORDER BY revenue DESC, o_orderdate, l_orderkey LIMIT 10""".stripMargin,

    "events_trend" ->
      """WITH hr AS (SELECT event_type,
        |    epoch_us(date_trunc('hour', ts)) // 3600000000 AS h, count(*) AS n
        |  FROM events GROUP BY 1, 2),
        |b AS (SELECT event_type, min(h) AS h0 FROM hr GROUP BY 1),
        |x AS (SELECT hr.event_type, hr.h - b.h0 AS x, hr.n
        |      FROM hr JOIN b USING (event_type)),
        |s AS (SELECT event_type, count(*) AS n_hours,
        |        CAST(sum(x) AS BIGINT) AS sx, CAST(sum(n) AS BIGINT) AS sy,
        |        CAST(sum(x * n) AS BIGINT) AS sxy, CAST(sum(x * x) AS BIGINT) AS sx2
        |      FROM x GROUP BY 1)
        |SELECT event_type, n_hours,
        |  CASE WHEN n_hours * sx2 - sx * sx <> 0
        |       THEN round(CAST(n_hours * sxy - sx * sy AS DOUBLE) /
        |                  CAST(n_hours * sx2 - sx * sx AS DOUBLE), 6)
        |       END AS slope_per_hour
        |FROM s ORDER BY event_type""".stripMargin,

    "customers_inactive" ->
      """SELECT c_mktsegment, count(*) AS n_customers,
        |       round(sum(c_acctbal), 4) AS total_acctbal
        |FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey
        |                    AND o_orderdate >= TIMESTAMP '2000-01-01')
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "order_priority_late" ->
      """SELECT o_orderpriority, count(*) AS n_orders
        |FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey
        |                AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "brand_revenue" ->
      """SELECT p_brand, round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue,
        |       count(*) AS n_items
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "supplier_nation_revenue" ->
      """SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue,
        |       count(DISTINCT s_suppkey) AS n_suppliers
        |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "orders_monthly_growth" ->
      """WITH m AS (SELECT date_trunc('month', o_orderdate) AS month,
        |             count(*) AS n_orders
        |           FROM orders GROUP BY 1)
        |SELECT month, n_orders,
        |  round(CAST(n_orders - lag(n_orders) OVER (ORDER BY month) AS DOUBLE) /
        |        lag(n_orders) OVER (ORDER BY month), 6) AS mom_growth
        |FROM m ORDER BY month""".stripMargin,

    "events_value_percentiles" ->
      """SELECT event_type,
        |  round(quantile_cont(value, 0.5), 6) AS p50,
        |  round(quantile_cont(value, 0.9), 6) AS p90,
        |  round(quantile_cont(value, 0.99), 6) AS p99,
        |  round(max(value), 6) AS max_value
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,

    "events_seasonality" ->
      """WITH c AS (SELECT event_type, CAST(hour(ts) AS BIGINT) AS hour_of_day,
        |             count(*) AS n
        |           FROM events GROUP BY 1, 2)
        |SELECT event_type, hour_of_day, n,
        |  round(CAST(n AS DOUBLE) / sum(n) OVER (PARTITION BY event_type), 6) AS share
        |FROM c ORDER BY event_type, hour_of_day""".stripMargin,

    // quintile-by-threshold replay: DuckDB's quantile_cont shares Spark
    // percentile's lower + (higher−lower)·frac definition, thresholds
    // rounded to 6 in both engines before the comparisons
    "user_rfm" ->
      """WITH r AS (SELECT max(epoch_us(ts)) AS ref FROM events),
        |per AS (SELECT user_id,
        |          round((r.ref - max(epoch_us(ts))) / 86400000000.0, 6) AS recency_days,
        |          count(*) AS frequency, round(sum(value), 4) AS monetary
        |        FROM events CROSS JOIN r GROUP BY user_id, r.ref),
        |th AS (SELECT
        |  round(quantile_cont(recency_days, 0.2), 6) AS r20,
        |  round(quantile_cont(recency_days, 0.4), 6) AS r40,
        |  round(quantile_cont(recency_days, 0.6), 6) AS r60,
        |  round(quantile_cont(recency_days, 0.8), 6) AS r80,
        |  round(quantile_cont(frequency, 0.2), 6) AS f20,
        |  round(quantile_cont(frequency, 0.4), 6) AS f40,
        |  round(quantile_cont(frequency, 0.6), 6) AS f60,
        |  round(quantile_cont(frequency, 0.8), 6) AS f80,
        |  round(quantile_cont(monetary, 0.2), 6) AS m20,
        |  round(quantile_cont(monetary, 0.4), 6) AS m40,
        |  round(quantile_cont(monetary, 0.6), 6) AS m60,
        |  round(quantile_cont(monetary, 0.8), 6) AS m80 FROM per)
        |SELECT user_id, recency_days, frequency, monetary,
        |  CAST(1 + CAST(recency_days > r20 AS INT) + CAST(recency_days > r40 AS INT)
        |         + CAST(recency_days > r60 AS INT) + CAST(recency_days > r80 AS INT) AS BIGINT) AS r_score,
        |  CAST(1 + CAST(frequency < f80 AS INT) + CAST(frequency < f60 AS INT)
        |         + CAST(frequency < f40 AS INT) + CAST(frequency < f20 AS INT) AS BIGINT) AS f_score,
        |  CAST(1 + CAST(monetary < m80 AS INT) + CAST(monetary < m60 AS INT)
        |         + CAST(monetary < m40 AS INT) + CAST(monetary < m20 AS INT) AS BIGINT) AS m_score
        |FROM per CROSS JOIN th ORDER BY user_id""".stripMargin,

    "event_transitions" ->
      """WITH o AS (SELECT user_id, event_type, ts, event_id,
        |    lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS to_type
        |  FROM events),
        |c AS (SELECT event_type AS from_type, to_type, count(*) AS cnt
        |      FROM o WHERE to_type IS NOT NULL GROUP BY 1, 2)
        |SELECT from_type, to_type, cnt,
        |  round(CAST(cnt AS DOUBLE) / sum(cnt) OVER (PARTITION BY from_type), 6) AS p
        |FROM c ORDER BY from_type, to_type""".stripMargin,
  )
}
