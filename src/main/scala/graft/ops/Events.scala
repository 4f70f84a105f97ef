package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Behavioral event-sequence analytics: gap sessionization and ordered
  * conversion funnels — the two queries every event warehouse runs
  * daily. Both shuffle ONCE on the user key and then work inside the
  * per-user partition (sessionize) or through partially-aggregated
  * per-user minima (funnel); no self-join explodes, no collect. */
object Events {

  /** Top session journeys — the most common event-type PATHS through a
    * session ("view > click > purchase"), the product-analytics staple
    * behind funnel discovery. Each session contributes its first
    * `maxSteps` event types (in (ts, order) order) joined by " > ";
    * paths count corpus-wide and the top `k` return, ties by path
    * string ascending (ASCII-comparable on any engine).
    *
    * Scale shape: sessions come pre-keyed (compose after
    * [[sessionize]]); per-session path assembly is one hash aggregate
    * whose state is the session's first `maxSteps` types — the
    * `sort_array(collect_list(...))` buffer is bounded by session
    * length, and `maxSteps` caps the path string; the path count is a
    * second path-keyed partial aggregate (paths ≪ events), and the
    * top-k is TakeOrdered (per-partition heap + driver merge of k
    * rows). Output: path, n_sessions, rank. */
  def topJourneys(df: DataFrame, sessionCols: Seq[String],
      typeCol: String, tsUsCol: String, orderCol: String,
      maxSteps: Int, k: Int): DataFrame = {
    require(maxSteps >= 1 && k >= 1, s"maxSteps/k >= 1, got $maxSteps/$k")
    val steps = sort_array(collect_list(
      struct(col(tsUsCol).as("t"), col(orderCol).as("o"),
        col(typeCol).as("e"))))
    val paths = df.groupBy(sessionCols.map(col): _*)
      .agg(array_join(slice(transform(steps, s => s.getField("e")),
        1, maxSteps), " > ").as("path"))
      .groupBy(col("path")).agg(count(lit(1)).as("n_sessions"))
      .orderBy(col("n_sessions").desc, col("path").asc)
      .limit(k)
    paths.withColumn("rank",
      row_number().over(org.apache.spark.sql.expressions.Window
        .orderBy(col("n_sessions").desc, col("path").asc)).cast("long"))
  }

  /** Exponentially time-decayed activity score — the recency-weighted
    * engagement/freshness signal ranking pipelines keep per entity:
    * `score(key) = Σ units(e) · 2^(−age_buckets(e))`, half-life = one
    * `bucketUs` bucket, ages measured back from `asOfUs` (pass the
    * corpus max ts for "as of the data's end"). Contributions older
    * than `horizon` buckets (default 60) are dropped — they are below
    * 2⁻⁶⁰ of a fresh event and the horizon is what makes the BIT-EXACT
    * cross-engine story hold at every step: values quantize to integer
    * units, each weight 2^(horizon − age) is an exactly-representable
    * power of two, the weighted sum runs in DECIMAL (exact integers,
    * order-free), and the final un-scaling divides by 2^horizon — an
    * exact binary shift. No libm `exp`, no float accumulation order
    * anywhere. One hash aggregate on the key (plus, when `asOfUs` is
    * None, a broadcast 1-row max for the "as of the data's end"
    * anchor). Output: keyCol, n_events (in-horizon), score (double,
    * exact). */
  def decayedScore(df: DataFrame, keyCol: String, tsUsCol: String,
      valueCol: String, bucketUs: Long, asOfUs: Option[Long] = None,
      horizon: Int = 60): DataFrame = {
    require(bucketUs > 0, s"bucketUs > 0, got $bucketUs")
    require(horizon >= 1 && horizon <= 120,
      s"horizon in [1, 120] (DECIMAL(38) headroom), got $horizon")
    val anchored = asOfUs match {
      case Some(a) => df.withColumn("__asof", lit(a))
      case None => df.crossJoin(
        broadcast(df.agg(max(col(tsUsCol)).as("__asof"))))
    }
    val age = floor((col("__asof") - col(tsUsCol)) / lit(bucketUs))
    val units = round(col(valueCol)).cast("long")
    val w = pow(lit(2.0), (lit(horizon) - age).cast("double"))
      .cast(org.apache.spark.sql.types.DecimalType(25, 0))
    anchored.filter(col(tsUsCol).isNotNull && col(valueCol).isNotNull &&
        age >= 0 && age <= horizon)
      .select(col(keyCol), (units.cast(
        org.apache.spark.sql.types.DecimalType(12, 0)) * w).as("__sc"))
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_events"), sum(col("__sc")).as("__s"))
      .select(col(keyCol), col("n_events"),
        round(col("__s").cast("double") /
          math.pow(2.0, horizon), 6).as("score"))
  }

  /** Gap-based sessionization: events of one `userCol` ordered by
    * (`tsUsCol`, `orderCol`) belong to the same session until a gap
    * larger than `gapUs` µs opens; `session_id` is the user-local
    * 1-based session index, `session_event` the 1-based position within
    * the session. Deterministic total order: the µs timestamp with the
    * integral `orderCol` as tie-break (same convention as the lag/lead
    * family — an external engine must order by the SAME µs-truncated
    * instant).
    *
    * Scale shape: one shuffle on the user key, then two window passes
    * over the per-user partition (lag + running sum — linear, no
    * per-user materialization). Per-user event counts bound partition
    * memory; a pathological single user beyond task memory spills
    * through the sort, it does not OOM the executor. Output: `df`'s
    * columns + session_id + session_event. */
  def sessionize(df: DataFrame, userCol: String, tsUsCol: String,
      orderCol: String, gapUs: Long): DataFrame = {
    require(gapUs > 0, s"gapUs > 0, got $gapUs")
    val w = Window.partitionBy(col(userCol))
      .orderBy(col(tsUsCol), col(orderCol))
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val gap = col(tsUsCol) - lag(col(tsUsCol), 1).over(w)
    // every window below shares (partition userCol, order ts, order) —
    // one exchange + one sort serve all four passes
    df.withColumn("__new", when(gap.isNull || gap > gapUs, 1L).otherwise(0L))
      .withColumn("__rn", row_number().over(w).cast("long"))
      .withColumn("session_id", sum(col("__new")).over(run))
      .withColumn("__srn",
        max(when(col("__new") === 1L, col("__rn"))).over(run))
      .withColumn("session_event", col("__rn") - col("__srn") + 1L)
      .drop("__new", "__rn", "__srn")
  }

  /** Trailing event-time window aggregate: for every event, the count
    * and sum over the SAME user's events in the closed interval
    * `[ts − windowUs, ts]` — the per-row rolling feature (24h activity,
    * 7-day spend) that tumbling/hopping windows cannot express because
    * every row anchors its own window. RANGE framing, so same-timestamp
    * peers are mutual members on both engines.
    *
    * Scale shape: one user-keyed exchange + one sort; the range frame
    * advances two pointers over the sorted partition (Spark's sliding
    * window frame is O(n + window overlap) per partition, not O(n ×
    * window)). Output: `df`'s columns + w_count + w_sum. */
  def trailingWindow(df: DataFrame, userCol: String, tsUsCol: String,
      valueCol: String, windowUs: Long): DataFrame = {
    require(windowUs > 0, s"windowUs > 0, got $windowUs")
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsUsCol))
      .rangeBetween(-windowUs, 0)
    df.withColumn("w_count", count(lit(1)).over(w))
      .withColumn("w_sum", sum(col(valueCol)).over(w))
  }

  /** Retention cohorts: users are grouped by the time bucket of their
    * FIRST event (the cohort), and each (cohort_bucket, bucket_offset)
    * cell counts the cohort's users active in that later bucket — the
    * retention triangle every growth dashboard plots, at whatever grain
    * `bucketUs` sets (daily/weekly). Buckets are
    * `floor(ts_us / bucketUs)` — calendar-free integer arithmetic that
    * any engine reproduces exactly.
    *
    * Scale shape: per-user first-event minima (partial-aggregated,
    * user-keyed), joined back, then one distinct (cohort, offset, user)
    * reduction into the cell counts — the distinct's exchange carries
    * one row per user-bucket, not per event.
    * Output: cohort_bucket, bucket_offset, n_active. */
  def retentionCohorts(df: DataFrame, userCol: String,
      tsUsCol: String, bucketUs: Long): DataFrame = {
    require(bucketUs > 0, s"bucketUs > 0, got $bucketUs")
    val bucket = floor(col(tsUsCol) / bucketUs).cast("long")
    val first = df.groupBy(col(userCol))
      .agg(min(bucket).as("cohort_bucket"))
    df.select(col(userCol), bucket.as("__b"))
      .join(first, Seq(userCol))
      .select(col(userCol), col("cohort_bucket"),
        (col("__b") - col("cohort_bucket")).as("bucket_offset"))
      .distinct()
      .groupBy(col("cohort_bucket"), col("bucket_offset"))
      .agg(count(lit(1)).as("n_active"))
  }

  /** Ordered conversion funnel: for each user who performed
    * `steps.head`, the earliest strictly-increasing timestamp chain
    * through `steps` (greedy earliest-feasible matching, which is
    * optimal: taking the minimal feasible time at each step can only
    * widen later steps' choices — the standard funnel semantics) and
    * the number of steps completed. One row per user who reached step
    * 1; `t<i>_us` is null from the first unreached step on.
    *
    * Scale shape: k−1 rounds of (filter one event type → equi-join the
    * previous step's per-user minima → min-aggregate), every round
    * partially aggregated before its exchange and keyed on the user —
    * k−1 user-keyed shuffles of per-user rows, never an event-level
    * self-join (the naive `e1 JOIN e2 ON ts >` shape is quadratic in
    * events-per-user; this is linear). */
  def funnel(df: DataFrame, userCol: String, typeCol: String,
      tsUsCol: String, steps: Seq[String]): DataFrame = {
    require(steps.size >= 2, s"need >= 2 steps, got ${steps.size}")
    require(steps.distinct.size == steps.size, s"duplicate steps in $steps")
    val base = df.select(col(userCol), col(typeCol), col(tsUsCol))
    val stepMins: Seq[DataFrame] = steps.zipWithIndex
      .foldLeft(Vector.empty[DataFrame]) { case (acc, (step, i)) =>
        val events = base.filter(col(typeCol) === step)
        val m =
          if (i == 0)
            events.groupBy(col(userCol))
              .agg(min(col(tsUsCol)).as(s"t${i + 1}_us"))
          else
            events.join(acc.last, Seq(userCol))
              .filter(col(tsUsCol) > col(s"t${i}_us"))
              .groupBy(col(userCol))
              .agg(min(col(tsUsCol)).as(s"t${i + 1}_us"))
        acc :+ m.select(col(userCol), col(s"t${i + 1}_us"))
      }
    val joined = stepMins.tail.foldLeft(stepMins.head)(
      (l, r) => l.join(r, Seq(userCol), "left"))
    // ascending fold so the HIGHEST completed step's when() ends up
    // outermost: when(t_k, k).otherwise(when(t_{k-1}, k-1). … .otherwise(1))
    val completed = steps.indices.foldLeft(lit(1L): Column) {
      (els, i) => if (i == 0) els
        else when(col(s"t${i + 1}_us").isNotNull, lit((i + 1).toLong)).otherwise(els)
    }
    joined.withColumn("steps_completed", completed)
  }

  /** Interval concurrency gauge (sweep line, bucketed): given intervals
    * `[startUs, endUs]` (µs, inclusive), the PEAK number simultaneously
    * active within each `bucketUs` time bucket — "peak concurrent
    * sessions/users per day", the capacity/load question interval data
    * exists to answer. Classic sweep: +1 at start, −1 at end+1, running
    * sum in (ts, delta) order (ends release before same-instant starts).
    *
    * Scale shape: the naive sweep is ONE globally-ordered running sum —
    * a single-partition window sort over every endpoint, the
    * anti-pattern this engine bans. Here the [[graft.ops.Joins]]
    * asOfBucketed carry discipline applies: endpoints bucket by
    * `bucketUs` and the running sum is (a) an in-bucket window —
    * parallel across buckets — plus (b) a carry-in prefix-summed over
    * the BUCKETS table (one row per occupied bucket; that tiny table is
    * the only single-partition window, documented as groups-sized).
    * Only buckets containing an endpoint emit a row — a bucket interior
    * to a long interval has constant concurrency equal to its
    * neighbors' carry and no event to change it. Output: bucket,
    * peak_concurrent, n_starts, n_ends. */
  def concurrency(intervals: DataFrame, startUsCol: String,
      endUsCol: String, bucketUs: Long): DataFrame = {
    require(bucketUs > 0, s"bucketUs > 0, got $bucketUs")
    val deltas = intervals
      .select(col(startUsCol).cast("long").as("__ts"), lit(1L).as("__d"))
      .unionByName(intervals
        .select((col(endUsCol).cast("long") + 1L).as("__ts"), lit(-1L).as("__d")))
      .withColumn("__b", floor(col("__ts") / bucketUs).cast("long"))
    val wIn = Window.partitionBy(col("__b"))
      .orderBy(col("__ts"), col("__d"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val inBucket = deltas.withColumn("__run_in", sum(col("__d")).over(wIn))
    // carry-in per bucket: prefix sum of earlier buckets' totals — a
    // window over the occupied-buckets table (tiny), not the endpoints
    val carry = deltas.groupBy(col("__b"))
      .agg(sum(col("__d")).as("__tot"),
        sum(when(col("__d") === 1L, 1L).otherwise(0L)).as("n_starts"),
        sum(when(col("__d") === -1L, 1L).otherwise(0L)).as("n_ends"))
      .withColumn("__carry",
        coalesce(sum(col("__tot")).over(
          Window.orderBy(col("__b"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    // the gauge's peak inside a bucket is over BOTH sides of every
    // delta: the pre-delta value (run − d) covers the level carried in
    // from earlier buckets (an interval spanning the bucket start), the
    // post-delta value covers every change inside it
    inBucket.join(carry, Seq("__b"))
      .withColumn("__run", col("__run_in") + col("__carry"))
      .groupBy(col("__b").as("bucket"))
      .agg(max(greatest(col("__run"), col("__run") - col("__d")))
          .as("peak_concurrent"),
        first(col("n_starts")).as("n_starts"),
        first(col("n_ends")).as("n_ends"))
  }

  /** First-touch / last-touch attribution matrix: each user's earliest
    * and latest event type (total order (`tsUsCol`, `orderCol`) — the
    * [[sessionize]] convention) cross-tabulated into the
    * (entry channel × exit action) matrix every funnel dashboard
    * carries. Per-user endpoints come from ONE hash aggregate via the
    * [[graft.functions.ArgExtremum]] argmin/argmax (partial
    * aggregation, no per-user window sort — the q16/q22 SortAggregate
    * repair applies verbatim); the matrix is a second partially-
    * aggregated count whose exchange carries one row per user. Output:
    * first_touch, last_touch, n_users, n_events. */
  def attribution(df: DataFrame, userCol: String, typeCol: String,
      tsUsCol: String, orderCol: String): DataFrame = {
    val ord = struct(col(tsUsCol), col(orderCol))
    df.groupBy(col(userCol)).agg(
        graft.functions.ArgExtremum.minBy(col(typeCol), ord).as("first_touch"),
        graft.functions.ArgExtremum.maxBy(col(typeCol), ord).as("last_touch"),
        count(lit(1)).as("__n"))
      .groupBy(col("first_touch"), col("last_touch"))
      .agg(count(lit(1)).as("n_users"), sum(col("__n")).as("n_events"))
  }

  /** First-order Markov transition counts over each user's event
    * sequence — the path-mining complement to [[funnel]] (the funnel
    * asks "did the fixed sequence happen", transitions ask "which
    * sequences happen"): consecutive (type → next-type) pairs per user
    * in (ts, order) order, counted corpus-wide, with each transition's
    * share of its SOURCE type's outgoing edges (the Markov row
    * probability) at 6 dp.
    *
    * Scale shape: the family's single user-keyed exchange + one
    * in-partition sort for the `lead`, then a partially-aggregated
    * (from, to) hash aggregate — the exchange after the window carries
    * one row per (from, to) per task. Out-degree totals come from a
    * window over the TRANSITION-TYPES-sized aggregate, not the corpus.
    * Output: from_type, to_type, n_trans, share. */
  def transitionCounts(df: DataFrame, userCol: String, typeCol: String,
      tsUsCol: String, orderCol: String): DataFrame = {
    val w = Window.partitionBy(col(userCol))
      .orderBy(col(tsUsCol), col(orderCol))
    val counts = df
      .withColumn("__next", lead(col(typeCol), 1).over(w))
      .filter(col("__next").isNotNull)
      .groupBy(col(typeCol).as("from_type"), col("__next").as("to_type"))
      .agg(count(lit(1)).as("n_trans"))
    val out = Window.partitionBy(col("from_type"))
    counts
      .withColumn("share", round(col("n_trans").cast("double") /
        sum(col("n_trans")).over(out).cast("double"), 6))
  }

  /** Wide per-entity activity profile — the feature-vector shape a
    * model consumes (one row per user, one count column per event
    * type): `groupBy(user).pivot(type, explicit values)`. The explicit
    * value list matters at scale: it pins the output schema AND skips
    * the extra corpus-wide distinct-discovery job an open pivot runs;
    * the whole profile is then ONE partially-aggregated hash aggregate
    * on the user key (k count expressions riding one exchange). Types
    * outside the list are ignored; n_events sums the listed columns.
    * Output: userCol, one BIGINT column per type (0 where absent),
    * n_events. */
  def activityProfile(df: DataFrame, userCol: String, typeCol: String,
      types: Seq[String]): DataFrame = {
    require(types.nonEmpty && types.distinct == types,
      s"types must be non-empty and distinct, got $types")
    df.groupBy(col(userCol))
      .pivot(typeCol, types)
      .agg(count(lit(1)))
      .na.fill(0L, types)
      .withColumn("n_events", types.map(col).reduce(_ + _))
  }

  /** Daily session-quality rollup — the engagement report over
    * [[sessionize]]'s output: per session-start day, session count,
    * single-event (bounce) count and exact basis-point bounce rate,
    * event volume, exact total dwell, and mean dwell (the one 6-dp
    * float, derived from two exact integers). Duration is last−first
    * event µs — a 1-event session has duration 0 and counts as a
    * bounce.
    *
    * Scale shape: rides sessionize's single user-keyed exchange; the
    * per-session collapse is a hash aggregate on (user, session) and
    * the rollup a second on the day — both partial-aggregated; no new
    * sort. Output: day, n_sessions, n_bounce, bounce_bp, n_events,
    * dur_sum_us, mean_dur_us. */
  def sessionStatsDaily(sessions: DataFrame, userCol: String,
      tsUsCol: String): DataFrame = {
    val perSession = sessions
      .groupBy(col(userCol), col("session_id"))
      .agg(min(col(tsUsCol)).as("__s"), max(col(tsUsCol)).as("__e"),
        count(lit(1)).as("__ne"))
      .select(expr("__s div 86400000000").as("day"),
        (col("__e") - col("__s")).as("__dur"), col("__ne"))
    perSession.groupBy(col("day"))
      .agg(count(lit(1)).as("n_sessions"),
        sum(when(col("__ne") === 1L, 1L).otherwise(0L)).as("n_bounce"),
        sum(col("__ne")).as("n_events"),
        sum(col("__dur").cast("decimal(38,0)")).cast("long").as("dur_sum_us"))
      .withColumn("bounce_bp",
        expr("(n_bounce * 10000) div n_sessions"))
      .withColumn("mean_dur_s", // seconds, not µs: at µs magnitude a
        // 6-dp round needs > 16 significant digits and the two engines'
        // roundings diverge in the last ulp (observed); ÷1e6 first
        // keeps the rounded value inside double precision
        round(col("dur_sum_us").cast("double") / lit(1000000.0) /
          col("n_sessions").cast("double"), 6))
      .select(col("day"), col("n_sessions"), col("n_bounce"),
        col("bounce_bp"), col("n_events"), col("dur_sum_us"),
        col("mean_dur_s"))
  }

  /** Trailing-window distinct actives — for each observed day, how many
    * distinct users had ≥ 1 event in the `windowDays`-day window ending
    * that day (the DAU/WAU/MAU family). Distinct counts don't compose
    * across days (a user active twice in the window must count once),
    * so the corpus-safe exact shape REPLICATES each user-day presence
    * to the `windowDays` report days it supports and re-distincts —
    * never a per-day scan over raw events.
    *
    * Scale shape: one corpus-sized hash-distinct to (user, day) — after
    * which everything is presence-sized: the explode multiplies by
    * windowDays (bounded, e.g. 7/28), the second distinct and the final
    * count are hash aggregates on (report-day, user). Report days with
    * no events of their own are dropped (broadcast semi-join against
    * the observed-day set) — a dashboard reports on days that exist.
    * Output: day, n_active. */
  def rollingActiveUsers(df: DataFrame, userCol: String, tsUsCol: String,
      windowDays: Int): DataFrame = {
    require(windowDays >= 1 && windowDays <= 366,
      s"windowDays in [1, 366], got $windowDays")
    val day = 86400000000L
    val presence = df
      .select(col(userCol).as("__u"), // exact integer day index, no
        expr(s"$tsUsCol div $day").as("__d")) // double division rounding
      .distinct()
    val observed = presence.select(col("__d").as("day")).distinct()
    presence
      .withColumn("day",
        explode(sequence(col("__d"), col("__d") + (windowDays - 1))))
      .select(col("__u"), col("day")).distinct()
      .join(broadcast(observed), "day")
      .groupBy(col("day")).agg(count(lit(1)).as("n_active"))
  }

  /** Session co-visitation matrix — for every unordered pair of event
    * types, how many sessions contain BOTH (the "users who did A also
    * did B" signal behind co-occurrence recommenders), with each pair's
    * lift `n_ab · S / (n_a · n_b)` against independence (> 1 ⇔ the two
    * behaviors attract). Pairs are canonicalized `type_a < type_b`
    * (binary string order, identical on any engine for the UTF-8 types
    * this keys on).
    *
    * Scale shape: one hash-distinct to (session, type) — the only
    * corpus-sized exchange; the pair build is a SELF-JOIN KEYED ON THE
    * SESSION, where per-key cardinality is bounded by the type
    * vocabulary (never the session's raw event count — a 10k-event bot
    * session still contributes ≤ vocab rows), so the join is linear in
    * sessions with a small constant; everything after runs on
    * vocab²-sized tables, with the per-type counts and the 1-row
    * session total joined back via broadcast. The distinct table is
    * cached through `scope` (it feeds the join twice plus both count
    * sides). Output: type_a, type_b, n_a, n_b, n_ab, n_sessions,
    * lift (6 dp). */
  def covisitation(df: DataFrame, sessionCols: Seq[String],
      typeCol: String, scope: CacheScope = CacheScope.session): DataFrame = {
    require(sessionCols.nonEmpty, "covisitation needs >= 1 session column")
    val sk = sessionCols.map(col)
    val st = scope.cache(
      df.select(sk :+ col(typeCol).as("__t"): _*).distinct())
    val perType = st.groupBy(col("__t")).agg(count(lit(1)).as("__n"))
    val total = st.select(sk: _*).distinct()
      .agg(count(lit(1)).as("n_sessions"))
    // explicit right-side renames — self-join disambiguation by dataset
    // id is fragile (and warns); renamed columns cannot mis-resolve
    val b = st.select(sessionCols.map(c => col(c).as(s"__r_$c")) :+
      col("__t").as("__tb"): _*)
    val pairs = st.join(b,
        sessionCols.map(c => col(c) === col(s"__r_$c")).reduce(_ && _) &&
          col("__t") < col("__tb"))
      .groupBy(col("__t").as("type_a"), col("__tb").as("type_b"))
      .agg(count(lit(1)).as("n_ab"))
    pairs
      .join(broadcast(perType.select(col("__t").as("type_a"),
        col("__n").as("n_a"))), "type_a")
      .join(broadcast(perType.select(col("__t").as("type_b"),
        col("__n").as("n_b"))), "type_b")
      .crossJoin(broadcast(total))
      .select(col("type_a"), col("type_b"), col("n_a"), col("n_b"),
        col("n_ab"), col("n_sessions"),
        round(col("n_ab").cast("double") * col("n_sessions").cast("double") /
          (col("n_a").cast("double") * col("n_b").cast("double")), 6)
          .as("lift"))
  }
}
