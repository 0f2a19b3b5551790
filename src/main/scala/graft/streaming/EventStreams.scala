package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Event-stream processing (SURVEY §2.10: absent from the reference,
  * additive here): tumbling/sliding window aggregation, sessionization, and
  * keyed dedup over the `events` table — each as a batch DataFrame transform
  * (oracle-checkable) plus a Structured-Streaming entry point with
  * watermarking, verified equivalent in the test suite.
  *
  * Determinism: window keys are emitted as epoch seconds or formatted
  * strings (parquet µs vs external-engine ns precision never meets the
  * comparison); sums of doubles go through DECIMAL.
  */
object EventStreams {

  /** Raw file-source schema: `ts` is µs-precision parquet TIMESTAMP,
    * read as session-zoned TimestampType (the batch Tables.events shape;
    * NTZ inference is off in Sessions/SparkSpec). */
  val eventsRawSchema: StructType = StructType.fromDDL(
    "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING, " +
      "value DOUBLE, props STRING")

  /** Tumbling 1-hour windows per event type. */
  def tumblingAgg(events: DataFrame): DataFrame =
    events
      .groupBy(
        date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm:ss")
          .as("hour"),
        col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,4)")).cast("double").as("total"))

  /** OHLC downsampling bars: per (user, hour) the first/last/min/max of
    * `value` — the open-high-low-close time-series compaction (metrics
    * rollup, market bars). First/last are deterministic via (ts,
    * event_id)-ordered rank — `first()`/`last()` aggregate functions are
    * arrival-order dependent on a cluster and never used here. One
    * shuffle on the (user, hour) key; the two rank windows share its
    * partitioning (two sorts, no second exchange), and values pass
    * through un-summed so doubles stay bit-exact. */
  def ohlcBars(events: DataFrame): DataFrame = {
    val keyed = events.withColumn("hour",
      unix_timestamp(date_trunc("hour", col("ts"))).cast("long"))
    val wA = Window.partitionBy(col("user_id"), col("hour"))
      .orderBy(col("ts"), col("event_id"))
    val wD = Window.partitionBy(col("user_id"), col("hour"))
      .orderBy(col("ts").desc, col("event_id").desc)
    keyed
      .withColumn("rn_a", row_number().over(wA))
      .withColumn("rn_d", row_number().over(wD))
      .groupBy(col("user_id"), col("hour"))
      .agg(count(lit(1)).as("n_events"),
        max(when(col("rn_a") === 1, col("value"))).as("open"),
        max(when(col("rn_d") === 1, col("value"))).as("close"),
        min(col("value")).as("low"),
        max(col("value")).as("high"))
  }

  /** Sliding 10-minute windows every 5 minutes, keyed by epoch-second
    * window start: each event lands in exactly two windows. */
  def slidingAgg(events: DataFrame): DataFrame = {
    val base = (floor(unix_timestamp(col("ts")) / 300) * 300).cast("long")
    events
      .select(col("event_type"), col("value"),
        explode(array(base - 300, base)).as("window_start"))
      .groupBy(col("window_start"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,4)")).cast("double").as("total"))
  }

  /** Sessionization, 5-minute inactivity gap: classic gaps-and-islands
    * (lag + running sum of session starts) per user. Output one row per
    * session: (user_id, session_start epoch, n_events). */
  def sessionize(events: DataFrame, gapSeconds: Long = 300): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
    val epoch = col("ts").cast("double") // µs-precision seconds
    events
      .withColumn("prev", lag(epoch, 1).over(byUser))
      .withColumn("new_session",
        when(col("prev").isNull || epoch - col("prev") > gapSeconds, 1L)
          .otherwise(0L))
      .withColumn("session_seq",
        sum(col("new_session")).over(
          byUser.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("session_seq"))
      .agg(floor(min(epoch)).cast("long").as("session_start"),
        count(lit(1)).as("n_events"))
      .drop("session_seq")
  }

  /** Keyed dedup: first event per (user, type) with deterministic
    * tie-break — the batch shape of dropDuplicatesWithinWatermark. */
  def firstEventPerKey(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("ts").asc, col("event_id").asc)
    events.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_type"), col("event_id"),
        unix_timestamp(col("ts")).as("first_epoch"))
  }

  /** View→click→purchase conversion funnel per user with CAUSAL ordering:
    * first view, then first click at-or-after that view, then first
    * purchase at-or-after that click (a click before any view never
    * counts). One row per user who viewed; stage ∈ {1,2,3}.
    *
    * Scale: every join and aggregation keys on user_id, so one hash
    * partitioning serves all three stages (co-partitioned joins, no
    * re-shuffle of the big side beyond the first exchange). */
  def funnel(events: DataFrame): DataFrame = {
    val v = events.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("ts")).as("vts"))
    val c = events.filter(col("event_type") === "click")
      .join(v, Seq("user_id"))
      .filter(col("ts") >= col("vts"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("cts"))
    val p = events.filter(col("event_type") === "purchase")
      .join(c, Seq("user_id"))
      .filter(col("ts") >= col("cts"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("pts"))
    v.join(c, Seq("user_id"), "left").join(p, Seq("user_id"), "left")
      .select(col("user_id"),
        unix_timestamp(col("vts")).as("first_view"),
        unix_timestamp(col("cts")).as("first_click"),
        unix_timestamp(col("pts")).as("first_purchase"),
        (lit(1) + when(col("cts").isNotNull, 1).otherwise(0)
          + when(col("pts").isNotNull, 1).otherwise(0)).as("stage"))
  }

  /** Rolling per-user stats over the last `w` events (inclusive), in
    * (event-time, event_id) order — the moving-window feature idiom.
    * The DECIMAL detour on the sum keeps the double bit-exact across
    * engines (same discipline as the window aggregations above).
    * Scale: one hash shuffle on user_id; the frame is row-bounded so
    * state per row is O(w). */
  def rollingStats(events: DataFrame, w: Int = 5): DataFrame = {
    val win = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(-(w - 1), Window.currentRow)
    events.select(
      col("user_id"), col("event_id"),
      count(lit(1)).over(win).as("roll_n"),
      sum(col("value").cast("decimal(18,4)")).over(win)
        .cast("double").as("roll_sum"),
      min(col("value")).over(win).as("roll_min"),
      max(col("value")).over(win).as("roll_max"))
  }

  /** Weekly cohort retention: users bucketed by first-seen week; one row
    * per (cohort_week, week_offset) with the distinct-user count active
    * that many weeks after their cohort start. The (user, week) pre-
    * distinct makes the final count a plain COUNT(*) — each user
    * contributes at most one row per week. Scale: two hash aggregations
    * + one equi-join on user_id, all key-partitioned. */
  def retentionCohorts(events: DataFrame): DataFrame = {
    val wk = events.select(col("user_id"),
      floor(unix_timestamp(col("ts")) / 604800).cast("long").as("week"))
      .distinct()
    val cohort = wk.groupBy(col("user_id")).agg(min(col("week")).as("cohort_week"))
    wk.join(cohort, Seq("user_id"))
      .groupBy(col("cohort_week"),
        (col("week") - col("cohort_week")).as("week_offset"))
      .agg(count(lit(1)).as("n_users"))
  }

  /** Gaps-and-islands: per-user runs of consecutive active days (the
    * row_number-difference grouping idiom). Output per user: number of
    * distinct active days, number of streaks, and the longest streak.
    * Scale: day-distinct then one user-partitioned window — group size
    * is bounded by days, not events. */
  def activityStreaks(events: DataFrame): DataFrame = {
    val days = events.select(col("user_id"),
      floor(unix_timestamp(col("ts")) / 86400).cast("long").as("day"))
      .distinct()
    val rn = row_number().over(
      Window.partitionBy(col("user_id")).orderBy(col("day")))
    days.withColumn("grp", col("day") - rn)
      .groupBy(col("user_id"), col("grp"))
      .agg(count(lit(1)).as("len"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_streaks"),
        max(col("len")).as("longest_streak"),
        sum(col("len")).as("n_active_days"))
  }

  /** RFM (recency/frequency/monetary) customer segmentation over purchase
    * events: "now" is the corpus max purchase time (a one-row broadcast),
    * monetary goes through the DECIMAL detour, and the three 1..5 scores
    * are exact ntile buckets under total orders (user_id tie-break) —
    * score 1 = most recent / most frequent / highest spend.
    *
    * Scale shape: NO global ntile windows (one row per purchasing user is
    * still fact-scale cardinality — at 100× every user would land on one
    * task, three times). Each score is `Scale.binnedGlobalRank` +
    * `Scale.ntileFromRank`: integer metrics bin on their own bounded value
    * domain (distinct recency days / frequencies), the continuous monetary
    * metric bins into 4096 fixed-width cells from a broadcast min/max;
    * ranks assemble from broadcast bin prefix-sums + partitioned in-bin
    * row numbers, and the ntile arithmetic is map-side. */
  def rfmSegments(events: DataFrame): DataFrame = {
    val p = events.filter(col("event_type") === "purchase")
      .select(col("user_id"), unix_timestamp(col("ts")).as("s"), col("value"))
    val now = p.agg(max(col("s")).as("now_s"))
    val per = p.groupBy(col("user_id")).agg(
      max(col("s")).as("last_s"),
      count(lit(1)).as("frequency"),
      sum(col("value").cast("decimal(18,4)")).cast("double").as("monetary"))
    // one broadcast row: user count + monetary bin range (chaining three
    // independent binnedGlobalRank calls would re-derive the upstream in
    // every offset branch — 2^3 plan copies; this form computes all three
    // offset maps from ONE pass over base, so base appears exactly twice)
    val stats = per.agg(count(lit(1)).as("__n"),
      min(col("monetary")).as("__mlo"), max(col("monetary")).as("__mhi"))
    val base = per.crossJoin(broadcast(now))
      .withColumn("recency_days", expr("(now_s - last_s) div 86400"))
      .crossJoin(broadcast(stats))
    val mWidth = greatest((col("__mhi") - col("__mlo")) / lit(4096.0),
      lit(1e-9))
    val binned = base
      .withColumn("__rbin", col("recency_days"))
      .withColumn("__fbin", col("frequency"))
      .withColumn("__mbin",
        least(floor((col("monetary") - col("__mlo")) / mWidth), lit(4095))
          .cast("long"))
    // all three bin-count maps in one exploded aggregation; the prefix-sum
    // window is partitioned by metric and ordered by a per-metric signed
    // key (recency ranks ascending, frequency/monetary descending)
    val counts = binned.select(explode(array(
      struct(lit("r").as("m"), col("__rbin").as("bin")),
      struct(lit("f").as("m"), col("__fbin").as("bin")),
      struct(lit("m").as("m"), col("__mbin").as("bin")))).as("x"))
      .select(col("x.m").as("m"), col("x.bin").as("bin"))
      .groupBy(col("m"), col("bin")).agg(count(lit(1)).as("cnt"))
    val wOff = Window.partitionBy(col("m"))
      .orderBy(when(col("m") === "r", col("bin")).otherwise(-col("bin")))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offs = counts
      .withColumn("off", coalesce(sum(col("cnt")).over(wOff), lit(0L)))
    def offMap(metric: String, binName: String, offName: String) =
      broadcast(offs.filter(col("m") === metric)
        .select(col("bin").as(binName), col("off").as(offName)))
    def inBin(binName: String, ord: Seq[org.apache.spark.sql.Column]) =
      row_number().over(Window.partitionBy(col(binName)).orderBy(ord: _*))
    val ranked = binned
      .join(offMap("r", "__rbin", "__roff"), Seq("__rbin"))
      .join(offMap("f", "__fbin", "__foff"), Seq("__fbin"))
      .join(offMap("m", "__mbin", "__moff"), Seq("__mbin"))
      .withColumn("__r_rank", col("__roff") +
        inBin("__rbin", Seq(col("recency_days").asc, col("user_id").asc)))
      .withColumn("__f_rank", col("__foff") +
        inBin("__fbin", Seq(col("frequency").desc, col("user_id").asc)))
      .withColumn("__m_rank", col("__moff") +
        inBin("__mbin", Seq(col("monetary").desc, col("user_id").asc)))
    ranked.select(col("user_id"), col("recency_days"), col("frequency"),
      col("monetary"),
      graft.ops.Scale.ntileFromRank(col("__r_rank"), col("__n"), 5)
        .as("r_score"),
      graft.ops.Scale.ntileFromRank(col("__f_rank"), col("__n"), 5)
        .as("f_score"),
      graft.ops.Scale.ntileFromRank(col("__m_rank"), col("__n"), 5)
        .as("m_score"))
  }

  /** Median-threshold anomaly flags: an event is anomalous when its value
    * exceeds twice its user's (upper-)median value. The median is the
    * deterministic rank-select idiom (rn = n div 2 + 1 under a
    * (value, event_id) total order — an exact element, never an
    * interpolated float). Scale: one user-partitioned window + one
    * equi-join back on user_id. */
  def anomalyFlags(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("value"), col("event_id"))
    val med = events
      .withColumn("__rn", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(Window.partitionBy(col("user_id"))))
      .filter(col("__rn") === expr("__n div 2") + 1)
      .select(col("user_id"), col("value").as("med"))
    events.join(med, Seq("user_id"))
      .select(col("user_id"), col("event_id"), col("value"), col("med"),
        (col("value") > lit(2) * col("med")).as("is_anomaly"))
  }

  // ---- Structured Streaming entry points ----------------------------------

  /** File-source stream over an events directory (parquet), no watermark
    * yet — for operators that watermark per-branch (stream-stream joins
    * re-watermark renamed event-time columns, and Spark forbids
    * redefining an inherited one). */
  def readEventStreamRaw(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(eventsRawSchema).parquet(dir)

  /** File-source stream over an events directory (parquet), 10-minute
    * watermark. */
  def readEventStream(spark: SparkSession, dir: String): DataFrame =
    readEventStreamRaw(spark, dir).withWatermark("ts", "10 minutes")

  /** Streaming tumbling window aggregation (event-time, watermarked) —
    * the streaming twin of [[tumblingAgg]], keyed identically so results
    * can be compared after `processAllAvailable`. */
  def streamingTumblingAgg(stream: DataFrame): DataFrame =
    stream
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,4)")).cast("double").as("total"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("hour"),
        col("event_type"), col("n"), col("total"))

  /** Streaming keyed dedup within the watermark. */
  def streamingDedup(stream: DataFrame): DataFrame =
    stream.dropDuplicatesWithinWatermark("user_id", "event_type")

  /** Click→purchase attribution interval join (batch form): purchases by
    * the same user within `windowSeconds` after a click. lag_sec is the
    * whole-second event-time gap. */
  def intervalJoin(events: DataFrame, windowSeconds: Long = 600): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"),
        col("ts").as("click_ts"))
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"),
        col("ts").as("purchase_ts"))
    clicks.join(purchases, Seq("user_id"))
      .filter(col("purchase_ts") >= col("click_ts")
        && col("purchase_ts") < col("click_ts")
          + expr(s"INTERVAL $windowSeconds SECONDS"))
      .select(col("user_id"), col("click_id"), col("purchase_id"),
        (unix_timestamp(col("purchase_ts")) - unix_timestamp(col("click_ts")))
          .as("lag_sec"))
  }

  /** U-shaped MULTI-touch attribution: every click in the `windowSeconds`
    * lookback before a purchase gets a deterministic ppm credit share —
    * 100% for a single touch, 50/50 for two, else 40% first + 40% last +
    * 20% split evenly over the middles (integer division; the ≤(n-3) ppm
    * rounding shortfall is documented, not smeared). The position-aware
    * complement of [[asOfAttribution]]'s last-touch and
    * [[decayScores]]'s exponential decay.
    *
    * Scale: the lookback pairing is the [[intervalJoin]] equi-join on
    * user; the position windows partition on purchase_id — a
    * high-cardinality key whose group size is bounded by
    * clicks-per-user-per-window, never a corpus-wide or small-domain
    * partition. Output: (user_id, purchase_id, click_id, touch_pos,
    * n_touch, credit_ppm). */
  def multiTouchAttribution(
      events: DataFrame, windowSeconds: Long = 600): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("purchase_id"))
    val paired = intervalJoin(events, windowSeconds)
      .withColumn("touch_pos", row_number().over(
        w.orderBy(col("lag_sec").desc, col("click_id"))).cast("long"))
      .withColumn("n_touch", count(lit(1)).over(w))
    paired.select(col("user_id"), col("purchase_id"), col("click_id"),
      col("touch_pos"), col("n_touch"),
      when(col("n_touch") === 1, lit(1000000L))
        .when(col("n_touch") === 2, lit(500000L))
        .when(col("touch_pos") === 1 || col("touch_pos") === col("n_touch"),
          lit(400000L))
        .otherwise(expr("200000 div (n_touch - 2)"))
        .as("credit_ppm"))
  }

  /** Click→purchase AS-OF attribution: each purchase is matched to the
    * LATEST click by the same user at-or-before the purchase instant
    * (last-touch attribution — vs [[intervalJoin]]'s every-click-in-window
    * fan-out). Clicks are pre-deduped to one per (user, instant) by max
    * event_id, the determinism contract of [[graft.ops.TemporalJoins.asOfJoin]].
    * Left semantics: purchases with no prior click keep null click_id /
    * lag_sec. */
  def asOfAttribution(events: DataFrame): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .groupBy(col("user_id"), col("ts"))
      .agg(max(col("event_id")).as("click_id"))
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id").as("purchase_id"))
    graft.ops.TemporalJoins.asOfJoin(purchases, clicks, "user_id", "ts")
      .select(col("user_id"), col("purchase_id"), col("click_id"),
        (unix_timestamp(col("ts")) - unix_timestamp(col("ts_right")))
          .as("lag_sec"))
  }

  /** Forward as-of: every click attributed to the NEXT purchase at or
    * after it (time-to-convert measurement) — the mirror of
    * [[asOfAttribution]], on [[graft.ops.TemporalJoins.asOfJoinForward]].
    * Clicks are the probe side; purchases are deduplicated per (user, ts)
    * as the forward-asof determinism contract requires. */
  def asOfNextPurchase(events: DataFrame): DataFrame = {
    val purchases = events.filter(col("event_type") === "purchase")
      .groupBy(col("user_id"), col("ts"))
      .agg(max(col("event_id")).as("purchase_id"))
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id").as("click_id"))
    graft.ops.TemporalJoins.asOfJoinForward(clicks, purchases, "user_id", "ts")
      .select(col("user_id"), col("click_id"), col("purchase_id"),
        (unix_timestamp(col("ts_right")) - unix_timestamp(col("ts")))
          .as("wait_sec"))
  }

  /** Nearest-click match: every purchase paired with the temporally
    * CLOSEST click of the same user — either direction, ties to the
    * earlier click (session reconstruction when attribution order is
    * unknown), on [[graft.ops.TemporalJoins.asOfJoinNearest]]. `delta_us`
    * is signed exact microseconds (purchase − click): positive = the
    * nearest click preceded the purchase. Clicks are pre-deduped per
    * (user, instant) as the nearest-asof determinism contract requires. */
  def nearestClickMatch(events: DataFrame): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .groupBy(col("user_id"), col("ts"))
      .agg(max(col("event_id")).as("click_id"))
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id").as("purchase_id"))
    graft.ops.TemporalJoins.asOfJoinNearest(purchases, clicks, "user_id", "ts")
      .select(col("user_id"), col("purchase_id"), col("click_id"),
        (unix_micros(col("ts")) - unix_micros(col("ts_right")))
          .as("delta_us"))
  }

  /** Dyadic recency-decayed engagement score: over each user's most
    * recent `w` events (by (ts, event_id) descending), the weighted sum
    * Σ v_q · 2^(w−r) where r = recency rank (newest = 1) and v_q is the
    * value quantized to exact 1e-4 units through DECIMAL(18,4). A power-
    * of-two decay (α = 1/2 per step) keeps every term an exact BIGINT —
    * no float pow, engine-replicable bit-for-bit. With w = 16 the largest
    * multiplier is 2^15; |v_q| ≤ 10^7 for |value| ≤ 10^3, so the per-user
    * sum stays ≤ ~5·10^12 ≪ 2^63.
    *
    * Scale: one user-keyed shuffle; the rank window is user-partitioned
    * and the sum is a partial agg on the same partitioning. */
  def decayScore(events: DataFrame, w: Int = 16): DataFrame = {
    val rw = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").desc, col("event_id").desc)
    events
      .withColumn("rn", row_number().over(rw))
      .filter(col("rn") <= w)
      .withColumn("vq",
        (col("value").cast("decimal(18,4)") * 10000).cast("long"))
      .groupBy(col("user_id"))
      .agg(
        sum(col("vq") *
          expr(s"shiftleft(CAST(1 AS BIGINT), CAST($w - rn AS INT))"))
          .as("decay_q"),
        count(lit(1)).as("n_recent"))
  }

  /** Event-type transition matrix (first-order Markov counts): adjacent
    * (event, next-event) pairs in each user's (ts, event_id) order, with
    * the per-source transition probability in fixed-point ppm (see the
    * Relevance module scaladoc for why scores avoid floats). Scale: one
    * shuffle on user_id for adjacency, one hash agg on the (from, to)
    * pair, one window over the TYPE domain (bounded, tiny). */
  def eventTransitions(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    events
      .withColumn("next_type", lead(col("event_type"), 1).over(w))
      .filter(col("next_type").isNotNull)
      .groupBy(col("event_type").as("from_type"), col("next_type").as("to_type"))
      .agg(count(lit(1)).as("n"))
      .withColumn("p_ppm", expr(
        "(n * 1000000) div sum(n) over (partition by from_type)"))
  }

  /** Fixed-round Markov power iteration over the event-type transition
    * matrix: start uniform (10⁶ div T ppm per type), then
    * p′_j = Σ_i p_i·P_ij div 10⁶ per round — all integer, so engine and a
    * generator-unrolled oracle agree bit-for-bit (the fixed-round
    * contract of kCore/weightedSssp applied to a stochastic matrix). The
    * stationary estimate ranks event types by long-run visit share.
    * Scale: every frame is bounded by the TYPE domain — joins and aggs
    * are dimension-sized regardless of event volume; only the transition
    * count scans the facts (once). */
  def markovStationary(events: DataFrame, rounds: Int = 4): DataFrame = {
    val tr = eventTransitions(events)
      .select(col("from_type").as("f"), col("to_type").as("t"),
        col("p_ppm").as("pp"))
    val ty = events.select(col("event_type")).distinct()
    val tn = ty.agg(count(lit(1)).as("__t"))
    var p = ty.crossJoin(broadcast(tn))
      .select(col("event_type"), expr("1000000 div __t").as("p"))
    for (_ <- 1 to rounds) {
      p = p.join(tr, col("event_type") === col("f"))
        .groupBy(col("t"))
        .agg(expr("CAST(sum(p * pp) div 1000000 AS BIGINT)").as("p"))
        .select(col("t").as("event_type"), col("p"))
    }
    p.select(col("event_type"), col("p").as("p_ppm"))
  }

  /** Cross-key identity stitching: users sharing a device (here the
    * deterministic `props.k mod 40` stand-in) merge into one identity via
    * connected components over the bipartite user–device graph — the
    * industry identity-resolution pass BEFORE any per-identity analytics.
    * Output: per stitched identity, its member-user and event counts.
    * Scale: the edge build is one distinct projection of the facts; CC is
    * GraphX; the final rollup joins facts to the identity map on
    * user_id. */
  def identityStitch(spark: org.apache.spark.sql.SparkSession,
      events: DataFrame): DataFrame = {
    // each user's "primary device" = the k of their FIRST event (the A1
    // keep-first idiom) — one edge per user keeps the bipartite graph
    // sparse, so identities are genuine small merges, not one blob
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val ud = events
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col("user_id"),
        get_json_object(col("props"), "$.k").cast("long").as("dev"))
    val edges = ud.select((col("user_id") * 2).as("src"),
      (col("dev") * 2 + 1).as("dst"))
    val ident = graft.graph.GraphOps.connectedComponents(spark, edges)
      .filter(col("node") % 2 === 0)
      .select(expr("node div 2").as("user_id"),
        col("component").as("identity"))
    events.join(ident, Seq("user_id"))
      .groupBy(col("identity"))
      .agg(countDistinct(col("user_id")).as("n_users"),
        count(lit(1)).as("n_events"))
  }

  /** SCD2 validity intervals from an event stream: consecutive runs of
    * the same event_type per user collapse to one row with
    * [valid_from, valid_to) epoch bounds; the current (last) state has a
    * null valid_to and is_current = true. The run grouping is the
    * gaps-and-islands change-flag prefix sum; both windows shuffle once
    * on user_id. */
  def scd2Intervals(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val runs = events
      .withColumn("__chg",
        when(lag(col("event_type"), 1).over(w) <=> col("event_type"), 0)
          .otherwise(1))
      .withColumn("__run", sum(col("__chg")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("__run"))
      .agg(min(col("event_type")).as("state"),
        min(col("ts")).as("__from"))
    // order runs by their id (monotone along the event order) — min ts
    // alone could tie when a single-event run shares its timestamp with
    // the next run's first event
    val wRun = Window.partitionBy(col("user_id")).orderBy(col("__run"))
    runs
      .withColumn("__to", lead(col("__from"), 1).over(wRun))
      .select(col("user_id"), col("state"),
        unix_timestamp(col("__from")).as("valid_from"),
        unix_timestamp(col("__to")).as("valid_to"),
        col("__to").isNull.as("is_current"))
  }

  /** Stream-stream twin of [[intervalJoin]]: both sides are watermarked
    * branches of the same RAW stream (use [[readEventStreamRaw]] — the
    * branches set their own watermarks on the renamed time columns); the event-time bound in the join
    * condition lets Spark expire join state (the canonical watermarked
    * stream-stream interval join). Inner join → results are identical to
    * the batch form once all input is processed (proven in the spec). */
  def streamingIntervalJoin(
      stream: DataFrame, windowSeconds: Long = 600): DataFrame = {
    val clicks = stream.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("event_id").as("click_id"),
        col("ts").as("click_ts"))
      .withWatermark("click_ts", "10 minutes")
    val purchases = stream.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("event_id").as("purchase_id"),
        col("ts").as("purchase_ts"))
      .withWatermark("purchase_ts", "10 minutes")
    clicks.join(purchases,
      expr(s"""c_user = p_user AND purchase_ts >= click_ts
              |AND purchase_ts < click_ts + INTERVAL $windowSeconds SECONDS"""
        .stripMargin))
      .select(col("c_user").as("user_id"), col("click_id"), col("purchase_id"),
        (unix_timestamp(col("purchase_ts")) - unix_timestamp(col("click_ts")))
          .as("lag_sec"))
  }

  /** Stream-static enrichment: the streaming fact joins a STATIC dimension
    * (re-broadcast per micro-batch — no stream state, no watermark
    * required, the canonical streaming lookup shape). Works identically on
    * a batch DataFrame, so the twin equality is structural. Left join +
    * default: unmatched facts pass through, they are not dropped. */
  def enrichWithSegments(events: DataFrame, dim: DataFrame): DataFrame =
    events.join(broadcast(dim), Seq("user_id"), "left")
      .select(col("event_id"), col("user_id"), col("event_type"),
        coalesce(col("segment"), lit("unknown")).as("segment"))

  /** LEFT OUTER watermarked stream-stream interval join: clicks that never
    * convert inside the window emit with NULL purchase columns once the
    * watermark passes the window end (Spark can only declare "no match
    * ever" after event time moves on — unmatched rows near the head of the
    * stream therefore stay in state; the spec asserts inner-part equality
    * and outer-part ⊆ batch). Batch twin: [[intervalJoinLeftOuter]]. */
  def streamingIntervalJoinLeftOuter(
      stream: DataFrame, windowSeconds: Long = 600): DataFrame = {
    val clicks = stream.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("event_id").as("click_id"),
        col("ts").as("click_ts"))
      .withWatermark("click_ts", "10 minutes")
    val purchases = stream.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("event_id").as("purchase_id"),
        col("ts").as("purchase_ts"))
      .withWatermark("purchase_ts", "10 minutes")
    clicks.join(purchases,
        expr(s"""c_user = p_user AND purchase_ts >= click_ts
                |AND purchase_ts < click_ts + INTERVAL $windowSeconds SECONDS"""
          .stripMargin),
        "leftOuter")
      .select(col("c_user").as("user_id"), col("click_id"), col("purchase_id"),
        (unix_timestamp(col("purchase_ts")) - unix_timestamp(col("click_ts")))
          .as("lag_sec"))
  }

  /** Batch twin of [[streamingIntervalJoinLeftOuter]]. */
  def intervalJoinLeftOuter(
      events: DataFrame, windowSeconds: Long = 600): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"),
        col("ts").as("click_ts"))
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("event_id").as("purchase_id"),
        col("ts").as("purchase_ts"))
    clicks.join(purchases,
        col("user_id") === col("p_user")
          && col("purchase_ts") >= col("click_ts")
          && col("purchase_ts") < col("click_ts")
            + expr(s"INTERVAL $windowSeconds SECONDS"),
        "left")
      .select(col("user_id"), col("click_id"), col("purchase_id"),
        (unix_timestamp(col("purchase_ts")) - unix_timestamp(col("click_ts")))
          .as("lag_sec"))
  }

  /** Streaming sessionization via session_window (5-minute gap). */
  def streamingSessionize(stream: DataFrame): DataFrame =
    stream
      .groupBy(session_window(col("ts"), "5 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        unix_timestamp(col("session_window.start")).as("session_start"),
        col("n_events"))

  /** Streaming exact dedup via `dropDuplicatesWithinWatermark`: state
    * holds one entry per key seen inside the watermark horizon and is
    * PURGED once the watermark passes it — plain streaming
    * `dropDuplicates` keeps every key forever (the classic unbounded-
    * state OOM), so within-watermark is the only form that survives an
    * unbounded stream. At-least-once upstream delivery (file-source
    * replay, queue redelivery) becomes exactly-once downstream provided
    * the redelivery lands within the watermark; the first arrival wins
    * and is emitted once, in append mode. */
  def streamingDedup(stream: DataFrame, keys: Seq[String],
      watermark: String = "10 minutes"): DataFrame =
    stream.withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark(keys.head, keys.tail: _*)

  /** Exactly-once parquet sink via foreachBatch: each micro-batch is
    * written under its batch id (idempotent on replay — a restarted query
    * re-runs the last uncommitted batch and OVERWRITES the same directory,
    * never duplicating). Checkpointed; restart-safe (proven in the spec). */
  def streamToParquet(
      agg: DataFrame, outDir: String, checkpointDir: String): org.apache.spark.sql.streaming.StreamingQuery =
    agg.writeStream
      .outputMode("update")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        batch.write.mode("overwrite").parquet(s"$outDir/batch_$batchId")
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()

  // ---- custom state: flatMapGroupsWithState ------------------------------

  case class RollEvent(
      user_id: Long, ts: java.sql.Timestamp, event_id: Long, value: Double)
  case class RollEntry(us: Long, event_id: Long, value: Double)
  case class RollState(recent: List[RollEntry])
  case class RollOut(user_id: Long, event_id: Long, roll_n: Long,
      roll_sum: Double, roll_min: Double, roll_max: Double)

  /** Stateful streaming twin of [[rollingStats]]: per-user state is ONLY
    * the last w−1 events (O(w) per key, bounded), kept in (event-time,
    * event_id) order; each arriving event emits its trailing-window row.
    * The sum replicates the batch DECIMAL(18,4) detour (BigDecimal
    * HALF_UP at scale 4 — the same rounding Spark's double→decimal cast
    * applies), so streamed rows equal batch rows bit-for-bit when input
    * arrives in order. Cross-batch out-of-order arrival diverges from
    * the batch twin for the already-emitted later rows (they are not
    * retracted) — the same append-mode contract as [[statefulFunnel]];
    * a late event still gets ITS correct window while its predecessors
    * remain buffered. Idle per-user state expires one hour of EVENT TIME
    * past that user's newest event (clamped past the watermark) — a user
    * resuming after a longer gap restarts with an empty buffer, so the
    * bit-for-bit claim holds within any stretch of activity without a
    * 1h+ event-time gap. */
  // ---- state-v2: transformWithState ------------------------------------

  case class TwsEvent(
      user_id: Long, ts: java.sql.Timestamp, event_id: Long,
      event_type: String)
  case class TwsOut(user_id: Long, event_id: Long, n_distinct_types: Long)

  /** Stateful processor for [[statefulDistinctTypes]]: per-user running
    * distinct event-type count on the state-v2 API — a MapState holds the
    * seen-type SET (per-entry point lookups/puts against the state store,
    * vs mapGroupsWithState's whole-value deserialize-reserialize per
    * trigger: the reason the new API scales to large per-key state) and a
    * ValueState carries the count so emission never iterates the map. */
  private class DistinctTypesProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Long, TwsEvent, TwsOut] {
    import org.apache.spark.sql.streaming.{TTLConfig, TimeMode, OutputMode}
    import org.apache.spark.sql.{Encoders => E}
    @transient private var seen
      : org.apache.spark.sql.streaming.MapState[String, Boolean] = _
    @transient private var nTypes
      : org.apache.spark.sql.streaming.ValueState[Long] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      seen = getHandle.getMapState[String, Boolean](
        "seen", E.STRING, E.scalaBoolean, TTLConfig.NONE)
      nTypes = getHandle.getValueState[Long](
        "n", E.scalaLong, TTLConfig.NONE)
    }
    override def handleInputRows(
        key: Long, rows: Iterator[TwsEvent],
        tv: org.apache.spark.sql.streaming.TimerValues): Iterator[TwsOut] = {
      // in-batch (ts, event_id) order so running counts are deterministic
      val sorted = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
      var n = if (nTypes.exists()) nTypes.get() else 0L
      val out = sorted.map { e =>
        if (!seen.containsKey(e.event_type)) {
          seen.updateValue(e.event_type, true)
          n += 1
        }
        TwsOut(e.user_id, e.event_id, n)
      }
      nTypes.update(n)
      out.iterator
    }
  }

  /** Per-user running distinct event-type count via `transformWithState`
    * (Spark 4 state-v2; requires the RocksDB state store provider).
    * Each arriving event emits its user's distinct-type count INCLUDING
    * itself, in append mode. Streamed rows equal the batch twin
    * [[distinctTypesRunning]] row-for-row when input arrives in order
    * (the [[statefulRollingStats]] contract); state is O(types) per user
    * with point lookups, never a full-value rewrite. */
  def statefulDistinctTypes(
      stream: DataFrame): org.apache.spark.sql.Dataset[TwsOut] = {
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    val spark = stream.sparkSession
    import spark.implicits._
    stream
      .selectExpr("user_id", "ts", "event_id", "event_type")
      .as[TwsEvent]
      .groupByKey(_.user_id)
      .transformWithState(new DistinctTypesProcessor,
        TimeMode.None(), OutputMode.Append())
  }

  /** Batch twin of [[statefulDistinctTypes]]: first-occurrence flag per
    * (user, type), running sum in (ts, event_id) order — both windows
    * user-keyed. */
  def distinctTypesRunning(events: DataFrame): DataFrame = {
    val wFirst = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("ts"), col("event_id"))
    val wRun = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .withColumn("is_first",
        when(row_number().over(wFirst) === 1, 1L).otherwise(0L))
      .select(col("user_id"), col("event_id"),
        sum(col("is_first")).over(wRun).as("n_distinct_types"))
  }

  def statefulRollingStats(stream: DataFrame, w: Int = 5): org.apache.spark.sql.Dataset[RollOut] = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = stream.sparkSession
    import spark.implicits._

    def us(t: java.sql.Timestamp): Long =
      t.toInstant.getEpochSecond * 1000000L + t.toInstant.getNano / 1000L
    def dec(v: Double): BigDecimal =
      BigDecimal.decimal(v).setScale(4, BigDecimal.RoundingMode.HALF_UP)

    def fn(userId: Long, events: Iterator[RollEvent],
        state: GroupState[RollState]): Iterator[RollOut] = {
      if (state.hasTimedOut) { state.remove(); Iterator.empty }
      else {
        val incoming = events.toSeq.map(_.copy())
          .sortBy(e => (us(e.ts), e.event_id))
        var buf = state.getOption.map(_.recent).getOrElse(Nil)
        val out = incoming.map { e =>
          buf = (buf :+ RollEntry(us(e.ts), e.event_id, e.value))
            .sortBy(x => (x.us, x.event_id)).takeRight(w)
          val vals = buf.map(_.value)
          RollOut(userId, e.event_id, vals.size.toLong,
            vals.map(dec).sum.toDouble, vals.min, vals.max)
        }
        state.update(RollState(buf.takeRight(w - 1)))
        // arm off the newest event time clamped past the watermark (as the
        // sessionize/funnel siblings) — watermark-relative arming alone
        // would land at epoch+1h on the first trigger (watermark 0) and
        // then expire every quiet key as soon as the watermark jumps,
        // dropping its w-1 buffer mid-stream
        val maxUs = incoming.map(e => us(e.ts)).max
        state.setTimeoutTimestamp(math.max(
          maxUs / 1000L + 3600000L, state.getCurrentWatermarkMs() + 1))
        out.iterator
      }
    }

    stream.selectExpr("user_id", "ts", "event_id", "value").as[RollEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(fn)
  }

  case class SessEvent(user_id: Long, ts: java.sql.Timestamp)
  case class SessState(startUs: Long, lastUs: Long, n: Long)
  case class Session(user_id: Long, session_start: Long, n_events: Long)

  /** Custom stateful sessionization with flatMapGroupsWithState: per-user
    * state carries the open session; an event-time timeout (watermark past
    * last-event + gap) closes and emits it. The hand-rolled equivalent of
    * session_window, for when session logic needs arbitrary state (the
    * `KeyValueGroupedDataset` custom-state surface). */
  def statefulSessionize(
      stream: DataFrame, gapSeconds: Long = 300): org.apache.spark.sql.Dataset[Session] = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = stream.sparkSession
    import spark.implicits._
    val gapUs = gapSeconds * 1000000L

    def us(t: java.sql.Timestamp): Long =
      t.toInstant.getEpochSecond * 1000000L + t.toInstant.getNano / 1000L

    def fn(userId: Long, events: Iterator[SessEvent],
        state: GroupState[SessState]): Iterator[Session] = {
      val sorted = events.toSeq.map(e => e.copy()).sortBy(e => us(e.ts))
      var out = List.empty[Session]
      var cur = state.getOption
      sorted.foreach { e =>
        val t = us(e.ts)
        cur match {
          case Some(st) if t - st.lastUs <= gapUs =>
            cur = Some(st.copy(lastUs = math.max(st.lastUs, t), n = st.n + 1))
          case Some(st) =>
            out ::= Session(userId, st.startUs / 1000000L, st.n)
            cur = Some(SessState(t, t, 1))
          case None =>
            cur = Some(SessState(t, t, 1))
        }
      }
      if (state.hasTimedOut) {
        val st = state.get
        state.remove()
        Iterator(Session(userId, st.startUs / 1000000L, st.n))
      } else {
        cur.foreach { st =>
          state.update(st)
          // clamp past the current watermark: a late event could otherwise
          // request a timeout at-or-before it, which Spark rejects and
          // fails the query
          state.setTimeoutTimestamp(math.max(
            st.lastUs / 1000L + gapSeconds * 1000L,
            state.getCurrentWatermarkMs() + 1))
        }
        out.reverseIterator
      }
    }

    // the watermarked ts column flows through unchanged — required for
    // event-time timeouts
    stream
      .select(col("user_id"), col("ts"))
      .as[SessEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(fn)
  }

  case class FunnelEvent(user_id: Long, ts: java.sql.Timestamp, event_type: String)
  case class FunnelState(v: Long, c: Long, p: Long) // first-stage epoch-µs, -1 unset
  case class FunnelRow(user_id: Long, first_view: Long, first_click: Option[Long],
      first_purchase: Option[Long], stage: Int)

  /** Streaming twin of [[funnel]]: per-user causal state machine via
    * flatMapGroupsWithState. State exists only once a view is seen (clicks
    * before the first view never count, like the batch form). Within a
    * micro-batch, events sort by time with view < click < purchase ties,
    * matching the batch `>=` comparisons exactly. CAVEAT — cross-batch
    * out-of-order arrival diverges from the batch twin: a click whose
    * event-time is at/after the first view but which is DELIVERED in an
    * earlier micro-batch than that view is dropped (no state exists yet),
    * while the batch funnel, seeing all events at once, counts it. In-order
    * delivery (e.g. the file source, or any source respecting event time
    * within the watermark) is exact.
    *
    * Per-user state expires after `idleGapHours` of event time with no
    * activity (event-time timeout — requires a watermarked `ts`, as
    * [[readEventStream]] provides): without it, one state entry per
    * ever-seen user accumulates forever. Funnel rows already emitted are
    * unaffected by expiry; a user re-appearing later restarts the funnel.
    *
    * Emits the user's current funnel row whenever it advances (update
    * semantics — stage and stamps are monotone, so the max-stage row per
    * user is the final answer). */
  def statefulFunnel(stream: DataFrame,
      idleGapHours: Long = 24): org.apache.spark.sql.Dataset[FunnelRow] = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = stream.sparkSession
    import spark.implicits._

    def us(t: java.sql.Timestamp): Long =
      t.toInstant.getEpochSecond * 1000000L + t.toInstant.getNano / 1000L
    val prio = Map("view" -> 0, "click" -> 1, "purchase" -> 2)

    def fn(userId: Long, events: Iterator[FunnelEvent],
        state: GroupState[FunnelState]): Iterator[FunnelRow] = {
      if (state.hasTimedOut) { state.remove(); return Iterator.empty }
      val sorted = events.toSeq
        .sortBy(e => (us(e.ts), prio.getOrElse(e.event_type, 3)))
      // arm/refresh the idle-expiry clock off the newest event seen this
      // batch, clamped past the watermark (Spark rejects timeouts ≤ it)
      val maxUs = sorted.iterator.map(e => us(e.ts)).foldLeft(0L)(math.max)
      def armTimeout(): Unit =
        state.setTimeoutTimestamp(math.max(
          maxUs / 1000L + idleGapHours * 3600L * 1000L,
          state.getCurrentWatermarkMs() + 1))
      val before = state.getOption
      var st = before.getOrElse(FunnelState(-1, -1, -1))
      sorted.foreach { e =>
        val t = us(e.ts)
        e.event_type match {
          case "view" if st.v < 0 => st = st.copy(v = t)
          case "click" if st.v >= 0 && st.c < 0 && t >= st.v =>
            st = st.copy(c = t)
          case "purchase" if st.c >= 0 && st.p < 0 && t >= st.c =>
            st = st.copy(p = t)
          case _ =>
        }
      }
      if (st.v < 0 || before.contains(st)) {
        if (state.exists) armTimeout() // keep live state on expiry clock
        Iterator.empty
      } else {
        state.update(st)
        armTimeout()
        val opt = (x: Long) => if (x >= 0) Some(x / 1000000L) else None
        Iterator(FunnelRow(userId, st.v / 1000000L, opt(st.c), opt(st.p),
          1 + (if (st.c >= 0) 1 else 0) + (if (st.p >= 0) 1 else 0)))
      }
    }

    stream
      .select(col("user_id"), col("ts"), col("event_type"))
      .as[FunnelEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(
        OutputMode.Update, GroupStateTimeout.EventTimeTimeout)(fn)
  }
}
