package graft.queries

import graft.Q
import graft.core.Tables
import graft.streaming.EventStreams

/** Event-stream queries in their batch form (the driver's oracle runs
  * batch SQL); the streaming twins (watermarks, dropDuplicatesWithin-
  * Watermark, session_window) are exercised in EventStreamsSpec. */
object EventQueries {

  val evTumbling = Q(
    "ev_tumbling",
    """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
      |  event_type, COUNT(*) AS n,
      |  CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total
      |FROM events GROUP BY 1, 2""".stripMargin) { (s, d) =>
    EventStreams.tumblingAgg(Tables.events(s, d))
  }

  val evSliding = Q(
    "ev_sliding",
    """WITH w AS (SELECT event_type, value,
      |    CAST(floor(epoch(ts) / 300) * 300 AS BIGINT) AS base FROM events),
      |x AS (SELECT event_type, value,
      |    unnest([base - 300, base]) AS window_start FROM w)
      |SELECT window_start, event_type, COUNT(*) AS n,
      |  CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total
      |FROM x GROUP BY 1, 2""".stripMargin) { (s, d) =>
    EventStreams.slidingAgg(Tables.events(s, d))
  }

  val evSessionize = Q(
    "ev_sessionize",
    """WITH e AS (SELECT user_id, event_id, epoch(ts) AS t FROM events),
      |l AS (SELECT user_id, event_id, t,
      |    lag(t) OVER (PARTITION BY user_id ORDER BY t, event_id) AS prev FROM e),
      |m AS (SELECT user_id, event_id, t,
      |    CASE WHEN prev IS NULL OR t - prev > 300 THEN 1 ELSE 0 END AS ns FROM l),
      |s AS (SELECT user_id, t,
      |    SUM(ns) OVER (PARTITION BY user_id ORDER BY t, event_id
      |                  ROWS UNBOUNDED PRECEDING) AS sid FROM m)
      |SELECT user_id, CAST(floor(MIN(t)) AS BIGINT) AS session_start,
      |  COUNT(*) AS n_events
      |FROM s GROUP BY user_id, sid""".stripMargin) { (s, d) =>
    EventStreams.sessionize(Tables.events(s, d))
  }

  val evFirstPerKey = Q(
    "ev_first_per_key",
    """SELECT user_id, event_type, event_id,
      |  CAST(floor(epoch(ts)) AS BIGINT) AS first_epoch
      |FROM events
      |QUALIFY row_number() OVER (PARTITION BY user_id, event_type
      |  ORDER BY ts, event_id) = 1""".stripMargin) { (s, d) =>
    EventStreams.firstEventPerKey(Tables.events(s, d))
  }

  /** Click→purchase interval join — the batch form of the watermarked
    * stream-stream join (streaming twin proven equivalent in
    * EventStreamsSpec). */
  val evIntervalJoin = Q(
    "ev_interval_join",
    """WITH c AS (SELECT user_id, event_id AS click_id, ts AS click_ts
      |  FROM events WHERE event_type = 'click'),
      |p AS (SELECT user_id, event_id AS purchase_id, ts AS purchase_ts
      |  FROM events WHERE event_type = 'purchase')
      |SELECT c.user_id, click_id, purchase_id,
      |  CAST(floor(epoch(purchase_ts)) - floor(epoch(click_ts)) AS BIGINT)
      |    AS lag_sec
      |FROM c JOIN p ON c.user_id = p.user_id
      |  AND purchase_ts >= click_ts
      |  AND purchase_ts < click_ts + INTERVAL 600 SECONDS""".stripMargin) {
    (s, d) => EventStreams.intervalJoin(Tables.events(s, d))
  }

  /** Last-touch attribution as-of join — oracle is DuckDB's native
    * ASOF LEFT JOIN (inclusive >=), an independent implementation of the
    * same semantics as the union-window form in TemporalJoins.asOfJoin. */
  val evAsofJoin = Q(
    "ev_asof_join",
    """WITH c AS (SELECT user_id, ts, max(event_id) AS click_id FROM events
      |  WHERE event_type = 'click' GROUP BY 1, 2),
      |p AS (SELECT user_id, ts, event_id AS purchase_id FROM events
      |  WHERE event_type = 'purchase')
      |SELECT p.user_id, p.purchase_id, c.click_id,
      |  CAST(floor(epoch(p.ts)) - floor(epoch(c.ts)) AS BIGINT) AS lag_sec
      |FROM p ASOF LEFT JOIN c
      |  ON p.user_id = c.user_id AND p.ts >= c.ts""".stripMargin) { (s, d) =>
    EventStreams.asOfAttribution(Tables.events(s, d))
  }

  /** Causally-ordered view→click→purchase funnel (click counts only
    * at-or-after the first view, purchase only at-or-after that click). */
  val evFunnel = Q(
    "ev_funnel",
    """WITH v AS (SELECT user_id, MIN(ts) AS vts FROM events
      |           WHERE event_type = 'view' GROUP BY 1),
      |c AS (SELECT e.user_id, MIN(e.ts) AS cts FROM events e JOIN v USING (user_id)
      |      WHERE e.event_type = 'click' AND e.ts >= v.vts GROUP BY 1),
      |p AS (SELECT e.user_id, MIN(e.ts) AS pts FROM events e JOIN c USING (user_id)
      |      WHERE e.event_type = 'purchase' AND e.ts >= c.cts GROUP BY 1)
      |SELECT v.user_id,
      |  CAST(floor(epoch(v.vts)) AS BIGINT) AS first_view,
      |  CAST(floor(epoch(c.cts)) AS BIGINT) AS first_click,
      |  CAST(floor(epoch(p.pts)) AS BIGINT) AS first_purchase,
      |  1 + CAST(c.user_id IS NOT NULL AS INTEGER)
      |    + CAST(p.user_id IS NOT NULL AS INTEGER) AS stage
      |FROM v LEFT JOIN c ON v.user_id = c.user_id
      |       LEFT JOIN p ON v.user_id = p.user_id""".stripMargin) { (s, d) =>
    EventStreams.funnel(Tables.events(s, d))
  }

  val all: Seq[Q] = Seq(evTumbling, evSliding, evSessionize, evFirstPerKey, evFunnel,
    evIntervalJoin, evAsofJoin)
}
