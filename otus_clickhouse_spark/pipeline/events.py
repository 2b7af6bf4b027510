"""Event-stream episode construction + rate monitoring (batch).

The events table is the interaction log a conversational-training
pipeline turns into episodes: sessionize by inactivity gap, then reduce
per-episode and per-user — the batch complement of the streaming
session windows (T6/q51). All windows are keyed per user; nothing
unpartitioned, nothing corpus-sized on the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    events: DataFrame,
    gap_sec: int = 1800,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Assign a per-user session ordinal by inactivity gap: a new
    session starts at the first event or when more than ``gap_sec``
    elapsed since the previous one. The lag + running-sum pair runs in
    ONE keyed window (unique (ts, id) ordering, so RANGE == ROWS);
    adds ``session_seq``."""
    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    es = F.unix_timestamp(F.col(ts_col))
    new_s = (
        F.lag(es).over(w).isNull() | ((es - F.lag(es).over(w)) > gap_sec)
    ).cast("int")
    return events.withColumn("session_seq", F.sum(new_s).over(w))


def session_stats(
    events: DataFrame,
    gap_sec: int = 1800,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
    round_at: int = 4,
) -> DataFrame:
    """Per-user episode summary after :func:`sessionize`: session count,
    event totals, mean/max events per session, mean session duration,
    value total — the shape/quality sheet for episode construction
    (too-short or too-bursty users get gated before training). Two
    grouped reductions after the keyed window; output is user-sized."""
    s = sessionize(events, gap_sec, user_col, ts_col, id_col)
    es = F.unix_timestamp(F.col(ts_col))
    per_session = s.groupBy(user_col, "session_seq").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_ev"),
        (F.max(es) - F.min(es)).alias("dur"),
        F.sum(value_col).alias("val"),
    )
    return (
        per_session.groupBy(user_col)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_sessions"),
            F.sum("n_ev").cast("bigint").alias("total_events"),
            F.round(F.avg("n_ev"), round_at).alias("mean_events"),
            F.max("n_ev").cast("bigint").alias("max_events"),
            F.round(F.avg("dur"), round_at).alias("mean_duration_sec"),
            F.round(F.sum("val"), round_at).alias("total_value"),
        )
        .orderBy(user_col)
    )


def daily_rate_anomaly(
    events: DataFrame,
    z: float = 2.0,
    user_col: str = "user_id",
    ts_col: str = "ts",
    round_at: int = 4,
) -> DataFrame:
    """Per-user daily-rate spike gate: flag active days whose event
    count exceeds mean + z·std of that user's active-day counts — the
    bot/scraper screen an interaction-log pipeline runs before episodes
    become training data. Mean/std come from the exact integer
    sufficient statistics (n, Σc, Σc² — population std), so the flag
    replays bit-stably in the oracle; state is (user × active-day)
    bounded. Returns per user: (user, n_days, total_events, mean_daily,
    std_daily, n_spike_days, spike_events)."""
    daily = events.groupBy(
        F.col(user_col), F.col(ts_col).cast("date").alias("__d")
    ).agg(F.count(F.lit(1)).alias("c"))
    s = daily.groupBy(user_col).agg(
        F.count(F.lit(1)).cast("double").alias("__n"),
        F.sum("c").cast("double").alias("__sc"),
        F.sum(F.col("c") * F.col("c")).cast("double").alias("__scc"),
    )
    mean = s["__sc"] / s["__n"]
    std = F.sqrt(F.greatest(s["__n"] * s["__scc"] - s["__sc"] * s["__sc"], F.lit(0.0))) / s["__n"]
    model = s.select(
        F.col(user_col),
        F.col("__n").cast("bigint").alias("n_days"),
        F.col("__sc").cast("bigint").alias("total_events"),
        F.round(mean, round_at).alias("mean_daily"),
        F.round(std, round_at).alias("std_daily"),
        (mean + F.lit(z) * std).alias("__thr"),
    )
    return (
        daily.join(F.broadcast(model), user_col)
        .groupBy(user_col, "n_days", "total_events", "mean_daily", "std_daily")
        .agg(
            F.sum((F.col("c") > F.col("__thr")).cast("int")).cast("bigint").alias("n_spike_days"),
            F.coalesce(
                F.sum(F.when(F.col("c") > F.col("__thr"), F.col("c"))), F.lit(0)
            ).cast("bigint").alias("spike_events"),
        )
        .orderBy(user_col)
    )


def interarrival_stats(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    round_at: int = 4,
) -> DataFrame:
    """Per-user inter-event gap profile: mean gap, coefficient of
    variation, and max gap — the burstiness screen (CV >> 1 = bursty
    automation, CV ≈ 0 = metronomic bot) that complements x82's daily
    spike gate with sub-day structure. Gaps come from ONE lag window
    keyed by the high-cardinality user id (the correct sessionization
    shape); mean/CV from exact integer sufficient statistics over the
    gap seconds, so the oracle replays bit-for-bit. Users with one
    event report no gaps and drop."""
    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    es = F.unix_timestamp(F.col(ts_col))
    gaps = (
        events.withColumn("__gap", es - F.lag(es).over(w))
        .where(F.col("__gap").isNotNull())
        .select(user_col, F.col("__gap").cast("double").alias("__g"))
    )
    s = gaps.groupBy(user_col).agg(
        F.count(F.lit(1)).cast("double").alias("__n"),
        F.sum("__g").alias("__sx"),
        F.sum(F.col("__g") * F.col("__g")).alias("__sxx"),
        F.max("__g").alias("__mx"),
    )
    mean = F.col("__sx") / F.col("__n")
    std = F.sqrt(
        F.greatest(
            F.col("__n") * F.col("__sxx") - F.col("__sx") * F.col("__sx"), F.lit(0.0)
        )
    ) / F.col("__n")
    return s.select(
        F.col(user_col),
        F.col("__n").cast("bigint").alias("n_gaps"),
        F.round(mean, round_at).alias("mean_gap_sec"),
        F.round(
            F.when(F.col("__sx") > 0, std / mean).otherwise(F.lit(0.0)), round_at
        ).alias("cv_gap"),
        F.col("__mx").cast("bigint").alias("max_gap_sec"),
    ).orderBy(user_col)


def cohort_retention(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Weekly cohort-retention matrix: cohort = the ISO week (Monday
    start) of a user's FIRST event; for each (cohort_week,
    week_offset), how many cohort members were active and what fraction
    of the cohort that is. The engagement sheet an interaction-data
    pipeline reads before weighting recent cohorts in a training mix.

    Scale shape: the (user, week) activity table is one user-keyed
    distinct; first-week is a user-keyed reduce; the matrix group-by is
    (#weeks x #offsets)-bounded, and the cohort-size join back is a
    broadcast of #weeks rows. Retention is one integer division rounded
    at 4dp; week offsets are exact multiples of 7 days so the division
    by 7 is exact.
    """
    uw = events.select(
        F.col(user_col),
        F.date_trunc("week", F.col(ts_col)).cast("date").alias("__wk"),
    ).distinct()
    # cohort_week is emitted as yyyy-MM-dd text (repo-wide oracle
    # convention for date outputs; engines disagree on date dtypes)
    first = uw.groupBy(user_col).agg(F.min("__wk").alias("cohort_week"))
    act = (
        uw.join(first, user_col)
        .groupBy(
            "cohort_week",
            F.floor(F.datediff("__wk", "cohort_week") / 7)
            .cast("bigint")
            .alias("week_offset"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_users"))
    )
    sizes = act.where(F.col("week_offset") == 0).select(
        "cohort_week", F.col("n_users").alias("__cohort_size")
    )
    return (
        act.join(F.broadcast(sizes), "cohort_week")
        .select(
            F.date_format("cohort_week", "yyyy-MM-dd").alias("cohort_week"),
            "week_offset",
            "n_users",
            F.round(F.col("n_users") / F.col("__cohort_size"), 4).alias("retention"),
        )
        .orderBy("cohort_week", "week_offset")
    )


def funnel_timing(
    events: DataFrame,
    steps: tuple = ("view", "click", "purchase"),
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Sequential-funnel conversion WITH step timing: per user, the
    first ``steps[0]``, the first ``steps[1]`` strictly after it, the
    first ``steps[2]`` strictly after that; report how many users reach
    each step and the mean/max gap between consecutive steps.
    windowFunnel (q75) reports the LEVEL reached; this reports how LONG
    each transition takes — the latency profile that decides session
    gap and episode-window parameters.

    Scale shape: one user-keyed reduce per step (each conditioned on
    the previous step's timestamp via a user-keyed join — the
    sequential dependency is inherently per-user, never corpus-wide);
    the final one-row summary is a crossJoin of single-row aggregates.
    Gaps are exact integer microseconds; the mean is one division of
    integer sums.
    """
    assert len(steps) == 3
    e = events.select(F.col(user_col), F.col(type_col), F.col(ts_col))
    t1 = (
        e.where(F.col(type_col) == steps[0])
        .groupBy(user_col)
        .agg(F.min(ts_col).alias("t1"))
    )
    t2 = (
        e.where(F.col(type_col) == steps[1])
        .join(t1, user_col)
        .where(F.col(ts_col) > F.col("t1"))
        .groupBy(user_col)
        .agg(F.min(ts_col).alias("t2"), F.min("t1").alias("t1"))
    )
    t3 = (
        e.where(F.col(type_col) == steps[2])
        .join(t2.select(user_col, "t2"), user_col)
        .where(F.col(ts_col) > F.col("t2"))
        .groupBy(user_col)
        .agg(F.min(ts_col).alias("t3"), F.min("t2").alias("t2"))
    )
    # timestampdiff handles TIMESTAMP_NTZ (unix_micros does not), and
    # naive-timestamp arithmetic is timezone-free on both engines
    g12 = F.expr("timestampdiff(MICROSECOND, t1, t2)")
    g23 = F.expr("timestampdiff(MICROSECOND, t2, t3)")
    a1 = t1.agg(F.count(F.lit(1)).cast("bigint").alias("n_step1"))
    a2 = t2.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_step2"),
        F.round(F.sum(g12) / (F.count(F.lit(1)) * 1000000), 4).alias(
            "mean_gap12_sec"
        ),
        F.max(g12).alias("max_gap12_us"),
    )
    a3 = t3.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_step3"),
        F.round(F.sum(g23) / (F.count(F.lit(1)) * 1000000), 4).alias(
            "mean_gap23_sec"
        ),
        F.max(g23).alias("max_gap23_us"),
    )
    return a1.crossJoin(F.broadcast(a2)).crossJoin(F.broadcast(a3))


def activity_concentration(
    events: DataFrame,
    user_col: str = "user_id",
) -> DataFrame:
    """Contributor-concentration audit: exact Gini coefficient of
    per-user event counts plus the share of all events produced by the
    most active decile of users — the skew sheet an interaction-data
    pipeline reads before per-user caps (a Gini near 1 means a handful
    of bots dominate the corpus; capping changes everything downstream).

    EXACT, and never sorts users: the corpus reduces to per-user counts
    (user-keyed), then to a HISTOGRAM of (activity value, n_users) —
    bounded by DISTINCT activity values, not users — and both
    statistics come from integer cumulative sums over that histogram:
    a run of c users at value v starting after rank r0 contributes
    v*(c*r0 + c*(c+1)/2) to the rank-weighted sum (Gini), and the
    top-decile share takes whole runs plus the exact partial run at
    the boundary. The only window runs over histogram rows.

    Returns 1 row: ``n_users``, ``n_events``, ``gini`` (4dp),
    ``top_decile_share`` (4dp).
    """
    per_user = events.groupBy(user_col).agg(F.count(F.lit(1)).alias("__a"))
    hist = per_user.groupBy("__a").agg(F.count(F.lit(1)).alias("__c"))
    w = Window.orderBy("__a").rowsBetween(Window.unboundedPreceding, -1)
    staged = hist.select(
        F.col("__a"),
        F.col("__c"),
        F.coalesce(F.sum("__c").over(w), F.lit(0)).alias("__r0"),
    )
    # rank-weighted activity sum: sum over runs of a*(c*r0 + c(c+1)/2)
    t_term = F.col("__a") * (
        F.col("__c") * F.col("__r0")
        + F.col("__c") * (F.col("__c") + 1) / 2
    )
    totals = staged.agg(
        F.sum(F.col("__c")).alias("n"),
        F.sum(F.col("__a") * F.col("__c")).alias("s"),
        F.sum(t_term).alias("t"),
    )
    # top decile: users ranked DESC by activity = ranks > n - k with
    # k = ceil(n/10); a run [r0+1, r0+c] ascending contributes its
    # overlap with (n-k, n]
    k = F.ceil(F.col("n") / 10.0)
    cut = F.col("n") - k
    overlap = F.greatest(
        F.least(F.col("__r0") + F.col("__c"), F.col("n")) - F.greatest("__r0", cut),
        F.lit(0),
    )
    top = (
        staged.crossJoin(F.broadcast(totals.select("n")))
        .agg(F.sum(F.col("__a") * overlap).alias("top_s"))
    )
    return (
        totals.crossJoin(F.broadcast(top))
        .select(
            F.col("n").cast("bigint").alias("n_users"),
            F.col("s").cast("bigint").alias("n_events"),
            F.round(
                2 * F.col("t") / (F.col("n") * F.col("s"))
                - (F.col("n") + 1) / F.col("n"),
                4,
            ).alias("gini"),
            F.round(F.col("top_s") / F.col("s"), 4).alias("top_decile_share"),
        )
    )


def engagement_stickiness(
    events: DataFrame,
    ts_col: str = "ts",
    user_col: str = "user_id",
) -> DataFrame:
    """Per-day engagement stickiness: DAU, trailing-7-day WAU, calendar-
    month MAU, and the DAU/MAU + WAU/MAU ratios — the product-analytics
    sheet (stickiness >~ 0.2 is the classic habit bar) computed exactly,
    never by sketch.

    Scale shape: events reduce FIRST to the distinct (day, user)
    relation (one hash shuffle; |users|·|days| rows, orders of
    magnitude below event count at any scale). WAU expands that reduced
    relation map-side ×7 (each active day claims the next 6 days via
    sequence+explode — no range join, no window over users), and every
    aggregate is a count-distinct on (day-grain, user) pairs. Ratios
    divide exact integers."""
    ud = (
        events.select(F.to_date(F.col(ts_col)).alias("d"), F.col(user_col))
        .distinct()
    )
    ud = ud.localCheckpoint()  # feeds dau, wau expansion, and mau
    dau = ud.groupBy("d").agg(F.count(F.lit(1)).cast("bigint").alias("dau"))
    mau = (
        ud.select(F.trunc("d", "month").alias("m"), user_col)
        .distinct()
        .groupBy("m")
        .agg(F.count(F.lit(1)).cast("bigint").alias("mau"))
    )
    # each active (d0, user) contributes activity to days d0..d0+6;
    # restrict to OBSERVED days so the sheet has no trailing phantom days
    days = dau.select("d")
    wau = (
        ud.select(
            F.explode(
                F.sequence(F.col("d"), F.date_add(F.col("d"), 6))
            ).alias("d"),
            F.col(user_col),
        )
        .join(F.broadcast(days), "d")
        .distinct()
        .groupBy("d")
        .agg(F.count(F.lit(1)).cast("bigint").alias("wau"))
    )
    return (
        dau.join(wau, "d")
        .withColumn("m", F.trunc("d", "month"))
        .join(F.broadcast(mau), "m")
        .select(
            F.col("d").cast("string").alias("day"),
            "dau",
            "wau",
            "mau",
            F.round(F.col("dau") / F.col("mau"), 4).alias("dau_mau"),
            F.round(F.col("wau") / F.col("mau"), 4).alias("wau_mau"),
        )
        .orderBy("day")
    )


def touch_attribution(
    events: DataFrame,
    conversion_type: str = "purchase",
    gap_sec: int = 1800,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    type_col: str = "event_type",
) -> DataFrame:
    """First-touch vs last-touch conversion attribution per event type:
    sessionize the log, keep sessions containing a conversion, and
    credit (a) the session's FIRST event and (b) the LAST event
    strictly before the first conversion (the classic marketing
    attribution pair; a session that opens with the conversion has no
    last touch and credits the literal ``direct``). Ties break on the
    unique (ts, event_id) order everywhere.

    Scale shape: one user-keyed sessionize window (the same plan as
    session_stats), one (user, session) reduce to find each session's
    first event and first conversion via partial-aggregable
    min(struct(...)), one session-keyed self-join back onto the
    session's events for the pre-conversion last touch, and a
    #event-types reduce. Shuffles carry (user, session, type) triples,
    never payloads."""
    s = sessionize(events, gap_sec, user_col, ts_col, id_col).select(
        user_col, "session_seq", ts_col, id_col, type_col
    )
    s = s.localCheckpoint()  # feeds the per-session reduce AND the join back
    per = (
        s.groupBy(user_col, "session_seq")
        .agg(
            F.min(F.struct(F.col(ts_col), F.col(id_col), F.col(type_col))).alias(
                "__first"
            ),
            F.min(
                F.when(
                    F.col(type_col) == conversion_type,
                    F.struct(F.col(ts_col), F.col(id_col)),
                )
            ).alias("__conv"),
        )
        .where(F.col("__conv").isNotNull())
    )
    pre = (
        s.join(per, [user_col, "session_seq"])
        .where(
            F.struct(F.col(ts_col), F.col(id_col))
            < F.struct(F.col("__conv")[ts_col], F.col("__conv")[id_col])
        )
        .groupBy(user_col, "session_seq")
        .agg(
            F.max(F.struct(F.col(ts_col), F.col(id_col), F.col(type_col))).alias(
                "__last"
            )
        )
    )
    attributed = per.join(pre, [user_col, "session_seq"], "left").select(
        F.col("__first")[type_col].alias("first_touch"),
        F.coalesce(F.col("__last")[type_col], F.lit("direct")).alias("last_touch"),
    )
    attributed = attributed.localCheckpoint()  # two grouped consumers
    ft = attributed.groupBy(F.col("first_touch").alias(type_col)).agg(
        F.count(F.lit(1)).cast("bigint").alias("first_touch_conversions")
    )
    lt = attributed.groupBy(F.col("last_touch").alias(type_col)).agg(
        F.count(F.lit(1)).cast("bigint").alias("last_touch_conversions")
    )
    return (
        ft.join(lt, type_col, "full_outer")
        .select(
            type_col,
            F.coalesce("first_touch_conversions", F.lit(0)).cast("bigint").alias(
                "first_touch_conversions"
            ),
            F.coalesce("last_touch_conversions", F.lit(0)).cast("bigint").alias(
                "last_touch_conversions"
            ),
        )
        .orderBy(type_col)
    )


def rfm_segments(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """RFM (recency / frequency / monetary) quartile segmentation — the
    classic customer-base sheet, computed with the engine's histogram
    discipline instead of an ntile window: an ntile(4) over the user
    aggregate is an unpartitioned sort of a table that SCALES (users
    grow with the corpus — the fixture shows 15 → 1500 across the SF
    step), so quartile boundaries come from cumulative walks over the
    per-metric VALUE histograms (distinct-value-bounded) and segment
    assignment is a map-side comparison against the three broadcast
    boundaries.

    Boundary rule (integer-exact, engine-portable): b_p = the smallest
    metric value whose cumulative user count reaches ceil(p·N), with
    ceil done in integer arithmetic ((N+3)//4, (N+1)//2, (3N+3)//4);
    segment = 1 + Σ (x > b_p). Monetary sums integer cents (the x96
    discipline); recency is whole days behind the corpus' last active
    day. Output: one row per observed (r_seg, f_seg, m_seg) cell with
    user count and share."""
    per_user = events.groupBy(user_col).agg(
        F.max(F.to_date(F.col(ts_col))).alias("__last"),
        F.count(F.lit(1)).cast("bigint").alias("__freq"),
        F.sum(F.round(F.col(value_col) * 100).cast("bigint")).alias("__cents"),
    )
    ref = per_user.agg(
        F.max("__last").alias("__ref"),
        F.count(F.lit(1)).cast("bigint").alias("__nu"),
    )
    pu = (
        per_user.crossJoin(F.broadcast(ref))
        .select(
            F.col(user_col),
            F.datediff(F.col("__ref"), F.col("__last")).cast("bigint").alias("rec"),
            F.col("__freq").alias("freq"),
            F.col("__cents").alias("cents"),
            "__nu",
        )
        .localCheckpoint()  # feeds three histogram walks + the assignment
    )

    def bounds(col: str) -> DataFrame:
        h = pu.groupBy(col).agg(F.count(F.lit(1)).alias("__c"))
        w = Window.orderBy(col)
        cum = h.withColumn("__cum", F.sum("__c").over(w)).crossJoin(
            F.broadcast(pu.select(F.max("__nu").alias("__n")).limit(1))
        )
        k1 = (F.col("__n") + 3) / 4
        k2 = (F.col("__n") + 1) / 2
        k3 = (3 * F.col("__n") + 3) / 4
        return cum.agg(
            F.min(F.when(F.col("__cum") >= F.floor(k1), F.col(col))).alias(f"__{col}_b1"),
            F.min(F.when(F.col("__cum") >= F.floor(k2), F.col(col))).alias(f"__{col}_b2"),
            F.min(F.when(F.col("__cum") >= F.floor(k3), F.col(col))).alias(f"__{col}_b3"),
        )

    j = (
        pu.crossJoin(F.broadcast(bounds("rec")))
        .crossJoin(F.broadcast(bounds("freq")))
        .crossJoin(F.broadcast(bounds("cents")))
    )

    def seg(col: str):
        return (
            1
            + (F.col(col) > F.col(f"__{col}_b1")).cast("int")
            + (F.col(col) > F.col(f"__{col}_b2")).cast("int")
            + (F.col(col) > F.col(f"__{col}_b3")).cast("int")
        ).cast("bigint")

    cells = j.select(
        seg("rec").alias("r_seg"), seg("freq").alias("f_seg"), seg("cents").alias("m_seg")
    ).groupBy("r_seg", "f_seg", "m_seg").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users")
    )
    tot = cells.agg(F.sum("n_users").alias("__t"))
    return (
        cells.crossJoin(F.broadcast(tot))
        .select(
            "r_seg", "f_seg", "m_seg", "n_users",
            F.round(F.col("n_users") / F.col("__t"), 4).alias("share"),
        )
        .orderBy("r_seg", "f_seg", "m_seg")
    )
