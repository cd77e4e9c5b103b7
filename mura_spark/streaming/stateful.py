"""Custom stateful streaming operators via ``applyInPandasWithState``.

The reference has no streaming surface (SURVEY.md §2.3); this is extension
surface for the cases Structured Streaming's built-in windows can't express:
arbitrary per-key running state updated per micro-batch.

Scale notes: state lives in the state store, partitioned by the grouping
key across ``spark.sql.shuffle.partitions`` tasks; per-batch work is
Arrow-batched pandas per key group. Keep state values O(1) per key (running
scalars, small structs) — unbounded per-key state is the failure mode, and
timeouts (``GroupStateTimeout``) are the eviction tool.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def dedup_events_stream(events: DataFrame, keys: list[str] | None = None,
                        event_time: str = "ts",
                        delay: str = "30 minutes") -> DataFrame:
    """Streaming exact dedup: keep the first arrival per key, with state
    bounded by the watermark (a duplicate arriving more than ``delay``
    after its original may pass — the standard at-scale trade: without the
    watermark bound, dedup state grows without limit and a 100 TB stream
    eventually evicts or dies).

    Batch twin: ``df.dropDuplicates(keys)`` (equality pinned in
    tests/test_streaming.py with planted duplicates). Works on batch frames
    too (falls back to plain dropDuplicates — no watermark needed).
    """
    keys = keys if keys is not None else ["event_id"]
    if not events.isStreaming:
        return events.dropDuplicates(keys)
    return (events.withWatermark(event_time, delay)
                  .dropDuplicatesWithinWatermark(keys))


def running_user_totals(events: DataFrame) -> DataFrame:
    """Per-user running (n_events, total_value), emitted each micro-batch.

    State per key is two scalars. Output rows are the updated totals for
    keys seen in the batch (``update`` semantics). The batch-mode oracle is
    a plain groupBy aggregation — the final state per key must match it.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(key, pdfs, state: GroupState):
        if state.exists:
            n, total = state.get
        else:
            n, total = 0, 0.0
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].fillna(0.0).sum())
        state.update((n, total))
        yield pd.DataFrame({"user_id": [key[0]], "n_events": [n],
                            "total_value": [total]})

    return (events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType="user_id bigint, n_events bigint, total_value double",
        stateStructType="n bigint, total double",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout))


def locf_purchase_stream(events: DataFrame) -> DataFrame:
    """Streaming last-observation-carried-forward: every event is
    emitted with the user's most recent purchase value so far (itself,
    for purchase rows) — the stateful twin of the batch IGNORE-NULLS
    window in ``events_locf_purchase``.

    State per key is ONE scalar (the last purchase value). Rows are
    ordered (ts, event_id) within each micro-batch before the carry;
    the cross-batch contract is in-order-per-key delivery (the file
    source replays in order — for out-of-order production streams the
    standard fix is a watermark-delayed sort buffer upstream, which is
    a different operator's job).

    Batch twin equality (including the NULL-before-first-purchase and
    purchase-self-carry cases) is pinned in tests/test_streaming.py.

    NaN contract: pandas represents SQL NULL doubles as NaN, so the
    ``pd.isna``-style guard below treats BOTH as missing. The batch
    window would carry a literal double NaN forward (NaN is non-null to
    ``ignorenulls``) — the divergence is unobservable under the suite
    convention that no query emits NaN as a data value (the comparator
    folds NaN to NULL), and NULL handling, which real data does
    contain, is what must match.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(key, pdfs, state: GroupState):
        last = state.get[0] if state.exists else None
        pdf = pd.concat(list(pdfs))
        pdf = pdf.sort_values(["ts", "event_id"])
        out = []
        for et, val in zip(pdf["event_type"], pdf["value"]):
            if et == "purchase" and val == val and val is not None:
                last = float(val)
            out.append(last)
        state.update((last,))
        yield pd.DataFrame({"event_id": pdf["event_id"],
                            "user_id": pdf["user_id"],
                            "last_purchase_value": out})

    return (events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=("event_id bigint, user_id bigint, "
                          "last_purchase_value double"),
        stateStructType="last double",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout))


def locf_purchase_batch(events: DataFrame) -> DataFrame:
    """Batch twin of :func:`locf_purchase_stream` — the IGNORE-NULLS
    window form. The oracled suite query ``events_locf_purchase`` routes
    through HERE so a regression in this module's carry-forward contract
    breaks a driver correctness row, not just the stream pytest."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F
    w = (Window.partitionBy("user_id").orderBy("ts", "event_id")
               .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    pv = F.when(F.col("event_type") == "purchase", F.col("value"))
    return events.select("event_id", "user_id",
                         F.last(pv, ignorenulls=True).over(w)
                          .alias("last_purchase_value"))


def conversion_detector_stream(events: DataFrame,
                               within_us: int = 3_600_000_000) -> DataFrame:
    """Stateful CEP: emit one row per purchase that follows a view by the
    SAME user within ``within_us`` microseconds — the streaming twin of
    the batch adjacency patterns (`events_pattern_regex` /
    `events_funnel_1h` express this offline; this operator fires
    per-event online).

    State per user is ONE scalar: the µs timestamp of the most recent
    view. Rows sort (ts, event_id) within each micro-batch; the
    cross-batch contract is in-order-per-key delivery (same as
    :func:`locf_purchase_stream`). At production scale the state store
    holds one bigint per user, partitioned by the user key; eviction of
    idle users would use ``ProcessingTimeTimeout`` ≥ the match window —
    kept NoTimeout here because the state is O(1) per key either way.

    Batch twin: :func:`conversion_detector_batch` (a strictly-preceding
    max-view-time window); equality pinned in tests/test_streaming.py
    including view→purchase pairs that SPAN the micro-batch split.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(key, pdfs, state: GroupState):
        last_view = state.get[0] if state.exists else None
        pdf = pd.concat(list(pdfs)).sort_values(["ts", "event_id"])
        # unit-safe µs conversion: Arrow may hand datetime64[ns] or [us]
        us = pdf["ts"].to_numpy(dtype="datetime64[us]").astype("int64")
        ev_ids, lat = [], []
        for eid, et, t in zip(pdf["event_id"], pdf["event_type"], us):
            t = int(t)
            if et == "view":
                last_view = t
            elif (et == "purchase" and last_view is not None
                  and t - last_view <= within_us):
                ev_ids.append(int(eid))
                lat.append(t - last_view)
        state.update((last_view,))
        yield pd.DataFrame({"user_id": [key[0]] * len(ev_ids),
                            "purchase_event_id": ev_ids,
                            "latency_us": lat})

    return (events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=("user_id bigint, purchase_event_id bigint, "
                          "latency_us bigint"),
        stateStructType="last_view bigint",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout))


def conversion_detector_batch(events: DataFrame,
                              within_us: int = 3_600_000_000) -> DataFrame:
    """Batch twin of :func:`conversion_detector_stream`: for each
    purchase, the most recent STRICTLY-preceding view of the same user
    via a (ts, event_id)-ordered window; keep pairs within the match
    window. Output schema matches the stream exactly."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F
    w = (Window.partitionBy("user_id").orderBy("ts", "event_id")
               .rowsBetween(Window.unboundedPreceding, -1))
    view_us = F.when(F.col("event_type") == "view", F.unix_micros("ts"))
    d = events.select(
        "user_id", "event_id", "event_type",
        F.unix_micros("ts").alias("__us"),
        F.max(view_us).over(w).alias("__lv"))
    return (d.where((F.col("event_type") == "purchase")
                    & F.col("__lv").isNotNull()
                    & ((F.col("__us") - F.col("__lv")) <= within_us))
             .select("user_id",
                     F.col("event_id").alias("purchase_event_id"),
                     (F.col("__us") - F.col("__lv")).alias("latency_us")))
