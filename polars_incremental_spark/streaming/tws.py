"""Stateful operators on Spark 4's ``transformWithStateInPandas``.

The successor API to ``applyInPandasWithState`` (streaming/stateful.py):
typed state variables (value/list/map) instead of one tuple blob, timers
registered per key instead of a single timeout mode, and initial-state
bootstrap.  Functionally these mirror stateful.running_totals /
seen_key_filter — same semantics, newer substrate — so pipelines can move
to the API Spark is investing in without changing outputs.

CAPABILITY GATE: the TWS Python worker speaks a protobuf protocol, so the
``protobuf`` package must be importable by executors (and the state store
should be RocksDB: set ``spark.sql.streaming.stateStore.providerClass`` to
``...state.RocksDBStateStoreProvider``).  This sandbox has no protobuf and
no network, so these paths are import-gated exactly like the avro jar and
delta-spark: real code, executable wherever the dependency exists, and
``tws_available()`` tells callers which world they're in.  The
applyInPandasWithState twins remain the tested fallback here.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame

from ..errors import UnsupportedFormatError


def tws_available() -> bool:
    """True when the transformWithState protobuf dependency is importable."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


def _require_tws() -> None:
    if not tws_available():
        raise UnsupportedFormatError(
            "transformWithStateInPandas needs the 'protobuf' package on "
            "driver and executors (absent in this environment); use the "
            "applyInPandasWithState operators in streaming.stateful instead"
        )


def running_totals_tws(
    df: DataFrame, keys: Sequence[str], value_col: str
) -> DataFrame:
    """Cumulative (count, sum) per key across micro-batches — the
    transformWithState twin of ``stateful.running_totals``.  State is a
    single typed ValueState per key in the (RocksDB) state store; the only
    shuffle is the groupBy hash exchange, identical to the old API."""
    _require_tws()
    import pandas as pd
    from pyspark.sql.streaming import StatefulProcessor

    key_names = list(keys)

    class _Totals(StatefulProcessor):
        def init(self, handle):
            self._state = handle.getValueState("totals", "n long, total double")

        def handleInputRows(self, key, rows, timerValues):
            n, total = (
                self._state.get() if self._state.exists() else (0, 0.0)
            )
            for pdf in rows:
                n += len(pdf)
                total += float(pdf[value_col].fillna(0.0).sum())
            self._state.update((n, total))
            yield pd.DataFrame(
                [{**dict(zip(key_names, key)), "n": n, "total": total}]
            )

        def close(self):
            pass

    key_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in df.schema
        if f.name in key_names
    )
    return df.groupBy(*key_names).transformWithStateInPandas(
        _Totals(),
        outputStructType=f"{key_schema}, n long, total double",
        outputMode="Update",
        timeMode="None",
    )


def seen_key_filter_tws(
    df: DataFrame, keys: Sequence[str], *, ttl_ms: int | None = None
) -> DataFrame:
    """Cross-batch first-occurrence filter — the transformWithState twin
    of ``stateful.seen_key_filter``.  ``ttl_ms`` uses the new API's
    native per-state TTL (state silently expires, re-admitting a key) —
    the bounded-state knob the old API could only approximate with
    group timeouts."""
    _require_tws()
    import pandas as pd
    from pyspark.sql.streaming import StatefulProcessor

    key_names = list(keys)
    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema
    )
    col_order = [f.name for f in df.schema]

    class _Seen(StatefulProcessor):
        def init(self, handle):
            # ttlDurationMs is the API's native per-state TTL knob
            self._seen = handle.getValueState(
                "seen", "seen boolean", ttlDurationMs=ttl_ms
            )

        def handleInputRows(self, key, rows, timerValues):
            first_pdf = None
            for pdf in rows:
                if first_pdf is None and len(pdf):
                    first_pdf = pdf.iloc[:1]
            if self._seen.exists() or first_pdf is None:
                # drain the iterator contract but emit nothing
                yield pd.DataFrame(columns=col_order)
                return
            self._seen.update((True,))
            yield first_pdf[col_order]

        def close(self):
            pass

    return df.groupBy(*key_names).transformWithStateInPandas(
        _Seen(),
        outputStructType=out_schema,
        outputMode="Update",
        timeMode="ProcessingTime" if ttl_ms is not None else "None",
    )
