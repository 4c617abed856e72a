"""Visitor counters as a true streaming stateful operator.

SURVEY §2.10: "the visitantes running counters (J2) are exactly a streaming
stateful aggregation". The ``foreachBatch`` merge in visits_stream.py is the
table-maintenance formulation; this module is the operator formulation —
per-email state lives in the state store (checkpointed, recoverable,
no table rewrite per batch) via ``applyInPandasWithState``.

State per email: (first_visit, last_visit, total_visits). Each micro-batch
folds its rows into the state and emits the updated consolidated row —
i.e. the stream of upserts that would feed a key-value serving store at
100 TB (changelog semantics instead of snapshot rewrites).
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DateType,
    LongType,
    StringType,
    StructField,
    StructType,
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("email", StringType()),
        StructField("fechaPrimeraVisita", DateType()),
        StructField("fechaUltimaVisita", DateType()),
        StructField("visitasTotales", LongType()),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("first_date", DateType()),
        StructField("last_date", DateType()),
        StructField("total", LongType()),
    ]
)


def _track_visitor(key, pdfs: Iterable[pd.DataFrame], state: GroupState):
    (email,) = key
    if state.exists:
        first_date, last_date, total = state.get
    else:
        first_date, last_date, total = None, None, 0
    for pdf in pdfs:
        dates = pd.to_datetime(pdf["fechaEnvio"], errors="coerce").dt.date.dropna()
        total += len(pdf)
        if len(dates):
            lo, hi = dates.min(), dates.max()
            first_date = lo if first_date is None else min(first_date, lo)  # keep-first (D22)
            last_date = hi if last_date is None else max(last_date, hi)
    state.update((first_date, last_date, total))
    yield pd.DataFrame(
        [
            {
                "email": email,
                "fechaPrimeraVisita": first_date,
                "fechaUltimaVisita": last_date,
                "visitasTotales": total,
            }
        ]
    )


def visitor_state_stream(visits: DataFrame) -> DataFrame:
    """visits: streaming DataFrame with (email, fechaEnvio). Returns the
    per-email consolidated changelog stream."""
    return visits.groupBy("email").applyInPandasWithState(
        _track_visitor,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# The same operator on the Spark 4 transformWithState API — the successor
# to applyInPandasWithState: typed named state (ValueState) managed by the
# RocksDB state store provider, with timers and TTL available. Kept
# alongside the classic formulation so both stateful surfaces are covered.
# ---------------------------------------------------------------------------
try:  # pyspark >= 4.0
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class VisitorProcessor(StatefulProcessor):
        """ValueState per email: (first_date, last_date, total) — identical
        fold semantics to :func:`_track_visitor` (keep-first D22, max-last,
        count-all), emitting the consolidated row per batch."""

        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState("visitor", STATE_SCHEMA)

        def handleInputRows(self, key, rows, timerValues):
            (email,) = key
            if self._state.exists():
                first_date, last_date, total = self._state.get()
            else:
                first_date, last_date, total = None, None, 0
            for pdf in rows:
                dates = pd.to_datetime(pdf["fechaEnvio"], errors="coerce").dt.date.dropna()
                total += len(pdf)
                if len(dates):
                    lo, hi = dates.min(), dates.max()
                    first_date = lo if first_date is None else min(first_date, lo)
                    last_date = hi if last_date is None else max(last_date, hi)
            self._state.update((first_date, last_date, total))
            yield pd.DataFrame(
                [
                    {
                        "email": email,
                        "fechaPrimeraVisita": first_date,
                        "fechaUltimaVisita": last_date,
                        "visitasTotales": total,
                    }
                ]
            )

        def close(self) -> None:
            pass

    def visitor_state_stream_tws(visits: DataFrame) -> DataFrame:
        """transformWithState formulation of :func:`visitor_state_stream`.
        Requires (a) the RocksDB state store provider (set
        ``spark.sql.streaming.stateStore.providerClass`` to
        ``...state.RocksDBStateStoreProvider`` on the session) and (b)
        ``protobuf`` (pyspark's [connect] extra) — the TWS Python state
        server speaks protobuf; without it the driver worker fails with
        STREAMING_PYTHON_RUNNER_INITIALIZATION_FAILURE."""
        return visits.groupBy("email").transformWithStateInPandas(
            statefulProcessor=VisitorProcessor(),
            outputStructType=OUTPUT_SCHEMA,
            outputMode="Update",
            timeMode="None",
        )

except ImportError:  # pragma: no cover - pyspark < 4.0
    pass
