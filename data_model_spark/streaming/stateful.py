"""Custom stateful streaming operator: per-tile-key merge state.

The batch pipeline merges tile fragments with one hash shuffle
(``tiling.merge_tiles``).  The streaming twin must merge fragments that
arrive in DIFFERENT micro-batches (two scenes overlapping one tile can be
read minutes apart), which Spark's built-in streaming aggregations can't
express for our compose semantics — the custom-stateful-operator case:
``applyInPandasWithState`` (GroupState, GroupStateTimeout) keyed by
``(var, level, tile_x, tile_y)`` — band-by-band, like the batch merge.

State per key = running (n_sources, px_sum, px_cnt) plus a PACKED FOOTPRINT
BITMASK (8 KB per live key) so ``filled_px`` is the union of fragment
rectangles — the same quantity the batch merge derives from its canvas, NOT
the sum of per-fragment pixel counts (which double-counts overlaps).  The
(sum, count) carry keeps partial+final exactness (SURVEY §2 A15); streamed
totals equal the batch job's for every output column.  Keys idle past the
processing-time timeout emit their final row and drop their state — the
watermark-style eviction that bounds state size at 10^12 tiles.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..operators.tiling import TILE_PX

MERGE_STATE_SCHEMA = "n_sources INT, px_sum DOUBLE, px_cnt LONG, mask BINARY"
MERGED_SCHEMA = (
    "var STRING, level INT, tile_x LONG, tile_y LONG, n_sources INT, filled_px LONG,"
    " px_sum DOUBLE, px_cnt LONG, final BOOLEAN"
)


def _merge_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState, timeout_ms: int | None
) -> Iterator[pd.DataFrame]:
    if state.exists:
        ns, ps, pc, packed = state.get
        filled = np.unpackbits(np.frombuffer(packed, dtype=np.uint8)).astype(
            bool
        ).reshape(TILE_PX, TILE_PX)
    else:
        ns, ps, pc = 0, 0.0, 0
        filled = np.zeros((TILE_PX, TILE_PX), dtype=bool)
    n_new = 0
    for pdf in pdfs:  # a timed-out invocation yields one EMPTY frame
        n_new += int(len(pdf))
        if len(pdf):
            ns += int(len(pdf))
            ps += float(pdf["px_sum"].sum())
            pc += int(pdf["px_cnt"].sum())
            for ox, oy, w, h in zip(
                pdf["off_x"], pdf["off_y"], pdf["tile_w"], pdf["tile_h"]
            ):
                filled[int(oy) : int(oy) + int(h), int(ox) : int(ox) + int(w)] = True
    fp = int(filled.sum())
    var, level, tx, ty = key
    if not state.hasTimedOut and n_new:
        state.update((ns, ps, pc, bytes(np.packbits(filled))))
        if timeout_ms is not None:
            state.setTimeoutDuration(timeout_ms)  # evict when idle
        final = False
    else:  # timeout fired (or spurious empty call): emit final, drop state
        state.remove()
        final = True
    yield pd.DataFrame(
        {
            "var": [str(var)],
            "level": [int(level)],
            "tile_x": [int(tx)],
            "tile_y": [int(ty)],
            "n_sources": [ns],
            "filled_px": [fp],
            "px_sum": [ps],
            "px_cnt": [pc],
            "final": [final],
        }
    )


def merge_tiles_stateful(
    fragments: DataFrame, timeout_ms: int | None = 30_000
) -> DataFrame:
    """Cross-micro-batch tile merge: running per-key totals.

    ``fragments`` is a STREAMING tile-fragment DataFrame.  The latest
    ``update`` row per key is the accumulated merge total.

    ``timeout_ms`` picks the eviction mode:

    * an int (continuous deployments) — keys idle past it emit a
      ``final=True`` row and drop their state, bounding state size.  A
      ``final=True`` row is TERMINAL for its key: fragments arriving after
      eviction start a NEW accumulation epoch from zero (exactly as a
      watermark drops late rows) — consumers must treat the final row as
      the closed total and later epochs as late data, not re-aggregate
      across them.  Size the timeout above the expected fragment-arrival
      spread, as a watermark delay is sized.  NOTE:
      with ``Trigger.AvailableNow`` a ProcessingTimeTimeout query keeps
      scheduling empty micro-batches and never terminates on its own (the
      engine can't prove no future timeout matters) — use only with
      continuous triggers, or stop() the query externally.
    * ``None`` (drain-once jobs) — no timers; the availableNow query
      terminates as soon as the input is drained.
    """
    def fn(key, pdfs, state):  # closure: timeout_ms pickled by value
        return _merge_fn(key, pdfs, state, timeout_ms)

    return (
        fragments.select(
            "var", "level", "tile_x", "tile_y", "off_x", "off_y", "tile_w",
            "tile_h", "px_sum", "px_cnt",
        )
        .groupBy("var", "level", "tile_x", "tile_y")
        .applyInPandasWithState(
            fn,
            outputStructType=MERGED_SCHEMA,
            stateStructType=MERGE_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=(
                GroupStateTimeout.NoTimeout
                if timeout_ms is None
                else GroupStateTimeout.ProcessingTimeTimeout
            ),
        )
    )
