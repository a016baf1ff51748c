"""Custom stateful streaming operators (``applyInPandasWithState``).

The reference has no streaming surface (SURVEY.md §2.11); this is the
engine extension for event streams: arbitrary per-key state carried
across micro-batches, with the Pandas-batched API so the Python
crossing is Arrow-vectorized per group batch.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = "n long, s double"


def running_totals(
    events: DataFrame,
    key_col: str = "user_id",
    value_col: str = "value",
) -> DataFrame:
    """Per-key running totals that survive micro-batch boundaries: each
    trigger emits the key's cumulative (count, sum) so far, keyed and
    labeled by the caller's actual column names.

    This is the minimal template for the reference-style 'rolling
    measure over an unbounded history' computed incrementally instead
    of by monthly rebuild: the state is the aggregate, each batch
    folds into it, and nothing is ever recomputed.
    """
    key_type = events.schema[key_col].dataType.simpleString()
    out_schema = f"{key_col} {key_type}, n_events long, sum_value double"

    def fold(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            n, s = state.get
        else:
            n, s = 0, 0.0
        for pdf in pdfs:
            n += len(pdf)
            s += float(pdf[value_col].sum())
        state.update((n, s))
        yield pd.DataFrame(
            {key_col: [key[0]], "n_events": [n], "sum_value": [round(s, 2)]}
        )

    return events.groupBy(key_col).applyInPandasWithState(
        fold,
        outputStructType=out_schema,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
