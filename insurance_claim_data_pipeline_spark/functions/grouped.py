"""Whole-partition grouped map — the high-cardinality scale path for
``groupBy(key).applyInPandas``.

Spark's grouped-map pays a fixed Arrow/plan cost PER GROUP (one pandas
frame materialisation, one Python call dispatch, one Arrow batch each
way). With a handful of groups that cost is invisible; with 20k+ tiny
groups (per-part demand series, per-user event traces) it dominates the
operator: measured on this repo, `lineitem_croston_demand` spent ~90%
of its 8.3 s wall-clock at sf0.1 on per-group overhead, not on the
recurrence itself.

:func:`sorted_grouped_map` keeps the exact same semantics — the SAME
per-group closure runs over the SAME rows — but amortises the overhead:

1. ``repartition(*keys)`` co-locates each group on one partition
   (identical shuffle to what ``groupBy(...).applyInPandas`` plans);
2. ``sortWithinPartitions(*keys)`` makes every group a CONTIGUOUS run;
3. ``mapInPandas`` streams whole Arrow batches (default 10k rows)
   through one Python call, slicing groups out with a vectorised pandas
   ``groupby`` — thousands of groups per dispatch instead of one.

Because a group may straddle two Arrow batches of the same partition,
the stream holds back the trailing (possibly incomplete) group of each
batch and prepends it to the next; memory held between batches is one
group, not one partition.

Output rows are identical to the ``applyInPandas`` formulation (row
order within the DataFrame differs, which Spark never guarantees
anyway), so every DuckDB value-hash oracle is unaffected.
"""

from __future__ import annotations

from typing import Callable, Sequence

import pandas as pd

from pyspark.sql import DataFrame


def sorted_grouped_map(
    df: DataFrame,
    keys: Sequence[str],
    group_fn: Callable[[pd.DataFrame], pd.DataFrame],
    schema: str,
    whole_batch: bool = False,
) -> DataFrame:
    """Run ``group_fn`` once per distinct ``keys`` group of ``df``,
    exactly like ``df.groupBy(*keys).applyInPandas(group_fn, schema)``,
    but batched whole-partition for high-cardinality keys.

    ``group_fn`` receives each group as a pandas frame (input columns,
    arbitrary row order — same contract as ``applyInPandas``; all the
    callers in this repo sort internally) and returns a frame matching
    ``schema``.

    With ``whole_batch=True`` the closure instead receives one frame
    holding MANY complete groups (sorted by ``keys``, group rows
    contiguous but otherwise unordered) and must handle the key
    transitions itself — this skips even the per-group pandas slicing,
    the right shape for cheap linear recurrences over tens of
    thousands of tiny groups.
    """
    key_list = list(keys)

    def part_fn(batches):
        # Closure shipped by value via cloudpickle — workers never
        # import this package (same contract as the per-group fns).
        import pandas as pd  # noqa: F811 — re-import for the worker

        def flush(pdf: pd.DataFrame):
            if whole_batch:
                out = group_fn(pdf.reset_index(drop=True))
                if len(out):
                    yield out
                return
            outs = [
                group_fn(g.reset_index(drop=True))
                for _, g in pdf.groupby(key_list, sort=False, dropna=False)
            ]
            outs = [o for o in outs if len(o)]
            if outs:
                yield pd.concat(outs, ignore_index=True)

        carry = None
        for pdf in batches:
            if len(pdf) == 0:
                continue
            if carry is not None:
                pdf = pd.concat([carry, pdf], ignore_index=True)
            # Rows are sorted by key, so the last group is a contiguous
            # tail; count its rows with a NaN-safe equality mask.
            last = pdf[key_list].iloc[-1]
            mask = None
            for c in key_list:
                col = pdf[c]
                m = col.isna() if pd.isna(last[c]) else (col == last[c])
                mask = m if mask is None else (mask & m)
            tail_n = int(mask.sum())
            if tail_n == len(pdf):
                carry = pdf  # batch is one (possibly continuing) group
                continue
            carry = pdf.iloc[len(pdf) - tail_n :].reset_index(drop=True)
            yield from flush(pdf.iloc[: len(pdf) - tail_n])
        if carry is not None and len(carry):
            yield from flush(carry)

    part = df.repartition(*key_list).sortWithinPartitions(*key_list)
    return part.mapInPandas(part_fn, schema=schema)
