"""Edge-table construction — the engine's core dataflow operators.

Re-expresses the reference's two pairwise constructions
(``DeepGraph.create_edges`` deepgraph.py:170-608, ``DeepGraph.create_edges_ft``
deepgraph.py:610-1084) Spark-first:

* :func:`create_edges` — blocked all-pairs (upper triangle). With a
  ``group_by`` key (e.g. ``conv_id``) pairs are scoped per group and computed
  shuffle-free inside one ``applyInPandas``; without a key, the global pair
  space is decomposed into hash-block combinations executed via ``cogroup`` —
  the distributed analog of the reference's pair-index-space sharding
  (iterators_and_indexers.py:158-256), except Spark slices *data*, not index
  space.
* :func:`create_edges_ft` — the fast-track band join (sorted feature,
  ``0 <= ftf_t - ftf_s <= ftt``) as a **bucketed equi-join**: both sides bin
  the feature by the threshold width, the source side explodes to
  ``(bin, bin+1)``, and a residual predicate finishes the band — avoiding the
  O(n²) pair space entirely (the reference's adaptive chunk-growth iterator,
  iterators_and_indexers.py:259-515, replaced by a declarative plan Catalyst
  can push filters into).

Connector/selector pipelines run as Arrow-vectorized pandas stages
(:class:`deepgraph_spark.connectors.PairPlan`) — whole numpy columns per
batch, never per-row Python.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from deepgraph_spark.connectors import PairPlan

# ---------------------------------------------------------------------------
# pair-index enumeration (numpy replica of the reference's Cython kernel
# _triu_indices.pyx:26-112 — closed-form, O(1) memory per chunk)
# ---------------------------------------------------------------------------


def triu_indices_range(n: int, start: int, end: int) -> tuple[np.ndarray, np.ndarray]:
    """Upper-triangle (k=1) pair indices of an n×n matrix for linear
    pair-index range [start, end), row-major, without materializing all pairs."""
    total = n * (n - 1) // 2
    end = min(end, total)
    if start >= end:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    k = np.arange(start, end, dtype=np.int64)
    # row index via inverse of the cumulative row-length function
    i = (n - 2 - np.floor(np.sqrt(-8.0 * k + 4.0 * n * (n - 1) - 7) / 2.0 - 0.5)).astype(np.int64)
    j = k + i + 1 - n * (n - 1) // 2 + (n - i) * (n - i - 1) // 2
    return i, j


# ---------------------------------------------------------------------------
# schema inference & edge-frame building
# ---------------------------------------------------------------------------

_KIND_MAP = {
    ("i", 8): T.LongType(),
    ("i", 4): T.IntegerType(),
    ("i", 2): T.ShortType(),
    ("i", 1): T.ByteType(),
    ("u", 1): T.ShortType(),
    ("u", 2): T.IntegerType(),
    ("u", 4): T.LongType(),
    ("u", 8): T.LongType(),
    ("f", 8): T.DoubleType(),
    ("f", 4): T.FloatType(),
    ("f", 2): T.FloatType(),
    ("b", 1): T.BooleanType(),
}


def _np_to_spark_type(arr: np.ndarray) -> T.DataType:
    dt = arr.dtype
    if dt.kind in "iufb":
        return _KIND_MAP[(dt.kind, dt.itemsize)]
    if dt.kind == "M":
        return T.TimestampType()
    if dt.kind == "m":
        raise TypeError(
            "timedelta relation without dt_unit — pass ft_feature=(col, ftt, unit) "
            "or cast inside the connector"
        )
    if dt.kind in ("O", "U", "S"):
        sample = next((x for x in arr if x is not None), None)
        if sample is None or isinstance(sample, str):
            return T.StringType()
        if isinstance(sample, (list, tuple, np.ndarray)):
            el = np.asarray(sample)
            return T.ArrayType(_np_to_spark_type(el))
        if isinstance(sample, (set, frozenset)):
            el = np.asarray(sorted(sample))
            return T.ArrayType(_np_to_spark_type(el))
        if isinstance(sample, (bool, np.bool_)):
            return T.BooleanType()
        if isinstance(sample, (int, np.integer)):
            return T.LongType()
        if isinstance(sample, (float, np.floating)):
            return T.DoubleType()
        return T.StringType()
    raise TypeError(f"unsupported relation dtype {dt}")


def _normalize_for_arrow(col: np.ndarray):
    """Widen/convert numpy values Arrow can't ship natively."""
    dt = col.dtype
    if dt == np.float16:
        return col.astype(np.float32)
    if dt.kind == "u":
        return col.astype({1: np.int16, 2: np.int32, 4: np.int64, 8: np.int64}[dt.itemsize])
    if dt.kind == "O":
        first = next((x for x in col if x is not None), None)
        if isinstance(first, np.ndarray):
            return [x.tolist() if x is not None else None for x in col]
        if isinstance(first, (set, frozenset)):
            return [sorted(x) if x is not None else None for x in col]
    return col


def _build_edge_pdf(
    plan: PairPlan,
    vi: pd.DataFrame,
    sources: np.ndarray,
    targets: np.ndarray,
    index_col: str,
    key_vals: dict | None = None,
    key_arrays: dict | None = None,
) -> pd.DataFrame:
    sources, targets, stored = plan.evaluate(vi, sources, targets)
    out = {}
    if key_vals:
        for k, val in key_vals.items():
            out[k] = np.repeat(val, len(sources))
    if key_arrays:
        # per-row keys (mapInPandas batches may mix groups): indexed by the
        # surviving source positions, which are row positions into vi
        for k, arr in key_arrays.items():
            out[k] = arr[sources]
    out["s"] = vi[index_col].values[sources]
    out["t"] = vi[index_col].values[targets]
    for r in plan.relation_names:
        out[r] = _normalize_for_arrow(stored[r])
    for f in plan.transfer_features:
        out[f"{f}_s"] = _normalize_for_arrow(vi[f].values[sources])
        out[f"{f}_t"] = _normalize_for_arrow(vi[f].values[targets])
    return pd.DataFrame(out)


def _infer_edge_schema(
    plan: PairPlan, v: DataFrame, index_col: str, group_keys: list[str]
) -> T.StructType:
    """Infer the output StructType by dry-running the pipeline on a tiny
    driver-side sample (the reference builds its ``coldtypedic`` the same way:
    iterators_and_indexers.py:18-108)."""
    needed = list(dict.fromkeys([index_col, *plan.required_features]))
    sample = v.select(*[c for c in v.columns if c in needed or c in group_keys]).limit(6).toPandas()
    if len(sample) < 2:
        raise ValueError("node table must have >= 2 rows to infer the edge schema")
    sample = sample.reset_index(drop=True)
    s_idx, t_idx = triu_indices_range(len(sample), 0, len(sample) * (len(sample) - 1) // 2)
    _, _, stored = plan.evaluate(sample, s_idx, t_idx)

    fields = []
    for k in group_keys:
        fields.append(T.StructField(k, v.schema[k].dataType))
    idx_type = v.schema[index_col].dataType
    fields += [T.StructField("s", idx_type), T.StructField("t", idx_type)]
    for r in plan.relation_names:
        fields.append(T.StructField(r, _np_to_spark_type(stored[r])))
    for f in plan.transfer_features:
        ftype = v.schema[f].dataType
        fields += [T.StructField(f"{f}_s", ftype), T.StructField(f"{f}_t", ftype)]
    return T.StructType(fields)


# ---------------------------------------------------------------------------
# create_edges — blocked all-pairs
# ---------------------------------------------------------------------------


def create_edges(
    v: DataFrame,
    connectors=None,
    selectors=None,
    *,
    index_col: str = "id",
    group_by: str | list[str] | None = None,
    transfer_features=None,
    r_dtype_dic: dict | None = None,
    no_transfer_rs=None,
    step_size: int = 10_000_000,
    num_blocks: int | None = None,
    keep_keys: bool = False,
) -> DataFrame:
    """All-pairs (upper-triangle, ``id_s < id_t``) pairwise computation.

    Spark analog of ``DeepGraph.create_edges`` (deepgraph.py:170-608). With
    ``group_by``, the pair space is scoped per group (one shuffle to co-locate
    each group, then embarrassingly parallel). Without it, the global pair
    space is covered by hash-block combinations via cogroup — each unordered
    node pair lands in exactly one block pair.

    ``step_size`` bounds per-task memory exactly like the reference's
    chunking (deepgraph.py:461-464): pair enumeration inside a task proceeds
    in ``step_size`` slices of the local pair-index space.
    """
    plan = PairPlan(
        connectors,
        selectors,
        r_dtype_dic=r_dtype_dic,
        no_transfer_rs=no_transfer_rs,
        transfer_features=transfer_features,
    )
    group_keys = [group_by] if isinstance(group_by, str) else list(group_by or [])
    needed = list(dict.fromkeys([*group_keys, index_col, *plan.required_features]))
    v_proj = v.select(*needed)  # column pruning reaches the scan

    out_keys = group_keys if keep_keys else []
    schema = _infer_edge_schema(plan, v_proj, index_col, out_keys)

    if group_keys and not num_blocks:

        def per_group(pdf: pd.DataFrame) -> pd.DataFrame:
            pdf = pdf.sort_values(index_col, kind="mergesort").reset_index(drop=True)
            n = len(pdf)
            key_vals = {k: pdf[k].iloc[0] for k in out_keys} if out_keys else None
            total = n * (n - 1) // 2
            chunks = []
            for lo in range(0, max(total, 1), step_size):
                s_idx, t_idx = triu_indices_range(n, lo, min(lo + step_size, total))
                if len(s_idx) == 0:
                    continue
                chunks.append(_build_edge_pdf(plan, pdf, s_idx, t_idx, index_col, key_vals))
            if not chunks:
                return pd.DataFrame({f.name: pd.Series(dtype="object") for f in schema.fields})
            return pd.concat(chunks, ignore_index=True)

        return v_proj.groupBy(*group_keys).applyInPandas(per_group, schema)

    # hash-block decomposition — globally, or WITHIN groups when both
    # group_by and num_blocks are given (the skew path: a giant group is no
    # longer a single straggler task; its pair space spreads over
    # B(B+1)/2 block-combo tasks).
    # each node → one of B blocks; every unordered block combo (bi <= bj) is a
    # cogroup key; within a combo the task emits triu (bi==bj) or ordered
    # cross pairs (bi<bj). Replication per node = B combos → choose B ~ #tasks.
    spark = v.sparkSession
    if num_blocks is None:
        num_blocks = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
        num_blocks = max(2, min(num_blocks, 64))
    blocked = v_proj.withColumn(
        "_blk", (F.abs(F.xxhash64(F.col(index_col))) % num_blocks).cast("int")
    )
    combo_rows = [(i, j) for i in range(num_blocks) for j in range(i, num_blocks)]
    combos_l = spark.createDataFrame(combo_rows, "bi int, bj int")
    combos_r = spark.createDataFrame(combo_rows, "bi2 int, bj2 int")
    left = blocked.join(combos_l.hint("broadcast"), blocked._blk == combos_l.bi).drop("_blk")
    # fresh exprIds on the right side to avoid self-join ambiguity
    right_base = blocked.select(
        [F.col(c).alias(f"{c}__r") for c in v_proj.columns] + [F.col("_blk").alias("_blk__r")]
    )
    right = right_base.join(
        combos_r.hint("broadcast"), right_base._blk__r == combos_r.bj2
    ).drop("_blk__r")

    v_cols = list(v_proj.columns)
    n_gk = len(group_keys)

    def per_combo(keys, lpdf: pd.DataFrame, rpdf: pd.DataFrame) -> pd.DataFrame:
        bi, bj = keys[n_gk], keys[n_gk + 1]
        rpdf = rpdf.rename(columns={f"{c}__r": c for c in v_cols})
        empty = pd.DataFrame({f.name: pd.Series(dtype="object") for f in schema.fields})
        if len(lpdf) == 0 or len(rpdf) == 0:
            return empty
        key_vals = (
            {k: lpdf[k].iloc[0] for k in out_keys} if out_keys else None
        )
        if bi == bj:
            pdf = lpdf.drop(columns=["bi", "bj"]).sort_values(index_col).reset_index(drop=True)
            n = len(pdf)
            total = n * (n - 1) // 2
            chunks = []
            for lo in range(0, max(total, 1), step_size):
                s_idx, t_idx = triu_indices_range(n, lo, min(lo + step_size, total))
                if len(s_idx):
                    chunks.append(_build_edge_pdf(plan, pdf, s_idx, t_idx, index_col, key_vals))
            return pd.concat(chunks, ignore_index=True) if chunks else empty
        lp = lpdf.drop(columns=["bi", "bj"]).reset_index(drop=True)
        rp = rpdf.drop(columns=["bi2", "bj2"]).reset_index(drop=True)
        vi = pd.concat([lp, rp], ignore_index=True)
        nl, nr = len(lp), len(rp)
        # full cross, then orient so id_s < id_t (ids unique across blocks)
        si = np.repeat(np.arange(nl, dtype=np.int64), nr)
        ti = np.tile(np.arange(nl, nl + nr, dtype=np.int64), nl)
        ids = vi[index_col].values
        swap = ids[si] > ids[ti]
        s_idx = np.where(swap, ti, si)
        t_idx = np.where(swap, si, ti)
        chunks = []
        for lo in range(0, len(s_idx), step_size):
            chunks.append(
                _build_edge_pdf(
                    plan, vi, s_idx[lo : lo + step_size], t_idx[lo : lo + step_size], index_col, key_vals
                )
            )
        return pd.concat(chunks, ignore_index=True) if chunks else empty

    left_keys = [*group_keys, "bi", "bj"]
    right_keys = [*[f"{k}__r" for k in group_keys], "bi2", "bj2"]
    return (
        left.groupBy(*left_keys)
        .cogroup(right.groupBy(*right_keys))
        .applyInPandas(per_combo, schema)
    )


# ---------------------------------------------------------------------------
# create_edges_ft — fast-track band join
# ---------------------------------------------------------------------------

_UNIT_SECONDS = {"D": 86400.0, "h": 3600.0, "m": 60.0, "s": 1.0, "ms": 1e-3, "us": 1e-6, "ns": 1e-9}


def create_edges_ft(
    v: DataFrame,
    ft_feature: tuple,
    connectors=None,
    selectors=None,
    *,
    index_col: str = "id",
    group_by: str | list[str] | None = None,
    transfer_features=None,
    r_dtype_dic: dict | None = None,
    no_transfer_rs=None,
    keep_keys: bool = False,
    batch_rows: int = 65_536,
) -> DataFrame:
    """Fast-track band join: pairs with ``0 <= ftf_t - ftf_s <= ftt`` in the
    feature-sorted order (ties broken by ``index_col``), per ``group_by`` key.

    Spark analog of ``DeepGraph.create_edges_ft`` (deepgraph.py:610-1084).
    Physical plan: bucket ``ftf`` into width-``ftt`` bins, explode the source
    side onto ``(bin, bin+1)``, shuffle-equi-join on the bin key, then apply
    the exact band + ordering predicate as a residual filter — a linear-cost
    plan replacing the reference's adaptive chunk iterator
    (iterators_and_indexers.py:259-515). The ``ft_r`` relation is emitted in
    ``dt_unit`` units exactly as the reference's built-in ``_ft_connector``
    (connector_selector_implementations.py:32-34).
    """
    ftf = ft_feature[0]
    ftt = ft_feature[1]
    dt_unit = ft_feature[2] if len(ft_feature) == 3 else None

    plan = PairPlan(
        connectors,
        selectors,
        ft_feature=ft_feature,
        r_dtype_dic=r_dtype_dic,
        no_transfer_rs=no_transfer_rs,
        transfer_features=transfer_features,
    )
    group_keys = [group_by] if isinstance(group_by, str) else list(group_by or [])
    needed = list(dict.fromkeys([*group_keys, index_col, ftf, *plan.required_features]))
    v_proj = v.select(*needed)

    out_keys = group_keys if keep_keys else []
    schema = _infer_edge_schema(plan, v_proj, index_col, out_keys)

    # numeric band value. Timestamps stay INTEGER microseconds end-to-end:
    # bins, ordering and the band pre-filter are exact long arithmetic, so a
    # pair whose delta is exactly ftt can never round out of the pre-filter
    # (the double seconds it replaced lost ~5e-7 s per endpoint). The exact
    # ft selector downstream then applies the same cut on the raw feature.
    is_ts = isinstance(v_proj.schema[ftf].dataType, (T.TimestampType, T.TimestampNTZType))
    if is_ts:
        if dt_unit is None:
            raise ValueError("datetime ft_feature requires a dt_unit: (col, ftt, unit)")
        ftt_num = int(round(float(ftt) * _UNIT_SECONDS[dt_unit] * 1e6))
        val = F.unix_micros(F.col(ftf).cast("timestamp"))
        # exact floor division for longs of any sign (pmod remainder is
        # non-negative; the division is then exact in double)
        def _bin_of(c):
            return ((c - F.pmod(c, F.lit(ftt_num))) / F.lit(ftt_num)).cast("long")
    else:
        ftt_num = float(ftt)
        val = F.col(ftf).cast("double")

        def _bin_of(c):
            return F.floor(c / ftt_num)

    if ftt_num <= 0:
        raise ValueError("ft threshold must be > 0")

    src = v_proj.withColumn("_v", val).withColumn(
        "_bin", F.explode(F.array(_bin_of(F.col("_v")), _bin_of(F.col("_v")) + 1))
    )
    dst = v_proj.withColumn("_v", val).withColumn("_bin", _bin_of(F.col("_v")))

    s_side = src.select(
        *[F.col(k).alias(f"__k_{k}") for k in group_keys],
        F.col("_bin"),
        F.col("_v").alias("_v_s"),
        *[F.col(c).alias(f"{c}_s") for c in needed if c not in group_keys],
    )
    t_side = dst.select(
        *[F.col(k) for k in group_keys],
        F.col("_bin"),
        F.col("_v").alias("_v_t"),
        *[F.col(c).alias(f"{c}_t") for c in needed if c not in group_keys],
    )
    join_cond = s_side._bin == t_side._bin
    for k in group_keys:
        join_cond = join_cond & (s_side[f"__k_{k}"] == t_side[k])

    # exact band + sorted-order (feature, id) tie-break — the reference's
    # positional s<t over the feature-sorted table (deepgraph.py:1046-1050)
    order_pred = (F.col("_v_t") > F.col("_v_s")) | (
        (F.col("_v_t") == F.col("_v_s")) & (F.col(f"{index_col}_t") > F.col(f"{index_col}_s"))
    )
    band_pred = (F.col("_v_t") - F.col("_v_s")) <= ftt_num

    pairs = (
        s_side.join(t_side, join_cond, "inner")
        .where(order_pred & band_pred)
        .drop("_bin")
    )

    base_feats = [c for c in needed if c not in group_keys]  # includes index_col, ftf

    def run_plan(iterator):
        for pdf in iterator:
            if len(pdf) == 0:
                continue
            for lo in range(0, len(pdf), batch_rows):
                batch = pdf.iloc[lo : lo + batch_rows]
                n = len(batch)
                # rebuild a positional node frame: rows 0..n-1 = sources,
                # n..2n-1 = targets, so PairPlan.evaluate runs unchanged.
                vi = pd.DataFrame(
                    {
                        c: np.concatenate(
                            [np.asarray(batch[f"{c}_s"].values), np.asarray(batch[f"{c}_t"].values)]
                        )
                        for c in base_feats
                    }
                )
                sources = np.arange(n, dtype=np.int64)
                targets = sources + n
                key_arrays = (
                    {k: np.concatenate([batch[k].values, batch[k].values]) for k in out_keys}
                    if out_keys
                    else None
                )
                out = _build_edge_pdf(
                    plan, vi, sources, targets, index_col, key_arrays=key_arrays
                )
                if len(out):
                    yield out

    sel = [F.col(k).alias(k) for k in group_keys] + [
        F.col(f"{c}_s") for c in base_feats
    ] + [F.col(f"{c}_t") for c in base_feats]
    return pairs.select(*sel).mapInPandas(run_plan, schema)
