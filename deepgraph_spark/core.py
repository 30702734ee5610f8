"""DeepGraphFrame — the (v, e) node/edge-table pair as Spark DataFrames.

Mirrors the reference's central ``DeepGraph`` object (deepgraph.py:82-99):
``v`` is the node table (unique id column), ``e`` the edge table with columns
``s, t`` keeping the upper-triangle invariant ``s < t``
(deepgraph.py:232-234). All graph-partitioning, filtering and interface
methods from the reference are re-expressed as declarative DataFrame plans so
Catalyst handles pruning/pushdown/join-selection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from deepgraph_spark import edges as _edges


def _as_list(x):
    if x is None:
        return []
    return [x] if isinstance(x, str) else list(x)


#: aggregation-name → Spark function for partition_* feature/relation funcs
_AGG_FUNCS = {
    "min": F.min,
    "max": F.max,
    "sum": F.sum,
    "mean": F.mean,
    "avg": F.mean,
    "std": F.stddev_samp,
    "var": F.var_samp,
    "count": F.count,
    "first": F.first,
    "last": F.last,
    "list": F.collect_list,
    "set": F.collect_set,
    "nunique": F.countDistinct,
    "median": lambda c: F.median(c),
}


def _agg_exprs(func_dic: dict | None, prefix_sep: str = "_") -> list:
    """Build aliased agg expressions; multi-func columns get ``{col}_{fn}``
    names, flattened exactly like the reference
    (iterators_and_indexers.py:139-146)."""
    exprs = []
    for col, funcs in (func_dic or {}).items():
        funcs = funcs if isinstance(funcs, (list, tuple)) else [funcs]
        multi = len(funcs) > 1
        for fn in funcs:
            if callable(fn) and not isinstance(fn, str):
                raise TypeError(
                    f"python callables are driver-side only in the reference; "
                    f"use a named agg from {sorted(_AGG_FUNCS)} or a Column for {col}"
                )
            name = fn
            expr = _AGG_FUNCS[name](F.col(col))
            alias = f"{col}{prefix_sep}{name}" if multi else col
            exprs.append(expr.alias(alias))
    return exprs


class DeepGraphFrame:
    """Node table ``v`` + edge table ``e`` (both Spark DataFrames).

    ``index_col`` names the unique node id column in ``v``; ``e`` uses
    ``s`` / ``t`` id columns (``s < t`` invariant).
    """

    def __init__(self, v: DataFrame, e: DataFrame | None = None, index_col: str = "id"):
        self.v = v
        self.e = e
        self.index_col = index_col

    # -- construction -----------------------------------------------------
    def create_edges(self, connectors=None, selectors=None, **kw) -> "DeepGraphFrame":
        self.e = _edges.create_edges(
            self.v, connectors, selectors, index_col=self.index_col, **kw
        )
        return self

    def create_edges_ft(self, ft_feature, connectors=None, selectors=None, **kw) -> "DeepGraphFrame":
        self.e = _edges.create_edges_ft(
            self.v, ft_feature, connectors, selectors, index_col=self.index_col, **kw
        )
        return self

    # -- properties (deepgraph.py:3697-3740) ------------------------------
    @property
    def n(self) -> int:
        return self.v.count()

    @property
    def m(self) -> int:
        return self.e.count() if self.e is not None else 0

    def f(self) -> dict:
        """Per-column non-null counts of v."""
        row = self.v.agg(*[F.count(c).alias(c) for c in self.v.columns]).collect()[0]
        return row.asDict()

    def r(self) -> dict:
        row = self.e.agg(*[F.count(c).alias(c) for c in self.e.columns]).collect()[0]
        return row.asDict()

    # -- supernode labels (deepgraph.py:101-111,137-146) ------------------
    def supernode_labels_by(self, label_col: str, by) -> "DeepGraphFrame":
        """Dense group-id enumeration: join v against a distinct-key table
        indexed by sort+zipWithIndex (the scalable analog of pandas
        ``grouper.group_info[0]`` — no global window, so millions of groups
        stay distributed)."""
        by = _as_list(by)
        labels = with_dense_index(self.v.select(*by).distinct(), by, label_col)
        # no broadcast hint: the label table is distinct-keys-sized, which is
        # documented to reach millions of groups — AQE broadcasts it when (and
        # only when) it is actually small
        self.v = self.v.join(labels, on=by, how="left")
        return self

    def superedge_labels_by(self, label_col: str, by) -> "DeepGraphFrame":
        """Edge-side twin of :meth:`supernode_labels_by`: dense relation-group
        ids on ``e`` (ref ``DeepGraph.__init__`` superedge labels,
        deepgraph.py:137-146)."""
        by = _as_list(by)
        labels = with_dense_index(self.e.select(*by).distinct(), by, label_col)
        self.e = self.e.join(labels, on=by, how="left")  # AQE-decided strategy
        return self

    # -- partitioning (deepgraph.py:1086-1744) -----------------------------
    def partition_nodes(
        self,
        features,
        feature_funcs: dict | None = None,
        n_nodes: bool = True,
        return_gv: bool = False,
    ):
        """Supernode table. ``return_gv=True`` additionally returns the live
        ``GroupedData`` handle for follow-up aggregations — the Spark analog
        of the reference's ``return_gv`` groupby object (deepgraph.py:1086)."""
        features = _as_list(features)
        aggs = []
        if n_nodes:
            aggs.append(F.count(F.lit(1)).alias("n_nodes"))
        aggs += _agg_exprs(feature_funcs)
        sv = self.v.groupBy(*features).agg(*aggs)
        if return_gv:
            return sv, self.v.groupBy(*features)
        return sv

    def _enriched_edges(self, source_features, target_features) -> DataFrame:
        """Transfer v features onto e on demand (ref deepgraph.py:1469-1492)
        via two equi-joins; the projected v side is broadcast when narrow."""
        e = self.e
        # features already transferred onto e at construction are reused as-is
        sf = [c for c in _as_list(source_features) if f"{c}_s" not in e.columns]
        tf = [c for c in _as_list(target_features) if f"{c}_t" not in e.columns]
        if sf:
            vs = self.v.select(F.col(self.index_col).alias("s"), *[F.col(c).alias(f"{c}_s") for c in sf])
            e = e.join(vs, "s", "left")
        if tf:
            vt = self.v.select(F.col(self.index_col).alias("t"), *[F.col(c).alias(f"{c}_t") for c in tf])
            e = e.join(vt, "t", "left")
        return e

    def partition_edges(
        self,
        relations=None,
        source_features=None,
        target_features=None,
        relation_funcs: dict | None = None,
        n_edges: bool = True,
        return_ge: bool = False,
    ):
        """Superedge table; ``return_ge=True`` also returns the live
        ``GroupedData`` (ref ``return_ge``, deepgraph.py:1224)."""
        relations = _as_list(relations)
        sf, tf = _as_list(source_features), _as_list(target_features)
        e = self._enriched_edges(sf, tf)
        keys = [f"{c}_s" for c in sf] + [f"{c}_t" for c in tf] + relations
        aggs = []
        if n_edges:
            aggs.append(F.count(F.lit(1)).alias("n_edges"))
        aggs += _agg_exprs(relation_funcs)
        se = e.groupBy(*keys).agg(*aggs)
        if return_ge:
            return se, e.groupBy(*keys)
        return se

    def partition_graph(
        self,
        features,
        feature_funcs: dict | None = None,
        relation_funcs: dict | None = None,
        n_nodes: bool = True,
        n_edges: bool = True,
    ) -> tuple[DataFrame, DataFrame]:
        """Supergraph: the node partition induces the edge partition
        (ref deepgraph.py:1507-1744). Returns (sv, se)."""
        features = _as_list(features)
        sv = self.partition_nodes(features, feature_funcs, n_nodes)
        se = self.partition_edges(
            relations=None,
            source_features=features,
            target_features=features,
            relation_funcs=relation_funcs,
            n_edges=n_edges,
        )
        return sv, se

    # -- filters (deepgraph.py:2539-2695) ----------------------------------
    def filter_by_values_v(self, col: str, values) -> "DeepGraphFrame":
        values = values if isinstance(values, (list, tuple, set)) else [values]
        self.v = self.v.where(F.col(col).isin(list(values)))
        self.update_edges()
        return self

    def filter_by_values_e(self, relation: str, values) -> "DeepGraphFrame":
        values = values if isinstance(values, (list, tuple, set)) else [values]
        self.e = self.e.where(F.col(relation).isin(list(values)))
        return self

    def filter_by_interval_v(self, col: str, interval, endpoint: bool = True) -> "DeepGraphFrame":
        lo, hi = interval
        pred = (F.col(col) >= lo) & ((F.col(col) <= hi) if endpoint else (F.col(col) < hi))
        self.v = self.v.where(pred)
        self.update_edges()
        return self

    def filter_by_interval_e(self, relation: str, interval, endpoint: bool = True) -> "DeepGraphFrame":
        lo, hi = interval
        pred = (F.col(relation) >= lo) & ((F.col(relation) <= hi) if endpoint else (F.col(relation) < hi))
        self.e = self.e.where(pred)
        return self

    def update_edges(self) -> "DeepGraphFrame":
        """Cascade node deletion to edges: double semi-join
        (ref deepgraph.py:2539-2556, ``s.isin(v.index) & t.isin(v.index)``)."""
        if self.e is None:
            return self
        ids = self.v.select(F.col(self.index_col).alias("__id"))
        self.e = (
            self.e.join(ids.withColumnRenamed("__id", "s"), "s", "left_semi")
            .join(ids.withColumnRenamed("__id", "t"), "t", "left_semi")
        )
        return self

    def ego_net(
        self,
        seeds,
        radius: int = 1,
        direction: str = "undirected",
        dist_col: str = "dist",
    ) -> "DeepGraphFrame":
        """k-hop ego network: keep the vertices within ``radius`` hops of
        any seed (hop distance appended as ``dist_col``) and the edges they
        induce — the reference's filter-then-induce pattern
        (deepgraph.py:2539-2597: filter ``v``, then cascade to ``e``) fused
        into one operator over a truncated multi-source BFS. ``seeds`` is a
        single-column DataFrame of vertex ids or an iterable of ids;
        ``direction`` follows :func:`deepgraph_spark.algorithms.bfs.bfs`.
        """
        from pyspark.sql import DataFrame as _DF

        from deepgraph_spark.algorithms import bfs

        if not isinstance(seeds, _DF):
            seeds = self.v.sparkSession.createDataFrame(
                [(s,) for s in seeds], f"{self.index_col} long"
            )
        d = bfs(self.e, seeds, direction=direction, max_depth=radius)
        self.v = self.v.join(
            d.select(F.col("id").alias(self.index_col), F.col("dist").alias(dist_col)),
            self.index_col,
        )
        self.update_edges()
        return self

    def ego_net_weighted(
        self,
        seeds,
        budget: float,
        *,
        weight_col: str = "w",
        direction: str = "forward",
        dist_col: str = "dist",
        max_iter: int = 100,
    ) -> "DeepGraphFrame":
        """Weight-budget ego network — the weighted twin of :meth:`ego_net`:
        keep the vertices whose weighted shortest-path distance from any seed
        is ≤ ``budget`` ("everything within X seconds of these turns" on a
        time-delta-weighted graph), append the distance, and induce the
        edges. Composes :func:`deepgraph_spark.algorithms.sssp.sssp` with
        ``max_dist`` in-loop pruning (the state never holds more than the
        budget ball — exact under non-negative weights) and the reference's
        filter-then-induce cascade (deepgraph.py:2539-2597 via
        :meth:`update_edges`). ``seeds`` as in :meth:`ego_net`."""
        from pyspark.sql import DataFrame as _DF

        from deepgraph_spark.algorithms import sssp

        if not isinstance(seeds, _DF):
            seeds = self.v.sparkSession.createDataFrame(
                [(s,) for s in seeds], f"{self.index_col} long"
            )
        d = sssp(
            self.e,
            seeds,
            weight=weight_col,
            direction=direction,
            max_iter=max_iter,
            max_dist=float(budget),
        )
        self.v = self.v.join(
            d.select(F.col("id").alias(self.index_col), F.col("dist").alias(dist_col)),
            self.index_col,
        )
        self.update_edges()
        return self

    # -- binning / datetime categories (deepgraph.py:2321-2537) ------------
    def append_binning_labels_v(
        self,
        col: str,
        new_col: str,
        bins=10,
        log_bins: bool = False,
        floor: bool = False,
        return_bin_edges: bool = False,
    ):
        """``np.digitize`` bin labels — full reference semantics
        (deepgraph.py:2321-2460; edge construction utils.py:6-25):

        * ``bins`` int, linear: edges = ``np.linspace(min, max, bins)``;
        * ``bins`` int, ``log_bins``: bins *per magnitude* — ``n =
          ceil((log10 max - log10 min) * bins)`` logspaced edges;
        * ``floor``: edges floored to integers, de-duplicated, last edge
          pinned to max;
        * ``bins`` sequence: explicit edges (incl. rightmost), non-uniform
          widths allowed.

        Label = ``np.digitize(x, edges)`` (count of edges <= x), evaluated as
        a native Column over the edge-literal array — one aggregate for
        min/max, then pure codegen; no data leaves the executors.
        Returns the edges if ``return_bin_edges`` (else ``self``).
        """
        import numpy as np

        if hasattr(bins, "__len__") and not isinstance(bins, str):
            edges = np.asarray(list(bins), dtype=float)
        else:
            mm = self.v.agg(
                F.min(F.col(col).cast("double")).alias("lo"),
                F.max(F.col(col).cast("double")).alias("hi"),
            ).collect()[0]
            lo, hi = float(mm["lo"]), float(mm["hi"])
            if not log_bins:
                edges = np.linspace(lo, hi, int(bins))
                if floor:
                    edges = np.unique(np.floor(edges))
                    edges[-1] = hi
            else:
                n_edges = int(np.ceil((np.log10(hi) - np.log10(lo)) * bins))
                edges = np.logspace(np.log10(lo), np.log10(hi), n_edges)
                if floor:
                    edges = np.unique(np.floor(edges))
                    edges[-1] = hi
        arr = F.array([F.lit(float(e)) for e in edges])
        x = F.col(col).cast("double")
        label = F.size(F.filter(arr, lambda e: x >= e))
        self.v = self.v.withColumn(new_col, label.cast("int"))
        if return_bin_edges:
            return edges
        return self

    def append_datetime_categories_v(self, col: str, tod_col: str = "tod", season_col: str = "season") -> "DeepGraphFrame":
        """time-of-day ∈ {0..3} (6h blocks) and meteorological season ∈ {0..3}
        (DJF=0, MAM=1, JJA=2, SON=3) — ref deepgraph.py:2462-2537."""
        h = F.hour(F.col(col))
        m = F.month(F.col(col))
        self.v = self.v.withColumn(tod_col, F.floor(h / 6).cast("int")).withColumn(
            season_col, (F.floor((m % 12) / 3)).cast("int")
        )
        return self

    # -- graph algorithms (ref append_cp, deepgraph.py:2244-2319) -----------
    def append_cp(
        self,
        directed: bool = False,
        connection: str = "weak",
        col_name: str = "cp",
        label_by_size: bool = True,
        consolidate_singles: bool = False,
        **kw,
    ) -> "DeepGraphFrame":
        """Attach connected-component labels to ``v`` — the reference's
        ``append_cp`` (size-ordered labels; ``consolidate_singles`` puts all
        singletons under label 0), computed distributed. Parameter order
        matches the reference exactly (deepgraph.py:2244-2245: directed,
        connection, col_name, label_by_size, consolidate_singles), so
        positional reference call sites bind identically.

        ``directed=True, connection='strong'`` labels strongly connected
        components (mutual reachability — ref deepgraph.py:2244-2258, where
        scipy.csgraph does the switch); ``connection='weak'`` on a directed
        graph equals undirected CC (scipy symmetrizes the same way), so both
        weak paths share the large-star/small-star kernel."""
        if connection not in ("weak", "strong"):
            raise ValueError("connection must be 'weak' or 'strong'")
        from deepgraph_spark.algorithms import (
            connected_components,
            strongly_connected_components,
        )

        kernel = (
            strongly_connected_components
            if (directed and connection == "strong")
            else connected_components
        )
        cp = kernel(
            self.e,
            vertices=self.v.select(self.index_col),
            index_col=self.index_col,
            label_by_size=label_by_size,
            consolidate_singles=consolidate_singles,
            **kw,
        )
        if col_name != "cp":
            cp = cp.withColumnRenamed("cp", col_name)
        self.v = self.v.join(cp, self.index_col, "left")
        return self

    # -- exports (test-oracle only; ref deepgraph.py:1746-2242) -------------
    def to_scipy_coo(self, relation: str | None = None, dropna: bool = True):
        """COO adjacency for *small* graphs (collects to the driver — the
        distributed analog for algorithms is the per-partition CSR path in
        deepgraph_spark.algorithms)."""
        import numpy as np
        import scipy.sparse as sp

        vpd = self.v.select(self.index_col).toPandas()
        ids = np.sort(vpd[self.index_col].values)
        pos = {x: i for i, x in enumerate(ids)}
        cols = ["s", "t"] + ([relation] if relation else [])
        epd = self.e.select(*cols).toPandas()
        if relation and dropna:
            epd = epd.dropna(subset=[relation])
        data = epd[relation].values if relation else np.ones(len(epd), bool)
        rows = np.array([pos[x] for x in epd["s"].values])
        colsx = np.array([pos[x] for x in epd["t"].values])
        return sp.coo_matrix((data, (rows, colsx)), shape=(len(ids), len(ids)))

    def to_networkx_multigraph(self, relations=None):
        """MultiDiGraph export: one edge per non-null relation CELL
        (ref ``return_nx_multigraph`` / ``_iter_edges``,
        iterators_and_indexers.py:708-715). Test-oracle only."""
        import networkx as nx

        relations = _as_list(relations)
        g = nx.MultiDiGraph()
        for row in self.v.toPandas().itertuples():
            g.add_node(getattr(row, self.index_col))
        epd = self.e.select("s", "t", *relations).toPandas()
        for row in epd.itertuples(index=False):
            for rel in relations:
                val = getattr(row, rel)
                if val is not None and not (isinstance(val, float) and val != val):
                    g.add_edge(row.s, row.t, key=rel, **{rel: val})
        return g

    def to_networkx(self, relations=None, dropna: str = "none"):
        import networkx as nx

        g = nx.DiGraph()
        relations = _as_list(relations)
        vpd = self.v.toPandas()
        for _, row in vpd.iterrows():
            g.add_node(row[self.index_col], **{c: row[c] for c in vpd.columns if c != self.index_col})
        epd = self.e.toPandas()
        if dropna == "any" and relations:
            epd = epd.dropna(subset=relations, how="any")
        elif dropna == "all" and relations:
            epd = epd.dropna(subset=relations, how="all")
        for _, row in epd.iterrows():
            g.add_edge(row["s"], row["t"], **{c: row[c] for c in relations})
        return g


def with_dense_index(df: DataFrame, order_by, index_col: str = "id") -> DataFrame:
    """Attach a dense 0-based id in ``order_by`` order — distributed, JVM-only.

    Two-pass partition-offset scheme with no Python round-trip and no
    single-partition global window (Catalyst has no distributed
    dense-rank-without-partition):

    1. ``repartitionByRange`` + ``sortWithinPartitions`` puts the data in
       global ``order_by`` order with partition ids ascending along the range;
       an eager ``localCheckpoint`` pins that layout so both downstream passes
       read identical blocks. ``monotonically_increasing_id`` then encodes
       ``(partition, local row number)`` in row-iteration order — which is the
       sorted order — entirely inside codegen.
    2. One tiny aggregation (map-side combined to <= 1 row per partition)
       yields per-partition counts; the cumulative offsets enter the plan as a
       literal map, so ``index = offset[pid] + local`` is pure codegen — no
       extra shuffle, no window.

    ``order_by``: column names or Column expressions (e.g. ``F.desc(...)``).

    Fault-tolerance tradeoff (round-3 advice): the eager ``localCheckpoint``
    pins blocks in executor storage WITHOUT lineage — on a real cluster an
    executor loss during the downstream job loses those blocks and fails the
    job (unlike a lineage-recoverable plan, which recomputes). That is the
    price of a layout both passes must read identically; long cluster jobs
    that need loss-recovery should persist the sorted layout to a reliable
    store first (``df.write.parquet`` + re-read — the same protocol
    ``SuperstepCheckpoint`` uses with ``checkpoint_dir``) and call this on
    the re-read table, making pass-1 input durable.
    """
    if not isinstance(order_by, (list, tuple)):
        order_by = [order_by]
    mask = (1 << 33) - 1  # mono id = pid << 33 | row-in-partition
    sdf = (
        df.repartitionByRange(*order_by)
        .sortWithinPartitions(*order_by)
        .withColumn("__mono", F.monotonically_increasing_id())
        .localCheckpoint(eager=True)
    )
    counts = (
        sdf.groupBy(F.shiftright("__mono", 33).alias("__pid"))
        .agg(F.count(F.lit(1)).alias("__n"))
        .collect()
    )
    offsets, acc = {}, 0
    for row in sorted(counts, key=lambda r: r["__pid"]):
        offsets[int(row["__pid"])] = acc
        acc += int(row["__n"])
    if not offsets:
        return sdf.drop("__mono").withColumn(index_col, F.lit(0).cast("long"))
    off_map = F.create_map(
        *[F.lit(x) for kv in sorted(offsets.items()) for x in kv]
    )
    pid = F.shiftright("__mono", 33)
    local = F.col("__mono").bitwiseAND(F.lit(mask))
    return sdf.withColumn(
        index_col, (off_map[pid] + local).cast("long")
    ).drop("__mono")
