"""Connector / selector "query language" — the UDF surface of the engine.

The reference's entire scalar system is user functions whose *argument names*
are the query (ref: connectors_and_selectors.py:13-102): parameters ending in
``_s`` / ``_t`` bind to node-feature columns of the pair's source/target side,
other parameters bind to previously-computed relations, and output relation
names are recovered from the source text of the function's return statement.

This is a clean-room re-implementation of that contract for Spark:

* no class-level global registries — a :class:`PairPlan` is compiled per call
  and shipped (pickled) into Arrow-vectorized stages;
* connectors evaluate on whole numpy columns of a pair batch (never per row);
* selectors run **in user order** (hierarchical selection, ref
  deepgraph.py:302-316) and shrink the pair set before later, more expensive
  connectors run — demand-driven evaluation à la ``Selector.request_r``
  (ref connectors_and_selectors.py:238-243) is preserved via lazy topological
  triggering.
"""

from __future__ import annotations

import inspect
from dataclasses import dataclass, field

import numpy as np
import pandas as pd


def _parse_outputs(fct, is_selector: bool = False) -> list[str]:
    """Output variable names from the function's final ``return`` statement.

    Precedence: explicit ``fct.outputs`` attribute > source parse > (for
    connectors only) the function name as a single output.
    """
    explicit = getattr(fct, "outputs", None)
    if explicit is not None:
        return list(explicit)
    try:
        lines, _ = inspect.getsourcelines(fct)
    except (OSError, TypeError):
        if not is_selector:
            return [fct.__name__]
        raise ValueError(
            f"cannot read source of {fct!r}; set fct.outputs = ['sources', 'targets', ...]"
        )
    returns = [ln.strip() for ln in lines if ln.strip().startswith("return")]
    if not returns:
        raise ValueError(f"{fct.__name__} has no return statement")
    expr = returns[-1][len("return") :].strip()
    names = [x.strip() for x in expr.split(",") if x.strip()]
    for n in names:
        if not n.isidentifier():
            raise ValueError(
                f"{fct.__name__}: return must be a comma-separated list of "
                f"plain variable names (got {expr!r}); assign intermediate "
                "expressions to variables first"
            )
    return names


@dataclass
class Connector:
    """A vectorized pair function: features/relations in → relations out."""

    fct: object
    name: str = ""
    input_features: list[str] = field(default_factory=list)
    input_rs: list[str] = field(default_factory=list)
    output_rs: list[str] = field(default_factory=list)

    def __post_init__(self):
        assert callable(self.fct), f"{self.fct!r} is not callable"
        self.name = self.fct.__name__
        args = inspect.getfullargspec(self.fct).args
        self.input_features = [a for a in args if a.endswith("_s") or a.endswith("_t")]
        self.input_rs = [
            a for a in args if a not in self.input_features and a not in ("sources", "targets")
        ]
        self.output_rs = _parse_outputs(self.fct)


@dataclass
class Selector:
    """A pair predicate: takes ``sources, targets`` (+ inputs), returns the
    surviving subset (and optionally new relations)."""

    fct: object
    name: str = ""
    input_features: list[str] = field(default_factory=list)
    input_rs: list[str] = field(default_factory=list)
    output: list[str] = field(default_factory=list)
    output_rs: list[str] = field(default_factory=list)

    def __post_init__(self):
        assert callable(self.fct), f"{self.fct!r} is not callable"
        self.name = self.fct.__name__
        args = inspect.getfullargspec(self.fct).args
        self.input_features = [a for a in args if a.endswith("_s") or a.endswith("_t")]
        self.input_rs = [
            a
            for a in args
            if a not in self.input_features and a not in ("sources", "targets", "ftt")
        ]
        self.output = _parse_outputs(self.fct, is_selector=True)
        self.output_rs = [x for x in self.output if x not in ("sources", "targets")]


def _ft_connector_fn(ft_feature_s, ft_feature_t):
    """Built-in band relation (ref connector_selector_implementations.py:32-34)."""
    ft_r = ft_feature_t - ft_feature_s
    return ft_r


def _ft_selector_fn(ft_r, sources, targets, ftt):
    sources = sources[ft_r <= ftt]
    targets = targets[ft_r <= ftt]
    return sources, targets


class PairPlan:
    """Compiled connector/selector pipeline, evaluated per Arrow batch.

    The evaluation contract matches the reference exactly
    (iterators_and_indexers.py:653-691): selectors run in list order, each
    lazily triggering the connectors that produce its input relations; the
    pair set shrinks after each selector; remaining connectors run on the
    survivors only.
    """

    def __init__(
        self,
        connectors=None,
        selectors=None,
        ft_feature: tuple | None = None,
        r_dtype_dic: dict | None = None,
        no_transfer_rs=None,
        transfer_features=None,
    ):
        connectors = _as_list(connectors)
        selectors = _as_list(selectors)
        self.ft_feature = ft_feature
        self.dt_unit = None
        if ft_feature is not None and len(ft_feature) == 3:
            self.dt_unit = ft_feature[2]
        self.r_dtype_dic = dict(r_dtype_dic or {})
        self.no_transfer_rs = set(_as_list(no_transfer_rs))
        self.transfer_features = _as_list(transfer_features)

        self.connectors = [c if isinstance(c, Connector) else Connector(c) for c in connectors]
        self.selectors: list[Selector] = []
        ft_selector_placed = False
        for s in selectors:
            if isinstance(s, str) and s == "ft_selector":
                self.selectors.append(Selector(_ft_selector_fn))
                ft_selector_placed = True
            else:
                self.selectors.append(s if isinstance(s, Selector) else Selector(s))
        if ft_feature is not None:
            # band connector always present; band selector defaults to first
            # (cheapest, most selective) unless the user placed it explicitly
            # (ref iterators_and_indexers.py:42-50).
            self.connectors.insert(0, Connector(_ft_connector_fn))
            if not ft_selector_placed:
                self.selectors.insert(0, Selector(_ft_selector_fn))

        self._validate()

    # ------------------------------------------------------------------
    def _validate(self):
        out_counts: dict[str, int] = {}
        for cf in [*self.connectors, *self.selectors]:
            rs = cf.output_rs if isinstance(cf, Selector) else cf.output_rs
            for r in rs:
                out_counts[r] = out_counts.get(r, 0) + 1
        dupes = {r: n for r, n in out_counts.items() if n > 1}
        assert not dupes, f"duplicate output relations across connectors/selectors: {dupes}"
        self.relation_names = [
            r
            for cf in [*self.connectors, *self.selectors]
            for r in cf.output_rs
            if r not in self.no_transfer_rs
        ]
        unknown = set(self.r_dtype_dic) - set(out_counts)
        if unknown:
            import warnings

            warnings.warn(f"r_dtype_dic keys with no output relation: {sorted(unknown)}")

    # ------------------------------------------------------------------
    @property
    def required_features(self) -> list[str]:
        """Node columns the pipeline reads (for column pruning at the scan)."""
        feats: list[str] = []
        for cf in [*self.connectors, *self.selectors]:
            for f in cf.input_features:
                base = self.ft_feature[0] if f.startswith("ft_feature") else f[:-2]
                if base not in feats:
                    feats.append(base)
        for f in self.transfer_features:
            if f not in feats:
                feats.append(f)
        return feats

    # ------------------------------------------------------------------
    def _col_values(self, vi: pd.DataFrame, col: str, cache: dict) -> np.ndarray:
        """Column values prepared for pair indexing. Fixed-width array cells
        are densified ONCE per batch into a 2D matrix (n rows — cheap), so
        per-pair gathers are C-speed fancy indexing instead of np.stack over
        millions of object cells (30-100x faster for matrix connectors like
        pairwise correlation)."""
        if col in cache:
            return cache[col]
        vals = vi[col].values
        if vals.dtype == object and len(vals):
            first = vals[0]
            if isinstance(first, (np.ndarray, list)) and not isinstance(first, str):
                try:
                    m = np.asarray([np.asarray(x) for x in vals])
                    if m.ndim == 2 and m.dtype != object:
                        vals = m
                except (ValueError, TypeError):
                    pass  # ragged — keep object cells
        cache[col] = vals
        return vals

    def _feature_values(self, cf, vi: pd.DataFrame, sources, targets, cache: dict) -> dict:
        vals = {}
        for feature in cf.input_features:
            base = self.ft_feature[0] if feature.startswith("ft_feature") else feature[:-2]
            col = self._col_values(vi, base, cache)
            vals[feature] = col[sources if feature.endswith("_s") else targets]
        return vals

    def _run_connector(self, c: Connector, vi, sources, targets, stored: dict, cache: dict):
        ivdic = self._feature_values(c, vi, sources, targets, cache)
        for r in c.input_rs:
            if r not in stored:
                self._request_r(r, vi, sources, targets, stored, cache)
            if r not in stored:
                raise KeyError(
                    f"{c.name} requests relation {r!r}, which no connector "
                    "produces; check connector/selector order"
                )
            ivdic[r] = stored[r]
        out = c.fct(**ivdic)
        if not isinstance(out, tuple):
            out = (out,)
        for i, r in enumerate(c.output_rs):
            val = out[i]
            if r == "ft_r" and self.dt_unit is not None:
                val = val / np.timedelta64(1, self.dt_unit)
            stored[r] = np.asarray(val)

    def _request_r(self, r, vi, sources, targets, stored, cache):
        for c in self.connectors:
            if r in c.output_rs and not all(o in stored for o in c.output_rs):
                self._run_connector(c, vi, sources, targets, stored, cache)
                return

    # ------------------------------------------------------------------
    def evaluate(self, vi: pd.DataFrame, sources: np.ndarray, targets: np.ndarray):
        """Run the full pipeline on one batch of candidate pairs.

        ``vi``: node batch (positional); ``sources``/``targets``: positional
        indices into ``vi``. Returns ``(sources, targets, stored)`` where
        ``stored`` maps relation name → numpy array over surviving pairs.
        """
        stored: dict[str, np.ndarray] = {}
        cache: dict = {}
        n0 = len(sources)

        for sel in self.selectors:
            ivdic = self._feature_values(sel, vi, sources, targets, cache)
            for r in sel.input_rs:
                if r not in stored:
                    self._request_r(r, vi, sources, targets, stored, cache)
                if r not in stored:
                    raise KeyError(
                        f"{sel.name} requests relation {r!r}, which no "
                        "connector produces; check connector/selector order"
                    )
                ivdic[r] = stored[r]
            ivdic["sources"] = sources
            ivdic["targets"] = targets
            if sel.name == "_ft_selector_fn":
                ftt = self.ft_feature[1]
                if self.dt_unit is not None and not isinstance(ftt, (int, float)):
                    ftt = ftt / np.timedelta64(1, self.dt_unit)
                ivdic["ftt"] = ftt
            out = sel.fct(**ivdic)
            ovdic = {name: out[i] for i, name in enumerate(sel.output)}

            for r in sel.output_rs:
                assert len(ovdic[r]) == len(sources), (
                    f"selector {sel.name}: output relation {r} must keep the "
                    "pre-selection pair count"
                )
            new_s, new_t = np.asarray(ovdic["sources"]), np.asarray(ovdic["targets"])
            assert len(new_s) == len(new_t), "reduced sources/targets shape mismatch"
            for r in sel.output_rs:
                stored[r] = np.asarray(ovdic[r])

            if len(new_s) != len(sources):
                # pairs are unique → align survivors by combined key
                # (vectorized replacement for the Cython
                # _find_selected_indices kernel, ref _find_selected_indices.pyx:25-51)
                n = len(vi)
                old_key = sources.astype(np.int64) * n + targets.astype(np.int64)
                new_key = new_s.astype(np.int64) * n + new_t.astype(np.int64)
                keep = np.isin(old_key, new_key)
                if not np.array_equal(old_key[keep], new_key):
                    # a selector that reorders (or duplicates) survivors would
                    # silently misalign every previously stored relation with
                    # its pair — fail loudly instead (contract: selectors
                    # return an order-preserving subset, ref deepgraph.py:302)
                    raise ValueError(
                        f"selector {sel.name} returned pairs out of the input "
                        "order (or with duplicates); selectors must return an "
                        "order-preserving subset of (sources, targets)"
                    )
                for r in stored:
                    stored[r] = stored[r][keep]
            sources, targets = new_s, new_t

        # connectors not yet triggered run on survivors only
        for c in self.connectors:
            if not all(r in stored for r in c.output_rs):
                self._run_connector(c, vi, sources, targets, stored, cache)

        for r in list(stored):
            if r in self.no_transfer_rs:
                del stored[r]
            elif r in self.r_dtype_dic:
                stored[r] = stored[r].astype(self.r_dtype_dic[r])
        assert len({len(v) for v in stored.values()} | {len(sources)}) == 1, (
            f"relation arrays out of sync with pair count (n0={n0})"
        )
        return sources, targets, stored


def _as_list(x):
    if x is None:
        return []
    if isinstance(x, (list, tuple)):
        return list(x)
    return [x]


# ---------------------------------------------------------------------------
# Built-in connector/selector library (ref connector_selector_implementations.py)
# — re-expressed; the Spark-native Column versions live in functions.py.
# ---------------------------------------------------------------------------

def great_circle_dist(lat_s, lat_t, lon_s, lon_t):
    """Spherical law of cosines distance in km (vectorized numpy)."""
    lat_s_r = np.radians(lat_s.astype(float))
    lat_t_r = np.radians(lat_t.astype(float))
    dlon = np.radians(lon_t.astype(float) - lon_s.astype(float))
    cos_d = np.sin(lat_s_r) * np.sin(lat_t_r) + np.cos(lat_s_r) * np.cos(lat_t_r) * np.cos(dlon)
    gcd = np.arccos(np.clip(cos_d, -1.0, 1.0)) * 6371.0
    return gcd


def cp_node_intersection(supernode_ids_s, supernode_ids_t):
    """Set intersection + cardinality over array-valued columns."""
    intsec = np.array(
        [set(a) & set(b) for a, b in zip(supernode_ids_s, supernode_ids_t)], dtype=object
    )
    intsec_card = np.array([len(x) for x in intsec], dtype=np.int64)
    return intsec, intsec_card


def cp_intersection_strength(supernode_ids_s, supernode_ids_t, intsec_card):
    min_card = np.minimum(
        np.array([len(a) for a in supernode_ids_s]),
        np.array([len(b) for b in supernode_ids_t]),
    ).astype(float)
    intsec_strength = intsec_card / min_card
    return intsec_strength


def hypergeometric_p_value(n_unique_nodes, intsec_card, supernode_ids_s, supernode_ids_t):
    from scipy.stats import hypergeom

    card_s = np.array([len(a) for a in supernode_ids_s])
    card_t = np.array([len(b) for b in supernode_ids_t])
    hg_p = np.array(
        [
            hypergeom.sf(ic - 1, n_unique_nodes, cs, ct)
            for ic, cs, ct in zip(intsec_card, card_s, card_t)
        ]
    )
    return hg_p
