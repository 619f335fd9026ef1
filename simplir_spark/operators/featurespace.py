"""Named feature-vector algebra — port of simplir's FeatureSpace
(simplir-learning-to-rank/src/SimplIR/FeatureSpace.hs:109-430).

The reference pins every feature vector to a typed space (sorted unique
names -> dense index); projection/stacking move vectors between spaces
with hard errors on unknown or missing names rather than silent zeros.
This module reproduces that algebra numpy-side for driver code (model
weights, normalizers), plus one Spark helper that re-orders an
``array<double>`` feature column between spaces as a pure JVM projection
(per-element ``element_at`` — the mapping is feature-count-sized, never
row-dependent).

Where the reference leans on phantom types (``FeatureSpace f s``) for
compile-time space identity, we check at runtime: every vector op
verifies the operands share the space (mirroring ``equivSpace``,
FeatureSpace.hs:374-385).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np


class FeatureSpace:
    """Sorted, unique feature names with dense indexes
    (mkFeatureSpace, FeatureSpace.hs:178-180)."""

    __slots__ = ("names", "_index")

    def __init__(self, names):
        names = list(names)
        if len(set(names)) != len(names):
            dup = sorted({n for n in names if names.count(n) > 1})
            raise ValueError(f"duplicate feature names: {dup}")
        self.names: tuple = tuple(sorted(names))
        self._index = {n: i for i, n in enumerate(self.names)}

    @property
    def dimension(self) -> int:
        return len(self.names)

    def index(self, name) -> int:
        """lookupFeatureIndex — KeyError on unknown (the reference's
        Maybe is consumed partially at every call site)."""
        return self._index[name]

    def __contains__(self, name) -> bool:
        return name in self._index

    def __eq__(self, other) -> bool:
        return isinstance(other, FeatureSpace) and self.names == other.names

    def __hash__(self) -> int:
        return hash(self.names)

    def __repr__(self) -> str:
        return f"FeatureSpace({list(self.names)!r})"

    def concat(self, other: "FeatureSpace") -> "FeatureSpace":
        """concatSpaces / Stack (FeatureSpace.hs:137-146): the combined
        space of two DISJOINT spaces."""
        overlap = set(self.names) & set(other.names)
        if overlap:
            raise ValueError(f"stacked spaces share names: {sorted(overlap)}")
        return FeatureSpace(self.names + other.names)

    def map_names(self, fn) -> "FeatureSpace":
        """mapFeatureNames (FeatureSpace.hs:127-131)."""
        return FeatureSpace([fn(n) for n in self.names])


@dataclass(frozen=True, eq=False)
class FeatureVec:
    """A dense vector pinned to its space (FeatureVec, FeatureSpace.hs:182).

    eq=False: the dataclass-generated __eq__/__hash__ would compare the
    ndarray field inside a tuple (ValueError: ambiguous truth value) and
    hash an unhashable array — equality is elementwise like the Eq
    instance on the reference's unboxed vectors.
    """

    space: FeatureSpace
    values: np.ndarray

    def __eq__(self, other) -> bool:
        return (
            isinstance(other, FeatureVec)
            and self.space == other.space
            and np.array_equal(self.values, other.values, equal_nan=True)
        )

    def __hash__(self) -> int:
        # canonicalize so vectors equal under __eq__ hash equally (ADVICE
        # r5): cast to float64 (dtype-insensitive like np.array_equal),
        # +0.0 folds -0.0 onto 0.0, and NaNs (equal under equal_nan=True
        # whatever their payload bits) collapse to one canonical NaN
        v = self.values.astype(np.float64, copy=True) + 0.0
        v[np.isnan(v)] = np.nan
        return hash((self.space, v.tobytes()))

    @staticmethod
    def from_list(space: FeatureSpace, pairs) -> "FeatureVec":
        """fromList (FeatureSpace.hs:223-251): every feature of the space
        exactly once; unknown, repeated, or missing names are errors."""
        vals = np.full(space.dimension, np.nan)
        seen = set()
        for name, v in pairs:
            if name not in space:
                raise KeyError(f"feature not in space: {name!r}")
            if name in seen:
                raise ValueError(f"feature repeated: {name!r}")
            seen.add(name)
            vals[space.index(name)] = float(v)
        missing = [n for n in space.names if n not in seen]
        if missing:
            raise ValueError(f"features missing: {missing}")
        return FeatureVec(space, vals)

    @staticmethod
    def repeat(space: FeatureSpace, value: float) -> "FeatureVec":
        return FeatureVec(space, np.full(space.dimension, float(value)))

    @staticmethod
    def generate(space: FeatureSpace, fn) -> "FeatureVec":
        return FeatureVec(space, np.array([float(fn(n)) for n in space.names]))

    def _check(self, other: "FeatureVec") -> None:
        if self.space != other.space:
            raise ValueError("feature vectors live in different spaces")

    def lookup(self, name) -> float:
        return float(self.values[self.space.index(name)])

    def to_list(self) -> list[tuple]:
        return list(zip(self.space.names, self.values.tolist()))

    def project(self, dst: FeatureSpace) -> "FeatureVec":
        """project (FeatureSpace.hs:339-361): re-express in ``dst``, which
        must be a subset of this vector's space."""
        try:
            ix = [self.space.index(n) for n in dst.names]
        except KeyError as e:
            raise KeyError(f"projection target has unknown feature: {e}") from e
        return FeatureVec(dst, self.values[ix])

    def stack(self, other: "FeatureVec") -> "FeatureVec":
        """stack (FeatureSpace.hs:387-394): concatenate two vectors into
        the stacked space (values re-sorted into its name order)."""
        combined = self.space.concat(other.space)
        return FeatureVec.from_list(combined, self.to_list() + other.to_list())

    def modify(self, pairs) -> "FeatureVec":
        """modify (FeatureSpace.hs:217-221): functional pointwise update."""
        vals = self.values.copy()
        for name, v in pairs:
            vals[self.space.index(name)] = float(v)
        return FeatureVec(self.space, vals)

    def accum(self, fn, pairs) -> "FeatureVec":
        """accum (FeatureSpace.hs:209-212)."""
        vals = self.values.copy()
        for name, v in pairs:
            i = self.space.index(name)
            vals[i] = fn(vals[i], float(v))
        return FeatureVec(self.space, vals)

    def zip_with(self, fn, other: "FeatureVec") -> "FeatureVec":
        self._check(other)
        return FeatureVec(
            self.space,
            np.array([fn(a, b) for a, b in zip(self.values, other.values)]),
        )

    def scale(self, s: float) -> "FeatureVec":
        return FeatureVec(self.space, self.values * float(s))

    def __add__(self, other: "FeatureVec") -> "FeatureVec":
        self._check(other)
        return FeatureVec(self.space, self.values + other.values)

    def dot(self, other: "FeatureVec") -> float:
        self._check(other)
        return float(self.values @ other.values)

    def sum(self) -> float:
        return float(self.values.sum())


def project_feature_column(col, src: FeatureSpace, dst: FeatureSpace):
    """Spark-side projection of an ``array<double>`` feature column laid
    out in ``src`` name order into ``dst`` order (a subset or reorder of
    ``src``) — pure JVM ``element_at`` gather, no UDF; the index mapping
    is dst-dimension-sized, independent of row count.
    """
    from pyspark.sql import functions as F

    try:
        ix = [src.index(n) for n in dst.names]
    except KeyError as e:
        raise KeyError(f"projection target has unknown feature: {e}") from e
    return F.array(*[F.element_at(col, i + 1) for i in ix])
