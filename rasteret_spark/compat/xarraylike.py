"""Minimal labeled-array shim with xarray's core surface.

The reference hands query results to users as ``xarray.DataArray`` /
``Dataset`` (``src/rasteret/core/raster_accessor.py:1328-1477``); this
container has no xarray, so ``assemble.to_xarray`` upgrades to the real
library when importable and otherwise returns this shim — same ``dims`` /
``coords`` / ``attrs`` / ``values``, label selection (``sel`` with exact
or ``method="nearest"``), positional selection (``isel``), reductions
over named dims, and elementwise arithmetic.  Code written against this
subset runs unchanged against real xarray.

Deliberately NOT implemented (raise, never silently wrong): alignment of
differently-labeled operands, broadcasting by dim name, groupby/resample,
IO.  Those need the real library.
"""

from __future__ import annotations

import numpy as np

__all__ = ["DataArray", "Dataset"]


class DataArray:
    __slots__ = ("values", "dims", "coords", "attrs", "name")

    def __init__(self, values, dims, coords=None, attrs=None, name=None):
        self.values = np.asarray(values)
        dims = tuple(dims)
        if len(dims) != self.values.ndim:
            raise ValueError(f"{len(dims)} dims for {self.values.ndim}-d data")
        self.dims = dims
        self.coords = {}
        for k, v in (coords or {}).items():
            if k not in dims:
                raise ValueError(f"coord {k!r} is not a dim {dims}")
            v = np.asarray(v)
            if v.shape != (self.values.shape[dims.index(k)],):
                raise ValueError(f"coord {k!r} length {v.shape} != dim size")
            self.coords[k] = v
        self.attrs = dict(attrs or {})
        self.name = name

    # --- basic introspection --------------------------------------------------
    @property
    def shape(self):
        return self.values.shape

    @property
    def ndim(self):
        return self.values.ndim

    @property
    def dtype(self):
        return self.values.dtype

    @property
    def size(self):
        return self.values.size

    def __array__(self, dtype=None):
        return self.values if dtype is None else self.values.astype(dtype)

    def item(self):
        return self.values.item()

    def __float__(self):
        return float(self.values)

    def __int__(self):
        return int(self.values)

    def __repr__(self):
        dims = ", ".join(f"{d}: {s}" for d, s in zip(self.dims, self.shape))
        return (f"<rasteret_spark.DataArray ({dims})>\n{self.values!r}\n"
                f"Coordinates: {list(self.coords)}\nAttributes: {list(self.attrs)}")

    # --- selection --------------------------------------------------------------
    def isel(self, **indexers):
        key = [slice(None)] * self.ndim
        for d, i in indexers.items():
            if d not in self.dims:
                raise KeyError(f"no dim {d!r} in {self.dims}")
            key[self.dims.index(d)] = i
        out = self.values[tuple(key)]
        new_dims = tuple(
            d for d, k in zip(self.dims, key)
            if isinstance(k, slice) or np.ndim(k) > 0
        )
        new_coords = {}
        for d, c in self.coords.items():
            k = key[self.dims.index(d)]
            if isinstance(k, slice) or np.ndim(k) > 0:
                new_coords[d] = c[k]
        return DataArray(out, new_dims, new_coords, self.attrs, self.name)

    def sel(self, method=None, **indexers):
        pos = {}
        for d, want in indexers.items():
            if d not in self.coords:
                raise KeyError(f"dim {d!r} has no coordinate labels")
            c = self.coords[d]
            if isinstance(want, slice):
                # xarray slice semantics follow the coordinate's own order:
                # start is the first label kept, stop the last — for a
                # DESCENDING coord (y usually descends) start is the upper
                # bound and stop the lower, including one-sided slices
                start, stop = want.start, want.stop
                descending = len(c) > 1 and c[0] > c[-1]
                mask = np.ones(len(c), bool)
                if descending:
                    if start is not None:
                        mask &= c <= start
                    if stop is not None:
                        mask &= c >= stop
                else:
                    if start is not None:
                        mask &= c >= start
                    if stop is not None:
                        mask &= c <= stop
                (idx,) = np.nonzero(mask)
                if len(idx) == 0:
                    pos[d] = slice(0, 0)
                else:
                    pos[d] = slice(int(idx[0]), int(idx[-1]) + 1)
                continue
            if method == "nearest":
                want_arr = np.asarray(want)
                datelike = (
                    want_arr.dtype.kind in "mM"
                    or c.dtype.kind in "mM"
                    or hasattr(want, "isoformat")
                    or (c.dtype.kind == "O" and len(c) and hasattr(c[0], "isoformat"))
                )
                if datelike:
                    diffs = np.abs(
                        np.array(c, dtype="datetime64[ns]").astype(np.int64)
                        - np.datetime64(want).astype("datetime64[ns]").astype(np.int64)
                    )
                else:
                    diffs = np.abs(c.astype(np.float64) - float(want))
                pos[d] = int(np.argmin(diffs))
            else:
                matches = np.nonzero(c == np.asarray(want, dtype=c.dtype))[0]
                if len(matches) == 0:
                    raise KeyError(f"{want!r} not found in coordinate {d!r} "
                                   "(pass method='nearest' for inexact lookup)")
                pos[d] = int(matches[0])
        return self.isel(**pos)

    # --- reductions ---------------------------------------------------------------
    def _reduce(self, fn, dim=None, **kw):
        if dim is None:
            return fn(self.values, **kw)
        dims = (dim,) if isinstance(dim, str) else tuple(dim)
        axes = tuple(self.dims.index(d) for d in dims)
        out = fn(self.values, axis=axes, **kw)
        new_dims = tuple(d for d in self.dims if d not in dims)
        new_coords = {d: c for d, c in self.coords.items() if d not in dims}
        return DataArray(out, new_dims, new_coords, self.attrs, self.name)

    def mean(self, dim=None):
        return self._reduce(np.nanmean, dim)

    def median(self, dim=None):
        return self._reduce(np.nanmedian, dim)

    def min(self, dim=None):
        return self._reduce(np.nanmin, dim)

    def max(self, dim=None):
        return self._reduce(np.nanmax, dim)

    def sum(self, dim=None):
        return self._reduce(np.nansum, dim)

    def std(self, dim=None):
        return self._reduce(np.nanstd, dim)

    # --- arithmetic (same-shape or scalar; no label alignment) ---------------------
    def _binop(self, other, op):
        if isinstance(other, DataArray):
            if other.dims != self.dims:
                raise ValueError(
                    f"operands have different dims {self.dims} vs {other.dims};"
                    " label alignment needs real xarray"
                )
            for d in self.coords:
                if d in other.coords and not np.array_equal(
                    self.coords[d], other.coords[d]
                ):
                    raise ValueError(
                        f"coordinate {d!r} differs between operands; label "
                        "alignment needs real xarray"
                    )
            other = other.values
        return DataArray(op(self.values, other), self.dims, self.coords, self.attrs)

    def __add__(self, o):
        return self._binop(o, np.add)

    def __radd__(self, o):
        return self._binop(o, lambda a, b: np.add(b, a))

    def __sub__(self, o):
        return self._binop(o, np.subtract)

    def __rsub__(self, o):
        return self._binop(o, lambda a, b: np.subtract(b, a))

    def __mul__(self, o):
        return self._binop(o, np.multiply)

    def __rmul__(self, o):
        return self._binop(o, lambda a, b: np.multiply(b, a))

    def __truediv__(self, o):
        return self._binop(o, np.divide)

    def __rtruediv__(self, o):
        return self._binop(o, lambda a, b: np.divide(b, a))

    def astype(self, dtype):
        return DataArray(self.values.astype(dtype), self.dims, self.coords,
                         self.attrs, self.name)


class Dataset:
    """Dict of same-grid DataArrays (band name -> variable)."""

    __slots__ = ("data_vars", "attrs")

    def __init__(self, data_vars, attrs=None):
        self.data_vars = dict(data_vars)
        self.attrs = dict(attrs or {})

    def __getitem__(self, name):
        return self.data_vars[name]

    def __contains__(self, name):
        return name in self.data_vars

    def __iter__(self):
        return iter(self.data_vars)

    def keys(self):
        return self.data_vars.keys()

    def __repr__(self):
        return (f"<rasteret_spark.Dataset vars={list(self.data_vars)} "
                f"attrs={list(self.attrs)}>")
