"""Array edge utilities: pad / remove_last_rows / remove_last_columns.

Reference surface: ``dislib/data/util/base.py:11-230`` (``pad``,
``pad_last_blocks_with_zeros``, ``remove_last_rows``,
``remove_last_columns``). The reference operates on the BLOCK grid
(pads/truncates the bottom-right blocks in place); this engine has no
block geometry, so the same user-visible semantics are expressed on
the (row_id, features) DataFrame directly:

- ``pad`` appends constant-valued bottom rows / right columns — a
  ``spark.range`` union for rows (no shuffle: union is
  partition-concat) and an ``array_repeat`` concat projection for
  columns (narrow).
- ``remove_last_rows`` is a pushdown-able ``row_id < n-k`` filter;
  ``remove_last_columns`` a ``slice()`` projection. Both narrow, no
  shuffle, valid at any scale.
- ``pad_last_blocks_with_zeros`` exists only to regularize block
  geometry — value-level identity — so here it IS the identity and
  says so.

Like the reference, only bottom/right padding is supported
(``base.py:34-40`` raises for top/left too).

.. warning:: **In-place vs pure divergence.** The reference versions
   of ``pad`` / ``remove_last_rows`` / ``remove_last_columns`` MUTATE
   the array argument and return ``None``; these ports are PURE — the
   input is untouched and the result is the return value. Reference
   code ported verbatim (calling them as statements and reusing the
   argument) silently no-ops: rebind, e.g.
   ``a = pad(a, ((0, 2), (0, 0)))``.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dislib_spark.array.core import _FEAT, _ROW, DsArray


def pad(a: DsArray, pad_width, constant_value: float = 0.0) -> DsArray:
    """Return ``a`` extended with constant rows below / columns right.

    ``pad_width = ((top, bottom), (left, right))`` — top/left must be
    0 (NotImplementedError, matching reference ``base.py:34-40``).
    PURE, not in-place: unlike the reference (which mutates the
    argument, returns None, and cannot grow past a block boundary),
    this returns a new lazy array of shape ``(n + bottom, d + right)``
    with no block-size ceiling — rebind the result.
    """
    (top, bottom), (left, right) = pad_width
    if top != 0:
        raise NotImplementedError(
            "Padding top blocks is currently not available"
        )
    if left != 0:
        raise NotImplementedError(
            "Padding left blocks is currently not available"
        )
    n, d = a.shape
    df = a.df
    v = float(constant_value)
    if right > 0:
        df = df.select(
            _ROW,
            F.concat(
                F.col(_FEAT), F.array_repeat(F.lit(v), int(right))
            ).alias(_FEAT),
        )
    if bottom > 0:
        extra = (
            a.spark.range(n, n + int(bottom))
            .select(
                F.col("id").alias(_ROW),
                F.array_repeat(F.lit(v), d + int(right)).alias(_FEAT),
            )
        )
        df = df.unionAll(extra)
    return DsArray(df, (n + int(bottom), d + int(right)))


def pad_last_blocks_with_zeros(a: DsArray) -> DsArray:
    """Identity AT THE VALUE LEVEL only: block-geometry regularization
    has no meaning without blocks. NOT shape-identical to the
    reference — ``base.py:101-140`` grows ``a._shape`` up to the next
    block multiple (zero-filled), so ported code that relies on the
    grown logical shape must call :func:`pad` explicitly with the
    desired bottom/right widths. Also pure (returns ``a``), where the
    reference mutates in place."""
    return a


def remove_last_rows(a: DsArray, n_rows: int) -> DsArray:
    """Drop the last ``n_rows`` rows (reference ``base.py:143-184``).

    PURE where the reference mutates in place and returns None —
    rebind the result (see module warning). A ``row_id < n - n_rows``
    predicate — reaches the scan as a pushed filter; no renumbering
    needed because surviving ids are already dense."""
    if n_rows <= 0:
        return a
    n, d = a.shape
    keep = max(0, n - int(n_rows))
    return DsArray(a.df.where(F.col(_ROW) < keep), (keep, d))


def remove_last_columns(a: DsArray, n_columns: int) -> DsArray:
    """Drop the last ``n_columns`` columns (reference
    ``base.py:187-216``; same ValueError contract when asked to
    remove every column). PURE where the reference mutates in place
    and returns None — rebind the result (see module warning)."""
    n, d = a.shape
    if n_columns >= d:
        raise ValueError(
            "Number of columns to remove needs to be less than "
            "the whole block"
        )
    if n_columns <= 0:
        return a
    keep = d - int(n_columns)
    return DsArray(
        a.df.select(_ROW, F.slice(F.col(_FEAT), 1, keep).alias(_FEAT)),
        (n, keep),
    )


# --- reference top-level function forms ------------------------------
# dislib exposes these as module functions (``dislib/__init__.py``:
# ``matadd, matsubtract, exp, log, gammaln``); DsArray carries them as
# operators/methods. The function forms exist so reference code ports
# verbatim: ``ds.matadd(a, b)`` == ``a + b``.


def matadd(a: DsArray, b: DsArray) -> DsArray:
    """Elementwise sum (reference ``data/array.py`` ``matadd``)."""
    return a + b


def matsubtract(a: DsArray, b: DsArray) -> DsArray:
    """Elementwise difference (reference ``matsubtract``)."""
    return a - b


def exp(a: DsArray) -> DsArray:
    """Elementwise e**x (reference top-level ``exp``)."""
    return a.exp()


def log(a: DsArray) -> DsArray:
    """Elementwise natural log (reference top-level ``log``)."""
    return a.log()


def gammaln(a: DsArray) -> DsArray:
    """Elementwise log-gamma (reference top-level ``gammaln``)."""
    return a.gammaln()
