"""NaN patching for emission maps.

Reference contract (raytracingGRFF/util.py:6-77): each NaN pixel becomes the
mean of the nearest finite pixel in the four axis directions (omitting
directions with none); up to 10 passes; passes stop early once nothing is
NaN or nothing could be fixed.

IMPORTANT ordering semantics (verified A/B against the actual reference in
tests/test_reference_parity.py): the reference patches pixels **in place, in
row-major order within a pass**, so a pixel fixed earlier in a pass feeds the
directional searches of later pixels in the *same* pass. For a row
[1, nan, nan, 4] this yields [1, 2.5, 3.25, 4] (the second NaN sees the
freshly patched 2.5 as its left neighbor), not [1, 2.5, 2.5, 4].
`patch_nan_emission_map` reproduces that exactly.

A vectorized simultaneous-update variant (`patch_nan_emission_map_sim`) is
kept for very large maps / in-jit use; it satisfies the same directional-mean
contract but updates all NaNs of a pass at once, so values inside wide NaN
blobs can differ from the reference (documented, tested).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _patch_2d_seq(a: np.ndarray, max_passes: int = 10) -> None:
    """Sequential in-place passes with reference-exact propagation order."""
    ny, nx = a.shape
    for _ in range(max_passes):
        bad = np.argwhere(~np.isfinite(a))      # row-major order
        if bad.size == 0:
            return
        fixed = 0
        for i, j in bad:
            vals = []
            row = a[i]
            col = a[:, j]
            left = np.flatnonzero(np.isfinite(row[:j]))
            if left.size:
                vals.append(row[left[-1]])
            right = np.flatnonzero(np.isfinite(row[j + 1:]))
            if right.size:
                vals.append(row[j + 1 + right[0]])
            down = np.flatnonzero(np.isfinite(col[:i]))
            if down.size:
                vals.append(col[down[-1]])
            up = np.flatnonzero(np.isfinite(col[i + 1:]))
            if up.size:
                vals.append(col[i + 1 + up[0]])
            if vals:
                a[i, j] = np.mean(vals)
                fixed += 1
        if fixed == 0:
            return


def patch_nan_emission_map(emission, inplace: bool = False):
    """Patch NaN pixels of a 2D (ny, nx) or 3D (ny, nx, nf) map.

    Reference-exact (raytracingGRFF/util.py:6-77) including the sequential
    in-pass propagation order; see module docstring.
    """
    out = (emission if inplace and isinstance(emission, np.ndarray)
           else np.array(emission, dtype=np.float64, copy=True))
    if out.ndim == 2:
        _patch_2d_seq(out)
    elif out.ndim == 3:
        for k in range(out.shape[2]):
            _patch_2d_seq(out[:, :, k])
    else:
        raise ValueError("emission must be 2D or 3D")
    return out


# ---------------------------------------------------------------------------
# Vectorized simultaneous-update variant (kept for large maps / in-jit use).
# ---------------------------------------------------------------------------

def _nearest_finite_along_axis(a, finite, axis, reverse):
    """For each position, value of the nearest finite element strictly before
    it along `axis` (after it if reverse). NaN where none exists."""
    def scan_fn(carry, x):
        val, has = carry
        xv, xf = x
        out = (val, has)                       # value seen so far (exclusive)
        val = jnp.where(xf, xv, val)
        has = has | xf
        return (val, has), out

    a_m = jnp.moveaxis(a, axis, 0)
    f_m = jnp.moveaxis(finite, axis, 0)
    init = (jnp.full_like(a_m[0], jnp.nan), jnp.zeros_like(f_m[0]))
    _, (vals, has) = jax.lax.scan(scan_fn, init, (a_m, f_m), reverse=reverse)
    vals = jnp.where(has, vals, jnp.nan)
    return jnp.moveaxis(vals, 0, axis)


def _patch_pass(a):
    finite = jnp.isfinite(a)
    left = _nearest_finite_along_axis(a, finite, 1, False)
    right = _nearest_finite_along_axis(a, finite, 1, True)
    down = _nearest_finite_along_axis(a, finite, 0, False)
    up = _nearest_finite_along_axis(a, finite, 0, True)
    stack = jnp.stack([left, right, down, up])
    ok = jnp.isfinite(stack)
    cnt = jnp.sum(ok, axis=0)
    mean = jnp.sum(jnp.where(ok, stack, 0.0), axis=0) / jnp.maximum(cnt, 1)
    return jnp.where(finite | (cnt == 0), a, mean)


@jax.jit
def _patch_2d(a, max_passes=10):
    def body(_, a):
        return _patch_pass(a)
    return jax.lax.fori_loop(0, max_passes, body, a)


def patch_nan_emission_map_sim(emission, inplace: bool = False):
    """Simultaneous-update NaN patch (all NaNs of a pass at once).

    Same directional-mean contract as patch_nan_emission_map but without the
    reference's in-pass sequential propagation — isolated NaNs (no NaN
    neighbor in any direction) match the reference exactly; interior values
    of wide NaN blobs can differ. Prefer this only for maps large enough
    that the sequential host loop matters."""
    arr = np.array(emission, dtype=np.float64, copy=True)
    if arr.ndim == 2:
        out = np.asarray(_patch_2d(jnp.asarray(arr)))
    elif arr.ndim == 3:
        out = np.stack([np.asarray(_patch_2d(jnp.asarray(arr[:, :, k])))
                        for k in range(arr.shape[2])], axis=2)
    else:
        raise ValueError("emission must be 2D or 3D")
    if inplace and isinstance(emission, np.ndarray):
        emission[...] = out
        return emission
    return out
