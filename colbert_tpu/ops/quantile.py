"""Distributed quantiles over mesh-sharded data.

The reference computes codec bucket cutoffs with a single-array ``quantile``
call (reference: collection_indexer.jl:147-152) — impossible when the heldout
residual sample lives sharded across a pod. Here quantiles are computed from
a ``psum``'d histogram (SURVEY §7 hard-parts list: "distributed quantile
(sort or t-digest)"): one collective pair of O(bins) bytes regardless of data
size, error bounded by ``(max - min) / bins`` (default 2^16 bins → ~3e-5 for
unit-scale residuals, far below the nbits=2..8 bucket granularity it feeds).

Weighted rows (0 = padding) make it safe over the padded device-resident
samples the builder keeps on-mesh.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["histogram_quantiles", "sharded_quantiles"]


def histogram_quantiles(
    hist: jax.Array, qs: jax.Array, lo: jax.Array, hi: jax.Array
) -> jax.Array:
    """Quantiles interpolated from a histogram over ``[lo, hi]``.

    ``hist`` is (bins,) counts (float ok); returns one value per ``qs``
    (linear interpolation inside the containing bin).
    """
    bins = hist.shape[0]
    cdf = jnp.cumsum(hist)
    total = cdf[-1]
    targets = qs * total
    # first bin where cdf >= target
    idx = jnp.searchsorted(cdf, targets, side="left")
    idx = jnp.clip(idx, 0, bins - 1)
    prev_cdf = jnp.where(idx > 0, cdf[jnp.maximum(idx - 1, 0)], 0.0)
    in_bin = jnp.where(hist[idx] > 0, (targets - prev_cdf) / hist[idx], 0.5)
    in_bin = jnp.clip(in_bin, 0.0, 1.0)
    width = (hi - lo) / bins
    return lo + (idx.astype(jnp.float32) + in_bin) * width


@functools.lru_cache(maxsize=8)
def _stats_fn(mesh: Mesh, bins: int):
    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P("data"), P("data"), P(), P()),
        out_specs=(P(), P(), P(), P(), P()),
        check_vma=False,
    )
    def stats(x_local, w_local, lo, hi):
        xf = x_local.astype(jnp.float32).reshape(x_local.shape[0], -1)
        wf = jnp.broadcast_to(
            w_local.astype(jnp.float32)[:, None], xf.shape
        ).reshape(-1)
        xf = xf.reshape(-1)
        width = jnp.maximum(hi - lo, 1e-30)
        pos = jnp.clip((xf - lo) / width * bins, 0, bins - 1).astype(jnp.int32)
        hist = jax.ops.segment_sum(wf, pos, num_segments=bins)
        local_min = jnp.min(jnp.where(wf > 0, xf, jnp.inf))
        local_max = jnp.max(jnp.where(wf > 0, xf, -jnp.inf))
        abs_sum = jnp.sum(jnp.abs(xf) * wf)
        return (
            jax.lax.psum(hist, "data"),
            jax.lax.pmin(local_min, "data"),
            jax.lax.pmax(local_max, "data"),
            jax.lax.psum(abs_sum, "data"),
            jax.lax.psum(jnp.sum(wf), "data"),
        )

    return jax.jit(stats)


def sharded_quantiles(
    data: jax.Array,
    qs: np.ndarray,
    mesh: Mesh,
    *,
    weights: jax.Array | None = None,
    bins: int = 1 << 16,
) -> Tuple[jax.Array, jax.Array]:
    """Quantiles of (row-weighted) ``data`` sharded over ``mesh``'s data axis.

    -> (quantile values per ``qs``, weighted mean |x|). Two collective
    rounds: min/max + histogram (fused into one shard_map call run twice —
    the first pass uses a coarse global range, the second the exact one).
    """
    n = data.shape[0]
    if weights is None:
        weights = jnp.ones((n,), jnp.float32)
    fn = _stats_fn(mesh, bins)
    dsh = NamedSharding(mesh, P("data"))
    repl = NamedSharding(mesh, P())
    data = jax.device_put(data, dsh)
    weights = jax.device_put(weights, dsh)
    lo0 = jax.device_put(jnp.float32(-1e30), repl)
    hi0 = jax.device_put(jnp.float32(1e30), repl)
    # pass 1: discover the true range (histogram discarded)
    _, lo, hi, abs_sum, w_total = fn(data, weights, lo0, hi0)
    hi = jnp.maximum(hi, lo + 1e-12)
    # pass 2: tight histogram
    hist, _, _, _, _ = fn(data, weights, lo, hi)
    values = histogram_quantiles(hist, jnp.asarray(qs, jnp.float32), lo, hi)
    # w_total already counts one weight per ELEMENT (weights are broadcast
    # across columns before summing), so no extra ncols factor here
    mean_abs = abs_sum / jnp.maximum(w_total, 1.0)
    return values, mean_abs
