"""Multi-chip compress step with explicit collectives (shard_map).

The reference is strictly serial; this module is the pod-scale execution
path mandated by BASELINE.json's north star: boxes/timesteps shard over the
``data`` mesh axis, and the *global* coefficient threshold is computed with
an all-reduced magnitude histogram (``lax.psum``/``lax.pmax`` over ICI)
instead of the per-box rule.

Two modes:

- :func:`make_parity_compress_step` — per-item signed-absmax thresholds (the
  reference rule), fully data-parallel; maxima come back per item, no
  cross-shard communication.
- :func:`make_global_compress_step` — one histogram-quantile threshold
  across every coefficient on every chip; the all-reduce rides ICI.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P
from jax.sharding import NamedSharding

from wavelet_tpu.core import haar, threshold
from wavelet_tpu.runtime.mesh import DATA_AXIS

try:  # jax>=0.4.35 moved shard_map out of experimental
    from jax import shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

__all__ = ["make_parity_compress_step", "make_global_compress_step",
           "make_train_step"]


def make_parity_compress_step(mesh):
    """jit(batch [N, X, Y, Z] sharded on N) -> (flat [N, XYZ], absmax [N])."""
    sh = NamedSharding(mesh, P(DATA_AXIS))

    @partial(jax.jit,
             in_shardings=sh,
             out_shardings=(sh, NamedSharding(mesh, P(DATA_AXIS))))
    def step(batch):
        flat = haar.forward_flat(batch)
        return flat, threshold.signed_absmax(flat, axis=-1)

    return step


def make_global_compress_step(mesh, keep_fraction: float, n_bins: int = 4096):
    """jit(batch [N, X, Y, Z] sharded on N) ->
    (masked coeffs [N, XYZ], global threshold scalar, kept count scalar).

    The threshold is a single magnitude quantile over the *entire* sharded
    batch, reduced across the mesh with psum/pmax (BASELINE.json configs 4-5).
    """

    @partial(shard_map, mesh=mesh, in_specs=P(DATA_AXIS),
             out_specs=(P(DATA_AXIS), P(), P()))
    def step(batch):
        flat = haar.forward_flat(batch)
        thr = threshold.global_histogram_threshold(
            flat, keep_fraction, n_bins=n_bins, axis_name=DATA_AXIS)
        mask = jnp.abs(flat) > thr
        kept = jax.lax.psum(jnp.sum(mask, dtype=jnp.int32), DATA_AXIS)
        return jnp.where(mask, flat, jnp.zeros_like(flat)), thr, kept

    return jax.jit(step)


def make_train_step(mesh, keep_fraction: float = 0.05):
    """The full multi-chip 'step' for one batch: forward transform, global
    all-reduce threshold, masking, inverse transform, and the all-reduced
    RMSE of the lossy round trip — every collective the framework uses, in
    one compiled program.  (This is what ``__graft_entry__.dryrun_multichip``
    compiles and runs.)"""

    @partial(shard_map, mesh=mesh, in_specs=P(DATA_AXIS),
             out_specs=(P(DATA_AXIS), P(), P()))
    def step(batch):
        flat = haar.forward_flat(batch)
        thr = threshold.global_histogram_threshold(
            flat, keep_fraction, axis_name=DATA_AXIS)
        masked = jnp.where(jnp.abs(flat) > thr, flat, jnp.zeros_like(flat))
        recon = haar.inverse_from_flat(masked, batch.shape[-3:])
        err = (recon - batch).astype(jnp.float32)
        sq = jax.lax.psum(jnp.sum(err * err), DATA_AXIS)
        cnt = jax.lax.psum(jnp.asarray(err.size, jnp.float32), DATA_AXIS)
        return recon, thr, jnp.sqrt(sq / cnt)

    return jax.jit(step)
