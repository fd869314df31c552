"""Pallas TPU kernel for XYZW detector binning (VERDICT r2 #9 probe).

The fused render's sink is a weighted 2D histogram: N ray hits scatter-add
4-vectors (X̄w, Ȳw, Z̄w, w) into an (Ny·Nx, 4) image. XLA lowers
``.at[idx].add`` on TPU to a serialized scatter loop; the sorted variant
(ops/binning.py:63) pays an O(N log N) sort. This kernel instead routes the
reduction through the MXU: for each (bin-tile, ray-chunk) grid cell it
materializes the one-hot routing matrix ``onehot[b, r] = (key[r] == b)`` in
VMEM and accumulates ``onehot @ vals`` into the resident output tile —
turning the scatter into dense matmuls with *no* data-dependent memory
traffic. Work is O(B·N) MACs, so it wins for small-to-medium images where
the MXU's throughput dwarfs the scatter's serialization, and loses for
huge B·N — which is why it sits behind ``global_options.pallas_binning``
and bench.py reports the comparison either way.

Equivalent semantics to ops/binning.py:bin_xyzw (reference
misc.py:59-91 + render_image.py:394-418).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..color.observers import x_observer, y_observer, z_observer
from .binning import binning_indices_2d

# grid tile sizes: the one-hot block (BIN_TILE, CHUNK) f32 must fit VMEM
# comfortably next to the (BIN_TILE, 4) accumulator → 1024·512·4 B = 2 MiB
BIN_TILE = 1024
CHUNK = 512


def _bin_kernel(keys_ref, vals_ref, out_ref):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    base = pl.program_id(0) * BIN_TILE
    local = keys_ref[:, 0] - base                           # (CHUNK,)
    rows = jax.lax.broadcasted_iota(jnp.int32, (BIN_TILE, CHUNK), 0)
    onehot = (rows == local[None, :]).astype(vals_ref.dtype)
    out_ref[:] += jnp.dot(onehot, vals_ref[:],
                          preferred_element_type=jnp.float32)


@functools.partial(jax.jit, static_argnames=("Nx", "Ny", "interpret"))
def _bin_xyzw_pallas_impl(keys, xyzw, Nx: int, Ny: int, interpret: bool):
    N = keys.shape[0]
    B = Ny * Nx
    Np = -(-N // CHUNK) * CHUNK
    Bp = -(-B // BIN_TILE) * BIN_TILE

    # pad rays with key -1 (matches no bin) and bins with dead rows
    keys_p = jnp.full((Np, 1), -1, dtype=jnp.int32).at[:N, 0].set(keys)
    vals_p = jnp.zeros((Np, 4), dtype=xyzw.dtype).at[:N].set(xyzw)

    out = pl.pallas_call(
        _bin_kernel,
        grid=(Bp // BIN_TILE, Np // CHUNK),
        in_specs=[
            pl.BlockSpec((CHUNK, 1), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((CHUNK, 4), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BIN_TILE, 4), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Bp, 4), xyzw.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * Bp * Np * 4,
            bytes_accessed=Np * (4 + 16) + Bp * 16,
            transcendentals=0),
        interpret=interpret,
    )(keys_p, vals_p)
    return out[:B].reshape(Ny, Nx, 4)


def bin_xyzw_pallas(px, py, w, wl, Nx: int, Ny: int, extent,
                    interpret: bool = None) -> jnp.ndarray:
    """Drop-in MXU-routed replacement for ops/binning.py:bin_xyzw.

    :param interpret: force Pallas interpreter mode (testing off-TPU);
        defaults to auto (interpret unless running on a TPU backend)
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    xi, yi, wm = binning_indices_2d(px, py, w, Nx, Ny, extent)
    keys = (yi * Nx + xi).astype(jnp.int32)
    # rays zeroed by the extent mask keep key 0 but contribute 0, exactly
    # like the scatter path
    xyzw = jnp.stack([x_observer(wl) * wm, y_observer(wl) * wm,
                      z_observer(wl) * wm, wm], axis=-1)
    return _bin_xyzw_pallas_impl(keys, xyzw, Nx, Ny, interpret)
