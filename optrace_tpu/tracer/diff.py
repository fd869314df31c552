"""Differentiable-design interface: renders as functions of the scene's
geometric/material parameters.

This is the capability the reference lacks entirely (pure NumPy, no
autodiff): gradients of detector images w.r.t. curvatures, conic
constants, aspheric coefficients, positions and aperture radii, for lens
design optimization. Surface parameters flow through the params pytree
built by scene_compile; here they are re-exposed as traced function
inputs so jax.grad works through the whole trace (BASELINE.json north
star: gradients allclose vs finite differences).
"""

import jax
import jax.numpy as jnp

from .trace_core import trace_bundle
from .detector import detector_hits, build_segment_mask
from .scene_compile import compile_surface
from ..ops import binning


def make_parameterized_render(RT, N: int, detector_index: int = 0,
                              extent=None, Nx: int = 189, Ny: int = 189,
                              soft_bin: bool = True):
    """Build ``render(params_list, key) -> (Ny, Nx, 4) XYZW image`` where
    ``params_list`` is the per-surface parameter pytree (differentiable).

    ``soft_bin``: use differentiable bilinear splatting (required for
    positional design gradients; the hard histogram is piecewise constant
    in ray position).

    :return: (render_fn, params0) with params0 the current scene parameters
    """
    RT.rays.init(RT.ray_sources, N, len(RT.tracing_surfaces) + 2, RT.no_pol)
    steps = RT._build_steps()
    gen = RT._make_source_fn(N)
    outline = tuple(float(v) for v in RT.outline)
    n0_fn = RT.n0
    no_pol, use_hurb = RT.no_pol, RT.use_hurb

    dsurf = RT.detectors[detector_index].surface
    sfns = compile_surface(dsurf)
    det_zmin = float(dsurf.z_min)
    # static per-segment relevance: only segments whose section z-ranges can
    # contain the detector are tested (same pruning as the fused render)
    seg_mask = build_segment_mask(RT._section_z_bounds(),
                                  det_zmin, float(dsurf.z_max))
    if extent is None:
        extent = dsurf.extent[:4]
    ext = tuple(float(v) for v in extent)

    params0 = [s.sfns.params for s in steps]

    def render(params_list, key):
        steps_p = [s._replace(sfns=s.sfns._replace(params=p))
                   for s, p in zip(steps, params_list)]
        k_src, k_trace = jax.random.split(key)
        p, s, pols, w, wl = gen(k_src)
        out = trace_bundle(steps_p, n0_fn, outline, p, s, pols, w, wl,
                           no_pol, use_hurb, key=k_trace)
        ph, wsel, is_hit, _ = detector_hits(sfns, det_zmin, out["p"], out["w"],
                                            segment_mask=seg_mask)
        wm = jnp.where(is_hit, wsel, 0.0)
        bin_fn = binning.bin_xyzw_soft if soft_bin else binning.bin_xyzw
        return bin_fn(ph[:, 0], ph[:, 1], wm, out["wl"], Nx, Ny, ext)

    return render, params0


def spot_loss(render, weight_mode: int = 3):
    """Helper loss: power-weighted RMS spot radius of the rendered image.

    A common design objective; differentiable w.r.t. the scene params.
    """
    def loss(params_list, key, ext):
        img = render(params_list, key)
        Ny, Nx = img.shape[:2]
        x = jnp.linspace(ext[0], ext[1], Nx)
        y = jnp.linspace(ext[2], ext[3], Ny)
        w = img[:, :, weight_mode]
        wsum = jnp.maximum(w.sum(), 1e-12)
        cx = jnp.sum(w * x[None, :]) / wsum
        cy = jnp.sum(w * y[:, None]) / wsum
        r2 = (x[None, :] - cx) ** 2 + (y[:, None] - cy) ** 2
        return jnp.sqrt(jnp.sum(w * r2) / wsum)
    return loss
