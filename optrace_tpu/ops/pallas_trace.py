"""Pallas probe: one fused conic hit+refract trace step (VERDICT r2 #9).

The per-surface trace step is elementwise VPU work: standoff advance,
conic root solve (ops/geom.py:177-253), abnormal-hit clamping
(geom.py:322-353), aperture mask, analytic normal (geom.py:89-99) and
Snell+Fresnel (tracer/trace_core.py:132-160, no-pol path). XLA already
fuses these into a handful of kernels; this probe fuses the WHOLE step
into a single VMEM pass per ray block to measure what, if anything, manual
fusion buys on top. bench.py reports the head-to-head either way; the
production trace keeps the XLA path unless the Pallas step wins.

The math is the component form of the shared jnp kernels cited above —
kept line-for-line equivalent so the probe is a pure scheduling experiment,
not a physics fork.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .geom import N_EPS, C_EPS, ADVANCE_STANDOFF

LANE = 128
TILE_ROWS = 64
INV_SQRT2_SQ = 0.5   # A_ts² = A_tp² = ½ in the no-pol path


def _step_math(px, py, pz, sx, sy, sz, w, n1, n2,
               rho, k, z_min_rel, z_max_rel, r_ap):
    """The fused step on component arrays of any (elementwise) shape."""
    hw = w > 0

    # --- standoff advance (geom.advance_to_standoff) -------------------
    ok_adv = hw & (sz != 0)
    t0 = (z_min_rel - ADVANCE_STANDOFF - pz) / jnp.where(ok_adv, sz, 1.0)
    adv = ok_adv & (t0 > 0)
    px = jnp.where(adv, px + t0 * sx, px)
    py = jnp.where(adv, py + t0 * sy, py)
    pz = jnp.where(adv, pz + t0 * sz, pz)

    # --- conic root (geom.hit_conic, Citardauq + Newton polish) --------
    A = 1.0 + k * sz * sz
    B = sx * px + sy * py + sz * (pz * (k + 1.0) - 1.0 / rho)
    C = px * px + py * py + pz * (pz * (k + 1.0) - 2.0 / rho)
    disc = B * B - C * A
    has_root = disc >= 0.0
    D = jnp.sqrt(jnp.where(has_root, disc, 0.0))
    sgnB = jnp.where(B >= 0, 1.0, -1.0)
    q = -(B + sgnB * D)
    t1 = jnp.where(jnp.abs(A) > N_EPS, q / jnp.where(jnp.abs(A) > N_EPS, A, 1.0), jnp.inf)
    t2 = jnp.where(jnp.abs(q) > N_EPS, C / jnp.where(jnp.abs(q) > N_EPS, q, 1.0), jnp.inf)
    t_lin = -C / (2.0 * jnp.where(jnp.abs(B) > N_EPS, B, 1.0))
    lin = (jnp.abs(A) <= N_EPS) & (jnp.abs(B) > N_EPS)
    t1 = jnp.where(lin, t_lin, t1)
    t2 = jnp.where(lin, t_lin, t2)

    z1 = pz + sz * t1
    z2 = pz + sz * t2
    lo, hi = z_min_rel - N_EPS, z_max_rel + N_EPS
    fw = pz - C_EPS
    ok1 = (lo <= z1) & (z1 <= hi) & (z1 >= fw) & jnp.isfinite(t1)
    ok2 = (lo <= z2) & (z2 <= hi) & (z2 >= fw) & jnp.isfinite(t2)
    use1 = ok1 & ~(ok2 & (t2 < t1))
    t = jnp.where(use1, t1, t2)
    z_sel = jnp.where(use1, z1, z2)
    in_range = (lo <= z_sel) & (z_sel <= hi) & jnp.isfinite(t)
    valid = has_root & in_range & ~(lin & (jnp.abs(B) <= N_EPS))

    Qp = 2.0 * (A * t + B)
    Qv = (A * t + 2.0 * B) * t + C
    scale = jnp.abs(A * t) + jnp.abs(B)
    okp = valid & (jnp.abs(Qp) > 1e-5 * scale + N_EPS) & jnp.isfinite(t)
    stp = jnp.clip(Qv / jnp.where(okp, Qp, 1.0), -1e-3, 1e-3)
    t_pol = t - stp
    z_pol = pz + sz * t_pol
    okp = okp & (lo <= z_pol) & (z_pol <= hi)
    t = jnp.where(okp, t_pol, t)

    # --- clamp abnormal (geom.clamp_abnormal) --------------------------
    t_fin = jnp.isfinite(t)
    t_safe = jnp.where(t_fin, t, 0.0)
    z_hit = pz + t_safe * sz
    beh = pz > z_max_rel + N_EPS
    neg = z_hit < pz - C_EPS
    bad = ~valid | neg | ~t_fin
    sz_ok = sz != 0
    t_zmax = jnp.where(sz_ok, (z_max_rel - pz) / jnp.where(sz_ok, sz, 1.0), 0.0)
    t2c = jnp.where(bad & ~beh, t_zmax, t_safe)
    t2c = jnp.where(beh, 0.0, t2c)
    ok = ~(bad | beh)

    hx = px + t2c * sx
    hy = py + t2c * sy
    hz = pz + t2c * sz
    hit = (hx * hx + hy * hy <= r_ap * r_ap) & ok & hw
    px = jnp.where(hw, hx, px)
    py = jnp.where(hw, hy, py)
    pz = jnp.where(hw, hz, pz)

    # --- normal (geom.normal_conic) ------------------------------------
    r2 = px * px + py * py
    arg = 1.0 - k * rho * rho * r2
    den = jnp.sqrt(jnp.where(arg > N_EPS, arg, N_EPS))
    nx = -rho * px / den
    ny = -rho * py / den
    argz = 1.0 - (nx * nx + ny * ny)
    nz = jnp.sqrt(jnp.where(argz > N_EPS, argz, N_EPS))

    # --- Snell + Fresnel, no-pol (trace_core._refract_core) ------------
    ns = nx * sx + ny * sy + nz * sz
    graze = ns < 1e-6
    ns_safe = jnp.where(graze, 1.0, ns)
    Nq = n1 / n2
    W2 = 1.0 - Nq * Nq * (1.0 - ns * ns)
    tir = W2 < 0.0
    W = jnp.sqrt(jnp.where(tir, 1.0, W2))
    W = jnp.where(tir, 0.0, W)
    f = Nq * ns - W
    sx_ = sx * Nq - nx * f
    sy_ = sy * Nq - ny * f
    sz_ = sz * Nq - nz * f

    upd = hit & ~tir
    n1ca = n1 * ns_safe
    n2cb = n2 * W
    ts = 2.0 * n1ca / (n1ca + n2cb)
    tp = 2.0 * n1ca / (n2 * ns_safe + n1 * W)
    T = n2cb / n1ca * INV_SQRT2_SQ * (ts * ts + tp * tp)
    T = jnp.where(tir | graze, 0.0, T)

    w = jnp.where(hit, w * T, w)
    sx = jnp.where(upd, sx_, sx)
    sy = jnp.where(upd, sy_, sy)
    sz = jnp.where(upd, sz_, sz)
    return px, py, pz, sx, sy, sz, w


def _kernel(px, py, pz, sx, sy, sz, w, n1, n2,
            opx, opy, opz, osx, osy, osz, ow, *, consts):
    out = _step_math(px[:], py[:], pz[:], sx[:], sy[:], sz[:], w[:],
                     n1[:], n2[:], *consts)
    for ref, val in zip((opx, opy, opz, osx, osy, osz, ow), out):
        ref[:] = val


@functools.partial(jax.jit,
                   static_argnames=("rho", "k", "z_min_rel", "z_max_rel",
                                    "r_ap", "interpret"))
def conic_step_pallas(p, s, w, n1, n2, *, rho, k, z_min_rel, z_max_rel,
                      r_ap, interpret=False):
    """Fused conic trace step as one Pallas kernel over (N,) rays.

    Returns (p', s', w') with the same semantics as the XLA composition
    :func:`conic_step_xla`."""
    N = p.shape[0]
    blk = TILE_ROWS * LANE
    Np = -(-N // blk) * blk

    def comp(a, fill=0.0):
        out = jnp.full((Np,), fill, a.dtype).at[:N].set(a)
        return out.reshape(Np // LANE, LANE)

    comps = [comp(p[:, 0]), comp(p[:, 1]), comp(p[:, 2]),
             comp(s[:, 0]), comp(s[:, 1]), comp(s[:, 2], fill=1.0),
             comp(w), comp(n1, fill=1.0), comp(n2, fill=1.0)]

    spec = pl.BlockSpec((TILE_ROWS, LANE), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    shape = jax.ShapeDtypeStruct((Np // LANE, LANE), p.dtype)
    kern = functools.partial(
        _kernel, consts=(rho, k, z_min_rel, z_max_rel, r_ap))
    out = pl.pallas_call(
        kern,
        grid=(Np // blk,),
        in_specs=[spec] * 9,
        out_specs=[spec] * 7,
        out_shape=[shape] * 7,
        interpret=interpret,
    )(*comps)
    flat = [o.reshape(Np)[:N] for o in out]
    p_new = jnp.stack(flat[0:3], axis=-1)
    s_new = jnp.stack(flat[3:6], axis=-1)
    return p_new, s_new, flat[6]


@functools.partial(jax.jit,
                   static_argnames=("rho", "k", "z_min_rel", "z_max_rel", "r_ap"))
def conic_step_xla(p, s, w, n1, n2, *, rho, k, z_min_rel, z_max_rel, r_ap):
    """The identical step as plain jnp (XLA decides the fusion) — the
    baseline the Pallas kernel is benchmarked against."""
    out = _step_math(p[:, 0], p[:, 1], p[:, 2], s[:, 0], s[:, 1], s[:, 2],
                     w, n1, n2, rho, k, z_min_rel, z_max_rel, r_ap)
    return (jnp.stack(out[0:3], axis=-1), jnp.stack(out[3:6], axis=-1),
            out[6])
