"""Whole-conic-run Pallas kernel: all surfaces of a scanned refract run in
ONE kernel pass, ray state resident in VMEM.

The XLA scan path (`tracer/trace_core.py:_conic_scan`) executes one
per-surface body per scan iteration; every iteration streams the ray state
and its intermediates through HBM across the body's fusion groups
(measured ~2.8 ms/surface at 10⁶ rays — ~30 array passes per step). This
kernel instead tiles the rays into VMEM blocks and loops over ALL L
surfaces of the run inside the kernel, so the state (p, s, w components)
stays on-chip for the whole run and HBM traffic drops to: state in+out,
the per-step media rows, and the per-step stored sections — the
information-theoretic minimum for the stored-trace contract
(~1.5 kB/ray for a 53-surface run instead of ~100 kB/ray).

Per-surface parameters (conic rho/k, aperture radius, z-range, frame
delta, outline box) are embedded as static python constants in the
unrolled step loop — which is also why this path only runs when the scene
parameters are concrete: the differentiable-design path (traced surface
parameters) keeps the XLA scan. Physics is the component form of the same
shared kernels (`ops/geom.py` hit_conic/clamp_abnormal/normal_conic,
`tracer/trace_core.py` _refract_core/_outline_intersection) — equivalence
is pinned by tests/test_pallas_run.py against the XLA scan.

On by default on TPU (``global_options.pallas_trace``); bench.py reports
the head-to-head against the XLA scan it replaces. Covers both the no-pol
and the full polarization-transport paths. Step kinds: flat discs,
spheres, conics, even aspheres (bracketed Illinois solve — in-kernel
measured 3.7× faster than the unrolled Newton), and — behind
``global_options.pallas_fuse_planar`` — tilted planes and aperture
absorbers (measured slightly slower fused at bulk ray counts; the flag
exists for latency-bound single-launch tracing).
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .geom import N_EPS, C_EPS, ADVANCE_STANDOFF

LANE = 128
TILE_ROWS = int(__import__("os").environ.get("OPTRACE_TPU_PALLAS_TILE_ROWS", "32"))
# f32 min tile is (8, 128); TILE_ROWS*LANE rays per grid program — the
# env override exists for on-device tuning (tools/ probes)
INV_SQRT2_SQ = 0.5     # A_ts² = A_tp² = ½ in the no-pol path


def _asph_sag_F(t, px, py, pz, sx, sy, sz, rho, k, coeff):
    """F(t) = z(t) − sag_asphere(x(t), y(t)): the root function of the
    bracketed solve (component form of geom.hit_newton's closure over
    geom.sag_asphere — same guards, so parity holds to f32 rounding)."""
    x = px + t * sx
    y = py + t * sy
    r2 = x * x + y * y
    arg = 1.0 - (k + 1.0) * rho * rho * r2
    ok = arg > 0
    root = jnp.sqrt(jnp.where(ok, arg, 1.0))
    root = jnp.where(ok, root, 0.0)
    z = rho * r2 / (1.0 + root)
    poly = jnp.zeros_like(r2)
    for cf in coeff[::-1]:
        poly = poly * r2 + cf
    return pz + t * sz - (z + poly * r2)


def _one_step(px, py, pz, sx, sy, sz, w, n1, n2, c, pol=None):
    """One refract step on component blocks; ``c`` is the static per-step
    constant dict; ``pol`` is None (no-pol) or a (polx, poly, polz) tuple.
    Returns new state + pol + (miss, tir, outline, ill) count blocks."""
    hw = w > 0

    # --- frame shift into this surface's vertex frame ------------------
    if c["dx"] != 0.0:
        px = px - c["dx"]
    if c["dy"] != 0.0:
        py = py - c["dy"]
    if c["dz"] != 0.0:
        pz = pz - c["dz"]
    # previous section position (kept for the outline-escape origin; the
    # pol branch below must NOT reuse these names — r4 latent bug)
    ppx, ppy, ppz = px, py, pz

    # --- standoff advance (geom.advance_to_standoff; the XLA scan
    # applies it to flat steps too) ------------------------------------
    ok_adv = hw & (sz != 0)
    t0 = (c["z_min"] - ADVANCE_STANDOFF - pz) / jnp.where(ok_adv, sz, 1.0)
    adv = ok_adv & (t0 > 0)
    px = jnp.where(adv, px + t0 * sx, px)
    py = jnp.where(adv, py + t0 * sy, py)
    pz = jnp.where(adv, pz + t0 * sz, pz)

    ill = jnp.zeros_like(hw)
    if c["is_flat"]:
        # plane z=0 hit (geom.hit_plane); clamp shared below
        sz_ok = sz != 0
        t = jnp.where(sz_ok, -pz / jnp.where(sz_ok, sz, 1.0), jnp.inf)
        valid = jnp.isfinite(t) & (t >= -C_EPS)
    elif c["is_tilt"]:
        # tilted plane through the vertex with static unit normal
        # (component form of scene_compile.tilt_hit — the deliberately
        # unguarded division propagates den=0 into valid=False)
        tnx, tny, tnz = c["tn"]
        num = -(px * tnx + py * tny + pz * tnz)
        den = sx * tnx + sy * tny + sz * tnz
        t = num / den
        valid = jnp.isfinite(t) & (den != 0)
    elif c["is_asph"]:
        # --- even asphere: bracketed Illinois false-position solve, the
        # exact component form of geom.hit_newton (40 fixed iterations,
        # same eps/bracket/contraction constants — deliberately unguarded
        # sz=0 divisions propagate inf/nan into valid=False identically)
        rho, k, coeff = c["rho"], c["k"], c["coeff"]
        eps_b = C_EPS / 10.0
        t1 = jnp.maximum((c["z_min"] - eps_b - pz) / sz, -C_EPS)
        t2 = (c["z_max"] + eps_b - pz) / sz
        f1 = _asph_sag_F(t1, px, py, pz, sx, sy, sz, rho, k, coeff)
        f2 = _asph_sag_F(t2, px, py, pz, sx, sy, sz, rho, k, coeff)
        ill = (f1 * f2 > 0.0) & hw

        def nbody(i, carry):
            t1, t2, f1, f2 = carry
            denom = jnp.where(jnp.abs(f2 - f1) > N_EPS, f2 - f1, 1.0)
            ts = t1 - f1 / denom * (t2 - t1)
            mid = 0.5 * (t1 + t2)
            inside = (ts > jnp.minimum(t1, t2)) & (ts < jnp.maximum(t1, t2))
            ts = jnp.where(inside, ts, mid)
            fs = _asph_sag_F(ts, px, py, pz, sx, sy, sz, rho, k, coeff)
            use_left = f1 * fs <= 0.0
            nt1 = jnp.where(use_left, t1, ts)
            nf1 = jnp.where(use_left, 0.5 * f1, fs)   # Illinois m=0.5
            nt2 = jnp.where(use_left, ts, t2)
            nf2 = jnp.where(use_left, fs, 0.5 * f2)
            return nt1, nt2, nf1, nf2

        t1, t2, f1, f2 = jax.lax.fori_loop(0, 40, nbody, (t1, t2, f1, f2))
        t = 0.5 * (t1 + t2)
        valid = jnp.isfinite(t) & ~ill
    else:

        # --- conic root (geom.hit_conic: Citardauq + Newton polish) ----
        rho, k = c["rho"], c["k"]
        A = 1.0 + k * sz * sz
        B = sx * px + sy * py + sz * (pz * (k + 1.0) - 1.0 / rho)
        C = px * px + py * py + pz * (pz * (k + 1.0) - 2.0 / rho)
        disc = B * B - C * A
        has_root = disc >= 0.0
        D = jnp.sqrt(jnp.where(has_root, disc, 1.0))
        D = jnp.where(has_root, D, 0.0)
        sgnB = jnp.where(B >= 0, 1.0, -1.0)
        q = -(B + sgnB * D)
        okA = jnp.abs(A) > N_EPS
        okq = jnp.abs(q) > N_EPS
        t1 = jnp.where(okA, q / jnp.where(okA, A, 1.0), jnp.inf)
        t2 = jnp.where(okq, C / jnp.where(okq, q, 1.0), jnp.inf)
        t_lin = -C / (2.0 * jnp.where(jnp.abs(B) > N_EPS, B, 1.0))
        lin = ~okA & (jnp.abs(B) > N_EPS)
        t1 = jnp.where(lin, t_lin, t1)
        t2 = jnp.where(lin, t_lin, t2)

        z1 = pz + sz * t1
        z2 = pz + sz * t2
        lo, hi = c["z_min"] - N_EPS, c["z_max"] + N_EPS
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

    # --- clamp abnormal (geom.clamp_abnormal; shared by both branches,
    # flat steps have z_max = 0) ----------------------------------------
    t_fin = jnp.isfinite(t)
    t_safe = jnp.where(t_fin, t, 0.0)
    z_hit = pz + t_safe * sz
    beh = pz > c["z_max"] + N_EPS
    neg = z_hit < pz - C_EPS
    bad = ~valid | neg | ~t_fin
    sz_ok = sz != 0
    t_zmax = jnp.where(sz_ok, (c["z_max"] - pz) / jnp.where(sz_ok, sz, 1.0), 0.0)
    t_safe = jnp.where(bad & ~beh, t_zmax, t_safe)
    t_safe = jnp.where(beh, 0.0, t_safe)
    ok = ~(bad | beh)

    hx = px + t_safe * sx
    hy = py + t_safe * sy
    hz = pz + t_safe * sz
    r_ap = c["r"]
    r2h = hx * hx + hy * hy     # reused by the conic/asphere normal below
    px = jnp.where(hw, hx, px)
    py = jnp.where(hw, hy, py)
    pz = jnp.where(hw, hz, pz)

    if c["action"] == "absorb":
        # fused aperture: rays HITTING the shape are absorbed, rays
        # through the opening continue untouched (no miss-kill, no
        # refraction — trace_core's unrolled absorb semantics). The
        # direction and polarization stay as they are; control falls
        # through to the SHARED outline block below.
        if c["mask"] == "ring":
            hitm = (r2h <= (r_ap + N_EPS) ** 2) \
                & (r2h >= (c["ri"] - N_EPS) ** 2)
        elif c["mask"] in ("rect", "slit"):
            ca = float(np.cos(c["angle"]))
            sa = float(np.sin(c["angle"]))
            xr = hx * ca + hy * sa
            yr = -hx * sa + hy * ca
            hitm = (jnp.abs(xr) <= c["hw"] + N_EPS) \
                & (jnp.abs(yr) <= c["hh"] + N_EPS)
            if c["mask"] == "slit":
                innm = (jnp.abs(xr) < c["hwi"] - N_EPS) \
                    & (jnp.abs(yr) < c["hhi"] - N_EPS)
                hitm = hitm & ~innm
        else:           # circle / full plane
            hitm = r2h <= (r_ap + N_EPS) ** 2
        hit = hitm & ok & hw
        w = jnp.where(hit, 0.0, w)
        miss = jnp.zeros_like(hw)
        n_tir = jnp.zeros_like(hw)
        return _outline_block(px, py, pz, sx, sy, sz, w, pol,
                              ppx, ppy, ppz, c, miss, n_tir, ill)

    hit = (r2h <= (r_ap + N_EPS) ** 2) & ok & hw
    miss = hw & ~hit
    w = jnp.where(miss, 0.0, w)

    # --- normal (geom.normal_conic / normal_asphere / tilted / flat) ---
    if c["is_flat"]:
        nx = jnp.zeros_like(px)
        ny = jnp.zeros_like(px)
        nz = jnp.ones_like(px)
    elif c["is_tilt"]:
        tnx, tny, tnz = c["tn"]
        nx = jnp.full_like(px, tnx)
        ny = jnp.full_like(px, tny)
        nz = jnp.full_like(px, tnz)
    elif c["is_asph"]:
        # geom.normal_asphere: radial slope m = dsag/dr, n ∝ (−m/r·x,
        # −m/r·y, 1) normalized. r² reuses the aperture-mask product —
        # valid because the normal is only consumed under hit/upd masks,
        # where p == (hx, hy)
        rho, k, coeff = c["rho"], c["k"], c["coeff"]
        r2 = r2h
        r = jnp.sqrt(jnp.maximum(r2, N_EPS * N_EPS))
        root = jnp.sqrt(jnp.maximum(1.0 - (k + 1.0) * rho * rho * r * r,
                                    N_EPS))
        m = rho * r / root
        dpoly = jnp.zeros_like(r2)
        n_cf = len(coeff)
        for i in range(n_cf - 1, -1, -1):
            dpoly = dpoly * r2 + 2.0 * (i + 1.0) * coeff[i]
        m = m + dpoly * r
        mr = m / r
        nxu = -mr * px
        nyu = -mr * py
        inv = 1.0 / jnp.sqrt(nxu * nxu + nyu * nyu + 1.0)
        nx = nxu * inv
        ny = nyu * inv
        nz = inv
    else:
        rho, k = c["rho"], c["k"]
        r2 = r2h                    # == px²+py² wherever the normal is used
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
    if pol is None:
        A_ts2, A_tp2 = INV_SQRT2_SQ, INV_SQRT2_SQ
    else:
        # s/p decomposition across the direction change (the component
        # form of trace_core._compute_polarization)
        INV_SQRT2 = float(np.sqrt(0.5))
        qx, qy, qz = pol
        changed = (sx != sx_) | (sy != sy_) | (sz != sz_)
        # ps = normalize_safe(cross(s_, s))
        cx = sy_ * sz - sz_ * sy
        cy = sz_ * sx - sx_ * sz
        cz = sx_ * sy - sy_ * sx
        cn2 = cx * cx + cy * cy + cz * cz
        cok = cn2 > 0
        cinv = 1.0 / jnp.sqrt(jnp.where(cok, cn2, 1.0))
        psx = jnp.where(cok, cx * cinv, 0.0)
        psy = jnp.where(cok, cy * cinv, 0.0)
        psz = jnp.where(cok, cz * cinv, 0.0)
        # p-basis bp = cross(ps, s) — distinct names from the saved
        # previous position ppx/ppy/ppz used by the outline block
        bpx = psy * sz - psz * sy
        bpy = psz * sx - psx * sz
        bpz = psx * sy - psy * sx
        A_ts = psx * qx + psy * qy + psz * qz
        A_tp = bpx * qx + bpy * qy + bpz * qz
        A_ts = jnp.where(changed, A_ts, INV_SQRT2)
        A_tp = jnp.where(changed, A_tp, INV_SQRT2)
        # bp_ = cross(ps, s_)
        bpx_ = psy * sz_ - psz * sy_
        bpy_ = psz * sx_ - psx * sz_
        bpz_ = psx * sy_ - psy * sx_
        m = upd & changed
        qx = jnp.where(m, psx * A_ts + bpx_ * A_tp, qx)
        qy = jnp.where(m, psy * A_ts + bpy_ * A_tp, qy)
        qz = jnp.where(m, psz * A_ts + bpz_ * A_tp, qz)
        pol = (qx, qy, qz)
        A_ts2, A_tp2 = A_ts * A_ts, A_tp * A_tp
    n1ca = n1 * ns_safe
    n2cb = n2 * W
    ts = 2.0 * n1ca / (n1ca + n2cb)
    tp = 2.0 * n1ca / (n2 * ns_safe + n1 * W)
    T = n2cb / n1ca * (A_ts2 * ts * ts + A_tp2 * tp * tp)
    T = jnp.where(tir | graze, 0.0, T)

    w = jnp.where(hit, w * T, w)
    n_tir = tir & hit
    sx = jnp.where(upd, sx_, sx)
    sy = jnp.where(upd, sy_, sy)
    sz = jnp.where(upd, sz_, sz)

    return _outline_block(px, py, pz, sx, sy, sz, w, pol,
                          ppx, ppy, ppz, c, miss, n_tir, ill)


def _outline_block(px, py, pz, sx, sy, sz, w, pol, ppx, ppy, ppz, c,
                   miss, n_tir, ill):
    """Outline-box escape kill shared by the refract and absorb step
    bodies (trace_core._outline_intersection): rays outside the box are
    intersected with it FROM THE SAVED PREVIOUS POSITION ppx/ppy/ppz and
    absorbed; returns the step's full result tuple."""
    xs, xe, ys, ye, zs, ze = c["out"]
    inside = (xs < px) & (px < xe) & (ys < py) & (py < ye) \
        & (zs < pz) & (pz < ze)
    outl = ~inside & (w > 0)
    tmin = jnp.full_like(px, jnp.inf)
    for pc, sc, lo_b, hi_b in ((ppx, sx, xs, xe), (ppy, sy, ys, ye),
                               (ppz, sz, zs, ze)):
        okd = sc != 0
        den = jnp.where(okd, sc, 1.0)
        for bound in (lo_b, hi_b):
            tb = (bound - pc) / den
            tmin = jnp.where(okd & (tb > 0) & (tb < tmin), tb, tmin)
    tmin = jnp.where(jnp.isfinite(tmin), tmin, 0.0)
    px = jnp.where(outl, ppx + tmin * sx, px)
    py = jnp.where(outl, ppy + tmin * sy, py)
    pz = jnp.where(outl, ppz + tmin * sz, pz)
    w = jnp.where(outl, 0.0, w)

    return (px, py, pz, sx, sy, sz, w), pol, (miss, n_tir, outl, ill)


def _make_kernel(consts, store, with_pol):
    L = len(consts)

    def kernel(*refs):
        # inputs: 7 state (+3 pol) + media; outputs: 7 state (+3 pol) +
        # counts (+ per-step ys: 4 without pol, 7 with)
        n_in = 8 + (3 if with_pol else 0)
        in_refs, out_refs = refs[:n_in], refs[n_in:]
        if with_pol:
            (px_r, py_r, pz_r, sx_r, sy_r, sz_r, w_r,
             qx_r, qy_r, qz_r, med_r) = in_refs
            pol = (qx_r[:], qy_r[:], qz_r[:])
            state_out, cnt_r = out_refs[:10], out_refs[10]
            ys_refs = out_refs[11:]
        else:
            px_r, py_r, pz_r, sx_r, sy_r, sz_r, w_r, med_r = in_refs
            pol = None
            state_out, cnt_r = out_refs[:7], out_refs[7]
            ys_refs = out_refs[8:]
        st = (px_r[:], py_r[:], pz_r[:], sx_r[:], sy_r[:], sz_r[:], w_r[:])
        cnt_rows = []
        for j, c in enumerate(consts):
            n1 = med_r[j, 0]
            n2 = med_r[j, 1]
            st, pol, (miss, tirb, outb, illb) = _one_step(*st, n1, n2, c,
                                                          pol=pol)
            cnt_rows.append(jnp.stack([
                jnp.sum(miss.astype(jnp.float32)),
                jnp.sum(tirb.astype(jnp.float32)),
                jnp.sum(outb.astype(jnp.float32)),
                jnp.sum(illb.astype(jnp.float32))]))
            if store:
                # sections are emitted in ABSOLUTE coordinates
                ys_refs[0][j] = st[0] + c["ox"]
                ys_refs[1][j] = st[1] + c["oy"]
                ys_refs[2][j] = st[2] + c["oz"]
                ys_refs[3][j] = st[6]
                if with_pol:
                    ys_refs[4][j] = pol[0]
                    ys_refs[5][j] = pol[1]
                    ys_refs[6][j] = pol[2]
        cnt_r[0] = jnp.stack(cnt_rows)                     # (L, 4)
        vals = st + (pol if with_pol else ())
        for ref, val in zip(state_out, vals):
            ref[:] = val

    return kernel


@functools.partial(jax.jit,
                   static_argnames=("consts", "store", "interpret"))
def conic_run_pallas(p, s, w, med, pol=None, *, consts, store=True,
                     interpret=False):
    """Run L consecutive conic/flat refract steps as one Pallas kernel.

    :param p, s: (N, 3) ray positions (in the frame BEFORE the first
        step's delta shift) and directions
    :param w: (N,) weights
    :param med: (L, 2, N) per-step (n1, n2) media value rows
    :param pol: optional (N, 3) polarization vectors — enables the full
        s/p polarization transport in-kernel (the pol benchmark path)
    :param consts: tuple of L per-step constant dicts (hashable: tuple of
        (key, value) pairs), each with rho, k, r, z_min, z_max, is_flat,
        is_asph (+ static ``coeff`` tuple for even aspheres), is_tilt
        (+ unit-normal tuple ``tn``), action ("refract" | "absorb") with
        the absorb mask shape ("circle"/"ring"/"rect"/"slit" + ri/hw/hh/
        hwi/hhi/angle), dx/dy/dz frame delta, ox/oy/oz applied origin,
        out (6 rel bounds)
    :param store: also return per-step absolute positions and weights
        (and polarizations when ``pol`` is given)
    :return: (p', s', w', pol'|None), (counts (L, 4) int32 rows of
        [miss, tir, outline, ill], ys_p (L, N, 3)|None, ys_w (L, N)|None,
        ys_pol (L, N, 3)|None)
    """
    consts = tuple(dict(c) for c in consts)
    L = len(consts)
    N = p.shape[0]
    dt = p.dtype
    with_pol_static = pol is not None
    n_state_static = 10 if with_pol_static else 7
    n_ys_static = (7 if with_pol_static else 4) if store else 0
    # adapt the ray-tile height to the per-block VMEM footprint (state
    # in+out, the (L,2) media slab, the (L,) stored-section outputs),
    # leaving headroom for double buffering — a long pol+store run at a
    # fixed 32-row tile would overflow the ~16 MB VMEM
    bytes_per_row = 4 * LANE * (2 * n_state_static + 2 * L + n_ys_static * L + 4)
    rows_fit = int((6_000_000 // max(bytes_per_row, 1)) // 8 * 8)
    tile_rows = max(8, min(TILE_ROWS, rows_fit))
    blk = tile_rows * LANE
    G = -(-N // blk)
    Np = G * blk
    R = Np // LANE

    # under shard_map (check_vma=True) every kernel operand and out_shape
    # must carry a consistent varying-manual-axes set; derive it from the
    # traced inputs (empty outside shard_map) and pcast the padded
    # operands up to it (cf. trace_core._conic_scan "scan-vma")
    pol_args = (pol,) if pol is not None else ()
    vma = frozenset().union(*(jax.typeof(a).vma
                              for a in (p, s, w, med) + pol_args))

    def _pv(a):
        missing = vma - jax.typeof(a).vma
        return jax.lax.pcast(a, tuple(missing), to="varying") if missing else a

    def comp(a, fill=0.0):
        out = jnp.full((Np,), fill, dt).at[:N].set(a.astype(dt))
        return _pv(out.reshape(R, LANE))

    with_pol = pol is not None
    comps = [comp(p[:, 0]), comp(p[:, 1]), comp(p[:, 2]),
             comp(s[:, 0]), comp(s[:, 1]), comp(s[:, 2], fill=1.0),
             comp(w)]
    if with_pol:
        comps += [comp(pol[:, 0]), comp(pol[:, 1]), comp(pol[:, 2])]
    med_p = _pv(jnp.zeros((L, 2, Np), dt).at[:, :, :N].set(med.astype(dt))
                .reshape(L, 2, R, LANE))

    state_spec = pl.BlockSpec((tile_rows, LANE), lambda i: (i, 0),
                              memory_space=pltpu.VMEM)
    med_spec = pl.BlockSpec((L, 2, tile_rows, LANE), lambda i: (0, 0, i, 0),
                            memory_space=pltpu.VMEM)
    cnt_spec = pl.BlockSpec((1, L, 4), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    ys_spec = pl.BlockSpec((L, tile_rows, LANE), lambda i: (0, i, 0),
                           memory_space=pltpu.VMEM)

    def sds(shape, dtype=dt):
        return jax.ShapeDtypeStruct(shape, dtype, vma=vma) if vma \
            else jax.ShapeDtypeStruct(shape, dtype)

    n_state = 10 if with_pol else 7
    n_ys = (7 if with_pol else 4) if store else 0
    out_specs = [state_spec] * n_state + [cnt_spec] + [ys_spec] * n_ys
    out_shape = [sds((R, LANE))] * n_state + [sds((G, L, 4), jnp.float32)] \
        + [sds((L, R, LANE))] * n_ys

    out = pl.pallas_call(
        _make_kernel(consts, store, with_pol),
        grid=(G,),
        in_specs=[state_spec] * n_state + [med_spec],
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(*comps, med_p)

    flat = [o.reshape(Np)[:N] for o in out[:n_state]]
    p_new = jnp.stack(flat[0:3], axis=-1)
    s_new = jnp.stack(flat[3:6], axis=-1)
    pol_new = jnp.stack(flat[7:10], axis=-1) if with_pol else None
    # per-block counts are exact in f32 (<= blk = TILE_ROWS*LANE); cast
    # BEFORE the cross-block sum so totals beyond 2^24 stay int-exact
    counts = jnp.sum(out[n_state].astype(jnp.int32), axis=0)      # (L, 4)
    if not store:
        return (p_new, s_new, flat[6], pol_new), (counts, None, None, None)
    ys = [o.reshape(L, Np)[:, :N] for o in out[n_state + 1:]]
    ys_p = jnp.stack(ys[0:3], axis=-1)                          # (L, N, 3)
    ys_pol = jnp.stack(ys[4:7], axis=-1) if with_pol else None
    return (p_new, s_new, flat[6], pol_new), (counts, ys_p, ys[3], ys_pol)
