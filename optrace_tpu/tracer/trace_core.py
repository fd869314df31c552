"""The surface-sequential trace as a pure jnp function.

TPU-native rebuild of the reference hot loop
(optrace/tracer/raytracer.py:262-415 and the physics at :417-879,
SURVEY.md §3.1): the Python-thread/slice parallelism becomes a single
vectorized bundle (shardable over a mesh axis), the per-surface element
loop is unrolled at trace time over static scene structure, and all
branching is masked arithmetic.

Physics implemented per step (all references into raytracer.py):
- vectorial Snell + Fresnel transmission with polarization projection
  (:761-829), TIR → absorbed + counted (:821-826)
- polarization transport in the s/p decomposition (:831-879)
- ideal-lens refraction (:720-759)
- filter transmission / aperture absorption with optional HURB
  edge-diffraction bending (:417-490)
- outline-box escape absorption (:666-718)
- "Broken sequentiality" / miss / ill-conditioned bookkeeping (INFOS)
"""

from typing import Callable, NamedTuple, Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..ops import geom
from ..ops.vector import rdot, cross, normalize_safe
from .scene_compile import SurfaceFns

INV_SQRT2 = 1.0 / np.sqrt(2.0)

# INFOS rows (reference raytracer.py:43-49)
ABSORB_MISSING, TIR, ILL_COND, OUTLINE_INTERSECTION, HURB_NEG_DIR = range(5)
N_INFOS = 5

HURB_FACTOR = np.sqrt(2.0)


class TraceStep(NamedTuple):
    """One light-interacting surface in the unrolled trace."""
    sfns: SurfaceFns
    action: str                      # "refract" | "ideal" | "filter" | "absorb"
    n1_fn: Optional[Callable] = None  # wl -> n before surface (refract)
    n2_fn: Optional[Callable] = None  # wl -> n after surface (refract/ideal)
    spectrum_fn: Optional[Callable] = None   # wl -> T (filter)
    D: float = 0.0                   # optical power in dpt (ideal)
    hurb: bool = False               # HURB bending at this aperture
    hurb_kind: str = ""              # "ring" | "slit"
    pos_host: Optional[tuple] = None  # static f64 vertex position; enables
    #   per-surface local-frame re-centering (the f32 accuracy anchor: ray
    #   state is kept relative to the CURRENT surface vertex, so position
    #   rounding is ~eps*(gap+aperture) instead of eps*|z_absolute| — at
    #   z=430 mm the difference is 5e-5 vs 1e-6 mm, and cemented doublet
    #   interfaces 1e-7 mm apart stop absorbing rays spuriously)


# ----------------------------------------------------------------------
# helpers

def _surface_hit(step: TraceStep, p, s, hw):
    """Hit solve + abnormal clamping + aperture mask for one surface.

    Dead rays (not hw) stay in place (reference :309-312 copies sections).
    Returns (p_new, hit, ill, n_broken).
    """
    params = step.sfns.params
    # p is already relative to the surface vertex (local frame); recondition
    # rays whose previous section is far away before solving
    ps = geom.advance_to_standoff(p, s, params["z_min_rel"], hw)
    t, valid, ill = step.sfns.hit_fn(params, ps, s)
    t2, ok, broken = geom.clamp_abnormal(ps, s, t, valid, params["z_max_rel"])
    p_hit = ps + t2[:, None] * s
    hit = step.sfns.mask_fn(params, p_hit[:, 0], p_hit[:, 1]) & ok
    p_new = jnp.where(hw[:, None], p_hit, p)
    hit = hit & hw
    return p_new, hit, ill & hw, jnp.sum((broken & hw).astype(jnp.int32))


def _compute_polarization(s, s_, pols, upd, no_pol):
    """s/p decomposition of polarization across a direction change
    (reference :831-879). Returns (A_ts, A_tp, new_pols)."""
    if no_pol:
        return INV_SQRT2, INV_SQRT2, pols

    changed = jnp.any(s != s_, axis=-1)
    ps = normalize_safe(cross(s_, s))
    pp = cross(ps, s)
    A_ts = rdot(ps, pols)
    A_tp = rdot(pp, pols)
    A_ts = jnp.where(changed, A_ts, INV_SQRT2)
    A_tp = jnp.where(changed, A_tp, INV_SQRT2)
    pp_ = cross(ps, s_)
    pol_new = ps * A_ts[:, None] + pp_ * A_tp[:, None]
    m = (upd & changed)[:, None]
    return A_ts, A_tp, jnp.where(m, pol_new, pols)


def _outline_intersection(p_prev, p_new, s, w, outline):
    """Kill rays leaving the outline box; intersect them with the box
    (reference :666-718). Returns (p_out, w_out, count).

    Component-wise running minimum over the 6 plane parameters — no
    (N, 6) stack/repeat materializations; this sits in the per-surface
    scan body where every extra (N, k) buffer is an HBM round trip
    (measured 21 ms of the 160 ms benchmark trace before this form)."""
    xs, xe, ys, ye, zs, ze = [outline[i] for i in range(6)]
    x, y, z = p_new[:, 0], p_new[:, 1], p_new[:, 2]
    inside = (xs < x) & (x < xe) & (ys < y) & (y < ye) & (zs < z) & (z < ze)
    out = ~inside & (w > 0)

    # smallest positive t to any of the 6 box planes, from the previous section
    t = jnp.full_like(x, jnp.inf)
    for axis, (lo, hi) in enumerate(((xs, xe), (ys, ye), (zs, ze))):
        pc, sc = p_prev[:, axis], s[:, axis]
        ok = sc != 0
        # guard with 1.0 (not a tiny eps): 1/eps² overflows f32 in the VJP
        den = jnp.where(ok, sc, 1.0)
        for bound in (lo, hi):
            tb = (bound - pc) / den
            t = jnp.where(ok & (tb > 0) & (tb < t), tb, t)
    t = jnp.where(jnp.isfinite(t), t, 0.0)

    p_box = p_prev + t[:, None] * s
    p_out = jnp.where(out[:, None], p_box, p_new)
    w_out = jnp.where(out, 0.0, w)
    return p_out, w_out, jnp.sum(out.astype(jnp.int32))


def _refract(step: TraceStep, p_new, s, w, wl, pols, hit, no_pol):
    """Snell + Fresnel at a refracting surface (reference :761-829)."""
    params = step.sfns.params
    n = step.sfns.normal_fn(params, p_new[:, 0], p_new[:, 1])
    return _refract_core(n, step.n1_fn(wl), step.n2_fn(wl), s, w, pols, hit, no_pol)


def _refract_core(n, n1, n2, s, w, pols, hit, no_pol):
    """Snell + Fresnel given per-ray normals and indices; shared by the
    unrolled step and the scanned conic-run body."""
    ns = rdot(n, s)                      # cos(alpha)
    # grazing incidence: T → 0 physically, but the f32 evaluation is 0/0
    # (every factor carries cos(alpha)); take the limit explicitly
    graze = ns < 1e-6
    ns_safe = jnp.where(graze, 1.0, ns)
    Nq = n1 / n2
    W2 = 1.0 - Nq * Nq * (1.0 - ns * ns)
    tir = W2 < 0.0
    # grad-safe sqrt: push the argument away from 0 before the sqrt
    W = jnp.sqrt(jnp.where(tir, 1.0, W2))
    W = jnp.where(tir, 0.0, W)           # cos(beta)
    s_ = s * Nq[:, None] - n * (Nq * ns - W)[:, None]

    upd = hit & ~tir
    A_ts, A_tp, pols_new = _compute_polarization(s, s_, pols, upd, no_pol)

    n1ca = n1 * ns_safe
    n2cb = n2 * W
    ts = 2.0 * n1ca / (n1ca + n2cb)
    tp = 2.0 * n1ca / (n2 * ns_safe + n1 * W)
    T = n2cb / n1ca * ((A_ts * ts) ** 2 + (A_tp * tp) ** 2)
    T = jnp.where(tir | graze, 0.0, T)

    w_new = jnp.where(hit, w * T, w)
    s_new = jnp.where(upd[:, None], s_, s)
    n_tir = jnp.sum((tir & hit).astype(jnp.int32))
    return s_new, w_new, pols_new, n_tir


def _refract_ideal(step: TraceStep, p_new, s, pols, hit, no_pol):
    """Ideal-lens refraction (reference :720-759): focuses to the paraxial
    image plane without aberrations. f in mm = 1000/D[dpt]."""
    f = 1000.0 / step.D
    fsz = f / s[:, 2]
    sx = s[:, 0] * fsz - p_new[:, 0]
    sy = s[:, 1] * fsz - p_new[:, 1]
    s_ = jnp.stack([sx, sy, jnp.full_like(sx, f)], axis=-1)
    # jnp.sign (not np.sign): D may be a traced design parameter
    s_ = normalize_safe(s_) * jnp.sign(f)

    _, _, pols_new = _compute_polarization(s, s_, pols, hit, no_pol)
    s_new = jnp.where(hit[:, None], s_, s)
    return s_new, pols_new


def _hurb(step: TraceStep, key, p_new, s, w, wl, n_amb, pols, bend_candidates, no_pol,
          factor: float = HURB_FACTOR):
    """Heisenberg-uncertainty ray bending at a Ring/Slit aperture opening
    (reference :417-490): tangent-direction Gaussian perturbation with
    tanσ = HURB_FACTOR/(2·a·cosψ·k)."""
    params = step.sfns.params
    x, y = p_new[:, 0], p_new[:, 1]

    if step.hurb_kind == "ring":
        R = params["ri"]
        r = jnp.sqrt(x * x + y * y)
        theta = jnp.arctan2(y, x)
        b_ = R - r
        a_ = jnp.sqrt(jnp.maximum(b_ * R, 0.0))
        b_vec = jnp.stack([jnp.cos(theta), jnp.sin(theta), jnp.zeros_like(theta)], axis=-1)
        inside = r < R
    else:   # slit
        ang = params["angle"]
        c, sn = jnp.cos(ang), jnp.sin(ang)
        x_, y_ = x * c + y * sn, -x * sn + y * c
        a_ = params["hhi"] - jnp.abs(y_)
        b_ = params["hwi"] - jnp.abs(x_)
        inside = (a_ > 0) & (b_ > 0)
        ca = jnp.cos(ang) * jnp.ones_like(x)
        sa = jnp.sin(ang) * jnp.ones_like(x)
        b_vec = jnp.stack([ca, sa, jnp.zeros_like(x)], axis=-1)

    bend = bend_candidates & inside

    a_vec = jnp.stack([-b_vec[:, 1], b_vec[:, 0], jnp.zeros_like(x)], axis=-1)
    cpa2 = 1.0 - rdot(s, a_vec) ** 2
    cpb2 = 1.0 - rdot(s, b_vec) ** 2
    cos_psi_a = jnp.sqrt(jnp.where(cpa2 > 1e-12, cpa2, 1e-12))
    cos_psi_b = jnp.sqrt(jnp.where(cpb2 > 1e-12, cpb2, 1e-12))

    k = 2.0 * jnp.pi * n_amb / (wl * 1e-9)
    safe_a = jnp.where(a_ > 0, a_, 1.0)
    safe_b = jnp.where(b_ > 0, b_, 1.0)
    tan_sig_a = factor / (2.0 * safe_a * cos_psi_a * 1e-3 * k)
    tan_sig_b = factor / (2.0 * safe_b * cos_psi_b * 1e-3 * k)

    k1, k2 = jax.random.split(key)
    tan_tha = jax.random.normal(k1, x.shape) * jnp.abs(tan_sig_a)
    tan_thb = jax.random.normal(k2, x.shape) * jnp.abs(tan_sig_b)

    sa_dir = normalize_safe(cross(b_vec, s))
    sb_dir = cross(s, sa_dir)
    sab = s + sa_dir * tan_tha[:, None] + sb_dir * tan_thb[:, None]
    s_new = jnp.where(bend[:, None], normalize_safe(sab), s)

    neg = (s_new[:, 2] < 0) & bend
    w_new = jnp.where(neg, 0.0, w)
    n_neg = jnp.sum(neg.astype(jnp.int32))

    _, _, pols_new = _compute_polarization(s, s_new, pols, bend, no_pol)
    return s_new, w_new, pols_new, n_neg


# ----------------------------------------------------------------------
# scanned conic runs: consecutive conic refractions collapse into ONE
# lax.scan over stacked parameter tables, so the XLA program size (and
# compile time) stays O(1) in the number of lens surfaces instead of
# O(n_surfaces) — a 57-surface microscope compiles the refraction body
# once (VERDICT r2 #2; SURVEY §7 "element loop → lax.scan over a padded
# surface table"). Heterogeneous steps (ideal lenses, filters, apertures
# with HURB, non-conic surfaces) and steps consumed by a streaming sink
# stay unrolled; real systems are dominated by conic runs.

MIN_SCAN_RUN = 4
# body copies per scan iteration: recovers XLA fusion across consecutive
# surfaces (the unrolled path's runtime advantage) at O(SCAN_UNROLL)
# program size instead of O(n_surfaces)
SCAN_UNROLL = 4


def _normalize_sinks(sinks):
    """Sink entries are (fn, init) or (fn, init, seg_mask); normalize to
    triples. ``seg_mask=None`` means the sink may consume ANY segment,
    which keeps every step unrolled."""
    if not sinks:
        return []
    return [(e[0], e[1], e[2] if len(e) > 2 else None) for e in sinks]


def _frame_chain(steps, dtype):
    """Host-side local-frame origin chain: per step (pos_h f64, applied
    delta in the trace dtype, applied origin f64). Shared by the unrolled
    and scanned paths so both apply bit-identical frame shifts."""
    prev = np.zeros(3, dtype=np.float64)
    chain = []
    for step in steps:
        pos_h = np.asarray(step.pos_host, dtype=np.float64) \
            if step.pos_host is not None \
            else np.asarray(step.sfns.params["pos"], dtype=np.float64)
        delta = np.asarray(pos_h - prev, dtype=dtype)
        prev = prev + np.asarray(delta, dtype=np.float64)
        chain.append((pos_h, delta, prev.copy()))
    return chain


# step kinds only the whole-run Pallas kernel can execute inside a run
# (the lax.scan fallback cannot: heterogeneous hit solves would burden
# every scanned step)
KERNEL_ONLY_KINDS = ("asphere", "tilted")
# planar aperture shapes the kernel can absorb at (masked w-kill)
APERTURE_KINDS = ("circle", "flat", "ring", "rect", "slit")


def _kernel_only_step(st, use_hurb: bool) -> bool:
    """Steps only the widened (kernel-bound) partition may place in a
    run. Even aspheres always fuse (their unrolled fixed-iteration
    Newton solve measured 3.7× slower than the in-kernel form); cheap
    planar steps — tilted refractions and non-HURB aperture absorbers —
    fuse only when ``global_options.pallas_fuse_planar`` asks for
    single-launch tracing (measured slower at bulk ray counts, see the
    option's docstring)."""
    from ..utils.global_options import global_options
    if st.action == "refract":
        if st.sfns.kind == "asphere":
            return True
        return (st.sfns.kind == "tilted"
                and global_options.pallas_fuse_planar)
    if st.action == "absorb":
        return (global_options.pallas_fuse_planar
                and st.sfns.kind in APERTURE_KINDS
                and not (use_hurb and st.hurb))
    return False


def _partition_runs(steps, sink_masks, allow_kernel_kinds=False,
                    use_hurb=False):
    """Split the step list into per-step segments and scannable
    conic-refract runs (("step", [i]) / ("scan", [i..j]) entries).

    ``allow_kernel_kinds``: widen the scannable steps to what only the
    whole-run Pallas kernel can execute (even aspheres, tilted planes,
    non-HURB aperture absorbers — ops/pallas_run.py handles them as
    unrolled static steps); trace_bundle re-partitions such runs when
    kernel eligibility fails at dispatch. Fusing the absorbers is what
    keeps a stop-bearing system (virtually every real one) in a single
    kernel launch."""
    kinds = ("conic", "circle", "flat") + KERNEL_ONLY_KINDS \
        if allow_kernel_kinds else ("conic", "circle", "flat")

    def scannable(i):
        st = steps[i]
        if st.action == "refract" and st.sfns.kind in kinds:
            pass
        elif allow_kernel_kinds and _kernel_only_step(st, use_hurb) \
                and st.action == "absorb":
            pass
        else:
            return False
        for m in sink_masks:
            if m is None or (i < len(m) and m[i]):
                return False
        return True

    runs, i = [], 0
    while i < len(steps):
        if scannable(i):
            j = i
            while j < len(steps) and scannable(j):
                j += 1
            idxs = list(range(i, j))
            # absorbers only pay their in-kernel cost when INTERIOR to a
            # run (they glue refract steps into one launch); at the run
            # edges they buy nothing — measured ~2% headline / ~7% pol
            # loss from fusing the end absorber — so trim them back out
            while idxs and steps[idxs[0]].action == "absorb":
                runs.append(("step", [idxs.pop(0)]))
            tail = []
            while idxs and steps[idxs[-1]].action == "absorb":
                tail.append(("step", [idxs.pop()]))
            if len(idxs) >= MIN_SCAN_RUN:
                runs.append(("scan", idxs))
            else:
                runs.extend(("step", [k]) for k in idxs)
            runs.extend(reversed(tail))
            i = j
            continue
        runs.append(("step", [i]))
        i += 1
    return runs


def _ambient_chain(steps, n0_fn):
    """Per step, the ambient medium fn a ray is in when REACHING it (the
    n2 chain of preceding refract/ideal steps; filters/absorbers leave
    the ambient unchanged) — the n an absorber's stored section reports."""
    out, cur = [], n0_fn
    for st in steps:
        out.append(cur)
        if st.action in ("refract", "ideal"):
            cur = st.n2_fn
    return out


def _media_rows(steps, scan_idxs, amb_fn_at=None):
    """Unique media (by object identity) across all scanned steps.
    Returns (media_fns, pairs) with pairs[step_idx] = (n1_row, n2_row);
    absorb steps map both rows to the surrounding ambient medium."""
    media, rows, pairs = [], {}, {}

    def row(fn):
        k = id(fn)
        if k not in rows:
            rows[k] = len(media)
            media.append(fn)
        return rows[k]

    for i in scan_idxs:
        if steps[i].action == "absorb":
            r = row(amb_fn_at[i])
            pairs[i] = (r, r)
        else:
            pairs[i] = (row(steps[i].n1_fn), row(steps[i].n2_fn))
    return media, pairs


def _conic_scan(steps, idxs, chain, outline64, n_tab, pairs,
                p, s, pols, w, no_pol, store_sections):
    """Run one refract run (conic and/or flat-disc surfaces) as a lax.scan.

    The body performs EXACTLY the unrolled per-step op sequence (frame
    shift → hit → miss absorption → Snell/Fresnel/polarization → outline
    kill), with per-surface parameters as scanned-over xs and media
    indices gathered from the shared (M, N) index table. Flat steps
    (plano lens sides) select the plane-hit/flat-normal result via a
    scanned boolean; the conic branch runs on a dummy unit sphere there
    so it stays NaN-free in both passes, and ``where`` zeroes its
    cotangent.
    """
    # kernel-only steps reach scan runs only via the widened partition;
    # scanning one as a conic refraction would be silently wrong physics
    assert all(steps[i].action == "refract"
               and steps[i].sfns.kind not in KERNEL_ONLY_KINDS
               for i in idxs), \
        "kernel-only step in a lax.scan run (repartition missing)"
    dt = p.dtype
    one = jnp.asarray(np.asarray(1.0, dtype=dt))
    zero = jnp.asarray(np.asarray(0.0, dtype=dt))

    def sp(name, default):
        return jnp.stack([steps[i].sfns.params.get(name, default) for i in idxs])

    out_rel = np.stack([[outline64[q] - chain[i][2][q // 2] for q in range(6)]
                        for i in idxs])
    xs = dict(
        pos=jnp.stack([steps[i].sfns.params["pos"] for i in idxs]),
        rho=sp("rho", one), k=sp("k", zero), r=sp("r", one),
        z_min_rel=sp("z_min_rel", zero), z_max_rel=sp("z_max_rel", zero),
        is_flat=jnp.asarray([steps[i].sfns.is_flat for i in idxs], dtype=bool),
        pos_h=jnp.asarray(np.stack([chain[i][0] for i in idxs]), dtype=dt),
        delta=jnp.asarray(np.stack([chain[i][1] for i in idxs]), dtype=dt),
        origin=jnp.asarray(np.stack([chain[i][2] for i in idxs]), dtype=dt),
        out_rel=jnp.asarray(out_rel, dtype=dt),
        n1=jnp.asarray([pairs[i][0] for i in idxs], dtype=jnp.int32),
        n2=jnp.asarray([pairs[i][1] for i in idxs], dtype=jnp.int32),
    )

    def body(carry, x):
        # pol is untouched physics-wise under no_pol: keep it out of the
        # carry AND the ys so the scan never streams NaN tensors through
        # HBM (12 MB/step read+write at 1e6 rays)
        if no_pol:
            p, s, w = carry
            pl = None
        else:
            p, s, pl, w = carry
        hw = w > 0.0
        p = p - x["delta"]
        p = p - (x["pos"] - x["pos_h"])
        p_prev, w_prev = p, w

        # recondition distant origins before the hit solve (same as
        # _surface_hit; the ray line is unchanged)
        ps = geom.advance_to_standoff(p, s, x["z_min_rel"], hw)
        t_c, valid_c = geom.hit_conic(ps, s, x["rho"], x["k"],
                                      x["z_min_rel"], x["z_max_rel"])
        t_f = geom.hit_plane(ps, s)
        valid_f = jnp.isfinite(t_f) & (t_f >= -geom.C_EPS)
        t = jnp.where(x["is_flat"], t_f, t_c)
        valid = jnp.where(x["is_flat"], valid_f, valid_c)
        t2, ok, _ = geom.clamp_abnormal(ps, s, t, valid, x["z_max_rel"])
        p_hit = ps + t2[:, None] * s
        hit = geom.mask_circle(p_hit[:, 0], p_hit[:, 1], x["r"]) & ok
        p = jnp.where(hw[:, None], p_hit, p)
        hit = hit & hw

        info = jnp.zeros((N_INFOS,), dtype=jnp.int32)
        miss = hw & ~hit
        w = jnp.where(miss, 0.0, w)
        info = info.at[ABSORB_MISSING].add(jnp.sum(miss.astype(jnp.int32)))

        nvec_c = geom.normal_conic(p[:, 0], p[:, 1], x["rho"], x["k"])
        nvec_f = geom.normal_flat(p[:, 0], p[:, 1])
        nvec = jnp.where(x["is_flat"], nvec_f, nvec_c)
        n1 = n_tab[x["n1"]]
        n2 = n_tab[x["n2"]]
        s, w, pl_o, n_tir = _refract_core(nvec, n1, n2, s, w, pl, hit, no_pol)
        info = info.at[TIR].add(n_tir)

        p, w, n_out = _outline_intersection(p_prev, p, s, w, x["out_rel"])
        info = info.at[OUTLINE_INTERSECTION].add(n_out)

        if no_pol:
            ys = (info, p + x["origin"], w, n2) if store_sections else (info,)
            return (p, s, w), ys
        ys = (info, p + x["origin"], w, pl_o, n2) if store_sections else (info,)
        return (p, s, pl_o, w), ys

    # under shard_map, scan carries must keep a consistent varying-manual-axes
    # set across iterations: promote replicated inits (broadcast constants
    # like a point source's p or the uniform w) to the union vma of the
    # whole traced state (see jax docs "scan-vma")
    leaves = [p, s, pols, w, n_tab] + list(jax.tree_util.tree_leaves(xs))
    vma = frozenset().union(*(jax.typeof(a).vma for a in leaves))

    def _pv(a):
        missing = vma - jax.typeof(a).vma
        return jax.lax.pcast(a, tuple(missing), to="varying") if missing else a

    if no_pol:
        (p, s, w), ys = jax.lax.scan(body, (_pv(p), _pv(s), _pv(w)), xs,
                                     unroll=SCAN_UNROLL)
        return (p, s, pols, w), ys
    return jax.lax.scan(body, (_pv(p), _pv(s), _pv(pols), _pv(w)), xs,
                        unroll=SCAN_UNROLL)


# ----------------------------------------------------------------------
# whole-run Pallas dispatch (ops/pallas_run.py)

def _is_concrete(v) -> bool:
    """True for any non-traced value (python/numpy scalars, concrete jax
    arrays) — embedding them as kernel constants cannot sever a gradient."""
    return not isinstance(v, jax.core.Tracer)


def _pallas_interpret() -> bool:
    """CPU interpreter mode for the whole-run kernel (parity tests)."""
    import os
    return bool(os.environ.get("OPTRACE_TPU_PALLAS_INTERPRET"))


def _diff_traced(*arrays) -> bool:
    """True when any array is a differentiation tracer (jvp/linearize) —
    ``pallas_call`` has no autodiff rules, so gradients w.r.t. values that
    reach the kernel as OPERANDS (ray state from traced source parameters,
    media rows from traced dispersion coefficients) must keep the XLA
    scan. Surface-parameter tracers are caught separately because those
    are embedded as kernel CONSTANTS (severing the gradient silently
    rather than erroring)."""
    from jax.interpreters import ad
    from jax.interpreters import partial_eval as pe
    types = [ad.JVPTracer, pe.JaxprTracer]
    try:    # direct-linearization tracer (jax >= 0.4.34, not re-exported)
        from jax._src.interpreters.ad import LinearizeTracer
        types.append(LinearizeTracer)
    except ImportError:     # pragma: no cover
        pass
    types = tuple(types)
    return any(isinstance(a, types) for a in arrays if a is not None)


def _pallas_run_eligible(steps, idxs, p, s=None, w=None, pols=None,
                         n_tab=None) -> bool:
    """The whole-run kernel applies to the f32 path (with or without
    polarization transport) with concrete (non-traced) surface parameters
    on a TPU backend; everything else keeps the XLA scan
    (differentiable-design path, f64). OPTRACE_TPU_PALLAS_INTERPRET=1
    additionally enables the CPU interpreter path for tests."""
    from ..utils.global_options import global_options
    if not global_options.pallas_trace or p.dtype != jnp.float32:
        return False
    if _diff_traced(p, s, w, pols, n_tab):
        return False
    try:
        backend = jax.default_backend()
    except Exception:   # pragma: no cover
        return False
    if backend != "tpu" and not _pallas_interpret():
        return False
    if _pallas_interpret() and getattr(jax.typeof(p), "vma", frozenset()):
        # the interpreter decomposes the kernel into jax ops whose scalar
        # index operands fail shard_map's vma checks; compiled TPU
        # pallas_call is opaque and unaffected — interpret+shard_map
        # (a test-only combination) keeps the XLA scan
        return False
    for i in idxs:
        for key in ("pos", "rho", "k", "r", "z_min_rel", "z_max_rel",
                    "coeff", "normal", "ri", "hw", "hh", "hwi", "hhi",
                    "angle"):
            v = steps[i].sfns.params.get(key)
            if v is not None and not _is_concrete(v):
                return False
    return True


def _repartition_without_kernel_kinds(steps, idxs, use_hurb=False):
    """Fallback partition of a widened run whose kernel eligibility failed
    at dispatch (e.g. diff-traced media discovered via n_tab): conic
    sub-runs stay scannable, kernel-only steps (aspheres, tilted,
    fused absorbers) unroll."""
    out, buf = [], []

    def flush():
        if len(buf) >= MIN_SCAN_RUN:
            out.append(("scan", list(buf)))
        else:
            out.extend(("step", [j]) for j in buf)
        buf.clear()

    for i in idxs:
        if _kernel_only_step(steps[i], use_hurb):
            flush()
            out.append(("step", [i]))
        else:
            buf.append(i)
    flush()
    return out


# Longest run per kernel launch: the in-kernel media block and stored-
# section outputs scale linearly with L in VMEM (L=64 at TILE_ROWS=32 ≈
# 3.3 MB media + 6.7 MB sections), so longer runs are chunked — the ray
# state simply carries from one launch into the next.
PALLAS_RUN_CHUNK = 64


def _conic_run_pallas_dispatch(steps, idxs, chain, outline64, n_tab, pairs,
                               p, s, w, pols, no_pol, store_sections):
    """Build the static per-step constants and media rows, call the
    whole-run kernel (chunked to PALLAS_RUN_CHUNK steps per launch), and
    reshape its outputs to the scan contract."""
    from ..ops.pallas_run import conic_run_pallas

    if len(idxs) > PALLAS_RUN_CHUNK:
        # thread the state through the chunks sequentially
        out_infos, out_p, out_w, out_pol = [], [], [], []
        for i in range(0, len(idxs), PALLAS_RUN_CHUNK):
            chunk = idxs[i:i + PALLAS_RUN_CHUNK]
            p, s, w, pols, ri, rp, rw, rq = _conic_run_pallas_dispatch(
                steps, chunk, chain, outline64, n_tab, pairs, p, s, w,
                pols, no_pol, store_sections)
            out_infos.append(ri)
            if store_sections:
                out_p.append(rp)
                out_w.append(rw)
                out_pol.append(rq)
        infos = jnp.concatenate(out_infos, axis=0)
        if not store_sections:
            return p, s, w, pols, infos, None, None, None
        return (p, s, w, pols, infos, jnp.concatenate(out_p, axis=0),
                jnp.concatenate(out_w, axis=0),
                None if no_pol else jnp.concatenate(out_pol, axis=0))

    def f(v, default=0.0):
        return float(np.asarray(v if v is not None else default).reshape(-1)[0])

    consts = []
    for i in idxs:
        st = steps[i]
        pr = st.sfns.params
        pos_h, delta, origin = chain[i]
        out_rel = tuple(float(outline64[q] - origin[q // 2]) for q in range(6))
        is_asph = st.sfns.kind == "asphere"
        is_tilt = st.sfns.kind == "tilted"
        coeff = tuple(float(x) for x in np.asarray(pr["coeff"]).tolist()) \
            if is_asph else ()
        tn = tuple(float(x) for x in np.asarray(pr["normal"]).tolist()) \
            if is_tilt else (0.0, 0.0, 1.0)
        # aperture-mask shape for fused absorb steps ("circle" otherwise)
        mask = st.sfns.kind if st.action == "absorb" \
            and st.sfns.kind in ("ring", "rect", "slit") else "circle"
        consts.append(tuple(sorted(dict(
            rho=f(pr.get("rho"), 1.0), k=f(pr.get("k"), 0.0),
            r=f(pr.get("r"), 1.0),
            z_min=f(pr.get("z_min_rel"), 0.0), z_max=f(pr.get("z_max_rel"), 0.0),
            is_flat=bool(st.sfns.is_flat), is_asph=is_asph, coeff=coeff,
            is_tilt=is_tilt, tn=tn,
            action=st.action, mask=mask,
            ri=f(pr.get("ri"), 0.0), hw=f(pr.get("hw"), 1.0),
            hh=f(pr.get("hh"), 1.0), hwi=f(pr.get("hwi"), 0.0),
            hhi=f(pr.get("hhi"), 0.0), angle=f(pr.get("angle"), 0.0),
            dx=float(delta[0]), dy=float(delta[1]), dz=float(delta[2]),
            ox=float(origin[0]), oy=float(origin[1]), oz=float(origin[2]),
            out=out_rel).items())))

    idx_arr = jnp.asarray([[pairs[i][0], pairs[i][1]] for i in idxs],
                          dtype=jnp.int32)
    med = jnp.take(n_tab, idx_arr.reshape(-1), axis=0) \
        .reshape(len(idxs), 2, n_tab.shape[1])

    (p2, s2, w2, pols2), (counts, ys_p, ys_w, ys_pol) = conic_run_pallas(
        p, s, w, med, None if no_pol else pols, consts=tuple(consts),
        store=store_sections, interpret=_pallas_interpret())
    if no_pol:
        pols2 = pols

    # per-step (N_INFOS,) rows from the kernel's (L, 4) counters
    L = len(idxs)
    run_infos = jnp.zeros((L, N_INFOS), dtype=jnp.int32)
    run_infos = run_infos.at[:, ABSORB_MISSING].set(counts[:, 0])
    run_infos = run_infos.at[:, TIR].set(counts[:, 1])
    run_infos = run_infos.at[:, OUTLINE_INTERSECTION].set(counts[:, 2])
    run_infos = run_infos.at[:, ILL_COND].set(counts[:, 3])
    return p2, s2, w2, pols2, run_infos, ys_p, ys_w, ys_pol


# ----------------------------------------------------------------------
# the trace

def trace_bundle(steps: list, n0_fn: Callable, outline,
                 p, s, pols, w, wl, no_pol: bool,
                 use_hurb: bool, key=None,
                 sinks: list = None, store_sections: bool = True,
                 hurb_factor: float = HURB_FACTOR):
    """Trace a ray bundle through the unrolled step list.

    :param steps: list[TraceStep] including the implicit end absorber
    :param n0_fn: ambient index wl -> n
    :param outline: 6-element outline box
    :param p, s, pols, w, wl: initial ray state from the sources
    :param sinks: optional list of (update_fn, init_carry) or
        (update_fn, init_carry, seg_mask) streaming consumers. After each
        step, ``carry = update_fn(j, p_prev, p_new, w_prev, carry)`` is
        called with the segment index j (= step index) and the ray weight
        *at the segment start*. This is how the fused render observes
        detector crossings without section storage. ``seg_mask`` is the
        sink's static per-segment relevance list; steps whose segment no
        sink consumes are eligible for the scanned fast path.
    :param store_sections: when False, per-section arrays are not
        accumulated — the returned dict carries only the final ray state,
        wl, INFOS and the sink carries, keeping HBM at O(N) regardless of
        surface count (the megabatch render path).
    :return: dict with stacked per-section arrays p (N, nt, 3), w (N, nt),
             pols (N, nt, 3), n (N, nt) (if store_sections) and the INFOS
             counter matrix (N_INFOS, nt) — nt = len(steps) + 1 sections —
             plus "sinks": final sink carries.
    """
    sections_p = [p]
    sections_w = [w]
    sections_pol = [pols]
    sections_n = [n0_fn(wl)]
    infos = [jnp.zeros((N_INFOS,), dtype=jnp.int32)]
    sink_list = _normalize_sinks(sinks)
    carries = [init for _, init, _ in sink_list]
    n_amb_last = sections_n[-1]
    outline64 = np.asarray(outline, dtype=np.float64)
    # local-frame re-centering chain: shift the ray state into the frame
    # of each surface's vertex, tracking the APPLIED cumulative origin so
    # f32 position rounding stays O(eps·(gap+aperture)) instead of
    # O(eps·|z_absolute|) — see TraceStep.pos_host
    chain = _frame_chain(steps, p.dtype)
    sink_masks = [m for _, _, m in sink_list]
    # widen scannable runs to the kernel-only steps (aspheres, tilted
    # planes, non-HURB aperture absorbers) only when the whole-run
    # kernel will take them (it unrolls per-step static constants, so a
    # heterogeneous step costs only its own solve; the lax.scan fallback
    # would pay it on EVERY scanned step). Fused absorbers keep a
    # stop-bearing system in one kernel launch. Media tracers are not
    # visible yet (n_tab below) — the per-run eligibility re-check plus
    # _repartition_without_kernel_kinds handles that case.
    light_idxs = [i for i, st in enumerate(steps)
                  if st.action in ("refract", "absorb")]
    allow_kernel_kinds = (
        any(_kernel_only_step(steps[i], use_hurb) for i in light_idxs)
        and _pallas_run_eligible(steps, light_idxs, p, s, w, pols, None))
    runs = _partition_runs(steps, sink_masks,
                           allow_kernel_kinds=allow_kernel_kinds,
                           use_hurb=use_hurb)

    # shared media table for the scanned runs: one (M, N) row per unique
    # medium, gathered by index inside the scan bodies
    scan_idxs = [i for kind, idxs in runs if kind == "scan" for i in idxs]
    n_tab = None
    if scan_idxs:
        media, pairs = _media_rows(steps, scan_idxs,
                                   _ambient_chain(steps, n0_fn))
        n_tab = jnp.stack([m(wl) for m in media])

    if key is None:
        key = jax.random.PRNGKey(0)

    from collections import deque
    work = deque(runs)
    while work:
        run_kind, run_idxs = work.popleft()
        if run_kind == "scan":
            if not _pallas_run_eligible(steps, run_idxs, p, s, w, pols,
                                        n_tab) \
                    and any(_kernel_only_step(steps[i], use_hurb)
                            for i in run_idxs):
                # widened run, kernel refused at dispatch (e.g. traced
                # media): conic sub-runs scan, kernel-only steps unroll
                work.extendleft(reversed(
                    _repartition_without_kernel_kinds(steps, run_idxs,
                                                      use_hurb)))
                continue
            if _pallas_run_eligible(steps, run_idxs, p, s, w, pols, n_tab):
                (p, s, w, pols, run_infos, run_p, run_w,
                 run_pol) = _conic_run_pallas_dispatch(
                    steps, run_idxs, chain, outline64, n_tab, pairs,
                    p, s, w, pols, no_pol, store_sections)
                L = len(run_idxs)
                infos.extend(run_infos[i] for i in range(L))
                if store_sections:
                    sections_p.extend(run_p[i] for i in range(L))
                    sections_w.extend(run_w[i] for i in range(L))
                    if no_pol:      # pol untouched: reuse the source array
                        sections_pol.extend([pols] * L)
                    else:
                        sections_pol.extend(run_pol[i] for i in range(L))
                    sections_n.extend(n_tab[pairs[i][1]] for i in run_idxs)
                n_amb_last = n_tab[pairs[run_idxs[-1]][1]]
                continue
            (p, s, pols, w), ys = _conic_scan(steps, run_idxs, chain, outline64,
                                              n_tab, pairs, p, s, pols, w,
                                              no_pol, store_sections)
            L = len(run_idxs)
            infos.extend(ys[0][i] for i in range(L))
            if store_sections:
                sections_p.extend(ys[1][i] for i in range(L))
                sections_w.extend(ys[2][i] for i in range(L))
                if no_pol:     # pol untouched: reuse the source array
                    sections_pol.extend([pols] * L)
                    sections_n.extend(ys[3][i] for i in range(L))
                else:
                    sections_pol.extend(ys[3][i] for i in range(L))
                    sections_n.extend(ys[4][i] for i in range(L))
            n_amb_last = n_tab[pairs[run_idxs[-1]][1]]
            continue

        idx = run_idxs[0]
        step = steps[idx]
        info = jnp.zeros((N_INFOS,), dtype=jnp.int32)
        hw = w > 0.0

        pos_h, delta_applied, origin = chain[idx]
        if np.any(delta_applied):
            p = p - jnp.asarray(delta_applied, dtype=p.dtype)
        # traced residual (exactly 0 in the forward pass, params["pos"]
        # equals pos_host): keeps d(image)/d(surface position) flowing for
        # the differentiable-design path (tracer/diff.py) even though the
        # frame shift itself is a static constant
        p = p - (step.sfns.params["pos"] - jnp.asarray(pos_h, dtype=p.dtype))
        out_rel = tuple(float(outline64[i] - origin[i // 2]) for i in range(6))

        p_prev = p
        w_prev = w

        p, hit, ill, n_broken = _surface_hit(step, p, s, hw)
        info = info.at[ILL_COND].add(jnp.sum(ill.astype(jnp.int32)))

        if step.action == "refract":
            # rays missing the surface are absorbed (reference :320-327)
            miss = hw & ~hit
            w = jnp.where(miss, 0.0, w)
            # absorbed-at-miss rays keep the previous position on back
            # surfaces (reference :352-355) — here: clamped position stays
            info = info.at[ABSORB_MISSING].add(jnp.sum(miss.astype(jnp.int32)))
            s, w, pols, n_tir = _refract(step, p, s, w, wl, pols, hit, no_pol)
            info = info.at[TIR].add(n_tir)
            n_after = step.n2_fn(wl)

        elif step.action == "ideal":
            miss = hw & ~hit
            w = jnp.where(miss, 0.0, w)
            info = info.at[ABSORB_MISSING].add(jnp.sum(miss.astype(jnp.int32)))
            s, pols = _refract_ideal(step, p, s, pols, hit, no_pol)
            n_after = step.n2_fn(wl)

        elif step.action == "filter":
            T = step.spectrum_fn(wl)
            w = jnp.where(hit, w * T, w)
            n_after = n_amb_last

        elif step.action == "absorb":
            w = jnp.where(hit, 0.0, w)
            passing = hw & ~hit
            if use_hurb and step.hurb:
                key, sub = jax.random.split(key)
                s, w, pols, n_neg = _hurb(step, sub, p, s, w, wl, n_amb_last,
                                          pols, passing, no_pol, hurb_factor)
                info = info.at[HURB_NEG_DIR].add(n_neg)
            n_after = n_amb_last
        else:  # pragma: no cover
            raise RuntimeError(f"unknown action {step.action}")

        p, w, n_out = _outline_intersection(p_prev, p, s, w, out_rel)
        info = info.at[OUTLINE_INTERSECTION].add(n_out)

        if sink_list or store_sections:
            # sections and sinks see absolute coordinates (single rounding
            # at output, does not feed back into the trace state); rebase
            # from the APPLIED origin, the frame p actually lives in
            off = jnp.asarray(origin, dtype=p.dtype)
            p_abs = p + off
            if sink_list:
                p_prev_abs = p_prev + off
                carries = [fn(idx, p_prev_abs, p_abs, w_prev, c)
                           for (fn, _, _), c in zip(sink_list, carries)]

        n_amb_last = n_after
        infos.append(info)
        if store_sections:
            sections_p.append(p_abs)
            sections_w.append(w)
            sections_pol.append(pols)
            sections_n.append(n_after)

    out = {
        "wl": wl,
        "infos": jnp.stack(infos, axis=1),   # (N_INFOS, nt)
        "sinks": carries,
    }
    if store_sections:
        out |= {
            "p": jnp.stack(sections_p, axis=1),
            "w": jnp.stack(sections_w, axis=1),
            # under no_pol the polarization is never touched: skip the
            # (N, nt, 3) NaN stack + device→host copy entirely (RayStorage
            # broadcasts host-side, ray_storage.py:73-74)
            "pol": None if no_pol else jnp.stack(sections_pol, axis=1),
            "n": jnp.stack(sections_n, axis=1),
        }
    return out
