"""Detector intersection search over stored ray sections.

TPU-native equivalent of reference ``raytracer.py:881-1051``: instead of a
data-dependent per-ray advance loop, every ray tests each of its nt−1
section segments against the detector surface in a static scan; the first
segment whose hit lies before the next stored section wins. O(nt · N)
fully-vectorized work instead of host-side masking loops.
"""

import jax.numpy as jnp

from ..ops import geom
from .scene_compile import SurfaceFns


def build_segment_mask(section_z_bounds: list, det_zmin: float, det_zmax: float) -> list:
    """Static per-segment relevance: segment j (between stored sections j
    and j+1) can contain a detector hit only if the detector z-range
    overlaps [section_j.z_min, section_{j+1}.z_max]."""
    eps = 1e-3
    mask = []
    for j in range(len(section_z_bounds) - 1):
        lo = section_z_bounds[j][0] - eps
        hi = section_z_bounds[j + 1][1] + eps
        mask.append(det_zmin <= hi and det_zmax >= lo)
    if not any(mask):
        mask = [True] * (len(section_z_bounds) - 1)
    return mask


def detector_hits(sfns: SurfaceFns, det_zmin: float, p_all, w_all,
                  segment_mask: list = None):
    """Find detector intersections for all rays.

    :param sfns: compiled detector surface
    :param det_zmin: detector z-extent minimum (first-reach criterion)
    :param p_all: stored positions (N, nt, 3)
    :param w_all: stored weights (N, nt)
    :param segment_mask: optional static per-segment booleans; segments
        whose section z-ranges cannot contain the detector are skipped
        entirely (big win when the detector sits behind the last surface:
        the scan collapses from nt−1 segments to one or two)
    :return: (ph (N,3), w_sel (N,), is_hit (N,), n_ill scalar)
    """
    nt = p_all.shape[1]
    Nr = p_all.shape[0]
    ph = jnp.zeros((Nr, 3), dtype=p_all.dtype)
    wsel = jnp.zeros((Nr,), dtype=w_all.dtype)
    is_hit = jnp.zeros((Nr,), dtype=bool)
    done = jnp.zeros((Nr,), dtype=bool)
    n_ill = jnp.zeros((), dtype=jnp.int32)

    for j in range(nt - 1):
        if segment_mask is not None and not segment_mask[j]:
            continue
        pj = p_all[:, j]
        pj1 = p_all[:, j + 1]
        seg = pj1 - pj
        l2 = jnp.sum(seg * seg, axis=-1, keepdims=True)
        moving2 = l2 > 0
        slen = jnp.sqrt(jnp.where(moving2, l2, 1.0))
        sj = jnp.where(moving2, seg / slen, 0.0)

        o = pj - sfns.params["pos"]
        t, valid, ill = sfns.hit_fn(sfns.params, o, sj)
        t2, ok, _ = geom.clamp_abnormal(o, sj, t, valid, sfns.params["z_max_rel"])
        cand = pj + t2[:, None] * sj
        rel = cand - sfns.params["pos"]
        mask_hit = sfns.mask_fn(sfns.params, rel[:, 0], rel[:, 1]) & ok

        reach = pj1[:, 2] >= det_zmin - geom.C_EPS
        before_next = cand[:, 2] <= pj1[:, 2] + geom.C_EPS
        accept = ~done & reach & before_next & moving2[:, 0] & jnp.isfinite(t2)

        ph = jnp.where(accept[:, None], cand, ph)
        wsel = jnp.where(accept, w_all[:, j], wsel)
        is_hit = jnp.where(accept, mask_hit, is_hit)
        n_ill = n_ill + jnp.sum((ill & accept).astype(jnp.int32))
        done = done | accept

    return ph, wsel, is_hit & done, n_ill
