"""Whole-run Pallas trace kernel (ops/pallas_run.py): parity against the
XLA scan on the CPU interpreter (the TPU head-to-head is reported by
bench.py / tools, VERDICT r3 #6)."""

import os

import numpy as np
import pytest

import optrace_tpu as ot


def _build(with_flats=True):
    RT = ot.Raytracer(outline=[-10, 10, -10, 10, -10, 80], no_pol=True)
    RT.add(ot.RaySource(ot.CircularSurface(r=1.5), divergence="Lambertian",
                        div_angle=8, pos=[0, 0, -5],
                        spectrum=ot.presets.light_spectrum.d65))
    n1 = ot.presets.refraction_index.BK7
    n2 = ot.presets.refraction_index.F2
    RT.add(ot.Lens(ot.SphericalSurface(r=3, R=20), ot.SphericalSurface(r=3, R=-25),
                   n=n1, pos=[0, 0, 0], d=1.0))
    back = ot.CircularSurface(r=3) if with_flats else ot.SphericalSurface(r=3, R=-40)
    RT.add(ot.Lens(ot.ConicSurface(r=3, R=30, k=-0.5), back,
                   n=n2, pos=[0, 0, 5], d=0.8))
    RT.add(ot.Lens(ot.SphericalSurface(r=3, R=15), ot.SphericalSurface(r=3, R=-15),
                   n=n1, pos=[0, 0, 10], d=1.2))
    RT.add(ot.Detector(ot.RectangularSurface(dim=[8, 8]), pos=[0, 0, 40]))
    return RT


@pytest.fixture()
def interpret_mode():
    os.environ["OPTRACE_TPU_PALLAS_INTERPRET"] = "1"
    yield
    os.environ.pop("OPTRACE_TPU_PALLAS_INTERPRET", None)
    ot.global_options.pallas_trace = False


@pytest.mark.parametrize("with_flats", [True, False])
def test_run_kernel_matches_xla_scan(interpret_mode, with_flats):
    """Stored sections, weights and INFOS counters agree between the
    whole-run kernel and the XLA scan on an identical trace."""
    N = 20000
    with ot.global_options.no_warnings(), ot.global_options.no_progress_bar():
        ot.global_options.pallas_trace = False     # baseline: XLA scan
        RT_a = _build(with_flats)
        RT_a.trace(N)
        ot.global_options.pallas_trace = True
        RT_b = _build(with_flats)
        RT_b.trace(N)
        ot.global_options.pallas_trace = False

    pa, pb = np.asarray(RT_a.rays.p_list), np.asarray(RT_b.rays.p_list)
    wa, wb = np.asarray(RT_a.rays.w_list), np.asarray(RT_b.rays.w_list)
    assert pa.shape == pb.shape
    np.testing.assert_allclose(pa, pb, rtol=5e-6, atol=2e-5)
    np.testing.assert_allclose(wa, wb, atol=1e-9)
    assert (RT_a._msgs == RT_b._msgs).all()


def test_detector_image_parity(interpret_mode):
    """The rendered detector image is the same through both paths."""
    N = 30000
    with ot.global_options.no_warnings(), ot.global_options.no_progress_bar():
        ot.global_options.pallas_trace = False     # baseline: XLA scan
        RT_a = _build()
        RT_a.trace(N)
        img_a = RT_a.detector_image(extent=[-3, 3, -3, 3])
        ot.global_options.pallas_trace = True
        RT_b = _build()
        RT_b.trace(N)
        img_b = RT_b.detector_image(extent=[-3, 3, -3, 3])
        ot.global_options.pallas_trace = False
    a = np.asarray(img_a.get("Irradiance", 63).data)
    b = np.asarray(img_b.get("Irradiance", 63).data)
    assert img_a.power() == pytest.approx(img_b.power(), rel=1e-6)
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-9)


def test_diff_path_keeps_xla_scan(interpret_mode):
    """Traced surface parameters make the run ineligible — the
    differentiable-design path must silently keep the XLA scan and still
    produce finite gradients."""
    import jax
    import jax.numpy as jnp
    from optrace_tpu.tracer.diff import make_parameterized_render

    ot.global_options.pallas_trace = True
    RT = _build(with_flats=False)
    render, params0 = make_parameterized_render(RT, 256, extent=(-3, 3, -3, 3),
                                                Nx=16, Ny=16)

    def loss(params):
        return jnp.sum(render(params, jax.random.PRNGKey(0))[:, :, 3])

    g = jax.grad(loss)(params0)
    leaves = [np.asarray(x) for x in jax.tree_util.tree_leaves(g)]
    assert all(np.isfinite(x).all() for x in leaves)
    ot.global_options.pallas_trace = False


def test_chunked_dispatch_parity(interpret_mode, monkeypatch):
    """Runs longer than PALLAS_RUN_CHUNK split across kernel launches with
    the state threaded through; forced tiny chunks must match the XLA
    scan exactly like the single-launch path."""
    import optrace_tpu.tracer.trace_core as tc

    monkeypatch.setattr(tc, "PALLAS_RUN_CHUNK", 2)
    N = 15000
    with ot.global_options.no_warnings(), ot.global_options.no_progress_bar():
        ot.global_options.pallas_trace = False
        RT_a = _build(with_flats=True)
        RT_a.trace(N)
        ot.global_options.pallas_trace = True
        RT_b = _build(with_flats=True)
        RT_b.trace(N)
        ot.global_options.pallas_trace = False

    pa, pb = np.asarray(RT_a.rays.p_list), np.asarray(RT_b.rays.p_list)
    np.testing.assert_allclose(pa, pb, rtol=5e-6, atol=2e-5)
    np.testing.assert_allclose(np.asarray(RT_a.rays.w_list),
                               np.asarray(RT_b.rays.w_list), atol=1e-9)
    assert (RT_a._msgs == RT_b._msgs).all()


@pytest.mark.parametrize("no_pol", [True, False])
def test_outline_exit_scene_parity(interpret_mode, no_pol):
    """Scene whose lens apertures poke past the outline box (allowed with
    a warning, raytracer.py:213): rays hitting those zones must be
    outline-killed IN-KERNEL identically to the XLA scan — the branch no
    regular scene reaches (ADVICE r4 #2; exercises the r4 pol-clobber fix
    at scene level)."""
    from optrace_tpu.tracer.trace_core import OUTLINE_INTERSECTION

    def build_tight():
        RT = ot.Raytracer(outline=[-2.5, 2.5, -2.5, 2.5, -10, 80],
                          no_pol=no_pol)
        RT.add(ot.RaySource(ot.CircularSurface(r=1.5), divergence="Lambertian",
                            div_angle=25, pos=[0, 0, -5],
                            spectrum=ot.presets.light_spectrum.d65))
        n1 = ot.presets.refraction_index.BK7
        n2 = ot.presets.refraction_index.F2
        RT.add(ot.Lens(ot.SphericalSurface(r=3, R=20),
                       ot.SphericalSurface(r=3, R=-25),
                       n=n1, pos=[0, 0, 0], d=1.0))
        RT.add(ot.Lens(ot.ConicSurface(r=3, R=30, k=-0.5),
                       ot.CircularSurface(r=3),
                       n=n2, pos=[0, 0, 5], d=0.8))
        RT.add(ot.Lens(ot.SphericalSurface(r=3, R=15),
                       ot.SphericalSurface(r=3, R=-15),
                       n=n1, pos=[0, 0, 10], d=1.2))
        RT.add(ot.Detector(ot.RectangularSurface(dim=[4, 4]), pos=[0, 0, 40]))
        # the outside-outline geometry is deliberate here: tracing it is
        # exactly how the in-run outline branch becomes reachable
        RT._ignore_geometry_error = True
        return RT

    N = 20000
    with ot.global_options.no_warnings(), ot.global_options.no_progress_bar():
        ot.global_options.pallas_trace = False     # baseline: XLA scan
        RT_a = build_tight()
        RT_a.trace(N)
        ot.global_options.pallas_trace = True
        RT_b = build_tight()
        RT_b.trace(N)
        ot.global_options.pallas_trace = False

    # the in-run outline branch must actually fire (not only the end step)
    n_out = RT_b._msgs[OUTLINE_INTERSECTION, 1:7].sum()
    assert n_out > 50, f"outline branch unexercised ({n_out} kills)"
    pa, pb = np.asarray(RT_a.rays.p_list), np.asarray(RT_b.rays.p_list)
    wa, wb = np.asarray(RT_a.rays.w_list), np.asarray(RT_b.rays.w_list)
    np.testing.assert_allclose(wa, wb, atol=1e-8)
    # live sections must agree tightly; dead outline-kill endpoints sit on
    # a box face after an O(10 mm) extra flight, where f32 rounding of
    # t·s differs between the component and vector forms by ~1e-4 (a
    # handful of rays; physics-identical: the weights above are equal)
    live = (wa > 0)[:, :, None]
    np.testing.assert_allclose(np.where(live, pa, 0.0),
                               np.where(live, pb, 0.0), rtol=5e-6, atol=2e-5)
    np.testing.assert_allclose(pa, pb, rtol=5e-6, atol=2e-3)
    assert (RT_a._msgs == RT_b._msgs).all()


def test_material_and_source_grads_keep_xla_scan(interpret_mode):
    """Gradients w.r.t. media (dispersion) or source-ray values leave the
    surface params concrete, so only the OPERANDS are diff-traced:
    eligibility must detect that and fall back to the XLA scan instead of
    dispatching pallas_call (which has no autodiff rules) — ADVICE r4 #3."""
    import jax
    import jax.numpy as jnp
    from optrace_tpu.tracer.trace_core import trace_bundle

    ot.global_options.pallas_trace = True
    RT = _build()
    RT.rays.init(RT.ray_sources, 512, len(RT.tracing_surfaces) + 2, True)
    steps = RT._build_steps()
    gen = RT._make_source_fn(512)
    p, s, pols, w, wl = gen(jax.random.PRNGKey(0))
    outline = tuple(float(v) for v in RT.outline)

    def loss_media(dn):
        def wrap(f):
            return None if f is None else (lambda wl_: f(wl_) + dn)
        steps_p = [st._replace(n1_fn=wrap(st.n1_fn), n2_fn=wrap(st.n2_fn))
                   for st in steps]
        out = trace_bundle(steps_p, RT.n0, outline, p, s, pols, w, wl,
                           True, False)
        # the end absorber zeroes the final w: weight by the last section
        # BEFORE it, positions at the absorber plane
        return jnp.sum(out["p"][:, -1, 0] ** 2 * out["w"][:, -2])

    g = jax.grad(loss_media)(jnp.float32(0.0))
    assert np.isfinite(float(g)) and float(g) != 0.0

    def loss_source(dx):
        p_shift = p + jnp.stack([dx, 0.0 * dx, 0.0 * dx])
        out = trace_bundle(steps, RT.n0, outline, p_shift, s, pols, w, wl,
                           True, False)
        return jnp.sum(out["p"][:, -1, 0] ** 2 * out["w"][:, -2])

    g2 = jax.grad(loss_source)(jnp.float32(0.0))
    assert np.isfinite(float(g2)) and float(g2) != 0.0
    ot.global_options.pallas_trace = False


def _build_asphere(no_pol=True):
    """The _build scene with an even-asphere front on the middle lens, so
    the widened kernel run covers asphere + conic + flat steps."""
    RT = ot.Raytracer(outline=[-10, 10, -10, 10, -10, 80], no_pol=no_pol)
    RT.add(ot.RaySource(ot.CircularSurface(r=1.5), divergence="Lambertian",
                        div_angle=8, pos=[0, 0, -5],
                        spectrum=ot.presets.light_spectrum.d65))
    n1 = ot.presets.refraction_index.BK7
    n2 = ot.presets.refraction_index.F2
    RT.add(ot.Lens(ot.SphericalSurface(r=3, R=20), ot.SphericalSurface(r=3, R=-25),
                   n=n1, pos=[0, 0, 0], d=1.0))
    RT.add(ot.Lens(ot.AsphericSurface(r=3, R=30, k=-0.5, coeff=[2e-4, -1e-6]),
                   ot.CircularSurface(r=3), n=n2, pos=[0, 0, 5], d=0.8))
    RT.add(ot.Lens(ot.SphericalSurface(r=3, R=15), ot.SphericalSurface(r=3, R=-15),
                   n=n1, pos=[0, 0, 10], d=1.2))
    RT.add(ot.Detector(ot.RectangularSurface(dim=[8, 8]), pos=[0, 0, 40]))
    return RT


@pytest.mark.parametrize("no_pol", [True, False])
def test_asphere_scene_parity(interpret_mode, no_pol):
    """Asphere-bearing scene: the widened kernel run (asphere handled
    in-kernel, VERDICT r4 #5) matches the default path (scan for conic
    runs, unrolled Newton solve for the asphere steps)."""
    N = 20000
    with ot.global_options.no_warnings(), ot.global_options.no_progress_bar():
        ot.global_options.pallas_trace = False
        RT_a = _build_asphere(no_pol)
        RT_a.trace(N)
        ot.global_options.pallas_trace = True
        RT_b = _build_asphere(no_pol)
        RT_b.trace(N)
        ot.global_options.pallas_trace = False

    pa, pb = np.asarray(RT_a.rays.p_list), np.asarray(RT_b.rays.p_list)
    np.testing.assert_allclose(pa, pb, rtol=5e-6, atol=5e-5)
    np.testing.assert_allclose(np.asarray(RT_a.rays.w_list),
                               np.asarray(RT_b.rays.w_list), atol=1e-8)
    assert (RT_a._msgs == RT_b._msgs).all()


@pytest.mark.parametrize("no_pol", [True, False])
def test_tilted_scene_parity(interpret_mode, no_pol):
    """Prism-style scene: a tilted glass plate BETWEEN lenses joins the
    kernel run (tilted planes are kernel-only kinds), so the whole chain
    stays in one launch — parity against the default path (scan for
    conic sub-runs, unrolled tilt steps)."""
    import numpy as np_

    def build():
        RT = ot.Raytracer(outline=[-10, 10, -10, 10, -10, 80], no_pol=no_pol)
        RT.add(ot.RaySource(ot.CircularSurface(r=1.5), divergence="Lambertian",
                            div_angle=8, pos=[0, 0, -5],
                            spectrum=ot.presets.light_spectrum.d65))
        n1 = ot.presets.refraction_index.BK7
        RT.add(ot.Lens(ot.SphericalSurface(r=3, R=20),
                       ot.SphericalSurface(r=3, R=-25),
                       n=n1, pos=[0, 0, 0], d=1.0))
        # tilted plate (small prism)
        th = 8.0
        tnf = [0.0, float(np_.sin(np_.radians(th))),
               float(np_.cos(np_.radians(th)))]
        RT.add(ot.Lens(ot.TiltedSurface(r=3, normal=tnf),
                       ot.TiltedSurface(r=3, normal=[0.0, 0.0, 1.0]),
                       n=ot.presets.refraction_index.F2,
                       pos=[0, 0, 5], d=1.5))
        RT.add(ot.Lens(ot.SphericalSurface(r=3, R=15),
                       ot.SphericalSurface(r=3, R=-15),
                       n=n1, pos=[0, 0, 10], d=1.2))
        RT.add(ot.Detector(ot.RectangularSurface(dim=[8, 8]), pos=[0, 0, 40]))
        return RT

    N = 20000
    with ot.global_options.no_warnings(), ot.global_options.no_progress_bar():
        ot.global_options.pallas_trace = False
        RT_a = build()
        RT_a.trace(N)
        ot.global_options.pallas_trace = True
        RT_b = build()
        RT_b.trace(N)
        ot.global_options.pallas_trace = False

    pa, pb = np.asarray(RT_a.rays.p_list), np.asarray(RT_b.rays.p_list)
    np.testing.assert_allclose(pa, pb, rtol=5e-6, atol=5e-5)
    np.testing.assert_allclose(np.asarray(RT_a.rays.w_list),
                               np.asarray(RT_b.rays.w_list), atol=1e-8)
    assert (RT_a._msgs == RT_b._msgs).all()


@pytest.mark.parametrize("no_pol", [True, False])
def test_aperture_fused_scene_parity(interpret_mode, no_pol):
    """A ring stop BETWEEN lens groups (the microscope/eye layout) joins
    the kernel run as a fused absorb step, so the whole chain traces in
    one launch. Parity must extend to the stored per-section refractive
    indices — the fused absorber's ambient-medium bookkeeping is the new
    piece (ambient = n2 chain of preceding refractions)."""
    def build():
        RT = ot.Raytracer(outline=[-10, 10, -10, 10, -10, 80], no_pol=no_pol)
        RT.add(ot.RaySource(ot.CircularSurface(r=1.5), divergence="Lambertian",
                            div_angle=8, pos=[0, 0, -5],
                            spectrum=ot.presets.light_spectrum.d65))
        n1 = ot.presets.refraction_index.BK7
        RT.add(ot.Lens(ot.SphericalSurface(r=3, R=20),
                       ot.SphericalSurface(r=3, R=-25),
                       n=n1, pos=[0, 0, 0], d=1.0, n2=n1))  # glass gap after
        RT.add(ot.Aperture(ot.RingSurface(r=3, ri=1.0), pos=[0, 0, 5]))
        RT.add(ot.Lens(ot.SphericalSurface(r=3, R=15),
                       ot.SphericalSurface(r=3, R=-15),
                       n=ot.presets.refraction_index.F2, pos=[0, 0, 10],
                       d=1.2))
        RT.add(ot.Detector(ot.RectangularSurface(dim=[8, 8]), pos=[0, 0, 40]))
        return RT

    N = 20000
    with ot.global_options.no_warnings(), ot.global_options.no_progress_bar():
        ot.global_options.pallas_trace = False
        RT_a = build()
        RT_a.trace(N)
        ot.global_options.pallas_trace = True
        ot.global_options.pallas_fuse_planar = True   # opt-in fusion
        try:
            RT_b = build()
            RT_b.trace(N)
        finally:
            ot.global_options.pallas_fuse_planar = False
            ot.global_options.pallas_trace = False

    pa, pb = np.asarray(RT_a.rays.p_list), np.asarray(RT_b.rays.p_list)
    np.testing.assert_allclose(pa, pb, rtol=5e-6, atol=5e-5)
    np.testing.assert_allclose(np.asarray(RT_a.rays.w_list),
                               np.asarray(RT_b.rays.w_list), atol=1e-8)
    # section-wise refractive indices: the stop's section must report the
    # surrounding glass (n2 of the previous lens), not vacuum
    na, nb = np.asarray(RT_a.rays.n_list), np.asarray(RT_b.rays.n_list)
    np.testing.assert_allclose(na, nb, atol=1e-6)
    assert na[:, 3].mean() > 1.4        # ambient at the stop is the glass
    assert (RT_a._msgs == RT_b._msgs).all()


def test_asphere_media_grad_repartition(interpret_mode):
    """Traced media over an asphere-widened scene: eligibility fails at
    dispatch (operand tracers), the run must repartition (conic sub-runs
    scan, asphere steps unroll) and still produce a finite, nonzero
    gradient."""
    import jax
    import jax.numpy as jnp
    from optrace_tpu.tracer.trace_core import trace_bundle

    ot.global_options.pallas_trace = True
    RT = _build_asphere()
    RT.rays.init(RT.ray_sources, 512, len(RT.tracing_surfaces) + 2, True)
    steps = RT._build_steps()
    gen = RT._make_source_fn(512)
    p, s, pols, w, wl = gen(jax.random.PRNGKey(0))
    outline = tuple(float(v) for v in RT.outline)

    def loss_media(dn):
        def wrap(f):
            return None if f is None else (lambda wl_: f(wl_) + dn)
        steps_p = [st._replace(n1_fn=wrap(st.n1_fn), n2_fn=wrap(st.n2_fn))
                   for st in steps]
        out = trace_bundle(steps_p, RT.n0, outline, p, s, pols, w, wl,
                           True, False)
        return jnp.sum(out["p"][:, -1, 0] ** 2 * out["w"][:, -2])

    g = jax.grad(loss_media)(jnp.float32(0.0))
    assert np.isfinite(float(g)) and float(g) != 0.0
    ot.global_options.pallas_trace = False


def test_chunked_dispatch_with_kernel_kinds(interpret_mode, monkeypatch):
    """Tiny PALLAS_RUN_CHUNK forces chunk boundaries THROUGH the widened
    run (asphere mid-run): state threading across launches must stay
    exact with heterogeneous step kinds, not just conics."""
    import optrace_tpu.tracer.trace_core as tc

    monkeypatch.setattr(tc, "PALLAS_RUN_CHUNK", 2)
    N = 15000
    with ot.global_options.no_warnings(), ot.global_options.no_progress_bar():
        ot.global_options.pallas_trace = False
        RT_a = _build_asphere()
        RT_a.trace(N)
        ot.global_options.pallas_trace = True
        RT_b = _build_asphere()
        RT_b.trace(N)
        ot.global_options.pallas_trace = False

    pa, pb = np.asarray(RT_a.rays.p_list), np.asarray(RT_b.rays.p_list)
    np.testing.assert_allclose(pa, pb, rtol=5e-6, atol=5e-5)
    np.testing.assert_allclose(np.asarray(RT_a.rays.w_list),
                               np.asarray(RT_b.rays.w_list), atol=1e-8)
    assert (RT_a._msgs == RT_b._msgs).all()


def test_pol_path_matches_xla_scan(interpret_mode):
    """Full polarization transport through the kernel (s/p decomposition,
    A_ts/A_tp Fresnel weights) matches the XLA scan."""
    N = 20000
    with ot.global_options.no_warnings(), ot.global_options.no_progress_bar():
        ot.global_options.pallas_trace = False
        RT_a = _build(with_flats=True)
        RT_a.no_pol = False
        RT_a.trace(N)
        ot.global_options.pallas_trace = True
        RT_b = _build(with_flats=True)
        RT_b.no_pol = False
        RT_b.trace(N)
        ot.global_options.pallas_trace = False

    pa, pb = np.asarray(RT_a.rays.p_list), np.asarray(RT_b.rays.p_list)
    qa, qb = np.asarray(RT_a.rays.pol_list), np.asarray(RT_b.rays.pol_list)
    np.testing.assert_allclose(pa, pb, rtol=5e-6, atol=2e-5)
    np.testing.assert_allclose(np.asarray(RT_a.rays.w_list),
                               np.asarray(RT_b.rays.w_list), atol=1e-8)
    np.testing.assert_allclose(np.nan_to_num(qa), np.nan_to_num(qb), atol=1e-5)
    assert (RT_a._msgs == RT_b._msgs).all()
