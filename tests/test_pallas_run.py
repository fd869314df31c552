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
