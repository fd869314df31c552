"""Sharded render + checkpoint/resume tests."""

import numpy as np
import jax
import pytest

import optrace_tpu as ot
from optrace_tpu.parallel import make_fused_render, RenderCheckpoint


def simple_rt():
    RT = ot.Raytracer(outline=[-5, 5, -5, 5, -10, 60], no_pol=True)
    RT.add(ot.RaySource(ot.CircularSurface(r=1), pos=[0, 0, -5], divergence="None",
                        spectrum=ot.LightSpectrum("Monochromatic", wl=550)))
    RT.add(ot.IdealLens(r=3, D=50, pos=[0, 0, 0]))
    RT.add(ot.Detector(ot.RectangularSurface(dim=[4, 4]), pos=[0, 0, 10]))
    return RT


class TestCheckpoint:

    def test_resume_is_exact(self, tmp_path):
        RT = simple_rt()
        render, _ = make_fused_render(RT, 2048, extent=[-2, 2, -2, 2], Nx=63, Ny=63)
        step = jax.jit(render)
        path = str(tmp_path / "r.ckpt.npz")

        # run 1: all 6 batches in one go
        ck1 = RenderCheckpoint(str(tmp_path / "full.npz"), total_batches=6)
        for i in ck1.remaining():
            ck1.add(step(ck1.key(i)))
        full = ck1.image()

        # run 2: interrupt after 3 batches, save, resume in a new object
        ck2 = RenderCheckpoint(path, total_batches=6)
        for i in range(3):
            ck2.add(step(ck2.key(i)))
        ck2.save()

        ck3 = RenderCheckpoint(path, total_batches=6)
        assert ck3.done == 3
        for i in ck3.remaining():
            ck3.add(step(ck3.key(i)))
        resumed = ck3.image()

        np.testing.assert_allclose(resumed, full, rtol=1e-6)
        # power: each batch carries 1 W, scaled by 1/total
        assert resumed[:, :, 3].sum() == pytest.approx(1.0, abs=1e-3)

    def test_mismatched_config_rejected(self, tmp_path):
        path = str(tmp_path / "r.npz")
        ck = RenderCheckpoint(path, total_batches=4)
        ck.add(np.zeros((8, 8, 4)))
        ck.save()
        with pytest.raises(ValueError):
            RenderCheckpoint(path, total_batches=5)

    def test_sorted_binning_matches_scatter(self):
        from optrace_tpu.ops import binning
        rng = np.random.default_rng(1)
        N = 20000
        px = rng.uniform(-1.2, 1.2, N).astype(np.float32)
        py = rng.uniform(-1.2, 1.2, N).astype(np.float32)
        w = rng.uniform(0, 1, N).astype(np.float32)
        wl = rng.uniform(400, 700, N).astype(np.float32)
        ext = (-1.0, 1.0, -1.0, 1.0)
        a = np.asarray(binning.bin_xyzw(px, py, w, wl, 95, 95, ext))
        b = np.asarray(binning.bin_xyzw_sorted(px, py, w, wl, 95, 95, ext))
        np.testing.assert_allclose(a, b, atol=1e-2)
        assert a.sum() == pytest.approx(b.sum(), rel=1e-6)
