"""Design-gradient validation: autodiff through the full trace vs finite
differences (BASELINE.json north star)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import optrace_tpu as ot
from optrace_tpu.tracer.diff import make_parameterized_render, spot_loss


def build_rt(R=20.0):
    RT = ot.Raytracer(outline=[-5, 5, -5, 5, -10, 60], no_pol=True)
    RT.add(ot.RaySource(ot.CircularSurface(r=1.0), pos=[0, 0, -5], divergence="None",
                        spectrum=ot.LightSpectrum("Monochromatic", wl=550)))
    n = ot.RefractionIndex("Constant", n=1.5)
    RT.add(ot.Lens(ot.SphericalSurface(r=3, R=R), ot.SphericalSurface(r=3, R=-R),
                   n=n, pos=[0, 0, 0], d=1.0))
    RT.add(ot.Detector(ot.RectangularSurface(dim=[4, 4]), pos=[0, 0, 21]))
    return RT


class TestDesignGradients:

    def test_grad_matches_finite_difference(self):
        """d(spot radius)/d(curvature) via autodiff == finite differences.

        The same random key is used for all evaluations, so the Monte-Carlo
        noise cancels in the comparison (common random numbers).
        """
        RT = build_rt()
        ext = [-2, 2, -2, 2]
        render, params0 = make_parameterized_render(RT, 4096, extent=ext, Nx=63, Ny=63)
        loss = spot_loss(render)
        key = jax.random.PRNGKey(0)

        def loss_of_rho(rho):
            params = jax.tree_util.tree_map(lambda x: x, params0)
            params[0] = dict(params[0], rho=rho)
            return loss(params, key, ext)

        rho0 = params0[0]["rho"]
        g_auto = float(jax.grad(loss_of_rho)(rho0))

        eps = 1e-4
        f_p = float(loss_of_rho(rho0 + eps))
        f_m = float(loss_of_rho(rho0 - eps))
        g_fd = (f_p - f_m) / (2 * eps)

        assert np.isfinite(g_auto)
        assert g_auto == pytest.approx(g_fd, rel=2e-2)

    def test_grad_position(self):
        """gradient w.r.t. the lens z-position is finite and nonzero"""
        RT = build_rt()
        ext = [-2, 2, -2, 2]
        render, params0 = make_parameterized_render(RT, 2048, extent=ext, Nx=63, Ny=63)
        loss = spot_loss(render)
        key = jax.random.PRNGKey(1)

        def loss_of_dz(dz):
            params = [dict(p) for p in params0]
            params[0] = dict(params[0], pos=params0[0]["pos"] + jnp.array([0, 0, 1.0]) * dz)
            params[1] = dict(params[1], pos=params0[1]["pos"] + jnp.array([0, 0, 1.0]) * dz)
            return loss(params, key, ext)

        g = float(jax.grad(loss_of_dz)(jnp.float32(0.0)))
        assert np.isfinite(g)
        assert abs(g) > 1e-5

    def test_gradient_descent_improves_focus(self):
        """a few gradient steps on the curvature reduce the spot size ­—
        the differentiable-lens-design loop works end to end"""
        RT = build_rt(R=24.0)    # start away from the optimum
        ext = [-2, 2, -2, 2]
        render, params0 = make_parameterized_render(RT, 4096, extent=ext, Nx=63, Ny=63)
        loss = spot_loss(render)
        key = jax.random.PRNGKey(2)

        def loss_of_rho(rho):
            params = [dict(p) for p in params0]
            params[0] = dict(params[0], rho=rho)
            params[1] = dict(params[1], rho=-rho)
            return loss(params, key, ext)

        vg = jax.jit(jax.value_and_grad(loss_of_rho))
        rho = params0[0]["rho"]
        l0, _ = vg(rho)
        for _ in range(12):
            l, g = vg(rho)
            rho = rho - 2e-4 * jnp.sign(g) * jnp.minimum(jnp.abs(g) * 1e-2, 1.0)
        l_end, _ = vg(rho)
        assert float(l_end) < float(l0)
