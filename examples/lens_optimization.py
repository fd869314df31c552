#!/usr/bin/env python3
"""Gradient-based lens design: optimize a singlet's curvatures with
jax.grad through the full trace + detector render.

The capability the reference lacks entirely (pure NumPy, no autodiff):
the parameterized render (tracer/diff.py) re-exposes every surface
parameter as a traced input, so a spot-size loss differentiates w.r.t.
the front/back curvature. A dozen Adam-style steps turn a deliberately
detuned biconvex lens into a best-form singlet for its conjugates.

Gradient correctness for this pipeline is pinned against finite
differences in tests/test_autodiff_matrix.py.
"""

import numpy as np
import matplotlib
import matplotlib.pyplot as plt

import jax
import jax.numpy as jnp

import optrace_tpu as ot
from optrace_tpu.tracer.diff import make_parameterized_render, spot_loss

# --- a deliberately detuned singlet ------------------------------------
RT = ot.Raytracer(outline=[-6, 6, -6, 6, -10, 60], no_pol=True)
RT.add(ot.RaySource(ot.CircularSurface(r=1.5), divergence="None",
                    spectrum=ot.LightSpectrum("Monochromatic", wl=550),
                    pos=[0, 0, -5]))
n = ot.RefractionIndex("Constant", n=1.5)
RT.add(ot.Lens(ot.SphericalSurface(r=3, R=28.0),      # start: symmetric
               ot.SphericalSurface(r=3, R=-28.0),     # biconvex, defocused
               n=n, pos=[0, 0, 0], d=1.0))
RT.add(ot.Detector(ot.RectangularSurface(dim=[4, 4]), pos=[0, 0, 25]))

N_RAYS = 4096
EXT = (-2.0, 2.0, -2.0, 2.0)

render, params0 = make_parameterized_render(RT, N_RAYS, extent=EXT,
                                            Nx=63, Ny=63)
loss_fn = spot_loss(render)
key = jax.random.PRNGKey(0)


def loss_of_rhos(rhos):
    """Spot RMS as a function of the two surface curvatures."""
    params = [dict(p) for p in params0]
    params[0] = dict(params[0], rho=rhos[0])
    params[1] = dict(params[1], rho=rhos[1])
    return loss_fn(params, key, EXT)


if __name__ == "__main__":
    matplotlib.use("Agg")
    vg = jax.jit(jax.value_and_grad(loss_of_rhos))

    rhos = jnp.asarray([float(params0[0]["rho"]), float(params0[1]["rho"])])
    history = []
    lr = 3e-4
    for i in range(15):
        val, g = vg(rhos)
        history.append(float(val))
        # normalized-gradient step: robust to the loss's curvature scale
        rhos = rhos - lr * g / jnp.maximum(jnp.linalg.norm(g), 1e-9)
        print(f"step {i:2d}: spot RMS {float(val)*1e3:7.2f} µm   "
              f"R = {1/float(rhos[0]):+.2f} / {1/float(rhos[1]):+.2f} mm")
    final, _ = vg(rhos)
    history.append(float(final))
    print(f"spot RMS {history[0]*1e3:.2f} -> {history[-1]*1e3:.2f} µm")
    assert history[-1] < history[0]

    # before/after spot images + convergence curve
    img0 = np.asarray(render(params0, key))[:, :, 3]
    params1 = [dict(p) for p in params0]
    params1[0] = dict(params1[0], rho=float(rhos[0]))
    params1[1] = dict(params1[1], rho=float(rhos[1]))
    img1 = np.asarray(render(params1, key))[:, :, 3]

    fig, axs = plt.subplots(1, 3, figsize=(12, 3.6))
    for ax, im, title in [(axs[0], img0, "start"), (axs[1], img1, "optimized")]:
        ax.imshow(im, extent=EXT, origin="lower", cmap="inferno")
        ax.set_title(f"{title} spot")
        ax.set_xlabel("x / mm")
    axs[2].plot(np.arange(len(history)), 1e3 * np.asarray(history), "o-")
    axs[2].set_xlabel("step")
    axs[2].set_ylabel("spot RMS / µm")
    axs[2].set_title("convergence")
    fig.tight_layout()
    fig.savefig("lens_optimization.png", dpi=110)
    print("saved lens_optimization.png")
