"""Trace engine tests with analytic oracles.

Models the reference's physically-correct-results philosophy (SURVEY.md §4):
ideal lens focuses at the analytic focal distance, Fresnel losses match the
normal-incidence formula, prisms disperse, filters attenuate, apertures
block, energy is conserved.
"""

import numpy as np
import jax
import pytest

import optrace_tpu as ot


def make_rt(outline=(-5, 5, -5, 5, -10, 60), **kwargs):
    return ot.Raytracer(outline=list(outline), **kwargs)


def mono_source(pos=(0, 0, -5), r=1.0, wl=550.0, **kwargs):
    return ot.RaySource(ot.CircularSurface(r=r), pos=list(pos),
                        spectrum=ot.LightSpectrum("Monochromatic", wl=wl), **kwargs)


class TestIdealLens:

    def test_focus_at_f(self):
        RT = make_rt()
        RT.add(mono_source(divergence="None"))
        RT.add(ot.IdealLens(r=3, D=50, pos=[0, 0, 0]))    # f = 20 mm
        RT.trace(20000)
        res, fdict = RT.focus_search("RMS Spot Size", z_start=10)
        assert abs(res.x - 20.0) < 1e-3
        assert res.fun < 1e-5
        assert fdict["N"] == 20000

    def test_imaging_equation(self):
        # object at g=40 -> image at b: 1/f = 1/g + 1/b, f=20 -> b=40
        RT = make_rt(outline=(-5, 5, -5, 5, -45, 60))
        RT.add(ot.RaySource(ot.Point(), pos=[0, 0, -40], divergence="Isotropic",
                            div_angle=2.0,
                            spectrum=ot.LightSpectrum("Monochromatic", wl=550)))
        RT.add(ot.IdealLens(r=3, D=50, pos=[0, 0, 0]))
        RT.trace(20000)
        res, _ = RT.focus_search("RMS Spot Size", z_start=10)
        assert abs(res.x - 40.0) < 0.05

    def test_detector_power_conserved(self):
        RT = make_rt()
        RT.add(mono_source(divergence="None"))
        RT.add(ot.IdealLens(r=3, D=50, pos=[0, 0, 0]))
        RT.add(ot.Detector(ot.RectangularSurface(dim=[4, 4]), pos=[0, 0, 20]))
        RT.trace(10000)
        img = RT.detector_image()
        assert abs(img.power() - 1.0) < 1e-4


class TestRefraction:

    def test_fresnel_normal_incidence(self):
        RT = make_rt(outline=(-5, 5, -5, 5, -10, 100))
        RT.add(mono_source(r=0.5, divergence="None"))
        n = ot.RefractionIndex("Constant", n=1.5)
        RT.add(ot.Lens(ot.SphericalSurface(r=3, R=200), ot.SphericalSurface(r=3, R=-200),
                       n=n, pos=[0, 0, 0], d=1.0))
        RT.trace(10000)
        w = RT.rays.w_list
        T_expect = (1 - ((1.5 - 1) / (1.5 + 1)) ** 2) ** 2
        assert abs(w[:, 2].sum() / w[:, 0].sum() - T_expect) < 1e-3

    def test_real_lens_focal_length(self):
        # thick-lens focal length via lensmaker equation
        RT = make_rt(outline=(-5, 5, -5, 5, -10, 100))
        RT.add(mono_source(r=0.3, divergence="None"))
        n_val, R1, R2, d = 1.5, 20.0, -20.0, 1.0
        n = ot.RefractionIndex("Constant", n=n_val)
        RT.add(ot.Lens(ot.SphericalSurface(r=3, R=R1), ot.SphericalSurface(r=3, R=R2),
                       n=n, pos=[0, 0, 0], d=d))
        RT.trace(20000)
        res, _ = RT.focus_search("RMS Spot Size", z_start=10)
        # efl from lensmaker, bfl measured from back vertex at z=+d/2
        efl = 1 / ((n_val - 1) * (1 / R1 - 1 / R2 + (n_val - 1) * d / (n_val * R1 * R2)))
        bfl = efl * (1 + (n_val - 1) * d / (n_val * R2))
        z_focus_expect = d / 2 + bfl
        assert abs(res.x - z_focus_expect) < 0.15

    def test_tir_absorbed(self):
        # steep rays from inside glass to air undergo TIR
        RT = make_rt(outline=(-20, 20, -20, 20, -10, 100))
        n_glass = ot.RefractionIndex("Constant", n=1.8)
        RT.n0 = n_glass
        RT.add(mono_source(r=0.2, divergence="None", s_sph=[50, 90]))  # 50 deg tilt
        n_air = ot.RefractionIndex("Constant", n=1.0)
        RT.add(ot.Lens(ot.CircularSurface(r=15), ot.CircularSurface(r=15),
                       n=n_air, pos=[0, 0, 5], d=1.0, n2=n_air))
        with ot.global_options.no_warnings():
            RT.trace(5000)
        # sin(50°)*1.8 = 1.38 > 1 -> TIR at first surface
        assert RT._msgs[int(RT.INFOS.TIR)].sum() == 5000

    def test_prism_dispersion(self):
        bk7 = ot.RefractionIndex("Sellmeier1",
                                 coeff=[1.03961212, 0.00600069867, 0.231792344,
                                        0.0200179144, 1.01046945, 103.560653])
        RT = make_rt(outline=(-20, 20, -20, 20, -10, 60))
        RT.add(ot.RaySource(ot.Point(), pos=[0, 0, -5], divergence="None",
                            spectrum=ot.presets.light_spectrum.d65))
        front = ot.TiltedSurface(r=4, normal=[0, -0.15, float(np.sqrt(1 - 0.15 ** 2))])
        back = ot.TiltedSurface(r=4, normal=[0, 0.15, float(np.sqrt(1 - 0.15 ** 2))])
        RT.add(ot.Lens(front, back, n=bk7, pos=[0, 0, 5], d=2.5))
        RT.add(ot.Detector(ot.RectangularSurface(dim=[40, 40]), pos=[0, 0, 50]))
        RT.trace(20000)
        ph, w, wl, *_ = RT._hit_detector("t", 0)
        blue = wl < 480
        red = wl > 640
        # blue refracts more strongly -> deflected further down
        assert ph[blue, 1].mean() < ph[red, 1].mean() - 0.05


class TestFilterAperture:

    def test_filter_attenuation(self):
        RT = make_rt()
        RT.add(mono_source(divergence="None", wl=550))
        spec = ot.TransmissionSpectrum("Constant", val=0.25)
        RT.add(ot.Filter(ot.CircularSurface(r=3), pos=[0, 0, 5], spectrum=spec))
        RT.trace(5000)
        w = RT.rays.w_list
        assert abs(w[:, 1].sum() / w[:, 0].sum() - 0.25) < 1e-5

    def test_gaussian_filter_wavelength_dependent(self):
        RT = make_rt()
        RT.add(ot.RaySource(ot.CircularSurface(r=1), pos=[0, 0, -5], divergence="None",
                            spectrum=ot.LightSpectrum("Constant")))
        spec = ot.TransmissionSpectrum("Gaussian", mu=550, sig=30, val=1.0)
        RT.add(ot.Filter(ot.CircularSurface(r=3), pos=[0, 0, 5], spectrum=spec))
        RT.trace(20000)
        w1 = RT.rays.w_list[:, 1]
        wl = RT.rays.wl_list
        T_expect = np.exp(-(wl - 550.0) ** 2 / (2 * 30.0 ** 2))
        w0 = RT.rays.w_list[:, 0]
        np.testing.assert_allclose(w1, w0 * T_expect, rtol=1e-3, atol=1e-9)

    def test_aperture_blocks(self):
        RT = make_rt()
        RT.add(mono_source(r=2.0, divergence="None"))
        RT.add(ot.Aperture(ot.RingSurface(r=3, ri=1.0), pos=[0, 0, 5]))
        RT.trace(20000)
        w = RT.rays.w_list
        p0 = RT.rays.p_list[:, 0]
        r0 = np.hypot(p0[:, 0], p0[:, 1])
        # rays inside the opening survive, rays on the annulus are absorbed
        assert np.all(w[r0 < 0.99, 1] > 0)
        assert np.all(w[r0 > 1.01, 1] == 0)

    def test_outline_absorption(self):
        RT = make_rt(outline=(-2, 2, -2, 2, -10, 60))
        RT.add(mono_source(r=0.2, divergence="None", s_sph=[30, 0]))
        with ot.global_options.no_warnings():
            RT.trace(5000)
        assert RT._msgs[int(RT.INFOS.OUTLINE_INTERSECTION)].sum() == 5000
        # absorbed at the box
        assert np.all(RT.rays.p_list[:, -1, 0] <= 2.0 + 1e-5)


class TestImagesSpectra:

    def test_detector_spectrum_monochromatic(self):
        RT = make_rt()
        RT.add(mono_source(divergence="None", wl=633))
        RT.add(ot.Detector(ot.RectangularSurface(dim=[4, 4]), pos=[0, 0, 20]))
        RT.trace(5000)
        spec = RT.detector_spectrum()
        assert abs(spec.peak_wavelength() - 633) < 2

    def test_source_image_extent(self):
        RT = make_rt()
        RT.add(mono_source(r=1.0, divergence="None"))
        RT.add(ot.Detector(ot.RectangularSurface(dim=[4, 4]), pos=[0, 0, 20]))
        RT.trace(5000)
        img = RT.source_image()
        assert img.power() == pytest.approx(1.0, abs=1e-5)
        np.testing.assert_allclose(img.extent, [-1, 1, -1, 1], atol=1e-6)

    def test_two_sources_power_split(self):
        RT = make_rt()
        RT.add(mono_source(r=0.5, divergence="None", power=2.0))
        RT.add(mono_source(pos=(0.5, 0, -5), r=0.3, divergence="None", power=1.0))
        RT.add(ot.Detector(ot.RectangularSurface(dim=[4, 4]), pos=[0, 0, 20]))
        RT.trace(30000)
        # rays apportioned ~2:1
        assert abs(RT.rays.N_list[0] / RT.rays.N_list[1] - 2.0) < 0.1
        img0 = RT.detector_image(source_index=0)
        img1 = RT.detector_image(source_index=1)
        assert img0.power() == pytest.approx(2.0, abs=1e-3)
        assert img1.power() == pytest.approx(1.0, abs=1e-3)

    def test_iterative_render_matches_single(self):
        RT = make_rt()
        RT.add(mono_source(divergence="None"))
        RT.add(ot.IdealLens(r=3, D=50, pos=[0, 0, 0]))
        RT.add(ot.Detector(ot.RectangularSurface(dim=[4, 4]), pos=[0, 0, 10]))
        RT.ITER_RAYS_STEP = 5000
        imgs = RT.iterative_render(10000, extent=[-2, 2, -2, 2])
        assert len(imgs) == 1
        assert imgs[0].power() == pytest.approx(1.0, abs=1e-3)

    def test_spherical_detector_projection(self):
        RT = make_rt(outline=(-10, 10, -10, 10, -10, 60))
        RT.add(mono_source(r=1.0, divergence="None"))
        RT.add(ot.Detector(ot.SphericalSurface(r=5, R=-20), pos=[0, 0, 30]))
        RT.trace(5000)
        img = RT.detector_image(projection_method="Equidistant")
        assert img.projection == "Equidistant"
        assert img.power() > 0.99

    def test_detector_hit_residual_f64(self):
        """The host-API hit solve consumes the stored f64 sections at full
        precision: residual |sag(x,y) − (z−z0)| of every spherical-detector
        hit must sit at f64 rounding scale, far below f32 resolution."""
        RT = make_rt(outline=(-10, 10, -10, 10, -10, 60))
        RT.add(mono_source(r=2.0, divergence="Lambertian", div_angle=5))
        RT.add(ot.Detector(ot.SphericalSurface(r=5, R=-20), pos=[0, 0, 30]))
        RT.trace(20000)
        ph, w, wl, *_ = RT._hit_detector("t", 0, projection_method=None)
        assert ph.dtype == np.float64 and len(ph) > 1000
        dsurf = RT.detectors[0].surface
        R, z0 = -20.0, float(dsurf.pos[2])
        r2 = ph[:, 0] ** 2 + ph[:, 1] ** 2
        sag = r2 / (-R) / (1 + np.sqrt(1 - r2 / R ** 2))
        resid = np.abs((ph[:, 2] - z0) + sag)
        # f32 would leave ~ulp(30 mm) ≈ 2e-6 mm; f64 is ~1e-14 mm
        assert resid.max() < 1e-9


class TestErrors:

    def test_no_source(self):
        RT = make_rt()
        with ot.global_options.no_warnings():
            RT.trace(1000)
        assert RT.geometry_error

    def test_no_detector(self):
        RT = make_rt()
        RT.add(mono_source())
        RT.trace(1000)
        with pytest.raises(RuntimeError):
            RT.detector_image()

    def test_untraced(self):
        RT = make_rt()
        RT.add(mono_source())
        RT.add(ot.Detector(ot.RectangularSurface(dim=[4, 4]), pos=[0, 0, 20]))
        with pytest.raises(RuntimeError):
            RT.detector_image()

    def test_invalid_n(self):
        RT = make_rt()
        RT.add(mono_source())
        with pytest.raises(ValueError):
            RT.trace(0)

    def test_element_outside_outline(self):
        RT = make_rt()
        RT.add(mono_source())
        RT.add(ot.IdealLens(r=3, D=50, pos=[0, 0, 100]))   # outside z-outline
        with ot.global_options.no_warnings():
            RT.trace(1000)
        assert RT.geometry_error

    def test_collision_detection(self):
        RT = make_rt()
        RT.add(mono_source())
        # two lenses intersecting each other
        n = ot.RefractionIndex("Constant", n=1.5)
        RT.add(ot.Lens(ot.SphericalSurface(r=3, R=10), ot.SphericalSurface(r=3, R=-10),
                       n=n, pos=[0, 0, 5], d=0.5))
        RT.add(ot.Lens(ot.SphericalSurface(r=3, R=10), ot.SphericalSurface(r=3, R=-10),
                       n=n, pos=[0, 0, 5.2], d=0.5))
        with ot.global_options.no_warnings():
            RT.trace(1000)
        assert RT.geometry_error

    def test_geometry_change_detection(self):
        RT = make_rt()
        RT.add(mono_source(divergence="None"))
        det = ot.Detector(ot.RectangularSurface(dim=[4, 4]), pos=[0, 0, 20])
        RT.add(det)
        RT.trace(1000)
        assert RT.check_if_rays_are_current()
        RT.add(ot.IdealLens(r=3, D=50, pos=[0, 0, 5]))
        assert not RT.check_if_rays_are_current()
        with pytest.raises(RuntimeError):
            RT.detector_image()


class TestSharded:

    def test_sharded_render_matches_single(self):
        from optrace_tpu.parallel import make_sharded_render, make_fused_render, default_mesh
        RT = make_rt()
        RT.add(mono_source(divergence="None"))
        RT.add(ot.IdealLens(r=3, D=50, pos=[0, 0, 0]))
        RT.add(ot.Detector(ot.RectangularSurface(dim=[4, 4]), pos=[0, 0, 10]))

        mesh = default_mesh()
        n_dev = mesh.devices.size
        assert n_dev == 8, "conftest should provide 8 virtual CPU devices"

        N = 8 * 2048
        run, ext = make_sharded_render(RT, N, mesh=mesh, extent=[-2, 2, -2, 2],
                                       Nx=63, Ny=63)
        img = np.asarray(run(jax.random.PRNGKey(0)))
        assert img.shape == (63, 63, 4)
        assert img[:, :, 3].sum() == pytest.approx(1.0, abs=1e-3)

        # single-device fused render of same N: statistically equal power
        render_one, _ = make_fused_render(RT, N, extent=[-2, 2, -2, 2], Nx=63, Ny=63)
        img1 = np.asarray(jax.jit(render_one)(jax.random.PRNGKey(1)))
        assert img1[:, :, 3].sum() == pytest.approx(img[:, :, 3].sum(), rel=1e-3)
