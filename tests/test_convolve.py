"""PSF convolution tests (reference test_convolve.py strategy)."""

import numpy as np
import pytest

import optrace_tpu as ot
from optrace_tpu import convolve
from optrace_tpu.presets import psf as psf_presets


def gray_img(n=64, s=(2, 2)):
    img = np.zeros((n, n))
    img[n // 2 - 4:n // 2 + 4, n // 2 - 4:n // 2 + 4] = 1.0
    return ot.GrayscaleImage(img, s=list(s))


class TestConvolve:

    def test_gray_gray(self):
        with ot.global_options.no_warnings():
            out = convolve(gray_img(), psf_presets.gaussian(sig=2.0))
        assert isinstance(out, ot.GrayscaleImage)
        assert out.data.max() == pytest.approx(1.0, abs=1e-6)

    def test_identity_like_psf(self):
        """convolution with a near-delta PSF keeps the image structure"""
        img = gray_img(n=101)
        with ot.global_options.no_warnings():
            out = convolve(img, psf_presets.gaussian(sig=0.05), keep_size=True)
        assert out.shape[:2] == img.shape[:2]
        # center stays bright, corners stay dark
        assert out.data[50, 50] > 0.9
        assert out.data[3, 3] < 0.05

    def test_rgb_gray(self):
        rng = np.random.default_rng(0)
        img = ot.RGBImage(rng.uniform(0, 1, (64, 64, 3)), s=[2, 2])
        with ot.global_options.no_warnings():
            out = convolve(img, psf_presets.gaussian(sig=1.0))
        assert isinstance(out, ot.RGBImage)
        assert out.shape[2] == 3

    def test_magnification_flip(self):
        img_arr = np.zeros((64, 64))
        img_arr[10:20, 5:15] = 1.0       # off-center blob
        img = ot.GrayscaleImage(img_arr, s=[2, 2])
        with ot.global_options.no_warnings():
            out_p = convolve(img, psf_presets.gaussian(sig=0.3), m=1)
            out_n = convolve(img, psf_presets.gaussian(sig=0.3), m=-1)
        # m=-1 flips the image: centers of mass mirror around the center
        d_p, d_n = out_p.data, out_n.data

        def com(d):
            ys, xs = np.mgrid[:d.shape[0], :d.shape[1]]
            return np.array([np.sum(ys * d), np.sum(xs * d)]) / d.sum()

        com_p, com_n = com(d_p), com(d_n)
        assert abs((d_p.shape[0] - 1 - com_p[0]) - com_n[0]) <= 1
        assert abs((d_p.shape[1] - 1 - com_p[1]) - com_n[1]) <= 1

    def test_m_scales_extent(self):
        img = gray_img(s=(2, 2))
        with ot.global_options.no_warnings():
            out1 = convolve(img, psf_presets.gaussian(sig=0.5), m=1)
            out2 = convolve(img, psf_presets.gaussian(sig=0.5), m=2)
        assert out2.s[0] > 1.9 * out1.s[0]

    def test_keep_size(self):
        img = gray_img(n=80)
        with ot.global_options.no_warnings():
            out = convolve(img, psf_presets.gaussian(sig=0.5), keep_size=True)
        assert out.shape[:2] == (80, 80)

    def test_color_psf_render_image(self):
        # gray image + colored RenderImage PSF -> RGB
        ri = ot.RenderImage(extent=[-0.01, 0.01, -0.01, 0.01])
        rng = np.random.default_rng(1)
        p = rng.normal(0, 0.002, (5000, 2))
        p3 = np.column_stack([p, np.zeros(5000)])
        wl = rng.uniform(450, 650, 5000).astype(np.float32)
        w = np.full(5000, 1e-3, dtype=np.float32)
        ri.render(p3, w, wl)
        with ot.global_options.no_warnings():
            out = convolve(gray_img(n=101), ri)
        assert isinstance(out, ot.RGBImage)

    def test_errors(self):
        img = gray_img()
        with pytest.raises(ValueError):
            convolve(img, psf_presets.gaussian(0.5), m=0)
        # psf larger than twice the image
        big_psf = psf_presets.gaussian(sig=2000.0)
        with pytest.raises(ValueError):
            with ot.global_options.no_warnings():
                convolve(img, big_psf)
        with pytest.raises(TypeError):
            convolve(img, [1, 2, 3])


def wide_psf(s=0.5, n=64, sig_frac=0.15):
    """Gaussian PSF with a physically wide extent (default 0.5 mm) so that
    padding/border effects span many image pixels."""
    x = np.linspace(-1, 1, n)
    X, Y = np.meshgrid(x, x)
    Z = np.exp(-(X ** 2 + Y ** 2) / (2 * sig_frac ** 2))
    return ot.GrayscaleImage(Z, s=[s, s])


def color_psf(seed=1, extent=0.01, n=5000):
    """Small colored RenderImage PSF."""
    ri = ot.RenderImage(extent=[-extent, extent, -extent, extent])
    rng = np.random.default_rng(seed)
    p = np.column_stack([rng.normal(0, extent / 5, (n, 2)), np.zeros(n)])
    wl = rng.uniform(450, 650, n).astype(np.float32)
    w = np.full(n, 1e-3, dtype=np.float32)
    ri.render(p, w, wl)
    return ri


class TestConvolvePadding:
    """Padding-mode/value matrix (reference test_convolve.py:543-640)."""

    def test_gray_constant_padding_value(self):
        """padding with white leaves bright borders after keep_size slicing"""
        img = ot.GrayscaleImage(np.zeros((64, 64)), s=[2, 2])
        psf = psf_presets.gaussian(sig=0.5)
        with ot.global_options.no_warnings():
            dark = convolve(img, psf, keep_size=True,
                            padding_mode="constant", padding_value=0.0)
            bright = convolve(img, psf, keep_size=True,
                              padding_mode="constant", padding_value=1.0)
        assert dark.data.max() < 1e-6
        # white padding bleeds into the border rows of a black image
        assert bright.data[0].mean() > 0.1
        assert bright.data[32].mean() < bright.data[0].mean()

    def test_gray_edge_padding(self):
        """'edge' padding replicates the border: a uniformly-bright image
        stays uniform under keep_size (no vignetting from implicit black).
        Uses a PSF wide enough (0.5 mm on a 2 mm image) that border effects
        span several pixels."""
        img = ot.GrayscaleImage(np.ones((64, 64)), s=[2, 2])
        psf = wide_psf()
        with ot.global_options.no_warnings():
            out_e = convolve(img, psf, keep_size=True, padding_mode="edge",
                             cargs={"normalize": False})
            out_c = convolve(img, psf, keep_size=True, padding_mode="constant",
                             cargs={"normalize": False})
        assert out_e.data[0].min() > 0.95
        # constant-black padding darkens the border instead
        assert out_c.data[0].mean() < out_e.data[0].mean() - 0.05

    def test_rgb_padding_value(self):
        img = ot.RGBImage(np.zeros((64, 64, 3)), s=[2, 2])
        psf = wide_psf()
        with ot.global_options.no_warnings():
            out = convolve(img, psf, keep_size=True,
                           padding_mode="constant", padding_value=[1.0, 0.0, 0.0])
        # red padding bleeds red (mostly) into the border
        assert out.data[0, :, 0].mean() > 0.05
        assert out.data[0, :, 1].max() < 1e-2
        assert out.data[0, :, 2].max() < 1e-2

    def test_padding_errors(self):
        img_rgb = ot.RGBImage(np.zeros((64, 64, 3)), s=[2, 2])
        img_g = gray_img()
        psf = psf_presets.gaussian(sig=0.5)
        with pytest.raises(TypeError):      # scalar padding for RGB
            convolve(img_rgb, psf, padding_value=2)
        with pytest.raises(TypeError):      # list padding for grayscale
            convolve(img_g, psf, padding_value=[1, 2])
        with pytest.raises(ValueError):     # wrong shape
            convolve(img_rgb, psf, padding_value=[0, 0])
        with pytest.raises(ValueError):     # negative
            convolve(img_rgb, psf, padding_value=[0, 0, -1])
        with pytest.raises(ValueError):     # negative scalar
            convolve(img_g, psf, padding_value=-2)


class TestConvolveCases:
    """The 4 color-case matrix (reference convolve.py:49-154) + edge cases."""

    def test_gray_image_color_psf_list_rejected(self):
        with pytest.raises(TypeError):
            convolve(gray_img(), [color_psf(), color_psf(), color_psf()])

    def test_rgb_image_single_color_psf_rejected(self):
        img = ot.RGBImage(np.zeros((64, 64, 3)), s=[2, 2])
        with pytest.raises(TypeError):
            convolve(img, color_psf())

    def test_rgb_image_three_psf_list(self):
        rng = np.random.default_rng(3)
        img = ot.RGBImage(rng.uniform(0, 1, (64, 64, 3)), s=[2, 2])
        with ot.global_options.no_warnings():
            out = convolve(img, [color_psf(1), color_psf(2), color_psf(3)])
        assert isinstance(out, ot.RGBImage)
        assert np.all(np.isfinite(out.data))

    def test_three_psf_extent_mismatch(self):
        img = ot.RGBImage(np.zeros((64, 64, 3)), s=[2, 2])
        with pytest.raises(ValueError):
            with ot.global_options.no_warnings():
                convolve(img, [color_psf(1), color_psf(2, extent=0.02),
                               color_psf(3)])

    def test_zero_image(self):
        """an all-black image stays black through every case"""
        with ot.global_options.no_warnings():
            out = convolve(ot.GrayscaleImage(np.zeros((64, 64)), s=[2, 2]),
                           psf_presets.gaussian(sig=0.5))
        assert out.data.max() == 0

    def test_zero_psf(self):
        psf = ot.GrayscaleImage(np.zeros((64, 64)), s=[0.2, 0.2])
        with ot.global_options.no_warnings():
            out = convolve(gray_img(), psf)
        assert out.data.max() == 0

    def test_extent_growth(self):
        """without keep_size the output covers image·|m| + psf extents
        (plus the fixed 4-px psf guard band at image resolution)"""
        img = gray_img(s=(2, 2))
        psf = psf_presets.gaussian(sig=0.5)
        m = 1.5
        with ot.global_options.no_warnings():
            out = convolve(img, psf, m=m)
        ip = np.array(img.s) * m / (np.array(img.shape[:2])[::-1] - 1)
        expected = np.array(img.s) * m + np.array(psf.s) + 8 * ip
        np.testing.assert_allclose(out.s, expected, rtol=0.02)

    def test_small_psf_rejected(self):
        psf = ot.GrayscaleImage(np.ones((30, 30)), s=[0.1, 0.1])
        with pytest.raises(ValueError):
            with ot.global_options.no_warnings():
                convolve(gray_img(), psf)

    def test_small_image_rejected(self):
        img = ot.GrayscaleImage(np.ones((30, 30)), s=[2, 2])
        with pytest.raises(ValueError):
            with ot.global_options.no_warnings():
                convolve(img, psf_presets.gaussian(sig=0.5))

    def test_energy_conservation_gray(self):
        """a unit-normalized PSF conserves total linear energy (with the
        default output max-normalization disabled via cargs)"""
        rng = np.random.default_rng(4)
        img = ot.GrayscaleImage(rng.uniform(0.2, 0.8, (101, 101)), s=[2, 2])
        psf = psf_presets.gaussian(sig=0.3)
        with ot.global_options.no_warnings():
            out = convolve(img, psf, cargs={"normalize": False})
        from optrace_tpu import color as _color
        e_in = np.sum(np.asarray(_color.srgb_to_srgb_linear(img.data)))
        e_out = np.sum(np.asarray(_color.srgb_to_srgb_linear(out.data)))
        assert e_out == pytest.approx(e_in, rel=0.02)
