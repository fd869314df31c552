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
