"""PSF convolution of images in linear sRGB.

Behavioral parity with reference ``optrace/tracer/convolve.py`` (SURVEY.md
§2.7): four color cases (gray⊛gray→gray, gray⊛color-PSF→RGB, RGB⊛gray→RGB,
RGB⊛[R,G,B-PSF]→RGB), magnification scaling/flipping, PSF rescale to image
pixel pitch with power conservation, custom padding modes, keep_size
cropping, final linear-sRGB→XYZ→sRGB conversion with cargs overrides.

The convolutions themselves run as batched XLA FFTs on the accelerator
(replacing the reference's per-channel fftconvolve threads).
"""

import numpy as np
import jax.numpy as jnp
import jax.scipy.signal

try:
    import cv2
except ImportError:      # pragma: no cover
    cv2 = None

from .. import color
from ..image import RGBImage, GrayscaleImage, RenderImage
from ..utils.property_checker import PropertyChecker as pc
from ..utils.progress_bar import ProgressBar
from ..utils.warnings import warning


def _fftconvolve_full(img, psf):
    """2D 'full' convolution via XLA FFT; supports trailing channel axes."""
    img_j = jnp.asarray(img)
    psf_j = jnp.asarray(psf)
    if img_j.ndim == 2 and psf_j.ndim == 2:
        return np.asarray(jax.scipy.signal.fftconvolve(img_j, psf_j, mode="full"))
    if img_j.ndim == 2:
        img_j = img_j[:, :, None]
    if psf_j.ndim == 2:
        psf_j = psf_j[:, :, None]
    nc = max(img_j.shape[2], psf_j.shape[2])
    img_j = jnp.broadcast_to(img_j, (*img_j.shape[:2], nc))
    psf_j = jnp.broadcast_to(psf_j, (*psf_j.shape[:2], nc))
    out = jax.scipy.signal.fftconvolve(jnp.moveaxis(img_j, 2, 0),
                                       jnp.moveaxis(psf_j, 2, 0),
                                       mode="full", axes=(1, 2))
    return np.asarray(jnp.moveaxis(out, 0, 2))


def convolve(img, psf, m: float = 1, keep_size: bool = False,
             padding_mode: str = "constant", padding_value=None,
             cargs: dict = None):
    """Convolve an image with a point spread function.

    See the reference docstring semantics (convolve.py:49-154): ``m`` is the
    system magnification (scales, m<0 flips), padding modes follow numpy.pad,
    ``cargs`` overrides the final color conversion parameters.

    :return: GrayscaleImage (case 1) or RGBImage (cases 2-4)
    """
    cargs = cargs if cargs is not None else {}
    pc.check_type("m", m, (int, float))
    pc.check_type("cargs", cargs, dict)
    pc.check_above("abs(m)", abs(m), 0)
    pc.check_type("keep_size", keep_size, bool)

    img_color = isinstance(img, RGBImage)
    three_psf = isinstance(psf, list) and len(psf) == 3
    psf_color = isinstance(psf, RenderImage) or three_psf
    make_linear = isinstance(psf, GrayscaleImage) and isinstance(img, GrayscaleImage)

    bar = ProgressBar("Convolving: ", 5)

    # ---- load image -------------------------------------------------
    pc.check_type("img", img, (RGBImage, GrayscaleImage))
    if img_color:
        if padding_value is not None:
            pc.check_type("padding_value", padding_value, (list, np.ndarray))
        pval = np.asarray(padding_value, dtype=np.float64) if padding_value is not None \
            else np.array([0., 0., 0.])
        if pval.ndim != 1 or pval.shape[0] != 3:
            raise ValueError(f"padding_value must be a 3 element array/list, but has shape {pval.shape}")
        if np.any(pval < 0):
            raise ValueError("value in 'padding_value' needs to be non-negative.")
        pval_lin = np.asarray(color.srgb_to_srgb_linear(pval[None, None, :]))[0, 0]
        img_lin = np.asarray(color.srgb_to_srgb_linear(img.data), dtype=np.float64)
    else:
        if padding_value is not None:
            pc.check_type("padding_value", padding_value, (int, float))
        pv = float(padding_value) if padding_value is not None else 0.
        pc.check_not_below("padding_value", pv, 0)
        pval_lin = np.asarray(color.srgb_to_srgb_linear(
            np.array([pv, pv, pv])[None, None, :]))[0, 0]
        img_lin = np.asarray(color.srgb_to_srgb_linear(img.data), dtype=np.float64)
        if not make_linear:
            img_lin = np.broadcast_to(img_lin[:, :, None], [*img_lin.shape[:2], 3])
        else:
            pval_lin = pval_lin[0]
    custom_padding = not (padding_mode == "constant" and np.sum(pval_lin) == 0)
    bar.update()

    # ---- load psf ---------------------------------------------------
    if psf_color:
        psfs = [psf] if not three_psf else psf
        for i, psfi in enumerate(psfs):
            pc.check_type(f"psf[{i}]", psfi, RenderImage)
        pextent = psfs[0].extent
        if img_color and not three_psf:
            raise TypeError("A list of R, G, B RenderImage PSFs is required for convolving "
                            "a colored image with a colored PSF.")
        if not img_color and three_psf:
            raise TypeError("A single colored RenderImage is sufficient for a grayscale image.")
        psf_lins = []
        for i, psfi in enumerate(psfs):
            if not np.all(pextent == psfi.extent):
                raise ValueError("All PSF sizes need to be the same. Render the detector image "
                                 "with the same manual extent option.")
            psf_lins.append(np.asarray(color.xyz_to_srgb_linear(
                psfi.data[:, :, :3], rendering_intent="Ignore", normalize=False), dtype=np.float64))
    else:
        pc.check_type("psf", psf, GrayscaleImage)
        psfs = [psf]
        psf_lin = np.asarray(color.srgb_to_srgb_linear(psf.data), dtype=np.float64)
        if (psum := np.sum(psf_lin)):
            psf_lin = psf_lin / psum
        psf_lins = [psf_lin] if make_linear \
            else [np.broadcast_to(psf_lin[:, :, None], [*psf.shape[:2], 3])]

    # ---- shapes (reference convolve.py:254-302) ---------------------
    iN = np.array(np.flip(img.shape[:2]))
    pN = np.array(np.flip(psfs[0].shape[:2]))
    is_ = np.array(img.s) * abs(m)
    ps_ = np.array(psfs[0].s)
    ip = is_ / (iN - 1)
    pp = ps_ / (pN - 1)

    if ps_[0] > 2 * is_[0] or ps_[1] > 2 * is_[1]:
        raise ValueError(f"m-scaled image size [{is_[0]:.5g}, {is_[1]:.5g}] is more than two "
                         f"times smaller than PSF size [{ps_[0]:.5g}, {ps_[1]:.5g}].")
    if pN[0] * pN[1] > 4e6:
        raise ValueError("PSF needs to be smaller than 4MP")
    if iN[0] * iN[1] > 4e6:
        raise ValueError("Image needs to be smaller than 4MP")
    if pp[0] > ip[0] or pp[1] > ip[1]:
        warning(f"PSF pixel sizes [{pp[0]:.5g}, {pp[1]:.5g}] larger than image pixel sizes "
                f"[{ip[0]:.5g}, {ip[1]:.5g}], generally you want a PSF in a higher resolution")
    if pN[0] < 50 or pN[1] < 50:
        raise ValueError(f"PSF too small with shape {psfs[0].shape}, needs at least 50 values per dim.")
    if iN[0] < 50 or iN[1] < 50:
        raise ValueError(f"Image too small with shape {img.shape}, needs at least 50 values per dim.")
    if iN[0] * iN[1] < 2e4:
        warning("Low resolution image.")
    if pN[0] * pN[1] < 2e4:
        warning("Low resolution PSF.")
    if not (0.2 < pp[0] / pp[1] < 5):
        warning(f"Pixels of PSF are strongly non-square with side lengths [{pp[0]}mm, {pp[1]}mm]")
    if not (0.2 < ip[0] / ip[1] < 5):
        warning(f"Pixels of image are strongly non-square with side lengths [{ip[0]}mm, {ip[1]}mm]")

    sc = pp / ip
    ppad = np.array([4, 4], dtype=np.int32)
    p2N = np.where(pN * sc < 1, 1, np.round(pN * sc).astype(int))
    p3N = p2N + 2 * ppad
    ipad = p3N if custom_padding else np.array([0, 0], dtype=np.int32)
    i2N = iN + 2 * ipad
    i3N = i2N + p3N - 1
    i4N = iN if keep_size else iN + p3N - 1
    i4s = (i4N - 1) * ip
    extent = np.asarray(img.extent) + np.asarray(psfs[0].extent)
    xm = (extent[0] + extent[1]) / 2
    ym = (extent[2] + extent[3]) / 2
    i4e = [xm - i4s[0] / 2, xm + i4s[0] / 2, ym - i4s[1] / 2, ym + i4s[1] / 2]

    # ---- pad + flip image -------------------------------------------
    if custom_padding:
        pad_size = ((ipad[1], ipad[1]), (ipad[0], ipad[0]), (0, 0))
        shape = pad_size[:2] if img_lin.ndim == 2 else pad_size
        kwargs = dict(constant_values=0) if padding_mode == "constant" else {}
        if padding_mode == "constant" and img_lin.ndim == 3:
            imgp = np.tile(pval_lin, (iN[1] + 2 * ipad[1], iN[0] + 2 * ipad[0], 1))
            imgp[ipad[1]:-ipad[1], ipad[0]:-ipad[0]] = img_lin
        else:
            kwargs = dict(constant_values=pval_lin) if padding_mode == "constant" else {}
            imgp = np.pad(img_lin, shape, mode=padding_mode, **kwargs)
    else:
        imgp = np.asarray(img_lin)
    if m < 0:
        imgp = np.fliplr(np.flipud(imgp))
    bar.update()

    # ---- rescale + pad psf ------------------------------------------
    psf2s = []
    for psf_lin in psf_lins:
        if cv2 is not None:
            psf2 = cv2.resize(np.ascontiguousarray(psf_lin), p2N,
                              interpolation=cv2.INTER_AREA) * pN[0] * pN[1] / p2N[0] / p2N[1]
        else:     # pragma: no cover - cv2 is available in practice
            from scipy.ndimage import zoom
            factors = (p2N[1] / psf_lin.shape[0], p2N[0] / psf_lin.shape[1])
            factors = factors if psf_lin.ndim == 2 else (*factors, 1)
            psf2 = zoom(psf_lin, factors, order=1) * pN[0] * pN[1] / p2N[0] / p2N[1]
        shape_xy = ((ppad[1], ppad[1]), (ppad[0], ppad[0]), (0, 0))
        shape = shape_xy[:2] if psf2.ndim == 2 else shape_xy
        psf2s.append(np.pad(psf2, shape, mode="constant", constant_values=0))
    bar.update()

    # ---- convolve ---------------------------------------------------
    if three_psf:
        img2 = np.zeros((i3N[1], i3N[0], 3), dtype=np.float64)
        for i, psf_lin in enumerate(psf2s):
            img2 += _fftconvolve_full(imgp[:, :, i][:, :, None], psf_lin)
    else:
        img2 = _fftconvolve_full(imgp, psf2s[0])
        if make_linear and img2.ndim == 3:
            img2 = img2[:, :, 0]
    bar.update()

    # ---- slice + convert --------------------------------------------
    if custom_padding:
        img2 = img2[ipad[1]:-ipad[1], ipad[0]:-ipad[0]]
    if keep_size:
        i2sl = (i3N - i2N) // 2
        img2 = img2[i2sl[1]:i2sl[1] + iN[1], i2sl[0]:i2sl[0] + iN[0]]

    if make_linear:
        if ("normalize" not in cargs or cargs["normalize"]) and (imax := np.max(img2)):
            img2 = img2 / imax
        img2 = np.clip(img2, 0, 1)
        out = np.asarray(color.srgb_linear_to_srgb(img2))
        bar.finish()
        return GrayscaleImage(np.clip(out, 0, 1), extent=i4e)

    img2 = color.srgb_linear_to_xyz(jnp.asarray(img2))
    cargs0 = dict(rendering_intent="Absolute", normalize=True, clip=True,
                  L_th=0, chroma_scale=None)
    out = np.asarray(color.xyz_to_srgb(img2, **(cargs0 | cargs)))
    bar.finish()
    return RGBImage(np.clip(out, 0, 1), extent=i4e)
