"""Image presets with the reference's API surface
(reference optrace/tracer/presets/image.py).

The reference ships photographic assets; this package generates all preset
images *procedurally* instead: standard charts (color checker from the
published Macbeth sRGB values, grid, Siemens star, ETDRS-style tumbling-E
chart, test cards) are synthesized exactly, and the photographic scenes are
replaced by deterministic synthetic scenes with comparable spatial/color
statistics (documented per function). API-compatible: every function takes
(s, extent) and returns an RGBImage or GrayscaleImage.
"""

import numpy as np

from ..image import RGBImage, GrayscaleImage


def _rng(seed):
    return np.random.default_rng(seed)


def _smooth(img, it=12):
    """cheap separable blur for natural-looking synthetic scenes"""
    for _ in range(it):
        img = (np.roll(img, 1, 0) + np.roll(img, -1, 0)
               + np.roll(img, 1, 1) + np.roll(img, -1, 1) + 4 * img) / 8
    return img


def _synthetic_scene(seed, hue_bias, n=512):
    """deterministic colored random-blob scene in [0,1]³"""
    r = _rng(seed)
    img = _smooth(r.uniform(0, 1, (n, n, 3)), 16)
    img = (img - img.min()) / (img.max() - img.min())
    img = np.clip(img * np.asarray(hue_bias), 0, 1)
    return img


# Scene images (procedural stand-ins) ----------------------------------

def cell(s=None, extent=None) -> RGBImage:
    """Synthetic microscopy-like scene (procedural stand-in)."""
    return RGBImage(_synthetic_scene(1, [0.9, 0.5, 0.9]), s, extent, desc="Cell")


def documents(s=None, extent=None) -> RGBImage:
    """Synthetic desk-documents scene (procedural stand-in)."""
    img = _synthetic_scene(2, [0.9, 0.85, 0.8])
    # rectangular bright 'paper' regions
    img[80:220, 60:240] = [0.95, 0.95, 0.92]
    img[260:420, 200:460] = [0.9, 0.9, 0.88]
    return RGBImage(img, s, extent, desc="Documents")


def fruits(s=None, extent=None) -> RGBImage:
    """Synthetic fruits scene (procedural stand-in)."""
    return RGBImage(_synthetic_scene(3, [1.0, 0.8, 0.3]), s, extent, desc="Fruits")


def group_photo(s=None, extent=None) -> RGBImage:
    """Synthetic group-photo scene (procedural stand-in)."""
    return RGBImage(_synthetic_scene(4, [0.9, 0.8, 0.7]), s, extent, desc="Group Photo")


def hong_kong(s=None, extent=None) -> RGBImage:
    """Synthetic city-night scene (procedural stand-in)."""
    img = _synthetic_scene(5, [0.4, 0.4, 0.6])
    r = _rng(6)
    ys, xs = r.integers(0, 512, 300), r.integers(0, 512, 300)
    img[ys, xs] = [1.0, 0.9, 0.6]
    return RGBImage(img, s, extent, desc="Hong Kong")


def interior(s=None, extent=None) -> RGBImage:
    """Synthetic interior scene (procedural stand-in)."""
    return RGBImage(_synthetic_scene(7, [0.95, 0.85, 0.7]), s, extent, desc="Interior")


def landscape(s=None, extent=None) -> RGBImage:
    """Synthetic landscape scene (procedural stand-in)."""
    img = _synthetic_scene(8, [0.5, 0.8, 0.5])
    n = img.shape[0]
    sky = np.linspace(1.0, 0.3, n)[:, None]
    img[n // 2:, :, 2] = np.clip(img[n // 2:, :, 2] + 0.4, 0, 1)   # lower half: sky (flipped later)
    img[:, :, 2] = np.clip(img[:, :, 2] + 0.2 * sky, 0, 1)
    return RGBImage(img, s, extent, desc="Landscape")


def eye_test_vintage(s=None, extent=None) -> RGBImage:
    """Synthetic eye-test-chart scene (procedural stand-in with letters)."""
    img = np.full((512, 512, 3), [0.85, 0.8, 0.7])
    r = _rng(9)
    y = 440
    size = 60
    while size > 6 and y > 20:
        for x in range(40, 460, int(2.5 * size)):
            if x + size < 470:
                img[y - size:y, x:x + size // 5] = 0.1
                img[y - size:y - size + size // 5, x:x + size] = 0.1
                img[y - size // 2 - size // 10:y - size // 2 + size // 10, x:x + int(0.7 * size)] = 0.1
        y -= int(1.6 * size)
        size = int(size / 1.5)
    return RGBImage(np.clip(img, 0, 1), s, extent, desc="Eye Test Vintage")


# Charts (exact procedural generation) ---------------------------------

def color_checker(s=None, extent=None) -> RGBImage:
    """Macbeth/X-Rite ColorChecker chart from the published sRGB patch
    values (classic 24-patch chart)."""
    # published sRGB coordinates of the 24 patches (row-major, top-left first)
    patches = np.array([
        [115, 82, 68], [194, 150, 130], [98, 122, 157], [87, 108, 67], [133, 128, 177], [103, 189, 170],
        [214, 126, 44], [80, 91, 166], [193, 90, 99], [94, 60, 108], [157, 188, 64], [224, 163, 46],
        [56, 61, 150], [70, 148, 73], [175, 54, 60], [231, 199, 31], [187, 86, 149], [8, 133, 161],
        [243, 243, 242], [200, 200, 200], [160, 160, 160], [122, 122, 121], [85, 85, 85], [52, 52, 52],
    ], dtype=np.float64) / 255.0

    ph, pw, border = 80, 80, 8
    H = 4 * ph + 5 * border
    W = 6 * pw + 7 * border
    img = np.zeros((H, W, 3))
    for i in range(4):
        for j in range(6):
            y0 = border + i * (ph + border)
            x0 = border + j * (pw + border)
            img[y0:y0 + ph, x0:x0 + pw] = patches[i * 6 + j]
    img = np.flipud(img)   # element [0,0] = lower-left convention
    return RGBImage(img, s, extent, desc="Color Checker Chart")


def ETDRS_chart(s=None, extent=None) -> GrayscaleImage:
    """ETDRS-style tumbling-E acuity chart (procedural)."""
    img = np.ones((512, 512))
    r = _rng(10)
    y = 30
    size = 80
    while size >= 8 and y + size < 500:
        n_let = min(5, 460 // int(2 * size))
        for k in range(n_let):
            x = 26 + k * int(2 * size)
            rot = r.integers(0, 4)
            E = np.zeros((5, 5))
            E[:, 0] = 1
            E[0, :] = E[2, :] = E[4, :] = 1
            E = np.rot90(E, rot)
            Eimg = np.kron(E, np.ones((size // 5, size // 5)))
            h, w = Eimg.shape
            img[y:y + h, x:x + w] = 1 - Eimg
        y += int(1.8 * size)
        size = int(size / 1.26)
    return GrayscaleImage(np.flipud(img), s, extent, desc="ETDRS Chart")


def ETDRS_chart_inverted(s=None, extent=None) -> GrayscaleImage:
    """Inverted (white-on-black) ETDRS-style chart. Grayscale like the
    reference (presets/image.py:119-129 converts to_grayscale_image)."""
    g = ETDRS_chart(s if s is not None else [1, 1], extent)
    return GrayscaleImage(1.0 - g.data, s, extent, desc="ETDRS Chart Inverted")


def grid(s=None, extent=None) -> GrayscaleImage:
    """White grid on black background, 10×10 cells (distortion testing,
    reference presets/image.py:142-155)."""
    sz = 501
    img = np.zeros((sz, sz))
    for p in np.linspace(0, sz - 1, 11).astype(int):
        img[p, :] = 1.0
        img[:, p] = 1.0
    return GrayscaleImage(img, s, extent, desc="Grid")


def siemens_star(s=None, extent=None) -> GrayscaleImage:
    """Siemens star with 36 spokes (resolution testing)."""
    sz = 601
    Y, X = np.mgrid[-1:1:sz * 1j, -1:1:sz * 1j]
    phi = np.arctan2(Y, X)
    R = np.hypot(X, Y)
    img = (np.sin(36 * phi) > 0).astype(np.float64)
    img[R > 0.95] = 1.0
    img[R < 0.03] = 1.0
    return GrayscaleImage(img, s, extent, desc="Siemens Star")


def tv_testcard1(s=None, extent=None) -> RGBImage:
    """SMPTE-style color-bars test card (procedural)."""
    H, W = 480, 640
    img = np.zeros((H, W, 3))
    bars = np.array([[1, 1, 1], [1, 1, 0], [0, 1, 1], [0, 1, 0],
                     [1, 0, 1], [1, 0, 0], [0, 0, 1]], dtype=np.float64) * 0.75
    bw = W // 7
    for i, c in enumerate(bars):
        img[H // 3:, i * bw:(i + 1) * bw] = c
    # bottom gradient + castellation
    ramp = np.linspace(0, 1, W)
    img[:H // 3] = ramp[None, :, None]
    return RGBImage(np.clip(np.flipud(img), 0, 1), s, extent, desc="TV Testcard 1")


def tv_testcard2(s=None, extent=None) -> RGBImage:
    """Geometry test card: grid + circle + color patches (procedural)."""
    H = W = 512
    img = np.full((H, W, 3), 0.5)
    for p in range(0, W, 32):
        img[p:p + 1, :] = 1.0
        img[:, p:p + 1] = 1.0
    Y, X = np.mgrid[-1:1:H * 1j, -1:1:W * 1j]
    ring = np.abs(np.hypot(X, Y) - 0.8) < 0.01
    img[ring] = [1, 1, 1]
    img[200:240, 100:180] = [1, 0, 0]
    img[200:240, 220:300] = [0, 1, 0]
    img[200:240, 340:420] = [0, 0, 1]
    return RGBImage(np.clip(img, 0, 1), s, extent, desc="TV Testcard 2")


scenes: list = [cell, documents, fruits, group_photo, hong_kong, interior, landscape]
charts: list = [color_checker, ETDRS_chart, ETDRS_chart_inverted, eye_test_vintage,
                grid, siemens_star, tv_testcard1, tv_testcard2]
all_presets: list = [*scenes, *charts]
