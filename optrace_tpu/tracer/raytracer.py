"""Raytracer: scene orchestration around the jitted trace core.

Behavioral parity with reference ``optrace/tracer/raytracer.py``
(SURVEY.md §2.6, §3): geometry checks with sampled collision detection,
sequential trace with INFOS warning counters, detector/source image and
spectrum rendering, iterative (megabatched) rendering, focus search.

TPU-native differences:
- the trace is one jit-compiled pure function per scene snapshot (cached),
  rays generated on device from a PRNG key, no Python threads;
- the detector hit search is a vectorized scan over stored ray sections on
  device instead of a data-dependent host loop;
- ray-axis sharding happens inside jit via the helpers in
  optrace_tpu.parallel (the host code here is mesh-agnostic).
"""

from enum import IntEnum
from typing import Any

import numpy as np
import scipy.optimize
import jax
import jax.numpy as jnp

from .ray_storage import RayStorage
from .scene_compile import compile_surface
from .trace_core import TraceStep, trace_bundle, N_INFOS
from ..geometry import (Group, Lens, IdealLens, Filter, Aperture, Detector, RaySource,
                        Surface, RingSurface, SlitSurface, SphericalSurface,
                        RectangularSurface, Point, Line)
from ..spectrum.refraction_index import RefractionIndex
from ..spectrum.light_spectrum import LightSpectrum
from ..image.render_image import RenderImage
from ..analysis import focus
from ..ops import geom, binning
from ..ops import sampling
from ..utils.property_checker import PropertyChecker as pc
from ..utils.global_options import global_options
from ..utils.progress_bar import ProgressBar
from ..utils.warnings import warning


class Raytracer(Group):

    N_EPS: float = 1e-11
    HURB_FACTOR: float = 2 ** 0.5
    MAX_RAY_STORAGE_RAM: int = 6000000000
    ITER_RAYS_STEP: int = 1000000
    T_TH: float = 0.0

    class INFOS(IntEnum):
        ABSORB_MISSING = 0
        TIR = 1
        ILL_COND = 2
        OUTLINE_INTERSECTION = 3
        HURB_NEG_DIR = 4

    focus_search_methods: list = ['RMS Spot Size', 'Irradiance Variance',
                                  'Image Sharpness', 'Image Center Sharpness']

    def __init__(self, outline, n0: RefractionIndex = None, no_pol: bool = False,
                 use_hurb: bool = False, **kwargs) -> None:
        self.outline = outline
        self.no_pol = no_pol
        self.use_hurb = use_hurb

        self.rays = RayStorage()
        self._msgs = np.array([])
        self._ignore_geometry_error = False
        self.geometry_error = False
        self._last_trace_snapshot = None
        self.fault_pos = np.array([])
        self._seed_counter = 0
        self._trace_cache = {}

        super().__init__(None, n0, **kwargs)
        self._new_lock = True

    def __setattr__(self, key: str, val: Any) -> None:
        if key == "outline":
            pc.check_type(key, val, (list, np.ndarray))
            o = np.asarray(val, dtype=np.float64)
            pc.check_finite(key, o)
            if o.shape[0] != 6 or o[0] >= o[1] or o[2] >= o[3] or o[4] >= o[5]:
                raise ValueError("Outline needs to be specified as [x1, x2, y1, y2, z1, z2] "
                                 "with x2 > x1, y2 > y1, z2 > z1.")
            super().__setattr__(key, o)
            return
        if key in ("no_pol", "use_hurb"):
            pc.check_type(key, val, bool)
        super().__setattr__(key, val)

    @property
    def extent(self):
        return tuple(self.outline)

    @property
    def pos(self):
        return np.mean(self.outline[:2]), np.mean(self.outline[2:4]), self.outline[4]

    def clear(self) -> None:
        super().clear()
        self.rays.__init__()
        self._trace_cache = {}

    # ------------------------------------------------------------------
    # snapshots / change detection (reference :129-179)

    def property_snapshot(self) -> dict:
        return self.tracing_snapshot() | dict(
            Markers=[D.crepr() for D in self.markers],
            Volumes=[D.crepr() for D in self.volumes],
            Detectors=[D.crepr() for D in self.detectors])

    def tracing_snapshot(self) -> dict:
        return dict(Rays=self.rays.crepr(),
                    Ambient=[tuple(self.outline), self.n0.crepr()],
                    TraceSettings=[self.no_pol, self.use_hurb, self.HURB_FACTOR],
                    Lenses=[D.crepr() for D in self.lenses],
                    Filters=[D.crepr() for D in self.filters],
                    Apertures=[D.crepr() for D in self.apertures],
                    RaySources=[D.crepr() for D in self.ray_sources])

    def compare_property_snapshot(self, h1: dict, h2: dict) -> dict:
        diff = {key: h1[key] != h2[key] for key in h1.keys()}
        diff["Ambient"] = diff["Ambient"] or diff["Lenses"]
        diff["Any"] = any(val for val in diff.values())
        return diff

    def check_if_rays_are_current(self) -> bool:
        if self._last_trace_snapshot is None:
            return False
        now = self.tracing_snapshot()
        return not self.compare_property_snapshot(self._last_trace_snapshot, now)["Any"]

    # ------------------------------------------------------------------
    # geometry checks (reference :510-664)

    def _tracing_elements(self) -> list:
        """z-sorted [Lens|Filter|Aperture] plus the implicit end absorber at
        the outline z-end (reference :492-508)."""
        o = self.outline
        end_filter = Aperture(RectangularSurface(dim=[o[1] - o[0], o[3] - o[2]]),
                              pos=[(o[1] + o[0]) / 2, (o[2] + o[3]) / 2, o[5]])
        elements = [el for el in self.elements if isinstance(el, (Lens, Filter, Aperture))]
        return elements + [end_filter]

    @staticmethod
    def check_collision(front, back, res: int = 100):
        """Sampled collision check between two surfaces/points/lines
        (reference :580-664). Returns (collision?, x, y, z samples)."""
        if not (isinstance(front, Surface) or isinstance(back, Surface)):
            raise TypeError("At least one object needs to be a Surface for collision detection")

        if isinstance(front, Point) or isinstance(back, Point):
            rev, pt, surf = (False, front, back) if isinstance(front, Point) else (True, back, front)
            x, y = np.array([pt.pos[0]]), np.array([pt.pos[1]])
            z = surf.values(x, y)
            hit = (z < pt.pos[2]) if not rev else (z > pt.pos[2])
            hit = hit & surf.mask(x, y)
            where = np.where(hit)[0]
            return bool(np.any(hit)), x[where], y[where], z[where]

        if isinstance(front, Line) or isinstance(back, Line):
            rev, line, surf = (False, front, back) if isinstance(front, Line) else (True, back, front)
            t = np.linspace(-line.r, line.r, 10 * res)
            ang = np.deg2rad(line.angle)
            x = line.pos[0] + np.cos(ang) * t
            y = line.pos[1] + np.sin(ang) * t
            z = surf.values(x, y)
            hit = (z < line.pos[2]) if not rev else (z > line.pos[2])
            hit = hit & surf.mask(x, y)
            where = np.where(hit)[0]
            return bool(np.any(hit)), x[where], y[where], z[where]

        xsf, xef, ysf, yef, zsf, zef = front.extent
        xsb, xeb, ysb, yeb, zsb, zeb = back.extent
        if zef < zsb:
            return False, np.array([]), np.array([]), np.array([])

        xs, xe = max(xsf, xsb), min(xef, xeb)
        ys, ye = max(ysf, ysb), min(yef, yeb)
        if xs > xe or ys > ye:
            return False, np.array([]), np.array([]), np.array([])

        Y, X = np.mgrid[ys:ye:res * 1j, xs:xe:res * 1j]
        x2, y2 = X.flatten(), Y.flatten()
        valid = front.mask(x2, y2) & back.mask(x2, y2)
        x2v, y2v = x2[valid], y2[valid]
        zfv = front.values(x2v, y2v)
        zbv = back.values(x2v, y2v)
        coll = zfv > zbv
        where = np.where(coll)[0]
        return bool(np.any(coll)), x2v[where], y2v[where], zfv[where]

    def _geometry_checks(self) -> None:
        elements = self._tracing_elements()

        def is_inside(e) -> bool:
            o = self.outline + self.N_EPS * np.array([-1, 1, -1, 1, -1, 1])
            return o[0] <= e[0] and e[1] <= o[1] and o[2] <= e[2] and e[3] <= o[3] \
                and o[4] <= e[4] and e[5] <= o[5]

        if not self.ray_sources:
            warning("RaySource Missing.")
            self.geometry_error = True
            return

        coll = False
        xc = yc = zc = np.array([])
        for i, el in enumerate(elements):
            if not is_inside(el.extent):
                warning(f"Element{i} {el} with extent {el.extent} outside outline {self.outline}.")
                self.geometry_error = True
                return

            if i + 1 < len(elements):
                coll, xc, yc, zc = self.check_collision(el.front, elements[i + 1].front)
            if not coll and el.has_back():
                coll, xc, yc, zc = self.check_collision(el.front, el.back)
            if not coll and el.has_back():
                coll, xc, yc, zc = self.check_collision(el.back, elements[i + 1].front)

            if self.use_hurb and i < len(elements) - 1 and isinstance(el, Aperture):
                if not isinstance(el.front, (RingSurface, SlitSurface)):
                    warning(f"Ray bending for surface type {type(el.front).__name__} not implemented.")
                    self.geometry_error = True
                    return
            if coll:
                break

        if not coll:
            for rs in self.ray_sources:
                if not is_inside(rs.extent):
                    warning(f"RaySource {rs} with extent {rs.extent} outside outline {self.outline}.")
                    self.geometry_error = True
                    return
                if isinstance(rs.surface, (Surface, Point, Line)) and rs.pos[2] >= elements[0].extent[4]:
                    coll, xc, yc, zc = self.check_collision(rs.surface, elements[0].front)
                if coll:
                    break

        if coll:
            warning(f"Detected collision between two Surfaces at {xc[0], yc[0], zc[0]}"
                    f" and at least {xc.shape[0]} other positions.")
            self.geometry_error = True
            self.fault_pos = np.column_stack((xc, yc, zc))
            return

        self.geometry_error = False

    def _pretrace_check(self, N: int) -> bool:
        pc.check_type("N", N, int)
        if N < 1:
            raise ValueError(f"Ray number N needs to be at least 1, but is {N}.")
        self._geometry_checks()
        if self.geometry_error and not self._ignore_geometry_error:
            warning("ABORTED TRACING")
            return True
        return False

    # ------------------------------------------------------------------
    # trace step construction

    def _build_steps(self, dtype=np.float32) -> list:
        """Element list → TraceStep list (jnp-functional scene).

        ``dtype=np.float64`` (with ``jax.enable_x64``) builds the
        accuracy-oracle variant of the same scene."""
        steps = []
        n_before = self.n0

        def ph(surf):
            return tuple(float(v) for v in surf.pos)

        for el in self._tracing_elements():
            if isinstance(el, IdealLens):
                sfns = compile_surface(el.front, dtype)
                n2 = el.n2 if el.n2 is not None else self.n0
                steps.append(TraceStep(sfns, "ideal", n1_fn=n_before, n2_fn=n2,
                                       D=el.D, pos_host=ph(el.front)))
                n_before = n2
            elif isinstance(el, Lens):
                n2 = el.n2 if el.n2 is not None else self.n0
                steps.append(TraceStep(compile_surface(el.front, dtype), "refract",
                                       n1_fn=n_before, n2_fn=el.n, pos_host=ph(el.front)))
                steps.append(TraceStep(compile_surface(el.back, dtype), "refract",
                                       n1_fn=el.n, n2_fn=n2, pos_host=ph(el.back)))
                n_before = n2
            elif isinstance(el, Filter):
                steps.append(TraceStep(compile_surface(el.front, dtype), "filter",
                                       spectrum_fn=el.spectrum, pos_host=ph(el.front)))
            elif isinstance(el, Aperture):
                kind = "ring" if isinstance(el.front, RingSurface) \
                    else ("slit" if isinstance(el.front, SlitSurface) else "")
                steps.append(TraceStep(compile_surface(el.front, dtype), "absorb",
                                       hurb=bool(kind), hurb_kind=kind,
                                       pos_host=ph(el.front)))
        return steps

    def _make_source_fn(self, N: int):
        """Device ray generation for all sources with static per-source counts."""
        sources = self.ray_sources
        N_list = [int(n) for n in self.rays.N_list]
        no_pol = self.no_pol

        def gen(key):
            ps, ss, pols, ws, wls = [], [], [], [], []
            keys = jax.random.split(key, len(sources))
            for src, Ni, k in zip(sources, N_list, keys):
                if Ni == 0:
                    continue
                p, s, pol, w, wl = src.create_rays(k, Ni, no_pol=no_pol, power=src.power)
                ps.append(p); ss.append(s); pols.append(pol); ws.append(w); wls.append(wl)
            cat = lambda xs: jnp.concatenate(xs, axis=0) if len(xs) > 1 else xs[0]
            return cat(ps), cat(ss), cat(pols), cat(ws), cat(wls)
        return gen

    # ------------------------------------------------------------------
    # tracing

    def trace(self, N: int) -> None:
        """Trace N rays through the geometry (reference :262-415)."""
        N = int(N)
        if self._pretrace_check(N):
            return

        nt = len(self.tracing_surfaces) + 2
        if self.rays.storage_size(N, nt, self.no_pol) > self.MAX_RAY_STORAGE_RAM:
            raise RuntimeError(f"More than {self.MAX_RAY_STORAGE_RAM * 1e-9:.1f} GB RAM requested. "
                               "Either decrease the number of rays, surfaces or do an iterative "
                               "render, or increase Raytracer.MAX_RAY_STORAGE_RAM.")

        bar = ProgressBar("Raytracing: ", 3)
        self.rays.init(self.ray_sources, N, nt, self.no_pol, seed=self._seed_counter)

        fn = self._get_trace_fn(N)
        bar.update()

        self._seed_counter += 1
        key = jax.random.PRNGKey(self._seed_counter)
        out = fn(key)
        out = jax.tree_util.tree_map(np.asarray, out)
        bar.update()

        s0 = out["p"][:, 1] - out["p"][:, 0]
        norm = np.linalg.norm(s0, axis=-1, keepdims=True)
        with np.errstate(invalid="ignore", divide="ignore"):
            s0 = np.where(norm > 0, s0 / norm, s0)
        self.rays.fill(out["p"], out["w"], out["pol"], out["n"], out["wl"], s0)
        self.rays.lock()

        self._msgs = np.asarray(out["infos"], dtype=int)
        self._show_messages(N)
        bar.finish()

        self._last_trace_snapshot = self.tracing_snapshot()

    def _get_trace_fn(self, N: int):
        """Jitted trace function, cached per (scene snapshot, N)."""
        snap = repr(dict(Ambient=[tuple(self.outline), self.n0.crepr()],
                         TraceSettings=[self.no_pol, self.use_hurb, self.HURB_FACTOR],
                         Lenses=[D.crepr() for D in self.lenses],
                         Filters=[D.crepr() for D in self.filters],
                         Apertures=[D.crepr() for D in self.apertures],
                         RaySources=[D.crepr() for D in self.ray_sources],
                         N_list=tuple(self.rays.N_list)))
        cache_key = (hash(snap), N)
        if cache_key in self._trace_cache:
            # LRU refresh: dict preserves insertion order, re-insert on hit
            fn = self._trace_cache.pop(cache_key)
            self._trace_cache[cache_key] = fn
            return fn

        steps = self._build_steps()
        gen = self._make_source_fn(N)
        outline = tuple(float(v) for v in self.outline)
        n0_fn = self.n0
        no_pol, use_hurb = self.no_pol, self.use_hurb
        hurb_factor = float(self.HURB_FACTOR)

        @jax.jit
        def run(key):
            k_src, k_trace = jax.random.split(key)
            p, s, pols, w, wl = gen(k_src)
            return trace_bundle(steps, n0_fn, outline, p, s, pols, w, wl,
                                no_pol, use_hurb, key=k_trace,
                                hurb_factor=hurb_factor)

        # LRU eviction of the single oldest entry — a GUI session sweeping
        # ray counts on a big scene must never drop the whole cache at once
        while len(self._trace_cache) >= 32:
            self._trace_cache.pop(next(iter(self._trace_cache)))
        self._trace_cache[cache_key] = run
        return run

    # ------------------------------------------------------------------
    # messages

    def _surface_names(self) -> list:
        names = dict()
        for type_, els in zip(["Lens", "Aperture", "Filter"],
                              [self.lenses, self.apertures, self.filters]):
            for i, el in enumerate(els):
                if not el.has_back() or isinstance(el, IdealLens):
                    names[f"surface of {type_} {el.abbr}{i}"] = el.pos[2]
                else:
                    names[f"front surface of {type_} {el.abbr}{i}"] = el.front.pos[2]
                    names[f"back surface of {type_} {el.abbr}{i}"] = el.back.pos[2]
        return ["RaySource"] + sorted(names, key=lambda k: names[k]) + ["Outline"]

    def _show_messages(self, N: int) -> None:
        surf_name = self._surface_names()
        msgs = self._msgs
        texts = {
            int(self.INFOS.TIR): "with total inner reflection at surface {s}, treating as absorbed.",
            int(self.INFOS.ABSORB_MISSING): "missing lens surface {s}, set to absorbed",
            int(self.INFOS.ILL_COND): "are ill-conditioned for numerical hit finding at surface {s}. "
                                      "Where and whether they intersect might be wrong.",
            int(self.INFOS.OUTLINE_INTERSECTION): "hitting outline after surface {s}, set to absorbed.",
            int(self.INFOS.HURB_NEG_DIR): "have negative z-direction after ray bending at surface {s},"
                                          " set to absorbed.",
        }
        for type_ in range(msgs.shape[0]):
            for surf in range(msgs.shape[1]):
                if (count := msgs[type_, surf]):
                    sname = surf_name[surf] if surf < len(surf_name) else f"{surf}"
                    warning(f"{count} rays ({100 * count / N:.3g}% of all rays) "
                            + texts[type_].format(s=f"{surf} ({sname})"))

    # ------------------------------------------------------------------
    # detector hit search (reference :881-1051), vectorized over sections

    def _section_z_bounds(self) -> list:
        """Static (z_min, z_max) per stored ray section: sources, one per
        tracing surface, and the end absorber at the outline z-end."""
        src_z = [rs.extent[4:6] for rs in self.ray_sources]
        bounds = [(min(z[0] for z in src_z), max(z[1] for z in src_z))]
        for surf in self.tracing_surfaces:
            bounds.append((float(surf.z_min), float(surf.z_max)))
        bounds.append((float(self.outline[5]), float(self.outline[5])))
        return bounds

    def _hit_detector(self, info: str, detector_index: int = 0, source_index: int = None,
                      extent=None, projection_method: str = "Equidistant"):
        if not self.detectors:
            raise RuntimeError("Detector Missing")
        if not self.rays.N:
            raise RuntimeError("No rays traced.")
        if source_index is not None and (source_index > len(self.ray_sources) - 1 or source_index < 0):
            raise IndexError("Invalid source_index.")
        if detector_index > len(self.detectors) - 1 or detector_index < 0:
            raise IndexError("Invalid detector_index.")
        if not self.check_if_rays_are_current():
            raise RuntimeError("Tracing geometry/properties changed. Please retrace first.")

        bar = ProgressBar(f"{info}: ", 2)
        Ns, Ne = self.rays.B_list[source_index:source_index + 2] if source_index is not None \
            else (0, self.rays.N)

        dsurf = self.detectors[detector_index].surface
        det_zmin = float(dsurf.z_min)
        wl = np.asarray(self.rays.wl_list[Ns:Ne])

        from .detector import detector_hits, build_segment_mask
        seg_mask = tuple(build_segment_mask(self._section_z_bounds(),
                                            det_zmin, float(dsurf.z_max)))

        # The stored sections are f64 (ray_storage.fill) — keep that
        # precision through the hit solve instead of downcasting to f32.
        # Runs on the CPU backend, where f64 is native: this is a
        # once-per-image host-API step over host-resident data (the fused
        # streaming render never comes through here and stays f32 on TPU).
        with jax.enable_x64(), jax.default_device(jax.devices("cpu")[0]):
            sfns = compile_surface(dsurf, dtype=np.float64)
            p_all = jnp.asarray(self.rays.p_list[Ns:Ne])
            w_all = jnp.asarray(np.asarray(self.rays.w_list[Ns:Ne],
                                           dtype=np.float64))

            hits = jax.jit(lambda p, w: detector_hits(
                sfns, det_zmin, p, w, segment_mask=seg_mask))
            ph, w, ish, n_ill = jax.tree_util.tree_map(np.asarray,
                                                       hits(p_all, w_all))
        bar.update()

        hitw = ish & (w > 0)
        ph, w, wl = ph[hitw].astype(np.float64), w[hitw], wl[hitw]
        ill_count = int(n_ill)

        if isinstance(dsurf, SphericalSurface) and projection_method is not None:
            ph = dsurf.sphere_projection(ph, projection_method)
            projection = projection_method
        else:
            projection = None

        if isinstance(extent, (list, np.ndarray)):
            inside = (extent[0] <= ph[:, 0]) & (ph[:, 0] <= extent[1]) \
                & (extent[2] <= ph[:, 1]) & (ph[:, 1] <= extent[3])
            extent_out = np.asarray(np.array(extent).copy(), dtype=np.float64)
            pc.check_finite("extent", extent_out)
            ph, w, wl = ph[inside], w[inside], wl[inside]
        elif extent is None:
            extent_out = self.detectors[detector_index].pos[:2].repeat(2)
            if np.any(hitw):
                extent_out[[0, 2]] = np.min(ph[:, :2], axis=0)
                extent_out[[1, 3]] = np.max(ph[:, :2], axis=0)
        else:
            raise ValueError(f"Invalid extent '{extent}'.")

        return ph, w, wl, extent_out, projection, bar, ill_count

    # ------------------------------------------------------------------
    # image / spectrum rendering

    def detector_image(self, detector_index: int = 0, source_index: int = None,
                       extent=None, limit: float = None,
                       projection_method: str = "Equidistant", **kwargs) -> RenderImage:
        """Render the detector image (reference :1053-1098)."""
        if limit is not None and extent is not None and "_dont_filter" not in kwargs:
            warning("Using the limit parameter with a user defined extent will produce an "
                    "incorrect detector image, as rays outside the extent are not convolved.")

        p, w, wl, extent_out, projection, bar, ill_count = \
            self._hit_detector("Detector Image", detector_index, source_index, extent, projection_method)

        detector = self.detectors[detector_index]
        pname = f": {detector.desc}" if detector.desc != "" else ""
        desc = f"{Detector.abbr}{detector_index}{pname} at z = {detector.pos[2]:.5g} mm"
        if source_index is not None:
            desc = f"Rays from RS{source_index} at " + desc

        img = RenderImage(long_desc=desc, extent=extent_out, projection=projection)
        img.render(p, w, wl, limit=limit, **kwargs)
        bar.finish()

        if ill_count:
            warning(f"{ill_count} rays ({100 * ill_count / self.rays.N:.3g}% of all rays) were "
                    f"ill-conditioned for hit finding at detector {detector_index}.")
        return img

    def detector_spectrum(self, detector_index: int = 0, source_index: int = None,
                          extent=None, **kwargs) -> LightSpectrum:
        """Render the detector spectrum (reference :1100-1132)."""
        p, w, wl, extent, _, bar, ill_count = \
            self._hit_detector("Detector Spectrum", detector_index, source_index, extent)
        detector = self.detectors[detector_index]
        pname = f": {detector.desc}" if detector.desc != "" else ""
        desc = f"{Detector.abbr}{detector_index}{pname} at z = {detector.pos[2]:.5g} mm"
        desc = (f"Spectrum of RS{source_index} at " if source_index is not None else "Spectrum at ") + desc
        spec = LightSpectrum.render(wl, w, long_desc=desc, **kwargs)
        bar.finish()
        return spec

    def _hit_source(self, info: str, source_index: int = 0):
        if not self.ray_sources:
            raise RuntimeError("Ray Sources Missing.")
        if not self.rays.N:
            raise RuntimeError("No rays traced.")
        if source_index > len(self.ray_sources) - 1 or source_index < 0:
            raise IndexError("Invalid source_index.")
        if not self.check_if_rays_are_current():
            raise RuntimeError("Tracing geometry/properties changed. Please retrace first.")

        bar = ProgressBar(f"{info}: ", 2)
        extent = self.ray_sources[source_index].extent[:4]
        p, _, _, w, wl = self.rays.source_sections(source_index)
        bar.update()
        return p, w, wl, extent, bar

    def source_spectrum(self, source_index: int = 0, **kwargs) -> LightSpectrum:
        """Render the spectrum of one source (reference :1312-1330)."""
        p, w, wl, extent, bar = self._hit_source("Source Spectrum", source_index)
        rs = self.ray_sources[source_index]
        pname = f": {rs.desc}" if rs.desc != "" else ""
        desc = f"Spectrum of {RaySource.abbr}{source_index}{pname} at z = {rs.pos[2]:.5g} mm"
        spec = LightSpectrum.render(wl, w, long_desc=desc, **kwargs)
        bar.finish()
        return spec

    def source_image(self, source_index: int = 0, limit: float = None, **kwargs) -> RenderImage:
        """Render the image of one source (reference :1332-1352)."""
        p, w, wl, extent, bar = self._hit_source("Source Image", source_index)
        rs = self.ray_sources[source_index]
        pname = f": {rs.desc}" if rs.desc != "" else ""
        desc = f"{RaySource.abbr}{source_index}{pname} at z = {rs.pos[2]:.5g} mm"
        img = RenderImage(long_desc=desc, extent=extent, projection=None)
        img.render(p, w, wl, limit=limit, **kwargs)
        bar.finish()
        return img

    # ------------------------------------------------------------------
    # iterative (megabatched) rendering (reference :1134-1279)

    def iterative_render(self, N, detector_index=0, limit=None,
                         projection_method="Equidistant", pos=None, extent=None) -> list:
        """Accumulate detector images over ITER_RAYS_STEP-sized traces."""
        if not self.ray_sources:
            raise RuntimeError("Ray Source(s) Missing.")
        if not self.detectors:
            raise RuntimeError("Detector(s) Missing.")
        if (N := int(N)) <= 0:
            raise ValueError(f"Ray number N_rays needs to be a positive int, but is {N}.")

        if pos is None:
            if isinstance(detector_index, list):
                raise ValueError("detector_index list needs to have the same length as pos list")
            pos = [self.detectors[detector_index].pos]
        elif isinstance(pos, list) and not isinstance(pos[0], (list, np.ndarray)):
            pos = [pos]

        if not isinstance(detector_index, list):
            detector_index = [detector_index] * len(pos)
        elif len(detector_index) != len(pos):
            raise ValueError("detector_index list needs to have the same length as pos list")
        if not isinstance(limit, list):
            limit = [limit] * len(pos)
        elif len(limit) != len(pos):
            raise ValueError("limit list needs to have the same length as pos list")
        if not isinstance(projection_method, list):
            projection_method = [projection_method] * len(pos)
        elif len(projection_method) != len(pos):
            raise ValueError("projection_method list needs to have the same length as pos list")
        if not isinstance(extent, list) or isinstance(extent[0], (int, float)):
            extent = [extent] * len(pos)
        elif len(extent) != len(pos):
            raise ValueError("extent list needs to have the same length as pos list")
        extentc = list(extent).copy()

        rays_step = self.ITER_RAYS_STEP
        iterations = max(1, int(N / rays_step))
        bar = ProgressBar("Rendering: ", iterations)

        DIm_res = []
        if self._pretrace_check(min(rays_step, N)):
            raise RuntimeError("Geometry checks failed. Tracing aborted. Check the warnings.")

        nt = len(self.tracing_surfaces) + 2
        msgs_cum = np.zeros((N_INFOS, nt), dtype=int)

        # batch 1 through the stored-section path: it determines the auto
        # extents and builds the RenderImage headers (reference :1247-1264)
        first_step = rays_step + (int(N - iterations * rays_step) if iterations == 1 else 0)
        with global_options.no_warnings(), global_options.no_progress_bar():
            self.trace(N=first_step)
            if self._msgs.shape == msgs_cum.shape:
                msgs_cum += self._msgs

        for j in range(len(pos)):
            self.detectors[detector_index[j]].move_to(pos[j])
            with global_options.no_progress_bar(), global_options.no_warnings():
                Imi = self.detector_image(detector_index=detector_index[j],
                                          extent=extentc[j], limit=limit[j], _dont_filter=True,
                                          projection_method=projection_method[j])
            Imi._data *= first_step / N
            DIm_res.append(Imi)
            extentc[j] = Imi._extent0
        bar.update()

        # remaining batches run the fused streaming path: one jitted
        # source→trace→detector-sink→bin step per batch, O(rays_step)
        # memory, no host round trip (VERDICT #3; SURVEY §2.10 megabatch)
        if iterations > 1:
            from ..parallel.render import make_fused_render_multi

            def build(nrays):
                # pos goes INTO the config so make_fused_render_multi moves
                # the detector before capturing each sink — one detector at
                # several positions must bind each position, not the last
                configs = [dict(detector_index=detector_index[j],
                                pos=pos[j],
                                extent=tuple(DIm_res[j].extent),
                                filter_extent=tuple(extentc[j]),
                                projection_method=projection_method[j],
                                Ny=DIm_res[j]._data.shape[0],
                                Nx=DIm_res[j]._data.shape[1])
                           for j in range(len(pos))]
                render, _ = make_fused_render_multi(self, nrays, configs)
                return jax.jit(render)

            step_fn = build(rays_step)
            base_key = jax.random.PRNGKey(0x17E7 + self._seed_counter)
            for i in range(1, iterations):
                ni = rays_step if i < iterations - 1 \
                    else rays_step + int(N - iterations * rays_step)
                if ni != rays_step:
                    step_fn = build(ni)
                imgs, infos = step_fn(jax.random.fold_in(base_key, i))
                for j in range(len(pos)):
                    DIm_res[j]._data += np.asarray(imgs[j], dtype=np.float64) * (ni / N)
                infos = np.asarray(infos, dtype=int)
                if infos.shape == msgs_cum.shape:
                    msgs_cum += infos
                bar.update()

        for i, DIm in enumerate(DIm_res):
            if limit[i] is not None:
                DIm._limit = limit[i]
                DIm._apply_rayleigh_filter()

        bar.finish()
        self._msgs = msgs_cum
        self._show_messages(N)
        return DIm_res

    # ------------------------------------------------------------------
    # huge renders: fused streaming megabatches, optionally sharded over a
    # device mesh and checkpointed (exceeds the reference, whose only
    # out-of-core mode re-materializes all sections per batch, :1134-1279)

    def render_huge(self, N, detector_index: int = 0, extent=None,
                    limit: float = None, projection_method: str = "Equidistant",
                    batch_size: int = None, mesh=None,
                    checkpoint_path: str = None, checkpoint_every: int = 10) -> RenderImage:
        """Render a detector image from up to 10⁸⁺ rays in O(batch) memory.

        Each batch is one jitted source→trace→detector-sink→bin step; no
        ray sections are ever stored. With ``mesh`` the batch is sharded
        over the device mesh and tiles are psum-merged; with
        ``checkpoint_path`` progress is saved every ``checkpoint_every``
        batches and resumes exactly (same per-batch threefry keys).

        :param extent: fixed image extent; defaults to the detector
            surface extent (auto-extent would need a host round trip)
        :return: accumulated RenderImage
        """
        if not self.detectors:
            raise RuntimeError("Detector(s) Missing.")
        if (N := int(N)) <= 0:
            raise ValueError(f"Ray number N needs to be a positive int, but is {N}.")
        if self._pretrace_check(min(N, self.ITER_RAYS_STEP)):
            raise RuntimeError("Geometry checks failed. Tracing aborted. Check the warnings.")

        from ..parallel.render import make_fused_render_multi, make_sharded_render
        from ..parallel.checkpoint import RenderCheckpoint

        batch = int(batch_size) if batch_size else min(N, self.ITER_RAYS_STEP)
        n_batches = max(1, -(-N // batch))

        detector = self.detectors[detector_index]
        dsurf = detector.surface
        ext = tuple(dsurf.extent[:4]) if extent is None else tuple(extent)

        pname = f": {detector.desc}" if detector.desc != "" else ""
        desc = f"{Detector.abbr}{detector_index}{pname} at z = {detector.pos[2]:.5g} mm"
        img = RenderImage(long_desc=desc, extent=np.asarray(ext, dtype=np.float64),
                          projection=projection_method
                          if isinstance(dsurf, SphericalSurface) else None)
        img.render(limit=limit, _dont_filter=True)   # fix extent, alloc zeros
        Ny, Nx, _ = img._data.shape

        if mesh is not None:
            step, _ = make_sharded_render(self, batch, mesh=mesh,
                                          detector_index=detector_index,
                                          extent=tuple(img.extent), Nx=Nx, Ny=Ny,
                                          projection_method=projection_method)
        else:
            render, _ = make_fused_render_multi(
                self, batch, [dict(detector_index=detector_index,
                                   extent=tuple(img.extent),
                                   projection_method=projection_method,
                                   Nx=Nx, Ny=Ny)])
            inner = jax.jit(render)

            def step(key):
                imgs, _ = inner(key)
                return imgs[0]

        ck = RenderCheckpoint(checkpoint_path, n_batches)
        bar = ProgressBar("Rendering: ", n_batches - ck.done)
        for i in ck.remaining():
            ck.add(step(ck.key(i)))
            if checkpoint_path and (i % checkpoint_every == checkpoint_every - 1):
                ck.save()
            bar.update()
        if checkpoint_path:
            ck.save()
        bar.finish()

        img._data += ck.image()
        if limit is not None:
            img._apply_rayleigh_filter()
        return img

    # ------------------------------------------------------------------
    # focus search — device-vectorized cost sweeps (analysis/focus.py);
    # parity with reference raytracer.py:1354-1632, different engine:
    # every candidate plane is a vmap lane instead of a thread-pool task

    def _focus_bracket(self, z_start: float) -> list:
        """Search interval: the gap between neighboring tracing surfaces
        (or source/outline limits) that contains z_start."""
        tops = np.array([s.z_max for s in self.tracing_surfaces])
        beyond = tops > z_start
        k = int(np.argmax(beyond)) if beyond.any() else len(tops)
        lo = float(tops[k - 1]) if k \
            else self.N_EPS + max(rs.extent[5] for rs in self.ray_sources)
        hi = float(self.tracing_surfaces[k].z_min) if k < len(tops) \
            else self.outline[5] - self.N_EPS
        return [lo, hi]

    def _focus_ray_lines(self, bounds, source_index):
        """Reduce stored ray sections to transverse lines q(z) = q0 + m*z.

        Picks, per ray, the last stored section at or before the bracket
        start; rays that never reach it are dropped.
        """
        lo_i, hi_i = (0, self.rays.N) if source_index is None \
            else self.rays.B_list[source_index:source_index + 2]

        # f32-aware probe: stored section z carries ~eps·|z| noise, so a
        # section sitting exactly on the bound must count as before it
        z_probe = bounds[0] + max(1e-4 * max(1.0, abs(bounds[0])), self.N_EPS)
        crossed = z_probe < self.rays.p_list[lo_i:hi_i, :, 2]
        seg = np.argmax(crossed, axis=1) - 1    # all-False rows give -1
        usable = seg >= 0

        select = np.zeros(self.rays.N, dtype=bool)
        select[lo_i:hi_i] = usable
        p, s, _, w, _, _, _ = self.rays.rays_by_mask(select, seg[usable],
                                                     ret=[1, 1, 0, 1, 0, 0, 0])
        m = s[:, :2] / s[:, 2:3]
        q0 = p[:, :2] - m * p[:, 2:3]
        return q0, m, w

    def focus_search(self, method: str, z_start: float, source_index: int = None,
                     return_cost: bool = False):
        """Find the focus along z near z_start.

        :return: (scipy OptimizeResult, dict(pos, bounds, z, cost, N))
        """
        if not (self.outline[4] <= z_start <= self.outline[5]):
            raise ValueError(f"Starting position z_start={z_start} outside raytracer "
                             f"z-outline range {self.outline[4:]}.")
        if method not in self.focus_search_methods:
            raise ValueError(f"Invalid method '{method}', should be one of {self.focus_search_methods}.")
        if not self.rays.N:
            raise RuntimeError("No rays traced.")
        if source_index is not None and source_index < 0:
            raise IndexError(f"source_index needs to be >= 0, but is {source_index}")
        if (source_index is not None and source_index > len(self.rays.N_list)) or len(self.rays.N_list) == 0:
            raise IndexError(f"source_index={source_index} larger than number of simulated sources.")
        if not self.check_if_rays_are_current():
            raise RuntimeError("Tracing geometry/properties changed. Please retrace first.")

        bounds = self._focus_bracket(z_start)
        q0, m, w = self._focus_ray_lines(bounds, source_index)

        N_use = q0.shape[0]
        if N_use < 1000:
            warning(f"WARNING: Less than 1000 rays for focus_search ({N_use}).")
        if N_use <= 1:
            return scipy.optimize.OptimizeResult(), \
                dict(pos=[np.nan, np.nan, np.nan], bounds=bounds,
                     z=np.full(focus.SWEEP_SAMPLES, np.nan),
                     cost=np.full(focus.SWEEP_SAMPLES, np.nan), N=N_use)

        n_px = focus.histogram_side(N_use)
        if method == "RMS Spot Size":
            z_best = focus.rms_focus_direct(q0, m, w, bounds)
        else:
            z_best = focus.minimize_on_interval(q0, m, w, bounds, method, n_px)

        res = scipy.optimize.OptimizeResult()
        res.x = z_best
        res.fun = float(focus.cost_sweep(jnp.asarray([z_best]), jnp.asarray(q0),
                                         jnp.asarray(m), jnp.asarray(w),
                                         method, n_px)[0])

        margin = 10 * (bounds[1] - bounds[0]) / focus.SWEEP_SAMPLES
        if min(z_best - bounds[0], bounds[1] - z_best) < margin:
            warning("Found minimum near search bounds, "
                    "this can mean the focus is outside of the search range.")

        r = vals = None
        if return_cost:
            r = np.linspace(bounds[0], bounds[1], focus.SWEEP_SAMPLES)
            vals = np.asarray(focus.cost_sweep(jnp.asarray(r), jnp.asarray(q0),
                                               jnp.asarray(m), jnp.asarray(w),
                                               method, n_px))

        pos_avg = tuple(np.average(q0 + m * z_best, axis=0, weights=w)) + (z_best,)
        return res, dict(pos=pos_avg, bounds=bounds, z=r, cost=vals, N=N_use)
