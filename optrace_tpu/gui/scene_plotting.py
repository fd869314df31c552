"""3D scene rendering for the GUI (reference optrace/gui/_scene_plotting.py).

Renders the raytracer geometry and traced rays into a matplotlib 3D axes:
lens/detector/aperture/filter surface meshes from Surface.plotting_mesh,
element side cylinders, the outline box, markers, volumes and a random
subset of ray polylines colored by the selected mode. Ray picking returns
the reference's info-text content for a ray section.
"""

import numpy as np
import matplotlib
import matplotlib.pyplot as plt
from mpl_toolkits.mplot3d.art3d import Line3DCollection

from ..geometry import Lens, IdealLens, Filter, Aperture, Detector, RaySource
from ..geometry.marker import PointMarker, LineMarker
from ..geometry.point import Point
from ..geometry.line import Line
from .. import color as ocolor


class ScenePlotting:

    MAX_RAYS_SHOWN: int = 10000
    SURFACE_RES: int = 30

    coloring_modes: list = ['Plain', 'Power', 'Wavelength', 'Source',
                            'Polarization xz', 'Polarization yz', 'Refractive Index']

    def __init__(self, gui, raytracer, initial_camera: dict = None) -> None:
        self.gui = gui
        self.raytracer = raytracer
        self.fig = None
        self.ax = None
        self._ray_artist = None
        self._pick_artist = None
        self._initial_camera = initial_camera or {}
        self._ray_selection = np.array([], dtype=bool)

    # ------------------------------------------------------------------
    def init_scene(self) -> None:
        if self.fig is None:
            self.fig = plt.figure(figsize=(9, 7))
            self.ax = self.fig.add_subplot(111, projection="3d")
        self.ax.set_xlabel("x in mm")
        self.ax.set_ylabel("y in mm")
        self.ax.set_zlabel("z in mm")
        if self._initial_camera:
            self.gui.set_camera(**self._initial_camera)

    # ------------------------------------------------------------------
    def plot_outline(self) -> None:
        o = self.raytracer.outline
        # 12 box edges
        xs, xe, ys, ye, zs, ze = o
        for (a, b) in [((xs, ys, zs), (xe, ys, zs)), ((xs, ye, zs), (xe, ye, zs)),
                       ((xs, ys, ze), (xe, ys, ze)), ((xs, ye, ze), (xe, ye, ze)),
                       ((xs, ys, zs), (xs, ye, zs)), ((xe, ys, zs), (xe, ye, zs)),
                       ((xs, ys, ze), (xs, ye, ze)), ((xe, ys, ze), (xe, ye, ze)),
                       ((xs, ys, zs), (xs, ys, ze)), ((xe, ys, zs), (xe, ys, ze)),
                       ((xs, ye, zs), (xs, ye, ze)), ((xe, ye, zs), (xe, ye, ze))]:
            self.ax.plot([a[0], b[0]], [a[1], b[1]], [a[2], b[2]],
                         color="gray", lw=0.5, alpha=0.5)

    def _plot_surface_mesh(self, surf, color, alpha=0.6) -> None:
        if isinstance(surf, (Point, Line)):
            if isinstance(surf, Point):
                self.ax.scatter([surf.pos[0]], [surf.pos[1]], [surf.pos[2]], color=color)
            else:
                e = surf.extent
                self.ax.plot([e[0], e[1]], [e[2], e[3]], [surf.pos[2]] * 2, color=color)
            return
        try:
            X, Y, Z = surf.plotting_mesh(self.SURFACE_RES)
            Zm = np.ma.masked_invalid(Z)
            self.ax.plot_surface(X, Y, Zm, color=color, alpha=alpha,
                                 linewidth=0, antialiased=False)
        except Exception:
            xe, ye, ze = surf.edge(50)
            self.ax.plot(xe, ye, ze, color=color)

    def plot_elements(self) -> None:
        minimalistic = bool(self.gui.minimalistic_view)
        for el in self.raytracer.elements:
            if isinstance(el, (Lens, IdealLens)):
                c = "#2277cc"
            elif isinstance(el, Aperture):
                c = "#222222"
            elif isinstance(el, Filter):
                fc = el.color()
                c = fc[:3]
            elif isinstance(el, Detector):
                c = "#cccc33"
            elif isinstance(el, RaySource):
                c = "#cc3333"
            elif isinstance(el, (PointMarker, LineMarker)):
                self._plot_marker(el)
                continue
            else:   # volumes
                c = el.color[:3] if getattr(el, "color", None) else "#888888"
                self._plot_surface_mesh(el.front, c, alpha=getattr(el, "opacity", 0.2))
                if el.has_back():
                    self._plot_surface_mesh(el.back, c, alpha=getattr(el, "opacity", 0.2))
                continue

            self._plot_surface_mesh(el.front, c)
            if el.has_back():
                self._plot_surface_mesh(el.back, c)
            if not self.gui.hide_labels and not minimalistic:
                pos = el.pos
                self.ax.text(pos[0], pos[1], pos[2], el.get_desc(), fontsize=7,
                             rotation=90 if self.gui.vertical_labels else 0)

    def _plot_marker(self, m) -> None:
        if isinstance(m, PointMarker):
            if not m.label_only:
                self.ax.scatter([m.pos[0]], [m.pos[1]], [m.pos[2]],
                                color="w" if self.gui.high_contrast else "k",
                                s=20 * m.marker_factor)
            if not self.gui.hide_labels:
                self.ax.text(m.pos[0], m.pos[1], m.pos[2], m.get_desc(),
                             fontsize=7 * m.text_factor)
        else:
            e = m.front.extent
            self.ax.plot([e[0], e[1]], [e[2], e[3]], [m.pos[2]] * 2,
                         lw=m.line_factor, color="gray")
            if not self.gui.hide_labels:
                self.ax.text(m.pos[0], m.pos[1], m.pos[2], m.get_desc(),
                             fontsize=7 * m.text_factor)

    def plot_fault_markers(self) -> None:
        fp = self.raytracer.fault_pos
        if len(fp):
            self.ax.scatter(fp[:, 0], fp[:, 1], fp[:, 2], color="red", marker="x", s=40)

    # ------------------------------------------------------------------
    def _ray_colors(self, sel, mode):
        """per-ray RGB colors according to the coloring mode
        (reference _scene_plotting.py:966-1084)."""
        rays = self.raytracer.rays
        N_sel = int(np.count_nonzero(sel))
        if mode == "Plain":
            return np.tile([[0.8, 0.8, 0.8]], (N_sel, 1))
        if mode == "Wavelength":
            wl = rays.wl_list[sel]
            rgba = np.asarray(ocolor.spectral_colormap(wl))
            return rgba[:, :3]
        if mode == "Power":
            w = rays.w_list[sel, 0]
            t = w / max(w.max(), 1e-30)
            cmap = matplotlib.colormaps["viridis"]
            return cmap(t)[:, :3]
        if mode == "Source":
            _, _, _, _, _, sn, _ = rays.rays_by_mask(sel, ret=[0, 0, 0, 0, 0, 1, 0])
            cmap = matplotlib.colormaps["tab10"]
            return cmap(sn % 10)[:, :3]
        if mode in ("Polarization xz", "Polarization yz"):
            comp = 0 if mode == "Polarization xz" else 1
            pol = rays.pol_list[sel, 0]
            t = np.abs(pol[:, comp])
            t = np.nan_to_num(t)
            cmap = matplotlib.colormaps["coolwarm"]
            return cmap(t)[:, :3]
        if mode == "Refractive Index":
            n0 = rays.n_list[sel, 0]
            rng = n0.max() - n0.min()
            t = (n0 - n0.min()) / rng if rng else np.zeros_like(n0)
            cmap = matplotlib.colormaps["plasma"]
            return cmap(t)[:, :3]
        return np.tile([[0.8, 0.8, 0.8]], (N_sel, 1))

    def plot_rays(self, mask: np.ndarray = None, max_show: int = None) -> None:
        rays = self.raytracer.rays
        if not rays.N:
            return
        max_show = max_show if max_show is not None else self.gui.rays_visible
        max_show = min(max_show, self.MAX_RAYS_SHOWN)

        rng = np.random.default_rng(0)
        base = np.ones(rays.N, dtype=bool) if mask is None else mask.copy()
        idx = np.where(base)[0]
        if idx.shape[0] > max_show:
            idx = rng.choice(idx, size=max_show, replace=False)
        sel = np.zeros(rays.N, dtype=bool)
        sel[idx] = True
        self._ray_selection = sel

        p = rays.p_list[sel]          # (n, nt, 3)
        segments = p[:, :, [0, 1, 2]]
        colors = self._ray_colors(sel, self.gui.coloring_mode)

        if self._ray_artist is not None:
            try:
                self._ray_artist.remove()
            except Exception:
                pass
        lc = Line3DCollection(segments, colors=colors,
                              linewidths=self.gui.ray_width,
                              alpha=float(np.clip(self.gui.ray_opacity, 1e-5, 1.0)))
        self.ax.add_collection3d(lc)
        self._ray_artist = lc

    # ------------------------------------------------------------------
    def ray_info_text(self, index: int, section: int = 0) -> str:
        """info text of one ray section (reference picking text)."""
        rays = self.raytracer.rays
        p, s, pol, w, wl, snum, n = rays.rays_by_mask(
            np.arange(rays.N) == index, None, ret=[1, 1, 1, 1, 1, 1, 1])
        sec = min(section, rays.Nt - 1)
        txt = (f"Ray {index} from Source RS{snum[0]}\n"
               f"Section {sec}\n"
               f"position: ({p[0, sec, 0]:.5g} mm, {p[0, sec, 1]:.5g} mm, {p[0, sec, 2]:.5g} mm)\n"
               f"direction: ({s[0, sec, 0]:.5f}, {s[0, sec, 1]:.5f}, {s[0, sec, 2]:.5f})\n"
               f"wavelength: {wl[0]:.2f} nm\n"
               f"power: {w[0, sec]:.3e} W\n"
               f"refractive index: {n[0, sec]:.5f}")
        return txt

    def highlight_ray(self, index: int, section: int = None) -> None:
        rays = self.raytracer.rays
        p = rays.p_list[index]
        if self._pick_artist is not None:
            try:
                self._pick_artist.remove()
            except Exception:
                pass
        if section is None:
            self._pick_artist, = self.ax.plot(p[:, 0], p[:, 1], p[:, 2],
                                              color="red", lw=2.5)
        else:
            self._pick_artist = self.ax.scatter([p[section, 0]], [p[section, 1]],
                                                [p[section, 2]], color="red", s=60)

    def clear_picking(self) -> None:
        if self._pick_artist is not None:
            try:
                self._pick_artist.remove()
            except Exception:
                pass
            self._pick_artist = None

    # ------------------------------------------------------------------
    def replot(self) -> None:
        assert self.ax is not None, "init_scene() first"
        self.ax.clear()
        self._ray_artist = None
        self._pick_artist = None
        self.ax.set_xlabel("x in mm")
        self.ax.set_ylabel("y in mm")
        self.ax.set_zlabel("z in mm")
        if self.gui.high_contrast:
            self.ax.set_facecolor("black")
        self.plot_outline()
        self.plot_elements()
        self.plot_fault_markers()
        self.plot_rays()
        o = self.raytracer.outline
        self.ax.set_xlim(o[0], o[1])
        self.ax.set_ylim(o[2], o[3])
        self.ax.set_zlim(o[4], o[5])
