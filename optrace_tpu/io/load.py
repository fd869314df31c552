"""ZEMAX file import.

Behavioral parity with reference ``optrace/tracer/load.py``:
- load_agf: .agf glass catalogs → dict[name, RefractionIndex]; 13 formula
  modes, coefficient padding, wavelength-range and Abbe-consistency checks
- load_zmx: sequential .zmx (MM units) → Group; STANDARD/EVENASPH surfaces,
  cemented-surface handling with 1e-7 offsets, STOP → RingSurface aperture,
  last surface → rectangular Detector

File format references: ZEMAX manual "THE ZMX FILE FORMAT" chapter and the
.agf format description (public documentation).
"""

import os.path

import numpy as np

from ..spectrum.refraction_index import RefractionIndex
from ..geometry import (Group, Lens, PointMarker, Detector, Aperture,
                        CircularSurface, ConicSurface, SphericalSurface,
                        RingSurface, AsphericSurface, Surface, RectangularSurface)
from ..presets import spectral_lines
from ..utils.warnings import warning

_agf_modes = ["Schott", "Sellmeier1", "Herzberger", "Sellmeier2", "Conrady", "Sellmeier3",
              "Handbook of Optics 1", "Handbook of Optics 2", "Sellmeier4", "Extended",
              "Sellmeier5", "Extended2", "Extended3"]
"""agf formula mode number (position+1) → dispersion model name"""


def _read_lines(path: str) -> list:
    """Read text lines with best-effort encoding detection."""
    if not os.path.isfile(path):
        raise FileNotFoundError(f"{path} not found/ is not a file.")
    with open(path, "rb") as f:
        raw = f.read()

    encodings = ["utf-8-sig", "utf-16", "latin-1"]
    try:
        import chardet
        det = chardet.detect(raw)
        if det.get("encoding"):
            encodings.insert(0, det["encoding"])
    except ImportError:
        pass

    for enc in encodings:
        try:
            text = raw.decode(enc)
            break
        except (UnicodeDecodeError, LookupError):
            continue
    else:     # pragma: no cover
        raise RuntimeError(f"Could not decode {path}.")
    lines = text.splitlines(keepends=True)
    if lines and lines[0].startswith("﻿"):
        lines[0] = lines[0][1:]
    return lines


def load_agf(path: str) -> dict:
    """Load an .agf material catalogue → dict[name, RefractionIndex]."""
    lines = _read_lines(path)
    n_dict = {}
    skip = False
    mode = name = None
    nc = V = None
    coeff = []

    for lin in lines:
        if lin[:2] == "NM":
            skip = False
            linw = lin.split()
            name = linw[1]
            ind = int(float(linw[2])) - 1
            if ind < 0 or ind > len(_agf_modes) - 1:
                warning(f"{name}: Unknown index formula mode number {ind + 1}, skipping.")
                skip = True
                continue
            mode = _agf_modes[ind]
            nc = float(linw[4])
            V = float(linw[5])

        elif lin[:2] == "CD" and not skip:
            coeff0 = [float(a) for a in lin.split()[1:]]
            cnt = RefractionIndex.coeff_count[mode]
            coeff = coeff0[0:cnt]
            coeff = coeff + [0.] * (cnt - len(coeff))

        elif lin[:2] == "LD" and not skip:
            try:
                n = RefractionIndex(mode, coeff=coeff, desc=name)
                linw = lin.split()[1:]
                wl0 = float(linw[0]) * 1000
                wl1 = float(linw[1]) * 1000
                if wl0 > spectral_lines.FdC[0] or wl1 < spectral_lines.FdC[2]:
                    warning(f"{name} wavelength range [{wl0}, {wl1}]nm does not overlap with "
                            f"testing wavelengths {spectral_lines.FdC}nm, skipping checks.")
                else:
                    nc1 = float(np.asarray(n(np.array([spectral_lines.d])))[0])
                    V1 = n.abbe_number(spectral_lines.FdC)
                    if np.abs(nc1 - nc) > 1e-4:
                        warning(f"{name}: Index from file is {nc}, but calculated index is {nc1}. "
                                "This can be due to different probe wavelengths.")
                    elif np.abs(V1 - V) > 0.3:
                        warning(f"{name}: The Abbe number from file is {V}, but calculated is {V1}. "
                                "This can be due to different probe wavelengths.")
                n_dict[name] = n
            except Exception as err:
                warning(f"Error for material {name}: " + str(err))
    return n_dict


def _make_surface(surf: dict):
    if surf["stype"] == "STANDARD":
        if np.isfinite(surf["R"]):
            if surf.get("k"):
                return ConicSurface(r=surf["r"], R=surf["R"], desc=surf["desc"], k=surf["k"])
            return SphericalSurface(r=surf["r"], R=surf["R"], desc=surf["desc"])
        return CircularSurface(r=surf["r"], desc=surf["desc"])
    if surf["stype"] == "EVENASPH":
        return AsphericSurface(r=surf["r"], desc=surf["desc"], R=surf["R"],
                               k=surf["k"], coeff=surf["parm"])
    raise RuntimeError("Surface mode " + str(surf["stype"]) + " not supported yet.")


def _zmx_to_surface_dicts(lines: list, n_dict: dict):
    Surfaces = []
    dds = []
    long_desc = ""
    n0 = None

    i = 0
    for i, l in enumerate(lines):
        if l[:4] == "NAME":
            long_desc = l[5:-1]
        elif l[:4] == "UNIT":
            unit1 = l.split()[1]
            if unit1 != "MM":
                raise RuntimeError(f"Unsupported Unit {unit1}.")
        elif l[:4] == "MODE":
            mode = l.split()[1]
            if mode != "SEQ":
                raise RuntimeError(f"Unsupported Mode {mode}.")
        elif l[:4] == "SURF":
            break
    i += 1

    surf_i = 0
    while i < len(lines):
        parm = [0.] * 10
        dd = 0
        surf = dict(stype="STANDARD", desc="", k=0, R=np.inf)
        while i + 1 < len(lines) and lines[i][:4] != "SURF":
            l = lines[i]
            if l[2:6] == "TYPE":
                surf["stype"] = l.split()[1]
            elif l[2:6] == "DIAM":
                surf["r"] = max(float(l.split()[1]), 1e-9)
            elif l[2:6] == "CONI":
                surf["k"] = float(l.split()[1])
            elif l[2:6] == "COMM":
                surf["desc"] = l[7:-1]
            elif l[2:6] == "COAT":
                warning(f"Coatings are not supported. Ignoring coating '{l[7:-1]}'.")
            elif l[2:6] == "STOP":
                surf["STOP"] = True
            elif l[2:6] == "CURV":
                rho = float(l.split()[1])
                surf["R"] = 1 / rho if rho else np.inf
            elif l[2:6] == "DISZ":
                dd = float(l.split()[1])
                dd = max(dd, 3 * Surface.N_EPS)
            elif l[2:6] == "PARM":
                ind, val = l.split()[1:3]
                parm[int(float(ind)) - 1] = float(val)
            elif l[2:6] == "GLAS":
                material = l.split()[1]
                nc, V = [float(a) for a in l.split()[4:6]] if len(l.split()) > 6 else [None, None]
                if material == "___BLANK":
                    surf["n"] = RefractionIndex("Abbe", n=nc, V=V)
                elif material not in n_dict.keys():
                    if nc is not None and V is not None and nc > 1 and V > 0:
                        surf["n"] = RefractionIndex("Abbe", n=nc, V=V)
                    else:
                        raise RuntimeError(f"Material {material} missing in n_dict parameter.")
                else:
                    surf["n"] = n_dict[material]
            i += 1

        # zeroth surface with infinite distance defines the ambient medium
        if surf_i == 0 and not np.isfinite(dd):
            n0 = surf["n"] if "n" in surf else RefractionIndex("Constant", n=1)
        else:
            surf["parm"] = parm
            Surfaces.append(surf)
            dds.append(dd)
        surf_i += 1
        i += 1

    return Surfaces, dds, n0, long_desc


def _surface_dicts_to_geometry(Surfaces, dds, n0, long_desc, no_marker) -> Group:
    G = Group(long_desc=long_desc, n0=n0)

    i = 0
    while i < len(Surfaces) and "n" not in Surfaces[i]:
        i += 1
    z = 0

    rmax = 0
    for s in Surfaces:
        if "r" in s and s["r"] > rmax:
            rmax = s["r"]
    for s in Surfaces:
        if "r" not in s:
            s["r"] = rmax

    while i < len(Surfaces):
        if "n" not in Surfaces[i]:
            if i + 1 == len(Surfaces) and "r" in Surfaces[i]:
                # last passive surface becomes a square detector
                r = Surfaces[i]["r"]
                DET = Detector(RectangularSurface(dim=[2 * r, 2 * r]),
                               pos=[0, 0, z], desc=Surfaces[i]["desc"])
                G.add(DET)
            elif "STOP" in Surfaces[i]:
                surf = Surfaces[i]
                r = max(G.extent[1] - G.extent[0], G.extent[3] - G.extent[2]) / 2
                r = max(surf["r"] + 1, r)
                ap = Aperture(RingSurface(ri=surf["r"], r=r),
                              pos=[0, 0, z], desc=Surfaces[i]["desc"])
                G.add(ap)
            z += dds[i]
            i += 1
            continue

        surf1 = _make_surface(Surfaces[i])
        surf2 = _make_surface(Surfaces[i + 1])

        # cemented surfaces: the shared surface belongs to both lenses, the
        # next lens starts 1e-7 behind it (reference load.py:320-415)
        n2 = Surfaces[i]["n"] if "n" in Surfaces[i + 1] else RefractionIndex("Constant", n=1)
        L = Lens(surf1, surf2, n=Surfaces[i]["n"], pos=[0, 0, z], d1=0, d2=dds[i],
                 n2=n2, desc=Surfaces[i]["desc"])
        G.add(L)

        if "n" in Surfaces[i + 1]:
            z += dds[i] + 1e-7
            i += 1
        else:
            z += dds[i] + dds[i + 1]
            i += 2

    if G.long_desc != "" and not no_marker:
        ext = G.extent
        ym = np.mean(ext[2:4])
        zm = np.mean(ext[4:6])
        xm = ext[0] - 1.5
        G.add(PointMarker(G.long_desc, [xm, ym, zm], label_only=True))
    return G


def load_zmx(filename: str, n_dict: dict = None, no_marker: bool = False) -> Group:
    """Load a sequential ZEMAX .zmx geometry (MM units) into a Group."""
    lines = _read_lines(filename)
    n_dict = n_dict or {}
    Surfaces, dds, n0, long_desc = _zmx_to_surface_dicts(lines, n_dict)
    return _surface_dicts_to_geometry(Surfaces, dds, n0, long_desc, no_marker)
