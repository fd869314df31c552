"""One-time generator for optrace_tpu/resources/cie_data.npz.

The arrays stored here are *international-standard CIE datasets* (not code):

- CIE 1931 2° colour-matching functions, 1 nm (CIE 2018,
  DOI:10.25039/CIE.DS.xvudnb9b)
- CIE standard illuminant SPDs A, C, D50–D75, E-range companions, F2/F7/F11
  (CIE Colorimetry 3rd ed., 2004) and the CIE LED illuminant set
  (DOI:10.25039/CIE.DS.vgssnyfg)

They are read from the CSV copies shipped with the MIT-licensed reference
package (which itself cites the DOIs above in resources/SOURCE.txt) and
re-stored as a compressed binary for fast load. Run from the repo root:

    python tools/make_cie_data.py
"""

import csv
import pathlib

import numpy as np

REF = pathlib.Path("/root/reference/optrace/resources")
OUT = pathlib.Path(__file__).resolve().parent.parent / "optrace_tpu" / "resources" / "cie_data.npz"


def read_csv(path):
    with open(path, newline="") as fh:
        rows = list(csv.reader(fh))
    header = rows[0]
    data = []
    for row in rows[1:]:
        data.append([float(v) if v != "" else np.nan for v in row])
    return header, np.asarray(data, dtype=np.float64)


def main():
    obs_header, obs = read_csv(REF / "observers.csv")
    assert obs_header[0].lower().startswith("wavelength")
    obs_wl = obs[:, 0]
    xyz_bar = obs[:, 1:4].T          # (3, n_wl)

    ill_header, ill = read_csv(REF / "illuminants.csv")
    ill_wl = ill[:, 0]
    names = [h.strip() for h in ill_header[1:]]
    spds = ill[:, 1:].T              # (n_ill, n_wl), nan where undefined

    np.savez_compressed(
        OUT,
        observer_wl=obs_wl.astype(np.float32),
        observer_xyz=xyz_bar.astype(np.float32),
        illuminant_wl=ill_wl.astype(np.float32),
        illuminant_names=np.array(names),
        illuminant_spds=spds.astype(np.float32),
    )
    print(f"wrote {OUT}: observers {xyz_bar.shape} @ {obs_wl[0]}-{obs_wl[-1]}nm, "
          f"illuminants {spds.shape} ({names})")


if __name__ == "__main__":
    main()
