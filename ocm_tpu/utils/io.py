"""Data ingest and experiment-artifact I/O.

Covers the reference's data layer:

- cheese FTIR .mat structs: ``Xtr``/``Xts`` struct arrays with ``data`` and
  ``class`` fields, labels shifted to 0-based (``data_cheese.py:22-45``,
  ``simca_new_cheese.py:12-25``);
- SWIR hyperspectral cubes -> per-object pixel spectra: background masking by
  mean intensity, 8-connected component labeling, per-object extraction
  (``nut_data.py:65-71,131-160``);
- the HDF5 object store schema ``<class>/img_<i>/obj_<j>/spectra`` with
  n_pixels/centroid/img_idx/... attrs (``nut_data.py:146-185``), reader shaped
  like the consumer in ``vae_bce_nut.py:65-76``;
- per-run artifact JSONs: params.json / losses.json / metrics.json
  (``utils/final_vaesimca.py:316-322,449,593-604``).

h5py and scipy are imported lazily so the compute path has no hard
dependency on them.
"""

from __future__ import annotations

import json
import os
from typing import Mapping, Optional

import numpy as np


# ---------------------------------------------------------------------------
# Cheese FTIR (.mat)
# ---------------------------------------------------------------------------

def load_cheese_mat(path: str):
    """-> (x_train, y_train, x_test, y_test); labels 0-based ints
    (data_cheese.py:22-45)."""
    import scipy.io

    raw = scipy.io.loadmat(path)
    out = []
    for key in ("Xtr", "Xts"):
        struct = raw[key]
        fields = {name: struct[0][0][i]
                  for i, name in enumerate(struct.dtype.names)}
        x = np.asarray(fields["data"], dtype=np.float64)
        y = np.squeeze(fields["class"][0][0]).astype(int) - 1
        out += [x, y]
    return tuple(out)


def cheese_wavelengths(n: int):
    """FTIR axis 2500-4000 cm^-1 (data_cheese.py:53)."""
    return np.linspace(2500.0, 4000.0, n)


# ---------------------------------------------------------------------------
# HSI object extraction (nut_data.py)
# ---------------------------------------------------------------------------

def extract_objects(cube, background_threshold: float,
                    min_pixels: int = 1):
    """Segment one hyperspectral cube (H, W, L) into per-object spectra.

    Background = mean intensity over wavelengths below the threshold
    (nut_data.py:65-66); objects = 8-connected components of the foreground
    (nut_data.py:69-71).  Returns a list of dicts with 'spectral_data'
    (n_pixels, L), 'mean_spectrum', 'centroid', 'n_pixels'.
    """
    from scipy import ndimage

    cube = np.asarray(cube)
    foreground = np.mean(cube, axis=2) >= background_threshold
    labeled, n_objects = ndimage.label(foreground,
                                       structure=np.ones((3, 3), dtype=int))
    objects = []
    for obj_idx in range(1, n_objects + 1):
        mask = labeled == obj_idx
        n_pixels = int(mask.sum())
        if n_pixels < min_pixels:
            continue
        spectra = np.ascontiguousarray(cube[mask], dtype=np.float32)
        coords = np.argwhere(mask)
        objects.append({
            "spectral_data": spectra,
            "mean_spectrum": spectra.mean(axis=0),
            "centroid": tuple(np.mean(coords, axis=0).tolist()),
            "n_pixels": n_pixels,
            "obj_idx": obj_idx,
        })
    return objects


def write_object_store(path: str, data: Mapping[str, list],
                       compression: Optional[str] = "gzip") -> None:
    """Write the HDF5 schema ``<class>/img_<i>/obj_<j>/spectra``
    (nut_data.py:146-185).  ``data`` maps class -> list of images, each a
    list of object dicts from ``extract_objects``."""
    import h5py

    with h5py.File(path, "w") as h5f:
        for cls, images in data.items():
            for img_idx, objects in enumerate(images):
                for obj in objects:
                    grp = h5f.require_group(
                        f"{cls}/img_{img_idx}/obj_{obj['obj_idx']}")
                    spec = np.ascontiguousarray(obj["spectral_data"],
                                                dtype=np.float32)
                    kw = {"compression": compression,
                          "compression_opts": 4} if compression else {}
                    grp.create_dataset("spectra", data=spec, **kw)
                    grp.attrs["n_pixels"] = int(spec.shape[0])
                    grp.attrs["centroid"] = obj["centroid"]
                    grp.attrs["img_idx"] = img_idx
                    grp.attrs["nut_type"] = cls
                    grp.attrs["obj_idx"] = int(obj["obj_idx"])
                    grp.attrs["mean_spectrum"] = np.asarray(
                        obj["mean_spectrum"], dtype=np.float32)


def read_object_store(path: str, classes=None):
    """Read the HDF5 object store back into the ``object_aware_splits``
    input shape: class -> list of {'spectral_data': array} (one entry per
    object, images flattened; vae_bce_nut.py:65-76)."""
    import h5py

    out = {}
    with h5py.File(path, "r") as h5f:
        names = list(classes) if classes is not None else list(h5f.keys())
        for cls in names:
            objs = []
            grp = h5f[cls]
            for img_key in sorted(grp.keys()):
                img = grp[img_key]
                for obj_key in sorted(img.keys()):
                    objs.append({
                        "spectral_data": np.asarray(img[obj_key]["spectra"]),
                        **dict(img[obj_key].attrs),
                    })
            out[cls] = objs
    return out


# ---------------------------------------------------------------------------
# Run artifacts (params/losses/metrics JSON)
# ---------------------------------------------------------------------------

def _to_jsonable(obj):
    if isinstance(obj, Mapping):
        return {str(k): _to_jsonable(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [_to_jsonable(v) for v in obj]
    if isinstance(obj, np.ndarray):
        return obj.tolist()
    if isinstance(obj, (np.floating, np.integer)):
        return obj.item()
    if hasattr(obj, "item") and not isinstance(obj, (str, bytes)):
        try:
            return obj.item()
        except Exception:
            pass
    return obj


def save_json(payload, run_dir: str, name: str) -> str:
    """Write one artifact JSON into a run directory
    (utils/final_vaesimca.py:316-322 pattern)."""
    os.makedirs(run_dir, exist_ok=True)
    path = os.path.join(run_dir, name)
    with open(path, "w") as f:
        json.dump(_to_jsonable(payload), f, indent=2)
    return path


def load_json(run_dir: str, name: str):
    with open(os.path.join(run_dir, name)) as f:
        return json.load(f)
