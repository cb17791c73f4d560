"""HSI object extraction -> HDF5 store (reference nut_data.py / C15):
background masking by mean intensity, 8-connected component labeling,
per-object spectra extraction and the <class>/img_<i>/obj_<j>/spectra
schema with attrs.

    python examples/nut_data_prep.py --out-path out/nuts.h5
        [--mat-dir DIR --background-threshold 0.1]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__))
                if "__file__" in globals() else os.getcwd())
import _bootstrap  # noqa: E402,F401  repo root on sys.path + TPU-outage CPU fallback


def main(out_path="out/nuts.h5", mat_dir=None, background_threshold=0.1,
         n_images=2):
    from ocm_tpu.utils.io import extract_objects, write_object_store

    data = {}
    if mat_dir:
        # real SWIR cubes: one .mat per image, field name carries nut type
        import scipy.io

        for fname in sorted(os.listdir(mat_dir)):
            if not fname.endswith(".mat"):
                continue
            raw = scipy.io.loadmat(os.path.join(mat_dir, fname))
            for key, cube in raw.items():
                if key.startswith("_"):
                    continue
                nut = next((n for n in ("almond", "cashew", "hazelnut",
                                        "peanut", "walnut")
                            if n in key.lower()), None)
                if nut is None:
                    continue
                data.setdefault(nut, []).append(
                    extract_objects(cube, background_threshold))
    else:
        import _synthetic

        for i, nut in enumerate(_synthetic.NUT_TYPES):
            images = []
            for img in range(n_images):
                cube = _synthetic.nut_cube(seed=100 * i + img, nut_idx=i)
                images.append(extract_objects(cube, background_threshold))
            data[nut] = images

    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    write_object_store(out_path, data)
    counts = {nut: sum(len(objs) for objs in imgs)
              for nut, imgs in data.items()}
    print(f"wrote {out_path}: objects per class = {counts}")
    return counts


if __name__ == "__main__":
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--out-path", default="out/nuts.h5")
    p.add_argument("--mat-dir", default=None)
    p.add_argument("--background-threshold", type=float, default=0.1)
    p.add_argument("--n-images", type=int, default=2)
    main(**vars(p.parse_args()))
