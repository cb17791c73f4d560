"""Hand-authored MATLAB v7.3 fixture writer — byte-faithful to the real
on-disk layout MATLAB produces, NOT to what ``scipy.io.savemat`` or a
naive h5py dump produces.

The real files the reference consumes (IR_ML.mat struct arrays,
data_cheese.py:22-42; SWIR cubes, nut_data.py:11-25) are unavailable in
this environment, so these fixtures replicate MATLAB's documented/observed
v7.3 quirks instead:

- a 512-byte userblock: 116 bytes of descriptive text, an 8-byte
  subsystem-data offset, the version word 0x0200 and the ``IM`` endian
  marker at offsets 124-127 (exactly the bytes scipy reads before raising
  NotImplementedError for v7.3);
- every variable carries a ``MATLAB_class`` attribute
  (double/single/intN/char/logical/cell/struct);
- datasets are COLUMN-major: HDF5 dims are the reverse of MATLAB dims;
- char arrays are uint16 code units with ``MATLAB_int_decode=2``;
- logicals are uint8 with ``MATLAB_int_decode=1``;
- empty arrays store their DIMS vector as uint64 data plus
  ``MATLAB_empty=1``;
- cell arrays are object-reference datasets whose elements live under the
  hidden ``#refs#`` group;
- structs are groups with a ``MATLAB_fields`` attribute (vlen arrays of
  char codes); struct-ARRAY fields (incl. the 1x1 case MATLAB emits when
  a file also holds cells) are (n, 1) reference datasets into ``#refs#``,
  not direct child datasets.
"""

import numpy as np

_INT_CLASSES = {
    np.dtype(np.float64): b"double", np.dtype(np.float32): b"single",
    np.dtype(np.int8): b"int8", np.dtype(np.uint8): b"uint8",
    np.dtype(np.int16): b"int16", np.dtype(np.uint16): b"uint16",
    np.dtype(np.int32): b"int32", np.dtype(np.uint32): b"uint32",
    np.dtype(np.int64): b"int64", np.dtype(np.uint64): b"uint64",
}


class Cell(list):
    """A MATLAB cell array; elements are any supported value."""


class Struct(dict):
    """A 1x1 MATLAB struct with fields written as DIRECT child datasets
    (the layout MATLAB uses for scalar structs in cell-free files)."""


class StructArray(list):
    """An (n, 1) MATLAB struct array: list of dicts with identical keys.
    Fields are written as (n, 1) reference datasets into ``#refs#`` —
    the indirection MATLAB also applies to 1x1 structs whenever the file
    contains any cell array."""


class Empty:
    """An empty MATLAB array of the given dims, e.g. ``Empty((0, 3))``."""

    def __init__(self, dims=(0, 0), mat_class=b"double"):
        self.dims = tuple(int(d) for d in dims)
        self.mat_class = mat_class


def _fields_attr(names):
    """MATLAB_fields: vlen arrays of single-char codes."""
    import h5py

    dt = h5py.vlen_dtype(np.dtype("S1"))
    out = np.empty(len(names), dtype=dt)
    for i, n in enumerate(names):
        out[i] = np.frombuffer(n.encode("ascii"), dtype="S1")
    return out


def _write_value(parent, name, value, refs):
    """Write one MATLAB value under ``parent[name]``; returns the node."""
    import h5py

    if isinstance(value, Empty):
        ds = parent.create_dataset(
            name, data=np.asarray(value.dims, dtype=np.uint64))
        ds.attrs["MATLAB_class"] = np.bytes_(value.mat_class)
        ds.attrs["MATLAB_empty"] = np.uint8(1)
        return ds
    if isinstance(value, str):
        codes = np.array([ord(c) for c in value], dtype=np.uint16)
        # MATLAB char 'abc' is 1x3 -> HDF5 dims (3, 1)
        ds = parent.create_dataset(name, data=codes.reshape(-1, 1))
        ds.attrs["MATLAB_class"] = np.bytes_(b"char")
        ds.attrs["MATLAB_int_decode"] = np.int32(2)
        return ds
    if isinstance(value, Cell):
        ref_arr = np.empty((len(value), 1), dtype=object)
        for i, elem in enumerate(value):
            tgt = _write_value(refs, f"e{len(refs)}_{i}", elem, refs)
            ref_arr[i, 0] = tgt.ref
        ds = parent.create_dataset(name, shape=(len(value), 1),
                                   dtype=h5py.ref_dtype)
        ds[...] = ref_arr
        ds.attrs["MATLAB_class"] = np.bytes_(b"cell")
        return ds
    if isinstance(value, StructArray):
        g = parent.create_group(name)
        g.attrs["MATLAB_class"] = np.bytes_(b"struct")
        names = list(value[0].keys())
        g.attrs["MATLAB_fields"] = _fields_attr(names)
        for fname in names:
            ref_arr = np.empty((len(value), 1), dtype=object)
            for i, rec in enumerate(value):
                tgt = _write_value(refs, f"s{len(refs)}_{fname}{i}",
                                   rec[fname], refs)
                ref_arr[i, 0] = tgt.ref
            ds = g.create_dataset(fname, shape=(len(value), 1),
                                  dtype=h5py.ref_dtype)
            ds[...] = ref_arr
        return g
    if isinstance(value, (Struct, dict)):
        g = parent.create_group(name)
        g.attrs["MATLAB_class"] = np.bytes_(b"struct")
        g.attrs["MATLAB_fields"] = _fields_attr(list(value.keys()))
        for fname, fval in value.items():
            _write_value(g, fname, fval, refs)
        return g
    arr = np.asarray(value)
    if arr.dtype == np.bool_:
        ds = parent.create_dataset(name, data=arr.T.astype(np.uint8))
        ds.attrs["MATLAB_class"] = np.bytes_(b"logical")
        ds.attrs["MATLAB_int_decode"] = np.int32(1)
        return ds
    ds = parent.create_dataset(name, data=arr.T)
    ds.attrs["MATLAB_class"] = np.bytes_(
        _INT_CLASSES.get(arr.dtype, b"double"))
    return ds


def write_matlab_v73(path, variables):
    """Write ``{name: value}`` as a MATLAB v7.3 .mat file.

    Values: ndarray / bool ndarray / str / Cell / Struct / StructArray /
    Empty, nested arbitrarily.
    """
    import h5py

    with h5py.File(path, "w", userblock_size=512) as f:
        refs = f.create_group("#refs#")
        for name, value in variables.items():
            _write_value(f, name, value, refs)
    header = (b"MATLAB 7.3 MAT-file, Platform: GLNXA64, Created by "
              b"ocm_tpu MATLAB-faithful fixture writer "
              b"(tests/matlab_fixtures.py)")
    with open(path, "r+b") as f:
        f.write(header[:116].ljust(116, b" "))   # descriptive text
        f.write(b"\x00" * 8)                     # subsystem data offset
        f.write(bytes([0x00, 0x02]))             # version 0x0200 (v7.3)
        f.write(b"IM")                           # endian indicator
