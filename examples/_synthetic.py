"""Shim: the synthetic dataset generators now live in the package so the
CLI (``python -m ocm_tpu``) can use them too — see
ocm_tpu/utils/synthetic.py.  Examples keep importing ``_synthetic``."""

from ocm_tpu.utils.synthetic import (  # noqa: F401
    CHEESE_LENGTH,
    NUT_TYPES,
    NUT_WAVELENGTHS,
    cheese_like,
    nut_cube,
    nut_objects,
)
