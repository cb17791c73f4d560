from ocm_tpu.ops import linalg, preprocess, special

__all__ = ["linalg", "preprocess", "special"]
