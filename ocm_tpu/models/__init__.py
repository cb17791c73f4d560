from ocm_tpu.models import simca

__all__ = ["simca"]
