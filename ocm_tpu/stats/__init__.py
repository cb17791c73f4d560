from ocm_tpu.stats import limits, metrics, qhf

__all__ = ["limits", "metrics", "qhf"]
