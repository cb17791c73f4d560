from ocm_tpu.utils import io, outliers, report, splits, sweep

__all__ = ["io", "outliers", "report", "splits", "sweep"]
