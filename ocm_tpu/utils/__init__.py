from ocm_tpu.utils import io, outliers, profiling, report, splits, sweep

__all__ = ["io", "outliers", "profiling", "report", "splits", "sweep"]
