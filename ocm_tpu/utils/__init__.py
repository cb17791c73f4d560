from ocm_tpu.utils import (io, outliers, profiling, report, splits, sweep,
                           tpe)

__all__ = ["io", "outliers", "profiling", "report", "splits", "sweep",
           "tpe"]
