"""Compatibility shim mirroring the reference's `inference.py` public
surface: `from inference import Infer`."""

from cpcsv_tpu.evaluation.drivers import Infer, evaluate_fid_fsd_in_memory

__all__ = ["Infer", "evaluate_fid_fsd_in_memory"]
