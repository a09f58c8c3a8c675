"""Evaluation: pose-error metrics, 6D localization scoring, BOP results.

Vendored TPU-native equivalents of the reference's external sixd_toolkit
dependency + its extensions (sixd_toolkit_extensions/eval_calc_errors.py,
eval_loc.py) and the BOP CSV writer (m3_interface/compute_bop_results_m3.py).
"""

from . import pose_errors
from .matching import match_and_eval_performance_scores
from .bop_writer import write_bop_csv

__all__ = ["pose_errors", "match_and_eval_performance_scores", "write_bop_csv"]
