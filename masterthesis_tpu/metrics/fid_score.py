"""FID score API alias.

The reference ships a duplicate FID implementation (src/metrics/fid_score.py:58-157
alongside src/metrics/fid.py); here both entry points share the single
streaming implementation in metrics.fid.
"""
from masterthesis_tpu.metrics.fid import FID, compute_fid_from_dirs, fid_score  # noqa: F401
