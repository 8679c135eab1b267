from masterthesis_tpu.metrics.fid import FID, compute_fid_from_dirs, fid_score  # noqa: F401
from masterthesis_tpu.metrics.lpips import LPIPS, compute_lpips_from_dirs, make_lpips_fn  # noqa: F401
from masterthesis_tpu.metrics.metrics import Metrics  # noqa: F401
