"""Model registry (string -> class resolution preserved from the reference's
reflective pattern, arguments.py:56-57)."""
from masterthesis_tpu.models.adain_model import AdaINModel  # noqa: F401
from masterthesis_tpu.models.base_model import BaseModel  # noqa: F401
from masterthesis_tpu.models.model import Model  # noqa: F401
from masterthesis_tpu.models.state import TrainState  # noqa: F401
