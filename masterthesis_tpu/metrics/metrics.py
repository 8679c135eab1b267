"""Metrics base class (parity with reference src/metrics/metrics.py:7-71)."""
from __future__ import annotations

from abc import ABC, abstractmethod
from typing import Callable, Optional

import jax.numpy as jnp
import numpy as np


class Metrics(ABC):
    """reset/update/compute contract with feature-extractor plumbing."""

    def __init__(
        self,
        num_features: int,
        feature_extractor: Optional[Callable] = None,
        output_transform: Callable = lambda x: x,
    ):
        self._num_features = num_features
        self._feature_extractor = feature_extractor
        self._output_transform = output_transform
        self.reset()

    def _check_feature_shapes(self, samples) -> None:
        if samples.ndim != 2:
            raise ValueError(
                f"expected (batch, features) from the feature extractor, "
                f"got a rank-{samples.ndim} array"
            )
        if samples.shape[0] == 0:
            raise ValueError("feature extractor returned an empty batch")
        if samples.shape[1] != self._num_features:
            raise ValueError(
                f"feature width mismatch: metric was built for "
                f"{self._num_features} features, extractor produced {samples.shape[1]}"
            )

    def _extract_features(self, inputs) -> np.ndarray:
        outputs = self._feature_extractor(jnp.asarray(inputs))
        outputs = np.asarray(outputs)
        self._check_feature_shapes(outputs)
        return outputs

    @abstractmethod
    def reset(self) -> None:
        ...

    @abstractmethod
    def update(self, output) -> None:
        ...

    @abstractmethod
    def compute(self):
        ...
