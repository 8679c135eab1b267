"""Streaming Fréchet Inception Distance.

Parity with reference src/metrics/fid.py:17-179: online mean / outer-product
accumulation in float64, covariance assembly, scipy sqrtm Fréchet distance,
and a dir-vs-dir helper. TPU-first change: feature extraction is a single jitted
batch call on device; the f64 accumulation happens on host in one
``features.T @ features`` GEMM per batch instead of the reference's
per-sample Python loop (fid.py:162-166) — identical math.
"""
from __future__ import annotations

import warnings
from typing import Callable, Optional

import numpy as np

from masterthesis_tpu.metrics.metrics import Metrics


def fid_score(mu1, mu2, sigma1, sigma2, eps: float = 1e-6) -> float:
    """Fréchet distance between two Gaussians (reference fid.py:30-63)."""
    import scipy.linalg

    mu1 = np.asarray(mu1, np.float64)
    mu2 = np.asarray(mu2, np.float64)
    sigma1 = np.asarray(sigma1, np.float64)
    sigma2 = np.asarray(sigma2, np.float64)
    diff = mu1 - mu2
    covmean, _ = scipy.linalg.sqrtm(sigma1 @ sigma2, disp=False)
    if np.iscomplexobj(covmean):
        if not np.allclose(np.diagonal(covmean).imag, 0, atol=1e-3):
            m = np.max(np.abs(covmean.imag))
            raise ValueError("Imaginary component {}".format(m))
        covmean = covmean.real
    tr_covmean = np.trace(covmean)
    if not np.isfinite(covmean).all():
        tr_covmean = np.sum(
            np.sqrt(((np.diag(sigma1) * eps) * (np.diag(sigma2) * eps)) / (eps * eps))
        )
    return float(diff @ diff + np.trace(sigma1) + np.trace(sigma2) - 2 * tr_covmean)


class FID(Metrics):
    """Online FID over paired (train, test) batches (reference fid.py:66-179)."""

    def __init__(
        self,
        num_features: Optional[int] = None,
        feature_extractor: Optional[Callable] = None,
        output_transform=lambda x: x,
        weights_path: Optional[str] = None,
    ):
        if num_features is None and feature_extractor is None:
            from masterthesis_tpu.metrics.inception import make_inception_extractor

            num_features = 2048
            feature_extractor = make_inception_extractor(weights_path)
        elif num_features is not None and feature_extractor is None:
            feature_extractor = lambda x: x  # noqa: E731
        self._eps = 1e-6
        super().__init__(
            num_features=num_features,
            feature_extractor=feature_extractor,
            output_transform=output_transform,
        )

    def _online_update(self, features: np.ndarray, total: np.ndarray, sigma: np.ndarray):
        """Batched mean/outer-product accumulation (fid.py:119-125, batched)."""
        f = features.astype(np.float64)
        total += f.sum(axis=0)
        sigma += f.T @ f

    def _get_covariance(self, sigma: np.ndarray, total: np.ndarray) -> np.ndarray:
        """Covariance from sum and sum-of-outer-products (fid.py:127-136)."""
        if self._num_examples < 2:
            raise ValueError(
                "FID needs at least 2 examples per side to estimate a covariance "
                f"(got {self._num_examples}); call update() with more data."
            )
        sub = np.outer(total, total) / self._num_examples
        return (sigma - sub) / (self._num_examples - 1)

    def reset(self) -> None:
        n = self._num_features
        self._train_sigma = np.zeros((n, n), np.float64)
        self._train_total = np.zeros((n,), np.float64)
        self._test_sigma = np.zeros((n, n), np.float64)
        self._test_total = np.zeros((n,), np.float64)
        self._num_examples = 0

    def update(self, output) -> None:
        train, test = self._output_transform(output)
        train_features = self._extract_features(train)
        test_features = self._extract_features(test)
        if train_features.shape != test_features.shape:
            raise ValueError(
                "Number of Training Features and Testing Features should be equal "
                f"({train_features.shape} != {test_features.shape})"
            )
        self._online_update(train_features, self._train_total, self._train_sigma)
        self._online_update(test_features, self._test_total, self._test_sigma)
        self._num_examples += train_features.shape[0]

    def compute(self) -> float:
        fid = fid_score(
            mu1=self._train_total / self._num_examples,
            mu2=self._test_total / self._num_examples,
            sigma1=self._get_covariance(self._train_sigma, self._train_total),
            sigma2=self._get_covariance(self._test_sigma, self._test_total),
            eps=self._eps,
        )
        if not np.isfinite(fid):
            warnings.warn("The product of covariance of train and test features is out of bounds.")
        return fid


def compute_fid_from_dirs(
    dirpath1: str,
    dirpath2: str,
    batch_size: int = 8,
    feature_extractor=None,
    num_features=None,
    weights_path: Optional[str] = None,
    mode: str = "plain",
) -> float:
    """dir-vs-dir FID (reference fid.py:17-28).

    ``mode='clean'`` applies cleanfid's resize protocol (host-side
    unquantized PIL-bicubic resize to 299, the de-facto comparable-FID
    standard and what the reference's own eval used,
    misc/compute_fid.py:1-9); 'plain' resizes on device with bilinear like
    the reference's metrics/fid.py path.
    """
    from masterthesis_tpu.data.datasets import ImageList
    from masterthesis_tpu.data.loader import DataLoader

    transform = None
    if mode == "clean":
        from masterthesis_tpu.data.transforms import CleanResize
        from masterthesis_tpu.metrics.inception import make_inception_extractor

        transform = CleanResize()
        if feature_extractor is None and num_features is None:
            num_features = 2048
            feature_extractor = make_inception_extractor(weights_path, resize_input=False)
    elif mode != "plain":
        raise ValueError(f"unknown FID mode {mode!r}; use 'plain' or 'clean'")
    fid = FID(
        num_features=num_features,
        feature_extractor=feature_extractor,
        weights_path=weights_path,
    )
    loader1 = DataLoader(ImageList(dirpath1, transform=transform), batch_size=batch_size)
    loader2 = DataLoader(ImageList(dirpath2, transform=transform), batch_size=batch_size)
    for img1, img2 in zip(loader1, loader2):
        n = min(len(img1), len(img2))
        fid.update((img1[:n], img2[:n]))
    return fid.compute()
