"""Test harness config.

Forces the CPU backend with 8 virtual devices (the JAX-idiomatic fake backend
for exercising pjit/data-parallel collectives without TPUs — SURVEY.md §4) and
enables the persistent compilation cache so repeated test runs skip XLA
compiles.

Must run before anything imports jax.
"""
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

# pytest plugins (jaxtyping) import jax BEFORE this conftest, so the env var
# alone is too late; the config update below is authoritative as long as no
# backend has been initialized yet.
#
# NOTE: no persistent compilation cache here — on this machine the axon
# remote-compile service populates it with AOT executables built for a
# DIFFERENT cpu feature set ("prefer-no-scatter"), which mis-executes when
# loaded back ("could lead to execution errors such as SIGILL").
jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu", "tests must run on the CPU backend"
assert len(jax.devices()) == 8, "tests expect 8 virtual CPU devices"

import numpy as np  # noqa: E402
import pytest  # noqa: E402

from masterthesis_tpu.arguments import default_train_args  # noqa: E402


@pytest.fixture
def rng():
    return jax.random.PRNGKey(0)


def tiny_train_args(**overrides):
    """Smallest config that exercises every code path quickly on 1 CPU."""
    base = dict(
        crop_size=32,
        load_size=36,
        dim=8,
        latent_dim=4,
        num_domains=4,
        batch_size=2,
        logdir=None,
        dis_content_layers=1,
        dis_content_final_kernel=2,
    )
    base.update(overrides)
    return default_train_args(**base)


@pytest.fixture
def tiny_args():
    return tiny_train_args()


def make_batch(key=0, b=2, size=32, k=4):
    rng_ = np.random.default_rng(key)
    import jax.numpy as jnp

    y1 = np.eye(k, dtype=np.float32)[rng_.integers(0, k, b)]
    y2 = np.eye(k, dtype=np.float32)[rng_.integers(0, k, b)]
    return {
        "x1": jnp.asarray(rng_.uniform(-1, 1, (b, size, size, 3)).astype(np.float32)),
        "x2": jnp.asarray(rng_.uniform(-1, 1, (b, size, size, 3)).astype(np.float32)),
        "y1": jnp.asarray(y1),
        "y2": jnp.asarray(y2),
    }


def make_image_tree(root, num_domains=4, per_domain=3, size=40, mode="train"):
    """Synthetic domain-folder dataset on disk."""
    from PIL import Image

    rng_ = np.random.default_rng(1)
    names = ["cloud", "fog", "rain", "sun"][:num_domains]
    for name in names:
        d = os.path.join(str(root), mode, name)
        os.makedirs(d, exist_ok=True)
        for i in range(per_domain):
            arr = rng_.integers(0, 255, (size, size, 3), dtype=np.uint8)
            Image.fromarray(arr.astype(np.uint8)).save(os.path.join(d, f"img{i}.jpg"))
    return names
