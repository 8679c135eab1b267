"""Headline benchmark: 256x256 translations/sec/chip on the flagship
AdaINModel inference path (content encode + AdaIN decode — reference
forward_random, base_model.py:112-117).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} where
vs_baseline is value / 2000 (the BASELINE.json north-star target of >=2k
256x256 translations/sec/chip).
"""
from __future__ import annotations

import json
import os
import sys
import time

# TPU compiles on this machine go through a slow remote service; the
# persistent cache turns a ~4 min cold bench into ~1 min.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/tpu_jax_cache")


def main():
    import jax
    import jax.numpy as jnp

    from masterthesis_tpu.arguments import default_test_args
    from masterthesis_tpu.models import AdaINModel

    on_tpu = jax.devices()[0].platform == "tpu"
    # batch 256 amortizes per-call overhead and lifts MXU utilization
    # (measured: 775 img/s @64, 1168 @128, 1186 @256 on v5e)
    batch = 256 if on_tpu else 4
    size = 256 if on_tpu else 64
    dtype = "bfloat16" if on_tpu else "float32"

    args = default_test_args(
        crop_size=size, dim=64, latent_dim=8, num_domains=4, batch_size=batch,
        compute_dtype=dtype, logdir=None,
    )
    model = AdaINModel(args)
    state = model.initialize()

    rng = jax.random.PRNGKey(0)
    img = jax.random.uniform(rng, (batch, size, size, 3), jnp.float32, -1.0, 1.0)
    z = model.get_z_random(rng, batch)
    c = jax.nn.one_hot(jnp.zeros((batch,), jnp.int32) + 3, args.num_domains)

    import numpy as np

    fwd = model._forward_random_jit
    # warmup / compile; materialize to force real execution (block_until_ready
    # is a no-op through the axon relay)
    np.asarray(fwd(state.params, img, z, c))

    # steady-state throughput: chained dispatch, then materialize a scalar of
    # the LAST output — in-order device execution means all prior calls have
    # completed by then.
    iters = 30 if on_tpu else 3
    start = time.perf_counter()
    out = None
    for _ in range(iters):
        out = fwd(state.params, img, z, c)
    float(jnp.sum(out.astype(jnp.float32)))
    dt = time.perf_counter() - start
    imgs_per_sec = batch * iters / dt

    result = {
        "metric": f"{size}px translations/sec/chip (AdaINModel, {dtype}, batch {batch})",
        "value": round(imgs_per_sec, 2),
        "unit": "img/s",
        "vs_baseline": round(imgs_per_sec / 2000.0, 4),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    sys.exit(main())
