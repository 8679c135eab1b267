"""Attribute training-step device time to REAL op classes.

The xplane op names are opaque (`%fusion.N`); this script compiles the train
step, dumps its optimized HLO, maps every fusion instruction to the contents
of its fused computation (does it contain a convolution? reductions only?
parameter-update adds?), then joins those classes with the device-plane op
times from a fresh 4-iter trace.

Usage: python scripts/train_attrib.py [--gan_step fused] [--batch 8]
"""
from __future__ import annotations

import argparse
import collections
import os
import re
import sys
import tempfile

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/tpu_jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def classify_computation(body: str) -> str:
    """Classify a fused computation body by its heaviest content."""
    if "convolution(" in body:
        return "conv (fwd or grad)"
    n_reduce = body.count(" reduce(") + body.count("%reduce")
    n_dot = body.count(" dot(")
    if n_dot:
        return "dot"
    if "rng" in body or "random" in body:
        return "rng"
    if n_reduce:
        return "reduce+elementwise (norm stats etc.)"
    if "pad(" in body and "reverse(" in body:
        return "pad/reverse (conv-grad prep)"
    return "elementwise"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--gan_step", choices=["reference", "fused"], default="fused")
    ap.add_argument("--int8_train", action="store_true",
                    help="attribute the QAT (--int8_train) step instead")
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--top", type=int, default=20)
    cli = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from masterthesis_tpu.arguments import default_train_args
    from masterthesis_tpu.models import AdaINModel
    from masterthesis_tpu.utils import devtime

    args = default_train_args(
        crop_size=cli.size, dim=64, latent_dim=8, num_domains=4,
        batch_size=cli.batch, compute_dtype="bfloat16", use_dis_content=True,
        logdir=None, mode="train", gan_step=cli.gan_step,
    )
    model = AdaINModel(args)
    state = model.initialize()
    rng = jax.random.PRNGKey(1)
    mk = lambda k: jax.random.uniform(  # noqa: E731
        jax.random.fold_in(rng, k), (cli.batch, cli.size, cli.size, 3),
        jnp.float32, -1.0, 1.0,
    )
    y = jax.nn.one_hot(jnp.arange(cli.batch) % args.num_domains, args.num_domains)
    bd = {"x1": mk(0), "x2": mk(1), "y1": y, "y2": y[::-1]}

    quant = None
    if cli.int8_train:
        args.int8_train = True
        quant = model.calibrate_quant_train(state, bd, jax.random.PRNGKey(9))
    lowered = jax.jit(
        model._main_step_fused_impl if cli.gan_step == "fused"
        else model._main_step_impl,
        donate_argnums=0,
    ).lower(state, bd, rng, {}, quant)
    compiled = lowered.compile()
    hlo = compiled.as_text()
    print(f"HLO text: {len(hlo) / 1e6:.1f} MB", flush=True)

    # map computation name -> class; then instruction name -> computation
    comp_class = {}
    cur = None
    bodies: dict[str, list] = {}
    for line in hlo.splitlines():
        m = re.match(r"^%?([\w\.\-]+) \([^)]*\) -> ", line)
        if m:
            cur = m.group(1)
            bodies[cur] = []
        elif cur is not None:
            bodies[cur].append(line)
    for name, lines in bodies.items():
        comp_class[name] = classify_computation("\n".join(lines))

    inst_class = {}
    for line in hlo.splitlines():
        m = re.match(r"\s+(?:ROOT )?%?([\w\.\-]+) = .*? fusion\(.*calls=%?([\w\.\-]+)", line)
        if m:
            inst_class[m.group(1)] = comp_class.get(m.group(2), "unknown-fusion")
            continue
        m2 = re.match(r"\s+(?:ROOT )?%?([\w\.\-]+) = ", line)
        if m2:
            n = m2.group(1)
            kind = n.split(".")[0]
            inst_class[n] = kind

    # run a trace
    st, logs = model._main_step(state, bd, rng, {}, quant)
    float(jnp.asarray(logs["total_g"], jnp.float32))
    td = tempfile.mkdtemp(prefix="attrib_")
    jax.profiler.start_trace(td)
    for i in range(cli.iters):
        st, logs = model._main_step(st, bd, jax.random.fold_in(rng, i), {}, quant)
    float(jnp.asarray(logs["total_g"], jnp.float32))
    jax.profiler.stop_trace()

    ops = devtime.device_op_times(td)
    agg = collections.defaultdict(float)
    unmatched = 0.0
    rows = []
    for name, ms in ops.items():
        inst = name.split(" = ")[0].lstrip("%")
        cls = inst_class.get(inst)
        if cls is None:
            # try without the % and suffixes
            cls = inst_class.get(inst.split(" ")[0])
        if cls is None:
            cls = inst.split(".")[0]
            unmatched += ms
        agg[cls] += ms
        rows.append((ms, inst, cls))
    total = sum(ops.values()) / cli.iters
    print(f"\n== attribution, {total:.1f} ms/iter ==")
    for cls, ms in sorted(agg.items(), key=lambda x: -x[1]):
        if ms / cli.iters >= 0.3:
            print(f"{ms / cli.iters:9.2f} ms  {100 * ms / (total * cli.iters):5.1f}%  {cls}")
    print(f"(unmatched-by-hlo share: {unmatched / cli.iters:.2f} ms)")

    rows.sort(reverse=True)
    print(f"\n== top {cli.top} ops with class ==")
    for ms, inst, cls in rows[: cli.top]:
        print(f"{ms / cli.iters:8.3f}  [{cls}]  {inst[:90]}")


if __name__ == "__main__":
    main()
