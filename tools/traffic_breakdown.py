"""Where do the flagship-hq frame's HBM bytes go? (VERDICT r2 item 3 /
r3 latency push: roofline says ~40 GB/frame, a hand model of the conv
stack says ~6 GB — find the gap before optimizing the wrong thing.)

Bisects the jitted frame program into stages (encode -> net -> decode/
recompose), compiles each on the TPU backend, and reports XLA cost
analysis (flops, bytes) per stage plus the top optimized-HLO ops by
output buffer size for the full program.

    python tools/traffic_breakdown.py [--model flagship-hq] [--height 1080]
"""

from __future__ import annotations

import argparse
import re
import sys
from collections import defaultdict
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp


def cost(fn, *args):
    c = jax.jit(fn).lower(*args).compile()
    ca = c.cost_analysis()
    ca = ca[0] if isinstance(ca, (list, tuple)) else ca
    return c, float(ca.get("flops", 0)), float(ca.get("bytes accessed", 0))


_SHAPE = re.compile(r"(bf16|f32|f16|s32|u32|s8|u8|pred)\[([\d,]*)\]")

_BYTES = {"bf16": 2, "f32": 4, "f16": 2, "s32": 4, "u32": 4, "s8": 1,
          "u8": 1, "pred": 1}


def shape_bytes(m: re.Match) -> int:
    dims = m.group(2)
    n = 1
    for d in dims.split(","):
        if d:
            n *= int(d)
    return n * _BYTES[m.group(1)]


def top_ops(compiled, k=25):
    """Aggregate optimized-HLO instruction OUTPUT bytes by op kind.

    Output-buffer bytes are a lower bound on that op's traffic (each
    operand was itself some op's output) — good enough to rank hogs."""
    txt = compiled.as_text()
    agg = defaultdict(lambda: [0, 0])  # kind -> [bytes, count]
    rows = []
    for line in txt.splitlines():
        line = line.strip()
        m = re.match(r"(?:ROOT )?%?[\w.-]+ = \(?((?:bf16|f32|f16|s32|u32|s8|u8|pred)\[[\d,]*\])", line)
        if not m:
            continue
        kind_m = re.search(r"= \(?[^=]*?\]\{?[^ ]* ([a-z-]+)\(", line)
        kind = kind_m.group(1) if kind_m else "?"
        first = _SHAPE.search(m.group(1))
        b = shape_bytes(first)
        # fusions: name the fused root op for readability
        if kind == "fusion":
            fm = re.search(r"calls=%?([\w.-]+)", line)
            kind = f"fusion:{fm.group(1).split('.')[0] if fm else '?'}"
        agg[kind][0] += b
        agg[kind][1] += 1
        om = re.search(r'op_name="([^"]*)"', line)
        src = om.group(1) if om else "?"
        rows.append((b, kind, line[:60], src))
    rows.sort(key=lambda r: -r[0])
    return agg, rows[:k]


def main() -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model", default="flagship-hq")
    p.add_argument("--height", type=int, default=1080)
    p.add_argument("--width", type=int, default=1920)
    p.add_argument("--border", type=int, default=-1)
    p.add_argument("--top", type=int, default=25)
    p.add_argument("--time", action="store_true",
                   help="EXECUTE each bisected stage on the chip with the "
                        "chained methodology (bench_model.py) and report "
                        "per-stage milliseconds — attributes the measured "
                        "frame latency, not just its bytes (VERDICT r4 "
                        "missing #4). Takes the tpu_guard lock.")
    p.add_argument("--chain", type=int, default=8)
    p.add_argument("--samples", type=int, default=5)
    p.add_argument("--out", default="/tmp/traffic_breakdown.txt",
                   help="tee the FULL report to this file — session "
                        "harnesses truncate long stdout (the r5 08:59 run "
                        "lost its stage table that way); '' disables")
    args = p.parse_args()
    if args.out:
        class _Tee:
            def __init__(self, *streams):
                self.streams = streams

            def write(self, s):
                for st in self.streams:
                    st.write(s)

            def flush(self):
                for st in self.streams:
                    st.flush()

        sys.stdout = _Tee(sys.stdout, open(args.out, "w", buffering=1))
        print(f"[teeing report to {args.out}]", file=sys.stderr)
    if args.time:
        from deepdenoiser_tpu.utils import tpu_guard

        tpu_guard.guard_latency_tool("traffic_breakdown")

    from tools.pretrain_flagship import MODELS
    from deepdenoiser_tpu import transforms
    from deepdenoiser_tpu.config import InferenceConfig
    from deepdenoiser_tpu.inference import pipeline, tiled
    from deepdenoiser_tpu.models import factory

    mcfg = MODELS[args.model]
    H, W = args.height, args.width
    params = factory.init_params(mcfg, jax.random.PRNGKey(0), spatial=64)
    icfg = InferenceConfig(tile=0, border=args.border,
                           compute_dtype="bfloat16")
    denoise, grid = pipeline.make_joint_frame_denoiser(mcfg, icfg, H, W)
    print(f"grid: {grid}", file=sys.stderr)

    # synthetic frame, host-side (we only compile, never run)
    from deepdenoiser_tpu.data import synthetic

    noisy = synthetic.add_mc_noise(
        synthetic.generate_clean_passes(H, W, seed=0), spp=4, seed=1
    )
    frame = {k: jnp.asarray(v) for k, v in noisy.items()}

    # ---- stage bisect -----------------------------------------------------
    def encode(pd):
        return transforms.encode_joint_inputs(pd, scales=None)

    enc = jax.eval_shape(encode, frame)
    enc_arr = jnp.zeros(enc.shape, enc.dtype)

    apply_fn = pipeline._make_apply(mcfg, params, "bfloat16")
    frame_fn = tiled.make_tiled_apply(
        apply_fn, grid, transforms.joint_output_channels()
    )

    def net(e):
        return frame_fn(e)

    dec_shape = jax.eval_shape(net, enc_arr)
    dec_arr = jnp.zeros(dec_shape.shape, dec_shape.dtype)

    def decode(d, pd):
        decoded = transforms.decode_joint_outputs(d, pd, scales=None)
        out = dict(decoded)
        from deepdenoiser_tpu import passes

        for g in passes.LIGHT_GROUPS:
            out[passes.group_passes(g)[2]] = pd[passes.group_passes(g)[2]]
        for extra in passes.COMPOSITE_EXTRA + ("alpha",):
            if extra in pd:
                out[extra] = pd[extra]
        return transforms.recompose(out)

    def full(params, pd):
        return denoise(params, pd)["combined"].sum()

    stages = []
    _, f, b = cost(encode, frame)
    stages.append(("encode", f, b))
    cnet, f, b = cost(net, enc_arr)
    stages.append(("net", f, b))
    _, f, b = cost(decode, dec_arr, frame)
    stages.append(("decode+recompose", f, b))
    cfull, f, b = cost(full, params, frame)
    stages.append(("FULL pipeline", f, b))

    print(f"{'stage':<18} {'GFLOP':>9} {'GB':>8}")
    for name, f, b in stages:
        print(f"{name:<18} {f/1e9:9.1f} {b/1e9:8.2f}")

    if args.time:
        import time as _time

        import numpy as np

        frame_dev = {k: jax.device_put(v) for k, v in frame.items()}
        enc_dev = jax.device_put(enc_arr)
        dec_dev = jax.device_put(dec_arr)
        params_dev = jax.device_put(params)

        # salted chains: each stage's input is perturbed by (0-valued)
        # salt derived from the previous iteration's scalar, serializing
        # the chain without host round-trips (bench.py methodology)
        enc_t = jax.jit(lambda pd, s: encode(
            {**pd, "diffuse_direct": pd["diffuse_direct"] + s}).sum())
        net_t = jax.jit(lambda e, s: net(e + s).sum())
        dec_t = jax.jit(lambda d, pd, s: decode(d + s, pd).sum())
        full_t = jax.jit(lambda p, pd, s: full(
            p, {**pd, "diffuse_direct": pd["diffuse_direct"] + s}))

        def timed(fn, label):
            def chain(k):
                t0 = _time.perf_counter()
                s = jnp.zeros(())
                for _ in range(k):
                    s = fn(s * 1e-30)
                float(s)
                return _time.perf_counter() - t0
            chain(1); chain(1)
            per = []
            for _ in range(args.samples):
                t1 = chain(1)
                tk = chain(args.chain)
                per.append((tk - t1) / (args.chain - 1))
            ms = 1e3 * float(np.median(per))
            print(f"  {label:<18} {ms:8.2f} ms")
            return ms

        print("\nstage timings (chained, median of "
              f"{args.samples}x{args.chain}):")
        ms_e = timed(lambda s: enc_t(frame_dev, s), "encode")
        ms_n = timed(lambda s: net_t(enc_dev, s), "net")
        ms_d = timed(lambda s: dec_t(dec_dev, frame_dev, s),
                     "decode+recompose")
        ms_f = timed(lambda s: full_t(params_dev, frame_dev, s),
                     "FULL pipeline")
        print(f"  {'sum of stages':<18} {ms_e + ms_n + ms_d:8.2f} ms "
              f"(fusion across stage boundaries makes FULL < sum)")

    agg, rows = top_ops(cfull, args.top)
    print("\noutput-buffer bytes by op kind (FULL program):")
    for kind, (b, n) in sorted(agg.items(), key=lambda kv: -kv[1][0])[:20]:
        print(f"  {kind:<28} {b/1e9:8.2f} GB  x{n}")
    print(f"\ntop {args.top} single ops by output bytes:")
    for b, kind, line, src in rows:
        print(f"  {b/1e9:6.2f} GB  {line}\n             ^ {src}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
