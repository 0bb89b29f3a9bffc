"""Spatial-partitioning cost study (VERDICT r3 #5).

The ``space`` mesh axis shards NHWC height so k chips cooperate on ONE
frame (batch-1 latency scale-out, the reference's serving shape:
unity-sandbox/WebRTCNetCoreSandbox/Program.cs:29-33 runs one frame at a
time at 16 ms+).  Round 3 proved numerical parity (tests/
test_parallel_spatial.py) but shipped zero performance evidence.  One
real chip means no multi-chip wall-clock, so this study uses the two
instruments that DO work here:

* **XLA cost analysis** of the compiled SPMD program at space=1/2/4/8
  (per-device flops + bytes accessed — the compiler's own numbers), and
* **the optimized HLO itself**: every halo exchange GSPMD inserts is a
  ``collective-permute`` whose result shape gives its exact byte count.

From these: per-device HBM time bound (bytes/819 GB/s), halo traffic per
frame, and an ICI time bound (assumed one-way neighbor-link bandwidth
~50 GB/s, v5e's published 1600 Gbps aggregate / 4 links; the halo
pattern is nearest-neighbor so each exchange rides one link).  The CPU
virtual mesh runs on ONE physical core, so CPU wall time measures
correctness + dispatch overhead, not speedup, and is reported only as a
sanity column.

Usage:  python scripts/bench_spatial.py [--phi 0] [--size 256] [--report]
Appends the table to BENCH_NOTES.md with --report.
"""

import argparse
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_cpu_tests")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

import jax.numpy as jnp
import numpy as np

HBM_BW = 819e9  # v5e HBM bytes/s
ICI_BW = 50e9   # assumed one-way per-neighbor-link bytes/s (1600 Gbps/4)

_DTYPE_BYTES = {
    "f64": 8, "f32": 4, "bf16": 2, "f16": 2,
    "s64": 8, "u64": 8, "s32": 4, "u32": 4,
    "s16": 2, "u16": 2, "s8": 1, "u8": 1, "pred": 1,
}
_SHAPE_RE = re.compile(r"(f64|f32|bf16|f16|s64|u64|s32|u32|s16|u16|s8|u8|pred)\[([\d,]*)\]")

# ops that move data between devices; -start forms are the async halves,
# their -done twins carry the same tuple shape and must not double count
_COLL_RE = re.compile(
    r"= *(\([^)]*\)|[a-z0-9_]+\[[^\]]*\][^ ]*) *"
    r"(collective-permute-start|collective-permute|all-reduce-start|all-reduce|"
    r"all-gather-start|all-gather|reduce-scatter)\(",
)
_SKIP_DONE = ("collective-permute-done", "all-reduce-done", "all-gather-done")


def _shape_bytes(type_str: str) -> int:
    total = 0
    for dtype, dims in _SHAPE_RE.findall(type_str):
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * _DTYPE_BYTES[dtype]
    return total


def collective_traffic(hlo_text: str):
    """Sum result bytes of every cross-device op in the optimized HLO."""
    per_kind = {}
    for line in hlo_text.splitlines():
        if any(done in line for done in _SKIP_DONE):
            continue
        m = _COLL_RE.search(line)
        if not m:
            continue
        kind = m.group(2).replace("-start", "")
        per_kind.setdefault(kind, [0, 0])
        per_kind[kind][0] += 1
        per_kind[kind][1] += _shape_bytes(m.group(1))
    return per_kind


def _cost(compiled):
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    return float(ca.get("flops", 0.0)), float(ca.get("bytes accessed", 0.0))


def run_point(space: int, phi: int, size: int, dtype: str):
    from hmd_ego_pose_tpu.config import ModelConfig, ParallelConfig
    from hmd_ego_pose_tpu.models import hmd_ego_pose
    from hmd_ego_pose_tpu.parallel.mesh import (
        batch_sharding, image_sharding, make_mesh, replicated_sharding,
    )

    cfg = ModelConfig(phi=phi, image_size=size, compute_dtype=dtype)
    params, state = hmd_ego_pose.init(0, cfg)
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.normal(size=(1, size, size, 3)).astype(np.float32) * 0.3)
    cams = jnp.asarray([[570.0, 570.0, size / 2, size / 2, 1000.0, 1.0]], jnp.float32)

    def fn(p, s, x, c):
        return hmd_ego_pose.predict(p, s, x, c, cfg, score_threshold=0.1)

    if space == 1:
        jitted = jax.jit(fn)
        args = (params, state, images, cams)
    else:
        mesh = make_mesh(
            ParallelConfig(data_parallel=1, spatial_parallel=space),
            devices=jax.devices()[:space],
        )
        repl = replicated_sharding(mesh)
        args = (
            jax.device_put(params, repl),
            jax.device_put(state, repl),
            jax.device_put(images, image_sharding(mesh)),
            jax.device_put(cams, batch_sharding(mesh)),
        )
        jitted = jax.jit(fn)

    lowered = jitted.lower(*args)
    compiled = lowered.compile()
    flops, byts = _cost(compiled)
    coll = collective_traffic(compiled.as_text())

    # CPU wall sanity (one physical core: overhead only, not speedup)
    out = jitted(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(5):
        jax.block_until_ready(jitted(*args))
    wall_ms = (time.perf_counter() - t0) / 5 * 1e3

    halo_bytes = sum(b for _, b in coll.values())
    return {
        "space": space,
        "flops_per_device": flops,
        "bytes_per_device": byts,
        "t_hbm_us": byts / HBM_BW * 1e6,
        "collectives": {k: {"count": c, "bytes": b} for k, (c, b) in coll.items()},
        "halo_bytes": halo_bytes,
        "t_ici_us": halo_bytes / ICI_BW * 1e6,
        "cpu_wall_ms": wall_ms,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--phi", type=int, default=0)
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--spaces", default="1,2,4,8")
    ap.add_argument("--report", action="store_true",
                    help="append the table to BENCH_NOTES.md")
    args = ap.parse_args()

    rows = []
    for space in [int(s) for s in args.spaces.split(",")]:
        print(f"[spatial] compiling space={space} phi={args.phi} {args.size}px ...",
              flush=True)
        r = run_point(space, args.phi, args.size, args.dtype)
        rows.append(r)
        print(json.dumps(r), flush=True)

    base = rows[0]
    lines = [
        "",
        f"### Spatial partitioning cost study (phi-{args.phi}, {args.size}px, "
        f"{args.dtype}, batch 1, fused predict)",
        "",
        "Per-device numbers from XLA cost analysis of the compiled SPMD program",
        "(8-virtual-CPU mesh; GSPMD partitioning is platform-independent, byte",
        "counts are the program's, not the chip's); halo traffic summed from the",
        "optimized HLO's collective ops.  t_hbm = bytes/819 GB/s;",
        "t_ici = halo bytes / 50 GB/s (assumed v5e neighbor link).  CPU wall is",
        "a one-core sanity number (8 virtual devices share one core), NOT a",
        "latency projection.",
        "",
        "| space | bytes/device (MB) | vs space=1 | flops/device (G) | halo bytes/frame (KB) | collectives | t_hbm (us) | t_ici (us) | bound (us) | CPU wall (ms) |",
        "|---|---|---|---|---|---|---|---|---|---|",
    ]
    for r in rows:
        coll_desc = ", ".join(
            f"{k} x{v['count']}" for k, v in sorted(r["collectives"].items())
        ) or "-"
        bound = max(r["t_hbm_us"], 0.0) + r["t_ici_us"]
        lines.append(
            f"| {r['space']} | {r['bytes_per_device'] / 1e6:.2f} "
            f"| {r['bytes_per_device'] / base['bytes_per_device']:.2f}x "
            f"| {r['flops_per_device'] / 1e9:.2f} "
            f"| {r['halo_bytes'] / 1e3:.1f} "
            f"| {coll_desc} "
            f"| {r['t_hbm_us']:.1f} | {r['t_ici_us']:.1f} | {bound:.1f} "
            f"| {r['cpu_wall_ms']:.1f} |"
        )
    table = "\n".join(lines)
    print(table)
    if args.report:
        with open(os.path.join(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__))), "BENCH_NOTES.md"), "a") as f:
            f.write(table + "\n")


if __name__ == "__main__":
    main()
