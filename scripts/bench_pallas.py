"""jnp-vs-Pallas microbenchmarks on the real TPU chip.

Measures the two geometric primitives at their production shapes so the
dispatch policy in ops/pallas_kernels.py is data-driven:

* iou_matrix — target-assignment shape (12276 x 8 anchors/GT at 256px,
  49104 x 8 at 512px), vmapped train-batch variant, and the NMS 100 x 100;
* min_distances — ADD-S shapes (500 points subsampled, and the batched
  all-true-positives-at-once evaluator call).

Timing: block_until_ready only — NEVER device_get (the tunnel permanently
degrades after the first device->host read, see BENCH_NOTES.md).
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from hmd_ego_pose_tpu.ops import distances as dist_ref
from hmd_ego_pose_tpu.ops import iou as iou_ref
from hmd_ego_pose_tpu.ops.pallas_kernels import iou_matrix_pallas, min_distances_pallas


def timeit(fn, *args, iters=50, warmup=5):
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3  # ms


def boxes(rng, *shape):
    b = rng.uniform(0, 220, shape + (4,)).astype(np.float32)
    b[..., 2:] += b[..., :2]
    return jnp.asarray(b)


def main():
    print(f"backend: {jax.default_backend()}, device: {jax.devices()[0]}")
    rng = np.random.RandomState(0)

    rows = []

    # ---- IoU: target assignment (per-image inside vmapped train step) ----
    for n, k, b in ((12276, 8, 1), (49104, 8, 1), (12276, 8, 16), (100, 100, 1)):
        if b == 1:
            a_, b_ = boxes(rng, n), boxes(rng, k)
            jf = jax.jit(iou_ref.iou_matrix)
            pf = jax.jit(iou_matrix_pallas)
        else:
            a_, b_ = boxes(rng, b, n), boxes(rng, b, k)
            jf = jax.jit(jax.vmap(iou_ref.iou_matrix))
            pf = jax.jit(jax.vmap(iou_matrix_pallas))
        tj = timeit(jf, a_, b_)
        tp = timeit(pf, a_, b_)
        rows.append((f"iou {b}x({n}x{k})", tj, tp))

    # ---- min distances: ADD-S ----
    for p, q, b in ((500, 500, 1), (2000, 2000, 1), (500, 500, 128)):
        if b == 1:
            g = jnp.asarray(rng.normal(size=(p, 3)).astype(np.float32) * 50)
            pr = jnp.asarray(rng.normal(size=(q, 3)).astype(np.float32) * 50)
            jf = jax.jit(dist_ref.min_distances)
            pf = jax.jit(min_distances_pallas)
        else:
            g = jnp.asarray(rng.normal(size=(b, p, 3)).astype(np.float32) * 50)
            pr = jnp.asarray(rng.normal(size=(b, q, 3)).astype(np.float32) * 50)
            jf = jax.jit(jax.vmap(dist_ref.min_distances))
            pf = jax.jit(jax.vmap(min_distances_pallas))
        tj = timeit(jf, g, pr)
        tp = timeit(pf, g, pr)
        rows.append((f"mindist {b}x({p}x{q})", tj, tp))

    print(f"{'case':28s} {'jnp ms':>10s} {'pallas ms':>10s} {'speedup':>8s}")
    for name, tj, tp in rows:
        print(f"{name:28s} {tj:10.4f} {tp:10.4f} {tj / tp:8.2f}x")


if __name__ == "__main__":
    main()
