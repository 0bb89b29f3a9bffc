"""Pallas TPU kernels for the bandwidth-bound geometric primitives.

Two kernels replace what the reference implemented as native CPU code:

* ``iou_matrix_pallas`` — the N x K IoU matrix (training target assignment
  runs it per image over 12k+ anchors; reference: Cython loop kernel
  compute_overlap.pyx:33-73).  Tiled so anchors stream through VMEM in
  128-row blocks with the (small, padded) GT box set resident.
* ``min_distances_pallas`` — the ADD-S inner product: per GT point the
  minimum distance to any predicted point (reference: C kernel
  calc_min_distances.h:16-36).  The P x Q distance matrix is built in VMEM
  blocks and min-reduced in place, never touching HBM.

Both auto-dispatch: Pallas on TPU backends, the jnp reference everywhere
else (CPU tests run the kernels in interpret mode for parity).
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from hmd_ego_pose_tpu.ops import distances as _dist_ref
from hmd_ego_pose_tpu.ops import iou as _iou_ref


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


# ---------------------------------------------------------------------------
# IoU matrix
# ---------------------------------------------------------------------------

def _iou_block_rows(n: int) -> int:
    """Anchor-block row count, tuned on a v5e (scripts/bench_pallas.py):
    256 rows win for the vmapped train-batch shape (16 x 12276 anchors,
    6x over the fused jnp broadcast), 1024 for the single large 49k-anchor
    set; 4096 overflows scoped VMEM under vmap."""
    return 256 if n <= 16384 else 1024


def _iou_kernel(anchors_ref, gt_ref, out_ref):
    """One block: (BLOCK_N, 4) anchors vs all (K, 4) GT -> (BLOCK_N, K)."""
    a = anchors_ref[:]  # (BN, 4)
    b = gt_ref[:]  # (K, 4)

    ax1 = a[:, 0:1]
    ay1 = a[:, 1:2]
    ax2 = a[:, 2:3]
    ay2 = a[:, 3:4]
    bx1 = b[:, 0][None, :]
    by1 = b[:, 1][None, :]
    bx2 = b[:, 2][None, :]
    by2 = b[:, 3][None, :]

    iw = jnp.maximum(jnp.minimum(ax2, bx2) - jnp.maximum(ax1, bx1), 0.0)
    ih = jnp.maximum(jnp.minimum(ay2, by2) - jnp.maximum(ay1, by1), 0.0)
    inter = iw * ih
    area_a = (ax2 - ax1) * (ay2 - ay1)
    area_b = (bx2 - bx1) * (by2 - by1)
    union = area_a + area_b - inter
    out_ref[:] = jnp.where(union > 0, inter / union, 0.0)


def iou_matrix_pallas(boxes_a, boxes_b, interpret: bool = False):
    """(N, 4) x (K, 4) -> (N, K) IoU on TPU via Pallas.

    N is padded to the block size and K to the 128-lane minimum; padding rows
    produce zeros which callers mask out by construction.
    """
    n, k = boxes_a.shape[0], boxes_b.shape[0]
    block_n = _iou_block_rows(n)
    n_pad = _round_up(max(n, 1), block_n)
    k_pad = _round_up(max(k, 1), 128)

    a = jnp.zeros((n_pad, 4), jnp.float32).at[:n].set(boxes_a.astype(jnp.float32))
    b = jnp.zeros((k_pad, 4), jnp.float32).at[:k].set(boxes_b.astype(jnp.float32))

    out = pl.pallas_call(
        _iou_kernel,
        grid=(n_pad // block_n,),
        in_specs=[
            pl.BlockSpec((block_n, 4), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k_pad, 4), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_n, k_pad), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, k_pad), jnp.float32),
        interpret=interpret,
    )(a, b)
    return out[:n, :k]


# ---------------------------------------------------------------------------
# ADD-S min distances
# ---------------------------------------------------------------------------

_DIST_BLOCK_P = 512


def _min_dist_kernel(gt_ref, pred_ref, mask_ref, out_ref):
    """(BP, 3) GT block vs all (Q, 3) pred -> per-row min distance (BP,).

    Direct unrolled differences on the VPU, NOT the |g|^2+|p|^2-2g.p MXU
    expansion: with mm-scale pose translations the expansion cancels ~3
    decimal digits (measured ~1.2 mm error on ~300 mm ADD-S means), which
    can flip near-threshold metric decisions.  At Q<=2048 the three
    (BP, Q) elementwise planes are cheaper than the lost precision.
    """
    g = gt_ref[:]  # (BP, 3)
    p = pred_ref[:]  # (Q, 3)
    mask = mask_ref[:]  # (Q, 1) 1.0 for real rows

    dx = g[:, 0:1] - p[:, 0][None, :]
    dy = g[:, 1:2] - p[:, 1][None, :]
    dz = g[:, 2:3] - p[:, 2][None, :]
    d2 = dx * dx + dy * dy + dz * dz
    # padded pred rows must never win the min
    d2 = jnp.where(mask.T > 0, d2, jnp.inf)
    out_ref[:] = jnp.sqrt(jnp.min(d2, axis=1, keepdims=True))


def min_distances_pallas(points_gt, points_pred, interpret: bool = False):
    """ADD-S inner product on TPU: (P,) min distances from GT to pred points."""
    p, q = points_gt.shape[0], points_pred.shape[0]
    p_pad = _round_up(max(p, 1), _DIST_BLOCK_P)
    q_pad = _round_up(max(q, 1), 128)

    g = jnp.zeros((p_pad, 3), jnp.float32).at[:p].set(points_gt.astype(jnp.float32))
    pr = jnp.zeros((q_pad, 3), jnp.float32).at[:q].set(points_pred.astype(jnp.float32))
    mask = jnp.zeros((q_pad, 1), jnp.float32).at[:q].set(1.0)

    out = pl.pallas_call(
        _min_dist_kernel,
        grid=(p_pad // _DIST_BLOCK_P,),
        in_specs=[
            pl.BlockSpec((_DIST_BLOCK_P, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((q_pad, 3), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((q_pad, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_DIST_BLOCK_P, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((p_pad, 1), jnp.float32),
        interpret=interpret,
    )(g, pr, mask)
    return out[:p, 0]


# ---------------------------------------------------------------------------
# Backend dispatch
# ---------------------------------------------------------------------------


def _on_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def iou_matrix(boxes_a, boxes_b):
    """IoU matrix: Pallas on TPU, jnp reference elsewhere."""
    if _on_tpu():
        return iou_matrix_pallas(boxes_a, boxes_b)
    return _iou_ref.iou_matrix(boxes_a, boxes_b)


def min_distances(points_gt, points_pred):
    """ADD-S min distances: Pallas on TPU, jnp reference elsewhere."""
    if _on_tpu():
        return min_distances_pallas(points_gt, points_pred)
    return _dist_ref.min_distances(points_gt, points_pred)
