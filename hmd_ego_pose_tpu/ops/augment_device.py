"""On-device training augmentation: color RandAugment + 6-DoF warp, in jnp.

The reference augments on host CPU inside DataLoader workers
(pytorch-sandbox/generators/colibri_common.py:348-534, randaug.py) — on this
project's 1-core host that caps the input pipeline at ~50 img/s while the
chip can train at ~3000 img/s.  The TPU-native answer is to ship cached raw
uint8 frames + tiny labels and run the whole augmentation INSIDE the jitted
train step:

* color ops are elementwise/VPU work (12-op RandAugment set, per-image op
  choice via vmapped lax.switch);
* the 6-DoF warp is an inverse-affine bilinear/nearest gather
  (jax.scipy.ndimage.map_coordinates) about the principal point;
* label updates (pose composition, bbox-from-warped-mask, hand joints,
  2-D centres) are small vectorized math;
* invalid warps (object out of frame) fall back to the unaugmented sample,
  matching colibri_common.py:426-431.

Semantics mirror the host implementations in data/augment.py (same op
formulas, same uint8 truncation points, same zero-border warps); parity is
pinned by tests/test_augment_device.py against the host oracles.  RNG is
jax PRNG, so draws differ from the host numpy stream — distribution, not
stream, is the contract.
"""

from __future__ import annotations

import math
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from hmd_ego_pose_tpu.ops.geometry import axis_angle_to_matrix

_EPS = 1e-12


# ---------------------------------------------------------------------------
# Rotation-matrix -> compact axis-angle (branchless, traceable)
# ---------------------------------------------------------------------------


def matrix_to_axis_angle_jnp(m):
    """(..., 3, 3) rotation matrix -> (..., 3) rotvec; branchless quaternion
    extraction (Shepperd's method via 4-way select), robust at angle ~ 0 and
    ~ pi.  Device twin of ops.geometry.matrix_to_axis_angle (scipy)."""
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]

    t0 = 1.0 + m00 + m11 + m22  # 4w^2
    t1 = 1.0 + m00 - m11 - m22  # 4x^2
    t2 = 1.0 - m00 + m11 - m22  # 4y^2
    t3 = 1.0 - m00 - m11 + m22  # 4z^2

    # quaternion candidates (w, x, y, z), one per dominant component
    def cand0():
        s = jnp.sqrt(jnp.maximum(t0, _EPS)) * 2.0  # 4w
        return jnp.stack(
            [s / 4.0, (m21 - m12) / s, (m02 - m20) / s, (m10 - m01) / s], axis=-1
        )

    def cand1():
        s = jnp.sqrt(jnp.maximum(t1, _EPS)) * 2.0  # 4x
        return jnp.stack(
            [(m21 - m12) / s, s / 4.0, (m01 + m10) / s, (m02 + m20) / s], axis=-1
        )

    def cand2():
        s = jnp.sqrt(jnp.maximum(t2, _EPS)) * 2.0  # 4y
        return jnp.stack(
            [(m02 - m20) / s, (m01 + m10) / s, s / 4.0, (m12 + m21) / s], axis=-1
        )

    def cand3():
        s = jnp.sqrt(jnp.maximum(t3, _EPS)) * 2.0  # 4z
        return jnp.stack(
            [(m10 - m01) / s, (m02 + m20) / s, (m12 + m21) / s, s / 4.0], axis=-1
        )

    t = jnp.stack([t0, t1, t2, t3], axis=-1)
    best = jnp.argmax(t, axis=-1)[..., None]
    q = jnp.where(
        best == 0, cand0(), jnp.where(best == 1, cand1(), jnp.where(best == 2, cand2(), cand3()))
    )
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    q = jnp.where(q[..., 0:1] < 0, -q, q)  # w >= 0 -> angle in [0, pi]

    w = q[..., 0]
    v = q[..., 1:]
    n = jnp.linalg.norm(v, axis=-1)
    angle = 2.0 * jnp.arctan2(n, w)
    scale = jnp.where(n > 1e-9, angle / jnp.where(n > 1e-9, n, 1.0), 2.0)
    return v * scale[..., None]


# ---------------------------------------------------------------------------
# Affine warp (cv2.warpAffine semantics: inverse map, zero border)
# ---------------------------------------------------------------------------


def inverse_affine(angle_deg, scale, cx, cy):
    """Inverse of cv2.getRotationMatrix2D(center, angle, scale) as (2, 3).

    Matches data.image.get_rotation_matrix_2d + _invert_affine; traceable in
    (angle_deg, scale).
    """
    a = angle_deg * (math.pi / 180.0)
    alpha = scale * jnp.cos(a)
    beta = scale * jnp.sin(a)
    tx = (1.0 - alpha) * cx - beta * cy
    ty = beta * cx + (1.0 - alpha) * cy
    det = alpha * alpha + beta * beta
    ia, ib = alpha / det, beta / det  # inv of [[alpha, beta], [-beta, alpha]]
    itx = -(ia * tx + (-ib) * ty)
    ity = -(ib * tx + ia * ty)
    # [[ia, -ib], [ib, ia]] @ [x, y] + [itx, ity]
    return jnp.stack(
        [jnp.stack([ia, -ib, itx]), jnp.stack([ib, ia, ity])], axis=0
    )


def _src_coords(inv, h: int, w: int):
    ys, xs = jnp.mgrid[0:h, 0:w]
    src_x = inv[0, 0] * xs + inv[0, 1] * ys + inv[0, 2]
    src_y = inv[1, 0] * xs + inv[1, 1] * ys + inv[1, 2]
    return src_y, src_x


def warp_bilinear_u8(image, inv):
    """(H, W, C) uint8-valued -> warped uint8 image, zero border, rounded.

    map_coordinates(order=1, constant 0) reproduces the host's per-tap
    zeroing of out-of-bounds samples (data/image.py:104-119).
    """
    h, w = image.shape[:2]
    src_y, src_x = _src_coords(inv, h, w)
    img = image.astype(jnp.float32)
    out = jax.vmap(
        lambda ch: jax.scipy.ndimage.map_coordinates(
            ch, [src_y, src_x], order=1, mode="constant", cval=0.0
        ),
        in_axes=2,
        out_axes=2,
    )(img)
    return jnp.clip(jnp.round(out), 0, 255).astype(jnp.uint8)


def warp_nearest_u8(mask, inv):
    """(H, W) uint8 nearest-neighbour warp, zero border (mask path)."""
    h, w = mask.shape[:2]
    src_y, src_x = _src_coords(inv, h, w)
    return jax.scipy.ndimage.map_coordinates(
        mask.astype(jnp.float32), [src_y, src_x], order=0, mode="constant", cval=0.0
    ).astype(jnp.uint8)


def bbox_from_mask_jnp(sel):
    """(H, W) bool -> ([x1, y1, x2, y2] float32, any_valid).  Inclusive
    extrema, matching data.colibri.get_bbox_from_mask."""
    h, w = sel.shape
    any_row = jnp.any(sel, axis=1)
    any_col = jnp.any(sel, axis=0)
    ys = jnp.arange(h)
    xs = jnp.arange(w)
    y1 = jnp.min(jnp.where(any_row, ys, h))
    y2 = jnp.max(jnp.where(any_row, ys, -1))
    x1 = jnp.min(jnp.where(any_col, xs, w))
    x2 = jnp.max(jnp.where(any_col, xs, -1))
    valid = jnp.any(any_row)
    bbox = jnp.stack([x1, y1, x2, y2]).astype(jnp.float32)
    return jnp.where(valid, bbox, 0.0), valid


# ---------------------------------------------------------------------------
# Color ops (device twins of data/augment.py, float32 in uint8 range)
# ---------------------------------------------------------------------------
# All ops take/return float32 arrays holding exact uint8 values; every host
# `.astype(np.uint8)` after np.clip becomes floor() here (values >= 0, so
# numpy's truncation == floor).


def _u8(x):
    return jnp.floor(jnp.clip(x, 0.0, 255.0))


def _grayscale(img):
    g = 0.299 * img[..., 0] + 0.587 * img[..., 1] + 0.114 * img[..., 2]
    return jnp.floor(g)  # host truncates to uint8


def _blend(a, b, factor):
    return _u8(a + (b - a) * factor)


def _factor(m, r):
    return 0.1 + m * 1.8 / 14.0 * r


def _op_autocontrast(img, m, key):
    lo = jnp.floor(jnp.min(img, axis=(0, 1), keepdims=True))
    hi = jnp.floor(jnp.max(img, axis=(0, 1), keepdims=True))
    stretched = jnp.floor((img - lo) * (255.0 / jnp.maximum(hi - lo, 1.0)))
    return jnp.where(hi <= lo, img, jnp.clip(stretched, 0, 255))


def _op_equalize(img, m, key):
    def eq_channel(ch):
        flat = ch.astype(jnp.int32).ravel()
        hist = jnp.zeros((256,), jnp.int32).at[flat].add(1)
        cdf = jnp.cumsum(hist)
        # first nonzero cdf value (host: cdf of first occupied bin)
        cdf_min = jnp.min(jnp.where(hist > 0, cdf, cdf[-1] + 1))
        denom = cdf[-1] - cdf_min
        lut = jnp.clip(
            jnp.round((cdf - cdf_min) * 255.0 / jnp.maximum(denom, 1)), 0, 255
        )
        out = lut[flat].reshape(ch.shape).astype(jnp.float32)
        return jnp.where(denom == 0, ch, out)

    return jax.vmap(eq_channel, in_axes=2, out_axes=2)(img)


def _op_invert(img, m, key):
    return 255.0 - img


def _op_posterize(img, m, key):
    bits = jnp.maximum(1, 8 - jnp.floor(m * 4.0 / 14.0).astype(jnp.int32))
    q = jnp.exp2((8 - bits).astype(jnp.float32))
    return jnp.floor(img / q) * q


def _op_solarize(img, m, key):
    threshold = 256.0 - jnp.floor(m * 256.0 / 14.0)
    return jnp.where(img < threshold, img, 255.0 - img)


def _op_color(img, m, key):
    f = _factor(m, jax.random.uniform(key))
    gray = _grayscale(img)[..., None] * jnp.ones((3,), jnp.float32)
    return _blend(gray, img, f)


def _op_contrast(img, m, key):
    f = _factor(m, jax.random.uniform(key))
    mean = jnp.floor(jnp.mean(_grayscale(img)))  # host: int(gray.mean())
    return _blend(jnp.full_like(img, mean), img, f)


def _op_brightness(img, m, key):
    f = _factor(m, jax.random.uniform(key))
    return _blend(jnp.zeros_like(img), img, f)


def _conv3x3(img, kernel):
    """Edge-padded 3x3 conv as 9 shifted adds (host data/augment.py:217-223)."""
    pad = jnp.pad(img, ((1, 1), (1, 1), (0, 0)), mode="edge")
    h, w = img.shape[:2]
    out = jnp.zeros_like(img)
    for dy in range(3):
        for dx in range(3):
            out = out + kernel[dy][dx] * jax.lax.dynamic_slice(
                pad, (dy, dx, 0), (h, w, img.shape[2])
            )
    return _u8(out)


_SMOOTH_K = [[1 / 13.0] * 3, [1 / 13.0, 5 / 13.0, 1 / 13.0], [1 / 13.0] * 3]
_BLUR_K = [[1 / 9.0] * 3] * 3


def _op_sharpness(img, m, key):
    f = _factor(m, jax.random.uniform(key))
    return _blend(_conv3x3(img, _SMOOTH_K), img, f)


def _op_cutout(img, m, key):
    h, w = img.shape[:2]
    size = jnp.floor(min(h, w) * (0.1 + 0.3 * m / 14.0)).astype(jnp.int32)
    ky, kx = jax.random.split(key)
    y = jax.random.randint(ky, (), 0, h)
    x = jax.random.randint(kx, (), 0, w)
    ys = jnp.arange(h)[:, None]
    xs = jnp.arange(w)[None, :]
    box = (
        (ys >= jnp.maximum(0, y - size // 2)) & (ys < y + size // 2)
        & (xs >= jnp.maximum(0, x - size // 2)) & (xs < x + size // 2)
    )
    out = jnp.where(box[..., None], 127.0, img)
    return jnp.where(size == 0, img, out)


def _op_gaussian_noise(img, m, key):
    sigma = m / 14.0 * 25.0
    noise = jax.random.normal(key, img.shape) * sigma
    return _u8(img + noise)


def _op_blur(img, m, key):
    return _conv3x3(img, _BLUR_K)


def _op_smooth(img, m, key):
    """PIL ImageFilter.SMOOTH (pillike.FilterSmooth, randaug.py:277)."""
    return _conv3x3(img, _SMOOTH_K)


def _op_identity(img, m, key):
    return img


# order mirrors data.augment.COLOR_OPS (14 ops, matching the reference's
# randaug.py:245-278 distribution); the final slot doubles as the
# inactive-slot identity branch
COLOR_OP_BRANCHES = (
    _op_autocontrast,
    _op_equalize,
    _op_invert,
    _op_posterize,
    _op_solarize,
    _op_color,
    _op_contrast,
    _op_brightness,
    _op_sharpness,
    _op_cutout,
    _op_gaussian_noise,
    _op_blur,
    _op_smooth,
    _op_identity,
)

_NUM_OPS = 14
_MAX_SLOTS = 2  # host draws n in [1, 3)


def color_augment(image_u8, key, n_range=(1, 3), magnitude_range=(1, 14)):
    """Device twin of data.augment.ColorAugmenter for one (H, W, 3) image."""
    img = image_u8.astype(jnp.float32)
    k_n, k_ops, k_mags, k_inner = jax.random.split(key, 4)
    n = jax.random.randint(k_n, (), n_range[0], n_range[1])
    op_ids = jax.random.randint(k_ops, (_MAX_SLOTS,), 0, _NUM_OPS)
    mags = jax.random.randint(
        k_mags, (_MAX_SLOTS,), magnitude_range[0], magnitude_range[1]
    )
    inner = jax.random.split(k_inner, _MAX_SLOTS)
    for slot in range(_MAX_SLOTS):
        idx = jnp.where(slot < n, op_ids[slot], _NUM_OPS - 1)  # identity if inactive
        img = jax.lax.switch(
            idx, COLOR_OP_BRANCHES, img, mags[slot].astype(jnp.float32), inner[slot]
        )
    return img.astype(jnp.uint8)


# ---------------------------------------------------------------------------
# Full 6-DoF augmentation of one example (device twin of augment_6dof)
# ---------------------------------------------------------------------------


class RawBatch(NamedTuple):
    """Host -> device batch of UNaugmented frames + raw labels.

    The host only decodes (cached) PNGs and packs arrays; augmentation,
    preprocessing and target assignment all happen inside the train step.
    K = 1 with ``gt_mask_values=None`` is the colibri family (one object,
    mask value 255); K > 1 requires per-object mask pixel values so the
    warp can recompute each object's bbox from the warped mask.
    """

    frames: jax.Array  # (B, H, W, 3) uint8
    masks: jax.Array  # (B, H, W) uint8
    camera_fxfycxcy: jax.Array  # (B, 4) float32
    gt_boxes: jax.Array  # (B, K, 4) frame-pixel xyxy
    gt_rotations: jax.Array  # (B, K, 3) axis-angle radians
    gt_is_sym: jax.Array  # (B, K) float32
    gt_translations: jax.Array  # (B, K, 3) mm
    gt_coords_3d: jax.Array  # (B, K, 21, 3)
    gt_labels: jax.Array  # (B, K) int32
    gt_valid: jax.Array  # (B, K) bool
    gt_mask_values: jax.Array | None = None  # (B, K) int32; None -> all 255


class AugmentedExample(NamedTuple):
    image: jax.Array  # (H, W, 3) uint8
    bbox: jax.Array  # (4,) float32, frame pixels
    rotation: jax.Array  # (3,) axis-angle (radians)
    translation: jax.Array  # (3,) mm
    coords_3d: jax.Array  # (21, 3)
    applied: jax.Array  # () bool — whether the warp was kept


def augment_6dof_device(
    image_u8,
    mask_u8,
    bbox,
    rotation,
    translation,
    coords_3d,
    cx,
    cy,
    angle_deg,
    scale,
    mask_value: int = 255,
):
    """Warp one frame + labels; falls back to the input when the object's
    mask leaves the frame (colibri_common.py:426-431).

    Follows data.augment.augment_6dof: image warped by -angle about the
    principal point, pose composed with a +angle camera-Z rotation, Tz and
    hand-joint z divided by scale, bbox recomputed from the warped mask.
    """
    inv = inverse_affine(-angle_deg, scale, cx, cy)
    aug_image = warp_bilinear_u8(image_u8, inv)
    aug_mask = warp_nearest_u8(mask_u8, inv)

    new_bbox, obj_valid = bbox_from_mask_jnp(aug_mask == mask_value)

    rz = jnp.stack([0.0, 0.0, angle_deg * (math.pi / 180.0)])
    rot_z = axis_angle_to_matrix(rz)

    # HIGHEST precision: pose-label math must not ride the bf16 MXU default
    hi = jax.lax.Precision.HIGHEST
    r_obj = axis_angle_to_matrix(rotation)
    new_rot = matrix_to_axis_angle_jnp(jnp.einsum("ij,jk->ik", rot_z, r_obj, precision=hi))

    new_t = jnp.einsum("ij,j->i", rot_z, translation, precision=hi)  # t @ rot_z.T
    new_t = new_t.at[2].set(new_t[2] / scale)

    new_coords = jnp.einsum("pj,ij->pi", coords_3d, rot_z, precision=hi)
    new_coords = new_coords.at[:, 2].set(new_coords[:, 2] / scale)

    keep = obj_valid

    def sel(a, b):
        return jnp.where(keep, a, b)

    return AugmentedExample(
        image=sel(aug_image, image_u8),
        bbox=sel(new_bbox, bbox),
        rotation=sel(new_rot, rotation),
        translation=sel(new_t, translation),
        coords_3d=sel(new_coords, coords_3d),
        applied=keep,
    )


def augment_6dof_device_multi(
    image_u8,
    mask_u8,
    bboxes,
    rotations,
    translations,
    coords_3d,
    mask_values,
    valid,
    cx,
    cy,
    angle_deg,
    scale,
):
    """K-object device 6-DoF warp: one shared image/mask warp, per-object
    label math vmapped over K, per-object bboxes recomputed from the warped
    mask at each object's own pixel value.

    Semantics mirror the host oracle ``data.augment.augment_6dof`` with
    ``mask_values``: the warp is kept when at least one valid object's mask
    survives; objects whose mask leaves the frame are invalidated (the host
    DROPS their rows — static device shapes keep the rows and clear
    ``valid`` instead, which target assignment treats identically); the
    whole sample reverts only when EVERY valid object vanishes
    (colibri_common.py:426-431).  Restricted to K=1 / mask value 255 this
    is bit-identical to ``augment_6dof_device``.

    Args:
        bboxes: (K, 4); rotations: (K, 3); translations: (K, 3);
        coords_3d: (K, 21, 3); mask_values: (K,) int; valid: (K,) bool.
    Returns:
        (image, bboxes, rotations, translations, coords_3d, valid, applied)
        with the same per-object shapes; ``applied`` is the scalar keep
        flag.
    """
    inv = inverse_affine(-angle_deg, scale, cx, cy)
    aug_image = warp_bilinear_u8(image_u8, inv)
    aug_mask = warp_nearest_u8(mask_u8, inv)

    rz = jnp.stack([0.0, 0.0, angle_deg * (math.pi / 180.0)])
    rot_z = axis_angle_to_matrix(rz)
    hi = jax.lax.Precision.HIGHEST

    def per_object(bbox, rotation, translation, coords, mval):
        new_bbox, obj_valid = bbox_from_mask_jnp(aug_mask == mval)
        r_obj = axis_angle_to_matrix(rotation)
        new_rot = matrix_to_axis_angle_jnp(
            jnp.einsum("ij,jk->ik", rot_z, r_obj, precision=hi)
        )
        new_t = jnp.einsum("ij,j->i", rot_z, translation, precision=hi)
        new_t = new_t.at[2].set(new_t[2] / scale)
        new_c = jnp.einsum("pj,ij->pi", coords, rot_z, precision=hi)
        new_c = new_c.at[:, 2].set(new_c[:, 2] / scale)
        return new_bbox, new_rot, new_t, new_c, obj_valid

    nb, nr, nt, nc, obj_valid = jax.vmap(per_object)(
        bboxes, rotations, translations, coords_3d,
        mask_values.astype(mask_u8.dtype),
    )
    keep = jnp.any(obj_valid & valid)

    def sel(a, b):
        return jnp.where(keep, a, b)

    return (
        sel(aug_image, image_u8),
        sel(nb, bboxes),
        sel(nr, rotations),
        sel(nt, translations),
        sel(nc, coords_3d),
        jnp.where(keep, valid & obj_valid, valid),
        keep,
    )


# ---------------------------------------------------------------------------
# Batched augment + preprocess: RawBatch -> train.step.Batch
# ---------------------------------------------------------------------------


def augment_and_preprocess_batch(
    key,
    raw: RawBatch,
    image_size: int,
    translation_scale_norm: float = 1000.0,
    chance_no_augmentation: float = 0.02,
    use_colorspace: bool = True,
    use_6dof: bool = True,
    scale_range: Tuple[float, float] = (0.7, 1.3),
):
    """One fused device program: color aug -> 6-DoF warp -> resize/normalize
    -> label-space scaling, emitting the exact Batch the train step consumes
    (train/step.py).  Mirrors InputPipeline._load_example semantics
    (data/pipeline.py) with jax PRNG randomness.
    """
    from hmd_ego_pose_tpu.ops.preprocess import preprocess_scale, preprocess_uint8_batch
    from hmd_ego_pose_tpu.train.step import Batch

    b, h, w, _ = raw.frames.shape
    k = raw.gt_boxes.shape[1]
    mask_values = raw.gt_mask_values
    if mask_values is None:
        # colibri-family convention: one object rendered at mask value 255
        if k != 1:
            raise ValueError(
                "K>1 device augmentation needs RawBatch.gt_mask_values "
                "(per-object mask pixel values)"
            )
        mask_values = jnp.full((b, k), 255, jnp.int32)

    keys = jax.random.split(key, b * 4).reshape(b, 4, 2)

    def one(frame, mask, cam4, bbox, rot, trans, coords, mvals, vld, ks):
        k_apply, k_color, k_angle, k_scale = ks[0], ks[1], ks[2], ks[3]
        apply_aug = jax.random.uniform(k_apply) >= chance_no_augmentation

        img = frame
        if use_colorspace:
            colored = color_augment(img, k_color)
            img = jnp.where(apply_aug, colored, img)

        if use_6dof:
            angle = jax.random.uniform(k_angle) * 360.0
            scale = (
                jax.random.uniform(k_scale) * (scale_range[1] - scale_range[0])
                + scale_range[0]
            )
            (a_img, a_bbox, a_rot, a_trans, a_coords, a_valid, _) = (
                augment_6dof_device_multi(
                    img, mask, bbox, rot, trans, coords, mvals, vld,
                    cam4[2], cam4[3], angle, scale,
                )
            )

            def sel(aug, orig):
                shape = (1,) * orig.ndim
                return jnp.where(jnp.reshape(apply_aug, shape), aug, orig)

            img = sel(a_img, img)
            bbox_o = sel(a_bbox, bbox)
            rot_o = sel(a_rot, rot)
            trans_o = sel(a_trans, trans)
            coords_o = sel(a_coords, coords)
            valid_o = sel(a_valid, vld)
            return img, bbox_o, rot_o, trans_o, coords_o, valid_o
        return img, bbox, rot, trans, coords, vld

    imgs, bboxes, rots, transs, coordss, valids = jax.vmap(one)(
        raw.frames,
        raw.masks,
        raw.camera_fxfycxcy,
        raw.gt_boxes,
        raw.gt_rotations,
        raw.gt_translations,
        raw.gt_coords_3d,
        mask_values,
        raw.gt_valid,
        keys,
    )

    images = preprocess_uint8_batch(imgs, image_size)
    image_scale = preprocess_scale(h, w, image_size)

    camera_parameters = jnp.concatenate(
        [
            raw.camera_fxfycxcy,
            jnp.full((b, 1), translation_scale_norm, jnp.float32),
            jnp.full((b, 1), image_scale, jnp.float32),
        ],
        axis=1,
    )

    # label-space preprocessing (data/pipeline.py:66-70): scale bboxes and
    # hand coords by the image scale, normalize rotation to [-1, 1].  The
    # class column drives the loss's per-class 3D-model-point lookup
    # (losses.py transformation branch), so it must carry the real label.
    gt_boxes = bboxes * image_scale  # (B, K, 4)
    transformation = jnp.concatenate(
        [
            rots / jnp.pi,
            transs,
            raw.gt_is_sym[..., None],
            raw.gt_labels.astype(jnp.float32)[..., None],
        ],
        axis=-1,
    )  # (B, K, 8)
    gt_coords = (coordss * image_scale).reshape(b, k, 63)

    return Batch(
        images=images,
        camera_parameters=camera_parameters,
        gt_boxes=gt_boxes.astype(jnp.float32),
        gt_labels=raw.gt_labels,
        gt_transformation=transformation.astype(jnp.float32),
        gt_coords_3d=gt_coords.astype(jnp.float32),
        gt_valid=valids,
    )
