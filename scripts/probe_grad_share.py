"""Quantify each loss term's share of the total parameter gradient.

Run D's residual risk (TRAIN_SYNTHETIC.md) is that the hand branch gets
<1% of the total gradient at the parity weighting (hand_weight=1.0,
reference train.py:63-68), so even learnable skeleton hands could crawl.
This probe measures it directly instead of guessing: at a given checkpoint
and a real augmented batch, take grad(weighted component) for each of the
five loss terms separately and report

  * global gradient-norm share per component,
  * the same restricted to the SHARED trunk (backbone+BiFPN) — the tensors
    all heads compete over (each head's own tower only sees its own term),
  * the hand-weight multiplier that would lift the hand trunk share to a
    target fraction (scales linearly: grad(w*L) = w*grad(L)).

CPU-only, one batch, five backward passes (~2-4 min at phi-0/256).

Usage:
  python scripts/probe_grad_share.py --ckpt .long_run_r3k/ckpt/last.npz \
      --data .long_run_r3k/data [--batch 8] [--target-share 0.05]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default=".long_run_r3k/ckpt/last.npz")
    ap.add_argument("--data", default=".long_run_r3k/data")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--target-share", type=float, default=0.05,
                    help="desired hand share of the trunk gradient")
    ap.add_argument("--json-out", default=None)
    args = ap.parse_args()

    from hmd_ego_pose_tpu.config import Config, DataConfig, ModelConfig, TrainConfig
    from hmd_ego_pose_tpu.data.colibri import ColibriDataset
    from hmd_ego_pose_tpu.data.pipeline import InputPipeline
    from hmd_ego_pose_tpu.losses import LossBundle
    from hmd_ego_pose_tpu.train.checkpoint import restore_checkpoint
    from hmd_ego_pose_tpu.train.step import _compute_losses, effective_loss_config

    cfg = Config(
        model=ModelConfig(phi=0, image_size=256, compute_dtype="bfloat16"),
        train=TrainConfig(batch_size=args.batch),
        data=DataConfig(use_6dof_augmentation=True, use_colorspace_augmentation=True),
    )

    ds = ColibriDataset(args.data, fold=0, partition="train")
    pipe = InputPipeline(ds, cfg.data, cfg.model, args.batch, training=True,
                         seed=args.seed)
    rng = np.random.RandomState(args.seed)
    idx = rng.choice(len(ds), size=args.batch, replace=False)
    seeds = rng.randint(0, 2 ** 31 - 1, size=args.batch)
    batch = pipe._make_batch(idx, seeds)

    params, bn_state, meta = restore_checkpoint(args.ckpt)
    model_points = jnp.asarray(ds.model_points_for_loss(cfg.train.loss.num_model_points))
    loss_cfg = effective_loss_config(cfg)
    key = jax.random.PRNGKey(args.seed)

    components = ["classification", "regression", "rotation", "translation", "hand"]

    def one_component(i):
        def f(p):
            _, (bundle, _) = _compute_losses(
                p, bn_state, batch, key, model_points,
                cfg.model, loss_cfg, cfg.train,
            )
            return bundle[i]
        return jax.jit(jax.value_and_grad(f))

    # trunk = everything that is not an output head tower: the tensors all
    # five losses compete over.  Head towers only ever receive their own term.
    flat_paths = [
        "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in path)
        for path, _ in jax.tree_util.tree_flatten_with_path(params)[0]
    ]
    head_markers = ("classifier", "regressor", "rotation", "translation", "hand")

    def is_trunk(p):
        return not any(p.startswith(m) for m in head_markers)

    trunk_mask = [is_trunk(p) for p in flat_paths]
    n_trunk = sum(trunk_mask)
    print(f"[probe] params: {len(flat_paths)} leaves, {n_trunk} trunk leaves "
          f"(markers: {head_markers})")
    if n_trunk == len(flat_paths):
        # head naming differs — show a sample so the markers can be fixed
        print("[probe] WARNING: no head leaves matched; sample paths:")
        for p in flat_paths[:8] + flat_paths[-8:]:
            print("   ", p)

    rows = []
    for i, name in enumerate(components):
        val, g = one_component(i)(params)
        leaves = jax.tree.leaves(g)
        gnorm = float(jnp.sqrt(sum(jnp.vdot(x, x) for x in leaves)).real)
        trunk_leaves = [x for x, m in zip(leaves, trunk_mask) if m]
        tnorm = float(jnp.sqrt(sum(jnp.vdot(x, x) for x in trunk_leaves)).real)
        rows.append({"component": name, "weighted_loss": float(val),
                     "grad_norm": gnorm, "trunk_grad_norm": tnorm})
        print(f"[probe] {name:14s} loss={val:10.4f} |g|={gnorm:10.4f} "
              f"|g_trunk|={tnorm:10.4f}")

    total_g = sum(r["grad_norm"] for r in rows)
    total_t = sum(r["trunk_grad_norm"] for r in rows)
    for r in rows:
        r["share"] = r["grad_norm"] / total_g if total_g else 0.0
        r["trunk_share"] = r["trunk_grad_norm"] / total_t if total_t else 0.0

    print("\ncomponent        share(all)  share(trunk)")
    for r in rows:
        print(f"{r['component']:14s}  {100*r['share']:8.2f}%  {100*r['trunk_share']:9.2f}%")

    hand = next(r for r in rows if r["component"] == "hand")
    # solve w: w*h / (w*h + rest) = target  ->  w = target*rest / ((1-target)*h)
    rest = total_t - hand["trunk_grad_norm"]
    h = hand["trunk_grad_norm"]
    if h > 0:
        w = args.target_share * rest / ((1.0 - args.target_share) * h)
        print(f"\nhand trunk share {100*hand['trunk_share']:.3f}% -> "
              f"hand_weight x{w:.1f} reaches {100*args.target_share:.0f}% trunk share")
    else:
        w = None
        print("\nhand trunk gradient is zero — weighting cannot help")

    out = {"ckpt": args.ckpt, "batch": args.batch, "rows": rows,
           "hand_weight_for_target": w, "target_share": args.target_share,
           "ckpt_epoch": meta.get("epoch")}
    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump(out, f, indent=1)
        print(f"wrote {args.json_out}")


if __name__ == "__main__":
    main()
