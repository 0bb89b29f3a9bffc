"""Ship a training-run checkpoint as a distributable int8 artifact.

Converts <workdir>/ckpt/last.npz (fp32 params + BN + optional Adam moments)
into trained/<name>_int8.npz + a JSON sidecar carrying the eval metrics,
hand-decode convention, and provenance — the artifact format the shipped
checkpoints (trained/README.md) use and tests/test_trained_checkpoint.py
pins.  Mirrors the reference's metric-encoded .pth export
(pytorch-sandbox/train.py:316-334) with explicit metadata instead of
filename parsing.

Runs entirely HOST-SIDE (forced-CPU jax): touching the relay-attached TPU
from a utility script would contend with any training run in flight and
pay the device-read degrade for nothing.

Usage:
    python scripts/ship_artifact.py --workdir .long_run_ib \
        --name syn1000_phi0_544ep_handrel_rebalance --notes "run I-b final"
"""

import argparse
import json
import os
import sys

import jax

jax.config.update("jax_platforms", "cpu")  # before any device query

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", required=True)
    ap.add_argument("--name", required=True,
                    help="artifact basename (no extension); written to "
                         "trained/<name>_int8.npz")
    ap.add_argument("--notes", default="")
    args = ap.parse_args()

    from hmd_ego_pose_tpu.ops.quantization import quantize_tree
    from hmd_ego_pose_tpu.train.checkpoint import (
        _flatten, _unflatten, meta_hand_relative,
    )

    src = os.path.join(args.workdir, "ckpt", "last.npz")
    data = np.load(src)
    params = _unflatten(
        {k[len("params/"):]: data[k] for k in data.files if k.startswith("params/")})
    bn = {k: data[k] for k in data.files if k.startswith("bn/")}
    assert "__format__" not in data.files, (
        "source is already quantized; ship from the fp32 training checkpoint")

    meta = {}
    meta_path = os.path.join(args.workdir, "ckpt", "last.json")
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)

    # final-shift eval metrics from the run history (the sidecar's `metric`
    # is only the checkpoint-selection scalar)
    hist_path = os.path.join(args.workdir, "history.jsonl")
    eval_metrics = {}
    if os.path.exists(hist_path):
        with open(hist_path) as f:
            rows = [json.loads(line) for line in f if line.strip()]
        if rows:
            eval_metrics = rows[-1].get("eval", {})

    hand_rel = meta_hand_relative(meta)
    sidecar = {
        "source": src,
        "train_step": meta.get("train_step"),
        "epoch": meta.get("epoch"),
        "hand_relative": bool(hand_rel) if hand_rel is not None else False,
        "eval": {k: round(float(v), 4) for k, v in eval_metrics.items()},
        "notes": args.notes,
        "config": meta.get("config", ""),
    }

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = os.path.join(repo, "trained", f"{args.name}_int8.npz")
    packed = quantize_tree(params)
    flat = {"__format__": np.asarray("int8")}
    flat.update({"params/" + k: np.asarray(v) for k, v in _flatten(packed).items()})
    flat.update(bn)
    np.savez(out, **flat)
    with open(out[: -len(".npz")] + ".json", "w") as f:
        json.dump(sidecar, f, indent=2)
    print(f"shipped {out} ({os.path.getsize(out) / 1e6:.1f} MB, "
          f"hand_relative={sidecar['hand_relative']}, "
          f"step {sidecar['train_step']})")


if __name__ == "__main__":
    main()
