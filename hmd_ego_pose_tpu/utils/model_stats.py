"""Model size / parameter / FLOP reporting.

Parity with the reference's startup printout (pytorch-sandbox/main.py:169-179:
count_parameters + print_size_of_model + ptflops get_model_complexity_info),
done the XLA-native way: parameters are counted from the abstract shape tree
(jax.eval_shape, no materialization) and FLOPs come from the lowered HLO's
cost analysis instead of a hand-maintained per-module table.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def count_params(params: Any) -> int:
    """Total number of scalar parameters in a pytree (of arrays or
    ShapeDtypeStructs)."""
    return int(sum(int(np.prod(x.shape)) for x in jax.tree.leaves(params)))


def param_bytes(params: Any) -> int:
    return int(
        sum(int(np.prod(x.shape)) * jnp.dtype(x.dtype).itemsize for x in jax.tree.leaves(params))
    )


def abstract_model(config) -> Tuple[Any, Any]:
    """Shape/dtype trees of (params, bn_state) without allocating memory."""
    from hmd_ego_pose_tpu.models import hmd_ego_pose

    return jax.eval_shape(lambda k: hmd_ego_pose.init(k, config), jax.random.PRNGKey(0))


def _jaxpr_flops(jaxpr) -> float:
    """Dominant-term FLOP count from a jaxpr: 2*MACs for every conv and
    dot_general, recursing into sub-jaxprs (pjit, custom_jvp, scan, ...).

    Backend-independent — used when the XLA client's HLO cost analysis is
    unavailable (e.g. the experimental tunnel backend returns None).
    """
    total = 0.0
    for eqn in jaxpr.eqns:
        prim = eqn.primitive.name
        if prim == "conv_general_dilated":
            out_shape = eqn.outvars[0].aval.shape
            rhs_shape = eqn.invars[1].aval.shape
            dn = eqn.params["dimension_numbers"]
            out_feature_dim = dn.rhs_spec[0]  # O in the kernel spec
            macs_per_out = int(np.prod(rhs_shape)) / max(rhs_shape[out_feature_dim], 1)
            total += 2.0 * float(np.prod(out_shape)) * macs_per_out
        elif prim == "dot_general":
            out_shape = eqn.outvars[0].aval.shape
            lhs_shape = eqn.invars[0].aval.shape
            (lhs_contract, _), _ = eqn.params["dimension_numbers"]
            k = float(np.prod([lhs_shape[d] for d in lhs_contract])) or 1.0
            total += 2.0 * float(np.prod(out_shape)) * k
        for sub in eqn.params.values():
            if hasattr(sub, "jaxpr"):  # ClosedJaxpr
                total += _jaxpr_flops(sub.jaxpr)
    return total


def forward_flops(config, batch_size: int = 1) -> Optional[float]:
    """Estimated FLOPs of one forward pass.

    Prefers XLA's HLO cost analysis; falls back to an analytic conv/matmul
    count over the jaxpr when the backend provides none.  Returns None only
    if both paths fail.
    """
    from hmd_ego_pose_tpu.models import hmd_ego_pose

    p_shapes, s_shapes = abstract_model(config)
    img = jax.ShapeDtypeStruct(
        (batch_size, config.image_size, config.image_size, 3), jnp.float32
    )

    def fwd(params, state, images):
        out, _ = hmd_ego_pose.apply(params, state, images, config)
        return out[1:]  # head outputs only

    try:
        lowered = jax.jit(fwd).lower(p_shapes, s_shapes, img)
        cost = lowered.cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        flops = cost.get("flops") if cost else None
        if flops:
            return float(flops)
    except Exception:
        pass
    try:
        closed = jax.make_jaxpr(fwd)(p_shapes, s_shapes, img)
        return _jaxpr_flops(closed.jaxpr)
    except Exception:
        return None


def format_model_stats(config, batch_size: int = 1) -> str:
    """'HMD-EgoPose parameter count / size / flops' block (main.py:169-179)."""
    p_shapes, _ = abstract_model(config)
    n = count_params(p_shapes)
    size_mb = param_bytes(p_shapes) / (1024.0 * 1024.0)
    lines = [
        f"HMD-EgoPose parameter count: {n}",
        f"Size (MB): {size_mb:.3f}",
        f"Model params: {n / 1e6:.2f} M",
    ]
    flops = forward_flops(config, batch_size=batch_size)
    if flops is not None:
        lines.append(
            f"Model flops:  {flops / 1e9:.2f} GFLOPs"
            f" (batch {batch_size} @ {config.image_size}px, XLA HLO cost analysis)"
        )
    return "\n".join(lines)
