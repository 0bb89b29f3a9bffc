"""Device-placement helpers for host-built parameter trees.

Model/optimizer init and checkpoint restore build their trees on the HOST
(hundreds of tiny random/zeros programs would each pay a dispatch roundtrip
AND a remote compile on a remote-attached accelerator — measured ~6 min vs
~40 s for phi-0 init over this container's relay).  A host-built tree must
then be transferred to the accelerator, and HOW matters on remote-attached
devices:

* leaving leaves CPU-committed re-uploads them on EVERY non-donating jit
  call (measured 469 ms/call vs 0.76 ms for phi-0 predict over the relay);
* per-leaf ``jax.device_put`` pays one roundtrip per leaf (~900 leaves,
  measured 354 s over the relay);
* reading ANY accelerator-resident value back to the host (even an 8-byte
  PRNG key) permanently drops a relay session into its ~35 ms/exec slow
  mode — so these helpers never fetch, and callers must hand them
  host-resident trees;
* the fast path (this module): ravel every leaf into ONE host buffer per
  dtype, upload each buffer once (relay uploads measure ~1.5 GB/s), and
  slice/reshape the tree back out ON DEVICE in a single jitted program
  (measured 5.7 s for the 4.7M-param phi-0 tree, ~900 leaves).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp


def pack_transfer(tree):
    """Pack a host tree into per-dtype flat buffers, place them on the
    default device, and unpack with ONE jitted slice/reshape program.

    Leaves must be host-resident (numpy or CPU-backend arrays); reading
    accelerator buffers is exactly what this module exists to avoid.
    """
    leaves, treedef = jax.tree.flatten(tree)

    # host-side numpy copies (CPU-backend or numpy leaves; cheap)
    host = [np.asarray(x) for x in leaves]

    # one packed 1-D buffer per dtype, uploaded once each.  Keyed by
    # dtype.name, which is unique for extension dtypes too — dtype.str is
    # '<V1' for EVERY 1-byte ml_dtypes type (float8_e4m3fn vs float8_e5m2
    # would collide and mis-pack).
    packs = {}  # dtype name -> (list of raveled arrays, [(leaf_idx, offset, size, shape)])
    for i, a in enumerate(host):
        key = a.dtype.name
        buf, spans = packs.setdefault(key, ([], []))
        offset = sum(s[2] for s in spans)
        spans.append((i, offset, a.size, a.shape))
        buf.append(a.ravel())
    uploads = {k: jnp.asarray(np.concatenate(v[0]) if len(v[0]) > 1 else v[0][0])
               for k, v in packs.items()}

    def unpack(bufs):
        out = [None] * len(host)
        for k, (_, spans) in packs.items():
            b = bufs[k]
            for i, offset, size, shape in spans:
                out[i] = jax.lax.dynamic_slice_in_dim(b, offset, size).reshape(shape)
        return out

    new_leaves = jax.jit(unpack)(uploads)
    return jax.tree.unflatten(treedef, new_leaves)


def is_host_tree(tree) -> bool:
    """True iff every leaf is host-resident (numpy or CPU-backend).

    Metadata-only: never reads buffer contents, so it is safe on
    accelerator trees.
    """
    return all(
        not isinstance(x, jax.Array)
        or all(d.platform == "cpu" for d in x.devices())
        for x in jax.tree.leaves(tree)
    )


def to_default_device(tree):
    """Bulk-transfer a host-resident pytree to the default backend's devices.

    No-op when the default backend is the CPU (tests, virtual meshes) —
    re-committing there would only add copies.  Callers that shard over a
    mesh re-place the tree afterwards with an explicit sharding, which is
    always allowed on committed arrays.
    """
    if jax.default_backend() == "cpu":
        return tree

    leaves, _ = jax.tree.flatten(tree)
    if not leaves:
        return tree
    # under tracing (eval_shape/jit of a caller) placement is meaningless
    if any(isinstance(x, jax.core.Tracer) for x in leaves):
        return tree
    return pack_transfer(tree)
