"""LoRA adapters for the Lens tower (beyond-reference capability).

The reference's fine-tuning story is the lock/partial-unfreeze zoo
(transformer.py:553-627, params.py lock flags) — whole layer groups either
train or don't. LoRA is the TPU-friendly completion of that spectrum: rank-r
factors on the trunk matmuls train while the 300M-2.5B frozen weights stay
untouched, so the optimizer state is ~(2r/D) of a full unfreeze and the
checkpoint delta is a few MB.

Design (idiomatic JAX, merge-at-apply):
  * `lora_init` builds a pytree that MIRRORS the targeted weight leaves of
    one tower: each target leaf W [.., in, out] gets {"a": [.., in, r],
    "b": [.., r, out]} (b zero-initialised, so step 0 is exactly the base
    model). Scan-stacked trunk blocks keep their leading layer dim.
  * The tree is stored INSIDE the tower params under the reserved key
    "lora" — it rides every existing code path (orbax checkpoints, FSDP
    placement, donation, census) with zero plumbing.
  * `merge_lora` replaces W by W + (alpha/r) * a @ b and drops the "lora"
    subtree; the tower apply calls it at entry, so gradients flow through
    the merge into (a, b) while the base W (stop-padded by the trainable
    mask) stays frozen. The merge is one [L, in, r] @ [L, r, out] einsum
    per target — ~1 GF for ViT-L r=8, invisible next to the 230 GF
    forward — and XLA fuses it with the consumer matmul's operand load.
  * `lora_mask` produces the optimizer/trainability mask: ones on a/b,
    zeros everywhere else (including the stored scale), composing with the
    freeze machinery (train/freeze.py) and `optax.masked` state pruning.

Serving/export: `merge_lora(params)` returns a plain tower tree — the
fine-tuned weights in the exact layout converters/checkpoints expect.
"""

from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import jax
import jax.numpy as jnp

Params = Dict[str, Any]

# targets are dotted paths WITHIN one trunk block (layers.resblock_init);
# the default covers every matmul in the block, the standard LoRA surface
DEFAULT_TARGETS: Tuple[str, ...] = (
    "attn.qkv_w", "attn.out_w", "mlp.fc.w", "mlp.proj.w",
)


def _get_path(tree: Params, path: Sequence[str]):
    for k in path:
        if not isinstance(tree, dict) or k not in tree:
            return None
        tree = tree[k]
    return tree


def _set_path(tree: Params, path: Sequence[str], value) -> Params:
    """Functional deep-set (copies only the touched spine)."""
    if not path:
        return value
    out = dict(tree)
    out[path[0]] = _set_path(tree.get(path[0], {}), path[1:], value)
    return out


def lora_init(
    key: jax.Array,
    tower_params: Params,
    rank: int,
    *,
    alpha: float | None = None,
    targets: Sequence[str] = DEFAULT_TARGETS,
    dtype: jnp.dtype = jnp.float32,
) -> Params:
    """Build the "lora" subtree for one tower's params.

    a ~ N(0, 1/r) (Hu et al. use kaiming on A), b = 0 — the merged model at
    init is bitwise the base model. Targets that don't exist in this tower
    (e.g. no perceiver) are skipped silently so one target list serves every
    arch.
    """
    if rank <= 0:
        raise ValueError(f"lora rank must be positive, got {rank}")
    blocks = _get_path(tower_params, ("trunk", "blocks"))
    if blocks is None:
        raise ValueError("tower params have no trunk.blocks to adapt")
    scale = (alpha if alpha is not None else float(rank)) / float(rank)

    lora: Params = {"scale": jnp.asarray(scale, jnp.float32)}
    unmatched = []
    for t in targets:
        path = t.strip().split(".")
        w = _get_path(blocks, path)
        if w is None:
            # tolerated so one target list serves every arch — but say so:
            # a typo here would otherwise silently train fewer adapters
            unmatched.append(t.strip())
            continue
        if w.ndim not in (2, 3):
            raise ValueError(f"lora target {t} has ndim {w.ndim}; "
                             "expected [in,out] or stacked [L,in,out]")
        key, sub = jax.random.split(key)
        lead = w.shape[:-2]
        fan_in, fan_out = w.shape[-2], w.shape[-1]
        a = (jax.random.normal(sub, lead + (fan_in, rank), dtype)
             * (rank ** -0.5))
        b = jnp.zeros(lead + (rank, fan_out), dtype)
        lora = _set_path(lora, ["trunk", "blocks"] + path, {"a": a, "b": b})
    if "trunk" not in lora:
        raise ValueError(f"no lora target in {targets!r} matched this tower")
    if unmatched:
        import logging

        logging.warning(f"lora_init: targets {unmatched} matched nothing in "
                        "this tower's trunk blocks and were skipped")
    return lora


def reset_lora(lora: Params) -> Params:
    """The lora subtree with every `b` zeroed: the adapters contribute a
    zero delta, so a model that just restored MERGED weights (an
    `export_checkpoint` artifact) equals the export exactly while keeping
    trainable factors to continue fine-tuning from it."""

    def rec(node):
        if _is_ab(node):
            return {"a": node["a"], "b": jnp.zeros_like(node["b"])}
        return {k: rec(v) for k, v in node.items()}

    return {k: (v if k == "scale" else rec(v)) for k, v in lora.items()}


def _is_ab(node) -> bool:
    return (isinstance(node, dict) and set(node.keys()) == {"a", "b"}
            and not isinstance(node["a"], dict))


def _merge_into(params: Params, lora_sub: Params, scale: jnp.ndarray) -> Params:
    out = dict(params)
    for k, node in lora_sub.items():
        if _is_ab(node):
            w = params[k]
            a = node["a"].astype(w.dtype)
            b = node["b"].astype(w.dtype)
            delta = scale.astype(w.dtype) * (
                jnp.einsum("lir,lro->lio", a, b) if w.ndim == 3 else a @ b)
            out[k] = w + delta
        else:
            out[k] = _merge_into(params[k], node, scale)
    return out


def merge_lora(tower_params: Params) -> Params:
    """W + (alpha/r)·a@b for every adapted leaf; drops the "lora" key.

    No-op (same object) when the tower carries no lora. Called by the tower
    apply fns at entry so train/eval/serve all see the adapted weights.
    """
    if "lora" not in tower_params:
        return tower_params
    lora = tower_params["lora"]
    out = {k: v for k, v in tower_params.items() if k != "lora"}
    scale = lora["scale"]
    for k, node in lora.items():
        if k == "scale":
            continue
        out[k] = _merge_into(out[k], node, scale)
    return out


def lora_mask(tower_params: Params) -> Params:
    """Trainability mask for a tower carrying a "lora" subtree: ones on the
    a/b factors, zeros on everything else (base weights AND the scale)."""

    def zeros(tree):
        return jax.tree.map(lambda p: jnp.zeros((), jnp.float32), tree)

    def lora_ones(tree):
        if _is_ab(tree):
            return {"a": jnp.ones((), jnp.float32),
                    "b": jnp.ones((), jnp.float32)}
        return {k: (jnp.zeros((), jnp.float32) if k == "scale"
                    else lora_ones(v)) for k, v in tree.items()}

    mask = {k: zeros(v) for k, v in tower_params.items() if k != "lora"}
    mask["lora"] = lora_ones(tower_params["lora"])
    return mask
