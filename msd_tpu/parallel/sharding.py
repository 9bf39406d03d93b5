"""Mesh + sharding layout for multi-chip execution.

The reference's parallelism is NCCL DDP for eval and DeepSpeed ZeRO for draft
training (SURVEY.md §2.7). The TPU-native replacement is a single
``jax.sharding.Mesh`` over ICI with named axes:

    data  — data parallel (batch/doc sharding; evaluator ranks in the ref)
    model — megatron-style tensor parallel over attention heads / MLP columns

Parameters are annotated with PartitionSpecs (below); XLA inserts the
all-reduces that NCCL calls performed explicitly in the reference. ZeRO-style
optimizer-state sharding falls out of sharding opt state like the params
(fully sharded over 'data' if desired).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from msd_tpu.configs import DraftConfig, LlamaConfig


def make_mesh(n_devices: Optional[int] = None, dp: Optional[int] = None,
              tp: Optional[int] = None) -> Mesh:
    """Build a (data, model) mesh. Defaults: tp = min(n, heads-friendly 4)."""
    devs = jax.devices()
    n = n_devices or len(devs)
    devs = devs[:n]
    if tp is None:
        # default: use both axes when possible (dp >= 2 exercises data
        # parallelism, tp covers the megatron splits)
        if n >= 8 and n % 4 == 0:
            tp = 4
        elif n % 2 == 0 and n > 1:
            tp = 2
        else:
            tp = 1
    dp = dp or (n // tp)
    assert dp * tp == n, f"dp({dp}) * tp({tp}) != n({n})"
    arr = np.asarray(devs).reshape(dp, tp)
    return Mesh(arr, axis_names=("data", "model"))


# ---------------------------------------------------------------------------
# PartitionSpecs: megatron TP layout.
# Linear weights are stored [in, out]:
#   q/k/v, gate/up : shard OUT dim over 'model' (column parallel)
#   o, down        : shard IN dim over 'model'  (row parallel; XLA inserts the
#                    psum that megatron does manually)
#   embeddings / lm_head : shard vocab/hidden columns over 'model'
# ---------------------------------------------------------------------------

def llama_param_specs(cfg: LlamaConfig, stacked: bool = True) -> Dict:
    l = ("layers",) if stacked else ()  # leading layer axis from _stack_layers
    lead = (None,) if stacked else ()

    def spec(*axes):
        return P(*(lead + axes)) if stacked else P(*axes)

    layer = {
        "input_layernorm": spec(None),
        "post_attention_layernorm": spec(None),
        # q/k/v stored [out, in]: output (head) dim is axis 0
        "q_proj": spec("model", None),
        "k_proj": spec("model", None),
        "v_proj": spec("model", None),
        "o_proj": spec("model", None),
        "gate_proj": spec(None, "model"),
        "up_proj": spec(None, "model"),
        "down_proj": spec("model", None),
    }
    # int8 weight-only scales (quantize_llama_params): shaped like the
    # weight with a singleton contraction dim. Column-parallel weights
    # (sharded on the output dim) keep the weight's spec; row-parallel ones
    # (o/down, sharded on the contraction dim) replicate the scale since its
    # corresponding dim is the singleton.
    for nm in ("q_proj", "k_proj", "v_proj", "gate_proj", "up_proj"):
        layer[nm + "_qs"] = layer[nm + "_qs4"] = layer[nm]
    for nm in ("o_proj", "down_proj"):
        layer[nm + "_qs"] = layer[nm + "_qs4"] = spec(None, None)
    return {
        "embed_tokens": P(None, "model"),
        "layers": layer,
        "norm": P(None),
        "lm_head": P(None, "model"),
        "lm_head_qs": P(None, "model"),
        "lm_head_qs4": P(None, "model"),
    }


def draft_param_specs(cfg: DraftConfig, has_bias: bool = True) -> Dict:
    base = llama_param_specs(cfg.text)
    # fc output feeds the decoder layer's (replicated-input) projections, so
    # fc stays replicated; the layer itself is TP-sharded like the target.
    d = {
        "embed_tokens": P(None, "model"),
        "fc_w": P(None, None),
        "layers": base["layers"],
    }
    if has_bias:
        d["fc_b"] = P(None)
    if cfg.medusa_heads > 0:
        # per-depth resblock heads: small [K, H, H]; replicate
        d["medusa"] = {"mw": P(None, None, None), "mb": P(None, None)}
    return d


def kv_cache_specs() -> Dict:
    # [L, S, Hkv, D]: shard KV heads over 'model' (follows q/k/v column split)
    return {"k": P(None, None, "model", None), "v": P(None, None, "model", None)}


def _prune_specs(specs, params):
    """Drop spec entries absent from params (e.g. *_qs scales when the model
    is not quantized) so the trees match for tree.map."""
    if isinstance(specs, dict) and isinstance(params, dict):
        return {k: _prune_specs(specs[k], params[k])
                for k in params if k in specs}
    return specs


def shard_params(params: Dict, specs: Dict, mesh: Mesh) -> Dict:
    def place(x, s):
        return jax.device_put(x, NamedSharding(mesh, s))

    return jax.tree.map(place, params, _prune_specs(specs, params))


def specs_to_shardings(specs: Dict, mesh: Mesh) -> Dict:
    return jax.tree.map(lambda s: NamedSharding(mesh, s), specs,
                        is_leaf=lambda x: isinstance(x, P))


# ---------------------------------------------------------------------------
# ZeRO-analog optimizer-state sharding (DeepSpeed ZeRO-1, SURVEY §2.7).
# The params stay TP-sharded/replicated for the forward; the optimizer
# moments additionally shard over the 'data' axis, so per-device optimizer
# memory shrinks by dp — the TPU equivalent of ZeRO partitioning optimizer
# state across DDP ranks (ref: deepspeed_config in main_deepspeed.py).
# ---------------------------------------------------------------------------

def zero_opt_specs(specs: Dict, params: Dict, mesh: Mesh) -> Dict:
    """Opt-moment specs: each param's spec plus a 'data' shard on the first
    axis that is unsharded and divisible by the data-axis size."""
    dp = mesh.shape["data"]

    def zspec(s: P, x) -> P:
        axes = list(s) + [None] * (x.ndim - len(s))
        if dp > 1:
            for i, a in enumerate(axes):
                if a is None and x.shape[i] % dp == 0 and x.shape[i] >= dp:
                    axes[i] = "data"
                    break
        return P(*axes)

    return jax.tree.map(zspec, _prune_specs(specs, params), params,
                        is_leaf=lambda n: isinstance(n, P))


def shard_opt_state_zero(opt_state, specs: Dict, params: Dict, mesh: Mesh):
    """Re-place adam moments (mu/nu) with zero_opt_specs shardings.

    Works on any optax state pytree: nodes carrying ``mu``/``nu`` fields
    (ScaleByAdamState and friends) get their moments data-sharded; scalars
    and everything else stay as initialized."""
    zsh = jax.tree.map(lambda s: NamedSharding(mesh, s),
                       zero_opt_specs(specs, params, mesh),
                       is_leaf=lambda n: isinstance(n, P))

    def place_tree(t):
        # frozen params (optax.masked) appear as MaskedNode placeholders in
        # the moments — pass anything array-less through unplaced
        return jax.tree.map(
            lambda x, s: jax.device_put(x, s) if hasattr(x, "shape") else x,
            t, zsh,
            is_leaf=lambda n: hasattr(n, "shape")
            or type(n).__name__ == "MaskedNode")

    def visit(node):
        if hasattr(node, "mu") and hasattr(node, "nu"):
            return node._replace(mu=place_tree(node.mu),
                                 nu=place_tree(node.nu))
        return node

    return jax.tree.map(visit, opt_state,
                        is_leaf=lambda n: hasattr(n, "mu") and hasattr(n, "nu"))
