"""Model / engine configuration dataclasses.

Shapes mirror the reference checkpoints (LLaVA-1.5-7B/13B; draft heads
``lucylyn/MSD-LLaVA1.5-7B``) but every config is constructible at tiny sizes
for CPU tests. Reference anchors: LLaVA config in
/root/reference/LLaVA/llava/model/language_model/llava_llama.py and the draft
EConfig in /root/reference/EAGLE/eagle/model/configs.py.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Optional

IMAGE_TOKEN_INDEX = -200  # reference: LLaVA/llava/constants.py:1-13
DEFAULT_IMAGE_TOKEN = "<image>"
IGNORE_INDEX = -100


@dataclass(frozen=True)
class LlamaConfig:
    """LLaMA decoder config (target LM and draft decoder share this)."""

    vocab_size: int = 32000
    hidden_size: int = 4096
    intermediate_size: int = 11008
    num_hidden_layers: int = 32
    num_attention_heads: int = 32
    num_key_value_heads: int = 32
    max_position_embeddings: int = 4096
    rms_norm_eps: float = 1e-5
    rope_theta: float = 10000.0
    # attention backend: "xla" (masked einsum), "pallas" (length-aware
    # flash kernel — skips dead KV-cache blocks; requires cache len % 128 == 0
    # and head_dim == 128; TPU only), or "auto" (pallas for small query
    # batches — its VPU multiply-reduce path wins every measured cache
    # length >= pallas_min_s for <=4 grouped query rows; XLA ties or wins at
    # larger T. v5e sweep: tools/attn_microbench.py ->
    # artifacts/attn_sweep_r3.log)
    attn_impl: str = "xla"
    pallas_min_s: int = 1024
    # residual-stream dtype ("float32" to carry the residual in fp32 while
    # every matmul stays in the param dtype). Stabilizes greedy argmax under
    # bf16: rounding drift otherwise accumulates across all layers and flips
    # near-ties differently between the AR and tree-verify forwards. None =
    # inherit the activation dtype (bit-compatible with round-1 behavior).
    residual_dtype: Optional[str] = None

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_attention_heads

    @staticmethod
    def llava_7b() -> "LlamaConfig":
        return LlamaConfig()

    @staticmethod
    def llava_13b() -> "LlamaConfig":
        return LlamaConfig(
            hidden_size=5120,
            intermediate_size=13824,
            num_hidden_layers=40,
            num_attention_heads=40,
            num_key_value_heads=40,
        )

    @staticmethod
    def tiny(vocab_size: int = 256, hidden_size: int = 64, layers: int = 2,
             heads: int = 4, kv_heads: Optional[int] = None,
             intermediate_size: int = 128, max_pos: int = 512) -> "LlamaConfig":
        return LlamaConfig(
            vocab_size=vocab_size,
            hidden_size=hidden_size,
            intermediate_size=intermediate_size,
            num_hidden_layers=layers,
            num_attention_heads=heads,
            num_key_value_heads=kv_heads if kv_heads is not None else heads,
            max_position_embeddings=max_pos,
        )


@dataclass(frozen=True)
class ClipVisionConfig:
    """CLIP ViT vision tower (openai/clip-vit-large-patch14-336 shapes).

    Reference consumer: LLaVA/llava/model/multimodal_encoder/clip_encoder.py.
    """

    hidden_size: int = 1024
    intermediate_size: int = 4096
    num_hidden_layers: int = 24
    num_attention_heads: int = 16
    image_size: int = 336
    patch_size: int = 14
    layer_norm_eps: float = 1e-5
    # layer to read features from, counted like HF hidden_states index.
    # LLaVA uses mm_vision_select_layer=-2.
    select_layer: int = -2
    select_feature: str = "patch"  # drop CLS

    @property
    def num_patches(self) -> int:
        return (self.image_size // self.patch_size) ** 2

    @staticmethod
    def tiny(hidden_size: int = 32, layers: int = 2, heads: int = 4,
             image_size: int = 28, patch_size: int = 14,
             intermediate_size: int = 64) -> "ClipVisionConfig":
        return ClipVisionConfig(
            hidden_size=hidden_size,
            intermediate_size=intermediate_size,
            num_hidden_layers=layers,
            num_attention_heads=heads,
            image_size=image_size,
            patch_size=patch_size,
        )


@dataclass(frozen=True)
class LlavaConfig:
    """Full LLaVA-1.5 VLM: vision tower + projector + LM."""

    text: LlamaConfig = dataclasses.field(default_factory=LlamaConfig.llava_7b)
    vision: ClipVisionConfig = dataclasses.field(default_factory=ClipVisionConfig)
    mm_projector_type: str = "mlp2x_gelu"
    # S2 multi-scale scales (clip_encoder.py:92-147), e.g. (336, 672, 1008);
    # None = single-scale. Projector input dim scales with len(s2_scales).
    s2_scales: Optional[tuple] = None
    # number of image feature tokens spliced at the -200 placeholder
    # (576 for ViT-L/14-336 patch features).

    @property
    def num_image_tokens(self) -> int:
        return self.vision.num_patches

    @property
    def mm_hidden_size(self) -> int:
        n = len(self.s2_scales) if self.s2_scales else 1
        return self.vision.hidden_size * n

    @staticmethod
    def tiny() -> "LlavaConfig":
        return LlavaConfig(text=LlamaConfig.tiny(), vision=ClipVisionConfig.tiny())


@dataclass(frozen=True)
class DraftConfig:
    """EAGLE-style one-layer draft head.

    Reference: EAGLE/eagle/model/cnets.py:94-133 — embedding + 1 decoder layer
    (input_layernorm skipped on layer 0) + fc: Linear(2*hidden -> hidden).
    """

    text: LlamaConfig = dataclasses.field(default_factory=LlamaConfig.llava_7b)
    num_layers: int = 1
    fc_bias: bool = True
    # Medusa-style direct multi-depth heads (> 0 switches the engine's tree
    # expansion from EAGLE recursion to per-depth resblock heads over the
    # depth-1 draft hidden). Depth d >= 2 candidates come from head
    # ``medusa[d-2]`` — no self-recursion, and every depth's logits share one
    # stacked lm_head matmul, so expansion is one forward instead of
    # max_depth sequential ones.
    medusa_heads: int = 0

    @staticmethod
    def tiny() -> "DraftConfig":
        return DraftConfig(text=LlamaConfig.tiny())


@dataclass(frozen=True)
class TreeConfig:
    """Static-shape budget for OPT-Tree drafting on TPU.

    The reference uses dynamic node counts (total_token auto-tuned in
    {40,48,50,56,60}, ea_model.py:156-179; OPT-Tree kwargs nodes=500,
    threshold=0.2, max_depth=10, cnets.py:944-947). On TPU everything is a
    fixed budget; dead nodes carry weight -inf and are masked in verification.
    """

    top_k: int = 10              # frontier width per depth
    max_depth: int = 10          # drafting depth bound (while_loop bound)
    num_nodes: int = 60          # total draft tokens incl. root sample token
    early_stop_threshold: float = 0.2  # weight-sum increment threshold
    # legacy static-tree drafting (utils.py:115-233 generate_tree_buffers):
    # a tuple of top-k-index paths (e.g. engine.static_tree.mc_sim_7b_63 as
    # tuples). When set, drafting follows this fixed shape instead of
    # OPT-Tree; num_nodes/max_depth must cover it.
    static_choices: Optional[tuple] = None
    # medusa mode only: per-depth candidate widths, e.g. (10, 6, 4, 3, 2, 2,
    # 1, 1, ...). None = top_k at every depth. Wide shallow + narrow deep
    # buys much longer chains for the same node budget (deep heads only need
    # their top-1 to extend the accepted path). len() must be <= max_depth
    # and 1 + len() - 1 heads must exist.
    medusa_widths: Optional[tuple] = None
    # medusa mode only: explicit sparse cartesian-product tree — a tuple of
    # per-depth-rank paths like the reference's mc_sim_7b_63 (choices.py:1-3),
    # e.g. ((0,), (1,), (0, 0), (1, 0), ...). Medusa heads are position-based
    # (head d is unconditioned on the depth-d token), so the same candidate
    # set extends ANY branch: node (r1..rd) carries head d's rank-rd token.
    # Overrides medusa_widths; prefix-closure is applied automatically;
    # num_nodes must cover 1 + len(closure).
    medusa_choices: Optional[tuple] = None

    @property
    def num_draft(self) -> int:
        """Draft tokens excluding the root (already-sampled) token."""
        return self.num_nodes - 1

    @property
    def max_path_len(self) -> int:
        """Path length incl. root; verification logits rows have this length."""
        return self.max_depth + 1


@dataclass(frozen=True)
class EngineConfig:
    """Decode-engine budgets (all static for XLA)."""

    max_seq_len: int = 4096      # KV cache capacity (post image expansion)
    max_new_tokens: int = 512
    prompt_pad_multiple: int = 128  # prefill length bucketing to limit recompiles
    tree: TreeConfig = dataclasses.field(default_factory=TreeConfig)
    param_dtype: str = "bfloat16"
    # Window-canonical tree attention (ops/attention.windowed_attention):
    # each verify node reduces its last max_path_len logical positions via
    # fixed depth-indexed window slots, making the committed greedy
    # trajectory bitwise invariant to the draft (and hence to step
    # boundaries) — a null-draft run IS canonical greedy AR. Costs one
    # [N, P, Hkv, D] K/V gather per layer per step (~2-3% at 7B).
    canonical_attn: bool = True
    # Also run the FAST-AR loop's single query row through the windowed
    # split-softmax association (same scheme as a verify node at that
    # logical position). Measured on the v5e (r4 run1): +0.2ms/tok (~1%)
    # and it does NOT deliver cross-program bitwise identity — the T=1 AR
    # matmuls and the T=N verify matmuls still accumulate bf16 in
    # different orders, which flips near-tie argmaxes. Identity is instead
    # guaranteed against canonical greedy AR (the null-draft rerun of the
    # SAME MSD executable, bench --canonical-check); default False keeps
    # the AR baseline speed-optimal (pallas-eligible).
    canonical_ar: bool = False
    # greedy when temperature == 0.0
    temperature: float = 0.0
    top_p: float = 1.0
    top_k_sampling: int = 0
