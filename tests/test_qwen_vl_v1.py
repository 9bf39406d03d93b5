"""Qwen-VL v1 visual tower (ViT + Resampler) golden tests.

The public Qwen/Qwen-VL visual model ships as HF remote code (not in the
installed transformers), so the golden reference here is a torch replica of
its documented architecture — pre-LN ViT with nn.MultiheadAttention blocks,
a 2D-sincos cross-attention Resampler, bicubic position interpolation —
with state-dict names matching the real checkpoint layout, exercising the
same loader used for real weights (params_from_hf_qwen_vl_vision).
"""

import math

import numpy as np
import pytest

import jax.numpy as jnp

from msd_tpu.models.qwen_vl_v1 import (QwenVLVisionConfig, interp_abs_pos,
                                       init_qwen_vl_vision_params,
                                       params_from_hf_qwen_vl_vision,
                                       qwen_vl_vision_encode, sincos_2d)

torch = pytest.importorskip("torch")
nn = torch.nn
F = torch.nn.functional


def _get_abs_pos(abs_pos, tgt_size):
    src_size = int(math.sqrt(abs_pos.size(0)))
    tgt = int(math.sqrt(tgt_size))
    if src_size == tgt:
        return abs_pos
    return (F.interpolate(
        abs_pos.float().reshape(1, src_size, src_size, -1).permute(0, 3, 1, 2),
        size=(tgt, tgt), mode="bicubic", align_corners=False)
        .permute(0, 2, 3, 1).flatten(0, 2))


class _Resampler(nn.Module):
    def __init__(self, n_queries, embed_dim, num_heads, kv_dim):
        super().__init__()
        grid = int(math.sqrt(n_queries))
        self.register_buffer(
            "pos_embed",
            torch.from_numpy(sincos_2d(embed_dim, grid)).float(),
            persistent=True)
        self.query = nn.Parameter(torch.randn(n_queries, embed_dim) * 0.02)
        self.kv_proj = nn.Linear(kv_dim, embed_dim, bias=False)
        self.attn = nn.MultiheadAttention(embed_dim, num_heads)
        self.ln_q = nn.LayerNorm(embed_dim, eps=1e-6)
        self.ln_kv = nn.LayerNorm(embed_dim, eps=1e-6)

    def forward(self, x):                       # x: [N, kv_dim]
        pos = _get_abs_pos(self.pos_embed, x.size(0))
        x = self.ln_kv(self.kv_proj(x)).unsqueeze(1)
        q = self.ln_q(self.query)
        out = self.attn((q + self.pos_embed).unsqueeze(1),
                        x + pos.unsqueeze(1), x)[0]
        return out.squeeze(1)


class _Block(nn.Module):
    def __init__(self, w, heads, mlp):
        super().__init__()
        self.ln_1 = nn.LayerNorm(w, eps=1e-6)
        self.attn = nn.MultiheadAttention(w, heads)
        self.ln_2 = nn.LayerNorm(w, eps=1e-6)
        self.mlp = nn.Sequential()
        self.mlp.add_module("c_fc", nn.Linear(w, mlp))
        self.mlp.add_module("gelu", nn.GELU())
        self.mlp.add_module("c_proj", nn.Linear(mlp, w))

    def forward(self, x):                       # [T, 1, w] seq-first
        y = self.ln_1(x)
        x = x + self.attn(y, y, y)[0]
        return x + self.mlp(self.ln_2(x))


class _Blocks(nn.Module):
    def __init__(self, w, heads, mlp, layers):
        super().__init__()
        self.resblocks = nn.ModuleList(
            [_Block(w, heads, mlp) for _ in range(layers)])

    def forward(self, x):
        for b in self.resblocks:
            x = b(x)
        return x


class _Visual(nn.Module):
    """State-dict layout matches the public Qwen-VL checkpoint names."""

    def __init__(self, cfg: QwenVLVisionConfig, pos_grid):
        super().__init__()
        w = cfg.width
        self.conv1 = nn.Conv2d(3, w, cfg.patch_size, cfg.patch_size,
                               bias=False)
        self.positional_embedding = nn.Parameter(
            torch.randn(pos_grid * pos_grid, w) * 0.02)
        self.ln_pre = nn.LayerNorm(w, eps=1e-6)
        self.transformer = _Blocks(w, cfg.heads, cfg.mlp_size, cfg.layers)
        self.attn_pool = _Resampler(cfg.n_queries, cfg.output_dim,
                                    cfg.resampler_heads, w)
        self.ln_post = nn.LayerNorm(cfg.output_dim, eps=1e-6)
        self.proj = nn.Parameter(
            torch.randn(cfg.output_dim, cfg.output_dim)
            * cfg.output_dim ** -0.5)

    def forward(self, pixels):                  # [3, H, W]
        x = self.conv1(pixels.unsqueeze(0))     # [1, w, gh, gw]
        x = x.flatten(2).transpose(1, 2).squeeze(0)  # [gh*gw, w]
        x = x + _get_abs_pos(self.positional_embedding, x.size(0))
        x = self.ln_pre(x).unsqueeze(1)
        x = self.transformer(x).squeeze(1)
        x = self.attn_pool(x)
        return self.ln_post(x) @ self.proj


def test_qwen_vl_v1_matches_torch_replica():
    torch.manual_seed(0)
    cfg = QwenVLVisionConfig.tiny(width=32, layers=2, heads=4, out=48,
                                  queries=4, image_size=56)  # grid 4x4
    ref = _Visual(cfg, pos_grid=cfg.grid).eval()
    state = {"transformer.visual." + k: v.detach().numpy()
             for k, v in ref.state_dict().items()}
    params = params_from_hf_qwen_vl_vision(state, cfg)

    rng = np.random.default_rng(0)
    pixels = rng.normal(size=(3, cfg.image_size, cfg.image_size)
                        ).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.tensor(pixels)).numpy()
    got = np.asarray(qwen_vl_vision_encode(params, cfg, jnp.asarray(pixels)))
    assert got.shape == want.shape == (cfg.n_queries, cfg.output_dim)
    np.testing.assert_allclose(got, want, atol=3e-4, rtol=2e-3)


def test_qwen_vl_v1_interpolated_positions():
    """Checkpoint pos-embeds smaller than the input grid are bicubic-
    interpolated the way the remote code's get_abs_pos does (the real
    Qwen-VL ships 16x16 tables against a 32x32 patch grid)."""
    torch.manual_seed(1)
    cfg = QwenVLVisionConfig.tiny(width=32, layers=1, heads=4, out=48,
                                  queries=4, image_size=112)  # grid 8x8
    ref = _Visual(cfg, pos_grid=4).eval()       # 4x4 table -> interp to 8x8
    state = {"transformer.visual." + k: v.detach().numpy()
             for k, v in ref.state_dict().items()}
    params = params_from_hf_qwen_vl_vision(state, cfg)

    rng = np.random.default_rng(1)
    pixels = rng.normal(size=(3, cfg.image_size, cfg.image_size)
                        ).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.tensor(pixels)).numpy()
    got = np.asarray(qwen_vl_vision_encode(params, cfg, jnp.asarray(pixels)))
    np.testing.assert_allclose(got, want, atol=3e-3, rtol=5e-3)


def test_interp_abs_pos_identity_and_shape():
    pos = jnp.asarray(np.random.default_rng(2).normal(size=(16, 8)),
                      jnp.float32)
    np.testing.assert_array_equal(np.asarray(interp_abs_pos(pos, 16)),
                                  np.asarray(pos))
    assert interp_abs_pos(pos, 64).shape == (64, 8)


def test_init_params_encode_runs():
    import jax
    cfg = QwenVLVisionConfig.tiny()
    p = init_qwen_vl_vision_params(jax.random.PRNGKey(0), cfg)
    out = qwen_vl_vision_encode(
        p, cfg, jnp.zeros((3, cfg.image_size, cfg.image_size), jnp.float32))
    assert out.shape == (cfg.n_queries, cfg.output_dim)


def test_qwen_v1_lm_loader_roundtrip():
    """params_from_hf_qwen_v1 maps the fused-c_attn Qwen-1 layout onto the
    llama stacked pytree: verify the split/transpose against a hand-built
    reference and that the loaded LM decodes (1D rope, qkv bias)."""
    import jax
    from msd_tpu.models.qwen_vl_v1 import (QwenVLV1TextConfig,
                                           params_from_hf_qwen_v1)

    cfg = QwenVLV1TextConfig.tiny(vocab=64, hidden=16, layers=2, heads=4,
                                  inter=32)
    rng = np.random.default_rng(0)
    h, inter, v = cfg.hidden_size, cfg.intermediate_size, cfg.vocab_size
    state = {"transformer.wte.weight": rng.normal(size=(v, h)),
             "transformer.ln_f.weight": rng.normal(size=(h,)),
             "lm_head.weight": rng.normal(size=(v, h))}
    for i in range(cfg.num_hidden_layers):
        pre = f"transformer.h.{i}."
        state[pre + "attn.c_attn.weight"] = rng.normal(size=(3 * h, h))
        state[pre + "attn.c_attn.bias"] = rng.normal(size=(3 * h,))
        state[pre + "attn.c_proj.weight"] = rng.normal(size=(h, h))
        state[pre + "ln_1.weight"] = rng.normal(size=(h,))
        state[pre + "ln_2.weight"] = rng.normal(size=(h,))
        state[pre + "mlp.w1.weight"] = rng.normal(size=(inter, h))
        state[pre + "mlp.w2.weight"] = rng.normal(size=(inter, h))
        state[pre + "mlp.c_proj.weight"] = rng.normal(size=(h, inter))
    p = params_from_hf_qwen_v1(state, cfg)
    # split + orientation checks
    cw0 = state["transformer.h.0.attn.c_attn.weight"]
    np.testing.assert_allclose(np.asarray(p["layers"]["q_proj"][0]), cw0[:h])
    np.testing.assert_allclose(np.asarray(p["layers"]["k_proj"][0]),
                               cw0[h:2 * h])
    np.testing.assert_allclose(
        np.asarray(p["layers"]["gate_proj"][0]),
        state["transformer.h.0.mlp.w2.weight"].T)  # w2 = silu (gated) half
    np.testing.assert_allclose(
        np.asarray(p["layers"]["down_proj"][0]),
        state["transformer.h.0.mlp.c_proj.weight"].T)
    assert p["layers"]["q_bias"].shape == (2, h)
    # the loaded tree drives the llama forward (greedy AR step)
    from msd_tpu.configs import DraftConfig, EngineConfig, TreeConfig
    from msd_tpu.engine.generator import MSDGenerator
    from msd_tpu.models import draft as draft_mod
    lc = cfg.as_llama()
    dcfg = DraftConfig(text=lc)
    dp = draft_mod.init_draft_params(jax.random.PRNGKey(1), dcfg)
    gen = MSDGenerator(jax.tree.map(lambda a: a * 0.05, p), dp, lc, dcfg,
                       EngineConfig(max_seq_len=128, prompt_pad_multiple=32,
                                    tree=TreeConfig(top_k=2, max_depth=2,
                                                    num_nodes=4)),
                       eos_id=-1, image_mode="inline", mrope_section=None)
    ar = gen.naive_generate(np.arange(3, 9, dtype=np.int32), max_new_tokens=6)
    msd = gen.generate(np.arange(3, 9, dtype=np.int32), max_new_tokens=6)
    np.testing.assert_array_equal(ar.tokens, msd.tokens)


def test_qwen_vl_eagle_v1_adapter_end_to_end():
    """The qwen_vl_eagle adapter now runs the REAL v1 resampler tower into a
    1D-rope inline engine (no mrope)."""
    from PIL import Image

    from msd_tpu.harness.models.qwen2_vl_msd import QwenVLEagle

    adapter = QwenVLEagle.from_tiny()
    assert adapter.gen.mrope_section is None
    assert adapter.gen.n_img == 4  # resampler queries
    img = Image.fromarray(np.random.default_rng(0).integers(
        0, 255, size=(56, 56, 3), dtype=np.uint8))
    out = adapter._generate_plain("what is shown?", [img],
                                  {"max_new_tokens": 6})
    assert isinstance(out, str)
