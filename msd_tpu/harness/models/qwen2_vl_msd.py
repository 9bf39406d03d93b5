"""Qwen2-VL MSD adapter (mirror of lmms-eval/lmms_eval/models/qwen2_vl_msd.py
:29-316 — processor-based prompting, get_input_embeds_qwen2vl fusion,
msdgenerate/naivegenerate; no calibrator path in the reference adapter).

Prompts follow the Qwen2-VL chat template with an inline
<|vision_start|><|image_pad|>*N<|vision_end|> span; image features arrive via
``encode_image_fn`` (the Qwen ViT runs outside the engine, like the reference
runs HF's visual tower).
"""

from __future__ import annotations

import time
from typing import Dict, List, Optional, Tuple

import numpy as np

import jax.numpy as jnp

from msd_tpu.harness.instance import Instance
from msd_tpu.harness.registry import register_model
from msd_tpu.models.qwen2vl import IMAGE_PAD_ID, VISION_END_ID, VISION_START_ID
from msd_tpu.ops.sampling import SamplingParams


def qwen_chat_ids(tokenizer, question: str, n_img: int,
                  with_image: bool) -> Tuple[np.ndarray, Optional[int]]:
    """Token ids for '<|im_start|>user ... <|im_end|><|im_start|>assistant'
    with an inline image span; returns (ids, img_start or None)."""
    pre = tokenizer.encode("<|im_start|>user\n")
    post = tokenizer.encode(f"{question}<|im_end|>\n<|im_start|>assistant\n")
    ids: List[int] = list(pre)
    img_start = None
    if with_image:
        ids.append(VISION_START_ID)
        img_start = len(ids)
        ids.extend([IMAGE_PAD_ID] * n_img)
        ids.append(VISION_END_ID)
    ids.extend(post)
    return np.asarray(ids, np.int32), img_start


@register_model("qwen2_vl_msd", "qwen2_vl")
class Qwen2VLMSD:
    """Qwen2-VL MSD adapter with the native vision tower."""

    @classmethod
    def from_pretrained(cls, pretrained: str, msd_model_path: str,
                        dtype=None, eng=None, **kw):
        import jax
        import jax.numpy as jnp
        from msd_tpu.configs import EngineConfig
        from msd_tpu.engine.generator import MSDGenerator
        from msd_tpu.models.qwen2vl_vision import qwen_vision_encode
        from msd_tpu.utils.weights import load_draft, load_qwen2_vl

        dtype = dtype or jnp.bfloat16
        lm, vision, tcfg, vcfg = load_qwen2_vl(pretrained, dtype)
        lc = tcfg.as_llama()
        draft, dcfg = load_draft(msd_model_path, lc,
                                 base_embed=lm["embed_tokens"], dtype=dtype)
        try:
            from transformers import AutoTokenizer
            tokenizer = AutoTokenizer.from_pretrained(pretrained)
        except Exception:
            from msd_tpu.harness.models.llava_msd import SimpleTokenizer
            tokenizer = SimpleTokenizer(tcfg.vocab_size)
        grid = kw.pop("img_grid", (24, 24))
        n_img = (grid[0] // vcfg.spatial_merge_size) *             (grid[1] // vcfg.spatial_merge_size)
        gen = MSDGenerator(lm, draft, lc, dcfg, eng or EngineConfig(),
                           n_img=n_img, eos_id=getattr(
                               tokenizer, "eos_token_id", 151645),
                           image_mode="inline",
                           mrope_section=tcfg.mrope_section)
        enc = jax.jit(lambda px: qwen_vision_encode(vision, vcfg, px))
        return cls(gen, tokenizer, enc, img_grid=grid, **kw)

    def __init__(self, generator, tokenizer, encode_image_fn=None, *,
                 use_msd: bool = True, img_grid: Tuple[int, int] = (24, 24),
                 **_ignored):
        assert generator.image_mode == "inline"
        self.gen = generator
        self.tokenizer = tokenizer
        self.encode_image_fn = encode_image_fn
        self.use_msd = use_msd
        self.img_grid = img_grid  # PATCH grid (pre-merge) for preprocessing
        # mrope positions use the post-merge token grid (spatial_merge=2)
        self.merged_grid = (img_grid[0] // 2, img_grid[1] // 2)
        self.total_accept_len = 0
        self.total_accept_steps = 0
        self.rank, self.world_size = 0, 1

    def _sp(self, gen_kwargs: Dict) -> SamplingParams:
        return SamplingParams(
            temperature=float(gen_kwargs.get("temperature", 0.0)),
            top_p=float(gen_kwargs.get("top_p", 1.0)),
            top_k=int(gen_kwargs.get("top_k", 0) or 0))

    def generate_until(self, requests: List[Instance]) -> List[str]:
        outputs = []
        t0 = time.time()
        for req in requests:
            context, gen_kwargs, doc_to_visual, *_ = req.arguments
            visuals = doc_to_visual(req.doc) if doc_to_visual else []
            with_image = bool(visuals) and self.gen.n_img > 0
            ids, _ = qwen_chat_ids(self.tokenizer, context, self.gen.n_img,
                                   with_image)
            feats = None
            if with_image:
                from msd_tpu.utils.mm_utils import process_image
                px = process_image(visuals[0],
                                   image_size=self.img_grid[0] * 14)
                feats = self.encode_image_fn(jnp.asarray(px))
            sp = self._sp(gen_kwargs)
            max_new = int(gen_kwargs.get("max_new_tokens", 512))
            fn = self.gen.generate if self.use_msd else self.gen.naive_generate
            r = fn(ids, img_feats=feats, max_new_tokens=max_new, sp=sp,
                   img_grid=self.merged_grid if with_image else None)
            self.total_accept_len += getattr(r, "accept_len_sum", 0)
            self.total_accept_steps += getattr(r, "accept_steps", 0)
            outputs.append(self.tokenizer.decode(
                list(r.tokens), skip_special_tokens=True).strip())
        self.total_duration_seconds = time.time() - t0
        return outputs

    def _encode_visual(self, visuals):
        if not (bool(visuals) and self.gen.n_img > 0):
            return None
        from msd_tpu.utils.mm_utils import process_image
        px = process_image(visuals[0], image_size=self.img_grid[0] * 14)
        return self.encode_image_fn(jnp.asarray(px))

    def _generate_plain(self, context: str, visuals, gen_kwargs: Dict) -> str:
        with_image = bool(visuals) and self.gen.n_img > 0
        ids, _ = qwen_chat_ids(self.tokenizer, context, self.gen.n_img,
                               with_image)
        feats = self._encode_visual(visuals)
        sp = self._sp(gen_kwargs)
        max_new = int(gen_kwargs.get("max_new_tokens", 512))
        fn = self.gen.generate if self.use_msd else self.gen.naive_generate
        r = fn(ids, img_feats=feats, max_new_tokens=max_new, sp=sp,
               img_grid=self.merged_grid if with_image else None)
        self.total_accept_len += getattr(r, "accept_len_sum", 0)
        self.total_accept_steps += getattr(r, "accept_steps", 0)
        return self.tokenizer.decode(list(r.tokens),
                                     skip_special_tokens=True).strip()

    def generate_until_multi_round(self, requests: List[Instance]
                                   ) -> List[List[str]]:
        from msd_tpu.harness.models.llava_msd import run_multi_round
        return run_multi_round(self._generate_plain, requests)

    def loglikelihood(self, requests: List[Instance]) -> List[Tuple]:
        """(sum logprob of continuation, is_greedy) under the Qwen chat
        template: the continuation is the assistant span appended to the
        '<|im_start|>assistant\\n' context (api/model.py:29-54)."""
        res = []
        for req in requests:
            context, doc_to_target, doc_to_visual, *_ = req.arguments
            continuation = (doc_to_target if isinstance(doc_to_target, str)
                            else doc_to_target(req.doc))
            visuals = doc_to_visual(req.doc) if doc_to_visual else []
            with_image = bool(visuals) and self.gen.n_img > 0
            ids_ctx, _ = qwen_chat_ids(self.tokenizer, context,
                                       self.gen.n_img, with_image)
            cont_ids = np.asarray(
                self.tokenizer.encode(continuation), np.int32)
            # HF Qwen tokenizers have no BOS; the byte-fallback one does
            bos = getattr(self.tokenizer, "bos_token_id", None)
            if bos is not None and len(cont_ids) and cont_ids[0] == bos:
                cont_ids = cont_ids[1:]
            ids_full = np.concatenate([ids_ctx, cont_ids]).astype(np.int32)
            feats = self._encode_visual(visuals)
            lp, greedy = self.gen.score(
                ids_full, cont_start=len(ids_ctx), img_feats=feats,
                img_grid=self.merged_grid if with_image else None)
            res.append((lp, greedy))
        return res

    @property
    def msd_stats(self) -> Dict[str, float]:
        steps = max(self.total_accept_steps, 1)
        return {"avg_accept_len": self.total_accept_len / steps,
                "accept_steps": self.total_accept_steps,
                "accept_len": self.total_accept_len}


@register_model("qwen_vl_eagle")
class QwenVLEagle(Qwen2VLMSD):
    """Legacy-name adapter (reference models/qwen_vl_eagle.py:29-384, naive
    generate only at :308). The v1 Qwen-VL resampler tower is superseded by
    Qwen2-VL; this adapter keeps the harness model name and the legacy
    behavior (autoregressive generation, MSD off) over the modern stack."""

    def __init__(self, *a, **kw):
        kw["use_msd"] = False
        super().__init__(*a, **kw)


def _tiny_qwen_adapter(cls, **kw):
    """Shared tiny-stack builder for Qwen2VLMSD/QwenVLEagle (tiny=true)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from msd_tpu.configs import DraftConfig, EngineConfig, TreeConfig
    from msd_tpu.engine.generator import MSDGenerator
    from msd_tpu.harness.models.llava_msd import SimpleTokenizer
    from msd_tpu.models import draft as draft_mod
    from msd_tpu.models.qwen2vl import Qwen2VLTextConfig, init_qwen2_params

    qcfg = Qwen2VLTextConfig.tiny(vocab=512, hidden=64, layers=2, heads=4,
                                  kv_heads=2, inter=128)
    lc = qcfg.as_llama()
    dcfg = DraftConfig(text=lc)
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    eng = EngineConfig(max_seq_len=512, prompt_pad_multiple=64,
                       tree=TreeConfig(top_k=4, max_depth=4, num_nodes=12))
    grid = kw.pop("img_grid", (4, 4))
    n_img = (grid[0] // 2) * (grid[1] // 2)
    gen = MSDGenerator(init_qwen2_params(k1, qcfg),
                       draft_mod.init_draft_params(k2, dcfg), lc, dcfg, eng,
                       n_img=n_img, eos_id=2, image_mode="inline",
                       mrope_section=qcfg.mrope_section)
    rng = np.random.default_rng(0)

    def enc(px):
        # random features at the merged-grid size (no tower in tiny mode)
        return jnp.asarray(rng.normal(size=(n_img, lc.hidden_size)) * 0.1,
                           jnp.float32)

    return cls(gen, SimpleTokenizer(vocab_size=512), enc, img_grid=grid, **kw)


Qwen2VLMSD.from_tiny = classmethod(_tiny_qwen_adapter)
