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
from msd_tpu.harness.models.llava_msd import apply_until
from msd_tpu.harness.registry import register_model
from msd_tpu.models.qwen2vl import (IMAGE_PAD_ID, VIDEO_PAD_ID,
                                    VISION_END_ID, VISION_START_ID)
from msd_tpu.ops.sampling import SamplingParams

VIDEO_EXTS = (".mp4", ".avi", ".mov", ".mkv", ".webm")


def qwen_chat_ids(tokenizer, question: str, n_img: int, with_image: bool,
                  pad_id: int = IMAGE_PAD_ID,
                  start_id: int = VISION_START_ID,
                  end_id: int = VISION_END_ID
                  ) -> Tuple[np.ndarray, Optional[int]]:
    """Token ids for '<|im_start|>user ... <|im_end|><|im_start|>assistant'
    with an inline image/video span; returns (ids, img_start or None).
    Marker ids default to Qwen2-VL's; Qwen-VL v1 passes its own
    <img>/<imgpad>/</img> ids (reference qwen_vl_eagle.py:68 prompt)."""
    pre = tokenizer.encode("<|im_start|>user\n")
    post = tokenizer.encode(f"{question}<|im_end|>\n<|im_start|>assistant\n")
    ids: List[int] = list(pre)
    img_start = None
    if with_image:
        ids.append(start_id)
        img_start = len(ids)
        ids.extend([pad_id] * n_img)
        ids.append(end_id)
    ids.extend(post)
    return np.asarray(ids, np.int32), img_start


def is_video_visual(visual) -> bool:
    """Video inputs: a video file path, a [T, H, W, 3] frame array, or a
    {'video': frames} wrapper (reference qwen2_vl_msd.py:224 detects paths
    by extension; arrays stand in where decord is unavailable)."""
    if isinstance(visual, str):
        return visual.lower().endswith(VIDEO_EXTS)
    if isinstance(visual, np.ndarray):
        return visual.ndim == 4
    return isinstance(visual, dict) and "video" in visual


def sample_frames(total: int, max_num_frames: int) -> np.ndarray:
    """Uniform frame sampling to EXACTLY max_num_frames indices (reference
    qwen2_vl_msd.py:251-257 linspace; the endpoint includes the last frame,
    and a fixed count keeps the engine's vision-token span static)."""
    return np.linspace(0, max(total - 1, 0), max_num_frames, dtype=int)


def _decode_video_file(path: str) -> np.ndarray:
    """[T, H, W, 3] uint8 frames from a video file; tries decord (the
    reference's loader), imageio, then OpenCV — this image bakes none of
    them, so array/frame-list inputs are the first-class path here."""
    try:
        import decord
        vr = decord.VideoReader(path)
        return vr.get_batch(range(len(vr))).asnumpy()
    except ImportError:
        pass
    try:
        import imageio.v3 as iio
        return np.asarray(iio.imread(path, plugin="pyav"))
    except ImportError:
        pass
    try:
        import cv2
        cap = cv2.VideoCapture(path)
        frames = []
        while True:
            ok, frame = cap.read()
            if not ok:
                break
            frames.append(frame[:, :, ::-1])  # BGR -> RGB
        cap.release()
        if frames:
            return np.stack(frames)
    except ImportError:
        pass
    raise RuntimeError(
        f"no video decoder available for {path!r} (decord/imageio/cv2 all "
        "missing); pass frames as a [T, H, W, 3] array or a list of PIL "
        "images instead")


def load_video_frames(visual, max_num_frames: int) -> np.ndarray:
    """Any accepted video input -> [max_num_frames, H, W, 3] uint8."""
    if isinstance(visual, dict):
        visual = visual["video"]
    if isinstance(visual, str):
        arr = _decode_video_file(visual)
    elif isinstance(visual, np.ndarray):
        arr = visual
    else:  # list/tuple of PIL frames
        arr = np.stack([np.asarray(v.convert("RGB"))
                        if hasattr(v, "convert") else np.asarray(v)
                        for v in visual])
    return arr[sample_frames(len(arr), max_num_frames)]


@register_model("qwen2_vl_msd", "qwen2_vl")
class Qwen2VLMSD:
    """Qwen2-VL MSD adapter with the native vision tower."""

    # inline image-span marker ids; QwenVLEagle overrides with the v1
    # tokenizer's <img>/<imgpad>/</img> ids
    vision_start_id = VISION_START_ID
    vision_end_id = VISION_END_ID
    image_pad_id = IMAGE_PAD_ID

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
            tokenizer = AutoTokenizer.from_pretrained(pretrained, local_files_only=True)
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
        from msd_tpu.models.qwen2vl_vision import qwen_vision_encode_video
        # tower weights as jit arguments, not closure constants (HLO size)
        enc_c = jax.jit(lambda p, px: qwen_vision_encode(p, vcfg, px))
        enc_vc = jax.jit(lambda p, px: qwen_vision_encode_video(p, vcfg, px))
        enc = lambda px: enc_c(vision, px)
        enc_v = lambda px: enc_vc(vision, px)
        return cls(gen, tokenizer, enc, encode_video_fn=enc_v,
                   img_grid=grid, **kw)

    def __init__(self, generator, tokenizer, encode_image_fn=None, *,
                 use_msd: bool = True, img_grid: Tuple[int, int] = (24, 24),
                 encode_video_fn=None, max_num_frames: int = 32,
                 temporal_patch_size: int = 2, **_ignored):
        assert generator.image_mode == "inline"
        self.gen = generator
        self.tokenizer = tokenizer
        self.encode_image_fn = encode_image_fn
        self.encode_video_fn = encode_video_fn
        self.use_msd = use_msd
        self.img_grid = img_grid  # PATCH grid (pre-merge) for preprocessing
        # mrope positions use the post-merge token grid (spatial_merge=2)
        self.merged_grid = (img_grid[0] // 2, img_grid[1] // 2)
        self.max_num_frames = int(max_num_frames)
        self.video_grid_t = self.max_num_frames // int(temporal_patch_size)
        self._vgen = None
        self.total_accept_len = 0
        self.total_accept_steps = 0
        self.rank, self.world_size = 0, 1

    @property
    def video_gen(self):
        """Engine instance for video prompts (grid_t temporal blocks give a
        longer static vision span than images, so the prompt-span statics and
        the cache budget differ; params are shared device buffers)."""
        if self._vgen is None:
            import dataclasses

            from msd_tpu.engine.generator import MSDGenerator
            g = self.gen
            n_vid = (self.video_grid_t * self.merged_grid[0]
                     * self.merged_grid[1])
            need = (n_vid + 512 + g.eng.tree.num_nodes
                    + g.eng.tree.max_path_len)
            eng = g.eng if g.eng.max_seq_len >= need else dataclasses.replace(
                g.eng, max_seq_len=((need + 127) // 128) * 128)
            self._vgen = MSDGenerator(
                g.params["target"], g.params["draft"], g.tcfg, g.dcfg, eng,
                n_img=n_vid, eos_id=g.eos_id, image_mode="inline",
                mrope_section=g.mrope_section, sp=g.sp,
                inline_pad_ids=g.inline_pad_ids)
        return self._vgen

    def _sp(self, gen_kwargs: Dict) -> SamplingParams:
        return SamplingParams(
            temperature=float(gen_kwargs.get("temperature", 0.0)),
            top_p=float(gen_kwargs.get("top_p", 1.0)),
            top_k=int(gen_kwargs.get("top_k", 0) or 0))

    def _encode_video(self, visual):
        """Video visual -> ([n_video, H] features, (grid_t, gh, gw))."""
        from PIL import Image

        from msd_tpu.utils.mm_utils import process_image
        frames = load_video_frames(visual, self.max_num_frames)
        px = np.stack([process_image(Image.fromarray(np.asarray(f)),
                                     image_size=self.img_grid[0] * 14)
                       for f in frames])                     # [T, 3, H, W]
        feats = self.encode_video_fn(jnp.asarray(px))
        return feats, (self.video_grid_t,) + self.merged_grid

    def _prep_request(self, context: str, visuals):
        """-> (engine, ids, feats, img_grid or None) for one request,
        routing video visuals through the video engine + <|video_pad|> span
        (reference qwen2_vl_msd.py:218-258)."""
        vis = visuals[0] if visuals else None
        if vis is not None and self.gen.n_img > 0 and is_video_visual(vis) \
                and self.encode_video_fn is not None:
            gen = self.video_gen
            feats, grid = self._encode_video(vis)
            ids, _ = qwen_chat_ids(self.tokenizer, context, gen.n_img, True,
                                   pad_id=VIDEO_PAD_ID,
                                   start_id=self.vision_start_id,
                                   end_id=self.vision_end_id)
            return gen, ids, feats, grid
        with_image = vis is not None and self.gen.n_img > 0
        ids, _ = qwen_chat_ids(self.tokenizer, context, self.gen.n_img,
                               with_image, pad_id=self.image_pad_id,
                               start_id=self.vision_start_id,
                               end_id=self.vision_end_id)
        feats = None
        if with_image:
            from msd_tpu.utils.mm_utils import process_image
            px = process_image(vis, image_size=self.img_grid[0] * 14)
            feats = self.encode_image_fn(jnp.asarray(px))
        # mrope grids only for mrope models (Qwen-VL v1 runs plain 1D rope)
        use_grid = with_image and self.gen.mrope_section is not None
        return (self.gen, ids, feats, self.merged_grid if use_grid else None)

    def _generate_plain(self, context: str, visuals, gen_kwargs: Dict) -> str:
        gen, ids, feats, grid = self._prep_request(context, visuals)
        sp = self._sp(gen_kwargs)
        max_new = int(gen_kwargs.get("max_new_tokens", 512))
        fn = gen.generate if self.use_msd else gen.naive_generate
        r = fn(ids, img_feats=feats, max_new_tokens=max_new, sp=sp,
               img_grid=grid)
        self.total_accept_len += getattr(r, "accept_len_sum", 0)
        self.total_accept_steps += getattr(r, "accept_steps", 0)
        text = self.tokenizer.decode(list(r.tokens),
                                     skip_special_tokens=True)
        return apply_until(text, gen_kwargs).strip()

    def generate_until(self, requests: List[Instance]) -> List[str]:
        outputs = []
        t0 = time.time()
        for req in requests:
            context, gen_kwargs, doc_to_visual, *_ = req.arguments
            visuals = doc_to_visual(req.doc) if doc_to_visual else []
            outputs.append(self._generate_plain(context, visuals, gen_kwargs))
        self.total_duration_seconds = time.time() - t0
        return outputs

    def _encode_visual(self, visuals):
        if not (bool(visuals) and self.gen.n_img > 0):
            return None
        from msd_tpu.utils.mm_utils import process_image
        px = process_image(visuals[0], image_size=self.img_grid[0] * 14)
        return self.encode_image_fn(jnp.asarray(px))

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
            use_grid = with_image and self.gen.mrope_section is not None
            lp, greedy = self.gen.score(
                ids_full, cont_start=len(ids_ctx), img_feats=feats,
                img_grid=self.merged_grid if use_grid else None)
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
    """Qwen-VL (v1) adapter (reference models/qwen_vl_eagle.py:29-384).

    v1 differs from Qwen2-VL in both halves: the visual tower is an
    OpenCLIP-style ViT + 256-query cross-attention Resampler
    (models/qwen_vl_v1.py, rebuilt natively), and the LM uses plain 1D
    rotary positions — no mrope — with the 256 image tokens inline
    ("<img>...</img>" span). The reference adapter generates
    autoregressively (:308); MSD stays available behind use_msd=True."""

    def __init__(self, *a, **kw):
        kw.setdefault("use_msd", False)
        super().__init__(*a, **kw)

    @classmethod
    def from_pretrained(cls, pretrained: str, msd_model_path: str,
                        dtype=None, eng=None, **kw):
        import jax
        import jax.numpy as jnp

        from msd_tpu.configs import EngineConfig
        from msd_tpu.engine.generator import MSDGenerator
        from msd_tpu.models.qwen_vl_v1 import qwen_vl_vision_encode
        from msd_tpu.utils.weights import load_draft, load_qwen_vl_v1

        dtype = dtype or jnp.bfloat16
        lm, vision, tcfg, vcfg = load_qwen_vl_v1(pretrained, dtype)
        lc = tcfg.as_llama()
        draft, dcfg = load_draft(msd_model_path, lc,
                                 base_embed=lm["embed_tokens"], dtype=dtype)
        try:
            from transformers import AutoTokenizer
            tokenizer = AutoTokenizer.from_pretrained(
                pretrained, trust_remote_code=True,
                local_files_only=True)
        except Exception:
            from msd_tpu.harness.models.llava_msd import SimpleTokenizer
            tokenizer = SimpleTokenizer(tcfg.vocab_size)
        # v1's image span is <img> <imgpad>*256 </img> — resolve the ids
        # from the v1 tokenizer (Qwen2-VL's 15165x ids are untrained
        # <|extra_*|> tokens in the v1 vocab; reference qwen_vl_eagle.py:68
        # formats "<img>{}</img>" and lets the tokenizer resolve them)
        def _one(s: str, default: int) -> int:
            try:
                e = tokenizer.encode(s)
                return int(e[0]) if len(e) == 1 else default
            except Exception:
                return default
        start_id = _one("<img>", VISION_START_ID)
        pad_id = _one("<imgpad>", IMAGE_PAD_ID)
        end_id = _one("</img>", VISION_END_ID)
        # 1D rope: inline image span, mrope_section=None -> pos_delta 0
        gen = MSDGenerator(lm, draft, lc, dcfg, eng or EngineConfig(),
                           n_img=vcfg.n_queries,
                           eos_id=getattr(tokenizer, "im_end_id",
                                          getattr(tokenizer, "eos_token_id",
                                                  151643)),
                           image_mode="inline", mrope_section=None,
                           inline_pad_ids=(pad_id,))
        enc_c = jax.jit(lambda p, px: qwen_vl_vision_encode(p, vcfg, px))
        enc = lambda px: enc_c(vision, px)
        adapter = cls(gen, tokenizer, enc,
                      img_grid=(vcfg.grid, vcfg.grid), **kw)
        adapter.vision_start_id = start_id
        adapter.image_pad_id = pad_id
        adapter.vision_end_id = end_id
        return adapter

    @classmethod
    def from_tiny(cls, **kw):
        """Tiny v1 stack: REAL (random) resampler tower feeding a 1D-rope
        inline engine — exercises the full v1 encode path."""
        import jax
        import jax.numpy as jnp

        from msd_tpu.configs import DraftConfig, EngineConfig, TreeConfig
        from msd_tpu.engine.generator import MSDGenerator
        from msd_tpu.harness.models.llava_msd import SimpleTokenizer
        from msd_tpu.models import draft as draft_mod
        from msd_tpu.models import llama as L
        from msd_tpu.models.qwen_vl_v1 import (QwenVLVisionConfig,
                                               QwenVLV1TextConfig,
                                               init_qwen_vl_vision_params,
                                               qwen_vl_vision_encode)

        qcfg = QwenVLV1TextConfig.tiny(vocab=512, hidden=48, layers=2,
                                       heads=4, inter=96)
        vcfg = QwenVLVisionConfig.tiny(width=32, layers=2, heads=4,
                                       out=qcfg.hidden_size, queries=4,
                                       image_size=56)
        lc = qcfg.as_llama()
        dcfg = DraftConfig(text=lc)
        k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
        eng = EngineConfig(max_seq_len=512, prompt_pad_multiple=64,
                           tree=TreeConfig(top_k=4, max_depth=4, num_nodes=12))
        vision = init_qwen_vl_vision_params(k3, vcfg)
        gen = MSDGenerator(L.init_llama_params(k1, lc),
                           draft_mod.init_draft_params(k2, dcfg), lc, dcfg,
                           eng, n_img=vcfg.n_queries, eos_id=2,
                           image_mode="inline", mrope_section=None)
        enc_c = jax.jit(lambda p, px: qwen_vl_vision_encode(p, vcfg, px))
        enc = lambda px: enc_c(vision, px)
        return cls(gen, SimpleTokenizer(vocab_size=512), enc,
                   img_grid=(vcfg.grid, vcfg.grid), **kw)


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

    max_frames = int(kw.pop("max_num_frames", 8))
    n_vid = (max_frames // 2) * n_img

    def enc_video(px):
        return jnp.asarray(rng.normal(size=(n_vid, lc.hidden_size)) * 0.1,
                           jnp.float32)

    return cls(gen, SimpleTokenizer(vocab_size=512), enc,
               encode_video_fn=enc_video, max_num_frames=max_frames,
               img_grid=grid, **kw)


Qwen2VLMSD.from_tiny = classmethod(_tiny_qwen_adapter)
