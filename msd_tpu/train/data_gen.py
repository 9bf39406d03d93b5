"""Teacher-state dataset generation — the ge_data analog.

Reference: EAGLE/eagle/ge_data/ge_data_all_llava15.py:94-262 — builds
vicuna_v1 conversations from LLaVA-instruct JSON, tokenizes with the -200
placeholder, loss-masks assistant turns only, runs the frozen target once and
saves {input_ids, inputs_embeds, hidden_state, loss_mask} per sample; and
allocation.py:60-85 which shards sample ranges across devices.

TPU-native shape: one jitted teacher forward per prompt-length bucket; the
emitted record is already in the draft trainer's shift-by-one layout
(emb_next/hidden/target/loss_mask/img_mask, see train/draft_train.py Batch),
saved as .npz.
"""

from __future__ import annotations

import os
from functools import partial
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from msd_tpu.configs import IMAGE_TOKEN_INDEX, LlamaConfig
from msd_tpu.models import llama as L
from msd_tpu.models.llava import expand_ids, fuse_embeddings
from msd_tpu.ops.attention import causal_prefill_bias
from msd_tpu.utils.conversation import Conversation, DEFAULT_VICUNA_SYSTEM


def build_conversation_ids(tokenizer, turns: Sequence[Tuple[str, str]],
                           with_image: bool,
                           system: str = DEFAULT_VICUNA_SYSTEM
                           ) -> Tuple[np.ndarray, np.ndarray]:
    """Tokenize a multi-turn conversation; loss_mask=1 on assistant replies.

    turns: [(user_msg, assistant_msg), ...]; the first user message gets the
    <image>\\n prefix when with_image (ge_data_all_llava15.py:94-176).
    """
    from msd_tpu.utils.mm_utils import tokenizer_image_token

    conv = Conversation(system=system)
    for i, (u, a) in enumerate(turns):
        if i == 0 and with_image:
            u = "<image>\n" + u
        conv.append_message(conv.roles[0], u)
        conv.append_message(conv.roles[1], a)
    prompt = conv.get_prompt()
    ids = tokenizer_image_token(prompt, tokenizer)

    # loss mask: tokens belonging to assistant replies (+ trailing sep2)
    mask = np.zeros_like(ids, np.float32)
    cursor = conv.system + conv.sep if conv.system else ""
    for i, (u, a) in enumerate(turns):
        if i == 0 and with_image:
            u = "<image>\n" + u
        cursor += f"{conv.roles[0]}: {u}{conv.sep}"
        n_before = len(tokenizer_image_token(
            cursor + f"{conv.roles[1]}:", tokenizer))
        cursor += f"{conv.roles[1]}: {a}{conv.sep2}"
        n_after = len(tokenizer_image_token(cursor, tokenizer))
        mask[n_before:n_after] = 1.0
    return ids, mask


def teacher_forward(params: Dict, cfg: LlamaConfig, ids: np.ndarray,
                    img_feats: Optional[jnp.ndarray], img_pos: int,
                    n_img: int, pad_to: int) -> Dict[str, np.ndarray]:
    """One frozen-target forward -> post-norm hidden states + fused embeds."""
    P_exp = pad_to + max(n_img - 1, 0)
    padded = np.zeros((pad_to,), np.int32)
    padded[:len(ids)] = ids
    padded_j = jnp.asarray(padded)
    cos_t, sin_t = L.make_rope(cfg, P_exp + 8)
    if n_img > 0:
        fused = fuse_embeddings(params["embed_tokens"], padded_j, img_feats,
                                jnp.int32(img_pos), P_exp)
        exp_ids = expand_ids(jnp.where(padded_j < 0, 0, padded_j),
                             jnp.int32(img_pos), n_img, P_exp)
    else:
        fused = params["embed_tokens"][jnp.maximum(padded_j, 0)]
        exp_ids = padded_j
    kv = L.init_kv_cache(cfg, P_exp, fused.dtype)
    bias = causal_prefill_bias(P_exp, P_exp)
    hidden, _ = L.llama_forward(params, cfg, fused, jnp.arange(P_exp), kv,
                                jnp.int32(0), bias, cos_t, sin_t)
    return {"fused": np.asarray(fused), "hidden": np.asarray(hidden),
            "exp_ids": np.asarray(exp_ids)}


def make_training_record(params: Dict, cfg: LlamaConfig, tokenizer,
                         turns: Sequence[Tuple[str, str]],
                         img_feats: Optional[jnp.ndarray] = None,
                         n_img: int = 0, pad_to: int = 512,
                         system: str = DEFAULT_VICUNA_SYSTEM
                         ) -> Dict[str, np.ndarray]:
    """Full record in the draft trainer's layout (shift-by-one applied)."""
    with_image = img_feats is not None and n_img > 0
    ids, loss_mask = build_conversation_ids(tokenizer, turns, with_image,
                                            system=system)
    ids = ids[:pad_to]
    loss_mask = loss_mask[:pad_to]
    img_positions = np.nonzero(ids == IMAGE_TOKEN_INDEX)[0]
    img_pos = int(img_positions[0]) if len(img_positions) else pad_to

    out = teacher_forward(params, cfg, ids, img_feats, img_pos, n_img, pad_to)
    P_exp = out["hidden"].shape[0]
    e_len = len(ids) + (n_img - 1 if with_image else 0)

    # expand loss mask to post-image coordinates (image rows -> 0)
    exp_mask = np.zeros((P_exp,), np.float32)
    if with_image:
        exp_mask[:img_pos] = loss_mask[:img_pos]
        exp_mask[img_pos + n_img:img_pos + n_img + len(ids) - img_pos - 1] = \
            loss_mask[img_pos + 1:]
    else:
        exp_mask[:len(ids)] = loss_mask

    # shift-by-one: row j pairs emb(t_{j+1}) with hidden_j, target hidden_{j+1}
    fused, hidden = out["fused"], out["hidden"]
    emb_next = np.concatenate([fused[1:], np.zeros_like(fused[:1])])
    target = np.concatenate([hidden[1:], np.zeros_like(hidden[:1])])
    tmask = np.concatenate([exp_mask[1:], np.zeros((1,), np.float32)])
    tmask[e_len - 1:] = 0.0  # last row predicts nothing
    j = np.arange(P_exp)
    img_mask = ((j + 1 >= img_pos) & (j + 1 < img_pos + n_img)) if with_image \
        else np.zeros((P_exp,), bool)

    return {"emb_next": emb_next, "hidden": hidden, "target": target,
            "loss_mask": tmask, "attn_len": np.int32(e_len),
            "img_mask": img_mask, "exp_ids": out["exp_ids"]}


@partial(jax.jit, static_argnums=(0, 1, 2))
def _verify_shaped_run(cfg: LlamaConfig, chunk: int, cache_len: int,
                       params: Dict, fused_pad: jnp.ndarray,
                       cos_t: jnp.ndarray, sin_t: jnp.ndarray) -> jnp.ndarray:
    """Chunked causal forward at the verify program shape (one compile per
    (cfg, chunk, cache, P) signature; params are traced args, not captured
    constants)."""
    Pc = fused_pad.shape[0]
    kv0 = L.init_kv_cache(cfg, cache_len, fused_pad.dtype)

    def step(kv, i):
        start = i * chunk
        rows = jax.lax.dynamic_slice(
            fused_pad, (start, 0), (chunk, fused_pad.shape[1]))
        pos = start + jnp.arange(chunk, dtype=jnp.int32)
        bias = causal_prefill_bias(chunk, cache_len, start=start)
        h, kv = L.llama_forward(params, cfg, rows, pos, kv, start, bias,
                                cos_t, sin_t)
        return kv, h

    _, hs = jax.lax.scan(step, kv0, jnp.arange(Pc // chunk, dtype=jnp.int32))
    return hs.reshape(Pc, -1)


def teacher_forward_verify_shaped(params: Dict, cfg: LlamaConfig,
                                  ids: np.ndarray,
                                  img_feats: Optional[jnp.ndarray],
                                  img_pos: int, n_img: int, pad_to: int,
                                  chunk: int, cache_len: int
                                  ) -> Dict[str, np.ndarray]:
    """Teacher forward in the ENGINE VERIFY's program shape: `chunk`-row
    forwards against a `cache_len` preallocated KV cache (spec_engine._verify
    runs llama_forward with T=tree.num_nodes rows over Statics.s_target).

    XLA compiles (and tiles) per shape, so near-tie argmaxes can flip between
    a full-sequence prefill forward and the verify forward. Distillation
    labels extracted at the verify shape agree with what acceptance actually
    compares against at decode time — measurably higher end-to-end alpha on
    random/bf16 targets whose logit gaps sit near rounding noise.
    """
    P_exp = pad_to + max(n_img - 1, 0)
    Pc = ((P_exp + chunk - 1) // chunk) * chunk
    cache_len = max(cache_len, Pc)
    padded = np.zeros((pad_to,), np.int32)
    padded[:len(ids)] = ids
    padded_j = jnp.asarray(padded)
    cos_t, sin_t = L.make_rope(cfg, cache_len + 8)
    if n_img > 0:
        fused = fuse_embeddings(params["embed_tokens"], padded_j, img_feats,
                                jnp.int32(img_pos), P_exp)
        exp_ids = expand_ids(jnp.where(padded_j < 0, 0, padded_j),
                             jnp.int32(img_pos), n_img, P_exp)
    else:
        fused = params["embed_tokens"][jnp.maximum(padded_j, 0)]
        exp_ids = padded_j
    fused_pad = jnp.zeros((Pc, fused.shape[1]), fused.dtype)
    fused_pad = jax.lax.dynamic_update_slice(fused_pad, fused, (0, 0))

    hidden = np.asarray(_verify_shaped_run(
        cfg, chunk, cache_len, params, fused_pad, cos_t, sin_t))[:P_exp]
    return {"fused": np.asarray(fused), "hidden": hidden,
            "exp_ids": np.asarray(exp_ids)}


def make_record_from_ids(params: Dict, cfg: LlamaConfig, ids: np.ndarray,
                         loss_mask: np.ndarray, pad_to: int,
                         img_feats: Optional[jnp.ndarray] = None,
                         n_img: int = 0, img_pos: Optional[int] = None,
                         verify_chunk: int = 0, cache_len: int = 0
                         ) -> Dict[str, np.ndarray]:
    """Record directly from token ids (on-policy distillation / custom data).

    ids: [T] (may contain IMAGE_TOKEN_INDEX); loss_mask: [T] 1.0 where the
    NEXT-token prediction at that source position should be trained.
    verify_chunk > 0 extracts teacher states at the engine verify's program
    shape (teacher_forward_verify_shaped) instead of one prefill forward.
    """
    ids = np.asarray(ids, np.int32)[:pad_to]
    loss_mask = np.asarray(loss_mask, np.float32)[:pad_to]
    with_image = img_feats is not None and n_img > 0
    if img_pos is None:
        pos = np.nonzero(ids == IMAGE_TOKEN_INDEX)[0]
        img_pos = int(pos[0]) if len(pos) else pad_to

    if verify_chunk > 0:
        out = teacher_forward_verify_shaped(
            params, cfg, ids, img_feats, img_pos, n_img, pad_to,
            chunk=verify_chunk, cache_len=cache_len)
    else:
        out = teacher_forward(params, cfg, ids, img_feats, img_pos, n_img,
                              pad_to)
    P_exp = out["hidden"].shape[0]
    e_len = len(ids) + (n_img - 1 if with_image else 0)
    exp_mask = np.zeros((P_exp,), np.float32)
    if with_image:
        exp_mask[:img_pos] = loss_mask[:img_pos]
        exp_mask[img_pos + n_img:img_pos + n_img + len(ids) - img_pos - 1] = \
            loss_mask[img_pos + 1:]
    else:
        exp_mask[:len(ids)] = loss_mask

    fused, hidden = out["fused"], out["hidden"]
    emb_next = np.concatenate([fused[1:], np.zeros_like(fused[:1])])
    target = np.concatenate([hidden[1:], np.zeros_like(hidden[:1])])
    tmask = np.concatenate([exp_mask[1:], np.zeros((1,), np.float32)])
    tmask[e_len - 1:] = 0.0
    j = np.arange(P_exp)
    img_mask = ((j + 1 >= img_pos) & (j + 1 < img_pos + n_img)) if with_image \
        else np.zeros((P_exp,), bool)
    return {"emb_next": emb_next, "hidden": hidden, "target": target,
            "loss_mask": tmask, "attn_len": np.int32(e_len),
            "img_mask": img_mask, "exp_ids": out["exp_ids"]}


def record_from_traj(traj_hidden: np.ndarray, exp_ids: np.ndarray, e0: int,
                     img_pos: int, n_img: int,
                     img_feats, embed_table: np.ndarray,
                     pad_to: int) -> Dict[str, np.ndarray]:
    """Trainer record from ENGINE-collected trajectory hiddens.

    traj_hidden/exp_ids: GenResult.traj_hidden / .exp_ids from
    ``generate(..., collect_hiddens=True)`` — the hidden states the decode
    engine itself computed (prefill rows + committed verify rows), i.e. the
    exact values its draft-suffix path will read back at serve time. Unlike
    ``make_record_from_ids`` there is NO teacher re-forward, so the record
    carries decode-time numerics verbatim (no program-shape mismatch).

    e0: expanded prompt length; rows [e0-1, cur-1) get loss (the generated
    region); img_feats: [n_img, H] PROJECTED image tokens or None.
    """
    cur, H = traj_hidden.shape
    hidden = np.zeros((pad_to, H), np.float32)
    hidden[:min(cur, pad_to)] = np.asarray(traj_hidden[:pad_to], np.float32)
    ids_p = np.zeros((pad_to,), np.int32)
    ids_p[:min(cur, pad_to)] = np.asarray(exp_ids[:pad_to], np.int32)

    fused = np.asarray(embed_table, np.float32)[np.maximum(ids_p, 0)]
    with_image = img_feats is not None and n_img > 0
    if with_image:
        fused[img_pos:img_pos + n_img] = np.asarray(img_feats,
                                                    np.float32)[:pad_to - img_pos]
    emb_next = np.concatenate([fused[1:], np.zeros_like(fused[:1])])
    target = np.concatenate([hidden[1:], np.zeros_like(hidden[:1])])

    tmask = np.zeros((pad_to,), np.float32)
    lo = max(e0 - 1, 0)
    hi = min(cur - 1, pad_to - 1)
    if hi > lo:
        tmask[lo:hi] = 1.0
    j = np.arange(pad_to)
    img_mask = ((j + 1 >= img_pos) & (j + 1 < img_pos + n_img)) if with_image \
        else np.zeros((pad_to,), bool)
    return {"emb_next": emb_next, "hidden": hidden, "target": target,
            "loss_mask": tmask, "attn_len": np.int32(min(cur, pad_to)),
            "img_mask": img_mask, "exp_ids": ids_p}


def generate_dataset(params: Dict, cfg: LlamaConfig, tokenizer,
                     samples: List[Dict], out_dir: str, *,
                     encode_image_fn=None, n_img: int = 0, pad_to: int = 512,
                     start: int = 0, end: Optional[int] = None) -> int:
    """Dump teacher-state records [start, end) to out_dir/rec_%06d.npz.

    The [start, end) range is the allocation.py-style shard; run one process
    per host over disjoint ranges.
    """
    os.makedirs(out_dir, exist_ok=True)
    end = end if end is not None else len(samples)
    n = 0
    for i in range(start, min(end, len(samples))):
        s = samples[i]
        feats = None
        if n_img and s.get("image") is not None and encode_image_fn:
            from msd_tpu.utils.mm_utils import process_image
            feats = encode_image_fn(jnp.asarray(process_image(s["image"])))
        rec = make_training_record(params, cfg, tokenizer, s["turns"],
                                   img_feats=feats, n_img=n_img if feats
                                   is not None else 0, pad_to=pad_to)
        if float(rec["loss_mask"].sum()) == 0.0:
            # answer span truncated away by pad_to — useless record
            print(f"generate_dataset: skipping sample {i} "
                  f"(empty loss mask at pad_to={pad_to})")
            continue
        # bf16 teacher states have no numpy dtype; store as float32
        rec = {k: (np.asarray(v, np.float32)
                   if getattr(v, "dtype", None) is not None
                   and v.dtype.kind not in "biuf" else v)
               for k, v in rec.items()}
        np.savez(os.path.join(out_dir, f"rec_{i:06d}.npz"), **rec)
        n += 1
    return n


def qwen_teacher_forward(params: Dict, tcfg, ids: np.ndarray,
                         img_feats: Optional[jnp.ndarray], img_start: int,
                         n_img: int, grid_hw, pad_to: int
                         ) -> Dict[str, np.ndarray]:
    """Qwen2-VL teacher forward (ge_data_all_qwen2vl.py analog): inline image
    span fusion + mrope positions."""
    from msd_tpu.models.qwen2vl import (fuse_qwen_embeddings, mrope_gather,
                                        mrope_positions)

    lc = tcfg.as_llama() if hasattr(tcfg, "as_llama") else tcfg
    padded = np.zeros((pad_to,), np.int32)
    padded[:len(ids)] = ids
    padded_j = jnp.asarray(padded)
    cos_t, sin_t = L.make_rope(lc, pad_to + 64)
    if n_img > 0 and img_feats is not None:
        fused = fuse_qwen_embeddings(params["embed_tokens"], padded_j,
                                     img_feats, jnp.int32(img_start), n_img)
        gh, gw = grid_hw
        pos3, _ = mrope_positions(pad_to, img_start, n_img, gh, gw)
        eff_cos, eff_sin = mrope_gather(cos_t, sin_t,
                                        jnp.asarray(pos3, jnp.int32),
                                        tcfg.mrope_section)
    else:
        fused = params["embed_tokens"][jnp.maximum(padded_j, 0)]
        eff_cos, eff_sin = cos_t, sin_t
    kv = L.init_kv_cache(lc, pad_to, fused.dtype)
    bias = causal_prefill_bias(pad_to, pad_to)
    hidden, _ = L.llama_forward(params, lc, fused, jnp.arange(pad_to), kv,
                                jnp.int32(0), bias, eff_cos, eff_sin)
    return {"fused": np.asarray(fused), "hidden": np.asarray(hidden),
            "exp_ids": padded}


def make_qwen_record_from_ids(params: Dict, tcfg, ids: np.ndarray,
                              loss_mask: np.ndarray, pad_to: int,
                              img_feats: Optional[jnp.ndarray] = None,
                              grid_hw=None) -> Dict[str, np.ndarray]:
    """Qwen2-VL training record: inline span, no expansion, shift-by-one."""
    from msd_tpu.models.qwen2vl import IMAGE_PAD_ID

    ids = np.asarray(ids, np.int32)[:pad_to]
    loss_mask = np.asarray(loss_mask, np.float32)[:pad_to]
    pos = np.nonzero(ids == IMAGE_PAD_ID)[0]
    img_start = int(pos[0]) if len(pos) else pad_to
    n_img = int(len(pos))

    out = qwen_teacher_forward(params, tcfg, ids, img_feats, img_start,
                               n_img, grid_hw, pad_to)
    fused, hidden = out["fused"], out["hidden"]
    e_len = len(ids)
    exp_mask = np.zeros((pad_to,), np.float32)
    exp_mask[:e_len] = loss_mask
    emb_next = np.concatenate([fused[1:], np.zeros_like(fused[:1])])
    target = np.concatenate([hidden[1:], np.zeros_like(hidden[:1])])
    tmask = np.concatenate([exp_mask[1:], np.zeros((1,), np.float32)])
    tmask[e_len - 1:] = 0.0
    j = np.arange(pad_to)
    img_mask = (j + 1 >= img_start) & (j + 1 < img_start + n_img)
    return {"emb_next": emb_next, "hidden": hidden, "target": target,
            "loss_mask": tmask, "attn_len": np.int32(e_len),
            "img_mask": img_mask, "exp_ids": out["exp_ids"]}
