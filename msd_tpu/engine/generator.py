"""Host-side convenience wrapper around the jitted prefill/decode programs.

Owns prompt-length bucketing (static shapes per bucket -> bounded recompiles),
result extraction, and per-request stats — the role the reference spreads over
EaModel.msdgenerate / naivegenerate (ea_model.py:235-487) and the adapter's
stat accumulation (llava_msd_calibrated.py:606-618).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from msd_tpu.configs import (DraftConfig, EngineConfig, LlamaConfig,
                             IMAGE_TOKEN_INDEX)
from msd_tpu.engine import spec_engine as SE
from msd_tpu.models import llama as L
from msd_tpu.ops.sampling import SamplingParams


@dataclass
class GenResult:
    tokens: np.ndarray          # generated ids (prompt excluded, EOS trimmed)
    accept_steps: int = 0
    accept_len_sum: int = 0     # sum of tokens-per-step over verify steps
    alpha_hist: Optional[np.ndarray] = None
    calib_data: Optional[Dict] = None  # per-node features when collecting
    traj_hidden: Optional[np.ndarray] = None  # [cur_len, H] engine hiddens
    exp_ids: Optional[np.ndarray] = None      # [cur_len] expanded ids

    @property
    def avg_accept_len(self) -> float:
        return self.accept_len_sum / max(self.accept_steps, 1)


class MSDGenerator:
    """Speculative + AR generation over one model bundle."""

    def __init__(self, target_params: Dict, draft_params: Dict,
                 tcfg: LlamaConfig, dcfg: DraftConfig,
                 eng: EngineConfig = EngineConfig(), *,
                 n_img: int = 0, eos_id: int = 2,
                 sp: SamplingParams = SamplingParams(),
                 image_mode: str = "expand", mrope_section=None,
                 attn_feature_mode: str = "reference",
                 inline_pad_ids=None):
        self.tcfg, self.dcfg, self.eng = tcfg, dcfg, eng
        self.n_img, self.eos_id = n_img, eos_id
        self.image_mode, self.mrope_section = image_mode, mrope_section
        # inline-mode image-span marker ids; Qwen2-VL pads by default, a
        # Qwen-VL v1 adapter passes its own <imgpad> id
        self.inline_pad_ids = (tuple(inline_pad_ids) if inline_pad_ids
                               else None)
        self.attn_feature_mode = attn_feature_mode
        max_pos = eng.max_seq_len + eng.tree.num_nodes + 64
        cos_t, sin_t = L.make_rope(tcfg, max_pos)
        self.params = {"target": target_params, "draft": draft_params,
                       "cos_t": cos_t, "sin_t": sin_t}
        self.sp = sp
        self._eng_dtype = jax.tree.leaves(target_params)[0].dtype
        self._key_cache: Dict[int, jnp.ndarray] = {}
        self._batch_prog_cache: Dict = {}

    def _key(self, seed: int) -> jnp.ndarray:
        """PRNGKey(seed), cached: key creation is a device dispatch, which
        costs a full host->device round trip per generate() call on remote
        backends (the axon tunnel adds ~25ms per dispatch)."""
        k = self._key_cache.get(seed)
        if k is None:
            k = jax.random.PRNGKey(seed)
            self._key_cache[seed] = k
        return k

    def _statics(self, max_new: int, sp: SamplingParams,
                 use_calibration: bool = False,
                 collect_calibration: bool = False,
                 collect_hiddens: bool = False) -> SE.Statics:
        return SE.Statics(tcfg=self.tcfg, dcfg=self.dcfg, tree=self.eng.tree,
                          eng=self.eng, sp=sp, n_img=self.n_img,
                          eos_id=self.eos_id, max_new=max_new,
                          image_mode=self.image_mode,
                          mrope_section=self.mrope_section,
                          attn_feature_mode=self.attn_feature_mode,
                          use_calibration=use_calibration,
                          collect_calibration=collect_calibration,
                          collect_hiddens=collect_hiddens)

    def autotune_tree(self, candidates=(40, 48, 50, 56, 60, 96, 128),
                      log=None) -> None:
        """The reference's ``total_token = -1`` surface (ea_model.py:156-179):
        time the verify forward at each candidate budget on the current
        hardware and adopt the best tree. Subsequent generate() calls compile
        against the tuned budget."""
        import dataclasses

        from msd_tpu.engine.autotune import autotune_total_token

        tree = autotune_total_token(self.params["target"], self.tcfg,
                                    self.eng, candidates=candidates, log=log)
        self.eng = dataclasses.replace(self.eng, tree=tree)

    def set_calibrator(self, tables) -> None:
        """Install device CalibTables (msd_tpu.calib.device.CalibTables)."""
        self.params = dict(self.params)
        self.params["calib"] = tables

    @property
    def max_prompt_tokens(self) -> int:
        """Longest raw (pre image-expansion) prompt generate() /
        naive_generate() accept under the compiled engine budget — the
        _pad limit minus the image-expansion overhead. Adapters use this
        to truncate oversized eval prompts instead of crashing."""
        limit = (self.eng.max_seq_len - self.eng.tree.num_nodes
                 - self.eng.tree.max_path_len - 2)
        exp = max(self.n_img - 1, 0) if self.image_mode == "expand" else 0
        return limit - 1 - exp

    def _pad(self, ids: np.ndarray) -> np.ndarray:
        m = self.eng.prompt_pad_multiple
        p = ((len(ids) + m - 1) // m) * m
        n_exp = len(ids) + (max(self.n_img - 1, 0)
                            if self.image_mode == "expand" else 0)
        limit = self.eng.max_seq_len - self.eng.tree.num_nodes \
            - self.eng.tree.max_path_len - 2
        if n_exp >= limit:
            raise ValueError(
                f"prompt too long: {n_exp} expanded tokens, engine budget "
                f"allows < {limit} (max_seq_len={self.eng.max_seq_len}, "
                f"tree={self.eng.tree.num_nodes} nodes)")
        out = np.zeros((p,), np.int32)
        out[:len(ids)] = ids
        return out

    def _img_pos(self, ids: np.ndarray) -> int:
        if self.image_mode == "inline":
            from msd_tpu.models.qwen2vl import IMAGE_PAD_ID, VIDEO_PAD_ID
            pads = self.inline_pad_ids or (IMAGE_PAD_ID, VIDEO_PAD_ID)
            hit = np.zeros(ids.shape, bool)
            for p in pads:
                hit |= ids == p
            pos = np.nonzero(hit)[0]
            return int(pos[0]) if len(pos) else len(ids)
        pos = np.nonzero(ids == IMAGE_TOKEN_INDEX)[0]
        return int(pos[0]) if len(pos) else len(ids)

    def _qwen_pos(self, ids_padded: np.ndarray, prompt_len: int,
                  img_grid) -> tuple:
        """(pos3 [3, P_pad] or None, pos_delta) for inline mode.

        img_grid: (grid_h, grid_w) for images or (grid_t, grid_h, grid_w)
        for videos — LLM-space merged grids."""
        from msd_tpu.models.qwen2vl import mrope_positions
        if not self.n_img or img_grid is None:
            return None, 0
        gt, (gh, gw) = (1, img_grid) if len(img_grid) == 2 \
            else (img_grid[0], img_grid[1:])
        img_start = self._img_pos(ids_padded[:prompt_len])
        pos3, delta = mrope_positions(len(ids_padded), img_start,
                                      self.n_img, gh, gw, grid_t=gt)
        return jnp.asarray(pos3, jnp.int32), delta

    def _fuse_multi(self, ids: np.ndarray, img_feats_list) -> tuple:
        """Host-side multi-image fusion + padding (llava_arch.py:229-324 via
        models/llava.fuse_embeddings_multi). Returns device-ready
        (fused, exp_ids, img_rows, e0, img_pos)."""
        from msd_tpu.models.llava import fuse_embeddings_multi
        if not hasattr(self, "_embed_host"):
            self._embed_host = np.asarray(self.params["target"]["embed_tokens"])
        fused, exp_ids, img_rows = fuse_embeddings_multi(
            self._embed_host, ids, img_feats_list)
        e0 = len(fused)
        limit = self.eng.max_seq_len - self.eng.tree.num_nodes \
            - self.eng.tree.max_path_len - 2
        if e0 >= limit:
            raise ValueError(f"multi-image prompt too long: {e0} expanded "
                             f"tokens, engine budget allows < {limit}")
        m = self.eng.prompt_pad_multiple
        p = ((e0 + m - 1) // m) * m
        fused_p = np.zeros((p, fused.shape[1]), fused.dtype)
        fused_p[:e0] = fused
        exp_p = np.zeros((p,), np.int32)
        exp_p[:e0] = exp_ids
        rows_p = np.zeros((p,), bool)
        rows_p[:e0] = img_rows
        img_pos = int(np.argmax(img_rows)) if img_rows.any() else e0
        return (jnp.asarray(fused_p), jnp.asarray(exp_p),
                jnp.asarray(rows_p), e0, img_pos)

    def first_token(self, ids: np.ndarray,
                    img_feats: Optional[jnp.ndarray] = None,
                    max_new_tokens: Optional[int] = None, seed: int = 0,
                    sp: Optional[SamplingParams] = None) -> int:
        """First new token from the CANONICAL (AR-prefill) program.

        Feed the result to ``generate(..., first_token=...)`` to pin the MSD
        path's first token to the AR baseline's — AR-vs-MSD greedy
        divergence then can only start inside the decode loop (the two
        prefills are different XLA programs whose reduction orders can flip
        near-tie argmaxes)."""
        ids = np.asarray(ids, np.int32)
        sp = sp if sp is not None else self.sp
        max_new = max_new_tokens or self.eng.max_new_tokens
        st = self._statics(max_new, sp)
        key = self._key(seed)
        padded = jnp.asarray(self._pad(ids))
        carry = SE.ar_prefill(st, self.params, padded, np.int32(len(ids)),
                              img_feats, np.int32(self._img_pos(ids)), key)
        return int(carry[3])

    def generate(self, ids: np.ndarray, img_feats: Optional[jnp.ndarray] = None,
                 max_new_tokens: Optional[int] = None, seed: int = 0,
                 sp: Optional[SamplingParams] = None,
                 use_calibration: bool = False,
                 collect_calibration: bool = False,
                 collect_hiddens: bool = False,
                 img_grid=None, first_token: Optional[int] = None,
                 split_programs: bool = False,
                 fetch_hiddens: Optional[bool] = None) -> GenResult:
        """Speculative (MSD) generation; lossless wrt the target model.

        use_calibration: calibrated tree rerank (set_calibrator first).
        collect_calibration: return per-node calibration features/labels.
        collect_hiddens: return the engine's own per-position hidden states
        (on-policy distillation data with decode-time numerics).
        first_token: pin the first new token (see first_token()); expand-mode
        single-image/text prompts only.
        split_programs: run prefill and decode as separate executables (the
        OOM fallback path). With naive_generate(share_prefill=True) the AR
        baseline consumes the SAME compiled prefill, so the two paths start
        from bitwise-identical KV caches.
        fetch_hiddens: transfer traj_hidden to host (default =
        collect_hiddens); False keeps the program shape of a collecting run
        without paying the device->host copy in timed loops.
        """
        ids = np.asarray(ids, np.int32)
        sp = sp if sp is not None else self.sp
        max_new = max_new_tokens or self.eng.max_new_tokens
        if use_calibration and "calib" not in self.params:
            raise ValueError("set_calibrator() before use_calibration=True")
        st = self._statics(max_new, sp, use_calibration, collect_calibration,
                           collect_hiddens)
        key = self._key(seed)
        if first_token is not None and (
                self.image_mode == "inline"
                or isinstance(img_feats, (list, tuple))):
            # only the expand-mode single-image programs accept a pinned
            # first token; dropping it silently would void the AR-vs-MSD
            # first-token alignment the caller asked for
            raise ValueError("first_token is not supported for inline-mode "
                             "or multi-image prompts")
        if isinstance(img_feats, (list, tuple)):  # multi-image prompt
            fused, exp_ids_in, img_rows, e0, img_pos = self._fuse_multi(
                ids, img_feats)
            state = SE.prefill_prefused(st, self.params, fused, exp_ids_in,
                                        np.int32(e0), img_rows,
                                        np.int32(img_pos), key)
            state = SE.decode(st, self.params, state)
            fetch = collect_hiddens if fetch_hiddens is None else \
                fetch_hiddens
            pull = {"cur": state.cur_len, "steps": state.steps,
                    "acc": state.acc_sum, "ids": state.ids,
                    "hist": state.alpha_hist}
            if collect_calibration:
                pull["calib"] = state.calib_log
            if collect_hiddens and fetch:  # prefused path carries st's flags
                pull["traj"] = state.traj_hidden
            got = jax.device_get(pull)     # one batched D2H round trip
            cur = int(got["cur"])
            out = _trim(got["ids"][e0:cur + 1], self.eos_id, max_new)
            calib_data = None
            if collect_calibration:
                n_steps = int(got["steps"])
                calib_data = {k: v[:n_steps]
                              for k, v in got["calib"].items()}
            traj_hidden = exp_ids_out = None
            if collect_hiddens and fetch:
                traj_hidden = got["traj"][:cur]
                exp_ids_out = got["ids"][:cur]
            return GenResult(tokens=out, accept_steps=int(got["steps"]),
                             accept_len_sum=int(got["acc"]),
                             alpha_hist=got["hist"],
                             calib_data=calib_data, traj_hidden=traj_hidden,
                             exp_ids=exp_ids_out)
        padded_np = self._pad(ids)
        padded = jnp.asarray(padded_np)
        if self.image_mode == "inline":
            pos3, delta = self._qwen_pos(padded_np, len(ids), img_grid)
            try:
                state = SE.qwen_generate_program(
                    st, self.params, padded, np.int32(len(ids)), img_feats,
                    np.int32(self._img_pos(ids)), pos3, np.int32(delta), key)
            except Exception as e:  # OOM: retry as two smaller programs
                if "RESOURCE_EXHAUSTED" not in str(e):
                    raise
                state = SE.qwen_prefill(st, self.params, padded,
                                        np.int32(len(ids)), img_feats,
                                        np.int32(self._img_pos(ids)), pos3,
                                        np.int32(delta), key)
                state = SE.decode(st, self.params, state)
        else:
            tok0 = (None if first_token is None
                    else np.int32(int(first_token)))
            if split_programs:
                state = SE.prefill(st, self.params, padded,
                                   np.int32(len(ids)), img_feats,
                                   np.int32(self._img_pos(ids)), key, tok0)
                state = SE.decode(st, self.params, state)
            else:
                try:
                    state = SE.generate_program(st, self.params, padded,
                                                np.int32(len(ids)),
                                                img_feats,
                                                np.int32(self._img_pos(ids)),
                                                key, tok0)
                except Exception as e:
                    if "RESOURCE_EXHAUSTED" not in str(e):
                        raise
                    state = SE.prefill(st, self.params, padded,
                                       np.int32(len(ids)), img_feats,
                                       np.int32(self._img_pos(ids)), key,
                                       tok0)
                    state = SE.decode(st, self.params, state)

        has_img = img_feats is not None
        e0 = len(ids) + (max(self.n_img - 1, 0)
                         if self.image_mode == "expand" and has_img else 0)
        fetch = collect_hiddens if fetch_hiddens is None else fetch_hiddens
        # ONE batched device->host transfer: jax.device_get issues async
        # copies for every leaf then blocks once. Sequential int()/
        # np.asarray() pulls each cost a full round trip (~25ms over the
        # axon tunnel), which dominated per-prompt overhead in the bench.
        pull = {"cur": state.cur_len, "steps": state.steps,
                "acc": state.acc_sum, "ids": state.ids,
                "hist": state.alpha_hist}
        if collect_calibration:
            pull["calib"] = state.calib_log
        if collect_hiddens and fetch:
            pull["traj"] = state.traj_hidden
        got = jax.device_get(pull)
        cur = int(got["cur"])
        out = _trim(got["ids"][e0:cur + 1], self.eos_id, max_new)
        calib_data = None
        if collect_calibration:
            n_steps = int(got["steps"])
            calib_data = {k: v[:n_steps] for k, v in got["calib"].items()}
        traj_hidden = exp_ids_out = None
        if collect_hiddens and fetch:
            traj_hidden = got["traj"][:cur]
            exp_ids_out = got["ids"][:cur]
        return GenResult(tokens=out, accept_steps=int(got["steps"]),
                         accept_len_sum=int(got["acc"]),
                         alpha_hist=got["hist"],
                         calib_data=calib_data, traj_hidden=traj_hidden,
                         exp_ids=exp_ids_out)

    def _batched_program(self, st: SE.Statics, mode: str, no_feats: bool,
                         no_pos3: bool = True):
        """Batched fused program, memoized on (statics, arg presence).

        Re-wrapping jax.jit(jax.vmap(...)) per call would retrace AND
        recompile on EVERY generate_batch invocation (jit caches by function
        identity) — measured at seconds per serving batch. One cached
        wrapper serves all batch sizes (jit then caches per shape). Params
        enter as jit arguments, not closure constants: 13.5GB embedded
        constants stall remote-backend compiles (CLAUDE.md gotcha).
        """
        key = (st, mode, no_feats, no_pos3)
        prog = self._batch_prog_cache.get(key)
        if prog is None:
            if mode == "inline":
                fn = jax.vmap(
                    lambda P, i, l, f, p, p3, d, k:
                    SE.qwen_generate_program.__wrapped__(st, P, i, l, f, p,
                                                         p3, d, k),
                    in_axes=(None, 0, 0, None if no_feats else 0, 0,
                             None if no_pos3 else 0, 0, 0))
            else:
                fn = jax.vmap(
                    lambda P, i, l, f, p, k:
                    SE.generate_program.__wrapped__(st, P, i, l, f, p, k),
                    in_axes=(None, 0, 0, None if no_feats else 0, 0, 0))
            prog = jax.jit(fn)
            self._batch_prog_cache[key] = prog
        return prog

    def generate_batch(self, ids_list, img_feats_list=None,
                       max_new_tokens: Optional[int] = None, seed: int = 0,
                       sp: Optional[SamplingParams] = None, img_grid=None):
        """Batched speculative generation: vmap of the fused program.

        All prompts share one compiled program (padded to the longest
        bucket); per-sample while_loop progress is masked by jax's
        while_loop batching, so each sample's result is identical to its
        single-request run (tested). KV memory scales with batch size.
        Inline (Qwen) engines take one shared img_grid per batch.
        """
        sp = sp if sp is not None else self.sp
        max_new = max_new_tokens or self.eng.max_new_tokens
        st = self._statics(max_new, sp)
        B = len(ids_list)
        plen = max(len(i) for i in ids_list)
        m = self.eng.prompt_pad_multiple
        P = ((plen + m - 1) // m) * m
        padded = np.zeros((B, P), np.int32)
        img_pos = np.zeros((B,), np.int32)
        for b, ids in enumerate(ids_list):
            self._pad(np.asarray(ids, np.int32))  # length validation
            padded[b, :len(ids)] = ids
            img_pos[b] = self._img_pos(np.asarray(ids, np.int32))
        lens = np.asarray([len(i) for i in ids_list], np.int32)
        feats = (jnp.stack(img_feats_list) if img_feats_list is not None
                 else None)
        keys = jax.random.split(jax.random.PRNGKey(seed), B)

        if self.image_mode == "inline":
            pos3s, deltas = [], []
            for b in range(B):
                p3, d = self._qwen_pos(padded[b], int(lens[b]), img_grid)
                pos3s.append(p3)
                deltas.append(d)
            pos3 = jnp.stack(pos3s) if pos3s[0] is not None else None
            batched = self._batched_program(
                st, "inline", feats is None, pos3 is None)
            state = batched(self.params, jnp.asarray(padded),
                            jnp.asarray(lens), feats, jnp.asarray(img_pos),
                            pos3, jnp.asarray(deltas, jnp.int32), keys)
        else:
            batched = self._batched_program(st, "expand", feats is None)
            state = batched(self.params, jnp.asarray(padded),
                            jnp.asarray(lens), feats, jnp.asarray(img_pos),
                            keys)

        got = jax.device_get({"cur": state.cur_len, "ids": state.ids,
                              "steps": state.steps, "acc": state.acc_sum,
                              "hist": state.alpha_hist})  # one D2H trip
        results = []
        for b in range(B):
            has_img = feats is not None
            e0 = int(lens[b]) + (max(self.n_img - 1, 0)
                                 if self.image_mode == "expand" and has_img
                                 else 0)
            cur = int(got["cur"][b])
            out = _trim(got["ids"][b, e0:cur + 1], self.eos_id, max_new)
            results.append(GenResult(
                tokens=out, accept_steps=int(got["steps"][b]),
                accept_len_sum=int(got["acc"][b]),
                alpha_hist=got["hist"][b]))
        return results

    def generate_stream(self, ids: np.ndarray,
                        img_feats: Optional[jnp.ndarray] = None,
                        max_new_tokens: Optional[int] = None, seed: int = 0,
                        sp: Optional[SamplingParams] = None,
                        segment: int = 16, img_grid=None,
                        use_calibration: bool = False):
        """Streaming MSD generation: yields np.int32 arrays of newly
        committed tokens every ~`segment` tokens.

        Built on decode_until (spec_engine): the prefill program runs once,
        then each segment is one XLA program invocation bounded by a traced
        `stop_at` scalar — one compile serves all segments and every token
        is identical to a non-streaming generate() with the same seed.
        Final acceptance stats land in self.last_stream_stats.
        """
        ids = np.asarray(ids, np.int32)
        sp = sp if sp is not None else self.sp
        max_new = max_new_tokens or self.eng.max_new_tokens
        if use_calibration and "calib" not in self.params:
            raise ValueError("set_calibrator() before use_calibration=True")
        st = self._statics(max_new, sp, use_calibration)
        padded_np = self._pad(ids)
        padded = jnp.asarray(padded_np)
        key = self._key(seed)
        if self.image_mode == "inline":
            pos3, delta = self._qwen_pos(padded_np, len(ids), img_grid)
            state = SE.qwen_prefill(st, self.params, padded,
                                    np.int32(len(ids)), img_feats,
                                    np.int32(self._img_pos(ids)), pos3,
                                    np.int32(delta), key)
        else:
            state = SE.prefill(st, self.params, padded, np.int32(len(ids)),
                               img_feats, np.int32(self._img_pos(ids)), key)
        e0 = len(ids) + (max(self.n_img - 1, 0)
                         if self.image_mode == "expand"
                         and img_feats is not None else 0)
        emitted, target = 0, 0
        while True:
            target += segment
            state = SE.decode_until(st, self.params, state, np.int32(target))
            got = jax.device_get({"cur": state.cur_len, "ids": state.ids,
                                  "done": state.done, "steps": state.steps,
                                  "acc": state.acc_sum})  # one D2H/segment
            cur = int(got["cur"])
            out = _trim(got["ids"][e0:cur + 1], self.eos_id, max_new)
            if len(out) > emitted:
                yield out[emitted:]
                emitted = len(out)
            if bool(got["done"]):
                break
        self.last_stream_stats = {"accept_steps": int(got["steps"]),
                                  "accept_len_sum": int(got["acc"])}

    def score(self, ids: np.ndarray, cont_start: int,
              img_feats: Optional[jnp.ndarray] = None,
              img_grid=None) -> tuple:
        """Teacher-forced loglikelihood of ids[cont_start:] given
        ids[:cont_start] (the lmms ``loglikelihood`` request,
        api/model.py:29-54). Returns (logprob_sum: float, is_greedy: bool).
        """
        from msd_tpu.engine import scoring as SC
        ids = np.asarray(ids, np.int32)
        if not 0 < cont_start < len(ids):
            raise ValueError(f"cont_start={cont_start} outside (0, {len(ids)})")
        m = self.eng.prompt_pad_multiple
        p = ((len(ids) + m - 1) // m) * m
        padded_np = np.zeros((p,), np.int32)
        padded_np[:len(ids)] = ids
        padded = jnp.asarray(padded_np)
        if self.image_mode == "inline":
            pos3, _ = self._qwen_pos(padded_np, len(ids), img_grid)
            lp, n_match, n_cont = SC.qwen_score_program(
                self.tcfg, self.n_img if img_feats is not None else 0,
                self.mrope_section, self.params, padded,
                np.int32(len(ids)), np.int32(cont_start), img_feats,
                np.int32(self._img_pos(ids)), pos3)
        else:
            lp, n_match, n_cont = SC.score_program(
                self.tcfg, self.n_img, self.params, padded,
                np.int32(len(ids)), np.int32(cont_start), img_feats,
                np.int32(self._img_pos(ids)))
        return float(lp), bool(int(n_match) == int(n_cont))

    def naive_generate(self, ids: np.ndarray,
                       img_feats: Optional[jnp.ndarray] = None,
                       max_new_tokens: Optional[int] = None, seed: int = 0,
                       sp: Optional[SamplingParams] = None,
                       img_grid=None, share_prefill: bool = False,
                       collect_hiddens: bool = False) -> GenResult:
        """Plain AR baseline with the same kernels/KV cache.

        share_prefill: start the AR loop from the MSD ``prefill`` program's
        state (SAME executable as generate(split_programs=True)) so both
        paths decode over bitwise-identical KV caches; collect_hiddens must
        then match the MSD side's flag (it is part of the program shape).
        Expand-mode single-image/text prompts only.
        """
        ids = np.asarray(ids, np.int32)
        sp = sp if sp is not None else self.sp
        max_new = max_new_tokens or self.eng.max_new_tokens
        key = self._key(seed)
        if share_prefill:
            if self.image_mode != "expand" or isinstance(img_feats,
                                                         (list, tuple)):
                raise ValueError("share_prefill supports expand-mode "
                                 "single-image/text prompts only")
            st = self._statics(max_new, sp, collect_hiddens=collect_hiddens)
            padded = jnp.asarray(self._pad(ids))
            state = SE.prefill(st, self.params, padded, np.int32(len(ids)),
                               img_feats, np.int32(self._img_pos(ids)), key)
            ids_buf, cur, n_new = SE.ar_decode_from_state(st, self.params,
                                                          state)
            e0 = len(ids) + (max(self.n_img - 1, 0)
                             if img_feats is not None else 0)
            got_ids, got_cur = jax.device_get((ids_buf, cur))  # one D2H trip
            out = _trim(got_ids[e0:int(got_cur) + 1], self.eos_id, max_new)
            return GenResult(tokens=out)
        st = self._statics(max_new, sp)
        if isinstance(img_feats, (list, tuple)):  # multi-image prompt
            fused, exp_ids, _, e0, _ = self._fuse_multi(ids, img_feats)
            carry = SE.ar_prefill_prefused(st, self.params, fused, exp_ids,
                                           np.int32(e0), key)
            ids_buf, cur, _ = SE.ar_decode(st, self.params, carry)
            got_ids, got_cur = jax.device_get((ids_buf, cur))
            out = _trim(got_ids[e0:int(got_cur) + 1], self.eos_id, max_new)
            return GenResult(tokens=out)
        padded_np = self._pad(ids)
        padded = jnp.asarray(padded_np)
        if self.image_mode == "inline":
            pos3, delta = self._qwen_pos(padded_np, len(ids), img_grid)
            carry = SE.qwen_ar_prefill(st, self.params, padded,
                                       np.int32(len(ids)), img_feats,
                                       np.int32(self._img_pos(ids)), pos3,
                                       np.int32(delta), key)
        else:
            carry = SE.ar_prefill(st, self.params, padded,
                                  np.int32(len(ids)), img_feats,
                                  np.int32(self._img_pos(ids)), key)
        ids_buf, cur, n_new = SE.ar_decode(st, self.params, carry)
        e0 = len(ids) + (max(self.n_img - 1, 0)
                         if self.image_mode == "expand"
                         and img_feats is not None else 0)
        got_ids, got_cur = jax.device_get((ids_buf, cur))  # one D2H trip
        out = _trim(got_ids[e0:int(got_cur) + 1], self.eos_id, max_new)
        return GenResult(tokens=out)


def _trim(out: np.ndarray, eos_id: int, max_new: int) -> np.ndarray:
    eos = np.nonzero(out == eos_id)[0]
    if len(eos):
        out = out[:eos[0]]
    return out[:max_new]
