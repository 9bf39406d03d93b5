"""msd_tpu — TPU-native Modality-Aware Speculative Decoding for Vision-Language Models.

A ground-up JAX/XLA/Pallas re-design of the capabilities of
``ljc0359/Speculative-Decoding-For-Vision-Language-Model`` (see SURVEY.md):

- LLaVA-1.5 target VLM (CLIP ViT-L/336 tower + mlp2x_gelu projector + LLaMA LM)
  as jit-compiled functional JAX with a preallocated fixed-shape KV cache.
- EAGLE-style one-layer MSD draft head speculating token *trees*.
- OPT-Tree global-frontier construction + early stopping entirely on device
  (fixed tree budget, ``lax.while_loop``), no per-step host syncs.
- Single batched target verification over a packed ancestor tree mask with
  lossless greedy / speculative-sampling acceptance and on-device KV gather.
- Grouped isotonic calibrator: host-side PAV fit, device-side table lookup.
- lmms-eval-compatible harness surface (``llava_msd_calibrated``, ``--use_msd``,
  ``--use_calibration``, ``--train_ratio``).

Unlike the PyTorch reference (eager per-step Python tree bookkeeping), the whole
decode is one XLA program: ``lax.while_loop`` over verification steps, each step
fusing draft expansion, tree attention, acceptance, and KV update.
"""

__version__ = "0.1.0"


def __getattr__(name):
    """Lazy top-level API (keeps `import msd_tpu` free of jax imports)."""
    if name == "MSDGenerator":
        from msd_tpu.engine.generator import MSDGenerator
        return MSDGenerator
    if name == "SamplingParams":
        from msd_tpu.ops.sampling import SamplingParams
        return SamplingParams
    if name in ("LlamaConfig", "LlavaConfig", "DraftConfig", "TreeConfig",
                "EngineConfig", "ClipVisionConfig"):
        import msd_tpu.configs as _c
        return getattr(_c, name)
    raise AttributeError(name)
