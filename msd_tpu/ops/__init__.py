from msd_tpu.ops.norms import rms_norm, layer_norm
from msd_tpu.ops.rope import rope_table, apply_rope
from msd_tpu.ops.attention import masked_attention

__all__ = ["rms_norm", "layer_norm", "rope_table", "apply_rope", "masked_attention"]
