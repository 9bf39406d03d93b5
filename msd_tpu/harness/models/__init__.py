from msd_tpu.harness.models import llava_msd, qwen2_vl_msd  # noqa: F401
