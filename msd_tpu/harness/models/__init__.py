from msd_tpu.harness.models import llava_msd  # noqa: F401  (registers models)
