from vit_rpe_rope_tpu.models import vit  # noqa: F401
