from gradtts_tpu.ops.seq import (  # noqa: F401
    sequence_mask, generate_path, duration_loss, fix_len_compatibility,
)
from gradtts_tpu.ops.mas import maximum_path  # noqa: F401
