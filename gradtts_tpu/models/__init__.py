from gradtts_tpu.models.tts import (  # noqa: F401
    GradTTS, synthesize, compute_loss, get_score_fn, SynthesisResult,
    LossResult,
)
from gradtts_tpu.models.text_encoder import TextEncoder  # noqa: F401
from gradtts_tpu.models.diffusion import (  # noqa: F401
    GradLogPEstimator2d, reverse_diffusion, reverse_diffusion_dpm,
    forward_diffusion,
    diffusion_loss, get_noise,
)
