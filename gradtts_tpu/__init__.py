"""gradtts_tpu — a TPU-native (JAX/XLA/Pallas) speech-diffusion framework.

A from-scratch rebuild of the capabilities of the Grad-TTS research fork at
/root/reference (ICML-2021 Grad-TTS + TED-LIUM speaker conditioning +
diffusion-likelihood n-best ASR rescoring + objective TTS evaluation),
re-designed TPU-first:

- flax.linen modules with NTC / NHWC layouts (channels minor for the MXU),
- Monotonic Alignment Search as an on-device ``lax.scan`` dynamic program
  (plus a native C++/OpenMP implementation for CPU parity),
- the Euler reverse-diffusion sampler as a compiled ``lax.scan``,
- data/tensor parallelism via ``jax.sharding.Mesh`` + NamedSharding with
  XLA-inserted collectives,
- static-shape bucketing everywhere so XLA compiles a handful of programs.
"""

__version__ = '0.1.0'

from gradtts_tpu.config import GradTTSConfig, get_config, PRESETS  # noqa: F401
