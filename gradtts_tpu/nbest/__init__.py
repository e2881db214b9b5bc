"""n-best diffusion-likelihood rescoring subsystem.

TPU-native rebuild of /root/reference/n_best/: pickle n-best lists, batched
jitted likelihood scoring, score compilation, linear rescoring + WER, and
TPE weight search.
"""

from gradtts_tpu.nbest.lists import (  # noqa: F401
    NBestList, SCORE_NAMES, load_n_best, save_n_best, make_synthetic_n_best,
)
from gradtts_tpu.nbest.wer import wer, wer_details, edit_counts  # noqa: F401
from gradtts_tpu.nbest.scoring import (  # noqa: F401
    NBestScorer, score_batch, score_n_best, compile_scores,
)
from gradtts_tpu.nbest.rescoring import (  # noqa: F401
    rescoring_wer, select_hypotheses, evaluate, weights_vector,
)
from gradtts_tpu.nbest.sweep import (  # noqa: F401
    tpe_minimize, refine, DEFAULT_SPACE,
)
