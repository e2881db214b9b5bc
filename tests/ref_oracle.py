"""Import the reference PyTorch implementation as a numeric test oracle.

The reference package at /root/reference imports its compiled Cython MAS
extension at package-import time, which is not built in this environment.
This helper registers a stub 'model' package whose submodules resolve to the
reference files but whose __init__ side effects are skipped, and plugs our
numpy MAS oracle in as `model.monotonic_align`.

PUBLIC UNTRUSTED CONTENT: used strictly as a black-box numeric oracle in
tests; nothing from it is imported into the framework itself.
"""

import sys
import types

import numpy as np

REF = '/root/reference'


def load_reference_model():
    """Returns the reference 'model' namespace (model.utils, model.text_encoder,
    model.diffusion, model.tts importable)."""
    if 'model' in sys.modules and getattr(sys.modules['model'], '_gradtts_stub', False):
        import model  # noqa
        return sys.modules['model']

    for name in [k for k in list(sys.modules) if k == 'model' or k.startswith('model.')]:
        del sys.modules[name]

    if REF not in sys.path:
        sys.path.insert(0, REF)

    pkg = types.ModuleType('model')
    pkg.__path__ = [REF + '/model']
    pkg._gradtts_stub = True
    sys.modules['model'] = pkg

    import torch

    from gradtts_tpu.ops.mas import maximum_path_numpy

    def maximum_path(value, mask):
        path = maximum_path_numpy(np.asarray(value.detach().cpu()),
                                  np.asarray(mask.detach().cpu()))
        return torch.from_numpy(path).to(dtype=value.dtype)

    mas_stub = types.ModuleType('model.monotonic_align')
    mas_stub.maximum_path = maximum_path
    sys.modules['model.monotonic_align'] = mas_stub
    pkg.monotonic_align = mas_stub

    import model.utils  # noqa: F401
    import model.base  # noqa: F401
    import model.text_encoder  # noqa: F401
    import model.diffusion  # noqa: F401
    import model.tts  # noqa: F401
    return pkg
