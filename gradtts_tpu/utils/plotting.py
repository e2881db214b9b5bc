"""Spectrogram / alignment plotting helpers.

Behavioral parity targets: /root/reference/utils.py:63-84 (save_plot /
plot_tensor used by the trainers' TensorBoard images) and the
``pt_to_pdf`` style of /root/reference/inference_zero.py:38-47.
matplotlib with the Agg backend; all inputs are [T, F] or [Tx, Ty] numpy.
"""

import numpy as np


def _fig_to_array(fig):
    fig.canvas.draw()
    data = np.frombuffer(fig.canvas.buffer_rgba(), dtype=np.uint8)
    w, h = fig.canvas.get_width_height()
    return data.reshape((h, w, 4))[..., :3]


def plot_tensor(mat) -> np.ndarray:
    """[F, T] (or [T, F] transposed by the caller) -> RGB image array for
    TensorBoard (parity: utils.py:63-73)."""
    import matplotlib
    matplotlib.use('Agg')
    import matplotlib.pyplot as plt
    fig, ax = plt.subplots(figsize=(12, 3))
    im = ax.imshow(np.asarray(mat), aspect='auto', origin='lower',
                   interpolation='none')
    plt.colorbar(im, ax=ax)
    plt.tight_layout()
    out = _fig_to_array(fig)
    plt.close(fig)
    return out


def save_plot(mat, savepath: str, vmin=None, vmax=None) -> None:
    """Save a spectrogram/alignment heatmap (parity: utils.py:76-84)."""
    import matplotlib
    matplotlib.use('Agg')
    import matplotlib.pyplot as plt
    fig, ax = plt.subplots(figsize=(12, 3))
    im = ax.imshow(np.asarray(mat), aspect='auto', origin='lower',
                   interpolation='none', vmin=vmin, vmax=vmax)
    plt.colorbar(im, ax=ax)
    plt.tight_layout()
    fig.savefig(savepath)
    plt.close(fig)
