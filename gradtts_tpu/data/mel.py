"""Mel-spectrogram front end in pure JAX (librosa/torch-compatible).

Behavioral parity target: /root/reference/data.py:68-91 — reflect pad by
(n_fft - hop)/2, STFT (n_fft 1024, hop 256, periodic Hann, center=False),
magnitude, librosa slaney-scale mel filterbank (80 bins, fmin 0, fmax 8000),
log-compression log(clamp(x, 1e-5)).

The mel filterbank is built host-side in numpy (librosa is not a dependency;
the slaney construction is reimplemented and validated against torch.stft +
the reference pipeline in tests). The STFT is jnp and jit-able, so feature
extraction runs on the TPU and fuses with the mel matmul.

Round 5 closed the long-standing "Pallas candidate (framing + matmul
fusion)" note BY MEASUREMENT: the default lowering is now a dense windowed
DFT — frames built from hop-sized chunk slices, spectrum as two HIGHEST-
precision MXU matmuls (stft_magnitude(method='dft')) — which on the chip
cut the program's HBM bytes 7x vs the rfft lowering and runs at ~0.14 ms
per B8x768-frame bucket ON DEVICE (profile-trace sum; the chained-fetch
protocol reads ~2.4 ms because sub-ms programs are dominated by per-call
tunnel overhead). At that point the program sits at its op floors, so no
Pallas kernel is warranted; see PERFORMANCE.md "Mel front end".
"""

import functools
import math

import numpy as np

import jax
import jax.numpy as jnp


def hz_to_mel_slaney(f):
    f = np.asarray(f, dtype=np.float64)
    min_log_hz = 1000.0
    min_log_mel = 15.0
    logstep = np.log(6.4) / 27.0
    mels = 3.0 * f / 200.0
    above = f >= min_log_hz
    mels = np.where(above, min_log_mel + np.log(np.maximum(f, 1e-10) / min_log_hz) / logstep, mels)
    return mels


def mel_to_hz_slaney(m):
    m = np.asarray(m, dtype=np.float64)
    min_log_mel = 15.0
    logstep = np.log(6.4) / 27.0
    freqs = 200.0 * m / 3.0
    above = m >= min_log_mel
    freqs = np.where(above, 1000.0 * np.exp(logstep * (m - min_log_mel)), freqs)
    return freqs


@functools.lru_cache(maxsize=8)
def mel_filterbank(sr, n_fft, n_mels=80, fmin=0.0, fmax=8000.0):
    """librosa.filters.mel(htk=False, norm='slaney') equivalent.
    Returns [n_mels, 1 + n_fft // 2] float32."""
    fftfreqs = np.linspace(0.0, sr / 2.0, 1 + n_fft // 2)
    mel_pts = mel_to_hz_slaney(
        np.linspace(hz_to_mel_slaney(fmin), hz_to_mel_slaney(fmax), n_mels + 2))
    fdiff = np.diff(mel_pts)
    ramps = mel_pts[:, None] - fftfreqs[None, :]
    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    weights = np.maximum(0.0, np.minimum(lower, upper))
    enorm = 2.0 / (mel_pts[2:n_mels + 2] - mel_pts[:n_mels])
    weights *= enorm[:, None]
    return weights.astype(np.float32)


@functools.lru_cache(maxsize=8)
def hann_window_periodic(win_length):
    """torch.hann_window default (periodic=True)."""
    n = np.arange(win_length, dtype=np.float64)
    w = 0.5 - 0.5 * np.cos(2.0 * math.pi * n / win_length)
    return w.astype(np.float32)


@functools.lru_cache(maxsize=8)
def _windowed_dft(n_fft, win_length):
    """Real-DFT matrices [n_fft, 1 + n_fft//2] with the periodic Hann
    window folded in: ``frames @ C == Re(rfft(frames * w))`` and
    ``frames @ S == Im(...)``. Built in float64, stored float32."""
    w = hann_window_periodic(win_length).astype(np.float64)
    if win_length < n_fft:
        pad = (n_fft - win_length) // 2
        w = np.pad(w, (pad, n_fft - win_length - pad))
    k = np.arange(n_fft, dtype=np.float64)[:, None]
    f = np.arange(1 + n_fft // 2, dtype=np.float64)[None, :]
    ang = -2.0 * math.pi * k * f / n_fft
    return ((np.cos(ang) * w[:, None]).astype(np.float32),
            (np.sin(ang) * w[:, None]).astype(np.float32))


def stft_magnitude(y, n_fft=1024, hop_length=256, win_length=1024,
                   method='dft'):
    """|STFT| of [..., T] with center=False and a periodic Hann window.
    Returns [..., n_frames, 1 + n_fft // 2].

    ``method='dft'`` (default) computes the spectrum as two dense
    windowed-DFT matmuls over frames built from hop-sized chunk slices —
    the TPU-first lowering: XLA's rfft materializes the framed tensor
    plus multi-stage FFT intermediates in HBM and leaves the MXU idle
    (measured 31% of the HBM roofline at ~1% MFU, tools/roofline.py),
    while the dense DFT is MXU food (the extra O(N/log N) FLOPs are free
    at 1% MFU). Agreement with the fft path is ~4e-6 relative (f32 dot
    rounding). ``method='fft'`` keeps the rfft lowering.
    """
    n_frames = 1 + (y.shape[-1] - n_fft) // hop_length
    if method == 'dft':
        S = y.shape[-1]
        if S % hop_length == 0 and n_fft % hop_length == 0:
            # frame rows from hop-sized chunks: frame t = chunks[t:t+r]
            # concatenated — pure slicing, no gather, no index tensor
            r = n_fft // hop_length
            ch = y.reshape(y.shape[:-1] + (S // hop_length, hop_length))
            frames = jnp.concatenate(
                [ch[..., i:i + n_frames, :] for i in range(r)], axis=-1)
        else:
            idx = (jnp.arange(n_frames) * hop_length)[:, None] \
                + jnp.arange(n_fft)[None, :]
            frames = y[..., idx]
        C, Sn = _windowed_dft(n_fft, win_length)
        # HIGHEST precision: the TPU default would run these as 1-pass
        # bf16 and cost ~3e-3 relative spectral error; 3-pass keeps the
        # mel front end at fft precision for ~0.1 ms on a path with 30x
        # headroom over every consumer
        re = jnp.einsum('...tk,kf->...tf', frames, jnp.asarray(C),
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST)
        im = jnp.einsum('...tk,kf->...tf', frames, jnp.asarray(Sn),
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST)
        return jnp.sqrt(re * re + im * im)
    window = jnp.asarray(hann_window_periodic(win_length))
    if win_length < n_fft:
        pad = (n_fft - win_length) // 2
        window = jnp.pad(window, (pad, n_fft - win_length - pad))
    idx = (jnp.arange(n_frames) * hop_length)[:, None] + jnp.arange(n_fft)[None, :]
    frames = y[..., idx] * window
    spec = jnp.fft.rfft(frames, n=n_fft, axis=-1)
    return jnp.abs(spec)


def mel_spectrogram(y, n_fft=1024, num_mels=80, sampling_rate=22050,
                    hop_size=256, win_size=1024, fmin=0.0, fmax=8000.0):
    """[..., T] waveform -> [..., n_frames, num_mels] log-mel, time-major.

    Matches the reference values to ~1e-4 (float32 fft); reference returns
    [n_mels, T] — ours is time-major per the framework layout convention.
    """
    pad = (n_fft - hop_size) // 2
    y = jnp.pad(y, [(0, 0)] * (y.ndim - 1) + [(pad, pad)], mode='reflect')
    mag = stft_magnitude(y, n_fft, hop_size, win_size)
    basis = jnp.asarray(mel_filterbank(sampling_rate, n_fft, num_mels,
                                       fmin, fmax))
    mel = jnp.einsum('...tf,mf->...tm', mag, basis,
                     preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)
    return jnp.log(jnp.clip(mel, min=1e-5))


mel_spectrogram_jit = jax.jit(
    mel_spectrogram,
    static_argnames=('n_fft', 'num_mels', 'sampling_rate', 'hop_size',
                     'win_size', 'fmin', 'fmax'))


def mel_from_padded(y_padded, y_lengths=None, n_fft=1024, num_mels=80,
                    sampling_rate=22050, hop_size=256, win_size=1024,
                    fmin=0.0, fmax=8000.0):
    """Batched log-mel of ALREADY reflect-padded audio [..., S].

    The device input pipeline (DataLoader(device_mel=True)) reflect-pads
    each utterance on the host (so edge frames see the utterance's own
    reflection, exactly like the per-item reference pipeline,
    /root/reference/data.py:74-76) and zero-pads the batch to a bucket;
    the STFT + mel matmul then run as ONE jitted program on the
    accelerator — the host's 2-CPU numpy rfft loop is the measured
    bottleneck of the training input pipeline (see PERFORMANCE.md
    "Input pipeline").

    ``y_padded`` may be int16 PCM (the wire format of
    ``DeviceMelCollate(upload_dtype='int16')``): it is converted to
    float32 / 32768 on device, halving the host->device bytes — exact
    for PCM16-sourced wavs, a -96 dB quantization for float sources.
    """
    if y_padded.dtype == jnp.int16:
        y_padded = y_padded.astype(jnp.float32) / 32768.0
    mag = stft_magnitude(y_padded, n_fft, hop_size, win_size)
    basis = jnp.asarray(mel_filterbank(sampling_rate, n_fft, num_mels,
                                       fmin, fmax))
    mel = jnp.einsum('...tf,mf->...tm', mag, basis,
                     preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)
    mel = jnp.log(jnp.clip(mel, min=1e-5))
    if y_lengths is not None:
        # zero tail frames on device (the host collate zero-pads) so the
        # result never needs a host round trip before training consumes it
        frames = jnp.arange(mel.shape[-2])
        mel = mel * (frames[:, None] < y_lengths[..., None, None])
    return mel


mel_from_padded_jit = jax.jit(
    mel_from_padded,
    static_argnames=('n_fft', 'num_mels', 'sampling_rate', 'hop_size',
                     'win_size', 'fmin', 'fmax'))


def mel_spectrogram_np(y, n_fft=1024, num_mels=80, sampling_rate=22050,
                       hop_size=256, win_size=1024, fmin=0.0, fmax=8000.0):
    """Numpy twin of :func:`mel_spectrogram` for host-side data workers
    (keeps the input pipeline off the accelerator)."""
    y = np.asarray(y, dtype=np.float32)
    pad = (n_fft - hop_size) // 2
    y = np.pad(y, [(0, 0)] * (y.ndim - 1) + [(pad, pad)], mode='reflect')
    window = hann_window_periodic(win_size)
    if win_size < n_fft:
        wpad = (n_fft - win_size) // 2
        window = np.pad(window, (wpad, n_fft - win_size - wpad))
    n_frames = 1 + (y.shape[-1] - n_fft) // hop_size
    idx = (np.arange(n_frames) * hop_size)[:, None] + np.arange(n_fft)[None, :]
    frames = y[..., idx] * window
    mag = np.abs(np.fft.rfft(frames, n=n_fft, axis=-1)).astype(np.float32)
    basis = mel_filterbank(sampling_rate, n_fft, num_mels, fmin, fmax)
    mel = mag @ basis.T
    return np.log(np.clip(mel, 1e-5, None)).astype(np.float32)
