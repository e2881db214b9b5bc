"""Sustained input-pipeline feed benchmark (BASELINE config-4 support).

Measures how many utterances/second the DataLoader can deliver to the
accelerator, per epoch, for the host-mel and device-mel pipelines with
the cross-epoch item cache on/off. The training step consumes ~940-975
utt/s at B16 on v5e (bench_suite.py train); the pipeline must sustain at
least that or the chip starves (PERFORMANCE.md "Input pipeline").

Methodology: a synthetic 64-utterance corpus (4-7 s wavs at 22.05 kHz)
is decoded through the real dataset/collate path. Device-mel batches
keep ``y`` on the accelerator; to charge the measurement for the mel
compute without paying a per-batch tunnel round trip, a device-side
accumulator sums each batch's mel and is fetched ONCE per epoch (the
same way training consumes the arrays). Run from /root/repo:

  python tools/bench_input.py
"""

import json
import os
import time

import numpy as np


def make_corpus(root: str, n: int = 64, sr: int = 22050):
    from scipy.io import wavfile
    os.makedirs(root, exist_ok=True)
    filelist = os.path.join(root, 'list.txt')
    if os.path.exists(filelist):
        return filelist
    lines = []
    words = ('alpha bravo charlie delta echo foxtrot golf hotel india '
             'juliett kilo lima mike november oscar papa quebec romeo '
             'sierra tango uniform victor whiskey xray yankee zulu').split()
    rng = np.random.default_rng(0)
    for i in range(n):
        dur = 4.0 + 3.0 * (i % 8) / 7.0
        t = np.arange(int(sr * dur)) / sr
        f = 120 + 10 * (i % 13)
        wav = (0.3 * np.sin(2 * np.pi * f * t)
               + 0.1 * np.sin(2 * np.pi * 2.3 * f * t)
               + 0.02 * rng.standard_normal(t.shape)).astype(np.float32)
        path = os.path.join(root, f'{i:03d}.wav')
        wavfile.write(path, sr, (wav * 32767).astype(np.int16))
        text = ' '.join(words[(i + j) % len(words)] for j in range(10))
        lines.append(f'{path}|{text}')
    with open(filelist, 'w') as fh:
        fh.write('\n'.join(lines))
    return filelist


def run(filelist: str, device_mel: bool, cache_bytes: int, epochs: int = 3,
        batch_size: int = 16, upload_dtype: str = 'float32'):
    import jax
    import jax.numpy as jnp
    from gradtts_tpu.data.dataset import BatchCollate, DataLoader, \
        TextMelDataset

    ds = TextMelDataset(filelist, 'resources/cmu_dictionary', shuffle=False)
    loader = DataLoader(ds, batch_size, BatchCollate(), shuffle=True,
                        num_workers=4, device_mel=device_mel,
                        cache_bytes=cache_bytes,
                        mel_upload_dtype=upload_dtype)

    @jax.jit
    def consume(acc, y):
        return acc + jnp.sum(y)

    label = (f"{'device' if device_mel else 'host'}_mel_cache_"
             f"{'on' if cache_bytes else 'off'}"
             + ('_i16' if upload_dtype == 'int16' else ''))
    rates = []
    for epoch in range(epochs):
        acc = jnp.zeros((), jnp.float32)
        n_utts = 0
        t0 = time.perf_counter()
        for batch in loader:
            acc = consume(acc, jnp.asarray(batch['y']))
            n_utts += batch['y'].shape[0] if hasattr(batch['y'], 'shape') \
                else len(batch['x'])
        float(acc)  # one fetch: forces every queued mel/upload to finish
        dt = time.perf_counter() - t0
        rates.append(n_utts / dt)
    print(json.dumps({
        'metric': f'input_feed_{label}',
        'epoch_utt_per_s': [round(r, 1) for r in rates],
        'sustained_utt_per_s': round(max(rates[1:]) if len(rates) > 1
                                     else rates[0], 1),
        'unit': 'utt/s',
    }), flush=True)


if __name__ == '__main__':
    filelist = make_corpus('/tmp/bench_input_corpus')
    for device_mel in (False, True):
        for cache in (0, 1 << 30):
            run(filelist, device_mel, cache)
    run(filelist, True, 1 << 30, upload_dtype='int16')
