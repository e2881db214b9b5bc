"""Datasets and batch collation with static-shape bucketing.

Behavioral parity targets: /root/reference/data.py —
TextMelDataset/TextMelBatchCollate (:94-168), speaker-id variants (:171-254),
zero-speaker variants with pretrained embedding tensors (:288-376), the TED
text normalizer ``transform_txt`` (:256-271).

TPU-first deviations:
- batches are numpy dicts padded to BUCKETED static shapes (so XLA compiles
  a handful of programs instead of one per batch shape);
- audio decode + mel extraction run host-side in numpy worker threads (the
  reference burns DataLoader workers on torch STFT);
- wav IO is scipy/wave based (no torchaudio dependency).
"""

import random
import re
import threading
import queue as queue_mod
import wave
from typing import Dict, List, Optional, Sequence

import numpy as np

from gradtts_tpu.config import GradTTSConfig, fix_len_compatibility
from gradtts_tpu.data.mel import mel_spectrogram_np
from gradtts_tpu.text import CMUDict, intersperse_blank, text_to_sequence
from gradtts_tpu.text.symbols import symbols


def parse_filelist(filelist_path, split_char='|'):
    with open(filelist_path, encoding='utf-8') as f:
        return [line.strip().split(split_char) for line in f if line.strip()]


def load_wav(path):
    """Returns (waveform float32 in [-1, 1], sample_rate). Supports PCM16/32
    and float32 WAV via scipy, falling back to the wave module."""
    try:
        from scipy.io import wavfile
        sr, data = wavfile.read(path)
        if data.dtype == np.int16:
            data = data.astype(np.float32) / 32768.0
        elif data.dtype == np.int32:
            data = data.astype(np.float32) / 2147483648.0
        elif data.dtype == np.uint8:
            data = (data.astype(np.float32) - 128.0) / 128.0
        else:
            data = data.astype(np.float32)
        if data.ndim > 1:
            data = data[:, 0]
        return data, sr
    except Exception:
        with wave.open(path, 'rb') as w:
            sr = w.getframerate()
            n = w.getnframes()
            raw = w.readframes(n)
            data = np.frombuffer(raw, dtype=np.int16).astype(np.float32) / 32768.0
            if w.getnchannels() > 1:
                data = data.reshape(-1, w.getnchannels())[:, 0]
            return data, sr


def wav_header(path):
    """(n_samples, sample_rate) parsed from the RIFF header alone — no
    sample data is read, so per-item length metadata for a whole corpus is
    cheap (used to derive batch shapes from the GLOBAL batch in multi-host
    runs; see DataLoader)."""
    with open(path, 'rb') as f:
        riff = f.read(12)
        if len(riff) < 12 or riff[:4] != b'RIFF' or riff[8:12] != b'WAVE':
            raise ValueError(f'{path}: not a RIFF/WAVE file')
        sr = block_align = data_size = None
        while True:
            hdr = f.read(8)
            if len(hdr) < 8:
                break
            cid = hdr[:4]
            size = int.from_bytes(hdr[4:8], 'little')
            if cid == b'fmt ':
                fmt = f.read(size)
                sr = int.from_bytes(fmt[4:8], 'little')
                block_align = int.from_bytes(fmt[12:14], 'little')
            elif cid == b'data':
                data_size = size
                break
            else:
                f.seek(size + (size & 1), 1)
        if sr is None or not block_align or data_size is None:
            raise ValueError(f'{path}: malformed WAV header')
        return data_size // block_align, sr


def bucket_length(length: int, buckets: Sequence[int]) -> int:
    """Smallest bucket >= length (last bucket if none fits)."""
    for b in buckets:
        if length <= b:
            return b
    return buckets[-1]


# --- TED-LIUM text normalizer (parity: data.py:256-271) -------------------

_TED_BRACKETS = [re.compile(p) for p in
                 (r'\[.*?\]', r'\(.*?\)', r'<.*?>', r'\{.*?\}')]
_TED_SPACES = re.compile(r' +')


def transform_txt(txt: str) -> str:
    txt = txt.lower()
    for pat in _TED_BRACKETS:
        txt = pat.sub('', txt)
    txt = txt.strip()
    txt = _TED_SPACES.sub(' ', txt)
    txt = txt.replace(" '", "'")
    return txt


# --- datasets --------------------------------------------------------------


class TextMelDataset:
    """(wav path, text) filelist -> (token ids, log-mel [T, 80]) pairs."""

    def __init__(self, filelist_path, cmudict_path, add_blank=True,
                 n_fft=1024, n_mels=80, sample_rate=22050, hop_length=256,
                 win_length=1024, f_min=0.0, f_max=8000.0, shuffle=True,
                 seed=37, split_char='|'):
        self.filepaths_and_text = parse_filelist(filelist_path, split_char)
        self.cmudict = CMUDict(cmudict_path)
        self.add_blank = add_blank
        self.n_fft = n_fft
        self.n_mels = n_mels
        self.sample_rate = sample_rate
        self.hop_length = hop_length
        self.win_length = win_length
        self.f_min = f_min
        self.f_max = f_max
        if shuffle:
            rng = random.Random(seed)
            rng.shuffle(self.filepaths_and_text)

    def get_text(self, text):
        ids = text_to_sequence(text, dictionary=self.cmudict)
        if self.add_blank:
            ids = intersperse_blank(ids, len(symbols))
        return np.asarray(ids, dtype=np.int32)

    def get_mel(self, filepath):
        audio, sr = load_wav(filepath)
        if sr != self.sample_rate:
            raise ValueError(f'{filepath}: sample rate {sr} != {self.sample_rate}')
        return mel_spectrogram_np(audio[None], self.n_fft, self.n_mels,
                                  self.sample_rate, self.hop_length,
                                  self.win_length, self.f_min, self.f_max)[0]

    def __getitem__(self, index):
        path, text = self.filepaths_and_text[index][:2]
        return {'x': self.get_text(text), 'y': self.get_mel(path)}

    def get_audio(self, filepath):
        audio, sr = load_wav(filepath)
        if sr != self.sample_rate:
            raise ValueError(f'{filepath}: sample rate {sr} != {self.sample_rate}')
        return audio

    def audio_item(self, index):
        """Like __getitem__ but with raw audio instead of the host-computed
        mel — the device input pipeline (DataLoader(device_mel=True))
        extracts mels on the accelerator instead of the host CPUs."""
        path, text = self.filepaths_and_text[index][:2]
        return {'x': self.get_text(text), 'audio': self.get_audio(path)}

    def item_lengths(self, index):
        """(token count, mel frame count) WITHOUT decoding audio — text is
        tokenized, audio length comes from the WAV header. Must match the
        shapes __getitem__ produces; multi-host shape agreement depends on
        it (DataLoader derives global batch shapes from this)."""
        path, text = self.filepaths_and_text[index][:2]
        n_samples, sr = wav_header(path)
        if sr != self.sample_rate:
            raise ValueError(f'{path}: sample rate {sr} != {self.sample_rate}')
        pad = (self.n_fft - self.hop_length) // 2
        n_frames = 1 + (n_samples + 2 * pad - self.n_fft) // self.hop_length
        return len(self.get_text(text)), n_frames

    def __len__(self):
        return len(self.filepaths_and_text)

    def sample_test_batch(self, size, seed=0):
        idx = np.random.default_rng(seed).choice(len(self), size=size,
                                                 replace=False)
        return [self[int(i)] for i in idx]


class TextMelSpeakerDataset(TextMelDataset):
    """Filelist lines ``wav|text|speaker_id`` (parity: data.py:171-227)."""

    def __getitem__(self, index):
        path, text, speaker = self.filepaths_and_text[index][:3]
        return {'x': self.get_text(text), 'y': self.get_mel(path),
                'spk': np.asarray([int(speaker)], dtype=np.int32)}

    def audio_item(self, index):
        item = super().audio_item(index)
        item['spk'] = np.asarray([int(self.filepaths_and_text[index][2])],
                                 dtype=np.int32)
        return item


class TextMelZeroSpeakerDataset(TextMelDataset):
    """(wav, text) filelist plus a pretrained speaker-embedding matrix
    indexed by utterance (parity: data.py:288-350). ``spk_path`` may be
    .npy/.npz or a torch .pt tensor."""

    def __init__(self, filelist_path, spk_path, cmudict_path,
                 spk_emb_dim=192, **kw):
        kw.setdefault('shuffle', False)
        super().__init__(filelist_path, cmudict_path, **kw)
        self.spk_emb = _load_embedding_matrix(spk_path)
        self.spk_emb_dim = spk_emb_dim

    def __getitem__(self, index):
        path, text = self.filepaths_and_text[index][:2]
        return {'x': self.get_text(text), 'y': self.get_mel(path),
                'spk': np.asarray(self.spk_emb[index], dtype=np.float32)}

    def audio_item(self, index):
        item = super().audio_item(index)
        item['spk'] = np.asarray(self.spk_emb[index], dtype=np.float32)
        return item


def _load_embedding_matrix(path):
    if path.endswith('.npy'):
        return np.load(path)
    if path.endswith('.npz'):
        data = np.load(path)
        return data[list(data.keys())[0]]
    import torch  # .pt tensors (reference format, data.py:300)
    t = torch.load(path, map_location='cpu')
    return np.asarray(t.detach().cpu().numpy() if hasattr(t, 'detach') else t)


# --- collation -------------------------------------------------------------


class BatchCollate:
    """Pad a list of items to bucketed static shapes.

    Output: {'x': [B, Xb] int32, 'x_lengths': [B], 'y': [B, Yb, F] f32,
             'y_lengths': [B] (, 'spk')} where Xb/Yb are bucket boundaries
    (Yb always a multiple of 4 per fix_len_compatibility).
    """

    def __init__(self, x_buckets=(64, 128, 192, 256, 384, 512),
                 y_buckets=(128, 256, 384, 512, 768, 1024, 1536, 2048),
                 fixed_shapes: Optional[tuple] = None):
        self.x_buckets = x_buckets
        self.y_buckets = [fix_len_compatibility(b) for b in y_buckets]
        self.fixed_shapes = fixed_shapes  # (Xb, Yb) to disable bucketing

    def shapes_for(self, x_max: int, y_max: int):
        """(Xb, Yb) bucket shapes for given max lengths. Deterministic in
        (x_max, y_max) so hosts that agree on the GLOBAL batch's maxima
        agree on shapes."""
        y_max = fix_len_compatibility(y_max)
        if self.fixed_shapes is not None:
            xb, yb = self.fixed_shapes
        else:
            xb = bucket_length(x_max, self.x_buckets)
            yb = bucket_length(y_max, self.y_buckets)
        return max(xb, x_max), max(yb, y_max)

    def __call__(self, batch: List[Dict],
                 shapes: Optional[tuple] = None) -> Dict[str, np.ndarray]:
        B = len(batch)
        x_max = max(item['x'].shape[-1] for item in batch)
        y_max = max(item['y'].shape[0] for item in batch)
        if shapes is not None:
            # shapes derived from global (cross-host) metadata: must cover
            # every local item, otherwise the metadata is wrong — fail loud
            # rather than silently diverge across hosts
            xb, yb = shapes
            if xb < x_max or yb < fix_len_compatibility(y_max):
                raise ValueError(
                    f'provided batch shapes {shapes} smaller than local '
                    f'maxima ({x_max}, {fix_len_compatibility(y_max)}) — '
                    'item_lengths metadata disagrees with actual items')
        else:
            xb, yb = self.shapes_for(x_max, y_max)
        n_feats = batch[0]['y'].shape[-1]

        x = np.zeros((B, xb), np.int32)
        y = np.zeros((B, yb, n_feats), np.float32)
        x_lengths = np.zeros((B,), np.int32)
        y_lengths = np.zeros((B,), np.int32)
        for i, item in enumerate(batch):
            xi, yi = item['x'], item['y']
            x[i, :xi.shape[-1]] = xi
            y[i, :yi.shape[0]] = yi
            x_lengths[i] = xi.shape[-1]
            y_lengths[i] = yi.shape[0]
        out = {'x': x, 'x_lengths': x_lengths, 'y': y, 'y_lengths': y_lengths}
        if 'spk' in batch[0]:
            s0 = np.asarray(batch[0]['spk'])
            if s0.dtype.kind in 'iu':  # speaker ids
                out['spk'] = np.array(
                    [int(np.asarray(b['spk']).reshape(-1)[0]) for b in batch],
                    np.int32)
            else:  # external embedding vectors
                out['spk'] = np.stack(
                    [np.asarray(b['spk'], np.float32).reshape(-1)
                     for b in batch])
        return out


class DeviceMelCollate:
    """Collate raw-audio items ('x', 'audio'(, 'spk')) and extract the
    log-mels as ONE jitted batched STFT+matmul on the accelerator.

    Produces the same batch dict as :class:`BatchCollate` (same bucket
    shapes, same values to fft precision, tail frames zeroed): each
    utterance is reflect-padded on the host first — so edge frames see
    the utterance's own reflection, exactly like the per-item host path
    (parity: /root/reference/data.py:74-76) — then the batch is
    zero-padded to the frame bucket and handed to ``mel_from_padded_jit``.
    On the 2-CPU bench host the numpy mel loop feeds ~130 utt/s while the
    train step consumes ~940; the device path removes the host fft from
    the critical path entirely (PERFORMANCE.md "Input pipeline").
    """

    def __init__(self, base: BatchCollate, n_fft=1024, n_mels=80,
                 sample_rate=22050, hop_length=256, win_length=1024,
                 f_min=0.0, f_max=8000.0, upload_dtype='float32'):
        """``upload_dtype='int16'`` ships the padded audio batch to the
        device as PCM16 and converts to float on device — HALF the
        host->device bytes (PCIe on a real host, the tunnel on this
        bench host: the measured hard bound of the input pipeline).
        Exact for PCM16-sourced wavs (load_wav's i/32768 round-trips);
        float sources see one -96 dB quantization."""
        self.base = base
        self.n_fft, self.n_mels = n_fft, n_mels
        self.sample_rate, self.hop_length = sample_rate, hop_length
        self.win_length, self.f_min, self.f_max = win_length, f_min, f_max
        self.upload_dtype = upload_dtype
        self.x_buckets = base.x_buckets
        self.y_buckets = base.y_buckets

    @classmethod
    def for_dataset(cls, dataset, base: BatchCollate,
                    upload_dtype='float32'):
        return cls(base, n_fft=dataset.n_fft, n_mels=dataset.n_mels,
                   sample_rate=dataset.sample_rate,
                   hop_length=dataset.hop_length,
                   win_length=dataset.win_length, f_min=dataset.f_min,
                   f_max=dataset.f_max, upload_dtype=upload_dtype)

    def shapes_for(self, x_max: int, y_max: int):
        return self.base.shapes_for(x_max, y_max)

    def __call__(self, batch: List[Dict],
                 shapes: Optional[tuple] = None) -> Dict[str, np.ndarray]:
        from gradtts_tpu.data.mel import mel_from_padded_jit
        hop, n_fft = self.hop_length, self.n_fft
        pad = (n_fft - hop) // 2
        B = len(batch)
        y_lengths = np.array(
            [1 + (item['audio'].shape[-1] + 2 * pad - n_fft) // hop
             for item in batch], np.int32)
        x_max = max(item['x'].shape[-1] for item in batch)
        if shapes is not None:
            xb, yb = shapes
        else:
            xb, yb = self.base.shapes_for(x_max, int(y_lengths.max()))
        # bucketed padded-audio length such that frames(S) == yb
        S = (yb - 1) * hop + n_fft
        # shapes may come from global (cross-host) item_lengths metadata:
        # verify every local item fits, mirroring BatchCollate's check —
        # otherwise a header/decoded-length mismatch surfaces as an opaque
        # numpy broadcast error below instead of this descriptive one
        if shapes is not None and (x_max > xb or int(y_lengths.max()) > yb):
            raise ValueError(
                f'provided batch shapes {shapes} smaller than local '
                f'maxima ({x_max}, {int(y_lengths.max())}) — '
                'item_lengths metadata disagrees with actual items')
        int16 = self.upload_dtype == 'int16'
        audio = np.zeros((B, S), np.int16 if int16 else np.float32)
        for i, item in enumerate(batch):
            a = np.pad(np.asarray(item['audio'], np.float32), (pad, pad),
                       mode='reflect')
            if a.shape[-1] > S:
                raise ValueError(
                    f'item {i}: padded audio length {a.shape[-1]} exceeds '
                    f'the {S}-sample bucket — item_lengths metadata '
                    'disagrees with actual items')
            if int16:  # exact inverse of load_wav's i/32768 for PCM16
                a = np.clip(np.round(a * 32768.0), -32768, 32767)
            audio[i, :a.shape[-1]] = a
        # y stays a device array (tail frames zeroed in-jit): no host
        # round trip — the training step consumes it where it lives, and
        # jax's async dispatch overlaps the upload/fft with host work
        y = mel_from_padded_jit(
            audio, y_lengths, n_fft=n_fft, num_mels=self.n_mels,
            sampling_rate=self.sample_rate, hop_size=hop,
            win_size=self.win_length, fmin=self.f_min, fmax=self.f_max)

        # collate the host-side fields like BatchCollate
        x = np.zeros((B, xb), np.int32)
        x_lengths = np.zeros((B,), np.int32)
        for i, item in enumerate(batch):
            xi = item['x']
            x[i, :xi.shape[-1]] = xi
            x_lengths[i] = xi.shape[-1]
        out = {'x': x, 'x_lengths': x_lengths, 'y': y,
               'y_lengths': y_lengths}
        if 'spk' in batch[0]:
            s0 = np.asarray(batch[0]['spk'])
            if s0.dtype.kind in 'iu':
                out['spk'] = np.array(
                    [int(np.asarray(b['spk']).reshape(-1)[0])
                     for b in batch], np.int32)
            else:
                out['spk'] = np.stack(
                    [np.asarray(b['spk'], np.float32).reshape(-1)
                     for b in batch])
        return out


class DataLoader:
    """Minimal epoch iterator with background prefetch.

    Replaces torch DataLoader(num_workers=N): items are fetched by a thread
    pool (audio decode + numpy mel), batches collated to static shapes and
    queued ahead of the training step. ``device_mel=True`` fetches raw
    audio instead (``dataset.audio_item``) and extracts the mels on the
    accelerator via :class:`DeviceMelCollate` — the TPU-first path when
    host CPUs can't feed the chip (measured on the 2-CPU bench host:
    ~130 -> >1000 utt/s sustained; PERFORMANCE.md "Input pipeline").
    """

    def __init__(self, dataset, batch_size, collate: BatchCollate,
                 shuffle=True, seed=0, drop_last=True, num_workers=4,
                 prefetch=2, shard=None, device_mel=False,
                 cache_bytes: int = 1 << 30,
                 mel_upload_dtype: str = 'float32'):
        """``batch_size`` is the GLOBAL batch. ``shard=(index, count)``
        makes this a per-host input pipeline: every host computes the same
        shuffled order (same seed), then loads only its contiguous
        ``batch_size/count`` block of each global batch — pair with
        ``shard_batch(..., per_host=True)``.

        ``cache_bytes``: decoded items (audio/mel + token ids) are kept in
        host memory across epochs up to this budget, so epoch 2+ skips wav
        decode and tokenization entirely (the reference re-decodes every
        epoch, data.py:117-122; on the 2-CPU bench host decode+tokenize
        was the sustained-feed bound — PERFORMANCE.md "Input pipeline").
        Once the budget is full, remaining items are simply re-fetched
        (no eviction: with per-epoch reshuffling there is no locality for
        LRU to exploit). 0 disables caching."""
        self.dataset = dataset
        self.batch_size = batch_size
        self.device_mel = device_mel
        if device_mel and not isinstance(collate, DeviceMelCollate):
            collate = DeviceMelCollate.for_dataset(
                dataset, collate, upload_dtype=mel_upload_dtype)
        self.collate = collate
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.num_workers = max(1, num_workers)
        self.prefetch = prefetch
        self.shard = shard
        if shard is not None:
            index, count = shard
            if not (0 <= index < count):
                raise ValueError(f'bad shard {shard}')
            if batch_size % count:
                raise ValueError(f'global batch {batch_size} not divisible '
                                 f'by shard count {count}')
        self._epoch = 0
        self._lengths = None  # lazy [N, 2] (x_len, y_len) metadata
        self.cache_bytes = cache_bytes
        self._cache: Dict[int, Dict] = {}
        self._cache_size = 0

    def _fetch(self, index: int) -> Dict:
        """Item fetch with the cross-epoch cache (see __init__)."""
        item = self._cache.get(index)
        if item is not None:
            return item
        item = (self.dataset.audio_item(index) if self.device_mel
                else self.dataset[index])
        if self.cache_bytes:
            size = sum(v.nbytes for v in item.values()
                       if hasattr(v, 'nbytes'))
            # benign race under the thread pool: worst case a few items
            # overshoot the budget by one item's size
            if self._cache_size + size <= self.cache_bytes:
                self._cache[index] = item
                self._cache_size += size
        return item

    def _item_lengths(self) -> np.ndarray:
        """Per-item (token count, mel frames) for the whole dataset, from
        headers/text only. Computed once; used so every host derives batch
        shapes from the GLOBAL batch's maxima (local rows differ per host,
        shapes must not)."""
        if self._lengths is None:
            from concurrent.futures import ThreadPoolExecutor
            with ThreadPoolExecutor(max(4, self.num_workers)) as pool:
                self._lengths = np.array(
                    list(pool.map(self.dataset.item_lengths,
                                  range(len(self.dataset)))), np.int64)
        return self._lengths

    def __len__(self):
        n = len(self.dataset)
        return n // self.batch_size if self.drop_last else \
            (n + self.batch_size - 1) // self.batch_size

    def __iter__(self):
        order = np.arange(len(self.dataset))
        if self.shuffle:
            np.random.default_rng(self.seed + self._epoch).shuffle(order)
        self._epoch += 1
        batches = [order[i:i + self.batch_size]
                   for i in range(0, len(order), self.batch_size)]
        if self.drop_last or self.shard is not None:
            batches = [b for b in batches if len(b) == self.batch_size]
        shapes = [None] * len(batches)
        if self.shard is not None:
            # derive each batch's static shapes from the GLOBAL index set
            # BEFORE slicing local rows: every host sees the same maxima,
            # so collated shapes (and hence compiled programs / barrier
            # signatures) are identical across hosts even though each host
            # only materializes its own rows
            if hasattr(self.dataset, 'item_lengths'):
                lengths = self._item_lengths()
                shapes = [self.collate.shapes_for(
                    int(lengths[b, 0].max()), int(lengths[b, 1].max()))
                    for b in batches]
            index, count = self.shard
            local = self.batch_size // count
            batches = [b[index * local:(index + 1) * local] for b in batches]

        q = queue_mod.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def produce():
            try:
                from concurrent.futures import ThreadPoolExecutor
                fetch = self._fetch
                with ThreadPoolExecutor(self.num_workers) as pool:
                    for idx_batch, shape in zip(batches, shapes):
                        if stop.is_set():
                            return
                        items = list(pool.map(fetch,
                                              [int(i) for i in idx_batch]))
                        q.put(self.collate(items, shapes=shape)
                              if shape is not None else self.collate(items))
            except Exception as e:  # surface worker errors to the consumer
                q.put(e)
            finally:
                q.put(None)

        t = threading.Thread(target=produce, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    break
                if isinstance(item, Exception):
                    raise item
                yield item
        finally:
            stop.set()


def dataset_from_config(cfg: GradTTSConfig, split='train'):
    """Build the right dataset flavor for a config preset."""
    paths = {'train': cfg.data.train_filelist_path,
             'valid': cfg.data.valid_filelist_path,
             'test': cfg.data.test_filelist_path}[split]
    kw = dict(n_fft=cfg.data.n_fft, n_mels=cfg.data.n_feats,
              sample_rate=cfg.data.sample_rate,
              hop_length=cfg.data.hop_length, win_length=cfg.data.win_length,
              f_min=cfg.data.f_min, f_max=cfg.data.f_max,
              add_blank=cfg.data.add_blank, seed=cfg.train.seed)
    if cfg.n_spks == -1:
        spk_paths = {'train': cfg.data.train_spk_path,
                     'valid': cfg.data.valid_spk_path,
                     'test': cfg.data.test_spk_path}[split]
        return TextMelZeroSpeakerDataset(paths, spk_paths,
                                         cfg.data.cmudict_path,
                                         spk_emb_dim=cfg.spk_emb_dim, **kw)
    if cfg.n_spks > 1:
        return TextMelSpeakerDataset(paths, cfg.data.cmudict_path, **kw)
    return TextMelDataset(paths, cfg.data.cmudict_path, **kw)
