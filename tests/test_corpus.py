"""Lhotse-manifest corpus reader (parity: reference data.py:274-286)."""

import gzip
import json

from gradtts_tpu.data.corpus import (
    corpus_to_filelist, load_corpus, read_cut_manifest,
)


def _cut(cid, wav, text, speaker, start=0.0, dur=2.5):
    return {
        'id': cid, 'start': start, 'duration': dur, 'channel': 0,
        'supervisions': [{'id': cid + '-sup', 'recording_id': cid,
                          'start': 0.0, 'duration': dur, 'channel': 0,
                          'text': text, 'speaker': speaker}],
        'recording': {'id': cid, 'sources': [
            {'type': 'file', 'channels': [0], 'source': wav}],
            'sampling_rate': 16000, 'num_samples': int(dur * 16000),
            'duration': dur},
        'type': 'MonoCut',
    }


def _write_manifest(path, cuts):
    with gzip.open(path, 'wt', encoding='utf-8') as f:
        for c in cuts:
            f.write(json.dumps(c) + '\n')


def test_read_cut_manifest_with_transform(tmp_path):
    p = str(tmp_path / 'x_cuts_dev.jsonl.gz')
    _write_manifest(p, [
        _cut('c1', 'audio/a.wav', 'Hello [noise] WORLD  (um) that \'s', 'spkA'),
        _cut('c2', '/abs/b.wav', 'plain text', 'spkB'),
    ])
    recs = read_cut_manifest(p, prefix_path='/data', transform=True)
    assert len(recs) == 2
    # "text": null supervision must not crash the reader
    p2 = str(tmp_path / 'x_cuts_nul.jsonl.gz')
    nul = _cut('c3', 'audio/c.wav', None, 'spkC')
    _write_manifest(p2, [nul])
    recs2 = read_cut_manifest(p2, transform=True)
    assert recs2[0].text == ''
    # TED normalizer: lowercase, brackets stripped, spaces collapsed,
    # " 's" -> "'s"
    assert recs[0].text == "hello world that's"
    assert recs[0].wav_path == '/data/audio/a.wav'
    # absolute source paths are left untouched (lhotse Path(prefix)/source)
    assert recs[1].wav_path == '/abs/b.wav'
    assert recs[0].speaker == 'spkA'
    assert recs[0].sampling_rate == 16000


def test_load_corpus_splits_and_filelist(tmp_path):
    for split in ('train', 'dev', 'test'):
        _write_manifest(str(tmp_path / f'ted_cuts_{split}.jsonl.gz'),
                        [_cut(f'{split}-1', f'{split}/u1.wav',
                              f'{split} text one', 's1'),
                         _cut(f'{split}-2', f'{split}/u2.wav',
                              f'{split} text two', 's2')])
    ds = load_corpus(str(tmp_path), prefix_path='', file_name='ted',
                     transform=False)
    assert set(ds) == {'train', 'dev', 'test'}
    assert len(ds['train']) == 2
    assert ds['dev'][0].text == 'dev text one'

    out = str(tmp_path / 'fl.txt')
    spk_ids = {}
    n = corpus_to_filelist(ds['train'], out, with_speaker=True,
                           speaker_ids=spk_ids)
    assert n == 2
    lines = open(out).read().splitlines()
    assert lines[0].endswith('|train text one|0')
    assert lines[1].endswith('|train text two|1')
    assert spk_ids == {'s1': 0, 's2': 1}
