import os

import pytest

from gradtts_tpu.text import (
    text_to_sequence, sequence_to_text, intersperse_blank, CMUDict, symbols,
    BLANK_ID,
)
from gradtts_tpu.text.numbers import normalize_numbers
from gradtts_tpu.text.symbols import SYMBOL_TO_ID
from gradtts_tpu.text.cleaners import english_cleaners

CMUDICT_PATH = os.path.join(os.path.dirname(__file__), '..', 'resources',
                            'cmu_dictionary')


def test_symbol_table_shape():
    # 1 pad + 1 special + 10 punct + 52 letters + 84 arpabet == 148
    assert len(symbols) == 148
    assert BLANK_ID == 148
    assert symbols[0] == '_'
    assert symbols[1] == '-'
    assert SYMBOL_TO_ID['a'] == 38  # 2 + 10 + 26 ('a' is first after A-Z)
    assert symbols[-1] == '@ZH'


def test_text_to_sequence_roundtrip_graphemes():
    seq = text_to_sequence('hello world!')
    assert sequence_to_text(seq) == 'hello world!'
    assert all(0 < s < len(symbols) for s in seq)


def test_curly_arpabet_passthrough():
    seq = text_to_sequence('{HH AH0 L OW1} there')
    assert sequence_to_text(seq).startswith('{HH}{AH0}{L}{OW1}'.replace('}{', ' ')[:4])
    # first four ids must be the @-prefixed arpabet ids
    assert seq[0] == SYMBOL_TO_ID['@HH']
    assert seq[1] == SYMBOL_TO_ID['@AH0']


def test_cmudict_lookup_and_substitution():
    d = CMUDict(CMUDICT_PATH)
    assert len(d) > 100000
    assert d.lookup('hello')[0] == 'HH AH0 L OW1'
    seq = text_to_sequence('hello', dictionary=d)
    want = [SYMBOL_TO_ID['@' + p] for p in ['HH', 'AH0', 'L', 'OW1']]
    assert seq == want  # trailing space stripped


def test_intersperse():
    assert intersperse_blank([1, 2, 3], 0) == [0, 1, 0, 2, 0, 3, 0]
    assert intersperse_blank([], 9) == [9]


@pytest.mark.parametrize('inp,out', [
    ('1999', 'nineteen ninety-nine'),
    ('2000', 'two thousand'),
    ('2008', 'two thousand eight'),
    ('1900', 'nineteen hundred'),
    ('1905', 'nineteen oh five'),
    ('42', 'forty-two'),
    ('100', 'one hundred'),
    ('17', 'seventeen'),
    ('$2.50', 'two dollars, fifty cents'),
    ('$1', 'one dollar'),
    # reference pipeline: '3.14' -> '3 point 14' -> per-number expansion
    ('3.14', 'three point fourteen'),
    ('21st', 'twenty-first'),
    ('3rd', 'third'),
    ('12,345', 'twelve thousand, three hundred forty-five'),
    ('£5', '5 pounds'.replace('5', 'five')),
])
def test_normalize_numbers(inp, out):
    assert normalize_numbers(inp) == out


def test_english_cleaners():
    assert english_cleaners('Mr.  Müller   bought 2 cars.') == \
        'mister muller bought two cars.'
