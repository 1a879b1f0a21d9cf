from greenocr_ray.vocab import (
    BLANK_INDEX,
    CHAR_TO_IDX,
    VOCAB,
    ctc_greedy_decode,
    encode_text,
    indices_to_text,
    normalize_whitespace,
)


def test_blank_at_zero():
    assert BLANK_INDEX == 0
    assert VOCAB[0] == "<blank>"
    # chars indexed from 1 (exe_t.py:95)
    assert min(CHAR_TO_IDX.values()) == 1


def test_encode_drops_oov():
    # silent OOV drop (exe_t.py:112-114)
    assert encode_text("a☃b") == encode_text("ab")


def test_decode_encode_roundtrip():
    for s in ["hello World 42!", "a", "x y z", "Mixed, punct.; (ok)"]:
        assert indices_to_text(encode_text(s)) == s


def test_ctc_collapse():
    # collapse repeats, drop blanks (exe_t.py:420-427)
    assert ctc_greedy_decode([0, 5, 5, 0, 5, 7, 0, 0]) == [5, 5, 7]
    assert ctc_greedy_decode([]) == []
    assert ctc_greedy_decode([0, 0]) == []


def test_normalize_whitespace():
    assert normalize_whitespace("  a \t b\n\nc ") == "a b c"
