"""Property-based tests (hypothesis) for the pure-Python kernel layer:
invariants that must hold for ARBITRARY inputs, not just the corpus's
shapes — the encode/normalize/decode round trip, format renames, and
alignment metrics. These are the properties the 10^12-row pipeline
silently relies on for every row."""

from hypothesis import given, settings
from hypothesis import strategies as st

from handprint_spark.kernels import codec
from handprint_spark.kernels.decoder import decode_media_bytes
from handprint_spark.kernels.preprocess import normalize_media_bytes
from handprint_spark.kernels.textcmp import (
    levenshtein,
    relax,
    squeeze_ws,
    text_comparison,
)

# printable-ish document text: words of lowercase letters/digits joined
# by single spaces, lines joined by \n (the corpus alphabet; \f is the
# codec's page separator and is sanitized upstream by contract)
_word = st.text(alphabet="abcdefghijklmnopqrstuvwxyz0123456789", min_size=1, max_size=10)
_line = st.lists(_word, min_size=1, max_size=8).map(" ".join)
_doc = st.lists(_line, min_size=1, max_size=6).map("\n".join)


@settings(max_examples=60, deadline=None)
@given(_doc)
def test_roundtrip_preserves_text(text):
    data = codec.encode_media(text)
    out, err = normalize_media_bytes(data, None, None, None)
    assert err is None
    assert decode_media_bytes(out)[0] == text


@settings(max_examples=60, deadline=None)
@given(_doc, st.sampled_from(["png", "jpg", "tiff", "JPEG", "bmp"]))
def test_format_rename_is_text_invariant(text, fmt):
    data = codec.encode_media(text, fmt=fmt)
    info = codec.decode_media(data, verify_pixels=False)
    swapped = codec.swap_format(data, "png", info)
    if swapped is not None:
        assert decode_media_bytes(swapped)[0] == text
        assert codec.decode_media(swapped).fmt == "png"


@settings(max_examples=60, deadline=None)
@given(st.binary(min_size=0, max_size=64))
def test_garbage_bytes_become_error_values(data):
    """Arbitrary bytes must yield an error VALUE, never an exception —
    the row-vs-job error policy the extraction UDF depends on."""
    out, err = normalize_media_bytes(data, None, None, None)
    assert (out is None) == (err is not None)


@settings(max_examples=100, deadline=None)
@given(_line, _line)
def test_levenshtein_metric_properties(a, b):
    d = levenshtein(a, b)
    assert d == levenshtein(b, a)  # symmetry
    assert (d == 0) == (a == b)  # identity of indiscernibles
    assert d <= max(len(a), len(b))  # upper bound


@settings(max_examples=60, deadline=None)
@given(_doc)
def test_self_comparison_reports_zero_errors(text):
    tsv = text_comparison(text, text)
    rows = [l.split("\t") for l in tsv.splitlines()[1:]]
    data_rows = [r for r in rows if len(r) == 4 and r[0].isdigit()]
    assert all(r[0] == "0" for r in data_rows)


@settings(max_examples=100, deadline=None)
@given(st.text(alphabet=" \ta bc\n", max_size=40))
def test_squeeze_ws_idempotent(s):
    assert squeeze_ws(squeeze_ws(s)) == squeeze_ws(s)


@settings(max_examples=100, deadline=None)
@given(st.text(max_size=40))
def test_relax_idempotent(s):
    assert relax(relax(s)) == relax(s)
