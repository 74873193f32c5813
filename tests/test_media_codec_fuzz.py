"""Hypothesis fuzz for the media codecs: the decode paths promise
None-not-raise on arbitrary/corrupt bytes (a 100 TB corpus always
contains truncated and damaged payloads; an Arrow stage that throws on
one row kills the task and, after retries, the job)."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from mysoftware_nocnetintel_spark.operators import audio as AU
from mysoftware_nocnetintel_spark.operators import video as V
from mysoftware_nocnetintel_spark.operators.multimodal import (
    dhash64_bytes,
    ahash64_bytes,
)

_BYTES = st.binary(min_size=0, max_size=400)


@given(_BYTES)
@settings(max_examples=300, deadline=None)
def test_wav_decode_never_raises(data):
    out = AU.wav_decode(data)
    assert out is None or out[1] > 0
    assert AU.afp64_bytes(data) is None or out is not None


@given(_BYTES)
@settings(max_examples=300, deadline=None)
def test_vpng_parsers_never_raise(data):
    head = V.vpng_header(data)
    offs = V.vpng_frame_offsets(data)
    assert head is None or (head[0] >= 0 and head[1] >= 0)
    assert offs is None or all(
        0 <= o and o + ln <= len(data) for o, ln in offs
    )
    assert V.vpng_decode_frame(data, 0) is None or offs is not None
    assert V.vhash64_bytes(data) is None or offs is not None


@given(_BYTES)
@settings(max_examples=300, deadline=None)
def test_image_hashes_never_raise(data):
    for h in (dhash64_bytes(data), ahash64_bytes(data)):
        assert h is None or isinstance(h, int)


@given(st.binary(min_size=0, max_size=200), st.integers(0, 3))
@settings(max_examples=200, deadline=None)
def test_truncated_valid_containers_fail_closed(prefix, idx):
    """A VALID container truncated at any byte must parse as None or as a
    strictly consistent shorter seek table — never raise, never return
    offsets past the data."""
    frames = V._synth_frames("fuzz", 4, 8)
    blob = V.vpng_encode(frames, 24.0)
    cut = len(prefix) % len(blob)
    data = blob[:cut] + prefix
    offs = V.vpng_frame_offsets(data)
    assert offs is None or all(o + ln <= len(data) for o, ln in offs)
    V.vpng_decode_frame(data, idx)  # must not raise


@given(st.binary(min_size=0, max_size=200))
@settings(max_examples=200, deadline=None)
def test_truncated_wav_fails_closed(prefix):
    blob = AU.wav_encode(AU._synth_samples("fuzz", 4000, 0.1), 4000)
    cut = len(prefix) % len(blob)
    AU.wav_decode(blob[:cut] + prefix)  # must not raise
