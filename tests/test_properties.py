"""Property-based tests (hypothesis) for the pure-function kernels.

Spark-independent properties only — each example runs in microseconds,
so hypothesis can sweep shapes and values far beyond the fixed-seed
parity tests: codec round-trips over arbitrary images/signals, and the
streaming indicator recurrence against pandas' own EWM semantics.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st
from hypothesis.extra.numpy import arrays

from marketdatapipeline_spark.multimodal.codecs import (
    decode_png,
    decode_wav,
    encode_png,
    encode_wav,
    resize_nearest,
)
from marketdatapipeline_spark.streaming.stateful import (
    _FRESH_STATE,
    _coeffs,
    _scan_closes,
)


@settings(max_examples=40, deadline=None)
@given(
    arr=arrays(
        dtype=np.uint8,
        shape=st.tuples(
            st.integers(1, 24), st.integers(1, 24), st.sampled_from([1, 2, 3, 4])
        ),
    )
)
def test_png_roundtrip_property(arr):
    assert np.array_equal(decode_png(encode_png(arr)), arr)


@settings(max_examples=40, deadline=None)
@given(
    samples=arrays(
        dtype=np.int16,
        shape=st.tuples(st.integers(1, 500), st.sampled_from([1, 2])),
    ),
    rate=st.sampled_from([8000, 16000, 44100]),
)
def test_wav_roundtrip_property(samples, rate):
    pcm, got_rate = decode_wav(encode_wav(samples, rate))
    assert got_rate == rate
    assert np.array_equal(pcm, samples)


@settings(max_examples=40, deadline=None)
@given(
    arr=arrays(
        dtype=np.uint8,
        shape=st.tuples(st.integers(1, 16), st.integers(1, 16), st.just(3)),
    ),
    w=st.integers(1, 20),
    h=st.integers(1, 20),
)
def test_resize_nearest_properties(arr, w, h):
    out = resize_nearest(arr, w, h)
    assert out.shape == (h, w, 3)
    # every output pixel is an input pixel (nearest-neighbor invariant)
    in_px = {tuple(p) for p in arr.reshape(-1, 3)}
    assert all(tuple(p) in in_px for p in out.reshape(-1, 3))
    # identity resize is exact
    assert np.array_equal(resize_nearest(arr, arr.shape[1], arr.shape[0]), arr)


@settings(max_examples=30, deadline=None)
@given(
    closes=st.lists(
        st.floats(min_value=1.0, max_value=1e4, allow_nan=False), min_size=2, max_size=300
    )
)
def test_scan_closes_matches_pandas_ewm(closes):
    """The streaming state-handler recurrence == pandas semantics:
    MACD from adjust=True EMAs, Wilder RSI from adjust=False EWMs over
    gains/losses (seeded at the first delta) — the exact formulation
    the batch path (features/ewm.py) and the reference replicate."""
    vals, _ = _scan_closes(closes, _FRESH_STATE, _coeffs(14, 12, 26, 9))
    got = pd.DataFrame(vals, columns=["rsi", "macd", "signal", "hist"])

    s = pd.Series(closes, dtype="float64")
    ema12 = s.ewm(span=12, adjust=True).mean()
    ema26 = s.ewm(span=26, adjust=True).mean()
    macd = ema12 - ema26
    signal = macd.ewm(span=9, adjust=True).mean()
    delta = s.diff()
    gain = delta.clip(lower=0.0)
    loss = (-delta).clip(lower=0.0)
    # adjust=False seeded at the FIRST VALID delta (index 1)
    gain_ewm = gain.iloc[1:].ewm(span=14, adjust=False).mean()
    loss_ewm = loss.iloc[1:].ewm(span=14, adjust=False).mean()
    rs = gain_ewm / (loss_ewm + 1e-10)
    rsi = 100.0 - 100.0 / (1.0 + rs)

    assert np.allclose(got["macd"], macd, rtol=0, atol=1e-9 * max(closes))
    assert np.allclose(got["signal"], signal, rtol=0, atol=1e-9 * max(closes))
    assert np.isnan(got["rsi"].iloc[0])
    assert np.allclose(got["rsi"].iloc[1:], rsi, rtol=0, atol=1e-8)


@settings(max_examples=30, deadline=None)
@given(
    closes=st.lists(
        st.floats(min_value=1.0, max_value=1e4, allow_nan=False), min_size=3, max_size=200
    ),
    split=st.integers(1, 198),
)
def test_scan_closes_state_resumption(closes, split):
    """Scanning [a; b] in one pass == scanning a, carrying the state,
    then scanning b — the property micro-batch processing relies on."""
    split = min(split, len(closes) - 1)
    coeffs = _coeffs(14, 12, 26, 9)
    whole, st_whole = _scan_closes(closes, _FRESH_STATE, coeffs)
    first, st_mid = _scan_closes(closes[:split], _FRESH_STATE, coeffs)
    second, st_end = _scan_closes(closes[split:], st_mid, coeffs)
    joined = first + second
    assert len(joined) == len(whole)
    for (a, b) in zip(joined, whole):
        for x, y in zip(a, b):
            assert (np.isnan(x) and np.isnan(y)) or x == y
    assert st_end == st_whole


@settings(max_examples=30, deadline=None)
@given(
    data=arrays(
        dtype=np.float64,
        shape=st.tuples(st.integers(20, 60), st.sampled_from([8, 16])),
        elements=st.floats(-5, 5, allow_nan=False),
    ),
    m=st.sampled_from([2, 4]),
)
def test_pq_adc_equals_reconstruction(data, m):
    """ADC lookup-table scoring must equal the explicit dot product
    against the reconstructed (decoded) vector — the identity the PQ
    search path relies on."""
    from marketdatapipeline_spark.similarity.pq import (
        adc_tables,
        encode,
        train_codebooks,
    )

    books = train_codebooks(data, m=m, k=8, seed=1)
    codes = encode(data, books)
    q = data[0]
    lut, cn2 = adc_tables(q, books)
    mseq = np.arange(books.shape[0])
    dsub = data.shape[1] // m
    for i in range(min(5, len(data))):
        recon = np.concatenate(
            [books[s, codes[i, s]] for s in range(books.shape[0])]
        )
        qdot_lut = lut[mseq, codes[i]].sum()
        n2_lut = cn2[mseq, codes[i]].sum()
        assert abs(qdot_lut - recon @ q) < 1e-9
        assert abs(n2_lut - recon @ recon) < 1e-9
        assert len(recon) == dsub * m


@settings(max_examples=25, deadline=None)
@given(
    st.lists(
        st.integers(min_value=-2, max_value=2), min_size=2, max_size=40
    )
)
def test_tick_sign_carry_matches_python_loop(spark, steps):
    """The two-stage tick-rule sign (lag -> last-ignorenulls carry)
    equals the obvious sequential loop for any price path, including
    flat stretches and leading unchanged prices."""
    import pandas as pd

    from marketdatapipeline_spark.operators.liquidity import _with_tick_sign

    prices = [100.0]
    for s in steps:
        prices.append(prices[-1] + s)
    rows = [
        ("X", pd.Timestamp("2024-01-01") + pd.Timedelta(hours=i), i, p)
        for i, p in enumerate(prices)
    ]
    df = spark.createDataFrame(rows, ["symbol", "datetime", "bar_id", "close"])
    got = [
        r["_sgn"]
        for r in _with_tick_sign(
            df, "close", "symbol", ("datetime", "bar_id"), []
        )
        .orderBy("datetime")
        .collect()
    ]
    want, last = [], None
    prev = None
    for p in prices:
        if prev is None:
            want.append(None)
        else:
            d = p - prev
            if d > 0:
                last = 1.0
            elif d < 0:
                last = -1.0
            want.append(last)
        prev = p
    assert got == want


@settings(max_examples=8, deadline=None)  # ~1.9 s/example (two
# Spark jobs each); 8 keeps the shape space covered without owning
# the suite's wall clock
@given(
    st.lists(
        st.lists(
            st.sampled_from(["nav bar", "footer", "alpha", "beta", "gamma", ""]),
            min_size=1,
            max_size=6,
        ),
        min_size=2,
        max_size=8,
    )
)
def test_boilerplate_removal_idempotent(spark, doc_lines):
    """clean(clean(x)) == clean(x): removal strips whole line classes,
    so remaining doc frequencies never change and a second pass is a
    no-op — for ANY corpus shape."""
    from marketdatapipeline_spark.textops.corpus import (
        remove_boilerplate_lines,
    )

    docs = [(i, "\n".join(lines)) for i, lines in enumerate(doc_lines)]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    once = remove_boilerplate_lines(df, max_doc_freq=1).select(
        "doc_id", "text"
    )
    twice = remove_boilerplate_lines(once, max_doc_freq=1).select(
        "doc_id", "text"
    )
    a = {r["doc_id"]: r["text"] for r in once.collect()}
    b = {r["doc_id"]: r["text"] for r in twice.collect()}
    assert a == b


@settings(max_examples=30, deadline=None)
@given(
    toks=st.lists(st.integers(0, 200), min_size=1, max_size=120),
    cap=st.integers(8, 128),
    buckets=st.integers(1, 8),
)
def test_next_fit_kernel_properties(toks, cap, buckets):
    """The pack_sequences per-bucket walk, exercised as a pure
    function over arbitrary token lists: no bin overflow, offsets are
    the running fill, bins are dense from 0 and never left empty, and
    oversized docs sit alone truncated."""
    from marketdatapipeline_spark.textops.corpus import next_fit_walk

    bins, offs = next_fit_walk(toks, cap)
    assert bins[0] == 0 and offs[0] == 0
    fills: dict[int, int] = {}
    for t, b, o in zip(toks, bins, offs):
        assert o == fills.get(b, 0)  # offset IS the running fill
        fills[b] = fills.get(b, 0) + min(t, cap)
    assert all(v <= cap for v in fills.values())  # never overflows
    assert sorted(fills) == list(range(len(fills)))  # dense, none empty
    for t, b in zip(toks, bins):
        if t > cap:  # oversized -> shares its bin only with
            # zero-token docs (fill + 0 <= cap legally joins, in both
            # the kernel and the oracle walk)
            assert all(
                t2 == 0 for t2, b2 in zip(toks, bins) if b2 == b and t2 != t
            ) and sum(1 for t2, b2 in zip(toks, bins) if b2 == b and t2 > cap) == 1


def test_next_fit_zero_token_first_row():
    """A zero-effective-token FIRST row (empty text: no BPE matches)
    must open bin 0 at offset 0 — the oracle's recursive CTE pins the
    first bucket row there unconditionally. Expectations derived by
    hand, NOT by mirroring the kernel: [0,5,0] with cap 8 packs as
    bin 0 throughout at offsets 0,0,5."""
    from marketdatapipeline_spark.textops.corpus import next_fit_walk

    bins, offs = next_fit_walk([0, 5, 0], 8)
    assert bins == [0, 0, 0]
    assert offs == [0, 0, 5]
    # zero-token doc after an exactly-full bin stays in that bin
    bins, offs = next_fit_walk([8, 0, 3], 8)
    assert bins == [0, 0, 1]
    assert offs == [0, 8, 0]
    # all-zero corpus: one bin, all at offset 0
    bins, offs = next_fit_walk([0, 0, 0], 8)
    assert bins == [0, 0, 0]
    assert offs == [0, 0, 0]
