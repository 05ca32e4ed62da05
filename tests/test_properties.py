"""Property-based tests (hypothesis) for the pure-Python kernels."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from newscrawler_spark import codecs, datagen
from newscrawler_spark.urlnorm import canonical_host_py, canonicalize_py
from newscrawler_spark.xxh64 import xxh64

hosts = st.from_regex(r"[a-z][a-z0-9]{0,10}(\.[a-z][a-z0-9]{1,6}){1,2}", fullmatch=True)
paths = st.from_regex(r"(/[a-zA-Z0-9_\-]{0,8}){0,4}", fullmatch=True)
params = st.lists(
    st.from_regex(r"[a-z]{1,5}=[a-zA-Z0-9]{0,6}", fullmatch=True), max_size=4
)


@st.composite
def urls(draw):
    scheme = draw(st.sampled_from(["http", "https", "HTTP", "HTTPS"]))
    www = draw(st.sampled_from(["", "www.", "WWW."]))
    host = draw(hosts)
    port = draw(st.sampled_from(["", ":80", ":443", ":8080"]))
    path = draw(paths)
    qs = draw(params)
    frag = draw(st.sampled_from(["", "#x", "#frag-1"]))
    q = ("?" + "&".join(qs)) if qs else ""
    return f"{scheme}://{www}{host}{port}{path}{q}{frag}"


@given(urls())
@settings(max_examples=200, deadline=None)
def test_canonicalize_idempotent(u):
    c = canonicalize_py(u)
    assert canonicalize_py(c) == c


@given(urls())
@settings(max_examples=200, deadline=None)
def test_canonical_host_is_lower_and_unwww(u):
    h = canonical_host_py(u)
    assert h == h.lower()
    assert not h.startswith("www.")


@given(urls(), st.sampled_from(["/", "?utm_source=x", "#tail"]))
@settings(max_examples=200, deadline=None)
def test_dirty_suffixes_collapse(u, suffix):
    # a suffix is only a *variant* of u when it attaches to the component
    # it claims to be: '/' appended after '?q=' edits the query, '?' after
    # '#' lands in the fragment — those are different URLs, not variants
    if "#" in u or ("?" in u and suffix in ("/", "?utm_source=x")):
        return
    assert canonicalize_py(u + suffix) == canonicalize_py(u)


@given(st.binary(min_size=0, max_size=64))
@settings(max_examples=300, deadline=None)
def test_xxh64_in_signed_range_and_deterministic(data):
    h1 = xxh64(data)
    h2 = xxh64(data)
    assert h1 == h2
    assert -(2**63) <= h1 < 2**63


@given(st.binary(min_size=1, max_size=40), st.integers(0, 2**32 - 1))
@settings(max_examples=200, deadline=None)
def test_xxh64_seed_sensitivity(data, seed):
    # different seeds should virtually never collide on the same input
    if seed != 42:
        assert xxh64(data, seed) != xxh64(data, 42) or len(data) == 0


@given(
    st.integers(1, 40),
    st.integers(1, 40),
    st.integers(0, 2**32 - 1),
    st.sampled_from(["ppm", "bmp"]),
)
@settings(max_examples=60, deadline=None)
def test_lossless_roundtrip_property(w, h, seed, fmt):
    rng = np.random.default_rng(seed)
    arr = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    assert np.array_equal(codecs.decode(codecs.encode(arr, fmt), fmt), arr)


@given(st.integers(1, 40), st.integers(1, 40), st.integers(0, 2**32 - 1))
@settings(max_examples=60, deadline=None)
def test_qpng_error_bound_property(w, h, seed):
    rng = np.random.default_rng(seed)
    arr = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    dec = codecs.decode_qpng(codecs.encode_qpng(arr))
    assert np.abs(dec.astype(int) - arr.astype(int)).max() <= codecs.QPNG_STEP
    assert codecs.psnr(arr, dec) >= 40.0


@given(st.integers(0, 10_000))
@settings(max_examples=50, deadline=None)
def test_payload_row_partitioning_invariant(i):
    # the row is a pure function of (seed, i): regenerating twice matches
    assert datagen.payload_row(i, 42) == datagen.payload_row(i, 42)


@given(st.integers(-(2**63), 2**63 - 1))
@settings(max_examples=200, deadline=None)
def test_fetch_status_is_valid_code(h):
    assert datagen.fetch_status(h, 42) in (200, 403, 429)
