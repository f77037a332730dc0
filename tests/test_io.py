"""Disk-backed streaming (pyloo_tpu.io) must reproduce the in-memory path.

Covers both readers (native C++ prefetcher and the numpy-memmap fallback),
.npy metadata validation, tail-chunk padding, the 3-D (obs, chain, draw)
layout, dtype casting, checkpoint resume from a file source, and mesh
sharding of file-fed chunks.
"""

import os
import warnings

import jax.numpy as jnp
import numpy as np
import pytest
from numpy.testing import assert_allclose, assert_array_equal

import pyloo_tpu as pl
from pyloo_tpu._native import load_library
from pyloo_tpu.io import NpyLogLik

N_OBS, N_DRAWS = 123, 61  # deliberately not multiples of any chunk size

HAVE_NATIVE = load_library() is not None
READERS = [False] + ([True] if HAVE_NATIVE else [])


@pytest.fixture(scope="module")
def ll_matrix():
    rng = np.random.default_rng(7)
    return rng.normal(-1.0, 0.8, size=(N_OBS, N_DRAWS))


@pytest.fixture(scope="module")
def ll_file(ll_matrix, tmp_path_factory):
    path = tmp_path_factory.mktemp("io") / "ll.npy"
    np.save(path, ll_matrix)
    return str(path)


def _fn(ll_dev):
    def log_lik_fn(idx):
        return ll_dev[idx]

    return log_lik_fn


def test_native_library_builds():
    # The build environment ships g++; the native reader must be the
    # default (the fallback is for compiler-less installs).
    assert HAVE_NATIVE


@pytest.mark.parametrize("native", READERS)
@pytest.mark.parametrize("chunk", [16, 40, 123, 200])
def test_loo_from_file_matches_streaming(ll_matrix, ll_file, native, chunk):
    ref = pl.loo_streaming(
        _fn(jnp.asarray(ll_matrix)), N_OBS, N_DRAWS,
        chunk_size=chunk, dtype=jnp.float64, pointwise=True,
    )
    res = pl.loo_from_file(
        ll_file, native=native, chunk_size=chunk, dtype=jnp.float64,
        pointwise=True,
    )
    assert res["elpd_loo"] == ref["elpd_loo"]
    assert res["p_loo"] == ref["p_loo"]
    assert_array_equal(np.asarray(res.loo_i), np.asarray(ref.loo_i))
    assert_array_equal(np.asarray(res.pareto_k), np.asarray(ref.pareto_k))


@pytest.mark.parametrize("native", READERS)
def test_waic_from_file(ll_matrix, ll_file, native):
    ref = pl.waic_streaming(
        _fn(jnp.asarray(ll_matrix)), N_OBS, N_DRAWS,
        chunk_size=40, dtype=jnp.float64,
    )
    res = pl.waic_from_file(
        ll_file, native=native, chunk_size=40, dtype=jnp.float64
    )
    assert res["elpd_waic"] == ref["elpd_waic"]
    assert res["p_waic"] == ref["p_waic"]


@pytest.mark.parametrize("native", READERS)
def test_source_reads_match_file(ll_matrix, ll_file, native):
    src = NpyLogLik(ll_file, native=native)
    assert (src.n_obs, src.n_draws) == (N_OBS, N_DRAWS)
    with src:
        a = src.read_rows(0, 40)
        b = src.read_rows(40, 40)
        assert_array_equal(a, ll_matrix[:40])
        assert_array_equal(b, ll_matrix[40:80])
        # tail chunk: rows past EOF repeat the last file row
        tail = src.read_rows(120, 40)
        assert_array_equal(tail[:3], ll_matrix[120:])
        assert_array_equal(tail[3:], np.broadcast_to(ll_matrix[-1], (37, N_DRAWS)))


@pytest.mark.parametrize("native", READERS)
def test_out_of_order_reads(ll_file, ll_matrix, native):
    # A checkpoint resume starts mid-file; backwards seeks must also work.
    with NpyLogLik(ll_file, native=native) as src:
        c2 = src.read_rows(64, 32)
        c0 = src.read_rows(0, 32)
        c1 = src.read_rows(32, 32)
    assert_array_equal(c0, ll_matrix[:32])
    assert_array_equal(c1, ll_matrix[32:64])
    assert_array_equal(c2, ll_matrix[64:96])


@pytest.mark.skipif(not HAVE_NATIVE, reason="no C++ compiler")
@pytest.mark.parametrize("depth", [1, 2, 4])
def test_forward_skip_never_deadlocks(ll_file, ll_matrix, depth):
    # Skipping chunks FORWARD inside the prefetch window used to be able to
    # wedge the ring two ways: (a) the producer blocked on a stale full slot
    # between the cursor and the requested chunk while the consumer waited
    # for that chunk to appear; (b) at small depth, the requested chunk and
    # the chunk mid-pread alias the SAME ring slot (depth=1: any skip-by-one,
    # like consume 0 then request 2 while 1 is in flight), so the "on track"
    # wait admitted a chunk that could never land.  The reader must detect
    # both undeliverable paths and reset instead.  Run every pattern at every
    # ring depth under a watchdog so a regression fails, not hangs.
    import threading

    chunk_rows = 8  # 16 chunks of the 123-row file
    n_chunks = -(-N_OBS // chunk_rows)
    patterns = [
        [0, 2, 4],                    # consume-then-skip-by-one: at depth=1
                                      # chunk 2 aliases in-flight chunk 1
        [0, 1, 2, 3, 6, 10],          # skip inside the window, twice
        [0, 3, 1, 7, 2, 9, 15],       # interleaved skips + backward seeks
        [2, 5, 8, 11, 14],            # stride-3 walk, always skipping
        list(range(0, n_chunks, 2)),  # stride-2 full pass
        [0, 1 + depth, 2 + depth],    # skip landing exactly depth past the
                                      # in-flight chunk (same-slot alias)
    ]
    failures: list[str] = []

    def run():
        for pat in patterns:
            for _ in range(10):  # repeat: slot aliasing needs the pread
                # to still be in flight at request time, a timing race
                with NpyLogLik(ll_file, depth=depth, native=True) as src:
                    for c in pat:
                        got = src.read_rows(c * chunk_rows, chunk_rows)
                        lo = c * chunk_rows
                        hi = min(lo + chunk_rows, N_OBS)
                        if not np.array_equal(
                            got[: hi - lo], ll_matrix[lo:hi]
                        ):
                            failures.append(
                                f"pattern {pat}: wrong data at {c}"
                            )
                            return

    t = threading.Thread(target=run, daemon=True)
    t.start()
    t.join(timeout=120.0)
    assert not t.is_alive(), (
        f"native reader deadlocked on a forward skip at depth={depth}"
    )
    assert not failures, failures


@pytest.mark.skipif(not HAVE_NATIVE, reason="no C++ compiler")
def test_skip_while_in_flight_depth1(tmp_path_factory):
    # Deterministic repro of the depth=1 slot-aliasing deadlock: with one
    # ring slot, consume chunk 0, give the producer time to CLAIM chunk 1
    # (cursor→2, in_flight=1), then request chunk 2 mid-pread.  The buggy
    # on-track test (cursor == chunk) waited; chunk 1 then landed in the only
    # slot and the producer blocked on cv_freed — permanent wedge.  Large
    # chunks (4 MB) widen the in-flight window so the race fires reliably;
    # verified to deadlock the pre-fix reader on every run of 40 trials.
    import threading
    import time

    row_elems, chunk_rows, n_rows = 8192, 64, 64 * 12  # 4 MB chunks
    path = tmp_path_factory.mktemp("ddl") / "big.npy"
    data = np.arange(n_rows * row_elems, dtype=np.float64)
    np.save(path, data.reshape(n_rows, row_elems))

    def run():
        for _ in range(40):
            with NpyLogLik(str(path), depth=1, native=True) as src:
                for c in [0, 2, 4, 6, 8]:
                    got = src.read_rows(c * chunk_rows, chunk_rows)
                    assert got[0, 0] == c * chunk_rows * row_elems
                    time.sleep(2e-4)  # let the producer claim the next chunk

    t = threading.Thread(target=run, daemon=True)
    t.start()
    t.join(timeout=60.0)
    assert not t.is_alive(), (
        "native reader deadlocked: depth=1 skip while the aliased chunk"
        " was in flight"
    )


def test_three_dim_layout(tmp_path):
    # (n_obs, n_chains, n_draws) flattens chains into draws, matching the
    # in-memory __sample__ stacking (obs-major file layouts keep rows
    # contiguous on disk).
    rng = np.random.default_rng(3)
    ll3 = rng.normal(size=(50, 4, 25))
    path = tmp_path / "ll3.npy"
    np.save(path, ll3)
    res = pl.loo_from_file(str(path), chunk_size=16, dtype=jnp.float64)
    ref = pl.loo_streaming(
        _fn(jnp.asarray(ll3.reshape(50, 100))), 50, 100,
        chunk_size=16, dtype=jnp.float64,
    )
    assert res["elpd_loo"] == ref["elpd_loo"]
    assert res["n_samples"] == 100


def test_float32_file_float64_compute(tmp_path, ll_matrix):
    path = tmp_path / "ll32.npy"
    np.save(path, ll_matrix.astype(np.float32))
    res = pl.loo_from_file(str(path), chunk_size=40, dtype=jnp.float64)
    ref = pl.loo_streaming(
        _fn(jnp.asarray(ll_matrix.astype(np.float32), dtype=jnp.float64)),
        N_OBS, N_DRAWS, chunk_size=40, dtype=jnp.float64,
    )
    assert_allclose(res["elpd_loo"], ref["elpd_loo"], rtol=1e-12)


def test_metadata_validation(tmp_path):
    bad = tmp_path / "bad.npy"
    np.save(bad, np.zeros((4, 5), dtype=np.int32))
    with pytest.raises(ValueError, match="float32/float64"):
        NpyLogLik(str(bad))
    np.save(bad, np.zeros(7))
    with pytest.raises(ValueError, match="n_obs, n_draws"):
        NpyLogLik(str(bad))
    np.save(bad, np.asfortranarray(np.zeros((4, 5))))
    with pytest.raises(ValueError, match="C-order"):
        NpyLogLik(str(bad))


def test_n_obs_exceeding_file_rejected(ll_file):
    with NpyLogLik(ll_file) as src:
        with pytest.raises(ValueError, match="exceeds"):
            pl.loo_streaming(src, N_OBS + 1, N_DRAWS, chunk_size=40)


def test_misaligned_read_rejected(ll_file):
    with NpyLogLik(ll_file) as src:
        with pytest.raises(ValueError, match="multiple"):
            src.read_rows(7, 40)


def test_checkpoint_resume_from_file(ll_matrix, ll_file, tmp_path):
    ckpt = tmp_path / "loo.ckpt"

    class Stop(Exception):
        pass

    def bomb(done, total):
        if done == 2:
            raise Stop

    with pytest.raises(Stop):
        pl.loo_from_file(
            ll_file, chunk_size=16, dtype=jnp.float64, pointwise=True,
            checkpoint_path=str(ckpt), checkpoint_every=1, on_chunk=bomb,
        )
    assert ckpt.exists()
    res = pl.loo_from_file(
        ll_file, chunk_size=16, dtype=jnp.float64, pointwise=True,
        checkpoint_path=str(ckpt), checkpoint_every=1,
    )
    assert not ckpt.exists()
    ref = pl.loo_streaming(
        _fn(jnp.asarray(ll_matrix)), N_OBS, N_DRAWS,
        chunk_size=16, dtype=jnp.float64, pointwise=True,
    )
    assert res["elpd_loo"] == ref["elpd_loo"]
    assert_array_equal(np.asarray(res.loo_i), np.asarray(ref.loo_i))


def test_sharded_file_streaming(ll_matrix, ll_file):
    import jax
    from jax.sharding import Mesh

    mesh = Mesh(np.asarray(jax.devices()[:8]), axis_names=("obs",))
    res = pl.loo_from_file(
        ll_file, chunk_size=40, dtype=jnp.float64, mesh=mesh
    )
    ref = pl.loo_streaming(
        _fn(jnp.asarray(ll_matrix)), N_OBS, N_DRAWS,
        chunk_size=40, dtype=jnp.float64,
    )
    assert_allclose(res["elpd_loo"], ref["elpd_loo"], rtol=1e-12)


def test_subsample_from_source(ll_matrix, ll_file):
    idx = np.sort(np.random.default_rng(5).choice(N_OBS, 30, replace=False))
    with NpyLogLik(ll_file) as src:
        res = pl.loo_subsample_streaming(
            src, N_OBS, N_DRAWS, observations=idx,
            chunk_size=40, dtype=jnp.float64,
        )
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        ref = pl.loo_subsample_streaming(
            _fn(jnp.asarray(ll_matrix)), N_OBS, N_DRAWS, observations=idx,
            chunk_size=40, dtype=jnp.float64,
        )
    assert_allclose(res["elpd_loo"], ref["elpd_loo"], rtol=1e-12)


def test_fallback_forced_by_env(ll_file, monkeypatch):
    import pyloo_tpu._native as native_mod

    monkeypatch.setattr(native_mod, "_lib", False)
    monkeypatch.setenv("PYLOO_TPU_NO_NATIVE", "1")
    src = NpyLogLik(ll_file)
    assert not src.is_native
    with pytest.raises(RuntimeError, match="native=True"):
        NpyLogLik(ll_file, native=True)


@pytest.mark.skipif(not HAVE_NATIVE, reason="no C++ compiler")
def test_sequential_pass_reads_each_chunk_once(ll_file):
    # Regression: requesting the chunk currently mid-pread used to look
    # "off track" (the producer cursor had already advanced past it) and
    # reset the pipeline, re-reading every chunk whenever the consumer
    # outpaced the disk.  A sequential full pass must issue exactly
    # n_chunks preads.
    chunk = 32
    n_chunks = -(-N_OBS // chunk)
    for trial in range(20):  # many trials to hit the read-in-flight race
        with NpyLogLik(ll_file, native=True, depth=3) as src:
            for c in range(n_chunks):
                src.read_rows(c * chunk, chunk)
            assert src.reads_issued == n_chunks, (
                f"trial {trial}: {src.reads_issued} preads for"
                f" {n_chunks} chunks"
            )
