"""Cold-start control (pyloo_tpu.warmup): AOT warmup + compilation cache.

The warmup contract: after pl.warmup(geometry), a real loo_streaming call
with the same geometry must not trace/compile the heavy chunk-step programs
again (only the user's own generator).  Verified by counting retraces of the
module-level jitted chunk steps.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import importlib

import pyloo_tpu as pl
from pyloo_tpu import streaming as streaming_mod

# `pl.warmup` is the function; the module is shadowed by the export
warmup_mod = importlib.import_module("pyloo_tpu.warmup")

N_OBS, N_DRAWS = 512, 200


def _cache_sizes():
    """(_accumulate_chunk, _accumulate_chunk_tiled) jit cache entry counts."""
    return (
        streaming_mod._accumulate_chunk._cache_size(),
        streaming_mod._accumulate_chunk_tiled._cache_size(),
    )


def test_warmup_precompiles_chunk_programs():
    res = pl.warmup(N_OBS, N_DRAWS, chunk_size=128, dtype=jnp.float64)
    assert res["chunk_size"] == 128
    before = _cache_sizes()

    ll = jnp.asarray(
        np.random.default_rng(0).normal(-1, 0.5, size=(N_OBS, N_DRAWS))
    )
    out = pl.loo_streaming(
        lambda idx: ll[idx], N_OBS, N_DRAWS, chunk_size=128,
        dtype=jnp.float64,
    )
    assert np.isfinite(float(out["elpd_loo"]))
    # the heavy chunk-step programs were already compiled by warmup: the
    # real call must not have added cache entries
    assert _cache_sizes() == before


def test_warmup_matches_unwarmed_result():
    ll = np.random.default_rng(1).normal(-1, 0.5, size=(200, 64))
    dev = jnp.asarray(ll)
    ref = pl.loo_streaming(
        lambda idx: dev[idx], 200, 64, chunk_size=64, dtype=jnp.float64,
        pointwise=True,
    )
    pl.warmup(200, 64, chunk_size=64, dtype=jnp.float64, pointwise=True)
    res = pl.loo_streaming(
        lambda idx: dev[idx], 200, 64, chunk_size=64, dtype=jnp.float64,
        pointwise=True,
    )
    assert res["elpd_loo"] == ref["elpd_loo"]
    np.testing.assert_array_equal(
        np.asarray(res.loo_i), np.asarray(ref.loo_i)
    )


@pytest.mark.parametrize("kwargs", [
    {"method": "sis"},
    {"mixture": True},
    {"source": True},
    {"pointwise": True},
])
def test_warmup_variants_run(kwargs):
    res = pl.warmup(256, 50, chunk_size=64, dtype=jnp.float64, **kwargs)
    assert res["wall_s"] > 0
    assert res["n_draws"] == 50


def test_warmup_resolves_default_geometry():
    # no chunk_size: must resolve the same geometry loo_streaming would
    res = pl.warmup(1000, 40, dtype=jnp.float64)
    expected, _ = streaming_mod._resolve_chunk(
        None, 1000, 40, jnp.dtype(jnp.float64), None
    )
    assert res["chunk_size"] == expected


def test_axon_detection_env(monkeypatch):
    monkeypatch.setenv("JAX_PLATFORMS", "axon")
    assert warmup_mod._running_under_axon()
    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    # backend may be initialized as cpu in this process; never axon here
    assert not warmup_mod._running_under_axon()


def test_cache_mode_off_and_axon_auto(monkeypatch):
    monkeypatch.setattr(warmup_mod, "_cache_applied", False)
    monkeypatch.setenv("PYLOO_TPU_COMPILE_CACHE", "off")
    assert not warmup_mod._apply_compilation_cache()
    monkeypatch.setenv("PYLOO_TPU_COMPILE_CACHE", "auto")
    monkeypatch.setenv("JAX_PLATFORMS", "axon")
    assert not warmup_mod._apply_compilation_cache()
    assert not warmup_mod._cache_applied


def test_cache_mode_on_sets_jax_config(monkeypatch, tmp_path):
    monkeypatch.setattr(warmup_mod, "_cache_applied", False)
    monkeypatch.setenv("PYLOO_TPU_COMPILE_CACHE", "on")
    monkeypatch.setenv("PYLOO_TPU_CACHE_DIR", str(tmp_path / "xla"))
    assert warmup_mod._apply_compilation_cache()
    assert jax.config.jax_compilation_cache_dir == str(tmp_path / "xla")
    assert os.path.isdir(tmp_path / "xla")
    # idempotent
    assert warmup_mod._apply_compilation_cache()


def test_rcparam_validation():
    with pytest.raises(ValueError):
        pl.rcParams["device.compilation_cache"] = "sometimes"
    assert pl.rcParams["device.compilation_cache"] in ("auto", "on", "off")
