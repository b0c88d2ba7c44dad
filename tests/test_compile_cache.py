"""Persistent compile cache wiring (pysco_tpu/utils/compile_cache.py):
the TPU analogue of the reference's @njit(cache=True) on-disk kernel
cache. Library entry points must honour param/env opt-out and directory
selection without touching jax when disabled."""

import jax

from pysco_tpu.utils.compile_cache import enable_compile_cache


def test_disable_values(monkeypatch):
    monkeypatch.delenv("PYSCO_TPU_JAX_CACHE", raising=False)
    for v in ("no", "0", "false", "off"):
        assert enable_compile_cache(v) is None


def test_env_overrides_and_path(tmp_path, monkeypatch):
    d = str(tmp_path / "cc")
    monkeypatch.delenv("PYSCO_TPU_JAX_CACHE", raising=False)
    assert enable_compile_cache(d) == d
    assert jax.config.jax_compilation_cache_dir == d
    # env disable wins over a bare "yes"
    monkeypatch.setenv("PYSCO_TPU_JAX_CACHE", "0")
    assert enable_compile_cache("yes") is None
    # env path used when the param key is the default "yes"
    env_dir = str(tmp_path / "env_cc")
    monkeypatch.setenv("PYSCO_TPU_JAX_CACHE", env_dir)
    assert enable_compile_cache("yes") == env_dir
    # explicit param path beats the env path
    assert enable_compile_cache(d) == d


def test_default_is_user_cache(monkeypatch):
    monkeypatch.delenv("PYSCO_TPU_JAX_CACHE", raising=False)
    out = enable_compile_cache(None)
    assert out is not None and out.endswith("xla_cache")
