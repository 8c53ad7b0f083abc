"""Persistent compilation cache wiring (utils/compile_cache.py)."""

import jax

from neurovit_tpu.utils import compile_cache


def test_disabled_by_empty_key(tmp_path):
    assert compile_cache.maybe_enable({"GLOBAL_COMPILE_CACHE": ""}) is False


def test_cpu_backend_skips_by_default(tmp_path, monkeypatch):
    monkeypatch.delenv("NEUROVIT_COMPILE_CACHE_CPU", raising=False)
    cfg = {"GLOBAL_BASE_PATH": str(tmp_path),
           "GLOBAL_COMPILE_CACHE": "cache"}
    assert compile_cache.maybe_enable(cfg) is False
    assert not (tmp_path / "cache").exists()


def test_enables_and_is_idempotent(tmp_path, monkeypatch):
    monkeypatch.setenv("NEUROVIT_COMPILE_CACHE_CPU", "1")
    monkeypatch.setattr(compile_cache, "_ENABLED_DIR", None)
    cfg = {"GLOBAL_BASE_PATH": str(tmp_path),
           "GLOBAL_COMPILE_CACHE": "cache"}
    try:
        assert compile_cache.maybe_enable(cfg) is True
        assert (tmp_path / "cache").is_dir()
        assert jax.config.jax_compilation_cache_dir == str(tmp_path / "cache")
        # Second call: already active, no re-configuration.
        assert compile_cache.maybe_enable(cfg) is True
        # Kill switch wins even when configured.
        monkeypatch.setenv("NEUROVIT_COMPILE_CACHE", "0")
        monkeypatch.setattr(compile_cache, "_ENABLED_DIR", None)
        assert compile_cache.maybe_enable(cfg) is False
    finally:
        jax.config.update("jax_compilation_cache_dir", None)
        monkeypatch.setattr(compile_cache, "_ENABLED_DIR", None)
