"""Persistent-compile-cache helper: opt-out and directory wiring."""

import os

import jax
import pytest

from probav_tpu.utils import enable_compile_cache


@pytest.fixture(autouse=True)
def _restore_cache_dir():
    before = jax.config.jax_compilation_cache_dir
    yield
    jax.config.update("jax_compilation_cache_dir", before)


def test_enable_points_jax_at_the_dir(tmp_path, monkeypatch):
    monkeypatch.delenv("PROBAV_COMPILE_CACHE", raising=False)
    d = str(tmp_path / "xla_cache")
    out = enable_compile_cache(d)
    assert out == d and os.path.isdir(d)
    assert jax.config.jax_compilation_cache_dir == d


def test_env_off_disables(monkeypatch):
    monkeypatch.setenv("PROBAV_COMPILE_CACHE", "off")
    assert enable_compile_cache() is None


def test_env_path_wins(tmp_path, monkeypatch):
    d = str(tmp_path / "from_env")
    monkeypatch.setenv("PROBAV_COMPILE_CACHE", d)
    assert enable_compile_cache() == d
    assert os.path.isdir(d)
