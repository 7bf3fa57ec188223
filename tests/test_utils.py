"""Tests for profiling and distributed utilities."""

import time

from instagraal_tpu.utils import PhaseTimer, init_distributed, is_coordinator


class TestPhaseTimer:
    def test_accumulates(self):
        t = PhaseTimer()
        with t.phase("a"):
            time.sleep(0.01)
        with t.phase("a"):
            pass
        with t.phase("b"):
            pass
        assert t.counts["a"] == 2
        assert t.totals["a"] >= 0.01
        report = t.report(log=False)
        assert "a" in report and "b" in report
        d = t.as_dict()
        assert d["a"]["calls"] == 2


class TestDistributed:
    def test_single_process_noop(self):
        init_distributed()  # must not raise without a coordinator
        assert is_coordinator()


class TestCompileCache:
    def test_enable_persistent_cache(self, tmp_path, monkeypatch):
        import importlib

        import jax

        from instagraal_tpu.utils import compile_cache as cc

        importlib.reload(cc)
        monkeypatch.delenv("JAX_COMPILATION_CACHE_DIR", raising=False)
        prev = jax.config.jax_compilation_cache_dir
        try:
            jax.config.update("jax_compilation_cache_dir", None)
            target = tmp_path / "xla_cache"
            got = cc.enable_persistent_cache(str(target))
            assert got == str(target)
            assert target.is_dir()
            assert jax.config.jax_compilation_cache_dir == str(target)
            # idempotent: second call keeps the first location
            assert cc.enable_persistent_cache("/nope") == str(target)
        finally:
            jax.config.update("jax_compilation_cache_dir", prev)

    def test_opt_out(self, tmp_path, monkeypatch):
        import importlib

        from instagraal_tpu.utils import compile_cache as cc

        importlib.reload(cc)
        monkeypatch.setenv("INSTAGRAAL_TPU_COMPILE_CACHE", "0")
        assert cc.enable_persistent_cache(str(tmp_path)) is None

    def test_existing_env_wins(self, monkeypatch, tmp_path):
        import importlib

        from instagraal_tpu.utils import compile_cache as cc

        importlib.reload(cc)
        monkeypatch.setenv(
            "JAX_COMPILATION_CACHE_DIR", str(tmp_path / "env")
        )
        got = cc.enable_persistent_cache("/elsewhere")
        assert got == str(tmp_path / "env")
