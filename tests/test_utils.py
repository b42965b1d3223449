"""Unit tests for the runtime utilities (retry, profiler hook)."""

import io
import os
from contextlib import redirect_stdout

import numpy as np

from yak_tpu.utils import is_transient, retry_transient


def test_retry_transient_recovers():
    calls = {"fn": 0, "redo": 0}

    def fn():
        calls["fn"] += 1
        if calls["fn"] == 1:
            raise RuntimeError("INTERNAL: TPU backend error")
        return 42

    assert retry_transient(fn, redo=lambda: calls.__setitem__(
        "redo", calls["redo"] + 1)) == 42
    assert calls == {"fn": 2, "redo": 1}


def test_retry_transient_passes_real_errors():
    import pytest

    def fn():
        raise ValueError("shape mismatch")

    assert not is_transient(ValueError("shape mismatch"))
    with pytest.raises(ValueError):
        retry_transient(fn)


def test_profiler_hook(tmp_path, monkeypatch):
    """YAK_TPU_PROFILE wraps a CLI command in a JAX profiler trace."""
    monkeypatch.setenv("YAK_TPU_PROFILE", str(tmp_path / "trace"))
    import util
    if not util.have_oracle():
        import pytest
        pytest.skip("oracle not built")
    rng = np.random.default_rng(1)
    util.to_fasta(tmp_path / "r.fa",
                  util.mutate_reads(rng, util.make_genome(rng, 5000),
                                    100, 100))
    from yak_tpu.cli import main as cli
    with redirect_stdout(io.StringIO()):
        rc = cli(["count", "-k17", "-K20000", "-o",
                  str(tmp_path / "t.yak"), str(tmp_path / "r.fa")])
    assert rc == 0
    assert any((tmp_path / "trace").rglob("*"))   # trace files written


def test_clear_compile_caches_drops_framework_steps():
    """clear_compile_caches empties every memoized step builder (lru and
    dict caches) and leaves the engine fully functional — the bounded-
    executable-lifetime API for long multi-shape processes."""
    import jax.numpy as jnp

    from yak_tpu.ops import countstep
    from yak_tpu.ops import pallas_sort
    from yak_tpu.utils import clear_compile_caches

    step = countstep.get_scan_step(17)
    assert countstep.get_scan_step.cache_info().currsize > 0
    pallas_sort._MESH_SORT_CACHE["sentinel"] = object()

    clear_compile_caches()

    assert countstep.get_scan_step.cache_info().currsize == 0
    assert not pallas_sort._MESH_SORT_CACHE

    # rebuilt steps still work (and are fresh objects)
    step2 = countstep.get_scan_step(17)
    assert step2 is not step
    from yak_tpu.ops import sorttable as st
    keys, cnt, size = st.make_table(1 << 10)
    codes = jnp.zeros((1, 1 << 10), jnp.uint8)
    vals = step2(codes, keys, cnt, size)
    assert vals.shape[-1] == (1 << 10) - 16
