"""Sanity checks for the driver entry points (no TPU work)."""
import importlib.util
import json
import subprocess
import sys

import pytest


def _load(path, name):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_bench_make_mixtures():
    bench = _load("bench.py", "bench_mod")
    items = bench.make_mixtures(2, 1.0, 16000, seed=0)
    assert len(items) == 2
    mix, srcs = items[0]
    assert mix.shape == (16000,) and len(srcs) == 3
    import numpy as np

    np.testing.assert_allclose(mix, np.sum(srcs, axis=0), atol=1e-6)
    # deterministic
    again = bench.make_mixtures(2, 1.0, 16000, seed=0)
    np.testing.assert_array_equal(items[0][0], again[0][0])


def test_graft_entry_shapes():
    g = _load("__graft_entry__.py", "graft_mod")
    fn, args = g.entry()
    assert callable(fn)
    params, mix, mask = args
    assert mix.shape == (2, 32000) and mask.shape == (2, 32000)


@pytest.mark.slow
def test_graft_dryrun_subprocess():
    # run in a subprocess so the virtual-device env applies cleanly
    code = (
        "import os;"
        "os.environ['JAX_PLATFORMS']='cpu';"
        "os.environ['XLA_FLAGS']='--xla_force_host_platform_device_count=4';"
        "import jax; jax.config.update('jax_platforms','cpu');"
        "import importlib.util;"
        "s=importlib.util.spec_from_file_location('g','__graft_entry__.py');"
        "m=importlib.util.module_from_spec(s); s.loader.exec_module(m);"
        "m.dryrun_multichip(4)"
    )
    out = subprocess.run([sys.executable, "-c", code], capture_output=True, text=True, timeout=600)
    assert out.returncode == 0, out.stderr[-2000:]
    assert "dryrun_multichip ok" in out.stdout


def test_bench_backend_retry_gives_up_in_budget(monkeypatch, capsys):
    """_wait_for_backend: probes in subprocesses, retries on failure, and
    returns (rather than hanging or raising) once the budget is spent —
    the observed failure mode is the axon backend erroring UNAVAILABLE."""
    import time as _time

    import pytest

    bench = _load("bench.py", "bench_mod_retry")
    monkeypatch.setenv("JAX_PLATFORMS", "definitely_not_a_backend")
    t0 = _time.perf_counter()
    with pytest.raises(SystemExit):  # fail fast, not a 30-min init hang
        bench._wait_for_backend(budget_s=4.0)
    took = _time.perf_counter() - t0
    err = capsys.readouterr().err
    assert "probe" in err and "giving up" in err
    assert took < 120


def test_bench_backend_retry_succeeds_on_healthy_backend(monkeypatch, capsys):
    bench = _load("bench.py", "bench_mod_retry_ok")
    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    bench._wait_for_backend(budget_s=60.0)
    # a healthy first probe is silent
    assert "giving up" not in capsys.readouterr().err


def test_bench_serve_smoke_tiny():
    """serve_smoke drives the real StreamingServer over a tiny engine and
    returns the serving fields bench.py merges into its JSON artifact."""
    import numpy as np

    from audio_classification_tpu.engine import BucketSpec, ModelPack, StageEngine, tiny_preset
    from audio_classification_tpu.engine.bucketing import default_buckets
    from audio_classification_tpu.utils.config import Overlap3Config

    bench = _load("bench.py", "bench_mod_serve")
    items = bench.make_mixtures(4, 3.0, 16000, seed=0)
    pack = ModelPack(tiny_preset(), seed=0)
    eng = StageEngine(pack, BucketSpec(lengths=default_buckets(16000, 0.5, 8.0),
                                       max_batch=8))
    cfg = Overlap3Config(preset="tiny", seed=0, max_batch=8)
    import os

    os.environ["ACT_BENCH_SERVE_CAP"] = "4"  # keep the capacity pass tiny
    try:
        out = bench.serve_smoke(eng, cfg, items, n_sessions=3, ticks=2,
                                window_sec=2.0)
    finally:
        os.environ.pop("ACT_BENCH_SERVE_CAP", None)
    assert out["serve_sessions"] == 3
    assert out["serve_rtf"] > 0 and np.isfinite(out["serve_rtf"])
    assert out["serve_rt_streams"] >= 0 and out["serve_tick_p95_s"] > 0
    assert out["serve_rt_streams_extrapolated"] >= 0
    if "serve_sessions_measured" in out:  # capacity pass ran (extrap > 3)
        assert out["serve_sessions_measured"] == 4
        assert isinstance(out["serve_capacity_sustained"], bool)
