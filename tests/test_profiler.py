"""Profiler subsystem smoke tests (CPU)."""

import numpy as np
import jax
import jax.numpy as jnp

from audio_denoising_tpu.runtime.profiler import StageProfile
from audio_denoising_tpu.runtime.metrics import ServingMetrics


def test_metrics_percentiles():
    m = ServingMetrics()
    for v in range(100):
        m.observe("s", v / 1000.0)
    s = m.summary()["s"]
    assert 45 <= s["p50_ms"] <= 55
    assert s["p99_ms"] >= s["p90_ms"] >= s["p50_ms"]


def test_stage_profile_dispatch():
    prof = StageProfile()
    f = jax.jit(lambda x: x * 2.0)
    out = prof.measure_dispatch(f, jnp.ones(16), iters=5)
    assert out["n"] == 5 and out["p50_ms"] >= 0


def test_stage_profile_amortized():
    prof = StageProfile()

    def make_scan(chain):
        @jax.jit
        def run(x):
            return jax.lax.scan(lambda c, _: (c * 1.1, ()), x, None,
                                length=chain)[0]
        x = jnp.ones(16)
        return lambda: run(x)

    ms = prof.measure_amortized(make_scan, iters=3, chain=10)
    assert ms >= 0


def test_profile_cli_help():
    from audio_denoising_tpu.apps.profile_app import main
    import pytest
    with pytest.raises(SystemExit):
        main(["--help"])


def test_profile_cli_stages_smoke(capsys):
    """--stages end-to-end on tiny shapes; stage timings must scale with
    real per-iteration work (regression for the loop-hoisting bug)."""
    import json
    from audio_denoising_tpu.apps.profile_app import main
    assert main(["--model", "gruunet2-good", "--streams", "2",
                 "--hops", "3", "--stages"]) == 0
    rep = json.loads(capsys.readouterr().out)
    st = rep["stage_ms_per_hop"]
    assert set(st) == {"frontend", "model", "backend"}
    assert all(v > 0 for v in st.values())
