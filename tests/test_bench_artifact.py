"""The bench.py artifact must stay machine-readable under environment
outages (round-3 VERDICT: a tunnel outage produced an rc=1 traceback
record indistinguishable from a perf regression)."""
import json
import os
import subprocess
import sys
import time

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BENCH = os.path.join(REPO, "bench.py")


def _run_bench(env_extra, timeout=120):
    env = dict(os.environ)
    # keep the subprocess off the real backend entirely
    env.update({"PALLAS_AXON_POOL_IPS": "", "JAX_PLATFORMS": "cpu"})
    env.update(env_extra)
    return subprocess.run([sys.executable, BENCH], capture_output=True,
                          text=True, env=env, timeout=timeout)


def test_simulated_backend_failure_yields_structured_record():
    r = _run_bench({
        "VALUES_TPU_BENCH_PROBE_ATTEMPTS": "2",
        "VALUES_TPU_BENCH_PROBE_BACKOFF": "0.01",
        "VALUES_TPU_BENCH_PROBE_CODE":
            "import sys; sys.stderr.write('UNAVAILABLE: simulated'); "
            "sys.exit(1)",
    })
    assert r.returncode == 0, r.stderr
    rec = json.loads(r.stdout.strip().splitlines()[-1])
    assert rec["error"] == "backend_unavailable"
    assert rec["value"] == 0.0 and rec["unit"] == "volumes/sec/chip"
    assert "simulated" in rec["detail"]
    assert rec["probe_attempts"] == 2


def test_simulated_backend_hang_yields_structured_record():
    t0 = time.time()
    r = _run_bench({
        "VALUES_TPU_BENCH_PROBE_ATTEMPTS": "2",
        "VALUES_TPU_BENCH_PROBE_BACKOFF": "0.01",
        "VALUES_TPU_BENCH_PROBE_TIMEOUT": "1.5",
        "VALUES_TPU_BENCH_PROBE_CODE": "import time; time.sleep(60)",
    })
    assert r.returncode == 0, r.stderr
    assert time.time() - t0 < 30  # the hang was bounded, not waited out
    rec = json.loads(r.stdout.strip().splitlines()[-1])
    assert rec["error"] == "backend_unavailable"
    assert "timed out" in rec["detail"]


def test_probe_passes_on_healthy_backend():
    from bench import probe_backend
    ok, detail = probe_backend(attempts=1, timeout_s=60,
                               code="print('ok')")
    assert ok and detail == ""

@pytest.mark.slow
def test_smoke_mode_exercises_every_measure():
    """VALUES_TPU_BENCH_SMOKE=1 runs every measurement code path at tiny
    geometry on CPU and fails loudly if ANY auxiliary measure breaks —
    the guard that keeps an unattended on-chip battery from silently
    spending its tunnel window on 0.0 placeholders."""
    r = _run_bench({"VALUES_TPU_BENCH_SMOKE": "1",
                    "VALUES_TPU_BENCH_NO_PROBE": "1"}, timeout=3000)
    rec = json.loads(r.stdout.strip().splitlines()[-1])
    assert rec.get("smoke") is True
    assert r.returncode == 0, (rec.get("smoke_failures"), r.stderr[-2000:])
    assert rec["smoke_failures"] == []
    # every measure produced a real (nonzero) number at smoke geometry
    for key in ("staged_xla_volumes_per_sec", "staged_packed_volumes_per_sec",
                "staged_hybrid_volumes_per_sec", "end_to_end_volumes_per_sec",
                "window_batch16_pallas_volumes_per_sec",
                "window_batch16_xla_volumes_per_sec",
                "aleatoric50_streaming_volumes_per_sec",
                "ssn_streaming_volumes_per_sec"):
        assert rec[key] > 0.0, key
    for key in ("train_step_packed_bf16", "ssn_train_step_packed_bf16"):
        assert rec[key].get("ms_per_step", 0) > 0, key
