"""Guard the bench.py contract the round driver depends on.

The driver runs ``python bench.py`` on the real chip and keeps only a
bounded tail of stdout, so the LAST line must always be a compact JSON
record with the full headline schema (VERDICT r4 weak #3: the round-4
artifact outgrew its own tail).  ``MPMC_BENCH_TINY`` mode exercises the
exact headline code path — the packed production-recipe measurement — on
a tiny model so a bench.py regression is caught on CPU before the
round-end chip run.
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_bench_tiny_mode_emits_headline_schema():
    env = dict(os.environ, MPMC_BENCH_TINY="1", MPMC_BENCH_SCAN="2",
               MPMC_BENCH_BUDGET_S="1", JAX_PLATFORMS="cpu")
    # Skip TPU-plugin registration in the worker (tests/conftest.py pins
    # the cpu backend in-process; a subprocess needs it at creation time).
    env.pop("PALLAS_AXON_POOL_IPS", None)
    out = subprocess.run([sys.executable, "bench.py"], cwd=REPO, env=env,
                         capture_output=True, text=True, timeout=900)
    assert out.returncode == 0, (out.stdout[-1000:], out.stderr[-2000:])
    lines = [ln for ln in out.stdout.strip().splitlines() if ln]
    compact = json.loads(lines[-1])
    for key in ("metric", "value", "unit", "vs_baseline", "step_ms",
                "mfu_full_step", "mfu_fwd_bwd"):
        assert key in compact, f"compact headline line missing {key!r}"
    assert compact["value"] and compact["value"] > 0
    assert compact["unit"] == "memes/sec/chip"
    # The detailed record precedes it and must parse too.
    detailed = json.loads(lines[-2])
    assert detailed["value"] == compact["value"]
    assert "extras" in detailed
