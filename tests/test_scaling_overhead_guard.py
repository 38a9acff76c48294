"""Timing guard for sharded per-pivot machinery (VERDICT r4 weak #6).

`tests/test_scaling_analysis.py` asserts the collective STRUCTURE of the
sharded drivers from compiled StableHLO but deliberately not timing —
cross-P wall clock on virtual devices measures sync emulation
(SCALING.md §2/§4).  This test closes the remaining CI hole: a
regression in sharded STEP OVERHEAD (e.g. reintroducing the serialized
per-pivot collective dispatches the r5 fusion removed) used to pass CI
silently.  It runs `tools/scaling_overhead.py --guard` in a subprocess
with the clean standalone environment (pytest's global x64 / device
state cannot skew it) and asserts the sharded-P=1 / solo per-pivot
RATIO stays under 4x — load cancels in the ratio (measured 1.1 both
idle and under a full parallel suite), while the r4-era driver measured
>6x.
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_sharded_machinery_ratio_guard():
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    env.pop("JAX_ENABLE_X64", None)
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "scaling_overhead.py"),
         "--guard"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=600)
    assert proc.returncode == 0, (
        f"sharded machinery ratio guard failed:\n{proc.stdout}\n{proc.stderr}")
    assert "ratio" in proc.stdout
