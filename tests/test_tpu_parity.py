"""Wrapper for the on-TPU correctness lane (scripts/tpu_parity.py).

The pytest suite pins CPU + float64 (conftest), so this wrapper shells
out to a fresh process where the real backend (the TPU) is visible. It
only runs when explicitly requested — set SANAFE_TPU_RUN_TPU_PARITY=1 on
a TPU host — because a full pass costs several minutes of device time.
The committed artifact from the last run lives at TPU_PARITY.json.
"""

import json
import os
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent

needs_tpu = pytest.mark.skipif(
    os.environ.get("SANAFE_TPU_RUN_TPU_PARITY") != "1",
    reason="set SANAFE_TPU_RUN_TPU_PARITY=1 on a TPU host to run",
)


@needs_tpu
@pytest.mark.slow
def test_tpu_parity_lane(tmp_path):
    out = tmp_path / "tpu_parity.json"
    env = {
        k: v for k, v in os.environ.items() if k != "JAX_PLATFORMS"
    }
    proc = subprocess.run(
        [sys.executable, str(REPO / "scripts" / "tpu_parity.py"),
         "--out", str(out)],
        capture_output=True, text=True, env=env, cwd=REPO,
    )
    sys.stdout.write(proc.stdout[-2000:])
    assert proc.returncode == 0, proc.stdout[-2000:] + proc.stderr[-2000:]
    results = json.loads(out.read_text())
    assert results["pass"]
    assert all(
        c.get("raster_byte_identical") for c in results["configs"]
    )


def test_committed_artifact_is_passing():
    """The committed TPU_PARITY.json (produced on the TPU host) must
    record a passing run on the tpu backend."""
    artifact = REPO / "TPU_PARITY.json"
    if not artifact.exists():
        pytest.skip("no committed TPU parity artifact yet")
    results = json.loads(artifact.read_text())
    assert results["backend"] == "tpu"
    assert results["pass"]
    host = [c for c in results["configs"] if c.get("tier") == "host_sweep"]
    assert {c["config"] for c in host} >= {"cfg1", "cfg2_conv", "dvs1000"}
    assert all(c["raster_byte_identical"] for c in host)
    # the device-sweep tier's measured on-hardware deviation band
    for c in results["configs"]:
        if c.get("tier") == "device_sweep" and "per_step_band" in c:
            assert c["raster_byte_identical"]
            assert c["per_step_band"]["total_rel_err"] <= 1e-3
            assert c["per_step_band"]["max_step_rel_err"] <= 0.05
