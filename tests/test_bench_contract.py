"""Driver contract: bench.py must print exactly one JSON line with the agreed
keys, and __graft_entry__ must expose entry() and dryrun_multichip()."""

import pytest

import json
import os
import subprocess
import sys


def test_graft_entry_surface():
    import __graft_entry__ as ge

    assert callable(ge.entry)
    assert callable(ge.dryrun_multichip)


@pytest.mark.slow
@pytest.mark.heavy
def test_dryrun_multichip_driver_contract():
    """Run the dryrun EXACTLY like the driver: a fresh process whose env does
    NOT pre-force virtual CPU devices (round 1 shipped a regression precisely
    because no test did this — MULTICHIP_r01.json ok=false)."""
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)  # restore sitecustomize default (axon,cpu)
    env.pop("_GRAFT_DRYRUN_CHILD", None)
    flags = [f for f in env.get("XLA_FLAGS", "").split()
             if "xla_force_host_platform_device_count" not in f]
    env["XLA_FLAGS"] = " ".join(flags)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.run(
        [sys.executable, "-c",
         "from __graft_entry__ import dryrun_multichip; dryrun_multichip(8)"],
        env=env, cwd=repo, capture_output=True, text=True, timeout=900)
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "dryrun_multichip(8)" in proc.stdout and "OK" in proc.stdout, (
        proc.stdout, proc.stderr[-2000:])


def test_bench_output_is_one_json_line():
    # static check of the output statement (running bench needs the TPU):
    # the script must print exactly one json.dumps with the required keys
    src = open("bench.py").read()
    assert src.count("json.dumps") == 1
    for key in ("metric", "value", "unit", "vs_baseline"):
        assert f'"{key}"' in src


def test_utils_build_param_groups():
    import numpy as np

    from videotransformer_tpu.utils import build_param_groups

    params = {"pos_embed": np.zeros((1, 5, 8)),
              "blk": {"w": np.zeros((8, 8)), "bias": np.zeros((8,))}}
    nd, d = build_param_groups(params)
    assert set(nd) == {"pos_embed", "blk/bias"}
    assert d == ["blk/w"]
