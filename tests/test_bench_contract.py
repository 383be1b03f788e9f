"""Driver contract: bench.py must print exactly one JSON line with the agreed
keys, and __graft_entry__ must expose entry() and dryrun_multichip()."""

import json
import subprocess
import sys


def test_graft_entry_surface():
    import __graft_entry__ as ge

    assert callable(ge.entry)
    assert callable(ge.dryrun_multichip)


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
