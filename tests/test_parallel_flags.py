"""-tp/-sp misconfiguration must be loud (VERDICT r4 weak #3).

The silent failure mode: parallel/tp.shard_params_tp falls back to
replication for any leaf whose sharded dim doesn't divide the model axis, so
a `-tp 5` run would train correctly but with tensor parallelism OFF for the
very kernels it was requested for. The CLI now rejects bad values at parse
time and shard_params_tp warns when it degrades.
"""

import warnings

import numpy as np
import pytest

import model_pretrain


BASE = ["-epoch", "1", "-batch_size", "2", "-num_class", "400",
        "-objective", "supervised", "-arch", "timesformer",
        "-root_dir", "/tmp", "-num_frames", "8", "-frame_interval", "32",
        "-lr", "0.005", "-train_data_path", "/dev/null"]


def _args(extra):
    return model_pretrain.parse_args(BASE + extra)


def test_tp_must_divide_heads():
    with pytest.raises(SystemExit, match="does not divide the attention head count"):
        model_pretrain.validate_parallel_flags(_args(["-tp", "5"]))


def test_tp_divisors_accepted():
    for tp in (1, 2, 3, 4, 6, 12):
        model_pretrain.validate_parallel_flags(_args(["-tp", str(tp)]))


def test_tp_rejected_for_mvit():
    with pytest.raises(SystemExit, match="not supported for -arch mvit"):
        model_pretrain.validate_parallel_flags(
            _args(["-tp", "2", "-arch", "mvit"]))


def test_sp_must_divide_frames_and_patches():
    # 8 frames, 196 patches: sp=2 ok (divides both), sp=3 rejected
    model_pretrain.validate_parallel_flags(
        _args(["-sp", "2", "-num_frames", "8"]))
    with pytest.raises(SystemExit, match="must divide both"):
        model_pretrain.validate_parallel_flags(
            _args(["-sp", "3", "-num_frames", "8"]))


def test_sp_requires_divided_attention():
    with pytest.raises(SystemExit, match="divided attention rows"):
        model_pretrain.validate_parallel_flags(
            _args(["-sp", "2", "-attention_type", "joint_space_time"]))


def test_shard_params_tp_warns_on_replication_fallback():
    import jax
    import jax.numpy as jnp

    from videotransformer_tpu.parallel.mesh import create_mesh
    from videotransformer_tpu.parallel.tp import shard_params_tp

    mesh = create_mesh(data=2, model=4, devices=jax.devices()[:8])
    # qkv kernel with a column count NOT divisible by model=4
    params = {"blocks_0": {"attn": {"qkv": {
        "kernel": jnp.zeros((6, 9)), "bias": jnp.zeros((9,))}}}}
    with pytest.warns(UserWarning, match="placed REPLICATED"):
        sharded = shard_params_tp(mesh, params)
    # fallback is correct (replicated) placement, not a crash
    leaf = sharded["blocks_0"]["attn"]["qkv"]["kernel"]
    np.testing.assert_array_equal(np.asarray(leaf), np.zeros((6, 9)))

    # divisible shapes shard cleanly with no warning
    params_ok = {"blocks_0": {"attn": {"qkv": {
        "kernel": jnp.zeros((6, 8)), "bias": jnp.zeros((8,))}}}}
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        shard_params_tp(mesh, params_ok)
