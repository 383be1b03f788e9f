"""Profiling / step-timing utilities (SURVEY §5 tracing).

The reference hand-rolls per-step wall/data timing into the progress bar
(model_trainer.py:172-179); the trainer keeps those fields. This module adds
the TPU-native layer: ``jax.profiler`` trace capture around a region, and a
StepTimer that mirrors the reference's time/data_time accounting with a
device-sync option (on the axon relay, dispatch returns early — sync via a
tiny device->host transfer).
"""

import contextlib
import time

import numpy as np

import jax


@contextlib.contextmanager
def trace(log_dir="/tmp/jax_trace"):
    """Capture a jax.profiler trace viewable in TensorBoard/Perfetto."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def device_sync(x=None):
    """Force real completion: tiny device->host transfer of (a piece of) x."""
    if x is None:
        return
    leaf = jax.tree.leaves(x)[0]
    np.asarray(jax.device_get(jax.tree.map(lambda a: a.ravel()[0], leaf)))


class StepTimer:
    """time / data_time accounting (reference model_trainer.py:172-231)."""

    def __init__(self):
        self.data_start = time.perf_counter()
        self.step_start = self.data_start
        self.data_time = 0.0
        self.step_time = 0.0

    def data_ready(self):
        now = time.perf_counter()
        self.data_time = now - self.data_start
        self.step_start = now

    def step_done(self, sync_on=None):
        if sync_on is not None:
            device_sync(sync_on)
        now = time.perf_counter()
        self.step_time = now - self.data_start
        self.data_start = now
        return {"time": round(self.step_time, 3), "data_time": round(self.data_time, 3)}
