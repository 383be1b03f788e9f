"""Top-k accuracy metrics (replaces torchmetrics Accuracy, SURVEY §2.3).

Computed inside the jitted step as correct-counts so cross-device reduction is
just the implicit psum over the sharded batch; the host accumulates
(correct, total) pairs and computes epoch means (model_trainer.py:84-105
semantics: epoch-end compute + reset).
"""

import jax.numpy as jnp


def topk_correct(logits, labels, ks=(1, 5)):
    """logits (B, C), labels (B,) int -> dict k -> correct count (scalar)."""
    out = {}
    # argsort descending once, reuse for all k
    top = jnp.argsort(-logits, axis=-1)
    for k in ks:
        hit = (top[:, :k] == labels[:, None]).any(axis=-1)
        out[k] = hit.sum()
    return out


class AccuracyMeter:
    """Host-side accumulator with torchmetrics-like compute/reset."""

    def __init__(self, ks=(1, 5)):
        self.ks = ks
        self.reset()

    def update(self, correct_counts, batch_size):
        for k in self.ks:
            self.correct[k] += int(correct_counts[k])
        self.total += int(batch_size)

    def compute(self, k=1):
        return self.correct[k] / max(1, self.total)

    def reset(self):
        self.correct = {k: 0 for k in self.ks}
        self.total = 0
