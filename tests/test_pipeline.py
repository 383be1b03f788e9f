"""Host loader: worker-error propagation, dead-worker detection, and
multi-host shard coverage/disjointness (DistributedSampler semantics implied
by reference model_pretrain.py:158-164 / data_trainer.py:123-132)."""

import numpy as np
import pytest

from videotransformer_tpu.data.pipeline import Loader, collate_supervised


class _ToyDataset:
    def __init__(self, n=32, fail_at=None, fail_exc=ValueError):
        self.n = n
        self.fail_at = fail_at
        self.fail_exc = fail_exc

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        if self.fail_at is not None and i == self.fail_at:
            raise self.fail_exc(f"boom at {i}")
        video = np.full((2, 3, 4, 4), i, np.float32)
        return video, i


def test_loader_basic_order_and_len():
    ds = _ToyDataset(10)
    loader = Loader(ds, batch_size=4, shuffle=False, num_workers=2)
    batches = list(loader)
    assert len(loader) == 3
    assert len(batches) == 3
    assert [b["label"].tolist() for b in batches] == [
        [0, 1, 2, 3], [4, 5, 6, 7], [8, 9]]
    assert batches[0]["video"][2, 0, 0, 0, 0] == 2.0


def test_worker_exception_propagates():
    """A bug inside dataset/__getitem__ must surface in the consumer, not
    hang the training loop (round-1 weakness: infinite out_lock.wait)."""
    ds = _ToyDataset(8, fail_at=5)
    loader = Loader(ds, batch_size=4, num_workers=2, worker_timeout=10.0)
    it = iter(loader)
    first = next(it)
    assert first["label"].tolist() == [0, 1, 2, 3]
    with pytest.raises(RuntimeError, match="worker failed on dataset index 5"):
        # the failing sample is in batch 1; either next() may raise depending
        # on scheduling, so drain
        for _ in range(3):
            next(it)


def test_all_workers_dead_detected():
    """Every worker dying (each consumes one poison sample) must raise, not
    spin forever."""
    class _AlwaysFail(_ToyDataset):
        def __getitem__(self, i):
            raise OSError("decoder crashed")

    loader = Loader(_AlwaysFail(8), batch_size=4, num_workers=2,
                    worker_timeout=10.0)
    with pytest.raises(RuntimeError):
        next(iter(loader))


def test_multihost_shards_cover_and_disjoint():
    """Simulated process_index>0 sharding: the union of all hosts' sample
    indices covers the dataset exactly once per epoch, shards are disjoint,
    and every host sees the same number of batches (drop_last)."""
    n, hosts, bs = 103, 4, 8
    seen = []
    lens = []
    for pi in range(hosts):
        ds = _ToyDataset(n)
        loader = Loader(ds, batch_size=bs, shuffle=True, drop_last=True,
                        num_workers=2, seed=7, process_index=pi,
                        num_processes=hosts)
        loader.set_epoch(3)
        labels = np.concatenate([b["label"] for b in loader])
        lens.append(len(labels))
        seen.append(labels)
    flat = np.concatenate(seen)
    # disjoint across hosts
    assert len(np.unique(flat)) == len(flat)
    # drop_last trims to a whole number of batches per host
    assert all(l % bs == 0 for l in lens)
    # coverage: every index that survived drop_last comes from the dataset
    assert flat.min() >= 0 and flat.max() < n
    # near-complete coverage (only drop_last remainder missing)
    assert len(flat) >= (n // hosts // bs) * bs * hosts


def test_multihost_same_epoch_same_permutation():
    """All hosts must draw the SAME epoch permutation (seed+epoch keyed), so
    shards are consistent slices of one global order."""
    ds = _ToyDataset(24)
    full = Loader(ds, batch_size=24, shuffle=True, seed=5, num_workers=1)
    full.set_epoch(2)
    order = next(iter(full))["label"]
    shards = []
    for pi in range(2):
        l = Loader(ds, batch_size=12, shuffle=True, seed=5, num_workers=1,
                   process_index=pi, num_processes=2)
        l.set_epoch(2)
        shards.append(next(iter(l))["label"])
    np.testing.assert_array_equal(np.asarray(order)[pi::2], shards[pi])
    np.testing.assert_array_equal(np.asarray(order)[0::2], shards[0])


def test_perpetually_failing_decode_bounded(tmp_path):
    """A dataset whose every decode fails must abort after
    max_decode_retries resampled attempts (raising inside __getitem__, which
    the loader propagates) instead of spinning forever inside the retry loop
    where the loader's no-progress watchdog can't see it."""
    from types import SimpleNamespace

    from videotransformer_tpu.data import transforms as T
    from videotransformer_tpu.data.dataset import Kinetics

    ann = tmp_path / "ann.txt"
    bogus = tmp_path / "missing.mp4"  # never exists -> every decode raises
    ann.write_text(f"{bogus}\tabseiling\n")
    cfg = SimpleNamespace(num_class=400, num_samples_per_cls=10,
                          num_frames=2, objective="supervised")
    ds = Kinetics(cfg, str(ann), temporal_sample=T.TemporalRandomCrop(8),
                  raw_clips=True, max_decode_retries=5)
    with pytest.raises(RuntimeError, match="5 resampled"):
        ds[0]

    # and through the loader: the bounded failure propagates as a worker error
    loader = Loader(ds, batch_size=1, num_workers=1, worker_timeout=30.0)
    with pytest.raises(RuntimeError):
        next(iter(loader))
