"""Host data loader: threaded decode workers + async device prefetch.

Replaces torch DataLoader worker processes (data_trainer.py:123-154) with a
thread pool — the decode hot path (FFmpeg/cv2) releases the GIL, so threads
overlap decode with TPU steps without fork overhead. Batches are assembled as
numpy and device_put asynchronously (double-buffered) so the TPU never waits
on H2D copies.

Multi-host: each process loads its own shard of the sample index space, keyed
by (jax.process_index(), num_processes) — the pjit data axis then sees a
globally-consistent batch.
"""

import queue
import threading
import time

import numpy as np

from videotransformer_tpu.data.mask_generator import pad_cube_marker


def collate_raw(samples):
    """Raw-clip batches for device-side augmentation: uint8 (B, T, H, W, C)."""
    videos = np.stack([s[0] for s in samples])
    labels = np.asarray([s[1] for s in samples], dtype=np.int32)
    return {"raw_video": videos, "label": labels}


def collate_supervised(samples):
    videos = np.stack([s[0] for s in samples]).astype(np.float32)
    labels = np.asarray([s[1] for s in samples], dtype=np.int32)
    return {"video": videos, "label": labels}


def collate_mim_raw(samples, max_cubes=8):
    """Fully-device mim batches: ONE uint8 canonical clip per sample
    (B, T, H, W, C) + host-drawn mask/cube_marker. Compare collate_mim's
    device-HOG branch, which ships TWO float32 clips (~8x the H2D bytes of
    one uint8 clip); the train step augments and normalizes on device."""
    videos = np.stack([s[0] for s in samples])
    masks = np.stack([s[1] for s in samples]).astype(np.int32)
    markers, counts = pad_cube_marker([s[2] for s in samples], max_cubes)
    return {"raw_video": videos, "mask": masks,
            "cube_marker": markers, "cube_count": counts}


def collate_mim(samples, max_cubes=8):
    """mim batch: (video, target, mask, cube_marker) per sample
    (data_trainer.py:15-36), with cube_marker padded to (B, max_cubes, 2).

    The target is either precomputed host HOG features (T, h, w, 108) or the
    un-normalized raw clip (T, C, H, W) for device-side HOG — distinguished by
    the channel position (raw clips carry C=3 at axis 1)."""
    videos = np.stack([s[0] for s in samples]).astype(np.float32)
    second = np.stack([s[1] for s in samples]).astype(np.float32)
    masks = np.stack([s[2] for s in samples]).astype(np.int32)
    markers, counts = pad_cube_marker([s[3] for s in samples], max_cubes)
    is_raw = second.ndim == 5 and second.shape[2] == 3
    key = "raw" if is_raw else "hog"
    return {"video": videos, key: second, "mask": masks,
            "cube_marker": markers, "cube_count": counts}


class Loader:
    """Iterable over collated numpy batches with background worker threads."""

    def __init__(self, dataset, batch_size, shuffle=False, drop_last=False,
                 num_workers=2, collate_fn=collate_supervised, seed=0,
                 process_index=0, num_processes=1, prefetch=2,
                 worker_timeout=300.0):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.num_workers = max(1, num_workers)
        self.collate_fn = collate_fn
        self.seed = seed
        self.epoch = 0
        self.process_index = process_index
        self.num_processes = num_processes
        self.prefetch = prefetch
        # max seconds to wait for ONE batch with no worker progress before
        # raising (torch DataLoader's error-propagation analogue; the
        # reference would hang the same way we used to — data_trainer.py:123)
        self.worker_timeout = worker_timeout

    def set_epoch(self, epoch):
        self.epoch = epoch

    def _indices(self):
        n = len(self.dataset)
        idx = np.arange(n)
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self.epoch)
            rng.shuffle(idx)
        # per-host shard (contiguous stride, DistributedSampler-style)
        idx = idx[self.process_index :: self.num_processes]
        if self.drop_last:
            usable = (len(idx) // self.batch_size) * self.batch_size
            idx = idx[:usable]
        return idx

    def __len__(self):
        idx_len = len(range(self.process_index, len(self.dataset), self.num_processes))
        if self.drop_last:
            return idx_len // self.batch_size
        return (idx_len + self.batch_size - 1) // self.batch_size

    def __iter__(self):
        indices = self._indices()
        batches = [
            indices[i : i + self.batch_size]
            for i in range(0, len(indices), self.batch_size)
        ]
        if self.drop_last:
            batches = [b for b in batches if len(b) == self.batch_size]
        if not batches:
            return

        sample_q: "queue.Queue" = queue.Queue(maxsize=self.num_workers * 4)
        out: dict = {}
        out_lock = threading.Condition()
        stop = threading.Event()
        errors: list = []  # exceptions raised inside workers

        def worker():
            while not stop.is_set():
                try:
                    item = sample_q.get(timeout=0.1)
                except queue.Empty:
                    continue
                if item is None:
                    return
                bi, si, ds_index = item
                try:
                    sample = self.dataset[ds_index]
                except BaseException as exc:  # propagate to the consumer
                    with out_lock:
                        errors.append((ds_index, exc))
                        out_lock.notify_all()
                    return
                with out_lock:
                    out.setdefault(bi, {})[si] = sample
                    out_lock.notify_all()

        threads = [threading.Thread(target=worker, daemon=True)
                   for _ in range(self.num_workers)]
        for t in threads:
            t.start()

        feeder_batches = list(enumerate(batches))

        def feeder():
            for bi, batch in feeder_batches:
                for si, ds_index in enumerate(batch):
                    if stop.is_set():
                        return
                    sample_q.put((bi, si, int(ds_index)))
            for _ in threads:
                sample_q.put(None)

        threading.Thread(target=feeder, daemon=True).start()

        try:
            for bi, batch in feeder_batches:
                with out_lock:
                    deadline = time.monotonic() + self.worker_timeout
                    while bi not in out or len(out[bi]) < len(batch):
                        if errors:
                            ds_index, exc = errors[0]
                            raise RuntimeError(
                                f"loader worker failed on dataset index "
                                f"{ds_index}") from exc
                        if not any(t.is_alive() for t in threads):
                            raise RuntimeError(
                                "all loader workers exited before batch "
                                f"{bi} was complete")
                        got = len(out.get(bi, {}))
                        out_lock.wait(timeout=5.0)
                        if len(out.get(bi, {})) > got:
                            deadline = time.monotonic() + self.worker_timeout
                        elif time.monotonic() > deadline:
                            raise TimeoutError(
                                f"loader made no progress on batch {bi} for "
                                f"{self.worker_timeout:.0f}s "
                                f"({got}/{len(batch)} samples ready)")
                    ready = out.pop(bi)
                    samples = [ready[i] for i in range(len(batch))]
                yield self.collate_fn(samples)
        finally:
            stop.set()


def device_prefetch(iterator, mesh=None, size=2):
    """Wrap a host batch iterator with async device_put (double-buffering)."""
    import jax

    from videotransformer_tpu.parallel.mesh import shard_local_batch

    buf = []
    it = iter(iterator)

    def put(batch):
        if mesh is not None:
            # multi-host: the loader yields this process's local shard;
            # shard_local_batch assembles the global array (= shard_batch
            # in single-process runs)
            return shard_local_batch(mesh, batch)
        return jax.tree.map(jax.device_put, batch)

    try:
        for _ in range(size):
            buf.append(put(next(it)))
    except StopIteration:
        pass
    while buf:
        nxt = buf.pop(0)
        try:
            buf.append(put(next(it)))
        except StopIteration:
            pass
        yield nxt
