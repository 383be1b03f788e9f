"""KineticsDataModule equivalent (reference data_trainer.py:38-154).

Builds the per-objective transforms and the three loaders with the reference's
exact recipe: mim -> scale (0.5, 1.0), no color jitter, [pre, post] transform
split; supervised -> color_jitter 0.4; dataset statistics imagenet / kinetics /
0.5; val = Resize(crop_pct)+CenterCrop; test = Resize(-1,256)+ThreeCrop(224).
"""

import jax

from videotransformer_tpu.data import transforms as T
from videotransformer_tpu.data.dataset import Kinetics
from videotransformer_tpu.data.pipeline import (
    Loader, collate_mim, collate_mim_raw, collate_raw, collate_supervised)


def dataset_statistics(name):
    if name == "imagenet":
        return (0.485, 0.456, 0.406), (0.229, 0.224, 0.225)
    if name == "kinetics":
        return (0.45, 0.45, 0.45), (0.225, 0.225, 0.225)
    return (0.5, 0.5, 0.5), (0.5, 0.5, 0.5)


class ThreeCropCollate:
    """Test batches carry (3, T, C, H, W) per sample; flatten crops into batch."""

    def __call__(self, samples):
        import numpy as np

        videos = np.concatenate([s[0] for s in samples], axis=0).astype("float32")
        labels = np.asarray([s[1] for s in samples], dtype="int32")
        return {"video": videos, "label": labels}


class KineticsDataModule:
    def __init__(self, configs, train_ann_path=None, val_ann_path=None,
                 test_ann_path=None, host_hog_targets=True):
        self.configs = configs
        self.train_ann_path = train_ann_path
        self.val_ann_path = val_ann_path
        self.test_ann_path = test_ann_path
        self.host_hog_targets = host_hog_targets
        self.setup()

    def setup(self):
        cfg = self.configs
        if cfg.objective == "mim":
            scale = (0.5, 1.0)
            color_jitter = None
        else:
            color_jitter = 0.4
            scale = None
        mean, std = dataset_statistics(getattr(cfg, "data_statics", "kinetics"))
        self.mean, self.std = mean, std

        temporal_sample = T.TemporalRandomCrop(cfg.num_frames * cfg.frame_interval)
        # bound the decode retry-resample loop so a fully-corrupt shard fails
        # loudly (worker error propagates) instead of spinning inside
        # __getitem__ forever under the loader's no-progress watchdog
        max_retries = getattr(cfg, "max_decode_retries", 100)

        self.device_augment = bool(getattr(cfg, "device_augment", False)) \
            and cfg.objective in ("supervised", "mim")
        # eval recipes run on device only for supervised (mim has no val/test
        # loop, trainer.validate/test are supervised-only)
        self.device_eval = self.device_augment and cfg.objective == "supervised"
        # device-side HOG for mim without device augment (-device_hog alone):
        # host geometric augment, then the dataset ships the un-normalized
        # pre-transform clip alongside the normalized one and
        # trainer._build_train_step computes targets inside the input fusion
        # (reference host loop: dataset.py:39-45, 190-196). With
        # -device_augment the whole path moves on device instead: ONE uint8
        # canonical clip per sample, augment + normalize + HOG in-step.
        if cfg.objective == "mim" and (
                self.device_augment or bool(getattr(cfg, "device_hog", False))):
            self.host_hog_targets = False

        self.train_dataset = None
        if self.train_ann_path and self.device_augment:
            self.train_dataset = Kinetics(
                cfg, self.train_ann_path, transform=None,
                temporal_sample=temporal_sample, raw_clips=True,
                max_decode_retries=max_retries)
        elif self.train_ann_path:
            train_transform = T.create_video_transform(
                objective=cfg.objective,
                input_size=cfg.img_size,
                is_training=True,
                scale=scale,
                hflip=0.5,
                color_jitter=color_jitter,
                auto_augment=getattr(cfg, "auto_augment", None),
                interpolation="bicubic",
                mean=mean, std=std)
            self.train_dataset = Kinetics(
                cfg, self.train_ann_path, transform=train_transform,
                temporal_sample=temporal_sample,
                host_hog_targets=self.host_hog_targets,
                max_decode_retries=max_retries)

        self.val_dataset = None
        if self.val_ann_path and self.device_eval:
            # device-eval: raw canonical clips; Resize+CenterCrop+Normalize
            # run inside the jitted eval step (device_augment.
            # eval_preprocess_batch)
            self.val_dataset = Kinetics(
                cfg, self.val_ann_path, transform=None,
                temporal_sample=temporal_sample, raw_clips=True,
                max_decode_retries=max_retries)
        elif self.val_ann_path:
            val_transform = T.create_video_transform(
                input_size=cfg.img_size, is_training=False,
                interpolation="bicubic", mean=mean, std=std)
            self.val_dataset = Kinetics(
                cfg, self.val_ann_path, transform=val_transform,
                temporal_sample=temporal_sample, max_decode_retries=max_retries)

        self.test_dataset = None
        if self.test_ann_path and self.device_eval:
            self.test_dataset = Kinetics(
                cfg, self.test_ann_path, transform=None,
                temporal_sample=temporal_sample, raw_clips=True,
                max_decode_retries=max_retries)
        elif self.test_ann_path:
            test_transform = T.Compose([
                T.Resize(scale_range=(-1, 256)),
                T.ThreeCrop(size=cfg.img_size),
                T.ToTensor(),
                T.Normalize(list(mean), list(std)),
            ])
            self.test_dataset = Kinetics(
                cfg, self.test_ann_path, transform=test_transform,
                temporal_sample=temporal_sample, max_decode_retries=max_retries)

    def _loader(self, dataset, shuffle, drop_last, collate_fn):
        if dataset is None:
            return None
        cfg = self.configs
        return Loader(
            dataset,
            batch_size=cfg.batch_size,
            shuffle=shuffle,
            drop_last=drop_last,
            num_workers=getattr(cfg, "num_workers", 2),
            collate_fn=collate_fn,
            seed=getattr(cfg, "seed", 0),
            process_index=jax.process_index(),
            num_processes=jax.process_count(),
        )

    def train_loader(self):
        mim = self.configs.objective == "mim"
        if self.device_augment:
            collate = collate_mim_raw if mim else collate_raw
        else:
            collate = collate_mim if mim else collate_supervised
        return self._loader(self.train_dataset, shuffle=True, drop_last=True,
                            collate_fn=collate)

    def val_loader(self):
        collate = collate_raw if self.device_eval else collate_supervised
        return self._loader(self.val_dataset, shuffle=False, drop_last=False,
                            collate_fn=collate)

    def test_loader(self):
        collate = collate_raw if self.device_eval else ThreeCropCollate()
        return self._loader(self.test_dataset, shuffle=False, drop_last=False,
                            collate_fn=collate)
