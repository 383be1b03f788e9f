"""Kinetics dataset: annotation parsing, temporal sampling, clip loading.

Parity with reference dataset.py:
- tab-separated ``path\tclass_name`` annotation rows, classmap json lookup,
  per-class sample cap (dataset.py:48-93).
- ``__getitem__``: infinite retry-with-random-resample on decode error
  (dataset.py:152-168 — behavior to preserve per SURVEY §5), temporal window
  from ``TemporalRandomCrop``, then ``np.linspace(start, end-1, num_frames)``
  index sampling and a single ``get_batch`` (the "sample indices first"
  optimization, README.md:148-160).
- mim path: CubeMaskGenerator draw + HOG targets computed only at cube-center
  frames (dataset.py:181-196). In the TPU-native pipeline the HOG computation
  moves on-device (see hog.py); this host dataset returns the un-normalized
  pre-transform video plus (mask, cube_marker) and lets the training step
  compute HOG targets inside the XLA input fusion. A host fallback
  (``host_hog_targets=True``) reproduces the reference behavior exactly.

No torch dependency: this is a plain Python indexable, consumed by the
prefetching loader (``pipeline.py``).
"""

import json
import os
import random

import numpy as np

from videotransformer_tpu.data.mask_generator import CubeMaskGenerator
from videotransformer_tpu.data.video_reader import DecordInit

ASSETS_DIR = os.path.join(os.path.dirname(__file__), "assets")


def temporal_sampling(frames, start_idx, end_idx, num_samples):
    """Equal-interval index sampling (reference dataset.py:15-32)."""
    index = np.linspace(start_idx, end_idx, num_samples)
    index = np.clip(index, 0, frames.shape[0] - 1).astype(np.int64)
    return frames[index]


def load_annotation_data(data_file_path):
    with open(data_file_path, "r") as data_file:
        return json.load(data_file)


def get_class_labels(num_class, anno_pth=None):
    """Classmap load (reference dataset.py:53-63, without the global cache)."""
    if anno_pth is None:
        anno_pth = os.path.join(
            ASSETS_DIR, "k600_classmap.json" if num_class > 400 else "k400_classmap.json"
        )
    class_labels_map = load_annotation_data(anno_pth)
    cls_sample_cnt = {cls: 0 for cls in class_labels_map}
    return class_labels_map, cls_sample_cnt


def load_annotations(ann_file, num_class, num_samples_per_cls, anno_pth=None):
    """reference dataset.py:66-93."""
    dataset = []
    class_to_idx, cls_sample_cnt = get_class_labels(num_class, anno_pth)
    with open(ann_file, "r") as fin:
        for line in fin:
            line_split = line.strip().split("\t")
            sample = {}
            frame_dir = line_split[0]
            sample["video"] = frame_dir
            label = [x for x in line_split[1:]]
            assert label, f"missing label in line: {line}"
            assert len(label) == 1
            class_name = label[0]
            class_index = int(class_to_idx[class_name])
            if class_index < num_class:
                sample["label"] = class_index
                if cls_sample_cnt[class_name] < num_samples_per_cls:
                    dataset.append(sample)
                    cls_sample_cnt[class_name] += 1
    return dataset


def canonicalize_raw_clip(video, canonical_hw=(256, 342)):
    """Fixed-shape uint8 clip for the device-augment/raw-serving paths:
    center-crop/pad the short-edge-resized decode to (T, ch, cw, C)
    (lossless for the standard 256p Kinetics release). Shared by the
    dataset raw_clips mode and the serving raw-input preprocessing."""
    ch, cw = canonical_hw
    t, h, w, c = video.shape
    if w >= cw:
        x0 = (w - cw) // 2
        video = video[:, :ch, x0 : x0 + cw]
    else:
        pad = np.zeros((t, min(h, ch), cw, c), np.uint8)
        x0 = (cw - w) // 2
        pad[:, :, x0 : x0 + w] = video[:, :ch]
        video = pad
    if video.shape[1] < ch:
        pad = np.zeros((t, ch, cw, c), np.uint8)
        pad[:, : video.shape[1]] = video
        video = pad
    return np.ascontiguousarray(video)


class Kinetics:
    """Kinetics video dataset (reference dataset.py:122-208).

    Args:
        configs: namespace with num_class, num_samples_per_cls, num_frames,
            objective (and optionally classmap_path, video_root).
        annotation_path: tab-separated annotation file.
        transform: clip transform (or [pre, post] pair for mim).
        temporal_sample: TemporalRandomCrop instance.
        host_hog_targets: compute HOG targets on host exactly like the
            reference (slower); default False defers HOG to the device step.
    """

    def __init__(self, configs, annotation_path, transform=None,
                 temporal_sample=None, host_hog_targets=False,
                 raw_clips=False, canonical_hw=(256, 342),
                 max_decode_retries=None):
        self.configs = configs
        self.data = load_annotations(
            annotation_path, configs.num_class, configs.num_samples_per_cls,
            getattr(configs, "classmap_path", None))
        # relative annotation rows resolve against video_root when given,
        # else against the annotation file's own directory (lets bundled
        # asset lists ship with portable relative paths)
        self.video_root = (getattr(configs, "video_root", None)
                           or os.path.dirname(os.path.abspath(annotation_path)))
        self.transform = transform
        self.temporal_sample = temporal_sample
        self.target_video_len = configs.num_frames
        self.objective = configs.objective
        self.v_decoder = DecordInit()
        self.host_hog_targets = host_hog_targets
        # raw-clip mode (TPU hot path): decode to a fixed canonical size and
        # return uint8 (T, H, W, C); all augmentation happens on device inside
        # the train step (device_augment.py). The decode-time short-edge
        # resize rides the decoder's swscale pass.
        self.raw_clips = raw_clips
        self.canonical_hw = canonical_hw
        # the reference resamples forever on decode failure (dataset.py:152-168);
        # a fully-corrupt dataset would then hang a loader worker inside
        # __getitem__ without tripping the loader's no-progress watchdog, so
        # bound the resample loop (None = reference-parity infinite retry;
        # KineticsDataModule passes a finite default)
        self.max_decode_retries = max_decode_retries

        if self.objective == "mim":
            # mask grid = img_size / (patch stride 4 * pooling downsample 4):
            # 14 for the reference's 224 geometry (dataset.py:188 hardwires
            # (T/2, 14, 14)); derived here so small test geometries work.
            # The divisor encodes MViT-B's stride-4 patchify x 2 stride-2
            # pooling stages — a non-multiple img_size would silently floor
            # and desync the mask/HOG grid from the model's token grid.
            img_size = getattr(configs, "img_size", 224)
            if img_size % 16:
                raise ValueError(
                    f"mim objective requires img_size % 16 == 0 (patch "
                    f"stride 4 x pooling downsample 4); got {img_size}")
            self.mask_grid = img_size // 16
            # min_num_patches=16 matches the reference at its only geometry
            # (14x14 grid, 78-patch budget); clamp to the budget so tiny test
            # grids don't degenerate — e.g. a 6x6 grid has a 14-patch budget,
            # and min 16 > 14 makes the BEiT rejection loop fail all 10
            # attempts ~half the time, yielding an all-zero mask (loss 0,
            # grad_norm 0) with a cube_marker still appended.
            budget = int(self.mask_grid * self.mask_grid * 0.4)
            self._cube_generator = CubeMaskGenerator(
                input_size=(self.target_video_len // 2, self.mask_grid,
                            self.mask_grid),
                min_num_patches=min(16, budget))

    def mask_generator(self):
        """One non-empty cube-mask draw. The BEiT rejection loop can fail all
        its attempts on tiny grids even with the clamped min (the target area
        pins to the full budget and the aspect acceptance window is narrow),
        leaving an all-zero mask whose sample contributes loss 0 / grad 0;
        bounded redraw keeps smoke-test geometry healthy while never engaging
        at the reference's 14x14 grid (empty draws don't occur there)."""
        for _ in range(20):
            mask, cube_marker = self._cube_generator()
            if mask.any():
                return mask, cube_marker
        return mask, cube_marker

    def __getitem__(self, index):
        from videotransformer_tpu.data.video_reader import VideoReader

        attempts = 0
        while True:
            try:
                path = os.path.join(self.video_root, self.data[index]["video"])
                if self.raw_clips:
                    v_reader = VideoReader(path, short_edge=self.canonical_hw[0])
                else:
                    v_reader = self.v_decoder(path)
                total_frames = len(v_reader)
                start_frame_ind, end_frame_ind = self.temporal_sample(total_frames)
                assert end_frame_ind - start_frame_ind >= self.target_video_len
                frame_indice = np.linspace(
                    start_frame_ind, end_frame_ind - 1, self.target_video_len, dtype=int)
                video = v_reader.get_batch(frame_indice)  # (T, H, W, C) uint8
                del v_reader
                break
            except Exception as e:
                print(e)
                attempts += 1
                if (self.max_decode_retries is not None
                        and attempts > self.max_decode_retries):
                    raise RuntimeError(
                        f"decode failed for {self.max_decode_retries} resampled "
                        f"clips in a row (last: {path})") from e
                index = random.randint(0, len(self.data) - 1)

        if self.raw_clips:
            clip = canonicalize_raw_clip(video, self.canonical_hw)
            if self.objective == "mim":
                # fully-device mim hot path: ship ONE uint8 canonical clip;
                # the train step runs the mim geometric augment (RRC 0.5-1.0
                # + flip) on device and derives BOTH the normalized model
                # input and the HOG targets from it. Mask drawing stays on
                # host (cheap numpy, needs python RNG semantics).
                mask, cube_marker = self.mask_generator()
                return clip, mask, cube_marker
            return clip, self.data[index]["label"]

        # (T, H, W, C) -> (T, C, H, W), matching the reference layout
        video = np.ascontiguousarray(video.transpose(0, 3, 1, 2)).astype(np.float32)
        if self.transform is not None:
            if self.objective == "mim":
                pre_transform, post_transform = self.transform
                pre_transform.randomize_parameters()
                video = pre_transform(video)
            else:
                self.transform.randomize_parameters()
                video = self.transform(video)

        if self.objective == "mim":
            mask, cube_marker = self.mask_generator()
            if self.host_hog_targets:
                from videotransformer_tpu.data.hog import extract_hog_features_np

                hog_inputs = video.transpose(0, 2, 3, 1)
                hog_features = np.zeros(
                    (self.target_video_len, self.mask_grid, self.mask_grid,
                     2 * 2 * 3 * 9), dtype=np.float32)
                for start_frame, span_frame in cube_marker:
                    center_index = start_frame * 2 + span_frame * 2 // 2
                    hog_features[center_index] = extract_hog_features_np(
                        hog_inputs[center_index])
                label = hog_features
            else:
                # device-side HOG: ship the raw (pre-normalization) clip; the
                # training step computes targets inside the input fusion
                label = None
            if self.transform is not None:
                post_video = post_transform(video)
            else:
                post_video = video
            if label is None:
                return post_video, video, mask, cube_marker
            return post_video, label, mask, cube_marker
        else:
            label = self.data[index]["label"]
            return video, label

    def __len__(self):
        return len(self.data)
