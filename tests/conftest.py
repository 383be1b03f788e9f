"""Test configuration.

- Forces JAX onto CPU with 8 virtual devices so pjit/collective tests run
  without a TPU pod (the JAX-native way to test sharding: SURVEY.md §4).
- Installs import stubs (pytorch_lightning, pytorchvideo, torchvision,
  torchmetrics, timm) so the *reference* implementation at /root/reference can
  be imported read-only for golden-value parity tests. We never execute
  reference training code — only its pure-torch model math.
"""

import os
import sys
import types

# Force CPU with 8 virtual devices. Note: in this image a sitecustomize module
# registers the TPU backend at interpreter startup and sets
# jax_platforms="axon,cpu", so the env var alone is not enough — we also update
# jax.config after import.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    _flags = (_flags + " --xla_force_host_platform_device_count=8").strip()
# jaxlib ships AOT-precompiled XLA:CPU helper kernels built for a different
# CPU; multi-device compiles load them and spam cpu_aot_loader SIGILL
# warnings. A non-default compile flag misses the AOT fingerprint so the
# helpers JIT locally (no-op flag on this single-core host).
if "parallel_codegen_split_count" not in _flags:
    _flags = (_flags + " --xla_cpu_parallel_codegen_split_count=1").strip()
os.environ["XLA_FLAGS"] = _flags

# Persistent XLA compilation cache, shared by this process AND every child
# process the tests spawn (they inherit the env var). Honesty note: a full
# cold slow-tier run wrote ZERO cache entries — the tiny test geometries
# all compile in <1 s (the suite is EXECUTION-bound: interpret-mode Pallas,
# reference-torch golden math, real train loops), so the <10-min runnable
# tier comes from the slow/heavy split (pyproject markers), not this cache.
# The cache stays because it is free and catches any future big-compile
# test. Keyed by HLO + flags + jax version, so stale hits are impossible;
# delete the dir to force cold compiles.
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# The env var above only reaches spawned children: the sitecustomize module
# already imported jax before this file ran, so THIS process must set the
# cache dir through the live config.
jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
assert jax.default_backend() == "cpu", jax.default_backend()

REFERENCE_DIR = "/root/reference"


def _module(name, **attrs):
    mod = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules.setdefault(name, mod)
    return sys.modules[name]


def install_reference_stubs():
    def rank_zero_only(fn):
        return fn

    pl = _module("pytorch_lightning", LightningModule=object, LightningDataModule=object)
    _module("pytorch_lightning.utilities")
    _module("pytorch_lightning.utilities.distributed", rank_zero_only=rank_zero_only)
    pl.utilities = sys.modules["pytorch_lightning.utilities"]
    sys.modules["pytorch_lightning.utilities"].distributed = sys.modules[
        "pytorch_lightning.utilities.distributed"
    ]

    def _missing(*a, **k):
        raise ImportError("pytorchvideo stub: MViT reference path not available")

    _module("pytorchvideo")
    _module("pytorchvideo.layers", MultiScaleBlock=_missing, SpatioTemporalClsPositionalEncoding=_missing)
    _module(
        "pytorchvideo.layers.utils",
        round_width=lambda width, multiplier, min_width=1, divisor=1, ceil=False: width,
        set_attributes=lambda obj, params=None: [
            setattr(obj, k, v) for k, v in (params or {}).items() if k != "self"
        ],
    )
    sys.modules["pytorchvideo"].layers = sys.modules["pytorchvideo.layers"]
    sys.modules["pytorchvideo.layers"].utils = sys.modules["pytorchvideo.layers.utils"]
    _module("pytorchvideo.models")
    _module("pytorchvideo.models.vision_transformers", MultiscaleVisionTransformers=_missing)
    sys.modules["pytorchvideo"].models = sys.modules["pytorchvideo.models"]
    sys.modules["pytorchvideo.models"].vision_transformers = sys.modules[
        "pytorchvideo.models.vision_transformers"
    ]

    # torchvision stub: enough surface for `import data_transform` (the
    # reference's crop/ThreeCrop classes are pure torch at call time).
    class _InterpolationMode:
        NEAREST = "nearest"
        BILINEAR = "bilinear"
        BICUBIC = "bicubic"
        BOX = "box"
        HAMMING = "hamming"
        LANCZOS = "lanczos"

    tv = _module("torchvision")
    tv_transforms = _module(
        "torchvision.transforms",
        **{n: _missing for n in (
            "Resize", "CenterCrop", "Normalize", "ColorJitter",
            "RandomHorizontalFlip", "RandomGrayscale", "RandomApply",
            "RandomResizedCrop", "RandomCrop",
        )},
    )
    tv_transforms.InterpolationMode = _InterpolationMode
    _module("torchvision.transforms.functional",
            InterpolationMode=_InterpolationMode, resized_crop=_missing)
    _module("torchvision.transforms.autoaugment", RandAugment=_missing)
    tv.transforms = tv_transforms
    tv_transforms.functional = sys.modules["torchvision.transforms.functional"]
    tv_transforms.autoaugment = sys.modules["torchvision.transforms.autoaugment"]

    _module("torchmetrics", Accuracy=object)
    _module("timm")
    _module("timm.loss", SoftTargetCrossEntropy=object)
    sys.modules["timm"].loss = sys.modules["timm.loss"]

    if REFERENCE_DIR not in sys.path:
        sys.path.insert(0, REFERENCE_DIR)
    # our repo root must shadow the reference for colliding top-level names
    # (model_pretrain.py); reference-only modules (transformer,
    # video_transformer, weight_init, data_transform) still resolve there
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if repo_root in sys.path:
        sys.path.remove(repo_root)
    sys.path.insert(0, repo_root)


install_reference_stubs()


import pytest  # noqa: E402


@pytest.fixture(autouse=True)
def _reset_sequence_parallel_state():
    """Sequence/tensor-parallel activation sharding is module-global state
    (set by trainers/tests); guarantee a failing test can't leak an enabled
    mesh into every later test."""
    yield
    from videotransformer_tpu.parallel import sp, tp

    sp.disable_sequence_parallel()
    tp.disable_tensor_parallel()
